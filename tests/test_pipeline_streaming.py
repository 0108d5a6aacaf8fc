"""Pipeline composition contract + streaming parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openseize_spark.operators import resample as op_rs
from openseize_spark.operators import spectral as op_spec
from openseize_spark.plans import Pipeline
from openseize_spark.streaming import windows as sw
from tests.conftest import make_signal


class TestPipeline:
    def test_compose(self, spark):
        sf = make_signal(spark, nchannels=2, n=4000, seed=20)
        pipe = Pipeline()
        pipe.append(op_rs.downsample, M=2)
        pipe.append(op_spec.welch_psd, nfft=128)
        out = pipe(sf)
        rows = out.collect()
        assert len(rows) == 2 * 65  # 2 channels x (128/2+1) freqs
        assert op_rs.downsample in pipe
        assert op_spec.welch_psd in pipe

    def test_rejects_wrong_binding(self):
        pipe = Pipeline()
        with pytest.raises(TypeError):
            pipe.append(op_rs.resample)  # L and M unbound -> 3 unbound args

    def test_matches_direct_call(self, spark):
        sf = make_signal(spark, nchannels=1, n=3000, seed=21)
        pipe = Pipeline()
        pipe.append(op_rs.downsample, M=2)
        a = pipe(sf).df.orderBy("t").toPandas()
        b = op_rs.downsample(sf, 2).df.orderBy("t").toPandas()
        np.testing.assert_allclose(a.v.to_numpy(), b.v.to_numpy())


class TestStreaming:
    def test_windowed_stats_match_batch(self, spark, tmp_path):
        # write a small events slice as the streaming source
        import pandas as pd

        rng = np.random.default_rng(3)
        n = 500
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 3600 * 6, n)), unit="s"
        )
        pdf = pd.DataFrame(
            {
                "ts": ts,
                "event_type": [["a", "b", "c"][i] for i in rng.integers(0, 3, n)],
                "value": rng.normal(size=n),
            }
        )
        src = str(tmp_path / "events_src")
        batch = spark.createDataFrame(pdf)
        batch.write.mode("overwrite").parquet(src)

        out = sw.run_batch_as_stream(
            spark,
            src,
            batch.schema,
            lambda df: sw.streaming_windowed_stats(df, "1 hour", None, "10 minutes"),
            queryName="t_stream",
        ).collect()
        want = (
            batch.groupBy(
                F.date_trunc("hour", "ts").alias("win_start"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.avg("value").alias("mean_v"))
            .collect()
        )
        got = {(r.win_start, r.event_type): (r.n, r.mean_v) for r in out}
        assert len(got) == len(want)
        for r in want:
            n_, m_ = got[(r.win_start, r.event_type)]
            assert n_ == r.n
            assert m_ == pytest.approx(r.mean_v, rel=1e-9)

    def test_sliding_segmentation_matches_welch_segments(self, spark, tmp_path):
        """Sliding window(ts, nfft/fs, stride/fs) == the batch welch
        segmentation grid (reference: core/numerical.py:816-849) — one
        row per complete segment, same per-segment sums."""
        import pandas as pd

        fs, nfft, stride, n = 100.0, 64, 32, 1000
        x = np.array([((t * 11 + 5) % 128) / 128.0 for t in range(n)])
        pdf = pd.DataFrame(
            {
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta((np.arange(n) / fs * 1e6).astype(int), unit="us"),
                "channel": 0,
                "v": x,
            }
        )
        src = str(tmp_path / "sig_src")
        batch = spark.createDataFrame(pdf)
        batch.write.mode("overwrite").parquet(src)

        def seg_transform(df):
            return (
                df.withWatermark("ts", "10 seconds")
                .groupBy(
                    F.window("ts", f"{int(nfft / fs * 1000)} milliseconds",
                             f"{int(stride / fs * 1000)} milliseconds").alias("win"),
                    "channel",
                )
                .agg(F.count("*").alias("cnt"), F.sum("v").alias("seg_sum"))
            )

        out = sw.run_batch_as_stream(
            spark, src, batch.schema, seg_transform, queryName="t_segs"
        ).filter(F.col("cnt") == nfft).collect()

        t0 = pd.Timestamp("2024-01-01")
        got = {
            round((r.win.start - t0).total_seconds() * fs) // stride: r.seg_sum
            for r in out
        }
        nsegs = (n - nfft) // stride + 1
        assert len(got) == nsegs
        for s in range(nsegs):
            want = x[s * stride : s * stride + nfft].sum()
            assert got[s] == pytest.approx(want, abs=1e-12)

    def test_completeness_policies_drop_vs_pad(self, spark, tmp_path):
        """SURVEY §2.10: welch drops the trailing partial segment; stft
        'padded' zero-fills it.  Streaming analogs: filter cnt == nfft
        (drop) vs keep partial windows (zero-pad is a no-op for sum
        aggregates).  Both derived from ONE windowed aggregation."""
        import pandas as pd

        fs, nfft, stride, n = 100.0, 64, 32, 990  # 990 -> trailing partial
        x = np.array([((t * 7 + 3) % 64) / 64.0 for t in range(n)])
        pdf = pd.DataFrame(
            {
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta((np.arange(n) / fs * 1e6).astype(int), unit="us"),
                "channel": 0,
                "v": x,
            }
        )
        src = str(tmp_path / "pol_src")
        batch = spark.createDataFrame(pdf)
        batch.write.mode("overwrite").parquet(src)

        def seg_transform(df):
            return (
                df.withWatermark("ts", "10 seconds")
                .groupBy(
                    F.window(
                        "ts",
                        f"{int(nfft / fs * 1000)} milliseconds",
                        f"{int(stride / fs * 1000)} milliseconds",
                    ).alias("win"),
                    "channel",
                )
                .agg(F.count("*").alias("cnt"), F.sum("v").alias("seg_sum"))
            )

        allw = sw.run_batch_as_stream(
            spark, src, batch.schema, seg_transform, queryName="t_pol"
        ).collect()
        t0 = pd.Timestamp("2024-01-01")
        seg_of = lambda r: round((r.win.start - t0).total_seconds() * fs) // stride

        complete = {seg_of(r) for r in allw if r.cnt == nfft and seg_of(r) >= 0}
        # stft 'padded' pads the tail to a whole number of strides: the
        # last emitted segment misses < stride samples -> the streaming
        # analog keeps windows with cnt > nfft - stride
        padded = {seg_of(r) for r in allw if r.cnt > nfft - stride and seg_of(r) >= 0}
        n_complete = (n - nfft) // stride + 1
        n_padded = -(-(n - nfft) // stride) + 1  # ceil: partial tail kept
        assert len(complete) == n_complete
        assert len(padded) == n_padded
        # the padded-policy extra segment carries the zero-padded sum
        extra = max(padded - complete)
        tail = next(r for r in allw if seg_of(r) == extra)
        want = x[extra * stride :].sum()  # zero padding adds nothing
        assert tail.seg_sum == pytest.approx(want, abs=1e-12)


class TestStreamingDedup:
    def test_exact_dedup_matches_batch(self, spark, tmp_path):
        import pandas as pd

        from openseize_spark.llm import dedup as bdedup
        from openseize_spark.streaming import dedup as sdedup

        texts = ["alpha beta", "gamma", "Alpha  beta", "delta", "gamma", "eps"]
        pdf = pd.DataFrame(
            {
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(range(len(texts)), unit="m"),
                "doc_id": range(len(texts)),
                "text": texts,
            }
        )
        src = str(tmp_path / "docs_src")
        batch = spark.createDataFrame(pdf)
        batch.write.mode("overwrite").parquet(src)

        got = sw.run_batch_as_stream(
            spark,
            src,
            batch.schema,
            lambda s: sdedup.streaming_exact_dedup(s, watermark="1 hour"),
            queryName="sdedup",
            output_mode="append",
        )
        # one survivor per distinct normalized text (WHICH one survives
        # within a single micro-batch is arbitrary — batch row order is
        # not event-time order), matching the batch operator's grouping
        surv = got.collect()
        norm = {
            r.text.lower().strip().replace("  ", " ") for r in surv
        }
        assert len(surv) == 4 and norm == {"alpha beta", "gamma", "delta", "eps"}
        bsurv = bdedup.exact_dedup(batch.select("doc_id", "text")).collect()
        assert len(bsurv) == len(surv)

    def test_sessionize_gap_split(self, spark, tmp_path):
        import pandas as pd

        from openseize_spark.streaming import dedup as sdedup

        # two bursts separated by > gap for key 'a'; one burst for 'b'
        t0 = pd.Timestamp("2024-01-01")
        rows = [
            (t0, "a", 1.0),
            (t0 + pd.Timedelta("5 min"), "a", 2.0),
            (t0 + pd.Timedelta("2 hours"), "a", 4.0),
            (t0 + pd.Timedelta("1 min"), "b", 8.0),
        ]
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
        src = str(tmp_path / "sess_src")
        batch = spark.createDataFrame(pdf)
        batch.write.mode("overwrite").parquet(src)

        got = sw.run_batch_as_stream(
            spark,
            src,
            batch.schema,
            lambda s: sdedup.streaming_sessionize(s, gap="30 minutes"),
            queryName="ssess",
            output_mode="complete",
        ).collect()
        by_key = {}
        for r in got:
            by_key.setdefault(r.event_type, []).append(r)
        assert len(by_key["a"]) == 2 and len(by_key["b"]) == 1
        sums = sorted(r.sum_value for r in by_key["a"])
        assert sums == [3.0, 4.0]


class TestStreamingEnrich:
    def test_stream_static_join_equals_batch(self, spark, tmp_path):
        import datetime

        from pyspark.sql import functions as F

        from openseize_spark.streaming.windows import (
            run_batch_as_stream,
            streaming_enrich,
        )

        base = datetime.datetime(2024, 1, 2)
        rows = [
            (i, base + datetime.timedelta(hours=i % 72), i % 5, float(i))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        path = str(tmp_path / "enrich_src")
        df.write.parquet(path)
        dim = spark.createDataFrame(
            [(k, f"G{k}") for k in range(5)], "n_nationkey long, n_name string"
        )

        def transform(s):
            return streaming_enrich(
                s, dim, s.user_id % 5 == dim.n_nationkey, window_dur="1 day"
            )

        out = run_batch_as_stream(
            spark, path, df.schema, transform, queryName="t_enrich"
        )
        got = sorted(
            (r.win_start, r.n_name, r.n, r.sum_value) for r in out.collect()
        )
        batch = sorted(
            (r.win_start, r.n_name, r.n, r.sum_value)
            for r in df.join(dim, df.user_id % 5 == dim.n_nationkey)
            .groupBy(
                F.date_trunc("day", "ts").alias("win_start"), "n_name"
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .collect()
        )
        assert got == batch and len(got) > 0

    def test_interval_join_equals_batch(self, spark, tmp_path):
        """Stream-stream interval join emits exactly the batch join's
        pairs: every (view, click) of one user within the horizon, none
        outside it, including late-arriving in-horizon clicks."""
        import datetime

        from openseize_spark.streaming.windows import streaming_interval_join

        base = datetime.datetime(2024, 3, 1)
        rows = []
        for i in range(120):
            kind = "view" if i % 2 == 0 else "click"
            # clicks trail views by 0..119 minutes so some pairs fall
            # inside the 1h horizon and some outside
            ts = base + datetime.timedelta(minutes=(i * 7) % 240)
            rows.append((i, ts, (i // 2) % 4, kind))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        path = str(tmp_path / "sj_src")
        df.write.parquet(path)

        def side(kind, prefix):
            s = spark.readStream.schema(df.schema).parquet(path)
            return s.filter(F.col("event_type") == kind).select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )

        joined = streaming_interval_join(
            side("view", "v"),
            side("click", "c"),
            left_key="v_user",
            right_key="c_user",
            left_ts="v_ts",
            right_ts="c_ts",
            max_delay="1 HOUR",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sjoin")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(
            (r.v_id, r.c_id) for r in spark.sql("SELECT * FROM t_sjoin").collect()
        )

        v = df.filter("event_type = 'view'").selectExpr(
            "user_id u", "event_id vid", "ts vts"
        )
        c = df.filter("event_type = 'click'").selectExpr(
            "user_id u2", "event_id cid", "ts cts"
        )
        batch = sorted(
            (r.vid, r.cid)
            for r in v.join(
                c,
                (v.u == c.u2)
                & (c.cts >= v.vts)
                & (c.cts <= v.vts + F.expr("INTERVAL 1 HOUR")),
            ).collect()
        )
        assert got == batch and len(got) > 0


class TestStreamingUpsert:
    def test_multi_batch_merge_equals_batch(self, spark, tmp_path):
        from openseize_spark.streaming import sinks

        rows = [
            (i, 10 + (i % 5), float(i % 7), f"2024-01-01 00:{i % 60:02d}:00")
            for i in range(120)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, value double, s string"
        ).withColumn("ts", F.to_timestamp("s")).drop("s")
        src4 = str(tmp_path / "src4")
        src1 = str(tmp_path / "src1")
        df.repartition(4, "user_id").write.parquet(src4)
        df.coalesce(1).write.parquet(src1)

        out4 = {
            r.user_id: (r.last_seen, r.n_events, round(r.sum_value, 9))
            for r in sinks.upsert_user_state(
                spark, src4, df.schema, str(tmp_path / "t4"), query_name="u4"
            ).collect()
        }
        out1 = {
            r.user_id: (r.last_seen, r.n_events, round(r.sum_value, 9))
            for r in sinks.upsert_user_state(
                spark, src1, df.schema, str(tmp_path / "t1"), query_name="u1"
            ).collect()
        }
        batch = {
            r.user_id: (r.last_seen, r.n_events, round(r.sum_value, 9))
            for r in df.groupBy("user_id")
            .agg(
                F.max("ts").alias("last_seen"),
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .collect()
        }
        # 4 micro-batches, 1 micro-batch, and one-shot batch all agree:
        # batch boundaries are invisible because the merges commute
        assert out4 == batch
        assert out1 == batch
        assert len(batch) == 5
