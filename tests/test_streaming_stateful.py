"""Streaming stateful sosfilt must equal the batch filter bit-for-bit:
the micro-batch boundary is the chunk boundary, and state carry is exact
(the reference's chunked-zi guarantee, core/numerical.py:326-335)."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from openseize_spark.dsp import design, kernels
from openseize_spark.streaming.stateful import streaming_sosfilt


def test_streaming_sosfilt_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(0)
    n = 3000
    x = {ch: rng.normal(size=n) for ch in range(2)}
    spec = design.butter(fpass=10, fstop=20, fs=100.0)

    # three sequential micro-batch files (t order across files)
    src = tmp_path / "stream_src"
    src.mkdir()
    cuts = [0, 1000, 2200, n]
    for i in range(3):
        rows = []
        for ch in range(2):
            sl = slice(cuts[i], cuts[i + 1])
            rows.append(
                pd.DataFrame(
                    {
                        "recording_id": "r0",
                        "channel": ch,
                        "t": np.arange(cuts[i], cuts[i + 1]),
                        "v": x[ch][sl],
                    }
                )
            )
        pdf = pd.concat(rows)
        spark.createDataFrame(
            pdf, schema="recording_id string, channel int, t long, v double"
        ).coalesce(1).write.parquet(str(src / f"batch_{i}"))

    # stream them in order, one file-batch per trigger
    schema = "recording_id string, channel int, t long, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    out = streaming_sosfilt(stream, spec.sos)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("iir_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM iir_stream").toPandas()
    assert len(got) == 2 * n
    for ch in range(2):
        want, _ = kernels.sosfilt(spec.sos, x[ch])
        have = got[got.channel == ch].sort_values("t").v.to_numpy()
        np.testing.assert_allclose(have, want, atol=1e-12)


class TestStreamingCusum:
    def test_state_carries_across_batches(self, spark, tmp_path):
        import os

        import datetime

        from pyspark.sql import functions as F

        from openseize_spark.streaming.stateful import streaming_cusum

        # one user whose values ramp: CUSUM must cross the threshold in
        # the SECOND micro-batch only because state carried from the
        # first (no single batch crosses alone)
        rows = []
        t0 = datetime.datetime(2024, 5, 1)
        for i in range(20):
            rows.append((1, i, t0 + datetime.timedelta(minutes=i), 150.0))
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, value double"
        )
        for b in range(2):
            df.filter(
                (F.col("event_id") >= b * 10) & (F.col("event_id") < (b + 1) * 10)
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(str(tmp_path), f"batch_{b}")
            )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(str(tmp_path), "batch_*"))
        )
        out = streaming_cusum(
            stream, target_cents=10000, slack_cents=2000, h_cents=40000
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_cusum")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r.event_id: (r.s, r.alarm)
            for r in spark.sql("SELECT * FROM t_cusum").collect()
        }
        # python replay of the same integer recurrence
        s, exp = 0, {}
        for i in range(20):
            s = max(0, s + 15000 - 12000)
            alarm = s > 40000
            exp[i] = (s, alarm)
            if alarm:
                s = 0
        assert got == exp
        # the first alarm lands at event 13 (14 * 3000 = 42000 > 40000) —
        # inside the second micro-batch, proving cross-batch state carry
        assert exp[13][1] and not exp[12][1]

    def test_half_cent_rounds_away_from_zero(self, spark, tmp_path):
        """0.125 * 100 = 12.5 exactly: numpy's half-to-even would give
        12, but the SQL replay (DuckDB round) and the batch queries
        (Spark HALF_UP) give 13 — the stream must agree with them."""
        import datetime
        import os

        from openseize_spark.streaming.stateful import streaming_cusum

        t0 = datetime.datetime(2024, 5, 1)
        df = spark.createDataFrame(
            [(1, 0, t0, 0.125)],
            "user_id long, event_id long, ts timestamp, value double",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "batch_0")
        )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(str(tmp_path), "batch_*"))
        )
        out = streaming_cusum(stream, target_cents=0, slack_cents=0, h_cents=10**9)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_cusum_half")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        r = spark.sql("SELECT * FROM t_cusum_half").collect()[0]
        assert r.s == 13  # half-away, matching round(0.125*100) in SQL


class TestStreamingRateLimit:
    def test_bucket_drains_and_refills_across_batches(self, spark, tmp_path):
        import os

        import datetime

        from pyspark.sql import functions as F

        from openseize_spark.streaming.stateful import streaming_rate_limit

        # one user: 8 rapid-fire events (1s apart) drain the 5-token
        # bucket inside batch 1; a 3-minute gap into batch 2 refills 3
        # tokens — the refill depends on last_us carried across the
        # micro-batch boundary
        t0 = datetime.datetime(2024, 5, 1)
        rows = [(1, i, t0 + datetime.timedelta(seconds=i)) for i in range(8)]
        rows += [
            (1, 100 + j, t0 + datetime.timedelta(seconds=7 + 180 + j))
            for j in range(4)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        )
        for b, cond in enumerate(
            [F.col("event_id") < 100, F.col("event_id") >= 100]
        ):
            df.filter(cond).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(str(tmp_path), f"batch_{b}")
            )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(str(tmp_path), "batch_*"))
        )
        out = streaming_rate_limit(
            stream, capacity_tokens=5, us_per_microtoken=60
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_ratelim")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r.event_id: (r.tokens_after, r.accepted)
            for r in spark.sql("SELECT * FROM t_ratelim").collect()
        }
        # python replay of the same integer recurrence
        cap, cost = 5_000_000, 1_000_000
        tokens, last, started = 0, 0, False
        exp = {}
        for uid, eid, ts in rows:
            us = int(ts.timestamp() * 1_000_000)
            if not started:
                avail, started = cap, True
            else:
                avail = min(cap, tokens + (us - last) // 60)
            acc = avail >= cost
            tokens = avail - (cost if acc else 0)
            last = us
            exp[eid] = (tokens, acc)
        assert got == exp
        # events 0-4 accepted (bucket drains), 5-7 rejected except for
        # the ~16667-microtoken trickle per second (never reaches a
        # full token), then the 3-minute gap refills 3 full tokens:
        # events 100-102 accepted, 103 rejected
        assert [exp[i][1] for i in range(8)] == [True] * 5 + [False] * 3
        assert [exp[100 + j][1] for j in range(4)] == [True, True, True, False]


class TestStreamingHll:
    def _run(self, spark, tmp_path, batches, b=5):
        import os

        from pyspark.sql import functions as F

        from openseize_spark.streaming.stateful import streaming_hll

        rows = []
        for bi, users in enumerate(batches):
            for j, u in enumerate(users):
                rows.append(("t0", u, bi * 1000 + j))
        df = spark.createDataFrame(
            rows, "event_type string, user_id long, _us long"
        )
        for bi in range(len(batches)):
            df.filter(
                (F.col("_us") >= bi * 1000)
                & (F.col("_us") < (bi + 1) * 1000)
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(str(tmp_path), f"batch_{bi}")
            )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(str(tmp_path), "batch_*"))
        )
        out = streaming_hll(stream, b=b)
        qn = f"t_shll_{os.path.basename(str(tmp_path))}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(qn)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            r.batch_idx: (r.npresent, r.n_empty, r.sum_units)
            for r in spark.sql(f"SELECT * FROM {qn}").collect()
        }

    @staticmethod
    def _batch_summary(users, b=5):
        import hashlib

        m = 1 << b
        rb = 32 - b
        regs = [0] * m
        for u in users:
            h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:8], 16)
            bucket, rest = h // (1 << rb), h % (1 << rb)
            rho = rb + 1 if rest == 0 else rb + 1 - rest.bit_length()
            regs[bucket] = max(regs[bucket], rho)
        npresent = sum(1 for r in regs if r > 0)
        su = sum((1 << (32 - r)) for r in regs if r > 0) + (
            m - npresent
        ) * (1 << 32)
        return npresent, m - npresent, su

    def test_final_state_equals_batch_sketch(self, spark, tmp_path):
        """After the last micro-batch the registers must equal the
        batch hll_sketch over every row seen — register max is
        order-insensitive, so batch boundaries cannot change it.
        Cross-checked against the batch module itself, not just the
        python replay."""
        from openseize_spark.llm.sketch import hll_sketch

        batches = [list(range(40)), list(range(20, 60)), [7, 99, 100]]
        got = self._run(spark, tmp_path, batches)
        all_users = [u for bat in batches for u in bat]
        assert got[2] == self._batch_summary(all_users)

        df = spark.createDataFrame(
            [(u,) for u in all_users], "user_id long"
        )
        sk = {
            r.bucket: r.m_j
            for r in hll_sketch(df, "user_id", b=5).collect()
        }
        npresent = len(sk)
        su = sum(1 << (32 - v) for v in sk.values()) + (32 - npresent) * (
            1 << 32
        )
        assert got[2] == (npresent, 32 - npresent, su)

    def test_prefixes_and_duplicates(self, spark, tmp_path):
        """Each emitted row is the sketch of the PREFIX; duplicate
        users across batches cannot move the registers."""
        batches = [[1, 2, 3], [3, 2, 1], [4]]
        got = self._run(spark, tmp_path, batches)
        assert got[0] == self._batch_summary([1, 2, 3])
        assert got[1] == got[0]  # pure duplicates: registers unmoved
        assert got[2] == self._batch_summary([1, 2, 3, 4])

    def test_absent_batch_advances_nothing(self, spark, tmp_path):
        """A key with no rows in a micro-batch emits nothing for it and
        its per-key batch counter does not advance — the contract the
        oracle's rank-over-present-batches batch_idx relies on."""
        batches = [[1, 2], [], [3]]
        got = self._run(spark, tmp_path, batches)
        # outputs exist for the key's two PRESENT batches, indexed 0, 1
        assert set(got) == {0, 1}
        assert got[0] == self._batch_summary([1, 2])
        assert got[1] == self._batch_summary([1, 2, 3])
