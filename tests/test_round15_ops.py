"""Round-15 optimization pins: the restructured operators must keep
their pre-optimization semantics.

1. phase_events (filter + t-1 anti-join) == the old lag-window rule,
   including the stream-edge case (first sample in tolerance IS a
   crossing) and a dense t range that does not start at zero.
2. pac_estimate's bounds-based completeness == the old gathered-count
   rule on a t range that does not start at zero.
3. ivf_assign's min(struct) argmin keeps the (d2, cell_id) tie rule
   and passes every input column through.
4. _fanout_by_id repartitions only under-parallel inputs.
5. pagerank handles an empty edge set (driver-scalar n path).
6. sp_counting's unconditional max_hops rounds equal a python BFS
   replay when the graph's reach is shorter than the hop budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openseize_spark.operators import coupling
from openseize_spark.llm import dedup, similarity


@pytest.fixture(scope="module")
def spark():
    from openseize_spark.session import get_spark

    return get_spark("test-round15")


def _phase_df(spark, t0=0):
    # two channels, dense t in [t0, t0+200); phase crosses in/out of the
    # 0.5 +/- 0.05 band in runs, with the FIRST sample of channel 1
    # inside the band (stream-edge crossing)
    rows = []
    for ch in (0, 1):
        for i in range(200):
            t = t0 + i
            if ch == 1 and i < 3:
                ph = 0.5
            elif 50 <= i < 55 or 120 <= i < 121:
                ph = 0.48 + 0.002 * ch
            else:
                ph = 2.0 + (i % 7) * 0.1
            rows.append(("r0", ch, t, float(ph)))
    return spark.createDataFrame(
        rows, "recording_id string, channel int, t bigint, phase double"
    )


def _events_reference(df, target, tol):
    """The pre-round-15 lag-window rule, replayed in python."""
    rows = sorted(
        df.collect(), key=lambda r: (r.recording_id, r.channel, r.t)
    )
    out = set()
    prev_in = {}
    for r in rows:
        key = (r.recording_id, r.channel)
        inside = abs(r.phase - target) <= tol
        if inside and not prev_in.get(key, False):
            out.add((r.recording_id, r.channel, r.t))
        prev_in[key] = inside
    return out


class TestPhaseEvents:
    @pytest.mark.parametrize("t0", [0, 1000])
    def test_matches_lag_rule(self, spark, t0):
        df = _phase_df(spark, t0=t0)
        got = {
            (r.recording_id, r.channel, r.event_t)
            for r in coupling.phase_events(df, target=0.5, tol=0.05).collect()
        }
        assert got == _events_reference(df, 0.5, 0.05)
        # the channel-1 stream edge must be an event
        assert ("r0", 1, t0) in got


class TestPacBounds:
    def test_offset_t_range(self, spark):
        # amplitude series on t in [500, 900); events at interior and
        # edge positions — completeness must follow the series bounds,
        # not zero
        amp = spark.createDataFrame(
            [("r0", 0, 500 + i, ((i * 7) % 64) / 64.0) for i in range(400)],
            "recording_id string, channel int, t bigint, v double",
        )
        events = spark.createDataFrame(
            [("r0", 0, 510), ("r0", 0, 700), ("r0", 0, 890)],
            "recording_id string, channel int, event_t bigint",
        )
        out = coupling.pac_estimate(amp, events, window=32).collect()
        # 510: [494, 526) clipped below; 890: [874, 906) clipped above;
        # only 700 survives
        assert {r.n_events for r in out} == {1}
        vals = {r.offset: r.mean_sq_amp for r in out}
        for o in range(32):
            t = 700 - 16 + o
            x = (((t - 500) * 7) % 64) / 64.0
            assert vals[o] == pytest.approx(x * x, abs=1e-12)


class TestIvfAssign:
    def test_tie_breaks_to_lowest_cell(self, spark):
        emb = spark.createDataFrame(
            [(1, [0.0, 0.0], 9)], "vec_id long, embedding array<double>, label int"
        )
        cents = spark.createDataFrame(
            [(2, [1.0, 0.0]), (1, [0.0, 1.0]), (3, [5.0, 5.0])],
            "cell_id int, cvec array<double>",
        )
        rows = similarity.ivf_assign(emb, cents).collect()
        assert len(rows) == 1
        r = rows[0]
        # cells 1 and 2 are equidistant (d2 = 1.0): lowest cell_id wins
        assert r.cell_id == 1
        # payload columns pass through
        assert r.label == 9 and list(r._v) == [0.0, 0.0]

    def test_column_order_preserved(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0], 0)], "vec_id long, embedding array<double>, label int"
        )
        cents = spark.createDataFrame(
            [(0, [0.9])], "cell_id int, cvec array<double>"
        )
        out = similarity.ivf_assign(emb, cents)
        assert out.columns == ["vec_id", "embedding", "label", "_v", "cell_id"]


class TestFanout:
    def test_under_parallel_repartitions(self, spark):
        df = spark.createDataFrame(
            [(i, "x") for i in range(10)], "doc_id long, text string"
        ).coalesce(1)
        fanned = dedup._fanout_by_id(df, "doc_id")
        assert (
            fanned.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_already_parallel_untouched(self, spark):
        n = spark.sparkContext.defaultParallelism
        df = spark.range(1000).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text")
        ).repartition(n + 4)
        fanned = dedup._fanout_by_id(df, "doc_id")
        # no new exchange: the frame comes back as-is
        assert fanned is df


class TestPagerankEmpty:
    def test_empty_edges(self, spark):
        edges = spark.createDataFrame([], "a bigint, b bigint")
        assert dedup.pagerank(edges, iters=3).count() == 0


class TestSpCountingReach:
    def test_short_graph_equals_python_bfs(self, spark):
        # path graph 0-1-2: reach 2 < max_hops 4 -> the two trailing
        # empty rounds must contribute nothing
        edges = spark.createDataFrame(
            [(0, 1), (1, 2)], "a bigint, b bigint"
        )
        got = {
            (r.id, r.dist, int(r.sigma))
            for r in dedup.sp_counting(edges, source=0, max_hops=4).collect()
        }
        assert got == {(0, 0, 1), (1, 1, 1), (2, 2, 1)}
