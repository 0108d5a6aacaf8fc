"""Phase-amplitude coupling operators vs. plain-python oracles
(reference: experimental/coupling/estimators.py:200-230, 391-408)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openseize_spark.operators import coupling


@pytest.fixture(scope="module")
def amp(spark):
    # 2 channels x 400 samples, deterministic values
    rows = [
        ("r0", ch, t, float(((t * 7 + ch * 13) % 64)) / 64.0)
        for ch in range(2)
        for t in range(400)
    ]
    return spark.createDataFrame(
        rows, "recording_id string, channel int, t bigint, v double"
    )


@pytest.fixture(scope="module")
def events(spark):
    rows = [("r0", ch, et) for ch in range(2) for et in (50, 133, 390)]
    return spark.createDataFrame(rows, "recording_id string, channel int, event_t bigint")


def _np_vals(ch, n=400):
    return np.array([((t * 7 + ch * 13) % 64) / 64.0 for t in range(n)])


class TestGather:
    def test_matches_numpy_windows(self, amp, events):
        w = 32
        got = {}
        for r in coupling.event_window_gather(amp, events, w).collect():
            got.setdefault((r.channel, r.event_t), {})[r.offset] = r.v
        for ch in range(2):
            x = _np_vals(ch)
            for et in (50, 133, 390):
                lo, hi = et - w // 2, et + w // 2
                want = {o: x[lo + o] for o in range(w) if 0 <= lo + o < len(x)}
                assert got[(ch, et)] == pytest.approx(want)

    def test_extra_cols_pass_through(self, amp, events):
        tagged = amp.withColumn("tag", F.col("channel") * 100)
        out = coupling.event_window_gather(tagged, events, 16, extra_cols=("tag",))
        assert all(r.tag == r.channel * 100 for r in out.collect())


class TestPac:
    def test_incomplete_windows_discarded(self, amp, events):
        w = 32
        out = coupling.pac_estimate(amp, events, window=w).collect()
        # event at 390: window [374, 406) is clipped -> dropped
        assert {r.n_events for r in out} == {2}
        got = {(r.channel, r.offset): r.mean_sq_amp for r in out}
        for ch in range(2):
            x = _np_vals(ch)
            for o in range(w):
                vals = [x[et - w // 2 + o] ** 2 for et in (50, 133)]
                assert got[(ch, o)] == pytest.approx(np.mean(vals), abs=1e-12)

    def test_surrogates_match_explicit_shift(self, spark, amp, events):
        w, n = 16, 400
        shifts = coupling.surrogate_shifts(spark, n_surrogates=3, n_samples=n, seed=5)
        out = coupling.pac_surrogates(amp, events, w, shifts, n_samples=n)
        got = {}
        for r in out.collect():
            got.setdefault(r.surrogate_id, {})[(r.channel, r.offset)] = r.mean_sq_amp
        for sid, sh in [(r.surrogate_id, r.shift) for r in shifts.collect()]:
            shifted = amp.select(
                "recording_id", "channel",
                ((F.col("t") + sh) % n).alias("t"), "v",
            )
            want = {
                (r.channel, r.offset): r.mean_sq_amp
                for r in coupling.pac_surrogates(
                    amp, events, w,
                    shifts.filter(F.col("surrogate_id") == sid), n_samples=n,
                ).collect()
            }
            direct = coupling.event_window_gather(shifted, events, w).groupBy(
                "channel", "offset"
            ).agg(F.avg(F.col("v") * F.col("v")).alias("m"))
            explicit = {(r.channel, r.offset): r.m for r in direct.collect()}
            assert want.keys() == explicit.keys()
            for k in want:
                assert want[k] == pytest.approx(explicit[k], abs=1e-12)
            assert got[sid] == pytest.approx(want)
