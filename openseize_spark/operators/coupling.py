"""Phase-amplitude coupling (PAC) — the reference's experimental estimator
rebuilt on relational primitives.

reference: experimental/coupling/estimators.py (PhaseLock),
experimental/coupling/transforms.py (analytic signal, phases).

Pipeline:
1. analytic signal of the phase-band filtered signal -> phase column
   (operators/fir.hilbert_analytic + envelope_phase);
2. ``phase_events``: sample indices where phase crosses a target value
   within tolerance (reference: estimators.py:172-179);
3. ``event_window_gather``: for each event, collect samples in
   [idx - w/2, idx + w/2) — a **range join** between the amplitude series
   and the (small, broadcast) event table, grouped by within-window
   offset (reference: estimators.py:200-230 _avg);  windows shorter than
   w (stream edges) are discarded via HAVING count = nevents-complete;
4. ``pac_estimate``: mean squared amplitude per offset, normalized —
   the phase-locked amplitude modulation curve.
5. Surrogates: circular-shift the amplitude series by seeded random
   offsets via a crossJoin with a shift table — replaces the reference's
   multiprocessing fan-out (estimators.py:391-408) with partition
   parallelism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phase_events(
    analytic_phase: DataFrame, target: float, tol: float = 0.05
) -> DataFrame:
    """Samples where phase is within tol of target (rising alignment).

    analytic_phase: (recording_id, channel, t, phase) with ``t`` the
    DENSE, UNIQUE per-(recording, channel) sample index (the contract
    every sampled-signal frame in this engine satisfies).  Keeps the
    first sample of each contiguous within-tolerance run (the
    crossing): a run's first sample is exactly an in-tolerance sample
    whose predecessor ``t - 1`` is not in tolerance (or absent — the
    stream edge, matching the old lag default).

    Round-15 shape change (same values): the former lag window sorted
    and shuffled the ENTIRE series; with dense t the predecessor test
    is membership of ``t - 1`` in the in-tolerance set, so only the
    in-tolerance rows (a tol-sized fraction of the corpus) ever reach
    a shuffle — a filter plus a self anti-join on tiny sets instead of
    a full-series sort."""
    intol = analytic_phase.filter(
        F.abs(F.col("phase") - target) <= tol
    ).select("recording_id", "channel", "t")
    succ = intol.select(
        "recording_id", "channel", (F.col("t") + 1).alias("t")
    )
    return intol.join(
        succ, on=["recording_id", "channel", "t"], how="left_anti"
    ).select("recording_id", "channel", F.col("t").alias("event_t"))


def event_window_gather(
    samples: DataFrame, events: DataFrame, window: int, extra_cols: tuple = ()
) -> DataFrame:
    """Range join: samples within [event_t - w/2, event_t + w/2) per event.

    Returns (recording_id, channel, event_t, offset, v).  Events are tiny
    relative to samples -> broadcast range join; Spark turns the band
    predicate into a BroadcastNestedLoopJoin with a pushed filter, which
    is the right plan when |events| is small.
    """
    half = window // 2
    # Bucketize the range join: every window of length `window` spans at
    # most 3 buckets of size `window`; events explode to their covered
    # buckets and the join becomes a broadcast HASH join on
    # (recording, channel, bucket) + a residual range filter — no
    # nested-loop scan of the 100-TB side.
    e = events.select(
        F.col("recording_id").alias("e_rid"),
        F.col("channel").alias("e_ch"),
        "event_t",
        F.explode(
            F.sequence(
                F.expr(f"(event_t - {half}) div {window}"),
                F.expr(f"(event_t + {half} - 1) div {window}"),
            )
        ).alias("bucket"),
    )
    s = samples.withColumn("bucket", F.expr(f"t div {window}"))
    cond = (
        (F.col("recording_id") == F.col("e_rid"))
        & (F.col("channel") == F.col("e_ch"))
        & (F.col("bucket") == F.col("e_bucket"))
        & (F.col("t") >= F.col("event_t") - half)
        & (F.col("t") < F.col("event_t") + half)
    )
    return (
        s.join(
            F.broadcast(e.withColumnRenamed("bucket", "e_bucket")),
            cond,
        )
        .select(
            "recording_id",
            "channel",
            "event_t",
            (F.col("t") - (F.col("event_t") - half)).cast("bigint").alias("offset"),
            "v",
            *extra_cols,
        )
    )


def pac_estimate(
    amplitude: DataFrame, events: DataFrame, window: int
) -> DataFrame:
    """Phase-locked mean squared amplitude per within-window offset
    (reference: estimators.py:200-230).  Windows clipped by stream edges
    are discarded (reference discards short windows).

    ``amplitude.t`` must be the DENSE, UNIQUE per-(recording, channel)
    sample index (every sampled-signal frame here is).  Under that
    contract a window [event_t - w/2, event_t + w/2) gathers its full
    2*(w//2) samples — for odd window that is window-1, so the span
    size, not ``window``, is the completeness bar — exactly when it
    lies inside the channel's [min(t), max(t)] range, so edge-clipped
    events are dropped BEFORE the gather by a broadcast join against
    the per-channel t-bounds (one map-side-combined agg).  The former
    shape counted gathered rows per event through an analytic window —
    a full shuffle+sort of the gathered stream (|events| x window
    rows), replaced here by a tiny bounds table and a pre-filter that
    also shrinks the gather itself (round 15, same values)."""
    half = window // 2
    bounds = amplitude.groupBy("recording_id", "channel").agg(
        F.min("t").alias("_tmin"), F.max("t").alias("_tmax")
    )
    complete = (
        events.join(F.broadcast(bounds), on=["recording_id", "channel"])
        .filter(
            (F.col("event_t") - half >= F.col("_tmin"))
            & (F.col("event_t") + half - 1 <= F.col("_tmax"))
        )
        .select("recording_id", "channel", "event_t")
    )
    g = event_window_gather(amplitude, complete, window)
    return (
        g.groupBy("recording_id", "channel", "offset")
        .agg(
            F.avg(F.col("v") * F.col("v")).alias("mean_sq_amp"),
            F.count("*").alias("n_events"),
        )
    )


def surrogate_shifts(spark, n_surrogates: int, n_samples: int, seed: int = 0) -> DataFrame:
    """Seeded circular-shift table for surrogate PAC distributions
    (replaces mp.Pool fan-out, reference: estimators.py:391-408)."""
    rng = np.random.default_rng(seed)
    shifts = rng.integers(n_samples // 4, 3 * n_samples // 4, size=n_surrogates)
    return spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(shifts)], "surrogate_id int, shift bigint"
    )


def pac_surrogates(
    amplitude: DataFrame,
    events: DataFrame,
    window: int,
    shifts: DataFrame,
    n_samples: int,
) -> DataFrame:
    """PAC under circularly-shifted amplitude for each surrogate:
    crossJoin the (tiny) shift table, shift t modulo n, re-gather.
    One distributed job evaluates every surrogate in parallel."""
    shifted = (
        amplitude.crossJoin(F.broadcast(shifts))
        .select(
            "recording_id",
            "channel",
            "surrogate_id",
            ((F.col("t") + F.col("shift")) % n_samples).alias("t"),
            "v",
        )
    )
    g = event_window_gather(shifted, events, window, extra_cols=("surrogate_id",))
    return (
        g.groupBy("recording_id", "channel", "surrogate_id", "offset")
        .agg(F.avg(F.col("v") * F.col("v")).alias("mean_sq_amp"))
    )
