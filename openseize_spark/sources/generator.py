"""Generator sources — the GenProducer analog (reference:
core/producer.py:298-376): arbitrary generating functions become
first-class distributed sources.

Spark-native contract: ``spark.range`` supplies the dense index space,
partitioned; per-partition Python generators run inside ``mapInPandas``
(iterator-of-batches in/out — the exact GenProducer contract), or, for
closed-form signals, a pure column expression keeps everything in
codegen.

Includes the reference's demo PAC signal (demos/signals.py:7-117):
phase-amplitude-coupled sines + seeded Gaussian noise, used to make
spectral estimates verifiable by construction (known peak frequencies).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openseize_spark.signal import SignalFrame


def signal_from_function(
    spark: SparkSession,
    fn: Callable[[np.ndarray, int], np.ndarray],
    nchannels: int,
    nsamples: int,
    fs: float,
    recording_id: str = "r0",
    partitions: int | None = None,
) -> SignalFrame:
    """Distributed generator: fn(t_indices, channel) -> values, evaluated
    per Arrow batch inside mapInPandas.  fn must be deterministic in
    (t, channel) so re-execution (task retry, AQE replan) is safe —
    the same constraint the reference's pickled GenProducers have."""
    base = spark.range(0, nsamples, 1, partitions or spark.sparkContext.defaultParallelism)
    chans = spark.range(nchannels).select(F.col("id").cast("int").alias("channel"))
    grid = base.select(F.col("id").alias("t")).crossJoin(chans)

    schema = "recording_id string, channel int, t long, v double"

    def _gen(it):
        for pdf in it:
            t = pdf["t"].to_numpy()
            out = []
            for ch, g in pdf.groupby("channel"):
                tt = g["t"].to_numpy()
                out.append(
                    pd.DataFrame(
                        {
                            "recording_id": recording_id,
                            "channel": int(ch),
                            "t": tt,
                            "v": fn(tt, int(ch)),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"recording_id": [], "channel": [], "t": [], "v": []}
            )

    return SignalFrame(df=grid.mapInPandas(_gen, schema), fs=fs)


def pac_signal(
    spark: SparkSession,
    fs: float = 500.0,
    duration: float = 10.0,
    fp: float = 8.0,
    fa: float = 40.0,
    amp_p: float = 1.8,
    amp_a: float = 1.0,
    strength: float = 0.8,
    sigma: float = 0.25,
    seed: int = 0,
    nchannels: int = 1,
) -> SignalFrame:
    """Phase-amplitude-coupled synthetic signal (reference:
    demos/signals.py:7-117): a slow phase-frequency sine modulating the
    amplitude of a fast sine, plus seeded Gaussian noise.  Known spectral
    peaks at fp and fa make Welch/STFT verifiable by construction."""
    n = int(fs * duration)

    def fn(t: np.ndarray, ch: int) -> np.ndarray:
        tt = t / fs
        slow = amp_p * np.sin(2 * np.pi * fp * tt)
        mod = (1 - strength) + strength * (1 + np.sin(2 * np.pi * fp * tt - np.pi / 2)) / 2
        fast = amp_a * mod * np.sin(2 * np.pi * fa * tt)
        # deterministic per-(t, ch) noise so retries are safe
        rng = np.random.default_rng(seed + ch)
        noise_full = rng.normal(0, sigma, n)
        return slow + fast + noise_full[t]

    return signal_from_function(spark, fn, nchannels, n, fs)


def dyadic_signal(
    spark: SparkSession,
    nchannels: int = 4,
    nsamples: int = 10000,
    fs: float = 100.0,
) -> SignalFrame:
    """Closed-form deterministic signal entirely in codegen (no Python):
    v = ((t*2654435761 + channel*40503) mod 2^10) / 2^10 — a Weyl-style
    integer hash mapped to dyadic rationals (exact cross-engine sums).
    DuckDB-oracle equivalent lives in __spark_entry__.py."""
    base = spark.range(0, nsamples)
    chans = spark.range(nchannels).select(F.col("id").cast("int").alias("channel"))
    return SignalFrame(
        df=base.select(F.col("id").alias("t"))
        .crossJoin(chans)
        .select(
            F.lit("r0").alias("recording_id"),
            "channel",
            F.col("t").cast("bigint").alias("t"),
            (
                ((F.col("t") * 2654435761 + F.col("channel") * 40503) % 1024).cast("double")
                / 1024.0
            ).alias("v"),
        ),
        fs=fs,
    )
