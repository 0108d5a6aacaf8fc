"""Shared fixtures: one SparkSession per test session + small signals.

Mirrors the reference's test strategy (SURVEY §5): seeded random data,
oracle comparison against in-memory whole-array kernels, and the
chunk/partition-invariance axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from openseize_spark.session import get_spark
from openseize_spark.signal import SignalFrame

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


def make_signal(spark, nchannels=3, n=4000, fs=100.0, seed=0, nan_frac=0.0):
    """Seeded random long-format signal (reference fixture analog:
    tests/test_protools.py:40-45 uses normal(loc=3, scale=2))."""
    rng = np.random.default_rng(seed)
    rows = []
    for ch in range(nchannels):
        v = rng.normal(loc=0.0, scale=1.0, size=n)
        if nan_frac > 0:
            idx = rng.choice(n, int(n * nan_frac), replace=False)
            v[idx] = np.nan
        rows.append(
            pd.DataFrame(
                {"recording_id": "r0", "channel": ch, "t": np.arange(n), "v": v}
            )
        )
    pdf = pd.concat(rows)
    df = spark.createDataFrame(pdf, schema="recording_id string, channel int, t bigint, v double")
    return SignalFrame(df=df.repartition(8), fs=fs)


@pytest.fixture(scope="session")
def signal(spark):
    return make_signal(spark)


def collect_signal(sf) -> dict[int, np.ndarray]:
    """Materialize per-channel arrays (test-only driver-side collect)."""
    pdf = sf.df.orderBy("channel", "t").toPandas()
    return {
        int(ch): g.sort_values("t")["v"].to_numpy()
        for ch, g in pdf.groupby("channel")
    }
