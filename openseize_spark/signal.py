"""SignalFrame: the Spark-native equivalent of the reference's Producer.

The reference models data as a lazy chunked ndarray stream, channels ×
samples (reference: core/producer.py:146-210).  Here the canonical layout is
a **long-format DataFrame**::

    Signal(recording_id STRING, channel INT, t BIGINT, v DOUBLE)

- ``t`` is the dense sample index per channel (time = t / fs);
- partition/cluster by ``(recording_id, channel)`` so per-channel ordered
  kernels (IIR, FFT segmentation) shuffle once and stay co-located;
- ``fs`` (sampling rate) travels driver-side on the wrapper, mirroring how
  the reference passes ``fs`` as a parameter everywhere
  (reference: spectra/estimators.py:59-68).

A dense **block layout** ``(recording_id, channel, block_id, vs
ARRAY<DOUBLE>)`` is used inside kernel stages (one producer-chunk per row);
see operators/blocks.py.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIGNAL_COLS = ("recording_id", "channel", "t", "v")


@dataclass(frozen=True)
class SignalFrame:
    """Thin wrapper: DataFrame in canonical signal layout + sampling rate.

    Mirrors Producer's (shape, chunksize, axis) contract: schema is the
    Catalyst-checked analog of `shape`; partitioning replaces `chunksize`;
    `t`-ordering replaces the production axis (reference:
    core/producer.py:166-189).
    """

    df: DataFrame
    fs: float

    def transform(self, fn: Callable[["SignalFrame"], "SignalFrame"]) -> "SignalFrame":
        """Pipeline-style chaining (reference: tools/pipeline.py:109-124)."""
        return fn(self)

    def with_df(self, df: DataFrame, fs: float | None = None) -> "SignalFrame":
        return replace(self, df=df, fs=self.fs if fs is None else fs)

    def to_pandas(self):
        """Materialize — the analog of Producer.to_array()
        (reference: core/producer.py:197-210); Spark's driver
        maxResultSize is the memory guard."""
        return self.df.orderBy("recording_id", "channel", "t").toPandas()


def signal_from_lineitem(
    spark: SparkSession,
    sf_dir: str,
    nchannels: int = 4,
    fs: float = 100.0,
) -> SignalFrame:
    """Deterministic dense test signal derived from the lineitem table.

    Both this builder and the DuckDB oracle SQL derive the identical signal
    with pure integer arithmetic (no transcendentals), so values compare
    exactly across engines:

        channel = l_orderkey % nchannels
        t       = row_number() over (partition by channel
                                     order by l_orderkey, l_linenumber,
                                              l_partkey, l_suppkey) - 1
        v       = ((l_partkey*7 + l_linenumber*13 + l_suppkey*3) % 1024)/1024

    v is a dyadic rational (k/2^10): sums and power-of-two divisions of
    dyadics are EXACT in float64, so aggregates match across engines
    bit-for-bit regardless of summation order.

    (l_orderkey, l_linenumber) alone is NOT unique in the driver data; the
    extended key makes v a pure function of the sort key, so any residual
    ties carry identical v and the assignment is engine-independent.
    """
    key = (spark.sparkContext.applicationId, sf_dir, nchannels)
    cached = _SIGNAL_CACHE.get(key)
    if cached is not None:
        return SignalFrame(df=cached, fs=fs)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from pyspark.sql import Window as W

    ch = (F.col("l_orderkey") % nchannels).cast("int")
    w = W.partitionBy(ch).orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    df = (
        li.select(
            F.lit("r0").alias("recording_id"),
            ch.alias("channel"),
            (F.row_number().over(w) - 1).cast("bigint").alias("t"),
            (
                (
                    (F.col("l_partkey") * 7 + F.col("l_linenumber") * 13 + F.col("l_suppkey") * 3)
                    % 1024
                ).cast("double")
                / 1024.0
            ).alias("v"),
        )
    )
    # The derivation (scan + per-channel sort) is the DSP queries' "table
    # load": materialize it once per session — the decode-once/query-many
    # pattern a production deployment would use (the reference's analog is
    # reading the EDF once and fanning producers off it).  Long format at
    # 600k rows/sf0.1 is ~17 MB serialized; MEMORY_AND_DISK spills safely
    # at larger SFs.
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _SIGNAL_CACHE[key] = df
    return SignalFrame(df=df, fs=fs)


_SIGNAL_CACHE: dict[tuple, DataFrame] = {}


# DuckDB-side equivalent of signal_from_lineitem, used as a CTE prefix by
# the oracle SQL in __spark_entry__.py.  Keep in lock-step with the builder.
SIGNAL_CTE = """
signal AS (
  SELECT 'r0' AS recording_id,
         CAST(l_orderkey % {nch} AS INT) AS channel,
         CAST(row_number() OVER (PARTITION BY l_orderkey % {nch}
                                 ORDER BY l_orderkey, l_linenumber,
                                          l_partkey, l_suppkey) - 1 AS BIGINT) AS t,
         CAST((l_partkey*7 + l_linenumber*13 + l_suppkey*3) % 1024 AS DOUBLE) / 1024.0 AS v
  FROM lineitem
)
"""


def signal_cte(nch: int = 4) -> str:
    return SIGNAL_CTE.format(nch=nch)
