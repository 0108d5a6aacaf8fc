"""Streaming deduplication: the streaming analog of llm/dedup.exact_dedup.

A document stream is fingerprinted (md5 over normalized text — identical
to the batch operator) and deduplicated with
``dropDuplicatesWithinWatermark``: state holds one fingerprint per
watermark horizon, so memory is bounded by arrival rate x watermark
instead of corpus size — the only viable shape for an unbounded stream.
Exactly-once semantics within the watermark; duplicates farther apart
than the watermark pass through (documented trade: bounded state vs
global uniqueness — global dedup is the batch operator's job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseize_spark.llm.dedup import normalize_text


def streaming_exact_dedup(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Keep one arrival of each distinct normalized text within the
    watermark horizon.  Input must carry an event-time column.  Across
    micro-batches the earlier batch wins; within one micro-batch the
    surviving row is the first in batch order, which is not necessarily
    the earliest by event time."""
    fp = docs.withColumn("_fp", F.md5(normalize_text(F.col(text_col))))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["_fp"]
    ).drop("_fp")


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Session windows per key: a session closes after ``gap`` of
    inactivity — the streaming analog of the batch lag-based sessionize
    query, expressed with the native ``session_window`` aggregation
    (state bounded by open sessions + watermark, merged incrementally).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
