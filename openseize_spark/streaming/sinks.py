"""Incremental streaming sinks: foreachBatch MERGE-shape upsert.

The missing piece between the memory-sink equivalence gates (windows.py)
and the batch ``cdc_apply`` operator: a stream that maintains a keyed
TARGET TABLE across micro-batches.  Structured Streaming's built-in
sinks append or overwrite whole results; real pipelines upsert — each
micro-batch's per-key aggregate merges into the accumulated state
(``MERGE INTO`` on Delta/Iceberg; here a full-outer join + atomic
directory swap over parquet, the same logical plan).

Correctness contract: the per-key merge functions are commutative and
associative (max for last-seen, sum for counts/totals), so the final
target is independent of micro-batch boundaries and arrival order —
which is exactly what the driver gate checks (stream over N-file
source == one-shot batch GROUP BY).

Scale shape: each micro-batch costs one map-side-combined aggregation
of the batch (small) plus one full-outer join against the target keyed
on the merge key — the join shuffles the DELTA, and the target can be
bucketed by the key to make the merge shuffle-free on the target side.
At 100 TB you would point this at a Delta/Iceberg MERGE instead of the
parquet swap; the streaming topology is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_user_state(
    spark,
    src_dir: str,
    schema,
    target_dir: str,
    key_col: str = "user_id",
    query_name: str = "stream_upsert",
) -> DataFrame:
    """Drive a parquet directory through a one-file-per-trigger stream,
    merging each micro-batch's per-key aggregate (last_seen = max ts,
    n_events = count, sum_value = sum) into a parquet target via
    foreachBatch.  Returns the final target as a DataFrame.

    The target swap is write-to-new-dir + atomic rename, so a batch
    never reads the directory it is overwriting.

    NULL merge keys are dropped up front: a NULL key never equi-joins,
    so it would re-insert per batch instead of merging — the same rule
    MERGE INTO enforces.
    """
    state_dir = os.path.join(target_dir, "state")
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        if os.path.exists(state_dir):
            cur = spark.read.parquet(state_dir)
            merged = (
                cur.alias("t")
                .join(agg.alias("s"), on=key_col, how="full_outer")
                .select(
                    F.col(key_col),
                    F.greatest(
                        F.col("t.last_seen"), F.col("s.last_seen")
                    ).alias("last_seen"),
                    (
                        F.coalesce(F.col("t.n_events"), F.lit(0))
                        + F.coalesce(F.col("s.n_events"), F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(F.col("t.sum_value"), F.lit(0.0))
                        + F.coalesce(F.col("s.sum_value"), F.lit(0.0))
                    ).alias("sum_value"),
                )
            )
        else:
            merged = agg
        new_dir = state_dir + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(new_dir)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(new_dir, state_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not os.path.exists(state_dir):
        # zero micro-batches (empty source): the keyed target is empty,
        # same as the batch GROUP BY over no rows
        empty = spark.createDataFrame([], schema)
        return empty.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    return spark.read.parquet(state_dir)


def asof_enrich(
    spark,
    src_dir: str,
    schema,
    static_right: DataFrame,
    target_dir: str,
    query_name: str = "stream_asof",
) -> DataFrame:
    """Point-in-time-correct streaming feature enrichment: each
    micro-batch's purchase rows are as-of joined (backward) against a
    STATIC click-history table via the batch
    ``operators/relational.asof_join`` inside ``foreachBatch`` — the
    feature-store rule that a training feature may only use information
    available AT event time, applied on the ingest path.

    Why the gate can check it: the enrichment of a row depends only on
    that row and the static table, so the accumulated output is
    provably independent of micro-batch boundaries (unlike windowed
    aggregates, there is no cross-row state) — stream over an N-file
    source must equal the one-shot batch as-of join, which is exactly
    what the oracle and the boundary-invariance pytest assert.

    Scale shape: per batch one tagged-union window pass keyed on
    user — the static side would be broadcast or pre-bucketed on the
    key at 100 TB; output appends, no target rewrite.  Returns the
    accumulated (event_id, ts, user_id, lag_us) rows.

    The output and checkpoint directories are derived from
    ``query_name`` (r11 advice fix: a fixed ``asof_out`` subdir plus a
    checkpoint-less start meant two concurrent invocations sharing a
    target_dir would rmtree and append into each other's output).
    Callers running concurrent streams pass distinct query_names.
    """
    from openseize_spark.operators.relational import asof_join

    out_dir = os.path.join(target_dir, f"{query_name}_out")
    ckpt_dir = os.path.join(target_dir, f"{query_name}_ckpt")
    for d in (out_dir, ckpt_dir):
        if os.path.exists(d):
            shutil.rmtree(d)

    def enrich_batch(batch_df: DataFrame, batch_id: int) -> None:
        purchases = batch_df.filter(
            F.col("event_type") == "purchase"
        ).select("user_id", "event_id", "ts")
        joined = asof_join(
            purchases,
            static_right,
            on="user_id",
            left_t="ts",
            right_t="ts",
            payload=["event_id"],
            suffix="_click",
        )
        joined.select(
            "user_id",
            "event_id",
            "ts",
            (F.unix_micros("ts") - F.unix_micros("ts_click")).alias(
                "lag_us"
            ),
        ).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(enrich_batch)
        .queryName(query_name)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    if not os.path.exists(out_dir):
        return spark.createDataFrame(
            [],
            "user_id bigint, event_id bigint, ts timestamp,"
            " lag_us bigint",
        )
    return spark.read.parquet(out_dir)
