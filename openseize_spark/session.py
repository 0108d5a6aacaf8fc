"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we would set cluster-side: AQE on (runtime
partition coalescing + skew-join handling), shuffle partitions sized to
cores rather than the 200 default, Arrow enabled for the Pandas-UDF kernel
path, UTC session timezone so results compare bit-for-bit against the
DuckDB oracle.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openseize_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Respects ``SPARK_GRAFT_CPUS`` for local core count.  On a real cluster
    the master/resource settings come from spark-submit; everything set here
    is safe cluster-side too.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # MinHash signatures aggregate 64 universal-hash min() columns in
        # one pass; default maxFields=100 silently drops that stage out of
        # whole-stage codegen (interpreted row-at-a-time aggregation)
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def small_intermediate_coalesce(spark):
    """Scoped AQE tuning for iterative algorithms whose per-round
    intermediates shrink to hundreds of rows (pagerank, connected
    components): respect the advisory partition size instead of pinning
    coalesce at default parallelism, so each round's join/aggregate runs
    as 1-2 tasks instead of 32-64 near-empty ones.

    Scoped (not a session default) because the opposite trade-off holds
    for the compute-bound DSP kernels: their shuffles are small in BYTES
    but heavy in per-row compute, and advisory-size coalescing starves
    them of parallelism (measured +1.8 s on sosfilt_blocks_full at
    sf0.1 when set globally).  Callers must materialize the work they
    want covered (eager localCheckpoint / an action) inside the scope —
    Spark reads this conf at action time, not plan time.

    Concurrency constraint: the conf key is SESSION-global, so this
    scope assumes a serially-used SparkSession (true for the driver
    gate and bench).  Under concurrent queries on one shared session,
    another query whose action lands inside the scope inherits the
    advisory-size coalescing; a concurrent serving deployment should
    run iterative algorithms on a cloned session
    (``spark.newSession()``) so the conf flip stays isolated.
    """
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)
