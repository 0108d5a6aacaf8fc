"""Annotation readers + path metadata utilities.

reference: file_io/annotations.py:42-127 (Pinnacle tab-CSV with 6 header
rows), file_io/bases.py:278-299 (Annotation dataclass), :364-395 (label
filter), file_io/path_utils.py (regex pairing/metadata).

Annotations are small metadata (thousands of rows, not TBs): the scan is
a plain Spark CSV read with a header offset; downstream interval joins
broadcast them against the 100-TB signal side
(operators/relational.mask_from_annotations).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANNOTATION_SCHEMA = "recording_id string, label string, time double, duration double, channel string"


def read_pinnacle(
    spark: SparkSession,
    path: str,
    start: int = 6,
    labels: list[str] | None = None,
    recording_id: str | None = None,
) -> DataFrame:
    """Pinnacle CSV scan: tab-delimited, `start` metadata rows before the
    column header (reference: file_io/annotations.py:42-127).

    Output: (recording_id, label, time, duration, channel) with time =
    seconds from recording start and duration = end - start seconds
    (reference: annotations.py:116-122).
    """
    # skip the metadata preamble spark-side: read as text, drop rows
    # before the header row, re-parse as csv.  The row-number window is
    # partitioned per source file (annotations are small metadata, but
    # this keeps the plan free of SinglePartition exchanges and scales
    # to a many-file annotation directory); within a file,
    # monotonically_increasing_id orders by (partition, offset) = file
    # order for text reads.
    raw = spark.read.text(path)
    from pyspark.sql.window import Window

    idx = F.row_number().over(
        Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
    )
    body = (
        raw.withColumn("_i", idx)
        .filter(F.col("_i") > start)
        .drop("_i")
    )
    header = body.limit(1).collect()[0][0].split("\t")
    cols = [c.strip() for c in header]
    parsed = (
        body.filter(F.col("value") != "\t".join(header))
        .select(F.split(F.col("value"), "\t").alias("f"))
        .select(*[F.col("f")[i].alias(cols[i]) for i in range(len(cols))])
    )
    rid = recording_id or path.rsplit("/", 1)[-1]
    out = parsed.select(
        F.lit(rid).alias("recording_id"),
        F.col("Annotation").alias("label"),
        F.col("Time From Start").cast("double").alias("time"),
        (
            F.to_timestamp(F.col("End Time"), "MM/dd/yy HH:mm:ss.SSSS").cast("double")
            - F.to_timestamp(F.col("Start Time"), "MM/dd/yy HH:mm:ss.SSSS").cast("double")
        ).alias("duration"),
        F.col("Channel").alias("channel"),
    )
    if labels:
        out = out.filter(F.col("label").isin(labels))
    return out


def write_pinnacle_fixture(path: str, annotations: list[tuple]) -> None:
    """Test helper: write a Pinnacle-format file
    (number=, start/end times, 6 preamble rows then header)."""
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)
    with open(path, "w") as f:
        for i in range(6):
            f.write(f"meta{i}\tx\n")
        f.write("Number\tStart Time\tEnd Time\tTime From Start\tChannel\tAnnotation\n")
        for i, (label, time, duration, channel) in enumerate(annotations):
            st = t0 + dt.timedelta(seconds=time)
            en = t0 + dt.timedelta(seconds=time + duration)

            def stamp(d):
                return d.strftime("%m/%d/%y %H:%M:%S") + f".{d.microsecond // 100:04d}"

            f.write(
                f"{i}\t{stamp(st)}\t{stamp(en)}\t{time}\t{channel}\t{label}\n"
            )


# ------------------------------------------------------- path metadata
def path_metadata(df: DataFrame, **patterns: str) -> DataFrame:
    """Extract regex metadata from file paths
    (reference: file_io/path_utils.py:142-183 metadata).

    Adds one column per named pattern via regexp_extract on
    input_file_name() — runs at scan time, fully codegen'd.
    """
    out = df.withColumn("_path", F.input_file_name())
    for name, pat in patterns.items():
        out = out.withColumn(name, F.regexp_extract("_path", pat, 1))
    return out.drop("_path")


def pair_paths(a: DataFrame, b: DataFrame, pattern: str) -> DataFrame:
    """Pair data/annotation path DataFrames (`path_a` / `path_b` columns)
    by a shared regex stem (reference: file_io/path_utils.py:16-76
    re_match): equi-join on the extracted key.  At catalog scale one side
    (annotation listings) is small — Spark broadcasts it under AQE."""
    ka = a.withColumn("key", F.regexp_extract("path_a", pattern, 1))
    kb = b.withColumn("key", F.regexp_extract("path_b", pattern, 1))
    return ka.join(kb, on="key", how="inner").select("key", "path_a", "path_b")


def pair_files(
    spark: SparkSession, paths_a: list[str], paths_b: list[str], pattern: str
) -> DataFrame:
    """List convenience wrapper over pair_paths."""
    a = spark.createDataFrame([(p,) for p in paths_a], "path_a string")
    b = spark.createDataFrame([(p,) for p in paths_b], "path_b string")
    return pair_paths(a, b, pattern)


def mismatched_paths(a: DataFrame, b: DataFrame, pattern: str) -> DataFrame:
    """Paths without a partner (reference: path_utils.py:78-101) —
    full-outer join on the extracted stem where one side is null."""
    ka = a.withColumn("key", F.regexp_extract("path_a", pattern, 1))
    kb = b.withColumn("key", F.regexp_extract("path_b", pattern, 1))
    j = ka.join(kb, on="key", how="full_outer")
    return j.filter(F.col("path_a").isNull() | F.col("path_b").isNull()).select(
        "key", "path_a", "path_b"
    )


def mismatched(
    spark: SparkSession, paths_a: list[str], paths_b: list[str], pattern: str
) -> DataFrame:
    """List convenience wrapper over mismatched_paths."""
    a = spark.createDataFrame([(p,) for p in paths_a], "path_a string")
    b = spark.createDataFrame([(p,) for p in paths_b], "path_b string")
    return mismatched_paths(a, b, pattern)
