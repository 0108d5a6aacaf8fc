"""Mergeable counting sketches for corpus statistics at 100 TB.

Count-Min (Cormode & Muthukrishnan 2005): a depth x width grid of
counters; each item increments one counter per row (row-salted hash),
a point estimate is the MIN over rows — always an overestimate, with
error <= eps * total_count at probability 1 - delta for
width = e/eps, depth = ln(1/delta).

Why it matters at scale: the sketch is a *mergeable partial aggregate* —
per-partition sketches combine by cell-wise addition, so the shuffle
carries depth*width counters per partition instead of the vocabulary.
Spark's partial+final hash aggregation does the merge for free because
the sketch IS a groupBy((row, bucket)) count.

Why it is oracle-checkable when HLL/approx_percentile are not: the
hash placement is the same portable salted md5 the sampling family
uses, so DuckDB replays the exact same grid — the "approximation" is
deterministic given the hash functions, only its *relation to the true
count* is probabilistic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseize_spark.llm.dedup import normalize_text
from openseize_spark.llm.sampling import salted_hash, salted_hash_sql


def _bucket_py(word: str, row: int, width: int, seed: str) -> int:
    """Driver-side replica of the row-salted bucket hash (same md5 form
    as sampling.salted_hash, so Spark / DuckDB / Python agree)."""
    h = int(hashlib.md5(f"{seed}:{row}:{word}".encode()).hexdigest()[:8], 16)
    return h % width


def countmin_sketch(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    seed: str = "cm",
) -> DataFrame:
    """Build the Count-Min grid over the corpus token stream.

    One explode to tokens, one generated ``depth``-way explode to grid
    cells, one groupBy((row, bucket)) count — map-side partial combine
    bounds the shuffle at depth*width rows per task regardless of
    corpus size.  Returns (row, bucket, cnt), at most depth*width rows.
    """
    wc = _word_counts(docs, text_col)
    return _sketch_from_word_counts(wc, depth, width, seed)


def _word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    norm = normalize_text(F.col(text_col))
    words = F.filter(F.split(norm, " "), lambda s: F.length(s) > 0)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(words).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").cast("bigint").alias("_c"))
    )


def _sketch_from_word_counts(
    wc: DataFrame, depth: int, width: int, seed: str
) -> DataFrame:
    # hash per DISTINCT word weighted by its count, not per token — the
    # md5 work drops from O(tokens) to O(vocabulary) and the cell counts
    # are identical
    cells = wc.select(
        "_c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        (salted_hash(F.col("_w"), f"{seed}:{r}") % width)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        cells.select("cell.row", "cell.bucket", "_c")
        .groupBy("row", "bucket")
        .agg(F.sum("_c").cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    docs: DataFrame,
    probe_words: list[str],
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    seed: str = "cm",
) -> DataFrame:
    """Point-estimate probe: sketch the corpus, then estimate the count
    of each probe word as min over rows of its cell, next to the exact
    count.  est >= exact always (Count-Min never under-counts).

    The probe table is built driver-side (the bucket hash is plain md5,
    computed identically in Python) and broadcast — the sketch side is
    at most depth*width rows, so the whole estimate join is broadcast
    territory.  Returns (word, est, exact).
    """
    spark = docs.sparkSession
    # the word-count table feeds both the sketch and the exact counts;
    # checkpoint so the corpus explode runs once (GC-released)
    wc = _word_counts(docs, text_col).localCheckpoint(eager=False)
    sk = _sketch_from_word_counts(wc, depth, width, seed)
    probes = spark.createDataFrame(
        [
            (w, r, _bucket_py(w, r, width, seed))
            for w in probe_words
            for r in range(depth)
        ],
        "word string, row int, bucket int",
    )
    est = (
        probes.join(sk, on=["row", "bucket"], how="left")
        .na.fill({"cnt": 0})
        .groupBy("word")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    exact = wc.select(F.col("_w").alias("word"), F.col("_c").alias("exact"))
    return (
        est.join(exact, on="word", how="left")
        .na.fill({"exact": 0})
        .select("word", "est", "exact")
    )


def countmin_estimate_oracle_sql(
    probe_words: list[str],
    depth: int = 4,
    width: int = 256,
    seed: str = "cm",
) -> str:
    """DuckDB replay of :func:`countmin_estimate`: the same salted-md5
    grid placement, min-over-rows estimate, and exact counts."""
    arms = "\n          UNION ALL ".join(
        f"SELECT {r} AS row, ({salted_hash_sql('w', f'{seed}:{r}')}) % {width}"
        f" AS bucket FROM toks" for r in range(depth)
    )
    probes = ", ".join(
        f"('{w.replace(chr(39), chr(39) * 2)}', {r}, {_bucket_py(w, r, width, seed)})"
        for w in probe_words
        for r in range(depth)
    )
    return f"""
        WITH toks AS MATERIALIZED (
          SELECT u.w AS w
          FROM (
            SELECT string_split(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '
                   ) AS wl
            FROM documents WHERE text IS NOT NULL
          ), unnest(wl) AS u(w)
          WHERE len(u.w) > 0
        ), cells AS (
          {arms}
        ), sk AS (
          SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM cells GROUP BY row, bucket
        ), probes (word, row, bucket) AS (VALUES {probes}),
        est AS (
          SELECT word, CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
          FROM probes LEFT JOIN sk USING (row, bucket)
          GROUP BY word
        ), exact AS (
          SELECT w AS word, CAST(count(*) AS BIGINT) AS exact
          FROM toks GROUP BY w
        )
        SELECT est.word, est.est, COALESCE(exact.exact, 0) AS exact
        FROM est LEFT JOIN exact USING (word)"""
