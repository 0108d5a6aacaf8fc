"""Text analysis operators: token counting, quality scoring, language-ID
heuristics, document fingerprinting.

All pure built-in string functions (JVM codegen) — the hot path over a
100 TB documents table never enters Python.  DuckDB-oracle-checkable
versions use only arithmetic on length/replace so both engines agree
bit-for-bit (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openseize_spark.llm.dedup import normalize_text

# a small, fixed English stopword set for the ratio heuristics
STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as")


def occurrence_count(col, needle: str):
    """# occurrences of `needle` via length arithmetic — engine-portable."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count(col):
    """Whitespace token count = spaces + 1 on the collapsed form."""
    norm = normalize_text(col)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        (occurrence_count(norm, " ") + 1).cast("long")
    )


def bpe_ish_token_count(col):
    """BPE-ish upper bound: word-piece regex split (letters / digits /
    punctuation runs), ~GPT-2 pre-tokenizer shape."""
    return F.size(
        F.filter(
            F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    ).cast("long")


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: n_chars, n_tokens, avg token length,
    punctuation ratio, digit ratio, uppercase ratio, stopword score."""
    t = F.col(text_col)
    norm = normalize_text(t)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    punct = sum(occurrence_count(t, p) for p in (".", ",", "!", "?", ";", ":"))
    stop_hits = sum(occurrence_count(norm, f" {w} ") for w in STOPWORDS)
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (F.length(F.replace(norm, F.lit(" "), F.lit(""))) / F.greatest(n_tokens, F.lit(1))).alias(
            "avg_token_len"
        ),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite heuristic quality score in [0,1]: favors documents with
    reasonable length, stopword presence, and moderate punctuation —
    the standard cheap pre-filter for LLM training corpora."""
    s = text_stats(docs, text_col, id_col)
    len_score = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    punct_pen = F.when(F.col("punct_ratio") > 0.1, 0.5).otherwise(1.0)
    return s.select(
        id_col,
        ((len_score * 0.5 + stop_score * 0.5) * punct_pen).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword language heuristic over a fixed marker table.

    Scores each language by marker-word hit counts (broadcast join against
    a tiny marker DataFrame would also work; literal CASE keeps it
    codegen-only).  Returns (id, lang_pred, score).
    """
    markers = {
        "en": (" the ", " and ", " is "),
        "de": (" der ", " und ", " ist "),
        "fr": (" le ", " et ", " est "),
        "es": (" el ", " y ", " es "),
    }
    norm = F.concat(F.lit(" "), normalize_text(F.col(text_col)), F.lit(" "))
    scores = [
        sum(occurrence_count(norm, m) for m in ms).alias(f"_s_{lang}")
        for lang, ms in markers.items()
    ]
    scored = docs.select(F.col(id_col), *scores)
    langs = list(markers)
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.lit("unk")
    for l in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"_s_{l}") == best), l).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("lang_pred"), best.alias("score"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable document fingerprint: md5 of the normalized text (exact-dedup
    key; engine-portable since md5 is standardized)."""
    return docs.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
