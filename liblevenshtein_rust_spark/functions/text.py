"""Text-analysis column functions for training-data pipelines.

Token counting, quality counts, language-ID heuristic, fingerprinting —
all pure column expressions (JVM, codegen). Counts are integers so that
downstream comparisons and oracles never touch floats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.canonicalize import canon_text

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")


def token_count(col: str) -> Column:
    """Whitespace token count of canonical text (0 for empty)."""
    c = canon_text(col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, " ")))


def stopword_count(col: str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    c = canon_text(col)
    return F.size(F.filter(F.split(c, " "), lambda w: w.isin(*stopwords)))


def punct_count(col: str) -> Column:
    c = F.col(col)
    return (F.length(c) - F.length(F.regexp_replace(c, r"[\p{Punct}]", ""))).cast("int")


def digit_count(col: str) -> Column:
    c = F.col(col)
    return (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast("int")


def cjk_count(col: str) -> Column:
    c = F.col(col)
    return (F.length(c) - F.length(F.regexp_replace(c, r"[一-鿿぀-ヿ]", ""))).cast("int")


def lang_id(col: str) -> Column:
    """Tiny deterministic language heuristic: CJK chars -> 'cjk',
    >=1 English stopword -> 'en', else 'other'. (A production system
    plugs a real n-gram model into the same column slot.)"""
    return (
        F.when(cjk_count(col) > 0, "cjk")
        .when(stopword_count(col) >= 1, "en")
        .otherwise("other")
    )


def fingerprint(col: str) -> Column:
    """Canonical-text content fingerprint (md5 hex) — the document analog
    of the dictionary term_id."""
    return F.md5(F.encode(canon_text(col), "UTF-8"))


def quality_counts(df, id_col: str = "doc_id", text_col: str = "text"):
    """Integer quality features per doc."""
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("int").alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        stopword_count(text_col).alias("n_stop"),
        punct_count(text_col).alias("n_punct"),
        digit_count(text_col).alias("n_digit"),
    )


def quality_score(df, id_col: str = "doc_id", text_col: str = "text", *,
                  min_tokens: int = 5, max_punct_milli: int = 200,
                  min_stop_milli: int = 20):
    """Composite document-quality gate (the C4/Gopher-style rule family):
    integer milli-ratios (floor division — float-free, oracle-exact) plus
    a keep/drop verdict.

    keep = n_tokens >= min_tokens
           AND punct_milli <= max_punct_milli   (punctuation density)
           AND stop_milli >= min_stop_milli     (stopword density — a
           natural-language-ness signal; gibberish and code score ~0).

    Output: (id_col, n_tokens, stop_milli, punct_milli, keep). All column
    expressions, whole-stage codegen."""
    q = quality_counts(df, id_col, text_col)
    q = q.select(
        id_col, "n_tokens",
        F.expr("CAST(1000 * n_stop DIV greatest(n_tokens, 1) AS INT)")
        .alias("stop_milli"),
        F.expr("CAST(1000 * n_punct DIV greatest(n_chars, 1) AS INT)")
        .alias("punct_milli"),
    )
    return q.withColumn(
        "keep",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_milli") <= max_punct_milli)
        & (F.col("stop_milli") >= min_stop_milli))
