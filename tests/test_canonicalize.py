"""Canonicalization + Zompist rewrite chain vectors.

Expected values are hand-traced through the 13-rule chain in rule order
(/root/reference/src/phonetic/rules.rs; single-pass application semantics
documented at functions/canonicalize.ZOMPIST_RULES).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.canonicalize import (
    ZOMPIST_RULES,
    canon_text,
    phonetic_canon,
    zompist_canon,
)


def _apply(spark, fn, words):
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    return {r.w: r.k for r in df.select("w", fn("w").alias("k")).collect()}


VECTORS = {
    "church": "CurC",     # rule 1 fires twice (reference: church -> çurç)
    "shape": "Sap",       # sh -> S, silent final e
    "phone": "fon",       # ph -> f, silent final e
    "cell": "sell",       # c -> s before e
    "city": "sitz",       # c -> s before i, then y -> z
    "cat": "kat",         # c -> k elsewhere
    "gem": "jem",         # g -> j before e
    "light": "lit",       # gh -> ∅
    "the": "t",           # th -> t, silent final e
    "quick": "quikk",     # c -> k, then qu -> kw -> qu round-trip (101+102)
    "kwik": "quik",       # original kw becomes qu
    "box": "bozz",        # x -> yy, then y -> z (twice)
    "scan": "skan",
}


def test_zompist_vectors(spark):
    got = _apply(spark, zompist_canon, list(VECTORS))
    assert got == VECTORS


def test_zompist_matches_pure_python_chain(spark):
    """The column chain must equal a direct re.sub chain (same patterns,
    same order) — guards against engine regex-semantics drift."""
    import re

    words = ["church", "racecar", "highlight", "exchange", "quixotic",
             "psyche", "ceiling", "gigge", "aaa", ""]
    got = _apply(spark, zompist_canon, [w for w in words if w])
    for w in words:
        if not w:
            continue
        exp = w
        for pat, rep in ZOMPIST_RULES:
            exp = re.sub(pat, rep, exp)
        assert got[w] == exp, (w, got[w], exp)


def test_canon_text(spark):
    got = _apply(spark, canon_text, ["  A  b\t c  "])
    assert got["  A  b\t c  "] == "a b c"


def test_phonetic_canon_still_stable(spark):
    # the compact stand-in chain remains available for the pipeline flag
    got = _apply(spark, phonetic_canon, ["quick", "phone", "accent"])
    assert got["quick"] == "kwik"
    assert got["phone"] == "fone"
