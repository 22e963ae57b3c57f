"""Reference-scale corpus validation: recall over the reference's own
123,985-word English dictionary (/root/reference/data/english_words.txt).

The reference's flagship empirical evidence is corpus recall
(tests/corpus_validation.rs:22-28: Holbrook 86.6% @ d<=2, 100% @ d<=3;
runner :127-150). The Mitton .dat corpora are download-only and absent,
so the stand-in plants a deterministic 1..3-edit error corpus over the
same dictionary (sources/corpus.planted_error_corpus). This engine's
blocked join is exact-complete, so the published-target analog is strict:
100% recall at d=3 for planted <=3-edit errors — anything less is a
blocking bug, not a tuning miss.
"""

from __future__ import annotations

import os

import pytest

from liblevenshtein_rust_spark.sources.corpus import (
    EN_WORDS_PATH,
    load_wordlist,
    planted_error_corpus,
    recall_at_d,
)


@pytest.fixture(scope="module")
def words(spark):
    if not os.path.exists(EN_WORDS_PATH):
        pytest.skip("reference dictionary not present")
    return load_wordlist(spark, EN_WORDS_PATH).persist()


def test_dictionary_loads_at_reference_scale(words):
    # corpus_validation.rs loads 123,985 lines; load_wordlist dedupes
    # (the file has no dupes) and drops blanks
    assert words.count() == 123_985


def test_planted_corpus_shape(spark, words):
    corpus = planted_error_corpus(words).collect()
    assert 1_000 <= len(corpus) <= 3_000          # ~1.3% of the dictionary
    from liblevenshtein_rust_spark.functions.distance import levenshtein_py
    dists = [levenshtein_py(r.misspelling, r.correct) for r in corpus]
    assert min(dists) >= 1                        # never a no-op mutation
    assert max(dists) <= 3                        # <=3 planted edits
    assert {1, 2, 3} <= set(dists)                # all three error depths

def test_recall_at_reference_scale(spark, words):
    """The corpus_validation analog at full dictionary scale, through the
    real blocked fuzzy join (d<=3 over 124k natural-language terms with
    Zipfian near-neighbor density)."""
    corpus = planted_error_corpus(words)
    rows = {r.d: r for r in
            recall_at_d(corpus, words, 3, method="auto",
                        persist=True).collect()}
    total = rows[0].total
    assert total >= 1_000
    assert rows[0].found == 0                     # no planted error is free
    # exact-complete blocking: every planted <=d-edit error is found at d
    assert rows[3].found == total
    assert rows[3].recall_milli == 1000
    # monotone in d, and the intermediate thresholds are non-trivial
    assert rows[1].found <= rows[2].found <= rows[3].found
    assert 0 < rows[1].found < total
