"""Distance-kernel parity tests.

Mirrors the reference's test strategy (/root/reference/src/distance/mod.rs
tests at :752-963 and the recursive-vs-iterative cross-validation at
:817-869): golden vectors ported verbatim, plus hypothesis property tests
that the vectorized banded batch kernel equals the pure-Python DP oracles,
which in turn equal a direct port of the reference's memoized recursion
for merge_and_split.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from liblevenshtein_rust_spark.functions.distance import (
    MERGE_AND_SPLIT,
    STANDARD,
    TRANSPOSITION,
    batch_distance,
    distance_py,
    levenshtein_py,
    merge_and_split_py,
    transposition_py,
)

# Golden vectors ported from the reference's unit tests
# (/root/reference/src/distance/mod.rs:752-963, :620-622).
GOLDEN = [
    ("test", "test", STANDARD, 0),
    ("", "", STANDARD, 0),
    ("", "test", STANDARD, 4),
    ("test", "", STANDARD, 4),
    ("kitten", "sitting", STANDARD, 3),
    ("saturday", "sunday", STANDARD, 3),
    ("test", "best", STANDARD, 1),
    ("test", "tset", STANDARD, 2),
    ("commonprefix_abc", "commonprefix_def", STANDARD, 3),
    ("café", "cafe", STANDARD, 1),
    ("日本", "日本", STANDARD, 0),
    ("", "¡", STANDARD, 1),
    ("ab", "ba", TRANSPOSITION, 1),
    ("test", "tset", TRANSPOSITION, 1),
    ("abc", "acb", TRANSPOSITION, 1),
    ("kitten", "sitting", TRANSPOSITION, 3),
    ("日本", "本日", TRANSPOSITION, 1),
    ("", "", MERGE_AND_SPLIT, 0),
    ("a", "a", MERGE_AND_SPLIT, 0),
    ("", "test", MERGE_AND_SPLIT, 4),
    ("test", "", MERGE_AND_SPLIT, 4),
    ("test", "best", MERGE_AND_SPLIT, 1),
    ("m", "rn", MERGE_AND_SPLIT, 1),   # split
    ("rn", "m", MERGE_AND_SPLIT, 1),   # merge
]


# --- direct port of the reference's merge_and_split recursion -------------
# (/root/reference/src/distance/mod.rs:624-730) used purely as a second,
# independent oracle to cross-validate merge_and_split_py.

@functools.lru_cache(maxsize=None)
def _ms_ref(source: str, target: str) -> int:
    if source > target:  # symmetric cache key, like SymmetricPair
        source, target = target, source
    return _ms_ref_inner(source, target)


@functools.lru_cache(maxsize=None)
def _ms_ref_inner(source: str, target: str) -> int:
    if not source:
        return len(target)
    if not target:
        return len(source)
    # strip common affixes
    la, lb = len(source), len(target)
    p = 0
    m = min(la, lb)
    while p < m and source[p] == target[p]:
        p += 1
    if p == m:
        # one string is a prefix of the other: one adjusted length is 0
        return (la - p) + (lb - p)
    s_fx = 0
    while s_fx < (m - p) and source[la - 1 - s_fx] == target[lb - 1 - s_fx]:
        s_fx += 1
    s_rem = source[p:la - s_fx]
    t_rem = target[p:lb - s_fx]
    if not s_rem and not t_rem:
        return 0
    if not s_rem:
        return len(t_rem)
    if not t_rem:
        return len(s_rem)
    a, b = s_rem[0], t_rem[0]
    s, t = s_rem[1:], t_rem[1:]
    if a == b:
        return _ms_ref_inner(s, t)
    d = _ms_ref_inner(s, t_rem)           # delete
    d = min(d, _ms_ref_inner(s_rem, t))   # insert
    d = min(d, _ms_ref_inner(s, t))       # substitute
    if len(t_rem) > 1:
        d = min(d, _ms_ref_inner(s, t_rem[2:]))   # split
    if len(s_rem) > 1:
        d = min(d, _ms_ref_inner(s_rem[2:], t))   # merge
    return d + 1


@pytest.mark.parametrize("a,b,variant,expected", GOLDEN)
def test_golden_vectors_python(a, b, variant, expected):
    assert distance_py(a, b, variant) == expected


@pytest.mark.parametrize("a,b,variant,expected", GOLDEN)
def test_golden_vectors_batch(a, b, variant, expected):
    for n in range(max(expected, 1), 8):
        got = batch_distance(pd.Series([a]), pd.Series([b]), n, variant)[0]
        assert got == expected, (a, b, variant, n, got)


def test_batch_over_threshold_sentinel():
    got = batch_distance(pd.Series(["kitten"]), pd.Series(["sitting"]), 2, STANDARD)
    assert got[0] == 3  # n+1 sentinel
    got = batch_distance(pd.Series(["abcdefgh"]), pd.Series(["zzzz"]), 2, STANDARD)
    assert got[0] == 3


def test_symmetry_merge_and_split():
    assert merge_and_split_py("abc", "def") == merge_and_split_py("def", "abc")
    assert _ms_ref("abc", "def") == _ms_ref("def", "abc")


WORDS = st.text(alphabet="abcdef", min_size=0, max_size=12)
UNI = st.text(alphabet="abcé日¡ö", min_size=0, max_size=8)


@settings(max_examples=400, deadline=None)
@given(WORDS, WORDS)
def test_property_standard_batch_equals_py(a, b):
    exp = levenshtein_py(a, b)
    for n in (1, 2, 3, 7):
        got = int(batch_distance(pd.Series([a]), pd.Series([b]), n, STANDARD)[0])
        assert got == min(exp, n + 1)


@settings(max_examples=400, deadline=None)
@given(WORDS, WORDS)
def test_property_transposition_batch_equals_py(a, b):
    exp = transposition_py(a, b)
    for n in (1, 2, 3, 7):
        got = int(batch_distance(pd.Series([a]), pd.Series([b]), n, TRANSPOSITION)[0])
        assert got == min(exp, n + 1)


@settings(max_examples=400, deadline=None)
@given(WORDS, WORDS)
def test_property_merge_split_py_equals_reference_recursion(a, b):
    assert merge_and_split_py(a, b) == _ms_ref(a, b)


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_property_merge_split_batch_equals_py(a, b):
    exp = merge_and_split_py(a, b)
    for n in (1, 2, 3, 7):
        got = int(batch_distance(pd.Series([a]), pd.Series([b]), n, MERGE_AND_SPLIT)[0])
        assert got == min(exp, n + 1)


@settings(max_examples=200, deadline=None)
@given(UNI, UNI)
def test_property_unicode_batch(a, b):
    for variant, py in ((STANDARD, levenshtein_py), (TRANSPOSITION, transposition_py)):
        exp = py(a, b)
        got = int(batch_distance(pd.Series([a]), pd.Series([b]), 3, variant)[0])
        assert got == min(exp, 4)


def test_batch_mixed_batch_consistency():
    rng = np.random.default_rng(42)
    vocab = ["kitten", "sitting", "test", "tset", "best", "", "café", "cafe",
             "abcde", "abcd", "ab", "ba", "rn", "m", "日本", "本日",
             "the quick brown fox jumps", "the quick brown fx jumps"]
    a = pd.Series(rng.choice(vocab, 500))
    b = pd.Series(rng.choice(vocab, 500))
    for variant in (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT):
        got = batch_distance(a, b, 3, variant)
        for i in range(len(a)):
            assert got[i] == min(distance_py(a[i], b[i], variant), 4), (
                a[i], b[i], variant, got[i])
