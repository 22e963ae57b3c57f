"""Prefix (autocomplete) fuzzy matching vs brute-force oracle.

Reference semantics: terms whose prefix is within n of the query match;
distance is the best prefix distance (/root/reference/src/transducer/
ordered_query.rs:320, state.rs:264-281 infer_prefix_distance).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from liblevenshtein_rust_spark.functions.distance import (
    STANDARD,
    TRANSPOSITION,
    batch_prefix_distance,
    distance_py,
)
from liblevenshtein_rust_spark.operators.fuzzy_join import (
    build_dictionary,
    fuzzy_prefix_join,
)

DICT = ["get", "getter", "getting", "goto", "grid", "great", "test",
        "testing", "tests", "a", "ab", "x"]


def prefix_distance_py(q: str, t: str, variant=STANDARD) -> int:
    return min(distance_py(q, t[:j], variant) for j in range(len(t) + 1))


@pytest.mark.parametrize("q,t,variant,n", [
    ("get", "getter", STANDARD, 0),       # exact prefix
    ("gte", "getter", TRANSPOSITION, 1),  # swapped prefix
    ("gt", "getter", STANDARD, 1),        # deletion in prefix
    ("xyz", "getter", STANDARD, 3),
    ("", "anything", STANDARD, 0),
    ("abc", "", STANDARD, 3),
])
def test_prefix_kernel_golden(q, t, variant, n):
    exp = prefix_distance_py(q, t, variant)
    assert exp == n
    got = batch_prefix_distance(pd.Series([q]), pd.Series([t]), max(n, 1), variant)
    assert got[0] == min(exp, max(n, 1) + 1)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abg", min_size=0, max_size=6),
       st.text(alphabet="abg", min_size=0, max_size=10))
def test_property_prefix_kernel(q, t):
    for variant in (STANDARD, TRANSPOSITION):
        exp = prefix_distance_py(q, t, variant)
        for n in (1, 2, 3):
            got = int(batch_prefix_distance(
                pd.Series([q]), pd.Series([t]), n, variant)[0])
            assert got == min(exp, n + 1), (q, t, variant, n)


@pytest.mark.parametrize("n", [0, 1, 2])
def test_prefix_join_equals_bruteforce(spark, n):
    d = build_dictionary(spark.createDataFrame([(t,) for t in DICT], ["text"]))
    queries = ["get", "gte", "tes", "xyz", "gri", "a", ""]
    q = spark.createDataFrame([(x, x) for x in queries], ["q_id", "q_text"])
    got = {
        (r.q_text, r.term, r.distance)
        for r in fuzzy_prefix_join(q, d, n=n).collect()
    }
    exp = set()
    for qq in queries:
        for t in DICT:
            dd = prefix_distance_py(qq, t)
            if dd <= n:
                exp.add((qq, t, dd))
    assert got == exp
