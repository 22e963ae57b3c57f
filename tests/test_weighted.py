"""Weighted OperationSet kernel: oracle parity + reference vectors.

The reference's generalized automaton truncates fractional weights to
whole distance units (generalized/automaton.rs test comments: "weight
0.15 truncates to 0"); this engine keeps true float costs — the stricter
semantics — so vectors are checked against exact arithmetic, not the
truncation behavior.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from liblevenshtein_rust_spark.functions.distance import (
    levenshtein_py,
    transposition_py,
)
from liblevenshtein_rust_spark.functions.weighted import (
    WeightedOps,
    make_weighted_distance_udf,
    weighted_batch_distance,
    weighted_distance_py,
)


def _batch_one(a, b, max_cost, ops):
    return float(weighted_batch_distance(
        pd.Series([a]), pd.Series([b]), max_cost, ops)[0])


def test_unit_weights_equal_levenshtein():
    ops = WeightedOps.standard()
    for a, b in [("kitten", "sitting"), ("", "abc"), ("abc", ""),
                 ("test", "test"), ("ab", "ba"), ("café", "cafe")]:
        assert weighted_distance_py(a, b, ops) == levenshtein_py(a, b)


def test_unit_weights_with_transpose_equal_osa():
    ops = WeightedOps(transpose=1.0)
    for a, b in [("ab", "ba"), ("abcd", "acbd"), ("teh", "the"),
                 ("banana", "abnaan"), ("aa", "aa")]:
        assert weighted_distance_py(a, b, ops) == transposition_py(a, b)


def test_reference_style_vectors():
    # OCR confusion o<->0 at 0.2 (operation_type.rs 'ocr_o_zero')
    ocr = WeightedOps.ocr()
    assert math.isclose(weighted_distance_py("c0de", "code", ocr), 0.2)
    assert math.isclose(weighted_distance_py("50lid", "solid", ocr), 0.4)
    # multi-char digraph ph->f at 0.15 (operation_set.rs phonetic example)
    d = weighted_distance_py("phone", "fone", WeightedOps.standard(),
                             string_ops=(("ph", "f", 0.15),))
    assert math.isclose(d, 0.15)
    # asymmetric indels are directional
    ops = WeightedOps(insert=0.4, delete=2.0)
    assert math.isclose(weighted_distance_py("ab", "abc", ops), 0.4)
    assert math.isclose(weighted_distance_py("abc", "ab", ops), 2.0)
    # cheap inserts beat one substitution when 2*ins < sub
    ops2 = WeightedOps(insert=0.3, delete=0.3, substitute=1.0)
    assert math.isclose(weighted_distance_py("a", "b", ops2), 0.6)


_OPS = st.builds(
    WeightedOps,
    insert=st.sampled_from([0.3, 0.5, 1.0, 2.0]),
    delete=st.sampled_from([0.3, 0.5, 1.0, 2.0]),
    substitute=st.sampled_from([0.4, 1.0, 1.5]),
    transpose=st.sampled_from([None, 0.5, 1.0]),
    restricted=st.sampled_from([
        (), ((frozenset({("a", "b")}), 0.2),),
        ((frozenset({("a", "c"), ("b", "c")}), 0.1),)]),
)
_TXT = st.text(alphabet="abcd", max_size=9)


@settings(max_examples=300, deadline=None)
@given(a=_TXT, b=_TXT, ops=_OPS, mc=st.sampled_from([0.5, 1.0, 2.0, 3.5]))
def test_batch_matches_py_oracle(a, b, ops, mc):
    exact = weighted_distance_py(a, b, ops)
    got = _batch_one(a, b, mc, ops)
    if exact <= mc + 1e-9:
        assert math.isclose(got, exact, abs_tol=1e-9), (a, b, ops, mc)
    else:
        assert math.isclose(got, mc + 1.0), (a, b, ops, mc, exact)


def test_batch_vectorizes_mixed_rows():
    ops = WeightedOps.ocr()
    a = pd.Series(["c0de", "kitten", "", "same", "l0ng3r"])
    b = pd.Series(["code", "sitting", "xy", "same", "longer"])
    got = weighted_batch_distance(a, b, 3.0, ops)
    exp = [weighted_distance_py(x, y, ops) for x, y in zip(a, b)]
    exp = [e if e <= 3.0 else 4.0 for e in exp]
    assert np.allclose(got, exp)


def test_weighted_udf_in_plan(spark):
    df = spark.createDataFrame(
        [("c0de", "code"), ("kitten", "sitting"), ("zzz", "code")], ["a", "b"])
    udf = make_weighted_distance_udf(1.0, WeightedOps.ocr())
    rows = {(r.a): r.c for r in
            df.select("a", udf("a", "b").alias("c")).collect()}
    assert math.isclose(rows["c0de"], 0.2)
    assert math.isclose(rows["kitten"], 2.0)   # sentinel = max_cost + 1
    assert math.isclose(rows["zzz"], 2.0)
