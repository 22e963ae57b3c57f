"""Restricted-substitution (zero-cost pair) semantics.

Mirrors the reference's SubstitutionSet behavior
(/root/reference/src/transducer/substitution_set.rs: with f~p allowed,
"fone" matches "phone" at distance 1) across the pure DP, the batch
kernel, and the blocked fuzzy join.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from liblevenshtein_rust_spark.functions.distance import (
    STANDARD,
    TRANSPOSITION,
    batch_distance,
    levenshtein_py,
    transposition_py,
)
from liblevenshtein_rust_spark.functions.substitutions import SubstitutionSet
from liblevenshtein_rust_spark.operators.fuzzy_join import build_dictionary, fuzzy_join

PHON = SubstitutionSet.phonetic_basic()
PHON_CP = PHON.codepoint_pairs()
PHON_CH = PHON.pairs


def test_fone_phone_reference_example():
    # substitution_set.rs docs: "fone" matches "phone" with distance 1
    assert levenshtein_py("fone", "phone", PHON_CH) == 1
    got = batch_distance(pd.Series(["fone"]), pd.Series(["phone"]), 1,
                         STANDARD, PHON_CP)
    assert got[0] == 1


def test_zero_cost_pair_is_free():
    assert levenshtein_py("cat", "kat", PHON_CH) == 0
    assert levenshtein_py("cat", "kat") == 1
    got = batch_distance(pd.Series(["cat"]), pd.Series(["kat"]), 2,
                         STANDARD, PHON_CP)
    assert got[0] == 0


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="fpcksz", min_size=0, max_size=8),
       st.text(alphabet="fpcksz", min_size=0, max_size=8))
def test_property_batch_equals_py_with_subst(a, b):
    for variant, py in ((STANDARD, levenshtein_py), (TRANSPOSITION, transposition_py)):
        exp = py(a, b, PHON_CH)
        got = int(batch_distance(pd.Series([a]), pd.Series([b]), 3,
                                 variant, PHON_CP)[0])
        assert got == min(exp, 4), (a, b, variant)


def test_fuzzy_join_with_substitutions(spark):
    terms = ["phone", "cat", "dogs", "zone", "seat"]
    d = build_dictionary(spark.createDataFrame([(t,) for t in terms], ["text"]))
    q = spark.createDataFrame([("fone", "fone"), ("kat", "kat")], ["q_id", "q_text"])
    got = {
        (r.q_text, r.term, r.distance)
        for r in fuzzy_join(q, d, n=1, method="deletion",
                            substitutions=PHON).collect()
    }
    exp = set()
    for qq in ("fone", "kat"):
        for t in terms:
            dd = levenshtein_py(qq, t, PHON_CH)
            if dd <= 1:
                exp.add((qq, t, dd))
    assert got == exp
    assert ("fone", "phone", 1) in got
    assert ("kat", "cat", 0) in got
