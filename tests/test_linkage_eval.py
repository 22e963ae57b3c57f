"""Pairwise-F1 metric + synthetic labeled mention corpus.

The metric must equal the brute-force pair-set computation (the naive
reference-style evaluation it replaces), and the planted corpus must make
a correct d<=1 linkage score exactly F1 = 1.000 — decoys unlinked,
variants recalled.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.distance import distance_py
from liblevenshtein_rust_spark.operators.linkage_eval import pairwise_f1
from liblevenshtein_rust_spark.sources.corpus import synthetic_entity_mentions


def _brute(rows):
    """(truth, pred) rows -> (true_pairs, pred_pairs, tp) via pair sets."""
    def pair_set(key):
        groups = {}
        for i, r in enumerate(rows):
            groups.setdefault(key(r), []).append(i)
        out = set()
        for g in groups.values():
            out.update(itertools.combinations(sorted(g), 2))
        return out
    t = pair_set(lambda r: r[0])
    p = pair_set(lambda r: r[1])
    return len(t), len(p), len(t & p)


def test_metric_matches_brute_force(spark):
    # over/under-merged assignment with singletons on both sides
    rows = [("e1", "c1"), ("e1", "c1"), ("e1", "c2"), ("e2", "c2"),
            ("e2", "c2"), ("e3", "c3"), ("e4", "c3"), ("e5", "c5")]
    labeled = spark.createDataFrame(rows, "entity string, entity_id string")
    got = pairwise_f1(labeled).collect()[0]
    true_pairs, pred_pairs, tp = _brute(rows)
    assert (got.true_pairs, got.pred_pairs, got.tp) == (true_pairs, pred_pairs, tp)
    assert got.n_mentions == len(rows)
    assert got.prec_milli == 1000 * tp // pred_pairs
    assert got.rec_milli == 1000 * tp // true_pairs
    assert got.f1_milli == 2000 * tp // (pred_pairs + true_pairs)


def test_mention_corpus_separation(spark):
    """Texts are unique; cross-entity mentions never sit within d<=1 (the
    guarantee that makes f1 = 1000 PROOF of engine correctness, not luck)."""
    rows = synthetic_entity_mentions(spark, 60).collect()
    texts = [r.text for r in rows]
    assert len(set(texts)) == len(texts)
    by_ent = {}
    for r in rows:
        by_ent.setdefault(r.entity.rstrip("!"), []).append(r)
    for (ea, ra), (eb, rb) in itertools.combinations(by_ent.items(), 2):
        for a in ra:
            for b in rb:
                assert distance_py(a.text, b.text) > 1, (a, b)
    # decoys sit at exactly d=2 from their code and > 1 from every other
    # same-entity mention — never linkable at d<=1
    for r in rows:
        if r.entity.endswith("!"):
            base = r.entity[:-1]
            for o in by_ent[base]:
                if o.mention_id == base + "#0":
                    assert distance_py(r.text, o.text) == 2, (r, o)
                elif o.mention_id != r.mention_id:
                    assert distance_py(r.text, o.text) > 1, (r, o)


def test_linkage_f1_query_perfect(spark, sf_dir):
    import __spark_entry__ as entry_mod
    row = entry_mod.queries()["linkage_f1"](spark, sf_dir).collect()[0]
    assert (row.prec_milli, row.rec_milli, row.f1_milli) == (1000, 1000, 1000)
    assert row.tp == row.true_pairs == row.pred_pairs > 0
