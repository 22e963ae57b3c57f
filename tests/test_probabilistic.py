"""Fellegi-Sunter probabilistic linkage: corpus properties, comparison
vectors, EM correctness (vs an independent numpy implementation),
scoring separation, end-to-end cluster quality, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import liblevenshtein_rust_spark.operators.probabilistic as P
from liblevenshtein_rust_spark.operators.linkage_eval import pairwise_f1
from liblevenshtein_rust_spark.sources.corpus import (
    synthetic_linkage_records)

N_ENT = 300


@pytest.fixture(scope="module")
def records(spark):
    return synthetic_linkage_records(spark, N_ENT).cache()


@pytest.fixture(scope="module")
def gammas(spark, records):
    specs = P.transcript_field_specs()
    pairs = P.block_candidate_pairs(records, extra_cols=("entity",))
    return P.comparison_vectors(pairs, specs).cache()


def test_corpus_shape_and_determinism(spark, records):
    assert records.count() == 2 * N_ENT
    # regenerating yields the identical table (pure index arithmetic)
    again = synthetic_linkage_records(spark, N_ENT)
    assert records.exceptAll(again).count() == 0
    assert again.exceptAll(records).count() == 0
    # distinct entity names stay >= 6 edits apart (blocking-safe margin):
    # check every intra-block cross-entity record pair
    r = records.select("rec_id", "block", "name", "entity")
    a, b = r.alias("a"), r.alias("b")
    min_cross = (
        a.join(b, "block")
        .where("a.entity < b.entity")
        .select(F.levenshtein("a.name", "b.name").alias("d"))
        .agg(F.min("d")).collect()[0][0])
    assert min_cross >= 5  # >= 6 between codes, -1 for the deletion rec


def test_comparison_vector_levels(spark, gammas):
    # matches: name gamma follows i%2 (deletion -> level 1, else 0)
    m = gammas.where("entity_l = entity_r")
    assert m.where("g_name = 2").count() == 0
    # non-matches never look name-similar
    nm = gammas.where("entity_l != entity_r")
    assert nm.where("g_name != 2").count() == 0
    # corruption rates: city disagrees on ~1/7 of matches, phone on ~1/3
    # minus the planted-NULL overlap; the NULL rows (i % 11 == 0, which
    # takes precedence over the digit bump) land on the MISSING level,
    # never on disagreement (exact counts from the planted residues)
    n_city = m.where("g_city = 1").count()
    n_phone = m.where("g_phone = 1").count()
    n_missing = m.where("g_phone = 2").count()
    assert n_city == len([i for i in range(N_ENT) if i % 7 == 0])
    assert n_phone == len([i for i in range(N_ENT)
                           if i % 3 == 0 and i % 11 != 0])
    assert n_missing == len([i for i in range(N_ENT) if i % 11 == 0])


def _numpy_em(rows, specs, n_iter=20):
    """Independent vectorized EM implementation (same init/clamp/grid
    contract, different code path) to cross-check em_fit."""
    g = np.array([r[0] for r in rows])
    c = np.array([r[1] for r in rows], dtype=np.float64)
    lam, m0, u0 = P.default_init(specs)
    m = {s.gamma: np.array(m0[s.gamma]) for s in specs}
    u = {s.gamma: np.array(u0[s.gamma]) for s in specs}
    qc = np.vectorize(P._quant_clamp)
    for _ in range(n_iter):
        pm = np.full(len(rows), lam)
        pu = np.full(len(rows), 1.0 - lam)
        for k, s in enumerate(specs):
            pm = pm * m[s.gamma][g[:, k]]
            pu = pu * u[s.gamma][g[:, k]]
        w = pm / (pm + pu)
        wc, vc = w * c, (1.0 - w) * c
        new_m, new_u = {}, {}
        for k, s in enumerate(specs):
            new_m[s.gamma] = qc(np.array(
                [wc[g[:, k] == lvl].sum() for lvl in range(s.levels)])
                / wc.sum())
            new_u[s.gamma] = qc(np.array(
                [vc[g[:, k] == lvl].sum() for lvl in range(s.levels)])
                / vc.sum())
        lam = P._quant_clamp(wc.sum() / c.sum())
        m, u = new_m, new_u
    return lam, m, u


def test_em_matches_independent_numpy_reference(spark, gammas):
    specs = P.transcript_field_specs()
    pat = P.pattern_counts(gammas, specs).collect()
    rows = [(tuple(r[s.gamma] for s in specs), float(r["c"])) for r in pat]
    lam, m, u = P.em_fit(rows, specs)
    lam2, m2, u2 = _numpy_em(rows, specs)
    assert abs(lam - lam2) < 1e-9
    for s in specs:
        assert np.allclose(m[s.gamma], m2[s.gamma], atol=1e-9)
        assert np.allclose(u[s.gamma], u2[s.gamma], atol=1e-9)


def test_em_recovers_planted_parameters(spark, gammas):
    specs = P.transcript_field_specs()
    pat = P.pattern_counts(gammas, specs).collect()
    rows = [(tuple(r[s.gamma] for s in specs), float(r["c"])) for r in pat]
    lam, m, u = P.em_fit(rows, specs)
    n_pairs = sum(c for _, c in rows)
    # true match rate: N matches out of all intra-block pairs
    assert abs(lam - N_ENT / n_pairs) < 0.02
    # city m: matches agree unless i % 7 == 0
    true_m_city = 1 - len([i for i in range(N_ENT) if i % 7 == 0]) / N_ENT
    assert abs(m["g_city"][0] - true_m_city) < 0.05
    # phone m: matches agree unless corrupted (i % 3 == 0) or
    # unobserved (i % 11 == 0, the missing level)
    true_m_phone = len([i for i in range(N_ENT)
                        if i % 3 != 0 and i % 11 != 0]) / N_ENT
    assert abs(m["g_phone"][0] - true_m_phone) < 0.05
    # the missing level's m and u both track the planted null rate
    # (missingness is independent of match status), so its log2(m/u)
    # evidence is near zero — the FS "comparison not possible" semantics
    true_missing = len([i for i in range(N_ENT) if i % 11 == 0]) / N_ENT
    assert abs(m["g_phone"][2] - true_missing) < 0.05
    assert abs(np.log2(m["g_phone"][2] / u["g_phone"][2])) < 0.8
    # non-matches essentially never agree on name
    assert u["g_name"][2] > 0.99


def test_score_separation_and_classification(spark, gammas):
    specs = P.transcript_field_specs()
    sc = P.score_pairs(gammas, specs)
    r = sc.selectExpr(
        "min(CASE WHEN entity_l = entity_r THEN weight_milli END) wm",
        "max(CASE WHEN entity_l != entity_r THEN weight_milli END) bn",
        "sum(CASE WHEN is_match = 1 AND entity_l != entity_r "
        "THEN 1 ELSE 0 END) fp",
        "sum(CASE WHEN is_match = 0 AND entity_l = entity_r "
        "THEN 1 ELSE 0 END) fn").collect()[0]
    assert r["wm"] >= 0 > r["bn"]
    assert r["fp"] == 0 and r["fn"] == 0


def test_fs_link_end_to_end_perfect_f1(spark, records):
    linked = P.fs_link(records)
    labeled = records.select("rec_id", "entity").join(linked, "rec_id")
    row = pairwise_f1(labeled, truth_col="entity",
                      pred_col="entity_id").collect()[0]
    assert row["f1_milli"] == 1000
    assert row["true_pairs"] == N_ENT


def test_pattern_counts_plan_is_partial_aggregate(spark, gammas):
    specs = P.transcript_field_specs()
    plan = P.pattern_counts(gammas, specs)._jdf.queryExecution() \
        .executedPlan().toString()
    # partial (map-side) + final hash aggregate, no Python in the path
    assert plan.count("HashAggregate") >= 2
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan


def test_gamma_plan_stays_codegen(spark, records):
    specs = P.transcript_field_specs()
    g = P.comparison_vectors(
        P.block_candidate_pairs(records), specs)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan


def test_tf_adjustment_rare_values_score_higher(spark, records, gammas):
    adj = P.tf_adjusted_weights(gammas, records, field="city",
                                gamma_col="g_city")
    rows = adj.where("g_city = 0").select(
        "city_l", "tf_adj_milli", "weight_milli",
        "weight_tf_milli").collect()
    assert rows
    # corrections only move agreeing pairs, and base + adj = total
    for r in rows:
        assert abs(r["weight_tf_milli"]
                   - (r["weight_milli"] + r["tf_adj_milli"])) < 1e-6
    # non-agreeing pairs are untouched
    assert adj.where("g_city != 0 AND tf_adj_milli != 0.0").count() == 0
    # a rarer city value must earn a strictly larger adjustment than a
    # more common one
    freqs = {r["city"]: r["n"] for r in
             records.groupBy("city").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    by_city = {}
    for r in rows:
        by_city[r["city_l"]] = r["tf_adj_milli"]
    cities = sorted(by_city, key=lambda c: freqs[c])
    if len(cities) >= 2 and freqs[cities[0]] < freqs[cities[-1]]:
        assert by_city[cities[0]] > by_city[cities[-1]]


def test_tf_adjustment_floor_margins_are_cross_engine_stable(spark):
    """The driver query floors 1000*log2(u_field/u_v) to integer milli.
    Everything upstream of log2 is exact in IEEE doubles (integer counts,
    exactly-rounded divisions), so Spark and DuckDB feed log2 the same
    double — but their log2 implementations may differ by a few ulps
    (~1e-12 relative). Assert every adjustment value on the driver's
    corpus sits far (>1e-6) from an integer boundary, so no ulp
    difference can flip the floor."""
    import math
    from liblevenshtein_rust_spark.sources.corpus import (
        synthetic_linkage_records)
    recs = synthetic_linkage_records(spark, 500)
    freqs = {r["city"]: r["n"] for r in
             recs.groupBy("city").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    tf_sq = float(sum(n * n for n in freqs.values()))
    total = float(sum(freqs.values()))
    u_field = tf_sq / (total * total)
    for v, n in freqs.items():
        u_v = (float(n) * float(n)) / tf_sq
        val = 1000.0 * math.log2(u_field / u_v)
        margin = abs(val - round(val))
        assert margin > 1e-6, (v, val, margin)


def test_tf_adjustment_plan_broadcasts_frequency_table(spark, records,
                                                       gammas):
    adj = P.tf_adjusted_weights(gammas, records, field="city",
                                gamma_col="g_city")
    plan = adj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_em_weights_milli_signs_and_magnitudes():
    """EM weights in milli: agreement levels (high m, low u) positive,
    disagreement negative; a 2:1 m/u ratio lands at exactly 1000."""
    specs = [P.FieldSpec("g_x", 2, "CASE WHEN 1=1 THEN 0 ELSE 1 END")]
    w = P.em_weights_milli({"g_x": [0.8, 0.2]}, {"g_x": [0.4, 0.6]},
                           specs)
    assert w["g_x"][0] == 1000        # log2(0.8/0.4) = 1 exactly
    assert w["g_x"][1] < 0            # log2(0.2/0.6) < 0


def test_fs_link_em_weights_reach_perfect_f1(spark, records):
    """Unsupervised end-to-end: EM-estimated milli weights at threshold 0
    must reproduce the planted entities exactly, like the clerical
    weights do — the corpus separates by design and EM recovers
    parameters near the planted ones (test_em_recovers_planted_params),
    so both weightings agree on every candidate pair."""
    from liblevenshtein_rust_spark.operators.linkage_eval import pairwise_f1
    pred = P.fs_link(records, em=True)
    labeled = records.select("rec_id", "entity").join(pred, "rec_id")
    row = pairwise_f1(labeled, truth_col="entity",
                      pred_col="entity_id").collect()[0]
    assert row["f1_milli"] == 1000
    clerical = P.fs_link(records)
    assert (sorted(map(tuple, pred.collect()))
            == sorted(map(tuple, clerical.collect())))


# --- multi-rule blocking (Splink-style blocking-rule union, r5) ---------

def test_multi_rule_blocking_unions_and_dedupes(spark):
    """blocks=[...] must (a) include cross-rule candidates a single block
    misses, (b) compare each pair exactly once even when several rules
    propose it, and (c) generate no pairs from NULL blocking keys."""
    recs = spark.createDataFrame(
        [("r1", "b1", "alice", "nyc", "111"),
         ("r2", "b1", "alicia", "sfo", "111"),   # same block AND same phone
         ("r3", "b2", "bob", "nyc", None),       # phone unobserved
         ("r4", "b2", "bobby", "nyc", "222"),
         ("r5", "b3", "carol", "sfo", "333")],
        ["rec_id", "block", "name", "city", "phone"])
    single = P.block_candidate_pairs(recs, blocks=["block"])
    multi = P.block_candidate_pairs(recs, blocks=["block", "city"])
    ids = lambda df: {(r.rec_id_l, r.rec_id_r) for r in df.collect()}
    s, u = ids(single), ids(multi)
    # cross-rule candidate: r1 (b1, nyc) with r3/r4 (b2, nyc)
    assert ("r1", "r3") not in s and ("r1", "r3") in u
    assert ("r1", "r4") in u
    assert s <= u
    # exactly-once despite (r3, r4) matching BOTH rules
    assert multi.count() == len(u)
    # null keys generate no pairs under that rule (phone-only blocking:
    # r3's null phone never blocks with anything)
    phone_only = P.block_candidate_pairs(recs, blocks=["phone"])
    assert ids(phone_only) == {("r1", "r2")}
    # a key EXPRESSION works too (first 3 name chars)
    pref = P.block_candidate_pairs(recs, blocks=["substr(name, 1, 3)"])
    assert ("r3", "r4") in ids(pref)
    with pytest.raises(ValueError):
        P.block_candidate_pairs(recs, blocks=[])


def test_multi_rule_blocking_matches_bruteforce_union(spark, records):
    """On the linkage corpus, blocks=["block", "city"] must equal the
    brute-force union of the two rules' pair sets."""
    multi = P.block_candidate_pairs(records, blocks=["block", "city"])
    got = {(r.rec_id_l, r.rec_id_r) for r in
           multi.select("rec_id_l", "rec_id_r").collect()}
    rows = records.select("rec_id", "block", "city").collect()
    exp = set()
    for a in rows:
        for b in rows:
            if a.rec_id < b.rec_id and (a.block == b.block
                                        or a.city == b.city):
                exp.add((a.rec_id, b.rec_id))
    assert got == exp


# --- missing-observation gamma level (FS null semantics, r5) ------------

def test_null_gamma_level_not_disagreement(spark):
    """A pair with an unobserved phone must land on the MISSING level
    (its own gamma value, weight 0), not in the disagreement branch the
    bare CASE ELSE used to absorb it into."""
    recs = spark.createDataFrame(
        [("r1", "b", "alice", "nyc", "111"),
         ("r2", "b", "alice", "nyc", None),
         ("r3", "b", "alice", "nyc", "222")],
        ["rec_id", "block", "name", "city", "phone"])
    specs = P.transcript_field_specs()
    g = P.comparison_vectors(P.block_candidate_pairs(recs), specs)
    got = {(r.rec_id_l, r.rec_id_r): r.g_phone for r in g.collect()}
    assert got[("r1", "r2")] == 2      # missing, NOT disagree
    assert got[("r2", "r3")] == 2
    assert got[("r1", "r3")] == 1      # observed disagreement
    sc = P.score_pairs(g, specs)
    w = {(r.rec_id_l, r.rec_id_r): r.weight_milli for r in sc.collect()}
    # name+city agree (8+2), phone contributes 0 when missing, -4 observed
    assert w[("r1", "r2")] == 10_000
    assert w[("r1", "r3")] == 6_000


def test_fieldspec_null_validation():
    with pytest.raises(ValueError, match="set together"):
        P.FieldSpec("g_x", 3, "CASE WHEN 1=1 THEN 0 ELSE 1 END",
                    null_expr="x_l IS NULL")
    with pytest.raises(ValueError, match="valid level"):
        P.FieldSpec("g_x", 3, "CASE WHEN 1=1 THEN 0 ELSE 1 END",
                    null_expr="x_l IS NULL", null_level=3)
