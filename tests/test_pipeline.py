"""End-to-end linkage pipeline: pairwise F1 gate + idempotent resume.

The north-rule metric: pairwise F1 >= 0.99 on labeled pairs from a seeded
synthetic transcript corpus (typo-generator model ported from
/root/reference/src/corpus/generator.rs:35-194).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.plans.pipeline import PipelineConfig, run_pipeline
from liblevenshtein_rust_spark.sources.transcripts import synth_transcripts


def _pair_set(rows):
    """rows: iterable of (key, group) -> set of unordered key pairs."""
    groups: dict[str, list] = {}
    for key, g in rows:
        groups.setdefault(g, []).append(key)
    out = set()
    for members in groups.values():
        members.sort()
        out.update(itertools.combinations(members, 2))
    return out


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    tdf, truth = synth_transcripts(spark, 1500, seed=42, dup_frac=0.55, max_edits=2)
    # the typo model's transpose edit costs 1 in Damerau distance but 2 in
    # standard Levenshtein, so the linkage threshold uses the transposition
    # variant (exactly why the reference ships Algorithm::Transposition)
    cfg = PipelineConfig(checkpoint_dir=ckpt, run_id="t1", n=2, variant="transposition")
    res = run_pipeline(spark, tdf, cfg)
    return ckpt, cfg, tdf, truth, res


def test_pairwise_f1_gate(spark, pipeline_result):
    _, _, tdf, truth, res = pipeline_result
    pred = [
        ((r.conv_id, r.turn_idx), r.entity_id)
        for r in res["turn_entities"].collect()
    ]
    true = [
        ((r.conv_id, r.turn_idx), r.entity_id)
        for r in truth.collect()
    ]
    pred_pairs, true_pairs = _pair_set(pred), _pair_set(true)
    tp = len(pred_pairs & true_pairs)
    prec = tp / max(len(pred_pairs), 1)
    rec = tp / max(len(true_pairs), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.99, (prec, rec, f1)


def test_per_turn_text_equality_invariant(spark, pipeline_result):
    """north rule: per-turn text equality under stable (conv_id, turn_idx)
    ordering — canonicalization must not drop/duplicate/reorder turns."""
    _, _, tdf, _, res = pipeline_result
    from liblevenshtein_rust_spark.functions.canonicalize import canon_text

    before = tdf.select("conv_id", "turn_idx",
                        canon_text("text").alias("t")).orderBy("conv_id", "turn_idx")
    after = res["turns"].select("conv_id", "turn_idx",
                                F.col("text").alias("t")).orderBy("conv_id", "turn_idx")
    assert [tuple(r) for r in before.collect()] == [tuple(r) for r in after.collect()]


def test_resume_is_idempotent(spark, pipeline_result):
    ckpt, cfg, tdf, _, res = pipeline_result
    first = sorted(tuple(r) for r in res["turn_entities"].collect())
    res2 = run_pipeline(spark, tdf, cfg)
    assert all(v["resumed"] for v in res2["info"].values()), res2["info"]
    second = sorted(tuple(r) for r in res2["turn_entities"].collect())
    assert first == second


def test_partial_resume_after_kill(spark, pipeline_result):
    """Simulate a crash after stage 2: wipe later checkpoints, re-run,
    outputs must be identical and early stages must resume."""
    import shutil, os
    ckpt, cfg, tdf, _, res = pipeline_result
    first = sorted(tuple(r) for r in res["turn_entities"].collect())
    for stage in ("clusters", "turn_entities"):
        shutil.rmtree(os.path.join(ckpt, cfg.run_id, stage), ignore_errors=True)
    res3 = run_pipeline(spark, tdf, cfg)
    assert res3["info"]["canon"]["resumed"]
    assert res3["info"]["scored_pairs"]["resumed"]
    assert not res3["info"]["clusters"]["resumed"]
    third = sorted(tuple(r) for r in res3["turn_entities"].collect())
    assert first == third


def test_lineage_and_metrics_written(spark, pipeline_result):
    import os
    ckpt, cfg, _, _, _ = pipeline_result
    m = spark.read.parquet(os.path.join(ckpt, cfg.run_id, "_metrics"))
    assert {r.stage for r in m.collect()} >= {
        "canon", "terms", "scored_pairs", "clusters", "turn_entities"}
    lin = spark.read.parquet(os.path.join(ckpt, cfg.run_id, "_lineage", "scored_pairs"))
    total = lin.agg(F.sum("rows")).first()[0]
    rows = spark.read.parquet(os.path.join(ckpt, cfg.run_id, "scored_pairs")).count()
    assert total == rows


def test_pipeline_salted_run_matches_unsalted(spark, tmp_path):
    from liblevenshtein_rust_spark.plans.pipeline import (
        PipelineConfig, run_pipeline)
    from liblevenshtein_rust_spark.sources.transcripts import synth_transcripts
    tdf, _ = synth_transcripts(spark, 150, seed=7)
    a = run_pipeline(spark, tdf, PipelineConfig(
        checkpoint_dir=str(tmp_path / "a"), n=1))
    b = run_pipeline(spark, tdf, PipelineConfig(
        checkpoint_dir=str(tmp_path / "b"), n=1, salt_threshold=4,
        salt_groups=3))
    pa = {tuple(r) for r in a["scored_pairs"].select("id_a", "id_b", "distance").collect()}
    pb = {tuple(r) for r in b["scored_pairs"].select("id_a", "id_b", "distance").collect()}
    assert pa == pb and pa


def _dedup_docs(spark):
    rows = [
        (1, "en", "the quick brown fox jumps over the lazy dog by the "
                  "river bank every single morning before dawn breaks"),
        (2, "en", "the quick brown fox jumps over the lazy dog by the "
                  "river bank every single morning before dawn breaks"),
        (3, "en", "quick brown fox jumps over the lazy dog by the "
                  "river bank every single morning before dawn breaks"),
        (4, "en", "a completely different document about adaptive query "
                  "execution and shuffle partition coalescing in spark"),
        (5, "de", "ein ganz anderes dokument ueber verteilte systeme und "
                  "datenverarbeitung im grossen massstab mit spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dedup_pipeline_matches_direct_and_resumes(spark, tmp_path):
    from liblevenshtein_rust_spark.operators.dedup import (
        near_dup_dedup, token_jaccard_pairs)
    from liblevenshtein_rust_spark.plans.pipeline import (
        DedupConfig, run_dedup_pipeline)

    docs = _dedup_docs(spark)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"), run_id="d1",
                      method="jaccard", threshold_milli=800,
                      group_col="lang")
    res = run_dedup_pipeline(spark, docs, cfg)
    got = {(r.doc_id, r.n_removed) for r in res["survivors"].collect()}
    direct = near_dup_dedup(
        docs, token_jaccard_pairs(docs, group_col="lang",
                                  min_ratio_milli=800))
    assert got == {(r.doc_id, r.n_removed) for r in direct.collect()}
    assert got == {(1, 2), (4, 0), (5, 0)}
    assert all(not v["resumed"] for v in res["info"].values())

    again = run_dedup_pipeline(spark, docs, cfg)
    assert all(v["resumed"] for v in again["info"].values())
    assert {(r.doc_id, r.n_removed)
            for r in again["survivors"].collect()} == got
    # lineage + metrics sidecars exist for both stages
    import os
    base = os.path.join(str(tmp_path / "ck"), "d1")
    for stage in ("dedup_pairs", "dedup_survivors"):
        assert os.path.exists(os.path.join(base, "_lineage", stage))
    assert os.path.exists(os.path.join(base, "_metrics"))


def test_dedup_pipeline_exact_method(spark, tmp_path):
    from liblevenshtein_rust_spark.plans.pipeline import (
        DedupConfig, run_dedup_pipeline)

    docs = _dedup_docs(spark)
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "ck"), run_id="dx",
                      method="exact")
    res = run_dedup_pipeline(spark, docs, cfg)
    got = {(r.doc_id, r.n_removed) for r in res["survivors"].collect()}
    # only 1/2 are byte-identical; 3/4/5 survive untouched
    assert got == {(1, 1), (3, 0), (4, 0), (5, 0)}
