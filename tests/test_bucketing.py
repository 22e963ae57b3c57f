"""Bucketed checkpoint stages: co-located joins without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from liblevenshtein_rust_spark.plans.pipeline import PipelineConfig, run_pipeline
from liblevenshtein_rust_spark.sources.transcripts import synth_transcripts


def test_bucketed_pipeline_and_colocated_join(spark, tmp_path):
    tdf, _ = synth_transcripts(spark, 200, seed=5)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"), run_id="b1",
                         n=1, bucket_by=4,
                         extra={"db": "lls_test_bucketing"})
    res = run_pipeline(spark, tdf, cfg)
    n_clusters = res["clusters"].count()
    assert n_clusters > 0

    # both sides bucketed+sorted by term_id with the same bucket count:
    # the equi-join must plan with NO Exchange on either side (broadcast
    # disabled so the planner can't sidestep the comparison — at real
    # scale neither side is broadcastable)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        terms = spark.read.table("lls_test_bucketing.b1_terms")
        clusters = spark.read.table("lls_test_bucketing.b1_clusters")
        joined = terms.join(clusters, "term_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == n_clusters
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # resume: a fresh run with the same config reads the catalog tables
    res2 = run_pipeline(spark, tdf, cfg)
    assert all(v.get("resumed") for v in res2["info"].values()), res2["info"]
    assert res2["clusters"].count() == n_clusters


def test_unbucketed_join_shuffles_for_contrast(spark, tmp_path):
    """Sanity for the assertion above: the same join over plain parquet
    dirs DOES contain an Exchange — bucketing is what removes it."""
    tdf, _ = synth_transcripts(spark, 120, seed=6)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt2"), run_id="p1", n=1)
    run_pipeline(spark, tdf, cfg)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        terms = spark.read.parquet(str(tmp_path / "ckpt2" / "p1" / "terms"))
        clusters = spark.read.parquet(str(tmp_path / "ckpt2" / "p1" / "clusters"))
        plan = terms.join(clusters, "term_id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
