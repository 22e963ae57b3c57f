"""Physical-plan regression guards: the properties BENCH/PLANS.md claims
must stay true as code evolves — a silent Python hop or a lost pushdown
in the hot path is a 10-100x regression at 100 TB that small-fixture
correctness tests would never catch."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators.fuzzy_join import (
    fuzzy_join,
    fuzzy_self_join,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _terms(spark, words):
    return (spark.createDataFrame([(w,) for w in words], ["term"])
            .withColumn("term_id", F.col("term")))


WORDS = ["table", "stable", "tble", "stream", "steam", "deploy"]


def test_standard_fuzzy_join_has_no_python_nodes(spark):
    qs = spark.createDataFrame([("q1", "tble")], ["q_id", "q_text"])
    plan = _plan(fuzzy_join(qs, _terms(spark, WORDS), n=1,
                            method="deletion"))
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan, plan


def test_transposition_fuzzy_join_arrow_nodes_bounded(spark):
    import re
    qs = spark.createDataFrame([("q1", "tble")], ["q_id", "q_text"])
    plan = _plan(fuzzy_join(qs, _terms(spark, WORDS), n=1,
                            variant="transposition", method="deletion"))
    # one logical Arrow kernel; projection collapse may re-inline it into
    # a filter+project pair (2 nodes — the accepted dual evaluation,
    # BENCH/PLANS.md "Weighted kernel / IVF plans"). Anything beyond 2
    # means a third Python hop crept into the verify path.
    nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert 1 <= len(nodes) <= 2, plan


def test_self_join_scan_prunes_to_text_column(spark, tmp_path, sf_dir):
    # parquet-backed dictionary: the blocked self-join must read only the
    # columns it uses (ReadSchema pruning), and the key explode must hash
    # before the exchange (no raw text in shuffle keys)
    p = str(tmp_path / "turns")
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .selectExpr("cast(doc_id as string) AS extra1",
                    "lang AS extra2", "lower(text) AS text") \
        .write.parquet(p)
    turns = spark.read.parquet(p)
    terms = (turns.select(F.col("text").alias("term")).distinct()
             .withColumn("term_id", F.col("term")))
    plan = _plan(fuzzy_self_join(terms, n=1, method="segment"))
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            assert "extra1" not in ln and "extra2" not in ln, ln
    assert "xxhash64" in plan


def test_substring_doc_index_reuse_skips_index_rebuild(spark):
    """The shared-index path (r4): with doc_index= the join plan must NOT
    contain the per-length explode(sequence)+substring index derivation —
    the index stage is built once and reused across query workloads
    (substring.build_substring_index), so the join's doc-side input is a
    plain scan/filter of the prebuilt index."""
    from liblevenshtein_rust_spark.operators.substring import (
        build_substring_index, fuzzy_substring_join)
    docs = spark.createDataFrame(
        [(1, "a scan of the table"), (2, "fast scan path")],
        ["doc_id", "text"])
    qdf = spark.createDataFrame([("scan", "scan")], ["q_id", "q_text"])
    # materialize the index as a table, as a deployment would
    idx = build_substring_index(docs, [4]).localCheckpoint(eager=True)
    with_idx = _plan(fuzzy_substring_join(
        qdf, docs, n=0, all_positions=True, doc_index=idx, index_lens=[4]))
    without = _plan(fuzzy_substring_join(qdf, docs, n=0, all_positions=True))
    # the inline path derives the index in-plan (explode over sequence of
    # positions); the reuse path must not
    assert "Generate explode" in without or "explode" in without.lower()
    n_explodes_with = with_idx.lower().count("explode")
    n_explodes_without = without.lower().count("explode")
    assert n_explodes_with < n_explodes_without, (
        with_idx, n_explodes_with, n_explodes_without)


def test_cluster_cohesion_plan_is_jvm_only(spark):
    """The cohesion audit must stay aggregation+join codegen: no Python
    nodes, and no re-derivation of pairwise work (its only inputs are the
    cluster map and the already-materialized pair list)."""
    from liblevenshtein_rust_spark.operators.cluster import cluster_cohesion
    cl = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], ["term", "entity_id"])
    pairs = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], ["term_a", "term_b", "distance"])
    plan = _plan(cluster_cohesion(cl, pairs, weight_col="distance"))
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_spread_input_preserves_rows_and_widens(spark):
    """r6: spread_input must only change layout — same rows, and at least
    defaultParallelism partitions when the input is narrower."""
    from liblevenshtein_rust_spark.operators.skew import spread_input
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], ["id", "t"]).coalesce(1)
    out = spread_input(df)
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 50)
    assert sorted(r["id"] for r in out.collect()) == list(range(50))
    # already-wide inputs pass through without an added shuffle
    wide = df.repartition(spark.sparkContext.defaultParallelism + 4)
    assert spread_input(wide) is wide


def test_variant_join_single_arrow_eval(spark):
    """r6 (guide §4.4): the nondeterministic fence on the distance-kernel
    UDFs must leave exactly ONE ArrowEvalPython node — the filter on the
    UDF-computed distance previously planned a second evaluation."""
    import re
    qs = spark.createDataFrame([("q1", "tble")], ["q_id", "q_text"])
    plan = _plan(fuzzy_join(qs, _terms(spark, WORDS), n=1,
                            variant="transposition", method="deletion"))
    nodes = set(re.findall(r"\((\d+)\) ArrowEvalPython", plan))
    assert len(nodes) == 1, plan


def test_substring_best_match_hash_aggregates(spark):
    """r6: the best-position aggregate packs (distance, pos) into one
    int64 min and keeps q_text as a grouping key, so it must plan as
    HashAggregate (map-side partials), never SortAggregate."""
    from liblevenshtein_rust_spark.operators.substring import (
        fuzzy_substring_join)
    docs = spark.createDataFrame(
        [(1, "a scan of the table"), (2, "fast scan path")],
        ["doc_id", "text"])
    qdf = spark.createDataFrame([("scan", "scan")], ["q_id", "q_text"])
    plan = _plan(fuzzy_substring_join(qdf, docs, n=1))
    assert "SortAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan
