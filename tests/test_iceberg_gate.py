"""Iceberg-catalog integration test — gated on the runtime jar.

VERDICT r3 item #8: the ``table_format="iceberg"`` checkpoint path in
plans/pipeline.py and the MERGE-style delta flow around
``incremental_components(delta=True)`` are parquet-tested everywhere
else; this module runs them against a REAL local Iceberg (hadoop)
catalog whenever an ``iceberg-spark-runtime`` jar is visible.

Sandbox limitation (documented, COVERAGE.md): this container ships no
Iceberg runtime jar and has no network to fetch one, so here the whole
module SKIPS with that reason. On any machine with the jar present
(dropped into pyspark's jars/, $SPARK_HOME/jars, or pointed at via
$ICEBERG_JAR), the same tests activate unchanged and exercise:

  1. run_pipeline(table_format="iceberg") end-to-end — stages land as
     catalog tables (no parquet _SUCCESS markers), and a second run
     resumes every stage through spark.catalog.tableExists;
  2. an incremental delta batch appended to the clusters table —
     incremental_components(delta=True) output row-level-merged into
     the stage table, matching a full recompute.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    cands = []
    env = os.environ.get("ICEBERG_JAR")
    if env:
        cands.append(env)
    try:
        import pyspark
        cands.extend(glob.glob(os.path.join(
            os.path.dirname(pyspark.__file__), "jars",
            "iceberg-spark-runtime*.jar")))
    except ImportError:
        pass
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        cands.extend(glob.glob(os.path.join(
            spark_home, "jars", "iceberg-spark-runtime*.jar")))
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


_JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar in this environment (sandbox "
           "has no jar and no network; set $ICEBERG_JAR or drop the jar "
           "into pyspark/jars to activate — see module docstring)")


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """Fresh session wired to a local hadoop-type Iceberg catalog.

    Needs its own JVM configuration, so it must not reuse the shared
    session fixture: run this module alone (pytest tests/test_iceberg_gate.py)
    on Iceberg-enabled machines.
    """
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("lls-iceberg-gate")
        .config("spark.jars", _JAR)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.lls_ice",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lls_ice.type", "hadoop")
        .config("spark.sql.catalog.lls_ice.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_pipeline_checkpoints_to_iceberg_and_resumes(iceberg_spark,
                                                     tmp_path):
    from liblevenshtein_rust_spark.plans.pipeline import (
        PipelineConfig, run_pipeline)
    from liblevenshtein_rust_spark.sources.transcripts import (
        synth_transcripts)

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lls_ice.ckpt")
    tdf, _truth = synth_transcripts(spark, 120, seed=7)
    cfg = PipelineConfig(
        checkpoint_dir=str(tmp_path / "ckpt"), run_id="ice1", n=1,
        table_format="iceberg", extra={"db": "lls_ice.ckpt"})
    out1 = run_pipeline(spark, tdf, cfg)
    assert all(not v["resumed"] for v in out1["info"].values())
    # stages are catalog tables, not parquet dirs
    assert spark.catalog.tableExists("lls_ice.ckpt.ice1_clusters")
    assert not os.path.exists(
        os.path.join(cfg.checkpoint_dir, "ice1", "clusters", "_SUCCESS"))

    out2 = run_pipeline(spark, tdf, cfg)
    assert all(v["resumed"] for v in out2["info"].values())
    a = sorted(map(tuple, out1["clusters"].collect()))
    b = sorted(map(tuple, out2["clusters"].collect()))
    assert a == b


def test_incremental_delta_merges_into_iceberg_clusters(iceberg_spark):
    from pyspark.sql import functions as F
    from liblevenshtein_rust_spark.operators.cluster import (
        connected_components, incremental_components)

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lls_ice.inc")
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(8)], ["term_id"])
    base_edges = spark.createDataFrame(
        [("n0", "n1"), ("n2", "n3"), ("n4", "n5")], ["id_a", "id_b"])
    full0 = connected_components(base_edges, nodes, src="id_a",
                                 dst="id_b", node_col="term_id")
    full0.writeTo("lls_ice.inc.clusters").createOrReplace()

    batch = spark.createDataFrame([("n1", "n2"), ("n6", "n7")],
                                  ["id_a", "id_b"])
    old = spark.read.table("lls_ice.inc.clusters")
    delta = incremental_components(old, batch, src="id_a", dst="id_b",
                                   node_col="term_id", delta=True)
    delta.createOrReplaceTempView("delta_batch")
    spark.sql(
        "MERGE INTO lls_ice.inc.clusters t USING delta_batch s "
        "ON t.term_id = s.term_id "
        "WHEN MATCHED THEN UPDATE SET t.entity_id = s.entity_id "
        "WHEN NOT MATCHED THEN INSERT *")

    merged = spark.read.table("lls_ice.inc.clusters")
    expect = connected_components(
        base_edges.unionByName(batch), nodes, src="id_a", dst="id_b",
        node_col="term_id")
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, expect.collect())))
    # Iceberg row-level MERGE leaves snapshot history behind
    assert (spark.sql(
        "SELECT count(*) AS n FROM lls_ice.inc.clusters.snapshots")
        .first()["n"] >= 2)
