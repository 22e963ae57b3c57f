"""End-to-end record-linkage pipeline with checkpoint/resume + lineage.

Stages (SURVEY.md §7.1), each a pure DataFrame -> DataFrame function whose
output is checkpointed under (run_id, stage):

    0 canon          canonicalized turns (stable (conv_id, turn_idx) order)
    1 terms          distinct-term dictionary (term_id, term, freq)
    2 scored_pairs   fuzzy self-join, distance <= n
    3 clusters       term_id -> entity_id (connected components)
    4 turn_entities  (conv_id, turn_idx, entity_id)
    5 metrics        per-stage row counts + durations; lineage = per-
                     partition row counts per stage

Resume is read-if-exists on the checkpoint table — the pipeline-granularity
version of the reference's checkpoint/undo discipline
(/root/reference/src/contextual/engine.rs:646-697). Checkpoints are parquet
directories here; on a cluster with an Iceberg catalog set
``table_format="iceberg"`` and the same stages write Iceberg tables
(``df.writeTo(...)``) whose snapshots give time travel on top.

All ids are content hashes (md5), so resumed runs are byte-identical to
uninterrupted ones regardless of cluster size or task placement.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.canonicalize import canon_text, phonetic_canon, term_id
from liblevenshtein_rust_spark.functions.distance import STANDARD
from liblevenshtein_rust_spark.operators.cluster import connected_components
from liblevenshtein_rust_spark.operators.fuzzy_join import build_dictionary, fuzzy_self_join


@dataclass
class PipelineConfig:
    checkpoint_dir: str
    run_id: str = "run0"
    n: int = 2
    variant: str = STANDARD
    method: str = "hybrid"   # needs no dataset statistic ("auto" = alias)
    phonetic: bool = False
    table_format: str = "parquet"   # "iceberg" on clusters with a catalog
    shuffle_partitions: int | None = None
    cc_max_iterations: int = 20
    #: bucket count for keyed checkpoint stages (terms/scored_pairs/
    #: clusters, bucketed+sorted by their join key via saveAsTable).
    #: Downstream equi-joins between co-bucketed stages then run with NO
    #: exchange on either side — the physical-design lever for repeated
    #: joins over the same keys at 100 TB. None = plain parquet dirs.
    bucket_by: int | None = None
    #: blocking keys with more members than this route through the
    #: deterministic triangular salting path (operators/skew.py) instead
    #: of one reducer key; None = rely on AQE skew-join splitting alone.
    #: Set on corpora with pathological hot keys (common short turns).
    salt_threshold: int | None = None
    salt_groups: int = 8
    extra: dict = field(default_factory=dict)


#: join key per bucketable stage (the column later equi-joins hit)
_BUCKET_KEYS = {"terms": "term_id", "scored_pairs": "id_a",
                "clusters": "term_id", "dedup_pairs": "id_a"}


@dataclass
class DedupConfig:
    """Config for the checkpointed document-dedup pipeline (same
    checkpoint/lineage/resume discipline as the linkage PipelineConfig —
    candidate-pair and survivor stages are durable, idempotent tables)."""
    checkpoint_dir: str
    run_id: str = "dedup0"
    method: str = "jaccard"      # exact | jaccard | minhash | simhash
    threshold_milli: int = 900   # token-Jaccard threshold (jaccard/minhash)
    max_hamming: int = 3         # SimHash bit distance
    group_col: str | None = None
    id_col: str = "doc_id"
    text_col: str = "text"
    table_format: str = "parquet"
    bucket_by: int | None = None
    #: jaccard only: hashed 8-byte tokens in every shuffle (exact w.h.p.)
    hash_tokens: bool = False
    extra: dict = field(default_factory=dict)


class _Runner:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.info: dict[str, dict] = {}

    def _bucketed(self, stage: str) -> bool:
        return (self.cfg.bucket_by is not None
                and self.cfg.table_format == "parquet"
                and stage in _BUCKET_KEYS)

    def _ensure_db(self) -> None:
        self.spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {self.cfg.extra.get('db', 'lls')}")

    def _path(self, stage: str) -> str:
        return os.path.join(self.cfg.checkpoint_dir, self.cfg.run_id, stage)

    def _table(self, stage: str) -> str:
        return f"{self.cfg.extra.get('db', 'lls')}.{self.cfg.run_id}_{stage}"

    def _exists(self, stage: str) -> bool:
        # probe through the catalog / Hadoop FS, not the driver's local
        # filesystem — resume must work with HDFS/S3 checkpoint dirs and
        # with Iceberg tables (which never write a parquet _SUCCESS marker)
        if self.cfg.table_format == "iceberg" or self._bucketed(stage):
            return self.spark.catalog.tableExists(self._table(stage))
        from liblevenshtein_rust_spark.session import fs_exists
        return fs_exists(self.spark, os.path.join(self._path(stage), "_SUCCESS"))

    def _read(self, stage: str) -> DataFrame:
        if self.cfg.table_format == "iceberg" or self._bucketed(stage):
            # bucketed layouts are only visible through the catalog — a
            # path read would lose the bucket spec (and the no-shuffle
            # joins downstream)
            return self.spark.read.table(self._table(stage))
        return self.spark.read.parquet(self._path(stage))

    def stage(self, name: str, fn) -> DataFrame:
        """Idempotent stage: read checkpoint if present, else compute+write."""
        path = self._path(name)
        t0 = time.time()
        if self._exists(name):
            df = self._read(name)
            self.info[name] = {"resumed": True, "seconds": time.time() - t0}
            return df
        df = fn()
        if self.cfg.table_format == "iceberg":
            df.writeTo(self._table(name)).createOrReplace()
        elif self._bucketed(name):
            self._ensure_db()
            key = _BUCKET_KEYS[name]
            (df.write.mode("overwrite")
             .bucketBy(self.cfg.bucket_by, key).sortBy(key)
             .option("path", path)
             .saveAsTable(self._table(name)))
        else:
            df.write.mode("overwrite").parquet(path)
        out = self._read(name)
        # lineage: per-partition row counts of the materialized stage
        lineage = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("run_id", F.lit(self.cfg.run_id))
            .withColumn("stage", F.lit(name))
        )
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.cfg.checkpoint_dir, self.cfg.run_id, "_lineage", name))
        self.info[name] = {
            "resumed": False,
            "seconds": time.time() - t0,
            "rows": out.count(),
        }
        return out


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 cfg: PipelineConfig) -> dict:
    """Run (or resume) the full linkage pipeline. Returns dict with the
    stage DataFrames plus runner info."""
    r = _Runner(spark, cfg)
    canon = phonetic_canon if cfg.phonetic else canon_text

    def s0():
        return (
            transcripts
            .withColumn("text", canon("text"))
            .withColumn("term_id", term_id("text"))
            # stable per-turn ordering invariant (north rule): sorting by
            # the natural key makes the checkpoint layout deterministic
            .repartition(F.col("conv_id"))
            .sortWithinPartitions("conv_id", "turn_idx")
        )

    turns = r.stage("canon", s0)

    def s1():
        return build_dictionary(turns, "text", canonicalize=False)

    terms = r.stage("terms", s1)

    def s2():
        return fuzzy_self_join(terms, n=cfg.n, variant=cfg.variant,
                               method=cfg.method,
                               salt_threshold=cfg.salt_threshold,
                               salt_groups=cfg.salt_groups)

    pairs = r.stage("scored_pairs", s2)

    def s3():
        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)
        return connected_components(
            pairs, terms, src="id_a", dst="id_b", node_col="term_id",
            max_iterations=cfg.cc_max_iterations, checkpoint=ckpt)

    clusters = r.stage("clusters", s3)

    def s4():
        return (
            turns.select("conv_id", "turn_idx", "term_id")
            .join(clusters, "term_id")
            .select("conv_id", "turn_idx", "entity_id")
        )

    turn_entities = r.stage("turn_entities", s4)

    # metrics table (append-style; one row per stage per run)
    metrics_rows = [
        (cfg.run_id, name, bool(v.get("resumed")), float(v["seconds"]),
         int(v.get("rows", -1)))
        for name, v in r.info.items()
    ]
    metrics = spark.createDataFrame(
        metrics_rows, ["run_id", "stage", "resumed", "seconds", "rows"])
    metrics.write.mode("overwrite").parquet(
        os.path.join(cfg.checkpoint_dir, cfg.run_id, "_metrics"))

    # through the Hadoop FS API: checkpoint_dir may be HDFS/S3, where a
    # driver-local open() would crash after all the expensive stages ran
    from liblevenshtein_rust_spark.session import fs_write_text
    fs_write_text(spark,
                  os.path.join(cfg.checkpoint_dir, cfg.run_id, "info.json"),
                  json.dumps(r.info, indent=2, default=str))

    return {
        "turns": turns,
        "terms": terms,
        "scored_pairs": pairs,
        "clusters": clusters,
        "turn_entities": turn_entities,
        "info": r.info,
    }


def run_dedup_pipeline(spark: SparkSession, docs: DataFrame,
                       cfg: DedupConfig) -> dict:
    """Run (or resume) the checkpointed document-dedup pipeline:

        0 dedup_pairs      candidate/verified near-dup pairs (or exact
                           fingerprint groups for method="exact")
        1 dedup_survivors  surviving docs + n_removed per survivor

    Both stages are durable checkpoint tables with the same per-partition
    lineage + metrics sidecars as the linkage pipeline; re-running with
    the same (checkpoint_dir, run_id) resumes each stage read-only. On a
    100-TB corpus the pair stage is the expensive one — checkpointing it
    means survivor-policy changes (or downstream re-reads) never re-run
    the join."""
    from liblevenshtein_rust_spark.operators.dedup import (
        exact_dedup, minhash_lsh_pairs, near_dup_dedup, simhash_pairs,
        token_jaccard_pairs)

    r = _Runner(spark, cfg)

    def s_pairs():
        if cfg.method == "exact":
            return exact_dedup(docs, id_col=cfg.id_col,
                               text_col=cfg.text_col)
        if cfg.method == "jaccard":
            return token_jaccard_pairs(
                docs, id_col=cfg.id_col, text_col=cfg.text_col,
                group_col=cfg.group_col,
                min_ratio_milli=cfg.threshold_milli,
                hash_tokens=cfg.hash_tokens)
        if cfg.method == "minhash":
            return minhash_lsh_pairs(
                docs, id_col=cfg.id_col, text_col=cfg.text_col,
                jaccard_threshold=cfg.threshold_milli / 1000.0)
        if cfg.method == "simhash":
            return simhash_pairs(docs, id_col=cfg.id_col,
                                 text_col=cfg.text_col,
                                 max_hamming=cfg.max_hamming)
        raise ValueError(f"unknown dedup method {cfg.method!r}")

    pairs = r.stage("dedup_pairs", s_pairs)

    def s_survivors():
        if cfg.method == "exact":
            return docs.join(
                pairs.select(F.col("rep_id").alias(cfg.id_col),
                             (F.col("n_docs") - F.lit(1)).cast("int")
                             .alias("n_removed")),
                cfg.id_col)
        return near_dup_dedup(docs, pairs, id_col=cfg.id_col)

    survivors = r.stage("dedup_survivors", s_survivors)

    metrics_rows = [
        (cfg.run_id, name, bool(v.get("resumed")), float(v["seconds"]),
         int(v.get("rows", -1)))
        for name, v in r.info.items()
    ]
    metrics = spark.createDataFrame(
        metrics_rows, ["run_id", "stage", "resumed", "seconds", "rows"])
    metrics.write.mode("overwrite").parquet(
        os.path.join(cfg.checkpoint_dir, cfg.run_id, "_metrics"))
    from liblevenshtein_rust_spark.session import fs_write_text
    fs_write_text(spark,
                  os.path.join(cfg.checkpoint_dir, cfg.run_id, "info.json"),
                  json.dumps(r.info, indent=2, default=str))
    return {"pairs": pairs, "survivors": survivors, "info": r.info}
