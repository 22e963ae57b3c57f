"""Explicit skew handling for blocking-key joins.

Hot blocking keys (ultra-common short turns, empty segments) put one
block's entire m^2 candidate space into a single reducer. AQE's skew-join
splitting mitigates the shuffle, but the explicit salted path here makes
the mitigation deterministic and independent of runtime statistics —
required by the north rule ("salting for skewed blocks").

Scheme (triangular group decomposition of a self-join):

  members of a hot key get group g = pmod(xxhash64(id), G);
  for every ordered group pair (i, j), i <= j, the left side re-emits
  members of group i under tag (key, i, j) and the right side members of
  group j under the same tag. The equi-join on (key, i, j) then produces
  exactly the original pair set, spread over G*(G+1)/2 reducer keys
  instead of 1. Cold keys take the ordinary single-key path; pairs found
  via both routes collapse in the pair-level dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_size_stats(keys: DataFrame, key_col: str = "_bkey") -> DataFrame:
    """Block-size distribution: (n_blocks, max_block, p99ish top sizes) —
    the lineage/metrics hook for 'no silent truncation' logging."""
    counts = keys.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("n").alias("max_block"),
        F.sum(F.when(F.col("n") > 1, F.col("n") * (F.col("n") - 1) / 2)
              .otherwise(0)).cast("long").alias("candidate_pairs_upper"),
    )


def salted_self_candidates(keys: DataFrame, *, hot_threshold: int,
                           n_groups: int = 8) -> DataFrame:
    """Distinct candidate id pairs (_ida < _idb) from an exploded key
    table (_bid, _bkey), with keys hotter than ``hot_threshold`` routed
    through the triangular salted decomposition."""
    counts = keys.groupBy("_bkey").agg(F.count(F.lit(1)).alias("_n"))
    hot_keys = counts.where(F.col("_n") > hot_threshold).select("_bkey")

    cold = keys.join(F.broadcast(hot_keys), "_bkey", "left_anti")
    l = cold.withColumnRenamed("_bid", "_ida").alias("ck_l")
    r = cold.withColumnRenamed("_bid", "_idb").alias("ck_r")
    cold_pairs = (
        l.join(r, F.col("ck_l._bkey") == F.col("ck_r._bkey"))
        .select(F.col("ck_l._ida").alias("_ida"), F.col("ck_r._idb").alias("_idb"))
        .where(F.col("_ida") < F.col("_idb"))
    )

    hot = keys.join(F.broadcast(hot_keys), "_bkey", "left_semi").withColumn(
        "_grp", F.pmod(F.xxhash64("_bid"), F.lit(n_groups)).cast("int"))
    G = n_groups
    left = hot.select(
        F.col("_bid").alias("_ida"), "_bkey",
        F.col("_grp").alias("_gi"),
        F.explode(F.expr(f"sequence(_grp, {G - 1})")).alias("_gj"),
    )
    right = hot.select(
        F.col("_bid").alias("_idb"), "_bkey",
        F.explode(F.expr("sequence(0, _grp)")).alias("_gi"),
        F.col("_grp").alias("_gj"),
    )
    hot_pairs = (
        left.alias("hl").join(
            right.alias("hr"),
            (F.col("hl._bkey") == F.col("hr._bkey"))
            & (F.col("hl._gi") == F.col("hr._gi"))
            & (F.col("hl._gj") == F.col("hr._gj")),
        )
        # a pair is emitted in only ONE group orientation, which need not
        # agree with id order — canonicalize instead of filtering
        .select(F.least("hl._ida", "hr._idb").alias("_ida"),
                F.greatest("hl._ida", "hr._idb").alias("_idb"))
        .where(F.col("_ida") != F.col("_idb"))
    )
    return cold_pairs.unionByName(hot_pairs).dropDuplicates(["_ida", "_idb"])


def spread_input(df: DataFrame) -> DataFrame:
    """Input-parallelism floor for fan-out operators (guide-§2.5 input
    skew: "one huge unsplittable file ... repartition immediately after
    the read").

    The signature/index builders in this engine amplify each input row
    ~100-300x (substring position explode, shingle explode x num_hashes,
    token explode) before any shuffle, so their compute parallelism is
    pinned to the SCAN's split count — and a small or unsplittable input
    (single parquet row group, gzip) runs the whole fan-out on a handful
    of cores (profiled r6: the sf0.1 substring index build was a 3.2 s
    4-task stage; MinHash signatures a 1.9 s single-task stage — on a
    32-core master).

    When the input already carries >= defaultParallelism partitions this
    is a NO-OP (no shuffle is added at deployment scale, where scans are
    split-rich); otherwise it round-robins the (narrow, pre-explode) rows
    across defaultParallelism partitions — the shuffle moves the input
    rows once, orders of magnitude less than the fan-out it parallelizes.
    Row-level operators only: never changes results, only layout."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)
