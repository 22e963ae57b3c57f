"""Distributed pairwise record-linkage evaluation (the north-rule metric).

Pairwise precision/recall/F1 on labeled mentions WITHOUT materializing any
pair set: for clusters of sizes n_1..n_k the pair count is sum n_c*(n_c-1)/2,
so true pairs, predicted pairs, and true positives each come from one
groupBy-count aggregation (truth key, prediction key, and the intersection
key respectively). The naive pair-set comparison (reference evaluation
style: enumerate pairs per cluster and intersect —
tests/corpus_validation.rs evaluates per-query hit sets similarly) is
O(sum n_c^2) rows and infeasible at 10^12 turns; this formulation is three
shuffles of at most |mentions| rows regardless of cluster sizes.

F1 closed form: with tp true positives, P predicted pairs, T true pairs,
precision = tp/P, recall = tp/T, and F1 = 2*tp/(P+T) — one integer
division, no float intermediate. All outputs are integer (milli-scaled
ratios), keeping results hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocking_quality", "pairwise_f1"]


def pairwise_f1(
    labeled: DataFrame,
    truth_col: str = "entity",
    pred_col: str = "entity_id",
) -> DataFrame:
    """One-row DataFrame of pairwise linkage metrics.

    ``labeled``: one row per mention with a ground-truth label column and
    a predicted cluster column. Output columns (all long):
    n_mentions, true_pairs, pred_pairs, tp, prec_milli, rec_milli,
    f1_milli (floor division; 1000 = perfect).

    Counts are BIGINT: n*(n-1)/2 overflows only past a ~4.3e9-member
    cluster (ANSI mode raises rather than wrapping). Labeled evaluation
    corpora are nowhere near that; a full-corpus degenerate cluster at
    10^12 scale would be — dedupe exact duplicates (which this engine's
    dictionary stage does by construction) before evaluating.
    """
    pairs_of = "sum(n * (n - 1) div 2)"
    t = (labeled.groupBy(truth_col).agg(F.count(F.lit(1)).alias("n"))
         .agg(F.expr("sum(n)").alias("n_mentions"),
              F.expr(pairs_of).alias("true_pairs")))
    p = (labeled.groupBy(pred_col).agg(F.count(F.lit(1)).alias("n"))
         .agg(F.expr(pairs_of).alias("pred_pairs")))
    tp = (labeled.groupBy(truth_col, pred_col)
          .agg(F.count(F.lit(1)).alias("n"))
          .agg(F.expr(pairs_of).alias("tp")))
    # three single-row frames; the joins are trivially broadcast
    return (
        t.crossJoin(p).crossJoin(tp)
        .select(
            F.col("n_mentions").cast("long").alias("n_mentions"),
            F.col("true_pairs").cast("long").alias("true_pairs"),
            F.col("pred_pairs").cast("long").alias("pred_pairs"),
            F.col("tp").cast("long").alias("tp"),
            F.expr("(1000 * tp) div greatest(pred_pairs, 1)")
            .cast("long").alias("prec_milli"),
            F.expr("(1000 * tp) div greatest(true_pairs, 1)")
            .cast("long").alias("rec_milli"),
            F.expr("(2000 * tp) div greatest(pred_pairs + true_pairs, 1)")
            .cast("long").alias("f1_milli"),
        )
    )


def blocking_quality(
    candidates: DataFrame,
    labeled: DataFrame,
    *,
    id_col: str = "mention_id",
    truth_col: str = "entity",
) -> DataFrame:
    """Standard blocking-scheme evaluation (record-linkage literature):
    one row of reduction ratio and pairs completeness against labeled
    truth.

    - reduction ratio RR = 1 - |candidates| / (N choose 2): how much of
      the quadratic comparison space the blocker prunes;
    - pairs completeness PC = |candidates ∩ true pairs| / |true pairs|:
      how many true matches survive blocking (the blocker's recall
      ceiling — no downstream stage can recover a pair lost here).

    Same aggregation-only shape as ``pairwise_f1``: true-pair counts via
    sum n*(n-1)/2, candidate coverage via two label joins — nothing
    quadratic materializes. ``candidates``: (id_a, id_b) in ``id_col``
    values, any order/duplication (normalized here). All outputs long,
    milli-scaled floor ratios.
    """
    cand = (candidates.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"]))
    la = labeled.select(F.col(id_col).alias("id_a"),
                        F.col(truth_col).alias("_ea"))
    lb = labeled.select(F.col(id_col).alias("id_b"),
                        F.col(truth_col).alias("_eb"))
    cov = (cand.join(la, "id_a").join(lb, "id_b")
           .agg(F.count(F.lit(1)).alias("n_candidates"),
                F.sum(F.when(F.col("_ea") == F.col("_eb"), 1).otherwise(0))
                .alias("covered")))
    t = (labeled.groupBy(truth_col).agg(F.count(F.lit(1)).alias("n"))
         .agg(F.expr("sum(n)").alias("n_records"),
              F.expr("sum(n * (n - 1) div 2)").alias("true_pairs")))
    return (t.crossJoin(cov).select(
        F.col("n_records").cast("long").alias("n_records"),
        F.expr("n_records * (n_records - 1) div 2").cast("long")
        .alias("total_pairs"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("true_pairs").cast("long").alias("true_pairs"),
        F.col("covered").cast("long").alias("covered"),
        F.expr("(1000 * (n_records * (n_records - 1) div 2 - n_candidates))"
               " div greatest(n_records * (n_records - 1) div 2, 1)")
        .cast("long").alias("rr_milli"),
        F.expr("(1000 * covered) div greatest(true_pairs, 1)")
        .cast("long").alias("pc_milli"),
    ))
