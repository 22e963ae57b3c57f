"""Sorted-neighborhood blocking (Hernández & Stolfo merge/purge, SIGMOD'95)
— the classic alternative blocking paradigm to key-equality schemes.

Records are globally ordered by a sort key; every pair within a sliding
window of ``w`` ranks becomes a candidate. Complementary to this repo's
deletion/segment key blocking (functions/blocking_keys.py): key blocking
is exact-complete for edit distance but keyed to it; sorted-neighborhood
is distance-agnostic (any sort key: phonetic canon, zip+name, embedding
bucket) and deliberately lossy — see ``operators/linkage_eval.
blocking_quality`` for measuring that loss.

Scale shape (no single-partition global window): ranks come from
``repartitionByRange`` + per-partition ``row_number`` + driver-side
prefix-sum of the P partition counts (a bounded P-row collect, the same
accepted pattern as CC convergence checks — NOT data-scaled). The
windowed self-join is a bucket equi-join: bucket = rank div w, each row
probes its own and its predecessor bucket, so fan-out is exactly 2 rows
per record and every |rank_a - rank_b| <= w pair meets in some bucket —
never a cross join, never a quadratic per-partition filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["global_ranks", "sorted_neighborhood_pairs"]


def global_ranks(df: DataFrame, key, *, id_col: str,
                 partitions: int | None = None) -> DataFrame:
    """Append a gap-free global ``_rank`` (0-based) ordered by
    (key, id_col) without a single-partition window.

    ``key`` is a column or expression string. Ties break on ``id_col``
    so ranking is deterministic under any partitioning.
    """
    kcol = key if isinstance(key, Column) else F.expr(key)
    d = df.withColumn("_snkey", kcol)
    p = partitions or d.sparkSession.sparkContext.defaultParallelism
    d = d.repartitionByRange(p, "_snkey", id_col)
    from pyspark.sql.window import Window
    pid = F.spark_partition_id()
    d = d.withColumn("_pid", pid)
    w = Window.partitionBy("_pid").orderBy("_snkey", id_col)
    d = d.withColumn("_prank", F.row_number().over(w) - 1)
    # PIN the partition layout before reading it twice:
    # repartitionByRange SAMPLES its range boundaries, so re-executing
    # the lineage can place rows in different partitions than the ones
    # the offsets below were counted from (observed: +33 phantom pairs
    # at sf0.001 when the counts action and the downstream join executed
    # the exchange independently). The checkpoint makes both reads see
    # one materialized layout.
    d = d.localCheckpoint(eager=True)
    # bounded driver action: one count per RANGE PARTITION (P rows),
    # prefix-summed into per-partition offsets
    counts = {r["_pid"]: r["n"] for r in
              d.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = [], 0
    for k in sorted(counts):
        offsets.append((k, acc))
        acc += counts[k]
    # offsets attach via a broadcast join (P rows): a create_map literal
    # would inline 2P expressions into the plan, which stops scaling at
    # the partition counts a 1000-executor job runs with
    odf = d.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long")
    if not offsets:
        odf = odf.limit(0)
    return (d.join(F.broadcast(odf), "_pid", "left")
            .withColumn("_rank", (F.col("_prank") + F.col("_off"))
                        .cast("long"))
            .drop("_pid", "_prank", "_off"))


def sorted_neighborhood_pairs(
    df: DataFrame,
    key,
    *,
    window: int,
    id_col: str = "term_id",
    text_col: str = "term",
    n: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """All unordered pairs within ``window`` ranks of each other in the
    (key, id) ordering; optionally verified to Levenshtein distance <= n
    on ``text_col`` (JVM codegen ``levenshtein(a, b, n)``).

    Output: id_a, id_b[, distance] with id ordering by rank (id_a is the
    lower-ranked row). DETERMINISTIC and exactly reproducible in SQL as
    ``row_number() OVER (ORDER BY key, id)`` + a rank-band self-join —
    the oracle twin of the ``sorted_neighborhood_d1`` driver query.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = global_ranks(df, key, id_col=id_col, partitions=partitions)
    # both join sides derive from global_ranks' already-checkpointed
    # frame, so this is a cheap projection read twice — no re-shuffle
    ranked = ranked.select(id_col, text_col, "_rank",
                           (F.col("_rank") / window).cast("long").alias("_b"))
    left = ranked.select(F.col(id_col).alias("id_a"),
                         F.col(text_col).alias("_ta"),
                         F.col("_rank").alias("_ra"), "_b")
    # each right row lands in its own bucket and its predecessor's, so
    # any pair within `window` ranks shares a bucket
    right = ranked.select(F.col(id_col).alias("id_b"),
                          F.col(text_col).alias("_tb"),
                          F.col("_rank").alias("_rb"),
                          F.explode(F.array(F.col("_b"),
                                            F.col("_b") - 1)).alias("_b"))
    pairs = (left.join(right, "_b")
             .where((F.col("_rb") > F.col("_ra"))
                    & (F.col("_rb") - F.col("_ra") <= window))
             .select("id_a", "id_b", "_ta", "_tb")
             .dropDuplicates(["id_a", "id_b"]))
    if n is None:
        return pairs.select("id_a", "id_b")
    return (pairs.withColumn(
        "distance", F.expr(f"levenshtein(_ta, _tb, {int(n)})").cast("int"))
        .where((F.col("distance") >= 0) & (F.col("distance") <= int(n)))
        .select("id_a", "id_b", "distance"))
