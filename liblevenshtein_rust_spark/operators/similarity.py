"""Embedding similarity search (approximate nearest neighbor).

Brute-force cosine top-k as the exactness baseline, plus an LSH-bucketed
variant (random-hyperplane signs) as the scale path. Dot products and
norms are computed with JVM higher-order functions (zip_with/aggregate)
— no Python, no UDFs; Catalyst keeps the whole plan in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: str, b: str) -> F.Column:
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)")
    na = F.expr(f"sqrt(aggregate({a}, 0D, (s, v) -> s + cast(v as double) * cast(v as double)))")
    nb = F.expr(f"sqrt(aggregate({b}, 0D, (s, v) -> s + cast(v as double) * cast(v as double)))")
    return dot / (na * nb)


def cosine_top_k(queries: DataFrame, corpus: DataFrame, k: int,
                 *, q_id: str = "q_id", q_vec: str = "q_vec",
                 c_id: str = "c_id", c_vec: str = "c_vec") -> DataFrame:
    """Exact brute-force top-k: for each query vector the k most cosine-
    similar corpus vectors. Broadcast the query side (queries are the
    small side by construction); ties broken by c_id ASC for determinism.
    Output: (q_id, rank, c_id, sim)."""
    joined = F.broadcast(queries).crossJoin(corpus)
    scored = joined.select(
        F.col(q_id), F.col(c_id),
        _cosine(q_vec, c_vec).alias("sim"),
    )
    win = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "sim")
    )


def _hyperplane_sig(vec: str, n_planes: int, seed: int) -> F.Column:
    """Deterministic random-hyperplane sign signature (int64 bitmask).

    Plane p's weight for dimension d is a hash-derived pseudo-random
    value in [-1, 1): xxhash64(p, d, seed) scaled. Reproducible across
    executors and runs (no RNG state)."""
    w = (f"(cast(xxhash64(p, i, {seed}) % 1000000 as double) / 1000000.0)")
    dot = (f"aggregate(zip_with({vec}, sequence(0, size({vec}) - 1), "
           f"(x, i) -> cast(x as double) * {w}), 0D, (s, v) -> s + v)")
    return F.expr(
        f"aggregate(transform(sequence(0, {n_planes - 1}), p -> "
        f"if({dot} > 0, shiftleft(1L, p), 0L)), 0L, (s, v) -> s + v)"
    )


def cosine_top_k_lsh(queries: DataFrame, corpus: DataFrame, k: int,
                     *, q_id: str = "q_id", q_vec: str = "q_vec",
                     c_id: str = "c_id", c_vec: str = "c_vec",
                     n_planes: int = 12, n_bands: int = 6,
                     seed: int = 42) -> DataFrame:
    """Approximate top-k: bucket by random-hyperplane band signatures,
    score only colliding pairs. Recall < 1 by design; the scale path for
    corpora where brute force is infeasible (candidate count is
    |collisions|, not |Q| x |C|). Output schema matches cosine_top_k."""
    rows_per = n_planes // n_bands
    def keyed(df, idc, vecc, alias):
        sig = _hyperplane_sig(vecc, n_planes, seed)
        bands = F.expr(
            f"transform(sequence(0, {n_bands - 1}), b -> "
            f"xxhash64(b, (_sig >> (b * {rows_per})) & {(1 << rows_per) - 1}))")
        return (df.select(F.col(idc), F.col(vecc), sig.alias("_sig"))
                  .select(F.col(idc), F.col(vecc), F.explode(bands).alias("_bkey"))
                  .alias(alias))
    qk = keyed(queries, q_id, q_vec, "qk")
    ck = keyed(corpus, c_id, c_vec, "ck")
    cand = (
        qk.join(ck, F.col("qk._bkey") == F.col("ck._bkey"))
        .select(F.col(f"qk.{q_id}").alias(q_id), F.col(f"qk.{q_vec}").alias(q_vec),
                F.col(f"ck.{c_id}").alias(c_id), F.col(f"ck.{c_vec}").alias(c_vec))
        .dropDuplicates([q_id, c_id])
    )
    scored = cand.select(F.col(q_id), F.col(c_id), _cosine(q_vec, c_vec).alias("sim"))
    win = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "sim")
    )
