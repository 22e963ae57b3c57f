"""Sorted-neighborhood blocking vs brute-force rank windows, plus the
blocking-quality metrics vs hand computation."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from liblevenshtein_rust_spark.functions.distance import distance_py
from liblevenshtein_rust_spark.operators.linkage_eval import blocking_quality
from liblevenshtein_rust_spark.operators.sorted_neighborhood import (
    global_ranks,
    sorted_neighborhood_pairs,
)


def _brute_sn(items, w, n=None):
    ordered = sorted(items)
    out = set()
    for i, a in enumerate(ordered):
        for j in range(i + 1, min(i + w + 1, len(ordered))):
            b = ordered[j]
            if n is None or distance_py(a, b) <= n:
                out.add((a, b))
    return out


def _df(spark, items):
    return (spark.createDataFrame([(x,) for x in items], ["term"])
            .withColumn("term_id", F.col("term")))


def test_global_ranks_cross_partition(spark):
    # enough rows that 4 range partitions all carry data; ranks must be
    # the global sort order despite per-partition row_numbers
    items = [f"w{i:03d}" for i in range(97)][::-1]
    r = global_ranks(_df(spark, items), F.col("term"), id_col="term_id",
                     partitions=4)
    got = {x.term: x._rank for x in r.collect()}
    assert got == {t: i for i, t in enumerate(sorted(items))}


def test_sn_pairs_match_brute_force(spark):
    items = ["stream", "steam", "stream2", "str", "cat", "cart", "care",
             "deploy", "deplay", "deploys", "zz", "za"]
    for w in (1, 3, 5):
        got = {(r.id_a, r.id_b) for r in
               sorted_neighborhood_pairs(_df(spark, items), F.col("term"),
                                         window=w, partitions=3).collect()}
        assert got == _brute_sn(items, w), w


def test_sn_pairs_verified_distance(spark):
    items = ["stream", "steam", "strean", "stream9", "doge", "dog"]
    got = {(r.id_a, r.id_b, r.distance) for r in
           sorted_neighborhood_pairs(_df(spark, items), F.col("term"),
                                     window=4, n=1, partitions=2).collect()}
    want = {(a, b, distance_py(a, b)) for a, b in _brute_sn(items, 4, n=1)}
    assert got == want


def test_sn_window_straddles_partitions(spark):
    # windows must cross range-partition boundaries: with 5 partitions of
    # ~6 rows and w=4, many pairs straddle a boundary
    items = [f"k{i:02d}" for i in range(30)]
    got = {(r.id_a, r.id_b) for r in
           sorted_neighborhood_pairs(_df(spark, items), F.col("term"),
                                     window=4, partitions=5).collect()}
    assert got == _brute_sn(items, 4)


def test_blocking_quality_hand_computed(spark):
    labeled = spark.createDataFrame(
        [("a", "e1"), ("b", "e1"), ("c", "e2"), ("d", "e2"), ("e", "e3")],
        ["rid", "entity"])
    cand = spark.createDataFrame(
        [("a", "b"), ("c", "a"), ("d", "c"), ("d", "c"), ("b", "a")],
        ["id_a", "id_b"])
    row = blocking_quality(cand, labeled, id_col="rid").collect()[0]
    # normalized distinct candidates: (a,b), (a,c), (c,d)
    assert (row.n_records, row.total_pairs, row.n_candidates) == (5, 10, 3)
    # true pairs: (a,b), (c,d); covered: both
    assert (row.true_pairs, row.covered) == (2, 2)
    assert row.rr_milli == 1000 * 7 // 10
    assert row.pc_milli == 1000
