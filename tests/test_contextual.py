"""Contextual scope-visible completion (operators/contextual.py).

Mirrors the reference's engine semantics and stress-test basics
(/root/reference/src/contextual/engine.rs tests,
/root/reference/tests/contextual_stress_test.rs): visibility = self +
ancestors, root contexts are isolated, drafts override finalized terms,
value-set filtering prunes non-visible matches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.operators.contextual import (
    query_by_value_set,
    scoped_complete,
    value_set_overlap,
    visible_contexts,
)

# global(0) -> module(1) -> function(2); second root 10 -> child 11
TREE = [(0, None), (1, 0), (2, 1), (10, None), (11, 10)]


@pytest.fixture()
def tree(spark):
    return spark.createDataFrame(TREE, "context_id int, parent_id int")


def test_visible_contexts_closure(spark, tree):
    vis = {(r.context_id, r.visible_id)
           for r in visible_contexts(tree).collect()}
    assert vis == {(0, 0), (1, 1), (1, 0), (2, 2), (2, 1), (2, 0),
                   (10, 10), (11, 11), (11, 10)}


def test_deep_hierarchy(spark):
    """100-level chain (stress test_deep_hierarchy): the leaf sees every
    ancestor; an unrelated root sees only itself."""
    depth = 100
    rows = [(0, None)] + [(i, i - 1) for i in range(1, depth)] + [(999, None)]
    t = spark.createDataFrame(rows, "context_id int, parent_id int")
    vis = visible_contexts(t, max_depth=128)
    leaf = sorted(r.visible_id for r in
                  vis.where(F.col("context_id") == depth - 1).collect())
    assert leaf == list(range(depth))
    assert [r.visible_id for r in
            vis.where(F.col("context_id") == 999).collect()] == [999]


def test_cycle_raises(spark):
    t = spark.createDataFrame([(1, 2), (2, 1)], "context_id int, parent_id int")
    with pytest.raises(ValueError, match="cycle"):
        visible_contexts(t, max_depth=8)


def _complete(spark, tree, queries, terms, drafts, n=1):
    qdf = spark.createDataFrame(queries, "q_id string, q_text string, context_id int")
    tdf = spark.createDataFrame(terms, "term string, context_id int")
    ddf = spark.createDataFrame(drafts, "context_id int, draft string")
    return scoped_complete(qdf, tdf, ddf, tree, n=n).collect()


def test_scope_isolation_and_visibility(spark, tree):
    terms = [("hello", 0), ("help", 1), ("heap", 2), ("hero", 10)]
    rows = _complete(spark, tree,
                     [("q1", "helo", 2), ("q2", "helo", 10)], terms, [], n=2)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, {})[r.term] = (r.distance, r.is_draft, list(r.contexts))
    # function scope (2) sees all three ancestors' terms, never root 10's
    assert by_q["q1"] == {"hello": (1, False, [0]), "help": (1, False, [1]),
                          "heap": (2, False, [2])}
    # the other root sees only its own
    assert by_q["q2"] == {"hero": (1, False, [10])}


def test_draft_overrides_finalized(spark, tree):
    terms = [("hello", 0)]
    drafts = [(1, "hello"), (2, "helloo")]
    rows = _complete(spark, tree, [("q1", "hello", 2)], terms, drafts)
    got = {r.term: (r.distance, r.is_draft) for r in rows}
    # "hello" exists finalized(ctx 0) AND as a visible draft(ctx 1): draft wins
    assert got["hello"] == (0, True)
    assert got["helloo"] == (1, True)


def test_drafts_not_visible_from_parent(spark, tree):
    # a draft in the CHILD scope is invisible to the parent scope's query
    rows = _complete(spark, tree, [("q1", "helo", 1)], [], [(2, "helo")])
    assert rows == []
    rows2 = _complete(spark, tree, [("q1", "helo", 2)], [], [(2, "helo")])
    assert [(r.term, r.distance, r.is_draft) for r in rows2] == [("helo", 0, True)]


def test_query_by_value_set_prunes_before_join(spark):
    dict_df = spark.createDataFrame(
        [("t1", "hello", [0, 1]), ("t2", "helly", [5]), ("t3", "hellx", [1, 5])],
        "term_id string, term string, contexts array<int>")
    qdf = spark.createDataFrame([("q1", "hello")], "q_id string, q_text string")
    got = {(r.term, tuple(r.contexts)) for r in
           query_by_value_set(qdf, dict_df, [0, 1], n=1).collect()}
    assert got == {("hello", (0, 1)), ("hellx", (1, 5))}
    # plan check: the overlap filter must sit under the join (pushdown)
    plan = query_by_value_set(qdf, dict_df, [0, 1], n=1) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "arrays_overlap" in plan


def test_value_set_overlap_expression(spark):
    df = spark.createDataFrame([([1, 2],), ([3],)], "c array<int>")
    got = [r[0] for r in df.select(value_set_overlap("c", [2, 9])).collect()]
    assert got == [True, False]
