"""Connected-components correctness vs a union-find oracle."""

from __future__ import annotations

import numpy as np

from liblevenshtein_rust_spark.operators.cluster import connected_components


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle(edges, nodes):
    uf = _UF()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    # min-id per component
    comp = {}
    for n in nodes:
        comp.setdefault(uf.find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(spark, edges, nodes):
    edf = spark.createDataFrame(edges or [("x", "x")], ["id_a", "id_b"])
    if not edges:
        edf = edf.limit(0)
    ndf = spark.createDataFrame([(n,) for n in nodes], ["term_id"])
    got = {
        r.term_id: r.entity_id
        for r in connected_components(edf, ndf).collect()
    }
    assert got == _oracle(edges, nodes)


def test_cc_simple_chain(spark):
    _run(spark, [("a", "b"), ("b", "c"), ("d", "e")], list("abcdefg"))


def test_cc_empty_edges(spark):
    _run(spark, [], list("abc"))


def test_cc_star_and_cycle(spark):
    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("x", "y"), ("y", "z"), ("z", "x")]
    _run(spark, edges, list("abchxyz"))


def test_cc_random_graphs(spark):
    rng = np.random.default_rng(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    for _ in range(150):
        a, b = (str(x) for x in rng.choice(nodes, 2, replace=False))
        edges.append((min(a, b), max(a, b)))
    _run(spark, edges, nodes)


def test_cc_giant_near_clique(spark):
    """Templated-transcript hazard: one big dense component + satellites
    (SURVEY.md §7.5 risk register)."""
    nodes = [f"c{i:02d}" for i in range(40)] + ["s1", "s2"]
    edges = [(f"c{i:02d}", f"c{j:02d}") for i in range(40) for j in range(i + 1, 40)
             if (i + j) % 3 != 0]
    edges += [("s1", "s2")]
    _run(spark, edges, nodes)
