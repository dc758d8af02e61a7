# -*- coding: utf-8 -*-
"""Connected components: large-star/small-star correctness vs a
single-node union-find, plus the O(log n)-round guarantee on a path
graph (the case where plain label propagation needs O(n) rounds)."""
import random

from pyspark.sql import functions as F

from webstruct_spark.operators.canon import connected_components_df


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comps.values() for n in members}


def _run(spark, nodes, edges, **kw):
    v = spark.createDataFrame([(n,) for n in nodes], "node string")
    e = spark.createDataFrame(edges, "src string, dst string")
    return connected_components_df(v, e, **kw)


def test_path_graph_log_rounds(spark):
    """64-node path: label propagation would need ~63 rounds; the
    star algorithm must converge in O(log n) (loose bound: 12)."""
    nodes = ["n%02d" % i for i in range(64)]
    edges = [("n%02d" % i, "n%02d" % (i + 1)) for i in range(63)]
    labels, rounds = _run(spark, nodes, edges, return_rounds=True)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {n: "n00" for n in nodes}
    assert rounds <= 12, rounds


def test_random_graphs_vs_union_find(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(2, 60)
        nodes = ["v%03d" % i for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(0, n * 2))
        ]
        want = _union_find(nodes, edges)
        labels = _run(spark, nodes, edges)
        got = {r["node"]: r["label"] for r in labels.collect()}
        assert got == want, (trial, n)


def test_isolated_and_empty(spark):
    labels = _run(spark, ["a", "b"], [])
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {"a": "a", "b": "b"}


def test_two_components_with_hub(spark):
    """A star hub plus a separate pair (skewed-degree shape)."""
    nodes = ["hub"] + ["s%02d" % i for i in range(20)] + ["x", "y"]
    edges = [("hub", "s%02d" % i) for i in range(20)] + [("x", "y")]
    labels, rounds = _run(spark, nodes, edges, return_rounds=True)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got["hub"] == "hub"
    assert all(got["s%02d" % i] == "hub" for i in range(20))
    assert got["x"] == got["y"] == "x"
    assert rounds <= 4
