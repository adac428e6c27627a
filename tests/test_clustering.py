"""Large-star/small-star connected components vs a union-find oracle."""

from __future__ import annotations

import random

import pytest

from addressparser_spark.operators.clustering import assign_clusters, connected_components


def _union_find_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # relabel each node by min of its component
    comp: dict[str, list[str]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges)


def test_simple_chain(spark):
    _check(spark, [("b", "a"), ("c", "b"), ("e", "d")])


def test_star_and_cycle(spark):
    _check(spark, [("a", "b"), ("a", "c"), ("a", "d"), ("x", "y"), ("y", "z"), ("z", "x")])


def test_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = [f"n{i:03d}" for i in range(60)]
        edges = [tuple(rng.sample(nodes, 2)) for _ in range(50)]
        _check(spark, edges)


def test_long_path_converges_logarithmically(spark):
    # path of 64 nodes: alternating stars converge in O(log n) rounds, not O(n)
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(63)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=10).collect()}
    assert set(got.values()) == {"p00"}
    assert len(got) == 64


def test_assign_clusters_includes_singletons(spark):
    edges = spark.createDataFrame([("b", "a")], ["src", "dst"])
    nodes = spark.createDataFrame([("a",), ("b",), ("solo",)], ["conv_id"])
    comp = connected_components(edges)
    got = {r["conv_id"]: r["cluster_id"] for r in assign_clusters(nodes, comp).collect()}
    assert got == {"a": "a", "b": "a", "solo": "solo"}


def test_checkpoint_resume(spark, tmp_path):
    edges = [(f"c{i}", f"c{i + 1}") for i in range(20)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    d1 = str(tmp_path / "ck1")
    full = {r["node"]: r["component"] for r in connected_components(df, checkpoint_dir=d1).collect()}
    # simulate a crash after iteration 0: rerun resumes from the iter_000 parquet
    d2 = str(tmp_path / "ck2")
    try:
        connected_components(df, checkpoint_dir=d2, max_iter=1)
    except RuntimeError:
        pass  # did not converge in 1 iter — checkpoint for iter_000 exists
    resumed = {
        r["node"]: r["component"]
        for r in connected_components(df, checkpoint_dir=d2).collect()
    }
    assert resumed == full
