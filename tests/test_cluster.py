"""Connected components (operators/cluster.py) vs a pure-Python
union-find ground truth, on graph shapes chosen to break the easy
algorithms: long chains (diameter >> rounds kills naive label
propagation), cycles, star collisions, duplicate and self edges."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.operators.cluster import (
    attach_components,
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> min of its component
    comp = {}
    for n in parent:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for r, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges, **kw):
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b", **kw).collect()
    }
    assert got == _union_find(edges)


def test_two_components_and_isolated_merge(spark):
    _check(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])


def test_long_chain_converges_in_log_rounds(spark):
    # diameter 300: naive min-label propagation would need ~300 rounds;
    # alternating star must finish well inside 25.
    chain = [(i, i + 1) for i in range(300)]
    _check(spark, chain, max_rounds=25)


def test_duplicate_self_and_reversed_edges(spark):
    _check(spark, [(2, 1), (1, 2), (3, 3), (2, 3), (3, 2), (7, 8)])


def test_bridged_stars(spark):
    # two hubs bridged by one edge — exercises large-star fan-in
    edges = [(0, i) for i in range(1, 20)]
    edges += [(100, 100 + i) for i in range(1, 20)]
    edges += [(19, 119)]
    _check(spark, edges)


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(50)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "a", "b", max_rounds=1)


def test_attach_components_defaults_singletons(spark):
    entities = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([Row(a=1, b=4), Row(a=4, b=2)])
    assign = connected_components(edges, "a", "b")
    out = attach_components(entities, assign, "doc_id")
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 1, 5: 5}
