"""cluster/correlation.py: KwikCluster parallel-pivot correlation clustering."""

import random

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.cluster.correlation import kwik_cluster


def _ranks(spark, nodes, seed):
    df = spark.createDataFrame([(n,) for n in nodes], "node long")
    return {
        r["node"]: (r["h"], r["node"])
        for r in df.select("node", F.xxhash64("node", F.lit(seed)).alias("h")).collect()
    }


def _seq_kwik(nodes, edges, rank):
    """Sequential KwikCluster in the rank order — the ground truth the
    parallel local-min simulation must reproduce exactly."""
    adj = {n: set() for n in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cluster = {}
    for v in sorted(nodes, key=lambda n: rank[n]):
        if v in cluster:
            continue
        cluster[v] = v
        for u in adj[v]:
            cluster.setdefault(u, v)
    return cluster


@pytest.mark.parametrize("seed", [41, 7])
def test_kwik_cluster_equals_sequential_greedy(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(40))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(120)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["cluster"] for r in kwik_cluster(df, seed=seed).collect()}
    touched = sorted({n for e in edges for n in e})
    want = _seq_kwik(touched, edges, _ranks(spark, touched, seed))
    assert got == want


def test_kwik_cluster_pivot_is_self_or_neighbor_and_no_chain_merge(spark):
    # path graph 0-1-2-...-9: CC would give ONE component; KwikCluster must
    # only ever put direct neighbors together
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = kwik_cluster(df).collect()
    assert len(rows) == 10  # every endpoint exactly once
    adj = {n: set() for n in range(10)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    clusters = {}
    for r in rows:
        assert r["cluster"] == r["node"] or r["cluster"] in adj[r["node"]]
        clusters.setdefault(r["cluster"], set()).add(r["node"])
    assert len(clusters) >= 4  # a 10-path cannot collapse below ceil(10/2)=5
    # every cluster is a star around its pivot
    for piv, members in clusters.items():
        for m in members - {piv}:
            assert piv in adj[m]


def test_kwik_cluster_partition_invariant_and_duplicate_edges(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    # duplicates + both directions + self loops must not matter
    noisy = edges + [(b, a) for a, b in edges] + [(5, 5)]
    a = spark.createDataFrame(noisy, "src long, dst long").repartition(1)
    b = spark.createDataFrame(noisy, "src long, dst long").repartition(16)
    ra = sorted(map(tuple, kwik_cluster(a).collect()))
    rb = sorted(map(tuple, kwik_cluster(b).collect()))
    assert ra == rb


def test_kwik_cluster_triangle_plus_isolated_pair(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11)]
    got = {r["node"]: r["cluster"] for r in kwik_cluster(spark.createDataFrame(
        edges, "src long, dst long")).collect()}
    # triangle is one cluster (pivot = its min-priority node), pair is one
    assert len({got[1], got[2], got[3]}) == 1
    assert got[10] == got[11]
    assert got[10] != got[1]
