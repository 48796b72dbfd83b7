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


def _xx64(spark, node, seed):
    from pyspark.sql import functions as F

    return (
        spark.range(1)
        .select(F.xxhash64(F.lit(node), F.lit(seed)).alias("h"))
        .head()[0]
    )


def _sequential_canopy(spark, pairs, t_loose, t_tight, seed):
    """Direct McCallum reference: min-priority list scan, loose membership,
    tight removal — same xxhash64 priority as the engine."""
    from pyspark.sql import functions as F

    nodes = sorted({a for a, b, s in pairs if s >= t_loose}
                   | {b for a, b, s in pairs if s >= t_loose})
    hs = {
        r["n"]: r["h"]
        for r in spark.createDataFrame([(n,) for n in nodes], "n int")
        .select("n", F.xxhash64("n", F.lit(seed)).alias("h"))
        .collect()
    }
    loose, tight = {n: set() for n in nodes}, {n: set() for n in nodes}
    for a, b, s in pairs:
        if s >= t_loose and a != b:
            loose[a].add(b); loose[b].add(a)
        if s >= t_tight and a != b:
            tight[a].add(b); tight[b].add(a)
    listed = set(nodes)
    out = set()
    for n in sorted(nodes, key=lambda n: (hs[n], n)):
        if n not in listed:
            continue
        out.add((n, n))
        for q in loose[n]:
            if q in listed:
                out.add((q, n))
        for q in tight[n]:
            listed.discard(q)
        listed.discard(n)
    return out


def test_canopy_matches_sequential_reference(spark):
    import random

    from spacy_ann_linker_spark.cluster.correlation import canopy_assign

    rng = random.Random(23)
    pairs = []
    seen = set()
    for _ in range(300):
        a, b = rng.sample(range(40), 2)
        k = (min(a, b), max(a, b))
        if k in seen:
            continue
        seen.add(k)
        pairs.append((k[0], k[1], round(rng.random(), 3)))
    df = spark.createDataFrame(pairs, "id_a int, id_b int, score double")
    got = {
        (r.node, r.canopy)
        for r in canopy_assign(df, t_loose=0.3, t_tight=0.7, seed=17).collect()
    }
    want = _sequential_canopy(spark, pairs, 0.3, 0.7, 17)
    assert got == want


def test_canopy_coverage_and_overlap(spark):
    """Every loose-graph node is in >= 1 canopy; with loose << tight a node
    between two cores joins BOTH canopies (the overlap disjoint blocking
    cannot express)."""
    from spacy_ann_linker_spark.cluster.correlation import canopy_assign

    # two tight cores (1,2) and (5,6); node 9 loosely near both
    pairs = [
        (1, 2, 0.9), (5, 6, 0.9),
        (9, 1, 0.4), (9, 5, 0.4),
        (2, 9, 0.35),
    ]
    df = spark.createDataFrame(pairs, "id_a int, id_b int, score double")
    rows = canopy_assign(df, t_loose=0.3, t_tight=0.7, seed=17).collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r.node, set()).add(r.canopy)
    assert set(by_node) == {1, 2, 5, 6, 9}  # full loose-universe coverage
    # overlap exists under EVERY priority order in this fixture: whichever
    # of {9, its loose neighbors} centers first, the bridge node 9's canopy
    # shares members with a tight core's canopy
    assert max(len(c) for c in by_node.values()) >= 2


def test_canopy_threshold_order_enforced(spark):
    import pytest

    from spacy_ann_linker_spark.cluster.correlation import canopy_assign

    df = spark.createDataFrame([(1, 2, 0.5)], "id_a int, id_b int, score double")
    with pytest.raises(ValueError):
        canopy_assign(df, t_loose=0.8, t_tight=0.3)


def test_canopy_partition_invariance(spark):
    import random

    from spacy_ann_linker_spark.cluster.correlation import canopy_assign

    rng = random.Random(4)
    pairs = [
        (a, b, round(rng.random(), 3))
        for _ in range(200)
        for a, b in [rng.sample(range(30), 2)]
    ]
    df = spark.createDataFrame(pairs, "id_a int, id_b int, score double")

    def run(d):
        return {
            (r.node, r.canopy)
            for r in canopy_assign(d, t_loose=0.3, t_tight=0.7).collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(16))
