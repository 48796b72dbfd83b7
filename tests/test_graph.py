"""pagerank: fixed-iteration power iteration vs a pure-python reference."""

import random

from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.graph import pagerank


def _py_pagerank(edges, d, n_iter):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    out = {}
    for u, v in e:
        out.setdefault(u, []).append(v)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for u, vs in out.items():
            share = r[u] / len(vs)
            for v in vs:
                inflow[v] += share
        r = {v: (1 - d) / n + d * (inflow[v] + dm / n) for v in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(19)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, damping=0.85, n_iter=5).collect()}
    want = _py_pagerank(edges, 0.85, 5)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_pagerank_mass_conserved_and_hub_wins(spark):
    # star: everyone points at 0 -> 0 has the top rank; total mass 1
    edges = [(i, 0) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src int, dst int")
    rows = pagerank(df, n_iter=6).collect()
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-9  # dangling node 0's mass is redistributed
    best = max(rows, key=lambda r: r.rank)
    assert best.node == 0


def test_pagerank_partition_invariance(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int")

    def run(d):
        return {(r.node, round(r.rank, 12)) for r in pagerank(d, n_iter=4).collect()}

    assert run(df.repartition(1)) == run(df.repartition(16))


def _py_label_prop(node_labels, edges, k):
    """Synchronous reference: clamped seeds, argmax support, label-asc ties,
    keep previous when no labeled neighbor."""
    cur = dict(node_labels)
    seeds = {n: l for n, l in node_labels.items() if l is not None}
    nbrs = {}
    for u, v, w in edges:
        nbrs.setdefault(v, []).append((u, w))
    for _ in range(k):
        nxt = {}
        for n in cur:
            if n in seeds:
                nxt[n] = seeds[n]
                continue
            sup = {}
            for u, w in nbrs.get(n, []):
                if cur.get(u) is not None:
                    sup[cur[u]] = sup.get(cur[u], 0.0) + w
            if sup:
                nxt[n] = min(sup, key=lambda l: (-sup[l], l))
            else:
                nxt[n] = cur[n]
        cur = nxt
    return cur


def test_label_propagation_matches_python_reference(spark):
    import random

    from spacy_ann_linker_spark.extras.graph import label_propagation

    rng = random.Random(31)
    n = 30
    node_labels = {
        i: (["en", "de", "fr"][i % 3] if i < 6 else None) for i in range(n)
    }
    und = list({tuple(sorted(rng.sample(range(n), 2))) for _ in range(80)})
    edges = []
    for u, v in und:
        w = round(rng.random(), 3)
        edges.append((u, v, w))
        edges.append((v, u, w))
    ndf = spark.createDataFrame(list(node_labels.items()), "node int, label string")
    edf = spark.createDataFrame(edges, "src int, dst int, w double")
    got = {
        r.node: r.label
        for r in label_propagation(ndf, edf, n_iter=3, weight_col="w").collect()
    }
    assert got == _py_label_prop(node_labels, edges, 3)


def test_label_propagation_seeds_clamped_and_frontier_spreads(spark):
    from spacy_ann_linker_spark.extras.graph import label_propagation

    # path 0-1-2-3; seeds at the ends with different labels
    nodes = [(0, "a"), (1, None), (2, None), (3, "b")]
    edges = [(u, v) for u, v in [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]]
    ndf = spark.createDataFrame(nodes, "node int, label string")
    edf = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.label for r in label_propagation(ndf, edf, n_iter=1).collect()}
    assert got == {0: "a", 1: "a", 2: "b", 3: "b"}
    # round 2 (synchronous, from round-1 state): node 1 hears {a from 0,
    # b from 2} and node 2 hears {a from 1, b from 3} — both equal-support
    # ties resolve to "a" by label-asc; seeds never flip
    got2 = {r.node: r.label for r in label_propagation(ndf, edf, n_iter=2).collect()}
    assert got2 == {0: "a", 1: "a", 2: "a", 3: "b"}


def test_label_propagation_partition_invariance(spark):
    import random

    from spacy_ann_linker_spark.extras.graph import label_propagation

    rng = random.Random(9)
    nodes = [(i, "x" if i < 3 else ("y" if i < 5 else None)) for i in range(25)]
    edges = []
    for _ in range(70):
        u, v = rng.sample(range(25), 2)
        edges += [(u, v), (v, u)]
    ndf = spark.createDataFrame(nodes, "node int, label string")
    edf = spark.createDataFrame(edges, "src int, dst int")

    def run(nd, ed):
        return {
            (r.node, r.label)
            for r in label_propagation(nd, ed, n_iter=3).collect()
        }

    assert run(ndf.repartition(1), edf.repartition(1)) == run(
        ndf.repartition(8), edf.repartition(16)
    )


def test_pagerank_empty_graph_and_reliable_checkpoints(spark, tmp_path):
    from spacy_ann_linker_spark.extras.graph import label_propagation, pagerank

    empty = spark.createDataFrame([], "src int, dst int")
    assert pagerank(empty).count() == 0

    edges = [(i, (i + 1) % 9) for i in range(9)] + [(0, 5), (7, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    local = {(r.node, round(r.rank, 12)) for r in pagerank(df, n_iter=4).collect()}
    reliable = {
        (r.node, round(r.rank, 12))
        for r in pagerank(df, n_iter=4, checkpoint_dir=str(tmp_path / "pr")).collect()
    }
    assert local == reliable

    ndf = spark.createDataFrame(
        [(i, "a" if i == 0 else None) for i in range(9)], "node int, label string"
    )
    lp_local = {
        (r.node, r.label) for r in label_propagation(ndf, df, n_iter=2).collect()
    }
    lp_rel = {
        (r.node, r.label)
        for r in label_propagation(
            ndf, df, n_iter=2, checkpoint_dir=str(tmp_path / "lp")
        ).collect()
    }
    assert lp_local == lp_rel
