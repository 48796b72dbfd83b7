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
