"""Connected-components correctness (SURVEY.md J9)."""

from pyspark.sql import functions as F

from spacy_ann_linker_spark.cluster.cc import connected_components, connected_components_long


def _components_of(rows):
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["node"])
    return sorted((frozenset(v) for v in comps.values()), key=lambda fs: sorted(fs))


def test_two_chains(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)], "src long, dst long"
    )
    got = _components_of(connected_components_long(edges).collect())
    assert got == sorted([frozenset({1, 2, 3, 4}), frozenset({10, 11, 12})], key=lambda fs: sorted(fs))


def test_component_label_is_min(spark):
    edges = spark.createDataFrame([(5, 9), (9, 2), (7, 7), (3, 2)], "src long, dst long")
    rows = connected_components_long(edges).collect()
    labels = {r["node"]: r["component"] for r in rows}
    assert labels[5] == labels[9] == labels[2] == labels[3] == 2
    assert 7 not in labels  # self-loop-only node dropped (singleton)


def test_star_and_cycle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (20, 21), (21, 22), (22, 20)], "src long, dst long"
    )
    got = _components_of(connected_components_long(edges).collect())
    assert got == sorted([frozenset({1, 2, 3, 4}), frozenset({20, 21, 22})], key=lambda fs: sorted(fs))


def test_string_nodes(spark):
    edges = spark.createDataFrame(
        [("m:nlp", "e:a3"), ("m:NLP", "e:a3"), ("m:ml", "e:a1")], "src string, dst string"
    )
    rows = connected_components(edges).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["node"])
    comps = sorted((frozenset(v) for v in by_comp.values()), key=lambda fs: sorted(fs))
    assert comps == sorted(
        [frozenset({"m:nlp", "m:NLP", "e:a3"}), frozenset({"m:ml", "e:a1"})],
        key=lambda fs: sorted(fs),
    )


def test_cc_leaves_session_conf_untouched(spark):
    """CC sizes its loop shuffles with explicit repartition, never by
    mutating session-global spark.sql.shuffle.partitions — a concurrent job
    on the same session must see the original value at every point. A second
    action runs interleaved with the CC rounds (from a worker thread) and
    records the conf it observes."""
    import threading

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    observed, stop = [], threading.Event()

    def prober():
        while not stop.is_set():
            observed.append(spark.conf.get(key))
            spark.range(100).groupBy((F.col("id") % 3).alias("k")).count().collect()

    t = threading.Thread(target=prober)
    t.start()
    try:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 400, 2)] + [(i, i + 2) for i in range(0, 300, 3)],
            "src long, dst long",
        )
        connected_components_long(edges).collect()
    finally:
        stop.set()
        t.join()
    assert spark.conf.get(key) == before
    assert set(observed) == {before}, f"conf leaked mid-run: {set(observed)}"


def test_large_random_graph_matches_networkx_free_oracle(spark):
    # union-find oracle in plain python
    import random

    rnd = random.Random(7)
    edges = [(rnd.randint(0, 200), rnd.randint(0, 200)) for _ in range(300)]
    parent = list(range(201))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {}
    nodes_in_edges = {n for e in edges for n in e if e[0] != e[1]}
    for n in nodes_in_edges:
        want.setdefault(find(n), set()).add(n)

    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components_long(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["component"], set()).add(r["node"])
    k = lambda fs: sorted(fs)
    assert sorted(map(frozenset, got.values()), key=k) == sorted(map(frozenset, want.values()), key=k)


def test_incremental_components_equals_full_recompute(spark):
    """Random two-batch graph: contraction-based incremental CC must equal
    CC over the union of both batches, on the full node universe."""
    import random

    from spacy_ann_linker_spark.cluster.cc import (
        connected_components_long,
        incremental_components,
    )

    rng = random.Random(42)
    old = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    new = [(rng.randrange(120), rng.randrange(120)) for _ in range(40)]
    old_df = spark.createDataFrame(old, "src long, dst long").filter("src != dst").distinct()
    new_df = spark.createDataFrame(new, "src long, dst long").filter("src != dst").distinct()
    prev = connected_components_long(old_df)
    inc = {
        (r["node"], r["component"])
        for r in incremental_components(prev, new_df).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in connected_components_long(old_df.union(new_df)).collect()
    }
    assert inc == full
    assert inc, "fixture produced no components"


def test_incremental_components_bridges_merge_and_untouched_stay(spark):
    from spacy_ann_linker_spark.cluster.cc import incremental_components

    # prev: {1,2,3} -> 1, {10,11} -> 10, {20,21} -> 20
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "node long, component long",
    )
    # one bridge 3-10 merges the first two clusters; 30-31 is brand new
    new = spark.createDataFrame([(3, 10), (30, 31)], "src long, dst long")
    got = {(r["node"], r["component"]) for r in incremental_components(prev, new).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (10, 1), (11, 1),   # merged under global min
        (20, 20), (21, 20),                          # untouched cluster unchanged
        (30, 30), (31, 30),                          # new-only nodes clustered
    }
