"""mutual_best_pairs: the conservative (matching-constrained) merge rule."""

import random

from pyspark.sql import functions as F

from spacy_ann_linker_spark.cluster.matching import mutual_best_pairs


def _py_mutual(pairs):
    """Reference: max score per unordered pair, best neighbor per node
    (score desc, neighbor asc), keep mutual pairs."""
    best_score = {}
    for a, b, s in pairs:
        u, v = min(a, b), max(a, b)
        best_score[(u, v)] = max(best_score.get((u, v), float("-inf")), s)
    nbrs = {}
    for (u, v), s in best_score.items():
        nbrs.setdefault(u, []).append((v, s))
        nbrs.setdefault(v, []).append((u, s))
    best = {u: min(vs, key=lambda t: (-t[1], t[0]))[0] for u, vs in nbrs.items()}
    out = set()
    for u, v in best_score:
        if best.get(u) == v and best.get(v) == u:
            out.add((u, v, best_score[(u, v)]))
    return out


def test_hand_case(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.95), (3, 4, 0.5), (1, 4, 0.9), (5, 6, 0.7), (5, 7, 0.7)],
        "id_a int, id_b int, score double",
    )
    got = sorted((r.id_a, r.id_b, r.score) for r in mutual_best_pairs(pairs).collect())
    # 1's best is 2 (tie 2 vs 4 at 0.9 -> smaller id); 2's best is 3 (0.95);
    # 3's best is 2 -> mutual. 5's best is 6 (tie 6 vs 7 -> smaller); 6's is 5.
    assert got == [(2, 3, 0.95), (5, 6, 0.7)]


def test_matches_python_reference_and_matching_property(spark):
    rng = random.Random(7)
    raw = []
    for _ in range(400):
        a, b = rng.sample(range(60), 2)
        raw.append((a, b, round(rng.random(), 3)))
    df = spark.createDataFrame(raw, "id_a int, id_b int, score double")
    got = {(r.id_a, r.id_b, r.score) for r in mutual_best_pairs(df).collect()}
    assert got == _py_mutual(raw)
    # matching property: every node appears in at most one surviving pair
    seen = set()
    for a, b, _ in got:
        assert a not in seen and b not in seen
        seen.update((a, b))


def test_asymmetric_duplicates_collapse_to_max(spark):
    # (1,2) reported twice with different scores: the max wins both directions
    pairs = spark.createDataFrame(
        [(1, 2, 0.4), (2, 1, 0.9), (1, 3, 0.6)], "id_a int, id_b int, score double"
    )
    got = {(r.id_a, r.id_b, r.score) for r in mutual_best_pairs(pairs).collect()}
    assert got == {(1, 2, 0.9)}


def test_partition_invariance(spark):
    rng = random.Random(11)
    raw = [
        (a, b, round(rng.random(), 3))
        for _ in range(300)
        for a, b in [rng.sample(range(50), 2)]
    ]
    df = spark.createDataFrame(raw, "id_a int, id_b int, score double")
    one = {(r.id_a, r.id_b, r.score) for r in mutual_best_pairs(df.repartition(1)).collect()}
    many = {(r.id_a, r.id_b, r.score) for r in mutual_best_pairs(df.repartition(16)).collect()}
    assert one == many


def test_bipartite_one_to_one(spark):
    # disjoint id spaces (left < 100 <= right): result is a one-to-one link set
    pairs = spark.createDataFrame(
        [(1, 101, 0.9), (1, 102, 0.8), (2, 101, 0.85), (2, 102, 0.95), (3, 103, 0.5)],
        "id_a int, id_b int, score double",
    )
    got = sorted((r.id_a, r.id_b) for r in mutual_best_pairs(pairs).collect())
    # 1->101 (0.9) and 101->1 (0.9 > 0.85) mutual; 2->102 (0.95), 102->2 mutual
    assert got == [(1, 101), (2, 102), (3, 103)]
    lefts = [a for a, _ in got]
    rights = [b for _, b in got]
    assert len(set(lefts)) == len(lefts) and len(set(rights)) == len(rights)


def test_self_pairs_and_nulls_ignored(spark):
    """A self-pair must not win a node's best slot (it would silently
    unmatch the node from real partners), and NULL ids drop."""
    pairs = spark.createDataFrame(
        [(1, 1, 0.99), (1, 2, 0.9), (2, 1, 0.9), (None, 3, 0.8)],
        "id_a int, id_b int, score double",
    )
    got = {(r.id_a, r.id_b, r.score) for r in mutual_best_pairs(pairs).collect()}
    assert got == {(1, 2, 0.9)}
