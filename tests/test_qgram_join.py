"""qgram_edit_pairs: exact-recall edit-distance self-join (Gravano VLDB'01
count/position/length filters + banded verify) — brute-force parity is the
whole contract, including the short-string direct path."""

import itertools
import random

from spacy_ann_linker_spark.extras.dedup import qgram_edit_pairs


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _brute(rows, k):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }


def _typo_corpus(seed=3, n_base=40):
    """Distinct strings: bases + single-edit variants + shorts + empties."""
    rng = random.Random(seed)
    al = "abcdefgh"
    vals = set()
    for _ in range(n_base):
        w = "".join(rng.choice(al) for _ in range(rng.randint(1, 12)))
        vals.add(w)
        # substitution, deletion, insertion variants
        if w:
            p = rng.randrange(len(w))
            vals.add(w[:p] + rng.choice(al) + w[p + 1 :])
            vals.add(w[:p] + w[p + 1 :])
        p = rng.randrange(len(w) + 1)
        vals.add(w[:p] + rng.choice(al) + w[p:])
    vals.update(["", "a", "b", "ab", "ba", "abc"])
    return [(i, v) for i, v in enumerate(sorted(vals))]


def test_brute_parity_k1_q2(spark):
    rows = _typo_corpus()
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in qgram_edit_pairs(df, "id", "t", max_distance=1, q=2).collect()
    }
    assert got == _brute(rows, 1)


def test_brute_parity_k2_q3(spark):
    rows = _typo_corpus(seed=9, n_base=25)
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in qgram_edit_pairs(df, "id", "t", max_distance=2, q=3).collect()
    }
    assert got == _brute(rows, 2)


def test_head_typo_recall_where_prefix_blocking_misses(spark):
    """The reason this operator exists: a first-character typo shares no
    prefix block with its original but must still pair."""
    from spacy_ann_linker_spark.extras.dedup import edit_distance_pairs

    rows = [(1, "christina"), (2, "xhristina"), (3, "christine")]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        (r.id_a, r.id_b)
        for r in qgram_edit_pairs(df, "id", "t", max_distance=1, q=2).collect()
    }
    assert (1, 2) in got and (1, 3) in got
    pref = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, "id", "t", prefix_len=4, max_distance=1).collect()
    }
    assert (1, 2) not in pref  # documents the prefix-blocking gap


def test_case_and_whitespace_normalized(spark):
    df = spark.createDataFrame([(1, " Smith"), (2, "smith ")], "id int, t string")
    got = qgram_edit_pairs(df, "id", "t", max_distance=1).collect()
    assert [(r.id_a, r.id_b, r.distance) for r in got] == [(1, 2, 0)]


def test_partition_invariance(spark):
    rows = _typo_corpus(seed=5, n_base=20)
    df = spark.createDataFrame(rows, "id int, t string")

    def run(d):
        return {
            (r.id_a, r.id_b, r.distance)
            for r in qgram_edit_pairs(d, "id", "t", max_distance=1, q=2).collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(16))
