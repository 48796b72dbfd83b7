"""cluster/fellegi_sunter.py: FS pair scoring and EM parameter estimation."""

import math

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.cluster.fellegi_sunter import (
    agreement_pattern_counts,
    estimate_mu_em,
    fellegi_sunter_score,
    fs_weights,
)

W = {"name": (0.9, 0.1), "phone": (0.8, 0.05)}


def test_fs_weights_values_and_validation():
    w = fs_weights(W)
    assert math.isclose(w["name"][0], math.log2(0.9 / 0.1))
    assert math.isclose(w["name"][1], math.log2(0.1 / 0.9))
    assert math.isclose(w["phone"][0], math.log2(0.8 / 0.05))
    with pytest.raises(ValueError):
        fs_weights({"x": (1.0, 0.1)})
    with pytest.raises(ValueError):
        fs_weights({"x": (0.9, 0.0)})


def test_score_hand_computed_with_nulls(spark):
    rows = [(1, 2, 1, 1), (1, 3, 1, 0), (1, 4, 0, 0), (1, 5, None, 1)]
    df = spark.createDataFrame(rows, "id_a int, id_b int, name int, phone int")
    out = {
        (r.id_a, r.id_b): r.fs_score
        for r in fellegi_sunter_score(df, W).collect()
    }
    wn = fs_weights(W)["name"]
    wp = fs_weights(W)["phone"]
    assert math.isclose(out[(1, 2)], wn[0] + wp[0])
    assert math.isclose(out[(1, 3)], wn[0] + wp[1])
    assert math.isclose(out[(1, 4)], wn[1] + wp[1])
    # NULL field contributes zero evidence
    assert math.isclose(out[(1, 5)], 0.0 + wp[0])


def test_score_accepts_booleans(spark):
    df = spark.createDataFrame(
        [(1, True, False)], "id int, name boolean, phone boolean"
    )
    r = fellegi_sunter_score(df, W).collect()[0]
    wn, wp = fs_weights(W)["name"], fs_weights(W)["phone"]
    assert math.isclose(r.fs_score, wn[0] + wp[1])


def test_score_is_pure_projection(spark):
    df = spark.createDataFrame([(1, 1, 1)], "id int, name int, phone int")
    plan = (
        fellegi_sunter_score(df, W)._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("Exchange", "Sort", "Aggregate", "Window"):
        assert node not in plan, plan[:2000]


def test_pattern_counts(spark):
    rows = [(1, 1), (1, 1), (1, 0), (None, 1)]
    df = spark.createDataFrame(rows, "name int, phone int")
    got = {
        (r.name, r.phone): r.n_pairs
        for r in agreement_pattern_counts(df, ["name", "phone"]).collect()
    }
    assert got == {(1, 1): 2, (1, 0): 1, (None, 1): 1}


def _python_em_reference(rows, fields, p, m, u, iters, clamp=1e-6):
    """Independent per-row EM (no pattern aggregation, no numpy) — the
    naive textbook implementation the distributed one must reproduce."""
    k = len(fields)
    m, u = list(m), list(u)
    for _ in range(iters):
        gs = []
        for r in rows:
            lm = math.log(p)
            lu = math.log(1.0 - p)
            for i in range(k):
                v = r[i]
                if v is None:
                    continue
                lm += math.log(m[i]) if v == 1 else math.log(1.0 - m[i])
                lu += math.log(u[i]) if v == 1 else math.log(1.0 - u[i])
            hi = max(lm, lu)
            g = math.exp(lm - hi) / (math.exp(lm - hi) + math.exp(lu - hi))
            gs.append(g)
        tot = len(rows)
        p = min(max(sum(gs) / tot, clamp), 1.0 - clamp)
        for i in range(k):
            wm_a = sum(g for g, r in zip(gs, rows) if r[i] == 1)
            wm_o = sum(g for g, r in zip(gs, rows) if r[i] is not None)
            wu_a = sum((1 - g) for g, r in zip(gs, rows) if r[i] == 1)
            wu_o = sum((1 - g) for g, r in zip(gs, rows) if r[i] is not None)
            m[i] = min(max(wm_a / max(wm_o, 1e-300), clamp), 1.0 - clamp)
            u[i] = min(max(wu_a / max(wu_o, 1e-300), clamp), 1.0 - clamp)
    return p, m, u


def test_em_matches_per_row_python_reference(spark):
    rows = (
        [(1, 1)] * 30 + [(1, 0)] * 10 + [(0, 1)] * 15
        + [(0, 0)] * 200 + [(None, 1)] * 5 + [(1, None)] * 3
    )
    df = spark.createDataFrame(rows, "name int, phone int")
    got = estimate_mu_em(df, ["name", "phone"], iters=7, tol=0.0)
    p, m, u = _python_em_reference(
        rows, ["name", "phone"], p=0.1, m=[0.9, 0.9], u=[0.1, 0.1], iters=7
    )
    assert got["n_iters"] == 7 and got["n_pairs"] == len(rows)
    assert math.isclose(got["p"], p, rel_tol=1e-9)
    for i, f in enumerate(["name", "phone"]):
        assert math.isclose(got["m"][f], m[i], rel_tol=1e-9), f
        assert math.isclose(got["u"][f], u[i], rel_tol=1e-9), f


def test_em_recovers_planted_parameters(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n = 20000
    true_p, true_m, true_u = 0.2, [0.95, 0.85, 0.9], [0.05, 0.2, 0.1]
    is_match = rng.random(n) < true_p
    cols = []
    for mi, ui in zip(true_m, true_u):
        pr = np.where(is_match, mi, ui)
        cols.append((rng.random(n) < pr).astype(int))
    rows = [tuple(int(c[i]) for c in cols) for i in range(n)]
    df = spark.createDataFrame(rows, "f1 int, f2 int, f3 int")
    est = estimate_mu_em(df, ["f1", "f2", "f3"], iters=200, tol=1e-12)
    assert abs(est["p"] - true_p) < 0.03
    for f, mt, ut in zip(["f1", "f2", "f3"], true_m, true_u):
        assert abs(est["m"][f] - mt) < 0.05, (f, est["m"][f], mt)
        assert abs(est["u"][f] - ut) < 0.05, (f, est["u"][f], ut)


def test_em_partition_invariant(spark):
    rows = [(1, 1)] * 20 + [(0, 0)] * 80 + [(1, 0)] * 7
    df = spark.createDataFrame(rows, "name int, phone int")
    a = estimate_mu_em(df, ["name", "phone"], iters=15, tol=0.0)
    b = estimate_mu_em(df.repartition(7), ["name", "phone"], iters=15, tol=0.0)
    assert a == b


def test_em_then_score_separates_planted_matches(spark):
    """Composed: estimate weights unsupervised, score with them — planted
    matches must land above planted non-matches on average."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 5000
    is_match = rng.random(n) < 0.25
    f1 = np.where(rng.random(n) < np.where(is_match, 0.95, 0.05), 1, 0)
    f2 = np.where(rng.random(n) < np.where(is_match, 0.9, 0.15), 1, 0)
    rows = [(int(i), int(a), int(b), bool(t)) for i, (a, b, t) in enumerate(zip(f1, f2, is_match))]
    df = spark.createDataFrame(rows, "pair_id int, f1 int, f2 int, gold boolean")
    est = estimate_mu_em(df, ["f1", "f2"], iters=100)
    weights = {f: (est["m"][f], est["u"][f]) for f in ["f1", "f2"]}
    scored = fellegi_sunter_score(df, weights)
    means = {
        r.gold: r.avg
        for r in scored.groupBy("gold").agg(F.avg("fs_score").alias("avg")).collect()
    }
    assert means[True] > means[False] + 1.0


# ---- TF-adjusted scoring ----------------------------------------------------


def _tf_fixture(spark):
    from spacy_ann_linker_spark.cluster.fellegi_sunter import term_frequencies

    # 10 records: surname "smith" x8 (tf .8), "zyzmund" x2 (tf .2)
    recs = spark.createDataFrame(
        [(i, "smith" if i < 8 else "zyzmund") for i in range(10)],
        "rid int, surname string",
    )
    tf = term_frequencies(recs, "surname")
    pairs = spark.createDataFrame(
        [
            (1, 2, "smith", "smith"),      # common agreement
            (8, 9, "zyzmund", "zyzmund"),  # rare agreement
            (1, 8, "smith", "zyzmund"),    # disagreement
            (1, 9, None, "zyzmund"),       # missing
            (2, 3, "nowhere", "nowhere"),  # agreement on value absent from corpus
        ],
        "id_a int, id_b int, surname_a string, surname_b string",
    )
    return tf, pairs


def test_tf_adjusted_rare_agreement_beats_common(spark):
    from spacy_ann_linker_spark.cluster.fellegi_sunter import fellegi_sunter_score_tf

    tf, pairs = _tf_fixture(spark)
    w = {"surname": (0.9, 0.1)}
    got = {
        (r["id_a"], r["id_b"]): r["fs_score"]
        for r in fellegi_sunter_score_tf(pairs, w, {"surname": tf}).collect()
    }
    base_a = math.log2(0.9 / 0.1)
    assert got[(1, 2)] == pytest.approx(base_a + math.log2(0.1 / 0.8))
    assert got[(8, 9)] == pytest.approx(base_a + math.log2(0.1 / 0.2))
    assert got[(8, 9)] > got[(1, 2)]  # rare value is stronger evidence
    assert got[(1, 8)] == pytest.approx(math.log2(0.1 / 0.9))  # plain disagreement
    assert got[(1, 9)] == 0.0  # missing field -> no evidence
    assert got[(2, 3)] == pytest.approx(base_a)  # unknown value -> unadjusted


def test_tf_adjusted_tf_weight_damping_and_broadcast_off(spark):
    from spacy_ann_linker_spark.cluster.fellegi_sunter import fellegi_sunter_score_tf

    tf, pairs = _tf_fixture(spark)
    w = {"surname": (0.9, 0.1)}
    half = {
        (r["id_a"], r["id_b"]): r["fs_score"]
        for r in fellegi_sunter_score_tf(pairs, w, {"surname": tf}, tf_weight=0.5).collect()
    }
    assert half[(1, 2)] == pytest.approx(math.log2(0.9 / 0.1) + 0.5 * math.log2(0.1 / 0.8))
    on = fellegi_sunter_score_tf(pairs, w, {"surname": tf}).collect()
    off = fellegi_sunter_score_tf(pairs, w, {"surname": tf}, broadcast_tf=False).collect()
    key = lambda r: (r["id_a"], r["id_b"])
    assert {key(r): r["fs_score"] for r in on} == {key(r): r["fs_score"] for r in off}


def test_term_frequencies_sums_to_one_and_skips_nulls(spark):
    from spacy_ann_linker_spark.cluster.fellegi_sunter import term_frequencies

    recs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "rid int, v string"
    )
    got = {r["value"]: r["tf"] for r in term_frequencies(recs, "v").collect()}
    assert got == {"a": pytest.approx(2 / 3), "b": pytest.approx(1 / 3)}
