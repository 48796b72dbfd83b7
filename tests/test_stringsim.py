"""Jaro-Winkler goldens (public textbook values) + fuzzy-rescue behavior."""

import pytest

from spacy_ann_linker_spark.functions.stringsim import jaro, jaro_winkler


def test_jaro_textbook_values():
    assert jaro("martha", "marhta") == pytest.approx(0.944444, abs=1e-5)
    assert jaro("dixon", "dicksonx") == pytest.approx(0.766667, abs=1e-5)
    assert jaro("", "abc") == 0.0
    assert jaro("abc", "abc") == 1.0


def test_jaro_winkler_textbook_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.961111, abs=1e-5)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.813333, abs=1e-5)
    assert jaro_winkler("research", "reserch") > 0.9


def test_fuzzy_rescue_recovers_typos(spark):
    from spacy_ann_linker_spark.link.linker import best_aliases
    from spacy_ann_linker_spark.pipeline import build_golden_model

    model = build_golden_model(spark, min_df=1).cand
    # "Reserh" scores cosine 0.622 (< 0.7, dropped) but JW 0.95 (rescued)
    t = spark.createDataFrame([("Reserh",), ("Machine learning",)], "text string")
    no_rescue = best_aliases(model, t, threshold=0.7, fuzzy_rescue=False).collect()
    rescued = best_aliases(model, t, threshold=0.7, fuzzy_rescue=True).collect()
    assert {r["text"] for r in no_rescue} == {"Machine learning"}
    got = {r["text"]: r["alias"] for r in rescued}
    assert got == {"Reserh": "Research", "Machine learning": "Machine learning"}


def test_batch_matches_scalar_property():
    """The numpy-vectorized batch JW must agree with the scalar reference on
    every pair hypothesis can construct (unicode, empties, repeats)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from spacy_ann_linker_spark.functions.stringsim import jaro_winkler_batch

    alphabet = st.characters(codec="utf-8", exclude_categories=("Cs",))
    strs = st.text(alphabet=alphabet, max_size=24)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(strs, strs), min_size=1, max_size=40))
    def check(pairs):
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        got = jaro_winkler_batch(a, b)
        want = np.array([jaro_winkler(x, y) for x, y in pairs])
        assert np.allclose(got, want, atol=1e-12), list(zip(pairs, got, want))

    check()


def test_batch_textbook_and_edges():
    import numpy as np

    from spacy_ann_linker_spark.functions.stringsim import jaro_winkler_batch

    a = ["martha", "dixon", "", "abc", "a", "a", "research"]
    b = ["marhta", "dicksonx", "abc", "abc", "a", "b", "reserch"]
    got = jaro_winkler_batch(a, b)
    want = np.array([jaro_winkler(x, y) for x, y in zip(a, b)])
    assert np.allclose(got, want)
    assert got[3] == 1.0 and got[4] == 1.0 and got[5] == 0.0


def test_jw_boost_threshold_matches_duckdb():
    """boost_threshold=0.7 must reproduce DuckDB's jaro_winkler_similarity
    exactly (the jw_similarity oracle row depends on it). The only pinned
    divergence: two empty strings (identity short-circuit 1.0 here, 0.0 in
    DuckDB)."""
    import random

    import duckdb

    from spacy_ann_linker_spark.functions.stringsim import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    con = duckdb.connect()
    rng = random.Random(11)

    def rnd():
        return "".join(rng.choice("abcdeab x") for _ in range(rng.randint(1, 14)))

    pa, pb = zip(*[(rnd(), rnd()) for _ in range(500)])
    batch = jaro_winkler_batch(list(pa), list(pb), boost_threshold=0.7)
    for s1, s2, got in zip(pa, pb, batch):
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(got - want) < 1e-12, (s1, s2, got, want)
        assert abs(jaro_winkler(s1, s2, boost_threshold=0.7) - want) < 1e-12

    # default (boost always) differs from the gated convention only below
    # the gate: spot-check the canonical pair
    assert jaro_winkler("NLP", "NPL") > jaro_winkler("NLP", "NPL", boost_threshold=0.7)


# ---- monge_elkan_pairs ------------------------------------------------------


def _me_py(a: str, b: str) -> float:
    import re

    ta = list(dict.fromkeys(w for w in re.split(r"[^a-z0-9]+", a.lower()) if w))
    tb = list(dict.fromkeys(w for w in re.split(r"[^a-z0-9]+", b.lower()) if w))
    if not ta or not tb:
        return 0.0
    return sum(
        max(jaro_winkler(x, y, boost_threshold=0.7) for y in tb) for x in ta
    ) / len(ta)


def test_monge_elkan_matches_python_reference(spark):
    import random

    from spacy_ann_linker_spark.functions.stringsim import monge_elkan_pairs

    rng = random.Random(5)
    words = ["acme", "steel", "works", "global", "inc", "acem", "stela", "word"]

    def name():
        return " ".join(rng.sample(words, rng.randint(1, 4)))

    rows = [(i, name(), name()) for i in range(60)]
    df = spark.createDataFrame(rows, "pid int, name_a string, name_b string")
    got = {
        r["pid"]: r["me_sim"]
        for r in monge_elkan_pairs(df).select("pid", "me_sim").collect()
    }
    for pid, a, b in rows:
        assert got[pid] == pytest.approx(_me_py(a, b), abs=1e-9), (a, b)


def test_monge_elkan_reorder_invariance_and_asymmetry(spark):
    from spacy_ann_linker_spark.functions.stringsim import monge_elkan_pairs

    df = spark.createDataFrame(
        [
            (1, "proceedings of the vldb", "vldb proceedings"),
            (2, "vldb proceedings", "proceedings of the vldb"),
            (3, "acme steel", "acme steel"),
            (4, "acme", "???"),
            (5, "???", "acme"),
        ],
        "pid int, name_a string, name_b string",
    )
    got = {r["pid"]: r["me_sim"] for r in monge_elkan_pairs(df).collect()}
    # every left token of (2) has an exact right match -> 1.0; (1) carries
    # unmatched 'of'/'the' so it is strictly lower: the documented asymmetry
    assert got[2] == pytest.approx(1.0)
    assert got[1] < 1.0
    assert got[3] == pytest.approx(1.0)
    assert got[4] == 0.0 and got[5] == 0.0  # empty token side scores 0

    sym = {
        r["pid"]: r["me_sim"]
        for r in monge_elkan_pairs(df, symmetric=True).collect()
    }
    assert sym[1] == pytest.approx(sym[2]) == pytest.approx((got[1] + got[2]) / 2)


def test_monge_elkan_duplicate_pairs_scored_once_and_preserved(spark):
    """The dedup-first memo shape: repeated (a, b) rows all get the same
    score and multiplicity is preserved in the output."""
    from spacy_ann_linker_spark.functions.stringsim import monge_elkan_pairs

    df = spark.createDataFrame(
        [(i, "acme steel", "acme stela") for i in range(7)],
        "pid int, name_a string, name_b string",
    )
    out = monge_elkan_pairs(df).collect()
    assert len(out) == 7
    assert len({r["me_sim"] for r in out}) == 1
    assert out[0]["me_sim"] == pytest.approx(_me_py("acme steel", "acme stela"))


# ---- soft_tfidf_pairs -------------------------------------------------------


def _soft_tfidf_py(recs, pairs, theta=0.9):
    """Independent per-definition implementation (distinct lowercase
    tokens, idf = ln(1+N/df), L2 per-record norm, argmax by 9-dp-rounded
    JW then token asc)."""
    import math
    import re
    from collections import Counter

    toks = {
        i: sorted(set(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w))
        for i, t in recs
    }
    n = len(recs)
    df = Counter(t for ts in toks.values() for t in ts)
    w = {}
    for i, ts in toks.items():
        raw = {t: math.log(1 + n / df[t]) for t in ts}
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        w[i] = {t: v / nrm for t, v in raw.items()} if nrm else {}
    out = {}
    for a, b in pairs:
        s = 0.0
        for ta in toks[a]:
            cands = [
                (round(jaro_winkler(ta, tb, boost_threshold=0.7), 9), tb)
                for tb in toks[b]
            ]
            if not cands:
                continue
            jwv, tb = min(cands, key=lambda c: (-c[0], c[1]))
            # min on (-jw, token) == argmax jw with token ASC ties
            if jwv > theta:
                s += w[a][ta] * w[b][tb] * jwv
        out[(a, b)] = s
    return out


def test_soft_tfidf_matches_python_reference(spark):
    import random

    from spacy_ann_linker_spark.functions.stringsim import soft_tfidf_pairs

    rng = random.Random(17)
    words = ["acme", "steel", "works", "global", "inc", "acem", "stela", "corp"]
    recs = [(i, " ".join(rng.sample(words, rng.randint(1, 4)))) for i in range(40)]
    prs = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    rdf = spark.createDataFrame(recs, "id int, text string")
    pdf = spark.createDataFrame(prs, "id_a int, id_b int").distinct()
    got = {
        (r["id_a"], r["id_b"]): r["soft_tfidf"]
        for r in soft_tfidf_pairs(rdf, pdf).collect()
    }
    want = _soft_tfidf_py(recs, set(prs))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_soft_tfidf_self_pair_is_one_and_rare_token_dominates(spark):
    from spacy_ann_linker_spark.functions.stringsim import soft_tfidf_pairs

    recs = [
        (1, "zyxwv inc"),
        (2, "zyxwv corp"),
        (3, "acme inc"),
        (4, "acme corp"),
        (5, "other inc"),
    ]
    rdf = spark.createDataFrame(recs, "id int, text string")
    pdf = spark.createDataFrame(
        [(1, 1), (1, 2), (3, 5)], "id_a int, id_b int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["soft_tfidf"]
        for r in soft_tfidf_pairs(rdf, pdf).collect()
    }
    assert got[(1, 1)] == pytest.approx(1.0)  # L2 norm -> self-score 1
    # sharing the unique 'zyxwv' outweighs sharing the common 'inc'
    assert got[(1, 2)] > got[(3, 5)] > 0.0


def test_soft_tfidf_no_close_tokens_scores_zero_and_keeps_row(spark):
    from spacy_ann_linker_spark.functions.stringsim import soft_tfidf_pairs

    rdf = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "???")],
        "id int, text string",
    )
    pdf = spark.createDataFrame([(1, 2), (1, 3)], "id_a int, id_b int")
    got = {
        (r["id_a"], r["id_b"]): r["soft_tfidf"]
        for r in soft_tfidf_pairs(rdf, pdf, theta=0.95).collect()
    }
    assert got == {(1, 2): 0.0, (1, 3): 0.0}


# ---- damerau_levenshtein ----------------------------------------------------


def test_damerau_levenshtein_matches_duckdb_on_ascii():
    """Property: scalar true-DL == DuckDB damerau_levenshtein on ASCII
    (DuckDB is byte-based; ASCII bytes == codepoints so they must agree)."""
    import random

    import duckdb

    from spacy_ann_linker_spark.functions.stringsim import damerau_levenshtein

    con = duckdb.connect()
    rng = random.Random(99)
    pairs = [
        (
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))),
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))),
        )
        for _ in range(2000)
    ] + [("ca", "abc"), ("ab", "ba"), ("", ""), ("a", ""), ("recieve", "receive")]
    for a, b in pairs:
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    # the unrestricted-vs-OSA witness: OSA says 3, true DL says 2
    assert damerau_levenshtein("ca", "abc") == 2
    con.close()


def test_damerau_levenshtein_batch_matches_scalar():
    import random

    import numpy as np

    from spacy_ann_linker_spark.functions.stringsim import (
        damerau_levenshtein,
        damerau_levenshtein_batch,
    )

    rng = random.Random(7)
    a = ["".join(rng.choice("abcdefg xyz") for _ in range(rng.randint(0, 40))) for _ in range(500)]
    b = ["".join(rng.choice("abcdefg xyz") for _ in range(rng.randint(0, 40))) for _ in range(500)]
    got = damerau_levenshtein_batch(a, b)
    want = np.array([damerau_levenshtein(x, y) for x, y in zip(a, b)])
    assert (got == want).all()
    # empty batch
    assert len(damerau_levenshtein_batch([], [])) == 0


def test_damerau_levenshtein_codepoint_not_byte_semantics():
    """We count CODEPOINT edits (Spark's levenshtein convention); DuckDB
    counts UTF-8 BYTES ('ü' is 2 bytes there). The batch kernel's
    non-latin-1 fallback must agree with the scalar, both saying 1."""
    from spacy_ann_linker_spark.functions.stringsim import (
        damerau_levenshtein,
        damerau_levenshtein_batch,
    )

    assert damerau_levenshtein("übermut", "ubermut") == 1
    assert list(damerau_levenshtein_batch(["übermut", "日本"], ["ubermut", "日木"])) == [1, 1]


def test_damerau_udf_on_spark(spark):
    from pyspark.sql import functions as F

    from spacy_ann_linker_spark.functions.stringsim import damerau_levenshtein_udf

    df = spark.createDataFrame(
        [("ca", "abc"), ("recieve", "receive"), (None, "x"), ("", "")],
        "a string, b string",
    )
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select("a", "b", damerau_levenshtein_udf("a", "b").alias("d")).collect()
    }
    assert got == {("ca", "abc"): 2, ("recieve", "receive"): 1, (None, "x"): 1, ("", ""): 0}
