"""extras/profiling.py: heavy-hitter terms and group percentiles."""

import math

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.profiling import group_percentiles, topk_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "en", "the cat sat on the mat the cat"),
        ("d2", "en", "the dog ate the bone"),
        ("d3", "en", "a cat and a dog"),
        ("d4", "fr", "le chat le chien le chat"),
        ("d5", "fr", "un chat"),
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


def test_topk_terms_counts_and_tiebreak(docs):
    out = topk_terms(docs, "lang", 3)
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, []).append((r.term, r.n))
    # en: the=5, cat=3, dog=2/a=2 -> tie broken term-asc picks "a"
    en = dict(by_lang["en"])
    assert en["the"] == 5 and en["cat"] == 3
    assert set(en) == {"the", "cat", "a"}  # "a" beats "dog" on term asc
    # fr: le=3, chat=3 (le beats chat? no — n desc then term asc: both 3,
    # "chat" < "le") so top-3 is chat=3, le=3, chien=1 or un=1 -> chien
    fr = dict(by_lang["fr"])
    assert fr == {"chat": 3, "le": 3, "chien": 1}
    assert all(len(v) == 3 for v in by_lang.values())


def test_topk_terms_k_larger_than_vocab(docs):
    out = topk_terms(docs.filter("doc_id = 'd5'"), "lang", 100)
    assert sorted((r.term, r.n) for r in out.collect()) == [("chat", 1), ("un", 1)]


def test_topk_terms_plans_window_group_limit(docs):
    """The rank<=k filter must plan as WindowGroupLimit so map tasks
    pre-prune to local top-k per group before the exchange."""
    plan = topk_terms(docs, "lang", 3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_group_percentiles_matches_numpy(spark):
    import numpy as np

    vals = {"a": [1.0, 2.0, 3.0, 4.0, 10.0], "b": [5.0, 7.0]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {
        r.grp: (r.p25, r.p50, r.p75, r.p95)
        for r in group_percentiles(df, "grp", "x").collect()
    }
    for g, vs in vals.items():
        exp = np.percentile(vs, [25, 50, 75, 95])  # linear interpolation
        for got, want in zip(out[g], exp):
            assert math.isclose(got, want, rel_tol=0, abs_tol=1e-9), (g, got, want)


def test_group_percentiles_custom_probs_and_names(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(101)], "grp string, x double")
    out = group_percentiles(df, "grp", "x", probs=(0.025, 0.5))
    assert out.columns == ["grp", "p2_5", "p50"]
    row = out.collect()[0]
    assert math.isclose(row.p2_5, 2.5, abs_tol=1e-9)
    assert math.isclose(row.p50, 50.0, abs_tol=1e-9)


def test_group_percentiles_approx_path(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(1001)], "grp string, x double")
    row = group_percentiles(df, "grp", "x", exact=False).collect()[0]
    # GK summaries: bounded rank error, not exact — generous tolerance
    assert abs(row.p50 - 500.0) <= 5
    assert abs(row.p95 - 950.0) <= 5


def test_group_percentiles_single_pass_hash_agg(spark):
    """exact path: one ObjectHashAggregate pair (partial+final), no sort of
    the input rows."""
    df = spark.createDataFrame([("a", 1.0)], "grp string, x double")
    plan = group_percentiles(df, "grp", "x")._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan, plan[:2000]


# ------------------------------------------------------------- token_pmi


def test_token_pmi_hand_computed(spark):
    import math

    from spacy_ann_linker_spark.extras.profiling import token_pmi

    # 4 docs; (alpha, beta) co-occur in 2 of them, each appears in 3
    rows = [
        (1, "alpha beta noise1"),
        (2, "alpha beta noise2"),
        (3, "alpha gamma noise3"),
        (4, "beta gamma noise4"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["tok_a"], r["tok_b"]): (r["n_pair"], r["pmi"])
        for r in token_pmi(df, min_df=2, min_pair_count=1).collect()
    }
    n_pair, pmi = got[("alpha", "beta")]
    assert n_pair == 2
    assert pmi == pytest.approx(math.log(2 * 4 / (3 * 3)))
    # gamma pairs occur once each: pmi = ln(1*4/(3*2))
    assert got[("alpha", "gamma")][1] == pytest.approx(math.log(4 / 6))
    # pair orientation is always tok_a < tok_b
    assert all(a < b for a, b in got)


def test_token_pmi_df_band_governs_pairs(spark):
    from spacy_ann_linker_spark.extras.profiling import token_pmi

    rows = [(i, f"stopword rare{i % 2} filler{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # stopword (df=6) excluded by max_df=5; filler* (df=1) by min_df=2
    got = token_pmi(df, min_df=2, max_df=5, min_pair_count=1).collect()
    toks = {t for r in got for t in (r["tok_a"], r["tok_b"])}
    assert toks == set()  # rare0/rare1 never co-occur in one doc
    got2 = token_pmi(df, min_df=2, min_pair_count=1).collect()
    toks2 = {t for r in got2 for t in (r["tok_a"], r["tok_b"])}
    assert "stopword" in toks2 and not any(t.startswith("filler") for t in toks2)


def test_token_pmi_min_pair_count_filters(spark):
    from spacy_ann_linker_spark.extras.profiling import token_pmi

    rows = [(1, "a b"), (2, "a b"), (3, "a c")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["tok_a"], r["tok_b"]) for r in token_pmi(df, min_df=1, min_pair_count=2).collect()
    }
    assert got == {("a", "b")}


# ---------------------------------------------------------- decayed_counts


def test_decayed_counts_hand_computed(spark):
    from spacy_ann_linker_spark.extras.profiling import decayed_counts

    # half-life 1 hour; ref = max ts = 12:00. a: events at 12:00 (w=1) and
    # 11:00 (w=0.5); b: one event at 10:00 (w=0.25)
    rows = [
        ("a", "2024-01-01 12:00:00"),
        ("a", "2024-01-01 11:00:00"),
        ("b", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string")
    got = {
        r["key"]: (r["n_events"], r["decayed_count"], r["prior"])
        for r in decayed_counts(df, "k", "ts", half_life_hours=1.0).collect()
    }
    assert got["a"][0] == 2 and got["a"][1] == pytest.approx(1.5)
    assert got["b"][0] == 1 and got["b"][1] == pytest.approx(0.25)
    assert got["a"][2] == pytest.approx(1.5 / 1.75)
    assert got["b"][2] == pytest.approx(0.25 / 1.75)


def test_decayed_counts_recency_beats_raw_frequency(spark):
    """The reason it exists: at equal counts the recent key takes the
    larger prior; with enough staleness even a LARGER count loses."""
    from spacy_ann_linker_spark.extras.profiling import decayed_counts

    rows = [("stale", f"2024-01-0{d} 00:00:00") for d in range(1, 6)] + [
        ("fresh", "2024-03-01 00:00:00"),
        ("fresh", "2024-03-01 01:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string")
    got = {r["key"]: r for r in decayed_counts(df, "k", "ts", half_life_hours=24.0).collect()}
    assert got["stale"]["n_events"] == 5 and got["fresh"]["n_events"] == 2
    assert got["fresh"]["prior"] > got["stale"]["prior"]


def test_decayed_counts_priors_sum_to_one(spark):
    from spacy_ann_linker_spark.extras.profiling import decayed_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    total = (
        decayed_counts(ev, "event_type", "ts")
        .agg(F.sum("prior").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0)
