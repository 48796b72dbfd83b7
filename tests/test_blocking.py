"""Blocked (LSH + sorted-neighborhood) candidate generation vs the exact
join — recall validation, the role HNSW recall tuning plays in the
reference. Plus salted-join equivalence."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.candidates.blocking import (
    generate_candidates_blocked,
    lsh_pairs,
    sorted_neighborhood_pairs,
)
from spacy_ann_linker_spark.candidates.generate import generate_candidates
from spacy_ann_linker_spark.operators.salted import salted_count_by_key, salted_join


@pytest.fixture(scope="module")
def prod_model(spark):
    from spacy_ann_linker_spark.pipeline import build_golden_model

    return build_golden_model(spark, min_df=1).cand


@pytest.fixture(scope="module")
def mention_corpus(spark):
    # verbatim aliases + typo'd variants (the realistic query mix)
    rows = [
        ("Research",), ("research",), ("Reserch",), ("Resarch",),
        ("Machine learning",), ("Machin lerning",), ("machine learning",),
        ("Natural language processing",), ("Natual language procesing",),
        ("Operating system",), ("Oprating system",), ("Statistics",),
        ("Stereochemistry",), ("Agronomy",), ("Agronmy",), ("ML",), ("OS",),
    ]
    return spark.createDataFrame(rows, "text string")


def test_blocked_recall_vs_exact(spark, prod_model, mention_corpus):
    exact = generate_candidates(prod_model, mention_corpus, k=5)
    blocked = generate_candidates_blocked(prod_model, mention_corpus, k=5)
    # every above-threshold exact candidate must be found by the blocked path
    e = {(r["text"], r["alias"]) for r in exact.filter(F.col("similarity") > 0.7).collect()}
    b = {(r["text"], r["alias"]) for r in blocked.filter(F.col("similarity") > 0.7).collect()}
    missing = e - b
    assert not missing, f"blocked path missed: {missing}"
    # and similarities agree exactly where both produce the pair (same cosine)
    es = {(r["text"], r["alias"]): r["similarity"] for r in exact.collect()}
    for r in blocked.collect():
        key = (r["text"], r["alias"])
        if key in es:
            assert r["similarity"] == pytest.approx(es[key], abs=1e-12)


def test_lsh_pairs_find_identical_strings(spark, prod_model):
    t = spark.createDataFrame([("research",), ("Research",)], "text string")
    pairs = lsh_pairs(t, prod_model.aliases)
    got = {(r["text"], r["alias"]) for r in pairs.collect()}
    assert ("research", "Research") in got and ("Research", "Research") in got


def test_sorted_neighborhood_catches_suffix_typos(spark, prod_model):
    t = spark.createDataFrame([("Reseqqqqq",)], "text string")  # LSH-hostile
    pairs = sorted_neighborhood_pairs(t, prod_model.aliases)
    assert ("Reseqqqqq", "Research") in {(r["text"], r["alias"]) for r in pairs.collect()}


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ["hot", "warm", "cold"] for i in range(50 if k == "hot" else 5)],
        "k string, v int",
    )
    small = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    plain = big.join(small, "k").orderBy("k", "v").collect()
    salted = salted_join(big, small, "k", salt_buckets=8).orderBy("k", "v").collect()
    assert plain == salted


def test_salted_count_equals_groupby(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(7)], "k string, v int"
    )
    want = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    got = {r["k"]: r["count"] for r in salted_count_by_key(df, "k").collect()}
    assert got == want
