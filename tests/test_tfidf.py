"""TF-IDF fit/transform against hand-computed sklearn formulas
(idf = ln((1+N)/(1+df)) + 1, L2 row norm — SURVEY.md A1-A3)."""

import math

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.vectorize import tfidf


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [("d1", "abc"), ("d2", "abc"), ("d3", "xyz")], "doc string, text string"
    )


def test_min_df_prunes_rare_ngrams(spark, corpus):
    model = tfidf.fit(corpus, "doc", "text", min_df=2)
    vocab = {r["ngram"]: r for r in model.vocab.collect()}
    # "abc" grams appear in 2 docs -> kept; "xyz" grams in 1 -> pruned
    assert set(vocab) == {" ab", "abc", "bc "}
    for r in vocab.values():
        assert r["df"] == 2
        assert r["idf"] == pytest.approx(math.log((1 + 3) / (1 + 2)) + 1)


def test_transform_l2_normalized(spark, corpus):
    model = tfidf.fit(corpus, "doc", "text", min_df=2)
    vecs = tfidf.transform(model, corpus, "doc", "text")
    norms = (
        vecs.groupBy("doc")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("sq"))
        .collect()
    )
    assert {r["doc"] for r in norms} == {"d1", "d2"}  # d3 is all-OOV -> dropped (F2/F3)
    for r in norms:
        assert r["sq"] == pytest.approx(1.0)


def test_identical_strings_cosine_one(spark, corpus):
    model = tfidf.fit(corpus, "doc", "text", min_df=2)
    q = spark.createDataFrame([("q1", "ABC")], "doc string, text string")
    qv = tfidf.transform(model, q, "doc", "text").withColumnRenamed("weight", "wq")
    dv = tfidf.transform(model, corpus, "doc", "text").withColumnRenamed("weight", "wd")
    sims = (
        qv.join(dv.withColumnRenamed("doc", "doc2"), "idx")
        .groupBy("doc2")
        .agg(F.sum(F.col("wq") * F.col("wd")).alias("sim"))
        .collect()
    )
    by_doc = {r["doc2"]: r["sim"] for r in sims}
    assert by_doc["d1"] == pytest.approx(1.0)
    assert by_doc["d2"] == pytest.approx(1.0)
    assert "d3" not in by_doc


def test_tf_weighting(spark):
    # doc with a repeated ngram gets tf=2 weighting before normalization
    df = spark.createDataFrame([("d1", "aaaa"), ("d2", "aaab")], "doc string, text string")
    model = tfidf.fit(df, "doc", "text", min_df=2)
    vocab = {r["ngram"] for r in model.vocab.collect()}
    assert " aa" in vocab and "aaa" in vocab
    v1 = {r["idx"]: r["weight"] for r in tfidf.transform(model, df, "doc", "text").filter(F.col("doc") == "d1").collect()}
    # "aaaa" -> [" aa","aaa","aaa","aa "]: the tf=2 gram has double weight pre-norm
    weights = sorted(v1.values())
    assert len(weights) >= 2
