"""Table-backed pure-JVM mean-pool (embedding.mean_pool_from_table).

The production embedding path when vectors are an artifact table (spaCy's
en_core_web_md — the reference's vector source, ann_linker.py:108 — IS a
token->vector table). Pinned here: agreement with the fixture pandas-UDF
path on in-vocabulary text, spaCy OOV semantics (zero vector, still in the
denominator), zero-token text, plan shape (no Python nodes), and full-link
parity when the table covers the corpus vocabulary.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.data.word_vectors import (
    DIM,
    mean_pool_batch,
    token_vector,
    tokenize,
    word_vector_rows,
)
from spacy_ann_linker_spark.link.embedding import mean_pool_from_table

VEC_SCHEMA = "token string, vector array<float>"


def _vectors_for(spark, texts):
    toks = [t for s in texts for t in tokenize(s)]
    return spark.createDataFrame(word_vector_rows(toks), VEC_SCHEMA)


def test_table_pool_matches_udf_path_in_vocab(spark):
    texts = [
        "NLP is a highly researched subset of machine learning.",
        "the quick brown fox",
        "chemistry of soil and water",
    ]
    vectors = _vectors_for(spark, texts)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {
        r["id"]: np.array(r["vector"])
        for r in mean_pool_from_table(df, ["id"], "text", vectors).collect()
    }
    want = mean_pool_batch(texts, DIM)
    for i in range(len(texts)):
        # table path sums float64, fixture path float32 — tolerance, not bits
        assert np.allclose(got[i], want[i], atol=1e-5), i


def test_oov_counts_in_denominator_with_zero_vector(spark):
    # "qzxv" is OOV: spaCy doc.vector semantics -> mean over 3 tokens where
    # one contributes zeros == sum(known 2) / 3
    vectors = _vectors_for(spark, ["machine learning"])
    df = spark.createDataFrame([(0, "machine learning qzxv")], "id int, text string")
    got = np.array(
        mean_pool_from_table(df, ["id"], "text", vectors).collect()[0]["vector"]
    )
    want = (token_vector("machine").astype(np.float64) + token_vector("learning")) / 3.0
    assert np.allclose(got, want, atol=1e-5)


def test_tokenless_and_null_text_embed_as_zeros(spark):
    vectors = _vectors_for(spark, ["machine"])
    df = spark.createDataFrame(
        [(0, "!!! ???"), (1, ""), (2, None)], "id int, text string"
    )
    rows = {r["id"]: r["vector"] for r in mean_pool_from_table(df, ["id"], "text", vectors).collect()}
    for i in range(3):
        assert rows[i] == [0.0] * DIM, i


def test_table_pool_plan_is_python_free(spark):
    vectors = _vectors_for(spark, ["machine"])
    df = spark.createDataFrame([(0, "machine")], "id int, text string")
    out = mean_pool_from_table(df, ["id"], "text", vectors)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_link_parity_with_vector_table(spark, golden_model):
    """Full link over the golden transcript fixture: the table-backed
    embedding (vocabulary built from the corpus) must produce the SAME
    entity links as the fixture UDF path — argmax is stable under the
    float64-vs-float32 summation difference."""
    from spacy_ann_linker_spark.data.transcripts import generate_labels, generate_transcripts
    from spacy_ann_linker_spark.link.linker import release_memos
    from spacy_ann_linker_spark.pipeline import link_transcripts

    turns = generate_transcripts(spark, 200)
    labels = generate_labels(spark, 200)
    mentions = labels.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"),
        F.col("mention").alias("text"),
        "start",
        "end",
        F.lit(None).cast("string").alias("label"),
    )
    corpus_tokens = [
        t for r in turns.select("text").collect() for t in tokenize(r["text"] or "")
    ]
    vectors = spark.createDataFrame(word_vector_rows(corpus_tokens), VEC_SCHEMA)

    def key(rows):
        return sorted((r["mention_id"], r["entity_id"]) for r in rows)

    base = key(link_transcripts(golden_model, turns, mentions=mentions).collect())
    release_memos()
    via_table = key(
        link_transcripts(
            golden_model, turns, mentions=mentions, word_vectors_table=vectors
        ).collect()
    )
    release_memos()
    assert base == via_table and len(base) > 100
