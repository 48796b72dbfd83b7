"""Mean-pool text embedding (V3/V4): `nlp.make_doc(text).vector`
(cli/create_index.py:83; ann_linker.py:108) over the seeded deterministic
vector function. One Arrow-batched pandas UDF whose inner loop is batched
numpy (`mean_pool_batch`: one gather + one segmented reduceat per Arrow
batch) — no per-row Python in the hot path, no join against a vocabulary
table (the vector function is computed in place, so embedding N turns is
embarrassingly parallel and shuffle-free)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacy_ann_linker_spark.data.word_vectors import DIM, mean_pool_batch


def mean_pool_udf(dim: int = DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _pool(texts: pd.Series) -> pd.Series:
        return pd.Series(list(mean_pool_batch(texts, dim)))

    return _pool


def embed_texts(df: DataFrame, id_col: str, text_col: str, dim: int = DIM) -> DataFrame:
    """(id, vector array<float>) — one vector per input row."""
    return df.select(
        F.col(id_col), mean_pool_udf(dim)(F.col(text_col)).alias("vector")
    )


#: JVM twin of data/word_vectors.py `_TOKEN_RE` — same pattern, Java regex
#: semantics are identical for this ASCII class.
_TOKEN_PATTERN = r"[a-z0-9]+(?:'[a-z]+)?"


def mean_pool_from_table(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    vectors: DataFrame,
    dim: int = DIM,
    broadcast_vectors: bool = True,
    out_col: str = "vector",
) -> DataFrame:
    """Pure-JVM mean-pool against a word-vector TABLE `(token, vector)` —
    zero Python anywhere in the stage.

    This is the production path when embeddings are a real artifact table:
    spaCy's en_core_web_md (the reference's vector source,
    ann_linker.py:108) IS a fixed token->vector table, and at cluster scale
    a vector vocabulary lives in a table, not in a hash function. Semantics
    follow spaCy `doc.vector`: mean over ALL tokens, out-of-vocabulary
    tokens contribute a zero vector but still count in the denominator;
    token-less text embeds as the zero vector.

    The DEFAULT engine path (`mean_pool_udf`) instead derives OOV vectors
    from a seeded hash so the goldens exercise disambiguation without a
    closed vocabulary — the two paths agree (float64-vs-float32 summation
    tolerance) whenever every token is in the table; both are pinned by
    tests/test_embedding_table.py.

    Plan shape: JVM regex tokenize -> posexplode_outer -> broadcast join on
    token -> one hash aggregate with 2+dim partial-aggregating sums. With
    gold mention spans supplied and no fuzzy rescue, this makes the entire
    link plan Python-free. Set broadcast_vectors=False if the vocabulary
    outgrows broadcast range (the join becomes a shuffle equi-join on
    token; token frequency follows Zipf, so pair it with AQE skew-join —
    on by default in session.py)."""
    toks = df.select(
        *[F.col(c) for c in id_cols],
        F.posexplode_outer(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_PATTERN), 0)
        ).alias("_pos", "_tok"),
    )
    vec = vectors.select(F.col("token").alias("_tok"), F.col("vector").alias("_wv"))
    if broadcast_vectors:
        vec = F.broadcast(vec)
    joined = toks.join(vec, "_tok", "left")
    sums = joined.groupBy(*[F.col(c) for c in id_cols]).agg(
        F.count("_tok").alias("_n"),
        *[
            F.sum(F.coalesce(F.col("_wv")[i].cast("double"), F.lit(0.0))).alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    mean_arr = F.array(
        *[(F.col(f"_s{i}") / F.col("_n")).cast("float") for i in range(dim)]
    )
    zeros = F.array_repeat(F.lit(0.0).cast("float"), dim)
    return sums.select(
        *[F.col(c) for c in id_cols],
        F.when(F.col("_n") > 0, mean_arr).otherwise(zeros).alias(out_col),
    )


def with_vector_norm(df: DataFrame, vec_col: str = "vector", out_col: str = "vnorm") -> DataFrame:
    """L2 norm via JVM-side higher-order function (A6: np.linalg.norm,
    ann_linker.py:106). Squares computed in float64 — float32*float32 stays
    float32 in Spark, which diverges from every other engine's accumulation."""
    return df.withColumn(
        out_col,
        F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )


def dot_product(a, b):
    """Column expr: dot(a, b) over two array<float|double> columns —
    JVM-side zip_with/aggregate, stays inside codegen (no UDF). Inputs are
    cast to float64 first: Spark's float32*float32 product is float32, which
    loses bits relative to float64 engines (DuckDB, numpy) and flips
    rounding-boundary comparisons."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
