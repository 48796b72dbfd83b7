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
