"""Mean-pool text embedding (V3/V4): `nlp.make_doc(text).vector`
(cli/create_index.py:83; ann_linker.py:108) over the seeded deterministic
vector function. One Arrow-batched pandas UDF — no per-row Python UDF, no
join against a vocabulary table in the hot path (the vector function is
computed in place, so embedding N turns is embarrassingly parallel and
shuffle-free)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacy_ann_linker_spark.data.word_vectors import DIM, mean_pool


def mean_pool_udf(dim: int = DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _pool(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: mean_pool(t or "", dim).tolist())

    return _pool


def embed_texts(df: DataFrame, id_col: str, text_col: str, dim: int = DIM) -> DataFrame:
    """(id, vector array<float>) — one vector per input row."""
    return df.select(
        F.col(id_col), mean_pool_udf(dim)(F.col(text_col)).alias("vector")
    )


def with_vector_norm(df: DataFrame, vec_col: str = "vector", out_col: str = "vnorm") -> DataFrame:
    """L2 norm via JVM-side higher-order function (A6: np.linalg.norm,
    ann_linker.py:106)."""
    return df.withColumn(
        out_col, F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    )


def dot_product(a, b):
    """Column expr: dot(a, b) over two array<float> columns — JVM-side
    zip_with/aggregate, stays inside codegen (no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
