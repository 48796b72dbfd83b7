"""TF-IDF over char_wb 3-grams, expressed as DataFrame aggregations.

Reference: TfidfVectorizer(analyzer="char_wb", ngram_range=(3,3), min_df=2,
dtype=float32) fit over all KB alias strings (candidate_generator.py:119-127,
ann_kb.py:97-105), queried with .transform() over mention batches
(candidate_generator.py:241). sklearn formula pinned by that call:

    df(g)  = #docs containing g;   kept iff df >= min_df          (A1)
    idf(g) = ln((1+N)/(1+df)) + 1  (smooth_idf)                   (A2)
    w(d,g) = tf(d,g) * idf(g), then L2 row-normalization          (A3)

Spark ML's IDF uses log((m+1)/(df+1)) WITHOUT the +1 term, so idf is computed
in SQL (SURVEY.md V1). Vectors live in exploded "long" form
(id, idx, weight) — the natural layout for the inverted-index cosine join in
candidates/generate.py, and the layout that scales: no row ever holds a whole
matrix, every step is a shuffle-partitioned aggregation.

`idx` is xxhash64(ngram): a deterministic join key without the global
row_number window a contiguous vocabulary id would need (collision odds at
vocab sizes even of 10^8 are ~1e-3; the `ngram` string is retained in vocab
for exactness-sensitive joins and tests).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacy_ann_linker_spark.functions.ngrams import with_ngrams


@dataclass
class TfidfModel:
    """Fitted vectorizer state = one small DataFrame (the `vocab` table).

    Replaces the reference's joblib-pickled TfidfVectorizer
    (candidate_generator.py:339-341): vocabulary + idf as data, so transform
    is an exactly-reproducible join instead of a driver-local object.
    """

    vocab: DataFrame  # (ngram string, idx long, df long, idf double)
    min_df: int = 2

    def save(self, path: str) -> None:
        self.vocab.write.mode("overwrite").parquet(path)

    @staticmethod
    def load(spark, path: str, min_df: int = 2) -> "TfidfModel":
        return TfidfModel(vocab=spark.read.parquet(path), min_df=min_df)


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ngram, tf) — one row per distinct ngram per document."""
    return (
        with_ngrams(df, text_col, "ngrams")
        .select(F.col(id_col), F.explode("ngrams").alias("ngram"))
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def fit(aliases_df: DataFrame, id_col: str = "alias_id", text_col: str = "alias", min_df: int = 2) -> TfidfModel:
    """Fit the vocab table over the alias corpus. Fully lazy (N is a scalar
    subquery via cross join with a 1-row aggregate, not a driver count).

    df(g) = #docs containing g needs only each document's DISTINCT gram
    set, so the fit explodes array_distinct(ngrams) and counts rows per
    gram directly — ONE map-side-combined exchange, where routing through
    _term_counts first paid a (doc, ngram) groupBy exchange (the full
    term-frequency table) purely to throw the tf column away."""
    n_docs = aliases_df.agg(F.count(F.lit(1)).alias("n_docs"))
    vocab = (
        with_ngrams(aliases_df, text_col, "ngrams")
        .select(F.explode(F.array_distinct("ngrams")).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= F.lit(min_df))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0),
        )
        .withColumn("idx", F.xxhash64(F.col("ngram")))
        .select("ngram", "idx", "df", "idf")
    )
    return TfidfModel(vocab=vocab, min_df=min_df)


def transform(
    model: TfidfModel,
    df: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Vectorize texts against the fitted vocab -> (id, idx, weight), rows
    L2-normalized per document. OOV-only documents vanish (zero vector) —
    exactly the reference's empty-vector pruning F2/F3
    (candidate_generator.py:129-146,168-216): downstream left joins keep the
    document with no candidates rather than crashing."""
    from pyspark.sql import Window

    tc = _term_counts(df, id_col, text_col)
    vocab = model.vocab.select("ngram", "idx", "idf")
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    weighted = tc.join(vocab, "ngram").select(
        F.col(id_col),
        F.col("idx"),
        (F.col("tf") * F.col("idf")).alias("w"),
    )
    # L2 norm as a WINDOW over the document id, not a groupBy + self-join:
    # the window keeps the lineage linear (one exchange by id, each vector
    # row flows once), where the join shape branched `weighted` into two
    # consumers — a second exchange and, absent runtime exchange reuse, a
    # re-execution of the ngram explode/groupBy subtree (the retrieval.py
    # df-window discipline). Same arithmetic, same rows.
    norm = F.sqrt(
        F.sum(F.col("w") * F.col("w")).over(Window.partitionBy(id_col))
    )
    return weighted.select(
        F.col(id_col), "idx", (F.col("w") / norm).alias("weight")
    )
