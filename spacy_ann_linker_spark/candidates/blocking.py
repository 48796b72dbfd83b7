"""Blocking-based candidate generation — the declared 100 TB path.

The exact path (candidates/generate.py) computes cosine for every
(mention, alias) pair sharing >= 1 vocabulary ngram. Its cost is the join on
ngram `idx`, and a pathologically hot ngram (" a ", "ing") multiplies both
sides. This module bounds that cost the way the north_star prescribes:
MinHash-LSH over char 3-gram sets + sorted-neighborhood prefix blocks
produce a candidate PAIR set first; the exact cosine then runs only on those
pairs. Recall is tunable (num_hashes/bands, prefix length) and is validated
against the exact join in tests — the same role efSearch plays for the
reference's HNSW (candidate_generator.py:39,157).

All stages are joins/aggregations on hashes — no Python in the pair
generation at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spacy_ann_linker_spark.candidates.generate import DEFAULT_K, CandidateModel
from spacy_ann_linker_spark.functions.ngrams import char_wb_ngrams_col


def _gram_set(df: DataFrame, col: str, out: str = "g") -> DataFrame:
    """(col, g): distinct char_wb 3-grams per string (same analyzer as the
    vectorizer, so LSH blocks agree with cosine features)."""
    return df.select(
        F.col(col), F.explode(F.array_distinct(char_wb_ngrams_col(F.col(col)))).alias(out)
    )


def minhash_band_keys(
    df: DataFrame, col: str, num_hashes: int = 24, bands: int = 12
) -> DataFrame:
    """(col, band, bucket): LSH band keys from minhash signatures over the
    string's 3-gram set. rows-per-band = num_hashes // bands; with r=2,
    b=12, pairs at Jaccard s collide with prob 1-(1-s^2)^12 (>=0.96 at
    s=0.5)."""
    r = num_hashes // bands
    grams = _gram_set(df, col)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    sigs = (
        grams.select(F.col(col), "g", seeds)
        .groupBy(col, "seed")
        .agg(F.min(F.xxhash64("g", "seed")).alias("mh"))
    )
    return (
        sigs.withColumn("band", (F.col("seed") / r).cast("int"))
        .groupBy(col, "band")
        .agg(
            F.xxhash64(
                F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "seed", "mh"))))
            ).alias("bucket")
        )
    )


def lsh_pairs(
    texts: DataFrame,
    aliases: DataFrame,
    num_hashes: int = 24,
    bands: int = 12,
    alias_keys: DataFrame | None = None,
) -> DataFrame:
    """(text, alias) candidate pairs whose 3-gram minhash bands collide.

    alias_keys: precomputed `minhash_band_keys(aliases, "alias", ...)` — the
    alias side is static per model, so callers in a per-batch loop pass the
    cached table (CandidateModel.alias_band_keys) instead of re-running the
    signature groupBys every call."""
    t = minhash_band_keys(texts, "text", num_hashes, bands)
    a = alias_keys if alias_keys is not None else minhash_band_keys(
        aliases, "alias", num_hashes, bands
    )
    return t.join(a, ["band", "bucket"]).select("text", "alias").distinct()


def sorted_neighborhood_pairs(
    texts: DataFrame, aliases: DataFrame, prefix_len: int = 3
) -> DataFrame:
    """(text, alias) pairs sharing a lowercase prefix block — the
    sorted-neighborhood component: catches suffix-heavy typos that LSH's
    set-similarity can miss, since real-world typos rarely touch the first
    characters. Block key = first `prefix_len` chars; equivalent to a
    sort-merge neighborhood of width |block|."""
    t = texts.withColumn("_bk", F.lower(F.substring("text", 1, prefix_len)))
    a = aliases.withColumn("_bk", F.lower(F.substring("alias", 1, prefix_len)))
    return t.join(a, "_bk").select("text", "alias").distinct()


def generate_candidates_blocked(
    model: CandidateModel,
    texts: DataFrame,
    k: int = DEFAULT_K,
    num_hashes: int = 24,
    bands: int = 12,
    prefix_len: int = 3,
) -> DataFrame:
    """Blocked candidate generation: (text, alias, similarity, rank) with
    exact cosine scored only on LSH ∪ sorted-neighborhood pairs.

    Same output contract as generate_candidates; recall < 1 by construction
    (tunable), verified >= the threshold-relevant region in tests."""
    from spacy_ann_linker_spark.candidates.generate import _sims_blocked
    from spacy_ann_linker_spark.link.linker import _register_memo

    texts = _register_memo(texts.select("text").distinct().persist())

    short_df = model.short_aliases
    short = texts.join(short_df, texts.text == short_df["alias"], "inner").select(
        "text", "alias", F.lit(1.0).alias("similarity"), F.lit(1).alias("rank")
    )
    rest = _register_memo(
        texts.join(short_df, texts.text == short_df["alias"], "left_anti").persist()
    )

    sims = _sims_blocked(model, rest, num_hashes, bands, prefix_len)
    w = Window.partitionBy("text").orderBy(F.desc("similarity"), F.asc("alias"))
    topk = sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= F.lit(k))
    return short.unionByName(topk)
