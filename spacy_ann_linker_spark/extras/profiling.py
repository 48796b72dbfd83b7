"""Corpus profiling operators: per-group heavy-hitter terms and exact
group percentiles.

The training-data-pipeline use cases: vocabulary drift monitoring between
corpus snapshots (top-k terms per language/source), building stopword /
boilerplate blocklists from the head of the term distribution, and
length/quality distribution profiling per source for mixing decisions
("what does p95 doc length look like in crawl vs curated?").

Everything is JVM built-ins — no Python in the hot path. Both operators
have value-exact DuckDB oracles in __spark_entry__.py (`topk_terms`,
`group_percentiles`).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.text_analysis import _words


def topk_terms(
    df: DataFrame,
    group_col: str,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Exact top-k terms by frequency within each group — the heavy-hitters
    profile of a corpus, per language / source / time bucket.

    -> (group_col, term, n), at most k rows per group, deterministic
    tie-break (n desc, term asc).

    Scale shape (linear, two shuffles, both pruned):
      1. explode -> groupBy(group, term): the term count. Map-side partial
         aggregation collapses each task's token stream to its local
         (group, term) vocabulary before the exchange, so the shuffle
         carries vocab-sized rows, not token-sized — Zipf-hot terms ("the")
         are combined per map task first, and the fine-grained composite
         key spreads them across reducers.
      2. row_number over (partition by group order by n desc, term asc)
         with the rank <= k filter plans as WindowGroupLimit (Spark >= 3.5,
         plan-asserted in tests/test_profiling.py): each map task pre-prunes
         to its local top-k per group BEFORE the exchange, so the second
         shuffle carries at most k * num_partitions rows per group rather
         than the group's whole vocabulary.

    Exactness: unlike sketch-based heavy hitters (count-min, lossy
    counting), counts are exact — the groupBy IS the orthodox linear scale
    shape here, and the sketch would only save the vocab-sized shuffle.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group_col), F.explode(_words(F.col(text_col))).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Percentiles of `value_col` within each group, linear interpolation
    between closest ranks (the numpy-default / DuckDB `quantile_cont`
    convention — cross-engine exact, verified against the DuckDB oracle).

    -> (group_col, p25, p50, ... one column per requested prob), column
    names derived as p{100*prob:g} (p25, p50, p2.5 for 0.025).

    Scale shape: ONE hash-partial aggregation pass either way.
      exact=True   Spark's `percentile` — an ObjectHashAggregate whose
                   buffer holds every value of the group (a counts-map, so
                   duplicates collapse). Right when groups are bounded
                   (per-source, per-language: each group's distinct-value
                   set fits an executor). This is the oracle-checkable
                   default.
      exact=False  `approx_percentile` — Greenwald-Khanna summaries,
                   O(1/accuracy) state per group regardless of group size,
                   mergeable map-side. The 100 TB path when a single group
                   spans the corpus (e.g. global percentiles over 10^11
                   rows); bounded rank error, not value-exact.
    """
    def _name(p: float) -> str:
        return "p" + format(p * 100, "g").replace(".", "_")

    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = (
        F.percentile(F.col(value_col), parr)
        if exact
        else F.approx_percentile(F.col(value_col), parr, F.lit(10000))
    )
    out = df.groupBy(group_col).agg(agg.alias("_ps"))
    return out.select(
        group_col,
        *[
            F.col("_ps").getItem(i).cast("double").alias(_name(p))
            for i, p in enumerate(probs)
        ],
    )


def token_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_df: int | None = None,
    min_pair_count: int = 5,
    pair_partitions: int | None = None,
) -> DataFrame:
    """Pointwise mutual information over DOCUMENT-level token co-occurrence
    (Church & Hanks 1990) — the collocation / statistically-associated-pair
    profile of a corpus: pmi(a,b) = ln(p(a,b) / (p(a) p(b))) with
    p(x) = df_x / N and p(a,b) = docs containing both / N. The
    training-pipeline uses: multiword-expression mining for tokenizer /
    vocab decisions, template detection (boilerplate token pairs score
    pmi ~ 0 at huge counts, real collocations score high), and feature
    pairing for blocking keys.

    The df band [min_df, max_df] is the SCALE GOVERNOR, not a tuning
    nicety: per-doc pair generation is quadratic in the doc's surviving
    vocabulary, so max_df caps the stopword blow-up (a token in every doc
    pairs with everything and carries no information — its pmi is ~0 by
    construction) and min_df kills the hapax tail that would flood the
    pair table with unrepeatable pairs. Both are corpus stats from one
    map-side-combined groupBy.

    Plan shape: tokens -> df groupBy (shuffle 1) -> band filter -> ONE
    groupBy(doc) reassembles the surviving distinct-token SET in-row
    (shuffle 2, sorted for deterministic pair order) -> pairs generate
    IN-ROW (nested transform + flatten, no self-join: the classic
    a.join(b, doc) duplicates the token stream through a third exchange
    and hits the same quadratic anyway) -> one pair groupBy (shuffle 3,
    map-side combined). N docs rides in as a broadcast one-row agg.
    -> (tok_a, tok_b, n_pair, pmi), tok_a < tok_b, n_pair >=
    min_pair_count."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_words(F.col(text_col)))).alias("tok"),
    )
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_n"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    band = dfreq.filter(F.col("_df") >= min_df)
    if max_df is not None:
        band = band.filter(F.col("_df") <= max_df)
    survived = toks.join(band, "tok")
    # explicit hash partitioning at an explicit count ahead of the per-doc
    # aggregate (pair_partitions, None = defaultParallelism): the pair
    # explode below runs on THIS exchange's reduce side, and its output is
    # quadratic in per-doc vocabulary while its input bytes are tiny —
    # byte-based AQE coalescing would serialize the explode onto 1-2 tasks
    # (the ngram_jaccard_pairs posting-side discipline; measured 0.9 s on 2
    # tasks over a 5k-doc corpus with 30 cores idle). The groupBy reuses
    # the hash(doc_id) layout, so no extra exchange is added.
    nparts = pair_partitions or df.sparkSession.sparkContext.defaultParallelism
    per_doc = survived.repartition(nparts, "doc_id").groupBy("doc_id").agg(
        F.array_sort(F.collect_list("tok")).alias("_ts")
    )
    n = F.size("_ts")
    pairs_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at("_ts", i).alias("tok_a"),
                    F.element_at("_ts", j).alias("tok_b"),
                ),
            ),
        )
    )
    pairs = (
        per_doc.filter(n >= 2)
        .select(F.explode(pairs_arr).alias("_p"))
        .select(F.col("_p.tok_a").alias("tok_a"), F.col("_p.tok_b").alias("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    da = band.select(F.col("tok").alias("tok_a"), F.col("_df").alias("_dfa"))
    db = band.select(F.col("tok").alias("tok_b"), F.col("_df").alias("_dfb"))
    return (
        pairs.join(da, "tok_a")
        .join(db, "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.log(
                F.col("n_pair").cast("double")
                * F.col("_n")
                / (F.col("_dfa") * F.col("_dfb"))
            ).alias("pmi"),
        )
    )


def decayed_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    half_life_hours: float = 168.0,
) -> DataFrame:
    """Exponentially time-decayed popularity per key: each event carries
    weight 0.5 ** (age / half_life), ages measured back from the corpus
    max timestamp — a DETERMINISTIC reference point (never the wall clock:
    the same input must produce the same output on every run and both
    engines). Emits the normalized share as `prior` — the recency-weighted
    replacement for uniform entity priors (kb/build.py J6): an alias seen
    hourly last week should outrank one last seen in 2019 at equal counts,
    which raw frequency cannot express.

    Plan shape: one in-row epoch/weight projection, the corpus max as a
    one-row broadcast (never a driver pull), one map-side-combined
    groupBy(key), one more one-row broadcast for the normalizer. Two tiny
    crossJoin(broadcast) — zero real shuffles beyond the key agg.
    -> (key, n_events, decayed_count, prior)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ref = df.agg(F.max(us).alias("_ref"))
    weighted = df.select(F.col(key_col).alias("key"), us.alias("_us")).crossJoin(
        F.broadcast(ref)
    )
    age_h = (F.col("_ref") - F.col("_us")) / F.lit(3.6e9)
    per_key = (
        weighted.select("key", F.pow(F.lit(0.5), age_h / F.lit(half_life_hours)).alias("_w"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("_w").alias("decayed_count"))
    )
    total = per_key.agg(F.sum("decayed_count").alias("_tot"))
    return per_key.crossJoin(F.broadcast(total)).select(
        "key",
        "n_events",
        "decayed_count",
        (F.col("decayed_count") / F.col("_tot")).alias("prior"),
    )
