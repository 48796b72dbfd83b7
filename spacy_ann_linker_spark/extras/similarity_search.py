"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (and the semantic ground
truth the reference's HNSW approximates); IVF coarse quantization is the
scale path: assign vectors to their nearest of C centroids once (one
broadcast join), then queries probe only nprobe buckets — candidate set
shrinks by ~C/nprobe. All dot products are JVM-side zip_with/aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spacy_ann_linker_spark.link.embedding import dot_product


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_v"),
        F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x)).alias(f"{prefix}_n"),
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query, the k nearest items
    (excluding itself). Queries are broadcast (small side); items stream."""
    it = _with_norm(items, id_col, vec_col, "item")
    q = _with_norm(queries, id_col, vec_col, "q")
    scored = (
        it.crossJoin(F.broadcast(q))
        .filter(F.col("item_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            dot_product(F.col("item_v"), F.col("q_v"))
            / (F.col("item_n") * F.col("q_n") + F.lit(1e-12)),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("item_id"), "cosine", "rank")
    )


def ivf_assign(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each item to its nearest centroid (IVF coarse quantizer).
    centroids: (centroid_id, vector) — small, broadcast."""
    it = _with_norm(items, id_col, vec_col, "item")
    c = _with_norm(centroids, "centroid_id", vec_col, "c")
    scored = it.crossJoin(F.broadcast(c)).withColumn(
        "cosine",
        dot_product(F.col("item_v"), F.col("c_v")) / (F.col("item_n") * F.col("c_n") + F.lit(1e-12)),
    )
    w = Window.partitionBy("item_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("item_id", F.col("c_id").alias("centroid_id"), F.col("item_v"), F.col("item_n"))
    )


def seeded_centroids(items: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid pick: the n_centroids items with smallest ids
    (a k-means init stand-in; swap for KMeans|| when mllib is warranted)."""
    return (
        items.orderBy(F.col(id_col).asc())
        .limit(n_centroids)  # TakeOrderedAndProject — no global sort
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias(vec_col))
    )


def hyperplane_lsh_buckets(
    items: DataFrame,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (cosine) LSH: sign bits of dot products with
    `n_planes` seeded gaussian hyperplanes, banded into `n_bands` bucket
    keys. Deterministic (hyperplanes derive from blake2b-seeded draws, no
    RNG state) and fully JVM-side: the hyperplanes enter the plan as array
    literals, dots via zip_with/aggregate. `dim` is the embedding width —
    a parameter, not a peeked-first-row driver action, so the operator
    stays lazy end to end.
    -> (item_id, band, bucket)"""
    from spacy_ann_linker_spark.data.word_vectors import _hash_gauss
    planes = [
        _hash_gauss(f"lshplane:{seed}:{p}", dim).tolist() for p in range(n_planes)
    ]
    r = n_planes // n_bands

    bit_cols = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot_product(F.col(vec_col), lit_plane)
        bit_cols.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    sig = F.concat(*bit_cols)
    out = items.select(F.col(id_col).alias("item_id"), sig.alias("_sig"))
    bands = out.select(
        "item_id",
        "_sig",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("bucket", F.expr(f"substring(_sig, band * {r} + 1, {r})"))
    return bands.select("item_id", "band", "bucket")


def embedding_lsh_neardup_pairs(
    items: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup at scale: hyperplane-LSH bucket join for candidate
    pairs (cost linear in corpus + collisions), exact cosine on candidates
    only. The brute-force `embedding_neardup_pairs` is the quadratic ground
    truth this path is validated against in tests."""
    buckets = hyperplane_lsh_buckets(items, dim, n_planes, n_bands, id_col, vec_col)
    a = buckets.select(F.col("item_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("item_id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    norms = items.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)).alias("nrm"),
    )
    return (
        pairs.join(norms.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")), "id_a")
        .join(norms.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")), "id_b")
        .withColumn("cosine", dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb") + F.lit(1e-12)))
        .filter(F.col("cosine") > F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


@dataclass
class IvfIndex:
    """Persistable IVF index: the create-index/query split the reference
    applies to its alias ANN index (candidate_generator.py:284-346 serializes
    the fitted index; queries load it), applied to the embedding search path.
    Two tables — tiny centroids + per-item assignments with precomputed
    norms — so a 10^10-item corpus is indexed ONCE and every query batch
    pays only the probe join."""

    centroids: DataFrame  # (centroid_id, <vec_col>)
    assigned: DataFrame  # (item_id, centroid_id, item_v, item_n)
    vec_col: str = "embedding"

    def save(self, path: str) -> None:
        self.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
        self.assigned.write.mode("overwrite").parquet(f"{path}/assigned")

    @staticmethod
    def load(spark, path: str, vec_col: str = "embedding") -> "IvfIndex":
        return IvfIndex(
            centroids=spark.read.parquet(f"{path}/centroids"),
            assigned=spark.read.parquet(f"{path}/assigned"),
            vec_col=vec_col,
        )


def build_ivf_index(
    items: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    cents = seeded_centroids(items, n_centroids, id_col, vec_col)
    return IvfIndex(
        centroids=cents,
        assigned=ivf_assign(items, cents, id_col, vec_col),
        vec_col=vec_col,
    )


def ivf_topk_indexed(
    index: IvfIndex,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a prebuilt IvfIndex: probe the nprobe nearest centroid buckets
    per query, exact cosine within. nprobe == n_centroids is exact."""
    vec_col = index.vec_col
    q_assign = (
        _with_norm(queries, id_col, vec_col, "q")
        .crossJoin(F.broadcast(_with_norm(index.centroids, "centroid_id", vec_col, "c")))
        .withColumn(
            "cosine",
            dot_product(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n") + F.lit(1e-12)),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    probes = (
        q_assign.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_v", "q_n", F.col("c_id").alias("centroid_id"))
    )
    scored = probes.join(index.assigned, "centroid_id").filter(
        F.col("item_id") != F.col("q_id")
    )
    scored = scored.withColumn(
        "cosine",
        dot_product(F.col("q_v"), F.col("item_v")) / (F.col("q_n") * F.col("item_n") + F.lit(1e-12)),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), "item_id", "cosine", "rank")
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest centroid buckets per
    query, exact cosine within. nprobe == n_centroids degenerates to exact.
    One-shot convenience over build_ivf_index + ivf_topk_indexed."""
    cents = seeded_centroids(items, n_centroids, id_col, vec_col)
    assigned = ivf_assign(items, cents, id_col, vec_col)
    q_assign = (
        _with_norm(queries, id_col, vec_col, "q")
        .crossJoin(F.broadcast(_with_norm(cents, "centroid_id", vec_col, "c")))
        .withColumn(
            "cosine",
            dot_product(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n") + F.lit(1e-12)),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    probes = (
        q_assign.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_v", "q_n", F.col("c_id").alias("centroid_id"))
    )
    scored = probes.join(assigned, "centroid_id").filter(F.col("item_id") != F.col("q_id"))
    scored = scored.withColumn(
        "cosine",
        dot_product(F.col("q_v"), F.col("item_v")) / (F.col("q_n") * F.col("item_n") + F.lit(1e-12)),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), "item_id", "cosine", "rank")
    )
