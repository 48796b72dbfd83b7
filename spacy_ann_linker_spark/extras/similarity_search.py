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


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """(q_id, item_id, cosine) -> the k best rows per q_id with a rank
    column. The window ranks SLIM rows only — callers must drop every vector
    column before this shuffle (the sort carries whole rows, and an
    array<float> riding a row_number sort multiplies the shuffle bytes by
    the embedding width)."""
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.select("q_id", "item_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("item_id"), "cosine", "rank")
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query, the k nearest items
    (excluding itself). Queries are broadcast (small side); items stream.
    Vectors are dropped the moment the cosine is computed — the top-k rank
    shuffle moves (q_id, item_id, cosine) rows only.

    Scale contract: this is the EXACT baseline for query batches small
    enough to broadcast. There is deliberately no shuffle fallback here —
    an un-broadcast exact all-pairs is a cartesian product whatever the
    join strategy; batches too big to broadcast belong on the bucketed
    paths (ivf_topk_indexed for top-k, embedding_lsh_neardup_pairs for
    near-dup), which are linear in corpus + collisions."""
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
    return _topk_per_query(scored, k)


def _centroid_array(centroids: DataFrame, vec_col: str) -> DataFrame:
    """Collapse the centroid table to ONE row holding an id-sorted
    array<struct(c_id, c_v, c_n)>. The centroid table is broadcast-small by
    IVF construction (C in the tens-to-thousands), so the single-row
    collapse is a trivial aggregate — and every downstream consumer can then
    scan all C centroids INSIDE one row via higher-order functions instead
    of materializing items x centroids join rows."""
    c = _with_norm(centroids, "centroid_id", vec_col, "c")
    return c.agg(
        F.array_sort(F.collect_list(F.struct("c_id", "c_v", "c_n"))).alias("_cents")
    )


def ivf_assign(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each item to its nearest centroid (IVF coarse quantizer).
    centroids: (centroid_id, vector) — small, broadcast.

    The argmin is a PURE PROJECTION: the centroid table collapses to a
    single broadcast row holding an id-sorted array<struct>, and each item
    folds over that array with F.aggregate (keep the strictly-better cosine;
    iterating in centroid-id order makes ties resolve to the smallest id,
    the same order the earlier sort-window gave). No items x centroids rows
    ever exist, no aggregate touches item rows, and the plan has no Window,
    no Sort, and no Exchange over the items at all — each item row computes
    its own argmin where it sits. (The earlier shape shuffled + sorted
    items x centroids rows each carrying the item vector through a
    row_number window — a 64x vector-bearing shuffle blow-up at 64
    centroids. A min_by aggregate was no fix: its struct buffer is not
    hash-aggregable and falls back to SortAggregate.)"""
    cid_type = centroids.schema["centroid_id"].dataType
    it = _with_norm(items, id_col, vec_col, "item")

    def step(acc, ce):
        cos = dot_product(F.col("item_v"), ce["c_v"]) / (
            F.col("item_n") * ce["c_n"] + F.lit(1e-12)
        )
        better = cos > acc["bc"]
        return F.struct(
            F.when(better, cos).otherwise(acc["bc"]).alias("bc"),
            F.when(better, ce["c_id"]).otherwise(acc["cid"]).alias("cid"),
        )

    init = F.struct(
        F.lit(-2.0).alias("bc"), F.lit(None).cast(cid_type).alias("cid")
    )  # cosine under the +1e-12 guard is strictly inside (-1, 1)
    return (
        it.crossJoin(F.broadcast(_centroid_array(centroids, vec_col)))
        .select(
            "item_id",
            "item_v",
            "item_n",
            F.aggregate("_cents", init, step).alias("_b"),
        )
        .select("item_id", F.col("_b.cid").alias("centroid_id"), "item_v", "item_n")
    )


def _probe_centroids(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(q_id, q_v, q_n, centroid_id): the nprobe nearest centroids per query.

    Same shape as ivf_assign — the broadcast single-row centroid array is
    scored per query INSIDE the row (transform -> array_sort -> slice over C
    elements, ordered by (-cosine, c_id)), then the nprobe winners explode.
    No groupBy, no window: query vectors never ride a shuffle, and the only
    row multiplication is the final x nprobe explode the probe join needs
    anyway."""
    q = _with_norm(queries, id_col, vec_col, "q")

    def score(ce):
        cos = dot_product(F.col("q_v"), ce["c_v"]) / (
            F.col("q_n") * ce["c_n"] + F.lit(1e-12)
        )
        return F.struct((-cos).alias("nc"), ce["c_id"].alias("cid"))

    return (
        q.crossJoin(F.broadcast(_centroid_array(centroids, vec_col)))
        .select(
            "q_id",
            "q_v",
            "q_n",
            F.slice(F.array_sort(F.transform("_cents", score)), 1, nprobe).alias("_top"),
        )
        .select("q_id", "q_v", "q_n", F.explode(F.col("_top.cid")).alias("centroid_id"))
    )


def seeded_centroids(items: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroid pick: the n_centroids items with smallest ids
    (a k-means init stand-in — distribution-blind, so bucket sizes skew with
    the data; fit_centroids is the quality option). Kept as the ORACLE
    default: its SQL is trivially replayable in DuckDB, which keeps
    ann_ivf_topk value-exact cross-engine."""
    return (
        items.orderBy(F.col(id_col).asc())
        .limit(n_centroids)  # TakeOrderedAndProject — no global sort
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias(vec_col))
    )


def fit_centroids(
    items: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Distribution-aware centroids via Spark ML KMeans|| (fixed seed).

    seeded_centroids takes the n smallest ids — deterministic but blind to
    the data distribution, so inverted-list sizes skew and probe cost skews
    with them; worst on real embedding corpora where ingestion id order
    correlates with content (the n smallest ids all land in one region).
    KMeans|| places centroids where the mass is: balanced lists, better
    recall at equal nprobe (asserted vs the seeded pick on
    clustered ingestion-ordered data in tests; on structure-free uniform
    vectors the two are statistically equivalent).
    The fit is one pass over the data per iteration, all JVM; centroids come
    back driver-side (C x dim doubles — tiny) and re-enter the plan as a
    createDataFrame dimension table, so downstream ivf_assign/probe stay the
    zero-shuffle broadcast-array shape. Euclidean k-means on UNNORMALIZED
    vectors approximates cosine buckets only as well as norms are uniform —
    callers with wildly varying norms should L2-normalize the column first
    (the assignment/probe metric here remains exact cosine either way).
    -> (centroid_id int, <vec_col> array<double>)"""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = items.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    km = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, initMode="k-means||")
    model = km.fit(feats)
    spark = items.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, f"centroid_id int, {vec_col} array<double>"
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
    centroid_method: str = "seeded",
    seed: int = 42,
) -> IvfIndex:
    """centroid_method: "seeded" (id-pick; deterministic, SQL-replayable —
    the oracle default) or "kmeans" (KMeans|| fit_centroids; balanced
    inverted lists, better recall at equal nprobe)."""
    if centroid_method == "kmeans":
        cents = fit_centroids(items, n_centroids, id_col, vec_col, seed=seed)
    elif centroid_method == "seeded":
        cents = seeded_centroids(items, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"unknown centroid_method: {centroid_method!r}")
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
    broadcast_probes: bool = True,
) -> DataFrame:
    """Query a prebuilt IvfIndex: probe the nprobe nearest centroid buckets
    per query, exact cosine within. nprobe == n_centroids is exact.

    broadcast_probes (default True): the probe table (queries x nprobe rows,
    batch-sized) broadcasts so the probe join runs map-side against the
    assigned table WHERE IT SITS. The alternative — shuffling on
    centroid_id — hashes the 10^10-row assigned table into only C distinct
    keys, collapsing the whole corpus onto C reducers. Set False only for
    huge offline query batches, ideally with the assigned table
    pre-bucketed by centroid_id."""
    vec_col = index.vec_col
    probes = _probe_centroids(queries, index.centroids, nprobe, id_col, vec_col)
    if broadcast_probes:
        probes = F.broadcast(probes)
    scored = (
        probes.join(index.assigned, "centroid_id")
        .filter(F.col("item_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            dot_product(F.col("q_v"), F.col("item_v"))
            / (F.col("q_n") * F.col("item_n") + F.lit(1e-12)),
        )
    )
    return _topk_per_query(scored, k)


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
    index = build_ivf_index(items, n_centroids, id_col, vec_col)
    return ivf_topk_indexed(index, queries, nprobe=nprobe, k=k, id_col=id_col)


# ---- Product Quantization (Jégou, Douze & Schmid, TPAMI 2011) ---------------


def fit_pq_codebooks(
    items: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "seeded",
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """(sub, code, codeword): per-subspace PQ codebooks. The vector splits
    into `m` contiguous subvectors; each subspace gets `k` codewords.

    method='seeded' (default, the ORACLE path like seeded_centroids): the
    codewords of every subspace are the subvectors of the k smallest-id
    items — deterministic, distribution-blind. method='kmeans' fits one
    KMeans|| per subspace (m driver-looped fits over narrow subvector
    projections; quality option, seeded for reproducibility)."""
    dsub = F.floor(F.size(vec_col) / m).cast("int")
    if method == "seeded":
        base = items.orderBy(id_col).limit(k).select(
            F.col(id_col).alias("_sid"), F.col(vec_col).alias("_v"), dsub.alias("_d")
        )
        subs = base.select(
            "_sid",
            "_d",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
            "_v",
        ).select(
            "sub",
            "_sid",
            F.slice("_v", F.col("sub") * F.col("_d") + 1, F.col("_d")).alias("codeword"),
        )
        w = Window.partitionBy("sub").orderBy("_sid")
        return subs.select(
            "sub", (F.row_number().over(w) - 1).alias("code"), "codeword"
        )
    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dim = len(items.select(vec_col).head()[0])
        out = None
        for sub in range(m):
            sv = items.select(
                array_to_vector(
                    F.slice(vec_col, sub * (dim // m) + 1, dim // m).cast(
                        "array<double>"
                    )
                ).alias("features")
            )
            km = KMeans(k=k, seed=seed, maxIter=max_iter, initMode="k-means||")
            centers = km.fit(sv).clusterCenters()
            rows = [(sub, i, [float(x) for x in c]) for i, c in enumerate(centers)]
            piece = items.sparkSession.createDataFrame(
                rows, "sub int, code int, codeword array<double>"
            )
            out = piece if out is None else out.unionByName(piece)
        return out
    raise ValueError(f"unknown method {method!r}")


def _codebook_array(codebooks: DataFrame) -> DataFrame:
    """One broadcast row: array<struct(sub, code, w)> sorted by (sub, code)
    — flat index sub*k + code. Same single-row-array discipline as
    _centroid_array."""
    return codebooks.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("sub"), F.col("code"), F.col("codeword").alias("w")
                )
            )
        ).alias("_cb")
    )


def pq_encode(
    items: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, codes): PQ encoding — per subspace, the L2-nearest codeword id
    (ties -> smallest code). Codes are m small ints per vector: the
    10^10-vector table stores/shuffles m*4 bytes instead of d*4 — the PQ
    memory story IS the scale story (a 64-dim float vector compresses
    16x at m=4).

    Pure projection over the broadcast codebook row (the ivf_assign
    discipline): no window, no aggregate over item rows, no Exchange —
    each row folds its own argmin per subspace in-place."""
    dsub = F.floor(F.size(vec_col) / m).cast("int")

    def code_for(sub):
        sl = F.slice(F.col("_v"), sub * F.col("_d") + 1, F.col("_d"))

        def step(acc, ce):
            dist = F.aggregate(
                F.zip_with(sl, ce["w"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            better = dist < acc["bd"]
            return F.struct(
                F.when(better, dist).otherwise(acc["bd"]).alias("bd"),
                F.when(better, ce["code"]).otherwise(acc["code"]).alias("code"),
            )

        init = F.struct(
            F.lit(float("inf")).alias("bd"), F.lit(-1).alias("code")
        )
        block = F.slice(F.col("_cb"), sub * F.lit(k) + 1, F.lit(k))
        return F.aggregate(block, init, step)["code"]

    return (
        items.select(
            F.col(id_col).alias("item_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
            dsub.alias("_d"),
            *keep_cols,
        )
        .crossJoin(F.broadcast(_codebook_array(codebooks)))
        .select(
            "item_id",
            F.array(*[code_for(F.lit(s)) for s in range(m)]).alias("codes"),
            *keep_cols,
        )
    )


def pq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    k_neighbors: int = 3,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, item_id, score, rank): asymmetric-distance (ADC) top-k by
    approximate INNER PRODUCT — score = sum_m dot(q_sub_m, codeword of the
    item's code_m). Queries precompute an m*k lookup table ONCE (one
    O(k*d) projection per query row), then every (item, query) pair costs
    O(m) table lookups instead of the O(d) exact dot — with m=4 on 64-dim
    vectors that is 16x less pair work, and the item side ships CODES, not
    vectors.

    Contract: `queries` must be broadcast-small (they collapse to a
    single-row array carrying their LUTs — the cosine_topk
    broadcast-queries contract); `encoded` is the unbounded side and never
    shuffles. Approximation error comes from quantization only; exactness
    vs brute force is property-tested at k = n_items (codebook covers
    every vector)."""
    dsub = F.floor(F.size(vec_col) / m).cast("int")
    lut_entry = lambda j: F.aggregate(
        F.zip_with(
            F.slice(
                F.col("_qv"), F.floor(j / k).cast("int") * F.col("_d") + 1, F.col("_d")
            ),
            F.element_at(F.col("_cb"), j + 1)["w"],
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    q_lut = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
            dsub.alias("_d"),
        )
        .crossJoin(F.broadcast(_codebook_array(codebooks)))
        .select(
            "q_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(m * k - 1)), lambda j: lut_entry(j)
            ).alias("lut"),
        )
    )
    qarr = q_lut.agg(
        F.array_sort(F.collect_list(F.struct("q_id", "lut"))).alias("_qs")
    )
    pairs = encoded.crossJoin(F.broadcast(qarr)).select(
        "item_id", "codes", F.explode("_qs").alias("_q")
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, sub: acc
        + F.element_at(
            F.col("_q")["lut"], sub * F.lit(k) + F.element_at(F.col("codes"), sub + 1) + 1
        ),
    )
    scored = pairs.select(
        F.col("_q")["q_id"].alias("q_id"), "item_id", score.alias("cosine")
    )
    if exclude_self:
        scored = scored.filter(F.col("q_id") != F.col("item_id"))
    out = _topk_per_query(scored, k_neighbors)
    return out.select("query_id", "item_id", F.col("cosine").alias("score"), "rank")


def ivfpq_topk(
    items: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k_neighbors: int = 3,
    m: int = 4,
    kcode: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_method: str = "seeded",
    codebook_method: str = "seeded",
    exclude_self: bool = True,
) -> DataFrame:
    """IVFADC — the FAISS-standard billion-scale ANN composition (Jégou,
    Douze & Schmid, TPAMI 2011 §IV): a coarse IVF quantizer restricts each
    query to `nprobe` inverted lists, and WITHIN lists items are scored by
    asymmetric distance over PQ codes of the RESIDUAL x - c(x) — residual
    encoding is what makes m*log2(k) bits competitive: residuals live in a
    much smaller ball than raw vectors, so the same codebook budget spends
    its resolution where the variance actually is.

    Score decomposition (inner product): q·x ≈ q·c(x) + q·r ≈
    q·c(x) + Σ_sub LUT_q[sub, code_sub(r)] — the q·c term is exact and
    shared by every item in the list; only the residual is quantized.

    Scale shape, stage by stage:
      * assign + residual: `ivf_assign` is a pure projection over the
        broadcast centroid array (no Exchange over items); the residual
        subtracts a broadcast-joined centroid vector in-row.
      * encode: pure projection over the broadcast codebook row — the
        10^10-item side ends up as (item_id, centroid_id, m codes):
        m*4 bytes of payload instead of d*4, and item VECTORS never
        appear again after this stage.
      * query: probes (queries x nprobe rows) carry the per-query m*k LUT
        (computed ONCE per query-centroid row set, O(k*d) each) and
        broadcast onto the encoded lists — the probe equi-join on
        centroid_id touches only the nprobe/C fraction of the corpus, and
        each surviving pair costs O(m) lookups plus one add.
      * top-k: the slim (_topk_per_query) window — ids and scores only.
    An item lives in exactly one list, so a (query, item) pair can arise
    from at most one probe — no dedup pass.

    seeded centroid/codebook methods are the deterministic ORACLE path
    (DuckDB-replayable, the ann_ivf_topk / ann_pq_topk discipline);
    'kmeans' for both is the quality option. Recall at full probe + full
    codebook degrades only by quantization — property-tested against
    brute force. Metric is INNER PRODUCT (pre-normalize for cosine).
    -> (query_id, item_id, score, rank)."""
    if centroid_method == "seeded":
        cents = seeded_centroids(items, n_centroids, id_col, vec_col)
    else:
        cents = fit_centroids(items, n_centroids, id_col, vec_col)
    cvec = cents.select(
        "centroid_id", F.col(vec_col).cast("array<double>").alias("_cv")
    )
    assigned = ivf_assign(items, cents, id_col, vec_col)
    res = assigned.join(F.broadcast(cvec), "centroid_id").select(
        "item_id",
        "centroid_id",
        F.zip_with(
            F.col("item_v").cast("array<double>"), "_cv", lambda x, y: x - y
        ).alias("residual"),
    )
    cb = fit_pq_codebooks(
        res, m=m, k=kcode, id_col="item_id", vec_col="residual",
        method=codebook_method,
    )
    enc = pq_encode(
        res, cb, m=m, k=kcode, id_col="item_id", vec_col="residual",
        keep_cols=("centroid_id",),
    )

    # per-(query, probed-centroid) rows with the exact q·c term
    probes = _probe_centroids(queries, cents, nprobe, id_col, vec_col).join(
        F.broadcast(cvec), "centroid_id"
    ).select(
        "centroid_id",
        "q_id",
        F.col("q_v").cast("array<double>").alias("_qv"),
        dot_product(F.col("q_v").cast("array<double>"), F.col("_cv")).alias("_qc"),
    )
    # per-query residual-codebook LUT: lut[sub*k + code] = q_sub · codeword
    dsub_q = F.floor(F.size("_qv") / m).cast("int")
    lut_entry = lambda j: F.aggregate(
        F.zip_with(
            F.slice(F.col("_qv"), F.floor(j / kcode).cast("int") * F.col("_d") + 1, F.col("_d")),
            F.element_at(F.col("_cb"), j + 1)["w"],
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    probes_lut = (
        probes.withColumn("_d", dsub_q)
        .crossJoin(F.broadcast(_codebook_array(cb)))
        .select(
            "centroid_id",
            "q_id",
            "_qc",
            F.transform(
                F.sequence(F.lit(0), F.lit(m * kcode - 1)), lambda j: lut_entry(j)
            ).alias("_lut"),
        )
    )
    score = F.col("_qc") + F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, sub: acc
        + F.element_at(
            F.col("_lut"), sub * F.lit(kcode) + F.element_at(F.col("codes"), sub + 1) + 1
        ),
    )
    scored = enc.join(F.broadcast(probes_lut), "centroid_id").select(
        "q_id", "item_id", score.alias("cosine")
    )
    if exclude_self:
        scored = scored.filter(F.col("q_id") != F.col("item_id"))
    out = _topk_per_query(scored, k_neighbors)
    return out.select("query_id", "item_id", F.col("cosine").alias("score"), "rank")
