"""extras/similarity_search.py: product quantization (fit/encode/ADC top-k)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.similarity_search import (
    fit_pq_codebooks,
    pq_encode,
    pq_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _rand_vecs(n, d, seed):
    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)]


def test_pq_full_codebook_is_exact(spark):
    """With k = n items the seeded codebook contains every subvector, each
    item quantizes to ITSELF, and the ADC score equals the exact dot
    product — quantization is the ONLY error source."""
    recs = _rand_vecs(8, 16, 3)
    df = spark.createDataFrame(recs, "vec_id long, embedding array<double>")
    cb = fit_pq_codebooks(df, m=4, k=8)
    enc = pq_encode(df, cb, m=4, k=8)
    out = pq_topk(df, enc, cb, k_neighbors=7, m=4, k=8)
    V = {i: np.array(v) for i, v in recs}
    for r in out.collect():
        want = float(V[r["query_id"]] @ V[r["item_id"]])
        assert r["score"] == pytest.approx(want, abs=1e-9)


def test_pq_codes_in_range_and_partition_invariant(spark):
    recs = _rand_vecs(40, 16, 9)
    df = spark.createDataFrame(recs, "vec_id long, embedding array<double>")
    cb = fit_pq_codebooks(df, m=4, k=8)
    a = sorted((r["item_id"], tuple(r["codes"])) for r in pq_encode(df.repartition(1), cb, m=4, k=8).collect())
    b = sorted((r["item_id"], tuple(r["codes"])) for r in pq_encode(df.repartition(16), cb, m=4, k=8).collect())
    assert a == b
    for _, codes in a:
        assert len(codes) == 4
        assert all(0 <= c < 8 for c in codes)


def test_pq_kmeans_reconstruction_beats_seeded(spark):
    """KMeans codebooks must reconstruct at least as well as the seeded
    (first-k-subvectors) baseline — the quality the extra fit pays for."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}

    def mse(method):
        cb = fit_pq_codebooks(emb, m=4, k=16, method=method)
        cw = {(r["sub"], r["code"]): np.array(r["codeword"]) for r in cb.collect()}
        enc = {r["item_id"]: r["codes"] for r in pq_encode(emb, cb, m=4, k=16).collect()}
        return float(
            np.mean(
                [
                    np.sum((v - np.concatenate([cw[(s, enc[i][s])] for s in range(4)])) ** 2)
                    for i, v in V.items()
                ]
            )
        )

    assert mse("kmeans") <= mse("seeded")


def test_pq_recall_on_clustered_fixture(spark):
    """Deterministic recall floor on the sf0.001 embeddings: seeded m=4
    k=16 measured 0.325 recall@10-by-dot; pin a conservative 0.2."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    brute = {
        qi: {j for _, j in sorted(((float(V[qi] @ V[j]), j) for j in V if j != qi), reverse=True)[:10]}
        for qi in range(20)
    }
    cb = fit_pq_codebooks(emb, m=4, k=16)
    enc = pq_encode(emb, cb, m=4, k=16)
    out = pq_topk(emb.filter(F.col("vec_id") < 20), enc, cb, 10, 4, 16)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["item_id"])
    recall = np.mean([len(got[qi] & brute[qi]) / 10 for qi in range(20)])
    assert recall >= 0.2


def test_pq_unknown_method_raises(spark):
    df = spark.createDataFrame(_rand_vecs(4, 8, 1), "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pq_codebooks(df, m=2, k=2, method="nope")


def test_ivfpq_full_coverage_equals_brute(spark):
    """nprobe = C and kcode = n_items: every list probed and every residual
    is its own codeword -> IVFADC degenerates to the exact inner-product
    top-k (scores match brute to float noise, ranks exactly)."""
    import numpy as np

    from spacy_ann_linker_spark.extras.similarity_search import ivfpq_topk

    rng = np.random.RandomState(5)
    n, d = 60, 16
    vecs = rng.randn(n, d)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id int, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivfpq_topk(
        emb, queries, n_centroids=4, nprobe=4, k_neighbors=3, m=4, kcode=n
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.rank, r.item_id, r.score))
    for q in range(5):
        scores = sorted(
            ((float(vecs[q] @ vecs[i]), i) for i in range(n) if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        want_ids = [i for _, i in scores]
        rows = sorted(got[q])
        assert [i for _, i, _ in rows] == want_ids
        for (_, _, s), (ws, _) in zip(rows, scores):
            assert abs(s - ws) < 1e-9


def test_ivfpq_residual_beats_raw_pq_quantization(spark):
    """Residual encoding is the point of IVFADC: with clustered data the
    residual ball is smaller than the raw-vector ball, so recall@5 at equal
    code budget should not be WORSE than raw PQ over the same corpus."""
    import numpy as np

    from spacy_ann_linker_spark.extras.similarity_search import (
        fit_pq_codebooks,
        ivfpq_topk,
        pq_encode,
        pq_topk,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(6, 16) * 5
    # ids INTERLEAVE clusters (id i -> cluster i % 6): the seeded centroid /
    # codebook picks (smallest ids) then span all clusters instead of
    # degenerating into cluster 0
    n = 120
    vecs = np.vstack([centers[i % 6] + rng.randn(16) * 0.3 for i in range(n)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id int, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 6)
    qids = list(range(6))

    def brute5(q):
        s = sorted(
            ((float(vecs[q] @ vecs[i]), i) for i in range(n) if i != q),
            key=lambda t: (-t[0], t[1]),
        )
        return {i for _, i in s[:5]}

    ivfpq = ivfpq_topk(
        emb, queries, n_centroids=6, nprobe=6, k_neighbors=5, m=4, kcode=8
    ).collect()
    cb = fit_pq_codebooks(emb, m=4, k=8)
    raw = pq_topk(queries, pq_encode(emb, cb, m=4, k=8), cb, 5, 4, 8).collect()

    def recall(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.item_id)
        return sum(len(by_q.get(q, set()) & brute5(q)) for q in qids) / (5 * len(qids))

    r_ivfpq, r_raw = recall(ivfpq), recall(raw)
    assert r_ivfpq >= r_raw
    # absolute floor is modest by design: within a probed cluster the q·c
    # term is shared, so top-5 order rides entirely on the 12-bit residual
    # quantization — usable signal, not exactness (kcode = n is the exact
    # path, asserted above)
    assert r_ivfpq >= 0.3


def test_ivfpq_partition_invariance(spark):
    import numpy as np

    from spacy_ann_linker_spark.extras.similarity_search import ivfpq_topk

    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id int, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 4)

    def run(d):
        return {
            (r.query_id, r.item_id, r.rank, round(r.score, 9))
            for r in ivfpq_topk(d, q, 8, 3, 3, 4, 8).collect()
        }

    assert run(emb.repartition(1)) == run(emb.repartition(16))
