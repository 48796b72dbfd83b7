"""Deterministic splitting + sequence packing (extras/sampling.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.sampling import deterministic_split, pack_sequences

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_is_deterministic_and_partition_invariant(spark):
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in deterministic_split(df, "doc_id", WEIGHTS).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(df.repartition(17), "doc_id", WEIGHTS).collect()
    }
    assert a == b
    # proportions within a few percent of the weights at n=5000
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02


def test_split_is_group_safe_and_seed_sensitive(spark):
    # hash a GROUP key: every row of a conversation lands in one split
    rows = [(f"c{i % 50}", j) for i in range(50) for j in range(4 * (i % 3 + 1))]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = deterministic_split(df, "conv_id", WEIGHTS).collect()
    per_conv = {}
    for r in out:
        per_conv.setdefault(r["conv_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_conv.values())
    # a different seed reshuffles assignments
    s1 = {r["conv_id"]: r["split"] for r in deterministic_split(df, "conv_id", WEIGHTS, seed="a").collect()}
    s2 = {r["conv_id"]: r["split"] for r in deterministic_split(df, "conv_id", WEIGHTS, seed="b").collect()}
    assert s1 != s2


def _greedy_oracle(sizes, budget):
    packs, run, pack = [], 0, 0
    for x in sizes:
        if run > 0 and run + x > budget:
            pack += 1
            run = 0
        run += x
        packs.append(pack)
    return packs


def test_pack_sequences_matches_sequential_oracle(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i % 4), int(i), int(rng.integers(1, 900)))
        for i in range(400)
    ]
    # a few oversized items (> budget) must each get their own pack
    rows += [(0, 1000, 5000), (1, 1001, 5000)]
    df = spark.createDataFrame(rows, "shard int, ord int, n_tok int")
    got = {
        (r["shard"], r["ord"]): r["pack_id"]
        for r in pack_sequences(df, "shard", "ord", "n_tok", budget=2000).collect()
    }
    for shard in range(4):
        seq = sorted((o, t) for s, o, t in rows if s == shard)
        want = _greedy_oracle([t for _, t in seq], 2000)
        for (o, _), w in zip(seq, want):
            assert got[(shard, o)] == w, (shard, o)


def test_pack_sequences_respects_budget(spark):
    df = spark.createDataFrame(
        [(0, i, 300) for i in range(20)], "shard int, ord int, n_tok int"
    )
    out = pack_sequences(df, "shard", "ord", "n_tok", budget=1000)
    sums = out.groupBy("pack_id").agg(F.sum("n_tok").alias("s")).collect()
    assert all(r["s"] <= 1000 for r in sums)
    # 300*3=900 fits, 4th would be 1200 -> packs of 3: ceil(20/3)=7 packs
    assert out.select("pack_id").distinct().count() == 7


def test_cdc_chunks_reference_parity_and_invariance(spark):
    """Content-defined chunking: exact parity with a python reference of
    the greedy min_len acceptance + max_len splitting; chunks reconstruct
    the document byte-exactly; and the CDC property — a prefix edit changes
    only the first chunk's identity, interior chunks survive (what
    fixed-width splitting cannot do)."""
    import hashlib

    from pyspark.sql import functions as F

    from spacy_ann_linker_spark.extras.sampling import cdc_chunks

    k, mask, min_len, max_len = 8, 63, 32, 120
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 40)

    def py_chunks(t):
        cuts, last = [], 0
        for i in range(1, max(len(t) - k + 1, 0) + 1):
            h = int(hashlib.md5(t[i - 1 : i - 1 + k].encode()).hexdigest()[:15], 16)
            if h % (mask + 1) == 0 and i - last >= min_len:
                cuts.append(i)
                last = i
        bounds = sorted(set(cuts + [len(t)]))
        out = []
        for bi, e in enumerate(bounds):
            s = (bounds[bi - 1] if bi else 0) + 1
            if e < s:
                continue
            j = 0
            while s + j * max_len <= e:
                ss = s + j * max_len
                ee = min(e, s + (j + 1) * max_len - 1)
                out.append((ss, t[ss - 1 : ee]))
                j += 1
        return [(ci, s, c) for ci, (s, c) in enumerate(out)]

    got = {}
    for r in cdc_chunks(docs, "doc_id", "text", k, mask, min_len, max_len).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["start"], r["chunk"]))
    for row in docs.collect():
        want = py_chunks(row["text"] or "")
        assert sorted(got.get(row["doc_id"], [])) == sorted(want), row["doc_id"]
        assert "".join(c for _, _, c in sorted(want)) == (row["text"] or "")

    # CDC invariance: prefix edit -> at most one changed chunk per doc
    aug = docs.select("doc_id", F.concat(F.lit("EDITEDIT "), F.col("text")).alias("text"))
    base = {(r["doc_id"], r["chunk"]) for r in cdc_chunks(docs, "doc_id", "text", k, mask, min_len, max_len).collect()}
    edited = {(r["doc_id"], r["chunk"]) for r in cdc_chunks(aug, "doc_id", "text", k, mask, min_len, max_len).collect()}
    n_docs = docs.count()
    lost = base - edited
    assert len(lost) <= 2 * n_docs, (len(lost), n_docs)  # ~1 boundary chunk per doc
    assert len(base & edited) >= len(base) - 2 * n_docs


def test_stratified_sample_exact_counts_and_determinism(spark):
    import hashlib

    from spacy_ann_linker_spark.extras.sampling import stratified_sample

    rows = [(f"id{i}", "big" if i < 40 else ("mid" if i < 50 else "tiny"))
            for i in range(52)]  # strata of 40 / 10 / 2
    df = spark.createDataFrame(rows, "doc_id string, source string")

    out = stratified_sample(df, "source", 5, "doc_id").collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], set()).add(r["doc_id"])
    # exact n per stratum; undersized strata return whole
    assert len(by["big"]) == 5 and len(by["mid"]) == 5 and len(by["tiny"]) == 2

    # the picks ARE the n lowest md5(key) per stratum (python reference)
    for src, n in [("big", 5), ("mid", 5), ("tiny", 2)]:
        keys = [k for k, s in rows if s == src]
        expect = set(sorted(keys, key=lambda k: (hashlib.md5(k.encode()).hexdigest(), k))[:n])
        assert by[src] == expect, src

    # partition-invariant
    again = stratified_sample(df.repartition(7), "source", 5, "doc_id").collect()
    assert {(r["doc_id"], r["source"]) for r in again} == {
        (r["doc_id"], r["source"]) for r in out
    }

    # seed changes the picks (on the big stratum, overwhelmingly)
    seeded = stratified_sample(df, "source", 5, "doc_id", seed="v2").collect()
    assert {(r["doc_id"], r["source"]) for r in seeded} != {
        (r["doc_id"], r["source"]) for r in out
    }


def test_stratified_sample_plan_has_window_group_limit(spark):
    """The rank<=n filter must plan as WindowGroupLimit (map-side per-group
    pruning before the exchange) — without it a Zipf-hot stratum sorts in
    full on one reducer."""
    from spacy_ann_linker_spark.extras.sampling import stratified_sample

    df = spark.createDataFrame([("a", "s")], "doc_id string, source string")
    plan = (
        stratified_sample(df, "source", 5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_weighted_sample_matches_python_reference(spark):
    """Exact-selection parity with a hashlib+math reference of the A-Res
    derandomized formula ln(u)/w, u = (h60 + 0.5) / 2^60."""
    import hashlib
    import math

    from spacy_ann_linker_spark.extras.sampling import weighted_sample

    rows = [(f"d{i}", "s" if i % 2 else "t", float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, source string, w double")
    got = {
        (r["doc_id"], r["source"])
        for r in weighted_sample(df, "source", 4, "doc_id", "w").collect()
    }

    def skey(key, w):
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return math.log((h + 0.5) / float(1 << 60)) / w

    want = set()
    for src in ("s", "t"):
        grp = [(k, s, w) for k, s, w in rows if s == src]
        grp.sort(key=lambda r: (-skey(r[0], r[2]), r[0]))
        want |= {(k, s) for k, s, _ in grp[:4]}
    assert got == want


def test_weighted_sample_partition_invariant_and_excludes_nonpositive(spark):
    from spacy_ann_linker_spark.extras.sampling import weighted_sample

    rows = [("a", "s", 5.0), ("b", "s", 0.0), ("c", "s", -1.0), ("d", "s", None),
            ("e", "s", 2.0), ("f", "s", 1.0)]
    df = spark.createDataFrame(rows, "doc_id string, source string, w double")
    out1 = {r["doc_id"] for r in weighted_sample(df, "source", 10, "doc_id", "w").collect()}
    out2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(5), "source", 10, "doc_id", "w").collect()
    }
    assert out1 == out2 == {"a", "e", "f"}  # zero/negative/null weights excluded


def test_weighted_sample_formula_is_weight_proportional():
    """Statistical property of the derandomized formula itself (pure
    python, no Spark): across many seeds, an item with 9x the weight is
    included ~proportionally more often when sampling 1 of 2."""
    import hashlib
    import math

    def pick(seed):
        def skey(key, w):
            h = int(hashlib.md5((seed + key).encode()).hexdigest()[:15], 16)
            return math.log((h + 0.5) / float(1 << 60)) / w
        return max([("hv", 9.0), ("lw", 1.0)], key=lambda r: skey(r[0], r[1]))[0]

    wins = sum(pick(f"s{i}") == "hv" for i in range(2000))
    # E[wins] = 2000 * 0.9 = 1800; binomial sd ~ 13.4 -> 5 sigma band
    assert 1730 < wins < 1870, wins


def test_weighted_sample_plan_has_window_group_limit(spark):
    from spacy_ann_linker_spark.extras.sampling import weighted_sample

    df = spark.createDataFrame([("a", "s", 1.0)], "doc_id string, source string, w double")
    plan = (
        weighted_sample(df, "source", 5, "doc_id", "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


# ------------------------------------------------- contrastive negatives


def test_contrastive_negatives_deterministic_and_excludes_positives(spark):
    from spacy_ann_linker_spark.extras.sampling import contrastive_negatives

    pool = spark.createDataFrame([(i,) for i in range(100)], "doc_id int")
    anchors = spark.createDataFrame([(1,), (2,), (3,)], "anchor_id int")
    pos = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "anchor_id int, doc_id int"
    )
    a = sorted(map(tuple, contrastive_negatives(anchors, pool, k=5, positives=pos).collect()))
    b = sorted(
        map(
            tuple,
            contrastive_negatives(
                anchors.repartition(3), pool.repartition(9), k=5, positives=pos
            ).collect(),
        )
    )
    assert a == b  # partition-invariant
    assert all(aid != nid for aid, nid, _ in a)  # positives excluded
    per_anchor = {}
    for aid, _, _ in a:
        per_anchor[aid] = per_anchor.get(aid, 0) + 1
    # each anchor draws k probes; collisions/positives can only REDUCE
    assert all(1 <= c <= 5 for c in per_anchor.values())


def test_contrastive_negatives_probe_formula_pinned(spark):
    """Probe i of anchor a must land at pool rank h60('a:i') mod N + 1 —
    the reproducibility contract callers can rely on across engines."""
    import hashlib

    from spacy_ann_linker_spark.extras.sampling import contrastive_negatives

    n = 37
    pool = spark.createDataFrame([(i * 10,) for i in range(n)], "doc_id int")
    anchors = spark.createDataFrame([(7,)], "anchor_id int")
    got = {
        (r["probe_idx"], r["neg_id"])
        for r in contrastive_negatives(anchors, pool, k=3).collect()
    }
    ids = sorted(i * 10 for i in range(n))
    expect = set()
    for i in range(3):
        h = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:15], 16)
        expect.add((i, ids[h % n]))
    # min-probe dedup can merge colliding probes; every expected pair must
    # appear with its smallest probe index
    merged = {}
    for i, d in sorted(expect):
        merged.setdefault(d, i)
    assert got == {(i, d) for d, i in merged.items()}


def test_contrastive_negatives_draws_k_distinct_when_no_collisions(spark):
    from spacy_ann_linker_spark.extras.sampling import contrastive_negatives

    pool = spark.createDataFrame([(i,) for i in range(10_000)], "doc_id int")
    anchors = spark.createDataFrame([(i,) for i in range(20)], "anchor_id int")
    out = contrastive_negatives(anchors, pool, k=8)
    counts = {
        r["anchor_id"]: r["n"]
        for r in out.groupBy("anchor_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # with N=10k and k=8, collisions are ~k^2/2N -- expect nearly all 8s
    assert set(counts) == set(range(20))
    assert all(c >= 7 for c in counts.values())
    assert sum(1 for c in counts.values() if c == 8) >= 18


def test_temperature_mix_expected_shares_and_determinism(spark):
    from spacy_ann_linker_spark.extras.sampling import temperature_mix

    data = [(i, "big" if i < 1800 else "small") for i in range(2000)]
    df = spark.createDataFrame(data, "id int, src string")
    out = temperature_mix(df, "src", "id", alpha=0.3, target_frac=0.5)
    cnt = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # p ~ n^0.3: big share ~0.66 of T=1000 -> rate ~0.37; small rate clamps at 1
    assert cnt["small"] == 200  # clamped: keeps everything
    assert 550 < cnt["big"] < 780  # ~0.37 * 1800 = 666, binomial-ish spread
    # deterministic + partition invariant: same surviving ids regardless of layout
    ids1 = {r.id for r in temperature_mix(df.repartition(1), "src", "id", 0.3, 0.5).select("id").collect()}
    ids16 = {r.id for r in temperature_mix(df.repartition(16), "src", "id", 0.3, 0.5).select("id").collect()}
    assert ids1 == ids16 == {r.id for r in out.select("id").collect()}


def test_temperature_mix_alpha_one_is_uniform_rate(spark):
    from spacy_ann_linker_spark.extras.sampling import temperature_mix

    data = [(i, "a" if i % 3 else "b") for i in range(900)]
    df = spark.createDataFrame(data, "id int, src string")
    out = temperature_mix(df, "src", "id", alpha=1.0, target_frac=0.4)
    # alpha=1: p_g = n_g/N, so every group's rate is exactly target_frac
    rates = {r.src: r.keep_rate_ppm for r in out.select("src", "keep_rate_ppm").distinct().collect()}
    assert set(rates.values()) == {400000}


def test_temperature_mix_alpha_zero_equalizes_expected_counts(spark):
    from spacy_ann_linker_spark.extras.sampling import temperature_mix

    data = [(i, "head" if i < 9000 else "tail") for i in range(10000)]
    df = spark.createDataFrame(data, "id int, src string")
    out = temperature_mix(df, "src", "id", alpha=0.0, target_frac=0.2)
    cnt = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # T=2000 split evenly: head rate 1000/9000, tail rate 1000/1000 -> clamp 1
    assert cnt["tail"] == 1000
    assert 850 < cnt["head"] < 1150
