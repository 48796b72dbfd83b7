"""String-similarity scoring UDFs: Jaro-Winkler (vectorized pandas UDF) and
Levenshtein (Spark built-in F.levenshtein — use that directly).

north_star: "pairwise candidate scoring runs as vectorized Arrow pandas UDFs
computing batched cosine similarity plus Jaro-Winkler/Levenshtein on mention
text". The reference itself has no string-edit scoring (its fuzziness is
3-gram cosine only) — this is the typo-rescue path for mentions whose n-gram
cosine falls below threshold (e.g. 2-char edits in short words destroy most
of their 3-grams).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    """Public-domain Jaro similarity."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(
    s1: str, s2: str, p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.0
) -> float:
    """boost_threshold: the classic Winkler convention (and DuckDB's
    jaro_winkler_similarity) applies the prefix boost only when the base
    Jaro score exceeds 0.7; the rescue path defaults to 0.0 (always boost)
    so near-threshold typo scores degrade smoothly instead of cliffing at
    the boost gate. Pass 0.7 for cross-engine parity with DuckDB."""
    j = jaro(s1, s2)
    if j <= boost_threshold and j != 1.0 and boost_threshold > 0.0:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def _pad_codes(joined: str, lens: np.ndarray) -> np.ndarray:
    """Concatenated batch string -> (B, L) codepoint matrix (0-padded).
    One C-level encode for the whole batch, no per-char Python; uint8 when
    every char fits latin-1 (4x less memory traffic in the scan loops)."""
    lmax = int(lens.max()) if len(lens) else 0
    try:
        codes = np.frombuffer(joined.encode("latin-1"), dtype=np.uint8)
    except UnicodeEncodeError:
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    pad = np.zeros((len(lens), max(lmax, 1)), dtype=codes.dtype)
    if lmax:
        pad[np.arange(pad.shape[1])[None, :] < lens[:, None]] = codes
    return pad


def jaro_winkler_batch(
    a: list[str],
    b: list[str],
    p: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.0,
) -> np.ndarray:
    """Batch-vectorized Jaro-Winkler, identical to the scalar reference
    (property-tested in tests/test_stringsim.py).

    The greedy match scan is sequential in character POSITION but independent
    across PAIRS, so the loops run over positions (<= max string length, ~30
    for mention/alias text) with every step a full-batch numpy op — the
    per-pair interpreted-Python cost of the old loop (the VERDICT r2 watch
    item on the rescue hot path) becomes O(L^2) batch-wide vector ops."""
    n = len(a)
    if n == 0:
        return np.zeros(0)
    la = np.fromiter(map(len, a), dtype=np.int64, count=n)
    lb = np.fromiter(map(len, b), dtype=np.int64, count=n)
    # latin-1 values equal unicode codepoints for U+0000..U+00FF, so a uint8
    # side compares correctly against a uint32 side via numpy promotion
    pa = _pad_codes("".join(a), la)
    pb = _pad_codes("".join(b), lb)
    l1, l2 = pa.shape[1], pb.shape[1]
    jcols = np.arange(l2)[None, :]
    # match window half-width; identical strings are short-circuited at the
    # end (the window is empty for 1-char strings, like the scalar code)
    d = np.maximum(la, lb) // 2 - 1
    m1 = np.zeros_like(pa, dtype=bool)
    m2 = np.zeros_like(pb, dtype=bool)
    for i in range(l1):
        c = pa[:, i]
        elig = (
            (pb == c[:, None])
            & ~m2
            & (jcols >= (i - d)[:, None])
            & (jcols <= (i + d)[:, None])
            & (jcols < lb[:, None])
            & (i < la)[:, None]
        )
        found = elig.any(axis=1)
        jstar = elig.argmax(axis=1)  # first eligible j (greedy, same as scalar)
        m2[found, jstar[found]] = True
        m1[found, i] = True
    matches = m1.sum(axis=1)
    # compact matched chars of each side in original order, compare for
    # transpositions (stable sort puts matched positions first, in order)
    order1 = np.argsort(~m1, axis=1, kind="stable")
    order2 = np.argsort(~m2, axis=1, kind="stable")
    c1 = np.take_along_axis(pa, order1, axis=1)
    c2 = np.take_along_axis(pb, order2, axis=1)
    w = min(l1, l2)
    pos = np.arange(w)[None, :]
    trans = ((c1[:, :w] != c2[:, :w]) & (pos < matches[:, None])).sum(axis=1) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        m = matches.astype(np.float64)
        jaro_sim = (m / la + m / lb + (m - trans) / m) / 3.0
    jaro_sim = np.where(matches == 0, 0.0, jaro_sim)
    # common prefix (up to max_prefix chars of the shorter string)
    wpre = min(max_prefix, l1, l2)
    if wpre:
        pre_pos = np.arange(wpre)[None, :]
        eq = (
            (pa[:, :wpre] == pb[:, :wpre])
            & (pre_pos < la[:, None])
            & (pre_pos < lb[:, None])
        )
        prefix = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    out = np.where(
        jaro_sim > boost_threshold,
        jaro_sim + prefix * p * (1.0 - jaro_sim),
        jaro_sim,
    )
    # scalar short-circuit parity: identical strings score 1.0 even when the
    # match window is empty (1-char strings). la == lb implies la <= the
    # shared width, and padding is 0 on both sides, so a prefix compare of
    # the shared columns decides equality.
    shared = min(l1, l2)
    identical = (la == lb) & (pa[:, :shared] == pb[:, :shared]).all(axis=1)
    return np.where(identical, 1.0, out)


def make_jaro_winkler_udf(
    p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.0
):
    """Parameterized Arrow-batched JW UDF factory. boost_threshold=0.7
    reproduces the classic Winkler gate (DuckDB jaro_winkler_similarity
    parity — pinned by the jw_similarity oracle row); the rescue default
    stays 0.0 (always boost) for smooth near-threshold degradation."""

    @F.pandas_udf(T.DoubleType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            jaro_winkler_batch(
                [(x or "").lower() for x in a],
                [(y or "").lower() for y in b],
                p=p,
                max_prefix=max_prefix,
                boost_threshold=boost_threshold,
            )
        )

    return _udf


# default instance used by the rescue hot path (case-folded, always-boost)
jaro_winkler_udf = make_jaro_winkler_udf()


def damerau_levenshtein(s1: str, s2: str) -> int:
    """Scalar TRUE (unrestricted) Damerau-Levenshtein distance —
    Lowrance-Wagner 1975, the variant DuckDB's `damerau_levenshtein`
    computes (dl("ca","abc")=2, where the restricted/OSA variant says 3).
    Spark has no built-in for this (F.levenshtein lacks transpositions);
    transposition-aware edit cost matters for ER because swapped adjacent
    letters ("recieve"/"receive", keyboard slips) are the single most
    common typo class and plain Levenshtein double-charges them."""
    la, lb = len(s1), len(s2)
    if not la:
        return lb
    if not lb:
        return la
    inf = la + lb
    da: dict[str, int] = {}
    # dm[i+1][j+1] == d[i][j]; row/col 0 hold the `inf` sentinel boundary
    dm = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        dm[i + 1][1] = i
    for j in range(lb + 1):
        dm[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        ci = s1[i - 1]
        for j in range(1, lb + 1):
            cj = s2[j - 1]
            k = da.get(cj, 0)
            l = db
            if ci == cj:
                cost = 0
                db = j
            else:
                cost = 1
            dm[i + 1][j + 1] = min(
                dm[i][j] + cost,  # substitute / match
                dm[i + 1][j] + 1,  # insert
                dm[i][j + 1] + 1,  # delete
                dm[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose block
            )
        da[ci] = i
    return dm[la + 1][lb + 1]


def damerau_levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Batch-vectorized Lowrance-Wagner DL, identical to the scalar
    reference (DuckDB-parity property-tested). Same shape discipline as
    jaro_winkler_batch: the DP is sequential in CELL position but
    independent across PAIRS, so the i,j loops run over positions
    (O(L^2) iterations, L = max string length in the batch) with every
    step a full-batch numpy op. The `da` last-occurrence table the true-DL
    recurrence needs is a (B, 256) array on the latin-1 fast path; batches
    with any non-latin-1 char fall back to the scalar loop (rare for
    mention/alias text, correctness identical).

    Padding safety: pad code 0 never matches a real char, and garbage DP
    cells beyond a pair's (la, lb) corner are written only AFTER the
    pair's answer cell dm[la+1][lb+1] is final (row-major sweep), so
    per-pair answers are exact despite the shared padded width."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter(map(len, a), dtype=np.int64, count=n)
    lb = np.fromiter(map(len, b), dtype=np.int64, count=n)
    try:
        pa = np.frombuffer("".join(a).encode("latin-1"), dtype=np.uint8)
        pb = np.frombuffer("".join(b).encode("latin-1"), dtype=np.uint8)
    except UnicodeEncodeError:
        return np.fromiter(
            (damerau_levenshtein(x, y) for x, y in zip(a, b)),
            dtype=np.int64,
            count=n,
        )
    l1 = int(la.max()) if n else 0
    l2 = int(lb.max()) if n else 0
    wa = np.zeros((n, max(l1, 1)), dtype=np.uint8)
    wb = np.zeros((n, max(l2, 1)), dtype=np.uint8)
    if l1:
        wa[np.arange(wa.shape[1])[None, :] < la[:, None]] = pa
    if l2:
        wb[np.arange(wb.shape[1])[None, :] < lb[:, None]] = pb
    inf = (la + lb).astype(np.int32)
    dm = np.zeros((n, l1 + 2, l2 + 2), dtype=np.int32)
    dm[:, 0, :] = inf[:, None]
    dm[:, :, 0] = inf[:, None]
    dm[:, 1, 1:] = np.arange(l2 + 1, dtype=np.int32)[None, :]
    dm[:, 1:, 1] = np.arange(l1 + 1, dtype=np.int32)[None, :]
    bidx = np.arange(n)
    da = np.zeros((n, 256), dtype=np.int32)
    for i in range(1, l1 + 1):
        db = np.zeros(n, dtype=np.int32)
        ci = wa[:, i - 1].astype(np.int64)
        for j in range(1, l2 + 1):
            cj = wb[:, j - 1].astype(np.int64)
            k = da[bidx, cj]
            l = db
            match = (ci == cj) & (ci != 0)
            cost = np.where(match, 0, 1).astype(np.int32)
            db = np.where(match, j, db).astype(np.int32)
            dm[:, i + 1, j + 1] = np.minimum.reduce(
                [
                    dm[:, i, j] + cost,
                    dm[:, i + 1, j] + 1,
                    dm[:, i, j + 1] + 1,
                    dm[bidx, k, l] + (i - k - 1) + 1 + (j - l - 1),
                ]
            )
        da[bidx, ci] = i
    return dm[bidx, la + 1, lb + 1].astype(np.int64)


def make_damerau_levenshtein_udf():
    """Arrow-batched true-DL distance UDF (int). No case folding — callers
    decide (the oracle fixture compares raw part names on both engines);
    NULLs score as empty strings, matching Spark's levenshtein-on-coalesce
    convention used elsewhere in this module."""

    @F.pandas_udf(T.IntegerType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            damerau_levenshtein_batch(
                [(x or "") for x in a], [(y or "") for y in b]
            )
        ).astype("int32")

    return _udf


damerau_levenshtein_udf = make_damerau_levenshtein_udf()


def _tokens(col):
    return F.array_distinct(
        F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")
    )


def soft_tfidf_pairs(
    records,
    pairs,
    id_col: str = "id",
    text_col: str = "text",
    left_id: str = "id_a",
    right_id: str = "id_b",
    theta: float = 0.9,
    boost_threshold: float = 0.7,
    out_col: str = "soft_tfidf",
):
    """Soft TF-IDF (Cohen, Ravikumar & Fienberg, IIWeb 2003) — the third
    classic hybrid ER similarity next to plain JW and Monge-Elkan: token
    matches are FUZZY (Jaro-Winkler above `theta`) but each match is
    weighted by both tokens' corpus TF-IDF weight, so agreeing on a rare
    surname counts far more than agreeing on "inc".

        score(A,B) = Σ_{a∈A, jw(a,b*)>θ} w(a,A) · w(b*,B) · jw(a, b*)
        b* = argmax_{b∈B} jw(a,b)   (ties: jw 9-dp rounded, then token asc)

    Convention pinned here (SecondString leaves it open): tokens are the
    DISTINCT lowercase [^a-z0-9]+ splits (tf = 1), idf = ln(1 + N/df),
    weights L2-normalized per record — so score(A,A) = 1 exactly. The
    argmax compares jw ROUNDED to 9 decimals: our batch JW and DuckDB's
    agree to <1e-12, so the oracle's argmax picks the same b* instead of
    flipping on 1e-15 noise.

    `records` (id, text) defines the corpus (df, N — the idf discipline of
    vectorize/tfidf.py: one groupBy(tok), one one-row count broadcast);
    `pairs` names which (left_id, right_id) to score. Scale shape: weights
    attach to pairs by two id equi-joins; the per-pair token cross product
    (|A|·|B| rows, names are a handful of tokens) folds by one max_by and
    one sum — both map-side-combinable. Pairs with no close token (or an
    empty side) score 0.0."""
    jw = make_jaro_winkler_udf(boost_threshold=boost_threshold)

    toks = records.select(
        F.col(id_col).alias("_id"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    n_docs = records.select(F.countDistinct(id_col).alias("_n"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    raw = (
        toks.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select("_id", "tok", F.log(1.0 + F.col("_n") / F.col("_df")).alias("_w"))
    )
    norms = raw.groupBy("_id").agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_nrm"))
    weights = raw.join(norms, "_id").select(
        "_id", "tok", (F.col("_w") / F.col("_nrm")).alias("_w")
    )

    pa = pairs.select(left_id, right_id).distinct()
    wa = weights.select(
        F.col("_id").alias(left_id), F.col("tok").alias("_ta"), F.col("_w").alias("_wa")
    )
    wb = weights.select(
        F.col("_id").alias(right_id), F.col("tok").alias("_tb"), F.col("_w").alias("_wb")
    )
    crossed = pa.join(wa, left_id).join(wb, right_id).withColumn(
        "_jw", F.round(jw(F.col("_ta"), F.col("_tb")), 9)
    )
    best = crossed.groupBy(left_id, right_id, "_ta", "_wa").agg(
        # argmax jw with ASCENDING token tie-break: min_by over (-jw, tok)
        F.min_by(
            F.struct("_jw", "_wb"),
            F.struct((-F.col("_jw")).alias("_njw"), F.col("_tb")),
        ).alias("_b")
    )
    scored = (
        best.filter(F.col("_b")["_jw"] > F.lit(theta))
        .groupBy(left_id, right_id)
        .agg(F.sum(F.col("_wa") * F.col("_b")["_wb"] * F.col("_b")["_jw"]).alias(out_col))
    )
    return pairs.join(scored, [left_id, right_id], "left").withColumn(
        out_col, F.coalesce(out_col, F.lit(0.0))
    )


def monge_elkan_pairs(
    pairs,
    left_col: str = "name_a",
    right_col: str = "name_b",
    boost_threshold: float = 0.7,
    symmetric: bool = False,
    out_col: str = "me_sim",
):
    """Monge-Elkan hybrid similarity (Monge & Elkan 1996) over a pair
    table: tokenize both names (lowercase, [^a-z0-9]+ splits, distinct —
    the token_block_pairs convention), then

        ME(A→B) = (1/|A|) Σ_{a∈A} max_{b∈B} JW(a, b)

    with Jaro-Winkler (boost_threshold=0.7 = DuckDB parity) as the inner
    secondary. The multi-token analogue of plain JW: word reorderings
    ("Proc. of the VLDB" vs "VLDB proceedings") that destroy a whole-string
    edit score barely move ME. Asymmetric by definition; symmetric=True
    returns the mean of both directions (a common symmetrization).

    Scale shape: scoring runs over DISTINCT (left, right) string pairs
    only (the memo/dedup-first discipline of link/linker.py — repeated
    name pairs are the norm in ER candidate tables), then joins back to
    the input on the pair strings. Per distinct pair the token cross
    product is |A|·|B| rows — names are a handful of tokens, so this is a
    small constant, not a blow-up — folded by max-per-left-token then
    mean, both map-side-combinable aggregates. Either side tokenizing to
    empty scores 0.0 (no token evidence ≠ a match).

    Output: `pairs` + out_col. Column order of the two groupBys keeps the
    pair strings as the keys, so the join back is an equi-join on the
    same attributes the aggregation already shuffled on — Catalyst reuses
    the partitioning instead of adding a fourth shuffle."""
    jw = make_jaro_winkler_udf(boost_threshold=boost_threshold)

    def _one_direction(distinct_pairs, a_col, b_col, alias):
        toks = distinct_pairs.select(
            a_col, b_col, _tokens(F.col(a_col)).alias("_ta"), _tokens(F.col(b_col)).alias("_tb")
        )
        exploded = toks.select(
            a_col,
            b_col,
            F.posexplode("_ta").alias("_ia", "_a"),
            F.col("_tb"),
        ).select(a_col, b_col, "_ia", "_a", F.explode("_tb").alias("_b"))
        best = (
            exploded.withColumn("_jw", jw(F.col("_a"), F.col("_b")))
            .groupBy(a_col, b_col, "_ia")
            .agg(F.max("_jw").alias("_best"))
        )
        return best.groupBy(a_col, b_col).agg(F.avg("_best").alias(alias))

    distinct = pairs.select(left_col, right_col).distinct()
    fwd = _one_direction(distinct, left_col, right_col, "_me_fwd")
    scored = distinct.join(fwd, [left_col, right_col], "left")
    if symmetric:
        rev = _one_direction(
            distinct.select(
                F.col(right_col).alias(left_col), F.col(left_col).alias(right_col)
            ).distinct(),
            left_col,
            right_col,
            "_me_rev",
        ).select(
            F.col(left_col).alias(right_col), F.col(right_col).alias(left_col), "_me_rev"
        )
        scored = scored.join(rev, [left_col, right_col], "left")
        me = (F.coalesce("_me_fwd", F.lit(0.0)) + F.coalesce("_me_rev", F.lit(0.0))) / 2
    else:
        me = F.coalesce("_me_fwd", F.lit(0.0))
    scored = scored.select(left_col, right_col, me.alias(out_col))
    return pairs.join(scored, [left_col, right_col], "left").withColumn(
        out_col, F.coalesce(out_col, F.lit(0.0))
    )
