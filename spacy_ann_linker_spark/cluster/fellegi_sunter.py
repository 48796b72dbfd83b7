"""Fellegi-Sunter probabilistic record linkage: pair scoring + EM weight
estimation (Fellegi & Sunter 1969, "A Theory for Record Linkage"; the
model behind Splink / FEBRL / the Census Bureau matchers).

This is the COMPARE/CLASSIFY stage of the ER pipeline this engine builds:

    block (candidates/blocking.py)  ->  agreement vectors on pairs
    -> fellegi_sunter_score         ->  threshold                (here)
    -> connected_components (cluster/cc.py)
    -> golden_records (cluster/survivorship.py)

Model: for each comparison field i, m_i = P(agree_i | match) and
u_i = P(agree_i | non-match). A pair's log-likelihood-ratio score is

    score = sum_i  agree_i     * log2(m_i / u_i)            (agreement weight)
                 + (1-agree_i) * log2((1-m_i) / (1-u_i))    (disagreement weight)

NULL agreement (a field missing on either record) contributes 0 — the
standard convention: an unobserved comparison carries no evidence.

Scale shape:
  - `fellegi_sunter_score` is a PURE PROJECTION over the pair table: the
    per-field log-weights are computed once at plan-build time and enter
    the plan as literals, so the whole score is constant-folded JVM
    arithmetic — zero shuffles, zero Python, runs where the pairs sit.
  - `estimate_mu_em` aggregates the pair table ONCE (groupBy the k
    agreement columns -> at most 3^k pattern-count rows, map-side
    combined), then iterates EM on the driver over that tiny count table
    in numpy. 10^10 pairs cost one linear pass; the EM loop never touches
    the cluster again. This is how Splink runs EM on Spark.

The reference has no probabilistic-linkage surface (it ranks candidates
by TF-IDF cosine only); this is a beyond-reference ER operator like
cluster/survivorship.py. Oracle: `fellegi_sunter_score` in
__spark_entry__.py (identical double literals + same-order sums in DuckDB,
value-exact); EM is iterative/non-SQL and is pinned in tests against an
independent per-row python EM and a planted-truth recovery check.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def fs_weights(weights: Mapping[str, tuple[float, float]]) -> dict[str, tuple[float, float]]:
    """(agreement_weight, disagreement_weight) per field from (m, u):
    log2(m/u) and log2((1-m)/(1-u)). Validates 0 < u, m < 1."""
    out = {}
    for field, (m, u) in weights.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"{field}: m={m}, u={u} must be strictly inside (0, 1)")
        out[field] = (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
    return out


def fellegi_sunter_score(
    pairs: DataFrame,
    weights: Mapping[str, tuple[float, float]],
    score_col: str = "fs_score",
) -> DataFrame:
    """Add the Fellegi-Sunter log2-likelihood-ratio score over the given
    agreement columns. `pairs` carries one column per field in `weights`,
    valued 1/true (agree), 0/false (disagree), or NULL (missing -> 0
    contribution). `weights` maps field -> (m, u).

    Pure projection (see module docstring): per-field weights are python
    floats baked into the plan as literals, summed in deterministic field
    order — the oracle replays the identical doubles in the identical
    order, so the score is cross-engine byte-exact."""
    w = fs_weights(weights)
    terms = [
        F.when(F.col(f).isNull(), F.lit(0.0))
        .when(F.col(f).cast("int") == 1, F.lit(wa))
        .otherwise(F.lit(wd))
        for f, (wa, wd) in w.items()
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return pairs.withColumn(score_col, score)


def term_frequencies(records: DataFrame, field: str) -> DataFrame:
    """(value, tf): relative frequency of each non-null value of `field`
    in the records corpus — the value-specific u-probability proxy for
    TF adjustment. One map-side-combined groupBy over the records table;
    the result is a VALUES dimension (distinct values, not records), small
    enough to broadcast for any real field."""
    nonnull = records.select(F.col(field).alias("value")).filter(F.col("value").isNotNull())
    counts = nonnull.groupBy("value").agg(F.count(F.lit(1)).alias("_n"))
    total = nonnull.select(F.count(F.lit(1)).alias("_tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value", (F.col("_n") / F.col("_tot")).alias("tf")
    )


def fellegi_sunter_score_tf(
    pairs: DataFrame,
    weights: Mapping[str, tuple[float, float]],
    tf_tables: Mapping[str, DataFrame],
    suffixes: tuple[str, str] = ("_a", "_b"),
    tf_weight: float = 1.0,
    score_col: str = "fs_score",
    broadcast_tf: bool = True,
) -> DataFrame:
    """Term-frequency-adjusted Fellegi-Sunter scoring (the Splink
    `tf_adjustments` idea): agreeing on a RARE value is stronger evidence
    than agreeing on a common one, so when a pair agrees on field f with
    value v the agreement weight log2(m/u) gets the correction

        + tf_weight * log2(u / tf(v))        (net: ~log2(m / tf(v)))

    while disagreement and NULL contributions stay the global-weight
    model of `fellegi_sunter_score`. `pairs` carries the VALUE columns
    f+suffix_a / f+suffix_b per field (agreement = non-null equality);
    `tf_tables[f]` is a (value, tf) table, normally `term_frequencies`
    over the records corpus. A value absent from the TF table (e.g. the
    corpus predates the pair) falls back to the unadjusted weight.

    Scale shape: one broadcast hash join per field against the values
    dimension (map-side, no shuffle; `broadcast_tf=False` for a giant
    value domain), then the score is a single projection of literal m/u
    doubles + log2 arithmetic — same constant-folded discipline as the
    base scorer. Oracle rounds to 6 dp (log2 may differ in the last ulp
    across engines, unlike the literal-only base score)."""
    sa, sb = suffixes
    w = fs_weights(weights)
    out = pairs
    for f in w:
        tf = tf_tables[f].select(
            F.col("value").alias(f"{f}{sa}"), F.col("tf").alias(f"_tf_{f}")
        )
        out = out.join(F.broadcast(tf) if broadcast_tf else tf, f"{f}{sa}", "left")
    terms = []
    for f, (wa, wd) in w.items():
        _, u = weights[f]
        a, b, tfc = F.col(f"{f}{sa}"), F.col(f"{f}{sb}"), F.col(f"_tf_{f}")
        adj = F.when(tfc.isNotNull(), F.lit(tf_weight) * F.log2(F.lit(u) / tfc)).otherwise(
            F.lit(0.0)
        )
        terms.append(
            F.when(a.isNull() | b.isNull(), F.lit(0.0))
            .when(a == b, F.lit(wa) + adj)
            .otherwise(F.lit(wd))
        )
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return out.withColumn(score_col, score).drop(*[f"_tf_{f}" for f in w])


def agreement_pattern_counts(pairs: DataFrame, fields: Sequence[str]) -> DataFrame:
    """(field agreement values..., n_pairs): the sufficient statistic for
    EM — one map-side-combined groupBy, at most 3^k rows out (0/1/NULL
    per field)."""
    cols = [F.col(f).cast("int").alias(f) for f in fields]
    return pairs.select(*cols).groupBy(*fields).agg(F.count(F.lit(1)).alias("n_pairs"))


def estimate_mu_em(
    pairs: DataFrame,
    fields: Sequence[str],
    p_init: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
    iters: int = 100,
    tol: float = 1e-10,
    clamp: float = 1e-6,
) -> dict:
    """Unsupervised EM estimation of the Fellegi-Sunter parameters from
    the candidate-pair agreement vectors (the Splink/FEBRL approach):
    latent match indicator, per-field Bernoulli agreement under each
    class.

    Distributed part: ONE linear aggregation of the pair table to
    agreement-pattern counts (<= 3^k rows). EM then iterates on the
    driver in numpy over those counts — each iteration is O(3^k * k),
    independent of pair count. NULL field values are ignored in the
    likelihood for that pattern (missing-at-random).

    Returns {"p": match prior, "m": {field: m}, "u": {field: u},
    "n_iters", "converged", "n_pairs"}. Parameters are clamped to
    [clamp, 1-clamp] each step so weights stay finite. Deterministic:
    same input -> same output, regardless of partitioning.
    """
    import numpy as np

    rows = agreement_pattern_counts(pairs, fields).collect()
    if not rows:
        raise ValueError("no pairs to estimate from")
    # deterministic pattern order: collect() order follows partitioning, and
    # float reductions are order-sensitive — sort so the estimate is a pure
    # function of the data (partition-invariance is tested)
    rows = sorted(rows, key=lambda r: tuple(-2 if r[f] is None else int(r[f]) for f in fields))
    k = len(fields)
    pats = np.array(
        [[(-1 if r[f] is None else int(r[f])) for f in fields] for r in rows],
        dtype=np.int64,
    )  # (P, k) with -1 for NULL
    cnt = np.array([r["n_pairs"] for r in rows], dtype=np.float64)  # (P,)
    obs = pats >= 0
    agree = (pats == 1) & obs

    p = float(p_init)
    m = np.full(k, float(m_init))
    u = np.full(k, float(u_init))
    converged = False
    it = 0
    for it in range(1, iters + 1):
        # E-step: P(match | pattern) via log-likelihoods (stable)
        lm = np.where(obs, np.where(agree, np.log(m), np.log1p(-m)), 0.0).sum(axis=1)
        lu = np.where(obs, np.where(agree, np.log(u), np.log1p(-u)), 0.0).sum(axis=1)
        lp_m = math.log(p) + lm
        lp_u = math.log(1.0 - p) + lu
        hi = np.maximum(lp_m, lp_u)
        g = np.exp(lp_m - hi) / (np.exp(lp_m - hi) + np.exp(lp_u - hi))  # (P,)
        # M-step (weighted by pattern counts; per-field over observed only)
        wm, wu = g * cnt, (1.0 - g) * cnt
        new_p = wm.sum() / cnt.sum()
        new_m = (wm[:, None] * agree).sum(axis=0) / np.maximum(
            (wm[:, None] * obs).sum(axis=0), 1e-300
        )
        new_u = (wu[:, None] * agree).sum(axis=0) / np.maximum(
            (wu[:, None] * obs).sum(axis=0), 1e-300
        )
        new_p = min(max(new_p, clamp), 1.0 - clamp)
        new_m = np.clip(new_m, clamp, 1.0 - clamp)
        new_u = np.clip(new_u, clamp, 1.0 - clamp)
        delta = max(
            abs(new_p - p), float(np.abs(new_m - m).max()), float(np.abs(new_u - u).max())
        )
        p, m, u = new_p, new_m, new_u
        if delta < tol:
            converged = True
            break
    return {
        "p": p,
        "m": {f: float(m[i]) for i, f in enumerate(fields)},
        "u": {f: float(u[i]) for i, f in enumerate(fields)},
        "n_iters": it,
        "converged": converged,
        "n_pairs": int(cnt.sum()),
    }
