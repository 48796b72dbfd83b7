"""Waterfall (rule-cascade) deterministic linkage: ordered tiers of
blocking-style match rules, first-match-wins with tier provenance — the
classic deterministic-ER pattern (CMS/census "waterfall" matching, the
deterministic stage Splink/FEBRL run before probabilistic scoring).

Each tier is an equi-joinable key pair: a left-key expression and a
right-key expression. A left record links at the FIRST tier (list order)
that produces a key match; ties inside a tier break on the smallest right
id, so the output is a pure function of the data.

Scale shape — why union + one hash-agg, not sequential anti-joins: the
literal cascade ("run tier 2 only on tier-1 misses") is K serial
shuffle-join + anti-join rounds whose critical path grows with K. Here
every tier joins INDEPENDENTLY (parallel stages, each an equi-join that
AQE can broadcast when a dim side is small), then one map-side-combined
`min_by` per left id picks the lowest-tier match — semantically identical
to the sequential cascade, one shuffle round total. The trade: tiers
below a record's first match still do join work; that work is bounded by
each tier's key selectivity (coarse final tiers should carry a capped /
salted key — the same discipline as candidates/blocking.py), and is the
price of removing K-1 serial barriers at 100 TB.

No reference-file counterpart (the reference links by n-gram cosine
only, spacy_ann/ann_kb.py); beyond-reference ER operator like
cluster/fellegi_sunter.py. Oracle: `cascade_link` row in
__spark_entry__.py (UNION ALL + row_number replay in DuckDB).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def cascade_link(
    left: DataFrame,
    right: DataFrame,
    tiers: Sequence[tuple[str, Column, Column]],
    left_id: str = "id_a",
    right_id: str = "id_b",
    tier_col: str = "tier",
    exclude_self: bool = False,
    keep_unmatched: bool = False,
) -> DataFrame:
    """(left_id, right_id, tier): best match per left record across the
    ordered `tiers` = [(tier_name, left_key_expr, right_key_expr), ...].

    A tier matches where its two key expressions are equal and non-null
    (NULL keys never match, the SQL-join convention — rules with optional
    fields degrade gracefully). First tier in list order wins; within a
    tier the smallest `right_id` wins. `exclude_self` drops left_id ==
    right_id pairs BEFORE picking (self-linkage fixtures); with
    `keep_unmatched`, left records no tier matched are emitted with NULL
    right_id and tier.
    """
    if not tiers:
        raise ValueError("at least one tier required")
    legs = []
    for i, (name, lkey, rkey) in enumerate(tiers):
        l = left.select(F.col(left_id), lkey.alias("_ck")).filter(
            F.col("_ck").isNotNull()
        )
        r = right.select(F.col(right_id), rkey.alias("_ck")).filter(
            F.col("_ck").isNotNull()
        )
        legs.append(
            l.join(r, "_ck").select(
                left_id,
                right_id,
                F.lit(i).alias("_ti"),
                F.lit(name).alias(tier_col),
            )
        )
    allm = reduce(lambda a, b: a.unionByName(b), legs)
    if exclude_self:
        allm = allm.filter(F.col(left_id) != F.col(right_id))
    best = (
        allm.groupBy(left_id)
        .agg(
            F.min_by(
                F.struct(F.col(right_id), F.col(tier_col)),
                F.struct(F.col("_ti"), F.col(right_id)),
            ).alias("_b")
        )
        .select(left_id, F.col(f"_b.{right_id}"), F.col(f"_b.{tier_col}"))
    )
    if not keep_unmatched:
        return best
    return left.select(left_id).distinct().join(best, left_id, "left")
