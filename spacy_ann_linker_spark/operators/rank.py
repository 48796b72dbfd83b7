"""Exact distributed global row numbering.

A bare ``row_number() OVER (ORDER BY ...)`` with no partition collapses the
whole table onto ONE reducer — the classic global-rank scale trap. The
standard two-level recipe here keeps it exact and parallel: rows bucket by
an ORDER-COMPATIBLE expression (every row of a smaller bucket sorts before
every row of a larger one — a key prefix for strings, floor-division for
integers), per-bucket row_numbers run in parallel, and bucket offsets come
from one cumulative window over the |buckets|-row count table — the only
globally-ordered window, and it never sees record rows.

Consumers: candidates/blocking.sliding_window_sn_pairs (sorted-neighborhood
order) and extras/sampling.contrastive_negatives (dense pool indexing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list,
    bucket: Column,
    out_col: str = "rank",
) -> DataFrame:
    """df + `out_col`: the EXACT 1-based global row number under
    ORDER BY *order_cols — computed without any record-sized global window.

    `bucket` MUST be order-compatible with the leading sort order (and its
    own natural ordering): ranks compose as per-bucket row_number + the
    count of all rows in smaller buckets, which is only the true global
    rank when buckets partition the sort order into contiguous runs.
    Callers pick the granularity: each bucket is one window partition, so
    split until the hottest bucket fits a reducer (a longer string prefix,
    a smaller integer divisor). `order_cols` must be a TOTAL order (append
    a unique id) — ties would make the rank nondeterministic.

    PRECONDITION (ADVICE r5): bucket and order keys must be NON-NULL. A
    NULL bucket never equi-joins back on `_gb`, so its rows silently drop
    from the output while their group count still inflates every larger
    bucket's offset — ranks are then neither dense nor 1-based (and
    downstream pmod-probe consumers like contrastive_negatives would
    target nonexistent ranks). Filter or coalesce NULL keys first."""
    keyed = df.withColumn("_gb", bucket)
    wb = Window.partitionBy("_gb").orderBy(*order_cols)
    rn = keyed.withColumn("_grn", F.row_number().over(wb))
    counts = keyed.groupBy("_gb").agg(F.count(F.lit(1)).alias("_gc"))
    woff = Window.orderBy("_gb").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_gb", F.coalesce(F.sum("_gc").over(woff), F.lit(0)).alias("_goff")
    )
    return (
        rn.join(F.broadcast(offs), "_gb")
        .withColumn(out_col, F.col("_grn") + F.col("_goff"))
        .drop("_gb", "_grn", "_goff")
    )
