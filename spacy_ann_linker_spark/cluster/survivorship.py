"""Golden-record survivorship — the entity-resolution *merge* step.

After matching (candidate pairs) and clustering (connected components),
the canonical ER lifecycle ends by consolidating every cluster into ONE
golden record, choosing each attribute by a survivorship rule (Talburt's
"fusion" step; the reference stops at per-mention links, ann_linker.py
emits one entity per span — clustering and merging are this engine's
north-rule extensions, see SURVEY.md J9).

Everything is hash aggregation — no windows, no sorts, no pair
materialization:

- one map-side-combined ``groupBy(cluster)`` carries ``cluster_size`` and
  every ``longest`` / ``max`` / ``min`` / ``first`` rule via
  ``max_by``/``min_by`` over deterministic ordering structs;
- each ``most_frequent`` column adds one ``groupBy(cluster, value)`` count
  plus a ``min_by`` re-aggregation (the classic two-level mode — both
  stages partial-aggregate map-side, so a Zipf-hot cluster ships its
  distinct values, not its rows);
- results re-join on the cluster key: every side is one-row-per-cluster,
  so AQE broadcasts or co-partitions them for free.

All rules break ties deterministically (the oracle replays them exactly):

- ``longest``   — max string length, then lowest ``key_col``
- ``most_frequent`` — highest count, then lowest value (nulls never
  survive unless the column is all-null in the cluster)
- ``max`` / ``min`` — plain null-ignoring extrema
- ``first``     — value at the lowest ``key_col``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES = ("longest", "most_frequent", "max", "min", "first")


def golden_records(
    df: DataFrame,
    cluster_col: str,
    key_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """One golden record per ``cluster_col`` group: ``cluster_col``,
    ``cluster_size``, and one surviving value per entry in ``rules``
    (column name preserved). ``rules`` maps column -> rule name (see
    RULES). ``key_col`` must be a total order over rows (a record id);
    it makes every rule a pure function of the cluster's row SET, so the
    output is partition- and run-invariant.
    """
    for c, r in rules.items():
        if r not in RULES:
            raise ValueError(f"unknown survivorship rule {r!r} for column {c!r}")

    aggs = [F.count(F.lit(1)).alias("cluster_size")]
    for c, r in rules.items():
        if r == "longest":
            # coalesce(length, -1): null strings lose to every non-null
            aggs.append(
                F.expr(
                    f"max_by({c}, struct(coalesce(length({c}), -1), -{key_col}))"
                ).alias(c)
            )
        elif r == "max":
            aggs.append(F.max(c).alias(c))
        elif r == "min":
            aggs.append(F.min(c).alias(c))
        elif r == "first":
            aggs.append(F.expr(f"min_by({c}, {key_col})").alias(c))
    out = df.groupBy(cluster_col).agg(*aggs)

    for c, r in rules.items():
        if r != "most_frequent":
            continue
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        mode = counts.groupBy(cluster_col).agg(
            F.expr(f"min_by({c}, struct(-_cnt, {c}))").alias(c)
        )
        # left join: an all-null column has no counts row -> null survives
        out = out.join(mode, cluster_col, "left")
    return out
