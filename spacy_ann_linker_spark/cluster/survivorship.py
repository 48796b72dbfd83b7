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

from functools import reduce

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

    mf = [c for c, r in rules.items() if r == "most_frequent"]
    if mf:
        # ALL most_frequent columns share ONE pass over df: each input row
        # explodes into one narrow struct per mf column (only that
        # column's slot non-null), one groupBy((cluster, col-slot, value))
        # counts every (column, value) jointly, and one min_by per
        # (cluster, column) picks the modes — the per-column loop scanned
        # the (possibly cluster-assignment-joined) input once more for
        # EVERY most_frequent column and paid two exchanges + one join
        # each. Ordering stays per-column exact: within a _ci group the
        # other value slots are constant NULL, so the struct comparison
        # reduces to (-count, value) — highest count, then lowest value;
        # min_by ignores rows whose ordering key is NULL (other columns'
        # rows), and an all-null column contributes no rows, so its mode
        # stays NULL through the left join exactly as before.
        def slot(i: int, j: int, c: str):
            v = F.col(c) if j == i else F.lit(None).cast(df.schema[mf[j]].dataType)
            return v.alias(f"_v{j}")

        stacked = (
            df.select(
                cluster_col,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("_ci"),
                                *[slot(i, j, c) for j in range(len(mf))],
                            )
                            for i, c in enumerate(mf)
                        ]
                    )
                ).alias("_s"),
            )
            .select(cluster_col, "_s.*")
            .filter(
                reduce(
                    lambda a, b: a | b,
                    [F.col(f"_v{j}").isNotNull() for j in range(len(mf))],
                )
            )
        )
        counts = stacked.groupBy(cluster_col, "_ci", *[f"_v{j}" for j in range(len(mf))]).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        modes = counts.groupBy(cluster_col).agg(
            *[
                F.min_by(
                    F.col(f"_v{i}"),
                    F.when(
                        F.col("_ci") == i,
                        F.struct((-F.col("_cnt")).alias("_nc"), F.col(f"_v{i}").alias("_tv")),
                    ),
                ).alias(c)
                for i, c in enumerate(mf)
            ]
        )
        # left join: an all-null column has no counts row -> null survives
        out = out.join(modes, cluster_col, "left")
    return out
