"""As-of (temporal) join — match each left row to the nearest right row at
or before (backward) / at or after (forward) its timestamp, per key.

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do; the oracle uses DuckDB's).
The naive translations both fail at scale: an inequality theta-join
degenerates to a per-key cross product, and a per-row "max ts <= t"
correlated subquery re-scans the build side per probe. The scale shape
used here is the UNION-SCAN: tag build and probe rows, sort each key
partition once by (time, tag), and carry the most recent build payload
forward with last(ignorenulls) over an unbounded-preceding running window
— ONE shuffle (the window's partitionBy(key)), linear scan per partition,
no join node at all. 10^12-row cost = a sort-merge on (key, time), the
same price as any keyed window; hot keys (a user with billions of events)
sort within one partition — the running last() is O(rows), never O(rows²).

Tie semantics are explicit: at equal timestamps the build row sorts before
the probe iff `inclusive` (so `t_left >= t_right` matches, DuckDB's ASOF
default); among equal build timestamps the LAST row in (time, tie_col)
order wins — pass `tie_col` (e.g. an event id) to pin cross-engine
determinism instead of inheriting partition order.

`tolerance` (seconds) nulls out matches farther than the bound — the
pandas merge_asof knob; rows keep their left payload (left-join
semantics), only the matched columns drop to null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    direction: str = "backward",
    inclusive: bool = True,
    tolerance: float | None = None,
    tie_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """left.* + right's non-key columns suffixed (`right_time` becomes
    e.g. `ts_r`); unmatched left rows keep nulls in the right columns.
    Left rows with a NULL timestamp never match (they sort to the edge of
    the scan); right rows with NULL timestamps are dropped from the build
    side. direction: "backward" (nearest right at/before) or "forward"
    (nearest right at/after)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    right_payload = [c for c in right.columns if c not in keys]
    l2 = left.select(
        *keys,
        F.col(left_time).cast("timestamp").alias("_t"),
        F.struct(*left.columns).alias("_l"),
    ).withColumn("_r", F.lit(None).cast("string"))  # placeholder, fixed below
    r_struct = F.struct(*right_payload).alias("_rs")
    r2 = (
        right.filter(F.col(right_time).isNotNull())
        .select(*keys, F.col(right_time).cast("timestamp").alias("_t"), r_struct)
    )
    # rebuild the left placeholder with the right struct's real type
    l2 = l2.drop("_r").withColumn(
        "_rs", F.lit(None).cast(r2.schema["_rs"].dataType)
    )
    l2 = l2.withColumn("_tag", F.lit(1))
    r2 = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType)).withColumn(
        "_tag", F.lit(0) if inclusive else F.lit(2)
    )
    u = l2.select(*keys, "_t", "_l", "_rs", "_tag").unionByName(
        r2.select(*keys, "_t", "_l", "_rs", "_tag")
    )

    t_order = F.col("_t").asc_nulls_first() if direction == "backward" else F.col(
        "_t"
    ).desc_nulls_first()
    order = [t_order, F.col("_tag").asc()]
    if tie_col is not None:
        # among builds at equal (t, tag) the LAST in tie order wins (max
        # tie_col, both directions) — tie sorts AFTER tag so it never
        # reorders builds relative to probes
        order.append(F.col("_rs")[tie_col].asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_rs", ignorenulls=True).over(w))
        .withColumn("_mt", F.last(F.when(F.col("_tag") != 1, F.col("_t")), ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance is not None:
        gap = (
            F.unix_micros("_t") - F.unix_micros("_mt")
            if direction == "backward"
            else F.unix_micros("_mt") - F.unix_micros("_t")
        )
        ok = F.col("_mt").isNotNull() & (gap <= F.lit(int(tolerance * 1_000_000)))
        matched = matched.withColumn("_m", F.when(ok, F.col("_m")))
    out_cols = [F.col("_l")[c].alias(c) for c in matched.select("_l.*").columns]
    out_cols += [
        F.col("_m")[c].alias(c + suffix if c in set(left.columns) else c)
        for c in right_payload
    ]
    return matched.select(*out_cols)
