"""Type-2 slowly-changing-dimension history — entity attribute timelines.

The ER-pipeline use case: after linkage assigns records to entities, the
entity's ATTRIBUTES still change over time (a user's segment, a customer's
address, an agent's active tool). SCD2 is the canonical warehouse encoding
of that history: one row per (key, unbroken run of identical attribute
values) with a validity interval — the temporal companion to
cluster/survivorship.py's point-in-time golden record, and the table shape
`operators/asof.py` joins against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Collapse an event/snapshot stream into SCD2 validity intervals:
    per key ordered by (ts, tie), consecutive rows whose TRACKED attributes
    are all unchanged merge into one interval row

        (key, attrs..., valid_from, valid_to, n_events, is_current)

    valid_from = first ts of the run; valid_to = the NEXT run's valid_from
    (half-open intervals — the asof_join/interval_join convention), NULL on
    the current run; is_current marks it. Attribute comparison is
    NULL-SAFE (NULL -> NULL is "unchanged"; NULL -> value is a change), and
    `tie_col` pins the order of equal-timestamp events so the island
    boundaries are a pure function of the data (cross-engine identical).

    Plan shape: gaps-and-islands — ONE window partitioned by key (lag over
    the tracked attrs + running island sum), one map-side-combined
    groupBy((key, island)), one more key-partitioned lead() for valid_to.
    Every window partitions by key: a key's history sorts within its
    partition only, never globally; 10^10 events cost two key-local sorts
    and one aggregation."""
    return _scd2_runs(df, key_col, ts_col, attr_cols, tie_col, None)


def _scd2_runs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None,
    weight_col: str | None,
) -> DataFrame:
    """Island pass shared by scd2_history and scd2_merge; weight_col lets a
    SEED row stand in for a whole prior run (n_events = sum of weights)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc_nulls_first()] if tie_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    flagged = df.withColumn(
        "_new",
        # first-row test via lag of a CONSTANT: lag(ts) IS NULL would also
        # fire on the row AFTER a NULL-timestamp event and split an
        # unchanged run
        F.when(F.lag(F.lit(1)).over(w).isNull() | changed, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    n_events = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col).cast("bigint")
    )
    runs = flagged.groupBy(key_col, "_isl").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(ts_col).alias("valid_from"),
        n_events.alias("n_events"),
    )
    # order by (valid_from, island): two ADJACENT runs can share a
    # timestamp when equal-ts events carry different attrs — the island
    # counter is monotone in event order and breaks the tie exactly
    w_runs = Window.partitionBy(key_col).orderBy(
        F.col("valid_from").asc(), F.col("_isl").asc()
    )
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_isl")
    )


def scd2_merge(
    history: DataFrame,
    new_events: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Fold a NEW event batch into an existing SCD2 history WITHOUT
    replaying it — the production append loop (the incremental_components
    discipline applied to timelines): yesterday's 10^10-interval table is
    an artifact; today's batch must cost O(batch).

    Contract (append-only, STRICT): each key's new events arrive at
    (ts, tie) >= that key's LAST ALREADY-MERGED event — not merely inside
    the current interval. The seed row collapses the current run to its
    valid_from, so a batch event that interleaves BETWEEN two prior events
    of the run (or ties with one at the same ts with a smaller tie) cannot
    reproduce the rebuild's run splits. A global time cut, a per-key
    high-watermark, or monotone event ids all satisfy this; anything
    earlier belongs to a history rebuild. Out-of-order WITHIN the batch is
    fine (the tie column pins equal timestamps). Merge == rebuild is both
    property-tested and driver-gate-checked against the full-recompute
    oracle under this contract.

    Shape: keys untouched by the batch pass through with zero window work
    (one anti-join scan). For touched keys, only the CURRENT interval
    re-enters the island pass — as a single SEED row carrying its
    valid_from, attributes and n_events as weight, so an unchanged-attr
    first event EXTENDS the current run (same valid_from, n_events
    accumulates) and a changed one closes it at exactly the new event's
    ts. Closed historical intervals of touched keys are immutable and
    union through. Equality with a full scd2_history recompute over
    (implied old events ∪ batch) is property-tested.
    -> same schema as scd2_history."""
    touched = new_events.select(F.col(key_col)).distinct()
    untouched = history.join(touched, key_col, "left_anti")
    # ONE semi-join, filter-split into immutable closed rows vs the current
    # row that seeds the island pass (two filters over the same subtree —
    # history is a columnar artifact table, rescans are scans, not shuffles)
    touched_hist = history.join(touched, key_col, "left_semi")
    closed = touched_hist.filter(~F.col("is_current"))
    cur = touched_hist.filter(F.col("is_current"))

    w1 = F.lit(1).alias("_w")
    batch = new_events.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(a) for a in attr_cols],
        *( [F.col(tie_col)] if tie_col else [] ),
        w1,
    )
    seed = cur.select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        *[F.col(a) for a in attr_cols],
        # NULL tie sorts FIRST (asc_nulls_first): at an exactly-equal
        # timestamp the seed row stays the run opener
        *( [F.lit(None).cast(batch.schema[tie_col].dataType).alias(tie_col)]
           if tie_col else [] ),
        F.col("n_events").alias("_w"),
    )
    recomputed = _scd2_runs(
        seed.unionByName(batch), key_col, ts_col, attr_cols, tie_col, "_w"
    )
    return untouched.unionByName(closed).unionByName(recomputed)
