"""Sessionization + generic window/top-k operators over the events table
(TESTDATA.md). Pure window functions — the lag/cumsum gap-sessionization
pattern from the public Spark playbook."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a session breaks when the gap to the previous
    event of the same user exceeds gap_minutes (STRICTLY greater — an event
    exactly gap_minutes after the previous one stays in the session; note
    `session_windows` below inherits Spark's native >= break, so the two
    split boundary-gap events differently).
    -> events + (session_seq int) where session_seq is 1-based per user."""
    # parquet NTZ timestamps don't cast straight to long; go via TIMESTAMP
    # (session TZ pinned UTC so this equals epoch seconds)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = sec - F.lag(sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: event count, duration seconds, total value."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(sec) - F.min(sec)).alias("duration_sec"),
        F.sum("value").alias("total_value"),
    )


def topk_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str
) -> DataFrame:
    """T1 generalized: row_number <= k per group, deterministic tie-break."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def session_windows(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Gap sessions via Spark's native `session_window` — the
    streaming-capable form of `sessionize`: under Structured Streaming the
    same expression runs with a watermark as a stateful session aggregation
    (no per-user sort window, which streaming cannot do). Batch semantics:
    events of one user merge while each is < gap from the session's end; a
    gap >= gap_minutes starts a new session; session_end = last event +
    gap.
    -> (user, session_start, session_end, n_events, total_value)"""
    sw = F.session_window(F.col(ts_col).cast("timestamp"), f"{gap_minutes} minutes")
    return (
        events.groupBy(F.col(user_col), sw.alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def context_window(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    text_col: str,
    n_prev: int = 2,
    joiner: str = " ",
) -> DataFrame:
    """Sliding conversational context: for every row, the previous `n_prev`
    texts of the same key (conversation / session / user) in event order,
    concatenated — the standard pre-processing that turns a per-turn linker
    into a multi-turn one (the reference links against the sentence the
    mention sits in, spacy_ann ann_linker.py; at transcript scale the
    disambiguation context is the preceding turns, assembled here and fed
    to the same context-embedding stage via link_transcripts' mentions=
    hook).

    Plan shape: ONE window partitioned by key with a bounded row frame
    [-n_prev, -1] — state per partition is the conversation's rows, frame
    cost O(n_prev) per row; no joins, no explode. The first rows of each
    key get the shorter natural prefix ('' for the very first). Ties in
    `order_cols` must be broken by the caller (pass a unique id last) —
    frame semantics under duplicate sort keys are otherwise
    engine-dependent. -> input columns + prev_context + context
    (prev_context `joiner` text; just text when prev is empty)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-n_prev, -1)
    )
    prev = F.array_join(F.collect_list(F.col(text_col)).over(w), joiner)
    return df.withColumn("prev_context", prev).withColumn(
        "context",
        F.when(F.col("prev_context") == "", F.col(text_col)).otherwise(
            F.concat_ws(joiner, F.col("prev_context"), F.col(text_col))
        ),
    )
