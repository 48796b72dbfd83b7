"""Structured-Streaming linking surface.

The reference's only streaming-ish operator is `RemoteAnnLinker.pipe` — a
generator minibatching docs (size 32) through an HTTP linker
(remote_ann_linker.py:92-120, SURVEY.md B1). Its Spark re-expression is a
streaming DataFrame flowing through the same mention-extraction UDF and a
stream-static broadcast join against the (static) alias->entity map: Arrow
batches play the role of the 32-doc minibatch, executors play the gunicorn
workers (cli/serve.py:52-57).

Streaming constraints shape the plan (documented, not worked around):
stateless stream-static equi-joins only — so the streaming path is the
exact-alias fast path (J5) against a pre-reduced alias->best-entity table
(window functions / top-k aren't available on unbounded streams; fuzzy
mentions fall through to the batch job). `entity_counts_windowed` is the
stateful path: watermark + event-time windows, late turns beyond the
watermark drop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacy_ann_linker_spark.kb.build import KnowledgeBase
from spacy_ann_linker_spark.mentions.extract import _compile, extract_mentions, find_spans
from spacy_ann_linker_spark.schemas import SPAN_STRUCT, TRANSCRIPT_SCHEMA


def alias_best_entity(kb: KnowledgeBase) -> DataFrame:
    """Static side for the stream join: alias -> its first entity (KB
    insertion order, the reference's tie-break) + prior. Materialized with
    localCheckpoint: the KB build lineage contains expressions (e.g.
    monotonically_increasing_id in entity dedup) that streaming plan
    validation rejects — and re-deriving the KB per micro-batch would be
    wasteful anyway. On a cluster this table is the committed kb_alias_map
    checkpoint, refreshed out-of-band."""
    return (
        kb.alias_map.filter(F.col("ent_pos") == 0)
        .select("alias", "entity_id", "prior")
        .localCheckpoint(eager=True)
    )


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def link_stream(stream: DataFrame, kb: KnowledgeBase, patterns: list[str]) -> DataFrame:
    """turns stream -> linked mentions stream (exact-alias path, stateless)."""
    mentions = extract_mentions(stream, patterns)
    best = alias_best_entity(kb)
    return mentions.join(F.broadcast(best), mentions.text == best["alias"], "inner").select(
        "conv_id", "turn_idx", "mention_id", "text", "start", "end", "entity_id", "prior"
    )


def conversation_state_stream(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-conversation progress (turns seen, highest turn_idx), updated every
    micro-batch. The arbitrary-state surface the reference lacks entirely
    (its only streaming analog is the stateless minibatch pipe,
    remote_ann_linker.py:92-120); a transcript engine needs conversation-
    level state that outlives a single micro-batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, n_turns long, last_turn_idx int"
    state_schema = "n_turns long, last_turn_idx int"

    def update(key, pdfs, state: GroupState):
        n, last = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            last = max(last, int(pdf["turn_idx"].max()))
        state.update((n, last))
        yield pd.DataFrame(
            [{"conv_id": key[0], "n_turns": n, "last_turn_idx": last}]
        )

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def entity_counts_windowed(
    stream: DataFrame,
    kb: KnowledgeBase,
    patterns: list[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window entity mention counts with watermark
    (append-mode capable; late turns beyond the watermark drop)."""

    @F.pandas_udf(T.ArrayType(SPAN_STRUCT))
    def spans_udf(texts: pd.Series) -> pd.Series:
        rx = _compile(patterns, False)
        return texts.map(lambda t: find_spans(t, rx, None))

    wm = stream.withWatermark("ts", watermark)
    exploded = wm.withColumn("_s", F.explode(spans_udf(F.col("text")))).select(
        "ts", F.col("_s.text").alias("mtext")
    )
    best = alias_best_entity(kb)
    linked = exploded.join(F.broadcast(best), exploded.mtext == best["alias"], "inner")
    return (
        linked.groupBy(F.window("ts", window).alias("w"), "entity_id")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(F.col("w.start").alias("window_start"), "entity_id", "n_mentions")
    )
