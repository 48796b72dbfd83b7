"""API document projection — the batch replacement for the reference's REST
surface (SURVEY.md S9/S10, F9; api/types.py:20-40).

The reference ships linked spans over HTTP as
`LinkingRecord {spans: [{text,start,end,label,id?}], context}` inside a
`LinkingResponse {documents}` (api/app.py:37-79). At cluster scale the
network boundary disappears (the KB-too-big-for-memory motivation at
remote_ann_linker.py:21-23 is exactly what the distributed join solves), but
the *document shape* remains the interchange format — this module projects
the links table into it, one row per (conv_id, turn_idx) document with the
nested span array, writable as JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spans_to_json(mentions: DataFrame) -> DataFrame:
    """F9 `_ents_to_json` (remote_ann_linker.py:56-71): per turn, the ordered
    span array [{text, start, end, label}] — golden at
    tests/test_remote_ann_linker.py:29-33."""
    return (
        mentions.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("start", "end", "text", "label"))
            ).alias("_s")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["text"].alias("text"),
                    s["start"].alias("start"),
                    s["end"].alias("end"),
                    s["label"].alias("label"),
                ),
            ).alias("spans"),
        )
    )


def to_linking_response(links: DataFrame, turns: DataFrame) -> DataFrame:
    """LinkingResponse documents: (conv_id, turn_idx, context, spans) where
    each span carries the linked KB `id` (api/app.py:71-77: span id +
    alias/kb candidates copied onto the response)."""
    spans = (
        links.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("start", "end", "text", "label", F.col("entity_id").alias("id"))
                )
            ).alias("_s")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["text"].alias("text"),
                    s["start"].alias("start"),
                    s["end"].alias("end"),
                    s["label"].alias("label"),
                    s["id"].alias("id"),
                ),
            ).alias("spans"),
        )
    )
    return turns.select(
        "conv_id", "turn_idx", F.col("text").alias("context")
    ).join(spans, ["conv_id", "turn_idx"], "inner")
