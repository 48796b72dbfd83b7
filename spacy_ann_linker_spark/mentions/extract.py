"""Mention extraction from transcript text.

The reference receives mentions from an upstream spaCy NER/EntityRuler
(`doc.ents`, ann_linker.py:17-21,76-77; tests build an EntityRuler with
verbatim string patterns, tests/test_ann_linker.py:7-13). This module is that
upstream stage for transcripts: a dictionary (gazetteer) matcher.

Semantics mirror EntityRuler's verbatim phrase match: case-sensitive,
word-boundary-anchored, leftmost-longest, non-overlapping (regex alternation
ordered longest-first). F8-F10/C7: char start/end offsets into the raw turn
text; spans are re-derivable via text[start:end] == mention (the reference's
char_span validity filter, api/app.py:64-66).

One Arrow-batched pandas UDF per partition; the compiled pattern is built
once per executor batch (for KBs with millions of aliases the scale path is
an Aho-Corasick automaton broadcast per executor — same UDF signature).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacy_ann_linker_spark.schemas import SPAN_STRUCT


def _compile(patterns: list[str], case_insensitive: bool) -> "re.Pattern":
    ordered = sorted(set(p for p in patterns if p), key=len, reverse=True)
    body = "|".join(re.escape(p) for p in ordered)
    flags = re.IGNORECASE if case_insensitive else 0
    return re.compile(rf"(?<!\w)(?:{body})(?!\w)", flags)


def find_spans(text: str, rx: "re.Pattern", label: str | None) -> list[dict]:
    if not text:
        return []
    return [
        {"text": m.group(0), "start": m.start(), "end": m.end(), "label": label}
        for m in rx.finditer(text)
    ]


def extract_mentions(
    turns: DataFrame,
    patterns: list[str],
    label: str | None = None,
    case_insensitive: bool = False,
) -> DataFrame:
    """turns (TRANSCRIPT_SCHEMA) -> mentions (MENTION_SCHEMA).

    mention_id = xxhash64(conv_id, turn_idx, start): deterministic and
    shuffle-free (no monotonically_increasing_id / zipWithIndex)."""

    @F.pandas_udf(T.ArrayType(SPAN_STRUCT))
    def spans_udf(texts: pd.Series) -> pd.Series:
        rx = _compile(patterns, case_insensitive)
        return texts.map(lambda t: find_spans(t, rx, label))

    return (
        turns.withColumn("_spans", spans_udf(F.col("text")))
        .select(
            "conv_id",
            "turn_idx",
            F.explode("_spans").alias("_s"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.xxhash64("conv_id", "turn_idx", F.col("_s.start")).alias("mention_id"),
            F.col("_s.text").alias("text"),
            F.col("_s.start").alias("start"),
            F.col("_s.end").alias("end"),
            F.col("_s.label").alias("label"),
        )
    )


def validate_spans(mentions: DataFrame, turns: DataFrame) -> DataFrame:
    """F10 span-reconstruction filter: keep mentions whose offsets slice the
    turn text back to the mention string (api/app.py:64-66)."""
    joined = mentions.join(
        turns.select("conv_id", "turn_idx", F.col("text").alias("_turn_text")),
        ["conv_id", "turn_idx"],
    )
    return joined.filter(
        F.expr("substring(_turn_text, start + 1, end - start)") == F.col("text")
    ).drop("_turn_text")
