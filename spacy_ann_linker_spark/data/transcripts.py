"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Input table per BASELINE.json input_hint:
    (conv_id string, turn_idx int32, role string, text string, tool string,
     ts timestamp)

Every turn is a PURE FUNCTION of (seed, global turn number): generation is
partitioning-independent, reproducible at any scale, and runs as an
Arrow-batched UDF over `spark.range` — the datagen itself is a distributed
job (no driver-side loops), so the same code fills a pytest fixture at 10^3
turns and a bench table at 10^8.

Each turn embeds at most one KB mention: the generator picks a gold entity
(zipf-skewed — hot aliases like "ML" dominate, exactly the skew the salted
blocking path must survive), an alias surface form (verbatim / case-mangled /
edit-distance-1-2 typo), and surrounds it with words drawn from the gold
entity's own description (so context disambiguation has signal, as real
transcripts about an entity use its vocabulary). The label table records
(conv_id, turn_idx, mention text, char span, gold entity, block_key) — it
plays the role of the upstream NER (the reference receives `doc.ents` from
an EntityRuler, tests/test_ann_linker.py:7-13) and of the labeled-pair F1
eval set (FIXTURES.md §5).

Per-turn text equality under stable (conv_id, turn_idx) ordering is the
BASELINE.json per-row invariant: `turn_record(seed, gid)` is the oracle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from spacy_ann_linker_spark.schemas import TRANSCRIPT_SCHEMA

TURNS_PER_CONV = 8
_EPOCH = pd.Timestamp("2025-01-01 00:00:00")

_FILLER = (
    "please can you tell me more about the topic we discussed yesterday and "
    "also summarize what the main points were for the report I am writing"
).split()


def _load_kb_data() -> tuple[list[dict], dict[str, str]]:
    """(alias records, entity id -> description) from the golden KB data
    (zip-safe package-resource read)."""
    from spacy_ann_linker_spark.data.golden_kb import read_resource_jsonl

    aliases = read_resource_jsonl("golden_aliases.jsonl")
    descs = {r["id"]: r.get("description", "") for r in read_resource_jsonl("golden_entities.jsonl")}
    return aliases, descs


_ALIASES, _DESCS = _load_kb_data()
# one (alias, entity) choice per alias record entity
_PAIRS: list[tuple[str, str]] = [(a["alias"], e) for a in _ALIASES for e in a["entities"]]
_DESC_WORDS: dict[str, list[str]] = {
    eid: [w for w in d.lower().split() if w.isalpha() and len(w) > 2][:40] or ["topic"]
    for eid, d in _DESCS.items()
}


def _rng(seed: int, gid: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{gid}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def _typo(word: str, rng: np.random.Generator) -> str:
    """1-2 char edits; never touches the first character (keeps the mention
    recognizably the same token for labeling)."""
    s = list(word)
    for _ in range(int(rng.integers(1, 3))):
        if len(s) < 3:
            break
        i = int(rng.integers(1, len(s)))
        op = int(rng.integers(0, 3))
        if op == 0:
            del s[i]
        elif op == 1:
            s.insert(i, chr(ord("a") + int(rng.integers(0, 26))))
        else:
            s[i] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(s)


def turn_record(seed: int, gid: int) -> dict:
    """The per-turn oracle: one fully deterministic record for global id."""
    conv = gid // TURNS_PER_CONV
    turn = gid % TURNS_PER_CONV
    rng = _rng(seed, gid)

    role = "user" if turn % 2 == 0 else "assistant"
    tool = "search" if (role == "assistant" and turn % 4 == 3) else ""

    # zipf-skewed gold pair choice: pair rank ~ zipf(1.3) -> hot aliases
    has_mention = rng.random() >= 0.05
    mention = gold_entity = block_key = None
    start = end = -1

    # context + mention assembly
    if has_mention:
        rank = min(int(rng.zipf(1.3)) - 1, len(_PAIRS) - 1)
        alias, gold_entity = _PAIRS[rank]
        words = _DESC_WORDS[gold_entity]
        lead = " ".join(
            words[int(rng.integers(0, len(words)))] for _ in range(int(rng.integers(2, 6)))
        )
        trail = " ".join(
            words[int(rng.integers(0, len(words)))] for _ in range(int(rng.integers(2, 6)))
        )
        form = rng.random()
        mention = alias
        if len(alias) >= 4:  # never perturb short aliases (bypass is exact)
            if form < 0.15:
                mention = alias.lower() if form < 0.08 else alias.upper()
            elif form < 0.35:
                mention = " ".join(
                    _typo(w, rng) if len(w) >= 4 else w for w in alias.split()
                )
        text = f"{lead} {mention} {trail}"
        start = len(lead) + 1
        end = start + len(mention)
        block_key = alias.lower()
    else:
        text = " ".join(
            _FILLER[int(rng.integers(0, len(_FILLER)))] for _ in range(int(rng.integers(4, 10)))
        )

    return {
        "conv_id": f"c{conv:08d}",
        "turn_idx": turn,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": _EPOCH + pd.Timedelta(seconds=conv * 3600 + turn * 20),
        "mention": mention,
        "start": start,
        "end": end,
        "gold_entity": gold_entity,
        "block_key": block_key,
    }


_FULL_COLS = [
    "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "mention", "start", "end", "gold_entity", "block_key",
]

_FULL_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, mention string, start int, end int, gold_entity string, "
    "block_key string"
)


def generate_full(spark: SparkSession, n_turns: int, seed: int = 42) -> DataFrame:
    """Distributed generation of transcripts + labels in one table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [turn_record(seed, int(g)) for g in pdf["id"]]
            yield pd.DataFrame(rows, columns=_FULL_COLS)

    return spark.range(n_turns).mapInPandas(gen, schema=_FULL_SCHEMA)


def generate_transcripts(spark: SparkSession, n_turns: int, seed: int = 42) -> DataFrame:
    df = generate_full(spark, n_turns, seed)
    return df.select(*TRANSCRIPT_SCHEMA.fieldNames())


def generate_labels(spark: SparkSession, n_turns: int, seed: int = 42) -> DataFrame:
    """Gold mentions = the upstream-NER stand-in + F1 eval labels."""
    full = generate_full(spark, n_turns, seed)
    return full.filter(full.mention.isNotNull()).select(
        "conv_id", "turn_idx", "mention", "start", "end", "gold_entity", "block_key"
    )
