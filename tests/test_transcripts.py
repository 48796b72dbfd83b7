"""Transcript generator invariants (BASELINE.json input_hint): per-turn text
equality under stable (conv_id, turn_idx) ordering — the pure function
`turn_record(seed, gid)` is the oracle, and generation must be independent of
partitioning/parallelism."""

from pyspark.sql import functions as F

from spacy_ann_linker_spark.data.transcripts import (
    TURNS_PER_CONV,
    generate_full,
    generate_labels,
    generate_transcripts,
    turn_record,
)


def test_schema_matches_input_hint(spark):
    df = generate_transcripts(spark, 16)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_per_turn_text_equality_vs_oracle(spark):
    rows = generate_transcripts(spark, 64).orderBy("conv_id", "turn_idx").collect()
    assert len(rows) == 64
    for i, r in enumerate(rows):
        want = turn_record(42, i)
        assert r["conv_id"] == want["conv_id"]
        assert r["turn_idx"] == want["turn_idx"]
        assert r["text"] == want["text"]
        assert r["role"] == want["role"]
        assert r["ts"] == want["ts"].to_pydatetime()


def test_partitioning_independent(spark):
    a = generate_transcripts(spark, 80).orderBy("conv_id", "turn_idx").collect()
    b = (
        generate_full(spark, 80)
        .repartition(13)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b


def test_label_spans_slice_text(spark):
    full = generate_full(spark, 200).filter(F.col("mention").isNotNull()).collect()
    assert len(full) > 100
    for r in full:
        assert r["text"][r["start"] : r["end"]] == r["mention"]


def test_labels_reference_kb_entities(spark):
    labels = generate_labels(spark, 200)
    ents = {r["gold_entity"] for r in labels.select("gold_entity").distinct().collect()}
    assert ents <= {f"a{i}" for i in range(1, 16)}


def test_zipf_skew_present(spark):
    counts = (
        generate_labels(spark, 2000)
        .groupBy("block_key")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    # hot head at least 5x the median block
    mid = counts[len(counts) // 2]["count"]
    assert counts[0]["count"] >= 5 * mid


def test_turns_per_conv(spark):
    df = generate_transcripts(spark, 4 * TURNS_PER_CONV)
    per = df.groupBy("conv_id").count().collect()
    assert all(r["count"] == TURNS_PER_CONV for r in per)


def test_context_pooling_insensitive_to_tokenizer():
    """VERDICT r2 item 7: the engine pools context vectors over [a-z0-9']
    word runs; spaCy would emit punctuation as separate tokens with their
    own vectors. Pin the contract: on the 400-turn golden fixture the
    per-turn entity argmax (the disambiguation decision) is IDENTICAL under
    a spaCy-like punctuation-splitting tokenizer — pure numpy, no Spark."""
    import re

    import numpy as np

    from spacy_ann_linker_spark.data.golden_kb import read_resource_jsonl
    from spacy_ann_linker_spark.data.transcripts import turn_record
    from spacy_ann_linker_spark.data.word_vectors import DIM, token_vector, tokenize

    def spacy_like_tokens(text):
        out = []
        for chunk in text.lower().split():
            lead = []
            while chunk and not chunk[0].isalnum():
                lead.append(chunk[0])
                chunk = chunk[1:]
            trail = []
            while chunk and not chunk[-1].isalnum():
                trail.append(chunk[-1])
                chunk = chunk[:-1]
            out.extend(lead)
            if chunk:
                out.append(chunk)
            out.extend(reversed(trail))
        return out

    def pool(tokens):
        if not tokens:
            return np.zeros(DIM, dtype=np.float32)
        return np.mean([token_vector(t) for t in tokens], axis=0)

    ents = {}
    for r in read_resource_jsonl("golden_entities.jsonl"):
        ents.setdefault(r["id"], r)
    eids = sorted(ents)
    E = np.stack([pool(tokenize(ents[e].get("description") or "")) for e in eids])
    En = np.linalg.norm(E, axis=1)

    def argmax(v):
        s = E @ v / (En * (np.linalg.norm(v) + 1e-8) + 1e-8)
        return eids[int(np.argmax(s))]

    differing, flips, mention_turns = 0, 0, 0
    for g in range(400):
        r = turn_record(42, g)
        text = r["text"] or ""
        if spacy_like_tokens(text) != tokenize(text):
            differing += 1
        if r["mention"] is not None:
            mention_turns += 1
            if argmax(pool(tokenize(text))) != argmax(pool(spacy_like_tokens(text))):
                flips += 1
    assert differing > 0, "fixture must exercise the divergence"
    assert flips == 0, f"{flips}/{mention_turns} disambiguation decisions flipped"
