"""Reference test-suite parity goldens (SURVEY.md §5; FIXTURES.md §5):

  * tests/test_ann_linker.py:15-20 — "NLP is a highly researched subset of
    machine learning." with mentions [NLP, researched, machine learning]
    links to a3 / a15 / a1
  * tests/test_ann_kb.py:48-51 — get_candidates("research") -> a15 (exact
    path); get_candidates("researched") -> alias "Research" -> a15 (fuzzy)
"""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.link.linker import best_aliases
from spacy_ann_linker_spark.mentions.extract import extract_mentions
from spacy_ann_linker_spark.pipeline import link_transcripts

GOLDEN_SENTENCE = "NLP is a highly researched subset of machine learning."


@pytest.fixture(scope="module")
def golden_links(spark, golden_model):
    turns = spark.createDataFrame(
        [("c1", 0, "user", GOLDEN_SENTENCE, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    mentions = extract_mentions(turns, ["NLP", "researched", "machine learning"], label="SKILL")
    return (
        link_transcripts(golden_model, turns, mentions=mentions, exact_fast_path=False)
        .orderBy("start")
        .collect()
    )


def test_flagship_entities(golden_links):
    assert [r["entity_id"] for r in golden_links] == ["a3", "a15", "a1"]


def test_flagship_spans_and_aliases(golden_links):
    rows = {r["text"]: r for r in golden_links}
    assert rows["NLP"]["alias"] == "NLP" and rows["NLP"]["similarity"] == 1.0
    assert rows["researched"]["alias"] == "Research"
    assert rows["machine learning"]["alias"] == "Machine learning"
    # C7 char offsets slice the source text back to the mention
    for r in golden_links:
        assert GOLDEN_SENTENCE[r["start"] : r["end"]] == r["text"]


def test_exact_path_research(spark, golden_model):
    t = spark.createDataFrame([("research",)], "text string")
    rows = best_aliases(golden_model.cand, t, k=1, threshold=0.0).collect()
    assert rows[0]["alias"] == "Research"
    assert rows[0]["similarity"] == pytest.approx(1.0)
    ents = (
        golden_model.kb.alias_map.filter(F.col("alias") == "Research")
        .select("entity_id")
        .collect()
    )
    assert [e["entity_id"] for e in ents] == ["a15"]


def test_fuzzy_path_researched(spark, golden_model):
    t = spark.createDataFrame([("researched",)], "text string")
    rows = best_aliases(golden_model.cand, t, k=1, threshold=0.0).collect()
    assert rows[0]["alias"] == "Research"


def test_short_alias_bypass(spark, golden_model):
    from spacy_ann_linker_spark.candidates.generate import generate_candidates

    t = spark.createDataFrame([("ML",), ("OS",)], "text string")
    rows = generate_candidates(golden_model.cand, t, k=5).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r)
    # bypass is total: exactly one candidate, sim 1.0 (candidate_generator.py:257-259)
    assert len(by_text["ML"]) == 1 and by_text["ML"][0]["similarity"] == 1.0
    assert len(by_text["OS"]) == 1 and by_text["OS"][0]["alias"] == "OS"


def test_threshold_strict_greater(spark, golden_model):
    # a candidate at exactly the threshold must be dropped (ann_linker.py:82)
    t = spark.createDataFrame([("researched",)], "text string")
    rows = best_aliases(golden_model.cand, t, k=5, threshold=1.0).collect()
    assert rows == []


def test_uniform_priors(golden_model):
    rows = golden_model.kb.alias_map.filter(F.col("alias") == "ML").collect()
    assert sorted(r["entity_id"] for r in rows) == ["a1", "a2"]
    for r in rows:
        assert r["prior"] == pytest.approx(0.5)


def test_garbage_mention_no_links(spark, golden_model):
    turns = spark.createDataFrame(
        [("c1", 0, "user", "zzqqxv noise", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    mentions = spark.createDataFrame(
        [("c1", 0, 1, "zzqqxv", 0, 6, None)],
        "conv_id string, turn_idx int, mention_id long, text string, start int, end int, label string",
    )
    assert link_transcripts(golden_model, turns, mentions=mentions).count() == 0


def test_disambiguate_false_annotates_without_kb_id(spark, golden_model):
    """disambiguate=False: alias candidates annotated, no entity id set
    (ann_linker.py:99 branch)."""
    turns = spark.createDataFrame(
        [("c1", 0, "user", GOLDEN_SENTENCE, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    mentions = extract_mentions(turns, ["NLP", "machine learning"])
    out = link_transcripts(
        golden_model, turns, mentions=mentions, disambiguate=False, exact_fast_path=False
    ).collect()
    assert len(out) == 3  # NLP expands to 2 entity candidates... none chosen
    assert all(r["entity_id"] is None and r["context_similarity"] is None for r in out)
    assert {r["alias"] for r in out} == {"NLP", "Machine learning"}


def test_exact_fast_path_agrees_with_full_join(spark, golden_model):
    turns = spark.createDataFrame(
        [("c1", 0, "user", GOLDEN_SENTENCE, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    mentions = extract_mentions(turns, ["NLP", "researched", "machine learning"])
    a = link_transcripts(golden_model, turns, mentions=mentions, exact_fast_path=True)
    b = link_transcripts(golden_model, turns, mentions=mentions, exact_fast_path=False)
    ra = [(r["text"], r["alias"], r["entity_id"]) for r in a.orderBy("start").collect()]
    rb = [(r["text"], r["alias"], r["entity_id"]) for r in b.orderBy("start").collect()]
    assert ra == rb
