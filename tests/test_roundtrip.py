"""Serialization round-trip parity (reference tests/test_ann_kb.py:54-61 and
tests/test_cli.py:18-31): dumped and reloaded state answers get_candidates
identically; the model dir replaces cfg/kb/index/joblib/npz blobs
(candidate_generator.py:325-346) with tables."""

from spacy_ann_linker_spark.link.linker import kb_get_candidates
from spacy_ann_linker_spark.pipeline import LinkageModel


def test_model_roundtrip_preserves_candidates(spark, golden_model, tmp_path):
    path = str(tmp_path / "model")
    golden_model.save(path)
    reloaded = LinkageModel.load(spark, path)

    t = spark.createDataFrame(
        [("research",), ("researched",), ("ML",), ("Statistics",)], "text string"
    )
    want = sorted(
        map(tuple, kb_get_candidates(golden_model.cand, golden_model.kb, t).collect())
    )
    got = sorted(map(tuple, kb_get_candidates(reloaded.cand, reloaded.kb, t).collect()))
    assert got == want
    assert len(got) >= 4


def test_reloaded_model_links_flagship(spark, golden_model, tmp_path):
    from spacy_ann_linker_spark.mentions.extract import extract_mentions
    from spacy_ann_linker_spark.pipeline import link_transcripts

    path = str(tmp_path / "model2")
    golden_model.save(path)
    reloaded = LinkageModel.load(spark, path)
    turns = spark.createDataFrame(
        [("c1", 0, "user", "NLP is a highly researched subset of machine learning.", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    m = extract_mentions(turns, ["NLP", "researched", "machine learning"])
    links = link_transcripts(reloaded, turns, mentions=m, exact_fast_path=False)
    assert [r["entity_id"] for r in links.orderBy("start").collect()] == ["a3", "a15", "a1"]
