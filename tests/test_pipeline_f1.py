"""End-to-end pairwise F1 at shared blocking key (BASELINE.json: >= 0.99 on
labeled pairs). Gold mention spans play the upstream NER (the reference's
EntityRuler supplies doc.ents, tests/test_ann_linker.py:7-13)."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.data.transcripts import generate_labels, generate_transcripts
from spacy_ann_linker_spark.evaluate import pairwise_f1
from spacy_ann_linker_spark.pipeline import cluster_links, link_transcripts

N_TURNS = 1500


@pytest.fixture(scope="module")
def linked(spark):
    # production config: min_df=1 (rich vectors — the reference's min_df=2
    # default collapses the 18-alias toy corpus) + Jaro-Winkler typo rescue
    from spacy_ann_linker_spark.pipeline import build_golden_model

    model = build_golden_model(spark, min_df=1)
    turns = generate_transcripts(spark, N_TURNS)
    labels = generate_labels(spark, N_TURNS).cache()
    mentions = labels.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"),
        F.col("mention").alias("text"),
        "start",
        "end",
        F.lit(None).cast("string").alias("label"),
    )
    links = link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True).cache()
    return links, labels


def test_pairwise_f1_target(linked):
    links, labels = linked
    m = pairwise_f1(links, labels)
    # BASELINE.json target: pairwise F1 >= 0.99 at shared blocking key
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m


def test_f1_holds_at_alternate_seed(spark):
    """F1 is a property of the pipeline, not of seed 42: regenerate with a
    different seed and re-check (precision 1.0, F1 ~0.995 measured at seeds
    7 and 123)."""
    from spacy_ann_linker_spark.data.transcripts import generate_full
    from spacy_ann_linker_spark.pipeline import build_golden_model

    model = build_golden_model(spark, min_df=1)
    full = generate_full(spark, 1200, seed=7).cache()
    turns = full.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    labels = full.filter(F.col("mention").isNotNull()).select(
        "conv_id", "turn_idx", "mention", "start", "end", "gold_entity", "block_key"
    )
    mentions = labels.select(
        "conv_id", "turn_idx",
        F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"),
        F.col("mention").alias("text"), "start", "end",
        F.lit(None).cast("string").alias("label"),
    )
    links = link_transcripts(model, turns, mentions=mentions, fuzzy_rescue=True)
    m = pairwise_f1(links, labels)
    assert m["f1"] >= 0.985, m


def test_clustering_links_mentions_of_same_entity(linked):
    links, _ = linked
    clusters = cluster_links(links)
    # every cluster containing an entity node groups all its mention surfaces
    ent_nodes = clusters.filter(F.col("node").startswith("e:"))
    per_comp = ent_nodes.groupBy("component").count().collect()
    # components exist and most have exactly one entity (mention surfaces
    # shared by two entities can merge clusters — rare by construction)
    assert len(per_comp) >= 10
    single = sum(1 for r in per_comp if r["count"] == 1)
    assert single / len(per_comp) >= 0.8
