"""extras/dedup.py: duplicate_spans / strip_duplicate_spans (Lee et al.
2021 substring dedup at token k-gram granularity) and
overlap_containment_pairs (asymmetric near-superset detection)."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.extras.dedup import (
    duplicate_spans,
    ngram_jaccard_pairs,
    overlap_containment_pairs,
    strip_duplicate_spans,
)

BOILER = "subscribe to our newsletter for more updates today"  # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"alpha beta gamma {BOILER} delta epsilon"),
        (2, f"{BOILER} zeta eta theta iota kappa"),
        (3, "unique prose with no repeats whatsoever here at all"),
        (4, "x y z x y z x y z x y z x y z x y z"),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_spans_cover_shared_substring_exactly(spark, docs):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(docs, "doc_id", "text", k=5).collect()
    }
    # the 8-token boilerplate yields 8-5+1 = 4 dup 5-grams per occurrence;
    # doc 1 holds it at tokens 4..11, doc 2 at 1..8
    assert (1, 4, 11, 4) in got
    assert (2, 1, 8, 4) in got
    # doc 4 repeats "x y z" 6x: every 5-gram is duplicated -> one full span
    assert (4, 1, 18, 14) in got
    # docs 3 and 5 (unique / sub-k) contribute nothing
    assert {t[0] for t in got} == {1, 2, 4}


def test_guarantee_any_shared_k_token_run_is_covered(spark):
    # Lee et al. guarantee: a substring of >= k tokens appearing twice is
    # covered end-to-end (every inner k-window is a duplicated k-gram)
    shared = "one two three four five six seven"  # 7 tokens, k=5
    rows = [
        (10, f"prefix tokens here {shared} suffix stuff"),
        (20, f"{shared} completely different tail words"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicate_spans(df, "doc_id", "text", k=5).collect()
    }
    # doc 10: shared run occupies tokens 4..10; doc 20: tokens 1..7
    assert spans[10] == (4, 10)
    assert spans[20] == (1, 7)


def test_within_doc_repetition_counts_as_duplicate(spark):
    # the paper dedups verbatim self-repetition too (min_count counts
    # OCCURRENCES, not distinct docs)
    run = "a b c d e"
    df = spark.createDataFrame(
        [(1, f"{run} mid piece {run}")], "doc_id int, text string"
    )
    spans = duplicate_spans(df, "doc_id", "text", k=5).collect()
    assert {(r["span_start"], r["span_end"]) for r in spans} == {(1, 5), (8, 12)}


def test_sub_k_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id int, text string"
    )
    assert duplicate_spans(df, "doc_id", "text", k=5).count() == 0


def test_strip_removes_exactly_span_tokens(spark, docs):
    by = {r["doc_id"]: r for r in strip_duplicate_spans(docs, "doc_id", "text", k=5).collect()}
    assert by[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert by[2]["clean_text"] == "zeta eta theta iota kappa"
    assert by[1]["n_removed"] == 8 and by[2]["n_removed"] == 8
    # untouched docs come back verbatim (lowered tokens re-joined)
    assert by[3]["clean_text"] == "unique prose with no repeats whatsoever here at all"
    assert by[3]["n_removed"] == 0
    # all-duplicate doc survives as an empty row, not a dropped one
    assert by[4]["clean_text"] == "" and by[4]["n_removed"] == by[4]["n_tokens"] == 18
    assert by[5]["clean_text"] == "tiny doc" and by[5]["n_removed"] == 0


def test_spans_partition_invariant(spark, docs):
    base = sorted(map(tuple, duplicate_spans(docs, "doc_id", "text", k=5).collect()))
    for parts in (1, 7):
        got = sorted(
            map(tuple, duplicate_spans(docs.repartition(parts), "doc_id", "text", k=5).collect())
        )
        assert got == base


def test_containment_catches_near_superset_jaccard_misses(spark):
    snippet = "the quick brown fox jumps over the lazy dog near the river bank"
    long_doc = (
        "totally unrelated opening material with many extra words here "
        + snippet
        + " and then a very long tail of additional unrelated narrative "
        "content that keeps going with more and more filler words to "
        "dilute the jaccard union far below any useful threshold for "
        "detecting the quoted snippet inside this larger transcript"
    )
    df = spark.createDataFrame(
        [(1, snippet), (2, long_doc)], "doc_id int, text string"
    )
    cont = overlap_containment_pairs(df, "doc_id", "text", n=3, threshold=0.8).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id_a"], row["id_b"], row["contained_id"]) == (1, 2, 1)
    assert row["overlap"] > 0.95
    # Jaccard at the same threshold structurally misses the pair
    assert ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.8).count() == 0


def test_containment_tie_sizes_pick_lower_id(spark):
    df = spark.createDataFrame(
        [(7, "same exact words"), (9, "same exact words")], "doc_id int, text string"
    )
    row = overlap_containment_pairs(df, "doc_id", "text", threshold=0.5).collect()[0]
    assert (row["id_a"], row["id_b"], row["contained_id"]) == (7, 9, 7)
    assert row["overlap"] == pytest.approx(1.0)


def test_strip_spans_empty_and_whitespace_docs_remove_nothing(spark):
    # sequence(1, 0) defaults to step -1 and yields [1, 0]: without the
    # kept_idx guard an empty/whitespace-only doc grew two phantom kept
    # indices and reported n_removed = -2 (ADVICE r5)
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, ""), (3, "   ")], "doc_id int, text string"
    )
    by = {r["doc_id"]: r for r in strip_duplicate_spans(df, "doc_id", "text", k=2).collect()}
    assert (by[2]["n_tokens"], by[2]["n_removed"], by[2]["clean_text"]) == (0, 0, "")
    assert (by[3]["n_tokens"], by[3]["n_removed"], by[3]["clean_text"]) == (0, 0, "")
    for r in by.values():
        assert 0 <= r["n_removed"] <= r["n_tokens"]
