"""Gazetteer mention extraction (F8-F10, C7)."""

from pyspark.sql import functions as F

from spacy_ann_linker_spark.mentions.extract import extract_mentions, validate_spans


def _turns(spark, text):
    return spark.createDataFrame(
        [("c1", 0, "user", text, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_basic_extraction(spark):
    t = _turns(spark, "I like NLP and machine learning a lot")
    rows = extract_mentions(t, ["NLP", "machine learning"]).orderBy("start").collect()
    assert [(r["text"], r["start"], r["end"]) for r in rows] == [
        ("NLP", 7, 10),
        ("machine learning", 15, 31),
    ]


def test_longest_match_wins(spark):
    t = _turns(spark, "machine learning rocks")
    rows = extract_mentions(t, ["machine", "machine learning"]).collect()
    assert [r["text"] for r in rows] == ["machine learning"]


def test_word_boundaries(spark):
    t = _turns(spark, "HTML is not ML but ML is ML")
    rows = extract_mentions(t, ["ML"]).collect()
    assert len(rows) == 3  # not the one inside HTML


def test_case_sensitive_default(spark):
    t = _turns(spark, "nlp is lowercase NLP is upper")
    rows = extract_mentions(t, ["NLP"]).collect()
    assert [r["start"] for r in rows] == [17]


def test_mention_ids_deterministic(spark):
    t = _turns(spark, "NLP and NLP again")
    a = extract_mentions(t, ["NLP"]).orderBy("start").collect()
    b = extract_mentions(t, ["NLP"]).orderBy("start").collect()
    assert [r["mention_id"] for r in a] == [r["mention_id"] for r in b]
    assert len({r["mention_id"] for r in a}) == 2


def test_validate_spans_filters_bad_offsets(spark):
    t = _turns(spark, "NLP here")
    good = extract_mentions(t, ["NLP"])
    bad = good.withColumn("start", F.col("start") + 1)
    assert validate_spans(good, t).count() == 1
    assert validate_spans(bad, t).count() == 0
