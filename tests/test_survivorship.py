"""Golden-record survivorship rules — determinism, ties, nulls, plan shape."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.cluster.survivorship import golden_records

ROWS = [
    # cluster 1: text lengths 5/7/7 (tie -> lower id), lang mode b (2 vs 1)
    (1, 10, "alpha", "a", 3),
    (1, 11, "beta-xx", "b", 9),
    (1, 12, "gamma-y", "b", 1),
    # cluster 2: singleton
    (2, 20, "solo", "fr", 4),
    # cluster 3: lang mode tie (a:1, b:1) -> lexicographically lower "a";
    # null text loses "longest" to any non-null
    (3, 30, None, "b", 7),
    (3, 31, "x", "a", 2),
]
SCHEMA = "cluster int, rid int, text string, lang string, score int"
RULES = {"text": "longest", "lang": "most_frequent", "score": "max"}


def _collect(df):
    return {r["cluster"]: r.asDict() for r in df.collect()}


def test_rules_and_tie_breaks(spark):
    out = _collect(golden_records(spark.createDataFrame(ROWS, SCHEMA), "cluster", "rid", RULES))
    assert out[1] == {"cluster": 1, "cluster_size": 3, "text": "beta-xx", "lang": "b", "score": 9}
    assert out[2] == {"cluster": 2, "cluster_size": 1, "text": "solo", "lang": "fr", "score": 4}
    assert out[3] == {"cluster": 3, "cluster_size": 2, "text": "x", "lang": "a", "score": 7}


def test_first_and_min_rules(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = _collect(golden_records(df, "cluster", "rid", {"lang": "first", "score": "min"}))
    assert out[1]["lang"] == "a" and out[1]["score"] == 1  # rid 10's lang, min score
    assert out[3]["lang"] == "b" and out[3]["score"] == 2  # rid 30 first


def test_all_null_mode_survives_null(spark):
    rows = [(1, 1, None), (1, 2, None), (2, 3, "x")]
    df = spark.createDataFrame(rows, "cluster int, rid int, lang string")
    out = _collect(golden_records(df, "cluster", "rid", {"lang": "most_frequent"}))
    assert out[1]["lang"] is None
    assert out[2]["lang"] == "x"


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS * 5, SCHEMA)
    a = sorted(golden_records(df.repartition(1), "cluster", "rid", RULES).collect())
    b = sorted(golden_records(df.repartition(13), "cluster", "rid", RULES).collect())
    assert a == b


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_records(df, "cluster", "rid", {"text": "best"})


def test_plan_is_aggregate_only_no_window(spark):
    """Every rule (incl. the two-level mode) must plan as aggregations with
    map-side partials — never a Window — the property that keeps a Zipf-hot
    cluster from serializing through one reducer. (max_by over a struct
    ordering is a SortAggregate by Spark's buffer rules — still a partial/
    merge pair, sorted per partition by group key, which is the acceptable
    shape; Window over the cluster would not be.)"""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        golden_records(df, "cluster", "rid", RULES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    # both aggregate stages keep partial (map-side) halves
    assert "partial_max_by" in plan or "partial" in plan, plan
