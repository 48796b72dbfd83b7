"""link/cascade.py: waterfall rule-cascade linkage."""

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.link.cascade import cascade_link


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "555-0001", "NY"),  # tier-0 phone match -> 11
            (2, None, "CA"),        # null tier-0 key -> falls to state tier
            (3, "555-9999", "TX"),  # phone misses, state matches 13 and 14
            (4, "555-0004", "ZZ"),  # nothing matches
        ],
        "id_a int, phone string, state string",
    )
    right = spark.createDataFrame(
        [
            (11, "555-0001", "NY"),
            (12, "555-0002", "CA"),
            (14, "555-0003", "TX"),
            (13, "555-0005", "TX"),
        ],
        "id_b int, phone string, state string",
    )
    tiers = [
        ("phone", F.col("phone"), F.col("phone")),
        ("state", F.col("state"), F.col("state")),
    ]
    return left, right, tiers


def test_first_match_wins_with_provenance_and_tie_break(spark):
    left, right, tiers = _fixture(spark)
    got = {
        r["id_a"]: (r["id_b"], r["tier"])
        for r in cascade_link(left, right, tiers).collect()
    }
    # 1 matches at tier 0 even though its state also matches tier 1
    assert got[1] == (11, "phone")
    # 2's NULL phone key skips tier 0 entirely
    assert got[2] == (12, "state")
    # 3 matches two TX rights at tier 1 -> smallest id_b wins
    assert got[3] == (13, "state")
    # 4 matched nothing and best_only drops it
    assert 4 not in got


def test_keep_unmatched_emits_null_row(spark):
    left, right, tiers = _fixture(spark)
    got = {
        r["id_a"]: (r["id_b"], r["tier"])
        for r in cascade_link(left, right, tiers, keep_unmatched=True).collect()
    }
    assert got[4] == (None, None)
    assert len(got) == 4


def test_exclude_self_skips_identity_pairs(spark):
    recs = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k3")], "rid int, key string"
    )
    tiers = [("key", F.col("key"), F.col("key"))]
    left = recs.select(F.col("rid").alias("id_a"), "key")
    right = recs.select(F.col("rid").alias("id_b"), "key")
    with_self = {
        r["id_a"]: r["id_b"] for r in cascade_link(left, right, tiers).collect()
    }
    no_self = {
        r["id_a"]: r["id_b"]
        for r in cascade_link(left, right, tiers, exclude_self=True).collect()
    }
    assert with_self == {1: 1, 2: 1, 3: 3}  # smallest id_b wins (self for 1, 3)
    assert no_self == {1: 2, 2: 1}  # 3 has no non-self match


def test_empty_tiers_raises(spark):
    left, right, _ = _fixture(spark)
    with pytest.raises(ValueError):
        cascade_link(left, right, [])


def test_tier_order_is_priority_not_match_quality(spark):
    """Reversing the tier list must flip which rule wins for a record
    that matches both — the cascade is ORDER-defined, not score-defined."""
    left, right, tiers = _fixture(spark)
    got = {
        r["id_a"]: r["tier"]
        for r in cascade_link(left, right, list(reversed(tiers))).collect()
    }
    assert got[1] == "state"
