"""Salted join — defusing hot-key skew (north_rule: "blocks with salted keys
to defuse hot-alias skew").

A mention string like "ML" can appear in billions of turns; a plain
equi-join on mention text sends every one of them to a single reducer. When
the small side can't be broadcast, salting splits each hot key into
`salt_buckets` sub-keys: the big side picks a deterministic bucket per row,
the small side replicates into all buckets. Result set is identical to the
plain join (verified in tests); max reducer load drops by ~salt_buckets.

AQE's skew-join handles sort-merge skew adaptively; this explicit form is
for the cases AQE can't re-plan (e.g. when the skew is in a groupBy, or
under static planning) and as the documented knob for 10^12-turn runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join big⋈small on `key` with the big side salted.

    salt_source: column(s) of `big` that vary within a hot key (defaults to
    all of big's columns) — hashed to pick the bucket deterministically, so
    the join is reproducible run to run (no rand())."""
    src_cols = [salt_source] if salt_source else big.columns
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*src_cols), F.lit(salt_buckets)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_count_by_key(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase (partial -> final) count per key with explicit salting —
    the groupBy analog: first aggregate per (key, salt), then per key.
    Identical result to groupBy(key).count(); max partition load bounded."""
    return (
        df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("count"))
    )
