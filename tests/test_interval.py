"""interval_join: bucketized range join (operators/interval.py) — results
must be invariant to the granularity knob and match a brute-force reference."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.operators.interval import interval_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _points(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(rows)],
        "k int, ts timestamp, point_id int",
    )


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(s), _ts(e), i) for i, (k, s, e) in enumerate(rows)],
        "k int, start_ts timestamp, end_ts timestamp, iv_id int",
    )


def test_hand_case_bounds_and_multiplicity(spark):
    pts = _points(spark, [(1, 5), (1, 10), (1, 20), (2, 5)])
    ivs = _intervals(spark, [(1, 0, 10), (1, 8, 30), (1, 21, 22), (2, 100, 200)])
    got = {
        (r["point_id"], r["iv_id"])
        for r in interval_join(pts, ivs, on="k", granularity_s=7).collect()
    }
    # point@5 in [0,10]; point@10 in [0,10] (inclusive end) AND [8,30];
    # point@20 in [8,30]; key-2 point matches nothing
    assert got == {(0, 0), (1, 0), (1, 1), (2, 1)}

    excl = {
        (r["point_id"], r["iv_id"])
        for r in interval_join(
            pts, ivs, on="k", granularity_s=7, inclusive_end=False
        ).collect()
    }
    assert excl == {(0, 0), (1, 1), (2, 1)}


def test_granularity_invariance_and_exactly_once(spark):
    """The bucket width must never change the result set, and a pair whose
    interval spans MANY buckets still appears exactly once."""
    pts = _points(spark, [(1, 50)])
    ivs = _intervals(spark, [(1, 0, 1000)])
    for g in (1, 7, 3600):
        rows = interval_join(pts, ivs, on="k", granularity_s=g).collect()
        assert len(rows) == 1, f"g={g}"


def test_inverted_and_null_intervals_dropped(spark):
    pts = _points(spark, [(1, 5)])
    ivs = spark.createDataFrame(
        [(1, _ts(10), _ts(0), 0), (1, None, _ts(10), 1), (1, _ts(0), None, 2)],
        "k int, start_ts timestamp, end_ts timestamp, iv_id int",
    )
    assert interval_join(pts, ivs, on="k").count() == 0


def test_keyless_join_and_name_suffix(spark):
    pts = _points(spark, [(1, 5), (2, 5)])
    ivs = _intervals(spark, [(9, 0, 10)])
    out = interval_join(pts, ivs)  # no key: pure containment
    assert out.count() == 2
    assert "k_i" in out.columns  # intervals' colliding 'k' suffixed


def test_random_parity_with_brute_force(spark):
    import random

    rng = random.Random(47)
    prows = [(rng.randrange(4), rng.randrange(500)) for _ in range(150)]
    irows = []
    for _ in range(60):
        s = rng.randrange(500)
        irows.append((rng.randrange(4), s, s + rng.randrange(0, 120)))
    want = {
        (pid, iid)
        for pid, (pk, t) in enumerate(prows)
        for iid, (ik, s, e) in enumerate(irows)
        if pk == ik and s <= t <= e
    }
    got = {
        (r["point_id"], r["iv_id"])
        for r in interval_join(
            _points(spark, prows), _intervals(spark, irows), on="k", granularity_s=13
        ).collect()
    }
    assert got == want


def test_plan_is_hash_join_not_nested_loop(spark):
    """The reason this operator exists: the bucketed form must plan as an
    equi-join (SortMerge/Hash), never BroadcastNestedLoop/Cartesian."""
    pts = _points(spark, [(1, 5)])
    ivs = _intervals(spark, [(1, 0, 10)])
    plan = interval_join(pts, ivs, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
