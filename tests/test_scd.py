"""scd2_history: gaps-and-islands SCD2 intervals vs a python reference."""

import datetime
import random

from pyspark.sql import functions as F

from spacy_ann_linker_spark.operators.scd import scd2_history


def _ts(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def _py_scd2(rows, attrs):
    """rows: (key, ts, tie, attr...); reference per key, (ts, tie) order."""
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (r[1], r[2]))
        runs = []
        for r in rs:
            vals = tuple(r[3:])
            if runs and runs[-1]["vals"] == vals:
                runs[-1]["n"] += 1
            else:
                runs.append({"vals": vals, "from": r[1], "n": 1})
        for i, run in enumerate(runs):
            nxt = runs[i + 1]["from"] if i + 1 < len(runs) else None
            out.append((k, *run["vals"], run["from"], nxt, run["n"], nxt is None))
    return set(out)


def test_scd2_matches_python_reference(spark):
    rng = random.Random(13)
    rows = []
    for i in range(400):
        rows.append(
            (
                rng.randrange(8),                       # key
                _ts(rng.randrange(200)),                # ts (collisions likely)
                i,                                      # tie
                rng.choice(["gold", "silver", None]),   # segment (nullable)
                rng.choice(["us", "eu"]),               # region
            )
        )
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, segment string, region string"
    )
    got = {
        (r.user_id, r.segment, r.region, r.valid_from, r.valid_to, r.n_events, r.is_current)
        for r in scd2_history(
            df, "user_id", "ts", ["segment", "region"], tie_col="event_id"
        ).collect()
    }
    assert got == _py_scd2(rows, 2)


def test_scd2_hand_case_null_safe_and_half_open(spark):
    rows = [
        (1, _ts(0), 0, "a"),
        (1, _ts(10), 1, "a"),   # unchanged -> same interval
        (1, _ts(20), 2, None),  # a -> NULL is a change
        (1, _ts(30), 3, None),  # NULL -> NULL is unchanged
        (1, _ts(40), 4, "b"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, e int, attr string")
    out = sorted(
        scd2_history(df, "k", "ts", ["attr"], tie_col="e").collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.attr, r.valid_from, r.valid_to, r.n_events) for r in out] == [
        ("a", _ts(0), _ts(20), 2),
        (None, _ts(20), _ts(40), 2),
        ("b", _ts(40), None, 1),
    ]
    assert [r.is_current for r in out] == [False, False, True]


def test_scd2_partition_invariance(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(5), _ts(rng.randrange(100)), i, rng.choice("xy"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, e int, attr string")

    def run(d):
        return {
            (r.k, r.attr, r.valid_from, r.valid_to, r.n_events)
            for r in scd2_history(d, "k", "ts", ["attr"], tie_col="e").collect()
        }

    assert run(df.repartition(1)) == run(df.repartition(16))


def test_scd2_merge_equals_full_recompute(spark):
    """The whole merge contract: split a random event stream per key at its
    time midpoint, build history from part 1, merge part 2 — rows equal a
    full scd2_history over everything (intervals, counts, currency)."""
    from spacy_ann_linker_spark.operators.scd import scd2_history, scd2_merge

    rng = random.Random(41)
    rows = [
        (rng.randrange(6), _ts(rng.randrange(120)), i, rng.choice("abc"))
        for i in range(300)
    ]
    # per-key time split: part2 only has events at ts >= part1's max ts
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    part1, part2 = [], []
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (r[1], r[2]))
        cut = len(rs) // 2
        part1 += rs[:cut]
        part2 += rs[cut:]
    schema = "k int, ts timestamp, e int, attr string"
    d_all = spark.createDataFrame(rows, schema)
    d1 = spark.createDataFrame(part1, schema)
    d2 = spark.createDataFrame(part2, schema)

    hist = scd2_history(d1, "k", "ts", ["attr"], tie_col="e")
    merged = scd2_merge(hist, d2, "k", "ts", ["attr"], tie_col="e")
    want = scd2_history(d_all, "k", "ts", ["attr"], tie_col="e")

    def rows_of(df):
        return {
            (r.k, r.attr, r.valid_from, r.valid_to, r.n_events, r.is_current)
            for r in df.collect()
        }

    assert rows_of(merged) == rows_of(want)


def test_scd2_merge_brand_new_and_untouched_keys(spark):
    from spacy_ann_linker_spark.operators.scd import scd2_history, scd2_merge

    d1 = spark.createDataFrame(
        [(1, _ts(0), 0, "a"), (2, _ts(0), 1, "x")], "k int, ts timestamp, e int, attr string"
    )
    hist = scd2_history(d1, "k", "ts", ["attr"], tie_col="e")
    # key 1 extends unchanged; key 3 is brand new; key 2 untouched
    d2 = spark.createDataFrame(
        [(1, _ts(5), 2, "a"), (3, _ts(7), 3, "z")], "k int, ts timestamp, e int, attr string"
    )
    merged = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.n_events, r.is_current)
        for r in scd2_merge(hist, d2, "k", "ts", ["attr"], tie_col="e").collect()
    }
    assert merged == {
        (1, "a", _ts(0), None, 2, True),   # extended in place, count grew
        (2, "x", _ts(0), None, 1, True),   # untouched passthrough
        (3, "z", _ts(7), None, 1, True),   # new key
    }


def test_scd2_null_timestamp_does_not_split_runs(spark):
    """A NULL-ts event sorts first; the row after it must not be forced
    onto a new island when attrs are unchanged."""
    rows = [(1, None, 0, "a"), (1, _ts(5), 1, "a"), (1, _ts(9), 2, "b")]
    df = spark.createDataFrame(rows, "k int, ts timestamp, e int, attr string")
    out = sorted(
        scd2_history(df, "k", "ts", ["attr"], tie_col="e").collect(),
        key=lambda r: (r.valid_from is not None, r.valid_from or _ts(0)),
    )
    assert [(r.attr, r.n_events) for r in out] == [("a", 2), ("b", 1)]
