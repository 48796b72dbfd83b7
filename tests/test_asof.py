"""asof_join: union-scan temporal join (operators/asof.py) — hand cases for
tie/inclusivity/tolerance semantics plus randomized parity against a brute
python reference and against DuckDB's native ASOF JOIN."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spacy_ann_linker_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _left(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(rows)],
        "k int, ts timestamp, probe_id int",
    )


def _right(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(t), i, float(i) * 10) for i, (k, t) in enumerate(rows)],
        "k int, ts timestamp, build_id int, payload double",
    )


def test_backward_inclusive_and_unmatched(spark):
    left = _left(spark, [(1, 10), (1, 20), (1, 5), (2, 10)])
    right = _right(spark, [(1, 10), (1, 15), (3, 1)])
    out = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(left, right, on="k").collect()
    }
    # probe@10 matches build@10 (inclusive); probe@20 -> build@15;
    # probe@5 predates everything; key 2 has no builds
    assert out == {0: 0, 1: 1, 2: None, 3: None}


def test_backward_exclusive_skips_equal_ts(spark):
    left = _left(spark, [(1, 10), (1, 20)])
    right = _right(spark, [(1, 10), (1, 20)])
    out = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(left, right, on="k", inclusive=False).collect()
    }
    assert out == {0: None, 1: 0}


def test_forward_direction(spark):
    left = _left(spark, [(1, 10), (1, 16), (1, 99)])
    right = _right(spark, [(1, 12), (1, 16)])
    out = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out == {0: 0, 1: 1, 2: None}
    excl = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(
            left, right, on="k", direction="forward", inclusive=False
        ).collect()
    }
    assert excl == {0: 0, 1: None, 2: None}


def test_tolerance_nulls_far_matches_but_keeps_left_row(spark):
    left = _left(spark, [(1, 100), (1, 12)])
    right = _right(spark, [(1, 10)])
    rows = asof_join(left, right, on="k", tolerance=5.0).collect()
    out = {r["probe_id"]: (r["build_id"], r["payload"]) for r in rows}
    assert len(rows) == 2
    assert out[1] == (0, 0.0)         # 2 s gap, inside tolerance
    assert out[0] == (None, None)     # 90 s gap: matched cols nulled


def test_equal_build_ts_tie_pinned_by_tie_col(spark):
    left = _left(spark, [(1, 10)])
    right = _right(spark, [(1, 10), (1, 10), (1, 10)])
    got = asof_join(left, right, on="k", tie_col="build_id").first()
    assert got["build_id"] == 2  # last in tie order wins
    fwd = asof_join(
        left, right, on="k", direction="forward", tie_col="build_id"
    ).first()
    assert fwd["build_id"] == 2  # forward ties resolve to the SAME row


def test_null_left_ts_never_matches_and_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [(1, None, 7)], "k int, ts timestamp, probe_id int"
    )
    right = _right(spark, [(1, 5)])
    row = asof_join(left, right, on="k").first()
    assert row["probe_id"] == 7 and row["build_id"] is None
    # right's 'ts' collides with left's -> suffixed
    assert "ts_r" in asof_join(left, right, on="k").columns


def _brute(lrows, rrows, direction, inclusive):
    want = {}
    for pid, (lk, lt) in enumerate(lrows):
        best = None
        for bid, (rk, rt) in enumerate(rrows):
            if rk != lk:
                continue
            if direction == "backward":
                ok = rt <= lt if inclusive else rt < lt
            else:
                ok = rt >= lt if inclusive else rt > lt
            if not ok:
                continue
            if best is None:
                best = (rt, bid)
            elif direction == "backward" and (rt, bid) > best:
                best = (rt, bid)
            elif direction == "forward" and (rt, -bid) < (best[0], -best[1]):
                best = (rt, bid)
        want[pid] = best[1] if best else None
    return want


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_random_parity_with_python_reference(spark, direction, inclusive):
    import random

    rng = random.Random(41)
    lrows = [(rng.randrange(6), rng.randrange(50)) for _ in range(120)]
    rrows = [(rng.randrange(6), rng.randrange(50)) for _ in range(80)]
    got = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(
            _left(spark, lrows),
            _right(spark, rrows),
            on="k",
            direction=direction,
            inclusive=inclusive,
            tie_col="build_id",
        ).collect()
    }
    assert got == _brute(lrows, rrows, direction, inclusive)


def test_matches_duckdb_native_asof(spark):
    """Backward-inclusive (DuckDB's ASOF JOIN semantics) on collision-free
    build timestamps — engine-vs-engine, not just engine-vs-python."""
    import random

    import duckdb

    rng = random.Random(43)
    lrows = [(rng.randrange(5), rng.randrange(2000)) for _ in range(150)]
    # unique (k, ts) build side: DuckDB leaves equal-ts winners unspecified
    seen = set()
    rrows = []
    while len(rrows) < 100:
        c = (rng.randrange(5), rng.randrange(2000))
        if c not in seen:
            seen.add(c)
            rrows.append(c)
    got = {
        r["probe_id"]: r["build_id"]
        for r in asof_join(
            _left(spark, lrows), _right(spark, rrows), on="k"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES %s) t(k, ts, probe_id)"
        % ",".join(
            f"({k}, TIMESTAMP '2024-01-01' + INTERVAL {t} SECOND, {i})"
            for i, (k, t) in enumerate(lrows)
        )
    )
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES %s) t(k, ts, build_id)"
        % ",".join(
            f"({k}, TIMESTAMP '2024-01-01' + INTERVAL {t} SECOND, {i})"
            for i, (k, t) in enumerate(rrows)
        )
    )
    want = dict(
        con.execute(
            "SELECT l.probe_id, r.build_id FROM l "
            "ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want
