"""As-of join and range join: semantics pinned against a pure-Python oracle
on crafted rows (inclusive bound, tie-break, empty-match, bin boundaries)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from timberjack_spark.operators.temporal import asof_join, range_join_count

T0 = datetime(2024, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(100)), (2, 10, ts(200)), (3, 20, ts(50)), (4, 30, ts(500))],
        "lid long, user long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts(100), 1.0),   # exactly at left ts -> inclusive
            (101, 10, ts(100), 2.0),   # tie on ts -> greatest rid wins
            (102, 10, ts(150), 3.0),
            (103, 20, ts(60), 4.0),    # after left row 3 -> no match
            (104, 30, ts(499), 5.0),
        ],
        "rid long, user long, rts timestamp, val double",
    )
    return left, right


def test_asof_inclusive_tiebreak_and_misses(frames):
    left, right = frames
    out = {
        r["lid"]: (r["asof_rid"], r["asof_val"])
        for r in asof_join(
            left, right, ["user"], "lts", "rts", ["rid", "val"], tiebreak_col="rid"
        ).collect()
    }
    assert out[1] == (101, 2.0)      # equal ts included, max rid wins the tie
    assert out[2] == (102, 3.0)      # latest at-or-before
    assert out[3] == (None, None)    # right row is after -> no match
    assert out[4] == (104, 5.0)


def test_range_join_count_boundaries(frames):
    left, right = frames
    # window [lts-100, lts): lid=1 sees nothing (ties at lts excluded),
    # lid=2 sees rts 100,100,150 (>=100, <200)
    out = {
        r["lid"]: r["n"]
        for r in range_join_count(
            left, right, ["user"], "lts", "rts", -100, 0, count_alias="n"
        ).collect()
    }
    assert out[1] == 0
    assert out[2] == 3
    assert out[3] == 0
    assert out[4] == 1


def test_range_join_spans_bin_boundary(spark):
    # right row in the bin BEFORE the left row's start bin must still match
    left = spark.createDataFrame([(1, 1, ts(1000))], "lid long, user long, lts timestamp")
    right = spark.createDataFrame(
        [(9, 1, ts(901)), (8, 1, ts(999)), (7, 1, ts(899))],
        "rid long, user long, rts timestamp",
    )
    out = range_join_count(left, right, ["user"], "lts", "rts", -100, 0, count_alias="n")
    assert out.collect()[0]["n"] == 2  # 901 and 999 in [900, 1000); 899 out


def test_asof_is_single_shuffle(frames):
    left, right = frames
    plan = (
        asof_join(left, right, ["user"], "lts", "rts", ["rid"], tiebreak_col="rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for the window partitioning; no join node at all
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_keeps_duplicate_left_rows(spark):
    # two left rows IDENTICAL in every column must yield two output rows with
    # per-row counts (the round-2 groupBy-all-left-columns merged them into
    # one row with a doubled count — ADVICE r2)
    left = spark.createDataFrame(
        [(1, 1, ts(1000)), (1, 1, ts(1000))], "lid long, user long, lts timestamp"
    )
    right = spark.createDataFrame([(9, 1, ts(950))], "rid long, user long, rts timestamp")
    rows = range_join_count(
        left, right, ["user"], "lts", "rts", -100, 0, count_alias="n"
    ).collect()
    assert len(rows) == 2
    assert [r["n"] for r in rows] == [1, 1]


def test_range_join_allows_map_payload_columns(spark):
    # map-typed left payloads are not groupable; the surrogate-id aggregation
    # must carry them anyway
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 1, ts(1000))], "lid long, user long, lts timestamp"
    ).withColumn("m", F.create_map(F.lit("k"), F.lit("v")))
    right = spark.createDataFrame([(9, 1, ts(950))], "rid long, user long, rts timestamp")
    rows = range_join_count(
        left, right, ["user"], "lts", "rts", -100, 0, count_alias="n"
    ).collect()
    assert rows[0]["m"] == {"k": "v"} and rows[0]["n"] == 1
