"""As-of join: semantics (backward, ties, tolerance) + plan shape
(one key shuffle, never a per-key cross product)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gdal_drivers_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(20)), (3, 100, _ts(5)),
         (4, 200, _ts(50)), (5, 300, _ts(7))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(8), 77), (100, _ts(20), 88),   # tie with event 2
         (200, _ts(60), 99)],                     # only AFTER event 4
        "k long, ts timestamp, payload long",
    )
    return left, right


def test_backward_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["payload"])
    got = {r["event_id"]: r["payload"] for r in out.collect()}
    assert got == {
        1: 77,    # latest right at/before ts=10 is ts=8
        2: 88,    # tie: right at equal ts matches
        3: None,  # nothing at/before ts=5
        4: None,  # right exists only after
        5: None,  # key never appears on the right
    }
    # left-join row preservation
    assert out.count() == left.count()


def test_matched_ts_and_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["payload"], tolerance=1.0)
    got = {r["event_id"]: (r["payload"], r["matched_ts"]) for r in out.collect()}
    # event 2 matched at distance 0 → kept; event 1 matched 2 s stale → nulled
    assert got[2] == (88, _ts(20))
    assert got[1] == (None, None)


def test_passthrough_and_collision(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["payload"])
    assert set(out.columns) == {"event_id", "k", "ts", "payload", "matched_ts"}
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("payload", "event_id"),
                  on="k", left_ts="ts", right_ts="ts", payload=["event_id"])


def test_plan_no_cross_product(frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["payload"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the merge is a union + one window, not a join at all
    assert "Window" in plan


def test_duplicate_right_latest_wins(spark):
    left = spark.createDataFrame([(1, 7, _ts(100))], "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, _ts(10), 1), (7, _ts(50), 2), (7, _ts(99), 3)],
        "k long, ts timestamp, payload long",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["payload"])
    assert out.collect()[0]["payload"] == 3
