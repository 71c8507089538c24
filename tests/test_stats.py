"""Per-group quantiles: exact/approx agreement, threshold filter
semantics and plan shape (broadcast threshold join)."""

from pyspark.sql import functions as F

from gdal_drivers_spark.operators.stats import (
    approx_group_quantiles,
    group_quantiles,
    threshold_filter,
)


def test_exact_quantiles_definition(spark):
    """percentile(p) = value at rank p·(n-1), linear interpolation."""
    df = spark.createDataFrame([(i,) for i in range(1, 102)], "v long")
    q = group_quantiles(df.withColumn("g", F.lit("a")), ["g"], "v",
                        [0.0, 0.25, 0.5, 1.0]).collect()[0]
    assert (q["q0_0"], q["q0_25"], q["q0_5"], q["q1_0"]) == (1.0, 26.0, 51.0, 101.0)
    assert q["n"] == 101


def test_approx_close_to_exact(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ex = {r["event_type"]: r["q0_9"] for r in group_quantiles(
        ev, ["event_type"], "value", [0.9]).collect()}
    ap = {r["event_type"]: r["q0_9"] for r in approx_group_quantiles(
        ev, ["event_type"], "value", [0.9], accuracy=10_000).collect()}
    for k, v in ex.items():
        assert abs(ap[k] - v) / max(abs(v), 1e-9) < 0.05


def test_threshold_filter(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    kept = threshold_filter(ev, ["event_type"], "value", 0.5)
    n_all = ev.count()
    n_kept = kept.count()
    # keeps roughly the top half of each group
    assert 0.4 * n_all < n_kept < 0.6 * n_all
    # every kept row really is >= its group median
    med = {r["event_type"]: r["q0_5"] for r in group_quantiles(
        ev, ["event_type"], "value", [0.5]).collect()}
    for r in kept.select("event_type", "value").collect():
        assert r["value"] >= med[r["event_type"]]


def test_threshold_plan_broadcasts(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = threshold_filter(ev, ["event_type"], "value", 0.9)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reserved_thr_and_backtick_names(spark):
    import pytest as _pytest

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with _pytest.raises(ValueError, match="_thr"):
        threshold_filter(ev.withColumn("_thr", F.lit(1)), ["event_type"],
                         "value", 0.5)
    # a column name with a space parses via backtick quoting
    spaced = ev.withColumnRenamed("value", "quality score")
    q = group_quantiles(spaced, ["event_type"], "quality score", [0.5])
    assert q.count() > 0
