"""Layout contract: same-bucketed tables join with ZERO exchange
(co-located sort-merge join); the identical unbucketed join shuffles
both sides. This is the 100 TB shuffle-elimination strategy of
plans/layout.py, proven on the executed plan."""

import pytest
from pyspark.sql import functions as F

from gdal_drivers_spark.plans.layout import bucketed_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _tables(spark, tmp_path, bucketed: bool):
    a = spark.range(20_000).select(
        (F.col("id") % 4096).alias("cell"), F.col("id").alias("payload_a")
    )
    b = spark.range(8_000).select(
        (F.col("id") % 4096).alias("cell"), (F.col("id") * 3).alias("payload_b")
    )
    if not bucketed:
        return a, b
    write_bucketed(a, "t_a", str(tmp_path / "a"), buckets=8)
    write_bucketed(b, "t_b", str(tmp_path / "b"), buckets=8)
    return spark.table("t_a"), spark.table("t_b")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line and "BroadcastExchange" not in line
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    ta, tb = _tables(spark, tmp_path, bucketed=True)
    j = ta.join(tb, "cell")
    n = j.count()
    assert n > 0
    assert _n_exchanges(j) == 0, "bucketed SMJ must not shuffle either side"
    # same result as the via-helper join
    assert bucketed_join(spark, "t_a", "t_b").count() == n
    spark.sql("DROP TABLE IF EXISTS t_a")
    spark.sql("DROP TABLE IF EXISTS t_b")


def test_unbucketed_join_shuffles_both_sides(spark, tmp_path, no_broadcast):
    a, b = _tables(spark, tmp_path, bucketed=False)
    j = a.join(b, "cell")
    j.count()
    assert _n_exchanges(j) >= 2, "control: plain SMJ shuffles both sides"
