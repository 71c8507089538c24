"""Bin-bucketed interval join: boundary semantics, overlap
multiplicity, fan-out guard, plan shape (hash join, no nested loop)."""

import pytest
from pyspark.sql import functions as F

from gdal_drivers_spark.operators.intervals import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 10), (2, 19), (3, 20), (4, 25), (5, 999)],
        "pid long, v long",
    )
    intervals = spark.createDataFrame(
        [(100, 10, 20),    # [10,20) — catches v=10 (inclusive lo), not v=20
         (200, 15, 30),    # overlaps the first: v=19 matches both
         (300, 50, 50),    # empty — matches nothing
         (400, 60, 40)],   # inverted — dropped, must not crash sequence()
        "iid long, lo long, hi long",
    )
    return points, intervals


def test_semantics(frames):
    points, intervals = frames
    out = interval_join(points, intervals, "v", "lo", "hi", bin_width=8)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200), (4, 200)]


def test_bin_width_invariance(frames):
    points, intervals = frames
    base = sorted(map(tuple, interval_join(
        points, intervals, "v", "lo", "hi", bin_width=8).collect()))
    for bw in (1, 3, 64, 1000):
        assert sorted(map(tuple, interval_join(
            points, intervals, "v", "lo", "hi", bin_width=bw).collect())) == base


def test_fanout_guard(spark, frames):
    """The loud cap is IN the plan: construction triggers zero Spark
    jobs (no eager interval-side scan), and execution over an over-wide
    interval fails with the explanatory message."""
    points, _ = frames
    wide = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, lo long, hi long")
    sc = spark.sparkContext
    sc.setJobGroup("iv-construct", "interval_join construction must be lazy")
    try:
        joined = interval_join(points, wide, "v", "lo", "hi", bin_width=2,
                               max_bins_per_interval=1024)
        jobs = sc.statusTracker().getJobIdsForGroup("iv-construct")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == []
    with pytest.raises(Exception, match="bins"):
        joined.collect()


def test_floor_bin_exact_beyond_double(spark):
    """Bin ids are exact integer floor division: beyond 2^53 (e.g.
    nanosecond epochs) the old floor(v / bw) double path rounds v to a
    multiple of 256 and can bin a point away from its interval — a
    silent false NEGATIVE the exact re-check cannot recover."""
    from gdal_drivers_spark.operators.intervals import _floor_bin

    vals = [(1 << 60) + o for o in (0, 1, 127, 128, 255, 999)] + [
        -(1 << 60) - 3, -7, -1, 0, 5, 999, 1000,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["b"] for r in
           df.select("v", _floor_bin("v", 1000).alias("b")).collect()}
    assert got == {v: v // 1000 for v in vals}
    bad = {r["v"]: r["b"] for r in
           df.select("v", F.floor(F.col("v") / 1000).cast("long").alias("b")).collect()}
    assert bad != got  # the double path is provably wrong on this input


def test_big_domain_join_exact(spark):
    """End-to-end at a nanosecond-epoch-scale domain: matches are
    governed by exact longs, not double-rounded bins."""
    base = (1 << 60) + 12345
    points = spark.createDataFrame(
        [(i, base + i) for i in range(10)], "pid long, v long"
    )
    intervals = spark.createDataFrame(
        [(1, base + 2, base + 7)], "iid long, lo long, hi long"
    )
    out = interval_join(points, intervals, "v", "lo", "hi", bin_width=1000).collect()
    assert sorted(r["pid"] for r in out) == [2, 3, 4, 5, 6]


def test_collision_guard(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="collision"):
        interval_join(points, intervals.withColumnRenamed("iid", "pid"),
                      "v", "lo", "hi", bin_width=8)


def test_reserved_bin_rejected(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="_bin"):
        interval_join(points.withColumn("_bin", F.lit(0)), intervals,
                      "v", "lo", "hi", bin_width=8)


def test_plan_no_nested_loop(frames):
    points, intervals = frames
    out = interval_join(points, intervals, "v", "lo", "hi", bin_width=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stream_interval_tagging_equals_batch(spark, tmp_path):
    """interval_join is streaming-capable for free: the bin explode
    lives on the STATIC interval side and the stream side only adds a
    codegen bin column + a stream-static equi-join — both natively
    supported by Structured Streaming. Stream == batch proven."""
    import glob
    import os
    import shutil
    import tempfile

    points = spark.createDataFrame(
        [(i, (i * 37) % 500) for i in range(400)], "pid long, v long"
    )
    intervals = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 250), (3, 400, 480)], "iid long, lo long, hi long"
    )
    expected = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "v", "lo", "hi", bin_width=64)
        .select("pid", "iid").collect()
    )

    stream_dir = str(tmp_path / "pts")
    os.makedirs(stream_dir)
    tmp = tempfile.mkdtemp()
    points.coalesce(2).write.mode("overwrite").parquet(tmp + "/d")
    for i, part in enumerate(sorted(glob.glob(tmp + "/d/part-*.parquet"))):
        shutil.copy(part, f"{stream_dir}/f{i}.parquet")
    shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema("pid long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    tagged = interval_join(stream, intervals, "v", "lo", "hi", bin_width=64)
    q = (
        tagged.select("pid", "iid")
        .writeStream.format("memory")
        .queryName("stream_intervals")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["pid"], r["iid"])
        for r in spark.sql("SELECT pid, iid FROM stream_intervals").collect()
    )
    assert got == expected and len(got) > 0

def test_fractional_domain_rejected(spark, frames):
    """The integer-domain contract is enforced at construction — for
    plain columns AND for SQL expressions (ADVICE r04: the old
    dict(df.dtypes) name lookup silently skipped expressions, so a
    fractional expression bypassed the guard and reintroduced the
    toward-zero truncation false-negative)."""
    points, intervals = frames
    fp = points.withColumn("vf", F.col("v") + F.lit(0.5))
    with pytest.raises(ValueError, match="integer domain"):
        interval_join(fp.drop("v").withColumnRenamed("vf", "v"),
                      intervals, "v", "lo", "hi", bin_width=8)
    # expression form of the same fractional domain — must ALSO reject
    with pytest.raises(ValueError, match="integer domain"):
        interval_join(fp, intervals, "(vf) - 0.25", "lo", "hi", bin_width=8)
    # integral EXPRESSIONS stay accepted (the documented _floor_bin use)
    out = interval_join(points, intervals, "(v) + 0", "lo", "hi", bin_width=8)
    assert out.count() == 5
