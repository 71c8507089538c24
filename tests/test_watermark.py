"""Watermark semantics: an event arriving after the watermark has
passed (and the window's state has been evicted) is dropped — the
late-data contract of the streaming facade. Deterministic
multi-trigger setup: maxFilesPerTrigger=1 with forced file mtime
order, append output mode so only finalized windows emit.

Observed Spark semantics pinned by this test: the late-row filter uses
the PREVIOUS batch's watermark, so a row for window W is dropped when
it arrives ≥2 batches after the batch that advanced the watermark past
W's end (one batch to advance the watermark, one to evict W)."""

import glob
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from gdal_drivers_spark.streaming.events import EVENTS_SCHEMA, windowed_event_counts


def _write_events(spark, stream_dir: str, name: str, rows, mtime: int):
    """One plain parquet FILE in the stream dir (the file source does
    not recurse into nested dataset directories)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    df = spark.createDataFrame(pdf).withColumn("ts", F.to_timestamp("ts"))
    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(tmp + "/d")
    part = glob.glob(tmp + "/d/part-*.parquet")[0]
    dst = os.path.join(stream_dir, name)
    shutil.copy(part, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


def test_late_event_dropped_after_watermark(spark, tmp_path):
    base = str(tmp_path / "stream")
    os.makedirs(base)
    # batch 0: one event in window [00:00,00:05); max event time 00:20
    # → watermark after this batch: 00:10 (> 00:05)
    _write_events(
        spark, base, "f0.parquet",
        [
            (1, "2024-01-01 00:00:30", 1, "early", 1.0, ""),
            (2, "2024-01-01 00:20:00", 1, "early", 1.0, ""),
        ],
        mtime=1_000_000,
    )
    # batch 1: on-time data only; window [00:00,00:05) is evicted and
    # emitted at this batch's end
    _write_events(
        spark, base, "f1.parquet",
        [(3, "2024-01-01 00:21:00", 1, "mid", 1.0, "")],
        mtime=1_000_100,
    )
    # batch 2: event targeting the finalized window → MUST be dropped
    _write_events(
        spark, base, "f2.parquet",
        [
            (4, "2024-01-01 00:01:00", 1, "late", 1.0, ""),
            (5, "2024-01-01 00:22:00", 1, "late", 1.0, ""),
        ],
        mtime=1_000_200,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(base)
    )
    out = windowed_event_counts(stream, window_s=300, watermark_s=600)
    q = (
        out.writeStream.format("memory")
        .queryName("wm_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    rows = spark.sql("SELECT * FROM wm_windows").collect()
    w0 = 1704067200  # 2024-01-01 00:00:00 UTC
    by_key = {(r["win_start"], r["event_type"]): r["n_events"] for r in rows}
    # the finalized [00:00,00:05) window holds ONLY the on-time event
    assert by_key.get((w0, "early")) == 1, rows
    assert (w0, "late") not in by_key, rows
    assert dropped == 1
