"""Sessionization: batch twin vs stream (applyInPandasWithState)."""

import os
import shutil

from gdal_drivers_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def test_batch_sessions_golden(spark):
    import pandas as pd

    rows = [
        # user 1: two sessions split by a 4000s gap
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 1, "2024-01-01 00:10:00", 2.0),
        (3, 1, "2024-01-01 02:00:00", 3.0),
        # user 2: one session
        (4, 2, "2024-01-01 00:00:00", 5.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df = spark.createDataFrame(pdf).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = {(r["user_id"], r["session_start"]): r for r in sessionize_batch(df, gap_s=1800).collect()}
    assert len(got) == 3
    s1 = got[(1, 1704067200)]
    assert s1["n_events"] == 2 and s1["value_cents"] == 300
    s2 = got[(1, 1704074400)]
    assert s2["n_events"] == 1 and s2["value_cents"] == 300


def test_stream_sessions_match_batch(spark, tmp_path):
    """Closed sessions from the stream == batch sessions (excluding
    each user's final open session, which only flushes on timeout)."""
    src = "/root/testdata/sf0.001/events.parquet"
    batch = sessionize_batch(spark.read.parquet(src), gap_s=1800)
    batch_rows = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["value_cents"])
        for r in batch.collect()
    }
    # last session per user is open-ended
    last_per_user = {}
    for (u, s), _ in batch_rows.items():
        last_per_user[u] = max(last_per_user.get(u, 0), s)

    stream_dir = str(tmp_path / "ev")
    os.makedirs(stream_dir)
    shutil.copy(src, f"{stream_dir}/part-0.parquet")
    from gdal_drivers_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, stream_dir, max_files=1)
    out = sessionize_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["value_cents"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    closed = {k: v for k, v in batch_rows.items() if k[1] != last_per_user[k[0]]}
    assert len(closed) > 0
    for k, v in closed.items():
        assert got.get(k) == v, f"session {k}: stream={got.get(k)} batch={v}"
