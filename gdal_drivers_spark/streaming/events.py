"""Streaming façade — incremental ingestion of the tile/event pipeline.

The reference is batch-only (update access explicitly refused:
``mask.cpp:112-118``, ``solid.cpp:221-227``, ``blender.cpp:857-863``,
``mvt.cpp:771-774``); its pull-on-demand remote fetch
(``mvt.cpp:699-730``) is the closest incremental shape. The engine adds
a Structured Streaming layer for the ingestion side: the same stateless
tile-assignment transformations applied via ``readStream``, plus
watermarked tumbling-window aggregation for event streams with late
data.

Both entry points return unstarted streaming DataFrames; callers pick
the sink/trigger (tests use ``availableNow`` + memory sink and compare
against the batch twin — the exactness contract is "stream result ==
batch result on the same closed input").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window_s: int = 300, watermark_s: int = 600
) -> DataFrame:
    """Tumbling-window counts + exact cents sum per event_type, tolerant
    of ``watermark_s`` of lateness when streaming. Works on batch and
    streaming inputs identically (the batch twin is the oracle)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", f"{watermark_s} seconds")
    return (
        src.groupBy(
            F.window("ts", f"{window_s} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            # NTZ → (UTC session) timestamp → epoch seconds
            F.col("w.start").cast("timestamp").cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str):
    """availableNow drain into an in-memory table; returns the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
