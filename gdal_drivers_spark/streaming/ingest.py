"""Streaming ingestion of the image pipeline — the same stateless
decode → tile-assign transformation chain applied to a file stream
(SURVEY §2.8: the engine's incremental facade; the reference's
closest analogue is pull-on-demand remote fetch, mvt.cpp:699-730).

No watermark is needed: decode and assignment are stateless maps, so
stream output over a closed input equals the batch result exactly
(asserted in tests/test_stream_ingest.py). Downstream stateful steps
(windowed rollups, sessionization) add their own watermarks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.assign import assign_tiles
from ..operators.decode import decode_stats
from ..sources.synth import IMAGES_SCHEMA


def read_images_stream(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def assign_images_stream(images: DataFrame, z: int) -> DataFrame:
    """Arrow-batch decode + covering-cell assignment on a stream —
    identical operator chain to the batch path (stream == batch)."""
    decoded = decode_stats(images)
    return assign_tiles(decoded.filter("dec_ok"), z).select("image_id", "cell", "cx", "cy")
