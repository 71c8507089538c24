"""Streaming exact dedup == batch exact dedup (within the watermark
window): same surviving content-key set, one row per key."""

import glob
import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from gdal_drivers_spark.streaming.dedup import stream_exact_dedup


def _img_rows():
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(60):
        payload = bytes([i % 20]) * 32  # 20 distinct contents, 3× each
        rows.append((f"img{i}", payload, t0 + timedelta(seconds=i)))
    return pd.DataFrame(rows, columns=["image_id", "bytes", "ts"])


def test_stream_dedup_equals_batch(spark, tmp_path):
    pdf = _img_rows()
    df = spark.createDataFrame(pdf)
    batch_keys = sorted(
        r["content_key"]
        for r in df.withColumn("content_key", F.md5("bytes"))
        .select("content_key")
        .distinct()
        .collect()
    )

    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    tmp = tempfile.mkdtemp()
    df.repartition(3).write.mode("overwrite").parquet(tmp + "/d")
    for i, part in enumerate(sorted(glob.glob(tmp + "/d/part-*.parquet"))):
        shutil.copy(part, f"{stream_dir}/f{i}.parquet")
    shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema("image_id string, bytes binary, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    out = stream_exact_dedup(stream, ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT content_key FROM stream_dedup").collect()
    keys = [r["content_key"] for r in got]
    assert len(keys) == len(set(keys)), "a key survived twice"
    assert sorted(set(keys)) == batch_keys
