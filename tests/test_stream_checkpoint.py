"""Streaming ingest → checkpointed sink (r04): a mid-stream kill after
an epoch's manifest commit forces Structured Streaming to REPLAY that
epoch on restart; the manifest must skip it (exactly-once), and the
committed output must be byte-identical to an uninterrupted run."""

import glob
import os
import shutil
import tempfile

import pytest

from gdal_drivers_spark.operators.assign import assign_tiles
from gdal_drivers_spark.operators.decode import decode_stats
from gdal_drivers_spark.plans.checkpoint import CheckpointedWriter
from gdal_drivers_spark.sources import synth
from gdal_drivers_spark.streaming.checkpointed import start_checkpointed_ingest
from gdal_drivers_spark.streaming.ingest import assign_images_stream, read_images_stream


def _stream_files(spark, images, stream_dir, n_files=4):
    os.makedirs(stream_dir)
    tmp = tempfile.mkdtemp()
    images.coalesce(n_files).write.mode("overwrite").parquet(tmp + "/d")
    for i, part in enumerate(sorted(glob.glob(tmp + "/d/part-*.parquet"))):
        shutil.copy(part, f"{stream_dir}/f{i}.parquet")
    shutil.rmtree(tmp)


def test_stream_kill_restart_is_exactly_once_and_byte_identical(spark, tmp_path):
    images = synth.images_df(spark, 160, partitions=4)
    stream_dir = str(tmp_path / "imgs")
    _stream_files(spark, images, stream_dir, n_files=4)

    # ---------- killed run: crash right AFTER epoch 1's manifest commit
    out_a = str(tmp_path / "out_a")
    ckpt_a = str(tmp_path / "ckpt_a")
    wa = CheckpointedWriter(spark, out_a)

    def run(fail_after_commit_of=None):
        stream = read_images_stream(spark, stream_dir, max_files=1)
        q = start_checkpointed_ingest(
            assign_images_stream(stream, z=6), wa, ckpt_a,
            fail_after_commit_of=fail_after_commit_of,
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected failure"):
        run(fail_after_commit_of=1)
    committed_mid = wa.committed()
    assert committed_mid == {0, 1}  # epoch 1 committed, THEN the crash

    # restart with the same streaming checkpoint: epoch 1 is REPLAYED
    # (Spark never recorded its offsets) — the manifest must skip it
    run()
    assert wa.validate("image_id")
    snaps = wa.snapshots()
    assert [b for _, b, _ in snaps] == sorted({b for _, b, _ in snaps}), \
        "an epoch was committed twice"

    # ---------- uninterrupted control run → identical committed content
    out_b = str(tmp_path / "out_b")
    wb = CheckpointedWriter(spark, out_b)
    stream = read_images_stream(spark, stream_dir, max_files=1)
    q = start_checkpointed_ingest(
        assign_images_stream(stream, z=6), wb, str(tmp_path / "ckpt_b"))
    q.awaitTermination()
    assert wb.validate("image_id")

    rows_a = sorted(map(tuple, wa.read_committed()
                        .select("image_id", "cell", "cx", "cy").collect()))
    rows_b = sorted(map(tuple, wb.read_committed()
                        .select("image_id", "cell", "cx", "cy").collect()))
    assert rows_a == rows_b and len(rows_a) > 160

    # per-batch manifest checksums agree batch-for-batch (the "byte
    # identical committed output" claim at the commit-protocol level)
    man_a = {int(r["batch_id"]): (int(r["n_rows"]), int(r["checksum"]))
             for r in wa._read_manifest().collect()}
    man_b = {int(r["batch_id"]): (int(r["n_rows"]), int(r["checksum"]))
             for r in wb._read_manifest().collect()}
    assert man_a == man_b

    # batch truth: the streaming+checkpoint composition lost nothing
    batch = assign_tiles(decode_stats(images).filter("dec_ok"), z=6)
    expected = sorted(map(tuple, batch.select("image_id", "cell", "cx", "cy").collect()))
    assert rows_a == expected
