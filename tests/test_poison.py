"""Poison-row resilience: at 10^12 rows some payloads WILL be garbage
— a corrupt image must mark its row dec_ok=false and never kill the
stage or poison its Arrow batch neighbors."""

import pandas as pd

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.decode import decode_stats
from gdal_drivers_spark.sources.synth import pattern


def test_corrupt_images_flagged_not_fatal(spark):
    good = codecs.encode_png(pattern(8, 8, 1, 7))
    rows = [
        ("ok", good, "png"),
        ("truncated", good[: len(good) // 2], "png"),
        ("wrong_magic", b"\x00\x01\x02\x03" + good[4:], "png"),
        ("empty", b"", "png"),
        ("bad_fmt", good, "no_such_format"),
        ("ok2", codecs.encode_raw(pattern(4, 4, 2, 9)), "raw"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])
    )
    got = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert len(got) == 6, "no row may be dropped or duplicated"
    assert got["ok"]["dec_ok"] and got["ok2"]["dec_ok"]
    for bad in ("truncated", "wrong_magic", "empty", "bad_fmt"):
        assert not got[bad]["dec_ok"], bad
    # the good rows in the same Arrow batch still decoded correctly
    assert (got["ok"]["dec_w"], got["ok"]["dec_h"]) == (8, 8)
    assert got["ok2"]["dec_c"] == 2
