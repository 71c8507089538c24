"""Zonal statistics: numpy ground truth, nodata exclusion, plan shape
(pixels reduced before any shuffle)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.zonal import tile_stats, zonal_stats
from gdal_drivers_spark.sources.synth import pattern


def _tiles_df(spark, n=24, px=16):
    rows = [
        (i, (4 << 52) + i % 6, codecs.encode_raw(pattern(px, px, 1, i * 31)))
        for i in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tid", "cell", "tile"])
    )


def test_tile_stats_matches_numpy(spark):
    df = _tiles_df(spark)
    got = {r["tid"]: r for r in tile_stats(df).collect()}
    for i in range(24):
        px = pattern(16, 16, 1, i * 31).ravel()
        r = got[i]
        assert (r["n_px"], r["px_sum"], r["px_min"], r["px_max"]) == (
            px.size, int(px.sum()), int(px.min()), int(px.max())
        )


def test_zonal_matches_numpy(spark):
    df = _tiles_df(spark)
    zones = spark.createDataFrame(
        [((4 << 52) + c, f"z{c % 2}") for c in range(6)], "cell long, zone string"
    )
    got = {r["zone"]: r for r in zonal_stats(df, zones).collect()}
    acc = {}
    for i in range(24):
        z = f"z{(i % 6) % 2}"
        acc.setdefault(z, []).append(pattern(16, 16, 1, i * 31).ravel())
    for z, chunks in acc.items():
        allpx = np.concatenate(chunks)
        r = got[z]
        assert r["n_tiles"] == len(chunks)
        assert r["n_px"] == allpx.size
        assert r["px_sum"] == int(allpx.sum(dtype=np.int64))
        assert (r["px_min"], r["px_max"]) == (int(allpx.min()), int(allpx.max()))
        assert r["mean"] == allpx.sum(dtype=np.int64) / allpx.size


def test_nodata_excluded(spark):
    img = np.full((8, 8, 1), 7, np.uint8)
    img[0, 0, 0] = 200
    df = spark.createDataFrame(
        pd.DataFrame([(1, codecs.encode_raw(img))], columns=["cell", "tile"])
    )
    r = tile_stats(df, nodata=7).collect()[0]
    assert (r["n_px"], r["px_sum"], r["px_min"], r["px_max"]) == (1, 200, 200, 200)
    # all-nodata tile: neutral stats
    df2 = spark.createDataFrame(
        pd.DataFrame([(1, codecs.encode_raw(np.full((4, 4, 1), 7, np.uint8)))],
                     columns=["cell", "tile"])
    )
    r2 = tile_stats(df2, nodata=7).collect()[0]
    assert (r2["n_px"], r2["px_sum"], r2["px_ok"]) == (0, 0, True)
    z = zonal_stats(df2, spark.createDataFrame([(1, "a")], "cell long, zone string"),
                    nodata=7).collect()[0]
    # zero countable pixels → NULL extrema, never a fabricated 255/0
    assert z["n_px"] == 0 and z["mean"] is None
    assert z["px_min"] is None and z["px_max"] is None


def test_poison_tiles_marked_not_fatal(spark):
    """decode_stats policy: NULL/corrupt payloads flag their row and
    are counted per zone, the stage survives."""
    img = codecs.encode_raw(pattern(8, 8, 1, 5))
    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, img), (1, b"\x00garbage"), (1, None)],
            columns=["cell", "tile"],
        )
    )
    s = {bool(r["px_ok"]): r for r in tile_stats(df).collect()}
    assert s[True]["n_px"] == 64 and s[False]["n_px"] == 0
    z = zonal_stats(df, spark.createDataFrame([(1, "a")], "cell long, zone string")
                    ).collect()[0]
    assert z["n_tiles"] == 1 and z["n_bad_tiles"] == 2
    assert z["n_px"] == 64


def test_pixels_never_shuffle(spark):
    """The Arrow stat hop must sit BEFORE the exchange: the shuffled
    frame carries stat longs, not tile bytes."""
    df = _tiles_df(spark)
    zones = spark.createDataFrame(
        [((4 << 52) + c, f"z{c}") for c in range(6)], "cell long, zone string"
    )
    out = zonal_stats(df, zones)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    arrow_pos = plan.find("ArrowEvalPython")
    agg_exch_pos = plan.rfind("Exchange")
    assert arrow_pos != -1
    # physical plans print top-down: the scan-side Arrow stage appears
    # BELOW (after) the final aggregation exchange in the string
    assert arrow_pos > agg_exch_pos
