"""Facade smoke for the round-5 utility verbs: every ImageSet/TileSet
verb drives its operator end-to-end and composes with BOTH payload
column conventions ("tile" and "raster") — the column-name adaptation
is what an AnalysisException regression would break."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.engine import Engine
from gdal_drivers_spark.sources import synth


def _tiles(spark, col):
    rows = [((4 << 52) + (tx << 26) + ty, bytes(np.full(256, 9, np.uint8)))
            for tx in range(4) for ty in range(4)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", col]))


def test_imageset_utility_verbs(spark):
    eng = Engine(spark)
    imgs = eng.images(synth.images_df(spark, 24))
    assert imgs.equalize().df.filter("ok").count() == 24
    assert imgs.scale(dst=(10, 200)).df.filter("ok").count() == 24
    assert imgs.quantize().df.filter("ok").count() == 24  # median-cut default
    assert imgs.calc({"B": imgs}, "A + B // 2").df.filter("ok").count() == 24
    idx = imgs.tindex()
    assert idx.count() == 24 and idx.filter("ok").count() == 24
    # pansharpen: 3-band vs 3-band pan is a grid mismatch -> poison rows
    ps = imgs.pansharpen(imgs)
    assert ps.df.count() == 24 and ps.df.filter("NOT ok").count() == 24


def test_tileset_utility_verbs_both_payload_columns(spark):
    eng = Engine(spark)
    ring = [[5, 3], [58, 13], [40, 62], [9, 50]]
    fdf = spark.createDataFrame(
        pd.DataFrame([(1, [[3.0, 2.0], [40.0, 6.0], [30.0, 37.0],
                           [6.0, 28.0]], 50)],
                     columns=["fid", "ring", "v"]),
        "fid long, ring array<array<double>>, v long")
    obs = spark.createDataFrame(
        pd.DataFrame([(1, 20, 20)], columns=["oid", "px", "py"]))
    for col in ("raster", "tile"):
        ts = eng.tiles(_tiles(spark, col))
        assert ts.cutline(ring, 16).df.count() == 16, col
        assert ts.retile(16, 32, 4, (4, 4)).df.count() == 4, col
        assert ts.burn(fdf, 16, 4, (4, 4)).df.filter("ok").count() == 16, col
        row = ts.viewshed(obs, 16, 4, (4, 4), 8).collect()[0]
        assert row["n_visible"] == row["n_eval"], col  # flat field
        assert ts.contour_polygons([128], 16, (4, 4)).count() == 1, col


def test_tileset_to_xyz_verb(spark):
    eng = Engine(spark)
    for col in ("raster", "tile"):
        ts = eng.tiles(_tiles(spark, col))
        assert ts.to_xyz(16).count() == 16 * 256, col       # full export
        assert ts.to_xyz(16, skip_value=9).count() == 0, col  # all skipped
