"""gdal_merge last-wins mosaic: src_id-ordered override where not
nodata, input-order invariance, all-nodata pixels, poison cells."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.operators.blend import mosaic_lastwins

T = 8
C = (4 << 52) + (1 << 26) + 2


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "src_id", "raster"]),
        "cell long, src_id long, raster binary")


def test_mosaic_lastwins_matches_scalar(spark):
    rng = np.random.default_rng(53)
    a = rng.integers(0, 4, (T, T)).astype(np.uint8) * 50   # holes at 0
    b = rng.integers(0, 4, (T, T)).astype(np.uint8) * 60
    c = rng.integers(0, 2, (T, T)).astype(np.uint8) * 200
    rows = [(C, 2, b.tobytes()), (C, 1, a.tobytes()), (C, 3, c.tobytes()),
            (C + 1, 1, a.tobytes())]
    got = {r["cell"]: r for r in mosaic_lastwins(_df(spark, rows), T).collect()}
    exp = np.zeros((T, T), np.uint8)
    for layer in (a, b, c):  # ascending src_id paints over
        m = layer != 0
        exp[m] = layer[m]
    r = got[C]
    assert bytes(r["raster"]) == exp.tobytes()
    assert r["n_filled"] == int((exp != 0).sum()) and r["n_sources"] == 3
    assert bytes(got[C + 1]["raster"]) == a.tobytes()
    # row order must not matter
    got2 = mosaic_lastwins(_df(spark, rows[::-1]), T).collect()
    assert {x["cell"]: bytes(x["raster"]) for x in got2}[C] == exp.tobytes()


def test_mosaic_poison_cell(spark):
    ok = np.full((T, T), 7, np.uint8)
    rows = [(C, 1, ok.tobytes()), (C, 2, b"short")]
    r = mosaic_lastwins(_df(spark, rows), T).collect()[0]
    assert r["raster"] is None and r["n_filled"] == -1 and r["n_sources"] == 2


def test_mosaic_duplicate_or_null_src_poisons(spark):
    a = np.full((T, T), 7, np.uint8)
    dup = [(C, 1, a.tobytes()), (C, 1, a.tobytes())]
    r = mosaic_lastwins(_df(spark, dup), T).collect()[0]
    assert r["raster"] is None and r["n_filled"] == -1
    nul = pd.DataFrame([(C, 1, a.tobytes()), (C, None, a.tobytes())],
                       columns=["cell", "src_id", "raster"])
    df = spark.createDataFrame(nul, "cell long, src_id long, raster binary")
    r2 = mosaic_lastwins(df, T).collect()[0]
    assert r2["raster"] is None and r2["n_filled"] == -1
