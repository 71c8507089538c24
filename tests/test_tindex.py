"""gdaltindex parity: one feature per raster with footprint corners,
resolution, pixel count and a closed CCW WKT ring; degenerate rasters
are flagged, never dropped."""

import pandas as pd

from gdal_drivers_spark.operators.tindex import tile_index


def _frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "w", "h", "x0", "y0", "x1", "y1"])
    )


def test_tile_index_geometry_and_resolution(spark):
    df = _frame(spark, [("a", 64, 32, 0.25, 0.5, 0.5, 0.75)])
    row = tile_index(df).collect()[0]
    assert row["ok"] and row["location"] == "a"
    assert row["res_x"] == 0.25 / 64 and row["res_y"] == 0.25 / 32
    assert row["n_px"] == 64 * 32
    assert row["wkt"] == (
        "POLYGON ((0.250000000 0.500000000, 0.500000000 0.500000000, "
        "0.500000000 0.750000000, 0.250000000 0.750000000, "
        "0.250000000 0.500000000))"
    )


def test_tile_index_flags_degenerate_rows(spark):
    rows = [
        ("good", 8, 8, 0.0, 0.0, 0.1, 0.1),
        ("flat", 8, 8, 0.2, 0.3, 0.2, 0.4),   # x1 == x0
        ("nopx", 0, 8, 0.0, 0.0, 0.1, 0.1),   # w == 0
    ]
    got = {r["location"]: r for r in tile_index(_frame(spark, rows)).collect()}
    assert len(got) == 3
    assert got["good"]["ok"]
    for bad in ("flat", "nopx"):
        r = got[bad]
        assert not r["ok"]
        assert r["wkt"] is None and r["n_px"] is None and r["res_x"] is None
