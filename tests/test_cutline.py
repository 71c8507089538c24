"""gdalwarp -cutline parity: tiled masking equals whole-raster scalar
PIP, the tile classification (JVM disjoint / passthrough / all-nodata
/ boundary) is exact, and corrupt payloads poison their row only."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.core.geometry import points_in_polygon
from gdal_drivers_spark.operators.cutline import cutline_crop

T, GRID, Z = 16, 4, 4
W = T * GRID


def _cell(tx, ty):
    return (Z << 52) + (tx << 26) + ty


def _mosaic(spark, world):
    rows = []
    for tx in range(GRID):
        for ty in range(GRID):
            tile = world[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append((_cell(tx, ty), tile.tobytes()))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "raster"]))


def test_cutline_matches_whole_raster_pip(spark):
    rng = np.random.default_rng(3)
    world = rng.integers(1, 256, (W, W)).astype(np.uint8)
    ring = np.array([[5, 3], [58, 12], [40, 61], [9, 50]])  # odd-slope edges
    got = {r["cell"]: r for r in
           cutline_crop(_mosaic(spark, world), ring, T, nodata=0).collect()}
    assert len(got) == GRID * GRID
    gy, gx = np.mgrid[0:W, 0:W]
    inside = points_in_polygon(
        (gx + 0.5).ravel(), (gy + 0.5).ravel(), ring).reshape(W, W)
    exp = world.copy()
    exp[~inside] = 0
    n_boundary = 0
    for tx in range(GRID):
        for ty in range(GRID):
            row = got[_cell(tx, ty)]
            tile = np.frombuffer(bytes(row["raster"]), np.uint8).reshape(T, T)
            ref = exp[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            assert (tile == ref).all(), (tx, ty)
            assert row["n_kept"] == int(
                inside[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].sum())
            n_boundary += bool(row["boundary"])
    # the ring crosses SOME tiles but the fast paths must fire too
    assert 0 < n_boundary < GRID * GRID


def test_cutline_interior_tile_is_byte_passthrough(spark):
    world = np.arange(W * W, dtype=np.int64).astype(np.uint8).reshape(W, W)
    ring = np.array([[1, 1], [W - 1, 2], [W - 2, W - 1], [2, W - 2]])
    got = {r["cell"]: r for r in
           cutline_crop(_mosaic(spark, world), ring, T).collect()}
    mid = got[_cell(1, 1)]  # deep interior: no edge near, all corners in
    assert not mid["boundary"] and mid["n_kept"] == T * T
    assert bytes(mid["raster"]) == world[T:2 * T, T:2 * T].tobytes()


def test_cutline_poison_and_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(_cell(0, 0), b"short")], columns=["cell", "raster"]))
    row = cutline_crop(df, [[1, 1], [9, 2], [5, 9]], T).collect()[0]
    assert row["raster"] is None and row["n_kept"] == -1
    try:
        cutline_crop(df, [[0, 0], [1, 1]], T)
        raise AssertionError("2-point ring accepted")
    except ValueError:
        pass


def test_cutline_null_and_disjoint_corrupt_poison(spark):
    ring = [[1, 1], [9, 2], [5, 9]]  # bbox within tile (0,0)
    rows = [(_cell(0, 0), None),          # NULL payload near the ring
            (_cell(3, 3), b"short")]      # corrupt AND bbox-disjoint
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "raster"]),
        "cell long, raster binary")
    got = {r["cell"]: r for r in cutline_crop(df, ring, T).collect()}
    for c in (_cell(0, 0), _cell(3, 3)):
        assert got[c]["n_kept"] == -1 and got[c]["raster"] is None, c


def test_cutline_boundary_fraction_falls_with_raster_size(spark):
    # THE scale claim: per-pixel work is O(perimeter) of O(area) tiles.
    # Same ring shape scaled with the world: boundary tiles grow ~4x
    # between a 4x4 and a 16x16 grid while total tiles grow 16x, so
    # the boundary FRACTION must fall by ~half or better.
    fracs = {}
    for grid in (4, 16):
        w = T * grid
        s = w / 64.0
        ring = [[5 * s, 3 * s], [58 * s, 13 * s], [40 * s, 62 * s], [9 * s, 50 * s]]
        rows = [((4 << 52) + (tx << 26) + ty, bytes(T * T))
                for tx in range(grid) for ty in range(grid)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["cell", "raster"]),
            "cell long, raster binary")
        out = cutline_crop(df, ring, T).collect()
        nb = sum(bool(r["boundary"]) for r in out)
        fracs[grid] = nb / len(out)
    assert fracs[16] <= fracs[4] / 2, fracs
