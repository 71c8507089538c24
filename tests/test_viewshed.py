"""gdal_viewshed parity: distributed observer-window gather vs a
scalar whole-raster sweep under the pinned integer ray rule, plus
semantic sanity (a wall blocks what's behind it, height helps),
edge/off-grid observers, and poison rows."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.operators.viewshed import viewshed

T, GRID, Z = 16, 4, 4
W = T * GRID


def _cell(tx, ty):
    return (Z << 52) + (tx << 26) + ty


def _tiles(spark, world):
    rows = [
        (_cell(tx, ty),
         world[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID) for ty in range(GRID)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))


def _obs(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(pts, columns=["oid", "px", "py"]))


def _scalar_viewshed(world, ox, oy, r, oh):
    side = 2 * r + 1
    vis = np.zeros((side, side), np.uint8)
    vis[r, r] = 1
    h0 = int(world[oy, ox]) + oh
    n_eval = 1
    for b in range(-r, r + 1):
        for a in range(-r, r + 1):
            if (a == 0 and b == 0) or a * a + b * b > r * r:
                continue
            x, y = ox + a, oy + b
            if not (0 <= x < W and 0 <= y < W):
                continue
            n_eval += 1
            n = max(abs(a), abs(b))
            sx, sy = (1 if a > 0 else -1), (1 if b > 0 else -1)
            blocked = False
            off_grid = False
            for i in range(1, n):
                xi = sx * ((2 * i * abs(a) + n) // (2 * n))
                yi = sy * ((2 * i * abs(b) + n) // (2 * n))
                gx, gy = ox + xi, oy + yi
                if not (0 <= gx < W and 0 <= gy < W):
                    off_grid = True
                    break
                if (int(world[gy, gx]) - h0) * n >= (int(world[y, x]) - h0) * i:
                    blocked = True
                    break
            if not blocked and not off_grid:
                vis[b + r, a + r] = 1
    return vis, n_eval


def test_viewshed_matches_scalar_sweep(spark):
    rng = np.random.default_rng(41)
    world = rng.integers(0, 60, (W, W)).astype(np.uint8)
    world[20:24, 10:30] = 255  # a wall
    pts = [(1, 18, 30), (2, 2, 2), (3, 60, 60)]  # mid, corner, corner
    r, oh = 12, 2
    got = {row["oid"]: row for row in
           viewshed(_obs(spark, pts), _tiles(spark, world), T, Z,
                    (GRID, GRID), r, observer_height=oh).collect()}
    for oid, ox, oy in pts:
        exp, n_eval = _scalar_viewshed(world, ox, oy, r, oh)
        row = got[oid]
        vis = np.frombuffer(bytes(row["vis"]), np.uint8).reshape(2 * r + 1, -1)
        assert (vis == exp).all(), oid
        assert row["n_visible"] == int(exp.sum())
        assert row["n_eval"] == n_eval
    # the wall throws a shadow: pixels straight behind it are invisible
    row1 = np.frombuffer(bytes(got[1]["vis"]), np.uint8).reshape(25, 25)
    assert row1[12, 12] == 1                # observer
    assert row1[0:4, 10:14].sum() == 0      # behind the wall (north)


def test_viewshed_off_grid_and_missing_tiles(spark):
    world = np.zeros((W, W), np.uint8)
    tiles = _tiles(spark, world)
    got = {r_["oid"]: r_ for r_ in viewshed(
        _obs(spark, [(1, -3, 8), (2, -500, 8), (3, 8, 8)]),
        tiles, T, Z, (GRID, GRID), 5).collect()}
    assert got[1]["n_visible"] == -1 and got[1]["vis"] is None  # poisoned
    assert got[2]["n_visible"] == 0 and got[2]["n_window"] == 0  # far away
    assert got[3]["n_visible"] == got[3]["n_eval"]  # flat: all visible
    # missing tile under the observer poisons
    holey = tiles.filter("cell != %d" % _cell(0, 0))
    row = viewshed(_obs(spark, [(9, 4, 4)]), holey, T, Z,
                   (GRID, GRID), 5).collect()[0]
    assert row["n_visible"] == -1


def test_viewshed_far_observer_gets_zero_raster_not_null(spark):
    world = np.zeros((W, W), np.uint8)
    r = 5
    row = viewshed(_obs(spark, [(1, -500, 8)]), _tiles(spark, world),
                   T, Z, (GRID, GRID), r).collect()[0]
    assert row["n_visible"] == 0
    assert bytes(row["vis"]) == bytes((2 * r + 1) ** 2)  # all-zero, not NULL
