"""gdal_rasterize parity: tiled burn equals whole-raster scalar paint,
overlaps resolve last-wins in fid order, untouched tiles keep -init,
degenerate rings are skipped."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.core.geometry import points_in_polygon
from gdal_drivers_spark.operators.rasterize import burn_features

T, GRID, Z = 16, 4, 4
W = T * GRID


def _cell(tx, ty):
    return (Z << 52) + (tx << 26) + ty


def _features(spark, feats):
    pdf = pd.DataFrame(
        [(fid, [[float(x), float(y)] for x, y in ring], v)
         for fid, ring, v in feats],
        columns=["fid", "ring", "v"],
    )
    return spark.createDataFrame(
        pdf, "fid long, ring array<array<double>>, v long")


FEATS = [
    (1, [(3, 2), (40, 5), (30, 37), (5, 28)], 50),
    (2, [(20, 18), (59, 23), (50, 58), (24, 55)], 200),  # overlaps fid 1
    (3, [(1, 50), (12, 51), (6, 62)], 99),
]


def test_burn_matches_scalar_paint_last_wins(spark):
    got = {r["cell"]: r for r in
           burn_features(_features(spark, FEATS), T, Z, (GRID, GRID),
                         init=7).collect()}
    assert len(got) == GRID * GRID
    exp = np.full((W, W), 7, np.uint8)
    burned = np.zeros((W, W), bool)
    gy, gx = np.mgrid[0:W, 0:W]
    for fid, ring, v in sorted(FEATS):  # ascending fid = paint order
        inside = points_in_polygon(
            (gx + 0.5).ravel(), (gy + 0.5).ravel(),
            np.asarray(ring, np.float64)).reshape(W, W)
        exp[inside] = v
        burned |= inside
    assert 0 < burned.sum() < W * W
    for tx in range(GRID):
        for ty in range(GRID):
            row = got[_cell(tx, ty)]
            tile = np.frombuffer(bytes(row["raster"]), np.uint8).reshape(T, T)
            sl = np.s_[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            assert (tile == exp[sl]).all(), (tx, ty)
            assert row["n_burned"] == int(burned[sl].sum())
    # overlap region really took fid 2's value
    assert (exp == 200).sum() > 0 and (exp == 50).sum() > 0


def test_burn_empty_and_degenerate(spark):
    feats = [(1, [(2, 2), (9, 3)], 50),  # 2-point ring: dropped
             (2, [(2, 2), (9, 3), (5, 9)], 80)]
    got = {r["cell"]: r for r in
           burn_features(_features(spark, feats), T, Z, (GRID, GRID),
                         init=3).collect()}
    far = got[_cell(3, 3)]
    assert far["n_features"] == 0 and far["n_burned"] == 0
    assert bytes(far["raster"]) == bytes([3]) * (T * T)
    near = got[_cell(0, 0)]
    assert near["n_features"] == 1  # only the valid triangle landed
    tile = np.frombuffer(bytes(near["raster"]), np.uint8)
    assert set(np.unique(tile)) <= {3, 80}


def test_burn_off_grid_feature_is_ignored(spark):
    # a feature fully outside the grid must not fan out (Spark's
    # sequence(lo, hi) counts DOWN when lo > hi) nor land phantom rows
    feats = [(1, [(2, 2), (9, 3), (5, 9)], 80),
             (2, [(10_000, 3), (10_009, 4), (10_004, 11)], 200)]
    got = {r["cell"]: r for r in
           burn_features(_features(spark, feats), T, Z, (GRID, GRID)).collect()}
    assert len(got) == GRID * GRID
    assert got[_cell(0, 0)]["n_features"] == 1
    assert all(r["n_features"] <= 1 for r in got.values())
    assert not any((np.frombuffer(bytes(r["raster"]), np.uint8) == 200).any()
                   for r in got.values())


def test_burn_duplicate_fid_is_deterministic(spark):
    # same fid, overlapping: the (fid, v, bbox) lexsort pins the winner
    # (here the v=200 feature sorts after v=50 and paints last)
    sq1 = [(2, 2), (11, 3), (10, 11), (3, 10)]
    sq2 = [(4, 4), (13, 5), (12, 13), (5, 12)]
    feats_ab = [(7, sq1, 50), (7, sq2, 200)]
    feats_ba = [(7, sq2, 200), (7, sq1, 50)]
    a = burn_features(_features(spark, feats_ab), T, Z, (1, 1)).collect()[0]
    b = burn_features(_features(spark, feats_ba), T, Z, (1, 1)).collect()[0]
    assert bytes(a["raster"]) == bytes(b["raster"])
    overlap = np.frombuffer(bytes(a["raster"]), np.uint8).reshape(T, T)[8, 8]
    assert overlap == 200


def test_burn_into_composites_with_base(spark):
    from gdal_drivers_spark.operators.rasterize import burn_into

    rng = np.random.default_rng(31)
    world = rng.integers(0, 200, (W, W)).astype(np.uint8)
    # base mosaic: tile (3,3) missing, tile (3,0) corrupt
    base_rows = [
        (_cell(tx, ty),
         b"corrupt" if (tx, ty) == (3, 0)
         else world[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID) for ty in range(GRID) if (tx, ty) != (3, 3)
    ]
    base = spark.createDataFrame(
        pd.DataFrame(base_rows, columns=["cell", "raster"]),
        "cell long, raster binary")
    got = {r["cell"]: r for r in
           burn_into(base, _features(spark, FEATS), T, Z,
                     (GRID, GRID)).collect()}
    assert len(got) == GRID * GRID
    exp = world.copy()
    burned = np.zeros((W, W), bool)
    gy, gx = np.mgrid[0:W, 0:W]
    for fid, ring, v in sorted(FEATS):
        inside = points_in_polygon(
            (gx + 0.5).ravel(), (gy + 0.5).ravel(),
            np.asarray(ring, np.float64)).reshape(W, W)
        exp[inside] = v
        burned |= inside
    for tx in range(GRID):
        for ty in range(GRID):
            row = got[_cell(tx, ty)]
            if (tx, ty) == (3, 0):
                assert not row["ok"] and row["raster"] is None
                continue
            tile = np.frombuffer(bytes(row["raster"]), np.uint8).reshape(T, T)
            if (tx, ty) == (3, 3):  # no base tile: burn output over init
                ref = np.where(burned, exp, 0)[
                    ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            else:
                ref = exp[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            assert (tile == ref).all() and row["ok"], (tx, ty)


def test_burn_into_flags_base_outside_universe(spark):
    from gdal_drivers_spark.operators.rasterize import burn_into

    # base packed at z=2 against a z=4 universe: every base cell is
    # outside the declared grid and must surface as poison, and the
    # in-universe cells still compose (burn over init)
    base = spark.createDataFrame(
        pd.DataFrame([((2 << 52) + (0 << 26) + 0, bytes(T * T))],
                     columns=["cell", "raster"]),
        "cell long, raster binary")
    got = burn_into(base, _features(spark, FEATS), T, Z,
                    (GRID, GRID)).collect()
    poison = [r for r in got if not r["ok"]]
    assert len(poison) == 1 and poison[0]["cell"] == (2 << 52)
    assert len(got) == GRID * GRID + 1


def test_burn_features_mask_only_on_request(spark):
    out = burn_features(_features(spark, FEATS), T, Z, (GRID, GRID))
    assert "mask" not in out.columns
    out2 = burn_features(_features(spark, FEATS), T, Z, (GRID, GRID),
                         emit_mask=True)
    assert "mask" in out2.columns
