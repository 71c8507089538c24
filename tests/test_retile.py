"""gdal_retile parity: byte-exact re-cut for nesting (32→16) and
non-nesting (32→48) grids, sparse-mosaic nodata fill, poison
propagation to touched output tiles only, and the divisibility gate."""

import numpy as np
import pandas as pd
import pytest

from gdal_drivers_spark.operators.pyramid import retile

Z = 4


def _cell(tx, ty):
    return (Z << 52) + (tx << 26) + ty


def _mosaic(spark, world, t, skip=()):
    g = world.shape[0] // t
    rows = [
        (_cell(tx, ty), world[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t].tobytes())
        for tx in range(g) for ty in range(g) if (tx, ty) not in skip
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))


def _check(world, rows, to):
    g = world.shape[0] // to
    got = {r["cell"]: r for r in rows}
    assert len(got) == g * g
    for tx in range(g):
        for ty in range(g):
            r = got[_cell(tx, ty)]
            assert r["ok"]
            tile = np.frombuffer(bytes(r["tile"]), np.uint8).reshape(to, to)
            assert (tile == world[ty * to:(ty + 1) * to,
                                  tx * to:(tx + 1) * to]).all(), (tx, ty)


def test_retile_nesting_and_non_nesting(spark):
    rng = np.random.default_rng(7)
    world = rng.integers(0, 256, (96, 96)).astype(np.uint8)
    src = _mosaic(spark, world, 32)
    _check(world, retile(src, 32, 16, Z, (3, 3)).collect(), 16)
    out48 = retile(src, 32, 48, Z, (3, 3)).collect()
    _check(world, out48, 48)
    # non-nesting: every 48-tile is stitched from 4 source tiles
    assert all(r["n_src"] == 4 for r in out48)


def test_retile_sparse_poison_and_validation(spark):
    world = np.full((64, 64), 9, np.uint8)
    src = _mosaic(spark, world, 32, skip={(1, 1)})
    got = {r["cell"]: r for r in retile(src, 32, 16, Z, (2, 2), nodata=5).collect()}
    assert bytes(got[_cell(3, 3)]["tile"]) == bytes([5]) * 256  # missing region
    assert got[_cell(3, 3)]["n_src"] == 0
    assert bytes(got[_cell(0, 0)]["tile"]) == bytes([9]) * 256
    # one corrupt source tile poisons exactly the 4 outputs over it
    bad = spark.createDataFrame(pd.DataFrame(
        [(_cell(0, 0), b"bad"),
         (_cell(1, 0), world[0:32, 32:64].tobytes()),
         (_cell(0, 1), world[32:64, 0:32].tobytes()),
         (_cell(1, 1), world[32:64, 32:64].tobytes())],
        columns=["cell", "tile"]))
    got2 = {r["cell"]: r for r in retile(bad, 32, 16, Z, (2, 2)).collect()}
    poisoned = [c for c, r in got2.items() if not r["ok"]]
    assert sorted(poisoned) == sorted(
        _cell(tx, ty) for tx in range(2) for ty in range(2))
    assert all(got2[c]["tile"] is None for c in poisoned)
    with pytest.raises(ValueError):
        retile(bad, 32, 24, Z, (2, 2))  # 64 % 24 != 0


def test_retile_null_payload_poisons_not_crashes(spark):
    rows = [(_cell(0, 0), None),
            (_cell(1, 0), bytes(32 * 32)), (_cell(0, 1), bytes(32 * 32)),
            (_cell(1, 1), bytes(32 * 32))]
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "tile"]), "cell long, tile binary")
    got = {r["cell"]: r for r in retile(src, 32, 16, Z, (2, 2)).collect()}
    poisoned = sorted(c for c, r in got.items() if not r["ok"])
    assert poisoned == sorted(_cell(tx, ty) for tx in range(2) for ty in range(2))
