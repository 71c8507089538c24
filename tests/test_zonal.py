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


def test_zonal_histogram_and_mode_match_numpy(spark):
    """Categorical zonal: per-zone class counts == numpy bincount over
    the stitched zone pixels; mode == highest count with ties to the
    LOWEST value; a corrupt tile surfaces as one NULL-value row whose
    n_px counts bad TILES and is excluded from the vote."""
    from gdal_drivers_spark.operators.zonal import zonal_histogram, zonal_mode

    px = 16
    rows, imgs = [], {}
    for i in range(12):
        img = pattern(px, px, 1, i * 31) // 64 * 64  # 4 classes
        imgs[i] = img.ravel()
        rows.append((i, (4 << 52) + i % 4, codecs.encode_raw(img)))
    rows.append((99, (4 << 52) + 1, b"\x00corrupt"))  # poison in zone z1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["tid", "cell", "tile"]))
    zones = spark.createDataFrame(
        [((4 << 52) + c, f"z{c % 2}") for c in range(4)], "cell long, zone string"
    )

    exp = {}
    for i, v in imgs.items():
        z = f"z{(i % 4) % 2}"
        for val in v:
            exp[(z, int(val))] = exp.get((z, int(val)), 0) + 1

    got = {(r["zone"], r["value"]): r["n_px"]
           for r in zonal_histogram(df, zones).collect()}
    assert got.pop(("z1", None)) == 1          # one bad tile, counted
    assert got == exp

    exp_mode = {}
    for z in ("z0", "z1"):
        cand = [(n, -val) for (zz, val), n in exp.items() if zz == z]
        n, negv = max(cand)
        exp_mode[z] = (-negv, n)
    got_mode = {r["zone"]: (r["mode_value"], r["n_px"])
                for r in zonal_mode(df, zones).collect()}
    assert got_mode == exp_mode


def test_zonal_histogram_all_nodata_is_not_poison(spark):
    """'Sparse absent' vs 'present but corrupt' (house rule): an
    all-nodata tile contributes no classes but must NOT inflate the
    poison count; the NULL-value row counts only undecodable tiles."""
    from gdal_drivers_spark.operators.zonal import zonal_histogram

    px = 8
    img = pattern(px, px, 1, 5) // 64 * 64
    rows = [
        (0, (4 << 52), codecs.encode_raw(img)),                      # normal
        (1, (4 << 52), codecs.encode_raw(np.zeros((px, px, 1), np.uint8))),  # all nodata
        (2, (4 << 52), b"\x00corrupt"),                              # poison
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["tid", "cell", "tile"]))
    zones = spark.createDataFrame([((4 << 52), "z0")], "cell long, zone string")
    got = {r["value"]: r["n_px"]
           for r in zonal_histogram(df, zones, nodata=0).collect()}
    assert got.pop(None) == 1  # ONLY the corrupt tile
    vals, cnts = np.unique(img[img != 0], return_counts=True)
    assert got == {int(v): int(n) for v, n in zip(vals, cnts)}


def test_raster_stats_matches_numpy(spark):
    """gdalinfo -stats: global moments vs numpy over the stitched
    pixels, mean/stddev compared BIT-EXACTLY via the same IEEE
    expression (sum/n, sqrt(sq/n - mean²) — single rounded ops)."""
    import math

    from gdal_drivers_spark.operators.zonal import raster_stats

    df = _tiles_df(spark)
    allpx = np.concatenate(
        [pattern(16, 16, 1, i * 31).ravel() for i in range(24)]
    ).astype(np.int64)
    row = raster_stats(df).collect()[0]
    n, s, sq = allpx.size, int(allpx.sum()), int((allpx * allpx).sum())
    mean = s / n
    assert row["n_tiles"] == 24 and row["n_bad_tiles"] == 0
    assert row["n_px"] == n and row["px_sum"] == s
    assert row["px_min"] == int(allpx.min()) and row["px_max"] == int(allpx.max())
    assert row["mean"] == mean
    assert row["stddev"] == math.sqrt(sq / n - mean * mean)

    # nodata exclusion + poison accounting + empty-raster NULLs
    rows = [(0, 0, b"\x00corrupt"),
            (1, 1, codecs.encode_raw(np.zeros((4, 4, 1), np.uint8)))]
    df2 = spark.createDataFrame(pd.DataFrame(rows, columns=["tid", "cell", "tile"]))
    r2 = raster_stats(df2, nodata=0).collect()[0]
    assert r2["n_bad_tiles"] == 1 and r2["n_tiles"] == 1
    assert r2["n_px"] == 0
    assert r2["px_min"] is None and r2["px_max"] is None
    assert r2["mean"] is None and r2["stddev"] is None


def test_raster_histogram_matches_numpy(spark):
    from gdal_drivers_spark.operators.zonal import raster_histogram

    df = _tiles_df(spark)
    allpx = np.concatenate(
        [pattern(16, 16, 1, i * 31).ravel() for i in range(24)])
    got = {r["value"]: r["n_px"] for r in raster_histogram(df).collect()}
    vals, cnts = np.unique(allpx, return_counts=True)
    assert got == {int(v): int(c) for v, c in zip(vals, cnts)}
    # poison bucket: corrupt tile counts as ONE in the NULL row
    rows = [(0, 0, b"\x00corrupt"),
            (1, 1, codecs.encode_raw(pattern(8, 8, 1, 3)))]
    df2 = spark.createDataFrame(pd.DataFrame(rows, columns=["tid", "cell", "tile"]))
    got2 = {r["value"]: r["n_px"] for r in raster_histogram(df2).collect()}
    assert got2.pop(None) == 1
    v2, c2 = np.unique(pattern(8, 8, 1, 3), return_counts=True)
    assert got2 == {int(v): int(c) for v, c in zip(v2, c2)}


def test_to_xyz_export_skip_and_poison(spark):
    import pandas as pd

    from gdal_drivers_spark.operators.zonal import to_xyz

    t = 8
    a = (np.arange(t * t) % 5).astype(np.uint8).reshape(t, t)
    rows = [((4 << 52) + (0 << 26) + 0, a.tobytes()),
            ((4 << 52) + (1 << 26) + 0, None)]
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "tile"]), "cell long, tile binary")
    got = to_xyz(tiles, t).collect()
    pts = {(r["gx"], r["gy"]): r["v"] for r in got if r["gx"] >= 0}
    assert len(pts) == t * t
    for y in range(t):
        for x in range(t):
            assert pts[(x, y)] == a[y, x]
    assert sum(1 for r in got if r["gx"] == -1) == 1  # poison row
    skipped = to_xyz(tiles, t, skip_value=0).collect()
    assert sum(1 for r in skipped if r["gx"] >= 0) == int((a != 0).sum())
