"""Palette quantization (rgb2pct/pct2rgb parity): nearest-entry
indexing vs a scalar argmin, the web-safe per-channel factorization,
tie pinning, LUT expansion round-trips, and the median-cut builder
(distributed histogram + driver cut) recovering an exactly-paletted
corpus losslessly."""

import numpy as np
import pandas as pd

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.multimodal import (
    build_palette_median_cut,
    color_histogram,
    pct2rgb,
    rgb2pct,
    websafe_palette,
)
from gdal_drivers_spark.sources.synth import pattern


def _images(spark, arrays):
    rows = [
        (str(i), codecs.encode_raw(a), a.shape[1], a.shape[0], "raw")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])
    )


def test_rgb2pct_websafe_matches_scalar_argmin(spark):
    pal = websafe_palette()
    imgs = [pattern(16, 16, 3, k * 37) for k in range(6)]
    out = {r["image_id"]: r for r in rgb2pct(_images(spark, imgs), pal).collect()}
    for i, img in enumerate(imgs):
        got = codecs.decode(bytes(out[str(i)]["bytes"]))[:, :, 0]
        # scalar argmin AND the cube factorization must both agree
        d2 = ((img.astype(np.int64)[:, :, None, :] - pal[None, None]) ** 2).sum(-1)
        exp = d2.argmin(axis=2)
        fact = (
            36 * ((img[:, :, 0].astype(np.int64) + 25) // 51)
            + 6 * ((img[:, :, 1].astype(np.int64) + 25) // 51)
            + ((img[:, :, 2].astype(np.int64) + 25) // 51)
        )
        assert (got == exp).all() and (exp == fact).all()
        assert out[str(i)]["ok"]


def test_rgb2pct_tie_breaks_to_lowest_index(spark):
    pal = np.array([[0, 0, 0], [10, 0, 0]])
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 5  # equidistant (25 vs 25)
    out = rgb2pct(_images(spark, [img]), pal).collect()[0]
    assert (codecs.decode(bytes(out["bytes"])) == 0).all()


def test_pct2rgb_roundtrip_and_poison(spark):
    pal = websafe_palette()
    idx = (pattern(8, 8, 1, 9).astype(np.int64) % 216).astype(np.uint8)
    rgb = pal[idx[:, :, 0]].astype(np.uint8)
    out = pct2rgb(_images(spark, [idx]), pal).collect()[0]
    assert out["ok"]
    assert (codecs.decode(bytes(out["bytes"])) == rgb).all()
    # quantizing an exactly-paletted RGB image recovers the indices
    back = rgb2pct(_images(spark, [rgb]), pal).collect()[0]
    assert (codecs.decode(bytes(back["bytes"]))[:, :, 0] == idx[:, :, 0]).all()
    # an index past the palette is poison, not garbage colors
    bad = np.full((4, 4, 1), 250, np.uint8)
    row = pct2rgb(_images(spark, [bad]), pal).collect()[0]
    assert not row["ok"] and row["bytes"] is None


def test_color_histogram_counts_and_poison(spark):
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = (255, 255, 255)
    rows = [("0", codecs.encode_raw(img), 4, 4, "raw"),
            ("1", b"\x00nope", 4, 4, "raw")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"]))
    got = color_histogram(df, bits=8).collect()
    by_ok = {}
    for r in got:
        by_ok.setdefault(r["ok"], []).append(r)
    assert len(by_ok[False]) == 1  # the poison census row
    counts = {(r["r"], r["g"], r["b"]): r["n_px"] for r in by_ok[True]}
    assert counts == {(0, 0, 0): 15, (255, 255, 255): 1}


def test_median_cut_recovers_exact_palette(spark):
    # 4 distinct colors, bits=8 → the cut isolates each color exactly
    colors = np.array([[10, 200, 30], [200, 10, 30], [60, 60, 220], [5, 5, 5]])
    arrays = []
    rng = np.random.default_rng(7)
    for _ in range(3):
        pick = rng.integers(0, 4, (8, 8))
        arrays.append(colors[pick].astype(np.uint8))
    pal = build_palette_median_cut(_images(spark, arrays), ncolors=4, bits=8)
    assert sorted(map(tuple, pal)) == sorted(map(tuple, colors))
    # end-to-end: quantize + expand is lossless on the paletted corpus
    q = rgb2pct(_images(spark, arrays), pal)
    back = {r["image_id"]: r for r in pct2rgb(q, pal).collect()}
    for i, a in enumerate(arrays):
        assert (codecs.decode(bytes(back[str(i)]["bytes"])) == a).all()


def test_median_cut_is_deterministic(spark):
    imgs = [pattern(16, 16, 3, k * 11) for k in range(4)]
    p1 = build_palette_median_cut(_images(spark, imgs), ncolors=16)
    p2 = build_palette_median_cut(_images(spark, imgs), ncolors=16)
    assert (p1 == p2).all()
    assert len(p1) == 16
