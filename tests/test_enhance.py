"""Enhancement parity: equalize's pinned integer CDF rule vs a scalar
reference, scale's linear remap (auto per-band and fixed src), constant
bands, clipping, and poison rows."""

import numpy as np
import pandas as pd
import pytest

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.multimodal import equalize_images, scale_images
from gdal_drivers_spark.sources.synth import pattern


def _images(spark, arrays):
    rows = [(str(i), codecs.encode_raw(a), a.shape[1], a.shape[0], "raw")
            for i, a in enumerate(arrays)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"]))


def _scalar_equalize(band):
    n = band.size
    cdf = np.cumsum(np.bincount(band.ravel(), minlength=256).astype(np.int64))
    cdf_min = int(cdf[band.min()])
    if n == cdf_min:
        return np.zeros_like(band)
    lut = (cdf - cdf_min) * 255 // (n - cdf_min)
    return lut[band].astype(np.uint8)


def test_equalize_matches_scalar_per_band(spark):
    rng = np.random.default_rng(11)
    imgs = [rng.integers(30, 200, (12, 9, 3)).astype(np.uint8),
            pattern(16, 16, 1, 77)]
    out = {r["image_id"]: r for r in equalize_images(_images(spark, imgs)).collect()}
    for i, img in enumerate(imgs):
        got = codecs.decode(bytes(out[str(i)]["bytes"]))
        for b in range(img.shape[2]):
            assert (got[:, :, b] == _scalar_equalize(img[:, :, b])).all()
        assert out[str(i)]["ok"] and out[str(i)]["fmt"] == "raw"
    # equalized extremes: min present value -> 0, max -> 255
    g0 = codecs.decode(bytes(out["0"]["bytes"]))
    assert g0.min() == 0 and g0.max() == 255


def test_equalize_constant_band_and_poison(spark):
    const = np.full((6, 6, 1), 42, np.uint8)
    df = spark.createDataFrame(pd.DataFrame(
        [("c", codecs.encode_raw(const), 6, 6, "raw"),
         ("bad", b"\x01nope", 6, 6, "jpg")],
        columns=["image_id", "bytes", "w", "h", "fmt"]))
    got = {r["image_id"]: r for r in equalize_images(df).collect()}
    assert (codecs.decode(bytes(got["c"]["bytes"])) == 0).all()
    assert not got["bad"]["ok"] and got["bad"]["bytes"] is None


def test_scale_auto_and_fixed(spark):
    img = np.arange(100, dtype=np.int64).reshape(10, 10, 1)
    img = (img + 50).astype(np.uint8)  # values 50..149
    out = scale_images(_images(spark, [img])).collect()[0]
    got = codecs.decode(bytes(out["bytes"]))[:, :, 0].astype(np.int64)
    exp = (img[:, :, 0].astype(np.int64) - 50) * 255 // 99
    assert (got == exp).all() and got.min() == 0 and got.max() == 255
    # fixed src range clips outside values
    out2 = scale_images(_images(spark, [img]), src=(100, 120),
                        dst=(10, 20)).collect()[0]
    got2 = codecs.decode(bytes(out2["bytes"]))[:, :, 0].astype(np.int64)
    exp2 = 10 + (np.clip(img[:, :, 0].astype(np.int64), 100, 120) - 100) * 10 // 20
    assert (got2 == exp2).all()


def test_scale_validation(spark):
    f = _images(spark, [np.zeros((2, 2, 1), np.uint8)])
    with pytest.raises(ValueError):
        scale_images(f, dst=(200, 100))
    with pytest.raises(ValueError):
        scale_images(f, src=(5, 5))
