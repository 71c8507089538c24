"""Pansharpen (weighted Brovey) parity vs a scalar reference under the
pinned integer rule, zero-denominator rule, and poison rows."""

import numpy as np
import pandas as pd
import pytest

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.multimodal import pansharpen
from gdal_drivers_spark.sources.synth import pattern


def _frame(spark, arrays, ids=None):
    rows = [(ids[i] if ids else str(i), codecs.encode_raw(a),
             a.shape[1], a.shape[0], "raw") for i, a in enumerate(arrays)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"]))


def test_pansharpen_matches_scalar_brovey(spark):
    rng = np.random.default_rng(13)
    ms = rng.integers(0, 256, (10, 8, 3)).astype(np.uint8)
    ms[0, 0] = 0  # zero pseudo-pan pixel
    p = rng.integers(0, 256, (10, 8, 1)).astype(np.uint8)
    w = (1, 2, 1)
    out = pansharpen(_frame(spark, [ms]), _frame(spark, [p]), w).collect()[0]
    assert out["ok"]
    got = codecs.decode(bytes(out["bytes"])).astype(np.int64)
    mi, pi = ms.astype(np.int64), p.astype(np.int64)
    den = mi[:, :, 0] * 1 + mi[:, :, 1] * 2 + mi[:, :, 2] * 1
    for b in range(3):
        exp = np.where(den > 0,
                       mi[:, :, b] * pi[:, :, 0] * 4 // np.maximum(den, 1), 0)
        assert (got[:, :, b] == np.clip(exp, 0, 255)).all(), b
    assert (got[0, 0] == 0).all()


def test_pansharpen_poison_and_validation(spark):
    ms = pattern(8, 8, 3, 5)
    good_p = pattern(8, 8, 1, 9)
    wrong_p = pattern(4, 4, 1, 9)
    fms = _frame(spark, [ms, ms], ids=["a", "b"])
    fp = _frame(spark, [good_p, wrong_p], ids=["a", "b"])
    got = {r["image_id"]: r for r in pansharpen(fms, fp).collect()}
    assert got["a"]["ok"]
    assert not got["b"]["ok"] and got["b"]["bytes"] is None  # grid mismatch
    with pytest.raises(ValueError):
        pansharpen(fms, fp, weights=(1, 0, 1))
    # 2 weights against 3 bands: row poisons
    row = pansharpen(_frame(spark, [ms]), _frame(spark, [good_p]),
                     weights=(1, 1)).collect()[0]
    assert not row["ok"]
