"""gdal_calc band algebra: AST whitelist enforcement (never eval),
vectorized-vs-scalar parity for every supported construct, saturation,
and the row-poison rules (shape mismatch, corrupt operand, missing
join key)."""

import numpy as np
import pandas as pd
import pytest

from gdal_drivers_spark.core import codecs
from gdal_drivers_spark.operators.calc import band_calc, compile_calc
from gdal_drivers_spark.sources.synth import pattern


def _frame(spark, arrays, ids=None):
    rows = [
        (ids[i] if ids else str(i), codecs.encode_raw(a),
         a.shape[1], a.shape[0], "raw")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"]))


def test_compile_calc_matches_numpy_semantics():
    a = np.arange(-8, 8, dtype=np.int64).reshape(4, 4)
    b = np.arange(16, dtype=np.int64).reshape(4, 4) % 5 + 1
    env = {"A": a, "B": b}
    cases = [
        ("A + B * 2 - 3", a + b * 2 - 3),
        ("A // B", a // b),          # floors on negatives
        ("A % B", a % b),            # numpy sign rule
        ("-A + abs(A)", -a + np.abs(a)),
        ("(A >= 0) * 10 + (A < 0)", (a >= 0) * 10 + (a < 0)),
        ("where(A > B, minimum(A, 5), maximum(B, 3))",
         np.where(a > b, np.minimum(a, 5), np.maximum(b, 3))),
    ]
    for expr, exp in cases:
        got = compile_calc(expr, {"A", "B"})(env)
        assert (np.asarray(got) == exp).all(), expr


def test_compile_calc_rejects_everything_else():
    bad = [
        "__import__('os')", "A.x", "A[0]", "A ** 2", "A / B",
        "lambda: 1", "f(A)", "1.5 + A", "A < B < 3", "where(A)",
        "True", "C + 1", "minimum(A, b=2)",
    ]
    for expr in bad:
        with pytest.raises(ValueError):
            compile_calc(expr, {"A", "B"})


def test_band_calc_end_to_end_with_saturation(spark):
    a = pattern(8, 6, 1, 40)
    b = pattern(8, 6, 1, 200)
    out = band_calc(
        {"A": _frame(spark, [a]), "B": _frame(spark, [b])},
        "A * 2 + where(B > 128, B - 128, 0)",
    ).collect()
    assert len(out) == 1 and out[0]["ok"]
    ai, bi = a.astype(np.int64), b.astype(np.int64)
    exp = np.clip(ai * 2 + np.where(bi > 128, bi - 128, 0), 0, 255)
    got = codecs.decode(bytes(out[0]["bytes"])).astype(np.int64)
    assert (got == exp).all()
    assert out[0]["fmt"] == "raw" and out[0]["w"] == 8 and out[0]["h"] == 6


def test_band_calc_poison_and_join_rules(spark):
    a8 = pattern(8, 8, 1, 1)
    a4 = pattern(4, 4, 1, 2)
    b8 = pattern(8, 8, 1, 3)
    fa = _frame(spark, [a8, a4], ids=["x", "y"])
    fb = spark.createDataFrame(pd.DataFrame(
        [("x", codecs.encode_raw(b8), 8, 8, "raw"),
         ("y", b"\x00nope", 8, 8, "png"),
         ("z", codecs.encode_raw(b8), 8, 8, "raw")],
        columns=["image_id", "bytes", "w", "h", "fmt"]))
    got = {r["image_id"]: r for r in
           band_calc({"A": fa, "B": fb}, "A + B").collect()}
    assert set(got) == {"x", "y"}      # z has no A operand: inner join
    assert got["x"]["ok"]
    assert not got["y"]["ok"] and got["y"]["bytes"] is None


def test_band_calc_rejects_bad_operand_names(spark):
    f = _frame(spark, [pattern(4, 4, 1, 0)])
    with pytest.raises(ValueError):
        band_calc({"not an id": f}, "1 + 1")
    with pytest.raises(ValueError):
        band_calc({}, "1")
