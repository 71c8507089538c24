"""transform_points (ogr2ogr -t_srs verb): Column-backend parity with
the numpy backend, composition through EPSG:4326, plan-time failure
for unknown SRS."""

import pandas as pd
import pytest


def test_transform_points_matches_numpy_backend_and_composes(spark):
    from gdal_drivers_spark.core.srs import as_plane, get_transform
    from gdal_drivers_spark.operators.spatial_join import transform_points

    pdf = pd.DataFrame({"k": range(50),
                        "x": [12.0 + i * 0.05 for i in range(50)],
                        "y": [-60.0 + i * 2.3 for i in range(50)]})
    df = spark.createDataFrame(pdf)
    # direct UTM and the composed UTM->WebMercator hop, vs NP_OPS.
    # ~1-ulp tolerance: numpy's VECTORIZED trig (SIMD) differs from the
    # JVM's scalar libm at the last bit (memory/BENCH.md platform note
    # — the engine's bit-parity contract is Spark↔DuckDB, both scalar)
    from math import isclose
    for dst in ("EPSG:32633", "EPSG:3857"):
        got = transform_points(df, "EPSG:4326", dst).orderBy("k").collect()
        tf = as_plane(get_transform("EPSG:4326", dst))
        ex, ey = tf.np_xy(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        for i, r in enumerate(got):
            assert isclose(r["tx"], ex[i], rel_tol=1e-12), (dst, i)
            assert isclose(r["ty"], ey[i], rel_tol=1e-12), (dst, i)
    comp = transform_points(df.withColumnRenamed("x", "e"), "EPSG:32633",
                            "EPSG:3857", x="e")
    assert "tx" in comp.columns  # composition through 4326 resolves
    with pytest.raises(ValueError):
        transform_points(df, "EPSG:4326", "EPSG:9999")


def test_transform_points_in_place_output_names(spark):
    # out_x == x must not feed transformed x into y's expression
    from gdal_drivers_spark.core.srs import as_plane, get_transform
    from gdal_drivers_spark.operators.spatial_join import transform_points

    pdf = pd.DataFrame({"x": [12.5, 14.0], "y": [45.0, -30.0]})
    df = spark.createDataFrame(pdf)
    got = transform_points(df, "EPSG:4326", "EPSG:32633",
                           out_x="x", out_y="y").collect()
    tf = as_plane(get_transform("EPSG:4326", "EPSG:32633"))
    ex, ey = tf.np_xy(pdf["x"].to_numpy(), pdf["y"].to_numpy())
    from math import isclose
    for i, r in enumerate(got):
        assert isclose(r["x"], ex[i], rel_tol=1e-12)
        assert isclose(r["y"], ey[i], rel_tol=1e-12)
