"""Solid — virtual constant-valued raster (the Solid driver,
``/root/reference/gdal-drivers/solid.cpp``).

- per-band constant value with the exact dtype domain of
  ``solid.cpp:408-440`` (u8 u16 i16 u32 i32 f32 f64; anything else
  raises, ``solid.cpp:437-439``);
- a tile is generated once and served everywhere
  (``solid.cpp:149-156``, ``443-448``) — in Spark the constant payload
  is a literal column: Catalyst constant-folds it, executors replicate
  the reference's memcpy semantics for free;
- overview chain halves the raster until smaller than one tile
  (``solid.cpp:352-369``);
- ``schema_copy`` derives a Solid config from an existing dataset —
  CreateCopy (``solid.cpp:276-328``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {
    "u8": np.uint8, "u16": np.uint16, "i16": np.int16,
    "u32": np.uint32, "i32": np.int32, "f32": np.float32, "f64": np.float64,
}


def constant_tile(value: float, dtype: str, tile_px: int = 256) -> bytes:
    """The pregenerated constant block (solid.cpp:149-156)."""
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {dtype!r} (solid.cpp:437-439)")
    return np.full((tile_px, tile_px), value, _DTYPES[dtype]).tobytes()


def solid_tiles(
    spark: SparkSession,
    width: int,
    height: int,
    bands: list[tuple[float, str]],
    tile_px: int = 256,
) -> DataFrame:
    """One row per (band, tx, ty): the constant raster as a tile table.
    The payload is a literal — generated once on the driver, constant-
    folded by Catalyst, broadcast with the task binary."""
    tx = (width + tile_px - 1) // tile_px
    ty = (height + tile_px - 1) // tile_px
    grid = spark.range(tx * ty).select(
        (F.col("id") % tx).alias("tx"),
        (F.col("id").cast("long") / tx).cast("long").alias("ty"),
    )
    out = None
    for b, (value, dtype) in enumerate(bands):
        payload = constant_tile(value, dtype, tile_px)
        part = grid.select(
            F.lit(b).alias("band"),
            "tx",
            "ty",
            F.lit(bytearray(payload)).alias("tile"),
            F.lit(dtype).alias("dtype"),
            F.lit(tile_px).alias("ts"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def overview_sizes(width: int, height: int, tile_px: int = 256) -> list[tuple[int, int]]:
    """Halving chain until smaller than one tile (solid.cpp:352-369)."""
    sizes = []
    w, h = width, height
    while w > tile_px or h > tile_px:
        w = (w + 1) // 2
        h = (h + 1) // 2
        sizes.append((w, h))
    return sizes


def schema_copy(df: DataFrame, value: float = 0.0) -> dict:
    """CreateCopy analogue (solid.cpp:276-328): derive a solid config
    (band count + dtypes) from an existing tile table's schema."""
    bands = [r["band"] for r in df.select("band").distinct().collect()]
    dtypes = {r["band"]: r["dtype"] for r in df.select("band", "dtype").distinct().collect()}
    return {
        "bands": [(value, dtypes[b]) for b in sorted(bands)],
        "tile_px": df.select("ts").first()["ts"],
    }
