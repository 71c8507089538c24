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

# per-band color interpretation (solid.cpp:83/201-202 carries
# band.colorInterpretation through configs; names = GDAL's GCI set)
COLORINTERPS = {
    "undefined", "gray", "palette", "red", "green", "blue", "alpha",
    "hue", "saturation", "lightness", "cyan", "magenta", "yellow", "black",
}


def _band_spec(spec) -> tuple[float, str, str]:
    """(value, dtype[, colorinterp]) → normalized triple."""
    if len(spec) == 2:
        value, dtype = spec
        ci = "undefined"
    else:
        value, dtype, ci = spec
    if ci not in COLORINTERPS:
        raise ValueError(f"unknown colorinterp {ci!r} (GDAL GCI names)")
    return value, dtype, ci


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
    folded by Catalyst, broadcast with the task binary. Band specs are
    (value, dtype) or (value, dtype, colorinterp) — the per-band color
    interpretation of solid.cpp:201-202, default 'undefined'."""
    tx = (width + tile_px - 1) // tile_px
    ty = (height + tile_px - 1) // tile_px
    grid = spark.range(tx * ty).select(
        (F.col("id") % tx).alias("tx"),
        (F.col("id").cast("long") / tx).cast("long").alias("ty"),
    )
    out = None
    for b, spec in enumerate(bands):
        value, dtype, ci = _band_spec(spec)
        payload = constant_tile(value, dtype, tile_px)
        part = grid.select(
            F.lit(b).alias("band"),
            "tx",
            "ty",
            F.lit(bytearray(payload)).alias("tile"),
            F.lit(dtype).alias("dtype"),
            F.lit(ci).alias("colorinterp"),
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


def schema_copy(
    df: DataFrame, value: float = 0.0, colors: list[float] | None = None
) -> dict:
    """CreateCopy analogue (solid.cpp:276-328): derive a solid config
    (band count + dtypes + per-band colorinterp) from an existing tile
    table's schema. ``colors`` mirrors the COLOR creation options
    (solid.cpp:286-300): per-band constant values in band order,
    defaulting to ``value`` (the reference defaults each to 0) —
    extras ignored, missing entries fall back, exactly like
    CSLFetchNameValueMultiple iteration. Color interpretation is
    COPIED from the source's ``colorinterp`` column when present
    (solid.cpp:318-321 reads it off each source band), else
    'undefined'."""
    cols = ["band", "dtype"] + (["colorinterp"] if "colorinterp" in df.columns else [])
    meta = {r["band"]: r for r in df.select(*cols).distinct().collect()}
    bands = sorted(meta)
    return {
        "bands": [
            (
                colors[i] if colors is not None and i < len(colors) else value,
                meta[b]["dtype"],
                meta[b]["colorinterp"] if "colorinterp" in df.columns else "undefined",
            )
            for i, b in enumerate(bands)
        ],
        "tile_px": df.select("ts").first()["ts"],
    }
