"""Zonal statistics — per-zone aggregates of raster pixels.

The classic GDAL raster workflow (for each zone/polygon: count, sum,
min, max, mean of the pixels inside it), re-expressed so that PIXELS
NEVER SHUFFLE:

1. ``tile_stats``: each tile row reduces to (n_px, px_sum, px_min,
   px_max) in ONE Arrow hop — a narrow map, no shuffle; after it the
   frame is a few longs per tile regardless of tile size;
2. the tile-stat rows join the zone map on the cell id — a plain
   equi-join (zone maps are cell→zone products of ``rasterize`` /
   ``spatial_join``; AQE broadcasts them when small);
3. ``groupBy(zone)``: every aggregate combines (sum of sums, min of
   mins), so partial aggregation runs map-side and the shuffle
   carries one row per (task, zone).

At 100 TB the plan moves |tiles| stat rows (≈ 32 bytes each), not
pixels — the same discipline as the blend/pyramid operators. Nodata
pixels are excluded when ``nodata`` is given (count excludes them, so
mean = sum/count stays correct per zone).

Zone boundaries are cell-granular by construction: the reference's own
answer to sub-cell zones is quadtree descent until nodes are pure
(``mask.cpp:246-248``), i.e. refine the rasterized zone layer, not the
stats operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STAT_SCHEMA = "n_px long, px_sum long, px_min long, px_max long, px_ok boolean"


def tile_stats(
    tiles: DataFrame, tile_col: str = "tile", nodata: int | None = None
) -> DataFrame:
    """Append per-tile pixel statistics (one Arrow hop, narrow). Tile
    payloads go through the codec registry (magic sniff), so any
    registered format works; stats are shape-agnostic. With
    ``nodata``, pixels equal to it are excluded from all four stats;
    an all-nodata tile reports n_px=0 and neutral min/max (255/0).

    Poison policy (same as decode.decode_stats): a NULL or corrupt
    payload among 10^12 rows must mark ITS row (``px_ok=false``,
    neutral stats), never kill the stage."""

    @F.pandas_udf(f"struct<{_STAT_SCHEMA}>")
    def _stats(col: pd.Series) -> pd.DataFrame:
        import numpy as np

        from gdal_drivers_spark.core import codecs

        rows = []
        for b in col:
            try:
                px = codecs.decode(bytes(b)).ravel()
            except Exception:
                rows.append((0, 0, 255, 0, False))
                continue
            if nodata is not None:
                px = px[px != nodata]
            if px.size:
                rows.append(
                    (int(px.size), int(px.sum(dtype=np.int64)),
                     int(px.min()), int(px.max()), True)
                )
            else:
                rows.append((0, 0, 255, 0, True))
        return pd.DataFrame(
            rows, columns=["n_px", "px_sum", "px_min", "px_max", "px_ok"]
        )

    return tiles.withColumn("_s", _stats(F.col(tile_col))).select(
        *[c for c in tiles.columns if c != tile_col], "_s.*"
    )


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    cell: str = "cell",
    zone: str = "zone",
    tile_col: str = "tile",
    nodata: int | None = None,
) -> DataFrame:
    """Per-zone pixel statistics: ``tiles`` (cell, tile, …) × ``zones``
    (cell, zone). Output one row per zone: n_tiles (decodable tiles),
    n_bad_tiles (poison rows — counted, never fatal), n_px, px_sum,
    px_min, px_max, mean. A zone with zero countable pixels reports
    NULL min/max/mean — never the neutral fold elements (a min>max
    pair would be fabricated data). Cells absent from the zone map
    drop out (inner join), matching rasterized-zone semantics."""
    s = tile_stats(tiles, tile_col=tile_col, nodata=nodata)
    no_px = F.col("n_px") == 0
    return (
        s.join(zones, cell)
        .groupBy(zone)
        .agg(
            F.sum(F.col("px_ok").cast("long")).alias("n_tiles"),
            F.sum((~F.col("px_ok")).cast("long")).alias("n_bad_tiles"),
            F.sum("n_px").alias("n_px"),
            F.sum("px_sum").alias("px_sum"),
            F.min("px_min").alias("px_min"),
            F.max("px_max").alias("px_max"),
        )
        .withColumn("px_min", F.when(~no_px, F.col("px_min")))
        .withColumn("px_max", F.when(~no_px, F.col("px_max")))
        .withColumn(
            "mean",
            F.when(~no_px, F.col("px_sum") / F.col("n_px")),
        )
    )
