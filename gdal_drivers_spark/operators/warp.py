"""Warp — grid resample / reprojection of tiled rasters.

The reference's Python binding exposes ``warp()``: derive an output
grid, then pull every source pixel through the inverse transform with
nearest or bilinear sampling
(``/root/reference/gdal-drivers/python/gdaldriversmodule.cpp:182-204``,
grid derivation ``:198-201``). In-engine scope matches the reference's
effective use: affine source↔target transforms (orthogonal
geotransforms — rotation rejected exactly like ``blender.cpp:133-139``);
general curvilinear reprojection is out of scope.

Distributed shape: each *output* tile needs the source pixels its
inverse-transformed footprint covers. That is the same tile↔source
range join as blending: output tiles are exploded to covering *source*
cells (JVM arithmetic), joined with the source tiles, and a grouped
Arrow UDF gathers: for every output pixel center, inverse-affine to
source coords, numpy fancy-index (nearest) or 4-tap blend (bilinear).
A source tile contributes to every output tile it overlaps — the halo
problem is solved by the join fan-out, not by padding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import codecs
from ..core.geometry import gt_apply, gt_invert, gt_orthogonal

WARP_SCHEMA = "ocx long, ocy long, tile binary, ts int, n_src int"


def warp_tiles(
    src_tiles: DataFrame,
    src_gt: np.ndarray,
    dst_gt: np.ndarray,
    dst_shape: tuple[int, int],
    tile_px: int = 256,
    method: str = "nearest",
    nodata: float = 0.0,
) -> DataFrame:
    """Resample source tiles onto the destination grid.

    ``src_tiles`` rows: (scx:long, scy:long, tile:binary raw) — source
    tile grid coordinates (tile (scx,scy) holds source pixels
    [scx*ts, (scx+1)*ts) × [scy*ts, (scy+1)*ts)).

    ``src_gt``/``dst_gt``: 6-term geotransforms (pixel→world); must be
    orthogonal (no rotation) — rejected otherwise, matching the
    reference's compatibility gate.

    Output: one row per destination tile (ocx, ocy).
    """
    if not (gt_orthogonal(src_gt) and gt_orthogonal(dst_gt)):
        raise ValueError("warp requires orthogonal geotransforms (blender.cpp:133-139)")
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resample method {method!r}")

    dst_h, dst_w = dst_shape
    tiles_x = (dst_w + tile_px - 1) // tile_px
    tiles_y = (dst_h + tile_px - 1) // tile_px
    src_inv = gt_invert(src_gt)

    # destination tile corners → world → source pixel bbox → covering
    # source tiles, computed on the driver once per output tile grid
    # (tiny: the tile *grid*, not the tiles) — then exploded to a join
    spark = src_tiles.sparkSession
    rows = []
    for ocy in range(tiles_y):
        for ocx in range(tiles_x):
            # world bbox of this destination tile (pixel corners)
            xs, ys = gt_apply(
                dst_gt,
                np.array([ocx * tile_px, (ocx + 1) * tile_px], float),
                np.array([ocy * tile_px, (ocy + 1) * tile_px], float),
            )
            # into source pixel coords
            scol, srow = gt_apply(src_inv, xs, ys)
            c0, c1 = int(np.floor(scol.min())) - 1, int(np.ceil(scol.max())) + 1
            r0, r1 = int(np.floor(srow.min())) - 1, int(np.ceil(srow.max())) + 1
            for scx in range(max(c0 // tile_px, 0), c1 // tile_px + 1):
                for scy in range(max(r0 // tile_px, 0), r1 // tile_px + 1):
                    rows.append((ocx, ocy, scx, scy))
    if not rows:
        # destination entirely outside source coverage: sparse-tile
        # semantics — absent tiles, not an error (the missing-tile rule
        # of mbtiles.cpp:188-192)
        return spark.createDataFrame([], WARP_SCHEMA)
    cover = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ocx", "ocy", "scx", "scy"])
    )

    joined = cover.join(src_tiles, ["scx", "scy"], "inner")

    bilinear = method == "bilinear"
    sgt = tuple(float(v) for v in src_gt)
    dgt = tuple(float(v) for v in dst_gt)

    def _warp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ocx, ocy = int(key[0]), int(key[1])
        # assemble the needed source window from contributed tiles
        scxs = pdf["scx"].to_numpy()
        scys = pdf["scy"].to_numpy()
        c0, c1 = int(scxs.min()), int(scxs.max())
        r0, r1 = int(scys.min()), int(scys.max())
        win_w = (c1 - c0 + 1) * tile_px
        win_h = (r1 - r0 + 1) * tile_px
        win = np.full((win_h, win_w), np.nan)
        for r in pdf.itertuples():
            img = codecs.decode(bytes(r.tile))[:, :, 0].astype(np.float64)
            oy = (int(r.scy) - r0) * tile_px
            ox = (int(r.scx) - c0) * tile_px
            win[oy : oy + img.shape[0], ox : ox + img.shape[1]] = img
        # destination pixel centers → world → source pixel coords
        cols = ocx * tile_px + np.arange(tile_px) + 0.5
        rws = ocy * tile_px + np.arange(tile_px) + 0.5
        wx = dgt[0] + cols * dgt[1]
        wy = dgt[3] + rws * dgt[5]
        igt = gt_invert(np.asarray(sgt, np.float64))
        scol = igt[0] + wx * igt[1]
        srow = igt[3] + wy * igt[5]
        # window-relative
        scol = scol - c0 * tile_px
        srow = srow - r0 * tile_px
        SC, SR = np.meshgrid(scol, srow)
        if bilinear:
            x0 = np.floor(SC - 0.5).astype(np.int64)
            y0 = np.floor(SR - 0.5).astype(np.int64)
            fx = (SC - 0.5) - x0
            fy = (SR - 0.5) - y0
            x0c = np.clip(x0, 0, win_w - 1)
            x1c = np.clip(x0 + 1, 0, win_w - 1)
            y0c = np.clip(y0, 0, win_h - 1)
            y1c = np.clip(y0 + 1, 0, win_h - 1)
            out = (
                win[y0c, x0c] * (1 - fx) * (1 - fy)
                + win[y0c, x1c] * fx * (1 - fy)
                + win[y1c, x0c] * (1 - fx) * fy
                + win[y1c, x1c] * fx * fy
            )
        else:
            xi = np.clip(np.floor(SC).astype(np.int64), 0, win_w - 1)
            yi = np.clip(np.floor(SR).astype(np.int64), 0, win_h - 1)
            out = win[yi, xi]
        out = np.where(np.isnan(out), nodata, out)
        tile = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        return pd.DataFrame(
            {
                "ocx": [ocx], "ocy": [ocy],
                "tile": [tile.tobytes()], "ts": [tile_px], "n_src": [len(pdf)],
            }
        )

    return joined.groupBy("ocx", "ocy").applyInPandas(_warp, WARP_SCHEMA)
