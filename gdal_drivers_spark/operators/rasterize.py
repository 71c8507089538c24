"""Quadtree rasterize / vectorize — raster↔vector passes.

Rasterize reproduces the QuadtreeMask read path
(``/root/reference/gdal-drivers/mask.cpp:219-264``): for each output
tile, paint the quads intersecting it into a zeroed u8 tile — white
(full) = 255, gray (partial) = 128, black left 0 (tristate values per
``mask.cpp:213-217``, constraint prune ``mask.cpp:229-233``).

Distributed shape: each quad is exploded to the tiles it intersects
(JVM-side sequence/explode — the constraint prune as join selectivity),
then ``groupBy(tile).applyInPandas`` does vectorized rect fills. There
is no per-pixel Python: one numpy slice assignment per quad.

Vectorize is the inverse pass (the reference reads masks; writing them
back requires the quadtree encoding of ``mask.cpp:266-308``): each tile
is reduced bottom-up, merging 2×2 blocks of equal value into maximal
quads — emitting exactly the quadtree the mask writer would store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WHITE, GRAY, BLACK = 255, 128, 0
_VAL = {"white": WHITE, "gray": GRAY, "black": BLACK}

RASTERIZE_SCHEMA = "tx long, ty long, tile binary, ts int"
VECTORIZE_SCHEMA = "level int, qx long, qy long, size long, value string"


def rasterize_quads(quads: DataFrame, depth: int, tile_px: int = 256) -> DataFrame:
    """quads(level, qx, qy, value∈{white,gray,black}) → tiles at full
    depth resolution (grid = 2^depth leaf cells; tile covers tile_px
    leaf cells per side).

    Black quads are dropped early (the zeroed tile already encodes
    them) — the analogue of painting only white/gray (mask.cpp:240-256).
    """
    n_units = 1 << depth
    tiles_per_side = max(1, n_units // tile_px)

    q = (
        quads.filter(F.col("value") != "black")
        .withColumn("_scale", F.pow(F.lit(2.0), F.lit(depth) - F.col("level")).cast("long"))
        .withColumn("ux0", F.col("qx") * F.col("_scale"))
        .withColumn("uy0", F.col("qy") * F.col("_scale"))
        .withColumn("ux1", (F.col("qx") + 1) * F.col("_scale"))  # exclusive
        .withColumn("uy1", (F.col("qy") + 1) * F.col("_scale"))
    )
    # explode each quad to intersecting tiles (constraint prune → join key)
    q = (
        q.withColumn(
            "tx",
            F.explode(
                F.sequence(
                    (F.col("ux0") / tile_px).cast("long"),
                    F.least(
                        ((F.col("ux1") - 1) / tile_px).cast("long"),
                        F.lit(tiles_per_side - 1),
                    ),
                )
            ),
        )
        .withColumn(
            "ty",
            F.explode(
                F.sequence(
                    (F.col("uy0") / tile_px).cast("long"),
                    F.least(
                        ((F.col("uy1") - 1) / tile_px).cast("long"),
                        F.lit(tiles_per_side - 1),
                    ),
                )
            ),
        )
    )

    def _paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        ox, oy = tx * tile_px, ty * tile_px
        tile = np.zeros((tile_px, tile_px), np.uint8)
        # paint gray first so white wins where both touch a boundary
        pdf = pdf.assign(vv=pdf["value"].map(_VAL)).sort_values("vv")
        for r in pdf.itertuples():
            x0 = max(int(r.ux0) - ox, 0)
            y0 = max(int(r.uy0) - oy, 0)
            x1 = min(int(r.ux1) - ox, tile_px)
            y1 = min(int(r.uy1) - oy, tile_px)
            tile[y0:y1, x0:x1] = r.vv
        return pd.DataFrame(
            {"tx": [tx], "ty": [ty], "tile": [tile.tobytes()], "ts": [tile_px]}
        )

    return q.groupBy("tx", "ty").applyInPandas(_paint, RASTERIZE_SCHEMA)


def _merge_quads(tile: np.ndarray, ox: int, oy: int, depth: int):
    """Maximal-quad extraction from one tile: every pixel is covered by
    exactly one quad — the largest uniform aligned power-of-two block
    containing it. Two passes, both vectorized per pyramid level:
    bottom-up uniformity, then emit blocks whose parent is not uniform
    (or the tile root)."""
    ts = tile.shape[0]
    n_levels = ts.bit_length() - 1  # log2(ts)
    vals = [tile]
    uniforms = [np.ones_like(tile, bool)]
    for _ in range(n_levels):
        v, u = vals[-1], uniforms[-1]
        a, b = v[0::2, 0::2], v[0::2, 1::2]
        c, d = v[1::2, 0::2], v[1::2, 1::2]
        u2 = (
            u[0::2, 0::2] & u[0::2, 1::2] & u[1::2, 0::2] & u[1::2, 1::2]
            & (a == b) & (a == c) & (a == d)
        )
        vals.append(a)
        uniforms.append(u2)

    rows = []
    for li in range(n_levels, -1, -1):  # li = log2(size)
        size = 1 << li
        level = depth - li
        u = uniforms[li]
        if li == n_levels:
            emit = u
        else:
            parent_u = np.repeat(np.repeat(uniforms[li + 1], 2, 0), 2, 1)
            emit = u & ~parent_u
        ys, xs = np.nonzero(emit)
        v = vals[li]
        for y, x in zip(ys.tolist(), xs.tolist()):
            rows.append((level, ox // size + x, oy // size + y, size, int(v[y, x])))
    return rows


def vectorize_tiles(tiles: DataFrame, depth: int, tile_px: int = 256) -> DataFrame:
    """Inverse of rasterize: tiles → maximal uniform quads (the quadtree
    the mask writer stores, mask.cpp:266-308). Per-tile numpy bottom-up
    merge; cross-tile merging is a subsequent groupBy on parent ids
    (rarely worth it — the reference's trees are per-file too)."""

    def _vec(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for r in pdf.itertuples():
                tile = np.frombuffer(r.tile, np.uint8).reshape(r.ts, r.ts)
                ox, oy = int(r.tx) * tile_px, int(r.ty) * tile_px
                for level, qx, qy, size, v in _merge_quads(tile, ox, oy, depth):
                    name = "white" if v == WHITE else ("gray" if v == GRAY else "black")
                    out.append((level, qx, qy, size, name))
            yield pd.DataFrame(out, columns=["level", "qx", "qy", "size", "value"])

    return tiles.mapInPandas(_vec, VECTORIZE_SCHEMA)
