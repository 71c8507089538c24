"""Halo exchange — 2-D sliding-window support across tile boundaries.

The reference's overlap kernel (``blender.cpp:601-624``) is a 2ow×2oh
sliding frame over continuous space (W1). Within a tile that is pure
numpy; when a window crosses tile edges, the distributed analogue is a
**neighbor-cell self-join**: every tile is re-keyed to each of its ≤8
neighbors (plus itself), so a grouped UDF over the target cell sees the
full halo. Spark's ``Window`` is 1-D; 2-D halos are always done this
way (fan-out ≤9×, all JVM arithmetic, one shuffle on the target key).

The blend operator itself does NOT need this (its feather weights
depend only on world-space valid extents, never neighbor pixels); halo
is for kernels that read neighbor *pixels* — e.g. cross-tile
convolution or gradient ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def halo_convolve(tiles: DataFrame, tile_px: int, cell: str = "cell") -> DataFrame:
    """Cross-tile 3×3 box-mean — the halo join's pixel use case (the
    sliding spatial window of ``blender.cpp:601-624`` generalized to
    neighbor-PIXEL kernels). Each target cell's group receives its own
    tile plus the ≤8 neighbors (with_halo), assembles the padded
    window, convolves, and emits only the interior — so tile seams are
    exact, identical to convolving the stitched full image.

    Input rows: (cell:long, tile:binary u8 raw tile_px²). Missing
    neighbors (domain edge or absent tile) contribute zeros, and the
    mean divides by the number of in-window samples (edge-normalized).
    Output: (cell, tile) with the convolved u8 payload.
    """
    import numpy as np
    import pandas as pd

    h = with_halo(tiles, cell=cell, ring=1)

    def _conv(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t = tile_px
        pad = np.zeros((3 * t, 3 * t), np.float64)
        present = np.zeros((3 * t, 3 * t), np.float64)
        center_seen = False
        for r in pdf.itertuples():
            img = np.frombuffer(bytes(r.tile), np.uint8).reshape(t, t)
            # dx,dy = offset of the CONTRIBUTING tile relative to target
            ox, oy = (int(r.dx) + 1) * t, (int(r.dy) + 1) * t
            pad[oy : oy + t, ox : ox + t] = img
            present[oy : oy + t, ox : ox + t] = 1.0
            if r.dx == 0 and r.dy == 0:
                center_seen = True
        if not center_seen:
            return pd.DataFrame({"cell": [], "tile": []})
        acc = np.zeros((t, t), np.float64)
        cnt = np.zeros((t, t), np.float64)
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                y0, x0 = t + ky, t + kx
                acc += pad[y0 : y0 + t, x0 : x0 + t]
                cnt += present[y0 : y0 + t, x0 : x0 + t]
        out = np.rint(acc / np.maximum(cnt, 1.0)).astype(np.uint8)
        return pd.DataFrame({"cell": [int(key[0])], "tile": [out.tobytes()]})

    return h.groupBy("target_cell").applyInPandas(_conv, "cell long, tile binary")


def with_halo(tiles: DataFrame, cell: str = "cell", ring: int = 1) -> DataFrame:
    """Re-key each tile row to itself and its in-bounds neighbor cells
    within Chebyshev distance ``ring``.

    Output columns: ``target_cell`` (the cell whose computation this
    row supports), ``dx``/``dy`` (the offset of the contributing tile
    relative to the target, in [-ring, ring]), plus all input columns.
    ``groupBy('target_cell')`` then sees each tile with its halo.
    """
    z = F.shiftright(F.col(cell), 52)
    x = F.shiftright(F.col(cell), 26) % F.lit(1 << 26)
    y = F.col(cell) % F.lit(1 << 26)
    n = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(shiftright({cell}, 52) AS INT))")
    out = (
        tiles.withColumn("_dx", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
        .withColumn("_tx", x + F.col("_dx"))
        .withColumn("_ty", y + F.col("_dy"))
        # bounds clamp semantics per mbtiles.cpp:146-152: out-of-domain
        # neighbors are dropped, not wrapped
        .filter((F.col("_tx") >= 0) & (F.col("_tx") < n) & (F.col("_ty") >= 0) & (F.col("_ty") < n))
        .withColumn(
            "target_cell",
            z * F.lit(1 << 52) + F.col("_tx") * F.lit(1 << 26) + F.col("_ty"),
        )
        # offset of the CONTRIBUTING tile relative to the target
        .withColumn("dx", -F.col("_dx"))
        .withColumn("dy", -F.col("_dy"))
        .drop("_dx", "_dy", "_tx", "_ty")
    )
    return out
