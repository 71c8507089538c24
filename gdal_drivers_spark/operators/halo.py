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
