"""Raster polygonize — connected-component labeling of equal-value
pixel regions across tiles (the ``gdal_polygonize`` workflow: GDAL
walks the whole raster single-node; reference drivers expose rasters
it would consume, e.g. mask.cpp's quadtree rasters).

Distributed decomposition — pixels are touched exactly once and never
shuffled:

1. one Arrow hop labels each tile locally (two-pass union-find,
   4-connectivity, equal value) and reduces it to
   - one summary row per LOCAL component: (node, value, n_px) with
     ``node`` = the component's minimum global pixel id — unique
     across tiles and canonical (the final root is the min pixel id
     of the whole global component, independent of tile layout), and
   - one row per boundary pixel carrying the CROSS-TILE PAIR KEY:
     for a horizontal neighbor pair the west pixel's gpid·2, for a
     vertical pair the north pixel's gpid·2+1 — both sides of a tile
     seam compute the same key from their own coordinates, so no halo
     exchange is needed at all;
2. a groupBy(pair key) turns seam pairs with equal value into
   equivalence edges between local components (strip-sized data:
   4·t rows per tile, not t²);
3. the existing hash-min label propagation
   (``dedup.connected_components``, O(log diameter) rounds) unions
   local components into global ones — it runs on the COMPONENT
   graph (≤ a few rows per tile), not on pixels;
4. a final groupBy(root, value) sums exact integer stats.

At 100 TB: step 1 is embarrassingly parallel, step 2 shuffles
boundary rows only (≈ perimeter bytes), step 3's graph is ~|tiles|
nodes. The iterative CC is the one genuinely non-SQL-expressible
stage (rows-only driver check; the contract fixture's components are
analytically derivable so its oracle is exact anyway).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_drivers_spark.operators.dedup import connected_components


def _label_tile(v: np.ndarray) -> np.ndarray:
    """Two-pass union-find labeling, 4-connectivity, equal value.
    Returns an int array of per-pixel local root indices (root =
    arbitrary member index; callers canonicalize via min gpid)."""
    t0, t1 = v.shape
    n = t0 * t1
    parent = np.arange(n)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    flat = v.ravel()
    for i in range(n):
        r, c = divmod(i, t1)
        if c and flat[i] == flat[i - 1]:
            ra, rb = find(i), find(i - 1)
            if ra != rb:
                parent[ra] = rb
        if r and flat[i] == flat[i - t1]:
            ra, rb = find(i), find(i - t1)
            if ra != rb:
                parent[ra] = rb
    return np.array([find(i) for i in range(n)])


def polygonize(
    tiles: DataFrame,
    tile_px: int,
    grid_wh: tuple,
    cell: str = "cell",
    tile_col: str = "tile",
    max_iter: int = 50,
) -> DataFrame:
    """Global equal-value components over a dense tile grid.

    Input rows: (cell, tile: raw u8 payload, t×t). Output one row per
    component: (component = min global pixel id, value, n_px,
    n_tiles) — all exact integers. Corrupt tiles are skipped and
    surface as one (component=-1, value=-1, n_px=0, n_tiles=n_bad)
    poison row (house rule: counted, never fatal, never silent)."""
    t = int(tile_px)
    gw = int(grid_wh[0])
    W = gw * t  # global width in pixels (gpid = gy * W + gx)

    def gen(batches):
        for pdf in batches:
            srows = []
            for row in pdf.itertuples():
                kc = int(getattr(row, cell))
                try:
                    v = np.frombuffer(bytes(getattr(row, tile_col)), np.uint8)
                    v = v.reshape(t, t).astype(np.int64)
                except Exception:
                    srows.append((1, -1, -1, -1, 0))  # poison marker
                    continue
                tx = (kc >> 26) & ((1 << 26) - 1)
                ty = kc & ((1 << 26) - 1)
                gx0, gy0 = tx * t, ty * t
                roots = _label_tile(v)
                gy = np.arange(t)[:, None] + gy0
                gx = np.arange(t)[None, :] + gx0
                gpid = (gy * W + gx).ravel()
                flat = v.ravel()
                # canonical node id per local root: min gpid
                node_of: dict = {}
                for i in range(t * t):
                    r = roots[i]
                    if r not in node_of or gpid[i] < node_of[r]:
                        node_of[r] = int(gpid[i])
                # kind 0: local component summaries
                cnt: dict = {}
                for i in range(t * t):
                    cnt[roots[i]] = cnt.get(roots[i], 0) + 1
                for r, n_px in cnt.items():
                    srows.append((0, node_of[r], int(flat[r]), -1, n_px))
                # kind 1: seam rows. pair key: horizontal = west gpid*2,
                # vertical = north gpid*2+1 — both sides derive it from
                # their own coordinates alone
                for j in range(t):
                    # my east edge (I am the west pixel of the pair)
                    i = j * t + (t - 1)
                    srows.append((1, node_of[roots[i]], int(flat[i]),
                                  int(gpid[i]) * 2, 1))
                    # my west edge (west neighbor's gpid = mine - 1)
                    i = j * t
                    if gx0 > 0:
                        srows.append((1, node_of[roots[i]], int(flat[i]),
                                      (int(gpid[i]) - 1) * 2, 1))
                    # my south edge (I am the north pixel)
                    i = (t - 1) * t + j
                    srows.append((1, node_of[roots[i]], int(flat[i]),
                                  int(gpid[i]) * 2 + 1, 1))
                    # my north edge (north neighbor's gpid = mine - W)
                    i = j
                    if gy0 > 0:
                        srows.append((1, node_of[roots[i]], int(flat[i]),
                                      (int(gpid[i]) - W) * 2 + 1, 1))
            yield pd.DataFrame(
                srows, columns=["kind", "node", "value", "pair_key", "n_px"]
            )

    raw = tiles.mapInPandas(
        gen, "kind int, node long, value long, pair_key long, n_px long"
    )
    raw = raw.localCheckpoint(eager=False)
    summaries = raw.filter("kind = 0").select("node", "value", "n_px")
    n_bad = raw.filter("kind = 1 and node = -1")
    seams = raw.filter("kind = 1 and node >= 0")
    # seam pairs with equal value -> equivalence edge between local nodes
    edges = (
        seams.groupBy("pair_key")
        .agg(
            F.min_by(F.struct("node", "value"), "node").alias("a"),
            F.max_by(F.struct("node", "value"), "node").alias("b"),
            F.count("*").alias("n"),
        )
        .filter("n = 2 AND a.value = b.value AND a.node != b.node")
        .select(F.col("a.node").alias("id1"), F.col("b.node").alias("id2"))
        .distinct()
    )
    labels = connected_components(edges, max_iter=max_iter)
    out = (
        summaries.join(labels, summaries.node == labels.node, "left")
        .select(
            F.coalesce("component", summaries.node).alias("component"),
            "value",
            "n_px",
        )
        .groupBy("component", "value")
        .agg(F.sum("n_px").alias("n_px"), F.count("*").alias("n_tiles"))
    )
    poison = n_bad.groupBy().agg(F.count("*").alias("nb")).filter("nb > 0").select(
        F.lit(-1).cast("long").alias("component"),
        F.lit(-1).cast("long").alias("value"),
        F.lit(0).cast("long").alias("n_px"),
        F.col("nb").alias("n_tiles"),
    )
    return out.unionByName(poison)
