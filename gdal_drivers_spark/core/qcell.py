"""Quadkey / Z-order cell index — the engine's spatial addressing core.

Semantics mirror the reference's two addressing schemes:

- the quadtree over a square ``2^depth`` grid with per-node subdivision
  (``/root/reference/gdal-drivers/mask.cpp:229-256`` constraint-pruned
  traversal, ``mask.cpp:285-297`` squared-up extents), and
- MBTiles ``zoom-column-row`` addressing with bounds ``max = 2^z - 1``
  and the TMS row flip ``row = max - row``
  (``/root/reference/gdal-drivers/detail/mbtiles.cpp:99-155``).

Two cell representations:

``pack(z, x, y)``
    A single int64 join key ``(z << 52) | (x << 26) | y`` (z ≤ 26 —
    4 per-axis resolution of ~1.5e-8 of the world, far below any pixel
    grid we serve). This is *pure integer arithmetic*, expressible
    identically in Spark SQL and ANSI SQL (DuckDB oracle), so the
    distributed join key and the correctness oracle can never drift.

``morton(x, y)``
    Bit-interleaved Z-order value used for storage layout (partition
    prefix pruning — sorting by morton clusters spatially-near cells
    into the same parquet row groups, the distributed analogue of the
    reference's quadtree constraint prune).

All functions are numpy-vectorized; scalars work too (numpy scalar out).
"""

from __future__ import annotations

import numpy as np

Z_SHIFT = 52
X_SHIFT = 26
MAX_LEVEL = 26
_MASK26 = (1 << 26) - 1

# ---------------------------------------------------------------- pack

def pack(z, x, y):
    """Join-key encoding: (z << 52) | (x << 26) | y. Vectorized."""
    z = np.asarray(z, np.int64)
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    return (z << Z_SHIFT) | (x << X_SHIFT) | y


def unpack(cell):
    """Inverse of :func:`pack` → (z, x, y)."""
    cell = np.asarray(cell, np.int64)
    return cell >> Z_SHIFT, (cell >> X_SHIFT) & _MASK26, cell & _MASK26


def pack_sql(z: str, x: str, y: str) -> str:
    """The same packing as ANSI-SQL text (valid in Spark SQL and DuckDB)."""
    return f"((CAST({z} AS BIGINT) * {1 << Z_SHIFT}) + (CAST({x} AS BIGINT) * {1 << X_SHIFT}) + CAST({y} AS BIGINT))"


# ------------------------------------------------------- tree movement

def parent(cell):
    """Parent cell one level up — ``node.shift`` semantics (mask.cpp:246-248)."""
    z, x, y = unpack(cell)
    return pack(z - 1, x >> 1, y >> 1)


def children(cell):
    """4 children, shape (..., 4) — quadtree subdivision (mask.cpp:240-256)."""
    z, x, y = unpack(cell)
    cx = (np.asarray(x)[..., None] << 1) + np.array([0, 1, 0, 1])
    cy = (np.asarray(y)[..., None] << 1) + np.array([0, 0, 1, 1])
    return pack(np.asarray(z)[..., None] + 1, cx, cy)


def neighbors(cell, ring: int = 1, clamp: bool = True):
    """Cells of the square ring at Chebyshev distance ``ring`` (plus the
    center for ring 0). Out-of-domain cells are dropped when ``clamp``
    (bounds per mbtiles.cpp:146-152: valid range [0, 2^z - 1]).

    Scalar cell in → 1-D int64 array of cells out.
    """
    z, x, y = (int(v) for v in unpack(cell))
    if ring == 0:
        return pack(np.array([z]), np.array([x]), np.array([y]))
    n = 1 << z
    dd = np.arange(-ring, ring + 1)
    dx, dy = np.meshgrid(dd, dd)
    on_ring = np.maximum(np.abs(dx), np.abs(dy)) == ring
    nx, ny = x + dx[on_ring], y + dy[on_ring]
    if clamp:
        keep = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        nx, ny = nx[keep], ny[keep]
    return pack(np.full(nx.shape, z), nx, ny)


def tms_flip(z, y):
    """TMS row flip ``row = 2^z - 1 - row`` (mbtiles.cpp:154-155). Involution."""
    z = np.asarray(z, np.int64)
    y = np.asarray(y, np.int64)
    return (np.int64(1) << z) - 1 - y


# ------------------------------------------------------------- morton

def morton(x, y):
    """Interleave 26-bit x (even bits) and y (odd bits) → Z-order int64."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)

    def _spread(v):
        # standard bit-spread ladder for 26→52 bits
        v = np.asarray(v, np.uint64) & np.uint64(0x3FFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    x = np.asarray(x, np.uint64) & np.uint64(0x3FFFFFF)
    y = np.asarray(y, np.uint64) & np.uint64(0x3FFFFFF)
    return (_spread(x) | (_spread(y) << np.uint64(1))).astype(np.int64)


def unmorton(m):
    """Inverse of :func:`morton` → (x, y)."""
    m = np.asarray(m, np.uint64)

    def _squash(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v

    return _squash(m).astype(np.int64), _squash(m >> np.uint64(1)).astype(np.int64)


# ----------------------------------------------------- world <-> cells

class Grid:
    """A level-z grid over a world rectangle — the squared-up extents of
    mask.cpp:285-297 generalized to any axis-aligned world box.

    Pixel-center convention: a point exactly on a cell's max edge belongs
    to the next cell, clamped at the world edge (matches the half-open
    pixel windows of blender.cpp:590-600 with the +0.5 center offset
    applied by callers, not here).
    """

    __slots__ = ("x0", "y0", "x1", "y1")

    def __init__(self, x0: float = 0.0, y0: float = 0.0, x1: float = 1.0, y1: float = 1.0):
        self.x0, self.y0, self.x1, self.y1 = float(x0), float(y0), float(x1), float(y1)

    def cell_of(self, z: int, px, py):
        """Cell ids containing points (px, py) at level z. Vectorized."""
        n = 1 << z
        cx = np.clip(np.floor((np.asarray(px) - self.x0) / (self.x1 - self.x0) * n), 0, n - 1).astype(np.int64)
        cy = np.clip(np.floor((np.asarray(py) - self.y0) / (self.y1 - self.y0) * n), 0, n - 1).astype(np.int64)
        return pack(z, cx, cy)

    def cover_ranges(self, z: int, bx0, by0, bx1, by1):
        """Half-open bbox → inclusive cell-index ranges (cx0, cy0, cx1, cy1)
        at level z — the covering-cells prune of the tile↔source range
        join (blender.cpp:226-238 ``Locator`` ROI), vectorized."""
        n = 1 << z
        sx = n / (self.x1 - self.x0)
        sy = n / (self.y1 - self.y0)
        cx0 = np.clip(np.floor((np.asarray(bx0) - self.x0) * sx), 0, n - 1).astype(np.int64)
        cy0 = np.clip(np.floor((np.asarray(by0) - self.y0) * sy), 0, n - 1).astype(np.int64)
        # max edge is exclusive: a bbox ending exactly on a cell boundary
        # does not cover the next cell (nextafter guards fp dust)
        cx1 = np.clip(np.ceil((np.asarray(bx1) - self.x0) * sx) - 1, 0, n - 1).astype(np.int64)
        cy1 = np.clip(np.ceil((np.asarray(by1) - self.y0) * sy) - 1, 0, n - 1).astype(np.int64)
        cx1 = np.maximum(cx1, cx0)
        cy1 = np.maximum(cy1, cy0)
        return cx0, cy0, cx1, cy1

    def cell_extents(self, cell):
        """World-space extents (x0, y0, x1, y1) of cells. Vectorized."""
        z, x, y = unpack(cell)
        n = (np.int64(1) << z).astype(np.float64)
        w = (self.x1 - self.x0) / n
        h = (self.y1 - self.y0) / n
        return (self.x0 + x * w, self.y0 + y * h, self.x0 + (x + 1) * w, self.y0 + (y + 1) * h)


UNIT = Grid()
