"""Vector-tile geometry codec — the engine's own compact tile encoding.

Semantically equivalent to the Mapbox Vector Tile command stream the
reference decodes (``/root/reference/gdal-drivers/mvt.cpp``): zigzag
varints (``mvt.cpp:241-244``), (opcode,count) command words
(``mvt.cpp:171-179``), a cursor accumulating deltas — a running prefix
sum (``mvt.cpp:164-169``, ``246-261``) — and polygon assembly by the
clockwise-ring-starts-a-new-exterior rule (``mvt.cpp:378-415``).

The wire format here is a plain uint32 numpy array (we define our own
encoding; protobuf framing is out of scope — the *operators* are the
point). Decode is numpy-vectorized: one ``np.cumsum`` per feature, no
per-vertex Python.
"""

from __future__ import annotations

import numpy as np

from .geometry import close_ring, is_clockwise

CMD_MOVETO, CMD_LINETO, CMD_CLOSEPATH = 1, 2, 7

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3


def zigzag(v):
    """Signed → unsigned zigzag (inverse of mvt.cpp:241-244)."""
    v = np.asarray(v, np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.int64)


def unzigzag(v):
    """(v >> 1) ^ -(v & 1) — mvt.cpp:241-244."""
    v = np.asarray(v, np.int64)
    return ((v >> 1) ^ -(v & 1)).astype(np.int64)


def cmd_word(op: int, count: int) -> int:
    return (count << 3) | op


def cmd_split(w):
    """(opcode, count) = (w & 7, w >> 3) — mvt.cpp:171-179."""
    w = np.asarray(w, np.int64)
    return w & 7, w >> 3


# ------------------------------------------------------------- encode

def encode_geometry(geom_type: int, parts: list[np.ndarray]) -> np.ndarray:
    """Encode parts (each an (N,2) int array of tile coords) into a
    command stream. Points: one MoveTo with count=n. Lines: MoveTo(1) +
    LineTo(n-1) per part. Polygons: MoveTo(1) + LineTo(n-1) + ClosePath
    per ring (rings given open, in winding order)."""
    out: list[int] = []
    cx = cy = 0

    def push_deltas(pts):
        nonlocal cx, cy
        for x, y in pts:
            out.append(int(zigzag(int(x) - cx)))
            out.append(int(zigzag(int(y) - cy)))
            cx, cy = int(x), int(y)

    if geom_type == GEOM_POINT:
        pts = np.vstack(parts)
        out.append(cmd_word(CMD_MOVETO, len(pts)))
        push_deltas(pts)
    elif geom_type == GEOM_LINESTRING:
        for part in parts:
            out.append(cmd_word(CMD_MOVETO, 1))
            push_deltas(part[:1])
            out.append(cmd_word(CMD_LINETO, len(part) - 1))
            push_deltas(part[1:])
    elif geom_type == GEOM_POLYGON:
        for ring in parts:
            out.append(cmd_word(CMD_MOVETO, 1))
            push_deltas(ring[:1])
            out.append(cmd_word(CMD_LINETO, len(ring) - 1))
            push_deltas(ring[1:])
            out.append(cmd_word(CMD_CLOSEPATH, 1))
    else:
        raise ValueError(f"cannot encode geom_type {geom_type}")
    return np.asarray(out, np.int64)


# ------------------------------------------------------------- decode

def decode_geometry(geom_type: int, stream: np.ndarray) -> list[np.ndarray]:
    """Command stream → list of (N,2) float64 parts in tile coords.

    The cursor prefix sum is one vectorized cumsum over all deltas
    (mvt.cpp:164-169 cursor semantics); command boundaries only slice
    the accumulated vertex array.
    """
    stream = np.asarray(stream, np.int64)
    # First pass: walk command words (few per feature) to find delta spans.
    spans = []  # (op, n_points, start_index_into_stream)
    i = 0
    while i < len(stream):
        op, count = int(stream[i]) & 7, int(stream[i]) >> 3
        i += 1
        if op in (CMD_MOVETO, CMD_LINETO):
            spans.append((op, count, i))
            i += 2 * count
        elif op == CMD_CLOSEPATH:
            spans.append((op, 0, i))
        else:
            raise ValueError(f"bad command opcode {op}")
    # Vectorized cursor: gather all deltas in stream order, cumsum once.
    delta_idx = np.concatenate(
        [np.arange(s, s + 2 * n).reshape(n, 2) for (_, n, s) in spans if n > 0]
    ) if spans else np.zeros((0, 2), np.int64)
    deltas = unzigzag(stream[delta_idx]) if len(delta_idx) else np.zeros((0, 2), np.int64)
    verts = np.cumsum(deltas, axis=0, dtype=np.int64).astype(np.float64)

    parts: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    vpos = 0
    for op, n, _ in spans:
        if op == CMD_MOVETO:
            if cur and geom_type != GEOM_POINT:
                parts.append(np.vstack(cur))
                cur = []
            cur.append(verts[vpos : vpos + n])
            vpos += n
        elif op == CMD_LINETO:
            cur.append(verts[vpos : vpos + n])
            vpos += n
        elif op == CMD_CLOSEPATH:
            ring = np.vstack(cur)
            parts.append(close_ring(ring))
            cur = []
    if cur:
        parts.append(np.vstack(cur))
    return parts


def assemble_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """MultiPolygon assembly: a clockwise ring starts a new polygon
    (exterior); counter-clockwise rings are holes of the current one
    (mvt.cpp:378-415). Returns list of polygons, each a ring list."""
    polys: list[list[np.ndarray]] = []
    for ring in rings:
        if is_clockwise(ring) or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return polys


def tile_to_world(parts, z: int, tx: int, ty: int, extent: int = 4096, world=(0.0, 0.0, 1.0, 1.0)):
    """The Trafo (mvt.cpp:64-93): tile-local integer coords → world.
    y axis flips (tile y grows down, world y grows up)."""
    wx0, wy0, wx1, wy1 = world
    n = 1 << z
    tw = (wx1 - wx0) / n
    th = (wy1 - wy0) / n
    ox = wx0 + tx * tw
    oy = wy1 - ty * th
    sx = tw / extent
    sy = -th / extent
    return [np.column_stack([ox + p[:, 0] * sx, oy + p[:, 1] * sy]) for p in parts]


def world_to_tile(parts, z: int, tx: int, ty: int, extent: int = 4096, world=(0.0, 0.0, 1.0, 1.0)):
    """Inverse Trafo: world coords → tile-local integers (round to the
    extent grid — exact for coordinates produced by tile_to_world,
    which are dyadic multiples of the grid step)."""
    wx0, wy0, wx1, wy1 = world
    n = 1 << z
    tw = (wx1 - wx0) / n
    th = (wy1 - wy0) / n
    ox = wx0 + tx * tw
    oy = wy1 - ty * th
    sx = tw / extent
    sy = -th / extent
    return [
        np.column_stack([
            np.rint((p[:, 0] - ox) / sx).astype(np.int64),
            np.rint((p[:, 1] - oy) / sy).astype(np.int64),
        ])
        for p in parts
    ]
