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
from ..core.geometry import gt_invert, gt_orthogonal

WARP_SCHEMA = "ocx long, ocy long, tile binary, ts int, n_src int"
WARP_MASK_SCHEMA = WARP_SCHEMA + ", mask binary"

# the plane-transform source bbox uses a 3×3 boundary sample + 2-px
# pad; the pad absorbs at most this much edge bowing between samples
_PLANE_PAD_PX = 2.0

# per-task cap on the rank-kernel (mode/med/q1/q3) footprint value
# cube; output rows are chunked to stay under it (tests shrink it to
# force chunking). Captured into the UDF closure at plan time.
_RANK_CUBE_BYTES = 64 << 20


def _cubic_w(f):
    """Keys cubic-convolution weights, a = −0.5 (GDAL's cubic) for
    taps at offsets −1, 0, 1, 2 around the sample cell; ``f`` is the
    fractional position in [0, 1). Every term is a polynomial in
    dyadic-rational inputs, so on dyadic grids (e.g. power-of-2
    resolutions) the weights — hence the whole 16-tap sum — are EXACT
    doubles, which is what makes the warp_cubic contract oracle
    replayable in SQL. Module-level so the scalar-oracle tests import
    THIS expression rather than keeping a divergeable copy."""
    t0, t3, g = 1.0 + f, 2.0 - f, 1.0 - f
    w0 = -0.5 * t0 * t0 * t0 + 2.5 * t0 * t0 - 4.0 * t0 + 2.0
    w1 = 1.5 * f * f * f - 2.5 * f * f + 1.0
    w2 = 1.5 * g * g * g - 2.5 * g * g + 1.0
    w3 = -0.5 * t3 * t3 * t3 + 2.5 * t3 * t3 - 4.0 * t3 + 2.0
    return w0, w1, w2, w3


def _bspline_w6(f):
    """Uniform cubic B-spline weights ×6 (GDAL's Resampling.
    cubicspline — the smoothing, non-interpolating 4×4 kernel) for
    taps at offsets −1, 0, 1, 2; ``f`` is the fractional position in
    [0, 1). Returned SCALED BY 6: B₃ carries a 1/6 factor that is not
    representable in binary, but the 6-weights are dyadic-rational
    polynomials at dyadic f — so the kernel computes
    (Σ (6wx)(6wy)·v) / 36 with the entire tap sum EXACT and order-free
    and exactly ONE rounding (the final ÷36), which both numpy and SQL
    perform identically — that is what makes the warp_cubicspline
    oracle bit-exact (the per-weight ÷6 form would round 16 times and
    make the group-SUM order-dependent). Partition of unity: the four
    6-weights sum to exactly 6 (constants stay constant through /36).
    Module-level so the scalar-oracle tests import THIS expression."""
    g = 1.0 - f
    w0 = g * g * g                          # (2 − (1+f))³
    w1 = 3.0 * f * f * f - 6.0 * f * f + 4.0
    w2 = 3.0 * g * g * g - 6.0 * g * g + 4.0
    w3 = f * f * f                          # (2 − (2−f))³
    return w0, w1, w2, w3


def _lanczos_w(f, a: int = 3):
    """Lanczos windowed-sinc weights (GDAL's Resampling.lanczos,
    a = 3 lobes) for the 2a taps at offsets −(a−1)…a around the sample
    cell; ``f`` is the fractional position in [0, 1). Each weight is
    sinc(d)·sinc(d/a) for tap distance d = f − offset (zero outside
    |d| < a); the caller normalizes the 2a weights to sum 1 — the
    truncated window's sum drifts from 1 by O(1%), and unnormalized
    weights would shift constant fields. np.sinc is the normalized
    sin(πx)/(πx), so integer f hits exact {1, 0, …} and the kernel
    interpolates. Transcendental weights → NOT SQL-replayable (unlike
    cubic's dyadic polynomials): the oracle is rows-only, bit-parity
    is pinned against the scalar numpy reference in pytest.
    Module-level so those tests import THIS expression."""
    ws = []
    for j in range(-a + 1, a + 1):
        d = f - j
        w = np.sinc(d) * np.sinc(d / a)
        ws.append(np.where(np.abs(d) < a, w, 0.0))
    return ws


def _plane_sag_px(tf, dst_gt, src_inv, tile_px, tiles_x, tiles_y) -> float:
    """Worst observed deviation (in source pixels) of the true tile
    edge from the chord of the 3×3 boundary samples, over a census of
    destination tiles (corners / edges / interior of the dst grid —
    where a conformal projection's curvature extremes live for any
    monotone transform). Checked at PLAN TIME with a handful of scalar
    transform evaluations — no Spark job.

    This is a HEURISTIC bound, not a hard one (ADVICE r04): the census
    samples a finite tile/frac grid, so a composed transform whose
    curvature peaks BETWEEN sampled tiles or fracs can in principle
    bow past the observed figure. Two mitigations: (a) for the smooth,
    monotone projections the registry admits, curvature varies slowly
    across the grid, so the coarse census lands within a small factor
    of the true extreme; (b) when the first pass reads sag above a
    quarter of the pad — close enough to the ½-pad budget that the
    sampling error could matter — the census ADAPTIVELY DENSIFIES
    (every-tile-axis quartiles → 9 axis points, fracs 0.25 → 0.125)
    and the denser figure is used. The warp caller still rejects any
    figure above half the pad, keeping a 2× observed-vs-budget margin
    for what the densified census might miss."""
    d0, d1, d3, d5 = float(dst_gt[0]), float(dst_gt[1]), float(dst_gt[3]), float(dst_gt[5])
    i0, i1, i3, i5 = (
        float(src_inv[0]), float(src_inv[1]), float(src_inv[3]), float(src_inv[5])
    )
    T = float(tile_px)

    def census(n_axis: int, frac_step: float) -> float:
        def grid_axis(n):
            if n <= 0:
                return [0]
            ticks = {round(i * (n - 1) / (n_axis - 1)) for i in range(n_axis)}
            return sorted(ticks | {0, max(0, n - 1)})

        # on each tile edge the bbox samples fracs {0, .5, 1}; test the
        # intermediate points against the linear interpolation of
        # their bracketing samples
        fr = np.arange(0.0, 1.0 + frac_step / 2, frac_step)
        n_pts = len(fr)
        sag = 0.0
        for cy in grid_axis(tiles_y):
            for cx in grid_axis(tiles_x):
                for fx0, fy0, fx1, fy1 in (
                    (0.0, 0.0, 1.0, 0.0), (0.0, 1.0, 1.0, 1.0),
                    (0.0, 0.0, 0.0, 1.0), (1.0, 0.0, 1.0, 1.0),
                ):
                    wx = d0 + (cx + fx0 + (fx1 - fx0) * fr) * T * d1
                    wy = d3 + (cy + fy0 + (fy1 - fy0) * fr) * T * d5
                    sx, sy = tf.np_xy(wx, wy)
                    pc = i0 + np.asarray(sx) * i1
                    pr = i3 + np.asarray(sy) * i5
                    # chord endpoints are the bbox's own samples at
                    # fracs {0, .5, 1}: indices 0, mid, last
                    half = (n_pts - 1) // 2
                    for lo, hi in ((0, half), (half, n_pts - 1)):
                        for mid in range(lo + 1, hi):
                            t = (mid - lo) / (hi - lo)
                            sag = max(
                                sag,
                                abs(pc[mid] - ((1 - t) * pc[lo] + t * pc[hi])),
                                abs(pr[mid] - ((1 - t) * pr[lo] + t * pr[hi])),
                            )
        return sag

    sag = census(5, 0.25)
    if sag > _PLANE_PAD_PX / 4.0:
        sag = max(sag, census(9, 0.125))
    return sag


def warp_tiles(
    src_tiles: DataFrame,
    src_gt: np.ndarray,
    dst_gt: np.ndarray,
    dst_shape: tuple[int, int],
    tile_px: int = 256,
    method: str = "nearest",
    nodata: float = 0.0,
    src_srs: str = "",
    dst_srs: str = "",
    with_mask: bool = False,
    band: int = 0,
) -> DataFrame:
    """Resample source tiles onto the destination grid.

    ``band`` selects which band of a multi-band source tile is warped
    (the reference's ``warpInto`` runs per-band over the full raster,
    ``gdaldriversmodule.cpp:202``; out-of-range bands raise inside the
    decode, poison-style per tile). One kernel invocation per band —
    warp an RGB raster with three calls sharing the same cover join
    shape, or select the band upstream (P1) as before.

    ``src_tiles`` rows: (scx:long, scy:long, tile:binary raw) — source
    tile grid coordinates (tile (scx,scy) holds source pixels
    [scx*ts, (scx+1)*ts) × [scy*ts, (scy+1)*ts)).

    ``src_gt``/``dst_gt``: 6-term geotransforms (pixel→world); must be
    orthogonal (no rotation) — rejected otherwise, matching the
    reference's compatibility gate.

    ``method``: ``nearest`` | ``bilinear`` | ``cubic`` (4×4 Keys
    a=−0.5 — GDAL's Resampling.cubic) | ``cubicspline`` (4×4 uniform
    cubic B-spline, the smoothing non-interpolating kernel; r05) |
    ``lanczos`` (6×6 windowed
    sinc, a=3 — the quality upsampler; r05) | footprint kernels
    ``average`` / ``sum`` / ``rms`` (exact area-weighted mean /
    weighted sum / quadratic mean), ``min`` / ``max`` (unweighted
    extrema over contributing pixels), ``mode`` (majority vote,
    ties → lowest value — the categorical downsampler; r05) and
    ``med`` / ``q1`` / ``q3`` (order statistics of the contributing
    set, type-7 quantiles — the robust downsamplers; r05) — the
    full resampling family of the reference's Resampling enum
    (gdaldriversmodule.cpp:205-225); footprint kernels need an
    axis-separable transform.

    ``with_mask=True`` (r04 — the reference's ``warp(withMask=True)``
    returning ``(data, mask)``, gdaldriversmodule.cpp:126-158/182-204):
    the output gains a ``mask`` binary column (raw u8, 255=valid per
    pixel) and the gather PROPAGATES validity instead of flattening it
    into the nodata value — downstream blend can then tell "warped
    nodata" from "genuinely zero". ``src_tiles`` may carry its own
    optional ``mask`` column (raw u8 tile_px², NULL = all-valid);
    absent source coverage is invalid as before. Per-kernel policy
    (documented choice): nearest GATHERS the mask; bilinear
    WEIGHT-RENORMALIZES over valid taps (a pixel is valid while ≥1 tap
    is); cubic and lanczos require a FULLY-VALID support (negative-lobe
    weights renormalize badly); average/mode/med/q1/q3 exclude invalid
    pixels from the reduction (valid while the footprint holds ≥1
    valid pixel). Data still carries ``nodata`` at invalid pixels.

    ``src_srs``/``dst_srs``: optional SRS names; when they differ, the
    dst-world→src-world hop goes through ``core.srs.get_transform``
    (the reference's ``warp(srs=...)`` binding,
    gdaldriversmodule.cpp:182-204): axis-separable pairs (e.g.
    EPSG:4326↔3857) use exact corner-derived source bboxes; 2-D
    ``PlaneTransform`` pairs (UTM EPSG:326zz/327zz, UPS EPSG:5041, and
    compositions like UTM→WebMercator) sample a 3×3 boundary grid per
    destination tile with a 2-px safety pad — sufficient for conformal
    projections whose curvature over one tile is far below a pixel.

    Output: one row per destination tile (ocx, ocy).
    """
    from ..core.srs import PlaneTransform, get_transform

    if not (gt_orthogonal(src_gt) and gt_orthogonal(dst_gt)):
        raise ValueError("warp requires orthogonal geotransforms (blender.cpp:133-139)")
    rank_cube_bytes = _RANK_CUBE_BYTES  # closure-captured at plan time
    _FOOTPRINT = ("average", "sum", "rms", "min", "max", "mode", "med", "q1", "q3")
    if method not in ("nearest", "bilinear", "cubic", "cubicspline",
                      "lanczos") + _FOOTPRINT:
        raise ValueError(f"unknown resample method {method!r}")
    if src_srs != dst_srs and not (src_srs and dst_srs):
        raise ValueError("cross-SRS warp needs BOTH src_srs and dst_srs")
    tf = get_transform(dst_srs, src_srs)  # dst world → src world
    plane = isinstance(tf, PlaneTransform)
    if method in _FOOTPRINT and plane:
        # the footprint machinery is separable-exact only; a plane
        # transform's pixel footprint is not an axis-aligned box —
        # refuse rather than reduce over the wrong area
        raise ValueError(
            f"{method} resampling needs an axis-separable transform; "
            "reproject with nearest/bilinear/cubic first"
        )

    dst_h, dst_w = dst_shape
    tiles_x = (dst_w + tile_px - 1) // tile_px
    tiles_y = (dst_h + tile_px - 1) // tile_px
    src_inv = gt_invert(src_gt)

    # destination tile corners → world → source pixel bbox → covering
    # source tiles: pure Column affine arithmetic over spark.range, so
    # the cover table is GENERATED DISTRIBUTED (a 10⁶-output-tile warp
    # never materializes rows on the driver — VERDICT r01 #4; same
    # floor/ceil shape as assign.cover_bounds). The per-tile constants
    # (geotransforms, tile size) fold into the codegen expressions.
    spark = src_tiles.sparkSession
    T = float(tile_px)
    d0, d1, d3, d5 = float(dst_gt[0]), float(dst_gt[1]), float(dst_gt[3]), float(dst_gt[5])
    i0, i1, i3, i5 = (
        float(src_inv[0]), float(src_inv[1]), float(src_inv[3]), float(src_inv[5])
    )

    base = spark.range(int(tiles_x) * int(tiles_y)).select(
        (F.col("id") % tiles_x).alias("ocx"),
        (F.col("id") / tiles_x).cast("long").alias("ocy"),
    )

    def _src_px(world_expr, off, scale):
        return F.lit(off) + world_expr * F.lit(scale)

    if plane:
        # non-separable transform: source bbox from a 3×3 grid of
        # boundary points (corners + edge midpoints + center) per
        # destination tile, padded 2 px. The "curvature far below a
        # pixel" assumption is now VERIFIED at plan time: a scalar
        # sag census over worst-case tiles must stay within half the
        # pad (ADVICE r03 — a huge tile_px or coarse source grid
        # through a composed transform could otherwise bow the
        # preimage edge past the pad and crop gathers silently)
        sag = _plane_sag_px(tf, dst_gt, src_inv, tile_px, tiles_x, tiles_y)
        if sag > _PLANE_PAD_PX / 2.0:
            raise ValueError(
                f"plane warp edge sag {sag:.2f} source px exceeds the "
                f"{_PLANE_PAD_PX / 2.0:.1f}-px budget (pad {_PLANE_PAD_PX:.0f}): "
                f"the 3x3 boundary sample cannot bound this transform at "
                f"tile_px={tile_px}; use a smaller tile_px or a finer dst grid"
            )
        fracs = (0.0, 0.5, 1.0)
        scs, srs_ = [], []
        for fx in fracs:
            for fy in fracs:
                wx = F.lit(d0) + (F.col("ocx") + F.lit(fx)) * F.lit(T * d1)
                wy = F.lit(d3) + (F.col("ocy") + F.lit(fy)) * F.lit(T * d5)
                sx, sy = tf.col_xy(wx, wy)
                scs.append(_src_px(sx, i0, i1))
                srs_.append(_src_px(sy, i3, i5))
        # cubic taps reach 2.5 source px past a pixel CENTER (lanczos
        # a=3: 3.5), and the bbox bounds the tile boundary — widen the
        # pad accordingly
        ppad = int(_PLANE_PAD_PX) + {"cubic": 2, "cubicspline": 2,
                                     "lanczos": 3}.get(method, 0)
        c0 = (F.floor(F.least(*scs)) - ppad).cast("long")
        c1 = (F.ceil(F.greatest(*scs)) + ppad).cast("long")
        r0 = (F.floor(F.least(*srs_)) - ppad).cast("long")
        r1 = (F.ceil(F.greatest(*srs_)) + ppad).cast("long")
    else:
        # the two pixel-corner world coords per axis, through the inverse
        xs0 = tf.col_x(F.lit(d0) + F.col("ocx") * F.lit(T * d1))
        xs1 = tf.col_x(F.lit(d0) + (F.col("ocx") + 1) * F.lit(T * d1))
        ys0 = tf.col_y(F.lit(d3) + F.col("ocy") * F.lit(T * d5))
        ys1 = tf.col_y(F.lit(d3) + (F.col("ocy") + 1) * F.lit(T * d5))
        sc0, sc1 = _src_px(xs0, i0, i1), _src_px(xs1, i0, i1)
        sr0, sr1 = _src_px(ys0, i3, i5), _src_px(ys1, i3, i5)
        # nearest/bilinear read ≤1 px past the tile-corner bound;
        # cubic's 4x4 taps reach 2.5 px past a pixel center (lanczos
        # a=3's 6x6: 3.5 → pad 4); the footprint kernels read the
        # pixel-corner footprint exactly (pad 2 for slack)
        pad = {"nearest": 1, "bilinear": 1, "cubic": 3, "cubicspline": 3,
               "lanczos": 4}.get(method, 2)
        c0 = (F.floor(F.least(sc0, sc1)) - pad).cast("long")
        c1 = (F.ceil(F.greatest(sc0, sc1)) + pad).cast("long")
        r0 = (F.floor(F.least(sr0, sr1)) - pad).cast("long")
        r1 = (F.ceil(F.greatest(sr0, sr1)) + pad).cast("long")
    bounded = base.select(
        "ocx", "ocy",
        F.greatest(F.floor(c0 / tile_px).cast("long"), F.lit(0)).alias("sx_lo"),
        F.floor(c1 / tile_px).cast("long").alias("sx_hi"),
        F.greatest(F.floor(r0 / tile_px).cast("long"), F.lit(0)).alias("sy_lo"),
        F.floor(r1 / tile_px).cast("long").alias("sy_hi"),
    ).filter((F.col("sx_hi") >= F.col("sx_lo")) & (F.col("sy_hi") >= F.col("sy_lo")))
    cover = (
        bounded.select(
            "ocx", "ocy",
            F.explode(F.sequence(F.col("sx_lo"), F.col("sx_hi"))).alias("scx"),
            "sy_lo", "sy_hi",
        )
        .select(
            "ocx", "ocy", "scx",
            F.explode(F.sequence(F.col("sy_lo"), F.col("sy_hi"))).alias("scy"),
        )
    )
    # destination entirely outside source coverage degrades to an empty
    # inner join — absent tiles, not an error (mbtiles.cpp:188-192)
    joined = cover.join(src_tiles, ["scx", "scy"], "inner")

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
        # win carries values (NaN where no tile pasted), Mw carries
        # validity 0/1. Without with_mask, Mw is pure PRESENCE (a
        # pasted tile is u8-decoded, never NaN — Mw ≡ ~isnan(win)), so
        # ONE kernel implementation serves both modes; per-pixel
        # source masks refine Mw only when with_mask asked for them.
        win = np.full((win_h, win_w), np.nan)
        Mw = np.zeros((win_h, win_w), np.float64)
        for r in pdf.itertuples():
            dec = codecs.decode(bytes(r.tile))
            if band >= dec.shape[2]:
                raise ValueError(
                    f"warp band={band} but source tile has {dec.shape[2]} band(s)"
                )
            img = dec[:, :, band].astype(np.float64)
            oy = (int(r.scy) - r0) * tile_px
            ox = (int(r.scx) - c0) * tile_px
            win[oy : oy + img.shape[0], ox : ox + img.shape[1]] = img
            mpatch = np.ones(img.shape, np.float64)
            if with_mask:
                rm = getattr(r, "mask", None)
                if rm is not None:
                    mpatch = (
                        np.frombuffer(bytes(rm), np.uint8).reshape(img.shape) > 0
                    ).astype(np.float64)
            Mw[oy : oy + img.shape[0], ox : ox + img.shape[1]] = mpatch
        # destination pixel centers → world → source pixel coords
        cols = ocx * tile_px + np.arange(tile_px) + 0.5
        rws = ocy * tile_px + np.arange(tile_px) + 0.5
        igt = gt_invert(np.asarray(sgt, np.float64))
        if plane:
            WX, WY = np.meshgrid(dgt[0] + cols * dgt[1], dgt[3] + rws * dgt[5])
            sx, sy = tf.np_xy(WX, WY)
            SC = igt[0] + sx * igt[1] - c0 * tile_px
            SR = igt[3] + sy * igt[5] - r0 * tile_px
        else:
            wx = tf.np_x(dgt[0] + cols * dgt[1])
            wy = tf.np_y(dgt[3] + rws * dgt[5])
            scol = igt[0] + wx * igt[1] - c0 * tile_px
            srow = igt[3] + wy * igt[5] - r0 * tile_px
            SC, SR = np.meshgrid(scol, srow)
        # destination pixels whose source CENTER falls outside the
        # assembled window are outside source coverage → nodata, not
        # edge-replicated values (review r02b; the reference warp
        # writes nodata there). Bilinear TAPS at the boundary still
        # edge-clamp, the standard in-coverage convention.
        in_cov = (SC >= 0) & (SC < win_w) & (SR >= 0) & (SR < win_h)
        # ONE mask-carrying implementation per kernel (r04 review: the
        # earlier masked/unmasked twin branches were a divergence
        # hazard). Vz zeroes invalid/absent pixels so no NaN reaches
        # the arithmetic; validity travels in (Vz, Mw, valid). With
        # with_mask=False, Mw is presence, and each kernel's output is
        # value-identical to the historical NaN-poisoning code (same
        # FP expressions over the same finite inputs) — the only
        # POLICY split is bilinear: masked renormalizes over valid
        # taps, unmasked keeps any-absent-tap → nodata.
        Vz = np.where(Mw > 0, np.where(np.isnan(win), 0.0, win), 0.0)
        if method == "nearest":
            xi = np.clip(np.floor(SC).astype(np.int64), 0, win_w - 1)
            yi = np.clip(np.floor(SR).astype(np.int64), 0, win_h - 1)
            out = Vz[yi, xi]
            valid = (Mw[yi, xi] > 0) & in_cov
        elif method == "bilinear":
            x0 = np.floor(SC - 0.5).astype(np.int64)
            y0 = np.floor(SR - 0.5).astype(np.int64)
            fx = (SC - 0.5) - x0
            fy = (SR - 0.5) - y0
            x0c = np.clip(x0, 0, win_w - 1)
            x1c = np.clip(x0 + 1, 0, win_w - 1)
            y0c = np.clip(y0, 0, win_h - 1)
            y1c = np.clip(y0 + 1, 0, win_h - 1)
            if with_mask:
                w00 = (1 - fx) * (1 - fy) * Mw[y0c, x0c]
                w10 = fx * (1 - fy) * Mw[y0c, x1c]
                w01 = (1 - fx) * fy * Mw[y1c, x0c]
                w11 = fx * fy * Mw[y1c, x1c]
                num = (Vz[y0c, x0c] * w00 + Vz[y0c, x1c] * w10
                       + Vz[y1c, x0c] * w01 + Vz[y1c, x1c] * w11)
                den = w00 + w10 + w01 + w11
                valid = (den > 0) & in_cov
                out = num / np.where(den > 0, den, 1.0)
            else:
                out = (
                    win[y0c, x0c] * (1 - fx) * (1 - fy)
                    + win[y0c, x1c] * fx * (1 - fy)
                    + win[y1c, x0c] * (1 - fx) * fy
                    + win[y1c, x1c] * fx * fy
                )
                valid = ~np.isnan(out) & in_cov
        elif method == "cubic":
            # 4x4 Keys taps, edge-clamped like bilinear's boundary
            # taps; validity requires the FULL support (any absent or
            # masked tap invalidates — the strictest reading of
            # "cubic needs a full support")
            tx, ty = SC - 0.5, SR - 0.5
            x0 = np.floor(tx).astype(np.int64)
            y0 = np.floor(ty).astype(np.int64)
            wx = _cubic_w(tx - x0)
            wy = _cubic_w(ty - y0)
            xs = [np.clip(x0 + d, 0, win_w - 1) for d in (-1, 0, 1, 2)]
            ys = [np.clip(y0 + d, 0, win_h - 1) for d in (-1, 0, 1, 2)]
            rows_ = [
                wx[0] * Vz[yy, xs[0]] + wx[1] * Vz[yy, xs[1]]
                + wx[2] * Vz[yy, xs[2]] + wx[3] * Vz[yy, xs[3]]
                for yy in ys
            ]
            out = (wy[0] * rows_[0] + wy[1] * rows_[1]
                   + wy[2] * rows_[2] + wy[3] * rows_[3])
            sup = np.ones_like(out, dtype=bool)
            for yy in ys:
                for xx in xs:
                    sup &= Mw[yy, xx] > 0
            valid = sup & in_cov
        elif method == "cubicspline":
            # 4x4 uniform cubic B-spline taps — the smoothing kernel
            # of the reference Resampling enum. Same support, pads and
            # full-support validity rule as cubic; computed with the
            # ×6-scaled dyadic weights and one final ÷36 (see
            # _bspline_w6 — exactly one rounding, SQL-replayable)
            tx, ty = SC - 0.5, SR - 0.5
            x0 = np.floor(tx).astype(np.int64)
            y0 = np.floor(ty).astype(np.int64)
            wx = _bspline_w6(tx - x0)
            wy = _bspline_w6(ty - y0)
            xs = [np.clip(x0 + d, 0, win_w - 1) for d in (-1, 0, 1, 2)]
            ys = [np.clip(y0 + d, 0, win_h - 1) for d in (-1, 0, 1, 2)]
            rows_ = [
                wx[0] * Vz[yy, xs[0]] + wx[1] * Vz[yy, xs[1]]
                + wx[2] * Vz[yy, xs[2]] + wx[3] * Vz[yy, xs[3]]
                for yy in ys
            ]
            out = (wy[0] * rows_[0] + wy[1] * rows_[1]
                   + wy[2] * rows_[2] + wy[3] * rows_[3]) / 36.0
            sup = np.ones_like(out, dtype=bool)
            for yy in ys:
                for xx in xs:
                    sup &= Mw[yy, xx] > 0
            valid = sup & in_cov
        elif method == "lanczos":
            # 6x6 Lanczos-3 windowed-sinc taps (the quality upsampler
            # of the reference Resampling enum,
            # gdaldriversmodule.cpp:205-225), per-axis weight
            # normalization, edge-clamped boundary taps; validity
            # requires the FULL support like cubic (negative lobes
            # renormalize badly)
            A = 3
            tx, ty = SC - 0.5, SR - 0.5
            x0 = np.floor(tx).astype(np.int64)
            y0 = np.floor(ty).astype(np.int64)
            wx = _lanczos_w(tx - x0, A)
            wy = _lanczos_w(ty - y0, A)
            wxs = sum(wx)
            wys = sum(wy)
            wx = [w / wxs for w in wx]
            wy = [w / wys for w in wy]
            offs = range(-A + 1, A + 1)
            xs = [np.clip(x0 + d, 0, win_w - 1) for d in offs]
            ys = [np.clip(y0 + d, 0, win_h - 1) for d in offs]
            rows_ = [
                sum(wx[i] * Vz[yy, xs[i]] for i in range(2 * A)) for yy in ys
            ]
            out = sum(wy[i] * rows_[i] for i in range(2 * A))
            sup = np.ones_like(out, dtype=bool)
            for yy in ys:
                for xx in xs:
                    sup &= Mw[yy, xx] > 0
            valid = sup & in_cov
        else:
            # footprint kernels (average / sum / rms / min / max —
            # the overview-building family of the reference Resampling
            # enum): the dst pixel's exact source-space footprint
            # comes from its pixel-EDGE coords through the (separable)
            # transform. Invalid (absent or masked) source pixels are
            # excluded everywhere — a footprint with no valid pixel is
            # nodata.
            exd = ocx * tile_px + np.arange(tile_px + 1)
            eyd = ocy * tile_px + np.arange(tile_px + 1)
            sce = igt[0] + tf.np_x(dgt[0] + exd * dgt[1]) * igt[1] - c0 * tile_px
            sre = igt[3] + tf.np_y(dgt[3] + eyd * dgt[5]) * igt[5] - r0 * tile_px
            loX = np.minimum(sce[:-1], sce[1:])[:, None]
            hiX = np.maximum(sce[:-1], sce[1:])[:, None]
            loY = np.minimum(sre[:-1], sre[1:])[:, None]
            hiY = np.maximum(sre[:-1], sre[1:])[:, None]
            if method in ("average", "sum", "rms"):
                # area-WEIGHTED linear/quadratic reductions: per-axis
                # overlap weights, one pair of small matmuls per tile
                Px = np.arange(win_w)[None, :]
                Py = np.arange(win_h)[None, :]
                Wx = np.clip(np.minimum(hiX, Px + 1) - np.maximum(loX, Px), 0.0, None)
                Wy = np.clip(np.minimum(hiY, Py + 1) - np.maximum(loY, Py), 0.0, None)
                den = Wy @ Mw @ Wx.T
                valid = den > 0
                dsafe = np.where(valid, den, 1.0)
                if method == "average":
                    out = np.where(valid, (Wy @ Vz @ Wx.T) / dsafe, 0.0)
                elif method == "sum":
                    out = np.where(valid, Wy @ Vz @ Wx.T, 0.0)
                else:  # rms — quadratic mean of contributions
                    out = np.where(
                        valid, np.sqrt((Wy @ (Vz * Vz) @ Wx.T) / dsafe), 0.0
                    )
            else:
                # UNWEIGHTED footprint kernels — min/max extrema and
                # the rank family mode/med/q1/q3 — over every valid
                # source pixel the footprint touches (overlap > EPS —
                # GDAL's contributing-pixel rule). Vectorized as a
                # bounded loop over the footprint span (≤ ceil(scale)+1
                # per axis), each step one fancy-indexed gather.
                # membership threshold: edge coords carry FP jitter on
                # non-dyadic grids (e.g. pixel size 1/48), giving
                # neighbor pixels ~1e-15 overlap. Weighted kernels are
                # immune (the weight IS the measure) but an unweighted
                # kernel would count such a pixel FULLY — so a pixel
                # contributes only above a 1e-9-px overlap (no real
                # footprint is that thin; caught by the 1/48-grid test)
                EPS = 1e-9
                xlo = np.floor(loX[:, 0]).astype(np.int64)
                ylo = np.floor(loY[:, 0]).astype(np.int64)
                Sx = int(np.max(np.ceil(hiX[:, 0]) - xlo))
                Sy = int(np.max(np.ceil(hiY[:, 0]) - ylo))

                def _fp_slots(r0, r1):
                    """Yield (ok, v) for each of the Sy·Sx footprint
                    slots of output rows r0:r1 — the ONE membership
                    rule (overlap > EPS, in-window, mask-valid) every
                    unweighted kernel shares, so a fix to it cannot
                    diverge between the extrema and rank branches."""
                    for dy in range(Sy):
                        yi = ylo[r0:r1] + dy
                        wyl = (np.minimum(hiY[r0:r1, 0], yi + 1)
                               - np.maximum(loY[r0:r1, 0], yi))
                        rowok = (wyl > EPS) & (yi >= 0) & (yi < win_h)
                        yic = np.clip(yi, 0, win_h - 1)
                        for dx in range(Sx):
                            xi = xlo + dx
                            wxl = (np.minimum(hiX[:, 0], xi + 1)
                                   - np.maximum(loX[:, 0], xi))
                            colok = (wxl > EPS) & (xi >= 0) & (xi < win_w)
                            xic = np.clip(xi, 0, win_w - 1)
                            ok = (rowok[:, None] & colok[None, :]
                                  & (Mw[yic[:, None], xic[None, :]] > 0))
                            yield ok, Vz[yic[:, None], xic[None, :]]

                if method in ("min", "max"):
                    # streaming accumulation — O(tile²) memory no
                    # matter the footprint span
                    acc = np.full((tile_px, tile_px),
                                  np.inf if method == "min" else -np.inf)
                    cnt = np.zeros((tile_px, tile_px))
                    for ok, v in _fp_slots(0, tile_px):
                        if method == "min":
                            acc = np.where(ok, np.minimum(acc, v), acc)
                        else:
                            acc = np.where(ok, np.maximum(acc, v), acc)
                        cnt += ok
                    valid = cnt > 0
                    out = np.where(valid, acc, 0.0)
                else:
                    # rank-based kernels — mode / med / q1 / q3 — need
                    # the footprint's VALUE SET per pixel (majority
                    # vote or order statistic; mask policy: ≥1 valid
                    # pixel, like average). The value cube is
                    # O(rows·tile_px·S²) — unlike the streaming
                    # extrema — so output rows are processed in chunks
                    # that cap the cube at ~64 MB: a 32× single-step
                    # mode at tile_px=256 would otherwise allocate
                    # ~570 MB per in-flight task and OOM executors.
                    # CPU is still O(S²) per pixel — overview factors
                    # only; for extreme single-step downsamples build
                    # a pyramid instead.
                    s_total = Sy * Sx
                    chunk = max(1, min(tile_px, int(
                        rank_cube_bytes // max(1, tile_px * s_total * 8))))
                    out = np.zeros((tile_px, tile_px))
                    valid = np.zeros((tile_px, tile_px), dtype=bool)
                    for r0 in range(0, tile_px, chunk):
                        r1 = min(tile_px, r0 + chunk)
                        vals = np.full((r1 - r0, tile_px, s_total), -1.0)
                        for s, (ok, v) in enumerate(_fp_slots(r0, r1)):
                            vals[:, :, s] = np.where(ok, v, -1.0)
                        present = vals >= 0
                        if method == "mode":
                            # MAJORITY VOTE — the categorical-raster
                            # downsampler of the reference Resampling
                            # enum. Tie-break: the LOWEST value wins
                            # (GDAL's rule: among equal counts the
                            # first-encountered smallest value is
                            # kept), encoded as score =
                            # count·256 + (255 − value) so one argmax
                            # resolves both count and tie
                            # deterministically — exact integers,
                            # hence a bit-exact SQL oracle (unlike
                            # lanczos)
                            best_score = np.full((r1 - r0, tile_px), -1.0)
                            best_val = np.zeros((r1 - r0, tile_px))
                            for i in range(s_total):
                                vi = vals[:, :, i]
                                cnt_i = ((vals == vi[:, :, None])
                                         & present).sum(axis=2)
                                score = np.where(
                                    vi >= 0,
                                    cnt_i * 256.0 + (255.0 - vi), -1.0,
                                )
                                upd = score > best_score
                                best_score = np.where(upd, score, best_score)
                                best_val = np.where(upd, vi, best_val)
                            valid[r0:r1] = best_score >= 0
                            out[r0:r1] = np.where(
                                best_score >= 0, best_val, 0.0)
                        else:
                            # med / q1 / q3: ORDER STATISTICS of the
                            # contributing set — the robust-
                            # downsampling trio of GDAL's Resampling
                            # enum. Quantile rule: linear
                            # interpolation at p·(n−1) (R type-7 —
                            # the rule Spark's percentile and DuckDB's
                            # quantile_cont share, so the SQL oracle
                            # replays it bit-exactly; med ≡ p=0.5, the
                            # mean of the two middles at even n).
                            # Dyadic footprints keep the interpolation
                            # exact in IEEE. np.sort puts the −1
                            # sentinels first, so the valid run
                            # occupies the LAST nval slots of each
                            # pixel's sorted span.
                            q = {"q1": 0.25, "med": 0.5, "q3": 0.75}[method]
                            order = np.sort(vals, axis=2)
                            nval = present.sum(axis=2)
                            ok_px = nval > 0
                            n1 = np.maximum(nval - 1, 0)
                            pos = q * n1
                            lo = np.floor(pos).astype(np.int64)
                            hi = np.minimum(lo + 1, n1)
                            frac = pos - lo
                            base_i = s_total - nval

                            def _at(rank):
                                idx = np.clip(base_i + rank, 0, s_total - 1)
                                return np.take_along_axis(
                                    order, idx[..., None], axis=2
                                )[..., 0]

                            v_lo, v_hi = _at(lo), _at(hi)
                            valid[r0:r1] = ok_px
                            out[r0:r1] = np.where(
                                ok_px, v_lo + frac * (v_hi - v_lo), 0.0)
        out = np.where(valid, out, nodata)
        tile = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        row = {
            "ocx": [ocx], "ocy": [ocy],
            "tile": [tile.tobytes()], "ts": [tile_px], "n_src": [len(pdf)],
        }
        if with_mask:
            row["mask"] = [(valid.astype(np.uint8) * 255).tobytes()]
        return pd.DataFrame(row)

    return joined.groupBy("ocx", "ocy").applyInPandas(
        _warp, WARP_MASK_SCHEMA if with_mask else WARP_SCHEMA
    )
