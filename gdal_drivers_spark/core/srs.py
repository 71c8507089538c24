"""Coordinate-system transforms — the cross-SRS piece of the
reference's ``warp(srs=...)`` Python API
(``/root/reference/gdal-drivers/python/gdaldriversmodule.cpp:182-204``,
which delegates to GDAL). The engine implements the transforms it
needs from the PUBLIC closed-form formulas instead of linking GDAL:

- ``EPSG:4326`` (WGS84 lon/lat degrees) ↔ ``EPSG:3857`` (spherical
  Web Mercator meters), the pair that covers the tiled-web-map world
  the MVT/MBTiles drivers live in. Spherical Mercator forward:
  ``x = R·λ·π/180``, ``y = R·ln(tan(π/4 + φ·π/360))``; inverse:
  ``λ = x/R·180/π``, ``φ = (2·atan(e^{y/R}) − π/2)·180/π`` with
  ``R = 6378137`` (the published EPSG:3857 sphere radius).

Each ``AxisTransform`` is AXIS-SEPARABLE and MONOTONE (x' depends only
on x, y' only on y, both strictly increasing), which is what makes the
distributed warp exact: a destination tile's source bbox is computed
from its corners alone, and both the numpy (executor gather) and the
Column (cover generation / oracle SQL) forms express the same math.

Round 3 adds ``PlaneTransform`` — full 2-D (x', y') = f(x, y) — for
the conformal projections whose axes mix, with the same dual-form
contract plus boundary-sampled source bboxes in the warp:

- ``EPSG:326zz``/``EPSG:327zz`` (WGS84 UTM zone zz north/south) ↔
  ``EPSG:4326``: ellipsoidal transverse Mercator, Snyder (1987, "Map
  Projections — A Working Manual", USGS PP 1395) eq. 3-21/8-9..8-15
  forward and 8-18..8-25 series inverse, k₀ = 0.9996, mm-accurate
  within a zone. The most common real reference-`warp()` pair
  (UTM → WebMercator) composes through 4326 automatically.
- ``EPSG:5041`` (UPS North) ↔ ``EPSG:4326``: ellipsoidal polar
  stereographic (Snyder eq. 21-33/15-11, conformal-latitude series
  inverse 3-5), k₀ = 0.994, false E/N 2 000 000.

All three formula backends (numpy for the executor gather, Column for
distributed cover generation, SQL text for the DuckDB oracle) are
generated from ONE formula source (`_Ops` dispatch), so the oracle is
bit-identical by construction — the same IEEE expression tree runs in
every engine (the repo's libm-parity rule). Truly general curvilinear
SRS pairs (datum shifts, grids) stay out of scope, as in SURVEY §7.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

R_MERC = 6378137.0
_D2R = math.pi / 180.0


@dataclass(frozen=True)
class AxisTransform:
    """A separable monotone SRS transform: world (x,y) in ``src`` →
    world (x,y) in ``dst``, given as per-axis numpy and Column forms."""

    src: str
    dst: str
    np_x: Callable[[np.ndarray], np.ndarray]
    np_y: Callable[[np.ndarray], np.ndarray]
    col_x: Callable[[Column], Column]
    col_y: Callable[[Column], Column]


def _identity(s: str) -> AxisTransform:
    return AxisTransform(s, s, lambda x: x, lambda y: y, lambda c: c, lambda c: c)


def _geo_to_merc() -> AxisTransform:
    return AxisTransform(
        "EPSG:4326", "EPSG:3857",
        np_x=lambda lon: R_MERC * _D2R * lon,
        np_y=lambda lat: R_MERC * np.log(np.tan(math.pi / 4.0 + _D2R * lat / 2.0)),
        col_x=lambda lon: lon * F.lit(R_MERC * _D2R),
        col_y=lambda lat: F.lit(R_MERC)
        * F.log(F.tan(F.lit(math.pi / 4.0) + lat * F.lit(_D2R / 2.0))),
    )


def _merc_to_geo() -> AxisTransform:
    return AxisTransform(
        "EPSG:3857", "EPSG:4326",
        np_x=lambda x: x / (R_MERC * _D2R),
        np_y=lambda y: (2.0 * np.arctan(np.exp(y / R_MERC)) - math.pi / 2.0) / _D2R,
        col_x=lambda x: x / F.lit(R_MERC * _D2R),
        col_y=lambda y: (
            F.lit(2.0) * F.atan(F.exp(y / F.lit(R_MERC))) - F.lit(math.pi / 2.0)
        ) / F.lit(_D2R),
    )


@dataclass(frozen=True)
class PlaneTransform:
    """A full 2-D SRS transform (x', y') = f(x, y) for projections
    whose axes mix (transverse Mercator, polar stereographic). Same
    dual-form contract as AxisTransform: ``np_xy`` for the executor
    gather, ``col_xy`` for distributed cover generation / oracles."""

    src: str
    dst: str
    np_xy: Callable  # (np.ndarray, np.ndarray) -> (np.ndarray, np.ndarray)
    col_xy: Callable  # (Column, Column) -> (Column, Column)


def as_plane(tf) -> "PlaneTransform":
    """Lift an AxisTransform to the PlaneTransform interface."""
    if isinstance(tf, PlaneTransform):
        return tf
    return PlaneTransform(
        tf.src, tf.dst,
        np_xy=lambda x, y: (tf.np_x(x), tf.np_y(y)),
        col_xy=lambda x, y: (tf.col_x(x), tf.col_y(y)),
    )


# ---------------------------------------------------------------------------
# Three formula backends from one source: the projection formulas below
# are written once against an `_Ops` namespace; instantiating them with
# numpy ufuncs, pyspark Columns, or SQL-text expression builders yields
# the SAME IEEE expression tree in every engine (libm parity rule —
# scalar libm is bit-identical across python/JVM/DuckDB on this class
# of functions, BENCH.md/memory note; powers are written as explicit
# multiplies so no engine can choose a different pow path).
# ---------------------------------------------------------------------------


class _SqlExpr:
    """SQL-text expression node. Every binary op parenthesizes, floats
    render via repr() (exact round-trip to the same double)."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    @staticmethod
    def _fmt(v) -> str:
        return v.s if isinstance(v, _SqlExpr) else repr(float(v))

    def _bin(self, other, op, rev=False):
        a, b = (self._fmt(other), self.s) if rev else (self.s, self._fmt(other))
        return _SqlExpr(f"({a} {op} {b})")

    def __add__(self, o):
        return self._bin(o, "+")

    def __radd__(self, o):
        return self._bin(o, "+", True)

    def __sub__(self, o):
        return self._bin(o, "-")

    def __rsub__(self, o):
        return self._bin(o, "-", True)

    def __mul__(self, o):
        return self._bin(o, "*")

    def __rmul__(self, o):
        return self._bin(o, "*", True)

    def __truediv__(self, o):
        return self._bin(o, "/")

    def __rtruediv__(self, o):
        return self._bin(o, "/", True)

    def __neg__(self):
        return _SqlExpr(f"(- {self.s})")


def _sql_fn(name):
    def call(*args):
        return _SqlExpr(f"{name}({', '.join(_SqlExpr._fmt(a) for a in args)})")

    return call


class _Ops:
    """Math-function dispatch for the shared formula source."""

    def __init__(self, **fns):
        self.__dict__.update(fns)


NP_OPS = _Ops(
    sin=np.sin, cos=np.cos, tan=np.tan, sqrt=np.sqrt,
    atan=np.arctan, atan2=np.arctan2, exp=np.exp, log=np.log,
)
COL_OPS = _Ops(
    sin=F.sin, cos=F.cos, tan=F.tan, sqrt=F.sqrt,
    atan=F.atan, atan2=F.atan2, exp=F.exp, log=F.log,
)
PY_OPS = _Ops(  # scalar math.* backend (constant precomputation)
    sin=math.sin, cos=math.cos, tan=math.tan, sqrt=math.sqrt,
    atan=math.atan, atan2=math.atan2, exp=math.exp, log=math.log,
)
SQL_OPS = _Ops(
    sin=_sql_fn("sin"), cos=_sql_fn("cos"), tan=_sql_fn("tan"),
    sqrt=_sql_fn("sqrt"), atan=_sql_fn("atan"), atan2=_sql_fn("atan2"),
    exp=_sql_fn("exp"), log=_sql_fn("ln"),
)

# WGS84 ellipsoid + derived constants (computed once in Python, so the
# identical double literals appear in every backend)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
E2 = WGS84_F * (2.0 - WGS84_F)
E4 = E2 * E2
E6 = E2 * E2 * E2
EP2 = E2 / (1.0 - E2)
K0_UTM = 0.9996
# meridian-arc series coefficients (Snyder eq. 3-21)
_MC0 = 1.0 - E2 / 4.0 - 3.0 * E4 / 64.0 - 5.0 * E6 / 256.0
_MC2 = 3.0 * E2 / 8.0 + 3.0 * E4 / 32.0 + 45.0 * E6 / 1024.0
_MC4 = 15.0 * E4 / 256.0 + 45.0 * E6 / 1024.0
_MC6 = 35.0 * E6 / 3072.0
# footpoint-latitude series (Snyder eq. 3-26)
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
_F2 = 3.0 * _E1 / 2.0 - 27.0 * (_E1 * _E1 * _E1) / 32.0
_F4 = 21.0 * (_E1 * _E1) / 16.0 - 55.0 * (_E1 * _E1 * _E1 * _E1) / 32.0
_F6 = 151.0 * (_E1 * _E1 * _E1) / 96.0
_F8 = 1097.0 * (_E1 * _E1 * _E1 * _E1) / 512.0


def tm_forward(lon_deg, lat_deg, lon0_deg: float, false_northing: float, m=NP_OPS):
    """Ellipsoidal transverse Mercator forward (Snyder eq. 8-9..8-15):
    WGS84 lon/lat degrees → (easting, northing) meters, k₀ = 0.9996,
    false easting 500 000. Valid across a UTM zone's ±3°+overlap;
    mm-level series accuracy. Backend-generic (see module docstring)."""
    lam = lon_deg * _D2R
    phi = lat_deg * _D2R
    s = m.sin(phi)
    c = m.cos(phi)
    t = m.tan(phi)
    N = WGS84_A / m.sqrt(1.0 - E2 * (s * s))
    T = t * t
    C = EP2 * (c * c)
    A = (lam - lon0_deg * _D2R) * c
    A2 = A * A
    A3 = A2 * A
    A4 = A2 * A2
    A5 = A4 * A
    A6 = A4 * A2
    M = WGS84_A * (
        _MC0 * phi
        - _MC2 * m.sin(2.0 * phi)
        + _MC4 * m.sin(4.0 * phi)
        - _MC6 * m.sin(6.0 * phi)
    )
    x = (
        K0_UTM
        * N
        * (
            A
            + (1.0 - T + C) * A3 / 6.0
            + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * EP2) * A5 / 120.0
        )
        + 500000.0
    )
    y = K0_UTM * (
        M
        + N
        * t
        * (
            A2 / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * A4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * EP2) * A6 / 720.0
        )
    ) + false_northing
    return x, y


def tm_inverse(x, y, lon0_deg: float, false_northing: float, m=NP_OPS):
    """Ellipsoidal transverse Mercator inverse (Snyder eq. 8-18..8-25
    with the footpoint-latitude series 3-26). Backend-generic."""
    M = (y - false_northing) / K0_UTM
    mu = M / (WGS84_A * _MC0)
    phi1 = (
        mu
        + _F2 * m.sin(2.0 * mu)
        + _F4 * m.sin(4.0 * mu)
        + _F6 * m.sin(6.0 * mu)
        + _F8 * m.sin(8.0 * mu)
    )
    s1 = m.sin(phi1)
    c1 = m.cos(phi1)
    t1 = m.tan(phi1)
    C1 = EP2 * (c1 * c1)
    T1 = t1 * t1
    sin2 = 1.0 - E2 * (s1 * s1)
    N1 = WGS84_A / m.sqrt(sin2)
    R1 = WGS84_A * (1.0 - E2) / (sin2 * m.sqrt(sin2))
    D = (x - 500000.0) / (N1 * K0_UTM)
    D2 = D * D
    D3 = D2 * D
    D4 = D2 * D2
    D5 = D4 * D
    D6 = D4 * D2
    phi = phi1 - (N1 * t1 / R1) * (
        D2 / 2.0
        - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 * C1 - 9.0 * EP2) * D4 / 24.0
        + (
            61.0
            + 90.0 * T1
            + 298.0 * C1
            + 45.0 * T1 * T1
            - 252.0 * EP2
            - 3.0 * C1 * C1
        )
        * D6
        / 720.0
    )
    lam = lon0_deg * _D2R + (
        D
        - (1.0 + 2.0 * T1 + C1) * D3 / 6.0
        + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 * C1 + 8.0 * EP2 + 24.0 * T1 * T1)
        * D5
        / 120.0
    ) / c1
    return lam / _D2R, phi / _D2R


# UPS North (EPSG:5041): polar stereographic, Snyder eq. 21-33/15-11;
# inverse via conformal latitude series (Snyder eq. 3-5)
_E1SQ = math.sqrt(E2)  # first eccentricity e
K0_UPS = 0.994
UPS_FE = 2000000.0
UPS_FN = 2000000.0
_PS_RHO_DEN = math.sqrt(
    (1.0 + _E1SQ) ** (1.0 + _E1SQ) * (1.0 - _E1SQ) ** (1.0 - _E1SQ)
)
_X2 = E2 / 2.0 + 5.0 * E4 / 24.0 + E6 / 12.0 + 13.0 * E4 * E4 / 360.0
_X4 = 7.0 * E4 / 48.0 + 29.0 * E6 / 240.0 + 811.0 * E4 * E4 / 11520.0
_X6 = 7.0 * E6 / 120.0 + 81.0 * E4 * E4 / 1120.0
_X8 = 4279.0 * E4 * E4 / 161280.0


def _conformal_t(phi, e, m):
    """Polar-stereographic / LCC shared ``t`` (Snyder eq. 15-9):
    ``tan(π/4 − φ/2) / ((1−e·sinφ)/(1+e·sinφ))^(e/2)`` — the power
    written exp∘ln so every backend takes the identical libm path."""
    es = e * m.sin(phi)
    return m.tan(math.pi / 4.0 - phi / 2.0) / m.exp(
        (e / 2.0) * m.log((1.0 - es) / (1.0 + es))
    )


def _chi_series(chi, x2, x4, x6, x8, m):
    """Conformal→geodetic latitude series (Snyder eq. 3-5) — ONE
    definition shared by the UPS and LCC inverses so a precision or
    coefficient fix can never diverge between them."""
    return (
        chi
        + x2 * m.sin(2.0 * chi)
        + x4 * m.sin(4.0 * chi)
        + x6 * m.sin(6.0 * chi)
        + x8 * m.sin(8.0 * chi)
    )


def _ups_forward(lon_deg, lat_deg, south: bool, m):
    """Shared UPS body (EPSG method 9810): the south aspect negates φ
    and mirrors the northing term; everything else is identical."""
    lam = lon_deg * _D2R
    phi = (-(lat_deg * _D2R)) if south else (lat_deg * _D2R)
    t = _conformal_t(phi, _E1SQ, m)
    rho = 2.0 * WGS84_A * K0_UPS * t / _PS_RHO_DEN
    x = UPS_FE + rho * m.sin(lam)
    y = (UPS_FN + rho * m.cos(lam)) if south else (UPS_FN - rho * m.cos(lam))
    return x, y


def _ups_inverse(x, y, south: bool, m):
    dx = x - UPS_FE
    dy = y - UPS_FN
    rho = m.sqrt(dx * dx + dy * dy)
    t = rho * _PS_RHO_DEN / (2.0 * WGS84_A * K0_UPS)
    chi = math.pi / 2.0 - 2.0 * m.atan(t)
    phi = _chi_series(chi, _X2, _X4, _X6, _X8, m)
    lam = m.atan2(dx, dy) if south else m.atan2(dx, -dy)
    return lam / _D2R, (-(phi / _D2R)) if south else (phi / _D2R)


def ups_north_forward(lon_deg, lat_deg, m=NP_OPS):
    """UPS North (EPSG:5041) forward: lon/lat degrees → (E, N)."""
    return _ups_forward(lon_deg, lat_deg, False, m)


def ups_north_inverse(x, y, m=NP_OPS):
    """UPS North inverse via the conformal-latitude series."""
    return _ups_inverse(x, y, False, m)


def ups_south_forward(lon_deg, lat_deg, m=NP_OPS):
    """UPS South (EPSG:5042) forward — the south-polar aspect: φ, the
    meridian sense and the northing axis mirrored (method 9810 ‘B’)."""
    return _ups_forward(lon_deg, lat_deg, True, m)


def ups_south_inverse(x, y, m=NP_OPS):
    """UPS South inverse (conformal-latitude series, mirrored)."""
    return _ups_inverse(x, y, True, m)


_REGISTRY: dict[tuple[str, str], Callable[[], AxisTransform]] = {
    ("EPSG:4326", "EPSG:3857"): _geo_to_merc,
    ("EPSG:3857", "EPSG:4326"): _merc_to_geo,
}


def register_transform(tf) -> None:
    """Plug a user-supplied SRS pair (AxisTransform or PlaneTransform)
    into the registry (both the numpy and Column forms are required —
    the warp needs the first for the executor gather and the second for
    the distributed cover generation). General curvilinear transforms
    (datum shifts, grid-based) remain unsupported by design (SURVEY §7)."""
    _REGISTRY[(tf.src, tf.dst)] = lambda: tf


def _utm_params(code: str):
    """'EPSG:326zz'/'EPSG:327zz' → (central meridian deg, false
    northing) or None."""
    if not code.startswith("EPSG:32") or len(code) != 10:
        return None
    kind, zz = code[7], code[8:]
    if kind not in "67" or not zz.isdigit():
        return None
    zone = int(zz)
    if not 1 <= zone <= 60:
        return None
    lon0 = -183.0 + 6.0 * zone
    return lon0, (10000000.0 if kind == "7" else 0.0)


def _dynamic_lookup(src: str, dst: str):
    """Resolve UTM/UPS pairs against EPSG:4326 by code pattern."""
    for code, fwd in ((dst, True), (src, False)):
        other = src if fwd else dst
        if other != "EPSG:4326":
            continue
        utm = _utm_params(code)
        if utm is not None:
            lon0, fn = utm
            if fwd:
                return PlaneTransform(
                    "EPSG:4326", code,
                    np_xy=lambda lon, lat: tm_forward(lon, lat, lon0, fn, NP_OPS),
                    col_xy=lambda lon, lat: tm_forward(lon, lat, lon0, fn, COL_OPS),
                )
            return PlaneTransform(
                code, "EPSG:4326",
                np_xy=lambda x, y: tm_inverse(x, y, lon0, fn, NP_OPS),
                col_xy=lambda x, y: tm_inverse(x, y, lon0, fn, COL_OPS),
            )
        if code in ("EPSG:5041", "EPSG:5042"):
            fwd_fn = ups_north_forward if code == "EPSG:5041" else ups_south_forward
            inv_fn = ups_north_inverse if code == "EPSG:5041" else ups_south_inverse
            if fwd:
                return PlaneTransform(
                    "EPSG:4326", code,
                    np_xy=lambda lon, lat: fwd_fn(lon, lat, NP_OPS),
                    col_xy=lambda lon, lat: fwd_fn(lon, lat, COL_OPS),
                )
            return PlaneTransform(
                code, "EPSG:4326",
                np_xy=lambda x, y: inv_fn(x, y, NP_OPS),
                col_xy=lambda x, y: inv_fn(x, y, COL_OPS),
            )
    return None


def _lookup(src: str, dst: str):
    entry = _REGISTRY.get((src, dst))
    if entry is not None:
        return entry()
    return _dynamic_lookup(src, dst)


def get_transform(src_srs: str, dst_srs: str):
    """Transform src→dst world coords (AxisTransform or
    PlaneTransform); identity when equal; UTM/UPS codes resolve
    dynamically and any pair composes through EPSG:4326 when both hops
    exist (e.g. EPSG:32633 → EPSG:3857, the common UTM→WebMercator
    warp). Raises for anything else (the reference raises through GDAL
    for unknown SRS too — unsupported is an error, not a silent
    no-op)."""
    if src_srs == dst_srs:
        return _identity(src_srs)
    tf = _lookup(src_srs, dst_srs)
    if tf is not None:
        return tf
    hub = "EPSG:4326"
    if src_srs != hub and dst_srs != hub:
        t1, t2 = _lookup(src_srs, hub), _lookup(hub, dst_srs)
        if t1 is not None and t2 is not None:
            p1, p2 = as_plane(t1), as_plane(t2)
            return PlaneTransform(
                src_srs, dst_srs,
                np_xy=lambda x, y: p2.np_xy(*p1.np_xy(x, y)),
                col_xy=lambda x, y: p2.col_xy(*p1.col_xy(x, y)),
            )
    raise ValueError(
        f"no transform {src_srs!r} → {dst_srs!r}; registered: "
        f"{sorted(_REGISTRY)} + dynamic UTM (EPSG:326zz/327zz), UPS "
        f"(EPSG:5041 north / EPSG:5042 south), register_lcc2sp zones "
        f"(EPSG:2154 pre-registered), and compositions through "
        "EPSG:4326 (general reprojection out of scope, SURVEY §7)"
    )


# ---------------------------------------------------------------- LCC 2SP
# Lambert conformal conic, two standard parallels (Snyder 1987 ch. 15,
# eq. 15-1..15-11; EPSG method 9802) — the family behind Lambert-93
# (EPSG:2154) and the US State Plane zones. Projection constants are
# precomputed in Python (identical double literals reach every
# backend); t^n runs power-free as exp(n·ln t).


def lcc2sp_constants(
    phi1_deg: float, phi2_deg: float, phi0_deg: float, lon0_deg: float,
    fe: float, fn: float, a: float = WGS84_A, f: float = WGS84_F,
) -> dict:
    """Precompute the LCC 2SP projection constants (pure Python —
    scalar math, exact doubles shared by all backends)."""
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)

    def mm(phi):
        return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)

    def tt(phi):
        return _conformal_t(phi, e, PY_OPS)

    p1, p2, p0 = (math.radians(v) for v in (phi1_deg, phi2_deg, phi0_deg))
    m1, m2 = mm(p1), mm(p2)
    t1, t2, t0 = tt(p1), tt(p2), tt(p0)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    Fc = m1 / (n * math.exp(n * math.log(t1)))
    rho0 = a * Fc * math.exp(n * math.log(t0))
    # conformal-latitude series coefficients for THIS ellipsoid
    e4, e6, e8 = e2 * e2, e2 * e2 * e2, e2 * e2 * e2 * e2
    return {
        "a": a, "e": e, "n": n, "F": Fc, "rho0": rho0,
        "lon0": lon0_deg, "fe": fe, "fn": fn,
        "x2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "x4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "x6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "x8": 4279.0 * e8 / 161280.0,
    }


def lcc2sp_forward(lon_deg, lat_deg, C: dict, m=NP_OPS):
    """LCC 2SP forward: lon/lat degrees → (easting, northing)."""
    phi = lat_deg * _D2R
    t = _conformal_t(phi, C["e"], m)
    rho = C["a"] * C["F"] * m.exp(C["n"] * m.log(t))
    theta = C["n"] * ((lon_deg - C["lon0"]) * _D2R)
    x = C["fe"] + rho * m.sin(theta)
    y = C["fn"] + C["rho0"] - rho * m.cos(theta)
    return x, y


def lcc2sp_inverse(x, y, C: dict, m=NP_OPS):
    """LCC 2SP inverse via the conformal-latitude series (Snyder
    eq. 3-5/15-11). Valid for n > 0 (northern-parallel cones — every
    registered zone); the dy term keeps atan2 well-defined there."""
    dx = x - C["fe"]
    dy = C["rho0"] - (y - C["fn"])
    rho = m.sqrt(dx * dx + dy * dy)
    t = m.exp((1.0 / C["n"]) * m.log(rho / (C["a"] * C["F"])))
    chi = math.pi / 2.0 - 2.0 * m.atan(t)
    phi = _chi_series(chi, C["x2"], C["x4"], C["x6"], C["x8"], m)
    lam = m.atan2(dx, dy) / C["n"] / _D2R + C["lon0"]
    return lam, phi / _D2R


def register_lcc2sp(
    name: str, phi1_deg: float, phi2_deg: float, phi0_deg: float,
    lon0_deg: float, fe: float, fn: float,
    a: float = WGS84_A, f: float = WGS84_F,
) -> dict:
    """Register ``name`` ↔ EPSG:4326 as an LCC 2SP PlaneTransform pair
    (both directions + compositions through 4326). Returns the
    constants dict (useful for oracle generation). The geographic hub
    stays WGS84 lon/lat; pass the zone's own ellipsoid via a/f (GRS80
    vs WGS84 differs below the mm, so Lambert-93-style zones are fine
    with either)."""
    C = lcc2sp_constants(phi1_deg, phi2_deg, phi0_deg, lon0_deg, fe, fn, a, f)
    register_transform(PlaneTransform(
        "EPSG:4326", name,
        np_xy=lambda lon, lat: lcc2sp_forward(lon, lat, C, NP_OPS),
        col_xy=lambda lon, lat: lcc2sp_forward(lon, lat, C, COL_OPS),
    ))
    register_transform(PlaneTransform(
        name, "EPSG:4326",
        np_xy=lambda x, y: lcc2sp_inverse(x, y, C, NP_OPS),
        col_xy=lambda x, y: lcc2sp_inverse(x, y, C, COL_OPS),
    ))
    return C


# GRS80 (Lambert-93 / ETRS89 family); identical to WGS84 at sub-mm
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101

# Lambert-93 (EPSG:2154, RGF93/ETRS89 — treated as WGS84-compatible):
# EPSG method 9802 parameters
LCC_EPSG_2154 = register_lcc2sp(
    "EPSG:2154", phi1_deg=44.0, phi2_deg=49.0, phi0_deg=46.5,
    lon0_deg=3.0, fe=700000.0, fn=6600000.0, a=GRS80_A, f=GRS80_F,
)
