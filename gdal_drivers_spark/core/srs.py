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

Each transform is AXIS-SEPARABLE and MONOTONE (x' depends only on x,
y' only on y, both strictly increasing), which is what makes the
distributed warp exact: a destination tile's source bbox is computed
from its corners alone, and both the numpy (executor gather) and the
Column (cover generation / oracle SQL) forms express the same math.
General curvilinear SRS pairs stay out of scope, as in SURVEY §7.
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


_REGISTRY: dict[tuple[str, str], Callable[[], AxisTransform]] = {
    ("EPSG:4326", "EPSG:3857"): _geo_to_merc,
    ("EPSG:3857", "EPSG:4326"): _merc_to_geo,
}


def register_transform(tf: AxisTransform) -> None:
    """Plug a user-supplied axis-separable monotone SRS pair into the
    registry (both the numpy and Column forms are required — the warp
    needs the first for the executor gather and the second for the
    distributed cover generation). General curvilinear transforms
    remain unsupported by design (SURVEY §7)."""
    _REGISTRY[(tf.src, tf.dst)] = lambda: tf


def get_transform(src_srs: str, dst_srs: str) -> AxisTransform:
    """Transform src→dst world coords; identity when equal; raises for
    pairs outside the registry (the reference raises through GDAL for
    unknown SRS too — unsupported is an error, not a silent no-op)."""
    if src_srs == dst_srs:
        return _identity(src_srs)
    try:
        return _REGISTRY[(src_srs, dst_srs)]()
    except KeyError:
        raise ValueError(
            f"no transform {src_srs!r} → {dst_srs!r}; registered: "
            f"{sorted(_REGISTRY)} (general reprojection out of scope, SURVEY §7)"
        ) from None
