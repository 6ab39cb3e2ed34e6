"""Geometry kernels: extents, point-in-polygon, haversine (pure numpy).

shapely/JTS is not available in this container, so the engine carries its own
vectorized predicates. Semantics follow the reference's ProjectedGeometry
(core/src/main/scala/geotrellis/store/query/vector/ProjectedGeometry.scala:24-32):
predicates reproject the *other* operand into self's CRS before testing — here
both sides are normalized to EPSG:4326 lon/lat at build time, and the
``Contains``-evaluates-as-``covers`` quirk (RasterSourceRepository.scala:60,
OgcSourceRepository.scala:62) is preserved by implementing only ``covers``
(boundary-inclusive) point tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EARTH_RADIUS_M = 6371008.8  # mean earth radius


# ---------------------------------------------------------------- extents

@dataclass(frozen=True)
class Extent:
    """Axis-aligned bbox — the reference's geotrellis.vector.Extent."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def intersect(self, o: "Extent") -> "Extent | None":
        """Intersection, or None when disjoint (SampleUtils.intersectExtents,
        SampleUtils.scala:95-101)."""
        xmin, ymin = max(self.xmin, o.xmin), max(self.ymin, o.ymin)
        xmax, ymax = min(self.xmax, o.xmax), min(self.ymax, o.ymax)
        if xmin > xmax or ymin > ymax:
            return None
        return Extent(xmin, ymin, xmax, ymax)

    def union(self, o: "Extent") -> "Extent":
        """Combine (SampleUtils.unionExtents, SampleUtils.scala:103-109)."""
        return Extent(min(self.xmin, o.xmin), min(self.ymin, o.ymin),
                      max(self.xmax, o.xmax), max(self.ymax, o.ymax))

    def buffer(self, d: float) -> "Extent":
        """Grow by d on every side (ogc/.../package.scala:33-35 buffers by a
        half cell)."""
        return Extent(self.xmin - d, self.ymin - d, self.xmax + d, self.ymax + d)

    def swap_axes(self) -> "Extent":
        """lat/lon axis-order swap for geographic CRS requests (WMS 1.3 /
        WCS 1.1 trap, WcsParams.scala:85-111, WmsParams.scala:96-100)."""
        return Extent(self.ymin, self.xmin, self.ymax, self.xmax)

    def contains_points(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x >= self.xmin) & (x <= self.xmax) & (y >= self.ymin) & (y <= self.ymax)


def intersect_extents(extents: list[Extent]) -> Extent | None:
    """Fold intersection; None if any step is disjoint. Order-independent
    (property: ExtentMergeStrategyTest.scala:35-97)."""
    if not extents:
        return None
    acc: Extent | None = extents[0]
    for e in extents[1:]:
        if acc is None:
            return None
        acc = acc.intersect(e)
    return acc


def union_extents(extents: list[Extent]) -> Extent | None:
    if not extents:
        return None
    acc = extents[0]
    for e in extents[1:]:
        acc = acc.union(e)
    return acc


# ------------------------------------------------------- polygon predicates

class Polygon:
    """Simple polygon (single ring, implicitly closed) with vectorized
    boundary-inclusive point tests. Ring orientation does not matter."""

    __slots__ = ("xs", "ys", "bbox")

    def __init__(self, xs, ys):
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if xs[0] == xs[-1] and ys[0] == ys[-1] and len(xs) > 1:
            xs, ys = xs[:-1], ys[:-1]
        self.xs = xs
        self.ys = ys
        self.bbox = Extent(float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))

    def covers_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Boundary-inclusive point-in-polygon (covers semantics, which is
        also what the reference's Contains degrades to). Even-odd ray casting
        + explicit on-edge test, vectorized over points x edges."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        x0, y0 = self.xs, self.ys
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        # (n_points, n_edges) broadcasts
        pxc = px[:, None]
        pyc = py[:, None]
        # edge crossing test (half-open in y to count shared vertices once)
        cond = (y0[None, :] > pyc) != (y1[None, :] > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[None, :] + (pyc - y0[None, :]) / (y1[None, :] - y0[None, :]) * (x1[None, :] - x0[None, :])
        crossings = np.sum(cond & (pxc < xint), axis=1)
        inside = (crossings % 2) == 1
        # on-edge: cross product ~ 0 and within the segment bbox
        dx, dy = (x1 - x0)[None, :], (y1 - y0)[None, :]
        cross = dx * (pyc - y0[None, :]) - dy * (pxc - x0[None, :])
        on_seg = (np.abs(cross) <= 1e-12 * np.maximum(1.0, np.abs(dx) + np.abs(dy))) & \
                 (pxc >= np.minimum(x0, x1)[None, :] - 1e-12) & (pxc <= np.maximum(x0, x1)[None, :] + 1e-12) & \
                 (pyc >= np.minimum(y0, y1)[None, :] - 1e-12) & (pyc <= np.maximum(y0, y1)[None, :] + 1e-12)
        return inside | on_seg.any(axis=1)


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasting)."""
    lon1, lat1 = np.radians(np.asarray(lon1, dtype=np.float64)), np.radians(np.asarray(lat1, dtype=np.float64))
    lon2, lat2 = np.radians(np.asarray(lon2, dtype=np.float64)), np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))
