"""Histogram sampling heuristics (C9-C11, O5).

Mirrors core/src/main/scala/geotrellis/server/extent/SampleUtils.scala:
  * ``sample_raster_extent``: four corner windows of a combined extent whose
    total cell count stays within ``max_cells`` (:29-48)
  * ``choose_largest_cell_size`` / ``choose_smallest_cell_size`` (:53-93)
  * extent intersection/union folds live in functions/geometry.py

Property contract (HistogramHeuristicsTest.scala:30-72): every sampled corner
window lies inside the source extent, and the summed cell budget holds.
"""

from __future__ import annotations

import math

from .geometry import Extent


def sample_raster_extent(extent: Extent, cell_size: tuple[float, float], max_cells: int
                         ) -> tuple[Extent, Extent, Extent, Extent]:
    """Four corner sample windows (NW, NE, SW, SE) totaling <= max_cells."""
    cw, ch = cell_size
    # max square window side (in cells) per corner
    side = int(math.sqrt(max_cells / 4.0))
    w = min(side * cw, (extent.xmax - extent.xmin) / 2.0)
    h = min(side * ch, (extent.ymax - extent.ymin) / 2.0)
    nw = Extent(extent.xmin, extent.ymax - h, extent.xmin + w, extent.ymax)
    ne = Extent(extent.xmax - w, extent.ymax - h, extent.xmax, extent.ymax)
    sw = Extent(extent.xmin, extent.ymin, extent.xmin + w, extent.ymin + h)
    se = Extent(extent.xmax - w, extent.ymin, extent.xmax, extent.ymin + h)
    return nw, ne, sw, se


def cells_in(extent: Extent, cell_size: tuple[float, float]) -> float:
    cw, ch = cell_size
    return ((extent.xmax - extent.xmin) / cw) * ((extent.ymax - extent.ymin) / ch)


def choose_largest_cell_size(cell_sizes: list[tuple[float, float]]) -> tuple[float, float]:
    """Coarsest resolution by cell area (SampleUtils.scala:53-63)."""
    return max(cell_sizes, key=lambda cs: cs[0] * cs[1])


def choose_smallest_cell_size(cell_sizes: list[tuple[float, float]]) -> tuple[float, float]:
    """Finest resolution (SampleUtils.scala:68-93)."""
    return min(cell_sizes, key=lambda cs: cs[0] * cs[1])
