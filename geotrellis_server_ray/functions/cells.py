"""Discrete-global-grid cell ids + space-filling-curve keys (vectorized).

The north rule asks for an H3/S2-style cell index; neither lib is in this
container, so the engine ships its own quadtree cell scheme over the
WebMercator grid (the same grid the tile pyramid uses, so cell <-> tile
relationships are exact):

  * ``cell_id(lon, lat, level)`` — uint64 Morton (Z-order) interleave of the
    (x, y) tile coordinates at ``level``. Like an S2 cell id, ids of nearby
    cells share prefixes, a parent's id is a 2-bit prefix of its children's,
    and a cell's 3x3 ring is cheap integer math on (x, y).
  * ``hilbert_key(x, y, level)`` — Hilbert-curve index for range-partitioned
    sorts (better locality than Morton; used as the global sort key per the
    north rule, never exposed to the SQL oracle).

Bit-twiddling is written with shift/mask ops only, so the Morton encode can be
replicated in DuckDB SQL (BIGINT has the same semantics for these masks at
level <= 15).
"""

from __future__ import annotations

import numpy as np

from .tiles import lonlat_to_tile

DEFAULT_CELL_LEVEL = 12


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits) -> uint64 Z-order index."""
    return _part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code, dtype=np.uint64)

    def compact(v: np.ndarray) -> np.ndarray:
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v

    return compact(code).astype(np.int64), compact(code >> np.uint64(1)).astype(np.int64)


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_CELL_LEVEL) -> np.ndarray:
    """(lon, lat) -> quadtree cell id at ``level`` (uint64 Morton code of the
    slippy tile coordinates). Parent(cell, level-1) == cell >> 2."""
    x, y = lonlat_to_tile(lon, lat, level)
    return morton_encode(x.astype(np.uint64), y.astype(np.uint64))


def cell_parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    return np.asarray(cell, dtype=np.uint64) >> np.uint64(2 * steps)


def cell_ring(cell: np.ndarray, level: int, k: int = 1) -> np.ndarray:
    """All cell ids within Chebyshev distance k of each input cell (the
    (2k+1)^2 block). Returns shape (n, (2k+1)**2); out-of-range rows are
    clipped to the grid (duplicated edge cells possible at the poles).

    This is the cell-ring-expansion primitive the kNN stage uses — the
    generalization of the reference's +-10-cell buffered window probe
    (ogc/.../wms/GetFeatureInfoExtended.scala:81)."""
    x, y = morton_decode(cell)
    n = 1 << level
    d = np.arange(-k, k + 1, dtype=np.int64)
    gx = np.mod(x[:, None, None] + d[None, None, :], n)
    gy = np.clip(y[:, None, None] + d[None, :, None], 0, n - 1)
    ring = morton_encode(gx.astype(np.uint64), gy.astype(np.uint64))
    return ring.reshape(len(x), -1)


def hilbert_key(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """(x, y) -> Hilbert curve distance at ``level`` bits per axis.

    Iterative rot/flip formulation, vectorized over numpy arrays. Used to
    range-partition spatial output (``ds.sort(hilbert_key)``) so nearby tiles
    land in the same output files."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    if level <= 0:  # zoom 0: single world tile, curve distance 0
        return d
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    s = np.int64(1 << (level - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += np.uint64(s) * np.uint64(s) * ((np.uint64(3) * rx.astype(np.uint64)) ^ ry.astype(np.uint64))
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d
