"""Vector -> raster burn (rasterization): polygon features burned into tile
cell masks by the CELL-CENTER rule.

The reference consumes rasters and *queries* them with vector predicates
(PIP via ProjectedGeometry, core/.../query/vector/ProjectedGeometry.scala:
24-32); the inverse direction — burning a vector layer into the tile pyramid
so zonal/masking map-algebra can consume it — is the geotrellis
``Rasterizer`` operation this engine needs for raster<->vector round trips
(north rule: "raster<->vector zonal map-algebra"). Semantics: a cell burns
when its CENTER lies inside the (closed) feature rectangle, the same
containment rule the PIP join uses for points.

Ray shape: features are the SMALL side. A flat_map expands each feature to
its covered (tile, feature) candidates (integer math on the feature's cell
span — no per-cell work), then a map_batches kernel materializes each tile's
boolean burn mask and derives (n_cells, burn_hash). The burn mask stack is
the operator's real product (zonal stages consume it); the hash
sum(gx*31 + gy*17) over burned cells lets the SQL oracle verify the exact
cell set without shipping masks.

Cell math is the SAME forward slippy formula as lonlat_to_tile (tiles.py:47)
scaled to cell resolution N = 2^zoom * tile_px, so the oracle shares the
expression verbatim:
    xf(lon) = (lon + 180) / 360 * N
    yf(lat) = (1 - ln(tan(rad(lat)) + sqrt(tan(rad(lat))^2 + 1)) / pi) / 2 * N
    burned gx in [ceil(xf(x0) - 0.5), ceil(xf(x1) - 0.5) - 1] ... closed rect
    (center gx + 0.5 in [xf(x0), xf(x1)]; y likewise with lat axis flipped)
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _xf(lon: float, n: int) -> float:
    return (lon + 180.0) / 360.0 * n


def _yf(lat: float, n: int) -> float:
    t = math.tan(math.radians(lat))
    return (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0 * n


def rect_cell_span(x0, y0, x1, y1, zoom: int, tile_px: int):
    """Inclusive burned-cell range [(gx_lo, gx_hi), (gy_lo, gy_hi)] of the
    closed rect under the center rule; empty when hi < lo."""
    n = (1 << zoom) * tile_px
    gx_lo = math.ceil(_xf(x0, n) - 0.5)
    gx_hi = math.ceil(_xf(x1, n) - 0.5) - 1
    # lat grows opposite to gy: y1 (north) gives the LOW gy
    gy_lo = math.ceil(_yf(y1, n) - 0.5)
    gy_hi = math.ceil(_yf(y0, n) - 0.5) - 1
    clip = lambda v: min(max(v, 0), n - 1)  # noqa: E731
    return (clip(gx_lo), clip(gx_hi) if gx_hi >= gx_lo else clip(gx_lo) - 1,
            clip(gy_lo), clip(gy_hi) if gy_hi >= gy_lo else clip(gy_lo) - 1)


def candidates_batch(batch: pa.Table, zoom: int, tile_px: int) -> pa.Table:
    """Feature rows (layer_name, feature_id, x0, y0, x1, y1) -> one row per
    covered (tile_x, tile_y, feature): the flat_map expansion, integer math
    only."""
    cols = {c: batch.column(c).to_numpy(zero_copy_only=False)
            for c in ("x0", "y0", "x1", "y1")}
    names = batch.column("layer_name").to_pylist()
    fids = batch.column("feature_id").to_numpy(zero_copy_only=False)
    out = {"layer_name": [], "feature_id": [], "tile_x": [], "tile_y": [],
           "x0": [], "y0": [], "x1": [], "y1": []}
    for i in range(len(batch)):
        gx0, gx1, gy0, gy1 = rect_cell_span(cols["x0"][i], cols["y0"][i],
                                            cols["x1"][i], cols["y1"][i],
                                            zoom, tile_px)
        if gx1 < gx0 or gy1 < gy0:
            continue
        for ty in range(gy0 // tile_px, gy1 // tile_px + 1):
            for tx in range(gx0 // tile_px, gx1 // tile_px + 1):
                out["layer_name"].append(names[i])
                out["feature_id"].append(int(fids[i]))
                out["tile_x"].append(tx)
                out["tile_y"].append(ty)
                for c in ("x0", "y0", "x1", "y1"):
                    out[c].append(float(cols[c][i]))
    return pa.table({
        "layer_name": pa.array(out["layer_name"], pa.string()),
        "feature_id": pa.array(out["feature_id"], pa.int64()),
        "tile_x": pa.array(out["tile_x"], pa.int64()),
        "tile_y": pa.array(out["tile_y"], pa.int64()),
        **{c: pa.array(out[c], pa.float64()) for c in ("x0", "y0", "x1", "y1")},
    })


def mask_components(batch: pa.Table, zoom: int, tile_px: int):
    """Shared burn-mask math for (tile, feature) candidate rows: per-row
    tile coords, global cell coords (m, T) and the in-span axis masks whose
    outer product is the burn mask. Used by burn_batch and the zonal-burn
    kernel (registry), so the cell-center rule lives in ONE place."""
    m = len(batch)
    tx = batch.column("tile_x").to_numpy(zero_copy_only=False)
    ty = batch.column("tile_y").to_numpy(zero_copy_only=False)
    spans = np.array([rect_cell_span(a, b, c, d, zoom, tile_px)
                      for a, b, c, d in zip(
                          batch.column("x0").to_numpy(zero_copy_only=False),
                          batch.column("y0").to_numpy(zero_copy_only=False),
                          batch.column("x1").to_numpy(zero_copy_only=False),
                          batch.column("y1").to_numpy(zero_copy_only=False))],
                     dtype=np.int64).reshape(m, 4)
    cell = np.arange(tile_px, dtype=np.int64)
    gx = tx[:, None] * tile_px + cell[None, :]          # (m, T)
    gy = ty[:, None] * tile_px + cell[None, :]
    in_x = (gx >= spans[:, 0:1]) & (gx <= spans[:, 1:2])
    in_y = (gy >= spans[:, 2:3]) & (gy <= spans[:, 3:4])
    return tx, ty, gx, gy, in_x, in_y


def burn_batch(batch: pa.Table, zoom: int, tile_px: int) -> pa.Table:
    """(tile, feature) candidates -> burn-mask stats. Materializes the
    (n, T, T) boolean mask stack (the artifact zonal stages consume) and
    derives n_cells + burn_hash from it, all vectorized."""
    m = len(batch)
    if m == 0:
        return pa.table({"layer_name": pa.array([], pa.string()),
                         "feature_id": pa.array([], pa.int64()),
                         "tile_x": pa.array([], pa.int64()),
                         "tile_y": pa.array([], pa.int64()),
                         "n_cells": pa.array([], pa.int64()),
                         "burn_hash": pa.array([], pa.int64())})
    tx, ty, gx, gy, in_x, in_y = mask_components(batch, zoom, tile_px)
    mask = in_y[:, :, None] & in_x[:, None, :]          # (m, T, T) burn mask
    n_cells = mask.sum(axis=(1, 2)).astype(np.int64)
    gxs = np.where(in_x, gx, 0).sum(axis=1)
    gys = np.where(in_y, gy, 0).sum(axis=1)
    burn_hash = 31 * gxs * in_y.sum(axis=1) + 17 * gys * in_x.sum(axis=1)
    keep = n_cells > 0
    return pa.table({
        "layer_name": batch.column("layer_name").filter(pa.array(keep)),
        "feature_id": batch.column("feature_id").filter(pa.array(keep)),
        "tile_x": pa.array(tx[keep]),
        "tile_y": pa.array(ty[keep]),
        "n_cells": pa.array(n_cells[keep]),
        "burn_hash": pa.array(burn_hash[keep]),
    })


def rasterize_rects(features_ds, zoom: int, tile_px: int = 8):
    """Dataset of rect features -> per-(tile, feature) burn stats."""
    from functools import partial

    cands = features_ds.map_batches(
        partial(candidates_batch, zoom=zoom, tile_px=tile_px),
        batch_format="pyarrow")
    return cands.map_batches(partial(burn_batch, zoom=zoom, tile_px=tile_px),
                             batch_format="pyarrow")
