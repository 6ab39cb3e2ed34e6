"""Focal (neighborhood) kernels: slope & hillshade over buffered tiles.

The reference evaluates FocalSlope/FocalHillshade MAML nodes over tiles read
with a 1-tile neighbor buffer (GTLayerNode.scala:86-130 assembles
TileWithNeighbors; FocalParameters.scala:36-50 binds azimuth/altitude/zFactor;
TargetCell masks ExpressionUtils.scala:31-37). The kernels themselves are the
standard Horn (1981) finite-difference formulas used by geotrellis raster.

These functions take a *buffered* float array (H+2, W+2) (+ nodata mask) and
return the (H, W) interior result; the halo assembly is the shuffle stage in
stages/focal.py. Cells whose 3x3 window touches NoData become NoData
(poisoning, consistent with NoDataHandlingTest semantics).
"""

from __future__ import annotations

import numpy as np


def _horn_gradients(z: np.ndarray, cell_w: float, cell_h: float, z_factor: float):
    """dz/dx, dz/dy by Horn's method on a buffered array; returns interior
    shape arrays. Window letters (row-major, y down):
        a b c
        d e f
        g h i
    """
    a = z[..., :-2, :-2]; b = z[..., :-2, 1:-1]; c = z[..., :-2, 2:]
    d = z[..., 1:-1, :-2];                        f = z[..., 1:-1, 2:]
    g = z[..., 2:, :-2];  h = z[..., 2:, 1:-1];  i = z[..., 2:, 2:]
    dzdx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / (8.0 * cell_w)
    dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * cell_h)
    return dzdx * z_factor, dzdy * z_factor


def _window_mask(mask: np.ndarray) -> np.ndarray:
    """True where any cell of the 3x3 window is NoData."""
    m = mask
    out = np.zeros(m[..., 1:-1, 1:-1].shape, dtype=bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= m[..., dy : dy + m.shape[-2] - 2, dx : dx + m.shape[-1] - 2]
    return out


def slope(z: np.ndarray, mask: np.ndarray | None = None, cell_w: float = 1.0,
          cell_h: float = 1.0, z_factor: float = 1.0):
    """Slope in degrees (Horn). Input buffered (H+2, W+2); output (H, W) and
    its NoData mask."""
    zf = np.asarray(z, dtype=np.float64)
    dzdx, dzdy = _horn_gradients(zf, cell_w, cell_h, z_factor)
    s = np.degrees(np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)))
    out_mask = _window_mask(mask) if mask is not None else np.zeros(s.shape, dtype=bool)
    return s, out_mask


def hillshade(z: np.ndarray, mask: np.ndarray | None = None, azimuth: float = 315.0,
              altitude: float = 45.0, z_factor: float = 1.0,
              cell_w: float = 1.0, cell_h: float = 1.0):
    """Hillshade 0..255 (standard analytic formula; azimuth degrees clockwise
    from north, altitude degrees above horizon)."""
    zf = np.asarray(z, dtype=np.float64)
    dzdx, dzdy = _horn_gradients(zf, cell_w, cell_h, z_factor)
    slope_rad = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = np.radians(360.0 - azimuth + 90.0)
    zen = np.radians(90.0 - altitude)
    shade = np.cos(zen) * np.cos(slope_rad) + np.sin(zen) * np.sin(slope_rad) * np.cos(az - aspect)
    v = np.clip(np.round(255.0 * shade), 0, 255)
    out_mask = _window_mask(mask) if mask is not None else np.zeros(v.shape, dtype=bool)
    return v, out_mask


def apply_target_cell(result: np.ndarray, result_mask: np.ndarray,
                      original: np.ndarray, original_mask: np.ndarray, target: str):
    """TargetCell semantics (ExpressionUtils.scala:31-37): 'all' computes
    everywhere; 'data' computes only where the original had data (NoData cells
    stay NoData); 'nodata' computes only into original NoData cells, data
    cells pass through unchanged."""
    if target == "all":
        return result, result_mask
    if target == "data":
        out = np.where(original_mask, original, result)
        return out, np.where(original_mask, True, result_mask)
    if target == "nodata":
        out = np.where(original_mask, result, original)
        return out, np.where(original_mask, result_mask, original_mask)
    raise ValueError(f"unknown TargetCell: {target}")


def focal_stats(z: np.ndarray, mask: np.ndarray | None = None):
    """3x3 focal mean / max / min + Horn ASPECT in ONE buffered pass — the
    maml-jvm FocalMean/FocalMax/FocalMin/FocalAspect operators the
    reference's runtime MAML JSON can name (README 'High level concepts';
    same AST family as FocalSlope/FocalHillshade bound in
    ogc-example/.../FocalParameters.scala:36-50).

    Semantics: mean/max/min use geotrellis focal-statistic NoData rules —
    NoData cells are EXCLUDED from the window and the output is NoData only
    when the window has NO valid cell; aspect (like slope/hillshade) needs
    every Horn neighbor, so any NoData in the window masks the cell. Aspect
    is the azimuth of steepest DESCENT, degrees clockwise from north
    (y grows southward): (degrees(atan2(-dzdx, dzdy)) + 360) % 360.

    Input buffered (..., H+2, W+2); returns values (..., 4, H, W) stacked
    [mean, max, min, aspect] and the matching NoData mask stack."""
    zf = np.asarray(z, dtype=np.float64)
    H, W = zf.shape[-2] - 2, zf.shape[-1] - 2
    valid = ~mask if mask is not None else np.ones(zf.shape, dtype=bool)
    vals = np.where(valid, zf, 0.0)
    lead = zf.shape[:-2]
    sum9 = np.zeros(lead + (H, W))
    cnt9 = np.zeros(lead + (H, W))
    mx = np.full(lead + (H, W), -np.inf)
    mn = np.full(lead + (H, W), np.inf)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            vw = vals[..., dy:dy + H, dx:dx + W]
            aw = valid[..., dy:dy + H, dx:dx + W]
            sum9 += vw
            cnt9 += aw
            zw = zf[..., dy:dy + H, dx:dx + W]
            mx = np.maximum(mx, np.where(aw, zw, -np.inf))
            mn = np.minimum(mn, np.where(aw, zw, np.inf))
    stat_mask = cnt9 == 0
    mean = sum9 / np.maximum(cnt9, 1.0)
    mx = np.where(stat_mask, 0.0, mx)
    mn = np.where(stat_mask, 0.0, mn)
    dzdx, dzdy = _horn_gradients(zf, 1.0, 1.0, 1.0)
    aspect = np.mod(np.degrees(np.arctan2(-dzdx, dzdy)) + 360.0, 360.0)
    amask = _window_mask(mask) if mask is not None else np.zeros((H, W), dtype=bool)
    amask = np.broadcast_to(amask, aspect.shape)
    values = np.stack([mean, mx, mn, aspect], axis=-3)
    masks = np.stack([stat_mask, stat_mask, stat_mask, amask], axis=-3)
    return values, masks
