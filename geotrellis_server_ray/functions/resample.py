"""Resample kernels (M2): the methods the reference's codec enumerates
(core/.../vlm/RasterSourceUtils.scala:31-59 — nearest-neighbor, bilinear,
plus the aggregating methods average/sum/min/max/mode used for overviews).
Vectorized over (H, W) or batched (N, H, W) tiles."""

from __future__ import annotations

import numpy as np


def nearest(tile: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    # pure index selection: nearest-neighbor preserves cell values AND dtype
    # exactly (a float64 cast would corrupt int values above 2^53)
    t = np.asarray(tile)
    h, w = t.shape[-2:]
    ys = np.floor((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64).clip(0, h - 1)
    xs = np.floor((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64).clip(0, w - 1)
    return t[..., ys[:, None], xs[None, :]]


def bilinear(tile: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    t = np.asarray(tile, dtype=np.float64)
    h, w = t.shape[-2:]
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
    tl = t[..., y0[:, None], x0[None, :]]
    tr = t[..., y0[:, None], x1[None, :]]
    bl = t[..., y1[:, None], x0[None, :]]
    br = t[..., y1[:, None], x1[None, :]]
    return tl * (1 - wy) * (1 - wx) + tr * (1 - wy) * wx + bl * wy * (1 - wx) + br * wy * wx


def _block_reduce(tile: np.ndarray, factor: int, fn) -> np.ndarray:
    t = np.asarray(tile, dtype=np.float64)
    h, w = t.shape[-2:]
    assert h % factor == 0 and w % factor == 0
    shaped = t.reshape(*t.shape[:-2], h // factor, factor, w // factor, factor)
    return fn(shaped, axis=(-3, -1))


def downsample_average(tile: np.ndarray, factor: int) -> np.ndarray:
    return _block_reduce(tile, factor, np.nanmean)


def downsample_sum(tile: np.ndarray, factor: int) -> np.ndarray:
    out = _block_reduce(tile, factor, np.nansum)
    # an all-NoData block must stay NoData (nansum alone fabricates 0.0)
    all_nan = _block_reduce(np.isnan(np.asarray(tile, dtype=np.float64)), factor, np.min)
    return np.where(all_nan.astype(bool), np.nan, out)


def downsample_max(tile: np.ndarray, factor: int) -> np.ndarray:
    return _block_reduce(tile, factor, np.nanmax)


def downsample_min(tile: np.ndarray, factor: int) -> np.ndarray:
    return _block_reduce(tile, factor, np.nanmin)


def downsample_mode(tile: np.ndarray, factor: int) -> np.ndarray:
    """Most frequent valid value per block; NaN cells are excluded (an
    all-NaN block stays NaN). Supports (H, W) and batched (N, H, W)."""
    t = np.asarray(tile, dtype=np.float64)
    if t.ndim == 3:
        return np.stack([downsample_mode(x, factor) for x in t])
    h, w = t.shape
    assert h % factor == 0 and w % factor == 0
    blocks = t.reshape(h // factor, factor, w // factor, factor).transpose(0, 2, 1, 3)
    out = np.empty((h // factor, w // factor), dtype=np.float64)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            flat = blocks[i, j].ravel()
            flat = flat[~np.isnan(flat)]
            if len(flat) == 0:
                out[i, j] = np.nan
                continue
            vals, cnt = np.unique(flat, return_counts=True)
            out[i, j] = vals[np.argmax(cnt)]
    return out
