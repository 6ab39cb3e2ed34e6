"""Resample kernels (M2): the full 11-method surface the reference's codec
enumerates (core/.../vlm/RasterSourceUtils.scala:31-59):

  interpolating — nearest-neighbor, bilinear, cubic-convolution (Keys
  a=-0.5), cubic-spline (B-spline), lanczos (a=3);
  aggregating (overview builds) — average, mode, median, max, min, sum.

Vectorized over (H, W) or batched (N, H, W) tiles. The separable kernel
resamplers share one weights-precompute + two tensordot passes."""

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


def _separable_resample(tile: np.ndarray, out_h: int, out_w: int, kernel,
                        support: int) -> np.ndarray:
    """Generic separable kernel resample: per-axis tap weights from
    ``kernel(offset)`` over ``2*support`` taps, edge-clamped, normalized to
    sum 1 (so constants are reproduced exactly), applied as two vectorized
    gather+weight passes."""
    t = np.asarray(tile, dtype=np.float64)
    h, w = t.shape[-2:]
    taps = np.arange(1 - support, support + 1, dtype=np.int64)  # e.g. -1..2

    def axis_weights(out_n: int, in_n: int):
        f = (np.arange(out_n) + 0.5) * in_n / out_n - 0.5
        base = np.floor(f).astype(np.int64)
        idx = np.clip(base[:, None] + taps[None, :], 0, in_n - 1)
        wts = kernel(f[:, None] - (base[:, None] + taps[None, :]))
        wts = wts / wts.sum(axis=1, keepdims=True)
        return idx, wts

    yi, wy = axis_weights(out_h, h)
    xi, wx = axis_weights(out_w, w)
    # rows pass: (..., out_h, w)
    rows = (t[..., yi, :] * wy[..., :, :, None]).sum(axis=-2)
    # cols pass: (..., out_h, out_w)
    return (rows[..., :, xi] * wx[None, :, :]).sum(axis=-1)


def _keys_cubic(a: float = -0.5):
    def k(x: np.ndarray) -> np.ndarray:
        ax = np.abs(x)
        return np.where(
            ax <= 1.0, (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
            np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
        )
    return k


def _bspline_cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax < 1.0, (3.0 * ax**3 - 6.0 * ax**2 + 4.0) / 6.0,
        np.where(ax < 2.0, (2.0 - ax) ** 3 / 6.0, 0.0),
    )


def _lanczos(a: int = 3):
    def k(x: np.ndarray) -> np.ndarray:
        ax = np.abs(x)
        with np.errstate(invalid="ignore", divide="ignore"):
            v = np.sinc(x) * np.sinc(x / a)
        return np.where(ax < a, v, 0.0)
    return k


def cubic_convolution(tile: np.ndarray, out_h: int, out_w: int, a: float = -0.5) -> np.ndarray:
    """Keys (1981) cubic convolution — the classic GIS 'cubic'. Interpolates
    through the samples (identity at integer offsets) and reproduces linear
    ramps exactly."""
    return _separable_resample(tile, out_h, out_w, _keys_cubic(a), support=2)


def cubic_spline(tile: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Cubic B-spline kernel (smoothing; does NOT interpolate through
    samples — the standard 'cubic spline' resampler surface)."""
    return _separable_resample(tile, out_h, out_w, _bspline_cubic, support=2)


def lanczos(tile: np.ndarray, out_h: int, out_w: int, a: int = 3) -> np.ndarray:
    """Lanczos-3 windowed sinc."""
    return _separable_resample(tile, out_h, out_w, _lanczos(a), support=a)


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


def downsample_median(tile: np.ndarray, factor: int) -> np.ndarray:
    return _block_reduce(tile, factor, np.nanmedian)


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
