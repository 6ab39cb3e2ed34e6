"""Focal-op halo shuffle: the engine's buffered neighbor read.

The reference reads tile + 8 neighbors per request (GTLayerNode.scala:88-124:
3x3 SpatialKey bounds, stitch, withBuffer). In batch dataflow that read
becomes a key-expansion shuffle (SURVEY.md §2.1 C5 / §2.6 J3):

    tiles --flat_map--> 9 copies, each keyed by a neighbor 'owner'
          --groupby(owner)--> map_groups: stitch 3x3 canvas, crop to a
            1-cell-buffered window, run the focal kernel on the center tile

Tag encodes the sender's position in the owner's 3x3 grid:
tag = (1 - dy) * 3 + (1 - dx) for owner = sender + (dx, dy); tag 4 = center.
Rows x9 is the documented shuffle cost; hot-key salting is unnecessary here
because tile keys are unique per layer.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

TILE = 8  # cells per tile side (test fixture size, cf. the 8x8.tif fixture)


def halo_expand(batch: pa.Table, grid_n: int | None = None) -> pa.Table:
    """Emit each tile row 9 times keyed by (ox, oy) owner + position tag.
    ``grid_n``: clip owners outside [0, grid_n) (pyramid edge)."""
    x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(x)
    d = np.array([-1, 0, 1], dtype=np.int64)
    shape = (n, 3, 3)
    ox = np.broadcast_to(x[:, None, None] + d[None, None, :], shape).reshape(n, 9)
    oy = np.broadcast_to(y[:, None, None] + d[None, :, None], shape).reshape(n, 9)
    # sender position in owner's grid: col 1-dx, row 1-dy
    tag = ((1 - d)[:, None] * 3 + (1 - d)[None, :]).reshape(1, 9).repeat(n, axis=0)
    keep = np.ones((n, 9), dtype=bool)
    if grid_n is not None:
        keep = (ox >= 0) & (ox < grid_n) & (oy >= 0) & (oy < grid_n)
    src = np.repeat(np.arange(n, dtype=np.int64), 9).reshape(n, 9)[keep]
    take = pa.array(src, type=pa.int64())
    out = {
        "ox": pa.array(ox[keep], type=pa.int64()),
        "oy": pa.array(oy[keep], type=pa.int64()),
        "tag": pa.array(tag[keep], type=pa.int8()),
    }
    for name in batch.schema.names:
        if name not in ("x", "y"):
            out[name] = batch.column(name).take(take)
    return pa.table(out)


def flat_cells(col, width: int) -> np.ndarray:
    """Zero-copy-ish flatten of a uniform list<float64> column to (n, width)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, width)


_EMPTY_FOCAL = pa.table({
    "x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
    "cells": pa.array([], pa.list_(pa.float64())),
    "mask": pa.array([], pa.list_(pa.bool_())),
})


def assemble_and_eval_many(t: pa.Table, kernel, tile: int = TILE) -> pa.Table:
    """Vectorized multi-group stitch+eval: ONE call processes every tile
    group in a hash partition (VERDICT round-1 fix #4 — replaces the
    one-3x3-stitch-per-map_groups-call shape). Sort rows by (ox, oy), scatter
    each of the <=9 tag positions into a (G, 3T, 3T) canvas stack in 9
    vectorized writes, crop the stack to the (T+2) buffered windows, run the
    kernel once over the whole stack. Groups without a center tile emit
    nothing."""
    n = len(t)
    if n == 0:
        return _EMPTY_FOCAL
    ox = t.column("ox").to_numpy(zero_copy_only=False).astype(np.int64)
    oy = t.column("oy").to_numpy(zero_copy_only=False).astype(np.int64)
    tag = t.column("tag").to_numpy(zero_copy_only=False).astype(np.int64)
    vals = flat_cells(t.column("cells"), tile * tile)
    order = np.lexsort((tag, oy, ox))
    ox, oy, tag, vals = ox[order], oy[order], tag[order], vals[order]
    nb = np.ones(n, dtype=bool)
    nb[1:] = (ox[1:] != ox[:-1]) | (oy[1:] != oy[:-1])
    g = np.cumsum(nb) - 1
    G = int(g[-1]) + 1
    canvas = np.full((G, 3 * tile, 3 * tile), np.nan, dtype=np.float64)
    for t9 in range(9):
        sel = tag == t9
        if not sel.any():
            continue
        r, c = divmod(t9, 3)
        canvas[g[sel], r * tile : (r + 1) * tile, c * tile : (c + 1) * tile] = (
            vals[sel].reshape(-1, tile, tile)
        )
    lo, hi = tile - 1, 2 * tile + 1
    buf = canvas[:, lo:hi, lo:hi]
    mask = np.isnan(buf)
    out_vals, out_mask = kernel(np.nan_to_num(buf, nan=0.0), mask)
    has_center = np.zeros(G, dtype=bool)
    has_center[g[tag == 4]] = True
    starts = np.nonzero(nb)[0]
    gx, gy = ox[starts], oy[starts]
    keep = np.nonzero(has_center)[0]
    if len(keep) == 0:
        return _EMPTY_FOCAL
    flat_v = out_vals[keep].reshape(len(keep), -1)
    flat_m = out_mask[keep].reshape(len(keep), -1)
    w = flat_v.shape[1]
    offs = pa.array(np.arange(len(keep) + 1, dtype=np.int32) * w)
    return pa.table({
        "x": pa.array(gx[keep]),
        "y": pa.array(gy[keep]),
        "cells": pa.ListArray.from_arrays(offs, pa.array(flat_v.ravel())),
        "mask": pa.ListArray.from_arrays(offs, pa.array(flat_m.ravel())),
    })


def add_key_partition(batch: pa.Table, key_cols: list[str], num_partitions: int) -> pa.Table:
    """Append a hash-partition column over integer key columns, so a grouped
    stage can process MANY whole key-groups per Python call (groupby(part)
    instead of groupby(keys)) without losing key colocation."""
    C = np.uint64(0x9E3779B97F4A7C15)
    h = np.zeros(len(batch), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for kc in key_cols:
            col = batch.column(kc)
            if (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
                    or pa.types.is_binary(col.type)
                    or pa.types.is_large_binary(col.type)):
                from .dedup import poly_hash_strings

                v = poly_hash_strings(col)
            else:
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (h ^ v) * C
    part = ((h >> np.uint64(33)) % np.uint64(num_partitions)).astype(np.int64)
    return batch.append_column("part", pa.array(part))


def focal_dataset(tiles_ds, kernel, grid_n: int | None = None, tile: int = TILE,
                  num_partitions: int = 32):
    """tiles (x, y, cells) -> focal result (x, y, cells, mask) via the halo
    shuffle. ``kernel(buffered_stack, mask_stack) -> (values, mask)`` is
    applied to whole (G, T+2, T+2) stacks — one call per hash partition, not
    per tile key."""
    expanded = tiles_ds.map_batches(partial(halo_expand, grid_n=grid_n), batch_format="pyarrow")
    expanded = expanded.map_batches(
        partial(add_key_partition, key_cols=["ox", "oy"], num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    return expanded.groupby("part").map_groups(
        partial(assemble_and_eval_many, kernel=kernel, tile=tile), batch_format="pyarrow"
    )
