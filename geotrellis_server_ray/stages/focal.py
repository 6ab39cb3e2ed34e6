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
import pandas as pd
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


def assemble_and_eval(group: pd.DataFrame, kernel, nodata_fill: float = np.nan,
                      tile: int = TILE) -> pd.DataFrame:
    """map_groups body: stitch the group's tiles into a 3Tx3T canvas
    (missing neighbors stay NoData), crop to the (T+2) buffered window, run
    ``kernel(buffered_values, buffered_mask)`` -> (values, mask) for the
    center tile. Emits nothing when the center tile itself is absent."""
    if not (group["tag"] == 4).any():
        # explicit dtypes: a default-constructed empty frame would type x/y
        # as float64 and poison the block schema on concat with real groups
        return pd.DataFrame({
            "x": pd.Series([], dtype="int64"), "y": pd.Series([], dtype="int64"),
            "cells": pd.Series([], dtype="object"), "mask": pd.Series([], dtype="object"),
        })
    canvas = np.full((3 * tile, 3 * tile), np.nan, dtype=np.float64)
    for tag, cells in zip(group["tag"], group["cells"]):
        r, c = divmod(int(tag), 3)
        canvas[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile] = np.asarray(
            cells, dtype=np.float64
        ).reshape(tile, tile)
    lo, hi = tile - 1, 2 * tile + 1
    buf = canvas[lo:hi, lo:hi]
    mask = np.isnan(buf)
    vals, out_mask = kernel(np.nan_to_num(buf, nan=nodata_fill if np.isfinite(nodata_fill) else 0.0), mask)
    return pd.DataFrame(
        {
            "x": [int(group["ox"].iloc[0])],
            "y": [int(group["oy"].iloc[0])],
            "cells": [vals.ravel()],
            "mask": [out_mask.ravel()],
        }
    )


def focal_dataset(tiles_ds, kernel, grid_n: int | None = None, tile: int = TILE):
    """tiles (x, y, cells) -> focal result (x, y, cells, mask) via the halo
    shuffle. ``kernel(buffered, mask) -> (values, mask)``."""
    expanded = tiles_ds.map_batches(partial(halo_expand, grid_n=grid_n), batch_format="pyarrow")
    return expanded.groupby(["ox", "oy"]).map_groups(
        partial(assemble_and_eval, kernel=kernel, tile=tile), batch_format="pandas"
    )
