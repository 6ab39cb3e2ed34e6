"""Mosaic merge: N overlapping sources -> one tile per key, left-biased.

Reference semantics (effects/.../MosaicRasterSourceF.scala:158-162 semigroup:
``l.resample(targetRE).merge(r...)`` — the LEFT operand's data wins per cell;
order of the source list matters). Under Ray's unordered executor the order
must be explicit: every source row carries a ``rank`` column and the grouped
merge fills each cell from the lowest-rank source that has data there
(SURVEY.md §2.10 order-sensitive-reduce rule).

first-match-wins layer selection (GetMap.scala:95 headOption) is the
degenerate whole-tile case of the same reduce.

Execution shape: hash-partition by tile key, then ONE vectorized call per
partition merges every group in it — the merge loop runs over rank POSITIONS
(bounded by the source count), each step a full-stack numpy fill, never one
Python call per tile key.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

from .focal import add_key_partition, flat_cells


def merge_group(group: pd.DataFrame, nodata: float = np.nan) -> pd.DataFrame:
    """Single-key merge (kept for unit tests / direct calls): sort by rank,
    fill cells first-wins."""
    g = group.sort_values("rank", kind="mergesort")
    acc = None
    acc_mask = None
    for cells in g["cells"]:
        v = np.asarray(cells, dtype=np.float64)
        m = np.isnan(v) if np.isnan(nodata) else (v == nodata) | np.isnan(v)
        if acc is None:
            acc, acc_mask = v.copy(), m.copy()
        else:
            fill = acc_mask & ~m
            acc[fill] = v[fill]
            acc_mask &= ~fill
    return pd.DataFrame(
        {
            "x": [int(g["x"].iloc[0])],
            "y": [int(g["y"].iloc[0])],
            "cells": [acc],
            "mask": [acc_mask],
        }
    )


def merge_many(t: pa.Table, nodata: float = np.nan) -> pa.Table:
    """Vectorized multi-group left-biased merge over one hash partition."""
    n = len(t)
    if n == 0:
        return pa.table({
            "x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
            "cells": pa.array([], pa.list_(pa.float64())),
            "mask": pa.array([], pa.list_(pa.bool_())),
        })
    x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
    rank = t.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
    width = len(t.column("cells")[0])
    vals = flat_cells(t.column("cells"), width)
    order = np.lexsort((rank, y, x))
    x, y, rank, vals = x[order], y[order], rank[order], vals[order]
    nb = np.ones(n, dtype=bool)
    nb[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    g = np.cumsum(nb) - 1
    G = int(g[-1]) + 1
    starts = np.nonzero(nb)[0]
    pos = np.arange(n) - starts[g]  # rank position within group
    acc = np.full((G, width), np.nan, dtype=np.float64)
    acc_mask = np.ones((G, width), dtype=bool)
    for j in range(int(pos.max()) + 1):
        sel = pos == j
        rows = vals[sel]
        m = np.isnan(rows) if np.isnan(nodata) else (rows == nodata) | np.isnan(rows)
        gi = g[sel]
        a, am = acc[gi], acc_mask[gi]
        fill = am & ~m
        a[fill] = rows[fill]
        am &= ~fill
        acc[gi], acc_mask[gi] = a, am
    offs = pa.array(np.arange(G + 1, dtype=np.int32) * width)
    return pa.table({
        "x": pa.array(x[starts]),
        "y": pa.array(y[starts]),
        "cells": pa.ListArray.from_arrays(offs, pa.array(acc.ravel())),
        "mask": pa.ListArray.from_arrays(offs, pa.array(acc_mask.ravel())),
    })


def mosaic(ds, nodata: float = np.nan, num_partitions: int | None = None):
    """ds rows (x, y, rank, cells) -> merged (x, y, cells, mask)."""
    if num_partitions is None:
        from ..config import shuffle_partitions

        num_partitions = shuffle_partitions()
    ds = ds.map_batches(
        partial(add_key_partition, key_cols=["x", "y"], num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    return ds.groupby("part").map_groups(
        partial(merge_many, nodata=nodata), batch_format="pyarrow"
    )


def first_match_wins(ds, key_cols: list[str], rank_col: str = "rank",
                     num_partitions: int | None = None):
    """O4 headOption: keep the lowest-rank row per key (deterministic).
    Vectorized: one call per hash partition, group heads via lexsort."""

    def heads(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t.drop_columns(["part"])
        keys = [t.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        rank = t.column(rank_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((rank, *reversed(keys)))
        nb = np.ones(n, dtype=bool)
        if n > 1:
            agg = np.zeros(n - 1, dtype=bool)
            for karr in keys:
                ks = karr[order]
                agg |= ks[1:] != ks[:-1]
            nb[1:] = agg
        take = pa.array(order[np.nonzero(nb)[0]], type=pa.int64())
        return t.take(take).drop_columns(["part"])

    if num_partitions is None:
        from ..config import shuffle_partitions

        num_partitions = shuffle_partitions()
    ds = ds.map_batches(
        partial(add_key_partition, key_cols=key_cols, num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    return ds.groupby("part").map_groups(heads, batch_format="pyarrow")


# ------------------------------------------------- mixed-resolution mosaic

def grid_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial of the combined GridExtent fold
    (MosaicRasterSourceF.scala:197-206 ``instance``): extent = semigroup
    combine (union) of member extents; cell size = the member the reference's
    ``maxBy(_.resolution)`` selects — NOTE the reference binds that to a val
    *named* ``minCellSize``, but ``CellSize.resolution = sqrt(w*h)`` so maxBy
    picks the COARSEST member; we mirror the behavior, not the name. Partials
    are one row per block, so the driver-side combine is O(blocks)."""
    cw = batch.column("cw").to_numpy(zero_copy_only=False)
    ch = batch.column("ch").to_numpy(zero_copy_only=False)
    res = np.sqrt(cw * ch)
    j = int(np.argmax(res))
    return pa.table({
        "xmin": pa.array([float(np.min(batch.column("xmin").to_numpy(zero_copy_only=False)))]),
        "ymin": pa.array([float(np.min(batch.column("ymin").to_numpy(zero_copy_only=False)))]),
        "xmax": pa.array([float(np.max(batch.column("xmax").to_numpy(zero_copy_only=False)))]),
        "ymax": pa.array([float(np.max(batch.column("ymax").to_numpy(zero_copy_only=False)))]),
        "cw": pa.array([float(cw[j])]), "ch": pa.array([float(ch[j])]),
        "res": pa.array([float(res[j])]),
    })


def combine_grid(partials: pa.Table) -> dict:
    """Fold the per-block partials into the target GridExtent dict."""
    res = partials.column("res").to_numpy(zero_copy_only=False)
    j = int(np.argmax(res))
    xmin = float(np.min(partials.column("xmin").to_numpy(zero_copy_only=False)))
    ymin = float(np.min(partials.column("ymin").to_numpy(zero_copy_only=False)))
    xmax = float(np.max(partials.column("xmax").to_numpy(zero_copy_only=False)))
    ymax = float(np.max(partials.column("ymax").to_numpy(zero_copy_only=False)))
    cw = float(partials.column("cw").to_numpy(zero_copy_only=False)[j])
    ch = float(partials.column("ch").to_numpy(zero_copy_only=False)[j])
    # GridExtent cell counts (geotrellis rounds the extent to whole cells)
    cols = int(round((xmax - xmin) / cw))
    rows = int(round((ymax - ymin) / ch))
    return {"xmin": xmin, "ymax": ymax, "cw": cw, "ch": ch,
            "cols": cols, "rows": rows}


def member_target_tiles(batch: pa.Table, grid: dict, tile: int = 8) -> pa.Table:
    """Resample each member raster to the combined target grid (NEAREST —
    ResampleMethod.DEFAULT, the ``l.resample(targetRE)`` step of the mosaic
    semigroup, MosaicRasterSourceF.scala:109-140) and EXPLODE it into
    tile-aligned (x, y, rank, cells) rows for the ranked first-wins merge.

    The outer loop is per MEMBER (members are few and large); all per-cell
    work — center-point nearest index math, validity masking, tile split —
    is vectorized numpy over the member's target window. All-NoData tiles
    are dropped, so the shuffle moves only data-bearing tiles."""
    gx0, gy1 = grid["xmin"], grid["ymax"]
    cw, ch = grid["cw"], grid["ch"]
    out = {"x": [], "y": [], "rank": [], "cells": []}
    ranks = batch.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
    for i in range(len(batch)):
        mxmin = batch.column("xmin")[i].as_py()
        mymin = batch.column("ymin")[i].as_py()
        mxmax = batch.column("xmax")[i].as_py()
        mymax = batch.column("ymax")[i].as_py()
        mcw = batch.column("cw")[i].as_py()
        mch = batch.column("ch")[i].as_py()
        mcols = batch.column("cols")[i].as_py()
        mrows = batch.column("rows")[i].as_py()
        vals = np.asarray(batch.column("cells")[i].as_py(), dtype=np.float64) \
            .reshape(mrows, mcols)
        # candidate target window covering the member extent
        c0 = max(int(np.floor((mxmin - gx0) / cw)), 0)
        c1 = min(int(np.ceil((mxmax - gx0) / cw)), grid["cols"])
        r0 = max(int(np.floor((gy1 - mymax) / ch)), 0)
        r1 = min(int(np.ceil((gy1 - mymin) / ch)), grid["rows"])
        if c1 <= c0 or r1 <= r0:
            continue
        cs = np.arange(c0, c1, dtype=np.int64)
        rs = np.arange(r0, r1, dtype=np.int64)
        # target cell centers -> member grid indices (mapToGrid: floor)
        cx = gx0 + (cs + 0.5) * cw
        cy = gy1 - (rs + 0.5) * ch
        mc = np.floor((cx - mxmin) / mcw).astype(np.int64)
        mr = np.floor((mymax - cy) / mch).astype(np.int64)
        okc = (mc >= 0) & (mc < mcols)
        okr = (mr >= 0) & (mr < mrows)
        win = np.full((len(rs), len(cs)), np.nan, dtype=np.float64)
        if okr.any() and okc.any():
            sub = vals[np.ix_(mr[okr], mc[okc])]
            wi = np.ix_(np.nonzero(okr)[0], np.nonzero(okc)[0])
            win[wi] = sub
        # pad the window out to tile-aligned bounds and split into tiles
        tc0, tc1 = (c0 // tile) * tile, ((c1 + tile - 1) // tile) * tile
        tr0, tr1 = (r0 // tile) * tile, ((r1 + tile - 1) // tile) * tile
        frame = np.full((tr1 - tr0, tc1 - tc0), np.nan, dtype=np.float64)
        frame[r0 - tr0:r1 - tr0, c0 - tc0:c1 - tc0] = win
        nty, ntx = (tr1 - tr0) // tile, (tc1 - tc0) // tile
        tiles = frame.reshape(nty, tile, ntx, tile).swapaxes(1, 2) \
            .reshape(nty * ntx, tile * tile)
        keep = ~np.isnan(tiles).all(axis=1)
        if not keep.any():
            continue
        txs = np.tile(np.arange(tc0 // tile, tc1 // tile, dtype=np.int64), nty)
        tys = np.repeat(np.arange(tr0 // tile, tr1 // tile, dtype=np.int64), ntx)
        out["x"].append(txs[keep])
        out["y"].append(tys[keep])
        out["rank"].append(np.full(int(keep.sum()), ranks[i], dtype=np.int64))
        out["cells"].append(tiles[keep])
    if not out["x"]:
        return pa.table({
            "x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "cells": pa.array([], pa.list_(pa.float64())),
        })
    cells = np.concatenate(out["cells"])
    offs = pa.array(np.arange(len(cells) + 1, dtype=np.int32) * (tile * tile))
    return pa.table({
        "x": pa.array(np.concatenate(out["x"])),
        "y": pa.array(np.concatenate(out["y"])),
        "rank": pa.array(np.concatenate(out["rank"])),
        "cells": pa.ListArray.from_arrays(offs, pa.array(cells.ravel())),
    })


def mosaic_mixed(members_ds, tile: int = 8, num_partitions: int | None = None):
    """Mixed-resolution mosaic (S4 full case, the normal STAC mosaic):
    members on DIFFERENT grids are resampled to the reference's combined
    GridExtent — union extent, maxBy(resolution) cell size — then merged
    left-biased per cell in rank order.

    Shape: ONE metadata-only fold (per-block partials -> O(blocks) driver
    rows, never cells) computes the target grid; one map_batches resamples +
    explodes members into tile rows; the existing ranked ``mosaic`` exchange
    merges. Returns (merged_ds, grid)."""
    meta_cols = ["xmin", "ymin", "xmax", "ymax", "cw", "ch"]
    partials = members_ds.select_columns(meta_cols) \
        .map_batches(grid_partial, batch_format="pyarrow").take_all()
    grid = combine_grid(pa.Table.from_pylist(partials))
    tiles = members_ds.map_batches(
        partial(member_target_tiles, grid=grid, tile=tile),
        batch_format="pyarrow")
    return mosaic(tiles, num_partitions=num_partitions), grid
