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
