"""Mosaic merge: N overlapping sources -> one tile per key, left-biased.

Reference semantics (effects/.../MosaicRasterSourceF.scala:158-162 semigroup:
``l.resample(targetRE).merge(r...)`` — the LEFT operand's data wins per cell;
order of the source list matters). Under Ray's unordered executor the order
must be explicit: every source row carries a ``rank`` column and the grouped
merge fills each cell from the lowest-rank source that has data there
(SURVEY.md §2.10 order-sensitive-reduce rule).

first-match-wins layer selection (GetMap.scala:95 headOption) is the
degenerate whole-tile case of the same reduce.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd


def merge_group(group: pd.DataFrame, nodata: float = np.nan) -> pd.DataFrame:
    """Per tile key: sort by rank, fill cells first-wins."""
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


def mosaic(ds, nodata: float = np.nan):
    """ds rows (x, y, rank, cells) -> merged (x, y, cells, mask)."""
    return ds.groupby(["x", "y"]).map_groups(
        partial(merge_group, nodata=nodata), batch_format="pandas"
    )


def first_match_wins(ds, key_cols: list[str], rank_col: str = "rank"):
    """O4 headOption: keep the lowest-rank row per key (deterministic)."""

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(rank_col, kind="mergesort").head(1)

    return ds.groupby(key_cols).map_groups(pick, batch_format="pandas")
