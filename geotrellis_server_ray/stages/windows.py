"""Stream-shaped operators over the ordered event log.

Ray Data has no event-time windows/watermarks (and neither does the
request/response reference — SURVEY.md §2.10); stream-shaped workloads run as
ordered-log groupbys: partition by key, sort by ts inside the group, apply
the windowing with pandas. Ordering assumption: per-key processing sees that
key's full history (guaranteed by the groupby), not any cross-key order.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd


def _sessionize_group(g: pd.DataFrame, ts_col: str, gap_us: int, key_col: str) -> pd.DataFrame:
    g = g.sort_values(ts_col, kind="mergesort")
    ts = g[ts_col].values.astype("datetime64[us]").astype(np.int64)
    new_session = np.concatenate([[1], (np.diff(ts) > gap_us).astype(np.int64)])
    sid = np.cumsum(new_session) - 1
    out = (
        pd.DataFrame({"sid": sid, "ts": ts})
        .groupby("sid")
        .agg(n_events=("ts", "size"), t_start=("ts", "min"), t_end=("ts", "max"))
        .reset_index()
    )
    out[key_col] = g[key_col].iloc[0]
    return out[[key_col, "sid", "n_events", "t_start", "t_end"]]


def sessionize(ds, key_col: str, ts_col: str, gap_us: int):
    """Session windows: events within ``gap_us`` of the previous event of
    the same key share a session. Output one row per (key, session)."""
    return ds.groupby(key_col).map_groups(
        partial(_sessionize_group, ts_col=ts_col, gap_us=gap_us, key_col=key_col),
        batch_format="pandas",
    )


def _asof_group(g: pd.DataFrame, ts_col: str, left_pred, right_pred, key_col: str) -> pd.DataFrame:
    """Per-key as-of: for each 'left' row, the most recent earlier-or-equal
    'right' row (pd.merge_asof per sorted group)."""
    # secondary sort on event_id: with duplicate (key, ts) right rows,
    # merge_asof takes the LAST duplicate after the sort, which must be the
    # max event_id (the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1) —
    # not whatever order Ray's groupby happened to deliver
    left = g[left_pred(g)].sort_values([ts_col, "event_id"], kind="mergesort")
    right = g[right_pred(g)].sort_values([ts_col, "event_id"], kind="mergesort")
    if left.empty:
        return pd.DataFrame({key_col: [], "left_id": [], "right_id": []})
    if right.empty:
        m = left.assign(right_id=pd.array([None] * len(left), dtype="Int64"))
    else:
        m = pd.merge_asof(
            left[[ts_col, "event_id"]],
            right[[ts_col, "event_id"]].rename(columns={"event_id": "right_id"}),
            on=ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
    out = pd.DataFrame({
        key_col: g[key_col].iloc[0],
        "left_id": m["event_id"].astype("int64"),
        "right_id": m["right_id"].astype("Int64"),
    })
    return out


def asof_join(ds, key_col: str, ts_col: str, left_pred, right_pred):
    """Distributed as-of join inside one table: partition by key, sort by ts
    within the group, pd.merge_asof left rows against right rows."""
    return ds.groupby(key_col).map_groups(
        partial(_asof_group, ts_col=ts_col, left_pred=left_pred, right_pred=right_pred,
                key_col=key_col),
        batch_format="pandas",
    )
