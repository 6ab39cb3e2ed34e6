"""Algebraic invariants for the grouping-sets / lag-rank / gap-fill queries.

The oracle-parity suite proves DuckDB equality at sf0.01; these pin the
internal consistency of each result at sf0.001 (different input, no SQL in
the loop): rollup levels must telescope, lag deltas must reconstruct the
ordered value stream, and the gap-filled grid must be dense and
sum-preserving.
"""

import numpy as np
import pandas as pd


def _df(ds):
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    import pyarrow as pa

    return pa.concat_tables(tabs).to_pandas()


def test_rollup_levels_telescope(ray_session, sf_smoke):
    from geotrellis_server_ray.pipelines.registry import q_rollup_pricing

    df = _df(q_rollup_pricing(sf_smoke))
    fine = df[df.lvl == 0]
    mid = df[df.lvl == 1].set_index("l_returnflag")
    total = df[df.lvl == 3]
    assert len(total) == 1
    # each flag's rollup row equals the sum of its finest rows
    for flag, g in fine.groupby("l_returnflag"):
        assert mid.loc[flag, "qty_c"] == g.qty_c.sum()
        assert mid.loc[flag, "n_rows"] == g.n_rows.sum()
    # the grand-total row equals the sum of everything
    assert total.qty_c.iloc[0] == fine.qty_c.sum() == mid.qty_c.sum()
    assert total.n_rows.iloc[0] == fine.n_rows.sum() == mid.n_rows.sum()
    # rolled-up key columns are NULL exactly per the GROUPING bitmask
    assert mid.l_linestatus.isna().all()
    assert total.l_returnflag.isna().all() and total.l_linestatus.isna().all()


def test_lag_deltas_reconstruct_stream(ray_session, sf_smoke):
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import q_lag_rank_events

    df = _df(q_lag_rank_events(sf_smoke))
    src = pq.read_table(f"{sf_smoke}/events.parquet",
                        columns=["event_id", "event_type", "ts", "value"]).to_pandas()
    src["vc"] = np.floor(src.value * 100.0).astype(np.int64)
    src = src.sort_values(["event_type", "ts", "event_id"])
    for key, g in src.groupby("event_type"):
        got = df[df.event_type == key].set_index("event_id").loc[g.event_id]
        # rank is the 1-based position in (ts, event_id) order
        assert (got.rn.to_numpy() == np.arange(1, len(g) + 1)).all()
        # first delta NULL, the rest telescope back to the values
        assert pd.isna(got.delta_c.iloc[0])
        rebuilt = g.vc.iloc[0] + np.concatenate(
            [[0], np.cumsum(got.delta_c.iloc[1:].to_numpy(dtype=np.int64))])
        assert (rebuilt == g.vc.to_numpy()).all()


def test_locf_kernel_carries_and_masks():
    from geotrellis_server_ray.pipelines.registry import _locf_grid

    val = np.array([[10, 0, 0, 7], [0, 3, 0, 0]], dtype=np.int64)
    has = np.array([[True, False, False, True],
                    [False, True, False, False]])
    locf, pre = _locf_grid(val, has)
    assert (locf[0] == [10, 10, 10, 7]).all() and not pre[0].any()
    # key with a late first observation: cells before it are masked NULL
    assert (pre[1] == [True, False, False, False]).all()
    assert (locf[1, 1:] == [3, 3, 3]).all()


def test_locf_matches_oracle_nulls_when_key_starts_late(ray_session, sf_smoke):
    from geotrellis_server_ray.pipelines.registry import q_events_locf

    df = _df(q_events_locf(sf_smoke))
    # dense grid, filled flag consistent with NULLs: a NULL can only sit on
    # a filled (no-event) cell, and each key's NULL prefix ends at its first
    # observation
    assert not df.duplicated(["event_type", "hour"]).any()
    nulls = df.locf_value_c.isna()
    assert (df.loc[nulls, "filled"] == 1).all()
    for _, g in df.sort_values("hour").groupby("event_type"):
        n = g.locf_value_c.isna().to_numpy()
        assert not (n[1:] & ~n[:-1]).any()  # NULLs never resume after a value


def test_gapfill_grid_dense_and_sum_preserving(ray_session, sf_smoke):
    from geotrellis_server_ray.pipelines.registry import (q_events_gapfill,
                                                          q_events_hourly)

    dense = _df(q_events_gapfill(sf_smoke))
    sparse = _df(q_events_hourly(sf_smoke))
    types = dense.event_type.nunique()
    span = dense.hour.max() - dense.hour.min() + 1
    # every (type, hour) cell present exactly once
    assert len(dense) == types * span
    assert not dense.duplicated(["event_type", "hour"]).any()
    # zero-fill adds no mass: totals match the sparse hourly aggregate
    assert dense.value_c.sum() == sparse.value_c.sum()
    assert dense.n_events.sum() == sparse.n_events.sum()
    # and at least one genuinely filled gap exists in the fixture
    assert (dense.n_events == 0).any()
