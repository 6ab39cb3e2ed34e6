"""Interpolated as-of join: hand-built event log pinning every branch —
exact lerp between brackets, equal-ts tie rules (prev inclusive max-id,
next strict min-id), LOCF-only, NOCB-only, and the no-view user."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.pipelines.registry import (
    q_asof_interpolate, sql_asof_interpolate)

US = 1_000_000


@pytest.fixture()
def ev_sf(tmp_path):
    # user 1: views at t=0 (v=1.00) and t=100 (v=3.00); clicks at 25 and 100
    #   click@25 lerps to 150 cents; click@100 ties with the view at t=100 ->
    #   prev inclusive (150? no: v=300 exactly), next = none after
    # user 2: view only BEFORE its click (LOCF); user 3: view only AFTER
    #   (NOCB); user 4: click with no views at all (NULL)
    # user 5: two views at the SAME ts before the click -> prev = max id
    rows = [
        # (event_id, t_sec, user, type, value)
        (10, 0, 1, "view", 1.00), (11, 100, 1, "view", 3.00),
        (12, 25, 1, "click", 0.0), (13, 100, 1, "click", 0.0),
        (20, 10, 2, "view", 5.00), (21, 50, 2, "click", 0.0),
        (30, 90, 3, "view", 7.00), (31, 50, 3, "click", 0.0),
        (40, 5, 4, "click", 0.0),
        (50, 10, 5, "view", 2.00), (51, 10, 5, "view", 4.00),
        (52, 20, 5, "click", 0.0),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1] * US, "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    }), tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_interpolate_branches(ray_session, ev_sf):
    out = q_asof_interpolate(ev_sf).to_pandas() \
        .sort_values("click_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{ev_sf}/events.parquet')")
    ora = con.execute(sql_asof_interpolate()).fetch_df() \
        .sort_values("click_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  ora[sorted(ora.columns)], check_dtype=False)

    by = out.set_index("click_id")
    # exact lerp: 100 + (300-100) * 25/100 = 150
    assert by.loc[12, "v_interp_cents"] == 150
    # equal-ts view counts as PREV (inclusive), nothing strictly after
    assert by.loc[13, "prev_id"] == 11 and pd.isna(by.loc[13, "next_id"])
    assert by.loc[13, "v_interp_cents"] == 300
    assert by.loc[21, "v_interp_cents"] == 500      # LOCF
    assert by.loc[31, "v_interp_cents"] == 700      # NOCB
    assert pd.isna(by.loc[40, "v_interp_cents"])    # no views at all
    assert by.loc[52, "prev_id"] == 51              # same-ts tie -> max id
