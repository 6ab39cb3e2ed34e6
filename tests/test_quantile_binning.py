"""Equi-depth binning (q_quantile_binning): balance property on the real
table plus tie semantics on a synthetic heavy-tie distribution."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.pipelines.registry import (
    QB_BINS, q_quantile_binning, sql_quantile_binning)


def test_equi_depth_balance_at_sf001(ray_session, sf_smoke):
    out = q_quantile_binning(sf_smoke).to_pandas().sort_values("bin")
    assert list(out["bin"]) == list(range(QB_BINS))
    n = out["n"].sum()
    # l_extendedprice cents are near-unique -> bins within 2% of n/B
    assert (np.abs(out["n"] - n / QB_BINS) <= max(2, 0.02 * n / QB_BINS)).all()
    # bins tile the domain in order: lo/hi ranges are non-overlapping
    assert (out["hi_cents"].to_numpy()[:-1]
            <= out["lo_cents"].to_numpy()[1:]).all()


def test_ties_go_to_lower_bin(ray_session, tmp_path):
    """A column where one value holds >1/B of the mass: every occurrence of
    a tied edge value must land in ONE bin (v > edge is false for v == edge)
    on both engines."""
    vals = np.concatenate([np.full(400, 7.00), np.arange(100) * 1.0 + 100.0])
    pq.write_table(pa.table({"l_extendedprice": pa.array(vals)}),
                   tmp_path / "lineitem.parquet")
    out = q_quantile_binning(str(tmp_path)).to_pandas() \
        .sort_values("bin").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    ora = con.execute(sql_quantile_binning()).fetch_df() \
        .sort_values("bin").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)

    # the 400 copies of 7.00 (cents 700) sit entirely in bin 0
    b0 = out[out["bin"] == 0].iloc[0]
    assert b0["n"] >= 400 and b0["lo_cents"] == 700 and b0["hi_cents"] == 700
