"""Rendezvous (HRW) sharding — the consistent-hashing contract itself plus
DuckDB parity on a synthetic id range wide enough to hit every shard."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.pipelines.registry import (
    HRW_DROP, HRW_N, q_rendezvous_shards, sql_rendezvous_shards)


@pytest.fixture()
def id_sf(tmp_path):
    pq.write_table(pa.table({"doc_id": pa.array(range(2000), pa.int64())}),
                   tmp_path / "documents.parquet")
    return str(tmp_path)


def test_hrw_matches_oracle_and_churn_contract(ray_session, id_sf):
    out = q_rendezvous_shards(id_sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{id_sf}/documents.parquet')")
    ora = con.execute(sql_rendezvous_shards()).fetch_df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)

    # THE rendezvous property: dropping a shard moves exactly its own keys
    moved = out["shard"] == HRW_DROP
    assert (out["moved"] == moved.astype(int)).all()
    assert (out.loc[~moved, "shard_after_drop"]
            == out.loc[~moved, "shard"]).all()
    assert (out.loc[moved, "shard_after_drop"] != HRW_DROP).all()

    # every shard reachable, and the load is hash-uniform (loose 3x bound)
    counts = out["shard"].value_counts()
    assert set(counts.index) == set(range(HRW_N))
    assert counts.max() < 3 * counts.min()
    # expected movement ~ 1/N of keys (loose factor-2 band)
    frac = moved.mean()
    assert 0.5 / HRW_N < frac < 2.0 / HRW_N
