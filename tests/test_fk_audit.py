"""FK-integrity audit (q_fk_violations) on synthetic tables that actually
contain violations — the /root/testdata tables are referentially clean, so
the oracle-parity suite never exercises the orphan or NULL-key paths."""
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.pipelines.registry import q_fk_violations


@pytest.fixture()
def dirty_sf(tmp_path):
    """customer/orders/lineitem with orphan FKs and NULL child keys.

    orders.o_custkey: two orphan keys (99, 77) and two NULLs (SQL
    NOT-EXISTS evaluates TRUE for a NULL key, so they count as orphans).
    lineitem.l_orderkey: one orphan key repeated twice + one NULL.
    """
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
                   tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "o_custkey": pa.array([1, 2, 99, 77, None, None], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 555, 555, None, 12], pa.int64()),
    }), tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_fk_violations_orphans_and_nulls(ray_session, dirty_sf):
    out = q_fk_violations(dirty_sf).to_pandas() \
        .sort_values("relationship").reset_index(drop=True)

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{dirty_sf}/{t}.parquet')")
    from geotrellis_server_ray.pipelines.registry import sql_fk_violations
    ora = con.execute(sql_fk_violations()).fetch_df() \
        .sort_values("relationship").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)

    by_rel = out.set_index("relationship")
    o = by_rel.loc["orders.o_custkey->customer.c_custkey"]
    assert (o["n_child"], o["n_orphan"], o["n_parents_referenced"]) \
        == (6, 4, 4)  # 2 orphan keys + 2 NULLs; distinct excludes NULLs
    l = by_rel.loc["lineitem.l_orderkey->orders.o_orderkey"]
    assert (l["n_child"], l["n_orphan"], l["n_parents_referenced"]) \
        == (6, 3, 3)  # 555 twice + NULL once; distinct = {10, 555, 12}
