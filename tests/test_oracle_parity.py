"""Driver-gate rehearsal: run every registry query on Ray AND its DuckDB
oracle at sf0.01, compare row count, column names, and order-insensitive
values — the same comparison CORRECTNESS_r{N}.json records."""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _query_names():
    from geotrellis_server_ray.pipelines.registry import QUERIES

    return list(QUERIES.keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session, sf_correct):
    from geotrellis_server_ray.pipelines.registry import QUERIES

    fn, sql = QUERIES[name]
    if sql is None:
        # rows-only contract: runs, yields rows, deterministic across runs
        df1 = _canon(_to_pandas(fn(sf_correct)))
        df2 = _canon(_to_pandas(fn(sf_correct)))
        assert len(df1) > 0
        assert df1.equals(df2), f"{name} not deterministic"
        return
    ray_df = _canon(_to_pandas(fn(sf_correct)))
    con = _oracle_con(sf_correct)
    ora_df = _canon(con.execute(sql()).fetch_df())
    assert list(ray_df.columns) == list(ora_df.columns), (
        f"{name} columns: {list(ray_df.columns)} vs {list(ora_df.columns)}"
    )
    assert len(ray_df) == len(ora_df), f"{name} rows: {len(ray_df)} vs {len(ora_df)}"
    for c in ray_df.columns:
        rv, ov = ray_df[c].values, ora_df[c].values
        if rv.dtype.kind == "f":
            import numpy as np

            assert np.array_equal(rv, ov, equal_nan=True), f"{name}.{c} float mismatch"
        elif rv.dtype.kind == "M":
            import numpy as np

            na_r, na_o = pd.isna(rv), pd.isna(ov)
            assert (na_r == na_o).all(), f"{name}.{c} null mismatch"
            assert (rv[~na_r] == ov[~na_o]).all(), f"{name}.{c} mismatch"
        else:
            assert (rv == ov).all(), f"{name}.{c} mismatch"


def test_tile_assign_bit_exact_at_sf01(ray_session):
    """Scale-confidence: the bit-exact tile-extent/double contract holds on
    the 10x tier too (sf0.1: ~10k anchored spans), not just the gate tier."""
    import numpy as np

    from geotrellis_server_ray.pipelines.registry import QUERIES

    fn, sql = QUERIES["tile_assign"]
    sf = "/root/testdata/sf0.1"
    ray_df = _canon(_to_pandas(fn(sf)))
    con = _oracle_con(sf)
    ora_df = _canon(con.execute(sql()).fetch_df())
    assert len(ray_df) == len(ora_df) and len(ray_df) > 5000
    for c in ("tile_xmin", "tile_ymin", "tile_xmax", "tile_ymax"):
        assert np.array_equal(ray_df[c].values, ora_df[c].values), c  # bit-exact
    for c in ("x", "y", "cell_id"):
        assert (ray_df[c].values == ora_df[c].values).all(), c


@pytest.mark.parametrize("name", ["reproject_lcc_cells", "reproject_stereo_cells",
                                  "stac_http_select", "ngram_jaccard_pairs",
                                  "inverted_index", "tfidf_topk"])
def test_round3_ops_exact_at_sf01(name, ray_session):
    """Scale-confidence for round-3 operators at the 10x tier: the LCC /
    polar-stereo closed-form replays, the paged HTTP STAC walk (10x item
    catalog, more pages), and the distributed consecutive-pair generation
    (10x ids -> real multi-block boundary exchange) all stay value-exact."""
    from geotrellis_server_ray.pipelines.registry import QUERIES

    fn, sql = QUERIES[name]
    sf = "/root/testdata/sf0.1"
    ray_df = _canon(_to_pandas(fn(sf)))
    con = _oracle_con(sf)
    ora_df = _canon(con.execute(sql()).fetch_df())
    assert list(ray_df.columns) == list(ora_df.columns)
    assert len(ray_df) == len(ora_df) and len(ray_df) > 0
    for c in ray_df.columns:
        assert (ray_df[c].values == ora_df[c].values).all(), f"{name}.{c}"


@pytest.mark.parametrize("name", ["hilbert_partitions", "exact_dedup", "simhash_fingerprints"])
def test_round2_ops_bit_exact_at_sf01(name, ray_session):
    """Scale-confidence for round-2 operators: the hash/curve contracts hold
    on the 10x tier too, not just the sf0.01 gate tier."""
    from geotrellis_server_ray.pipelines.registry import QUERIES

    fn, sql = QUERIES[name]
    sf = "/root/testdata/sf0.1"
    ray_df = _canon(_to_pandas(fn(sf)))
    con = _oracle_con(sf)
    ora_df = _canon(con.execute(sql()).fetch_df())
    assert list(ray_df.columns) == list(ora_df.columns)
    assert len(ray_df) == len(ora_df) and len(ray_df) > 0
    for c in ray_df.columns:
        assert (ray_df[c].values == ora_df[c].values).all(), f"{name}.{c}"


def test_ngram_pairs_sort_fallback(ray_session, tmp_path, monkeypatch):
    """Overlapping block ranges (shuffled row order across row groups) must
    trigger the one-time range sort and still match the oracle exactly —
    the disjointness check is verified, never assumed."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geotrellis_server_ray import config as C
    from geotrellis_server_ray.pipelines.registry import QUERIES

    rng = np.random.default_rng(7)
    ids = rng.permutation(400).astype(np.int64)  # shuffled -> ranges overlap
    texts = [f"doc {i} body {'ab' * (i % 9)}" for i in ids]
    pq.write_table(pa.table({"doc_id": ids, "text": texts}),
                   tmp_path / "documents.parquet", row_group_size=100)
    # force a multi-block read so >1 block range exists to overlap
    monkeypatch.setattr(C, "read_blocks_for_rows", lambda n, **kw: 4)

    fn, sql = QUERIES["ngram_jaccard_pairs"]
    ray_df = _canon(_to_pandas(fn(str(tmp_path))))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora_df = _canon(con.execute(sql()).fetch_df())
    assert list(ray_df.columns) == list(ora_df.columns)
    assert len(ray_df) == len(ora_df) == 399
    for c in ray_df.columns:
        assert (ray_df[c].values == ora_df[c].values).all(), c
