"""Block-layout robustness: the sf0.01 oracle parity suite runs with Ray's
default block sizing, so it cannot catch batch/block-BOUNDARY bugs — the
failure class that only shows up at corpus scale where a table spans
thousands of blocks. This suite forces pathological fragmentation
(target_max_block_size = 8 KiB, so every map output splits into many tiny
blocks mid-pipeline) and re-checks the layout-sensitive queries against
their DuckDB oracles: any operator that silently assumes "my unit of work
never splits across batches" or "consecutive rows share a block" diverges
here first."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

# The queries whose plans carry cross-row state that COULD straddle a block
# boundary: prefix scans, consecutive-pair generation, per-batch partial
# aggregates, segment explode/reassemble, posting-list assembly.
LAYOUT_SENSITIVE = [
    "sequence_pack",
    "ngram_jaccard_pairs",
    "hilbert_partitions",
    "passage_scrub",
    "passage_dedup",
    "inverted_index",
    "tfidf_topk",
    "exact_dedup",
    "cms_sketch",
    "token_budget_mix",
    "curation_pipeline",
    "kmeans_embed",
    "semantic_dedup",
    "group_quantiles",
    # round-4 additions with cross-block state: per-block top-k partials,
    # distinct-partial semi/anti builds, distinct-domain period inference,
    # per-block prefix-sum chunk math, halo-shuffled multi-stat focal
    "top_orders",
    "customers_without_orders",
    "parts_with_lineitems",
    "time_period_inference",
    "doc_chunks",
    "focal_stats",
    # PQ: per-block Lloyd partials, per-block ADC top-R partials, re-rank
    "ann_pq_topk",
    # KMV: per-block bottom-k truncation; tagged flags must survive splits
    "kmv_distinct",
    "kmv_intersection",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def tiny_blocks(ray_session):
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    yield
    ctx.target_max_block_size = saved


@pytest.mark.parametrize("name", LAYOUT_SENSITIVE)
def test_fragmented_blocks_match_oracle(name, tiny_blocks):
    from geotrellis_server_ray.pipelines.registry import QUERIES

    qfn, sqlfn = QUERIES[name]
    res = qfn(SF)
    eng = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    ora = con.execute(sqlfn()).fetch_df()

    eng, ora = _canon(eng), _canon(ora)
    assert list(eng.columns) == list(ora.columns), name
    assert len(eng) == len(ora), name
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
