"""Stream-window ops + IVF ANN recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sessionize_partition_gap_logic():
    from geotrellis_server_ray.stages.windows import _sessionize_partition

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 11:30",
        "2024-01-01 11:40", "2024-01-02 09:00",
        # second key interleaved: its own session numbering restarts
        "2024-01-01 10:05", "2024-01-01 12:00",
    ]).astype("datetime64[us]")
    t = pa.table({"user_id": pa.array([7] * 5 + [9] * 2, pa.int64()),
                  "ts": pa.array(ts)})
    out = _sessionize_partition(t, "user_id", "ts", 30 * 60 * 1_000_000).to_pandas()
    u7 = out[out["user_id"] == 7].sort_values("sid")
    assert u7["sid"].tolist() == [0, 1, 2]
    assert u7["n_events"].tolist() == [2, 2, 1]
    u9 = out[out["user_id"] == 9].sort_values("sid")
    assert u9["sid"].tolist() == [0, 1]


def test_asof_partition_backward_match():
    from geotrellis_server_ray.stages.windows import _asof_partition

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:10", "2024-01-01 09:00",
        # key 2: exact-ts tie — click matches the max-id view at the SAME ts
        "2024-01-01 08:00", "2024-01-01 08:00", "2024-01-01 08:00",
    ]).astype("datetime64[us]")
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "event_id": pa.array([100, 200, 300, 400, 10, 30, 20], pa.int64()),
        "event_type": pa.array(["view", "click", "view", "click",
                                "view", "view", "click"]),
        "ts": pa.array(ts),
    })
    import pyarrow.compute as pc

    out = _asof_partition(t, "user_id", "ts",
                          lambda d: pc.equal(d.column("event_type"), "click"),
                          lambda d: pc.equal(d.column("event_type"), "view")).to_pandas()
    got = dict(zip(out["left_id"], out["right_id"]))
    assert got[200] == 100          # click at 10:05 -> view at 10:00
    assert pd.isna(got[400])        # click at 09:00 has no earlier view
    assert got[20] == 30            # equal-ts tie -> max event_id view


def test_ivf_exact_equals_brute_force(ray_session, sf_correct):
    """The two-phase spherical-cap-bound IVF is EXACT: its top-k must equal
    brute force bit-for-bit (same ranks, same ids), and be deterministic
    across runs. (Round-2 replacement for the old recall-regime test: the
    bound-based phase 2 guarantees no top-k member is ever pruned.)"""
    from geotrellis_server_ray.pipelines.registry import q_ann_ivf_topk, q_ann_topk

    exact = q_ann_topk(sf_correct).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ivf = q_ann_ivf_topk(sf_correct).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert exact[["query_id", "rank", "vec_id"]].equals(ivf[["query_id", "rank", "vec_id"]])
    again = q_ann_ivf_topk(sf_correct).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert ivf.equals(again)


def test_ivf_high_recall_on_clustered_data(ray_session):
    """When the data HAS cluster structure (the real-world embedding case),
    IVF recovers nearly all exact neighbors with few probes."""
    import ray.data as rd

    from geotrellis_server_ray.stages.ann import cosine_topk, ivf_topk, kmeans_centroids

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 4
    mat = np.vstack([c + rng.standard_normal((200, 32)) for c in centers])
    ids = np.arange(len(mat), dtype=np.int64)
    qsel = rng.choice(len(mat), 10, replace=False)
    queries = (ids[qsel], mat[qsel])
    emb = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.astype(np.float32) for row in mat],
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(emb)
    exact = cosine_topk(ds, queries, k=5).to_pandas()
    cents = kmeans_centroids(mat, k=8, iters=8, seed=1)
    approx = ivf_topk(rd.from_arrow(emb), queries, cents, k=5, nprobe=2).to_pandas()
    e = set(zip(exact["query_id"], exact["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_interval_join_boundaries(ray_session):
    """Range-join edge cases: event exactly at start (included), exactly at
    end (excluded), interval spanning a bucket boundary pairs exactly once."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.windows import interval_join

    W = 1000  # bucket width in us
    ev = rd.from_arrow(pa.table({
        "ts": pa.array(np.array([100, 999, 1000, 1500, 2000], "datetime64[us]")),
        "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
    }))
    iv = rd.from_arrow(pa.table({
        "k": pa.array([7], pa.int64()),
        "s": pa.array(np.array([999], "datetime64[us]")),   # spans buckets 0+1
        "e": pa.array(np.array([2000], "datetime64[us]")),  # exclusive
    }))
    out = interval_join(ev, iv, "ts", "s", "e", bucket_us=W).to_pandas()
    assert sorted(out["eid"].tolist()) == [1, 2, 3]  # 999 in, 2000 out, once each
    # salted lanes must not change emission: each event meets each replica
    # in exactly one salt lane, so pairs still appear exactly once
    salted = interval_join(ev, iv, "ts", "s", "e", bucket_us=W,
                           salt=4).to_pandas()
    assert sorted(salted["eid"].tolist()) == [1, 2, 3]


def test_interval_agg_matches_join(ray_session):
    """Aggregate pushdown == materialized join + groupby on the same edge
    cases: start-inclusive, end-exclusive, bucket-spanning window counted
    once, zero-event window present with n=0 (dropped by callers wanting
    inner-join semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.windows import interval_agg

    W = 1000
    ev = rd.from_arrow(pa.table({
        "ts": pa.array(np.array([100, 999, 1000, 1500, 2000], "datetime64[us]")),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    }))
    iv = rd.from_arrow(pa.table({
        "k": pa.array([7, 8, 9], pa.int64()),
        "s": pa.array(np.array([999, 0, 5000], "datetime64[us]")),
        "e": pa.array(np.array([2000, 100, 6000], "datetime64[us]")),
    }))
    out = (interval_agg(ev, iv, "ts", "s", "e", val_col="v", key_col="k",
                        bucket_us=W, num_partitions=3)
           .to_pandas().set_index("k").sort_index())
    # k=7 spans buckets 0+1: events 999,1000,1500 in [999,2000) -> n=3 sum=90
    assert out.loc[7, "n_events"] == 3 and out.loc[7, "sum_val"] == 90
    # k=8: [0,100) excludes ts=100 (end-exclusive) -> zero-event window
    assert out.loc[8, "n_events"] == 0 and out.loc[8, "sum_val"] == 0
    # k=9: empty range far from any event
    assert out.loc[9, "n_events"] == 0


def test_pq_rerank_recovers_exact_topk(ray_session, sf_correct):
    """The PQ ADC shortlist (R=200) + exact re-rank recovers the TRUE
    brute-force L2 top-k on the synthetic embeddings — measured, not
    assumed (registry docstring's sizing claim)."""
    import numpy as np
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import ANN_K, ANN_NQ, QUERIES

    out = QUERIES["ann_pq_topk"][0](sf_correct).to_pandas()
    t = pq.read_table(f"{sf_correct}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, np.float64)
                    for v in t.column("embedding").to_pylist()])
    Q, C = mat[ids < ANN_NQ], mat[ids >= ANN_NQ]
    cid = ids[ids >= ANN_NQ]
    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    for qi in range(ANN_NQ):
        exact = cid[np.lexsort((cid, d2[qi]))][:ANN_K].tolist()
        got = out[out.query_id == qi].sort_values("rank").vec_id.tolist()
        assert got == exact, f"query {qi}: {got} != {exact}"


def test_pq_codes_are_bytes(ray_session, sf_correct):
    """The stored PQ index is one uint8 per subspace — the compression IS
    the point of the operator."""
    import pyarrow as pa

    from functools import partial

    from geotrellis_server_ray.pipelines.registry import _pq_codebooks
    from geotrellis_server_ray.stages.ann import pq_codes_batch

    lattice, cents = _pq_codebooks(sf_correct)
    codes = lattice.map_batches(partial(pq_codes_batch, cents=cents),
                                batch_format="pyarrow")
    schema = codes.schema()
    typ = schema.base_schema.field("codes").type
    assert pa.types.is_fixed_size_list(typ) and typ.value_type == pa.uint8()
    assert typ.list_size == cents.shape[0]
