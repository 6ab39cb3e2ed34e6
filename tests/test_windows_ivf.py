"""Stream-window ops + IVF ANN recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sessionize_group_gap_logic():
    from geotrellis_server_ray.stages.windows import _sessionize_group

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 11:30",
        "2024-01-01 11:40", "2024-01-02 09:00",
    ]).astype("datetime64[us]")
    g = pd.DataFrame({"user_id": 7, "ts": ts})
    out = _sessionize_group(g, "ts", 30 * 60 * 1_000_000, "user_id")
    assert out["sid"].tolist() == [0, 1, 2]
    assert out["n_events"].tolist() == [2, 2, 1]


def test_asof_group_backward_match():
    from geotrellis_server_ray.stages.windows import _asof_group

    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:10", "2024-01-01 09:00",
    ]).astype("datetime64[us]")
    g = pd.DataFrame({
        "user_id": 1,
        "event_id": [100, 200, 300, 400],
        "event_type": ["view", "click", "view", "click"],
        "ts": ts,
    })
    out = _asof_group(g, "ts",
                      lambda d: d["event_type"] == "click",
                      lambda d: d["event_type"] == "view", "user_id")
    got = dict(zip(out["left_id"], out["right_id"]))
    assert got[200] == 100          # click at 10:05 -> view at 10:00
    assert pd.isna(got[400])        # click at 09:00 has no earlier view


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
