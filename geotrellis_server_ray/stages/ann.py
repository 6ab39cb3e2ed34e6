"""Approximate-nearest-neighbor / similarity search over embedding columns.

Baseline: brute-force cosine top-k — the query matrix is tiny (broadcast via
``ray.put``; read once per actor), candidates stream through ``map_batches``
as numpy blocks, each batch emits only its per-query top-k partials, and a
final small groupby merges partials. At 100 TB the heavy side streams once,
nothing materializes, and the shuffle carries only Q x k x num_blocks rows.

Scale path: ``LshBuckets`` assigns candidates to random-hyperplane sign
buckets; probing only matching buckets turns the scan into a bucketed join
(same partial-top-k merge afterwards).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _topk_frame(qids, cand_ids, sims, k: int) -> pd.DataFrame:
    df = pd.DataFrame({"query_id": qids, "vec_id": cand_ids, "sim": sims})
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)


class CosineTopK:
    """Actor-pool stage: per-batch partial top-k against the broadcast query
    matrix. Embeddings arrive as Arrow list<float>; the kernel is one float64
    matmul per batch."""

    def __init__(self, queries_ref, k: int = 5):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qmat = q
        self.k = k
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn.T  # (dim, Q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(self.qn)
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ self.qn  # (n, Q)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        n, Q = sims.shape
        kk = min(self.k, n)
        # per-query partial top-k within the batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        out = _topk_frame(
            np.repeat(self.qids, kk),
            vec_ids[part.T.ravel()],
            sims[part.T.ravel(), np.repeat(np.arange(Q), kk)],
            self.k,
        )
        return pa.Table.from_pandas(out, preserve_index=False)


def final_topk(group: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """map_groups finalizer: merge partials -> global top-k with rank."""
    g = group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_id", "rank", "vec_id"]]


def cosine_topk(ds, queries: tuple[np.ndarray, np.ndarray], k: int = 5):
    """ds(vec_id, embedding) -> (query_id, rank, vec_id) top-k per query."""
    import ray
    from functools import partial

    qref = ray.put(queries)
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    )
    return partials.groupby("query_id").map_groups(partial(final_topk, k=k), batch_format="pandas")


def kmeans_centroids(mat: np.ndarray, k: int = 16, iters: int = 5, seed: int = 11) -> np.ndarray:
    """Deterministic spherical k-means for the IVF coarse quantizer (seeded
    init, fixed iterations, unit-norm space — cells partition by cosine,
    matching the query metric)."""
    rng = np.random.default_rng(seed)
    x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            sel = assign == c
            if sel.any():
                m = x[sel].mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent


class IvfTopK:
    """IVF-pruned cosine top-k: candidates are probed only when their coarse
    centroid is among the query's ``nprobe`` nearest centroids. At cluster
    scale the dataset is hash-partitioned by centroid id so each probe task
    touches only probed partitions; in this single-stage form the pruning is
    a per-batch mask (documented partitioning assumption)."""

    def __init__(self, queries_ref, centroids_ref, k: int = 5, nprobe: int = 4):
        import ray

        self.qids, qmat = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        cent = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.k = k
        self.cent = cent  # unit-norm centroids (spherical k-means)
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn.T
        # (Q, nprobe) probed centroid ids per query, by cosine to centroids
        sim = qn @ cent.T
        self.probe = np.argsort(-sim, axis=1)[:, :nprobe]
        # (n_centroids, Q) probe mask
        self.probe_mask = np.zeros((len(cent), len(self.qids)), dtype=bool)
        for qi in range(len(self.qids)):
            self.probe_mask[self.probe[qi], qi] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = self.cent.shape[1]
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        assign = (matn @ self.cent.T).argmax(axis=1)
        sims = matn @ self.qn
        sims[~self.probe_mask[assign]] = -2.0  # outside probed cells
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        n, Q = sims.shape
        kk = min(self.k, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        df = _topk_frame(
            np.repeat(self.qids, kk),
            vec_ids[part.T.ravel()],
            sims[part.T.ravel(), np.repeat(np.arange(Q), kk)],
            self.k,
        )
        df = df[df["sim"] > -1.5]
        return pa.Table.from_pandas(df, preserve_index=False)


def ivf_topk(ds, queries: tuple[np.ndarray, np.ndarray], centroids: np.ndarray,
             k: int = 5, nprobe: int = 4):
    import ray
    from functools import partial

    qref = ray.put(queries)
    cref = ray.put(centroids)
    parts = ds.map_batches(
        IvfTopK,
        fn_constructor_kwargs={"queries_ref": qref, "centroids_ref": cref, "k": k, "nprobe": nprobe},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )
    return parts.groupby("query_id").map_groups(partial(final_topk, k=k), batch_format="pandas")


class LshBuckets:
    """Random-hyperplane LSH bucketing (the scale path for ANN): adds an
    int64 ``bucket`` column = sign-bit code of the embedding under ``nbits``
    fixed seeded hyperplanes. Equal buckets => high cosine similarity with
    high probability; candidate generation becomes a bucket-key groupby."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 97):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.weights = (1 << np.arange(nbits, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = self.planes.shape[0]
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        bits = (mat @ self.planes) > 0
        code = (bits * self.weights[None, :]).sum(axis=1)
        return batch.append_column("bucket", pa.array(code, type=pa.int64()))
