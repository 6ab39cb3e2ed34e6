"""Distributed Lloyd's k-means over the embeddings table in EXACT integer
arithmetic, so assignments and centroids are bit-stable across engines and
block layouts (the same discipline as the ANN/IVF stages: quantize once,
never let an order-dependent float sum cross a comparison boundary).

Shape at 100 TB: each iteration is ONE streaming pass — map_batches computes
per-block partial (cluster, dim) sums + counts against a broadcast centroid
matrix (k x d int64, a few KiB), and a combiner tree reduces the
O(k x d x blocks) partial rows to k x d. The corpus never materializes; the
driver only ever holds the centroid matrix. With ample object store a caller
can .materialize() the quantized 2-column projection once to trade memory for
the extra read passes — the kernels below are agnostic to that choice.

Reference anchor: the quantizer-training path of the IVF stage
(stages/ann.py) used k-means implicitly via sampled seeds; this module is the
full iterative operator with a SQL-replayable contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT = 1048576  # 2^20: float -> int64 grid; *2^20 is an exact double op


def quantize_batch(batch: pa.Table, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """(ids, V) with V int64 (n x d): v_q = floor(v * 2^20 + 0.5). Every step
    (widen to double, multiply by a power of two, +0.5, floor) is exact IEEE,
    so DuckDB's CAST(floor(x*1048576.0+0.5) AS BIGINT) lands on the same
    lattice point."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column(vec_col)
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    v = np.floor(flat.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    return ids, v.reshape(len(ids), -1)


def nearest_cluster(V: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact int64 argmin over squared distances; np.argmin's first-min rule
    == the oracle's ORDER BY dist, cluster tie-break."""
    # ||v-c||^2 = ||v||^2 + ||c||^2 - 2 v.c ; v.c <= d * 2^40 < 2^47 — exact
    vv = np.einsum("nd,nd->n", V, V)[:, None]
    cc = np.einsum("kd,kd->k", cent, cent)[None, :]
    d2 = vv + cc - 2 * (V @ cent.T)
    return np.argmin(d2, axis=1).astype(np.int64)


def partial_sums_batch(batch: pa.Table, cent: np.ndarray) -> pa.Table:
    """One block's contribution to the centroid update: rows
    (cluster, dim, s, n) — k x d rows per block regardless of block size."""
    _, V = quantize_batch(batch)
    a = nearest_cluster(V, cent)
    k, d = cent.shape
    sums = np.zeros((k, d), np.int64)
    np.add.at(sums, a, V)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    cl = np.repeat(np.arange(k, dtype=np.int64), d)
    return pa.table({
        "cluster": pa.array(cl),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "s": pa.array(sums.reshape(-1)),
        "n": pa.array(np.repeat(counts, d)),
    })


def update_centroids(rows: list[dict], cent: np.ndarray) -> np.ndarray:
    """New centroid = floor(sum / count) in ONE double division (exact-enough
    contract: |sum| < 2^53 so the division is the same IEEE op the oracle
    runs); empty clusters keep their previous centroid."""
    k, d = cent.shape
    sums = np.zeros((k, d), np.float64)
    counts = np.zeros((k, d), np.float64)
    for r in rows:
        sums[r["cluster"], r["dim"]] = r["s"]
        counts[r["cluster"], r["dim"]] = r["n"]
    out = cent.copy()
    mask = counts > 0
    out[mask] = np.floor(sums[mask] / counts[mask]).astype(np.int64)
    return out


def assign_batch(batch: pa.Table, cent: np.ndarray) -> pa.Table:
    ids, V = quantize_batch(batch)
    return pa.table({"vec_id": pa.array(ids),
                     "cluster": pa.array(nearest_cluster(V, cent))})


def quantize_to_table(batch: pa.Table, vec_col: str = "embedding") -> pa.Table:
    """One-time projection float corpus -> (vec_id, v:fixed_size_list<int64>)
    lattice. Iterative callers materialize THIS once (int64 lattice in the
    object store, spill-backed) instead of re-reading + re-quantizing the
    parquet every Lloyd round — the float column never crosses a round."""
    ids, V = quantize_batch(batch, vec_col)
    if len(ids) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "v": pa.array([], pa.list_(pa.int64()))})
    vals = pa.array(V.reshape(-1))
    return pa.table({"vec_id": pa.array(ids),
                     "v": pa.FixedSizeListArray.from_arrays(vals, V.shape[1])})


def _unpack_lattice(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    flat = batch.column("v").combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.int64)
    return ids, flat.reshape(len(ids), -1) if len(ids) else flat.reshape(0, 1)


def partial_sums_lattice(batch: pa.Table, cent: np.ndarray) -> pa.Table:
    """partial_sums_batch over the pre-quantized lattice table."""
    _, V = _unpack_lattice(batch)
    if len(V) == 0:
        e = pa.array([], pa.int64())
        return pa.table({"cluster": e, "dim": e, "s": e, "n": e})
    a = nearest_cluster(V, cent)
    k, d = cent.shape
    sums = np.zeros((k, d), np.int64)
    np.add.at(sums, a, V)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    return pa.table({
        "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "s": pa.array(sums.reshape(-1)),
        "n": pa.array(np.repeat(counts, d)),
    })


def assign_lattice(batch: pa.Table, cent: np.ndarray) -> pa.Table:
    ids, V = _unpack_lattice(batch)
    return pa.table({"vec_id": pa.array(ids),
                     "cluster": pa.array(nearest_cluster(V, cent)
                                         if len(ids) else
                                         np.array([], np.int64))})
