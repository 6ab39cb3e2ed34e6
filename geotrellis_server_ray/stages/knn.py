"""kNN point lookup over geo-anchored spans.

Generalizes the reference's GetFeatureInfoExtended multipoint probe (ogc/.../
wms/GetFeatureInfoExtended.scala:51-118: per query point, read a +-10-cell
buffered window and take the nearest cell) to distributed k-nearest-neighbor:

  * queries (small) broadcast via ray.put
  * candidates stream; each batch emits per-query partial top-k
  * cell-ring pre-filter: a span only enters the distance kernel when its
    quadtree cell lies within the query's expanding ring bound — the
    cell-ring-expansion optimization of the north rule. With k rings r, the
    candidate bound is conservative (ring cell diagonal), so correctness never
    depends on the ring choice; it only prunes work.
  * final merge: tiny groupby(query_id).map_groups

Ordering: distance asc, then (doc_id, span_idx) asc for deterministic ties.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cells
from ..functions.geometry import haversine_m


class KnnProbe:
    """map_batches stage: anchored spans -> per-batch partial top-k rows
    (query_id, doc_id, span_idx, dist_m)."""

    def __init__(self, queries_ref, k: int = 5, ring_level: int | None = None, ring_k: int | None = None):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, self.qlon, self.qlat = q
        self.k = k
        self.ring_cells = None
        if ring_level is not None and ring_k is not None:
            qc = cells.cell_id(self.qlon, self.qlat, ring_level)
            self.ring_level = ring_level
            # union of all queries' ring cells -> candidate pre-filter set
            self.ring_cells = np.unique(cells.cell_ring(qc, ring_level, ring_k).ravel())

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        keep = ~np.isnan(lon)
        if self.ring_cells is not None:
            c = cells.cell_id(np.where(keep, lon, 0.0), np.where(keep, lat, 0.0), self.ring_level)
            keep &= np.isin(c, self.ring_cells)
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.string()),
                "span_idx": pa.array([], type=pa.int64()),
                "dist_m": pa.array([], type=pa.float64()),
            })
        d = haversine_m(lon[idx][:, None], lat[idx][:, None], self.qlon[None, :], self.qlat[None, :])
        n, Q = d.shape
        kk = min(self.k, n)
        # tie-inclusive partial top-k: keep EVERY row at distance <= the kth
        # smallest, so exact-distance ties at the k boundary (duplicate
        # coordinates exist in the corpus) all reach the final stage, which
        # breaks them deterministically by (doc_id, span_idx)
        kth = np.partition(d, kk - 1, axis=0)[kk - 1]  # (Q,)
        qi, ri = np.nonzero(d.T <= kth[:, None])  # query-major
        rows = idx[ri]
        take = pa.array(rows, type=pa.int64())
        return pa.table({
            "query_id": pa.array(self.qids[qi], type=pa.int64()),
            "doc_id": batch.column("doc_id").take(take),
            "span_idx": batch.column("span_idx").take(take),
            "dist_m": pa.array(d[ri, qi], type=pa.float64()),
        })


def _final(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["dist_m", "doc_id", "span_idx"], ascending=True).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_id", "rank", "doc_id", "span_idx"]]


def knn(ds, queries: tuple[np.ndarray, np.ndarray, np.ndarray], k: int = 5,
        ring_level: int | None = None, ring_k: int | None = None):
    """ds of anchored spans (doc_id, span_idx, lon, lat) -> top-k rows."""
    import ray

    qref = ray.put(queries)
    parts = ds.map_batches(
        KnnProbe,
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "ring_level": ring_level, "ring_k": ring_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )
    return parts.groupby("query_id").map_groups(partial(_final, k=k), batch_format="pandas")
