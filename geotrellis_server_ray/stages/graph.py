"""Distributed graph kernels over Dataset edge lists.

Triangle counting with degree orientation (Schank & Wagner 2005 /
Latapy's compact-forward; the same orientation MapReduce triangle papers
use, e.g. Suri & Vassilvitskii WWW'11): orient every edge from its lower
(degree, id) endpoint to the higher one. Each triangle then has exactly ONE
wedge (u->v, u->w with k(v) < k(w)) whose closing edge is oriented v->w, so

    triangles = wedges(oriented) |><| oriented_edges on (v, w)

and — the scale property — the out-degree of ANY node under this
orientation is at most O(sqrt(2m)), so the wedge emission sum_u d_out(u)^2
is bounded and hot celebrity nodes (the skew killer of naive wedge counts,
whose emission is sum d^2 over RAW degrees) are defused structurally, not
by salting.

Execution shape (the house exchange patterns):
  * pair generation within segments is hash-partition + ONE vectorized call
    per partition (stages/dedup.pairs_in_partition precedent) — never one
    Python call per group;
  * degree attach is two hash joins edge x degree (data-proportional);
  * every intermediate is a bounded-width integer table.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from ..rayfix import ensure_join_finalize_patch
from .focal import add_key_partition

ensure_join_finalize_patch()  # sparse-exchange guard for Dataset.join sites


def _i64(t: pa.Table, col: str) -> np.ndarray:
    return t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)


def _segment_pair_index(seg_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) row-index pairs with i < j inside equal runs of the
    SORTED segment array — fully vectorized (np.repeat + cumsum walk)."""
    n = len(seg_sorted)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = seg_sorted[1:] != seg_sorted[:-1]
    starts = np.nonzero(new_seg)[0]
    seg_id = np.cumsum(new_seg) - 1
    pos = np.arange(n, dtype=np.int64) - starts[seg_id]  # index within run
    total = int(pos.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    j = np.repeat(np.arange(n, dtype=np.int64), pos)
    csum = np.concatenate([[0], np.cumsum(pos)])
    i = np.repeat(starts[seg_id], pos) + (np.arange(total, dtype=np.int64)
                                          - np.repeat(csum[:-1], pos))
    return i, j


def order_part_pairs(t: pa.Table, seg_col: str, item_col: str) -> pa.Table:
    """One partition's worth of co-occurrence pairs: for every segment, all
    unordered distinct item pairs (a < b by item value — rows are sorted by
    (seg, item) first, so i < j implies item_i < item_j)."""
    seg = _i64(t, seg_col)
    item = _i64(t, item_col)
    order = np.lexsort((item, seg))
    seg, item = seg[order], item[order]
    i, j = _segment_pair_index(seg)
    return pa.table({"a": pa.array(item[i]), "b": pa.array(item[j])})


def wedge_pairs(t: pa.Table) -> pa.Table:
    """One partition's wedges from oriented edges (u, v, kv): for every
    source u, all out-neighbor pairs (v, w) ordered by the orientation key
    kv — the unique wedge whose closing edge, if present, is oriented
    v -> w."""
    u = _i64(t, "u")
    v = _i64(t, "v")
    kv = _i64(t, "kv")
    order = np.lexsort((kv, u))
    u, v, kv = u[order], v[order], kv[order]
    i, j = _segment_pair_index(u)
    return pa.table({"wv": pa.array(v[i]), "ww": pa.array(v[j]),
                     "apex": pa.array(u[i])})


def _triangle_counts_local(a: np.ndarray, b: np.ndarray):
    """Exact per-node triangle counts for a small edge list, numpy-only:
    the same degree orientation as the distributed path, one lexsort for
    wedges, one searchsorted closing-edge probe. Returns (nodes, counts)
    or None if the wedge total exceeds the in-memory budget (pathological
    density — fall back to the distributed plan)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    m = len(a)
    ca, cb = inv[:m], inv[m:]
    n = len(nodes)
    deg = np.bincount(np.concatenate([ca, cb]), minlength=n)
    k = deg * np.int64(n) + np.arange(n, dtype=np.int64)  # strict total order
    fwd = k[ca] < k[cb]
    u = np.where(fwd, ca, cb)
    v = np.where(fwd, cb, ca)
    dout = np.bincount(u, minlength=n)
    n_wedges = int((dout.astype(np.int64) * (dout - 1) // 2).sum())
    if n_wedges > 50_000_000:  # ~1.2 GB of pair indices — stay distributed
        return None
    order = np.lexsort((k[v], u))
    us, vs = u[order], v[order]
    i, j = _segment_pair_index(us)
    edge_key = np.sort(u.astype(np.int64) * n + v)
    wkey = vs[i].astype(np.int64) * n + vs[j]
    pos = np.searchsorted(edge_key, wkey)
    pos[pos >= len(edge_key)] = 0
    closed = edge_key[pos] == wkey if len(edge_key) else np.zeros(0, bool)
    corners = np.concatenate([us[i][closed], vs[i][closed], vs[j][closed]])
    cnt = np.bincount(corners, minlength=n)
    keep = cnt > 0
    return nodes[keep], cnt[keep].astype(np.int64)


def triangle_node_counts(edges_ds, num_partitions: int,
                         small_edge_threshold: int = 500_000):
    """edges_ds: distinct undirected edges (a < b) as int64 columns a, b.
    Returns a Dataset of (node, n_tri) — per-node triangle participation
    counts (each triangle increments all three corners).

    Gated driver fast path (the connected_components union-find precedent):
    an edge list at or under ``small_edge_threshold`` rows (<= 8 MB of int64
    pairs — the op's OUTPUT-scale artifact after min-support, not the
    corpus) computes locally in one numpy pass instead of paying ~5 fixed
    exchange rounds; a second in-path guard falls back to the distributed
    plan if the oriented wedge total is pathological. ``bench.py
    --graph-scale`` forces threshold=0 to exercise the distributed path at
    64x; both paths are asserted equal in tests."""
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_sums

    # edges are consumed three times (two degree-attach joins + the closing
    # probe); materialize once — the edge list is the op's own input scale,
    # spill-backed like any block set
    edges = edges_ds.materialize()

    if edges.count() <= small_edge_threshold:
        import ray.data as rd

        tbl = pa.concat_tables(
            [pa.table(bb) for bb in edges.iter_batches(batch_format="pyarrow")],
            promote_options="default") if edges.count() else pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        res = _triangle_counts_local(_i64(tbl, "a"), _i64(tbl, "b")) \
            if len(tbl) else (np.array([], np.int64), np.array([], np.int64))
        if res is not None:
            return rd.from_arrow(pa.table({"node": pa.array(res[0]),
                                           "n_tri": pa.array(res[1])}))

    def flat_ends(b: pa.Table) -> pa.Table:
        a, bb = _i64(b, "a"), _i64(b, "b")
        return pa.table({"n": pa.array(np.concatenate([a, bb]))})

    deg = grouped_sums(edges.map_batches(flat_ends, batch_format="pyarrow"),
                       ["n"], [], count_as="d", wide=True)  # node-scaled keys

    # orientation key k(n) = d * 2^32 + n: a TOTAL order (ties on degree
    # break by id), so every edge orients one way and every triangle is
    # counted exactly once
    def key_of(b: pa.Table) -> pa.Table:
        return pa.table({"n": pc.cast(b.column("n"), pa.int64()),
                         "k": pa.array(_i64(b, "d") * (1 << 32) + _i64(b, "n"))})

    keys = deg.map_batches(key_of, batch_format="pyarrow")

    j = edges.join(keys, join_type="inner", num_partitions=num_partitions,
                   on=("a",), right_on=("n",))
    j = j.map_batches(lambda b: pa.table({"a": b.column("a"), "b": b.column("b"),
                                          "ka": b.column("k")}),
                      batch_format="pyarrow")
    j = j.join(keys, join_type="inner", num_partitions=num_partitions,
               on=("b",), right_on=("n",))

    def orient(b: pa.Table) -> pa.Table:
        a, bb = _i64(b, "a"), _i64(b, "b")
        ka, kb = _i64(b, "ka"), _i64(b, "k")
        fwd = ka < kb
        return pa.table({
            "u": pa.array(np.where(fwd, a, bb)),
            "v": pa.array(np.where(fwd, bb, a)),
            "kv": pa.array(np.where(fwd, kb, ka)),
        })

    oriented = j.map_batches(orient, batch_format="pyarrow").materialize()

    wedges = oriented.map_batches(
        partial(add_key_partition, key_cols=["u"], num_partitions=num_partitions),
        batch_format="pyarrow",
    ).groupby("part").map_groups(
        lambda t: wedge_pairs(t), batch_format="pyarrow")

    tri = wedges.join(oriented, join_type="inner", num_partitions=num_partitions,
                      on=("wv", "ww"), right_on=("u", "v"))

    def corners(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate(
            [_i64(b, "apex"), _i64(b, "wv"), _i64(b, "ww")]))})

    return grouped_sums(tri.map_batches(corners, batch_format="pyarrow"),
                        ["node"], [], count_as="n_tri", wide=True)
