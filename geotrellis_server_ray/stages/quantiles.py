"""Distributed EXACT quantiles by iterative counting selection (radix-style
range narrowing) — no sampling, no t-digest approximation, and the driver
never materializes a single data value:

  pass 0   per-block (min, max) partials -> global range
  pass i   per-block histogram over NB equal integer buckets of each still-
           active (rank, lo, hi) range; a hash groupby combines the
           O(NB x ranges x blocks) partial rows; the driver walks the
           cumulative counts to narrow each rank's range by ~NB x
  stop     when a range's width <= NB each bucket IS one integer value, so
           the rank's answer reads straight off the counts

For 64-bit integer domains the loop is bounded by log_NB(width) <= 6 passes
(2-3 in practice); every pass is a pruned single-column streaming scan and
the only exchange carries histogram rows, never data. This is the selection
dual of the HLL sketch: state is O(NB) regardless of corpus size."""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import pyarrow as pa

NB = 4096  # buckets per narrowing pass


def exact_quantiles(ds, col: str, qs: dict[str, float],
                    n: int | None = None) -> pa.Table:
    """(label, value) rows: value = the ceil(q*n)-th smallest of ds[col].
    Delegates to the grouped selection with one constant group (the grouped
    path's pass 0 computes min/max AND count in the same single scan, so
    ``n`` is no longer needed and is accepted only for API compatibility)."""
    tagged = ds.map_batches(
        lambda b: b.append_column("_g", pa.nulls(len(b), pa.string())
                                  .fill_null("_all")),
        batch_format="pyarrow")
    out = grouped_exact_quantiles(tagged, "_g", col, qs)
    return out.select(["q_label", "value"]).sort_by("q_label")


def _grouped_minmax_count(b: pa.Table, col: str, group_col: str) -> pa.Table:
    g = b.group_by([group_col]).aggregate([(col, "min"), (col, "max"),
                                           (col, "count")])
    return g.rename_columns([group_col, "mn", "mx", "n"])


def _hist_batch_grouped(b: pa.Table, col: str, group_col: str,
                        ranges: list[tuple[int, str, int, int]]) -> pa.Table:
    """Per-block counts per ACTIVE (rid, group, lo, hi): the grouped twin of
    _hist_batch — the group filter composes with the range filter, so one
    pruned scan serves every group's still-open rank simultaneously."""
    import pyarrow.compute as pc

    v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    gcol = b.column(group_col)
    gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
    rids, bks, cts = [], [], []
    for rid, gval, lo, hi in ranges:
        gm = pc.equal(gcol, pa.scalar(gval)).to_numpy(zero_copy_only=False)
        x = v[gm & (v >= lo) & (v <= hi)]
        if len(x) == 0:
            continue
        # Division-first bucketing, overflow-safe over the FULL int64 domain:
        # (x - lo) can exceed 2^63 when the range spans both sign halves, so
        # the offset is computed with uint64 wraparound subtraction (exact
        # two's-complement difference), then divided by the Python-int-exact
        # step = ceil(width/NB).  Multiply-first ((x-lo)*NB//width) would wrap
        # int64 for widths beyond ~2^51.
        width = hi - lo + 1            # Python int, exact
        step = (width + NB - 1) // NB  # >= 1; buckets = ceil(width/step) <= NB
        off = x.astype(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
        bk = (off // np.uint64(step)).astype(np.int64)
        cnt = np.bincount(bk)
        nz = np.nonzero(cnt)[0]
        rids.append(np.full(len(nz), rid, np.int64))
        bks.append(nz.astype(np.int64))
        cts.append(cnt[nz].astype(np.int64))
    if not rids:
        return pa.table({"rid": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    return pa.table({"rid": pa.array(np.concatenate(rids)),
                     "bucket": pa.array(np.concatenate(bks)),
                     "cnt": pa.array(np.concatenate(cts))})


def grouped_exact_quantiles(ds, group_col: str, col: str,
                            qs: dict[str, float]) -> pa.Table:
    """Per-GROUP exact quantiles by the same iterative counting selection:
    state is one (remaining rank, lo, hi) triple per (group, label), so the
    driver holds O(G x labels) integers — the GROUP dimension must be
    enum-bounded (priorities, sources, languages), never a document id.
    This is the scale-honest grouped order statistic: a per-group sort
    would need every group co-located (one group can exceed a worker);
    here data never moves at all — each pass is a pruned streaming scan
    and the only exchange carries (rid, bucket, cnt) histogram rows.
    Returns (group, q_label, value) rows."""
    from ..pipelines.relational import grouped_sums

    # The selection is multi-pass (min/max/count + 2-3 narrowing passes):
    # materialize the projected input ONCE so every pass streams from cached
    # spill-backed blocks instead of re-executing the caller's upstream
    # chain per pass (the prefix_sum precedent in stages/scan.py).
    ds = ds.materialize()

    # grouped min/max/count via per-batch partials + one small combine
    parts = ds.map_batches(partial(_grouped_minmax_count, col=col,
                                   group_col=group_col), batch_format="pyarrow")

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by([group_col]).aggregate([("mn", "min"), ("mx", "max"),
                                               ("n", "sum")])
        return g.rename_columns([group_col, "mn", "mx", "n"])

    rows = parts.map_batches(combine, batch_format="pyarrow") \
        .repartition(1).map_batches(combine, batch_format="pyarrow").take_all()

    state: dict[tuple[str, str], list[int]] = {}
    for r in rows:
        for lbl, q in qs.items():
            state[(r[group_col], lbl)] = [int(math.ceil(q * r["n"])),
                                          int(r["mn"]), int(r["mx"])]
    out: dict[tuple[str, str], int] = {}
    while len(out) < len(state):
        active: dict[int, tuple[str, int, int]] = {}
        rid_of: dict[tuple[str, str], int] = {}
        for key, (k, lo, hi) in state.items():
            if key in out:
                continue
            if lo == hi:
                out[key] = lo
                continue
            rkey = (key[0], lo, hi)
            rid = next((i for i, r in active.items() if r == rkey), None)
            if rid is None:
                rid = len(active)
                active[rid] = rkey
            rid_of[key] = rid
        if not active:
            break
        ranges = [(rid, g, lo, hi) for rid, (g, lo, hi) in active.items()]
        hist = grouped_sums(
            ds.map_batches(partial(_hist_batch_grouped, col=col,
                                   group_col=group_col, ranges=ranges),
                           batch_format="pyarrow"),
            ["rid", "bucket"], ["cnt"], small_key_space=True)
        counts: dict[int, dict[int, int]] = {rid: {} for rid in active}
        for r in hist.take_all():
            counts[r["rid"]][r["bucket"]] = r["cnt"]
        for key, rid in rid_of.items():
            k, lo, hi = state[key]
            width = hi - lo + 1
            step = (width + NB - 1) // NB
            acc = 0
            for bk in sorted(counts[rid]):
                c = counts[rid][bk]
                if acc + c >= k:
                    if step == 1:
                        out[key] = lo + bk
                    else:
                        # exact preimage of bucket bk under division-first
                        # bucketing: v - lo in [bk*step, (bk+1)*step - 1]
                        # (all Python-int arithmetic, so exact at any width)
                        state[key] = [k - acc, lo + bk * step,
                                      min(hi, lo + (bk + 1) * step - 1)]
                    break
                acc += c
            else:
                out[key] = hi
    keys = sorted(out)
    return pa.table({
        "grp": pa.array([k[0] for k in keys], pa.string()),
        "q_label": pa.array([k[1] for k in keys], pa.string()),
        "value": pa.array([out[k] for k in keys], pa.int64()),
    })
