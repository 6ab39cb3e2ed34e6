"""Distributed prefix scan (exclusive running sum over a global order).

The primitive behind training-sequence packing, global row numbering and
token-budget splitting: every row needs the sum of all earlier rows'
values under a total order — a computation that looks inherently
sequential but is the textbook two-pass parallel scan:

  pass 1  range-partition rows by the order column and reduce each
          partition to one total (P tiny rows, P ~ cluster size);
  driver  exclusive prefix over the P totals — O(P) scalar work;
  pass 2  each partition sorts its own rows once and adds
          local-exclusive-cumsum + its partition offset.

Only the P-row totals ever leave the workers; the data proper moves
through exactly one hash exchange (the range partitioning), so the scan
costs the same as a groupby at 100 TB.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _minmax(ds, col: str) -> tuple[int, int]:
    """Distributed min/max combiner: per-batch pyarrow aggregate partials
    coalesced to one block (same shape as the color-breaks gate)."""
    def partial_mm(b: pa.Table) -> pa.Table:
        g = b.group_by([]).aggregate([(col, "min"), (col, "max")])
        return g.rename_columns(["lo", "hi"])

    mm = ds.map_batches(partial_mm, batch_format="pyarrow").repartition(1).map_batches(
        lambda b: b.group_by([]).aggregate([("lo", "min"), ("hi", "max")])
        .rename_columns(["lo", "hi"]),
        batch_format="pyarrow",
    ).take_all()[0]
    return int(mm["lo"]), int(mm["hi"])


def _range_part(order: np.ndarray, lo: int, hi: int, nparts: int) -> np.ndarray:
    span = max(hi - lo + 1, 1)
    return ((order - lo).astype(np.int64) * nparts) // span


def prefix_sum(ds, order_col: str, val_col: str, out_col: str = "prev",
               num_partitions: int | None = None, key_col: str | None = None):
    """Append ``out_col`` = exclusive prefix sum of ``val_col`` in
    ``order_col`` order (int64-exact). ``order_col`` must be integral and
    UNIQUE per row — ties would make "earlier" ambiguous (the SQL
    equivalent is SUM() OVER (ORDER BY order_col ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)). Range partitioning keys on the order
    value itself, so the per-partition sort sees only its own contiguous
    key range and partials compose exactly.

    ``key_col`` makes the scan KEYED: an independent running sum per key
    (SUM() OVER (PARTITION BY key ORDER BY order ...)). Rows still range-
    partition by the ORDER column — NOT by key — so a key holding half the
    corpus cannot skew a partition; pass 1 instead reduces to one total
    per (partition, key) and the driver's exclusive prefix runs per key
    over P rows. Driver state is O(P x K): the key dimension must be
    driver-bounded (data sources, languages, shards — not doc ids)."""
    if num_partitions is None:
        from ..config import shuffle_partitions

        num_partitions = shuffle_partitions()
    # The scan is inherently multi-pass (min/max, partition totals, the scan
    # itself); materialize the input ONCE so the passes stream from cached
    # object-store blocks (spill-backed) instead of re-executing the whole
    # upstream chain per pass — callers project to the scan columns first,
    # so the resident copy is narrow (measured: the curation composite's
    # 3-exchange upstream ran 3x before this, 8.6 s -> 3.4 s at sf0.1).
    ds = ds.materialize()
    lo, hi = _minmax(ds, order_col)

    def add_part(b: pa.Table) -> pa.Table:
        if key_col is not None and b.column(key_col).null_count:
            # fail loudly at first touch: a null key would dictionary-encode
            # to a null index downstream and surface as an opaque IndexError
            raise ValueError(f"prefix_sum: key_col {key_col!r} contains nulls")
        order = b.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("_part", pa.array(_range_part(order, lo, hi, num_partitions)))

    parted = ds.map_batches(add_part, batch_format="pyarrow")

    # pass 1: one int64 total per partition (x key); P (x K) rows -> driver.
    tot_keys = ["_part"] + ([key_col] if key_col else [])

    def part_totals(b: pa.Table) -> pa.Table:
        g = b.group_by(tot_keys).aggregate([(val_col, "sum")])
        return g.rename_columns(tot_keys + ["tot"])

    totals = parted.map_batches(part_totals, batch_format="pyarrow").repartition(1).map_batches(
        lambda b: b.group_by(tot_keys).aggregate([("tot", "sum")]).rename_columns(tot_keys + ["tot"]),
        batch_format="pyarrow",
    ).take_all()
    if key_col is None:
        tot = np.zeros(num_partitions, np.int64)
        for r in totals:
            tot[int(r["_part"])] = int(r["tot"])
        offsets = np.zeros(num_partitions, np.int64)
        np.cumsum(tot[:-1], out=offsets[1:])  # exclusive prefix over partitions
        key_offsets = None
    else:
        key_offsets = {}
        for r in totals:
            key_offsets.setdefault(r[key_col], np.zeros(num_partitions, np.int64))[
                int(r["_part"])] = int(r["tot"])
        for k, tot in key_offsets.items():
            offs = np.zeros(num_partitions, np.int64)
            np.cumsum(tot[:-1], out=offs[1:])
            key_offsets[k] = offs
        offsets = None

    # pass 2: per-partition sort + local exclusive cumsum + offset. The
    # offsets array is O(P) (x K) and ships inside the task closure.
    def scan_part(g: pa.Table, *, offs, koffs) -> pa.Table:
        p = int(g.column("_part")[0].as_py())
        order = g.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        val = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        prev = np.empty(len(val), np.int64)
        if koffs is None:
            ix = np.argsort(order, kind="stable")
            run = np.zeros(len(val) + 1, np.int64)
            np.cumsum(val[ix], out=run[1:])
            prev[ix] = offs[p] + run[:-1]
        else:
            # dictionary-encode keeps Python objects to the K uniques; the
            # per-row path stays in numpy codes
            kc = g.column(key_col)
            dcol = pc.dictionary_encode(kc.combine_chunks() if isinstance(
                kc, pa.ChunkedArray) else kc)
            codes = dcol.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = dcol.dictionary.to_pylist()
            ix = np.lexsort((order, codes))  # sort by (key, order)
            run = np.zeros(len(val) + 1, np.int64)
            np.cumsum(val[ix], out=run[1:])
            c_sorted = codes[ix]
            # reset the running sum at each key segment start
            seg_starts = np.flatnonzero(np.concatenate(([True], c_sorted[1:] != c_sorted[:-1])))
            base = np.repeat(run[seg_starts], np.diff(np.concatenate((seg_starts, [len(val)]))))
            # every key in pass 2 was reduced in pass 1 over the same rows
            off_of_key = np.array([koffs[k][p] for k in uniq], np.int64)
            prev[ix] = off_of_key[c_sorted] + (run[:-1] - base)
        return g.drop_columns(["_part"]).append_column(out_col, pa.array(prev))

    return parted.groupby("_part").map_groups(
        partial(scan_part, offs=offsets, koffs=key_offsets), batch_format="pyarrow")


def pack_sequences(ds, order_col: str, tokens_col: str, capacity: int,
                   num_partitions: int | None = None):
    """Assign every document to a fixed-capacity training sequence:
    seq_id = (tokens before me) // capacity, seq_offset = ... % capacity
    — the deterministic streaming packer (documents straddle sequence
    boundaries rather than leaving tail padding, the layout used when
    examples are concatenated then chunked). One distributed scan; no
    driver-side pass over the data."""
    ds = prefix_sum(ds, order_col, tokens_col, out_col="_prev",
                    num_partitions=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        prev = b.column("_prev")
        b = b.drop_columns(["_prev"])
        b = b.append_column("seq_id", pc.cast(pc.divide(prev, capacity), pa.int64()))
        return b.append_column("seq_offset", pc.cast(
            pc.subtract(prev, pc.multiply(pc.divide(prev, capacity), capacity)), pa.int64()))

    return ds.map_batches(finish, batch_format="pyarrow")
