"""Resumable partitioned output: per-partition manifests + lineage records.

The north rule requires checkpointed, resumable execution at 10^12-doc scale.
Batch semantics of "resume" (ray guide / SURVEY.md §4): lay the output out as
one file per partition, written atomically (temp + rename), with a small
manifest row per finished partition; a rerun anti-joins its input partitions
against the manifest and skips completed work. Retried tasks are idempotent:
the file name is the partition id and the manifest row carries a content
checksum, so a double-write converges to the same state (no Date.now-style
nondeterminism anywhere).

Layout:
    out_dir/part-{pid:05d}.parquet      completed partition data
    out_dir/_manifest/{pid:05d}.json    lineage: pid, rows, checksum, inputs
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def assign_partitions(batch: pa.Table, key_col: str, num_partitions: int,
                      out_col: str = "partition_id") -> pa.Table:
    """Deterministic partition assignment by key hash (or range if the key is
    already a space-filling-curve index — see hilbert_partition)."""
    k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = k * np.uint64(0x9E3779B97F4A7C15)
        mixed ^= mixed >> np.uint64(29)  # full-width mix: supports any
    pid = (mixed % np.uint64(num_partitions)).astype(np.int64)  # partition count
    return batch.append_column(out_col, pa.array(pid))


def hilbert_partition(batch: pa.Table, hilbert_col: str, bits: int, num_partitions: int,
                      out_col: str = "partition_id") -> pa.Table:
    """Range partitioning on a Hilbert key: contiguous curve ranges ->
    spatially local output files (the north rule's range-partitioned sort)."""
    h = batch.column(hilbert_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    total = np.uint64(1) << np.uint64(2 * bits)
    pid = (h.astype(np.float64) / float(total) * num_partitions).astype(np.int64)
    pid = np.clip(pid, 0, num_partitions - 1)
    return batch.append_column(out_col, pa.array(pid))


def _checksum(table: pa.Table) -> int:
    """Order-insensitive content checksum (sum of row hashes via pandas)."""
    df = table.to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).values.astype(np.uint64)
    with np.errstate(over="ignore"):
        return int(h.sum() & np.uint64(0x7FFFFFFFFFFFFFFF))


def write_partition_group(group: pd.DataFrame, out_dir: str, input_desc: str = "") -> pd.DataFrame:
    """map_groups body: write one partition file + manifest row atomically.
    Idempotent: re-running a finished partition rewrites identical content."""
    pid = int(group["partition_id"].iloc[0])
    data = group.drop(columns=["partition_id"]).sort_values(
        list(group.columns.drop("partition_id")), kind="mergesort"
    )
    os.makedirs(f"{out_dir}/_manifest", exist_ok=True)
    table = pa.Table.from_pandas(data, preserve_index=False)
    # per-attempt tmp name: a speculative retry of the same partition must not
    # interleave bytes into the same tmp file (os.replace stays atomic; both
    # attempts produce identical content, so last-replace-wins is safe)
    attempt = os.getpid()
    tmp = f"{out_dir}/.part-{pid:05d}.{attempt}.tmp"
    final = f"{out_dir}/part-{pid:05d}.parquet"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    manifest = {
        "partition_id": pid,
        "rows": len(data),
        "checksum": _checksum(table),
        "input": input_desc,
    }
    mtmp = f"{out_dir}/_manifest/.{pid:05d}.{attempt}.tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(mtmp, f"{out_dir}/_manifest/{pid:05d}.json")
    return pd.DataFrame([manifest])


def completed_partitions(out_dir: str) -> set[int]:
    mdir = f"{out_dir}/_manifest"
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.endswith(".json") and not name.startswith("."):
            out.add(int(name[:-5]))
    return out


def resume_filter(ds, out_dir: str, partition_col: str = "partition_id"):
    """Anti-join against the manifest: drop rows whose partition is already
    complete. The done-set is tiny -> broadcast into the filter closure."""
    done = completed_partitions(out_dir)
    if not done:
        return ds
    done_arr = np.array(sorted(done), dtype=np.int64)

    def f(batch: pa.Table) -> pa.Table:
        pid = batch.column(partition_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(pid, done_arr)))

    return ds.map_batches(f, batch_format="pyarrow")


def checkpointed_write(ds, out_dir: str, partition_col: str = "partition_id",
                       input_desc: str = ""):
    """Full resumable sink: skip done partitions, group by partition, write
    each atomically. Returns the manifest Dataset (one row per partition
    written in this run)."""
    from functools import partial

    pending = resume_filter(ds, out_dir, partition_col)
    return pending.groupby(partition_col).map_groups(
        partial(write_partition_group, out_dir=out_dir, input_desc=input_desc),
        batch_format="pandas",
    )
