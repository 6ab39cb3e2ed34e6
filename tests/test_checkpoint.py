"""Checkpoint/lineage/resume semantics + salting + hilbert partitioning."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geotrellis_server_ray.state import checkpoint as C


@pytest.fixture
def tmp_out(tmp_path):
    return str(tmp_path / "out")


def _ds(ray_session, n=1000, parts=8):
    import ray.data as rd

    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array((np.arange(n) * 7 % 100).astype(np.int64)),
    })
    ds = rd.from_arrow(t)
    return ds.map_batches(
        lambda b: C.assign_partitions(b, "k", parts), batch_format="pyarrow"
    )


def test_write_resume_skips_done(ray_session, tmp_out):
    ds = _ds(ray_session)
    m1 = C.checkpointed_write(ds, tmp_out, input_desc="t1").to_pandas()
    assert len(m1) == 8
    assert sorted(m1["partition_id"]) == list(range(8))
    assert m1["rows"].sum() == 1000
    files = sorted(f for f in os.listdir(tmp_out) if f.endswith(".parquet"))
    assert len(files) == 8

    # simulate partial failure: drop 3 manifest entries + files
    for pid in (1, 4, 6):
        os.remove(f"{tmp_out}/_manifest/{pid:05d}.json")
        os.remove(f"{tmp_out}/part-{pid:05d}.parquet")
    assert C.completed_partitions(tmp_out) == {0, 2, 3, 5, 7}

    ds2 = _ds(ray_session)
    m2 = C.checkpointed_write(ds2, tmp_out, input_desc="t1").to_pandas()
    assert sorted(m2["partition_id"]) == [1, 4, 6]  # only missing work re-ran
    assert C.completed_partitions(tmp_out) == set(range(8))


def test_rerun_is_idempotent(ray_session, tmp_out):
    ds = _ds(ray_session)
    m1 = C.checkpointed_write(ds, tmp_out).to_pandas()
    # full rerun: nothing left to do
    m2 = C.checkpointed_write(_ds(ray_session), tmp_out).to_pandas()
    assert len(m2) == 0
    # checksums stable across independent runs
    shutil.rmtree(tmp_out)
    m3 = C.checkpointed_write(_ds(ray_session), tmp_out).to_pandas()
    a = m1.sort_values("partition_id")["checksum"].tolist()
    b = m3.sort_values("partition_id")["checksum"].tolist()
    assert a == b


def test_manifest_lineage_fields(ray_session, tmp_out):
    C.checkpointed_write(_ds(ray_session), tmp_out, input_desc="corpus@sf0.001").to_pandas()
    with open(f"{tmp_out}/_manifest/00000.json") as f:
        m = json.load(f)
    assert set(m) == {"partition_id", "rows", "bytes", "checksum", "input"}
    assert m["input"] == "corpus@sf0.001"
    assert m["bytes"] > 0
    with open(f"{tmp_out}/_metrics/00000.json") as f:
        x = json.load(f)
    assert set(x) == {"partition_id", "write_ms", "attempt", "host"}
    assert x["write_ms"] >= 0


def test_hilbert_partition_ranges():
    from geotrellis_server_ray.functions import cells

    n = 1 << 6
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    h = cells.hilbert_key(xx.ravel(), yy.ravel(), 6)
    t = pa.table({"h": pa.array(h.astype(np.uint64))})
    out = C.hilbert_partition(t, "h", bits=6, num_partitions=16)
    pid = out.column("partition_id").to_numpy(zero_copy_only=False)
    # ranges are contiguous on the curve -> equal-sized partitions
    counts = np.bincount(pid, minlength=16)
    assert (counts == n * n // 16).all()
    # and spatially local: each partition's bbox is much smaller than the grid
    for p in range(16):
        sel = pid == p
        w = xx.ravel()[sel].max() - xx.ravel()[sel].min()
        hgt = yy.ravel()[sel].max() - yy.ravel()[sel].min()
        assert w <= n // 2 and hgt <= n // 2


def test_salted_counts_match_plain(ray_session):
    import ray.data as rd

    from geotrellis_server_ray.stages.salting import salted_counts

    rng = np.random.default_rng(5)
    keys = np.concatenate([np.zeros(5000, dtype=np.int64), rng.integers(1, 50, 1000)])
    ids = np.arange(len(keys), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"cell_id": pa.array(keys), "doc_id": pa.array(ids)}))
    out = salted_counts(ds, ["cell_id"], id_col="doc_id", num_salts=8).to_pandas()
    want = pd.Series(keys).value_counts().sort_index()
    got = out.sort_values("cell_id").set_index("cell_id")["n"]
    assert got.loc[0] == 5000
    assert (got.values == want.values).all()


def test_assign_partitions_covers_large_counts():
    import pyarrow as pa

    t = pa.table({"k": pa.array(np.arange(500_000, dtype=np.int64))})
    out = C.assign_partitions(t, "k", 200_000)
    pid = out.column("partition_id").to_numpy(zero_copy_only=False)
    assert pid.max() > 65_536  # full 64-bit hash reaches every partition range
    assert pid.min() >= 0 and pid.max() < 200_000


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    """Two-pass MG heavy hitters == exact GROUP BY/HAVING, on an adversarial
    layout: one truly-heavy key spread THIN across every block (so a naive
    per-block top-k would drop it everywhere) among per-block-dominant
    noise keys."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.salting import heavy_hitters, mg_compress

    rng = np.random.default_rng(9)
    blocks = []
    HEAVY = 777
    for bi in range(16):
        # per-block: a local dominator (unique per block) + noise + a thin
        # slice of the global heavy key
        local = np.full(400, 10_000 + bi, dtype=np.int64)
        noise = rng.integers(0, 5000, 500, dtype=np.int64)
        heavy = np.full(60, HEAVY, dtype=np.int64)  # 60/960 per block
        blocks.append(np.concatenate([local, noise, heavy]))
    allv = np.concatenate(blocks)
    ds = rd.from_arrow(pa.table({"k": pa.array(allv)})).repartition(16)

    support = 0.02
    out = heavy_hitters(ds, "k", support=support).to_pandas()
    vals, cnts = np.unique(allv, return_counts=True)
    want = {int(v): int(c) for v, c in zip(vals, cnts) if c > support * len(allv)}
    got = dict(zip(out["k"].astype(int), out["n"].astype(int)))
    assert got == want
    assert HEAVY in got  # the thin-spread global heavy key survives
    # and the summary really is bounded: compression keeps <= k entries
    ku, cu = mg_compress(vals, cnts.astype(np.int64), 10)
    assert len(ku) <= 10


def test_derive_salt_measures_load(ray_session):
    """Auto-salt (VERDICT r4 next #4): a key space of ~P keys with uniform
    load gets >1 lanes (hash-binning balance), a single mega-hot key gets
    lanes proportional to its measured share, and an already-wide balanced
    key space gets salt=1 — all from the heavy-hitter pre-pass, no
    hand-set constants."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.salting import derive_salt

    P = 16
    # ~P uniform keys: each carries total/P > lane target total/(8P) -> 8 lanes
    few = rd.from_arrow(pa.table(
        {"k": pa.array(np.arange(16_000, dtype=np.int64) % P)})).repartition(8)
    assert derive_salt(few, "k", num_partitions=P) == 8

    # one key holds half the rows among 4P others -> salt ~ half / lane target
    hot = np.concatenate([np.full(8_000, 7, np.int64),
                          np.arange(8_000, dtype=np.int64) % (4 * P) + 100])
    ds_hot = rd.from_arrow(pa.table({"k": pa.array(hot)})).repartition(8)
    s = derive_salt(ds_hot, "k", num_partitions=P)
    assert s == 64  # 8000/16000 share vs 1/(8*16) lane target = 64 lanes

    # wide balanced key space: nothing exceeds the lane target -> no salting
    wide = rd.from_arrow(pa.table(
        {"k": pa.array(np.arange(20_000, dtype=np.int64))})).repartition(8)
    assert derive_salt(wide, "k", num_partitions=P) == 1
