"""Distributed prefix scan (stages/scan.py): exclusive running sums and
fixed-capacity sequence packing, checked against a single-machine numpy
replay on shuffled multi-block inputs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from geotrellis_server_ray.stages.scan import pack_sequences, prefix_sum


def _corpus(n=1000, seed=7, nblocks=9):
    rng = np.random.default_rng(seed)
    order = rng.permutation(n * 3)[:n].astype(np.int64)  # unique, gappy
    val = rng.integers(0, 500, n).astype(np.int64)
    t = pa.table({"k": order, "v": val})
    ds = rd.from_arrow(t).repartition(nblocks)
    return ds, order, val


def _expected_prev(order, val):
    ix = np.argsort(order, kind="stable")
    run = np.zeros(len(val) + 1, np.int64)
    np.cumsum(val[ix], out=run[1:])
    prev = np.empty(len(val), np.int64)
    prev[ix] = run[:-1]
    return prev


def test_prefix_sum_matches_numpy(ray_session):
    ds, order, val = _corpus()
    out = prefix_sum(ds, "k", "v", num_partitions=5).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    exp = _expected_prev(order, val)
    ix = np.argsort(order, kind="stable")
    assert np.array_equal(out["prev"].to_numpy(), exp[ix])
    assert np.array_equal(out["v"].to_numpy(), val[ix])


def test_prefix_sum_single_partition(ray_session):
    ds, order, val = _corpus(n=64, nblocks=2)
    out = prefix_sum(ds, "k", "v", num_partitions=1).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    ix = np.argsort(order, kind="stable")
    assert np.array_equal(out["prev"].to_numpy(), _expected_prev(order, val)[ix])


def test_pack_sequences_layout(ray_session):
    ds, order, val = _corpus(n=400, seed=11)
    cap = 777
    out = pack_sequences(ds, "k", "v", cap, num_partitions=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    prev = _expected_prev(order, val)
    ix = np.argsort(order, kind="stable")
    assert np.array_equal(out["seq_id"].to_numpy(), prev[ix] // cap)
    assert np.array_equal(out["seq_offset"].to_numpy(), prev[ix] % cap)
    # packing invariant: sequence ids are contiguous from 0 and every
    # non-final sequence is filled exactly to capacity by its successor's
    # start (concatenate-then-chunk: offset + value spans the boundary).
    total = int(val.sum())
    assert out["seq_id"].max() == (total - 1) // cap if total else True


def test_keyed_prefix_sum_skewed_key(ray_session):
    """Keyed scan: independent running sums per key, exact under heavy key
    skew (one key holds 90% of rows) because partitioning follows the ORDER
    column, not the key. Verified against a serial per-key replay."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.scan import prefix_sum

    rng = np.random.RandomState(7)
    n = 5000
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)                       # rows arrive in scrambled order
    key = np.where(rng.rand(n) < 0.9, "big", "small")
    val = rng.randint(1, 100, n).astype(np.int64)
    t = pa.table({"o": pa.array(order), "k": pa.array(key), "v": pa.array(val)})

    out = prefix_sum(rd.from_arrow(t), "o", "v", out_col="prev",
                     key_col="k", num_partitions=7).to_pandas()
    out = out.sort_values("o").reset_index(drop=True)

    # serial replay
    import collections
    run = collections.Counter()
    ix = np.argsort(order, kind="stable")
    want = np.empty(n, np.int64)
    for i in ix:
        want[i] = run[key[i]]
        run[key[i]] += val[i]
    got = out.set_index("o")["prev"]
    o_sorted = np.sort(order)
    assert (got.loc[o_sorted].to_numpy() ==
            want[np.argsort(order, kind="stable")]).all()


def test_grouped_exact_quantiles_random(ray_session):
    """Grouped counting selection == the serial rank definition
    (ceil(q*n)-th smallest per group) on random ints with heavy ties and a
    singleton group."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.quantiles import grouped_exact_quantiles

    rng = np.random.RandomState(3)
    grp = np.repeat(["a", "b", "c"], [700, 300, 1])
    val = np.concatenate([rng.randint(0, 50, 700),      # heavy ties
                          rng.randint(-10**9, 10**9, 300),
                          [42]]).astype(np.int64)
    t = pa.table({"g": pa.array(grp), "v": pa.array(val)})
    out = grouped_exact_quantiles(rd.from_arrow(t).repartition(5), "g", "v",
                                  {"p50": 0.5, "p90": 0.9}).to_pandas()
    got = {(r.grp, r.q_label): r.value for r in out.itertuples()}
    for g in ("a", "b", "c"):
        x = np.sort(val[grp == g])
        for lbl, q in (("p50", 0.5), ("p90", 0.9)):
            want = int(x[int(math.ceil(q * len(x))) - 1])
            assert got[(g, lbl)] == want, (g, lbl)


def test_exact_quantiles_full_int64_domain(ray_session):
    """Regression (r3 ADVICE): value ranges wider than ~2^51 wrapped the
    multiply-first bucket id ((x-lo)*NB) in int64.  Division-first bucketing
    with uint64 wraparound offsets must stay exact over the FULL int64
    domain, including ranges spanning both sign halves."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.quantiles import exact_quantiles

    rng = np.random.RandomState(7)
    val = np.concatenate([
        np.array([-2**63, 2**63 - 1, -2**62, 2**62, 0, 1, -1], np.int64),
        rng.randint(-2**62, 2**62, 500, dtype=np.int64),
    ])
    t = pa.table({"v": pa.array(val)})
    out = exact_quantiles(rd.from_arrow(t).repartition(4), "v",
                          {"p01": 0.01, "p50": 0.5, "p99": 0.99}).to_pandas()
    got = dict(zip(out["q_label"], out["value"]))
    x = np.sort(val)
    for lbl, q in (("p01", 0.01), ("p50", 0.5), ("p99", 0.99)):
        want = int(x[int(math.ceil(q * len(x))) - 1])
        assert got[lbl] == want, (lbl, got[lbl], want)
