#!/usr/bin/env python
"""Benchmark harness: headline tile-assignment + PIP-join throughput
(docs/sec) plus per-query wall times over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "flagship_tile_pip_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs": N, "docs_per_sec": N}

--scaling runs the headline job in two fresh subprocesses (8 and 32 cpus, or
$RAY_GRAFT_SCALE_LO/HI) on the same input and reports throughput at both plus
efficiency = (t_lo / t_hi) / (cpus_hi / cpus_lo) — the sandbox evidence
protocol for the N vs 4N cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# corpus replication for the headline job: sized so the run measures compute,
# not session startup (~200k docs/replica-set at sf0.1)
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "1024"))
BENCH_QUERIES = os.environ.get("GRAFT_BENCH_QUERIES", "1") == "1"


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from geotrellis_server_ray.pipelines import geo
    from geotrellis_server_ray.pipelines.registry import queries

    # setup (untimed): materialize the corpus to parquet once — the real
    # engine reads an existing interleaved table from storage — and warm the
    # Ray worker pool + page cache with one small pipeline.
    import pyarrow.parquet as pq

    from geotrellis_server_ray.sources.corpus import materialize_corpus

    n_seed_docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"]).num_rows
    n_docs = n_seed_docs * REPEAT
    corpus_path = materialize_corpus(SF_DIR, REPEAT)
    geo.pip_joined(SF_DIR, corpus_path=corpus_path).count()  # warm (same job)

    def time_flagship() -> tuple[float, int]:
        t0 = time.perf_counter()
        joined = geo.pip_joined(SF_DIR, corpus_path=corpus_path)
        n = joined.count()
        return time.perf_counter() - t0, n

    headline = float("inf")
    for _ in range(2):
        dt, n_join_rows = time_flagship()
        headline = min(headline, dt)

    def summary(h: float) -> dict:
        return {
            "metric": "flagship_tile_pip_sec",
            "value": round(h, 3),
            "unit": "sec",
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs": n_docs,
            "join_rows": n_join_rows,
            "docs_per_sec": round(n_docs / h, 1),
        }

    # flagship summary FIRST (r3 VERDICT next #4: the driver's tail capture
    # truncated the head of the single long metric line; this short line is
    # un-truncatable insurance and the final line below is now compact)
    print(json.dumps(summary(headline), separators=(",", ":")), flush=True)

    qtimes = {}
    if BENCH_QUERIES:
        # two interleaved passes, per-query min: the shared host steals CPU
        # in tens-of-seconds bursts, so consecutive reruns of one query are
        # correlated but the same query across two full passes is not —
        # interleaving is the noise-robust shape at the same 2x cost. The
        # FLAGSHIP measurement interleaves with the passes too (r3's
        # back-to-back pair gave the round-over-round driver regression).
        for _pass in range(int(os.environ.get("GRAFT_BENCH_PASSES", "2"))):
            for name, fn in queries().items():
                t = time.perf_counter()
                _consume(fn(SF_DIR))
                dt = round(time.perf_counter() - t, 3)
                qtimes[name] = min(qtimes.get(name, float("inf")), dt)
            dt, _ = time_flagship()
            headline = min(headline, dt)

    out = {**summary(headline), "queries": qtimes}
    ray.shutdown()
    return out


def run_query_child(name: str) -> dict:
    """Child mode for --scaling-query: time ONE registry query (warm + best
    of 2) in this process's fresh Ray session. The per-query twin of the
    flagship child — used to evidence scaling on shuffle-heavy pipelines,
    not just the exchange-free headline job."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from geotrellis_server_ray.pipelines.registry import queries

    fn = queries()[name]
    _consume(fn(SF_DIR))  # warm (worker pool + page cache)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n = _consume(fn(SF_DIR))
        best = min(best, time.perf_counter() - t0)
    out = {"metric": f"query_bench:{name}", "value": round(best, 3),
           "unit": "sec", "rows": n, "sf": SF_DIR, "num_cpus": NUM_CPUS}
    ray.shutdown()
    return out


def run_scaling(query: str = "") -> dict:
    # Default N=2 vs 4N=8: this VM advertises 32 vCPUs but a multiprocessing
    # busy-loop capacity probe measures only ~17 effective cores (host
    # oversubscription; see BASELINE.md for the full 2/4/8/16/32 ladder), so
    # pairs above 8 measure the host's ceiling, not the engine. 2-vs-8 keeps
    # both levels inside the linear hardware region.
    lo = int(os.environ.get("RAY_GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("RAY_GRAFT_SCALE_HI", "8"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_QUERIES="0")
        if query:  # child dispatches on the PRIVATE marker, set only here —
            env["_GRAFT_SCALE_QUERY_CHILD"] = query  # never via os.environ
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    run(lo)  # warm-up (page cache + spawn overheads), untimed
    # best-of-2 per level: the shared host's background load adds multi-second
    # noise; min is the least-contended estimate of the job's true cost
    r_lo = min(run(lo), run(lo), key=lambda r: r["value"])
    r_hi = min(run(hi), run(hi), key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
    }
    if query:
        out["query"] = query
    for k in ("docs", "docs_per_sec"):
        if k in r_lo:
            out[k + ("_lo" if k.endswith("sec") else "")] = r_lo[k]
    if "docs_per_sec" in r_hi:
        out["docs_per_sec_hi"] = r_hi["docs_per_sec"]
    return out


def run_cc() -> dict:
    """Force-exercise the DISTRIBUTED connected-components path
    (small_edge_threshold=0 — no driver union-find) on a scaled edge list:
    the 64x-minhash near-dup shape (16,384 pair components) PLUS long-chain
    components (the pointer-doubling worst case: diameter >> 1). Records
    rounds-to-convergence and wall time (VERDICT r2 next #9)."""
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from geotrellis_server_ray.stages.dedup import connected_components

    N_PAIRS = 16_384          # the 64x-corpus verified-pair count (BASELINE.md)
    CHAINS, CHAIN_LEN = 16, 4_096
    pair_a = np.arange(N_PAIRS, dtype=np.int64) * 2
    pair_b = pair_a + 1
    base = np.int64(10_000_000)
    chain_ids = base + np.arange(CHAINS * CHAIN_LEN, dtype=np.int64)
    cm = chain_ids.reshape(CHAINS, CHAIN_LEN)
    edges = pa.table({
        "id_a": pa.array(np.concatenate([pair_a, cm[:, :-1].ravel()])),
        "id_b": pa.array(np.concatenate([pair_b, cm[:, 1:].ravel()])),
    })
    nodes = pa.table({"doc_id": pa.array(np.concatenate([pair_a, pair_b, chain_ids]))})
    edges_ds = rd.from_arrow(edges).repartition(NUM_CPUS)
    nodes_ds = rd.from_arrow(nodes).repartition(NUM_CPUS)

    stats: dict = {}
    t0 = time.perf_counter()
    labels = connected_components(edges_ds, nodes_ds, small_edge_threshold=0,
                                  stats_out=stats)
    df = labels.to_pandas()
    wall = time.perf_counter() - t0

    # correctness: every pair collapses to its even member, every chain to
    # its first id; total distinct reps == N_PAIRS + CHAINS
    got = df.set_index("doc_id")["cluster_rep"]
    ok = (int(got.nunique()) == N_PAIRS + CHAINS
          and bool((got.loc[pair_b].to_numpy() == pair_a).all())
          and bool((got.loc[cm[:, -1]].to_numpy() == cm[:, 0]).all()))
    out = {
        "metric": "cc_distributed",
        "edges": int(len(edges)) * 2,  # symmetric
        "nodes": int(len(nodes)),
        "max_diameter": CHAIN_LEN,
        "rounds": stats.get("rounds"),
        "plan": stats.get("plan"),
        "sec": round(wall, 3),
        "correct": ok,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_interval_scale() -> dict:
    """Range-join exchange at scale (r3 VERDICT next #6): interval_join /
    interval_agg over 1x/4x/16x/64x replicated event corpora against the
    sf0.1 window set, recording wall time, emission counts, and the sizing
    model's candidate estimate (sum over buckets of events_b x replicas_b).
    Exact-copy replicas: every count must scale LINEARLY in the factor —
    the bounded-replication exchange has no superlinear term in the event
    side. The pair-materializing join runs to 4x (the pair stream itself is
    the output and grows linearly: ~82M rows at 4x); the agg pushdown —
    which never materializes pairs — carries the 16x and 64x points."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from geotrellis_server_ray.pipelines.registry import (IVJ_MOD, _DAY_US,
                                                          _EPOCH_2024,
                                                          add_cents)
    from geotrellis_server_ray.stages.windows import interval_agg, interval_join

    ev_tbl = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts", "value"])
    ok = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"]) \
        .column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    ok = ok[ok % IVJ_MOD == 0]
    s_us = _EPOCH_2024 + (ok % 25) * _DAY_US
    e_us = s_us + (ok % 7 + 1) * _DAY_US
    iv_tbl = pa.table({"o_orderkey": pa.array(ok),
                       "s": pa.array(s_us.astype("datetime64[us]")),
                       "e": pa.array(e_us.astype("datetime64[us]"))})
    BUCKET = _DAY_US

    # sizing model: per-bucket event counts x per-bucket replica counts
    ts_us = ev_tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    evb = np.bincount(ts_us // BUCKET - (ts_us // BUCKET).min())
    first = s_us // BUCKET
    last = np.maximum(e_us - 1, s_us) // BUCKET
    rep_b = np.zeros(len(evb) + 64, np.int64)
    base = (ts_us // BUCKET).min()
    for f0, l0 in zip(first - base, last - base):
        rep_b[max(f0, 0):l0 + 1] += 1
    cand_1x = int((evb * rep_b[:len(evb)]).sum())

    from functools import partial

    def replicated(f: int):
        reps = [ev_tbl] * f
        ds = rd.from_arrow(pa.concat_tables(reps)).repartition(NUM_CPUS * 2)
        return ds.map_batches(partial(add_cents, cols={"cents": "value"}),
                              batch_format="pyarrow").materialize()

    out = {"metric": "interval_scale", "sf": SF_DIR, "num_cpus": NUM_CPUS,
           "bucket_days": 1, "intervals": len(ok), "events_1x": len(ev_tbl),
           "candidates_model_1x": cand_1x, "join": {}, "agg": {}}
    for f in (1, 4):
        iv = rd.from_arrow(iv_tbl)
        t0 = time.perf_counter()
        n = interval_join(replicated(f), iv, "ts", "s", "e", BUCKET).count()
        out["join"][str(f)] = {"pairs": n, "sec": round(time.perf_counter() - t0, 2),
                               "candidates_model": cand_1x * f}
    for f in (1, 16, 64):
        iv = rd.from_arrow(iv_tbl)
        t0 = time.perf_counter()
        n = interval_agg(replicated(f), iv, "ts", "s", "e", "cents",
                         "o_orderkey", BUCKET).count()
        out["agg"][str(f)] = {"windows": n, "sec": round(time.perf_counter() - t0, 2),
                              "candidates_model": cand_1x * f}
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--interval-scale" in sys.argv:
        print(json.dumps(run_interval_scale()))
    elif "--scaling-query" in sys.argv:
        print(json.dumps(run_scaling(sys.argv[sys.argv.index("--scaling-query") + 1])))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--cc" in sys.argv:
        print(json.dumps(run_cc()))
    elif os.environ.get("_GRAFT_SCALE_QUERY_CHILD"):
        print(json.dumps(run_query_child(os.environ["_GRAFT_SCALE_QUERY_CHILD"])))
    else:
        # The driver keeps only the LAST ~2000 bytes of stdout and parses the
        # final JSON line. The full per-query record (~2.6 KB) cannot fit, so
        # print it FIRST (for humans / BASELINE.md) and end with a compact
        # summary line guaranteed under the tail window (r4 VERDICT next #1).
        out = run_bench()
        print(json.dumps(out, separators=(",", ":")), flush=True)
        q = out.pop("queries", {}) or {}
        out["queries_total_sec"] = round(sum(q.values()), 2)
        out["queries_n"] = len(q)
        # fold in the slowest queries while the line stays < 1500 bytes
        slowest = {}
        for name, sec in sorted(q.items(), key=lambda kv: -kv[1]):
            trial = dict(out, slowest={**slowest, name: sec})
            if len(json.dumps(trial, separators=(",", ":"))) > 1500:
                break
            slowest[name] = sec
        if slowest:
            out["slowest"] = slowest
        print(json.dumps(out, separators=(",", ":")), flush=True)
