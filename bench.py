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

    # log_to_driver=False: raylet/worker warnings otherwise land on STDOUT
    # asynchronously and can trail the final JSON metric line out of the
    # driver's 2000-byte tail window (the BENCH parsed:null failure mode)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
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
            # two flagship samples per pass: host contention is bursty on a
            # tens-of-seconds scale, so spreading 4+ samples across the
            # session is the cheapest defense against a single bad window
            # (r5 observed 2.05 s contended vs 1.28 s clean, same plan)
            for _ in range(2):
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
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
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
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
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
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
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


def run_text_scale() -> dict:
    """Search-side text family + ExactSubstr 64x collapse datapoints
    (VERDICT r4 next #5 and #8): the sf0.1 documents table replicated 64x
    with per-replica token TAGS (every token of replica r gets the same
    2-char suffix; doc_id += r * 1e6) so replicas are structurally
    identical but share NO token and no >=40-char substring — the
    adversarial shape where any cross-replica leakage or driver-state
    collapse shows up as a count/byte mismatch, not just a slowdown.

    The tag is the SAME character twice, drawn from an alphabet disjoint
    from the documents' own (lowercase a-y + space): replica r's text is
    then a char-for-char substitution image of replica 0's, a doc char can
    never equal a tag char, and both tag chars agree with each other — so
    two equal-length raw-text spans are equal in replica r iff they are
    equal in replica r' (the ExactSubstr dup-window structure is exactly
    isomorphic across replicas, which is what the per-replica-totals
    assertion checks). Max token length is 8 << W-2, so every W-char
    window contains a full tag and no window repeats ACROSS replicas.

    Exactness checks (all asserted, reported in the JSON):
      * exact_substring_dedup: 64x output restricted to replica 0 is
        BYTE-identical to the 1x run (incl. scrubbed text); per-replica
        (dup windows, kept chars) totals identical across all 64 replicas.
      * inverted_index: 64x postings restricted to replica-0 tokens are
        byte-identical to 1x; total postings rows = 64 x 1x.
      * tfidf_topk: per-replica (rank, score) multisets identical across
        all 64 replicas (scores are N-dependent, so 1x comparison is by
        structure not bytes); rows = 64 x 1x."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from geotrellis_server_ray.pipelines.registry import (
        q_exact_substring_dedup, q_inverted_index, q_tfidf_topk)

    F, OFF = 64, 1_000_000
    base = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = base.column("text").to_pylist()

    # 64 distinct chars, none in the doc alphabet; digits first so the
    # replica-0 tag ("00") survives the tokenizer's lower() unchanged.
    tag_chars = ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                 "!#$%&()*+,-./:;<=>?@[]^_{|}~")
    assert len(tag_chars) >= F and len(set(tag_chars.lower())) == len(tag_chars)
    assert max(len(t) for s in texts for t in s.split(" ")) <= 38 - 2

    def tagged(r: int) -> pa.Table:
        tag = tag_chars[r] * 2
        return pa.table({
            "doc_id": pa.array(ids + r * OFF),
            "text": pa.array([" ".join(t + tag for t in s.split(" "))
                              for s in texts]),
        })

    d1 = "/tmp/gsr_text_scale/sf1x"
    d64 = "/tmp/gsr_text_scale/sf64x"
    for d in (d1, d64):
        os.makedirs(d, exist_ok=True)
    pq.write_table(tagged(0), f"{d1}/documents.parquet")
    pq.write_table(pa.concat_tables([tagged(r) for r in range(F)]),
                   f"{d64}/documents.parquet")

    out = {"metric": "text_scale", "sf": SF_DIR, "num_cpus": NUM_CPUS,
           "factor": F, "docs_1x": len(ids)}

    # --- ExactSubstr
    t0 = time.perf_counter()
    s1 = q_exact_substring_dedup(d1).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    t1x = time.perf_counter() - t0
    import pyarrow.compute as pc

    t0 = time.perf_counter()
    ds64m = q_exact_substring_dedup(d64).materialize()
    t64x = time.perf_counter() - t0
    meta = ds64m.map_batches(
        lambda b: b.select(["doc_id", "n_dup_windows", "n_chars_kept"]),
        batch_format="pyarrow").to_pandas()
    rep = meta["doc_id"] // OFF
    per = meta.groupby(rep).agg(w=("n_dup_windows", "sum"),
                                k=("n_chars_kept", "sum"))
    assert per["w"].nunique() == 1 and per["k"].nunique() == 1, \
        "replica totals diverge"
    r0 = ds64m.map_batches(
        lambda b: b.filter(pc.less(b.column("doc_id"), OFF)),
        batch_format="pyarrow").to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert r0.equals(s1), "replica-0 at 64x != 1x run (byte compare)"
    out["exact_substring"] = {
        "dup_windows_1x": int(s1["n_dup_windows"].sum()),
        "dup_windows_64x": int(meta["n_dup_windows"].sum()),
        "linear": int(meta["n_dup_windows"].sum())
                  == F * int(s1["n_dup_windows"].sum()),
        "replica0_byte_identical": True,
        "sec_1x": round(t1x, 2), "sec_64x": round(t64x, 2)}

    # --- inverted index
    t0 = time.perf_counter()
    ii1 = q_inverted_index(d1).to_pandas().sort_values("token") \
        .reset_index(drop=True)
    it1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    ii64 = q_inverted_index(d64).to_pandas()
    it64 = time.perf_counter() - t0
    tag0 = ii64[ii64["token"].str.endswith(tag_chars[0] * 2)] \
        .sort_values("token") \
        .reset_index(drop=True)
    assert tag0.equals(ii1), "tag-0 postings at 64x != 1x (byte compare)"
    assert len(ii64) == F * len(ii1), "postings rows not linear"
    out["inverted_index"] = {
        "postings_rows_1x": len(ii1), "postings_rows_64x": len(ii64),
        "linear": len(ii64) == F * len(ii1),
        "tag0_byte_identical": True,
        "sec_1x": round(it1, 2), "sec_64x": round(it64, 2)}

    # --- tfidf top-k
    t0 = time.perf_counter()
    tf1 = q_tfidf_topk(d1).to_pandas()
    tt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    tf64 = q_tfidf_topk(d64).to_pandas()
    tt64 = time.perf_counter() - t0
    assert len(tf64) == F * len(tf1), "tfidf rows not linear"
    g = tf64.assign(rep=tf64["doc_id"] // OFF,
                    base=tf64["doc_id"] % OFF,
                    tok=tf64["token"].str[:-2])
    sig = g.groupby("rep").apply(
        lambda d: hash(tuple(sorted(map(tuple,
            d[["base", "rank", "tok", "score_e6"]].values.tolist())))),
        include_groups=False)
    assert sig.nunique() == 1, "tfidf replica signatures diverge"
    out["tfidf_topk"] = {
        "rows_1x": len(tf1), "rows_64x": len(tf64),
        "linear": True, "replica_signatures_equal": True,
        "sec_1x": round(tt1, 2), "sec_64x": round(tt64, 2)}
    ray.shutdown()
    return out


def run_window_scale() -> dict:
    """Window/event family 64x collapse datapoint (the one operator family
    without a replica-collapse proof through r5): the sf0.1 events table
    replicated 64x with per-replica user/event id offsets — replicas are
    disjoint user populations with IDENTICAL event streams, so any
    cross-replica leakage through the user-hash exchange, any driver-state
    collapse, or any partition-boundary error shows up as a per-replica
    total mismatch or a replica-0 byte diff, not just a slowdown.

    Exactness checks (all asserted, reported in the JSON):
      * ewma_events: 64x output restricted to replica-0 users is
        byte-identical to the 1x run; per-replica ewma_num_c sums identical
        across all 64 replicas; rows exactly 64 x 1x.
      * funnel_stages: same three assertions on (user_id, stage) rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from geotrellis_server_ray.pipelines.registry import (
        q_ewma_events, q_funnel_stages)

    F, UOFF, EOFF = 64, 10_000_000, 100_000_000
    base = pq.read_table(f"{SF_DIR}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])
    uid = base.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    eid = base.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    assert uid.max() < UOFF and eid.max() < EOFF

    def shifted(r: int) -> pa.Table:
        return pa.table({
            "event_id": pa.array(eid + r * EOFF),
            "user_id": pa.array(uid + r * UOFF),
            "ts": base.column("ts"),
            "event_type": base.column("event_type"),
            "value": base.column("value"),
        })

    d1 = "/tmp/gsr_window_scale/sf1x"
    d64 = "/tmp/gsr_window_scale/sf64x"
    for d in (d1, d64):
        os.makedirs(d, exist_ok=True)
    pq.write_table(shifted(0), f"{d1}/events.parquet")
    pq.write_table(pa.concat_tables([shifted(r) for r in range(F)]),
                   f"{d64}/events.parquet")

    out = {"metric": "window_scale", "sf": SF_DIR, "num_cpus": NUM_CPUS,
           "factor": F, "events_1x": len(eid)}

    def check(name, qfn, id_col, val_col, sort_cols):
        t0 = time.perf_counter()
        a = qfn(d1).to_pandas().sort_values(sort_cols).reset_index(drop=True)
        t1x = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = qfn(d64).to_pandas()
        t64x = time.perf_counter() - t0
        assert len(b) == F * len(a), f"{name} rows not linear"
        rep = b[id_col] // UOFF
        per = b.groupby(rep)[val_col].sum()
        assert per.nunique() == 1, f"{name} replica totals diverge"
        r0 = b[b[id_col] < UOFF].sort_values(sort_cols).reset_index(drop=True)
        assert r0[a.columns].equals(a), f"{name} replica-0 at 64x != 1x"
        out[name] = {"rows_1x": len(a), "rows_64x": len(b), "linear": True,
                     "replica0_byte_identical": True,
                     "replica_totals_equal": True,
                     "sec_1x": round(t1x, 2), "sec_64x": round(t64x, 2)}

    check("ewma_events", q_ewma_events, "user_id", "ewma_num_c",
          ["user_id", "event_id"])
    check("funnel_stages", q_funnel_stages, "user_id", "stage", ["user_id"])
    ray.shutdown()
    return out


def run_graph_scale() -> dict:
    """Graph family 64x collapse datapoint (the last corpus-scaled exchange
    family without a replica-collapse proof): copurchase_triangles over the
    sf0.1 lineitem replicated 64x with per-replica order/part key offsets —
    replicas are DISJOINT co-purchase graphs with identical structure, so
    any cross-replica edge leakage through the pair/wedge exchanges, any
    min-support miscount, or any orientation error shows up as a
    per-replica triangle-total mismatch or a replica-0 byte diff.

    Exactness checks (all asserted): rows exactly 64 x 1x; 64x output
    restricted to replica-0 nodes byte-identical to the 1x run; per-replica
    n_tri totals identical across all 64 replicas."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from geotrellis_server_ray.pipelines.registry import q_copurchase_triangles

    F, OOFF, POFF = 64, 100_000_000, 1_000_000
    base = pq.read_table(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    ok = base.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    pk = base.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    # Random baskets barely survive min-support (1 triangle at sf0.1), which
    # would leave the wedge stage untested — inject 8 deterministic 24-part
    # clique orders per replica (each clique co-bought in TWO orders so every
    # pair passes TRI_MIN_SUP=2) through the SAME query path: 8 * C(24,3) =
    # 16,192 known triangles per replica on top of the organic one.
    NCLIQ, CSZ = 8, 24
    cl_ok, cl_pk = [], []
    for c in range(NCLIQ):
        parts = 900_000 + c * CSZ + np.arange(CSZ, dtype=np.int64)
        for rep in range(2):  # two identical orders -> pair support 2
            cl_ok.append(np.full(CSZ, 50_000_000 + c * 2 + rep, np.int64))
            cl_pk.append(parts)
    ok = np.concatenate([ok] + cl_ok)
    pk = np.concatenate([pk] + cl_pk)
    assert ok.max() < OOFF and pk.max() < POFF

    d1 = "/tmp/gsr_graph_scale/sf1x"
    d64 = "/tmp/gsr_graph_scale/sf64x"
    for d in (d1, d64):
        os.makedirs(d, exist_ok=True)

    def shifted(r: int) -> pa.Table:
        return pa.table({"l_orderkey": pa.array(ok + r * OOFF),
                         "l_partkey": pa.array(pk + r * POFF)})

    pq.write_table(shifted(0), f"{d1}/lineitem.parquet")
    pq.write_table(pa.concat_tables([shifted(r) for r in range(F)]),
                   f"{d64}/lineitem.parquet")

    # threshold=0 forces the DISTRIBUTED wedge/closing plan (the gated
    # driver fast path would otherwise absorb both runs — the --cc precedent)
    t0 = time.perf_counter()
    a = q_copurchase_triangles(d1, small_edge_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    t1x = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = q_copurchase_triangles(d64, small_edge_threshold=0).to_pandas()
    t64x = time.perf_counter() - t0

    assert len(b) == F * len(a), "rows not linear"
    rep = b.node // POFF
    per = b.groupby(rep).n_tri.sum()
    assert per.nunique() == 1, "replica triangle totals diverge"
    r0 = b[b.node < POFF].sort_values("node").reset_index(drop=True)
    assert r0[a.columns].equals(a), "replica-0 at 64x != 1x"

    out = {"metric": "graph_scale", "sf": SF_DIR, "num_cpus": NUM_CPUS,
           "factor": F, "lineitem_1x": len(ok),
           "nodes_1x": int(len(a)), "triangles_1x": int(a.n_tri.sum() // 3),
           "rows_64x": int(len(b)), "linear": True,
           "replica0_byte_identical": True, "replica_totals_equal": True,
           "sec_1x": round(t1x, 2), "sec_64x": round(t64x, 2)}
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--interval-scale" in sys.argv:
        print(json.dumps(run_interval_scale()))
    elif "--text-scale" in sys.argv:
        print(json.dumps(run_text_scale()))
    elif "--window-scale" in sys.argv:
        print(json.dumps(run_window_scale()))
    elif "--graph-scale" in sys.argv:
        print(json.dumps(run_graph_scale()))
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
