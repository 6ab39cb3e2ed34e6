"""Unit tests: k-means kernels (stages/cluster.py), vocabulary/repetition
text kernels, stratified-sample threshold arithmetic."""

import numpy as np
import pyarrow as pa

from geotrellis_server_ray.stages import cluster as CL
from geotrellis_server_ray.stages import text as T


def _emb_batch(vecs, ids=None):
    ids = list(range(len(vecs))) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def test_quantize_exact_lattice():
    b = _emb_batch([[0.5, -0.25], [1.0, 0.0]])
    _, V = CL.quantize_batch(b)
    assert V.tolist() == [[524288, -262144], [1048576, 0]]


def test_nearest_cluster_first_min_tiebreak():
    V = np.array([[0, 0]], np.int64)
    cent = np.array([[2, 0], [0, 2], [5, 5]], np.int64)  # clusters 0,1 tie
    assert CL.nearest_cluster(V, cent).tolist() == [0]


def test_partial_sums_additive_across_splits():
    vecs = [[float(i), float(-i)] for i in range(10)]
    whole = CL.partial_sums_batch(_emb_batch(vecs), np.array([[0, 0], [9 << 20, 0]], np.int64))
    a = CL.partial_sums_batch(_emb_batch(vecs[:4]), np.array([[0, 0], [9 << 20, 0]], np.int64))
    b = CL.partial_sums_batch(_emb_batch(vecs[4:], ids=list(range(4, 10))),
                              np.array([[0, 0], [9 << 20, 0]], np.int64))
    merged = pa.concat_tables([a, b]).group_by(["cluster", "dim"]) \
        .aggregate([("s", "sum"), ("n", "sum")]).sort_by([("cluster", "ascending"), ("dim", "ascending")])
    w = whole.sort_by([("cluster", "ascending"), ("dim", "ascending")])
    assert merged.column("s_sum").to_pylist() == w.column("s").to_pylist()
    assert merged.column("n_sum").to_pylist() == w.column("n").to_pylist()


def test_update_centroids_keeps_empty_cluster():
    cent = np.array([[10, 10], [99, 99]], np.int64)
    rows = [{"cluster": 0, "dim": 0, "s": 7, "n": 2},
            {"cluster": 0, "dim": 1, "s": -7, "n": 2}]
    out = CL.update_centroids(rows, cent)
    assert out.tolist() == [[3, -4], [99, 99]]  # floor(7/2)=3, floor(-7/2)=-4


def test_vocab_partials_df_tf():
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b a", "b  b"])})
    out = T.vocab_df_partial_batch(b).sort_by("token")
    assert out.column("token").to_pylist() == ["a", "b"]
    assert out.column("df").to_pylist() == [1, 2]
    assert out.column("tf").to_pylist() == [2, 3]


def test_repetition_ppm_and_keep():
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["x x x x x x x x x y",  # 9/10 repeated
                                    "a b c d e f g h i j"])})
    out = T.repetition_batch(b)
    assert out.column("top_ppm").to_pylist() == [900000, 100000]
    assert out.column("keep").to_pylist() == [0, 0]  # 100000 is NOT < 100000
    b2 = pa.table({"doc_id": pa.array([3], pa.int64()),
                   "text": pa.array(["a b c d e f g h i j k"])})
    assert T.repetition_batch(b2).column("keep").to_pylist() == [1]


def test_stratified_threshold_exact_bigint():
    from geotrellis_server_ray.pipelines.registry import STRAT_CAP

    # count <= cap => threshold >= 2^31 => every 31-bit hash survives
    assert (STRAT_CAP << 31) // STRAT_CAP == 1 << 31
    # huge stratum: threshold stays exact (no float), monotone in count
    t1 = (STRAT_CAP << 31) // (10**12)
    t2 = (STRAT_CAP << 31) // (10**12 + 1)
    assert t2 <= t1 < 1 << 31


def test_splitmix64_reference_vector():
    """Known splitmix64 output for seed 0 (Steele/Lea/Flood reference)."""
    from geotrellis_server_ray.stages import sketch as SK

    assert int(SK.mix64(np.array([0]))[0]) == 0xE220A8397B1DCDAF


def test_hll_partial_merge_equals_whole():
    from geotrellis_server_ray.stages import sketch as SK

    xs = np.arange(50_000, dtype=np.int64)
    whole = SK.hll_partial_batch(pa.table({"k": pa.array(xs)}), "k")
    a = SK.hll_partial_batch(pa.table({"k": pa.array(xs[:20_000])}), "k")
    b = SK.hll_partial_batch(pa.table({"k": pa.array(xs[20_000:])}), "k")
    merged = pa.concat_tables([a, b]).group_by("bucket") \
        .aggregate([("reg", "max")]).sort_by("bucket")
    w = whole.sort_by("bucket")
    assert merged.column("bucket").to_pylist() == w.column("bucket").to_pylist()
    assert merged.column("reg_max").to_pylist() == w.column("reg").to_pylist()


def test_hll_estimate_within_bound():
    """1.04/sqrt(4096) ~ 1.6% standard error; assert < 3 sigma on three
    disjoint sequential ranges (the adversarial input for weak mixers)."""
    from geotrellis_server_ray.stages import sketch as SK

    for lo, n in [(0, 10_000), (10**9, 200_000), (7, 1_000_000)]:
        t = SK.hll_partial_batch(
            pa.table({"k": pa.array(np.arange(lo, lo + n, dtype=np.int64))}), "k")
        est = SK.hll_estimate(np.asarray(t.column("bucket")), np.asarray(t.column("reg")))
        assert abs(est / n - 1.0) < 0.05, (lo, n, est)


def test_bit_length_exact():
    from geotrellis_server_ray.stages.sketch import _bit_length

    vals = np.array([0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, 1 << 63], np.uint64)
    assert _bit_length(vals).tolist() == [0, 1, 2, 2, 3, 52, 53, 64]


def test_exact_quantiles_vs_numpy(ray_session):
    """Counting selection == the k-th smallest by direct sort, including
    duplicate-heavy and negative domains and ranks at both ends."""
    import ray.data as rd

    from geotrellis_server_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.integers(-50_000, 5_000_000, 20_000),
        np.full(5_000, 1234),           # heavy duplicate spike
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    qs = {"p01": 0.01, "p50": 0.5, "p99": 0.99, "max": 1.0}
    out = exact_quantiles(ds, "v", qs, len(vals))
    got = dict(zip(out.column("q_label").to_pylist(),
                   out.column("value").to_pylist()))
    sv = np.sort(vals)
    import math
    for lbl, q in qs.items():
        assert got[lbl] == int(sv[math.ceil(q * len(vals)) - 1]), lbl


def test_pagerank_paths_agree(ray_session, monkeypatch):
    """The broadcast-rank path and the corpus-scale join path compute
    identical integer ranks (forced via the node threshold)."""
    import geotrellis_server_ray.pipelines.registry as R

    sf = "/root/testdata/sf0.001"
    a = R.q_pagerank(sf)
    a = a.to_pandas() if not hasattr(a, "to_pandas") else a.to_pandas()
    monkeypatch.setattr(R, "PR_BROADCAST_NODES", 0)
    b = R.q_pagerank(sf).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert a.equals(b)


def test_tfidf_paths_agree(ray_session, monkeypatch):
    """The broadcast-vocab path and the corpus-scale join path emit the
    identical top-k rows (forced via the vocabulary threshold)."""
    import geotrellis_server_ray.pipelines.registry as R

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "rank"]
    a = R.q_tfidf_topk(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    monkeypatch.setattr(R, "TFIDF_VOCAB_BROADCAST", 0)
    b = R.q_tfidf_topk(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)


def test_bigram_lm_paths_agree(ray_session, monkeypatch):
    """The broadcast-model path and the corpus-scale join path emit the
    identical per-doc LM scores (forced via the model-size threshold)."""
    import geotrellis_server_ray.pipelines.registry as R

    sf = "/root/testdata/sf0.001"
    a = R.q_bigram_lm_score(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(R, "LM_MODEL_BROADCAST", 0)
    b = R.q_bigram_lm_score(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0 and a.equals(b[a.columns])


def test_cms_partials_merge_and_guarantee():
    """Count-Min partials are mergeable by cell-wise sum (two half-batches
    sum to the whole-batch sketch) and point estimates never undercount;
    for this small vocabulary heavy tokens estimate exactly."""
    import collections

    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import (
        cms_partial_batch, cms_point_estimate)

    texts = ["a b a c", "b b d", "a e a b", "f g a"]
    whole = cms_partial_batch(pa.table({"text": pa.array(texts)}))
    h1 = cms_partial_batch(pa.table({"text": pa.array(texts[:2])}))
    h2 = cms_partial_batch(pa.table({"text": pa.array(texts[2:])}))
    merged = pa.concat_tables([h1, h2]).group_by(["row", "col"]) \
        .aggregate([("n", "sum")]).rename_columns(["row", "col", "n"])
    a = whole.to_pandas().sort_values(["row", "col"]).reset_index(drop=True)
    b = merged.to_pandas().sort_values(["row", "col"]).reset_index(drop=True)
    assert a.equals(b[a.columns])

    true = collections.Counter(t for s in texts for t in s.split(" "))
    toks = sorted(true)
    est = cms_point_estimate(whole, toks)
    assert all(int(e) >= true[t] for e, t in zip(est, toks))
    assert int(est[toks.index("a")]) == true["a"]  # no collision at this size


def test_semantic_dedup_tau_boundary(ray_session):
    """The integer-lattice cosine test is exact at the tau boundary:
    v=[100,0...] vs [99,14,0...] has cos^2 = 9801/(9801+196)*... — craft
    pairs just above and just below tau=0.99 and check keep/drop, plus the
    negative-dot guard (antipodal vectors are never 'near')."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.registry import (
        SEM_QUANT, SEM_TAU_DEN, SEM_TAU_NUM)

    # replicate the in-cluster rule directly (the group kernel's math)
    def near(u, w):
        dot = int(np.dot(u, w)); n1 = int(np.dot(u, u)); n2 = int(np.dot(w, w))
        return dot > 0 and SEM_TAU_DEN * dot * dot >= SEM_TAU_NUM * n1 * n2

    base = np.zeros(64, np.int64); base[0] = 1000
    exact = base.copy()
    above = base.copy(); above[1] = 100   # cos = 1000/sqrt(1010000) ~ 0.99504
    below = base.copy(); below[1] = 200   # cos ~ 0.9806
    anti = -base
    assert near(base, exact)
    assert near(base, above)
    assert not near(base, below)
    assert not near(base, anti)          # dot < 0: never near, even |cos|=1


def test_bloom_no_false_negatives_and_merge():
    """Bloom membership never misses an inserted key; partials OR-merge to
    the whole-set filter; a disjoint key range shows FPs stay rare at this
    fill factor."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import (
        bloom_combine_batch, bloom_contains, bloom_merge_rows,
        bloom_partial_batch)

    keys = np.arange(0, 20_000, 7, dtype=np.int64)     # ~2.9k keys
    t = pa.table({"k": pa.array(keys)})
    whole = bloom_partial_batch(t, "k")
    h1 = bloom_partial_batch(pa.table({"k": pa.array(keys[:1000])}), "k")
    h2 = bloom_partial_batch(pa.table({"k": pa.array(keys[1000:])}), "k")
    merged = bloom_combine_batch(pa.concat_tables([h1, h2]))
    assert merged.to_pydict() == whole.to_pydict()

    words = bloom_merge_rows(whole.to_pylist())
    assert bloom_contains(keys, words).all()            # no false negatives
    probe = np.arange(1_000_000, 1_020_000, dtype=np.int64)  # disjoint
    fp = bloom_contains(probe, words).mean()
    assert fp < 0.05, fp                                # ~ (1-e^-kn/m)^k


def test_semantic_dedup_multiblock_cluster(ray_session, tmp_path):
    """A 3000-vector single-cluster-dominated corpus forces the blocked
    kernel through multiple 2048-column blocks; planted duplicate pairs
    straddle block boundaries and exactly the even-id originals survive."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import QUERIES

    rng = np.random.RandomState(11)
    n, d = 3000, 64
    E = rng.rand(n, d).astype(np.float32)
    E[1::2] = E[0::2]  # every odd vec duplicates its even predecessor
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(E.reshape(-1)), d).cast(pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    out = QUERIES["semantic_dedup"][0](str(tmp_path)).to_pandas()
    ids = set(out.vec_id)
    assert len(out) == n // 2
    assert all(i in ids for i in range(0, n, 2))
    assert not any(i in ids for i in range(1, n, 2))


def test_semi_anti_join_paths_agree(ray_session):
    """r3 VERDICT #2: the gated broadcast key-set path and the native hash
    left_semi/left_anti fallback emit identical rows (threshold forced via
    broadcast_limit=0), and both match a local NOT EXISTS / EXISTS replay."""
    import numpy as np
    import pyarrow.parquet as pq

    import geotrellis_server_ray.pipelines.registry as R

    sf = "/root/testdata/sf0.001"
    for q, kcol in ((R.q_customers_without_orders, "c_custkey"),
                    (R.q_parts_with_lineitems, "p_partkey")):
        a = q(sf).to_pandas().sort_values(kcol).reset_index(drop=True)
        b = q(sf, broadcast_limit=0).to_pandas() \
            .sort_values(kcol).reset_index(drop=True)
        assert len(a) > 0 and a.equals(b), q.__name__

    # local truth replay for the anti join
    orders = pq.read_table(f"{sf}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    cust = pq.read_table(f"{sf}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    recent = set(orders.loc[
        orders.o_orderdate >= np.datetime64("2000-01-01"), "o_custkey"])
    want = sorted(set(cust.c_custkey) - recent)
    got = sorted(R.q_customers_without_orders(sf).to_pandas().c_custkey)
    assert got == want


def test_semi_anti_join_empty_build(ray_session):
    """Review finding r4: an empty/fully-filtered build side is a legitimate
    input — anti keeps every probe row, semi keeps none (no crash)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.relational import semi_anti_join

    probe = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([10, 20, 30], pa.int64())})
    empty = pa.table({"bk": pa.array([], pa.int64())})
    anti = semi_anti_join(rd.from_arrow(probe), "k", rd.from_arrow(empty),
                          "bk", anti=True).to_pandas()
    semi = semi_anti_join(rd.from_arrow(probe), "k", rd.from_arrow(empty),
                          "bk", anti=False).to_pandas()
    assert sorted(anti.k) == [1, 2, 3] and len(semi) == 0


def test_semi_anti_join_null_build_keys(ray_session):
    """ADVICE r4: NULL build keys are ignored under EXISTS / NOT EXISTS
    semantics (SQL `IN (..., NULL)` aside — this is the EXISTS form) in
    BOTH the broadcast key-set path and the native hash fallback."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.relational import semi_anti_join

    probe = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([10, 20, 30], pa.int64())})
    build = pa.table({"bk": pa.array([2, None, None, 3], pa.int64())})
    for limit in (2_000_000, 0):  # broadcast path, then forced hash path
        semi = semi_anti_join(rd.from_arrow(probe), "k", rd.from_arrow(build),
                              "bk", anti=False, broadcast_limit=limit).to_pandas()
        anti = semi_anti_join(rd.from_arrow(probe), "k", rd.from_arrow(build),
                              "bk", anti=True, broadcast_limit=limit).to_pandas()
        assert sorted(semi.k) == [2, 3] and sorted(anti.k) == [1], limit


def test_kmv_partial_merge_equals_whole():
    """Splitting the key stream across blocks cannot change the sketch:
    merge(partials) == partial(whole). Idempotence too."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import kmv_merge, kmv_partial_batch

    keys = np.arange(10_000, dtype=np.int64) * 7919 % 4001  # dups galore
    whole = kmv_partial_batch(pa.table({"k": pa.array(keys)}), "k")
    parts = [kmv_partial_batch(pa.table({"k": pa.array(c)}), "k")
             for c in np.array_split(keys, 7)]
    merged = kmv_merge(pa.concat_tables(parts))
    assert merged.equals(whole)
    assert kmv_merge(merged).equals(whole)  # idempotent


def test_kmv_estimate_bound_and_exact_small():
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import (
        KMV_K, kmv_estimate, kmv_partial_batch)

    # fewer distinct keys than K: the sketch IS the distinct set
    small = kmv_partial_batch(
        pa.table({"k": pa.array(np.arange(100, dtype=np.int64) % 37)}), "k")
    assert len(small) == 37
    assert kmv_estimate(small.column("hi").to_numpy(),
                        small.column("lo").to_numpy()) == 37.0
    # large: relative error within 4/sqrt(k) of the true distinct count
    n = 50_000
    t = kmv_partial_batch(
        pa.table({"k": pa.array(np.arange(n, dtype=np.int64))}), "k")
    est = kmv_estimate(t.column("hi").to_numpy(), t.column("lo").to_numpy())
    assert abs(est - n) / n < 4 / np.sqrt(KMV_K)


def test_kmv_tagged_merge_flags_survive_block_splits():
    """A hash seen for A in one block and B in another must end with both
    flags — per-block truncation cannot lose a globally-surviving flag."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import (
        kmv_tagged_merge, kmv_tagged_partial)

    keys = np.arange(5_000, dtype=np.int64)
    whole = kmv_tagged_merge(kmv_tagged_partial(keys, keys))
    assert whole.column("in_a").to_pylist() == whole.column("in_b").to_pylist()
    # split so each key reaches A and B in DIFFERENT blocks
    parts = [kmv_tagged_partial(keys[: 2_500], keys[2_500:]),
             kmv_tagged_partial(keys[2_500:], keys[: 2_500])]
    merged = kmv_tagged_merge(pa.concat_tables(parts))
    assert merged.equals(whole)
    assert kmv_tagged_merge(merged).equals(whole)  # idempotent


def test_bm25_paths_agree_and_hand_scores(ray_session, monkeypatch):
    """The BM25 broadcast path and the corpus-scale join path emit
    identical top-k rows (forced via the vocab threshold), and the
    integer-exact score chain matches a hand replay of the spec'd floors
    on a tiny corpus."""
    import numpy as np
    import pyarrow as pa

    import geotrellis_server_ray.pipelines.registry as R
    from geotrellis_server_ray.stages.text import _bm25_scores

    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "rank"]
    a = R.q_bm25_topk(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    monkeypatch.setattr(R, "BM25_VOCAB_BROADCAST", 0)
    b = R.q_bm25_topk(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)

    # hand replay: docs "a a b" (dl=3) and "a c" (dl=2); N=2, L=5
    # token a: df=2; b/c: df=1
    def hand(tf, df, dl, n, L):
        r_e3 = (1000 * dl * n) // L
        den_e3 = 1000 * tf + 300 + (900 * r_e3) // 1000
        tfp_e6 = (1_000_000 * 2200 * tf) // den_e3
        idf_e3 = (1000 * (2 * (n - df) + 1)) // (2 * df + 1)
        return (idf_e3 * tfp_e6) // 1000

    doc = np.array([0, 0, 1, 1], np.int64)
    tf = np.array([2, 1, 1, 1], np.int64)       # a, b | a, c
    df = np.array([2, 1, 1, 1], np.int64)
    dl = np.array([3, 3, 2, 2], np.int64)
    got = _bm25_scores(doc, tf, df, dl, 2, 5)
    want = [hand(*t, 2, 5) for t in zip(tf.tolist(), df.tolist(), dl.tolist())]
    assert got.tolist() == want
    # rarer token in the shorter doc outranks the common token
    assert hand(1, 1, 2, 2, 5) > hand(1, 2, 2, 2, 5)


def test_hdr_sketch_bounds_merge_and_quantiles():
    """HDR quantile sketch: bucket bounds contain their values, the bucket
    map is monotone, split-merge equals whole (order-invariant sum), and the
    diagnostic p50/p95/p99 reconstructions land within the 2^-m relative
    bound of the exact quantiles."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.sketch import (
        HDR_M, hdr_bucket, hdr_bucket_bounds, hdr_merge, hdr_partial_batch,
        hdr_quantile)

    rng = np.random.default_rng(7)
    # log-uniform-ish positive values spanning 7 orders of magnitude + zeros
    v = np.concatenate([
        np.zeros(100, np.int64),
        (10.0 ** rng.uniform(0, 7, 100_000)).astype(np.int64),
    ])
    b = hdr_bucket(v)
    lo, hi = hdr_bucket_bounds(b)
    assert np.all((lo <= v) & (v <= hi))
    sb = hdr_bucket(np.sort(v))
    assert np.all(np.diff(sb) >= 0)

    whole = hdr_partial_batch(pa.table({"v": pa.array(v)}), "v")
    parts = [hdr_partial_batch(pa.table({"v": pa.array(c)}), "v")
             for c in np.array_split(v, 9)]
    merged = hdr_merge(pa.concat_tables(parts))
    key = lambda t: t.to_pandas().sort_values("bucket").reset_index(drop=True)
    assert key(merged).equals(key(whole))

    buckets = whole.column("bucket").to_numpy()
    counts = whole.column("cnt").to_numpy().astype(np.int64)
    assert counts.sum() == len(v)
    for q in (0.5, 0.95, 0.99):
        est = hdr_quantile(buckets, counts, q)
        exact = float(np.quantile(v, q, method="inverted_cdf"))
        assert abs(est - exact) <= exact * 2.0 ** -HDR_M + 0.5, (q, est, exact)


def test_group_moments_match_numpy(ray_session, sf_correct):
    """The exact power-sum contract reconstructs the same skewness/kurtosis
    numpy computes directly on the raw column, per group."""
    import numpy as np
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import (moments_from_sums,
                                                          q_group_moments)

    df = q_group_moments(sf_correct).to_pandas().set_index("l_returnflag")
    raw = pq.read_table(f"{sf_correct}/lineitem.parquet",
                        columns=["l_returnflag", "l_quantity"]).to_pandas()
    for flag, g in raw.groupby("l_returnflag"):
        v = np.round(g.l_quantity.to_numpy()).astype(np.int64)
        r = df.loc[flag]
        d = moments_from_sums(int(r.n), int(r.s1), int(r.s2), int(r.s3), int(r.s4))
        assert int(r.n) == len(v)
        assert np.isclose(d["mean"], v.mean())
        assert np.isclose(d["var"], v.var())
        m = v.mean()
        sk = ((v - m) ** 3).mean() / v.std() ** 3
        ku = ((v - m) ** 4).mean() / v.var() ** 2 - 3.0
        assert np.isclose(d["skew"], sk, atol=1e-9)
        assert np.isclose(d["kurt"], ku, atol=1e-9)


def test_hll_grouped_estimates_and_merge(ray_session, sf_correct):
    """Grouped HLL register table: per-type estimates land within the
    standard HLL error band of the exact distinct counts, and the register
    contract equals a single-group HLL run per type."""
    import numpy as np
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import q_hll_grouped
    from geotrellis_server_ray.stages.sketch import hll_estimate

    df = q_hll_grouped(sf_correct).to_pandas()
    raw = pq.read_table(f"{sf_correct}/events.parquet",
                        columns=["user_id", "event_type"]).to_pandas()
    for etype, sub in df.groupby("event_type"):
        est = hll_estimate(sub.bucket.to_numpy(), sub.reg.to_numpy())
        exact = raw[raw.event_type == etype].user_id.nunique()
        assert abs(est - exact) <= max(0.08 * exact, 20), (etype, est, exact)


def test_hdr_grouped_per_source_quantiles(ray_session, sf_correct):
    """Grouped HDR: per-source p50/p95 reconstructions from the register
    table land within the 2^-m relative bound of exact quantiles."""
    import numpy as np
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import q_hdr_grouped
    from geotrellis_server_ray.stages.sketch import HDR_M, hdr_quantile

    df = q_hdr_grouped(sf_correct).to_pandas()
    raw = pq.read_table(f"{sf_correct}/documents.parquet",
                        columns=["source", "n_chars"]).to_pandas()
    for src, sub in df.groupby("source"):
        v = raw[raw.source == src].n_chars.to_numpy()
        assert sub.cnt.sum() == len(v)
        for q in (0.5, 0.95):
            est = hdr_quantile(sub.bucket.to_numpy(),
                               sub.cnt.to_numpy().astype(np.int64), q)
            exact = float(np.quantile(v, q, method="inverted_cdf"))
            assert abs(est - exact) <= exact * 2.0 ** -HDR_M + 0.5, \
                (src, q, est, exact)


def test_triangle_paths_agree(ray_session, sf_correct):
    """The gated driver fast path and the forced-distributed wedge/closing
    plan produce identical per-node triangle counts (the semi_anti_join /
    connected_components forced-threshold precedent), including on a dense
    known graph: K5 + a pendant edge = C(4,2)=6 triangles per K5 corner."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.registry import q_copurchase_triangles
    from geotrellis_server_ray.stages.graph import triangle_node_counts

    k = lambda d: d.sort_values("node").reset_index(drop=True)
    fast = k(q_copurchase_triangles(sf_correct).to_pandas())
    dist = k(q_copurchase_triangles(sf_correct,
                                    small_edge_threshold=0).to_pandas())
    assert fast.equals(dist)

    ia, ib = np.triu_indices(5, k=1)
    edges = pa.table({"a": pa.array(np.append(ia, 4).astype(np.int64)),
                      "b": pa.array(np.append(ib, 99).astype(np.int64))})
    for thr in (0, 1_000):
        out = k(triangle_node_counts(rd.from_arrow(edges), 4,
                                     small_edge_threshold=thr).to_pandas())
        assert list(out.node) == [0, 1, 2, 3, 4]
        assert list(out.n_tri) == [6, 6, 6, 6, 6], thr


def test_hll_sliding_trailing_week_estimates(ray_session, sf_correct):
    """Sliding-window HLL: per observed day, the trailing-7-day register
    table's estimate lands within the standard HLL band of the exact
    trailing-week distinct user count, and window registers equal the
    max-merge of the member days' tables."""
    import numpy as np
    import pyarrow.parquet as pq

    from geotrellis_server_ray.pipelines.registry import _DAY_US, q_hll_sliding
    from geotrellis_server_ray.stages.sketch import hll_estimate

    df = q_hll_sliding(sf_correct).to_pandas()
    raw = pq.read_table(f"{sf_correct}/events.parquet",
                        columns=["user_id", "ts"]).to_pandas()
    day = (raw.ts.astype("datetime64[us]").astype(np.int64) // _DAY_US)
    assert set(df.window_day) == set(day.unique())
    for w, sub in df.groupby("window_day"):
        exact = raw.user_id[(day >= w - 6) & (day <= w)].nunique()
        est = hll_estimate(sub.bucket.to_numpy(), sub.reg.to_numpy())
        assert abs(est - exact) <= max(0.08 * exact, 20), (w, est, exact)
