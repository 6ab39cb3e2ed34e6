"""Distributed cardinality sketching (HyperLogLog) with a fully replayable
integer contract: the register table — bucket -> max leading-zero rank — is
pure int64 arithmetic, so a SQL oracle lands on the IDENTICAL registers and
the correctness gate hash-matches a 4096-row table instead of trusting a
float estimate.

Scale shape: per-block partial registers (<= m rows per block regardless of
block size) + an elementwise-max combiner tree — the canonical mergeable
sketch. The corpus is never shuffled; only O(m x blocks) tiny rows move.

The 64-bit mixer is splitmix64 (Steele/Lea/Flood, public domain — the JDK
SplittableRandom finalizer): full avalanche, so leading-zero ranks of the
suffix follow the geometric law HLL needs even on SEQUENTIAL keys (a
multiply-only mixer is measurably biased there: +30-48% in our tests).
DuckDB's xor() is signed-BIGINT-only, but every xor-shift operand splits
into 32-bit halves that DO fit — the oracle replays each z ^ (z >> s) as two
half-width xors and each multiply with the split-mulmod identity the
passage-dedup oracle uses."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12                 # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
SM_GAMMA = 0x9E3779B97F4A7C15   # splitmix64 constants
SM_M1 = 0xBF58476D1CE4E5B9
SM_M2 = 0x94D049BB133111EB
_SUFFIX_BITS = 64 - HLL_P


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer of (x + gamma)."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(SM_M1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(SM_M2)
        return z ^ (z >> np.uint64(31))


def _bit_length(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (6-step binary search — no
    float log, which is not guaranteed correctly rounded)."""
    w = w.copy()
    out = np.zeros(w.shape, np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = w >= (np.uint64(1) << s)
        out[big] += shift
        w[big] >>= s
    out[w > 0] += 1
    return out


def hll_partial_batch(batch: pa.Table, key_col: str) -> pa.Table:
    """One block's partial registers: rows (bucket, reg) where
    bucket = top 12 bits of the mix, reg = leading-zero rank of the 52-bit
    suffix (suffix_bits - bit_length + 1; 53 for an all-zero suffix)."""
    x = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = mix64(x)
    bucket = (h >> np.uint64(_SUFFIX_BITS)).astype(np.int64)
    w = h & np.uint64((1 << _SUFFIX_BITS) - 1)
    rho = _SUFFIX_BITS - _bit_length(w) + 1
    t = pa.table({"bucket": pa.array(bucket), "reg": pa.array(rho)})
    g = t.group_by("bucket").aggregate([("reg", "max")])
    return g.rename_columns(["bucket", "reg"])


def hll_estimate(buckets: np.ndarray, regs: np.ndarray) -> float:
    """Classic HLL estimator with the small-range (linear counting)
    correction; diagnostic only — the correctness contract is the register
    table itself."""
    m = HLL_M
    full = np.zeros(m, np.int64)
    full[buckets] = regs
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(np.power(2.0, -full))
    zeros = int(np.sum(full == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ---- Count-Min sketch (Cormode & Muthukrishnan 2005) ------------------
# Same CORRECTNESS contract as the HLL above: the full integer cell table
# (row, col) -> count is the verified artifact; point estimates (min over
# rows) are diagnostic, with the classic one-sided guarantee est >= true.
CMS_D = 4                   # sketch depth (independent row hashes)
CMS_W_BITS = 10
CMS_W = 1 << CMS_W_BITS     # 1024 columns -> <= 4096 cells total
# Multiply-shift row hashes (Dietzfelbinger et al.): col_i = top W_BITS
# bits of (token_hash * C_i mod 2^64). Public odd constants (splitmix64 /
# xxhash primes).
CMS_ROW_C = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
             0x94D049BB133111EB, 0xC2B2AE3D27D4EB4F)


def cms_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block partial Count-Min sketch over token OCCURRENCES: hash every
    token once (the dedup polynomial), derive CMS_D columns by multiply-shift,
    and bincount into a dense D x W grid — one vectorized pass, no Python
    per-token work. Emits only nonzero cells ({row, col, n} int64), so a
    block's partial is <= 4096 rows no matter how many tokens it holds: the
    canonical mergeable sketch, combinable by plain cell-wise sum."""
    from .dedup import _token_hashes

    th, _ = _token_hashes(batch.column(text_col))
    grid = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    shift = np.uint64(64 - CMS_W_BITS)
    with np.errstate(over="ignore"):
        for i, c in enumerate(CMS_ROW_C):
            col = ((th * np.uint64(c)) >> shift).astype(np.int64)
            grid[i * CMS_W:(i + 1) * CMS_W] += np.bincount(col, minlength=CMS_W)
    nz = np.nonzero(grid)[0]
    return pa.table({"row": pa.array((nz // CMS_W).astype(np.int64)),
                     "col": pa.array((nz % CMS_W).astype(np.int64)),
                     "n": pa.array(grid[nz])})


def cms_point_estimate(cells: pa.Table, tokens: list[str]) -> np.ndarray:
    """min-over-rows point estimate for each token (diagnostic; the verified
    contract is the cell table itself)."""
    from .dedup import poly_hash_strings

    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    grid[cells.column("row").to_numpy(zero_copy_only=False),
         cells.column("col").to_numpy(zero_copy_only=False)] = \
        cells.column("n").to_numpy(zero_copy_only=False)
    th = poly_hash_strings(pa.array(tokens, pa.string()))
    shift = np.uint64(64 - CMS_W_BITS)
    est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
    with np.errstate(over="ignore"):
        for i, c in enumerate(CMS_ROW_C):
            col = ((th * np.uint64(c)) >> shift).astype(np.int64)
            est = np.minimum(est, grid[i, col])
    return est


# ---- Bloom filter (Bloom 1970) -----------------------------------------
# Register contract like HLL/CMS: the verified artifact is the exact word
# table; membership has NO false negatives and deterministic, replayable
# false positives (the SQL oracle sets the same bits, so even the FPs match).
BLOOM_M_BITS = 16
BLOOM_M = 1 << BLOOM_M_BITS          # 65,536 bits = 1,024 int64 words
BLOOM_WORDS = BLOOM_M // 64
BLOOM_K_C = CMS_ROW_C                # k=4 multiply-shift bit positions


def bloom_positions(keys: np.ndarray) -> list[np.ndarray]:
    """k bit positions per key: top M_BITS bits of (key * C_i mod 2^64)."""
    shift = np.uint64(64 - BLOOM_M_BITS)
    out = []
    with np.errstate(over="ignore"):
        for c in BLOOM_K_C:
            out.append(((keys.astype(np.uint64) * np.uint64(c)) >> shift)
                       .astype(np.int64))
    return out


def bloom_partial_batch(batch: pa.Table, key_col: str) -> pa.Table:
    """Per-block partial Bloom filter: OR the k bit positions of every key
    into a dense word array; emit only nonzero words ({word, bits} with the
    uint64 word viewed as int64) — <= 1,024 rows per block regardless of
    block size. Partials merge by bitwise OR (order-free, idempotent)."""
    keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    words = np.zeros(BLOOM_WORDS, dtype=np.uint64)
    for pos in bloom_positions(keys):
        np.bitwise_or.at(words, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    nz = np.nonzero(words)[0]
    return pa.table({"word": pa.array(nz.astype(np.int64)),
                     "bits": pa.array(words[nz].view(np.int64))})


def bloom_merge_rows(tables_rows) -> np.ndarray:
    """OR (word, bits) partial rows into the dense uint64 word array."""
    words = np.zeros(BLOOM_WORDS, dtype=np.uint64)
    for r in tables_rows:
        words[int(r["word"])] |= np.uint64(np.int64(r["bits"]))
    return words


def bloom_contains(keys: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Vectorized membership: True iff ALL k bits are set (no false
    negatives; false positives are a deterministic function of the words)."""
    ok = np.ones(len(keys), dtype=bool)
    for pos in bloom_positions(keys):
        bit = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) \
            & np.uint64(1)
        ok &= bit.astype(bool)
    return ok


def bloom_combine_batch(b: pa.Table) -> pa.Table:
    """Bitwise-OR (word, bits) partial rows within one batch back to
    <= BLOOM_WORDS nonzero rows — the combiner-tree step between per-block
    partials and the final merge."""
    words = np.zeros(BLOOM_WORDS, dtype=np.uint64)
    idx = b.column("word").to_numpy(zero_copy_only=False).astype(np.int64)
    bits = b.column("bits").to_numpy(zero_copy_only=False).view(np.uint64)
    np.bitwise_or.at(words, idx, bits)
    nz = np.nonzero(words)[0]
    return pa.table({"word": pa.array(nz.astype(np.int64)),
                     "bits": pa.array(words[nz].view(np.int64))})


# ------------------------------------------------- K-minimum-values sketch

KMV_K = 256


def kmv_partial_batch(batch: pa.Table, key_col: str, k: int = KMV_K) -> pa.Table:
    """One block's KMV partial: the k smallest DISTINCT mix64 hash values of
    the key column, as (hi, lo) 32-bit halves (lexicographic (hi, lo) ==
    numeric uint64 order; both halves fit signed int64 for Arrow/DuckDB).
    <= k rows per block regardless of block size — the canonical mergeable
    bottom-k sketch (Bar-Yossef et al.; Beyer et al.'s KMV estimator)."""
    ids = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = np.unique(mix64(ids.astype(np.uint64)))  # sorted distinct
    h = h[:k]
    return pa.table({
        "hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
        "lo": pa.array((h & np.uint64(0xFFFFFFFF)).astype(np.int64)),
    })


def kmv_merge(batch: pa.Table, k: int = KMV_K) -> pa.Table:
    """Fold partials: distinct union, keep the k smallest. Idempotent and
    associative — safe at every level of the combiner tree."""
    hi = batch.column("hi").to_numpy(zero_copy_only=False).astype(np.uint64)
    lo = batch.column("lo").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = np.unique((hi << np.uint64(32)) | lo)[:k]
    return pa.table({
        "hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
        "lo": pa.array((h & np.uint64(0xFFFFFFFF)).astype(np.int64)),
    })


def kmv_estimate(hi: np.ndarray, lo: np.ndarray, k: int = KMV_K) -> float:
    """(k-1) * 2^64 / kth_min — the unbiased KMV distinct estimate
    (diagnostic; the CORRECTNESS contract is the hash rows themselves)."""
    h = np.sort((hi.astype(np.uint64) << np.uint64(32))
                | lo.astype(np.uint64))
    if len(h) < k:        # fewer distinct keys than k: the sketch is exact
        return float(len(h))
    return (k - 1) * (2.0 ** 64) / float(h[k - 1])


def kmv_tagged_partial(keys_a: np.ndarray, keys_b: np.ndarray,
                       k: int = KMV_K) -> pa.Table:
    """One block's TAGGED KMV partial for two key sets: rows
    (hi, lo, in_a, in_b) over the k smallest distinct hashes of A union B.
    Keeping k per SIDE per block would also work; keeping k of the union
    with flags is strictly smaller and merges the same way."""
    ha = np.unique(mix64(keys_a.astype(np.uint64)))
    hb = np.unique(mix64(keys_b.astype(np.uint64)))
    h = np.union1d(ha, hb)[:max(k, 1)]
    # membership AFTER truncation: flags only matter for surviving hashes
    return pa.table({
        "hi": pa.array((h >> np.uint64(32)).astype(np.int64)),
        "lo": pa.array((h & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        "in_a": pa.array(np.isin(h, ha).astype(np.int64)),
        "in_b": pa.array(np.isin(h, hb).astype(np.int64)),
    })


def kmv_tagged_merge(batch: pa.Table, k: int = KMV_K) -> pa.Table:
    """Fold tagged partials: OR the flags per hash, keep the k smallest.
    Associative + idempotent like kmv_merge."""
    hi = batch.column("hi").to_numpy(zero_copy_only=False).astype(np.uint64)
    lo = batch.column("lo").to_numpy(zero_copy_only=False).astype(np.uint64)
    a = batch.column("in_a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch.column("in_b").to_numpy(zero_copy_only=False).astype(np.int64)
    h = (hi << np.uint64(32)) | lo
    hu, inv = np.unique(h, return_inverse=True)
    fa = np.zeros(len(hu), np.int64)
    fb = np.zeros(len(hu), np.int64)
    np.maximum.at(fa, inv, a)
    np.maximum.at(fb, inv, b)
    hu, fa, fb = hu[:k], fa[:k], fb[:k]
    return pa.table({
        "hi": pa.array((hu >> np.uint64(32)).astype(np.int64)),
        "lo": pa.array((hu & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        "in_a": pa.array(fa), "in_b": pa.array(fb),
    })


def kmv_intersection_estimate(t: pa.Table, k: int = KMV_K) -> float:
    """Beyer et al.: jaccard_hat = |both flags set among the k union mins|/k,
    |A n B|_hat = jaccard_hat * |A u B|_hat (diagnostic; the contract is the
    tagged rows)."""
    hi = t.column("hi").to_numpy(zero_copy_only=False)
    lo = t.column("lo").to_numpy(zero_copy_only=False)
    both = (t.column("in_a").to_numpy(zero_copy_only=False)
            & t.column("in_b").to_numpy(zero_copy_only=False))
    union_est = kmv_estimate(hi, lo, k)
    n = len(hi)
    if n == 0:
        return 0.0
    return float(both.sum()) / min(n, k) * union_est


# ---- HDR-histogram quantile sketch ------------------------------------
# Log-segmented linear sub-buckets (the layout idea behind Tene's public
# HdrHistogram), re-derived with a pure bit_length segment map so numpy and
# the SQL oracle compute the IDENTICAL bucket with integer ops only. This is
# the engine's scale path for quantiles: exact_quantiles/group_quantiles
# sort (an all-to-all exchange), while this sketch moves <= (64-m+1) * 2^m
# bounded (bucket, cnt) rows per block through the same combiner tree the
# HLL registers use, and merge is bucket-wise SUM — commutative/associative,
# so the nondeterministic distributed fold order cannot change the result.
HDR_M = 7  # sub-bucket resolution bits -> relative bucket width <= 2^-7


def hdr_bucket(v: np.ndarray, m: int = HDR_M) -> np.ndarray:
    """Exact integer bucket for nonnegative int64 values. With e =
    bit_length(v) - 1 clamped to >= m: bucket = (e - m) * 2^m + (v >> (e-m)).
    Values below 2^(m+1) map exactly (shift 0); above, the bucket width
    2^(e-m) keeps relative error <= 2^-m at every magnitude. Monotone in v
    and contiguous across segment boundaries."""
    u = v.astype(np.uint64)
    e = np.maximum(_bit_length(u) - 1, m)
    shift = (e - m).astype(np.uint64)
    return ((e - m) << np.int64(m)) + (u >> shift).astype(np.int64)


def hdr_bucket_bounds(b: np.ndarray, m: int = HDR_M) -> tuple[np.ndarray, np.ndarray]:
    """Inverse map: [lo, hi] inclusive value bounds of each bucket."""
    j = np.maximum((b >> np.int64(m)) - 1, 0)
    mant = b - j * (1 << m)
    lo = mant.astype(np.uint64) << j.astype(np.uint64)
    width = np.uint64(1) << j.astype(np.uint64)
    return lo.astype(np.int64), (lo + width - np.uint64(1)).astype(np.int64)


def hdr_partial_batch(batch: pa.Table, val_col: str, m: int = HDR_M) -> pa.Table:
    """One block's partial sketch: (bucket, cnt) rows, <= (64-m+1) * 2^m of
    them regardless of block size."""
    v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({"bucket": pa.array(hdr_bucket(v, m))})
    g = t.group_by("bucket").aggregate([("bucket", "count")])
    return g.rename_columns(["bucket", "cnt"])


def hdr_merge(batch: pa.Table) -> pa.Table:
    """Bucket-wise sum — the order-invariant sketch merge."""
    g = batch.group_by("bucket").aggregate([("cnt", "sum")])
    return g.rename_columns(["bucket", "cnt"])


def hdr_quantile(buckets: np.ndarray, counts: np.ndarray, q: float,
                 m: int = HDR_M) -> float:
    """Diagnostic quantile reconstruction (lower-style: the bucket holding
    the smallest x with cdf >= q), returning the bucket midpoint — within
    2^-m relative error of the exact quantile by the bucket-width bound."""
    order = np.argsort(buckets)
    b, c = buckets[order], counts[order]
    cum = np.cumsum(c)
    idx = int(np.searchsorted(cum, q * cum[-1], side="left"))
    idx = min(idx, len(b) - 1)
    lo, hi = hdr_bucket_bounds(b[idx:idx + 1], m)
    return float((int(lo[0]) + int(hi[0])) / 2.0)


def hll_grouped_partial_batch(batch: pa.Table, key_col: str,
                              group_col: str) -> pa.Table:
    """Per-group HLL partials: rows (group, bucket, reg) — the sketch-as-
    grouped-aggregate shape (COUNT(DISTINCT key) per segment at scale).
    <= groups_in_block * 4096 rows per block regardless of block size;
    merge is max per (group, bucket), order-invariant."""
    x = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = mix64(x)
    bucket = (h >> np.uint64(_SUFFIX_BITS)).astype(np.int64)
    w = h & np.uint64((1 << _SUFFIX_BITS) - 1)
    rho = _SUFFIX_BITS - _bit_length(w) + 1
    t = pa.table({group_col: batch.column(group_col),
                  "bucket": pa.array(bucket), "reg": pa.array(rho)})
    g = t.group_by([group_col, "bucket"]).aggregate([("reg", "max")])
    return g.rename_columns([group_col, "bucket", "reg"])


def hll_grouped_merge(batch: pa.Table, group_col: str) -> pa.Table:
    g = batch.group_by([group_col, "bucket"]).aggregate([("reg", "max")])
    return g.rename_columns([group_col, "bucket", "reg"])


def hdr_grouped_partial_batch(batch: pa.Table, val_col: str, group_col: str,
                              m: int = HDR_M) -> pa.Table:
    """Per-group HDR partials: rows (group, bucket, cnt) — quantile sketch
    per segment (p50/p95 doc length per source, latency per endpoint, ...);
    <= groups_in_block * (64-m+1) * 2^m rows per block, sum-merge."""
    v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({group_col: batch.column(group_col),
                  "bucket": pa.array(hdr_bucket(v, m))})
    g = t.group_by([group_col, "bucket"]).aggregate([("bucket", "count")])
    return g.rename_columns([group_col, "bucket", "cnt"])


def hdr_grouped_merge(batch: pa.Table, group_col: str) -> pa.Table:
    g = batch.group_by([group_col, "bucket"]).aggregate([("cnt", "sum")])
    return g.rename_columns([group_col, "bucket", "cnt"])
