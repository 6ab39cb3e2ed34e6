"""Deduplication stages for training-data pipelines.

Exact dedup lives in the registry (hash-partition groupby, per-group min).
This module implements the near-duplicate family:

  * MinHash + LSH: word shingles -> 64-perm minhash signature -> banded LSH
    buckets -> candidate pairs -> shingle-Jaccard verification. The banding
    groupby is the only shuffle, and it moves one (band, hash, doc) row per
    band per doc — not the documents.
  * SimHash: 64-bit sign-of-weighted-bit-sums fingerprint; near-dup candidates
    via 16-bit chunk banding (hamming <= 3 within 4 chunks guarantees a
    shared chunk).
  * n-gram Jaccard: character 5-gram set similarity (the verify kernel).
  * Embedding near-dup: random-hyperplane LSH buckets (stages/ann.LshBuckets)
    -> within-bucket pairwise cosine >= threshold.

All hashing is engine-stable (no Python hash()): a polynomial byte hash
computed vectorized over the Arrow string buffer with numpy uint64 wraparound.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(1099511628211)  # FNV prime as polynomial base
# Precomputed powers of the base mod 2^64: exponents wrap at the table size
# (strings longer than the table still hash consistently — only consistency
# matters, not the exact polynomial degree).
_POW_BITS = 12
_POW_TABLE = np.empty(1 << _POW_BITS, dtype=np.uint64)
_POW_TABLE[0] = np.uint64(1)
with np.errstate(over="ignore"):
    for _i in range(1, 1 << _POW_BITS):
        _POW_TABLE[_i] = _POW_TABLE[_i - 1] * _B


def poly_hash_strings(arr) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of every string in an Arrow
    StringArray: h(s) = sum(byte_i * B^(L-1-i)) mod 2^64, computed with one
    reduceat over the flat UTF-8 buffer. Stable across processes/engines."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = pc.cast(arr, pa.large_string()) if pa.types.is_string(arr.type) else arr
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    start, end = buf_off[0], buf_off[-1]
    b = data[start:end].astype(np.uint64)
    offs = (buf_off - start).astype(np.int64)
    if len(b) == 0:
        return np.zeros(len(arr), dtype=np.uint64)
    # per-byte exponent = (string_end - idx - 1)
    idx = np.arange(len(b), dtype=np.int64)
    seg_end = np.repeat(offs[1:], np.diff(offs))
    exp = (seg_end - idx - 1) & ((1 << _POW_BITS) - 1)
    with np.errstate(over="ignore"):
        terms = b * _POW_TABLE[exp]
    # sentinel element so a segment starting at len(b) (trailing empty
    # string) is a valid reduceat cut without truncating the previous
    # segment; empty segments are zeroed explicitly below
    terms = np.append(terms, np.uint64(0))
    cuts = offs[:-1]
    sums = np.add.reduceat(terms, cuts)
    empty = np.diff(offs) == 0
    sums = np.where(empty, np.uint64(0), sums[: len(arr)])
    return sums.astype(np.uint64)


def _token_hashes(texts, lowercase: bool = True):
    """Split on single spaces -> flat token hash array + doc offsets."""
    t = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if lowercase:
        t = pc.utf8_lower(t)
    tokens = pc.split_pattern(t, " ")
    flat = pc.list_flatten(tokens)
    th = poly_hash_strings(flat)
    n_tok = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offs[1:])
    return th, offs


def _shingles(th: np.ndarray, offs: np.ndarray, k: int = 3):
    """k-token shingle hashes per doc: combine k consecutive token hashes.
    Returns flat shingle array + per-doc offsets (docs with < k tokens get a
    single whole-doc shingle)."""
    C = np.uint64(0x9E3779B97F4A7C15)
    n_docs = len(offs) - 1
    out_chunks = []
    out_counts = np.empty(n_docs, dtype=np.int64)
    lens = np.diff(offs)
    with np.errstate(over="ignore"):
        # combined[i] = hash of tokens [i, i+k): rolling xor-mul mix
        acc = np.zeros(len(th), dtype=np.uint64)
        for j in range(k):
            shifted = th[j:] if j else th
            pad = np.zeros(j, dtype=np.uint64)
            sh = np.concatenate([shifted, pad]) if j else th.copy()
            acc = acc * C + sh
    for d in range(n_docs):
        s, e = offs[d], offs[d + 1]
        n = e - s
        if n >= k:
            out_chunks.append(acc[s : e - k + 1])
            out_counts[d] = n - k + 1
        elif n > 0:
            # whole-doc shingle from ONLY this doc's tokens (acc[s] would mix
            # in the next document's tokens across the boundary, making short
            # docs' signatures depend on their batch neighbors)
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for tok in th[s:e]:
                    h = h * C + tok
            out_chunks.append(np.array([h], dtype=np.uint64))
            out_counts[d] = 1
        else:
            out_chunks.append(np.array([np.uint64(0)]))
            out_counts[d] = 1
    flat = np.concatenate(out_chunks) if out_chunks else np.empty(0, dtype=np.uint64)
    so = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=so[1:])
    return flat, so


_NPERM = 64
_rng = np.random.default_rng(20240817)
_MH_A = _rng.integers(1, 2**63, _NPERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
_MH_B = _rng.integers(0, 2**63, _NPERM, dtype=np.uint64)


def minhash_signatures(texts, shingle_k: int = 3) -> np.ndarray:
    """(n_docs, 64) uint64 minhash signature matrix. One 1-D pass per
    permutation (a 2-D reduceat along axis 0 strides badly; 64 contiguous
    1-D reduceats are ~10x faster)."""
    th, offs = _token_hashes(texts)
    sh, so = _shingles(th, offs, k=shingle_k)
    n_docs = len(so) - 1
    out = np.empty((n_docs, _NPERM), dtype=np.uint64)
    starts = so[:-1].clip(0, max(0, len(sh) - 1))
    with np.errstate(over="ignore"):
        for i in range(_NPERM):
            h = sh * _MH_A[i] + _MH_B[i]
            out[:, i] = np.minimum.reduceat(h, starts)[:n_docs]
    return out


class MinHashLsh:
    """map_batches stage: docs -> (band, band_hash, doc_id, sig...) rows for
    the LSH banding groupby. bands x rows = 16 x 4 over 64 perms."""

    BANDS, ROWS = 16, 4

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column(self.text_col))
        n = len(batch)
        C = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.BANDS), dtype=np.uint64)
            for r in range(self.ROWS):
                bh = bh * C + sig[:, r :: self.ROWS][:, : self.BANDS]
        band = np.repeat(np.arange(self.BANDS, dtype=np.int64)[None, :], n, axis=0)
        ids = batch.column(self.id_col)
        return pa.table({
            "band": pa.array(band.ravel()),
            "band_hash": pa.array(bh.ravel().astype(np.int64)),
            self.id_col: ids.take(pa.array(np.repeat(np.arange(n), self.BANDS))),
        })


def lsh_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """docs -> candidate near-dup pairs via banded minhash LSH.

    Scale shape: almost every (band, band_hash) bucket is a singleton, and a
    per-group Python callback over millions of singletons is the classic
    map_groups trap. Instead: (1) vectorized per-batch pre-count + a small
    grouped count over partials finds the *colliding* buckets (near-dup count
    sized, tiny); (2) only rows in colliding buckets survive a broadcast
    semi-join filter; (3) pair generation + pair-dedup run vectorized on the
    surviving sliver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_sums

    # banded is consumed twice (bucket counts + survivor filter); materialize
    # so the signature computation runs once. Size = docs x BANDS x 3 ints —
    # a small fraction of the input corpus.
    banded = ds.map_batches(MinHashLsh(id_col, text_col), batch_format="pyarrow").materialize()

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("n", pa.array(np.ones(len(b), dtype=np.int64)))

    counts = grouped_sums(banded.map_batches(ones, batch_format="pyarrow"),
                          ["band", "band_hash"], ["n"])
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), pa.scalar(1))), batch_format="pyarrow"
    ).to_pandas()
    if len(hot) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64())}))
    # broadcast the colliding keys as a combined 128-bit-ish key set
    hot_keys = set(zip(hot["band"].tolist(), hot["band_hash"].tolist()))
    import ray

    href = ray.put(hot_keys)

    class FilterHot:
        def __init__(self):
            self.keys = ray.get(href)

        def __call__(self, b: pa.Table) -> pa.Table:
            band = b.column("band").to_numpy(zero_copy_only=False)
            bh = b.column("band_hash").to_numpy(zero_copy_only=False)
            keep = np.fromiter(((x, y) in self.keys for x, y in zip(band, bh)),
                               dtype=bool, count=len(b))
            return b.filter(pa.array(keep))

    survivors = banded.map_batches(FilterHot, batch_format="pyarrow",
                                   concurrency=(1, 8), num_cpus=1)

    def pairs_vec(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = survivors.groupby(["band", "band_hash"]).map_groups(pairs_vec, batch_format="pandas")
    # cross-bucket duplicate pairs are deduped by the CALLER after
    # verification: the verified pair set is near-dup-density sized (tiny),
    # so a third shuffle just to distinct it is wasted wall time
    return cand


def char_ngrams(s: str, n: int = 5) -> set:
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 5) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 1.0


def token_shingles(s: str, k: int = 3) -> set:
    toks = s.lower().split(" ")
    if len(toks) < k:
        return {tuple(toks)}
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def token_shingle_jaccard(a: str, b: str, k: int = 3) -> float:
    """Word-shingle set Jaccard — the LSH verify kernel. (Character n-gram
    sets degenerate on small vocabularies: any two long texts over the same
    few words share almost all char n-grams; word *shingles* keep order
    information and stay discriminative.)"""
    sa, sb = token_shingles(a, k), token_shingles(b, k)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 1.0


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per doc: sign of per-bit sums of token-hash bits.
    Processed 16 bits at a time in int32 so the transient matrix stays at
    ~64 B/token instead of ~1 KB/token (large text batches would otherwise
    OOM the worker)."""
    th, offs = _token_hashes(batch.column(text_col))
    n_docs = len(offs) - 1
    cuts = offs[:-1].clip(0, max(0, len(th) - 1))
    empty = np.diff(offs) == 0
    sig = np.zeros(n_docs, dtype=np.uint64)
    for base in range(0, 64, 16):
        shifts = np.arange(base, base + 16, dtype=np.uint64)
        if len(th):
            bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            contrib = bits * 2 - 1
            sums = np.add.reduceat(contrib, cuts, axis=0)[:n_docs]
            sums[empty] = 0
        else:
            sums = np.zeros((n_docs, 16), dtype=np.int32)
        sig |= ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return batch.append_column("simhash", pa.array(sig.astype(np.int64)))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
