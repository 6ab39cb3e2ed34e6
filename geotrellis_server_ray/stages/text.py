"""Text-analysis stages for training-data pipelines: token counting, quality
scoring, language-ID, fingerprinting. All vectorized pyarrow/numpy kernels
inside map_batches — no per-row Python in the hot path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = single-space-split token count == count(' ') + 1 (empty
    string counts 1) — definition shared with the SQL oracle's
    len(string_split(text, ' '))."""
    t = batch.column(text_col)
    n = pc.add(pc.count_substring(t, " "), 1)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-style pre-tokenizer count: runs of letters, runs of digits, runs
    of punctuation (the GPT-2 pre-tokenization shape, simplified). Both
    engines use RE2 (pyarrow count_substring_regex / DuckDB
    regexp_extract_all), so counts agree exactly."""
    t = batch.column(text_col)
    n = pc.count_substring_regex(t, BPE_PRETOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer character-class counts (exact across engines); downstream
    quality ratios derive from these."""
    t = batch.column(text_col)
    batch = batch.append_column("n_chars_obs", pc.cast(pc.utf8_length(t), pa.int64()))
    batch = batch.append_column("n_spaces", pc.cast(pc.count_substring(t, " "), pa.int64()))
    batch = batch.append_column(
        "n_digits", pc.cast(pc.count_substring_regex(t, "[0-9]"), pa.int64())
    )
    batch = batch.append_column(
        "n_alpha", pc.cast(pc.count_substring_regex(t, "[A-Za-z]"), pa.int64())
    )
    return batch


# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
    "de": [" der ", " und ", " die "],
}


class LangId:
    """Stopword-marker language scorer (actor-pool stage: marker list set up
    once per actor). Predicts argmax marker density, 'und' (undetermined) when
    nothing matches — the usual fasttext-style langid stub with a
    deterministic heuristic."""

    def __init__(self):
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.binary_join_element_wise(pa.scalar(" "), batch.column("text"), pa.scalar(" "), "")
        scores = []
        for lang, marks in self.markers.items():
            s = None
            for m in marks:
                c = pc.count_substring(t, m)
                s = c if s is None else pc.add(s, c)
            scores.append(pc.cast(s, pa.int64()).to_numpy(zero_copy_only=False))
        mat = np.stack(scores, axis=1)
        best = np.argmax(mat, axis=1)
        total = mat.sum(axis=1)
        langs = np.array(list(self.markers.keys()), dtype=object)
        pred = np.where(total > 0, langs[best], "und")
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


# For stable content hashing use stages/dedup.poly_hash_strings — the
# vectorized polynomial hash over the Arrow string buffer (one reduceat per
# batch). It is what salting and the dedup family key on.


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Document fingerprint: min of rolling polynomial hashes over byte
    windows (winnowing-style). Fully vectorized over the batch's flat Arrow
    string buffer: 16 shifted multiply-adds build every window hash at once,
    per-doc minima come from one minimum.reduceat; only sub-window docs
    (< 16 bytes, rare) take a scalar path."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.cast(texts, pa.large_string())
    n_docs = len(texts)
    if n_docs == 0:
        return batch.append_column("fingerprint", pa.array([], pa.int64()))
    offs = np.frombuffer(texts.buffers()[1], dtype=np.int64)[texts.offset : texts.offset + n_docs + 1]
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    b = data[offs[0] : offs[-1]].astype(np.uint64)
    o = (offs - offs[0]).astype(np.int64)
    lens = np.diff(o)
    B, MOD = np.uint64(257), np.uint64(0xFFFFFFFFFFFF)
    idx = np.arange(window, dtype=np.uint64)
    pw = np.power(B, idx, dtype=np.uint64)
    nb = len(b)
    out = np.empty(n_docs, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(nb, dtype=np.uint64)
        for j in range(window):
            acc[: nb - j] += b[j:] * pw[j]
        # valid window start: window fits inside the position's own doc
        if nb:
            pos = np.arange(nb, dtype=np.int64)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            valid = pos + window <= o[doc_of + 1]
            hv = (acc & MOD)[valid]
            counts = np.maximum(lens - window + 1, 0)
            starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            long_docs = lens >= window
            cuts = starts[:-1][long_docs]
            if len(hv):
                mins = np.minimum.reduceat(hv, np.minimum(cuts, len(hv) - 1))
                out[long_docs] = mins[: int(long_docs.sum())]
        for d in np.nonzero(lens < window)[0]:  # rare: docs under 16 bytes
            h = np.uint64(0)
            for x in b[o[d] : o[d + 1]]:
                h = h * B + x
            out[d] = h & MOD
    return batch.append_column("fingerprint", pa.array(out.astype(np.int64) & 0x7FFFFFFFFFFFFFFF, type=pa.int64()))


# PII patterns (RE2 syntax — pyarrow and DuckDB both run RE2, so the engine
# and the oracle share exact match semantics)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrubbing (curation-suite op): redact emails then phone numbers
    with typed placeholders, vectorized pyarrow RE2 kernels — count first,
    then replace, email pass before phone so phone-like digits inside an
    email are not double-counted. Adds (n_email, n_phone, scrubbed)."""
    t = batch.column(text_col)
    n_email = pc.count_substring_regex(t, EMAIL_RE)
    scrub = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(scrub, PHONE_RE)
    scrub = pc.replace_substring_regex(scrub, PHONE_RE, "<PHONE>")
    return (batch.append_column("n_email", pc.cast(n_email, pa.int64()))
                 .append_column("n_phone", pc.cast(n_phone, pa.int64()))
                 .append_column("scrubbed", scrub))


def _explode_tokens(batch: pa.Table, text_col: str = "text"):
    """(parent_idx, token) for single-space-split lowered tokens, empties
    dropped — the exact token universe of the SQL oracle's
    unnest(string_split(lower(text), ' '))."""
    toks = pc.split_pattern(pc.utf8_lower(batch.column(text_col)), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    return pc.filter(parent, mask), pc.filter(flat, mask)


def vocab_df_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-block vocabulary partials (token, df, tf): tf = term occurrences,
    df = docs containing the token — both additive across blocks because a
    document never spans blocks. The global groupby over these partials sees
    O(vocab x blocks) rows, not O(tokens); vocab grows sub-linearly (Zipf)
    so the exchange stays narrow at corpus scale."""
    parent, flat = _explode_tokens(batch, text_col)
    per_doc = (pa.table({"p": parent, "token": flat})
               .group_by(["p", "token"]).aggregate([([], "count_all")]))
    g = per_doc.group_by("token").aggregate([("p", "count"), ("count_all", "sum")])
    return pa.table({
        "token": g.column("token"),
        "df": pc.cast(g.column("p_count"), pa.int64()),
        "tf": pc.cast(g.column("count_all_sum"), pa.int64()),
    })


REPETITION_MAX_PPM = 100_000  # keep docs whose top token is < 10% of tokens


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition features, doc-local (zero shuffle): top-token
    fraction in ppm = floor(1e6 * max_count / n_tokens). The 1e6 multiply is
    exact (counts < 2^20) and the single double division + floor is the same
    IEEE op sequence as the oracle's floor(1000000.0 * m / n)."""
    parent, flat = _explode_tokens(batch, text_col)
    per_doc = (pa.table({"p": parent, "token": flat})
               .group_by(["p", "token"]).aggregate([([], "count_all")]))
    p = per_doc.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
    c = per_doc.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(batch)
    m = np.zeros(n_docs, np.int64)
    np.maximum.at(m, p, c)
    n = np.zeros(n_docs, np.int64)
    np.add.at(n, p, c)
    ppm = np.floor(1e6 * m / np.maximum(n, 1)).astype(np.int64)
    ppm[n == 0] = 0
    return pa.table({
        "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
        "n_tokens": pa.array(n),
        "top_ppm": pa.array(ppm),
        "keep": pa.array((ppm < REPETITION_MAX_PPM).astype(np.int64)),
    })


def token_doc_pairs_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Block-local DISTINCT (token, doc_id) pairs — the partial an inverted
    index shuffles. Exact because a document never spans blocks; the
    exchange carries O(distinct token-doc pairs), which IS the index size
    (an inverted index is inherently linear in its postings)."""
    parent, flat = _explode_tokens(batch, text_col)
    ids = pc.cast(batch.column("doc_id"), pa.int64()).take(parent)
    return (pa.table({"token": flat, "doc_id": ids})
            .group_by(["token", "doc_id"]).aggregate([])
            .select(["token", "doc_id"]))


def postings_partition(g: pa.Table) -> pa.Table:
    """One hash partition of (token, doc_id) pairs -> (token, df, postings)
    rows with postings = comma-joined ASCENDING doc ids. Tokens are
    dictionary-encoded so the grouping sort runs on int32 codes; the only
    per-group Python work is the final string join, bounded by this
    partition's vocabulary (Zipf-sublinear), mirroring what any SQL
    engine's string_agg does per group."""
    if g.num_rows == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "postings": pa.array([], pa.string())})
    tok = g.column("token")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    d = tok.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, codes))
    c2, i2 = codes[order], ids[order]
    starts = np.flatnonzero(np.concatenate(([True], c2[1:] != c2[:-1])))
    ends = np.concatenate((starts[1:], [len(c2)]))
    toks = d.dictionary.take(pa.array(c2[starts]))
    posts = [",".join(map(str, i2[s:e])) for s, e in zip(starts, ends)]
    return pa.table({"token": toks,
                     "df": pa.array((ends - starts).astype(np.int64)),
                     "postings": pa.array(posts, pa.string())})


def doc_tf_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Doc-local (doc_id, token, tf) rows — the per-document term counts a
    tf-idf scorer consumes. Zero shuffle: a document never spans blocks."""
    parent, flat = _explode_tokens(batch, text_col)
    per_doc = (pa.table({"p": parent, "token": flat})
               .group_by(["p", "token"]).aggregate([([], "count_all")]))
    ids = pc.cast(batch.column("doc_id"), pa.int64()) \
        .take(per_doc.column("p"))
    return pa.table({"doc_id": ids,
                     "token": per_doc.column("token"),
                     "tf": pc.cast(per_doc.column("count_all"), pa.int64())})


def tfidf_topk_batch(batch: pa.Table, vocab: pa.Array, df: np.ndarray,
                     n_docs: int, k: int) -> pa.Table:
    """Top-k tf-idf terms per doc from (doc_id, token, tf) rows against a
    broadcast SORTED vocabulary + df vector. Integer-exact score
    score_e6 = tf * 1_000_000 * N // df (monotone in tf/df for fixed N, no
    float log in the ranking); ties break token-ascending, and because the
    vocab array is byte-sorted the tie key is just the vocab position
    (UTF-8 byte order == codepoint order). Fully vectorized: hash lookup
    via pc.index_in, one lexsort, boundary-run rank assignment."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "token": pa.array([], pa.string()),
                         "score_e6": pa.array([], pa.int64())})
    pos = pc.index_in(batch.column("token"), value_set=vocab) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    score = tf * 1_000_000 * n_docs // df[pos]
    order = np.lexsort((pos, -score, doc))
    d2 = doc[order]
    starts = np.flatnonzero(np.concatenate(([True], d2[1:] != d2[:-1])))
    rank = np.arange(len(d2), dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(d2)])))) + 1
    keep = rank <= k
    sel = order[keep]
    return pa.table({"doc_id": pa.array(doc[sel]),
                     "rank": pa.array(rank[keep]),
                     "token": batch.column("token").take(pa.array(sel)),
                     "score_e6": pa.array(score[sel])})


# ------------------------------------------------------------- BM25 top-k
#
# Okapi BM25 (Robertson et al., TREC-3) with k1 = 1.2, b = 0.75, made
# INTEGER-EXACT so the SQL oracle replays every floor bit-for-bit (the
# house tfidf_topk contract, extended to a length-normalized scorer):
#
#   r_e3      = (1000 * dl * N) // L            # dl / avgdl, milli-units
#   den_e3    = 1000*tf + 300 + (900 * r_e3) // 1000
#                 # 1000 * (tf + k1*(1-b) + k1*b*dl/avgdl)
#   tfp_e6    = (1_000_000 * 2200 * tf) // den_e3   # (k1+1)*tf / den, e6
#   idf_e3    = (1000 * (2*(N - df) + 1)) // (2*df + 1)
#                 # (N - df + 0.5)/(df + 0.5) in milli-units — the Okapi
#                 # idf ratio, log dropped: log is monotone, so within a
#                 # fixed corpus the RANKING is preserved and the score
#                 # stays in exact integer arithmetic (no float log whose
#                 # ULPs could diverge between numpy and the oracle)
#   score_e6  = (idf_e3 * tfp_e6) // 1000
#
# All quantities are non-negative so floor == trunc in both engines.
# int64 headroom: tfp_e6 <= 2.2e6; idf_e3 <= 1000*(2N+1) — the product
# overflows only past N ~ 4e9 documents per corpus partition-set, at which
# point idf_e3 should move to e0 scaling (documented, not gated).

BM25_K = 3


def _bm25_scores(doc: np.ndarray, tf: np.ndarray, df: np.ndarray,
                 dl: np.ndarray, n_docs: int, total_tokens: int) -> np.ndarray:
    """score_e6 per (doc, token, tf) row; all inputs int64, vectorized."""
    r_e3 = (1000 * dl * np.int64(n_docs)) // np.int64(max(total_tokens, 1))
    den_e3 = 1000 * tf + 300 + (900 * r_e3) // 1000
    tfp_e6 = (1_000_000 * 2200 * tf) // den_e3
    idf_e3 = (1000 * (2 * (np.int64(n_docs) - df) + 1)) // (2 * df + 1)
    return (idf_e3 * tfp_e6) // 1000


def _topk_select(doc: np.ndarray, score: np.ndarray, tie: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """(row indices, ranks) of the top-k rows per doc: score desc, tie asc.
    One lexsort + boundary-run rank assignment (shared with tfidf)."""
    order = np.lexsort((tie, -score, doc))
    d2 = doc[order]
    starts = np.flatnonzero(np.concatenate(([True], d2[1:] != d2[:-1])))
    rank = np.arange(len(d2), dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(d2)])))) + 1
    keep = rank <= k
    return order[keep], rank[keep]


def bm25_topk_batch(batch: pa.Table, vocab: pa.Array, df: np.ndarray,
                    n_docs: int, total_tokens: int, k: int) -> pa.Table:
    """Top-k BM25 terms per document from raw (doc_id, text) rows against a
    broadcast SORTED vocabulary + df vector (the tfidf broadcast-path
    shape). dl is doc-local (sum of tf), so the whole scorer fuses into one
    map_batches with zero shuffles."""
    out_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "score_e6": pa.array([], pa.int64())})
    tfr = doc_tf_batch(batch)
    if tfr.num_rows == 0:
        return out_empty
    pos = pc.index_in(tfr.column("token"), value_set=vocab) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tf = tfr.column("tf").to_numpy(zero_copy_only=False)
    doc = tfr.column("doc_id").to_numpy(zero_copy_only=False)
    # dl per row: segment-sum tf over each doc's contiguous run (doc_tf_batch
    # emits a doc's rows adjacent by construction of the group_by)
    uid, inv = np.unique(doc, return_inverse=True)
    dls = np.zeros(len(uid), np.int64)
    np.add.at(dls, inv, tf)
    score = _bm25_scores(doc, tf, df[pos], dls[inv], n_docs, total_tokens)
    sel, rank = _topk_select(doc, score, pos, k)
    return pa.table({"doc_id": pa.array(doc[sel]),
                     "rank": pa.array(rank),
                     "token": tfr.column("token").take(pa.array(sel)),
                     "score_e6": pa.array(score[sel])})


def bm25_partition_topk(g: pa.Table, n_docs: int, total_tokens: int,
                        k: int) -> pa.Table:
    """Join-path finalizer: one doc-id hash partition of
    (doc_id, token, tf, df) rows (tf rows inner-joined to the global df
    table — every token matches, so a doc's full length is present) ->
    top-k BM25 rows. Tie-break by token byte order via a partition-local
    sorted-unique position (byte order is global, so local positions rank
    identically to global ones)."""
    if g.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "token": pa.array([], pa.string()),
                         "score_e6": pa.array([], pa.int64())})
    tok = g.column("token")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    vocab = pc.unique(tok).sort()
    pos = pc.index_in(tok, value_set=vocab) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tf = g.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    df = g.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    uid, inv = np.unique(doc, return_inverse=True)
    dls = np.zeros(len(uid), np.int64)
    np.add.at(dls, inv, tf)
    score = _bm25_scores(doc, tf, df, dls[inv], n_docs, total_tokens)
    sel, rank = _topk_select(doc, score, pos, k)
    return pa.table({"doc_id": pa.array(doc[sel]),
                     "rank": pa.array(rank),
                     "token": tok.take(pa.array(sel)),
                     "score_e6": pa.array(score[sel])})
