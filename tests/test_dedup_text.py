"""Unit tests: dedup kernels (poly hash, minhash, LSH, simhash), text ops
(langid, fingerprints), media stages (fake decode gating)."""

import numpy as np
import pyarrow as pa
import pytest

from geotrellis_server_ray.stages import dedup as D
from geotrellis_server_ray.stages import media as M
from geotrellis_server_ray.stages import text as T


def test_poly_hash_stable_and_collision_free():
    a = pa.array(["alpha", "beta", "alpha", "", "alphA"])
    h = D.poly_hash_strings(a)
    assert h[0] == h[2] and h[0] != h[1] and h[0] != h[4]
    assert h[3] == 0
    # stability across calls / slicing
    assert D.poly_hash_strings(pa.array(["beta"]))[0] == h[1]
    vocab = [f"w{i}" for i in range(5000)]
    hv = D.poly_hash_strings(pa.array(vocab))
    assert len(np.unique(hv)) == len(vocab)


def test_minhash_similarity_estimates_jaccard():
    base = "a b c d e f g h i j k l m n o p q r s t"
    near = "a b c d e f g h i j k l m n o p q r s u"   # 1 token changed
    far = "z y x w v u t9 s9 r9 q9 p9 o9 n9 m9 l9 k9"
    sig = D.minhash_signatures(pa.array([base, near, far, base]))
    assert (sig[0] == sig[3]).all()
    sim_near = (sig[0] == sig[1]).mean()
    sim_far = (sig[0] == sig[2]).mean()
    true_j = D.token_shingle_jaccard(base, near)
    assert abs(sim_near - true_j) < 0.25
    assert sim_far < 0.1


def test_lsh_pipeline_finds_planted_pairs(ray_session):
    import ray.data as rd

    texts = []
    for i in range(40):
        texts.append(" ".join(f"tok{i}_{j}" for j in range(30)))
    texts[7] = texts[3]          # exact dup
    texts[21] = texts[11] + " extra"  # near dup
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                                 "text": pa.array(texts)}))
    pairs = D.lsh_candidate_pairs(ds).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert (3, 7) in got
    assert (11, 21) in got


def test_simhash_hamming_ordering():
    t = pa.table({"text": pa.array([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "entirely unrelated content with other words here",
    ])})
    s = D.simhash_batch(t).column("simhash").to_numpy(zero_copy_only=False)
    assert D.hamming64(s[0], s[1]) < D.hamming64(s[0], s[2])


def test_langid_markers():
    t = pa.table({"text": pa.array([
        "the cat and the dog of the house",
        "le chat et la maison le jour",
        "der hund und die katze der tag",
        "xyz qrs tuv",
    ])})
    out = T.LangId()(t).column("lang_pred").to_pylist()
    assert out == ["en", "fr", "de", "und"]


def test_fingerprint_deterministic_and_sensitive():
    t = pa.table({"text": pa.array(["hello world this is a document", "hello world this is a documenu"])})
    f1 = T.rolling_fingerprint_batch(t).column("fingerprint").to_pylist()
    f2 = T.rolling_fingerprint_batch(t).column("fingerprint").to_pylist()
    assert f1 == f2


def test_media_decode_fake_and_strict():
    t = pa.table({
        "doc_id": pa.array(["doc-1", "doc-1"]),
        "span_idx": pa.array([1, 2], type=pa.int64()),
        "media_ref": pa.array(["mem://media/5/1#lon=1.0&lat=2.0", ""]),
    })
    out = M.MediaDecode()(t)
    assert out.num_rows == 1  # non-media filtered
    assert out.column("width")[0].as_py() == 64 + (5 * 7 + 1 * 13) % 512
    with pytest.raises(NotImplementedError):
        M.MediaDecode(strict=True)(t)


def test_media_resize_and_frame_sample():
    t = pa.table({"width": pa.array([512, 100], type=pa.int64()),
                  "height": pa.array([256, 400], type=pa.int64()),
                  "n_frames": pa.array([13, 2], type=pa.int64())})
    r = M.MediaResize(max_side=256)(t)
    assert r.column("out_width").to_pylist() == [256, 64]
    assert r.column("out_height").to_pylist() == [128, 256]
    f = M.frame_sample_batch(r, every_k=6)
    # 13 frames -> 0,6,12 ; 2 frames -> 0
    assert f.column("frame_idx").to_pylist() == [0, 6, 12, 0]


def test_media_payload_and_feature_extract():
    from geotrellis_server_ray.stages.media import (
        MediaDecode, MediaFeatureExtract, attach_media_payloads)

    t = pa.table({
        "doc_id": pa.array(["doc-5", "doc-6"]),
        "span_idx": pa.array([1, 3], type=pa.int64()),
        "media_ref": pa.array(["mem://media/5/1#lon=1.0&lat=2.0",
                               "mem://media/6/3#lon=3.0&lat=4.0"]),
    })
    dec = MediaDecode()(t)
    pay = attach_media_payloads(dec)
    feats = MediaFeatureExtract()(pay)
    n_bytes = feats.column("n_bytes").to_pylist()
    w = dec.column("width").to_pylist(); h = dec.column("height").to_pylist()
    assert n_bytes == [w[0]*h[0]//64, w[1]*h[1]//64]
    # deterministic payloads -> stable CRCs
    again = MediaFeatureExtract()(attach_media_payloads(dec))
    assert feats.column("payload_crc").to_pylist() == again.column("payload_crc").to_pylist()
    # features are normalized histograms
    f = np.asarray(feats.column("feature")[0].as_py())
    assert abs(f.sum() - 1.0) < 1e-9


def test_poly_hash_trailing_empty_string():
    h = D.poly_hash_strings(pa.array(["abc", ""]))
    assert h[1] == 0 and h[0] == D.poly_hash_strings(pa.array(["abc"]))[0]
    # doc text ending in a space -> trailing empty token must not crash minhash
    sig = D.minhash_signatures(pa.array(["ends with space ", "x y z w"]))
    assert sig.shape == (2, 64)


def test_short_doc_signature_batch_independent():
    """A short doc's signature must not depend on its batch neighbors."""
    a = D.minhash_signatures(pa.array(["hello world", "aaa bbb ccc ddd"]))[0]
    b = D.minhash_signatures(pa.array(["hello world", "xxx yyy zzz www"]))[0]
    c = D.minhash_signatures(pa.array(["hello world"]))[0]
    assert (a == b).all() and (a == c).all()


def test_connected_components_both_paths_agree(ray_session):
    """The driver union-find fast path and the iterative label-propagation
    path must produce identical cluster assignments (chain + triangle +
    isolated nodes)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.dedup import connected_components

    # a 20-node chain exercises pointer doubling on the iterative path
    chain = list(range(100, 120))
    edges = pa.table({"id_a": pa.array([1, 2, 10, 11, 10] + chain[:-1], pa.int64()),
                      "id_b": pa.array([2, 3, 11, 12, 12] + chain[1:], pa.int64())})
    nodes = pa.table({"doc_id": pa.array([1, 2, 3, 5, 10, 11, 12, 99] + chain, pa.int64())})
    want = {1: 1, 2: 1, 3: 1, 5: 5, 10: 10, 11: 10, 12: 10, 99: 99}
    want.update({c: 100 for c in chain})
    for thresh in (5_000_000, 0):  # fast path, then forced iterative path
        out = connected_components(rd.from_arrow(edges), rd.from_arrow(nodes),
                                   small_edge_threshold=thresh).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_rep"]))
        assert got == want, thresh


def test_passage_scrub_stage_functions():
    """explode -> keep-first -> reassemble on a hand-checked corpus:
    duplicate segments survive only at their corpus-first (doc, seg_no);
    tail segments shorter than w round-trip; a fully-duplicated doc
    disappears; within-doc repeats are also scrubbed."""
    import pyarrow as pa

    from geotrellis_server_ray.stages.dedup import (
        explode_token_segments, keep_first_segments, reassemble_segments)

    w = 2
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e",        # segs: "a b", "c d", "e" (tail of 1)
            "a b x y",          # "a b" dup of doc0 -> scrubbed; "x y" kept
            "a b c d",          # fully duplicated -> vanishes
            "p q p q p",        # within-doc repeat: "p q","p q","p" -> one "p q" + "p"
        ]),
    })
    segs = explode_token_segments(docs, w=w)
    assert segs.column("seg").to_pylist() == [
        "a b", "c d", "e", "a b", "x y", "a b", "c d", "p q", "p q", "p"]
    assert segs.column("seg_no").to_pylist() == [0, 1, 2, 0, 1, 0, 1, 0, 1, 2]
    kept = keep_first_segments(segs)  # single partition = global
    out = reassemble_segments(kept).sort_by("doc_id")
    assert out.column("doc_id").to_pylist() == [0, 1, 3]
    assert out.column("text_scrubbed").to_pylist() == ["a b c d e", "x y", "p q p"]
    assert out.column("n_kept").to_pylist() == [3, 1, 2]


def test_explode_token_segments_empty_and_offsets():
    """Zero-row batches and sliced (non-zero-offset) columns both explode
    correctly — the re-offsetting trick must honor absolute offsets."""
    import pyarrow as pa

    from geotrellis_server_ray.stages.dedup import explode_token_segments

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = explode_token_segments(empty, w=8)
    assert len(out) == 0 and out.column_names == ["doc_id", "seg_no", "seg"]

    base = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                     "text": pa.array(["skip me", "u v w"])})
    sliced = base.slice(1)  # non-zero chunk offset
    out = explode_token_segments(sliced, w=2)
    assert out.column("seg").to_pylist() == ["u v", "w"]
    assert out.column("doc_id").to_pylist() == [8, 8]


def test_explode_token_segments_large_string():
    """large_string input is narrowed to string (binary_join has no
    list<large_string> kernel) and produces identical segments."""
    import pyarrow as pa

    from geotrellis_server_ray.stages.dedup import explode_token_segments

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b c d e"], pa.large_string())})
    out = explode_token_segments(t, w=2)
    assert out.column("seg").to_pylist() == ["a b", "c d", "e"]


def test_doc_chunks_window_math(ray_session):
    """Chunk windows: stride 48, cap 64, trailing partials kept; n_chars is
    the exact reassembled length (token lengths + separators)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.registry import (CHUNK_STRIDE,
                                                          CHUNK_TOK)
    assert (CHUNK_TOK, CHUNK_STRIDE) == (64, 48)
    import geotrellis_server_ray.pipelines.registry as R

    texts = ["one two three",                       # single short chunk
             " ".join(f"t{i}" for i in range(64)),  # exactly one full chunk
             " ".join(f"t{i}" for i in range(65)),  # full + 17-token tail
             ""]                                    # split('') -> [''], len 0
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(texts)})
    import pyarrow.parquet as pq
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = R.q_doc_chunks(d).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = out.groupby("doc_id").size().to_dict()
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
    # doc 2: 64 tokens -> chunk 0 has 64 tokens, chunk 1 the 16-token tail
    d2 = out[out.doc_id == 2]
    assert list(d2.n_tokens) == [64, 16] and list(d2.start_tok) == [0, 48]
    row = out[(out.doc_id == 1)].iloc[0]
    assert row.n_tokens == 3 and row.n_chars == len("one two three")
    row4 = out[(out.doc_id == 4)].iloc[0]
    assert row4.n_tokens == 1 and row4.n_chars == 0  # the empty token


def test_exact_substring_dedup_matches_bruteforce(ray_session):
    """ExactSubstr (Lee et al. 2021) over a hand corpus with self-repeats,
    cross-doc repeats, short docs, and an empty doc — the distributed
    pipeline (forced multi-partition) equals the brute-force reference."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.dedup import exact_substring_dedup

    W = 8
    texts = ["abcdefghij" * 3,            # period-10 self repeat
             "xxabcdefghijqq",            # cross-doc repeat, offset 2
             "short",                     # < W: untouchable
             "zzzzzzzzzz",                # period-1 self repeat
             "", "unique sentence here."]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)})).repartition(3)
    out = exact_substring_dedup(ds, w=W, num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force: a window is cut iff an earlier (doc, pos) occurrence of
    # the same W-gram exists anywhere in the corpus
    seen = {}
    dups = []
    for d, s in zip(ids, texts):
        for i in range(max(0, len(s) - W + 1)):
            g = s[i:i + W]
            if g in seen:
                dups.append((d, i))
            else:
                seen[g] = (d, i)
    for d, s in zip(ids, texts):
        cov = np.zeros(len(s), bool)
        for dd, pp in dups:
            if dd == d:
                cov[pp:pp + W] = True
        kept = "".join(c for c, m in zip(s, cov) if not m)
        row = out[out["doc_id"] == d].iloc[0]
        assert row["text_dedup"] == kept, (d, row["text_dedup"], kept)
        assert row["n_chars_kept"] == len(kept)
        assert row["n_dup_windows"] == sum(dd == d for dd, _ in dups)
    assert out["text_dedup"][0] == "abcdefghij"  # first copy survives
    assert out["text_dedup"][2] == "short"       # sub-W docs untouched
