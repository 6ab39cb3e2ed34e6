"""Distributed BPE vocabulary training (q_bpe_merges) against a direct
Python reference implementation AND the unrolled-CTE DuckDB oracle, on a toy
corpus built to pin the two semantic corners:

* overlap counting: 'aaa' contributes TWO (a,a) pairs (Sennrich counting);
* greedy-left non-overlapping application: after merging (a,a),
  'aaa' -> [aa, a] — the literal-replace semantics both engines share.
"""
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.pipelines.registry import (
    BPE_MERGES, q_bpe_encode, q_bpe_merges, sql_bpe_encode, sql_bpe_merges)


def ref_bpe(texts: list[str], k_max: int):
    """Reference BPE trainer: dict-of-symbol-tuples, explicit greedy-left
    merge loop — independent of both the Arrow and the SQL formulations."""
    words: dict[tuple, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                key = tuple(w)
                words[key] = words.get(key, 0) + 1
    rules = []
    for k in range(1, k_max + 1):
        pairs: dict[tuple, int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
        rules.append((k, best[0], best[1], pairs[best]))
        merged: dict[tuple, int] = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + c
        words = merged
    return pd.DataFrame(rules, columns=["merge_rank", "w1", "w2",
                                        "pair_count"])


TEXTS = [
    "aaa aaa aaa aaa aaa aaa bb",          # overlap + greedy-left corner
    "stream batch arrow shuffle stream",
    "batch stream arrow partition exchange",
    "shuffle exchange partition stream batch arrow",
    "aaa banana bandana banana aaa",
]


@pytest.fixture()
def toy_sf(tmp_path):
    pq.write_table(pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                             "text": pa.array(TEXTS, pa.string())}),
                   tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_matches_reference_and_oracle(ray_session, toy_sf):
    out = q_bpe_merges(toy_sf).to_pandas()
    ref = ref_bpe(TEXTS, BPE_MERGES)
    assert len(ref) == BPE_MERGES, "toy corpus must survive all merges"
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{toy_sf}/documents.parquet')")
    ora = con.execute(sql_bpe_merges()).fetch_df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)

    # the corner itself: rule 1 must be the overlap-counted (a,a) with the
    # 8 occurrences of 'aaa' contributing 2 pairs each
    r1 = out.iloc[0]
    assert (r1["w1"], r1["w2"]) == ("a", "a") and r1["pair_count"] == 16


def test_bpe_no_cross_symbol_fusion(ray_session, tmp_path):
    """The whole-symbol merge corner: after rules (a,b) and (z,ab), the word
    'zabcq' holds symbols [zab, c, q] — a literal substring replace for rule
    (ab, c) would fire inside 'zab<SEP>c' and fuse across the symbol
    boundary, learning (zabc, q) instead of the canonical (c, q). Engine,
    reference trainer, and SQL oracle must all agree on the canonical rules."""
    texts = (["ab"] * 50) + (["zab"] * 30) + (["abc"] * 20) + (["zabcq"] * 10)
    # single doc per word keeps the corpus layout simple
    pq.write_table(pa.table({"text": pa.array(texts, pa.string())}),
                   tmp_path / "documents.parquet")
    out = q_bpe_merges(str(tmp_path)).to_pandas()
    ref = ref_bpe(texts, BPE_MERGES)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    rules = list(zip(out["w1"], out["w2"]))
    assert rules[0] == ("a", "b") and ("z", "ab") in rules
    assert ("zabc", "q") not in rules  # the fusion artifact must NOT appear

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = con.execute(sql_bpe_merges()).fetch_df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


def test_bpe_distributed_rounds_agree_with_local(ray_session, toy_sf):
    """Force the distributed K-round path (local_threshold=0) and require
    bit-identical rules to the gated driver fast path."""
    from geotrellis_server_ray.pipelines.registry import _bpe_train
    dist = _bpe_train(toy_sf, local_threshold=0)
    local = _bpe_train(toy_sf)
    assert dist == local and len(local) == BPE_MERGES


def ref_encode(texts: list[str], rules: pd.DataFrame):
    """Reference application: greedy-left merge of each rule in rank order
    over every word occurrence, then per-doc word/subtoken counts."""
    merges = list(zip(rules["w1"], rules["w2"]))
    rows = []
    for doc_id, t in enumerate(texts):
        words = [w for w in t.lower().split(" ") if w]
        n_sub = 0
        for w in words:
            syms = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n_sub += len(syms)
        rows.append((doc_id, len(words), n_sub))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_subtokens"])


def test_bpe_encode_matches_reference_and_oracle(ray_session, toy_sf):
    out = q_bpe_encode(toy_sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = ref_encode(TEXTS, ref_bpe(TEXTS, BPE_MERGES))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # subword merging must actually compress: fewer subtokens than chars
    n_chars = sum(len(w) for t in TEXTS for w in t.split(" ") if w)
    assert out["n_subtokens"].sum() < n_chars

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{toy_sf}/documents.parquet')")
    ora = con.execute(sql_bpe_encode()).fetch_df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


def test_bpe_early_stop_when_fully_merged(ray_session, tmp_path):
    """A corpus whose words fuse to single symbols before BPE_MERGES rounds:
    the engine stops early and returns only the rules that exist (the SQL
    oracle is undefined here — NULL replace — so the registry query is only
    ever run on corpora with enough structure; this guards the engine path)."""
    pq.write_table(pa.table({"text": pa.array(["ab ab ab", "ab"], pa.string())}),
                   tmp_path / "documents.parquet")
    out = q_bpe_merges(str(tmp_path)).to_pandas()
    assert list(out["merge_rank"]) == [1]
    assert (out.iloc[0]["w1"], out.iloc[0]["w2"],
            out.iloc[0]["pair_count"]) == ("a", "b", 4)
