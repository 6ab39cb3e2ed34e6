"""Corpus synthesizer + span stages: schema, determinism, span-sequence
invariant, SQL-twin bit-parity (the BASELINE.json input_hint contract)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geotrellis_server_ray.sources import corpus
from geotrellis_server_ray.stages import spans as span_stages


@pytest.fixture(scope="module")
def docs(sf_smoke):
    return pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id"])


@pytest.fixture(scope="module")
def corpus_tbl(docs):
    return corpus.build_spans_batch(docs)


def test_schema_matches_input_hint(corpus_tbl):
    assert corpus_tbl.schema.equals(corpus.CORPUS_SCHEMA)
    assert corpus_tbl.num_rows > 0


def test_deterministic(docs, corpus_tbl):
    again = corpus.build_spans_batch(docs)
    assert again.equals(corpus_tbl)


def test_offsets_strictly_increasing(corpus_tbl):
    for row in corpus_tbl.column("spans").to_pylist()[:200]:
        offs = [s["offset"] for s in row]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_span_sequence_invariant_through_explode(corpus_tbl):
    """Per-row span sequence (kind, text, media_ref, order) must survive the
    explode stage bit-for-bit: regrouping the flat rows by doc_id + span_idx
    reproduces the input nested rows exactly."""
    flat = span_stages.explode_spans(corpus_tbl)
    import pandas as pd

    fdf = flat.to_pandas().sort_values(["doc_id", "span_idx"])
    orig = corpus_tbl.to_pandas().set_index("doc_id")
    rebuilt = fdf.groupby("doc_id", sort=True).apply(
        lambda g: [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for k, t, m, o in zip(g["kind"], g["text"], g["media_ref"], g["offset"])
        ],
        include_groups=False,
    )
    for doc_id, seq in rebuilt.items():
        assert orig.loc[doc_id, "spans"].tolist() == seq, doc_id


def test_geo_parse_roundtrip_bitexact(corpus_tbl):
    flat = span_stages.explode_spans(corpus_tbl)
    geo = span_stages.parse_geo(flat)
    lon = geo.column("lon").to_pandas()
    media = geo.column("media_ref").to_pandas() != ""
    assert lon.notna().equals(media)
    # anchors are exact multiples of 1e-4 deg reconstructed via k/10000.0
    k = np.round(lon[media].values * 10000.0)
    assert np.array_equal(k / 10000.0, lon[media].values)


def test_sql_twin_bit_parity(sf_smoke, corpus_tbl):
    geo = span_stages.parse_geo(span_stages.explode_spans(corpus_tbl))
    r = geo.to_pandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_smoke}/documents.parquet')"
    )
    o = con.execute(
        "WITH " + corpus.spans_cte_sql()
        + " SELECT doc_id, span_idx, kind, text, is_media, \"offset\", lon, lat"
        + " FROM spans_flat ORDER BY doc_id, span_idx"
    ).fetch_df()
    assert len(o) == len(r)
    assert (o["kind"].values == r["kind"].values).all()
    assert (o["text"].values == r["text"].values).all()
    assert (o["offset"].values == r["offset"].values).all()
    m = o["is_media"].values.astype(bool)
    assert (r["lon"].notna().values == m).all()
    assert np.array_equal(r["lon"].values[m], o["lon"].values[m])  # bit-exact
    assert np.array_equal(r["lat"].values[m], o["lat"].values[m])


def test_corpus_dataset_streams(ray_session, sf_smoke):
    ds = corpus.corpus_dataset(sf_smoke)
    assert ds.count() == 500
    assert ds.schema().names == ["doc_id", "spans"]


def test_hot_skew_present(corpus_tbl):
    """20% of docs cluster near 5 hot centers -> top cells are heavy."""
    from geotrellis_server_ray.functions import cells

    geo = span_stages.parse_geo(span_stages.explode_spans(corpus_tbl))
    t = span_stages.assign_tiles(geo, zoom=12, cell_level=7)  # cell ~2.8 deg: cluster fits in one
    cid = t.column("cell_id").to_numpy(zero_copy_only=False)
    _, counts = np.unique(cid, return_counts=True)
    assert counts.max() >= 20  # hot cells exist
    assert np.median(counts) <= 2  # most cells are cold


def test_span_sequence_survives_parquet_roundtrip(ray_session, sf_smoke, corpus_tbl, tmp_path):
    """The per-row span-sequence invariant through a full write->read cycle
    (the storage boundary the 100TB pipeline crosses between every stage)."""
    import ray.data as rd

    from geotrellis_server_ray.sources.corpus import corpus_dataset

    out = str(tmp_path / "corpus_rt")
    corpus_dataset(sf_smoke).write_parquet(out)
    back = rd.read_parquet(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = corpus_tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(orig)
    for a, b in zip(orig["spans"], back["spans"]):
        assert list(a) == list(b)  # (kind, text, media_ref, offset) per span, in order


def test_flagship_plan_has_no_all_to_all(ray_session, sf_smoke):
    """The headline path must stay a fused streaming map chain — any
    accidental shuffle/materialization would show up as an AllToAll operator
    in the executed plan stats."""
    from geotrellis_server_ray.pipelines.geo import flagship

    ds = flagship(sf_smoke)
    m = ds.materialize()
    stats = m.stats()
    assert "AllToAll" not in stats
    assert "Sort" not in stats.split("Operator")[1] if "Operator" in stats else True
