"""Deterministic interleaved text+media document corpus.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
interleaved documents:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

No such corpus ships with the sandbox, so this module *synthesizes* one
deterministically from the driver's ``documents.parquet`` (one corpus doc per
driver doc row, seeded by the integer ``doc_id``) — every field is pure
integer arithmetic on ``(doc_id, span_idx)``, which lets the DuckDB oracle SQL
(pipelines/registry.py) re-derive the exact same rows, including the float
lon/lat geo anchors (k / 10000.0 is a correctly-rounded IEEE division in both
engines, so the doubles are bit-identical).

Geo anchors ride in ``media_ref`` (``mem://media/{i}/{j}#lon=..&lat=..``) as in
the input hint; text spans carry no anchor. 20% of docs (doc_id % 5 == 0)
cluster their anchors within +-0.1 deg of one of 5 hot centers — the hot-cell
skew the salting stages are tested against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# --- shared derivation constants (mirrored verbatim into oracle SQL) ---
KNUTH = 2654435761          # nspans hash multiplier
NSPANS_MOD = 8              # spans per doc in 1..8
LON_A, LON_B, LON_MOD, LON_OFF = 9176, 12345, 3598000, 1799000   # lon e-4 deg
LAT_A, LAT_B, LAT_MOD, LAT_OFF = 4243, 54321, 1700000, 850000    # lat e-4 deg
HOT_A, HOT_B, HOT_MOD, HOT_OFF = 13, 101, 2000, 1000             # +-0.1 deg jitter
TOK_A, TOK_B, TOK_MOD = 31, 7, 1000                              # text token id
OFFSET_STEP = 16
# 5 hot centers in 1e-4 deg (SF, Paris, Tokyo, London, Sydney)
HOT_LON = np.array([-1224194, 23522, 1396917, -1276, 1512093], dtype=np.int64)
HOT_LAT = np.array([377749, 488566, 356895, 515074, -338688], dtype=np.int64)

SPAN_STRUCT = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)
CORPUS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

_KINDS = ("text", "image", "text", "audio")  # cycle by span_idx % 4


def span_fields(doc_idx: np.ndarray, span_idx: np.ndarray):
    """Vectorized span field derivation for (doc_idx, span_idx) pairs.

    Returns dict of numpy arrays: kind_code (0=text,1=image,2=text,3=audio),
    text tokens ids, lon_i/lat_i (int 1e-4 deg; valid only for media spans),
    offset.
    """
    doc_idx = np.asarray(doc_idx, dtype=np.int64)
    span_idx = np.asarray(span_idx, dtype=np.int64)
    kind_code = (span_idx % 4).astype(np.int8)
    is_hot = (doc_idx % 5) == 0
    center = (doc_idx // 5) % 5
    lon_u = (doc_idx * LON_A + span_idx * LON_B) % LON_MOD - LON_OFF
    lat_u = (doc_idx * LAT_A + span_idx * LAT_B) % LAT_MOD - LAT_OFF
    jit_lon = (doc_idx * HOT_A + span_idx * HOT_B) % HOT_MOD - HOT_OFF
    jit_lat = (doc_idx * HOT_B + span_idx * HOT_A) % HOT_MOD - HOT_OFF
    lon_i = np.where(is_hot, HOT_LON[center] + jit_lon, lon_u)
    lat_i = np.where(is_hot, HOT_LAT[center] + jit_lat, lat_u)
    tok = (doc_idx * TOK_A + span_idx * TOK_B) % TOK_MOD
    offset = (span_idx * OFFSET_STEP).astype(np.int32)
    return {"kind_code": kind_code, "tok": tok, "lon_i": lon_i, "lat_i": lat_i, "offset": offset}


def nspans_of(doc_idx: np.ndarray) -> np.ndarray:
    return (1 + (np.asarray(doc_idx, dtype=np.int64) * KNUTH) % NSPANS_MOD).astype(np.int64)


def _fmt_e4(vals_i: np.ndarray) -> np.ndarray:
    """int 1e-4 degrees -> '%.4f'-style decimal strings, vectorized-ish."""
    neg = vals_i < 0
    a = np.abs(vals_i)
    whole = a // 10000
    frac = a % 10000
    return np.array(
        [f"{'-' if n else ''}{w}.{f:04d}" for n, w, f in zip(neg.tolist(), whole.tolist(), frac.tolist())],
        dtype=object,
    )


def build_spans_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: driver documents rows (needs ``doc_id``) -> corpus rows
    with the interleaved nested schema. Vectorized except media_ref string
    assembly (small fraction of spans, one format per media span)."""
    doc_idx = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ns = nspans_of(doc_idx)
    offsets = np.zeros(len(doc_idx) + 1, dtype=np.int32)
    np.cumsum(ns, out=offsets[1:])
    flat_doc = np.repeat(doc_idx, ns)
    flat_j = np.concatenate([np.arange(n, dtype=np.int64) for n in ns]) if len(ns) else np.array([], dtype=np.int64)
    f = span_fields(flat_doc, flat_j)
    is_media = f["kind_code"] != np.int8(0)
    is_media &= f["kind_code"] != np.int8(2)

    kind = np.array(_KINDS, dtype=object)[f["kind_code"]]
    text = np.where(is_media, "", np.char.add("tok", f["tok"].astype("U4")).astype(object))
    media_ref = np.full(len(flat_doc), "", dtype=object)
    if is_media.any():
        mi = np.nonzero(is_media)[0]
        lon_s = _fmt_e4(f["lon_i"][mi])
        lat_s = _fmt_e4(f["lat_i"][mi])
        d = flat_doc[mi].tolist()
        j = flat_j[mi].tolist()
        media_ref[mi] = [
            f"mem://media/{dd}/{jj}#lon={lo}&lat={la}" for dd, jj, lo, la in zip(d, j, lon_s, lat_s)
        ]

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(media_ref, type=pa.string()),
            pa.array(f["offset"], type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    doc_id_str = pa.array([f"doc-{i:08d}" for i in doc_idx.tolist()], type=pa.string())
    return pa.Table.from_arrays([doc_id_str, spans], schema=CORPUS_SCHEMA)


def corpus_dataset(sf_dir: str, *, override_num_blocks: int | None = None):
    """Lazy corpus Dataset over ``{sf_dir}/documents.parquet`` — prunes to the
    one needed column at the read, then builds the nested rows per batch."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"], **kwargs)
    return ds.map_batches(build_spans_batch, batch_format="pyarrow", batch_size=8192)


# ------------------------------------------------------------------ SQL twin

def spans_cte_sql() -> str:
    """DuckDB CTE producing the *exploded* spans exactly as the synthesizer +
    explode stage do: one row per (doc, span) with doc_id, span_idx, kind,
    text, media_ref, offset, and the lon/lat doubles for media spans."""
    hot_lon = " ".join(f"WHEN {i} THEN {v}" for i, v in enumerate(HOT_LON.tolist()))
    hot_lat = " ".join(f"WHEN {i} THEN {v}" for i, v in enumerate(HOT_LAT.tolist()))
    return f"""
spans_flat AS (
  SELECT
    d.doc_id AS doc_idx,
    printf('doc-%08d', d.doc_id) AS doc_id,
    CAST(j AS BIGINT) AS span_idx,
    CASE CAST(j AS BIGINT) % 4 WHEN 0 THEN 'text' WHEN 1 THEN 'image' WHEN 2 THEN 'text' ELSE 'audio' END AS kind,
    CASE WHEN CAST(j AS BIGINT) % 2 = 0
         THEN 'tok' || CAST((d.doc_id * {TOK_A} + CAST(j AS BIGINT) * {TOK_B}) % {TOK_MOD} AS VARCHAR)
         ELSE '' END AS text,
    CAST(CAST(j AS BIGINT) * {OFFSET_STEP} AS INTEGER) AS "offset",
    (CAST(j AS BIGINT) % 2) = 1 AS is_media,
    (CASE WHEN d.doc_id % 5 = 0
          THEN (CASE (d.doc_id // 5) % 5 {hot_lon} END)
               + ((d.doc_id * {HOT_A} + CAST(j AS BIGINT) * {HOT_B}) % {HOT_MOD} - {HOT_OFF})
          ELSE (d.doc_id * {LON_A} + CAST(j AS BIGINT) * {LON_B}) % {LON_MOD} - {LON_OFF}
     END) / 10000.0 AS lon,
    (CASE WHEN d.doc_id % 5 = 0
          THEN (CASE (d.doc_id // 5) % 5 {hot_lat} END)
               + ((d.doc_id * {HOT_B} + CAST(j AS BIGINT) * {HOT_A}) % {HOT_MOD} - {HOT_OFF})
          ELSE (d.doc_id * {LAT_A} + CAST(j AS BIGINT) * {LAT_B}) % {LAT_MOD} - {LAT_OFF}
     END) / 10000.0 AS lat
  FROM documents d,
       LATERAL unnest(generate_series(0, CAST((1 + (d.doc_id * {KNUTH}) % {NSPANS_MOD}) - 1 AS BIGINT))) AS u(j)
)"""
