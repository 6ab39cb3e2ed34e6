"""Span explode + geo-anchor parse + tile/cell assignment stages.

These are the per-document transforms of the engine's canonical path — the
batch analog of the reference's per-request WMTS tile reification
(TiledOgcLayer.scala:97-114: source.reproject(WebMercator).tileToLayout(
layout).read(SpatialKey(x, y))), run in reverse dataflow: every media span's
geo anchor -> WebMercator -> (zoom, x, y) SpatialKey + quadtree cell id.

All stages are stateless ``map_batches`` functions, Arrow in / Arrow out
(batch_format="pyarrow", zero-copy from the object store); the per-batch body
is pyarrow.compute / numpy only — no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells, tiles

GEO_RE = r"#lon=(?P<lon>-?[0-9]+\.[0-9]+)&lat=(?P<lat>-?[0-9]+\.[0-9]+)"


def explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) -> one row per span, preserving in-doc order via an
    explicit ``span_idx`` rank column (the engine's answer to Ray's unordered
    block execution — SURVEY.md §2.10: every order-sensitive step carries a
    rank column)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = spans.flatten()
    # span_idx = position within the parent list
    offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    span_idx = np.arange(len(flat), dtype=np.int64) + offs[0] - np.repeat(offs[:-1], np.diff(offs))
    doc_id = batch.column("doc_id").take(parent)
    return pa.Table.from_arrays(
        [
            doc_id,
            pa.array(span_idx, type=pa.int64()),
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
        ],
        names=["doc_id", "span_idx", "kind", "text", "media_ref", "offset"],
    )


def parse_geo(batch: pa.Table) -> pa.Table:
    """Extract (lon, lat) doubles from ``media_ref`` geo anchors. Non-media
    spans (no anchor) get nulls. Arrow extract_regex + cast — the string ->
    double parse is correctly rounded, so anchors round-trip bit-exact with
    the synthesizer's k/10000.0 doubles."""
    m = pc.extract_regex(batch.column("media_ref"), GEO_RE)
    lon = pc.cast(pc.struct_field(m, "lon"), pa.float64())
    lat = pc.cast(pc.struct_field(m, "lat"), pa.float64())
    return batch.append_column("lon", lon).append_column("lat", lat)


def assign_tiles(batch: pa.Table, *, zoom: int, cell_level: int = cells.DEFAULT_CELL_LEVEL,
                 with_hilbert: bool = False) -> pa.Table:
    """Add (zoom, x, y, cell_id) for rows with a geo anchor; anchored rows
    only survive (media spans). The WMS/WMTS SpatialKey assignment —
    GeoTiffNode.scala:60-63 / GeotrellisTileMatrix.scala:37-49 semantics.

    ``with_hilbert`` adds the Hilbert range-partition key — opt-in because it
    costs ~2x the tile+cell assignment and only the range-partitioned sinks
    consume it."""
    batch = batch.filter(pc.is_valid(batch.column("lon")))
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    x, y = tiles.lonlat_to_tile(lon, lat, zoom)
    cid = cells.cell_id(lon, lat, cell_level)
    n = len(batch)
    batch = (
        batch.append_column("zoom", pa.array(np.full(n, zoom, dtype=np.int8)))
        .append_column("x", pa.array(x, type=pa.int32()))
        .append_column("y", pa.array(y, type=pa.int32()))
        .append_column("cell_id", pa.array(cid, type=pa.uint64()))
    )
    if with_hilbert:
        hk = cells.hilbert_key(x.astype(np.int64), y.astype(np.int64), zoom)
        batch = batch.append_column("hilbert", pa.array(hk, type=pa.uint64()))
    return batch


def wfs_features_batch(batch: pa.Table) -> pa.Table:
    """S9: WFS-style feature output — each anchored span becomes a feature
    whose geometry is its grid-cell polygon (the point snapped to the cell it
    falls in, then emitted as that cell's bbox polygon — the reference's
    point -> cell-polygon construction, ogc/.../wfs/WfsFeatureCollection.scala:82-92).
    Emits a GeoJSON-ish struct column."""
    batch = add_tile_extents(batch)
    feat = pa.StructArray.from_arrays(
        [
            batch.column("doc_id").combine_chunks(),
            pc.cast(batch.column("span_idx"), pa.int64()).combine_chunks(),
            batch.column("tile_xmin").combine_chunks(),
            batch.column("tile_ymin").combine_chunks(),
            batch.column("tile_xmax").combine_chunks(),
            batch.column("tile_ymax").combine_chunks(),
        ],
        names=["id", "span", "xmin", "ymin", "xmax", "ymax"],
    )
    return batch.append_column("feature", feat)


def add_tile_extents(batch: pa.Table) -> pa.Table:
    """Tile key -> WebMercator extent columns (mapTransform semantics,
    GeoTiffNode.scala:88). Zoom is read per row, so mixed-zoom batches
    (multi-level pyramids) compute each row's extent at its own zoom."""
    x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
    y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
    zoom = batch.column("zoom").to_numpy(zero_copy_only=False).astype(np.float64)
    w = (2.0 * tiles.WORLD) / np.exp2(zoom)
    xmin = -tiles.WORLD + x * w
    ymax = tiles.WORLD - y * w
    for name, arr in (("tile_xmin", xmin), ("tile_ymin", ymax - w),
                      ("tile_xmax", xmin + w), ("tile_ymax", ymax)):
        batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
    return batch
