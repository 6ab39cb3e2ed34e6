"""The WMS GetMap lifecycle (SURVEY.md §3.1) as a batch pipeline.

The reference serves one request at a time:
    params -> model.getLayer (catalog query) -> LayerExtent eval (bind vars,
    reify, interpret) -> histogram (cached) -> render(style) -> PNG bytes
    (ogc/.../wms/GetMap.scala:45-113)

Here a *batch of requests* streams through the same steps: requests are rows;
the layer catalog is evaluated per request batch with the query algebra; tile
state is synthesized/bound per request; the MAML expression evaluates
vectorized; the style renders; the PNG encoder produces the bytes column.
This is the shape a reference user's serving workload takes after switching
to the batch engine (tile-seeding / cache-warm jobs)."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import maml, render
from ..functions.histogram import FixedHistogram
from ..functions.query_algebra import eval_catalog, with_name
from ..stages.focal import TILE


def synth_requests(n: int) -> pa.Table:
    """Deterministic GetMap-style requests: (request_id, layer, tile x/y,
    style params)."""
    rid = np.arange(n, dtype=np.int64)
    fmts = np.array(["png", "jpg", "tif"], dtype=object)
    return pa.table({
        "request_id": pa.array(rid),
        "layer": pa.array(np.where(rid % 2 == 0, "ndvi", "red").astype(object), type=pa.string()),
        "x": pa.array((rid * 13) % 16),
        "y": pa.array((rid * 29) % 16),
        "format": pa.array(fmts[rid % 3], type=pa.string()),
    })


_CATALOG = pd.DataFrame({
    "name": ["ndvi", "red"],
    "xmin": [-180.0, -180.0], "ymin": [-85.0, -85.0],
    "xmax": [180.0, 180.0], "ymax": [85.0, 85.0],
    "event_time": pd.to_datetime([None, None]).astype("datetime64[us]"),
})


def _bands(x: int, y: int):
    col = np.arange(TILE, dtype=np.int64)
    gx = x * TILE + col[None, :]
    gy = y * TILE + col[:, None]
    red = ((gx * 64 + gy * 17) % 256).astype(np.float64)
    nir = ((gx * 31 + gy * 7) % 256).astype(np.float64)
    return red, nir


def getmap_batch(batch: pa.Table) -> pa.Table:
    """One fused stage = steps 2-7 of the GetMap trace for every request in
    the batch: catalog query, var binding, MAML eval, histogram-driven color
    ramp, render, PNG encode."""
    out_rid, out_fmt, out_len, out_crc = [], [], [], []
    rids = batch.column("request_id").to_numpy(zero_copy_only=False)
    layers = batch.column("layer").to_pylist()
    xs = batch.column("x").to_numpy(zero_copy_only=False)
    ys = batch.column("y").to_numpy(zero_copy_only=False)
    fmts = (batch.column("format").to_pylist() if "format" in batch.schema.names
            else ["png"] * len(batch))
    ramp = np.array([render.rgba(0, 0, 128), render.rgba(0, 128, 0),
                     render.rgba(255, 255, 0), render.rgba(255, 0, 0)], dtype=np.uint32)
    for rid, layer, x, y, fmt in zip(rids, layers, xs, ys, fmts):
        # step 2: catalog query (WmsModel.getLayer)
        hit = eval_catalog(with_name(layer), _CATALOG)
        if hit.empty:
            continue  # GetMapBadRequest path
        red, nir = _bands(int(x), int(y))
        env = {"red": maml.Tile.of(red), "nir": maml.Tile.of(nir)}
        # step 3: LayerExtent eval of the layer's expression
        expr = maml.ndvi_expr() if layer == "ndvi" else maml.var("red")
        tile = maml.evaluate(expr, env)
        # step 4: histogram for color breaks (LayerHistogram)
        h = FixedHistogram(-1.0, 256.0, 64).add(tile.to_float().ravel())
        vmin = h.bin_edge(int(np.argmax(h.counts > 0)))
        vmax = h.bin_edge(h.nbins - int(np.argmax(h.counts[::-1] > 0)))
        # step 6: render + format-dispatched encode (png/jpg/tif, S7)
        colors = render.color_ramp_render(tile.values.ravel(), vmin, vmax, ramp,
                                          nodata_mask=tile.mask.ravel())
        img = render.encode_image(colors, TILE, TILE, fmt=fmt)
        out_rid.append(int(rid))
        out_fmt.append(fmt)
        out_len.append(len(img))
        out_crc.append(zlib.crc32(img) & 0x7FFFFFFF)
    return pa.table({
        "request_id": pa.array(out_rid, type=pa.int64()),
        "format": pa.array(out_fmt, type=pa.string()),
        "img_len": pa.array(out_len, type=pa.int64()),
        "img_crc": pa.array(out_crc, type=pa.int64()),
    })


def getmap_requests(sf_dir: str, n: int = 256):
    """Rows-only registry query: n synthetic GetMap requests -> rendered PNG
    fingerprints. Deterministic (fixed zlib level, analytic tiles)."""
    import ray.data as rd

    ds = rd.from_arrow(synth_requests(n))
    return ds.map_batches(getmap_batch, batch_format="pyarrow")
