"""Sampling heuristics (HistogramHeuristicsTest-style properties), LRU/tile
caches, extended-param AST binding, WFS feature builder."""

import numpy as np
import pyarrow as pa

from geotrellis_server_ray.functions import maml, sampling
from geotrellis_server_ray.functions.geometry import Extent
from geotrellis_server_ray.state.caches import CachedTileReader, HeaderByteCache, LruCache


def test_sample_windows_inside_extent_and_budget():
    """1000 random extents: corner windows stay inside the source extent and
    the total sampled cells respect max_cells (HistogramHeuristicsTest
    .scala:30-72)."""
    rng = np.random.default_rng(42)
    for _ in range(1000):
        x0, y0 = rng.uniform(-1e6, 1e6, 2)
        w, h = rng.uniform(10, 1e5, 2)
        e = Extent(x0, y0, x0 + w, y0 + h)
        cs = (rng.uniform(0.1, 50), rng.uniform(0.1, 50))
        max_cells = int(rng.integers(16, 100_000))
        corners = sampling.sample_raster_extent(e, cs, max_cells)
        total = 0.0
        for c in corners:
            assert c.xmin >= e.xmin - 1e-9 and c.xmax <= e.xmax + 1e-9
            assert c.ymin >= e.ymin - 1e-9 and c.ymax <= e.ymax + 1e-9
            total += sampling.cells_in(c, cs)
        assert total <= max_cells + 4  # rounding slack, as in the reference test


def test_cell_size_choices():
    sizes = [(10.0, 10.0), (5.0, 5.0), (30.0, 2.0)]
    assert sampling.choose_largest_cell_size(sizes) == (10.0, 10.0)
    assert sampling.choose_smallest_cell_size(sizes) == (5.0, 5.0)


def test_extent_buffer_and_axis_swap():
    e = Extent(0, 10, 2, 20)
    b = e.buffer(0.5)
    assert (b.xmin, b.ymin, b.xmax, b.ymax) == (-0.5, 9.5, 2.5, 20.5)
    s = e.swap_axes()
    assert (s.xmin, s.ymin, s.xmax, s.ymax) == (10, 0, 20, 2)


def test_lru_cache_eviction_and_stats():
    c = LruCache(2)
    assert c.get_or_compute("a", lambda: 1) == 1
    assert c.get_or_compute("a", lambda: 99) == 1  # hit keeps original
    c.get_or_compute("b", lambda: 2)
    c.get_or_compute("c", lambda: 3)  # evicts "a" (LRU)
    assert c.get_or_compute("a", lambda: 4) == 4
    assert c.hits == 1 and c.misses == 4


def test_cached_tile_reader_amortizes_loads():
    loads = []
    r = CachedTileReader(lambda k: loads.append(k) or np.zeros(4), capacity=10)
    for _ in range(5):
        r.get(("layer", 3, 1, 2))
    assert len(loads) == 1
    assert r.cache_stats() == {"hits": 4, "misses": 1, "size": 1}


def test_header_byte_cache():
    calls = []

    def read_range(uri, off, ln):
        calls.append((uri, off, ln))
        return bytes(range(256)) * ((ln + 255) // 256)

    h = HeaderByteCache(read_range, prefix=1024)
    a = h.read("u", 0, 16)
    b = h.read("u", 16, 16)
    assert len(calls) == 1  # both served from one prefix fetch
    assert a == bytes(range(16)) and b == bytes(range(16, 32))
    h.read("u", 5000, 10)
    assert len(calls) == 2  # beyond prefix -> passthrough


def test_bind_extended_params():
    expr = {"symbol": "focal_hillshade", "azimuth": 315.0, "altitude": 45.0,
            "z_factor": 1.0, "args": [{"symbol": "clamp", "min": 0, "max": 100,
                                       "args": [maml.var("dem")]}]}
    bound = maml.bind_extended_params(expr, {"azimuth": 200, "altitude": 30,
                                             "clampMin": 5, "clampMax": 50,
                                             "target": "data"})
    assert bound["azimuth"] == 200.0 and bound["altitude"] == 30.0
    assert bound["target"] == "data"
    assert bound["args"][0]["min"] == 5.0 and bound["args"][0]["max"] == 50.0
    # original untouched nodes preserved
    assert bound["z_factor"] == 1.0
    assert bound["args"][0]["args"][0] == maml.var("dem")


def test_wfs_features():
    from geotrellis_server_ray.sources.corpus import build_spans_batch
    from geotrellis_server_ray.stages import spans as S

    docs = pa.table({"doc_id": pa.array(range(20), type=pa.int64())})
    t = S.assign_tiles(S.parse_geo(S.explode_spans(build_spans_batch(docs))), zoom=12)
    f = S.wfs_features_batch(t)
    feat = f.column("feature")[0].as_py()
    assert set(feat) == {"id", "span", "xmin", "ymin", "xmax", "ymax"}
    assert feat["xmax"] > feat["xmin"] and feat["ymax"] > feat["ymin"]
    # cell polygon contains the span's anchor point
    from geotrellis_server_ray.functions.tiles import lonlat_to_webmercator

    wx, wy = lonlat_to_webmercator(f.column("lon")[0].as_py(), f.column("lat")[0].as_py())
    assert feat["xmin"] <= wx <= feat["xmax"] and feat["ymin"] <= wy <= feat["ymax"]
