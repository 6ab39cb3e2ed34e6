"""Hypothesis property tests — the randomized layer of the reference's test
strategy (HistogramHeuristicsTest-style), over the engine's own kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotrellis_server_ray.functions import cells, geometry, tiles

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats, zoom=st.integers(min_value=0, max_value=20))
def test_point_always_inside_its_tile(lon, lat, zoom):
    x, y = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), zoom)
    assert 0 <= x[0] < 2**zoom and 0 <= y[0] < 2**zoom
    xmin, ymin, xmax, ymax = tiles.tile_extent(x, y, zoom)
    wx, wy = tiles.lonlat_to_webmercator(np.array([lon]), np.array([lat]))
    eps = 1e-6 * max(1.0, abs(wx[0]), abs(wy[0]))
    assert xmin[0] - eps <= wx[0] <= xmax[0] + eps
    assert ymin[0] - eps <= wy[0] <= ymax[0] + eps


@settings(max_examples=200, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**20 - 1),
       y=st.integers(min_value=0, max_value=2**20 - 1))
def test_morton_bijective(x, y):
    code = cells.morton_encode(np.uint64(x), np.uint64(y))
    x2, y2 = cells.morton_decode(np.array([code]))
    assert (x2[0], y2[0]) == (x, y)


@settings(max_examples=50, deadline=None)
@given(level=st.integers(min_value=1, max_value=8), seed=st.integers(0, 2**16))
def test_hilbert_neighbors_property(level, seed):
    rng = np.random.default_rng(seed)
    n = 1 << level
    x = rng.integers(0, n, 50)
    y = rng.integers(0, n, 50)
    d = cells.hilbert_key(x, y, level)
    assert (d < np.uint64(n) * np.uint64(n)).all()
    # injective on distinct points
    pts = set(zip(x.tolist(), y.tolist()))
    assert len(set(d.tolist())) == len(pts)


@settings(max_examples=100, deadline=None)
@given(lon=lons, lat=lats, level=st.integers(min_value=1, max_value=16))
def test_cell_parent_prefix_property(lon, lat, level):
    c = cells.cell_id(np.array([lon]), np.array([lat]), level)
    p = cells.cell_id(np.array([lon]), np.array([lat]), level - 1)
    assert cells.cell_parent(c)[0] == p[0]


@settings(max_examples=100, deadline=None)
@given(
    cx=st.floats(-100, 100), cy=st.floats(-60, 60),
    r=st.floats(0.5, 20), k=st.integers(4, 10), seed=st.integers(0, 2**16),
)
def test_convex_polygon_centroid_covered(cx, cy, r, k, seed):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    poly = geometry.Polygon(cx + r * np.cos(ang), cy + r * np.sin(ang))
    # the vertex centroid of a convex polygon lies inside it
    gx, gy = poly.xs.mean(), poly.ys.mean()
    assert poly.covers_points(np.array([gx]), np.array([gy]))[0]
    # every vertex is covered (boundary-inclusive)
    assert poly.covers_points(poly.xs, poly.ys).all()
    # a point far outside is not
    assert not poly.covers_points(np.array([cx + 10 * r + 1]), np.array([cy]))[0]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e6, 1e6), st.floats(-1e6, 1e6),
                          st.floats(0.1, 1e5), st.floats(0.1, 1e5)),
                min_size=1, max_size=6))
def test_extent_fold_properties(rects):
    es = [geometry.Extent(x, y, x + w, y + h) for x, y, w, h in rects]
    u = geometry.union_extents(es)
    for e in es:
        assert u.xmin <= e.xmin and u.xmax >= e.xmax
        assert u.ymin <= e.ymin and u.ymax >= e.ymax
    i = geometry.intersect_extents(es)
    if i is not None:
        for e in es:
            assert i.xmin >= e.xmin - 1e-9 and i.xmax <= e.xmax + 1e-9
