"""Golden tests for the geo kernel — everything downstream depends on these.

Goldens are hand-checked slippy/WebMercator values (public formulas), NOT
copied from the reference; semantics mirror ZoomedLayoutScheme(WebMercator,
256) per SURVEY.md §2 C7 / §3.2.
"""

import numpy as np
import pytest

from geotrellis_server_ray.functions import cells, geometry, tiles


def test_lonlat_webmercator_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.9, 179.9, 1000)
    lat = rng.uniform(-85.0, 85.0, 1000)
    x, y = tiles.lonlat_to_webmercator(lon, lat)
    lon2, lat2 = tiles.webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)


def test_known_tile_keys():
    # slippy-map convention goldens (computed by hand from the formula)
    # (lon, lat, z) -> (x, y); row 0 at north
    cases = [
        (0.0, 0.0, 1, 1, 1),            # just SE of the origin
        (-180.0, 0.0, 1, 0, 1),
        (13.377778, 52.516389, 17, 70406, 42987),  # Brandenburg Gate, OSM wiki example
        (-122.4194, 37.7749, 12, 655, 1583),       # San Francisco
    ]
    for lon, lat, z, ex, ey in cases:
        x, y = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
        assert (x[0], y[0]) == (ex, ey), (lon, lat, z, x[0], y[0])


def test_tile_extent_world():
    # zoom 0: the single tile is the whole world extent
    xmin, ymin, xmax, ymax = tiles.tile_extent(np.array([0]), np.array([0]), 0)
    assert xmin[0] == -tiles.WORLD and xmax[0] == tiles.WORLD
    assert ymin[0] == -tiles.WORLD and ymax[0] == tiles.WORLD
    # zoom 1 tile (1,0) is the NE quadrant
    xmin, ymin, xmax, ymax = tiles.tile_extent(np.array([1]), np.array([0]), 1)
    assert xmin[0] == 0.0 and ymin[0] == 0.0
    assert xmax[0] == tiles.WORLD and ymax[0] == tiles.WORLD


def test_tile_extent_contains_its_point():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    for z in (4, 9, 14):
        x, y = tiles.lonlat_to_tile(lon, lat, z)
        xmin, ymin, xmax, ymax = tiles.tile_extent(x, y, z)
        wx, wy = tiles.lonlat_to_webmercator(lon, lat)
        eps = 1e-6
        assert ((wx >= xmin - eps) & (wx <= xmax + eps)).all()
        assert ((wy >= ymin - eps) & (wy <= ymax + eps)).all()


def test_cell_size_and_zoom_selection():
    assert tiles.tile_cell_size(0) == pytest.approx(2 * tiles.WORLD / 256)
    # each zoom halves the cell size
    assert tiles.tile_cell_size(5) == pytest.approx(tiles.tile_cell_size(4) / 2)
    cs = tiles.tile_cell_size(7)
    assert tiles.zoom_for_cell_size(cs) == 7
    assert tiles.zoom_for_cell_size(cs * 1.01) == 7
    assert tiles.zoom_for_cell_size(cs * 0.99) == 8


def test_morton_roundtrip_and_prefix():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**16, 1000)
    y = rng.integers(0, 2**16, 1000)
    code = cells.morton_encode(x.astype(np.uint64), y.astype(np.uint64))
    x2, y2 = cells.morton_decode(code)
    assert np.array_equal(x, x2) and np.array_equal(y, y2)
    # parent = 2-bit prefix
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    c12 = cells.cell_id(lon, lat, 12)
    c11 = cells.cell_id(lon, lat, 11)
    assert np.array_equal(cells.cell_parent(c12), c11)


def test_cell_ring():
    c = cells.cell_id(np.array([10.0]), np.array([50.0]), 10)
    ring = cells.cell_ring(c, 10, k=1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]
    xs, ys = cells.morton_decode(ring[0])
    x0, y0 = cells.morton_decode(c)
    assert set(xs.tolist()) == {x0[0] - 1, x0[0], x0[0] + 1}
    assert set(ys.tolist()) == {y0[0] - 1, y0[0], y0[0] + 1}


def test_hilbert_locality_and_bijection():
    n = 1 << 5
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    d = cells.hilbert_key(xx.ravel(), yy.ravel(), 5)
    assert len(np.unique(d)) == n * n  # bijective
    # consecutive d are grid neighbors (the defining property)
    order = np.argsort(d)
    x_s, y_s = xx.ravel()[order], yy.ravel()[order]
    step = np.abs(np.diff(x_s)) + np.abs(np.diff(y_s))
    assert (step == 1).all()


def test_halo_expand_is_single_neighbor_impl():
    """The 3x3 key expansion lives only in stages/focal.halo_expand; verify
    its owner set and tag convention here (sender position in owner grid)."""
    import pyarrow as pa

    from geotrellis_server_ray.stages.focal import halo_expand

    t = pa.table({"x": pa.array([5], type=pa.int64()), "y": pa.array([5], type=pa.int64()),
                  "cells": pa.array([[1.0]], type=pa.list_(pa.float64()))})
    out = halo_expand(t)
    assert out.num_rows == 9
    owners = sorted(zip(out.column("ox").to_pylist(), out.column("oy").to_pylist()))
    assert owners == sorted((5 + dx, 5 + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    # the copy sent to owner (6, 6) has the sender at grid position (0, 0) -> tag 0
    for ox, oy, tag in zip(out.column("ox").to_pylist(), out.column("oy").to_pylist(),
                           out.column("tag").to_pylist()):
        dx, dy = ox - 5, oy - 5
        assert tag == (1 - dy) * 3 + (1 - dx)
    # grid clipping at the edge
    t0 = pa.table({"x": pa.array([0], type=pa.int64()), "y": pa.array([0], type=pa.int64()),
                   "cells": pa.array([[1.0]], type=pa.list_(pa.float64()))})
    out0 = halo_expand(t0, grid_n=16)
    assert out0.num_rows == 4  # only owners with ox,oy in [0,16)


def test_extent_ops_order_independent():
    # mirrors ExtentMergeStrategyTest's permutation property
    import itertools

    es = [geometry.Extent(0, 0, 10, 10), geometry.Extent(5, 5, 15, 15), geometry.Extent(8, 2, 12, 9)]
    inters = [geometry.intersect_extents(list(p)) for p in itertools.permutations(es)]
    assert all(i == inters[0] for i in inters)
    assert inters[0] == geometry.Extent(8, 5, 10, 9)
    unions = [geometry.union_extents(list(p)) for p in itertools.permutations(es)]
    assert all(u == geometry.Extent(0, 0, 15, 15) for u in unions)
    # disjoint -> None
    assert geometry.intersect_extents([geometry.Extent(0, 0, 1, 1), geometry.Extent(2, 2, 3, 3)]) is None


def test_polygon_covers_points():
    # unit square: inside, outside, boundary (covers = inclusive)
    sq = geometry.Polygon([0, 1, 1, 0], [0, 0, 1, 1])
    px = np.array([0.5, 2.0, 0.0, 1.0, 0.5])
    py = np.array([0.5, 0.5, 0.0, 1.0, 0.0])
    got = sq.covers_points(px, py)
    assert got.tolist() == [True, False, True, True, True]
    # triangle
    tri = geometry.Polygon([0, 4, 0], [0, 0, 4])
    px = np.array([1.0, 3.0, 2.0, 1.9])
    py = np.array([1.0, 3.0, 2.0, 2.0])
    assert tri.covers_points(px, py).tolist() == [True, False, True, True]


def test_haversine():
    # Paris -> London ~ 343-344 km
    d = geometry.haversine_m(2.3522, 48.8566, -0.1276, 51.5074)
    assert 341_000 < d < 346_000
    assert geometry.haversine_m(10.0, 50.0, 10.0, 50.0) == 0.0


def test_pip_edge_point_matches_both_features():
    """A point exactly on a shared grid-zone edge is covered by BOTH
    rectangles (boundary-inclusive covers) — and the SQL oracle's BETWEEN
    join duplicates it identically."""
    from geotrellis_server_ray.sources.layers import grid_zone_features
    from geotrellis_server_ray.state.broadcast import GridIndex

    idx = GridIndex(grid_zone_features())
    # internal edge lon=-150 (between grid cols 0 and 1), inside row 0
    pt, ft = idx.probe(np.array([-150.0]), np.array([-45.0]))
    assert len(ft) == 2
    fids = sorted(idx.features[i].feature_id for i in ft)
    assert fids == [0, 1]
    # corner point -> four features
    pt, ft = idx.probe(np.array([-150.0]), np.array([-30.0]))
    assert len(ft) == 4


def test_rasterize_cell_center_rule():
    """Burn-mask semantics: a cell burns iff its CENTER is inside the closed
    rect; span math and mask stats agree with a brute-force center check."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.stages.rasterize import (_xf, _yf, burn_batch,
                                                        candidates_batch,
                                                        rect_cell_span)

    zoom, T = 3, 8           # 64x64 cell world
    n = (1 << zoom) * T
    rect = (-30.0, -20.0, 41.0, 17.0)
    gx0, gx1, gy0, gy1 = rect_cell_span(*rect, zoom, T)
    # brute force: every world cell center through the forward formulas
    import math
    burned = set()
    for gx in range(n):
        for gy in range(n):
            cx = (gx + 0.5)
            cy = (gy + 0.5)
            if (_xf(rect[0], n) <= cx <= _xf(rect[2], n)
                    and _yf(rect[3], n) <= cy <= _yf(rect[1], n)):
                burned.add((gx, gy))
    want_span = {(gx, gy) for gx in range(gx0, gx1 + 1)
                 for gy in range(gy0, gy1 + 1)}
    assert burned == want_span

    feats = pa.table({"layer_name": pa.array(["L"], pa.string()),
                      "feature_id": pa.array([7], pa.int64()),
                      "x0": [rect[0]], "y0": [rect[1]],
                      "x1": [rect[2]], "y1": [rect[3]]})
    cands = candidates_batch(feats, zoom, T)
    out = burn_batch(cands, zoom, T).to_pandas()
    assert out["n_cells"].sum() == len(burned)
    want_hash = sum(31 * gx + 17 * gy for gx, gy in burned)
    assert out["burn_hash"].sum() == want_hash


def test_focal_stats_nodata_semantics():
    """mean/max/min EXCLUDE NoData from the window (geotrellis focal rule);
    output NoData only for all-NoData windows; aspect masks like slope."""
    import numpy as np

    from geotrellis_server_ray.functions.focal import focal_stats

    z = np.arange(16, dtype=float).reshape(4, 4)
    mask = np.zeros((4, 4), bool)
    mask[0, 0] = True                    # corner NoData
    v, m = focal_stats(z, mask)
    # window of output (0,0) = cells z[0:3,0:3] minus the masked corner
    win = z[0:3, 0:3].ravel()[1:]
    assert np.isclose(v[0, 0, 0], win.sum() / 8)  # mean excludes the NoData cell
    assert v[1, 0, 0] == win.max() and v[2, 0, 0] == win.min()
    assert not m[0, 0, 0] and bool(m[3, 0, 0])  # aspect masked, stats not
    full = np.ones((4, 4), bool)
    v2, m2 = focal_stats(z, full)
    assert m2.all()


def test_rasterize_empty_span_at_domain_edge():
    """Review finding r4: a rect whose raw span is empty (e.g. a sliver
    abutting the west edge) must burn NOTHING — emptiness is decided on the
    raw span BEFORE clipping, in both the kernel and the SQL CTE."""
    import duckdb

    from geotrellis_server_ray.stages.rasterize import rect_cell_span

    zoom, T = 6, 8
    gx0, gx1, gy0, gy1 = rect_cell_span(-180.0, 0.0, -179.9, 0.1, zoom, T)
    # 0.1 deg < one z6 cell (0.703 deg): span may be empty depending on
    # alignment; at the west edge xf(-180)=0 -> gx_lo=0, gx_hi=ceil(0.142-0.5)-1=-1
    assert gx1 < gx0  # empty

    # the shared SQL CTE must agree: zero cells for the same sliver
    from geotrellis_server_ray.pipelines.registry import _zone_cells_cte

    n = (1 << zoom) * T
    cte = _zone_cells_cte(n)
    sliver = "('t', 0, -180.0e0, 0.0e0, -179.9e0, 0.1e0)"
    import re
    cte_s = re.sub(r"AS \(VALUES .*?\),\nraw AS", f"AS (VALUES {sliver}),\nraw AS",
                   cte, count=1, flags=re.S)
    rows = duckdb.connect().execute(cte_s + " SELECT count(*) FROM cells").fetchone()
    assert rows[0] == 0


def test_geohash_known_vectors():
    """The quantize-and-interleave geohash equals the classic bisection
    algorithm on the published test vectors (geohash.org examples)."""
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.pipelines.registry import (
        GEOHASH_BASE32, GEOHASH_CHARS)
    from geotrellis_server_ray.functions import cells

    def gh6(lon, lat):
        lon_q = np.minimum(np.floor((np.array([lon]) + 180.0) / 360.0 * 32768.0),
                           32767.0).astype(np.uint64)
        lat_q = np.minimum(np.floor((np.array([lat]) + 90.0) / 180.0 * 32768.0),
                           32767.0).astype(np.uint64)
        g = (cells._part1by1(lon_q) << np.uint64(1)) | cells._part1by1(lat_q)
        return "".join(GEOHASH_BASE32[int((g[0] >> np.uint64(25 - 5 * i)) & np.uint64(31))]
                       for i in range(GEOHASH_CHARS))

    assert gh6(10.40744, 57.64911) == "u4pruy"   # Jutland
    assert gh6(-5.6, 42.6).startswith("ezs42")   # León
    assert gh6(0.0, 0.0) == "s00000"
    assert gh6(180.0, 90.0) == "zzzzzz"          # clamp at the domain edge
    assert gh6(-180.0, -90.0) == "000000"


def test_funnel_strictly_after_semantics():
    """Stage advances only on events STRICTLY after the prior stage's
    timestamp: a click at exactly the first-view instant does not count,
    and an out-of-order purchase (before the click) does not count."""
    import numpy as np
    import pyarrow as pa

    import geotrellis_server_ray.pipelines.registry as R

    ts = pa.array(np.array([1000, 1000, 2000, 1500], dtype="datetime64[us]"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": ts,
        "event_type": pa.array(["view", "click", "click", "purchase"]),
        "part": pa.array([0, 0, 0, 0], pa.int64()),
    })
    # reach stage 2 via the ts=2000 click (ts=1000 click is simultaneous
    # with the view -> ignored); the ts=1500 purchase precedes that click
    # -> stage stays 2
    import duckdb

    con = duckdb.connect()
    con.register("events", t.select(["user_id", "ts", "event_type"]))
    ref = con.execute(R.sql_funnel_stages()).fetch_df()
    assert ref.loc[0, "stage"] == 2
