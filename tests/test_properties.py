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


def test_knn_ring_pruned_equals_brute_force(ray_session):
    """Ring-pruned kNN must ALWAYS equal brute force — including with a
    deliberately tiny ring (ring_k=1 at a fine level), where correctness is
    carried by the validation + unpruned fallback in knn(), not by the ring
    covering k candidates (ADVICE round-1 fix: the old ring path silently
    dropped true neighbors)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.stages.knn import knn, ring_safe_bound_m

    rng = np.random.default_rng(7)
    n = 4000
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    ds_tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "span_idx": pa.array(np.zeros(n, dtype=np.int64)),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })
    qids = np.arange(6, dtype=np.int64)
    qlon = np.array([-170.0, -60.0, 0.0, 45.0, 120.0, 179.5])
    qlat = np.array([-75.0, -30.0, 0.0, 30.0, 60.0, 79.0])
    queries = (qids, qlon, qlat)
    brute = knn(rd.from_arrow(ds_tbl), queries, k=5).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    for level, rk in [(2, 1), (4, 1), (6, 2)]:
        pruned = knn(rd.from_arrow(ds_tbl), queries, k=5, ring_level=level, ring_k=rk)
        pruned = pruned.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert brute[["query_id", "rank", "doc_id", "span_idx"]].equals(
            pruned[["query_id", "rank", "doc_id", "span_idx"]]), (level, rk)


def test_knn_ring_bound_is_conservative():
    """ring_safe_bound_m never exceeds the true distance to any point whose
    cell falls outside the ring (sampled check over random queries/points)."""
    from geotrellis_server_ray.functions import cells
    from geotrellis_server_ray.functions.geometry import haversine_m
    from geotrellis_server_ray.stages.knn import ring_safe_bound_m

    rng = np.random.default_rng(11)
    level, rk = 5, 2
    qlon = rng.uniform(-179, 179, 20)
    qlat = rng.uniform(-82, 82, 20)
    bound = ring_safe_bound_m(qlon, qlat, level, rk)
    qc = cells.cell_id(qlon, qlat, level)
    rings = cells.cell_ring(qc, level, rk)
    plon = rng.uniform(-180, 180, 5000)
    plat = rng.uniform(-85, 85, 5000)
    pc_ = cells.cell_id(plon, plat, level)
    for i in range(len(qlon)):
        outside = ~np.isin(pc_, rings[i])
        if outside.any():
            d = haversine_m(plon[outside], plat[outside],
                            np.full(outside.sum(), qlon[i]), np.full(outside.sum(), qlat[i]))
            assert d.min() >= bound[i] - 1e-6, (i, d.min(), bound[i])


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40), h=st.integers(1, 40),
    rps=st.integers(1, 17),
    comp=st.sampled_from(["none", "deflate"]),
    dtype=st.sampled_from(["u1", "u2", "i4", "f8"]),
    c0=st.integers(0, 39), r0=st.integers(0, 39),
    seed=st.integers(0, 2**31),
)
def test_tiff_window_roundtrip_property(tmp_path_factory, w, h, rps, comp, dtype, c0, r0, seed):
    """Any window of any written TIFF equals the numpy slice."""
    import numpy as np

    from geotrellis_server_ray.sources.tiff import parse_ifds, read_window, write_tiff

    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 100, (h, w)) if dtype == "f8"
           else rng.integers(0, 100, (h, w))).astype(np.dtype(dtype))
    raw = write_tiff(arr, compression=comp, rows_per_strip=min(rps, h))
    rd = lambda off, ln: raw[off : off + ln]
    info, = parse_ifds(rd)
    cw = min(5, w - min(c0, w - 1))
    ch = min(5, h - min(r0, h - 1))
    got = read_window(rd, info, min(c0, w - 1), min(r0, h - 1), cw, ch)[:, :, 0]
    want = arr[min(r0, h - 1) : min(r0, h - 1) + ch, min(c0, w - 1) : min(c0, w - 1) + cw]
    assert np.array_equal(got, want)


@settings(max_examples=20, deadline=None)
@given(lon=st.floats(-179.9, 179.9), lat=st.floats(-83.0, 83.0))
def test_utm_roundtrip_property(lon, lat):
    from geotrellis_server_ray.functions.proj import utm_forward, utm_inverse

    zone = int((lon + 180) // 6) + 1
    E, N = utm_forward(np.array([lon]), np.array([lat]), zone, north=lat >= 0)
    lon2, lat2 = utm_inverse(E, N, zone, north=lat >= 0)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31), q=st.integers(30, 95))
def test_jpeg_decodes_own_output_property(seed, q):
    from geotrellis_server_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
    # smooth image (random low-freq mixture): decoder must parse and bound err
    gy, gx = np.mgrid[0:h, 0:w]
    img = (127 + 90 * np.sin(gx / 9.0 + seed % 7) * np.cos(gy / 11.0)).clip(0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=q))
    assert back.shape == (h, w)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 12


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=8000))
def test_lzw_roundtrip_property(data):
    from geotrellis_server_ray.sources.tiff import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=4000))
def test_packbits_roundtrip_property(data):
    from geotrellis_server_ray.sources.tiff import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data)) == data


@settings(max_examples=20, deadline=None)
@given(lon=st.floats(-4.9, 9.9), lat=st.floats(41.1, 50.9))
def test_lcc_roundtrip_property(lon, lat):
    from geotrellis_server_ray.functions.proj import transform

    x, y = transform("EPSG:4326", "EPSG:2154", np.array([lon]), np.array([lat]))
    lon2, lat2 = transform("EPSG:2154", "EPSG:4326", x, y)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@settings(max_examples=20, deadline=None)
@given(lon=st.floats(-180.0, 180.0), lat=st.floats(55.0, 89.9))
def test_polar_stereo_roundtrip_property(lon, lat):
    from geotrellis_server_ray.functions.proj import transform

    x, y = transform("EPSG:4326", "EPSG:3413", np.array([lon]), np.array([lat]))
    lon2, lat2 = transform("EPSG:3413", "EPSG:4326", x, y)
    dl = abs((lon2[0] - lon + 180.0) % 360.0 - 180.0)
    assert dl < 1e-9 and abs(lat2[0] - lat) < 1e-9


def test_explode_reassemble_roundtrip_property():
    """For ANY text and ANY segment width: reassembling the exploded
    segments (no dedup in between) reproduces the original text exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from geotrellis_server_ray.stages.dedup import (
        explode_token_segments, reassemble_segments)

    texts = st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(texts=texts, w=st.integers(min_value=1, max_value=5))
    def run(texts, w):
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        segs = explode_token_segments(t, w=w)
        out = reassemble_segments(segs).sort_by("doc_id")
        assert out.column("text_scrubbed").to_pylist() == texts

    run()


def test_keep_first_rows_matches_pandas_property():
    """keep_first_rows == pandas sort + drop_duplicates(keep='first') on
    random multisets of short strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd
    import pyarrow as pa

    from geotrellis_server_ray.stages.dedup import keep_first_rows

    rows = st.lists(st.tuples(st.text(alphabet="xy", min_size=0, max_size=3),
                              st.integers(min_value=0, max_value=50)),
                    min_size=0, max_size=40)

    @settings(max_examples=60, deadline=None)
    @given(rows=rows)
    def run(rows):
        t = pa.table({"k": pa.array([r[0] for r in rows], pa.string()),
                      "doc_id": pa.array([r[1] for r in rows], pa.int64())})
        got = keep_first_rows(t, "k", ["doc_id"], ["doc_id", "k"]).to_pandas()
        want = (pd.DataFrame(rows, columns=["k", "doc_id"])
                .sort_values(["k", "doc_id"], kind="mergesort")
                .drop_duplicates("k", keep="first")[["doc_id", "k"]]
                .reset_index(drop=True))
        got = got.sort_values(["k"]).reset_index(drop=True)
        want = want.sort_values(["k"]).reset_index(drop=True)
        assert len(got) == len(want)
        if len(got):  # empty frames differ only in inferred dtypes
            assert got.equals(want)

    run()


def test_wav_roundtrip_property():
    """PCM16 WAV round trip is bit-exact for arbitrary sample arrays and
    rates (hypothesis over lengths incl. odd data-chunk alignment)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geotrellis_server_ray.functions.wav import decode_wav, encode_wav

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
           st.sampled_from([8000, 16000, 22050, 44100]))
    def check(vals, rate):
        s = np.array(vals, np.int16)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate and len(out) == len(s) and (out == s).all()

    check()


def test_semi_anti_join_string_keys(ray_session):
    """semi_anti_join probes string keys via sorted searchsorted — verify
    against a set-based replay, both gated paths."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.relational import semi_anti_join

    probe = pa.table({"k": pa.array(["a", "b", "c", "d", "e", "b"]),
                      "v": pa.array(range(6))})
    build = pa.table({"bk": pa.array(["b", "d", "d", "zz"])})
    for limit in (10, 0):  # broadcast path, then forced join fallback
        semi = semi_anti_join(rd.from_arrow(probe), "k",
                              rd.from_arrow(build), "bk",
                              anti=False, broadcast_limit=limit).to_pandas()
        anti = semi_anti_join(rd.from_arrow(probe), "k",
                              rd.from_arrow(build), "bk",
                              anti=True, broadcast_limit=limit).to_pandas()
        assert sorted(semi.k) == ["b", "b", "d"], limit
        assert sorted(anti.k) == ["a", "c", "e"], limit
        assert set(semi.columns) == {"k", "v"}
