"""Renderer + OgcTime + resample + histogram goldens — mirroring
InterpolatedColorMapSpec.scala:26-70 (exact midpoint lerp, clip policies),
OgcTime merge semantics, and resample kernels."""

import numpy as np
import pandas as pd
import pytest

from geotrellis_server_ray.functions import histogram as H
from geotrellis_server_ray.functions import ogctime as OT
from geotrellis_server_ray.functions import render as R
from geotrellis_server_ray.functions import resample as RS


# ------------------------------------------------------------------ render

def test_interpolated_midpoint_exact():
    """The reference golden (InterpolatedColorMapSpec.scala:39-49): poles
    (-100 -> (255,0,0,100), 0 -> (0,255,0,100), 100 -> (0,0,255,100)),
    interpolate(50.0) == (0,127,127,100) — toInt truncation, not rounding."""
    cm = R.InterpolatedColorMap({-100.0: R.rgba(255, 0, 0, 100),
                                 0.0: R.rgba(0, 255, 0, 100),
                                 100.0: R.rgba(0, 0, 255, 100)})
    assert cm.render(np.array([50.0]))[0] == R.rgba(0, 127, 127, 100)
    out = cm.render(np.array([-100.0, 100.0]))
    assert out.tolist() == [R.rgba(255, 0, 0, 100), R.rgba(0, 0, 255, 100)]


def test_interpolated_clip_policies():
    """Golden semantics from InterpolatedColorMapSpec.scala:51-75: ClipNone
    EXTENDS edge colors beyond the range; ClipLeft/Right/Both make the named
    side(s) transparent."""
    lo, hi = R.rgba(255, 0, 0), R.rgba(0, 0, 255)
    poles = {0.0: lo, 10.0: hi}
    v = np.array([-1e9, 1e9])
    assert R.InterpolatedColorMap(poles, "none").render(v).tolist() == [lo, hi]
    assert R.InterpolatedColorMap(poles, "left").render(v).tolist() == [0, hi]
    assert R.InterpolatedColorMap(poles, "right").render(v).tolist() == [lo, 0]
    assert R.InterpolatedColorMap(poles, "both").render(v).tolist() == [0, 0]


def test_nan_renders_transparent_without_mask():
    cm = R.InterpolatedColorMap({0.0: R.rgba(255, 0, 0), 10.0: R.rgba(0, 0, 255)})
    assert cm.render(np.array([np.nan]))[0] == 0
    ramp = np.array([R.rgba(1, 1, 1), R.rgba(2, 2, 2)], dtype=np.uint32)
    out = R.color_ramp_render(np.array([np.nan]), 0.0, 1.0, ramp, clamp_with_color=True)
    assert out[0] == 0


def test_nodata_transparent():
    cm = R.InterpolatedColorMap({0.0: R.rgba(0, 0, 0), 1.0: R.rgba(255, 255, 255)})
    out = cm.render(np.array([0.5, 0.5]), nodata_mask=np.array([False, True]))
    assert out[1] == 0 and out[0] != 0


def test_color_ramp_out_of_range():
    ramp = np.array([R.rgba(0, 0, 0), R.rgba(100, 100, 100), R.rgba(255, 255, 255)], dtype=np.uint32)
    out = R.color_ramp_render(np.array([-5.0, 0.0, 50.0, 100.0, 200.0]), 0.0, 100.0, ramp)
    assert out[0] == 0 and out[4] == 0  # transparent outside range
    assert out[1] == ramp[0] and out[3] == ramp[2]
    out = R.color_ramp_render(np.array([-5.0, 200.0]), 0.0, 100.0, ramp, clamp_with_color=True)
    assert out.tolist() == [ramp[0], ramp[2]]


def test_png_encoder_valid():
    import struct
    import zlib

    colors = np.full(16, R.rgba(10, 20, 30, 255), dtype=np.uint32)
    png = R.encode_png_rgba(colors, 4, 4)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and check first pixel bytes
    idat_at = png.index(b"IDAT")
    ln = struct.unpack(">I", png[idat_at - 4 : idat_at])[0]
    raw = zlib.decompress(png[idat_at + 4 : idat_at + 4 + ln])
    assert raw[0] == 0  # filter byte
    assert list(raw[1:5]) == [10, 20, 30, 255]


def test_png_stored_encoder_decodes_identically():
    """encode_png_rgba_stored (zlib STORED blocks — the SQL-replayable
    GetMap CRC-oracle container) must decode to exactly the same raw
    scanlines as the deflate (level 6) encoder, with valid chunk CRCs."""
    import struct
    import zlib

    rng = np.random.default_rng(7)
    colors = rng.integers(0, 2**32, 64, dtype=np.uint64).astype(np.uint32)
    a, b = R.encode_png_rgba(colors, 8, 8), R.encode_png_rgba_stored(colors, 8, 8)
    raws = []
    for png in (a, b):
        at = png.index(b"IDAT")
        ln = struct.unpack(">I", png[at - 4:at])[0]
        body = png[at:at + 4 + ln]
        assert struct.unpack(">I", png[at + 4 + ln:at + 8 + ln])[0] == zlib.crc32(body)
        raws.append(zlib.decompress(body[4:]))
    assert raws[0] == raws[1]
    # stored framing: one final stored block, exact length arithmetic
    assert b[b.index(b"IDAT") + 4:b.index(b"IDAT") + 11] == \
        b"\x78\x01\x01" + struct.pack("<HH", 264, 264 ^ 0xFFFF)
    # multi-block path: a raw payload > 65535 bytes splits into stored
    # blocks that still decompress to the level-6 encoder's scanlines
    big = rng.integers(0, 2**32, 160 * 160, dtype=np.uint64).astype(np.uint32)
    pngs = []
    for enc in (R.encode_png_rgba_stored, R.encode_png_rgba):
        png = enc(big, 160, 160)  # raw = 160*641 bytes > 65535
        at = png.index(b"IDAT")
        ln = struct.unpack(">I", png[at - 4:at])[0]
        pngs.append(zlib.decompress(png[at + 4:at + 4 + ln]))
    assert pngs[0] == pngs[1] and len(pngs[0]) == 160 * 641


def test_color_breaks_linspace():
    b = H.color_breaks(0.0, 10.0, 5)
    np.testing.assert_allclose(b, [0, 2.5, 5, 7.5, 10])


# ------------------------------------------------------------------ ogctime

def test_ogctime_parse():
    p = OT.from_string("2024-01-02T00:00:00Z,2024-01-01T00:00:00Z,2024-01-02T00:00:00Z")
    assert isinstance(p, OT.OgcTimePositions)
    assert len(p.times) == 2 and p.times[0] < p.times[1]  # sorted distinct
    i = OT.from_string("2024-01-01/2024-02-01/P1D")
    assert isinstance(i, OT.OgcTimeInterval) and i.period == "P1D"
    assert isinstance(OT.from_string(""), OT.OgcTimeEmpty)


def test_ogctime_merge_monoid():
    a = OT.OgcTimePositions.of([np.datetime64("2024-01-03"), np.datetime64("2024-01-01")])
    b = OT.OgcTimePositions.of([np.datetime64("2024-01-02")])
    m = a.merge(b)
    assert [str(t)[:10] for t in m.times] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    i1 = OT.from_string("2024-01-01/2024-01-10/P1D")
    i2 = OT.from_string("2024-01-05/2024-02-01/P1D")
    u = i1.merge(i2)
    assert str(u.start)[:10] == "2024-01-01" and str(u.end)[:10] == "2024-02-01"
    assert u.period == "P1D"
    mixed = a.merge(i1)  # {01-01, 01-03} + endpoints {01-01, 01-10} -> 3 distinct
    assert isinstance(mixed, OT.OgcTimePositions) and len(mixed.times) == 3


def test_time_slice_default_selection():
    df = pd.DataFrame({
        "name": ["a", "b", "c"],
        "t": pd.to_datetime(["2024-01-02", "2024-01-01", "2024-01-02"]).astype("datetime64[us]"),
    })
    old = OT.time_slice(df, "t", "oldest")
    assert old["name"].tolist() == ["b"]
    new = OT.time_slice(df, "t", "newest")
    assert new["name"].tolist() == ["a", "c"]


# ----------------------------------------------------------------- resample

def test_nearest_identity_and_downsample():
    t = np.arange(16, dtype=np.float64).reshape(4, 4)
    np.testing.assert_array_equal(RS.nearest(t, 4, 4), t)
    d = RS.nearest(t, 2, 2)
    np.testing.assert_array_equal(d, [[5, 7], [13, 15]])


def test_bilinear_plane_preserved():
    yy, xx = np.mgrid[0:8, 0:8]
    plane = 2.0 * xx + 3.0 * yy
    up = RS.bilinear(plane, 16, 16)
    # a bilinear resample of a plane stays a plane (interior exact)
    dif = np.diff(up[8, 4:12])
    np.testing.assert_allclose(dif, dif[0])


def test_block_reduces():
    t = np.arange(16, dtype=np.float64).reshape(4, 4)
    np.testing.assert_array_equal(RS.downsample_sum(t, 2), [[10, 18], [42, 50]])
    np.testing.assert_array_equal(RS.downsample_average(t, 2), [[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_array_equal(RS.downsample_max(t, 2), [[5, 7], [13, 15]])
    np.testing.assert_array_equal(RS.downsample_min(t, 2), [[0, 2], [8, 10]])
    m = RS.downsample_mode(np.array([[1, 1], [2, 3]], dtype=float), 2)
    assert m[0, 0] == 1


# ---------------------------------------------------------------- histogram

def test_fixed_histogram_merge_and_quantile():
    h1 = H.FixedHistogram(0, 100, 10).add(np.arange(0, 50))
    h2 = H.FixedHistogram(0, 100, 10).add(np.arange(50, 100))
    h1.merge(h2)
    assert h1.counts.sum() == 100
    assert (h1.counts == 10).all()
    assert 45 <= h1.quantile(0.5) <= 55


def test_streaming_histogram_bounded_and_mergeable():
    rng = np.random.default_rng(9)
    a = H.StreamingHistogram(32).add(rng.normal(0, 1, 5000))
    b = H.StreamingHistogram(32).add(rng.normal(5, 1, 5000))
    a.merge(b)
    assert len(a.values) <= 32
    assert a.total() == 10000
    assert a.min_value() < -1 and a.max_value() > 6


def test_getmap_lifecycle_batch(ray_session):
    """GetMap pipeline: every request renders a valid PNG; unknown layers
    take the BadRequest path (dropped); deterministic across runs."""
    from geotrellis_server_ray.pipelines.serving import getmap_batch, synth_requests
    import pyarrow as pa

    reqs = synth_requests(32)
    out = getmap_batch(reqs)
    assert out.num_rows == 32
    assert (np.asarray(out.column("img_len")) > 60).all()
    assert set(out.column("format").to_pylist()) == {"png", "jpg", "tif"}
    # each format's bytes decode with the matching validator
    from geotrellis_server_ray.functions.jpeg import decode_jpeg
    from geotrellis_server_ray.functions.render import encode_image
    from geotrellis_server_ray.sources.tiff import parse_ifds
    colors = np.full(64, np.uint32(0xFF0000FF), dtype=np.uint32)
    png = encode_image(colors, 8, 8, "png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    jpg = encode_image(colors, 8, 8, "jpg")
    dec = decode_jpeg(jpg)
    assert dec.shape == (8, 8, 3) and abs(int(dec[..., 0].mean()) - 255) <= 6
    tif = encode_image(colors, 8, 8, "tif")
    info, = parse_ifds(lambda off, ln: tif[off : off + ln])
    assert (info.width, info.height, info.samples) == (8, 8, 4)
    # unknown layer -> dropped (GetMapBadRequest path)
    bad = pa.table({
        "request_id": pa.array([0], type=pa.int64()),
        "layer": pa.array(["nope"]), "x": pa.array([0]), "y": pa.array([0]),
    })
    assert getmap_batch(bad).num_rows == 0
    # determinism of the full Ray pipeline
    from geotrellis_server_ray.pipelines.serving import getmap_requests

    a = getmap_requests("", 64).to_pandas().sort_values("request_id").reset_index(drop=True)
    b = getmap_requests("", 64).to_pandas().sort_values("request_id").reset_index(drop=True)
    assert a.equals(b)


def test_interpolated_descending_channel_lerp():
    """Red decreasing toward the second pole must interpolate down, not
    saturate at 255 (the uint32-subtraction underflow regression)."""
    cm = R.InterpolatedColorMap({0.0: R.rgba(255, 0, 0), 1.0: R.rgba(0, 0, 255)})
    out = cm.render(np.array([0.5]))
    r = (out[0] >> 24) & 0xFF
    b = (out[0] >> 8) & 0xFF
    assert r == 127 and b == 127  # halfway, toInt truncation both directions


def test_resample_nodata_and_dtype_edges():
    t_int = np.array([[2**60, 1], [2, 3]], dtype=np.int64)
    out = RS.nearest(t_int, 2, 2)
    assert out.dtype == np.int64 and out[0, 0] == 2**60  # no float corruption
    allnan = np.full((2, 2), np.nan)
    assert np.isnan(RS.downsample_sum(allnan, 2))[0, 0]
    m = RS.downsample_mode(np.array([[np.nan, np.nan], [5.0, np.nan]]), 2)
    assert m[0, 0] == 5.0
    m = RS.downsample_mode(np.full((2, 2), np.nan), 2)
    assert np.isnan(m[0, 0])
    batched = RS.downsample_mode(np.zeros((3, 4, 4)), 2)
    assert batched.shape == (3, 2, 2)


# -------------------------------------------- round-2 resample methods


def test_cubic_convolution_properties():
    """Keys cubic: exact on constants, exact on linear ramps (the defining
    property of the a=-0.5 kernel), identity at same-size resample."""
    gy, gx = np.mgrid[0:16, 0:16]
    const = np.full((16, 16), 7.25)
    assert np.allclose(RS.cubic_convolution(const, 8, 8), 7.25)
    ramp = (2.0 * gx + 3.0 * gy).astype(np.float64)
    same = RS.cubic_convolution(ramp, 16, 16)
    assert np.allclose(same, ramp)
    up = RS.cubic_convolution(ramp, 32, 32)
    # interior of an upsampled linear ramp is still linear with half the step
    interior = up[4:-4, 4:-4]
    dgx = np.diff(interior, axis=1)
    assert np.allclose(dgx, 1.0)


def test_cubic_spline_smooths_but_preserves_constants():
    const = np.full((12, 12), -3.5)
    assert np.allclose(RS.cubic_spline(const, 24, 24), -3.5)
    spike = np.zeros((12, 12))
    spike[6, 6] = 100.0
    out = RS.cubic_spline(spike, 12, 12)
    # B-spline smooths: center mass spreads, peak strictly below input
    assert out[6, 6] < 100.0 and out[6, 6] > 0.0


def test_lanczos_constant_and_bandlimited():
    const = np.full((18, 18), 42.0)
    assert np.allclose(RS.lanczos(const, 9, 9), 42.0)
    gy, gx = np.mgrid[0:32, 0:32]
    wave = np.sin(2 * np.pi * gx / 16.0)
    up = RS.lanczos(wave, 32, 64)
    # a band-limited signal upsamples with small interior error
    want = np.sin(2 * np.pi * ((np.arange(64) + 0.5) * 0.5 - 0.5) / 16.0)
    err = np.abs(up[16, 8:-8] - want[8:-8]).max()
    assert err < 0.05, err


def test_median_downsample_golden():
    t = np.array([
        [1.0, 9.0, 2.0, 2.0],
        [5.0, 7.0, 2.0, 100.0],
        [np.nan, np.nan, 0.0, 4.0],
        [np.nan, 3.0, 8.0, 6.0],
    ])
    out = RS.downsample_median(t, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] == 6.0      # median of 1,9,5,7
    assert out[0, 1] == 2.0      # median of 2,2,2,100
    assert out[1, 0] == 3.0      # NaNs excluded
    assert out[1, 1] == 5.0      # median of 0,4,8,6


def test_batched_kernel_resample_matches_single():
    rng = np.random.default_rng(2)
    stack = rng.uniform(0, 10, (3, 8, 8))
    for fn in (RS.cubic_convolution, RS.cubic_spline, RS.lanczos):
        batched = fn(stack, 4, 12)
        singles = np.stack([fn(stack[i], 4, 12) for i in range(3)])
        assert np.allclose(batched, singles), fn.__name__


def test_color_map_config_parsing_key_spellings():
    """ColorMapConfigurationSpec.scala:31-41: quoted and unquoted break keys
    load to the SAME color map; parsed maps drive color_map_render."""
    import numpy as np

    from geotrellis_server_ray.functions.render import color_map_render, parse_color_map

    quoted = ('{"-1.0": 0x1947B0FF,"-0.5": 0x5A7BBFFF,"0": 0xFFFFE5FF,'
              '"0.5": 0x487A5EFF,"1.0": 0x004529FF}')
    unquoted = ('{-1.0: 0x1947B0FF,-0.5: 0x5A7BBFFF, 0.0: 0xFFFFE5FF,'
                '0.5: 0x487A5EFF,1.0: 0x004529FF}')
    bq, cq = parse_color_map(quoted)
    bu, cu = parse_color_map(unquoted)
    assert np.array_equal(bq, bu) and np.array_equal(cq, cu)
    assert bq.tolist() == [-1.0, -0.5, 0.0, 0.5, 1.0]  # sorted
    assert cq[0] == 0x1947B0FF and cq[-1] == 0x004529FF
    out = color_map_render(np.array([-0.9, 0.2, 2.0]), bq, cq)
    assert out[0] == 0x5A7BBFFF  # first break >= v rule
    assert out[1] == 0x487A5EFF
    assert out[2] == 0  # above all breaks -> transparent fallback


def test_break_edges_all_nan_row():
    """Regression (r3 ADVICE): a fully-masked tile must yield the FIRST-BIN
    edges (FixedHistogram's empty-histogram behavior), not NaN bounds, and
    must not emit a RuntimeWarning."""
    import warnings

    import numpy as np

    from geotrellis_server_ray.pipelines.serving import (_H_LO, _H_NBINS,
                                                         _H_HI, _break_edges)

    w = (_H_HI - _H_LO) / _H_NBINS
    tiles = np.array([[np.nan, np.nan, np.nan],
                      [1.0, np.nan, 5.0]])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        vmin, vmax = _break_edges(tiles)
    assert vmin[0] == _H_LO and vmax[0] == _H_LO + w
    assert np.isfinite(vmin).all() and np.isfinite(vmax).all()
    assert vmin[1] <= 1.0 < 5.0 <= vmax[1]


def test_serving_is_pandas_free():
    """r3 judge note #4: the GetMap serving path must not import pandas."""
    import pathlib

    import geotrellis_server_ray.pipelines.serving as srv

    src = pathlib.Path(srv.__file__).read_text()
    assert "import pandas" not in src


def test_ogctime_period_iso_goldens():
    """PeriodDuration.normalizedStandardDays toString goldens
    (OgcTime.scala:113-126)."""
    from geotrellis_server_ray.functions.ogctime import period_iso, period_ms

    goldens = {
        0: "P0D",
        86_400_000: "P1D",
        3_600_000: "PT1H",
        90_000_000: "P1DT1H",
        60_000: "PT1M",
        1_500: "PT1.5S",
        93_784_000: "P1DT2H3M4S",
        604_800_000: "P7D",
    }
    for ms, iso in goldens.items():
        assert period_iso(ms) == iso, ms
        if ms:
            assert period_ms(iso) == ms, iso
    assert period_ms("P1W") == 7 * 86_400_000
    assert period_ms("P1Y") is None and period_ms("P2M") is None


def test_ogctime_positions_interval_roundtrip():
    """computeIntervalPeriod + toOgcTimeInterval + toTimePositions
    (OgcTime.scala:113-179): uniform gaps infer the period and round-trip;
    ragged gaps yield interval-without-period; format() is the safe
    dispatcher."""
    import numpy as np

    from geotrellis_server_ray.functions.ogctime import (
        OgcTimeInterval, OgcTimePositions, format_time,
        interval_to_positions, positions_to_interval)

    daily = OgcTimePositions.of(
        np.arange(np.datetime64("2020-01-01", "us"),
                  np.datetime64("2020-01-06", "us"),
                  np.timedelta64(1, "D")))
    iv = positions_to_interval(daily)
    assert iv.period == "P1D"
    assert iv.start == np.datetime64("2020-01-01", "us")
    assert iv.end == np.datetime64("2020-01-05", "us")
    back = interval_to_positions(iv)
    assert back == daily

    single = OgcTimePositions.of([np.datetime64("2021-05-01T06:00", "us")])
    assert positions_to_interval(single).period is None

    ragged = OgcTimePositions.of([np.datetime64("2020-01-01", "us"),
                                  np.datetime64("2020-01-02", "us"),
                                  np.datetime64("2020-01-05", "us")])
    riv = positions_to_interval(ragged)
    assert riv.period is None
    assert interval_to_positions(riv) is None
    # format('positions') keeps the interval when expansion is impossible
    assert format_time(riv, "positions") is riv
    assert format_time(daily, "interval") == iv
    assert format_time(daily, "default") is daily


def test_period_inference_truncate_then_diff():
    """Review finding r4: microsecond-misaligned uniform gaps must NOT
    infer a period (toEpochMilli truncates BEFORE diffing, like the SQL
    oracle's epoch_ms lag) — diff-then-truncate would alias 900us gaps to
    a bogus zero-ms 'P0D'."""
    import numpy as np

    from geotrellis_server_ray.functions.ogctime import compute_interval_period

    t0 = np.datetime64("2024-01-01T00:00:00.000400", "us")
    times = [t0, t0 + np.timedelta64(900, "us"), t0 + np.timedelta64(1800, "us")]
    # truncated ms values are 0,1,2 -> uniform 1ms gaps, exactly what the
    # oracle's epoch_ms lag sees (the old diff-then-truncate gave {0}: P0D)
    assert compute_interval_period(times) == "PT0.001S"
    # ms-aligned 900us gaps all inside one ms -> single 0 gap -> P0D both
    # engine and oracle (consistent degenerate case)
    sub = [t0, t0 + np.timedelta64(100, "us"), t0 + np.timedelta64(200, "us")]
    assert compute_interval_period(sub) == "P0D"
