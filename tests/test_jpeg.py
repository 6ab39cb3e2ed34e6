"""Baseline JPEG encoder (S7): structure, round-trip bounds, dispatch."""

import numpy as np

from geotrellis_server_ray.functions.jpeg import decode_jpeg, encode_jpeg, rgba_to_jpeg


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_marker_structure():
    img = np.zeros((8, 8), dtype=np.uint8)
    d = encode_jpeg(img)
    assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in d[:32]
    # required segments present: DQT, SOF0, DHT, SOS
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in d


def test_flat_color_near_exact():
    for v in (0, 64, 128, 200, 255):
        img = np.full((24, 16, 3), v, dtype=np.uint8)
        back = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(back.astype(int) - v).max() <= 2, v


def test_smooth_gradient_high_psnr():
    gy, gx = np.mgrid[0:40, 0:56]
    img = np.stack([
        (gx * 255 // 55), (gy * 255 // 39), ((gx + gy) * 255 // 94)
    ], axis=-1).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=90))
    assert back.shape == img.shape
    assert _psnr(img, back) > 38


def test_grayscale_roundtrip_and_odd_sizes():
    rng = np.random.default_rng(5)
    for shape in [(8, 8), (9, 13), (17, 33)]:
        img = rng.integers(0, 255, shape).astype(np.uint8)
        # random noise is worst-case for DCT; just assert bounded error at q95
        back = decode_jpeg(encode_jpeg(img, quality=95))
        assert back.shape == shape
        assert _psnr(img, back) > 25


def test_quality_knob_monotone_size():
    gy, gx = np.mgrid[0:32, 0:32]
    img = ((gx * 5 + gy * 7) % 256).astype(np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (20, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rgba_nodata_composites_to_grey():
    # fully transparent tile -> uniform mid-grey JPEG
    colors = np.zeros(64, dtype=np.uint32)
    back = decode_jpeg(rgba_to_jpeg(colors, 8, 8))
    assert np.abs(back.astype(int) - 0x7F).max() <= 3


def test_determinism():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)
