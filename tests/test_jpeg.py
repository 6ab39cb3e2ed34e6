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


def test_constant_block_roundtrip_exact_all_values():
    """The invariant behind the media_meta oracle: at quality 75 the luma DC
    quantizer step (8) equals the orthonormal DCT's DC gain, so a constant
    8x8 block round-trips EXACTLY for every gray value — and a block-gradient
    image (each block constant) decodes pixel-identical."""
    import numpy as np

    from geotrellis_server_ray.functions.jpeg import decode_jpeg, encode_jpeg

    for v in range(256):
        img = np.full((8, 8), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        assert out.shape == (8, 8) and (out == v).all(), v


def test_block_gradient_roundtrip_and_synth_cache():
    """media_span_payloads' exact synth-JPEG contract: decoded image of
    _synth_jpeg(w, h, seed) has block b constant at (seed + 7b) % 256 and
    pixel sum 64 * sum_b((seed + 7b) % 256); repeated calls hit the worker
    cache (same object)."""
    import numpy as np

    from geotrellis_server_ray.functions.jpeg import decode_jpeg
    from geotrellis_server_ray.stages.media import _synth_jpeg

    for (w, h, seed) in [(8, 8, 0), (64, 64, 255), (24, 56, 131), (40, 16, 7)]:
        data = _synth_jpeg(w, h, seed)
        assert data is _synth_jpeg(w, h, seed)  # cached
        arr = decode_jpeg(data)
        assert arr.shape == (h, w)
        nbx = w // 8
        blocks = arr.reshape(h // 8, 8, nbx, 8).transpose(0, 2, 1, 3)
        bidx = np.arange((h // 8) * nbx).reshape(h // 8, nbx)
        want = (seed + 7 * bidx) % 256
        assert (blocks == want[:, :, None, None]).all()
        assert int(arr.sum(dtype=np.int64)) == int(64 * want.sum())


def test_wav_codec_roundtrip_and_chunk_walk():
    """RIFF/WAVE PCM16 codec: bit-exact sample round trip, correct chunk
    walk (unknown chunks + odd-length word padding skipped), format guards."""
    import struct

    import numpy as np
    import pytest

    from geotrellis_server_ray.functions.wav import decode_wav, encode_wav

    s = np.array([-32768, -1, 0, 1, 32767, 12345], np.int16)
    data = encode_wav(s, 8000)
    out, rate = decode_wav(data)
    assert rate == 8000 and (out == s).all()

    # splice an unknown odd-length chunk between fmt and data
    pos = data.index(b"data")
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # padded
    spliced = data[:pos] + junk + data[pos:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out2, rate2 = decode_wav(spliced)
    assert rate2 == 8000 and (out2 == s).all()

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"OGGS" + bytes(20))

    # ADVICE r4: truncated data chunk (declared length > remaining bytes)
    # and odd-length PCM16 data both raise descriptive errors, not numpy's
    # opaque frombuffer ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(data[:-2])
    pos = data.index(b"data")
    odd = bytearray(data)
    (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
    odd[pos + 4:pos + 8] = struct.pack("<I", ln - 1)
    with pytest.raises(ValueError, match="odd byte length|truncated"):
        decode_wav(bytes(odd))


def test_mjpg_container_seek_decode():
    """MJPG container: header frame count, offset-table seek, per-frame
    decode exactness, bounds check."""
    import numpy as np
    import pytest

    from geotrellis_server_ray.functions.jpeg import encode_jpeg
    from geotrellis_server_ray.stages.media import (encode_mjpg,
                                                    mjpg_decode_frame,
                                                    mjpg_frame_count)

    frames = [encode_jpeg(np.full((8, 16), v, np.uint8), 75)
              for v in (0, 128, 255)]
    data = encode_mjpg(frames)
    assert mjpg_frame_count(data) == 3
    for k, v in enumerate((0, 128, 255)):
        arr = mjpg_decode_frame(data, k)
        assert arr.shape == (8, 16) and (arr == v).all()
    with pytest.raises(IndexError):
        mjpg_decode_frame(data, 3)
    with pytest.raises(ValueError):
        mjpg_frame_count(b"RIFF" + bytes(8))
