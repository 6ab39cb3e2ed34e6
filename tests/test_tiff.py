"""Pure-Python TIFF reader/writer (S1/S6/S7): round-trips, windowed reads,
header-cache integration, and the reference 8x8.tif golden."""

import os

import numpy as np
import pytest

from geotrellis_server_ray.sources.tiff import (
    file_range_reader, parse_ifds, read_extent_window, read_window, write_tiff,
)
from geotrellis_server_ray.state.caches import HeaderByteCache

REF_8X8 = "/root/reference/core/src/test/resources/8x8.tif"


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.float32, np.float64])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_roundtrip_dtypes(tmp_path, dtype, compression):
    rng = np.random.default_rng(3)
    arr = (rng.uniform(0, 100, (37, 23)) if np.dtype(dtype).kind == "f"
           else rng.integers(0, 100, (37, 23))).astype(dtype)
    raw = write_tiff(arr, compression=compression)
    p = tmp_path / "t.tif"
    p.write_bytes(raw)
    rd = file_range_reader(str(p))
    info, = parse_ifds(rd)
    assert (info.width, info.height) == (23, 37)
    got = read_window(rd, info, 0, 0, 23, 37)[:, :, 0]
    assert np.array_equal(got, arr)


def test_multistrip_windowed_read(tmp_path):
    arr = np.arange(64 * 48, dtype=np.uint16).reshape(64, 48)
    raw = write_tiff(arr, compression="deflate", rows_per_strip=7)
    p = tmp_path / "s.tif"
    p.write_bytes(raw)
    rd = file_range_reader(str(p))
    info, = parse_ifds(rd)
    assert len(info.offsets) == (64 + 6) // 7
    for (c0, r0, w, h) in [(0, 0, 48, 64), (5, 9, 13, 21), (40, 60, 8, 4), (0, 63, 48, 1)]:
        got = read_window(rd, info, c0, r0, w, h)[:, :, 0]
        assert np.array_equal(got, arr[r0 : r0 + h, c0 : c0 + w]), (c0, r0, w, h)


def test_multisample_roundtrip(tmp_path):
    arr = np.arange(16 * 8 * 3, dtype=np.uint8).reshape(16, 8, 3)
    p = tmp_path / "rgb.tif"
    p.write_bytes(write_tiff(arr))
    rd = file_range_reader(str(p))
    info, = parse_ifds(rd)
    assert info.samples == 3
    got = read_window(rd, info, 2, 3, 4, 5)
    assert np.array_equal(got, arr[3:8, 2:6])


def test_geotiff_tags_and_extent_window(tmp_path):
    arr = np.arange(100, dtype=np.int32).reshape(10, 10)
    raw = write_tiff(arr, pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0, 100.0, 210.0),
                     epsg=3857, nodata=-1.0)
    p = tmp_path / "g.tif"
    p.write_bytes(raw)
    rd = file_range_reader(str(p))
    info, = parse_ifds(rd)
    assert info.geo_extent() == (100.0, 200.0, 110.0, 210.0)
    assert info.nodata == -1.0
    assert info.geokeys is not None
    got = read_extent_window(rd, info, 100.0, 201.0, 110.0, 210.0)[:, :, 0]
    assert got.sum() == arr[:9].sum()  # bottom row excised


def test_header_cache_serves_ifd_and_small_windows(tmp_path):
    arr = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    p = tmp_path / "c.tif"
    p.write_bytes(write_tiff(arr, rows_per_strip=8))
    calls = []

    def counting_read(uri, offset, length):
        calls.append((offset, length))
        with open(uri, "rb") as f:
            f.seek(offset)
            return f.read(length)

    cache = HeaderByteCache(counting_read, prefix=256 * 1024)
    rd = lambda off, ln: cache.read(str(p), off, ln)
    info, = parse_ifds(rd)
    n_after_parse = len(calls)
    assert n_after_parse == 1  # one prefix fetch served the whole IFD walk
    got = read_window(rd, info, 0, 0, 32, 32)[:, :, 0]
    assert np.array_equal(got, arr)
    assert len(calls) == 1  # small file: windows hit the cached prefix too


@pytest.mark.skipif(not os.path.exists(REF_8X8), reason="reference fixture absent")
def test_reference_8x8_golden_sum_1596():
    """LayerExtentTest.scala:29-37 replayed on real TIFF bytes: reading
    Extent(0, 1, 8, 8) excises the bottom row; band sum == 1596."""
    rd = file_range_reader(REF_8X8)
    infos = parse_ifds(rd)
    base = infos[0]
    assert (base.width, base.height) == (8, 8)
    win = read_extent_window(rd, base, 0, 1, 8, 8)
    assert win.sum() == 1596
    full = read_window(rd, base, 0, 0, 8, 8)
    assert full.sum() == 2080  # values 1..64


def test_range_readers_feed_tiff_and_cache(tmp_path):
    """S5 surface: File and Memory range readers both drive the TIFF reader
    through the header cache; the HTTP reader fails loudly without network."""
    import pytest as _pytest

    from geotrellis_server_ray.sources.rangereader import (
        FileRangeReader, HttpRangeReader, MemoryRangeReader,
    )

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = write_tiff(arr)
    p = tmp_path / "r.tif"
    p.write_bytes(raw)

    fr = FileRangeReader(str(p))
    assert fr.total_length() == len(raw)
    info, = parse_ifds(fr)
    assert np.array_equal(read_window(fr, info, 0, 0, 8, 8)[:, :, 0], arr)

    mr = MemoryRangeReader(raw)
    cache = HeaderByteCache(lambda uri, off, ln: mr(off, ln))
    rd = lambda off, ln: cache.read("mem://r.tif", off, ln)
    info2, = parse_ifds(rd)
    assert np.array_equal(read_window(rd, info2, 2, 2, 4, 4)[:, :, 0], arr[2:6, 2:6])

    hr = HttpRangeReader("http://203.0.113.1/none.tif", timeout=0.5)
    with _pytest.raises((RuntimeError, OSError)):
        hr(0, 16)


# --------------------------------------------------- round-3: LZW + PackBits


def _pack_msb(codes):
    """Tiny independent MSB-first bit packer for hand-built LZW vectors."""
    buf = nbits = 0
    out = bytearray()
    for code, width in codes:
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_built_spec_vector():
    """Decode a stream hand-encoded per TIFF 6.0 §13 (codes derived on
    paper, packed by an independent bit packer): validates the decoder
    against the SPEC, not against our own encoder."""
    from geotrellis_server_ray.sources.tiff import lzw_decode

    # input [7,7,7,8,8,7,7,6]: greedy LZW emits
    # CLEAR, 7, 258("77"), 8, 8, 258, 6, EOI — all 9-bit
    stream = _pack_msb([(256, 9), (7, 9), (258, 9), (8, 9), (8, 9),
                        (258, 9), (6, 9), (257, 9)])
    assert lzw_decode(stream) == bytes([7, 7, 7, 8, 8, 7, 7, 6])


def test_lzw_kwkwk_case():
    """The KwKwK corner: code == next table slot (input 'aaaa...')."""
    from geotrellis_server_ray.sources.tiff import lzw_decode

    # stream CLEAR, 97, 258, EOI: at the 258 the decoder's table has 258
    # entries (0..257), so code 258 == next slot -> entry = prev + prev[0]
    stream = _pack_msb([(256, 9), (97, 9), (258, 9), (257, 9)])
    assert lzw_decode(stream) == b"a" + b"aa"
    # and the canonical encode of 'aaaaa' (emits 97, 258, 258) decodes back
    stream = _pack_msb([(256, 9), (97, 9), (258, 9), (258, 9), (257, 9)])
    assert lzw_decode(stream) == b"aaaaa"


def test_lzw_roundtrip_through_width_growth():
    from geotrellis_server_ray.sources.tiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(11)
    # ~40 KiB of structured-random bytes: crosses the 9->10->11->12 early-
    # change boundaries AND the 12-bit table reset
    data = bytes(rng.integers(0, 256, 40_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data)) == data
    runs = b"".join(bytes([i % 251]) * (i % 17 + 1) for i in range(3000))
    assert lzw_decode(lzw_encode(runs)) == runs
    assert lzw_decode(lzw_encode(b"")) == b""


def test_packbits_roundtrip_and_spec_cases():
    from geotrellis_server_ray.sources.tiff import packbits_decode, packbits_encode

    # spec literal + run forms
    assert packbits_decode(bytes([2, 1, 2, 3])) == bytes([1, 2, 3])
    assert packbits_decode(bytes([254, 9])) == bytes([9, 9, 9])
    assert packbits_decode(bytes([128, 0, 5])) == bytes([5])  # 128 = no-op
    rng = np.random.default_rng(12)
    for blob in (bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
                 bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
                 bytes(300), b"", b"\x07"):
        assert packbits_decode(packbits_encode(blob)) == blob


@pytest.mark.parametrize("compression", ["lzw", "packbits"])
def test_tiff_windowed_reads_new_compressions(compression):
    """Full-path: write a striped TIFF with the new codec, parse its IFD via
    range reads, and window-read through the ordinary reader."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader
    from geotrellis_server_ray.sources.tiff import parse_ifds, read_window, write_tiff

    gy, gx = np.mgrid[0:48, 0:48]
    vals = ((gx * 11 + gy * 3) % 120).astype(np.uint8)
    raw = write_tiff(vals, compression=compression, rows_per_strip=16,
                     pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0, 0.0, 48.0),
                     epsg=3857)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    assert info.compression == {"lzw": 5, "packbits": 32773}[compression]
    win = read_window(rr, info, 5, 10, 20, 25)[:, :, 0]
    assert np.array_equal(win, vals[10:35, 5:25])
    full = read_window(rr, info, 0, 0, 48, 48)[:, :, 0]
    assert np.array_equal(full, vals)


def test_raster_source_reads_lzw_over_scheme_dispatch():
    from geotrellis_server_ray.sources.rastersource import raster_source, register_memory_source
    from geotrellis_server_ray.sources.tiff import write_tiff

    gy, gx = np.mgrid[0:16, 0:16]
    vals = ((gx + gy * 2) % 30).astype(np.int32)
    uri = register_memory_source("lzw16.tif", write_tiff(vals, compression="lzw"))
    h = raster_source(f"gdal+{uri}")
    assert np.array_equal(h.read_window(0, 0, 16, 16)[:, :, 0], vals)


def test_jpeg_in_tiff_roundtrip_grayscale():
    """Compression 7 (new-style JPEG-in-TIFF) through our own baseline
    codec: blocky-constant content survives the lossy round-trip within
    quantization tolerance; strip layout windows correctly."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader
    from geotrellis_server_ray.sources.tiff import parse_ifds, read_window, write_tiff

    gy, gx = np.mgrid[0:64, 0:64]
    vals = (((gx // 8) * 16 + (gy // 8) * 4) % 200).astype(np.uint8)  # 8x8-constant
    raw = write_tiff(vals, compression="jpeg", rows_per_strip=16,
                     pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0, 0.0, 64.0),
                     epsg=3857)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    assert info.compression == 7
    full = read_window(rr, info, 0, 0, 64, 64)[:, :, 0]
    assert int(np.abs(full.astype(int) - vals.astype(int)).max()) <= 2
    win = read_window(rr, info, 8, 24, 16, 16)[:, :, 0]
    assert int(np.abs(win.astype(int) - vals[24:40, 8:24].astype(int)).max()) <= 2


def test_jpeg_in_tiff_rgb():
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader
    from geotrellis_server_ray.sources.tiff import parse_ifds, read_window, write_tiff

    gy, gx = np.mgrid[0:32, 0:32]
    rgb = np.stack([((gx // 8) * 30) % 250, ((gy // 8) * 40) % 250,
                    np.full_like(gx, 90)], axis=-1).astype(np.uint8)
    raw = write_tiff(rgb, compression="jpeg", rows_per_strip=16)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    out = read_window(rr, info, 0, 0, 32, 32)
    assert out.shape == (32, 32, 3)
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 6  # YCbCr loss


def test_jpeg_in_tiff_shared_jpegtables_splice():
    """The abbreviated-stream + JPEGTables (tag 347) form: tables stripped
    from the strip stream and spliced back from the shared blob at decode
    (_decode_block) — byte-identical output to the self-contained stream."""
    from geotrellis_server_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from geotrellis_server_ray.sources.tiff import TiffInfo, _decode_block

    gy, gx = np.mgrid[0:16, 0:16]
    vals = (((gx // 8) * 50 + (gy // 8) * 20) % 200).astype(np.uint8)
    stream = encode_jpeg(vals, quality=95)
    # split: DQT (0xDB) / DHT (0xC4) segments -> tables blob; rest -> strip
    pos, tables, rest = 2, bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
    while pos < len(stream):
        marker = stream[pos + 1]
        if marker == 0xD9:
            rest += stream[pos:]
            break
        ln = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        elif marker == 0xDA:
            rest += stream[pos:]
            break
        else:
            rest += seg
        pos += 2 + ln
    tables += b"\xff\xd9"

    def mkinfo(jt):
        return TiffInfo(endian="<", width=16, height=16, bits=8, sample_format=1,
                        samples=1, compression=7, predictor=1, tiled=False,
                        tile_w=16, tile_h=16, jpeg_tables=jt)

    via_tables = _decode_block(mkinfo(bytes(tables)), bytes(rest), 16, 16)
    plain = _decode_block(mkinfo(None), stream, 16, 16)
    assert np.array_equal(via_tables, plain)
    assert np.array_equal(plain[:, :, 0], decode_jpeg(stream))


# ----------------------------------------------- round-3: BigTIFF + tiled IO


@pytest.mark.parametrize("kw", [
    dict(bigtiff=True),
    dict(tile=(16, 16)),
    dict(tile=(32, 16), bigtiff=True),
    dict(tile=(16, 16), compression="deflate"),
    dict(bigtiff=True, compression="lzw", rows_per_strip=11),
    dict(tile=(16, 16), compression="packbits"),
])
def test_bigtiff_and_tiled_roundtrip(kw):
    """BigTIFF (magic 43, 8-byte offsets, 20-byte entries — the >4 GiB form
    scale outputs need) and tiled layouts (padded edge tiles, row-major)
    both window-read exactly through the one reader."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader

    gy, gx = np.mgrid[0:70, 0:53]
    arr = ((gx * 7 + gy * 13) % 211).astype(np.uint16)
    raw = write_tiff(arr, **kw)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    assert info.tiled == ("tile" in kw)
    assert np.array_equal(read_window(rr, info, 0, 0, 53, 70)[:, :, 0], arr)
    assert np.array_equal(read_window(rr, info, 5, 9, 20, 30)[:, :, 0], arr[9:39, 5:25])
    # edge window crossing the padded boundary tiles
    assert np.array_equal(read_window(rr, info, 40, 60, 13, 10)[:, :, 0], arr[60:70, 40:53])


def test_bigtiff_header_form():
    raw = write_tiff(np.zeros((4, 4), dtype=np.uint8), bigtiff=True)
    assert raw[:4] == b"II+\x00"       # magic 43
    assert raw[4:6] == b"\x08\x00"     # 8-byte offsets
    with pytest.raises(ValueError, match="tile dimensions"):
        write_tiff(np.zeros((4, 4), dtype=np.uint8), tile=(10, 16))


def test_tiled_geotiff_extent_read(tmp_path):
    arr = np.arange(48 * 48, dtype=np.int32).reshape(48, 48)
    raw = write_tiff(arr, tile=(16, 16), compression="deflate",
                     pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0, 0.0, 48.0),
                     epsg=3857)
    p = tmp_path / "t.tif"
    p.write_bytes(raw)
    rd = file_range_reader(str(p))
    info, = parse_ifds(rd)
    got = read_extent_window(rd, info, 8.0, 8.0, 40.0, 40.0)[:, :, 0]
    assert np.array_equal(got, arr[8:40, 8:40])


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32])
def test_predictor2_write_read(dtype):
    """Write-side horizontal differencing (predictor 2) round-trips under
    LZW strips and deflate tiles, including multi-sample chunky data."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader

    gy, gx = np.mgrid[0:40, 0:33]
    arr = ((gx * 7 + gy * 13) % 200).astype(dtype)
    for kw in (dict(compression="lzw", predictor=2, rows_per_strip=9),
               dict(compression="deflate", predictor=2, tile=(16, 16))):
        raw = write_tiff(arr, **kw)
        rr = MemoryRangeReader(raw)
        info = parse_ifds(rr)[0]
        assert info.predictor == 2
        assert np.array_equal(read_window(rr, info, 3, 5, 20, 25)[:, :, 0],
                              arr[5:30, 3:23])
    rgb = np.stack([arr % 250, (arr * 3) % 250, (arr * 7) % 250], axis=-1).astype(np.uint8)
    raw = write_tiff(rgb, compression="lzw", predictor=2, rows_per_strip=8)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    assert np.array_equal(read_window(rr, info, 0, 0, 33, 40), rgb)
    with pytest.raises(ValueError, match="integer"):
        write_tiff(arr.astype(np.float32), compression="lzw", predictor=2)


def test_jpeg_rejects_predictor():
    """Review r3: differencing before a lossy codec decodes as garbage; the
    combination must be rejected at write time."""
    with pytest.raises(ValueError, match="predictor 2 cannot"):
        write_tiff(np.zeros((8, 8), dtype=np.uint8), compression="jpeg", predictor=2)


@pytest.mark.parametrize("kw", [
    dict(planar=2, rows_per_strip=8),
    dict(planar=2, compression="lzw", predictor=2, rows_per_strip=16),
    dict(planar=2, tile=(16, 16), compression="deflate"),
    dict(planar=2, bigtiff=True),
])
def test_planar_configuration_2(kw):
    """PlanarConfiguration 2 (GDAL INTERLEAVE=BAND): the block run repeats
    per sample, sample-major; windowed reads merge the planes back into
    chunky output across strips/tiles/codecs/predictor/BigTIFF."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader

    gy, gx = np.mgrid[0:40, 0:33]
    rgb = np.stack([(gx * 3 + gy) % 200, (gx + gy * 5) % 200,
                    (gx * 7) % 200], axis=-1).astype(np.uint8)
    raw = write_tiff(rgb, **kw)
    rr = MemoryRangeReader(raw)
    info = parse_ifds(rr)[0]
    assert info.planar == 2 and info.samples == 3
    assert np.array_equal(read_window(rr, info, 0, 0, 33, 40), rgb)
    assert np.array_equal(read_window(rr, info, 5, 9, 12, 17), rgb[9:26, 5:17])
    assert np.array_equal(read_window(rr, info, 20, 30, 13, 10), rgb[30:40, 20:33])


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_predictor3_floating_point(dtype):
    """TIFF TechNote 3 floating-point predictor: MSB-first byte-plane split
    + horizontal byte differencing, bit-exact round trip for float rasters
    (the DEM storage idiom) across strips, tiles, and planar config."""
    from geotrellis_server_ray.sources.rangereader import MemoryRangeReader

    gy, gx = np.mgrid[0:40, 0:33]
    dem = (np.sin(gx / 5.0) * 100 + gy * 1.5 + 0.125).astype(dtype)
    for kw in (dict(compression="deflate", predictor=3, rows_per_strip=8),
               dict(compression="lzw", predictor=3, tile=(16, 16))):
        raw = write_tiff(dem, **kw)
        rr = MemoryRangeReader(raw)
        info = parse_ifds(rr)[0]
        assert info.predictor == 3
        assert np.array_equal(read_window(rr, info, 0, 0, 33, 40)[:, :, 0], dem)
        assert np.array_equal(read_window(rr, info, 5, 9, 12, 17)[:, :, 0],
                              dem[9:26, 5:17])
    # differencing should actually help deflate on smooth data
    plain = len(write_tiff(dem, compression="deflate"))
    pred = len(write_tiff(dem, compression="deflate", predictor=3))
    assert pred < plain
    with pytest.raises(ValueError, match="float"):
        write_tiff(np.zeros((4, 4), dtype=np.int32), compression="deflate", predictor=3)


def test_range_coalescing_reduces_read_calls():
    """Adjacent strip ranges merge into single ranged reads (the COG
    optimization): a full-raster read over 8 contiguous strips issues ONE
    data read, not 8 — and byte-identical output."""
    from geotrellis_server_ray.sources.tiff import _fetch_blocks

    gy, gx = np.mgrid[0:64, 0:48]
    arr = ((gx * 5 + gy * 3) % 210).astype(np.uint8)
    raw = write_tiff(arr, rows_per_strip=8)  # uncompressed: strips adjacent
    calls = []

    def counting_read(off, ln):
        calls.append((off, ln))
        return raw[off : off + ln]

    info, = parse_ifds(counting_read)
    n_meta = len(calls)
    got = read_window(counting_read, info, 0, 0, 48, 64)[:, :, 0]
    assert np.array_equal(got, arr)
    assert len(calls) - n_meta == 1  # 8 strips, one coalesced data read
    # a sparse selection (every other strip beyond the gap) still splits
    blobs = _fetch_blocks(counting_read, info, [0, 7], max_gap=0)
    assert len(blobs) == 2
