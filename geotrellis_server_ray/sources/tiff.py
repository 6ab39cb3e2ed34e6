"""Pure-Python baseline TIFF/GeoTIFF reader + writer (SURVEY.md §2.3 S1/S6/S7).

Reader: classic TIFF (II and MM byte orders), striped or tiled layouts,
uncompressed / Deflate / LZW (TIFF 6.0 early-change) / PackBits / new-style
JPEG (compression 7 via the repo's own baseline codec, incl. shared
JPEGTables splicing) with the horizontal-differencing predictor, uint/int
8/16/32 and float 32/64 samples, chunky AND planar (band-interleaved)
configurations, multiple IFDs
(overviews; write_tiff_pyramid produces them), classic AND BigTIFF (magic
43, 8-byte offsets — the >4 GiB form 100-TB-scale outputs need).

Writer: striped or tiled (``tile=(tw, th)``, padded edge tiles), classic or
BigTIFF, any of the codecs above. Windowed reads fetch ONLY the strips/tiles that
intersect the requested window through a ``read(offset, length)`` callable,
so the header-byte cache (state/caches.HeaderByteCache) serves IFD walks and
small windows from its cached prefix — the engine analog of the reference's
windowed COG reads (core/.../vlm/geotiff/GeoTiffNode.scala:49-93) over a
CacheRangeReader (core/.../util/CacheRangeReader.scala:22-34).

Writer: striped TIFF (optionally deflate-compressed) with the three baseline
GeoTIFF tags (ModelPixelScale 33550, ModelTiepoint 33922, GeoKeyDirectory
34735) — the S7 GeoTiff encode path (ogc/.../Render.scala:28-75 dispatches
to geotiff bytes the same way).

No GDAL anywhere; this is the engine's own baseline format support.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

# tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _RPS, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR = 317
_PLANAR = 284
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_SFORMAT = 339
_MODEL_SCALE, _MODEL_TIE, _GEOKEYS = 33550, 33922, 34735
_GDAL_NODATA = 42113
_JPEG_TABLES = 347

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4,
              12: 8, 16: 8, 17: 8, 18: 8}  # 16-18: BigTIFF LONG8/SLONG8/IFD8
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


@dataclass
class TiffInfo:
    """Parsed metadata for one IFD (one resolution level)."""
    endian: str
    width: int
    height: int
    bits: int
    sample_format: int  # 1 uint, 2 int, 3 float
    samples: int
    compression: int    # 1 none, 8 / 32946 deflate
    predictor: int
    tiled: bool
    tile_w: int
    tile_h: int
    offsets: list = field(default_factory=list)
    counts: list = field(default_factory=list)
    pixel_scale: tuple | None = None   # (sx, sy)
    tiepoint: tuple | None = None      # (px, py, gx, gy) raster px -> geo
    geokeys: tuple | None = None
    nodata: float | None = None
    jpeg_tables: bytes | None = None
    planar: int = 1  # 1 chunky, 2 planar (one sample per block run)

    @property
    def dtype(self) -> np.dtype:
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        dt = np.dtype(f"{kind}{self.bits // 8}")
        return dt.newbyteorder(self.endian)

    def geo_extent(self) -> tuple[float, float, float, float] | None:
        """(xmin, ymin, xmax, ymax) from scale+tiepoint (north-up rasters)."""
        if self.pixel_scale is None or self.tiepoint is None:
            return None
        sx, sy = self.pixel_scale
        px, py, gx, gy = self.tiepoint
        xmin = gx - px * sx
        ymax = gy + py * sy
        return (xmin, ymax - self.height * sy, xmin + self.width * sx, ymax)


def _unpack(endian: str, fmt: str, data: bytes):
    return struct.unpack(endian + fmt, data)


def parse_ifds(read) -> list[TiffInfo]:
    """Walk every IFD via the ``read(offset, length) -> bytes`` callable.
    Reads only the bytes it needs (header, IFD entries, out-of-line values)."""
    head = read(0, 8)
    if head[:2] == b"II":
        endian = "<"
    elif head[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, = _unpack(endian, "H", head[2:4])
    if magic == 42:  # classic
        big = False
        next_ifd, = _unpack(endian, "I", head[4:8])
    elif magic == 43:  # BigTIFF: 8-byte offsets, 20-byte IFD entries
        big = True
        offsize, zero = _unpack(endian, "HH", head[4:8])
        if offsize != 8 or zero != 0:
            raise ValueError(f"malformed BigTIFF header (offsize {offsize})")
        next_ifd, = _unpack(endian, "Q", read(8, 8))
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    esz, inline_cap = (20, 8) if big else (12, 4)
    infos = []
    while next_ifd:
        if big:
            n_entries, = _unpack(endian, "Q", read(next_ifd, 8))
            raw = read(next_ifd + 8, n_entries * esz + 8)
        else:
            n_entries, = _unpack(endian, "H", read(next_ifd, 2))
            raw = read(next_ifd + 2, n_entries * esz + 4)
        tags: dict[int, tuple] = {}
        for i in range(n_entries):
            ent = raw[i * esz : (i + 1) * esz]
            tag, typ = _unpack(endian, "HH", ent[0:4])
            count, = _unpack(endian, "Q" if big else "I", ent[4 : esz - inline_cap])
            size = _TYPE_SIZE.get(typ, 1) * count
            if size <= inline_cap:
                val_bytes = ent[esz - inline_cap : esz - inline_cap + size]
            else:
                off, = _unpack(endian, "Q" if big else "I", ent[esz - inline_cap : esz])
                val_bytes = read(off, size)
            tags[tag] = (typ, count, val_bytes)
        next_ifd, = _unpack(endian, "Q" if big else "I", raw[n_entries * esz :])
        infos.append(_info_from_tags(endian, tags))
    return infos


def _tag_values(endian: str, entry: tuple):
    typ, count, vb = entry
    if typ == 2:  # ASCII
        return vb.rstrip(b"\x00").decode("ascii", "replace")
    if typ == 7:  # UNDEFINED: raw bytes (JPEGTables etc.)
        return vb
    if typ in (5, 10):  # RATIONAL
        fmt = "II" if typ == 5 else "ii"
        out = []
        for i in range(count):
            num, den = _unpack(endian, fmt, vb[i * 8 : i * 8 + 8])
            out.append(num / den if den else float("nan"))
        return out
    fmt = _TYPE_FMT[typ]
    return list(_unpack(endian, fmt * count, vb))


def _info_from_tags(endian: str, tags: dict) -> TiffInfo:
    def get(tag, default=None):
        if tag not in tags:
            return default
        return _tag_values(endian, tags[tag])

    width = get(_W)[0]
    height = get(_H)[0]
    samples = (get(_SPP) or [1])[0]
    bits = (get(_BITS) or [8])[0]
    sfmt = (get(_SFORMAT) or [1])[0]
    comp = (get(_COMP) or [1])[0]
    pred = (get(_PREDICTOR) or [1])[0]
    planar = (get(_PLANAR) or [1])[0]
    tiled = _TILE_OFF in tags
    if tiled:
        tw, th = get(_TILE_W)[0], get(_TILE_H)[0]
        offsets, counts = get(_TILE_OFF), get(_TILE_CNT)
    else:
        tw = width
        th = (get(_RPS) or [height])[0]
        offsets, counts = get(_STRIP_OFF), get(_STRIP_CNT)
    scale = get(_MODEL_SCALE)
    tie = get(_MODEL_TIE)
    nod = get(_GDAL_NODATA)
    return TiffInfo(
        endian=endian, width=width, height=height, bits=bits, sample_format=sfmt,
        samples=samples, compression=comp, predictor=pred, tiled=tiled,
        tile_w=tw, tile_h=th, offsets=offsets, counts=counts,
        pixel_scale=(scale[0], scale[1]) if scale else None,
        tiepoint=(tie[0], tie[1], tie[3], tie[4]) if tie and len(tie) >= 5 else None,
        geokeys=tuple(get(_GEOKEYS) or ()) or None,
        nodata=float(nod) if nod not in (None, "") else None,
        jpeg_tables=get(_JPEG_TABLES) or None,
        planar=planar,
    )


def lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 LZW (compression 5): MSB-first variable-width codes 9->12
    bits, ClearCode 256 / EOI 257, with the spec's EARLY-CHANGE rule (the
    code width grows one code earlier than strictly necessary — TIFF 6.0
    §13 'LZW Compression', the documented deviation every reader honors)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    code_size = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_size = 9
        prev = None

    reset()
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return bytes(out)
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        if len(table) >= (1 << code_size) - 1 and code_size < 12:
            code_size += 1  # early change


def lzw_encode(data: bytes) -> bytes:
    """Matching TIFF 6.0 LZW encoder (fixture writer): greedy longest-match,
    early-change width growth, table reset at the 12-bit ceiling."""
    CLEAR, EOI = 256, 257
    bits: list[tuple[int, int]] = []  # (code, width)

    table: dict[bytes, int] = {}
    next_code = 258
    width = 9

    def reset():
        nonlocal table, next_code, width
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9

    reset()
    bits.append((CLEAR, width))
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by ONE entry (it cannot add
        # for the first code after a clear), so its early-change point
        # len >= 2^w - 1 corresponds to next_code == 2^w here
        if next_code == (1 << width) and width < 12:
            width += 1
        w = c
        if next_code >= 4094:  # 12-bit ceiling: clear and restart
            bits.append((table[w], width))
            bits.append((CLEAR, width))
            reset()
            w = b""
    if w:
        bits.append((table[w], width))
    bits.append((EOI, width))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, wd in bits:
        buf = (buf << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    """PackBits (compression 32773): Apple RLE per TIFF 6.0 §9."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: replicate runs >= 3, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: collect until a >=3 run starts (or 128 bytes)
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _decode_block(info: TiffInfo, data: bytes, bw: int, bh: int) -> np.ndarray:
    if info.compression == 7:  # new-style JPEG-in-TIFF (our baseline codec)
        from ..functions.jpeg import decode_jpeg

        stream = data
        if info.jpeg_tables:
            # abbreviated strip stream + shared JPEGTables blob (tag 347:
            # SOI..DQT/DHT..EOI): splice tables after the strip's SOI
            stream = b"\xff\xd8" + bytes(info.jpeg_tables)[2:-2] + data[2:]
        img = decode_jpeg(stream)
        if img.ndim == 2:
            img = img[:, :, None]
        out = np.zeros((bh, bw, info.samples), dtype=info.dtype.newbyteorder("="))
        h2, w2 = min(bh, img.shape[0]), min(bw, img.shape[1])
        out[:h2, :w2] = img[:h2, :w2, : info.samples]
        return out
    if info.compression in (8, 32946):
        data = zlib.decompress(data)
    elif info.compression == 5:
        data = lzw_decode(data)
    elif info.compression == 32773:
        data = packbits_decode(data)
    elif info.compression != 1:
        raise ValueError(f"unsupported TIFF compression {info.compression}")
    s_in_block = 1 if info.planar == 2 else info.samples
    if info.predictor == 3:
        # floating-point predictor (TIFF TechNote 3): per row, the value
        # bytes are split into byte planes MSB-first, then horizontally
        # byte-differenced. Undo: cumsum the row bytes, regroup planes,
        # reassemble big-endian values.
        isz = info.dtype.itemsize
        rowb = bw * s_in_block * isz
        nrows = len(data) // rowb
        raw = np.frombuffer(data[: nrows * rowb], dtype=np.uint8).reshape(nrows, rowb)
        undiff = np.cumsum(raw.astype(np.uint16), axis=1).astype(np.uint8)
        planes = undiff.reshape(nrows, isz, bw * s_in_block)
        be = np.ascontiguousarray(planes.transpose(0, 2, 1)).reshape(nrows, -1)
        vals = np.frombuffer(be.tobytes(), dtype=info.dtype.newbyteorder(">"))
        arr = vals.astype(info.dtype.newbyteorder("="))
    else:
        arr = np.frombuffer(data, dtype=info.dtype)
    want = bw * bh * s_in_block
    if len(arr) < want:  # short final strip: pad (writers may truncate)
        arr = np.concatenate([arr, np.zeros(want - len(arr), dtype=arr.dtype)])
    arr = arr[:want].reshape(bh, bw, s_in_block)
    if info.predictor == 2 and info.compression != 7:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(info.dtype)
    return arr


def _fetch_blocks(read, info: TiffInfo, indices: list[int], max_gap: int = 4096) -> dict[int, bytes]:
    """Fetch the given block indices with RANGE COALESCING: consecutive
    blocks whose byte ranges are adjacent (or separated by <= max_gap waste
    bytes) merge into one ranged read — over HTTP this turns one request per
    strip into one request per contiguous run, the standard COG-reader
    optimization."""
    order = sorted(set(indices), key=lambda i: info.offsets[i])
    out: dict[int, bytes] = {}
    run: list[int] = []
    for bi in order:
        if run and info.offsets[bi] - (info.offsets[run[-1]] + info.counts[run[-1]]) > max_gap:
            _fetch_run(read, info, run, out)
            run = []
        run.append(bi)
    if run:
        _fetch_run(read, info, run, out)
    return out


def _fetch_run(read, info: TiffInfo, run: list[int], out: dict[int, bytes]):
    start = info.offsets[run[0]]
    end = info.offsets[run[-1]] + info.counts[run[-1]]
    blob = read(start, end - start)
    for bi in run:
        o = info.offsets[bi] - start
        out[bi] = blob[o : o + info.counts[bi]]


def read_window(read, info: TiffInfo, col0: int, row0: int, w: int, h: int) -> np.ndarray:
    """Read a (h, w, samples) window; fetches ONLY intersecting blocks,
    with adjacent byte ranges coalesced into single reads."""
    col0, row0 = max(0, col0), max(0, row0)
    w = min(w, info.width - col0)
    h = min(h, info.height - row0)
    out = np.zeros((h, w, info.samples), dtype=info.dtype.newbyteorder("="))
    planes = range(info.samples) if info.planar == 2 else (None,)
    per_plane = (len(info.offsets) // info.samples) if info.planar == 2 else 0
    # collect every needed (block index, paste target) first, then fetch
    # with range coalescing, then decode + paste
    wanted: list[tuple[int, int | None, int, int]] = []  # (bi, sp, px, py)
    if info.tiled:
        across = (info.width + info.tile_w - 1) // info.tile_w
        b0x, b1x = col0 // info.tile_w, (col0 + w - 1) // info.tile_w
        b0y, b1y = row0 // info.tile_h, (row0 + h - 1) // info.tile_h
        for sp in planes:
            base = (sp or 0) * per_plane
            for by in range(b0y, b1y + 1):
                for bx in range(b0x, b1x + 1):
                    wanted.append((base + by * across + bx, sp,
                                   bx * info.tile_w, by * info.tile_h))
    else:
        b0, b1 = row0 // info.tile_h, (row0 + h - 1) // info.tile_h
        for sp in planes:
            base = (sp or 0) * per_plane
            for bi in range(b0, b1 + 1):
                wanted.append((base + bi, sp, 0, bi * info.tile_h))
    blobs = _fetch_blocks(read, info, [t[0] for t in wanted])
    for bi, sp, px, py in wanted:
        if info.tiled:
            bw_, bh_ = info.tile_w, info.tile_h
        else:
            bw_ = info.width
            bh_ = min(info.tile_h, info.height - py)
        block = _decode_block(info, blobs[bi], bw_, bh_)
        target = out if sp is None else out[:, :, sp : sp + 1]
        _paste(target, block, px, py, col0, row0)
    return out


def _paste(out: np.ndarray, block: np.ndarray, bx0: int, by0: int, col0: int, row0: int):
    h, w = out.shape[:2]
    src_x0 = max(0, col0 - bx0)
    src_y0 = max(0, row0 - by0)
    dst_x0 = max(0, bx0 - col0)
    dst_y0 = max(0, by0 - row0)
    cw = min(block.shape[1] - src_x0, w - dst_x0)
    ch = min(block.shape[0] - src_y0, h - dst_y0)
    if cw > 0 and ch > 0:
        out[dst_y0 : dst_y0 + ch, dst_x0 : dst_x0 + cw] = (
            block[src_y0 : src_y0 + ch, src_x0 : src_x0 + cw]
        )


def read_extent_window(read, info: TiffInfo, xmin: float, ymin: float,
                       xmax: float, ymax: float) -> np.ndarray:
    """Windowed read by GEO extent (the reference's rs.read(extent) shape,
    GeoTiffNode.scala:88-93): map the extent through the geotransform to a
    grid window (row 0 = north edge) and read only that."""
    ext = info.geo_extent()
    if ext is None:
        raise ValueError("TIFF has no geotransform tags")
    gx0, gy0, gx1, gy1 = ext
    sx = (gx1 - gx0) / info.width
    sy = (gy1 - gy0) / info.height
    col0 = int(round((xmin - gx0) / sx))
    col1 = int(round((xmax - gx0) / sx))
    row0 = int(round((gy1 - ymax) / sy))
    row1 = int(round((gy1 - ymin) / sy))
    return read_window(read, info, col0, row0, col1 - col0, row1 - row0)


def file_range_reader(path: str):
    """Plain file-backed ``read(offset, length)`` (the Azure/S3 range-read
    stand-in; see state/caches.HeaderByteCache for the cached wrapper)."""
    def read(offset: int, length: int) -> bytes:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)

    return read


# ------------------------------------------------------------------ writer

_SFMT_OF_KIND = {"u": 1, "i": 2, "f": 3}


def _header(bigtiff: bool) -> bytes:
    if bigtiff:  # magic 43, 8-byte offsets, first IFD at 16
        return b"II" + struct.pack("<HHHQ", 43, 8, 0, 16)
    return b"II" + struct.pack("<HI", 42, 8)


def write_tiff(array: np.ndarray, compression: str = "none",
               pixel_scale: tuple | None = None, tiepoint: tuple | None = None,
               epsg: int | None = None, rows_per_strip: int | None = None,
               nodata: float | None = None, tile: tuple | None = None,
               bigtiff: bool = False, predictor: int = 1,
               planar: int = 1) -> bytes:
    """Encode a (h, w) or (h, w, samples) array as a little-endian TIFF;
    with geo args it is a baseline GeoTIFF. ``tile=(tw, th)`` writes a tiled
    layout instead of strips; ``bigtiff=True`` writes BigTIFF (magic 43,
    8-byte offsets — the >4 GiB form large-scale outputs need);
    ``predictor=2`` applies horizontal differencing before compression
    (integer samples; the usual companion of LZW/deflate)."""
    hdr = _header(bigtiff)
    return hdr + _encode_ifd(
        array, compression=compression, pixel_scale=pixel_scale,
        tiepoint=tiepoint, epsg=epsg, rows_per_strip=rows_per_strip,
        nodata=nodata, base=len(hdr), next_ifd=0, tile=tile, bigtiff=bigtiff,
        predictor=predictor, planar=planar)


def write_tiff_pyramid(arrays: list[np.ndarray], compression: str = "none",
                       pixel_scale: tuple | None = None,
                       tiepoint: tuple | None = None, epsg: int | None = None,
                       rows_per_strip: int | None = None,
                       nodata: float | None = None) -> bytes:
    """Multi-IFD GeoTIFF: arrays[0] is full resolution, the rest are
    overview levels covering the SAME extent at coarser grids (a COG-style
    internal pyramid; the reader's parse_ifds walks the chain and
    rastersource.select_overview picks a level). Each level's pixel_scale is
    derived from the base scale by the width ratio."""
    buf = bytearray(_header(False))
    cursor = 8
    for i, a in enumerate(arrays):
        ps = None
        if pixel_scale is not None:
            ratio = arrays[0].shape[1] / a.shape[1]
            ps = (pixel_scale[0] * ratio, pixel_scale[1] * ratio)
        kw = dict(compression=compression, pixel_scale=ps, tiepoint=tiepoint,
                  epsg=epsg, rows_per_strip=rows_per_strip, nodata=nodata)
        # two-pass: chunk length is independent of the next_ifd VALUE, so
        # encode once to size it, then re-encode with the real link
        probe = _encode_ifd(a, base=cursor, next_ifd=0, **kw)
        nxt = 0 if i == len(arrays) - 1 else cursor + len(probe)
        chunk = probe if nxt == 0 else _encode_ifd(a, base=cursor, next_ifd=nxt, **kw)
        buf += chunk
        cursor += len(chunk)
    return bytes(buf)


def _encode_ifd(array: np.ndarray, compression: str = "none",
                pixel_scale: tuple | None = None, tiepoint: tuple | None = None,
                epsg: int | None = None, rows_per_strip: int | None = None,
                nodata: float | None = None, base: int = 8,
                next_ifd: int = 0, tile: tuple | None = None,
                bigtiff: bool = False, predictor: int = 1,
                planar: int = 1) -> bytes:
    """One IFD + its out-of-line values + block data (strips or tiles),
    laid out to live at absolute file offset ``base``."""
    if array.ndim == 2:
        array = array[:, :, None]
    h, w, s = array.shape
    dt = array.dtype
    sfmt = _SFMT_OF_KIND[dt.kind]
    bits = dt.itemsize * 8
    arr = np.ascontiguousarray(array, dtype=dt.newbyteorder("<"))

    if predictor == 2 and dt.kind not in ("u", "i"):
        raise ValueError("predictor 2 needs integer samples")
    if predictor == 3 and dt.kind != "f":
        raise ValueError("predictor 3 (floating point) needs float samples")
    if predictor == 3 and compression == "jpeg":
        raise ValueError("predictor 3 cannot be combined with jpeg compression")
    if predictor == 2 and compression == "jpeg":
        # the JPEG decode branch returns before the predictor undo (and
        # differencing pixels before a LOSSY codec is meaningless anyway)
        raise ValueError("predictor 2 cannot be combined with jpeg compression")

    def encode_chunk(chunk: np.ndarray) -> bytes:
        if predictor == 3:
            ch, cw, cs = chunk.shape
            be = np.ascontiguousarray(chunk.astype(dt.newbyteorder(">")))
            rows = np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(ch, cw * cs, dt.itemsize)
            planes = np.ascontiguousarray(rows.transpose(0, 2, 1)).reshape(ch, -1)
            diffed = planes.copy()
            diffed[:, 1:] = planes[:, 1:] - planes[:, :-1]  # uint8 wraps
            enc = {"deflate": zlib.compress, "lzw": lzw_encode,
                   "packbits": packbits_encode, "none": lambda b: b}[compression]
            return enc(diffed.tobytes())
        if predictor == 2:
            # horizontal differencing per sample, wraparound via the dtype
            with np.errstate(over="ignore"):
                chunk = np.concatenate(
                    [chunk[:, :1], (chunk[:, 1:].astype(np.int64)
                                    - chunk[:, :-1].astype(np.int64)).astype(chunk.dtype)],
                    axis=1)
        if compression == "jpeg":
            from ..functions.jpeg import encode_jpeg

            if dt != np.uint8 or s not in (1, 3):
                raise ValueError("jpeg compression needs uint8 with 1 or 3 samples")
            return encode_jpeg(chunk[:, :, 0] if s == 1 else chunk, quality=95)
        enc = {"deflate": zlib.compress, "lzw": lzw_encode,
               "packbits": packbits_encode, "none": lambda b: b}[compression]
        return enc(np.ascontiguousarray(chunk).tobytes())

    if planar == 2 and compression == "jpeg":
        raise ValueError("planar=2 with jpeg is not supported")
    planes = ([arr[:, :, i : i + 1] for i in range(s)] if planar == 2 else [arr])
    blocks = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        for plane in planes:  # planar=2: full tile run per sample, sample-major
            ps = plane.shape[2]
            for ty in range(0, h, th):  # row-major tile order, edge tiles padded
                for tx in range(0, w, tw):
                    t = np.zeros((th, tw, ps), dtype=arr.dtype)
                    src_block = plane[ty : ty + th, tx : tx + tw]
                    t[: src_block.shape[0], : src_block.shape[1]] = src_block
                    blocks.append(encode_chunk(t))
    else:
        rps = rows_per_strip or h
        for plane in planes:
            for r0 in range(0, h, rps):
                blocks.append(encode_chunk(plane[r0 : r0 + rps]))

    comp_tag = {"deflate": 8, "lzw": 5, "packbits": 32773, "none": 1,
                "jpeg": 7}[compression]
    entries: list[tuple[int, int, list]] = [
        (_W, 4, [w]), (_H, 4, [h]), (_BITS, 3, [bits] * s),
        (_COMP, 3, [comp_tag]),
        (_PHOTO, 3, [1]), (_SPP, 3, [s]),
        (_SFORMAT, 3, [sfmt] * s),
    ]
    if predictor in (2, 3):
        entries.append((_PREDICTOR, 3, [predictor]))
    if planar == 2:
        entries.append((_PLANAR, 3, [2]))
    if tile is not None:
        entries.append((_TILE_W, 4, [tile[0]]))
        entries.append((_TILE_H, 4, [tile[1]]))
    else:
        entries.append((_RPS, 3, [min(rows_per_strip or h, h)]))
    if pixel_scale is not None:
        entries.append((_MODEL_SCALE, 12, [pixel_scale[0], pixel_scale[1], 0.0]))
    if tiepoint is not None:
        px, py, gx, gy = tiepoint
        entries.append((_MODEL_TIE, 12, [px, py, 0.0, gx, gy, 0.0]))
    if epsg is not None:
        model = 2 if epsg == 4326 else 1
        keys = [1, 1, 0, 3, 1024, 0, 1, model, 1025, 0, 1, 1,
                (2048 if model == 2 else 3072), 0, 1, epsg]
        keys[3] = 3
        entries.append((_GEOKEYS, 3, keys))
    if nodata is not None:
        txt = (repr(float(nodata)) + "\x00").encode()
        entries.append((_GDAL_NODATA, 2, list(txt)))

    # layout at ``base``: IFD | out-of-line values | block data
    esz, inline_cap = (20, 8) if bigtiff else (12, 4)
    off_fmt = "Q" if bigtiff else "I"
    n_with_blocks = len(entries) + 2
    ifd_size = (8 + n_with_blocks * esz + 8) if bigtiff else (2 + n_with_blocks * esz + 4)
    cursor = base + ifd_size

    def pack_values(typ, vals):
        if typ == 2:
            return bytes(vals)
        if typ == 12:
            return struct.pack("<" + "d" * len(vals), *[float(v) for v in vals])
        fmt = _TYPE_FMT[typ]
        return struct.pack("<" + fmt * len(vals), *vals)

    out_of_line = bytearray()
    packed = []
    for tag, typ, vals in entries:
        vb = pack_values(typ, vals)
        count = len(vals)
        if len(vb) <= inline_cap:
            packed.append((tag, typ, count, vb.ljust(inline_cap, b"\x00"), None))
        else:
            packed.append((tag, typ, count, None, cursor + len(out_of_line)))
            out_of_line += vb

    # block offsets/counts: LONG on classic, LONG8 on BigTIFF
    off_tag, cnt_tag = (_TILE_OFF, _TILE_CNT) if tile is not None else (_STRIP_OFF, _STRIP_CNT)
    arr_typ = 16 if bigtiff else 4
    osz = 8 if bigtiff else 4
    n_blocks = len(blocks)
    counts_vals = [len(b) for b in blocks]
    block_data_start = cursor + len(out_of_line)
    if n_blocks * osz <= inline_cap:
        offs_field = struct.pack("<" + off_fmt * n_blocks, block_data_start).ljust(inline_cap, b"\x00")
        cnt_field = struct.pack("<" + off_fmt * n_blocks, *counts_vals).ljust(inline_cap, b"\x00")
        packed.append((off_tag, arr_typ, n_blocks, offs_field, None))
        packed.append((cnt_tag, arr_typ, n_blocks, cnt_field, None))
    else:
        off_pos = block_data_start
        # out-of-line arrays come before block data; recompute layout
        arrays_size = n_blocks * osz * 2
        data_start = block_data_start + arrays_size
        offs = []
        p = data_start
        for c in counts_vals:
            offs.append(p)
            p += c
        packed.append((off_tag, arr_typ, n_blocks, None, off_pos))
        packed.append((cnt_tag, arr_typ, n_blocks, None, off_pos + n_blocks * osz))
        out_of_line += struct.pack("<" + off_fmt * n_blocks, *offs)
        out_of_line += struct.pack("<" + off_fmt * n_blocks, *counts_vals)

    packed.sort(key=lambda e: e[0])
    buf = bytearray()
    buf += struct.pack("<Q" if bigtiff else "<H", n_with_blocks)
    for tag, typ, count, inline, off in packed:
        buf += struct.pack("<HH", tag, typ)
        buf += struct.pack("<" + off_fmt, count)
        buf += inline if inline is not None else struct.pack("<" + off_fmt, off)
    buf += struct.pack("<" + off_fmt, next_ifd)
    buf += out_of_line
    for bts in blocks:
        buf += bts
    return bytes(buf)
