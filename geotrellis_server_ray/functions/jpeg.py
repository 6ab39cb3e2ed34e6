"""Baseline JPEG encoder + minimal decoder (SURVEY.md §2.3 S7, VERDICT
round-1 missing #3: the reference encodes PNG/JPG/GeoTiff —
ogc/.../OutputFormat.scala:26-140, Render.scala:28-75).

Pure stdlib/numpy ITU-T81 baseline sequential: 8x8 DCT (one matrix triple
product over the whole block stack — vectorized), libjpeg-style quality
scaling of the Annex-K quantization tables, standard Annex-K Huffman tables,
4:4:4 (no subsampling), JFIF headers. The entropy coder is a per-coefficient
bit writer (inherently serial per MCU; at engine scale each tile encodes
inside an actor-pool map_batches task, so parallelism comes from tiles, not
from within one image).

The decoder exists to VALIDATE the encoder (no imaging libs in this
container): it baseline-decodes our own output so tests can assert PSNR
round-trip bounds. JPEG is lossy; exact equality is not the contract.

Since the raster path renders RGBA and JPEG has no alpha, `rgba_to_jpeg`
composites transparent cells over mid-grey first — the reference's
nodata->grey JPG behavior (OutputFormat.scala:119-123).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------- Annex K constants

_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_DC_L_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))

_AC_L_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.sqrt((1.0 if _k else 0.5) / 4.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


_HDC_L = _huff_codes(_DC_L_BITS, _DC_L_VALS)
_HAC_L = _huff_codes(_AC_L_BITS, _AC_L_VALS)
_HDC_C = _huff_codes(_DC_C_BITS, _DC_C_VALS)
_HAC_C = _huff_codes(_AC_C_BITS, _AC_C_VALS)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks_y, n_blocks_x, 8, 8) with edge replication."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _encode_plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane -> zigzagged quantized coefficients (nby, nbx, 64), vectorized:
    one DCT triple product over the whole block stack."""
    b = _blocks_of(plane) - 128.0
    coef = np.einsum("ij,xyjk,lk->xyil", _D, b, _D)
    quant = np.round(coef / q).astype(np.int64)
    return quant.reshape(*quant.shape[:2], 64)[:, :, _ZIGZAG]


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scaled_q(_QY, quality)
    qc = _scaled_q(_QC, quality)
    if gray:
        planes = [(img.astype(np.float64), qy, _HDC_L, _HAC_L, 0)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, qy, _HDC_L, _HAC_L, 0), (cb, qc, _HDC_C, _HAC_C, 1),
                  (cr, qc, _HDC_C, _HAC_C, 1)]
    coeffs = [_encode_plane_coeffs(p, q) for p, q, *_ in planes]
    nby, nbx = coeffs[0].shape[:2]

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(nby):
        for bx in range(nbx):
            for ci, (_, _, hdc, hac, _) in enumerate(planes):
                z = coeffs[ci][by, bx]
                dc = int(z[0]) - prev_dc[ci]
                prev_dc[ci] = int(z[0])
                cat, bits = _magnitude(dc)
                code, ln = hdc[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(bits, cat)
                run = 0
                last_nz = np.nonzero(z[1:])[0]
                end = last_nz[-1] + 1 if len(last_nz) else 0
                for i in range(1, end + 1):
                    v = int(z[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = hac[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    cat, bits = _magnitude(v)
                    code, ln = hac[(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(bits, cat)
                    run = 0
                if end < 63:
                    code, ln = hac[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.astype(np.uint8).ravel()[_ZIGZAG]))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8).ravel()[_ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_L_BITS[1:]) + bytes(_DC_L_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_L_BITS[1:]) + bytes(_AC_L_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_C_BITS[1:]) + bytes(_DC_C_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_AC_C_BITS[1:]) + bytes(_AC_C_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def rgba_to_jpeg(colors: np.ndarray, width: int, height: int, quality: int = 75) -> bytes:
    """0xRRGGBBAA uint32 grid -> JPEG; transparent cells composite over
    mid-grey (OutputFormat.scala:119-123's nodata->grey JPG rule)."""
    c = np.asarray(colors, dtype=np.uint32).reshape(height, width)
    r = (c >> 24) & 0xFF
    g = (c >> 16) & 0xFF
    b = (c >> 8) & 0xFF
    a = (c & 0xFF).astype(np.float64) / 255.0
    grey = 0x7F
    img = np.stack([
        (r * a + grey * (1 - a)),
        (g * a + grey * (1 - a)),
        (b * a + grey * (1 - a)),
    ], axis=-1).round().clip(0, 255).astype(np.uint8)
    return encode_jpeg(img, quality)


# -------------------------------------------------------------- decoder

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF and self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # unstuff
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(r: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = r.read_bits(cat)
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Minimal baseline decoder for OUR encoder's output (4:4:4, one scan).
    Returns (h, w) or (h, w, 3) uint8."""
    pos = 2  # skip SOI
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict] = {}
    h = w = ncomp = 0
    comp_q: list[int] = []
    comp_h: list[tuple[int, int]] = []
    scan = b""
    while pos < len(data):
        assert data[pos] == 0xFF, "marker expected"
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            qid = seg[0] & 0x0F
            q = np.zeros(64)
            q[_ZIGZAG] = np.frombuffer(seg[1:65], dtype=np.uint8)
            qts[qid] = q.reshape(8, 8)
        elif marker == 0xC4:
            cls_id = (seg[0] >> 4, seg[0] & 0x0F)
            bits = [0] + list(seg[1:17])
            nv = sum(bits)
            vals = list(seg[17 : 17 + nv])
            codes = _huff_codes(bits, vals)
            hts[cls_id] = {(lnn, code): sym for sym, (code, lnn) in codes.items()}
        elif marker == 0xC0:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comp_q = [seg[6 + 3 * i + 2] for i in range(ncomp)]
        elif marker == 0xDA:
            ns = seg[0]
            comp_h = [((seg[1 + 2 * i + 1] >> 4), (seg[1 + 2 * i + 1] & 0x0F)) for i in range(ns)]
            scan = data[pos + 2 + ln : -2]
            pos = len(data)
            break
        pos += 2 + ln

    r = _BitReader(scan)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in range(ncomp)]
    prev_dc = [0] * ncomp

    def huff_decode(table: dict) -> int:
        code, lnn = 0, 0
        while lnn < 16:
            code = (code << 1) | r.read_bit()
            lnn += 1
            if (lnn, code) in table:
                return table[(lnn, code)]
        raise ValueError("bad huffman code")

    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                dct, act = comp_h[ci]
                z = np.zeros(64)
                cat = huff_decode(hts[(0, dct)])
                prev_dc[ci] += _receive_extend(r, cat)
                z[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = huff_decode(hts[(1, act)])
                    if sym == 0x00:
                        break
                    run, cat = sym >> 4, sym & 0x0F
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += run
                    z[k] = _receive_extend(r, cat)
                    k += 1
                blk = np.zeros(64)
                blk[_ZIGZAG] = z
                coef = blk.reshape(8, 8) * qts[comp_q[ci]]
                pix = _D.T @ coef @ _D + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix

    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r_, g_, b_], axis=-1)), 0, 255).astype(np.uint8)
