"""Rendering: color ramps, color maps, interpolated color maps, PNG encode.

Mirrors the reference's style/render surface (SURVEY.md §2.9 / S7):
  * color-ramp render with interpolated breaks — out-of-range transparent
    unless clamped (ColorRampStyle.scala:55-77)
  * fixed color-map render (ColorMapStyle.scala:27-39)
  * InterpolatedColorMap: binary-search pole lookup + per-channel linear RGB
    interpolation, Clip{None,Left,Right,Both} edge policies, NoData ->
    transparent (InterpolatedColorMap.scala:33-100; golden semantics from
    InterpolatedColorMapSpec.scala:40-70)
  * singleband/multiband dispatch: bandCount==1 -> colormapped singleband
    (ogc/.../package.scala:38-42)
  * PNG encoding: minimal RGBA32 encoder over stdlib zlib (no imaging libs
    in this container; output is a valid PNG byte stream)

Colors are 0xRRGGBBAA uint32 (the geotrellis RGBA convention).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def rgba(r: int, g: int, b: int, a: int = 255) -> int:
    return (r << 24) | (g << 16) | (b << 8) | a


def _channels(c: np.ndarray):
    c = np.asarray(c, dtype=np.uint32)
    return (c >> 24) & 0xFF, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF


def parse_color_map(s: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse the reference's color-map config string — ``{break: 0xRRGGBBAA,
    ...}`` with quoted OR unquoted keys (the two HOCON spellings
    ColorMapConfigurationSpec.scala:31-41 requires to load identically) —
    into break-sorted (breaks float64, colors uint32) ready for
    color_map_render."""
    body = s.strip()
    if body.startswith("{"):
        body = body[1:]
    if body.endswith("}"):
        body = body[:-1]
    breaks: list[float] = []
    colors: list[int] = []
    for part in body.split(","):
        part = part.strip()
        if not part:
            continue
        k, v = part.split(":", 1)
        breaks.append(float(k.strip().strip('"')))
        colors.append(int(v.strip().strip('"'), 16))
    order = np.argsort(np.asarray(breaks, dtype=np.float64), kind="stable")
    return (np.asarray(breaks, dtype=np.float64)[order],
            np.asarray(colors, dtype=np.uint32)[order])


def color_map_render(values: np.ndarray, breaks: np.ndarray, colors: np.ndarray,
                     nodata_mask: np.ndarray | None = None,
                     fallback: int = 0) -> np.ndarray:
    """Fixed color map: value v gets colors[i] for the first break[i] >= v
    (geotrellis LessThanOrEqualTo default); above all breaks -> fallback
    (transparent by default). NoData -> transparent."""
    v = np.asarray(values, dtype=np.float64)
    idx = np.searchsorted(breaks, v, side="left")
    out = np.where(idx < len(breaks), np.asarray(colors, dtype=np.uint32)[np.minimum(idx, len(colors) - 1)],
                   np.uint32(fallback))
    if nodata_mask is not None:
        out = np.where(nodata_mask, np.uint32(0), out)
    return out.astype(np.uint32)


def color_ramp_render(values: np.ndarray, vmin: float, vmax: float, ramp: np.ndarray,
                      nodata_mask: np.ndarray | None = None,
                      clamp_with_color: bool = False) -> np.ndarray:
    """Color-ramp render with linspace(vmin, vmax, len(ramp)) breaks
    (ColorRampStyle semantics): out-of-range cells are transparent unless
    ``clamp_with_color`` (then they take the edge colors)."""
    breaks = np.linspace(vmin, vmax, len(ramp))
    out = color_map_render(values, breaks, np.asarray(ramp, dtype=np.uint32), nodata_mask,
                           fallback=int(ramp[-1]) if clamp_with_color else 0)
    v = np.asarray(values, dtype=np.float64)
    if clamp_with_color:
        out = np.where(v < vmin, np.uint32(ramp[0]), out)
    else:
        out = np.where(v < vmin, np.uint32(0), out)
    out = np.where(np.isnan(v), np.uint32(0), out)  # non-data -> transparent
    if nodata_mask is not None:
        out = np.where(nodata_mask, np.uint32(0), out)
    return out.astype(np.uint32)


class InterpolatedColorMap:
    """Pole-interpolated color map with clip policies."""

    def __init__(self, poles: dict[float, int], clip: str = "none"):
        ks = np.array(sorted(poles), dtype=np.float64)
        self.keys = ks
        self.colors = np.array([poles[k] for k in ks], dtype=np.uint32)
        assert clip in ("none", "left", "right", "both")
        self.clip = clip

    def render(self, values: np.ndarray, nodata_mask: np.ndarray | None = None) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        k = self.keys
        idx = np.searchsorted(k, v, side="right")
        lo = np.clip(idx - 1, 0, len(k) - 1)
        hi = np.clip(idx, 0, len(k) - 1)
        span = k[hi] - k[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.where(span > 0, (v - k[lo]) / np.where(span > 0, span, 1.0), 0.0)
        r0, g0, b0, a0 = _channels(self.colors[lo])
        r1, g1, b1, a1 = _channels(self.colors[hi])

        def lerp(c0, c1):
            # float math BEFORE the subtraction: uint32 c1-c0 underflows for
            # any channel that decreases between poles. floor (=toInt for
            # non-negative channels) matches the reference golden: midpoint of
            # 0..255 is 127, not 128 (InterpolatedColorMapSpec.scala:39-49)
            d = c1.astype(np.float64) - c0.astype(np.float64)
            return np.clip(np.floor(c0.astype(np.float64) + d * t), 0, 255).astype(np.uint32)

        out = (lerp(r0, r1) << 24) | (lerp(g0, g1) << 16) | (lerp(b0, b1) << 8) | lerp(a0, a1)
        # Reference semantics (InterpolatedColorMapSpec.scala:51-75):
        # ClipNone EXTENDS the edge colors beyond the pole range; ClipLeft/
        # ClipRight/ClipBoth make the named side(s) transparent.
        below, above = v < k[0], v > k[-1]
        if self.clip in ("left", "both"):
            out = np.where(below, np.uint32(0), out)
        else:
            out = np.where(below, self.colors[0], out)
        if self.clip in ("right", "both"):
            out = np.where(above, np.uint32(0), out)
        else:
            out = np.where(above, self.colors[-1], out)
        # NaN = non-data -> transparent regardless of mask (the reference
        # renders isData==false as 0)
        out = np.where(np.isnan(v), np.uint32(0), out)
        if nodata_mask is not None:
            out = np.where(nodata_mask, np.uint32(0), out)
        return out.astype(np.uint32)


def render_tile(values: np.ndarray, style, nodata_mask: np.ndarray | None = None,
                band_count: int = 1) -> np.ndarray:
    """Render dispatch (ogc/.../package.scala:38-42): singleband ->
    style-mapped; multiband -> assume pre-composed RGB uint32."""
    if band_count == 1:
        return style.render(values, nodata_mask) if hasattr(style, "render") else style(values, nodata_mask)
    return np.asarray(values, dtype=np.uint32)


def encode_image(colors: np.ndarray, width: int, height: int, fmt: str = "png",
                 quality: int = 75) -> bytes:
    """OutputFormat dispatch (ogc/.../OutputFormat.scala:26-140 +
    Render.scala:28-75): 'png' -> RGBA PNG; 'jpg' -> baseline JPEG with
    transparent cells composited over mid-grey (the reference's nodata->grey
    JPG rule, OutputFormat.scala:119-123); 'tif'/'geotiff' -> 4-sample
    baseline TIFF of the RGBA channels."""
    if fmt == "png":
        return encode_png_rgba(colors, width, height)
    if fmt in ("jpg", "jpeg"):
        from .jpeg import rgba_to_jpeg

        return rgba_to_jpeg(colors, width, height, quality)
    if fmt in ("tif", "geotiff"):
        from ..sources.tiff import write_tiff

        c = np.asarray(colors, dtype=np.uint32).reshape(height, width)
        r, g, b, a = _channels(c)
        img = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
        return write_tiff(img, compression="deflate")
    raise ValueError(f"unknown output format: {fmt}")


def encode_png_rgba_stored(colors: np.ndarray, width: int, height: int) -> bytes:
    """`encode_png_rgba` with hand-rolled zlib STORED blocks (RFC 1950/1951
    BTYPE=00) instead of deflate: every output byte is closed-form in the
    pixel values — no Huffman state — so the full-file CRC32 is replayable
    in SQL (the oracle for the GetMap render path, VERDICT r4 next #2).
    Any PNG reader decodes it identically to the level-6 variant."""
    c = np.asarray(colors, dtype=np.uint32).reshape(height, width)
    r, g, b, a = _channels(c)
    img = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(height))

    # zlib container: CMF/FLG 78 01, stored blocks of <=65535 bytes (BFINAL
    # on the last), adler32 big-endian
    z = bytearray(b"\x78\x01")
    for off in range(0, max(len(raw), 1), 65535):
        blk = raw[off:off + 65535]
        final = off + 65535 >= len(raw)
        z += struct.pack("<BHH", 1 if final else 0, len(blk), len(blk) ^ 0xFFFF)
        z += blk
    z += struct.pack(">I", zlib.adler32(raw))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bytes(z)) + chunk(b"IEND", b""))


def encode_png_rgba(colors: np.ndarray, width: int, height: int) -> bytes:
    """Minimal valid PNG (8-bit RGBA, no filters) from 0xRRGGBBAA values."""
    c = np.asarray(colors, dtype=np.uint32).reshape(height, width)
    r, g, b, a = _channels(c)
    img = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(height))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
