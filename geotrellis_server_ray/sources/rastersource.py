"""``RasterSource(uri)`` dispatch + the RasterSourceUtils string codecs.

The reference builds raster sources from a single URI string
(GeoTiffNode.scala:49 ``RasterSource(s"${self.uri}")``): an optional backend
prefix — ``gtiff+`` (GeoTiffPath.PREFIX) for the pure GeoTiff reader,
``gdal+`` for GDALRasterSource (stac/package.scala:75 ``hrefGDAL``) — wraps a
transport href (file path, ``file://``, ``https://``; the ogc-example config
ships ``gdal+https://...TIF`` sources, application.conf:740). The engine
analog routes both backends to the pure-Python windowed TIFF reader over the
matching range reader: there is no GDAL in this environment, so ``gdal+`` is
honored as an alias with the documented limitation that only formats the
TIFF reader decodes (baseline strips/tiles + deflate) are supported — any
other content fails loudly in ``parse_ifds``, not silently.

Also here: the JSON wire names RasterSourceUtils.scala:31-87 gives resample
methods ("nearest-neighbor", "cubic-convolution", ...) and overview
strategies ("auto-higher-resolution", "auto-N", "level-N", "base") — the
codec the HOCON/JSON layer configs use.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions import resample as R
from ..state.caches import HeaderByteCache
from .rangereader import FileRangeReader, HttpRangeReader, MemoryRangeReader
from .tiff import TiffInfo, parse_ifds, read_extent_window, read_window

GTIFF_PREFIX = "gtiff+"
GDAL_PREFIX = "gdal+"

# in-memory uri registry for tests / synthetic fixtures (mem://name)
_MEM: dict[str, bytes] = {}


def register_memory_source(name: str, data: bytes) -> str:
    _MEM[name] = data
    return f"mem://{name}"


def _transport(href: str):
    if href.startswith("mem://"):
        return MemoryRangeReader(_MEM[href[len("mem://"):]])
    if href.startswith(("http://", "https://")):
        return HttpRangeReader(href)
    if href.startswith("file://"):
        return FileRangeReader(href[len("file://"):])
    return FileRangeReader(href)


@dataclass
class RasterSourceHandle:
    """Lazy window-readable raster handle (the RasterSource surface the
    engine needs: metadata + windowed reads over a cached range reader)."""

    uri: str
    backend: str  # "gtiff" | "gdal"
    _read: object = None
    _infos: list = None

    def __post_init__(self):
        href = self.uri
        for p in (GTIFF_PREFIX, GDAL_PREFIX):
            if href.startswith(p):
                href = href[len(p):]
        rr = _transport(href)
        cache = HeaderByteCache(lambda _u, off, ln: rr(off, ln))
        self._read = lambda off, ln: cache.read(href, off, ln)
        self._infos = parse_ifds(self._read)

    @property
    def info(self) -> TiffInfo:
        return self._infos[0]

    @property
    def overviews(self) -> list[TiffInfo]:
        return self._infos[1:]

    def read_window(self, col0: int, row0: int, w: int, h: int) -> np.ndarray:
        return read_window(self._read, self.info, col0, row0, w, h)

    def read_extent(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        return read_extent_window(self._read, self.info, xmin, ymin, xmax, ymax)


def raster_source(uri: str) -> RasterSourceHandle:
    """The ``RasterSource(uri)`` constructor: backend from the scheme prefix
    (default gtiff), transport from the inner href."""
    backend = "gdal" if uri.startswith(GDAL_PREFIX) else "gtiff"
    return RasterSourceHandle(uri=uri, backend=backend)


# ------------------------------------------------- string codecs (M-row)

RESAMPLE_BY_NAME = {
    "nearest-neighbor": R.nearest,
    "bilinear": R.bilinear,
    "cubic-convolution": R.cubic_convolution,
    "cubic-spline": R.cubic_spline,
    "lanczos": R.lanczos,
    "average": R.downsample_average,
    "mode": R.downsample_mode,
    "median": R.downsample_median,
    "max": R.downsample_max,
    "min": R.downsample_min,
    "sum": R.downsample_sum,
}
NAME_BY_RESAMPLE = {v: k for k, v in RESAMPLE_BY_NAME.items()}


def parse_resample_method(name: str):
    """RasterSourceUtils.scala:46-59 decoder: wire name -> kernel."""
    try:
        return RESAMPLE_BY_NAME[name]
    except KeyError:
        raise ValueError(f"unknown resample method: {name!r}") from None


def parse_overview_strategy(s: str):
    """RasterSourceUtils.scala:69-85 decoder, same fallbacks: returns
    'auto-higher-resolution' | 'base' | ('auto', n) | ('level', n);
    unparseable auto-/level- suffixes fall back to ('auto', 0), anything
    else to the default strategy (auto-higher-resolution)."""
    if s == "auto-higher-resolution":
        return "auto-higher-resolution"
    if s == "base":
        return "base"

    def tail_int(prefix: str) -> int:
        try:
            return int(s.split(f"{prefix}-")[-1])
        except ValueError:
            return 0

    if s.startswith("auto"):
        return ("auto", tail_int("auto"))
    if s.startswith("level"):
        return ("level", tail_int("level"))
    return "auto-higher-resolution"  # OverviewStrategy.DEFAULT


def overview_strategy_name(st) -> str:
    """The matching encoder (RasterSourceUtils.scala:61-66)."""
    if isinstance(st, tuple):
        return f"{st[0]}-{st[1]}"
    return st


def select_overview(handle: RasterSourceHandle, strategy, target_cell_width: float) -> TiffInfo:
    """Overview selection (M3): pick the IFD whose resolution serves the
    target cell size under the strategy — auto-higher-resolution = coarsest
    level still finer than the target; level-n = explicit index; base/auto-0
    = full resolution; auto-n = n levels below the auto pick."""
    infos = handle._infos
    if strategy == "base":
        return infos[0]
    ext = infos[0].geo_extent()
    if ext is None:
        return infos[0]
    widths = [(ext[2] - ext[0]) / i.width for i in infos]  # cell width per IFD
    order = np.argsort(widths)  # finest first
    if isinstance(strategy, tuple) and strategy[0] == "level":
        return infos[min(strategy[1], len(infos) - 1)]
    # auto-higher-resolution: coarsest whose cells are <= target (finer)
    pick = 0
    for pos in order:
        if widths[pos] <= target_cell_width + 1e-12:
            pick = pos
    if isinstance(strategy, tuple) and strategy[0] == "auto":
        rank = list(order).index(pick)
        pick = order[min(rank + strategy[1], len(infos) - 1)]
    return infos[pick]
