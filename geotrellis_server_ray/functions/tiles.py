"""WebMercator tile-pyramid math (vectorized, numpy).

Mirrors the reference's ``ZoomedLayoutScheme(WebMercator, tileSize=256)``
semantics (reference: core/src/main/scala/geotrellis/server/vlm/geotiff/
GeoTiffNode.scala:60-63 builds the 0..64 pyramid; key -> extent via
``layout.mapTransform(key)`` at GeoTiffNode.scala:88; square-cell matrix math at
ogc/.../wmts/GeotrellisTileMatrix.scala:37-49). Formulas are written in an
explicit op order so the DuckDB oracle SQL in pipelines/registry.py can
reproduce them bit-for-bit (same libm double ops, same order).

Conventions (same as geotrellis SpatialKey):
  * zoom z has 2^z x 2^z tiles of 256px
  * col x: 0 at the west / -180 edge, increasing east
  * row y: 0 at the NORTH edge, increasing south
"""

from __future__ import annotations

import numpy as np

# WebMercator world bounds (EPSG:3857). Same constant as geotrellis
# WebMercator.worldExtent (half equatorial circumference, WGS84 a=6378137).
R = 6378137.0
WORLD = 20037508.342789244  # == R * pi
# Valid latitude band for WebMercator.
MAX_LAT = 85.05112877980659


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 forward projection (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 -> EPSG:4326 inverse projection (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) -> (x, y) tile key at ``zoom`` (slippy-map formula).

    Mathematically identical to projecting to WebMercator and dividing by the
    tile width, but written in the lon/lat form so the SQL oracle can use the
    exact same expression:
        x = floor((lon + 180) / 360 * 2^z)
        y = floor((1 - ln(tan(rad(lat)) + sqrt(tan(rad(lat))^2 + 1)) / pi) / 2 * 2^z)
    (the inner ln(t + sqrt(t*t+1)) is asinh(t), spelled out because DuckDB has
    no asinh). Out-of-range finite inputs clamp to the valid key range
    [0, 2^z - 1] (equivalent to clamping lat into the WebMercator band).
    NaN inputs are the CALLER's responsibility to filter — a NaN would
    otherwise produce an undefined int key (every in-repo caller pre-filters
    or substitutes a sentinel).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(2.0**zoom)
    t = np.tan(np.radians(lat))
    asinh_t = np.log(t + np.sqrt(t * t + 1.0))
    x = np.floor((lon + 180.0) / 360.0 * n)
    y = np.floor((1.0 - asinh_t / np.pi) / 2.0 * n)
    lim = int(n) - 1
    xi = np.clip(x, 0, lim).astype(np.int32)
    yi = np.clip(y, 0, lim).astype(np.int32)
    return xi, yi


def tile_extent(x: np.ndarray, y: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile key -> WebMercator extent (xmin, ymin, xmax, ymax).

    Same math as the reference's ``layout.mapTransform(SpatialKey(x, y))``
    (GeoTiffNode.scala:88): the world extent split into 2^z x 2^z tiles, row 0
    at the north edge.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = (2.0 * WORLD) / (2.0**zoom)
    xmin = -WORLD + x * w
    ymax = WORLD - y * w
    return xmin, ymax - w, xmin + w, ymax


def tile_cell_size(zoom: int, tile_size: int = 256) -> float:
    """Cell (pixel) width in meters at ``zoom`` — square cells, matching
    GeotrellisTileMatrix.scala:38's square-cell requirement."""
    return (2.0 * WORLD) / (2.0**zoom) / tile_size


def zoom_for_cell_size(cell_size: float, tile_size: int = 256, max_zoom: int = 30) -> int:
    """Smallest zoom whose cell size <= requested (resolution selection as in
    GTLayerNode.extentReification, GTLayerNode.scala:137-149: pick the level
    whose cellsize is at least as fine as requested)."""
    for z in range(0, max_zoom + 1):
        if tile_cell_size(z, tile_size) <= cell_size:
            return z
    return max_zoom


# NOTE: the 3x3 neighbor key expansion for the focal halo shuffle lives in
# stages/focal.py (halo_expand) — the single implementation of that pattern,
# with tag = sender position in the owner's grid. (A second copy here with a
# mirrored tag convention was removed; two conventions for the same stitch
# are a 180-degree-flip bug waiting to happen.)
