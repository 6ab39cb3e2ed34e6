"""Deterministic synthetic vector layers — the broadcast small side of the
engine's PIP joins (the analog of the reference's layer catalog /
RasterSourceRepository; see SURVEY.md §2.2, FIXTURES.md §2).

Layers (all EPSG:4326 lon/lat; seeded, no external data):

  * ``hot-zones``    — 5 axis-aligned rectangles (+-0.15 deg) around the corpus
                       hot centers. Rectangles => the DuckDB oracle can express
                       the PIP join as range predicates.
  * ``grid-zones``   — rectangles exactly tiling [-180,180]x[-60,60] (12x4):
                       every point in the band matches exactly one feature
                       (PIP partition property).
  * ``convex-zones`` — 12 seeded convex polygons (non-SQL; checked against a
                       slow per-point oracle in pytest).
  * ``pt-degenerate``— a point-degenerate polygon (edge case; covers only its
                       own point).

Temporal metadata: ``hot-zones`` features carry event_time values; other
layers are non-temporal (event_time None) and therefore match any temporal
query (OgcSourceRepository.scala:37-44 rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np

from ..functions.geometry import Polygon

HOT_CENTERS = [  # (lon, lat) — must match sources/corpus.py HOT_LON/HOT_LAT / 1e4
    (-122.4194, 37.7749),
    (2.3522, 48.8566),
    (139.6917, 35.6895),
    (-0.1276, 51.5074),
    (151.2093, -33.8688),
]
HOT_HALF = 0.15  # rectangle half-width in degrees

GRID_NX, GRID_NY = 12, 4
GRID_X0, GRID_X1, GRID_Y0, GRID_Y1 = -180.0, 180.0, -60.0, 60.0


@dataclass
class Feature:
    layer_name: str
    feature_id: int
    polygon: Polygon
    event_time: datetime | None  # None => non-temporal layer


def _rect(x0, y0, x1, y1) -> Polygon:
    return Polygon([x0, x1, x1, x0], [y0, y0, y1, y1])


def hot_zone_features() -> list[Feature]:
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    out = []
    for i, (lon, lat) in enumerate(HOT_CENTERS):
        t = base.replace(month=1 + i)  # distinct months for temporal filters
        out.append(Feature("hot-zones", i, _rect(lon - HOT_HALF, lat - HOT_HALF, lon + HOT_HALF, lat + HOT_HALF), t))
    return out


def grid_zone_features() -> list[Feature]:
    dx = (GRID_X1 - GRID_X0) / GRID_NX
    dy = (GRID_Y1 - GRID_Y0) / GRID_NY
    out = []
    fid = 0
    for iy in range(GRID_NY):
        for ix in range(GRID_NX):
            x0, y0 = GRID_X0 + ix * dx, GRID_Y0 + iy * dy
            out.append(Feature("grid-zones", fid, _rect(x0, y0, x0 + dx, y0 + dy), None))
            fid += 1
    return out


def convex_zone_features(n: int = 12, seed: int = 1234) -> list[Feature]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        cx = rng.uniform(-150, 150)
        cy = rng.uniform(-60, 60)
        k = int(rng.integers(5, 9))
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        # single radius per feature: vertices inscribed in a circle at sorted
        # angles ARE convex (independently random radii would make concave
        # star shapes, contradicting the layer's advertised convexity)
        r = float(rng.uniform(2.0, 12.0))
        out.append(Feature("convex-zones", i, Polygon(cx + r * np.cos(angles), cy + r * np.sin(angles)), None))
    out.append(Feature("pt-degenerate", 0, Polygon([10.0, 10.0, 10.0], [10.0, 10.0, 10.0]), None))
    return out


def all_features() -> list[Feature]:
    return hot_zone_features() + grid_zone_features() + convex_zone_features()


def layers_table():
    """Arrow table of the layers (coords as list<float64> rings) — the form a
    real deployment would read from Lance/Parquet; used by tests and by the
    catalog query algebra."""
    import pyarrow as pa

    feats = all_features()
    return pa.table(
        {
            "layer_name": [f.layer_name for f in feats],
            "feature_id": pa.array([f.feature_id for f in feats], type=pa.int64()),
            "xs": pa.array([f.polygon.xs.tolist() for f in feats], type=pa.list_(pa.float64())),
            "ys": pa.array([f.polygon.ys.tolist() for f in feats], type=pa.list_(pa.float64())),
            "crs": ["EPSG:4326"] * len(feats),
            "event_time": pa.array(
                [f.event_time.replace(tzinfo=None) if f.event_time else None for f in feats],
                type=pa.timestamp("us"),
            ),
        }
    )


def hot_zone_sql_predicates() -> list[tuple[int, float, float, float, float]]:
    """(feature_id, lon0, lat0, lon1, lat1) literals for the oracle SQL."""
    return [
        (i, lon - HOT_HALF, lat - HOT_HALF, lon + HOT_HALF, lat + HOT_HALF)
        for i, (lon, lat) in enumerate(HOT_CENTERS)
    ]
