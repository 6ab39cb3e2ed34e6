"""Broadcast spatial index — the engine's STRtree stand-in.

The reference probes every request against a small in-memory layer catalog
(J1: WmsModel.getLayer -> repository.find, ogc/.../wms/WmsModel.scala:45-91).
At batch scale the same join must be *broadcast*: the small vector side is
indexed ONCE on the driver, `ray.put` into the object store, and every probe
task reads it zero-copy — never re-shipped per batch, never shuffled.

GridIndex = uniform cell grid (the engine's own quadtree cells) mapping
cell -> candidate feature ordinals; probe = vectorized bucket lookup + exact
boundary-inclusive PIP test per touched feature. Equivalent role to an STRtree
with O(1) bucket lookup and numpy-friendly batch probes.
"""

from __future__ import annotations

import numpy as np

from ..functions import cells, tiles
from ..sources.layers import Feature

DEFAULT_INDEX_LEVEL = 6  # ~5.6 deg cells; features here span 0.3-30 deg


class GridIndex:
    """Cell-bucketed candidate index over a list of Features (pickles cleanly
    for ray.put broadcast; numpy + dict state only)."""

    def __init__(self, features: list[Feature], level: int = DEFAULT_INDEX_LEVEL):
        self.features = features
        self.level = level
        self.buckets: dict[int, np.ndarray] = {}
        tmp: dict[int, list[int]] = {}
        n = 1 << level
        for i, f in enumerate(features):
            b = f.polygon.bbox
            if b.xmax - b.xmin > 180.0:
                # planar geometry: a ring spanning >180 deg of longitude is
                # almost certainly an antimeridian-crossing feature, which
                # this index would bucket (and the PIP kernel would test)
                # inverted. Split such rings at +-180 before indexing.
                raise ValueError(
                    f"feature {f.layer_name}/{f.feature_id} spans >180 deg lon; "
                    "split antimeridian-crossing rings before indexing"
                )
            # clamp to the WebMercator-valid band the tile math covers
            x0, y0t = tiles.lonlat_to_tile(
                np.array([b.xmin]), np.array([min(b.ymax, tiles.MAX_LAT)]), level
            )
            x1, y1t = tiles.lonlat_to_tile(
                np.array([b.xmax]), np.array([max(b.ymin, -tiles.MAX_LAT)]), level
            )
            for cx in range(int(x0[0]), int(x1[0]) + 1):
                for cy in range(int(y0t[0]), int(y1t[0]) + 1):
                    code = int(cells.morton_encode(np.uint64(cx), np.uint64(cy)))
                    tmp.setdefault(code, []).append(i)
        self.buckets = {k: np.asarray(v, dtype=np.int32) for k, v in tmp.items()}

    def probe(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized point probe. Returns (point_idx, feature_ordinal) pairs
        for every (point, feature) with feature.covers(point)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        cid = cells.cell_id(lon, lat, self.level)
        pt_out: list[np.ndarray] = []
        ft_out: list[np.ndarray] = []
        # group points by cell, then by candidate feature -> one vectorized
        # covers test per (touched feature) over its candidate points
        order = np.argsort(cid, kind="stable")
        sorted_cid = cid[order]
        bounds = np.nonzero(np.diff(sorted_cid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cid)]])
        feat_pts: dict[int, list[np.ndarray]] = {}
        for s, e in zip(starts, ends):
            if s == e:
                continue
            cand = self.buckets.get(int(sorted_cid[s]))
            if cand is None:
                continue
            idx = order[s:e]
            for fo in cand.tolist():
                feat_pts.setdefault(fo, []).append(idx)
        for fo, chunks in feat_pts.items():
            idx = np.concatenate(chunks)
            hit = self.features[fo].polygon.covers_points(lon[idx], lat[idx])
            if hit.any():
                pt_out.append(idx[hit])
                ft_out.append(np.full(int(hit.sum()), fo, dtype=np.int32))
        if not pt_out:
            z = np.array([], dtype=np.int64)
            return z, z.astype(np.int32)
        return np.concatenate(pt_out), np.concatenate(ft_out)


def put_index(features: list[Feature], level: int = DEFAULT_INDEX_LEVEL):
    """Build + broadcast: one object-store copy shared by every probe task."""
    import ray

    return ray.put(GridIndex(features, level))
