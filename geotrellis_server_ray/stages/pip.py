"""Point-in-polygon broadcast join stage.

The batch analog of the reference's request ⋈ catalog spatial filter
(Intersects/Covers/Contains evaluated against layer geometries,
RasterSourceRepository.scala:58-60) — for point probes all three predicates
coincide with boundary-inclusive ``covers``, and the reference's
Contains-means-covers quirk (RasterSourceRepository.scala:60) is thereby
preserved exactly.

Shape: docs are the big streaming side; the vector layers are indexed once on
the driver (state/broadcast.GridIndex) and read from the object store by every
actor — a broadcast join, no shuffle. Stateful setup (ray.get of the index)
happens once per actor in ``__init__``; per-batch work is numpy only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import GridIndex


class PIPJoin:
    """Actor-pool callable: batches of anchored spans -> join rows.

    Use as ``ds.map_batches(PIPJoin, fn_constructor_kwargs={"index_ref": ref},
    batch_format="pyarrow", concurrency=N)``. ``layers`` optionally restricts
    which layers emit matches.
    """

    def __init__(self, index_ref, layers: list[str] | None = None):
        import ray

        self.index: GridIndex = ray.get(index_ref) if not isinstance(index_ref, GridIndex) else index_ref
        self.layer_names = np.array([f.layer_name for f in self.index.features], dtype=object)
        self.feature_ids = np.array([f.feature_id for f in self.index.features], dtype=np.int64)
        self.keep = (
            None
            if layers is None
            else np.isin(self.layer_names, np.array(list(layers), dtype=object))
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return probe_batch(self, batch)


# Worker-global cache for the stateless-task variant: the index deserializes
# once per worker process (plasma-local ray.get), then every task on that
# worker reuses it. Same amortization as an actor pool, but the stage stays a
# fusable, elastic task pool.
_WORKER_INDEX: dict[int, "PIPJoin"] = {}


def make_pip_probe(index_ref, layers: list[str] | None = None):
    def pip_probe(batch: pa.Table) -> pa.Table:
        # stable ObjectRef identity (id() aliases after GC in reused workers)
        key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
        state = _WORKER_INDEX.get(key)
        if state is None:
            state = PIPJoin(index_ref, layers)
            _WORKER_INDEX[key] = state
        return probe_batch(state, batch)

    return pip_probe


def probe_batch(state: "PIPJoin", batch: pa.Table) -> pa.Table:
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    valid = ~np.isnan(lon)
    pt, ft = state.index.probe(np.where(valid, lon, 999.0), np.where(valid, lat, 999.0))
    m = valid[pt]
    if state.keep is not None:
        m &= state.keep[ft]
    pt, ft = pt[m], ft[m]
    take = pa.array(pt, type=pa.int64())
    cols = {name: batch.column(name).take(take) for name in batch.schema.names}
    cols["layer_name"] = pa.array(state.layer_names[ft], type=pa.string())
    cols["feature_id"] = pa.array(state.feature_ids[ft], type=pa.int64())
    return pa.table(cols)
