"""Geo pipelines: the flagship tile-assignment + PIP-join path.

This is the engine's canonical dataflow (SURVEY.md §3.2 run in reverse):

    corpus (interleaved docs)                 read_parquet -> map_batches
      -> explode spans (rank column)          map_batches, zero-copy Arrow
      -> parse geo anchors                    pyarrow extract_regex
      -> assign (zoom,x,y) + cell + hilbert   numpy kernels
      -> PIP join vs broadcast GridIndex      actor pool, ray.put'd index
      -> per-tile / per-zone aggregation      partial-agg + small groupby

Every stage streams; nothing materializes the corpus.
"""

from __future__ import annotations

from functools import partial

import pyarrow as pa
import pyarrow.compute as pc

from ..sources import layers as L
from ..sources.corpus import corpus_dataset
from ..stages import spans as S
from ..stages.pip import PIPJoin
from ..state.broadcast import put_index
from .relational import grouped_sums

FLAGSHIP_ZOOM = 12


def anchored_spans(sf_dir: str, zoom: int = FLAGSHIP_ZOOM, cell_level: int = 12,
                   repeat: int = 1, num_blocks: int | None = None,
                   corpus_path: str | None = None, with_hilbert: bool = False):
    """corpus -> exploded, geo-anchored spans with tile/cell keys (lazy).
    ``corpus_path``: read a pre-materialized corpus parquet directory instead
    of synthesizing inline (the bench path — input from storage)."""
    if corpus_path is not None:
        from ..sources.corpus import read_corpus

        ds = read_corpus(corpus_path)
    else:
        ds = corpus_dataset(sf_dir, repeat=repeat, num_blocks=num_blocks)

    def parse_and_prune(batch):
        # prune payload columns the spatial path doesn't need as soon as the
        # geo anchors are extracted — keeps the shuffle/bandwidth footprint
        # to key + anchor columns only
        return S.parse_geo(batch).select(["doc_id", "span_idx", "lon", "lat"])

    return (
        ds.map_batches(S.explode_spans, batch_format="pyarrow")
        .map_batches(parse_and_prune, batch_format="pyarrow")
        .map_batches(partial(S.assign_tiles, zoom=zoom, cell_level=cell_level,
                              with_hilbert=with_hilbert), batch_format="pyarrow")
    )


def pip_joined(sf_dir: str, zoom: int = FLAGSHIP_ZOOM, layers: list[str] | None = None,
               concurrency: int | tuple[int, int] | None = None,
               repeat: int = 1, num_blocks: int | None = None,
               corpus_path: str | None = None, with_hilbert: bool = False):
    """Anchored spans ⋈ vector layers (broadcast PIP join).

    Default: stateless task pool with a worker-global index cache — the index
    is ray.put once and deserialized once per worker; tasks stay fusable with
    the upstream map chain (no separate actor-pool stage, no ramp-up lag).
    Pass ``concurrency`` to run the PIPJoin actor-pool variant instead (the
    shape heavier stateful stages use)."""
    from ..stages.pip import make_pip_probe

    index_ref = put_index(L.all_features())
    ds = anchored_spans(sf_dir, zoom=zoom, repeat=repeat, num_blocks=num_blocks,
                        corpus_path=corpus_path, with_hilbert=with_hilbert)
    if concurrency is None:
        return ds.map_batches(make_pip_probe(index_ref, layers), batch_format="pyarrow")
    return ds.map_batches(
        PIPJoin,
        fn_constructor_kwargs={"index_ref": index_ref, "layers": layers},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def _shape_join_out(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "span_idx": batch.column("span_idx"),
            "x": pc.cast(batch.column("x"), pa.int64()),
            "y": pc.cast(batch.column("y"), pa.int64()),
            "cell_id": pc.cast(batch.column("cell_id"), pa.int64()),
            "layer_name": batch.column("layer_name"),
            "feature_id": batch.column("feature_id"),
        }
    )


def flagship(sf_dir: str, zoom: int = FLAGSHIP_ZOOM):
    """The headline pipeline: tile assignment + PIP join, streaming end to
    end. Returns the join-row Dataset (doc_id, span_idx, x, y, cell_id,
    layer_name, feature_id)."""
    return pip_joined(sf_dir, zoom=zoom).map_batches(_shape_join_out, batch_format="pyarrow")


def zonal_counts(sf_dir: str, layer: str = "grid-zones"):
    """Zonal summary (A1 generalized per SURVEY.md §2.7): spans per vector
    feature — partial count per batch, then a tiny groupby over partials."""
    joined = pip_joined(sf_dir, layers=[layer])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "feature_id": batch.column("feature_id"),
                "n_spans": pa.array([1] * len(batch), type=pa.int64()),
            }
        )

    ds = joined.map_batches(ones, batch_format="pyarrow")
    return grouped_sums(ds, ["feature_id"], ["n_spans"]).sort("feature_id")
