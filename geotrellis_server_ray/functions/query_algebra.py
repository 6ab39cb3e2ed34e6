"""Catalog query algebra — the engine's equivalent of the reference's
``Query = Fix[QueryF]`` AST (core/src/main/scala/geotrellis/store/query/
QueryF.scala:40-50) with the same JSON wire format and the same evaluation
quirks:

  * ``contains`` evaluates as ``covers`` (RasterSourceRepository.scala:60,
    OgcSourceRepository.scala:62)
  * ``at``/``between`` match non-temporal layers unconditionally
    (OgcSourceRepository.scala:37-44)
  * ``between`` is half-open t1 <= t < t2 (RasterSourceRepository.scala:56-57)
  * ``and`` = pipelined intersection (right evaluated on left's output,
    RasterSourceRepository.scala:61-63); ``or`` = concat WITH duplicates
    (RasterSourceRepository.scala:64)

JSON encoding mirrors QueryF's circe codec: one-key objects keyed by node
name, e.g. {"and": {"left": {...}, "right": {...}}},
{"intersects": {"projectedGeometry": {...bbox...}}}, {"withName": {"name":
"x"}}, {"all": {}} (golden round-trip test in tests/test_query_algebra.py,
modeled on QueryFSpec.scala:39-223).

Evaluation targets a *catalog*: a pyarrow table / pandas frame of layer rows
with columns (name, xmin, ymin, xmax, ymax, event_time nullable). At scale
the catalog is the broadcast small side; the compiled predicate can also be
pushed down to parquet row filters via ``to_arrow_filter``.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pandas as pd

# ----------------------------------------------------------- AST constructors


def all_() -> dict:
    return {"all": {}}


def nothing() -> dict:
    return {"nothing": {}}


def with_name(name: str) -> dict:
    return {"withName": {"name": name}}


def with_names(names: list[str]) -> dict:
    return {"withNames": {"names": list(names)}}


def intersects(xmin, ymin, xmax, ymax) -> dict:
    return {"intersects": {"projectedGeometry": _bbox(xmin, ymin, xmax, ymax)}}


def covers(xmin, ymin, xmax, ymax) -> dict:
    return {"covers": {"projectedGeometry": _bbox(xmin, ymin, xmax, ymax)}}


def contains(xmin, ymin, xmax, ymax) -> dict:
    return {"contains": {"projectedGeometry": _bbox(xmin, ymin, xmax, ymax)}}


def at(t: str, field_name: str = "time") -> dict:
    return {"at": {"time": t, "fieldName": field_name}}


def between(t1: str, t2: str, field_name: str = "time") -> dict:
    return {"between": {"from": t1, "to": t2, "fieldName": field_name}}


def and_(left: dict, right: dict) -> dict:
    return {"and": {"left": left, "right": right}}


def or_(left: dict, right: dict) -> dict:
    return {"or": {"left": left, "right": right}}


def _bbox(xmin, ymin, xmax, ymax) -> dict:
    return {
        "bbox": {"xmin": float(xmin), "ymin": float(ymin), "xmax": float(xmax), "ymax": float(ymax)},
        "crs": "EPSG:4326",
    }


def to_json(q: dict) -> str:
    return json.dumps(q, sort_keys=True)


def from_json(s: str) -> dict:
    return json.loads(s)


# -------------------------------------------------- reference wire format

_REF_CRS = "+proj=longlat +datum=WGS84 +no_defs "
_REF_NAMES = {
    "and": "And", "or": "Or", "intersects": "Intersects", "covers": "Covers",
    "contains": "Contains", "at": "At", "between": "Between",
    "withName": "WithName", "withNames": "WithNames", "all": "All", "nothing": "Nothing",
}
_REF_INV = {v: k for k, v in _REF_NAMES.items()}


def to_reference_json(q: dict) -> dict:
    """Encode in the reference's exact circe wire format (QueryFSpec.scala:
    44-127): PascalCase one-key nodes, spatial operands as GeoJSON Polygon
    rings (closed, from the bbox) with a proj4 crs string."""
    (node, body), = q.items()
    ref = _REF_NAMES[node]
    if node in ("and", "or"):
        return {ref: {"left": to_reference_json(body["left"]),
                      "right": to_reference_json(body["right"])}}
    if node in ("intersects", "covers", "contains"):
        b = body["projectedGeometry"]["bbox"]
        ring = [[b["xmin"], b["ymin"]], [b["xmin"], b["ymax"]], [b["xmax"], b["ymax"]],
                [b["xmax"], b["ymin"]], [b["xmin"], b["ymin"]]]
        return {ref: {"projectedGeometry": {
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "crs": _REF_CRS,
        }}}
    if node == "at":
        return {ref: {"time": body["time"], "fieldName": body.get("fieldName", "time")}}
    if node == "between":
        return {ref: {"from": body["from"], "to": body["to"],
                      "fieldName": body.get("fieldName", "time")}}
    return {ref: dict(body)}


def from_reference_json(j: dict) -> dict:
    """Decode the reference wire format back to the engine AST (geometry is
    reduced to its bbox — the engine's spatial operand)."""
    (ref, body), = j.items()
    node = _REF_INV[ref]
    if node in ("and", "or"):
        return {node: {"left": from_reference_json(body["left"]),
                       "right": from_reference_json(body["right"])}}
    if node in ("intersects", "covers", "contains"):
        coords = body["projectedGeometry"]["geometry"]["coordinates"][0]
        xs = [p[0] for p in coords]
        ys = [p[1] for p in coords]
        return {node: {"projectedGeometry": _bbox(min(xs), min(ys), max(xs), max(ys))}}
    if node == "at":
        return at(body["time"], body.get("fieldName", "time"))
    if node == "between":
        return between(body["from"], body["to"], body.get("fieldName", "time"))
    return {node: dict(body)}


# ----------------------------------------------------------------- analyses


def is_universal(q: dict) -> bool:
    """True when the query matches everything (QueryF.scala:129-141 fold)."""
    (node, body), = q.items()
    if node == "all":
        return True
    if node == "and":
        return is_universal(body["left"]) and is_universal(body["right"])
    if node == "or":
        return is_universal(body["left"]) or is_universal(body["right"])
    return False


def is_temporal(q: dict) -> bool:
    """True when any temporal predicate occurs (QueryF.scala:121-127)."""
    (node, body), = q.items()
    if node in ("at", "between"):
        return True
    if node in ("and", "or"):
        return is_temporal(body["left"]) or is_temporal(body["right"])
    return False


def override_name(q: dict, name: str) -> dict:
    """Rewrite name nodes (QueryF.overrideName coalgebra, QueryF.scala:108-119)."""
    (node, body), = q.items()
    if node in ("withName", "withNames"):
        return with_name(name)
    if node in ("and", "or"):
        return {node: {"left": override_name(body["left"], name),
                       "right": override_name(body["right"], name)}}
    return q


# ---------------------------------------------------------------- evaluation


def _parse_ts(t: str) -> np.datetime64:
    return np.datetime64(pd.Timestamp(t).tz_localize(None) if pd.Timestamp(t).tzinfo is None
                         else pd.Timestamp(t).tz_convert("UTC").tz_localize(None), "us")


def eval_catalog(q: dict, catalog: pd.DataFrame, temporal_rule: str = "ogc") -> pd.DataFrame:
    """Evaluate a query against a layer catalog frame. Returns the matching
    rows; ``or`` concatenates with duplicates, ``and`` pipelines (left output
    feeds right), like RasterSourceRepository.eval (core/.../
    RasterSourceRepository.scala:58-64).

    Temporal semantics differ between the two reference repositories and are
    selected by ``temporal_rule``:

    * ``"ogc"`` (default): a layer with NO time attribute matches every
      At/Between — the OgcSourceRepository rule (ogc/.../
      OgcSourceRepository.scala:37-44). The engine catalog mirrors OGC
      layers, so this is the default for BOTH variants by design.
    * ``"raster"``: At/Between EXCLUDE sources lacking the time attribute
      (the ``fold(false)`` in core/.../RasterSourceRepository.scala:55-57).

    Both rules share this function's half-open Between (t1 <= t < t2, the
    raster-repo bound shape); the inclusive-overlap OGC Between lives in
    :func:`eval_ogc_catalog`."""
    (node, body), = q.items()
    if node == "all":
        return catalog
    if node == "nothing":
        return catalog.iloc[0:0]
    if node == "withName":
        return catalog[catalog["name"] == body["name"]]
    if node == "withNames":
        return catalog[catalog["name"].isin(body["names"])]
    if node in ("intersects", "covers", "contains"):
        b = body["projectedGeometry"]["bbox"]
        if node == "intersects":
            hit = ~(
                (catalog["xmax"] < b["xmin"]) | (catalog["xmin"] > b["xmax"])
                | (catalog["ymax"] < b["ymin"]) | (catalog["ymin"] > b["ymax"])
            )
        else:  # covers; contains degrades to covers (the reference quirk)
            hit = (
                (catalog["xmin"] >= b["xmin"]) & (catalog["xmax"] <= b["xmax"])
                & (catalog["ymin"] >= b["ymin"]) & (catalog["ymax"] <= b["ymax"])
            )
        return catalog[hit]
    if node == "at":
        t = _parse_ts(body["time"])
        ts = catalog["event_time"]
        hit = ts.values == t
        if temporal_rule == "ogc":
            hit = ts.isna() | hit
        return catalog[hit]
    if node == "between":
        t1, t2 = _parse_ts(body["from"]), _parse_ts(body["to"])
        ts = catalog["event_time"]
        hit = (ts.values >= t1) & (ts.values < t2)
        if temporal_rule == "ogc":
            hit = ts.isna() | hit
        return catalog[hit]
    if node == "and":
        left = eval_catalog(body["left"], catalog, temporal_rule)
        return eval_catalog(body["right"], left, temporal_rule)
    if node == "or":
        return pd.concat(
            [eval_catalog(body["left"], catalog, temporal_rule),
             eval_catalog(body["right"], catalog, temporal_rule)],
            ignore_index=True,
        )
    raise ValueError(f"unknown query node: {node}")


def _leaf_mask(node: str, body: dict, batch) -> "Any":
    import pyarrow as pa
    import pyarrow.compute as pc

    if node == "withName":
        return pc.equal(batch.column("name"), pa.scalar(body["name"]))
    if node == "withNames":
        return pc.is_in(batch.column("name"), value_set=pa.array(body["names"]))
    if node in ("intersects", "covers", "contains"):
        b = body["projectedGeometry"]["bbox"]
        if node == "intersects":
            return pc.and_(
                pc.and_(pc.greater_equal(batch.column("xmax"), pa.scalar(b["xmin"])),
                        pc.less_equal(batch.column("xmin"), pa.scalar(b["xmax"]))),
                pc.and_(pc.greater_equal(batch.column("ymax"), pa.scalar(b["ymin"])),
                        pc.less_equal(batch.column("ymin"), pa.scalar(b["ymax"]))),
            )
        return pc.and_(
            pc.and_(pc.greater_equal(batch.column("xmin"), pa.scalar(b["xmin"])),
                    pc.less_equal(batch.column("xmax"), pa.scalar(b["xmax"]))),
            pc.and_(pc.greater_equal(batch.column("ymin"), pa.scalar(b["ymin"])),
                    pc.less_equal(batch.column("ymax"), pa.scalar(b["ymax"]))),
        )
    if node in ("at", "between"):
        # OGC rule (OgcSourceRepository.scala:37-44): layers without a time
        # attribute match every temporal predicate (see eval_catalog's
        # temporal_rule docs; the dataset variant serves OGC-style catalogs)
        ts = batch.column("event_time")
        non_temporal = pc.is_null(ts)
        if node == "at":
            t = pa.scalar(_parse_ts(body["time"]))
            return pc.or_kleene(non_temporal, pc.equal(ts, t))
        t1 = pa.scalar(_parse_ts(body["from"]))
        t2 = pa.scalar(_parse_ts(body["to"]))
        return pc.or_kleene(
            non_temporal, pc.and_(pc.greater_equal(ts, t1), pc.less(ts, t2))
        )
    raise ValueError(f"unknown leaf: {node}")


def eval_catalog_dataset(q: dict, ds):
    """Evaluate a query over a Ray Dataset catalog: leaves are vectorized
    map_batches filters, ``and`` pipelines filters, ``or`` unions the two
    branch datasets (duplicates preserved, Q6 semantics)."""
    (node, body), = q.items()
    if node == "all":
        return ds
    if node == "nothing":
        return ds.limit(0)
    if node == "and":
        return eval_catalog_dataset(body["right"], eval_catalog_dataset(body["left"], ds))
    if node == "or":
        return eval_catalog_dataset(body["left"], ds).union(eval_catalog_dataset(body["right"], ds))

    def f(batch):
        mask = _leaf_mask(node, body, batch)
        import pyarrow.compute as pc

        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(f, batch_format="pyarrow")


def eval_ogc_catalog(q: dict, catalog: pd.DataFrame) -> pd.DataFrame:
    """The OgcSourceRepository evaluation variant (OgcSourceRepository.scala:
    30-66): layers carry an OgcTime *domain* (positions list / interval /
    empty) in a ``time`` column rather than a single timestamp, and the
    temporal predicates differ from the RasterSourceRepository variant — the
    reference's dual-semantics quirk (SURVEY.md §2.2 Q3 / §7.4):

      * At(t): positions must contain t exactly; intervals use inclusive
        start <= t <= end; empty/non-temporal matches everything
      * Between(t1, t2): the domain's [start, end] envelope matches when
        either endpoint falls in [t1, t2] INCLUSIVE (not the half-open
        t1 <= t < t2 of eval_catalog)
    """
    from .ogctime import OgcTimeEmpty, OgcTimePositions

    def missing(dom) -> bool:
        # None / OgcTimeEmpty / pandas-missing (NaT, NaN) all mean
        # "non-temporal layer" -> matches everything, like the raster
        # variant's isna() handling
        if dom is None or isinstance(dom, OgcTimeEmpty):
            return True
        return not isinstance(dom, (OgcTimePositions,)) and pd.isna(dom)

    def domain_bounds(dom):
        if isinstance(dom, OgcTimePositions):
            # defensive sort like the reference (OgcSourceRepository.scala:
            # 49-51) — a directly-constructed positions tuple may be unsorted
            return min(dom.times), max(dom.times)
        return dom.start, dom.end

    (node, body), = q.items()
    if node == "at":
        t = _parse_ts(body["time"])

        def hit_at(dom):
            if missing(dom):
                return True
            if isinstance(dom, OgcTimePositions):
                return any(p == t for p in dom.times)
            return bool(dom.start <= t <= dom.end)

        return catalog[catalog["time"].map(hit_at)]
    if node == "between":
        t1, t2 = _parse_ts(body["from"]), _parse_ts(body["to"])

        def hit_between(dom):
            if missing(dom):
                return True
            start, end = domain_bounds(dom)
            return bool((t1 <= start <= t2) or (t1 <= end <= t2))

        return catalog[catalog["time"].map(hit_between)]
    if node == "and":
        left = eval_ogc_catalog(body["left"], catalog)
        return eval_ogc_catalog(body["right"], left)
    if node == "or":
        return pd.concat(
            [eval_ogc_catalog(body["left"], catalog), eval_ogc_catalog(body["right"], catalog)],
            ignore_index=True,
        )
    # spatial / name / all / nothing nodes share the other variant's logic
    return eval_catalog(q, catalog)


def to_arrow_filter(q: dict, time_col: str = "event_time", temporal_rule: str = "ogc"):
    """Compile the query to a pyarrow dataset filter expression for pushdown
    at the read (the engine's analog of SearchFilters.eval compiling Query ->
    STAC search, stac-example/.../SearchFiltersQuery.scala:123-146). Spatial
    nodes compile to bbox-overlap conjunctions over (xmin..ymax) columns;
    returns None for universal queries. ``time_col`` names the timestamp
    column; ``temporal_rule`` selects the null-time arm exactly like
    eval_catalog ('ogc' = non-temporal matches all, 'raster' = excluded)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads  # noqa: F401  (expression namespace)

    (node, body), = q.items()
    if node == "all":
        return None
    if node == "nothing":
        return pc.scalar(False)
    if node == "withName":
        return pc.field("name") == body["name"]
    if node == "withNames":
        return pc.field("name").isin(body["names"])
    if node in ("intersects", "covers", "contains"):
        b = body["projectedGeometry"]["bbox"]
        if node == "intersects":
            return (
                (pc.field("xmax") >= b["xmin"]) & (pc.field("xmin") <= b["xmax"])
                & (pc.field("ymax") >= b["ymin"]) & (pc.field("ymin") <= b["ymax"])
            )
        return (
            (pc.field("xmin") >= b["xmin"]) & (pc.field("xmax") <= b["xmax"])
            & (pc.field("ymin") >= b["ymin"]) & (pc.field("ymax") <= b["ymax"])
        )
    if node == "at":
        t = _parse_ts(body["time"])
        hit = pc.field(time_col) == t
        return (pc.field(time_col).is_null() | hit) if temporal_rule == "ogc" else hit
    if node == "between":
        t1, t2 = _parse_ts(body["from"]), _parse_ts(body["to"])
        hit = (pc.field(time_col) >= t1) & (pc.field(time_col) < t2)
        return (pc.field(time_col).is_null() | hit) if temporal_rule == "ogc" else hit
    if node == "and":
        lf = to_arrow_filter(body["left"], time_col, temporal_rule)
        rf = to_arrow_filter(body["right"], time_col, temporal_rule)
        if lf is None:
            return rf
        if rf is None:
            return lf
        return lf & rf
    if node == "or":
        lf = to_arrow_filter(body["left"], time_col, temporal_rule)
        rf = to_arrow_filter(body["right"], time_col, temporal_rule)
        if lf is None or rf is None:
            return None
        return lf | rf
    raise ValueError(f"unknown query node: {node}")


# --------------------------------------------- STAC search-filters compile
#
# Query -> ONE flat search-filters record, the reference's
# SearchFiltersQuery.algebra (stac-example/.../SearchFiltersQuery.scala:
# 123-146) with its two Semigroups: And = IntersectionSemigroup (:50-85,
# bbox/geometry intersection, temporal [max start, min end]), Or =
# UnionSemigroup (:87-121, bbox/geometry union, temporal [min start, max
# end]); both combine collections/items as distinct-concat and take
# limit = min. The record is what a STAC /search API accepts — a bbox, a
# datetime range, a collections list — so an arbitrary query TREE prunes
# SERVER-side instead of scanning every item and filtering locally. The
# compile is a SUPERSET for Or (the union bbox admits items matching
# neither arm's exact geometry) and for unsupported leaves (compiled to
# match-all, :145), so callers re-apply the exact predicate on the fetched
# items — eval_catalog does exactly that.
#
# Option-semigroup quirks mirrored deliberately:
#   * Nothing compiles to None and `None |+| x = x` — And(Nothing, q)
#     compiles to q's filters (a superset; exactness is restored by the
#     local re-filter), exactly like the reference's Option[SearchFilters].
#   * one-sided fields combine by keeping the present side (cats Option
#     semigroup: combine only when BOTH are present).
#   * query maps merge circe-deepMerge style: nested objects merge
#     recursively, any other right value replaces the left.


def _sf_empty() -> dict:
    return {"bbox": None, "datetime": None, "intersects": None,
            "collections": [], "items": [], "limit": None, "query": {}}


def _opt(a, b, f):
    if a is None:
        return b
    if b is None:
        return a
    return f(a, b)


def _bbox_and(l, r):
    x0, y0 = max(l[0], r[0]), max(l[1], r[1])
    x1, y1 = min(l[2], r[2]), min(l[3], r[3])
    if x0 > x1 or y0 > y1:
        # SearchFiltersQuery.scala:57: "$left and $right have no
        # intersections" -> IllegalArgumentException
        raise ValueError(f"{l} and {r} have no intersections")
    return (x0, y0, x1, y1)


def _bbox_or(l, r):
    return (min(l[0], r[0]), min(l[1], r[1]), max(l[2], r[2]), max(l[3], r[3]))


def _dt_and(l, r):
    # max of present starts, min of present ends (:64-69)
    starts = [t for t in (l[0], r[0]) if t is not None]
    ends = [t for t in (l[1], r[1]) if t is not None]
    return (max(starts) if starts else None, min(ends) if ends else None)


def _dt_or(l, r):
    # min of present starts, max of present ends (:101-106)
    starts = [t for t in (l[0], r[0]) if t is not None]
    ends = [t for t in (l[1], r[1]) if t is not None]
    return (min(starts) if starts else None, max(ends) if ends else None)


def _distinct(xs: list) -> list:
    seen, out = set(), []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _deep_merge(l: dict, r: dict) -> dict:
    out = dict(l)
    for k, v in r.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _sf_combine(l: dict | None, r: dict | None, union: bool) -> dict | None:
    if l is None:
        return r
    if r is None:
        return l
    return {
        "bbox": _opt(l["bbox"], r["bbox"], _bbox_or if union else _bbox_and),
        "datetime": _opt(l["datetime"], r["datetime"],
                         _dt_or if union else _dt_and),
        "intersects": _opt(l["intersects"], r["intersects"],
                           _bbox_or if union else _bbox_and),
        "collections": _distinct(l["collections"] + r["collections"]),
        "items": _distinct(l["items"] + r["items"]),
        # List(left.limit, right.limit).min over Option: None < Some(_)
        "limit": None if l["limit"] is None or r["limit"] is None
                 else min(l["limit"], r["limit"]),
        "query": _deep_merge(l["query"], r["query"]),
    }


def to_search_filters(q: dict, criteria: str = "collection") -> dict | None:
    """Compile the query AST to a single STAC search-filters dict (None =
    Nothing). ``criteria`` mirrors StacSearchCriteria: "collection" maps
    WithName(s) to the collections list (:128), "layer" to a
    query["layer:ids"] Superset entry (:129)."""
    (node, body), = q.items()
    if node == "nothing":
        return None
    if node == "all":
        return _sf_empty()
    sf = _sf_empty()
    if node == "withName":
        if criteria == "collection":
            sf["collections"] = [body["name"]]
        else:
            sf["query"] = {"layer:ids": [{"superset": [body["name"]]}]}
        return sf
    if node == "withNames":
        names = sorted(body["names"])
        if criteria == "collection":
            sf["collections"] = names
        else:
            sf["query"] = {"layer:ids": [{"superset": names}]}
        return sf
    if node == "at":
        t = body["time"]
        sf["datetime"] = (t, t)
        return sf
    if node == "between":
        sf["datetime"] = (body["from"], body["to"])
        return sf
    if node == "intersects":
        b = body["projectedGeometry"]["bbox"]
        sf["intersects"] = (b["xmin"], b["ymin"], b["xmax"], b["ymax"])
        return sf
    if node == "covers":
        b = body["projectedGeometry"]["bbox"]
        sf["bbox"] = (b["xmin"], b["ymin"], b["xmax"], b["ymax"])
        return sf
    if node == "and":
        return _sf_combine(to_search_filters(body["left"], criteria),
                           to_search_filters(body["right"], criteria), union=False)
    if node == "or":
        return _sf_combine(to_search_filters(body["left"], criteria),
                           to_search_filters(body["right"], criteria), union=True)
    # unsupported nodes (contains, ...) compile to match-all (:145)
    return _sf_empty()


def extract_name(q: dict) -> list[str]:
    """SearchFiltersQuery.extractName (:160-167): And concatenates, Or keeps
    the LEFT side's names when non-empty (else the right's)."""
    (node, body), = q.items()
    if node == "withName":
        return [body["name"]]
    if node == "withNames":
        return sorted(body["names"])
    if node == "and":
        return extract_name(body["left"]) + extract_name(body["right"])
    if node == "or":
        left = extract_name(body["left"])
        return left if left else extract_name(body["right"])
    return []


def search_params(sf: dict | None) -> dict | None:
    """Search-filters record -> kwargs for sources.stac.search_paged (the
    server-side pruning surface: collections / ONE bbox / a closed datetime
    range). bbox and intersects are each individually necessary conditions;
    the API takes one box, so send `bbox` when present else the intersects
    envelope (their intersection would be UNSOUND: overlap(A) and overlap(B)
    do not imply overlap(A intersect B)). Half-open datetime ranges (one end None)
    are not expressible in the paged API -> no datetime pruning. None in =
    Nothing -> callers skip the search entirely."""
    if sf is None:
        return None
    out: dict = {}
    if sf["collections"]:
        out["collections"] = set(sf["collections"])
    box = sf["bbox"] if sf["bbox"] is not None else sf["intersects"]
    if box is not None:
        out["bbox"] = tuple(float(v) for v in box)
    dt = sf["datetime"]
    if dt is not None and dt[0] is not None and dt[1] is not None:
        out["datetime_range"] = (dt[0], dt[1])
    if sf["limit"] is not None:
        out["take"] = int(sf["limit"])
    return out
