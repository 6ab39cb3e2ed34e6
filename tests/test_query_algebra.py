"""Query algebra goldens — modeled on the reference's QueryFSpec
(core/src/test/scala/geotrellis/store/query/QueryFSpec.scala:39-257): JSON
round-trips, semantic quirks (contains==covers, non-temporal-matches-all,
Or-with-duplicates, pipelined And), and pushdown compilation."""

import json

import numpy as np
import pandas as pd
import pytest

from geotrellis_server_ray.functions import query_algebra as qa


@pytest.fixture
def catalog():
    return pd.DataFrame(
        {
            "name": ["a", "b", "c", "d"],
            "xmin": [0.0, 20.0, -10.0, 5.0],
            "ymin": [0.0, 20.0, -10.0, 5.0],
            "xmax": [10.0, 30.0, -5.0, 8.0],
            "ymax": [10.0, 30.0, -5.0, 8.0],
            "event_time": pd.to_datetime(
                ["2024-01-10", None, "2024-02-01", "2024-01-15"]
            ).astype("datetime64[us]"),
        }
    )


def test_json_roundtrip():
    q = qa.or_(
        qa.and_(qa.intersects(-10, -10, 10, 10), qa.between("2024-01-01", "2024-02-01")),
        qa.with_names(["x", "y"]),
    )
    s = qa.to_json(q)
    assert qa.from_json(s) == q
    # wire format shape: one-key nodes (QueryF circe encoding style)
    d = json.loads(s)
    assert set(d.keys()) == {"or"}
    assert set(d["or"].keys()) == {"left", "right"}


def test_analyses():
    assert qa.is_universal(qa.all_())
    assert qa.is_universal(qa.and_(qa.all_(), qa.all_()))
    assert not qa.is_universal(qa.with_name("x"))
    assert qa.is_universal(qa.or_(qa.with_name("x"), qa.all_()))
    assert qa.is_temporal(qa.between("2024-01-01", "2024-02-01"))
    assert qa.is_temporal(qa.and_(qa.all_(), qa.at("2024-01-01")))
    assert not qa.is_temporal(qa.intersects(0, 0, 1, 1))


def test_override_name():
    q = qa.and_(qa.with_name("old"), qa.intersects(0, 0, 1, 1))
    q2 = qa.override_name(q, "new")
    assert q2["and"]["left"] == qa.with_name("new")
    assert q2["and"]["right"] == q["and"]["right"]


def test_intersects_and_covers(catalog):
    got = qa.eval_catalog(qa.intersects(-1, -1, 6, 6), catalog)
    assert got["name"].tolist() == ["a", "d"]
    # covers requires full containment
    got = qa.eval_catalog(qa.covers(-1, -1, 11, 11), catalog)
    assert got["name"].tolist() == ["a", "d"]
    got = qa.eval_catalog(qa.covers(-1, -1, 9, 9), catalog)
    assert got["name"].tolist() == ["d"]
    # contains degrades to covers (the reference quirk)
    assert qa.eval_catalog(qa.contains(-1, -1, 9, 9), catalog)["name"].tolist() == ["d"]


def test_temporal_non_temporal_matches_all(catalog):
    got = qa.eval_catalog(qa.at("2024-01-10"), catalog)
    assert got["name"].tolist() == ["a", "b"]  # b is non-temporal -> matches
    got = qa.eval_catalog(qa.between("2024-01-01", "2024-01-15"), catalog)
    # half-open: d at 01-15 excluded; b non-temporal included
    assert got["name"].tolist() == ["a", "b"]


def test_or_preserves_duplicates_and_and_pipelines(catalog):
    q = qa.or_(qa.with_name("a"), qa.intersects(-1, -1, 6, 6))
    got = qa.eval_catalog(q, catalog)
    assert got["name"].tolist() == ["a", "a", "d"]  # 'a' twice — no dedup
    q = qa.and_(qa.intersects(-1, -1, 6, 6), qa.with_name("d"))
    assert qa.eval_catalog(q, catalog)["name"].tolist() == ["d"]
    assert qa.eval_catalog(qa.nothing(), catalog).empty
    assert len(qa.eval_catalog(qa.all_(), catalog)) == 4


def test_arrow_pushdown_filter(catalog):
    import pyarrow as pa
    import pyarrow.dataset as pads

    t = pa.Table.from_pandas(catalog, preserve_index=False)
    for q in [
        qa.with_names(["a", "c"]),
        qa.intersects(-1, -1, 6, 6),
        qa.and_(qa.intersects(-1, -1, 6, 6), qa.at("2024-01-10")),
        qa.between("2024-01-01", "2024-01-15"),
    ]:
        expr = qa.to_arrow_filter(q)
        got = pads.dataset(t).to_table(filter=expr).to_pandas()
        want = qa.eval_catalog(q, catalog)
        # pushdown is set-equivalent (no duplicate semantics in a filter)
        assert sorted(got["name"]) == sorted(want["name"].unique().tolist()
                                             if q.get("or") else want["name"].tolist())
    assert qa.to_arrow_filter(qa.all_()) is None


def test_dataset_eval_matches_pandas_eval(ray_session, catalog):
    import ray.data as rd

    ds = rd.from_pandas(catalog)
    q = qa.or_(
        qa.and_(qa.intersects(-1, -1, 30, 30), qa.between("2024-01-01", "2024-01-20")),
        qa.with_name("c"),
    )
    got = qa.eval_catalog_dataset(q, ds).to_pandas()
    want = qa.eval_catalog(q, catalog)
    assert sorted(got["name"]) == sorted(want["name"])


def test_reference_wire_format_golden():
    """Byte-shape golden from QueryFSpec.scala:39-127: PascalCase nodes,
    GeoJSON polygon ring from the bbox, proj4 crs string."""
    q = qa.and_(
        qa.and_(qa.intersects(0, 0, 2, 2), qa.intersects(1, 1, 4, 4)),
        qa.at("2020-01-01T00:00:01Z"),
    )
    j = qa.to_reference_json(q)
    assert set(j) == {"And"}
    inner = j["And"]["left"]["And"]["left"]["Intersects"]["projectedGeometry"]
    assert inner["crs"] == "+proj=longlat +datum=WGS84 +no_defs "
    assert inner["geometry"]["type"] == "Polygon"
    assert inner["geometry"]["coordinates"][0] == [
        [0.0, 0.0], [0.0, 2.0], [2.0, 2.0], [2.0, 0.0], [0.0, 0.0]]
    assert j["And"]["right"] == {"At": {"time": "2020-01-01T00:00:01Z", "fieldName": "time"}}
    # round trip back to the engine AST
    assert qa.from_reference_json(j) == q


def test_reference_catalog_filter_end_to_end():
    """QueryFSpec.scala:225-257 on the synthetic EmptyRasterSource store:
    intersects(ex2) AND intersects(ex3) AND at(dt2) -> [second, third]."""
    store = pd.DataFrame({
        "name": ["first", "second", "third", "fourth"],
        "xmin": [0.0, 1.0, 2.0, 6.0], "ymin": [0.0, 1.0, 2.0, 6.0],
        "xmax": [2.0, 4.0, 5.0, 10.0], "ymax": [2.0, 4.0, 5.0, 10.0],
        "event_time": pd.to_datetime(
            ["2020-01-01T00:00:01", "2020-02-01T00:00:01",
             "2020-02-01T00:00:01", "2020-03-01T00:00:01"]).astype("datetime64[us]"),
    })
    q = qa.and_(
        qa.and_(qa.intersects(1, 1, 4, 4), qa.intersects(2, 2, 5, 5)),
        qa.at("2020-02-01T00:00:01"),
    )
    got = qa.eval_catalog(q, store)
    assert got["name"].tolist() == ["second", "third"]
    # same result evaluated from the reference-format JSON (the spec's
    # json-vs-AST equivalence assertion)
    got2 = qa.eval_catalog(qa.from_reference_json(qa.to_reference_json(q)), store)
    assert got2["name"].tolist() == ["second", "third"]


def test_dual_between_semantics_quirk():
    """SURVEY §2.2 Q3 / §7.4: the two repositories disagree on Between.
    RasterSourceRepository: half-open t1 <= t < t2 on a single timestamp.
    OgcSourceRepository: inclusive endpoint-overlap on the layer's time
    DOMAIN. Both are preserved, side by side."""
    from geotrellis_server_ray.functions import ogctime as OT

    # raster-variant: single event_time, half-open upper bound
    raster_cat = pd.DataFrame({
        "name": ["edge"],
        "xmin": [0.0], "ymin": [0.0], "xmax": [1.0], "ymax": [1.0],
        "event_time": pd.to_datetime(["2024-01-15"]).astype("datetime64[us]"),
    })
    q = qa.between("2024-01-01", "2024-01-15")
    assert qa.eval_catalog(q, raster_cat).empty  # t == t2 excluded (half-open)

    # ogc-variant: time domain, inclusive endpoints
    ogc_cat = pd.DataFrame({
        "name": ["positions", "interval", "outside", "empty"],
        "xmin": [0.0] * 4, "ymin": [0.0] * 4, "xmax": [1.0] * 4, "ymax": [1.0] * 4,
        "time": [
            OT.OgcTimePositions.of([np.datetime64("2024-01-15"), np.datetime64("2024-03-01")]),
            OT.from_string("2023-12-01/2024-01-01"),   # end == t1 -> inclusive hit
            OT.from_string("2024-02-01/2024-03-01"),   # both endpoints outside
            OT.OgcTimeEmpty(),                          # non-temporal matches all
        ],
    })
    got = qa.eval_ogc_catalog(q, ogc_cat)
    assert got["name"].tolist() == ["positions", "interval", "empty"]
    # At on the ogc variant: exact position membership / inclusive interval
    # ("outside" spans 2024-02-01/2024-03-01 -> its end == t matches inclusively)
    got = qa.eval_ogc_catalog(qa.at("2024-03-01"), ogc_cat)
    assert got["name"].tolist() == ["positions", "outside", "empty"]
    got = qa.eval_ogc_catalog(qa.at("2024-01-20"), ogc_cat)
    assert got["name"].tolist() == ["empty"]


def test_ogc_catalog_missing_time_matches_all():
    """NaN/NaT/None in the time column mean non-temporal -> match everything
    (parity with the raster variant's isna() handling)."""
    cat = pd.DataFrame({
        "name": ["nanrow", "natrow", "nonerow"],
        "xmin": [0.0] * 3, "ymin": [0.0] * 3, "xmax": [1.0] * 3, "ymax": [1.0] * 3,
        "time": [np.nan, pd.NaT, None],
    })
    got = qa.eval_ogc_catalog(qa.at("2024-02-15"), cat)
    assert got["name"].tolist() == ["nanrow", "natrow", "nonerow"]
    got = qa.eval_ogc_catalog(qa.between("2024-01-01", "2024-02-01"), cat)
    assert len(got) == 3


def test_ogc_between_unsorted_positions():
    """Directly-constructed (unsorted) positions still get the sorted
    envelope, like the reference's defensive .sorted."""
    from geotrellis_server_ray.functions import ogctime as OT

    unsorted = OT.OgcTimePositions((
        np.datetime64("2024-01-15", "us"), np.datetime64("2024-03-01", "us"),
        np.datetime64("2024-02-01", "us")))
    cat = pd.DataFrame({
        "name": ["u"], "xmin": [0.0], "ymin": [0.0], "xmax": [1.0], "ymax": [1.0],
        "time": [unsorted],
    })
    # envelope [01-15, 03-01]: end falls inside [02-15, 03-15] -> match
    got = qa.eval_ogc_catalog(qa.between("2024-02-15", "2024-03-15"), cat)
    assert got["name"].tolist() == ["u"]


def test_raster_temporal_rule_excludes_non_temporal(catalog):
    """temporal_rule='raster' mirrors RasterSourceRepository.scala:55-57:
    At/Between EXCLUDE layers lacking the time attribute (fold(false)),
    unlike the default OGC match-all rule."""
    got = qa.eval_catalog(qa.at("2024-01-10"), catalog, temporal_rule="raster")
    assert got["name"].tolist() == ["a"]  # non-temporal 'b' excluded
    got = qa.eval_catalog(qa.between("2024-01-01", "2024-01-15"), catalog,
                          temporal_rule="raster")
    assert got["name"].tolist() == ["a"]
    # and the rule threads through And/Or composition
    got = qa.eval_catalog(qa.and_(qa.all_(), qa.at("2024-01-10")), catalog,
                          temporal_rule="raster")
    assert got["name"].tolist() == ["a"]


def test_search_filters_semigroups():
    """Query -> single STAC search-filters record, mirroring
    SearchFiltersQuery.scala's IntersectionSemigroup (And, :50-85) and
    UnionSemigroup (Or, :87-121) plus the Option-semigroup quirks."""
    # And = bbox intersection, temporal [max start, min end]
    sf = qa.to_search_filters(qa.and_(
        qa.and_(qa.covers(0, 0, 30, 30), qa.covers(10, 5, 50, 50)),
        qa.between("2024-01-05", "2024-03-01")))
    assert sf["bbox"] == (10, 5, 30, 30)
    assert sf["datetime"] == ("2024-01-05", "2024-03-01")
    sf = qa.to_search_filters(qa.and_(
        qa.between("2024-01-05", "2024-03-01"),
        qa.between("2024-02-01", "2024-06-01")))
    assert sf["datetime"] == ("2024-02-01", "2024-03-01")
    # Or = bbox union, temporal [min start, max end]
    sf = qa.to_search_filters(qa.or_(
        qa.intersects(0, 0, 10, 10), qa.intersects(50, 50, 60, 60)))
    assert sf["intersects"] == (0, 0, 60, 60)
    sf = qa.to_search_filters(qa.or_(
        qa.at("2024-02-01"), qa.between("2024-01-01", "2024-01-15")))
    assert sf["datetime"] == ("2024-01-01", "2024-02-01")
    # disjoint And-bboxes throw, like the reference IllegalArgumentException
    import pytest

    with pytest.raises(ValueError, match="no intersections"):
        qa.to_search_filters(qa.and_(qa.covers(0, 0, 1, 1), qa.covers(5, 5, 6, 6)))
    # Option quirks: Nothing -> None; And(Nothing, q) -> q's filters
    assert qa.to_search_filters(qa.nothing()) is None
    assert qa.to_search_filters(
        qa.and_(qa.nothing(), qa.with_name("c1")))["collections"] == ["c1"]
    # collections distinct-concat under BOTH semigroups
    sf = qa.to_search_filters(qa.or_(qa.with_name("a"),
                                     qa.and_(qa.with_name("b"), qa.with_name("a"))))
    assert sf["collections"] == ["a", "b"]
    # unsupported leaves compile to match-all (:145)
    assert qa.to_search_filters(qa.contains(0, 0, 1, 1)) == qa.to_search_filters(qa.all_())
    # ByLayer criteria: query map with layer:ids superset + deepMerge
    sf = qa.to_search_filters(qa.with_name("lyr"), criteria="layer")
    assert sf["query"] == {"layer:ids": [{"superset": ["lyr"]}]}


def test_extract_name_or_left_bias():
    """extractName (:160-167): And concatenates, Or keeps the left side's
    names when non-empty."""
    assert qa.extract_name(qa.and_(qa.with_name("a"), qa.with_name("b"))) == ["a", "b"]
    assert qa.extract_name(qa.or_(qa.with_name("a"), qa.with_name("b"))) == ["a"]
    assert qa.extract_name(qa.or_(qa.all_(), qa.with_name("b"))) == ["b"]
    assert qa.extract_name(qa.intersects(0, 0, 1, 1)) == []


def test_search_params_soundness():
    """bbox/intersects both present: send ONE necessary condition (their
    intersection would over-prune); half-open datetime not sent."""
    sf = qa.to_search_filters(qa.and_(qa.covers(0, 0, 30, 30),
                                      qa.intersects(-5, -5, 10, 10)))
    p = qa.search_params(sf)
    assert p["bbox"] == (0.0, 0.0, 30.0, 30.0)
    assert qa.search_params(None) is None
    assert "datetime_range" not in qa.search_params(
        qa.to_search_filters(qa.with_name("x")))
