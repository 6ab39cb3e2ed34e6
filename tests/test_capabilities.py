"""S8 XML capabilities writers: structure-validated via xml.etree parse."""

import xml.etree.ElementTree as ET

from geotrellis_server_ray.functions.capabilities import (
    wcs_capabilities, wms_capabilities, wmts_capabilities,
)

LAYERS = [
    {"name": "ndvi", "title": "NDVI", "xmin": -180.0, "ymin": -85.0,
     "xmax": 180.0, "ymax": 85.0,
     "time_positions": ["2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z"]},
    {"name": "dem", "xmin": 5.0, "ymin": 44.0, "xmax": 12.0, "ymax": 48.0},
]


def test_wms_capabilities_structure():
    doc = wms_capabilities(LAYERS)
    root = ET.fromstring(doc)  # well-formed
    assert root.tag.endswith("WMS_Capabilities")
    ns = {"w": "http://www.opengis.net/wms"}
    names = [e.text for e in root.findall(".//w:Layer/w:Layer/w:Name", ns)]
    assert names == ["ndvi", "dem"]
    # temporal layer carries a time Dimension with default = first position
    dim = root.find(".//w:Layer/w:Layer[w:Name='ndvi']/w:Dimension", ns)
    assert dim is not None and dim.get("default") == "2024-01-01T00:00:00Z"
    assert dim.text == "2024-01-01T00:00:00Z,2024-02-01T00:00:00Z"
    bb = root.find(".//w:Layer[w:Name='dem']/w:EX_GeographicBoundingBox", ns)
    assert bb.find("w:westBoundLongitude", ns).text == "5.0"


def test_wmts_capabilities_scale_denominators():
    doc = wmts_capabilities(LAYERS, zooms=range(0, 3))
    root = ET.fromstring(doc)
    ns = {"m": "http://www.opengis.net/wmts/1.0",
          "ows": "http://www.opengis.net/ows/1.1"}
    mats = root.findall(".//m:TileMatrix", ns)
    assert len(mats) == 3
    # the reference formula: cellSize.width / 0.00028 (metersPerUnit = 1)
    sd0 = float(mats[0].find("m:ScaleDenominator", ns).text)
    sd1 = float(mats[1].find("m:ScaleDenominator", ns).text)
    assert abs(sd0 / sd1 - 2.0) < 1e-12  # halves per zoom
    from geotrellis_server_ray.functions.tiles import tile_cell_size

    assert sd0 == tile_cell_size(0) / 0.00028
    corner = mats[0].find("m:TopLeftCorner", ns).text.split()
    assert float(corner[0]) == -float(corner[1])  # world extent corner
    assert mats[2].find("m:MatrixWidth", ns).text == "4"


def test_wcs_capabilities_coverage_summaries():
    doc = wcs_capabilities(LAYERS)
    root = ET.fromstring(doc)
    ns = {"c": "http://www.opengis.net/wcs/1.1.1",
          "ows": "http://www.opengis.net/ows/1.1"}
    ids = [e.text for e in root.findall(".//c:CoverageSummary/c:Identifier", ns)]
    assert ids == ["ndvi", "dem"]
    lc = root.find(".//c:CoverageSummary/ows:WGS84BoundingBox/ows:LowerCorner", ns)
    assert lc.text == "-180.0 -85.0"


def test_wfs_gml_feature_collection():
    """S9 GML writer (WfsFeatureCollection.scala:45-152 shape): featureMember
    > PixelPerBandFeature > Geometry > MultiPolygon(srsName URN) > ... >
    coordinates with the reference's decimal/cs/ts attributes and the closed
    cell-bbox ring; scalar properties flattened to child elements."""
    from geotrellis_server_ray.functions.capabilities import wfs_feature_collection_gml

    feats = [
        {"id": "doc-7", "span": 3, "xmin": -20.0, "ymin": 10.0, "xmax": -10.0, "ymax": 20.0},
        {"id": "doc-9", "span": 0, "xmin": 0.5, "ymin": 0.5, "xmax": 1.5, "ymax": 1.5},
    ]
    root = ET.fromstring(wfs_feature_collection_gml(feats, epsg=3857))
    ns = {"gml": "http://www.opengis.net/gml", "wfs": "http://www.opengis.net/wfs"}
    assert root.tag == "{http://www.opengis.net/wfs}FeatureCollection"
    members = root.findall("gml:featureMember", ns)
    assert len(members) == 2
    f0 = members[0].find("PixelPerBandFeature")
    mp = f0.find("Geometry/gml:MultiPolygon", ns)
    assert mp.get("srsName") == "urn:ogc:def:crs:EPSG::3857"
    coords = mp.find(".//gml:LinearRing/gml:coordinates", ns)
    assert (coords.get("decimal"), coords.get("cs"), coords.get("ts")) == (".", ",", " ")
    pts = [tuple(float(v) for v in p.split(",")) for p in coords.text.split(" ")]
    assert pts[0] == pts[-1] == (-20.0, 10.0)      # closed ring at (xmin, ymin)
    assert pts[2] == (-10.0, 20.0)                 # opposite corner
    assert len(pts) == 5
    assert f0.find("id").text == "doc-7"
    assert f0.find("span").text == "3"
    # geometry fields are not duplicated as property elements
    assert f0.find("xmin") is None


def test_wfs_gml_from_span_features(ray_session, sf_correct):
    """End-to-end: S9 wfs_features_batch struct rows -> GML document."""
    import pyarrow as pa

    from geotrellis_server_ray.functions.capabilities import wfs_feature_collection_gml
    from geotrellis_server_ray.sources.corpus import corpus_dataset
    from geotrellis_server_ray.stages.spans import (
        assign_tiles, explode_spans, parse_geo, wfs_features_batch)

    ds = corpus_dataset(sf_correct).limit(20)
    ds = ds.map_batches(explode_spans, batch_format="pyarrow")
    ds = ds.map_batches(parse_geo, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: assign_tiles(b, zoom=8), batch_format="pyarrow")
    ds = ds.map_batches(wfs_features_batch, batch_format="pyarrow")
    rows = ds.limit(5).to_pandas()["feature"].tolist()
    doc = wfs_feature_collection_gml(rows)
    root = ET.fromstring(doc)
    ns = {"gml": "http://www.opengis.net/gml"}
    assert len(root.findall("gml:featureMember", ns)) == len(rows)


def test_wcs_describe_coverage_axis_rules():
    """CoverageView.scala:134-190: imageCRS pixel bbox; geographic CRS boxes
    list latitude first (plus a duplicated WGS84BoundingBox); projected CRS
    boxes list easting first; temporal domain carries gml timePositions."""
    from geotrellis_server_ray.functions.capabilities import wcs_describe_coverage

    doc = wcs_describe_coverage(LAYERS)
    root = ET.fromstring(doc)
    ns = {"c": "http://www.opengis.net/wcs/1.1.1",
          "ows": "http://www.opengis.net/ows/1.1",
          "gml": "http://www.opengis.net/gml"}
    cds = root.findall("c:CoverageDescription", ns)
    assert [c.find("c:Identifier", ns).text for c in cds] == ["ndvi", "dem"]
    dem = cds[1]
    boxes = dem.findall(".//ows:BoundingBox", ns)
    img = [b for b in boxes if b.get("crs") == "urn:ogc:def:crs:OGC::imageCRS"][0]
    assert img.find("ows:LowerCorner", ns).text == "0.0 0.0"
    geo = [b for b in boxes if b.get("crs") == "urn:ogc:def:crs:EPSG::4326"][0]
    assert geo.find("ows:LowerCorner", ns).text == "44.0 5.0"   # lat first
    merc = [b for b in boxes if b.get("crs") == "urn:ogc:def:crs:EPSG::3857"][0]
    lc = merc.find("ows:LowerCorner", ns).text.split()
    assert float(lc[0]) > 400000.0  # easting first (lon 5 deg ~ 556 km)
    # lat-first here MIRRORS THE REFERENCE (CoverageView.scala:161-169
    # emits ymin::xmin for WGS84BoundingBoxType), deviating from OWS
    # Common's lon-first CRS84 definition — parity over pedantry, and the
    # deviation is documented in wcs_describe_coverage's docstring
    wgs = dem.find(".//ows:WGS84BoundingBox", ns)
    assert wgs is not None and wgs.find("ows:LowerCorner", ns).text == "44.0 5.0"
    ndvi = cds[0]
    times = [e.text for e in ndvi.findall(".//gml:timePosition", ns)]
    assert times == ["2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z"]
    assert dem.find(".//c:TemporalDomain", ns) is None


def test_wms_style_legend_url_blocks():
    """Style + LegendURL etree goldens (r3 VERDICT next #9;
    style/LegendModel.scala:19-24, wms/package.scala:52-59): width/height
    as attributes, Format child, xlink OnlineResource child."""
    import xml.etree.ElementTree as ET

    layers = [dict(
        name="ndvi", title="NDVI", xmin=-180, ymin=-85, xmax=180, ymax=85,
        styles=[{
            "name": "red-to-green", "title": "Red to green",
            "legends": [{"format": "image/png", "width": 64, "height": 256,
                         "href": "http://localhost/legend/ndvi.png"}],
        }, {"name": "plain"}],
    )]
    root = ET.fromstring(wms_capabilities(layers))
    ns = {"wms": "http://www.opengis.net/wms"}
    styles = root.findall(".//wms:Layer/wms:Layer/wms:Style", ns)
    assert [s.findtext("wms:Name", namespaces=ns) for s in styles] == \
        ["red-to-green", "plain"]
    assert styles[1].findtext("wms:Title", namespaces=ns) == "plain"
    lu = styles[0].find("wms:LegendURL", ns)
    assert lu.get("width") == "64" and lu.get("height") == "256"
    assert lu.findtext("wms:Format", namespaces=ns) == "image/png"
    onr = lu.find("wms:OnlineResource", ns)
    assert onr.get("{http://www.w3.org/1999/xlink}href") == \
        "http://localhost/legend/ndvi.png"
    assert onr.get("{http://www.w3.org/1999/xlink}type") == "simple"


def test_service_exception_report_goldens():
    """Reference ServiceExceptionReport shape (GetFeatureInfoException.toXML)
    and the circe JSON quirk: exceptions encoded as a list of PAIRS."""
    import json

    from geotrellis_server_ray.functions.capabilities import (
        InvalidPointException, LayerNotDefinedException,
        service_exception_report)

    xml = service_exception_report("boom", "LayerNotDefined", "1.3.0")
    root = ET.fromstring(xml)
    assert root.tag == "ServiceExceptionReport"
    assert root.get("version") == "1.3.0"
    exc = root.find("ServiceException")
    assert exc.get("code") == "LayerNotDefined"
    assert exc.get("locator") == "noLocator"
    assert exc.text == "boom"

    e = LayerNotDefinedException("Layer ndvi not found", "1.3.0")
    assert e.code == "LayerNotDefined"
    assert ET.fromstring(e.render("xml")).find("ServiceException").get("code") \
        == "LayerNotDefined"
    j = json.loads(InvalidPointException("bad point", "1.1.1").render("json"))
    assert j == {"version": "1.1.1",
                 "exceptions": [["code", "InvalidPoint"],
                                ["locator", "noLocator"],
                                ["text", "bad point"]]}


def test_param_error_catalog_exact_reference_strings():
    """Byte-exact replicas of ParamError.scala:24-70 message templates."""
    from geotrellis_server_ray.functions import params as P

    assert P.invalid_value("format", "gif", ["png", "jpeg"]) == \
        "Parameter 'format' has an invalid value of 'gif'. Needs to be one of: png,jpeg"
    assert P.missing_param("bbox") == "Missing parameter 'bbox'"
    assert P.missing_multi_param(["identifier", "identifiers"]) == \
        "Parameters must include one of ['identifier','identifiers'], but none found."
    assert P.repeated_param("time") == "More than one instance of parameter 'time'"
    assert P.parse_error("width", "abc") == \
        "Cannot parse value 'abc' for parameter 'width'"
    assert P.crs_parse_error("EPSG:999999") == "Cannot parse CRS from 'EPSG:999999'"
    assert P.unsupported_format_error("image/gif") == \
        "Unsupported format: 'image/gif'"
    assert P.no_supported_version_error(["2.0.0"], ["1.1.0", "1.1.1"]) == \
        "No available version in 1.1.0, 1.1.1: 2.0.0"
    assert P.generate_error_message([P.missing_param("a"), P.missing_param("b")]) \
        == "Missing parameter 'a'; Missing parameter 'b'"


def test_getmap_exceptions_batch_emits_layer_not_defined():
    import numpy as np
    import pyarrow as pa

    from geotrellis_server_ray.pipelines.serving import (
        getmap_batch, getmap_exceptions_batch)

    batch = pa.table({
        "request_id": pa.array(np.arange(4, dtype=np.int64)),
        "layer": pa.array(["ndvi", "nope", "red", "nope"]),
        "x": pa.array(np.array([1, 2, 3, 4], dtype=np.int64)),
        "y": pa.array(np.array([1, 2, 3, 4], dtype=np.int64)),
        "format": pa.array(["png"] * 4),
    })
    ok = getmap_batch(batch)
    bad = getmap_exceptions_batch(batch)
    # every request lands on exactly one side
    assert sorted(ok.column("request_id").to_pylist()
                  + bad.column("request_id").to_pylist()) == [0, 1, 2, 3]
    assert bad.column("layer").to_pylist() == ["nope", "nope"]
    doc = bad.column("exception_xml").to_pylist()[0]
    root = ET.fromstring(doc)
    assert root.find("ServiceException").get("code") == "LayerNotDefined"
    assert "Layer nope not found" in doc


def test_wmts_non_webmercator_matrix_sets():
    """VERDICT r4 next #6: TileMatrixSets for projected CRSs beyond the
    hardcoded 3857 — an LCC (Lambert-93, EPSG:2154) set built from a
    proj.py-projected extent, with the reference scale-denominator formula
    (GeotrellisTileMatrix.scala:49) and a tile-extent cross-check against
    proj.py's forward transform."""
    import numpy as np

    from geotrellis_server_ray.functions.capabilities import (
        matrix_tile_extent, tile_matrix_set)
    from geotrellis_server_ray.functions.proj import transform

    # Project the Lambert-93 anchor graticule with proj.py and build a
    # square-cell extent around it (metric CRS -> metersPerUnit = 1)
    (cx,), (cy,) = transform("EPSG:4326", "EPSG:2154", [3.0], [46.5])
    half = 1_048_576.0  # 2^20 m: square by construction
    ext = (cx - half, cy - half, cx + half, cy + half)
    ms = tile_matrix_set("lambert93", 2154, ext, zooms=range(0, 4))
    doc = wmts_capabilities(LAYERS, matrix_sets=[ms])
    root = ET.fromstring(doc)
    ns = {"w": "http://www.opengis.net/wmts/1.0",
          "o": "http://www.opengis.net/ows/1.1"}
    tms = root.find("w:Contents/w:TileMatrixSet", ns)
    assert tms.find("o:SupportedCRS", ns).text == "urn:ogc:def:crs:EPSG::2154"
    assert [e.text for e in tms.findall("w:TileMatrix/o:Identifier", ns)] \
        == ["0", "1", "2", "3"]
    # scale denominator at z: cell / 0.00028 * 1 (meters CRS)
    cell0 = 2 * half / 256
    got = float(tms.find("w:TileMatrix/w:ScaleDenominator", ns).text)
    assert np.isclose(got, cell0 / 0.00028)
    tl = tms.find("w:TileMatrix/w:TopLeftCorner", ns).text.split()
    assert float(tl[0]) == ext[0] and float(tl[1]) == ext[3]
    # layers link to the set by identifier
    assert root.find(".//w:TileMatrixSetLink/w:TileMatrixSet", ns).text == "lambert93"

    # tile-extent cross-check: z=1 splits the extent in quadrants; tile
    # (1, 0) is the top-right quadrant whose corners proj.py can verify
    te = matrix_tile_extent(ms, 1, 1, 0)
    assert te == (cx, cy, cx + half, cy + half)
    # the tile's top-right corner inverse->forward round-trips through
    # proj.py to itself (the matrix is consistent with the projection)
    from geotrellis_server_ray.functions.proj import parse_crs
    lcc = parse_crs("EPSG:2154")
    lon, lat = lcc.inverse(np.array([te[2]]), np.array([te[3]]))
    bx, by = lcc.forward(lon, lat)
    assert np.isclose(bx[0], te[2]) and np.isclose(by[0], te[3])

    # 4326 sets use the reference's meters-per-degree factor (:42-43)
    ms4326 = tile_matrix_set("wgs84grid", 4326, (-180.0, -90.0, 180.0, 90.0),
                             zooms=range(0, 2), base_layout=(2, 1))
    mpd = 6378137.0 * 2.0 * np.pi / 360.0
    assert np.isclose(ms4326["matrices"][0]["scale_denominator"],
                      (360.0 / 512) / 0.00028 * mpd)

    # the reference's square-cell require (:38) still guards
    import pytest

    with pytest.raises(ValueError, match="same as height"):
        tile_matrix_set("bad", 2154, (0.0, 0.0, 100.0, 50.0))


def test_wmts_default_set_unchanged():
    """The parameterization must not move the legacy WebMercator golden."""
    doc = wmts_capabilities(LAYERS, zooms=range(0, 3))
    root = ET.fromstring(doc)
    ns = {"w": "http://www.opengis.net/wmts/1.0",
          "o": "http://www.opengis.net/ows/1.1"}
    tms = root.find("w:Contents/w:TileMatrixSet", ns)
    assert tms.find("o:SupportedCRS", ns).text == "urn:ogc:def:crs:EPSG::3857"
    from geotrellis_server_ray.functions.tiles import WORLD, tile_cell_size
    got = float(tms.find("w:TileMatrix/w:ScaleDenominator", ns).text)
    assert got == tile_cell_size(0, 256) / 0.00028
    assert tms.find("w:TileMatrix/w:TopLeftCorner", ns).text == f"{-WORLD!r} {WORLD!r}"
