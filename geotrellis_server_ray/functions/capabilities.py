"""OGC capabilities XML writers (SURVEY.md §2.3 S8 — the last out-of-scope
row from round 1): WMS 1.3.0 GetCapabilities, WMTS 1.0.0 GetCapabilities
(tile matrix sets with the reference's scale-denominator formula,
GeotrellisTileMatrix.scala:49: cellwidth / 0.00028 * metersPerUnit), and WCS
1.1.1 coverage summaries (CoverageView.scala:41-57 shape).

The reference renders these with scalaxb case classes
(wms/CapabilitiesView.scala, wmts/CapabilitiesView.scala); here they are
built with xml.etree from the engine's layer-catalog rows — the same
metadata-only transform, no data plane involved. Layer rows: dicts with
name, title, xmin/ymin/xmax/ymax (EPSG:4326 lon/lat), optional
time_positions (ISO strings).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .tiles import WORLD, tile_cell_size

_WMS_NS = "http://www.opengis.net/wms"
_WMTS_NS = "http://www.opengis.net/wmts/1.0"
_OWS_NS = "http://www.opengis.net/ows/1.1"
_WCS_NS = "http://www.opengis.net/wcs/1.1.1"

# WMTS scale denominator: 0.28 mm per pixel (GeotrellisTileMatrix.scala:49)
_METERS_PER_PIXEL = 0.00028

# metersPerUnit (GeotrellisTileMatrix.scala:41-45): the reference maps only
# LatLng (equatorial meters per degree) and WebMercator (1); the engine
# extends the same rule to every projected-meter CRS proj.py supports
# (LCC / polar stereo / Albers / UTM), whose unit IS the meter -> 1.
_METERS_PER_DEGREE = 6378137.0 * 2.0 * 3.141592653589793 / 360.0


def tile_matrix_set(identifier: str, epsg: int, extent: tuple,
                    zooms: range = range(0, 20), tile_size: int = 256,
                    base_layout: tuple = (1, 1)) -> dict:
    """Matrix-set definition for ANY square-cell CRS
    (GeotrellisTileMatrix.scala:30-62 generalized past the hardcoded
    WebMercator set): level z has base_layout << z tiles per axis over
    ``extent`` (in CRS units). Enforces the reference's square-cell
    ``require`` (:38) and computes each level's scale denominator as
    cellwidth / 0.00028 * metersPerUnit (:49). Returns {identifier, epsg,
    extent, tile_size, matrices:[{id, cell, scale_denominator,
    matrix_width, matrix_height}]}."""
    x0, y0, x1, y1 = (float(v) for v in extent)
    mpu = _METERS_PER_DEGREE if epsg == 4326 else 1.0
    bc, br = base_layout
    mats = []
    for z in zooms:
        cols, rows = bc << z, br << z
        cw = (x1 - x0) / (cols * tile_size)
        ch = (y1 - y0) / (rows * tile_size)
        if abs(cw - ch) > 1e-9 * max(abs(cw), abs(ch)):
            raise ValueError(
                f"cell size width must be same as height: ({cw}, {ch})")
        mats.append({"id": z, "cell": cw,
                     "scale_denominator": cw / _METERS_PER_PIXEL * mpu,
                     "matrix_width": cols, "matrix_height": rows})
    return {"identifier": identifier, "epsg": epsg,
            "extent": (x0, y0, x1, y1), "tile_size": tile_size,
            "matrices": mats}


def matrix_tile_extent(ms: dict, z_idx: int, col: int, row: int) -> tuple:
    """Extent of one tile of a matrix set, row 0 at the TOP (the WMTS
    TopLeftCorner convention, GeotrellisTileMatrix.scala:56)."""
    x0, _, _, y1 = ms["extent"]
    m = ms["matrices"][z_idx]
    step = m["cell"] * ms["tile_size"]
    return (x0 + col * step, y1 - (row + 1) * step,
            x0 + (col + 1) * step, y1 - row * step)


def _sub(parent, tag, text=None, **attrs):
    e = ET.SubElement(parent, tag, {k: str(v) for k, v in attrs.items()})
    if text is not None:
        e.text = str(text)
    return e


def wms_capabilities(layers: list[dict], service_title: str = "geotrellis_server_ray",
                     service_url: str = "http://localhost/wms") -> str:
    """WMS 1.3.0 capabilities document (wms/CapabilitiesView.scala:47-140
    shape: Service block, Request block, nested Layer tree with CRS,
    EX_GeographicBoundingBox, and time Dimension per temporal layer)."""
    root = ET.Element("WMS_Capabilities", {"version": "1.3.0", "xmlns": _WMS_NS})
    svc = _sub(root, "Service")
    _sub(svc, "Name", "WMS")
    _sub(svc, "Title", service_title)
    _sub(svc, "OnlineResource", href=service_url)
    cap = _sub(root, "Capability")
    req = _sub(cap, "Request")
    for op in ("GetCapabilities", "GetMap", "GetFeatureInfo"):
        op_el = _sub(req, op)
        for fmt in (("text/xml",) if op == "GetCapabilities"
                    else ("image/png", "image/jpeg", "image/tiff")):
            _sub(op_el, "Format", fmt)
    parent = _sub(cap, "Layer")
    _sub(parent, "Title", service_title)
    for crs in ("EPSG:4326", "EPSG:3857"):
        _sub(parent, "CRS", crs)
    for lyr in layers:
        el = _sub(parent, "Layer", queryable="1")
        _sub(el, "Name", lyr["name"])
        _sub(el, "Title", lyr.get("title", lyr["name"]))
        bb = _sub(el, "EX_GeographicBoundingBox")
        _sub(bb, "westBoundLongitude", lyr["xmin"])
        _sub(bb, "eastBoundLongitude", lyr["xmax"])
        _sub(bb, "southBoundLatitude", lyr["ymin"])
        _sub(bb, "northBoundLatitude", lyr["ymax"])
        if lyr.get("time_positions"):
            dim = _sub(el, "Dimension", name="time", units="ISO8601",
                       default=lyr["time_positions"][0])
            dim.text = ",".join(lyr["time_positions"])
        # Style + LegendURL blocks (style/LegendModel.scala:19-24 via
        # CapabilitiesView.scala:169-176 / wms/package.scala:52-59): each
        # style lists legends as LegendURL(width, height attrs; Format +
        # xlink OnlineResource children). Style dicts: {name, title,
        # legends: [{format, width, height, href}]}.
        for st in lyr.get("styles", ()):
            s_el = _sub(el, "Style")
            _sub(s_el, "Name", st["name"])
            _sub(s_el, "Title", st.get("title", st["name"]))
            for lg in st.get("legends", ()):
                l_el = _sub(s_el, "LegendURL",
                            width=lg["width"], height=lg["height"])
                _sub(l_el, "Format", lg["format"])
                _sub(l_el, "OnlineResource", **{
                    "xmlns:xlink": "http://www.w3.org/1999/xlink",
                    "xlink:type": "simple",
                    "xlink:href": lg["href"],
                })
    return ET.tostring(root, encoding="unicode")


def wmts_capabilities(layers: list[dict], matrix_set: str = "webmercator",
                      zooms: range = range(0, 20), tile_size: int = 256,
                      matrix_sets: list[dict] | None = None) -> str:
    """WMTS 1.0.0 capabilities. Default: one WebMercator TileMatrixSet; each
    TileMatrix carries the reference's scale denominator (cell width /
    0.00028, metersPerUnit = 1 for EPSG:3857) and the top-left corner of the
    WebMercator world extent (GeotrellisTileMatrix.scala:30-55).

    ``matrix_sets`` (VERDICT r4 next #6): a list of :func:`tile_matrix_set`
    definitions replaces the hardcoded WebMercator set — any square-cell
    projected CRS proj.py supports (LCC / polar stereo / Albers / UTM)
    becomes a served TileMatrixSet, like GeotrellisTileMatrix building
    matrices for arbitrary CRSs. Each layer dict may pin its set with a
    ``matrix_set`` key (default: the first set's identifier)."""
    root = ET.Element("Capabilities", {"version": "1.0.0", "xmlns": _WMTS_NS,
                                       "xmlns:ows": _OWS_NS})
    contents = _sub(root, "Contents")
    if matrix_sets is None:
        matrix_sets = [{
            "identifier": matrix_set, "epsg": 3857,
            "extent": (-WORLD, -WORLD, WORLD, WORLD), "tile_size": tile_size,
            "matrices": [{"id": z, "cell": tile_cell_size(z, tile_size),
                          "scale_denominator":
                              tile_cell_size(z, tile_size) / _METERS_PER_PIXEL,
                          "matrix_width": 1 << z, "matrix_height": 1 << z}
                         for z in zooms],
        }]
    default_set = matrix_sets[0]["identifier"]
    for lyr in layers:
        el = _sub(contents, "Layer")
        _sub(el, "ows:Title", lyr.get("title", lyr["name"]))
        _sub(el, "ows:Identifier", lyr["name"])
        _sub(el, "Format", "image/png")
        link = _sub(el, "TileMatrixSetLink")
        _sub(link, "TileMatrixSet", lyr.get("matrix_set", default_set))
    for ms in matrix_sets:
        tms = _sub(contents, "TileMatrixSet")
        _sub(tms, "ows:Identifier", ms["identifier"])
        _sub(tms, "ows:SupportedCRS", f"urn:ogc:def:crs:EPSG::{ms['epsg']}")
        x0, _, _, y1 = ms["extent"]
        for mm in ms["matrices"]:
            m = _sub(tms, "TileMatrix")
            _sub(m, "ows:Identifier", mm["id"])
            _sub(m, "ScaleDenominator", repr(float(mm["scale_denominator"])))
            _sub(m, "TopLeftCorner", f"{float(x0)!r} {float(y1)!r}")
            _sub(m, "TileWidth", ms["tile_size"])
            _sub(m, "TileHeight", ms["tile_size"])
            _sub(m, "MatrixWidth", mm["matrix_width"])
            _sub(m, "MatrixHeight", mm["matrix_height"])
    return ET.tostring(root, encoding="unicode")


def wcs_capabilities(layers: list[dict]) -> str:
    """WCS 1.1.1 capabilities + coverage summaries (CoverageView.scala:41-57:
    one CoverageSummary per source with its WGS84 bounding box)."""
    root = ET.Element("Capabilities", {"version": "1.1.1", "xmlns": _WCS_NS,
                                       "xmlns:ows": _OWS_NS})
    contents = _sub(root, "Contents")
    for lyr in layers:
        cs = _sub(contents, "CoverageSummary")
        _sub(cs, "ows:Title", lyr.get("title", lyr["name"]))
        _sub(cs, "Identifier", lyr["name"])
        bb = _sub(cs, "ows:WGS84BoundingBox")
        _sub(bb, "ows:LowerCorner", f'{lyr["xmin"]!r} {lyr["ymin"]!r}')
        _sub(bb, "ows:UpperCorner", f'{lyr["xmax"]!r} {lyr["ymax"]!r}')
    return ET.tostring(root, encoding="unicode")


_GML_NS = "http://www.opengis.net/gml"
_WFS_NS = "http://www.opengis.net/wfs"


def wfs_feature_collection_gml(features: list[dict], epsg: int = 3857,
                               feature_name: str = "PixelPerBandFeature") -> str:
    """S9 GML serialization (WfsFeatureCollection.scala:45-152): each feature
    becomes gml:featureMember > {feature_name} > Geometry > gml:MultiPolygon
    (srsName = the EPSG URN) of one cell polygon — the bbox ring, closed,
    coordinates encoded 'x,y x,y ...' with the reference's decimal/cs/ts
    attributes — followed by the scalar properties as <key>value</key>
    elements (the jsonXML flattening). Feature rows are the S9 struct dicts:
    id, span, xmin, ymin, xmax, ymax."""
    root = ET.Element("wfs:FeatureCollection",
                      {"xmlns:wfs": _WFS_NS, "xmlns:gml": _GML_NS})
    urn = f"urn:ogc:def:crs:EPSG::{epsg}"
    for f in features:
        member = _sub(root, "gml:featureMember")
        feat = _sub(member, feature_name)
        geom = _sub(feat, "Geometry")
        mp = _sub(geom, "gml:MultiPolygon", srsName=urn)
        pm = _sub(mp, "gml:polygonMember")
        poly = _sub(pm, "gml:Polygon")
        ext = _sub(poly, "gml:exterior")
        ring = _sub(ext, "gml:LinearRing")
        x0, y0, x1, y1 = (float(f["xmin"]), float(f["ymin"]),
                          float(f["xmax"]), float(f["ymax"]))
        coords = " ".join(f"{x!r},{y!r}" for x, y in
                          ((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)))
        _sub(ring, "gml:coordinates", coords, decimal=".", cs=",", ts=" ")
        for k, v in f.items():
            if k not in ("xmin", "ymin", "xmax", "ymax"):
                _sub(feat, str(k), v)
    return ET.tostring(root, encoding="unicode")


def wcs_describe_coverage(layers: list[dict],
                          supported_crs: tuple = ("EPSG:4326", "EPSG:3857")) -> str:
    """WCS 1.1.1 DescribeCoverage (CoverageView.scala:91-190 shape):
    one CoverageDescription per layer with (1) the pixel-space imageCRS
    bounding box (0,0)-(w,h), (2) one BoundingBox per supported CRS — the
    reference's load-bearing axis rule: GEOGRAPHIC CRSs list latitude first
    (LowerCorner = ymin xmin), projected CRSs easting first — (3) an extra
    ows:WGS84BoundingBox duplicating the EPSG:4326 box, and (4) a
    TemporalDomain of gml:timePosition records. Layer dicts: name, title?,
    xmin/ymin/xmax/ymax (EPSG:4326 lon/lat), width?/height? (grid dims),
    time_positions?."""
    from .proj import transform

    root = ET.Element("CoverageDescriptions", {"xmlns": _WCS_NS,
                                               "xmlns:ows": _OWS_NS,
                                               "xmlns:gml": "http://www.opengis.net/gml"})
    for lyr in layers:
        cd = _sub(root, "CoverageDescription")
        _sub(cd, "ows:Title", lyr.get("title", lyr["name"]))
        _sub(cd, "Identifier", lyr["name"])
        dom = _sub(cd, "Domain")
        sp = _sub(dom, "SpatialDomain")
        w, h = lyr.get("width", 256), lyr.get("height", 256)
        img = _sub(sp, "ows:BoundingBox", crs="urn:ogc:def:crs:OGC::imageCRS",
                   dimensions=2)
        _sub(img, "ows:LowerCorner", "0.0 0.0")
        _sub(img, "ows:UpperCorner", f"{float(w)!r} {float(h)!r}")
        x0, y0, x1, y1 = (lyr["xmin"], lyr["ymin"], lyr["xmax"], lyr["ymax"])
        for crs in supported_crs:
            urn = "urn:ogc:def:crs:EPSG::" + crs.split(":")[1]
            bb = _sub(sp, "ows:BoundingBox", crs=urn, dimensions=2)
            if crs == "EPSG:4326":  # geographic: latitude axis first
                _sub(bb, "ows:LowerCorner", f"{y0!r} {x0!r}")
                _sub(bb, "ows:UpperCorner", f"{y1!r} {x1!r}")
                wgs = _sub(sp, "ows:WGS84BoundingBox", dimensions=2)
                _sub(wgs, "ows:LowerCorner", f"{y0!r} {x0!r}")
                _sub(wgs, "ows:UpperCorner", f"{y1!r} {x1!r}")
            else:  # projected: easting first
                px, py = transform("EPSG:4326", crs, [x0, x1], [max(y0, -85.05), min(y1, 85.05)])
                _sub(bb, "ows:LowerCorner", f"{float(px[0])!r} {float(py[0])!r}")
                _sub(bb, "ows:UpperCorner", f"{float(px[1])!r} {float(py[1])!r}")
        if lyr.get("time_positions"):
            td = _sub(dom, "TemporalDomain")
            for p in lyr["time_positions"]:
                _sub(td, "gml:timePosition", p)
    return ET.tostring(root, encoding="unicode")


# ------------------------------------------------------- exception documents


def service_exception_report(msg: str, code: str, version: str,
                             locator: str = "noLocator") -> str:
    """WMS ServiceExceptionReport XML — the error document the reference
    returns from its GetFeatureInfo handlers (GetFeatureInfoException.toXML,
    ogc/.../wms/GetFeatureInfoException.scala:33-52): one ServiceException
    element carrying the message text with @code/@locator attributes, under
    a report stamped with the request version."""
    root = ET.Element("ServiceExceptionReport", version=version)
    exc = _sub(root, "ServiceException", text=msg)
    exc.set("code", code)
    exc.set("locator", locator)
    return ET.tostring(root, encoding="unicode")


class GetFeatureInfoException(Exception):
    """Renderable GetFeatureInfo error (GetFeatureInfoException.scala:29-83).

    The JSON encoding mirrors the reference's circe encoder verbatim —
    including its quirk of encoding the exceptions list as PAIRS (a scala
    List of tuples), i.e. ``[["code", ...], ["locator", ...], ["text", ...]]``
    rather than an object (GetFeatureInfoException.scala:56-66)."""

    code = "ServiceException"

    def __init__(self, msg: str, version: str):
        super().__init__(msg)
        self.msg = msg
        self.version = version

    def to_xml(self) -> str:
        return service_exception_report(self.msg, self.code, self.version)

    def to_json(self) -> str:
        import json

        return json.dumps(
            {"version": self.version,
             "exceptions": [["code", self.code], ["locator", "noLocator"],
                            ["text", self.msg]]},
            separators=(",", ":"))

    def render(self, info_format: str) -> str:
        """Dispatch on the requested info format (render(), :68-73)."""
        if info_format.lower() in ("json", "application/json"):
            return self.to_json()
        return self.to_xml()


class LayerNotDefinedException(GetFeatureInfoException):
    """GetFeatureInfoException.scala:77-79."""

    code = "LayerNotDefined"


class InvalidPointException(GetFeatureInfoException):
    """GetFeatureInfoException.scala:81-83."""

    code = "InvalidPoint"
