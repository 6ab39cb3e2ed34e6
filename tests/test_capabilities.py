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
