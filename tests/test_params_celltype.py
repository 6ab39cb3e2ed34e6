"""M8 accumulated validation, MamlStore registry, A5-A7/O2 metadata reduces."""

import numpy as np
import pytest

from geotrellis_server_ray.functions import celltype as CT
from geotrellis_server_ray.functions import maml
from geotrellis_server_ray.functions.params import ExpressionStore, parse_getmap_params


def test_params_accumulate_all_errors():
    v = parse_getmap_params({"width": "abc", "bbox": "1,2,3"})
    assert not v.ok
    # every problem reported at once (ValidatedNel semantics), not just the first
    joined = " ".join(v.errors)
    assert "layers" in joined
    assert "width is not an integer" in joined
    assert "missing required parameter: height" in joined
    assert "bbox must have 4 components" in joined
    assert len(v.errors) == 4


def test_params_valid_request():
    v = parse_getmap_params({
        "layers": "ndvi", "width": "256", "height": "256",
        "bbox": "-10,-10,10,10", "format": "image/png",
        "time": "2024-01-01/2024-02-01",
    })
    assert v.ok, v.errors
    assert v.value["bbox"] == (-10.0, -10.0, 10.0, 10.0)
    assert v.value["layer"] == "ndvi"


def test_params_range_and_format_checks():
    v = parse_getmap_params({"layers": "x", "width": "0", "height": "99999",
                             "bbox": "5,5,1,9", "format": "image/gif"})
    assert not v.ok and len(v.errors) == 4


def test_expression_store_roundtrip(tmp_path):
    store = ExpressionStore(str(tmp_path / "exprs.jsonl"))
    assert store.get("ndvi") is None
    store.put("ndvi", maml.ndvi_expr())
    store.put("plus1", {"symbol": "+", "args": [maml.var("x"), maml.lit(1)]})
    assert store.get("ndvi") == maml.ndvi_expr()
    store.put("ndvi", maml.var("red"))  # overwrite
    assert store.get("ndvi") == maml.var("red")
    assert store.get("plus1")["symbol"] == "+"


def test_cell_type_parse_and_union():
    assert CT.parse_cell_type("int32ud42") == ("int32", "ud", 42.0)
    assert CT.parse_cell_type("float64raw") == ("float64", "raw", None)
    assert CT.parse_cell_type("uint8") == ("uint8", None, None)
    with pytest.raises(ValueError):
        CT.parse_cell_type("complex128")
    # widening: int + float -> float; int8 + int32 -> int32
    assert CT.union_cell_types(["int8", "float32"]) == "float32"
    assert CT.union_cell_types(["int8", "int32"]) == "int32"
    # signed/unsigned same width widen to next signed
    assert CT.union_cell_types(["int16", "uint16"]) == "int32"
    # NoData propagation: ud + plain -> constant-default NoData variant
    assert CT.union_cell_types(["int32ud1", "int32"]) == "int32"
    assert CT.union_cell_types(["int32ud1", "int32ud1"]) == "int32ud1"
    assert CT.union_cell_types(["int32ud1", "int32ud2"]) == "int32"
    assert CT.union_cell_types(["float64raw", "float64raw"]) == "float64raw"


def test_metadata_reduces():
    rs = CT.distinct_resolutions([(10.0, 10.0), (5.0, 5.0), (10.0, 10.0)])
    assert rs == [(5.0, 5.0), (10.0, 10.0)]  # finest first
    assert CT.min_band_count([3, 1, 4]) == 1
    assert CT.zooms_desc([3, 9, 3, 12]) == [12, 9, 3]


def test_widen_containment_and_uint64():
    # a wider signed type already contains a narrower unsigned range
    assert CT.union_cell_types(["int32", "uint8"]) == "int32"
    assert CT.union_cell_types(["int16", "uint8"]) == "int16"
    assert CT.union_cell_types(["int8", "uint8"]) == "int16"
    assert CT.union_cell_types(["uint64", "uint32"]) == "uint64"
    assert CT.union_cell_types(["uint64", "int8"]) == "float64"  # no int128


def test_bbox_rejects_nan():
    from geotrellis_server_ray.functions.params import parse_getmap_params

    v = parse_getmap_params({"layers": "x", "width": "16", "height": "16",
                             "bbox": "nan,nan,nan,nan"})
    assert not v.ok and any("finite" in e for e in v.errors)


def test_expression_store_atomic_file(tmp_path):
    import os

    from geotrellis_server_ray.functions.params import ExpressionStore

    p = str(tmp_path / "e.jsonl")
    s = ExpressionStore(p)
    s.put("a", {"symbol": "var", "name": "x"})
    # no stray tmp files after a put
    assert os.listdir(tmp_path) == ["e.jsonl"]


# -------------------------------------------- WCS/WMTS param surface (M7/M8)


def test_getcoverage_geographic_axis_swap_and_shrink():
    """The WcsParams.scala:85-111 traps: geographic CRS swaps axes, grid
    offsets flip signs per family, extent buffers by half a (negative) cell
    -> shrink to cell centers, then swapXY."""
    from geotrellis_server_ray.functions.params import parse_getcoverage_params

    v = parse_getcoverage_params({
        "service": "wcs", "request": "getcoverage", "version": "1.1.1",
        "identifier": "dem", "boundingbox": "10,20,14,26,EPSG:4326",
        "format": "image/png", "gridoffsets": "0.5,-0.5",
    })
    assert v.ok, v.errors
    out = v.value
    assert out["geographic"] is True
    assert out["cell_size"] == (-0.5, -0.5)  # CellSize(-f, s)
    e = out["extent"]
    # pre-swap extent (10,20,14,26) shrinks 0.25/side -> (10.25,20.25,13.75,25.75),
    # then swapXY -> (ymin,xmin,ymax,xmax)
    assert (e.xmin, e.ymin, e.xmax, e.ymax) == (20.25, 10.25, 25.75, 13.75)


def test_getcoverage_projected_no_swap_expands():
    from geotrellis_server_ray.functions.params import parse_getcoverage_params

    v = parse_getcoverage_params({
        "identifier": "dem", "boundingbox": "100,200,140,260",
        "gridbasecrs": "EPSG:3857", "format": "image/geotiff",
        "gridoffsets": "0.5,-0.5",
    })
    assert v.ok, v.errors
    out = v.value
    assert out["geographic"] is False
    assert out["cell_size"] == (0.5, 0.5)  # CellSize(f, -s)
    e = out["extent"]
    assert (e.xmin, e.ymin, e.xmax, e.ymax) == (99.75, 199.75, 140.25, 260.25)
    assert out["format"] == "tif"


def test_getcoverage_gridorigin_overrides_corner():
    from geotrellis_server_ray.functions.params import parse_getcoverage_params

    v = parse_getcoverage_params({
        "identifier": "dem", "boundingbox": "0,0,10,10,EPSG:3857",
        "format": "image/png", "gridorigin": "1,9",
    })
    assert v.ok, v.errors
    e = v.value["extent"]
    # projected origin = (xmin, ymax) replacement; no offsets -> no buffer
    assert (e.xmin, e.ymin, e.xmax, e.ymax) == (1.0, 0.0, 10.0, 9.0)


def test_getcoverage_accumulates_all_errors():
    from geotrellis_server_ray.functions.params import parse_getcoverage_params

    v = parse_getcoverage_params({"boundingbox": "1,2,3", "format": "image/bmp"})
    assert not v.ok
    joined = " ".join(v.errors)
    assert "identifier" in joined
    assert "4 or 5 components" in joined
    assert "format" in joined
    assert "CRS" in joined
    assert len(v.errors) >= 4  # all reported, not just the first


def test_gettile_parse_golden_and_errors():
    from geotrellis_server_ray.functions.params import parse_gettile_params

    v = parse_gettile_params({
        "service": "wmts", "request": "gettile", "layer": "ndvi",
        "style": "default", "tilematrixset": "webmerc", "tilematrix": "12",
        "tilerow": "1205", "tilecol": "2047", "format": "image/jpeg",
    })
    assert v.ok, v.errors
    assert v.value["tilerow"] == 1205 and v.value["tilecol"] == 2047
    assert v.value["format"] == "jpg"
    bad = parse_gettile_params({"tilerow": "x", "format": "image/png"})
    assert not bad.ok and len(bad.errors) >= 5
