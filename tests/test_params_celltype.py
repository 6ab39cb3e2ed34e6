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
