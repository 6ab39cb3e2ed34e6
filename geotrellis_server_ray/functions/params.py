"""OGC request-parameter parsing with accumulated validation (M8) and the
expression registry (§2.11 MamlStore).

The reference parses query params into Validated values that ACCUMULATE all
errors instead of stopping at the first (ParamMap.scala:27-80,
WmsParams.apply :247-259 — ValidatedNel semantics); and persists MAML
expressions by key (example/.../persistence/MamlStore.scala:23-35)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class Validated:
    """ValidatedNel-style result: either a value or ALL the errors."""

    value: object | None = None
    errors: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors


def parse_getmap_params(params: dict[str, str]) -> Validated:
    """Parse/validate a GetMap-shaped request; every problem is reported, not
    just the first (the reference's accumulating ParamMap)."""
    errors: list[str] = []
    out: dict = {}

    layer = params.get("layers")
    if not layer:
        errors.append("missing required parameter: layers")
    else:
        out["layer"] = layer

    for name in ("width", "height"):
        raw = params.get(name)
        if raw is None:
            errors.append(f"missing required parameter: {name}")
            continue
        try:
            v = int(raw)
            if v <= 0 or v > 8192:
                errors.append(f"{name} out of range (1..8192): {v}")
            else:
                out[name] = v
        except ValueError:
            errors.append(f"{name} is not an integer: {raw!r}")

    bbox = params.get("bbox")
    if bbox is None:
        errors.append("missing required parameter: bbox")
    else:
        parts = bbox.split(",")
        if len(parts) != 4:
            errors.append(f"bbox must have 4 components: {bbox!r}")
        else:
            try:
                import math

                x0, y0, x1, y1 = (float(p) for p in parts)
                if not all(math.isfinite(c) for c in (x0, y0, x1, y1)):
                    errors.append(f"bbox components must be finite: {bbox!r}")
                elif x0 >= x1 or y0 >= y1:
                    errors.append(f"bbox min must be < max: {bbox!r}")
                else:
                    out["bbox"] = (x0, y0, x1, y1)
            except ValueError:
                errors.append(f"bbox components must be numeric: {bbox!r}")

    fmt = params.get("format", "image/png")
    if fmt not in ("image/png", "image/jpeg"):
        errors.append(f"unsupported format: {fmt}")
    else:
        out["format"] = fmt

    if params.get("time"):
        from .ogctime import from_string

        try:
            out["time"] = from_string(params["time"])
        except Exception:
            errors.append(f"unparseable time: {params['time']!r}")

    return Validated(value=out if not errors else None, errors=errors)


_GEOGRAPHIC_CRS = {"epsg:4326", "urn:ogc:def:crs:epsg::4326", "crs:84",
                   "urn:ogc:def:crs:ogc:1.3:crs84"}
_KNOWN_CRS = _GEOGRAPHIC_CRS | {"epsg:3857", "urn:ogc:def:crs:epsg::3857"}

_WCS_VERSIONS = {"1.1.0", "1.1.1"}
_OUTPUT_FORMATS = {"image/png": "png", "image/jpeg": "jpg",
                   "image/tiff": "tif", "image/geotiff": "tif",
                   "image/geotif": "tif", "geotiff": "tif", "geotif": "tif"}


def _is_geographic(crs: str) -> bool:
    return crs.lower() in _GEOGRAPHIC_CRS


def parse_getcoverage_params(params: dict[str, str]) -> Validated:
    """WCS 1.1 GetCoverage parse + extent/grid math, accumulating ALL errors
    (GetCoverageWcsParams.build, WcsParams.scala:169-260). Replays the three
    reference traps exactly (WcsParams.scala:85-113):

      * ``changeXY``: geographic CRS swaps axis order — the incoming bbox is
        (lat, lon) ordered, GridOrigin is (ymax, xmin)-ish, and the final
        extent is ``.swapXY``-ed back to (x, y)
      * GridOffsets signs are FLIPPED per axis family: geographic cellSize =
        (-f, s); projected cellSize = (f, -s)
      * the extent is buffered by a HALF CELL per side with the (possibly
        negative) cell size before the swap

    Returns {'identifier', 'crs', 'geographic', 'cell_size', 'extent',
    'format', 'time'} on success."""
    from .geometry import Extent

    errors: list[str] = []
    out: dict = {}

    if params.get("service", "wcs").lower() != "wcs":
        errors.append(f"service must be wcs: {params.get('service')!r}")
    if params.get("request", "getcoverage").lower() != "getcoverage":
        errors.append(f"request must be getcoverage: {params.get('request')!r}")
    version = params.get("version", "1.1.1")
    if version not in _WCS_VERSIONS:
        errors.append(f"unsupported WCS version: {version!r}")
    out["version"] = version

    ident = params.get("identifier")
    if not ident:
        errors.append("missing required parameter: identifier")
    else:
        out["identifier"] = ident

    bbox_vals = None
    crs = None
    raw_bbox = params.get("boundingbox")
    if raw_bbox is None:
        errors.append("missing required parameter: boundingbox")
    else:
        parts = raw_bbox.split(",")
        if len(parts) not in (4, 5):
            errors.append(f"boundingbox must have 4 or 5 components: {raw_bbox!r}")
        else:
            try:
                bbox_vals = [float(p) for p in parts[:4]]
            except ValueError:
                errors.append(f"boundingbox components must be numeric: {raw_bbox!r}")
            if len(parts) == 5:
                crs = parts[4]
    if crs is None:
        crs = params.get("gridbasecrs")
    if crs is None:
        # the reference's MissingParam("BoundingBox CRS") path
        errors.append("missing BoundingBox CRS (no 5th bbox element and no gridbasecrs)")
    elif crs.lower() not in _KNOWN_CRS:
        errors.append(f"unknown CRS: {crs!r}")
    else:
        out["crs"] = crs
        out["geographic"] = _is_geographic(crs)

    fmt = params.get("format")
    if fmt is None:
        errors.append("missing required parameter: format")
    elif fmt.lower() not in _OUTPUT_FORMATS:
        errors.append(f"unsupported format: {fmt!r}")
    else:
        out["format"] = _OUTPUT_FORMATS[fmt.lower()]

    def parse_pair(name):
        raw = params.get(name)
        if raw is None:
            return None
        ps = raw.replace(" ", ",").split(",")
        ps = [p for p in ps if p]
        if len(ps) != 2:
            errors.append(f"{name} must have 2 components: {raw!r}")
            return None
        try:
            return float(ps[0]), float(ps[1])
        except ValueError:
            errors.append(f"{name} components must be numeric: {raw!r}")
            return None

    grid_origin = parse_pair("gridorigin")
    grid_offsets = parse_pair("gridoffsets")

    if params.get("timesequence"):
        from .ogctime import from_string

        try:
            out["time"] = from_string(params["timesequence"])
        except Exception:
            errors.append(f"unparseable timesequence: {params['timesequence']!r}")

    if errors:
        return Validated(errors=errors)

    x0, y0, x1, y1 = bbox_vals
    geographic = out["geographic"]
    # sign-flipped GridOffsets (WcsParams.scala:88-90)
    cell = None
    if grid_offsets is not None:
        f, s = grid_offsets
        cell = (-f, s) if geographic else (f, -s)
    out["cell_size"] = cell

    # extent assembly + half-cell buffer + axis swap (WcsParams.scala:92-111)
    if geographic:
        gxmax, gymin = grid_origin if grid_origin is not None else (x1, y0)
        ext = Extent(x0, gymin, gxmax, y1)
        if cell is not None:
            ext = Extent(ext.xmin - cell[0] / 2.0, ext.ymin - cell[1] / 2.0,
                         ext.xmax + cell[0] / 2.0, ext.ymax + cell[1] / 2.0)
        ext = ext.swap_axes()
    else:
        gxmin, gymax = grid_origin if grid_origin is not None else (x0, y1)
        ext = Extent(gxmin, y0, x1, gymax)
        if cell is not None:
            ext = Extent(ext.xmin - cell[0] / 2.0, ext.ymin - cell[1] / 2.0,
                         ext.xmax + cell[0] / 2.0, ext.ymax + cell[1] / 2.0)
    out["extent"] = ext
    return Validated(value=out)


def parse_gettile_params(params: dict[str, str]) -> Validated:
    """WMTS GetTile parse (WmtsParams.scala:63-95): layer, style,
    tilematrixset, tilematrix, integer tilerow/tilecol, validated format —
    all errors accumulated."""
    errors: list[str] = []
    out: dict = {}

    if params.get("service", "wmts").lower() != "wmts":
        errors.append(f"service must be wmts: {params.get('service')!r}")
    req = params.get("request", "gettile").lower()
    if req not in ("gettile", "getcapabilities"):
        errors.append(f"unknown request: {req!r}")

    for name in ("layer", "style", "tilematrixset", "tilematrix"):
        v = params.get(name)
        if v is None:
            errors.append(f"missing required parameter: {name}")
        else:
            out[name] = v

    for name in ("tilerow", "tilecol"):
        raw = params.get(name)
        if raw is None:
            errors.append(f"missing required parameter: {name}")
            continue
        try:
            out[name] = int(raw)
        except ValueError:
            errors.append(f"{name} is not an integer: {raw!r}")

    fmt = params.get("format")
    if fmt is None:
        errors.append("missing required parameter: format")
    elif fmt.lower() not in _OUTPUT_FORMATS:
        errors.append(f"unsupported format: {fmt!r}")
    else:
        out["format"] = _OUTPUT_FORMATS[fmt.lower()]

    return Validated(value=out if not errors else None, errors=errors)


class ExpressionStore:
    """MamlStore analog: persist map-algebra expression ASTs by key in a
    JSON-lines file (the 'expression registry table'). putMaml/getMaml
    semantics: put overwrites, get returns None for unknown keys."""

    def __init__(self, path: str):
        self.path = path

    def put(self, key: str, expr: dict) -> None:
        import os

        rows = self._load()
        rows[key] = expr
        # atomic replace: a crash mid-write must not truncate the registry
        tmp = f"{self.path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            for k in sorted(rows):
                f.write(json.dumps({"key": k, "expr": rows[k]}, sort_keys=True) + "\n")
        os.replace(tmp, self.path)

    def get(self, key: str) -> dict | None:
        return self._load().get(key)

    def _load(self) -> dict:
        try:
            with open(self.path) as f:
                return {r["key"]: r["expr"] for r in map(json.loads, f) if r}
        except FileNotFoundError:
            return {}


# ----------------------------------------------- ParamError message catalog
# The reference's exact user-facing validation messages
# (params/ParamError.scala:24-70). The engine's parse_* functions accumulate
# their own internal diagnostics; these builders produce the WIRE strings a
# serving front end reports back (WmsView.scala:136-137 joins them with
# generate_error_message and returns the result as a 400 body).


def invalid_value(field: str, value: str, valid_values: list[str]) -> str:
    return (f"Parameter '{field}' has an invalid value of '{value}'. "
            f"Needs to be one of: {','.join(valid_values)}")


def missing_param(field: str) -> str:
    return f"Missing parameter '{field}'"


def missing_multi_param(fields: list[str]) -> str:
    fs = ",".join(f"'{f}'" for f in fields)
    return f"Parameters must include one of [{fs}], but none found."


def repeated_param(field: str) -> str:
    return f"More than one instance of parameter '{field}'"


def parse_error(field: str, value: str) -> str:
    return f"Cannot parse value '{value}' for parameter '{field}'"


def crs_parse_error(crs_desc: str) -> str:
    return f"Cannot parse CRS from '{crs_desc}'"


def unsupported_format_error(fmt: str) -> str:
    return f"Unsupported format: '{fmt}'"


def no_supported_version_error(requested: list[str], supported: list[str]) -> str:
    return (f"No available version in {', '.join(supported)}: "
            f"{', '.join(requested)}")


def generate_error_message(errors: list[str]) -> str:
    """ParamError.generateErrorMessage (ParamError.scala:68-70)."""
    return "; ".join(errors)
