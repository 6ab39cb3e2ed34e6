"""CellType lattice + metadata reduces (A5-A7, O2, M4 support).

The reference unions cell types across mosaic members
(MosaicRasterSourceF.cellType, effects/.../MosaicRasterSourceF.scala:62-65 —
geotrellis' cellType union picks the smallest type containing both), collects
distinct resolutions (OgcSource.scala:286), takes the min band count across
map-algebra sources (OgcSource.scala:284), and sorts zoom levels descending
(GTLayerNode.scala:40-45). These are driver-side metadata folds.

Cell types use the geotrellis naming convention: "int8", "uint16",
"float32", ... with NoData variants "int32ud42" (user-defined) and
"int32raw" (no NoData); unioning any user-defined-NoData type with a plain
one keeps a NoData-capable result (NoDataHandlingTest semantics)."""

from __future__ import annotations

import re

_ORDER = ["int8", "uint8", "int16", "uint16", "int32", "uint32", "int64", "uint64", "float32", "float64"]
_RE = re.compile(r"^(u?int(?:8|16|32|64)|float(?:32|64))(raw|ud(-?[0-9.]+))?$")


def parse_cell_type(s: str) -> tuple[str, str | None, float | None]:
    """-> (base, nodata_kind, nodata_value); kind in {None='const', 'raw',
    'ud'} (geotrellis: constant default NoData unless raw/ud)."""
    m = _RE.match(s)
    if not m:
        raise ValueError(f"unknown cell type: {s}")
    base = m.group(1)
    if m.group(2) is None:
        return base, None, None
    if m.group(2) == "raw":
        return base, "raw", None
    return base, "ud", float(m.group(3))


def _width(t: str) -> int:
    return int(re.sub(r"\D", "", t))


def _widen(a: str, b: str) -> str:
    """Smallest type containing both value ranges."""
    if a == b:
        return a
    ia, ib = _ORDER.index(a), _ORDER.index(b)
    hi = _ORDER[max(ia, ib)]
    if hi.startswith("float"):
        return hi
    a_un, b_un = a.startswith("uint"), b.startswith("uint")
    if a_un == b_un:
        return hi
    # mixed signedness: escalate only when the UNSIGNED member's width is >=
    # the signed member's width (a wider signed type already contains the
    # narrower unsigned range — int32 contains uint8)
    un, sg = (a, b) if a_un else (b, a)
    if _width(un) < _width(sg):
        return sg
    need = max(_width(un), _width(sg)) * 2
    for cand in _ORDER:
        if cand.startswith("int") and not cand.startswith("uint") and _width(cand) >= need:
            return cand
    return "float64"  # int64+uint64 has no containing integer type


def union_cell_types(types: list[str]) -> str:
    """A5: smallest type containing all members; any NoData-capable member
    makes the result NoData-capable (ud values that differ degrade to the
    constant-default NoData variant)."""
    assert types
    base = None
    kinds = set()
    ud_vals = set()
    for t in types:
        b, kind, val = parse_cell_type(t)
        base = b if base is None else _widen(base, b)
        kinds.add(kind)
        if kind == "ud":
            ud_vals.add(val)
    if kinds == {"raw"}:
        return base + "raw"
    if kinds == {"ud"} and len(ud_vals) == 1:
        v = next(iter(ud_vals))
        return f"{base}ud{int(v) if float(v).is_integer() else v}"
    return base  # constant-default NoData


def distinct_resolutions(cell_sizes: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """A6: distinct resolutions, finest first (OgcSource.scala:286)."""
    return sorted(set(cell_sizes), key=lambda cs: cs[0] * cs[1])


def min_band_count(band_counts: list[int]) -> int:
    """A7: min bandCount across map-algebra sources (OgcSource.scala:284)."""
    return min(band_counts)


def zooms_desc(zooms: list[int]) -> list[int]:
    """O2: zoom levels sorted descending — max zoom (finest) first
    (GTLayerNode.scala:40-45)."""
    return sorted(set(zooms), reverse=True)
