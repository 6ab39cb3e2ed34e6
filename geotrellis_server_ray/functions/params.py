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
