"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown(). See geotrellis_server_ray/ for the engine.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the engine package lives next to this file; make the import robust to the
# driver's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

# Ray workers inherit their sys.path from the session the DRIVER started —
# if the driver initialized Ray from some other cwd, workers cannot import
# this package by reference. Registering the package for pickle-by-value
# ships the function bodies inside the task payloads instead, making the
# contract cwd-independent (verified: entry() runs with driver cwd=/tmp).
try:
    import geotrellis_server_ray as _pkg
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(_pkg)
except Exception:  # pragma: no cover - registration is best-effort
    pass

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline (tile assignment + PIP join, SURVEY.md §3.2 reversed)
    on the smoke tier: corpus -> explode -> geo parse -> (zoom,x,y)+cell keys
    -> broadcast PIP join vs vector layers. Returns the streaming Dataset of
    join rows."""
    from geotrellis_server_ray.pipelines.geo import flagship

    return flagship(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (see
    geotrellis_server_ray/pipelines/registry.py for each mapping)."""
    from geotrellis_server_ray.pipelines.registry import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys match queries(). Column names and integer
    scalings match the Ray outputs exactly."""
    from geotrellis_server_ray.pipelines.registry import oracle_sql as _o

    return _o()
