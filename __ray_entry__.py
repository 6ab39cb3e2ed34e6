"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown(). See geotrellis_server_ray/ for the engine.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

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
