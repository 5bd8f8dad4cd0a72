"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extract→encode→PIP→tile pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose each implemented operator
with its DuckDB oracle (see wikipedia_wikidata_ray/pipelines/queries.py for
the derivation contract that makes the spatial pipeline SQL-checkable).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from wikipedia_wikidata_ray.pipelines.geopipeline import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from wikipedia_wikidata_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from wikipedia_wikidata_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
