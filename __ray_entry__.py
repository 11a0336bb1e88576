"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline on sf0.001; ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2 (plus the training-data
operators: dedup, similarity search, text analytics, multimodal plumbing);
``oracle_sql()`` gives the DuckDB-equivalent SQL where one exists (ops built
on RNG/LSH/PIP/trees are rows-only by design — see
``drivers_of_global_deforestation_ray/pipelines/queries.py`` docstrings).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from drivers_of_global_deforestation_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return QUERIES["flagship"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
