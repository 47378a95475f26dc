"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose each implemented operator
(SURVEY §2 + training-data ops) with DuckDB oracles where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize Common-Crawl
    style pages from documents, parse every log line, enrich+route, and
    return the merged (template, route) counts."""
    from log2seq_ray.pipelines import flagship
    return flagship.run("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from log2seq_ray.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from log2seq_ray.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
