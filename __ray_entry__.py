"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB.  No ray.init()/shutdown() here — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: encode the documents
    table through the engine (chunk store + lineage manifest), decode it
    back as a streaming Dataset, and return the decoded rows."""
    from orc_ray.queries import q_roundtrip_documents

    return q_roundtrip_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from orc_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from orc_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
