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
    """Flagship on /root/testdata/sf0.001: the composed curation pipeline
    — documents encoded through the engine (chunk store + lineage
    manifest), decoded as a streaming Dataset, quality-filtered,
    exact-deduped (fingerprint shuffle + partitioned semi-join), token
    counted, and packed into fixed context windows via the distributed
    prefix scan.  Oracle-checked end-to-end as queries()['curation_pipeline']."""
    from orc_ray.queries import q_curation_pipeline

    return q_curation_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from orc_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from orc_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
