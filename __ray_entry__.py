"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship linkage pipeline on transcripts derived
deterministically from /root/testdata/sf0.001 documents; ``queries()`` /
``oracle_sql()`` expose one entry per implemented operator family
(SURVEY.md §2 + the training-data-pipeline suite) with DuckDB oracles for
every SQL-expressible op. Ray is initialised by the driver BEFORE import —
nothing here calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from capelinker_ray.pipelines.queries import q_flagship_entities
    return q_flagship_entities("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from capelinker_ray.pipelines.queries import build_queries, ensure_transcripts
    # pre-derive the oracle-scale transcript table so oracle_sql()'s
    # read_parquet always finds it regardless of call order
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        try:
            ensure_transcripts(sf)
        except Exception:
            pass
    return build_queries()


def oracle_sql() -> dict[str, str]:
    from capelinker_ray.pipelines.queries import build_oracle_sql
    return build_oracle_sql()
