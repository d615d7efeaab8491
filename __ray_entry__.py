"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use (see data_harvesting_ray/).

- ``entry()``: flagship pipeline on /root/testdata/sf0.001 — the full
  transcript flow (normalize → dedup → session windows) over the
  deterministic fixture derived from the sf dir.
- ``queries()``: one entry per implemented operator (SURVEY.md §2).
- ``oracle_sql()``: DuckDB-equivalent SQL for each SQL-expressible
  query, same column names as the Ray result.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: the full streaming engine (epoch micro-batches,
    watermarks, stateful shards, exactly-once sink) over the sf0.001
    transcript fixture; returns the committed session windows."""
    from data_harvesting_ray.pipelines.queries import q_t_streaming_sessions

    return q_t_streaming_sessions("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from data_harvesting_ray.pipelines.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from data_harvesting_ray.pipelines.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
