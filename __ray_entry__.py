"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementation lives in ``job_crawler_ray.pipelines.registry``; nothing
in the library calls ``ray.init()`` / ``ray.shutdown()`` — the driver
(or bench.py / the pytest fixture) owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship crawl pipeline on /root/testdata/sf0.001."""
    from job_crawler_ray.pipelines.registry import run_entry

    return run_entry()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from job_crawler_ray.pipelines.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for the oracle-checked queries; crawl/sketch/
    multimodal pipelines are intentionally absent (rows-only check —
    they are verified against a sequential oracle in tests/ instead)."""
    from job_crawler_ray.pipelines.registry import build_oracle_sql

    return build_oracle_sql()
