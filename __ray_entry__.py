"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship CDC replay pipeline on sf0.001.
- ``queries()``     — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()``  — DuckDB-equivalent SQL for the strongly-checked entries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).parent))

from openmrs_module_epts_etl_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: deterministic CDC event
    log → hash-partitioned LSN-ordered LWW replay through the MergeApplier
    actor pool into a commit-logged Parquet lake → final table state."""
    return QUERIES["cdc_replay_lww"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
