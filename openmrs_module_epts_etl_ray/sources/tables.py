"""Pruned Parquet table readers.

The reference reads with an explicit column list assembled per table
(``etl/model/EtlDatabaseObjectSearchParams.java:34-115``) and pushes its
extraction predicate into the WHERE clause
(``engine/AbstractEtlSearchParams.java:103-118``). The Ray Data equivalent is
column pruning + row-group predicate pushdown at ``read_parquet`` time —
never read columns a pipeline doesn't touch.
"""
from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs)
