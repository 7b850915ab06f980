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


# aim for blocks of ~1 MiB compressed: small dimension tables stay ONE
# block (Ray's default splits a single small file into num_cpus*2 micro
# blocks, and every downstream stage then pays 64x task overhead — measured
# 2.7s wall just to read a 15k-row table). Operators that are CPU-heavy per
# row (MinHash, SimHash, language id) pass an explicit ``override_num_blocks``
# instead — compressed bytes are a proxy for scan cost, not compute cost.
TARGET_BLOCK_BYTES = 1024 * 1024
MAX_BLOCKS = 64


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if "override_num_blocks" not in kwargs:
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        kwargs["override_num_blocks"] = max(1, min(MAX_BLOCKS, size // TARGET_BLOCK_BYTES))
    return rd.read_parquet(path, columns=columns, **kwargs)
