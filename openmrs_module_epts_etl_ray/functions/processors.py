"""Built-in GENERIC_PROCESS processors (problems-solvers).

The reference's GENERIC_PROCESS type (``conf/types/EtlProcessType.java:17``)
exists solely to run a custom ``GenericProcessor`` subclass per operation
(compatibility validated at ``conf/EtlOperationConfig.java:613-618``); its
canonical use in the reference tree is the data-problems solver. This module
holds package-shipped processors referenced from configs as
``"openmrs_module_epts_etl_ray.functions.processors:<name>"`` — importable
from any worker regardless of cwd, unlike repo-local ``examples.processors``.

Contract (see ``pipelines/config.py::_run_item``): a processor receives
``(extract Dataset, dstConf dict)`` and returns the Dataset the runner
writes; extraction (column pruning, extraConditionForExtract, datasources)
and the sink stay with the runner.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def solve_negative_balance(ds: rd.Dataset, dst: dict) -> rd.Dataset:
    """Problems-solver: classify each customer's account-balance problem
    and emit the repaired value (clamp negatives to zero). Pure vectorized
    Arrow kernels; the repaired value is a CASE copy (no float arithmetic),
    so the output is bit-identical to any SQL engine's."""
    def fn(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"]
        neg = pc.less(bal, 0.0)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "problem": pc.if_else(neg, "negative_balance", "ok"),
            "repaired_acctbal": pc.if_else(neg, pa.scalar(0.0), bal),
        })
    return ds.map_batches(fn, batch_format="pyarrow")
