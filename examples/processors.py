"""Example custom processors for the ``processor`` config key — the
analogue of the reference's ``processorFullClassName``
(``conf/EtlOperationConfig.java:65-67``: a class loaded by name replaces
the operation's stock engine, ``etl/controller/EtlController.java:41-61``).

A processor receives ``(extract Dataset, dstConf dict)`` and returns the
Dataset the runner writes to the destination sink. Reference from a config
as ``"examples.processors:mask_names"`` (run from the repo root)."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def mask_names(ds: rd.Dataset, dst: dict) -> rd.Dataset:
    """Pseudonymize every *_name column: keep the first word, hash-mask the
    rest (a privacy-preserving extract the stock FieldsMapping vocabulary
    cannot express)."""
    def fn(t: pa.Table) -> pa.Table:
        for i, name in enumerate(t.column_names):
            if name.endswith("_name"):
                first = pc.list_element(
                    pc.split_pattern(t[name], " ", max_splits=1), 0)
                t = t.set_column(i, name, pc.binary_join_element_wise(
                    first, "****", " "))
        return t
    return ds.map_batches(fn, batch_format="pyarrow")
