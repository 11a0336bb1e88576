"""Typed CSV source/sink (SURVEY.md S1/S5; VERDICT missing #2).

The reference ingests typed CSVs (``read.csv``,
``Supplemental_Data_1.R:112-116``: region boundaries, training points,
feature lookup) and exports ten result CSVs (``write.csv``,
``Supplemental_Data_1.R:354-550``).  This module is the Ray-Data-native
equivalent: schema-DECLARED reads (no type inference drift between runs —
a float column stays float even in an all-integer shard) and a partitioned
CSV sink.

Scale notes: ``ray.data.read_csv`` streams each file as blocks through
pyarrow's csv reader, so reads parallelize per file; declared
``column_types`` avoid the sampling-based inference that can produce
different schemas per block at scale.  The sink writes one part file per
block into a directory — resumable layout, never one giant file.
"""

from __future__ import annotations

import pyarrow as pa
from pyarrow import csv as pacsv
from ray.data import Dataset

__all__ = ["read_csv_typed", "write_csv_dir"]


def read_csv_typed(
    paths: "str | list[str]",
    schema: "dict[str, pa.DataType] | pa.Schema",
    timestamp_formats: "list[str] | None" = None,
    **read_csv_kwargs,
) -> Dataset:
    """Read CSV file(s)/director(ies) with a DECLARED column->type mapping.

    ``schema`` maps column names to arrow types (or a full ``pa.Schema``);
    unlisted columns fall back to inference.  Timestamp columns parse ISO
    8601 by default; pass ``timestamp_formats`` for other layouts.
    """
    import ray.data as rd

    if isinstance(schema, pa.Schema):
        column_types = {f.name: f.type for f in schema}
    else:
        column_types = dict(schema)
    convert = pacsv.ConvertOptions(
        column_types=column_types,
        timestamp_parsers=(timestamp_formats if timestamp_formats
                           else [pacsv.ISO8601]),
    )
    return rd.read_csv(paths, convert_options=convert, **read_csv_kwargs)


def write_csv_dir(ds: Dataset, path: str) -> None:
    """CSV sink: one part file per block under ``path`` (the engine's
    ``write.csv`` for parity goldens and reference-style exports)."""
    ds.write_csv(path)
