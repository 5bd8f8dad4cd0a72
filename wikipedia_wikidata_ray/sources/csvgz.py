"""Gzipped-CSV source — the reference's intermediate format
(SURVEY.md §2: the "converted layer" of gz CSV files per (language,
table), steps/wikipedia_sql2csv.sh:42-130).

Thin wrapper over ``ray.data.read_csv`` with the reference's dialect
pinned: explicit positional schema (CSV columns are positional and
trusted, steps/wikipedia_import.sh:36-39 — no header), gz
auto-decompressed by Arrow via file extension inference.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from pyarrow import csv as pacsv
from ray.data import Dataset


def read_csv_gz(
    paths: str | list[str],
    column_names: list[str],
    column_types: dict[str, pa.DataType] | None = None,
) -> Dataset:
    """Headerless positional CSV(.gz) → Dataset with a declared schema."""
    convert = pacsv.ConvertOptions(column_types=column_types or {})
    read = pacsv.ReadOptions(column_names=column_names)
    return rd.read_csv(
        paths,
        read_options=read,
        convert_options=convert,
        file_extensions=["csv", "gz"],
    )
