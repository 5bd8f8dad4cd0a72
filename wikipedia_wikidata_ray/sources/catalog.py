"""Input catalog & completeness validation (SURVEY.md §2.A1/A2).

The reference's control plane accepts a dump date only when every required
file exists non-empty on the mirror (steps/latest_available_data.sh:54-91).
The Parquet analog: list a directory's partition files, verify each has a
readable footer and non-zero rows, and return a manifest the pipeline (and
the checkpoint layer) can fingerprint. Corrupt/empty inputs fail HERE, at
admission — not 40 stages deep inside a shuffle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow.parquet as pq


@dataclass(frozen=True)
class InputFile:
    path: str
    bytes: int
    rows: int


class IncompleteInputError(RuntimeError):
    pass


def catalog_parquet_dir(
    path: str,
    require_files: int | None = None,
    expect_schema_names: list[str] | None = None,
) -> list[InputFile]:
    """Validated listing of a Parquet dataset directory (or single file).

    Raises ``IncompleteInputError`` on: missing dir, no parquet files,
    fewer files than ``require_files``, an unreadable footer, an empty
    file, or a schema missing ``expect_schema_names`` columns.
    """
    if os.path.isfile(path):
        files = [path]
    elif os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    else:
        raise IncompleteInputError(f"input path does not exist: {path}")
    if not files:
        raise IncompleteInputError(f"no parquet files under: {path}")
    if require_files is not None and len(files) < require_files:
        raise IncompleteInputError(
            f"expected >= {require_files} files under {path}, found {len(files)}"
        )
    out: list[InputFile] = []
    for f in files:
        try:
            md = pq.read_metadata(f)
        except Exception as e:  # unreadable footer = partial upload
            raise IncompleteInputError(f"unreadable parquet footer: {f}: {e}") from e
        if md.num_rows == 0:
            raise IncompleteInputError(f"empty parquet file: {f}")
        if expect_schema_names:
            names = set(pq.read_schema(f).names)
            missing = [c for c in expect_schema_names if c not in names]
            if missing:
                raise IncompleteInputError(
                    f"{f} missing expected columns: {missing}"
                )
        out.append(InputFile(f, os.path.getsize(f), md.num_rows))
    return out
