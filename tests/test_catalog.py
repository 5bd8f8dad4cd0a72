"""A1/A2 input-admission checks."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikipedia_wikidata_ray.sources.catalog import (
    IncompleteInputError,
    catalog_parquet_dir,
)


def test_catalog_happy(tmp_path):
    for i in range(3):
        pq.write_table(pa.table({"a": [i]}), tmp_path / f"p{i}.parquet")
    files = catalog_parquet_dir(str(tmp_path), require_files=3, expect_schema_names=["a"])
    assert [f.rows for f in files] == [1, 1, 1]


def test_catalog_missing_dir():
    with pytest.raises(IncompleteInputError, match="does not exist"):
        catalog_parquet_dir("/nonexistent/path")


def test_catalog_empty_file(tmp_path):
    pq.write_table(pa.table({"a": pa.array([], type=pa.int64())}), tmp_path / "e.parquet")
    with pytest.raises(IncompleteInputError, match="empty parquet"):
        catalog_parquet_dir(str(tmp_path))


def test_catalog_truncated_footer(tmp_path):
    pq.write_table(pa.table({"a": [1]}), tmp_path / "ok.parquet")
    (tmp_path / "bad.parquet").write_bytes(b"PAR1garbage")
    with pytest.raises(IncompleteInputError, match="unreadable"):
        catalog_parquet_dir(str(tmp_path))


def test_catalog_schema_mismatch(tmp_path):
    pq.write_table(pa.table({"a": [1]}), tmp_path / "p.parquet")
    with pytest.raises(IncompleteInputError, match="missing expected columns"):
        catalog_parquet_dir(str(tmp_path), expect_schema_names=["a", "url"])


def test_catalog_too_few(tmp_path):
    pq.write_table(pa.table({"a": [1]}), tmp_path / "p.parquet")
    with pytest.raises(IncompleteInputError, match="expected >= 2"):
        catalog_parquet_dir(str(tmp_path), require_files=2)
