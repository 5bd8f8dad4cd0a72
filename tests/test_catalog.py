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


def _mk_snapshot(root, date, tables, empty=(), missing=()):
    snap = root / date
    snap.mkdir()
    for t in tables:
        if t in missing:
            continue
        rows = pa.table({"a": []}) if t in empty else pa.table({"a": [1, 2]})
        pq.write_table(rows, snap / f"{t}.parquet")
    return snap


def test_select_latest_complete_picks_newest(tmp_path):
    from wikipedia_wikidata_ray.sources.catalog import select_latest_complete

    _mk_snapshot(tmp_path, "20240101", ["page", "geo"])
    _mk_snapshot(tmp_path, "20240201", ["page", "geo"])
    snap, manifests = select_latest_complete(str(tmp_path), ["page", "geo"])
    assert snap.endswith("20240201")
    assert manifests["page"][0].rows == 2


def test_select_latest_complete_falls_back_when_newest_incomplete(tmp_path):
    """The reference's A1 semantics: newest date with a missing or empty
    required file is rejected; the next-older complete date wins
    (latest_available_data.sh:136-142)."""
    from wikipedia_wikidata_ray.sources.catalog import select_latest_complete

    _mk_snapshot(tmp_path, "20240101", ["page", "geo"])
    _mk_snapshot(tmp_path, "20240301", ["page", "geo"], missing=["geo"])
    _mk_snapshot(tmp_path, "20240201", ["page", "geo"], empty=["page"])
    snap, _ = select_latest_complete(str(tmp_path), ["page", "geo"])
    assert snap.endswith("20240101")


def test_select_latest_complete_no_candidate_raises(tmp_path):
    from wikipedia_wikidata_ray.sources.catalog import select_latest_complete

    _mk_snapshot(tmp_path, "20240101", ["page"], missing=["page"])
    with pytest.raises(IncompleteInputError, match="no complete snapshot"):
        select_latest_complete(str(tmp_path), ["page"])
    with pytest.raises(IncompleteInputError, match="no YYYYMMDD"):
        select_latest_complete(str(tmp_path / "20240101"), ["page"])
