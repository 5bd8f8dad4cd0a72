"""Size/row report over engine outputs (SURVEY.md §2.A7 — the analog of
steps/report_database_size.sh's pg_class introspection): walks a directory
tree, reporting rows/bytes per parquet dataset and lineage totals from any
checkpoint manifests.

Usage: python tools/report_sizes.py <dir> [dir ...]
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq


def report(root: str) -> list[dict]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        pq_files = [f for f in filenames if f.endswith(".parquet")]
        if pq_files:
            rows = bytes_ = 0
            for f in pq_files:
                p = os.path.join(dirpath, f)
                try:
                    rows += pq.read_metadata(p).num_rows
                except Exception:
                    continue
                bytes_ += os.path.getsize(p)
            entry = {
                "path": dirpath,
                "files": len(pq_files),
                "rows": rows,
                "bytes": bytes_,
            }
            if "_MANIFEST.json" in filenames:
                with open(os.path.join(dirpath, "_MANIFEST.json")) as fh:
                    m = json.load(fh)
                entry["pipeline"] = m.get("pipeline")
                entry["manifest_rows"] = m.get("rows")
            out.append(entry)
    return out


if __name__ == "__main__":
    for root in sys.argv[1:] or ["."]:
        for e in report(root):
            print(json.dumps(e))
