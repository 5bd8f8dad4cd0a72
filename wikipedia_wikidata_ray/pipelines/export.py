"""Sorted TSV export sink (SURVEY.md §2.A6 — steps/output.sh:113-128).

The reference emits one gzipped, globally sorted, tab-delimited file with
a header row. The Ray-Data re-expression keeps the global sort
(range-partitioned shuffle) and writes one TSV part per sorted block —
lexicographic part order = global order, so ``cat part-*.tsv`` reproduces
the reference's single-file layout byte-for-byte (floats are formatted
with Python shortest-repr to match the reference's ``str(float)`` output,
functions/textio.py).
"""

from __future__ import annotations

import os

import pyarrow as pa
from ray.data import Dataset

from ..functions.textio import shortest_float_repr


def _format_row(values: list, float_cols: set[int]) -> str:
    parts = []
    for i, v in enumerate(values):
        if v is None:
            parts.append("")
        elif i in float_cols:
            parts.append(shortest_float_repr([v])[0])
        else:
            parts.append(str(v))
    return "\t".join(parts)


def export_tsv(
    ds: Dataset,
    out_dir: str,
    columns: list[str] | None = None,
    header: bool = True,
) -> str:
    """Write an (assumed pre-sorted) Dataset as ordered TSV parts.

    Part files are named by block index (zero-padded) so lexicographic
    order preserves the dataset order; the header goes into part 00000
    only (the reference emits it separately via the LIMIT-0 trick,
    steps/output.sh:116)."""
    os.makedirs(out_dir, exist_ok=True)

    first = True
    part = 0
    schema = ds.schema()
    names = columns or schema.names
    types = dict(zip(schema.names, schema.types))
    float_cols = {
        i for i, n in enumerate(names) if pa.types.is_floating(types[n])
    }

    # ordered driver-side iteration over blocks: the sink is the one place
    # order matters; blocks stream in order, memory = one block at a time
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        lines = []
        if first and header:
            lines.append("\t".join(names))
        first = False
        cols = [batch.column(n).to_pylist() for n in names]
        for row in zip(*cols):
            lines.append(_format_row(list(row), float_cols))
        with open(
            os.path.join(out_dir, f"part-{part:05d}.tsv"), "w", encoding="utf-8"
        ) as f:
            f.write("\n".join(lines))
            if lines:
                f.write("\n")
        part += 1
    return out_dir


def read_tsv_concat(out_dir: str) -> str:
    """All parts concatenated in order (test/driver helper)."""
    chunks = []
    for f in sorted(os.listdir(out_dir)):
        if f.startswith("part-") and f.endswith(".tsv"):
            with open(os.path.join(out_dir, f), encoding="utf-8") as fh:
                chunks.append(fh.read())
    return "".join(chunks)


def export_wikimedia_importance(sf_dir: str, out_dir: str) -> str:
    """The reference's final artifact (README.md:52-71): sorted
    ``language, type, title, importance`` TSV over the derived corpus."""
    from .wikimedia import q_page_importance_export

    ds = q_page_importance_export(sf_dir).select_columns(
        ["language", "type", "title", "importance"]
    )
    return export_tsv(ds, out_dir)


def export_wikidump_importance(dump_dir: str, out_dir: str) -> str:
    """The complete reference artifact from raw dumps: dump tree in,
    sorted ``language/type/title/importance/wikidata_id`` TSV out
    (steps/output.sh:113-128 analog over pipelines/wikidump.py)."""
    from .wikidump import wikimedia_importance_from_dumps

    ds = wikimedia_importance_from_dumps(dump_dir).select_columns(
        ["language", "type", "title", "importance", "wikidata_id"]
    )
    return export_tsv(ds, out_dir)
