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


def _render_block(
    batch: pa.Table,
    path: str,
    names: list[str],
    float_cols: set[int],
    header: bool,
    compress: bool,
) -> None:
    import gzip

    lines = []
    if header:
        lines.append("\t".join(names))
    cols = [batch.column(n).to_pylist() for n in names]
    for row in zip(*cols):
        lines.append(_format_row(list(row), float_cols))
    body = "\n".join(lines) + ("\n" if lines else "")
    if compress:
        # mtime=0 → deterministic bytes (the reference pins pigz output
        # only by content; determinism helps our byte-identity tests)
        with gzip.GzipFile(path, "wb", compresslevel=9, mtime=0) as f:
            f.write(body.encode("utf-8"))
    else:
        with open(path, "w", encoding="utf-8") as f:
            f.write(body)


def export_tsv(
    ds: Dataset,
    out_dir: str,
    columns: list[str] | None = None,
    header: bool = True,
    compress: bool = False,
) -> str:
    """Write an (assumed pre-sorted) Dataset as ordered TSV parts, one
    ray task per block IN PARALLEL (the round-1 sink was a single-thread
    driver loop — wrong as a general sink at 100 TB).

    Part files are named by block index (zero-padded) so lexicographic
    order preserves the dataset order — order is already established by
    the upstream range-partitioned sort, so parallel part writes are
    safe. The header goes into part 00000 only (the reference emits it
    separately via the LIMIT-0 trick, steps/output.sh:116).
    ``compress=True`` gzips each part (reference: one ``pigz -9`` file,
    steps/output.sh:126-128; ``zcat part-*.tsv.gz`` = the same bytes)."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    schema = ds.schema()
    names = columns or schema.names
    types = dict(zip(schema.names, schema.types))
    float_cols = {
        i for i, n in enumerate(names) if pa.types.is_floating(types[n])
    }
    ext = ".tsv.gz" if compress else ".tsv"

    write_task = ray.remote(num_cpus=1)(_render_block)
    pending = [
        write_task.remote(
            blk,
            os.path.join(out_dir, f"part-{i:05d}{ext}"),
            names,
            float_cols,
            header and i == 0,
            compress,
        )
        for i, blk in enumerate(ds.to_arrow_refs())
    ]
    ray.get(pending)
    return out_dir


def read_tsv_concat(out_dir: str) -> str:
    """All parts concatenated in order (test/driver helper); transparently
    decompresses ``.tsv.gz`` parts."""
    import gzip

    chunks = []
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        if f.startswith("part-") and f.endswith(".tsv.gz"):
            with gzip.open(p, "rt", encoding="utf-8") as fh:
                chunks.append(fh.read())
        elif f.startswith("part-") and f.endswith(".tsv"):
            with open(p, encoding="utf-8") as fh:
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
