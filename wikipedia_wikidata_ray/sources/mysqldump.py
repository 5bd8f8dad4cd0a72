"""MySQL-dump → rows source (SURVEY.md §2.A3).

The reference streams ``INSERT INTO `t` VALUES (…),(…);`` lines through a
csv-module-based splitter (/root/reference/bin/mysqldump_to_csv.py:15-115).
This module re-implements the same *semantics* as a regex tokenizer feeding
a Ray Data ``map_batches`` stage over text blocks:

- only lines starting with ``INSERT INTO`` are parsed; everything after
  the literal ```` ` VALUES ```` marker is the tuple list
- fields may be single-quoted with backslash escapes (``\\x`` → ``x``,
  i.e. csv ``escapechar`` semantics, not SQL semantics — parity with the
  reference's ``csv.reader(escapechar='\\\\', doublequote=False)``)
- unquoted ``NULL`` and empty fields both become ``""`` (the reference
  maps NULL→'' at bin/mysqldump_to_csv.py:60-63)
- decode errors in the source bytes are ignored
  (bin/mysqldump_to_csv.py:109)

At scale the dump text arrives as a Dataset of lines
(``ray.data.read_text`` auto-decompresses ``.gz``) and parsing is a
stateless ``map_batches``/``flat_map`` — each INSERT line is independent,
so blocks parallelize freely.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pyarrow as pa
from ray.data import Dataset

_INSERT_PREFIX = "INSERT INTO"
_VALUES_MARK = "` VALUES "

# one token per match: a quoted string (backslash-escaped), a bare scalar,
# or structural punctuation
_TOKEN = re.compile(
    r"'(?P<q>(?:\\.|[^'\\])*)'"  # quoted value
    r"|(?P<bare>[^,()'\s][^,()']*)"  # unquoted value (numbers, NULL, hex…)
    r"|(?P<punct>[(),])"
)
_UNESCAPE = re.compile(r"\\(.)")


def iter_insert_rows(line: str) -> Iterator[list[str]]:
    """Yield one field-list per tuple of an INSERT statement line.

    Non-INSERT lines yield nothing. Field normalization matches the
    reference: NULL/empty → '', backslash escapes collapsed.
    """
    if not line.startswith(_INSERT_PREFIX):
        return
    values = line.partition(_VALUES_MARK)[2]
    if not values:
        return

    row: list[str] = []
    pending = ""
    depth = 0
    for m in _TOKEN.finditer(values):
        punct = m.group("punct")
        if punct == "(":
            depth += 1
            pending = ""
        elif punct == ",":
            if depth > 0:
                # NULL → '' even when quoted: the reference compares the
                # csv-parsed (unquoted) value (bin/mysqldump_to_csv.py:60)
                row.append("" if pending == "NULL" else pending)
                pending = ""
        elif punct == ")":
            if depth > 0:
                row.append("" if pending == "NULL" else pending)
                yield row
                row = []
                pending = ""
                depth -= 1
        elif m.group("q") is not None:
            pending = _UNESCAPE.sub(r"\1", m.group("q"))
        else:
            pending = m.group("bare").strip()


def parse_dump_text(lines: Iterable[str]) -> list[list[str]]:
    """All tuples from an iterable of dump lines (test/driver helper)."""
    out: list[list[str]] = []
    for line in lines:
        out.extend(iter_insert_rows(line))
    return out


def rows_to_table(rows: list[list[str]], n_cols: int) -> pa.Table:
    """Positional string columns ``f0..f{n-1}`` (dump tables have fixed
    arity; shorter rows are dropped, wider rows truncated)."""
    cols: list[list[str]] = [[] for _ in range(n_cols)]
    for r in rows:
        if len(r) < n_cols:
            continue
        for i in range(n_cols):
            cols[i].append(r[i])
    return pa.table(
        {f"f{i}": pa.array(cols[i], type=pa.string()) for i in range(n_cols)}
    )


def parse_dump_batch(batch: pa.Table, n_cols: int, text_col: str = "text") -> pa.Table:
    """``map_batches`` stage: Dataset of dump lines → positional rows."""
    rows: list[list[str]] = []
    for line in batch.column(text_col).to_pylist():
        rows.extend(iter_insert_rows(line))
    return rows_to_table(rows, n_cols)


def read_mysqldump(paths: str | list[str], n_cols: int) -> Dataset:
    """``read_text`` (gz-aware, line-parallel) → stateless parse stage."""
    import ray.data as rd

    ds = rd.read_text(paths)
    return ds.map_batches(
        lambda b: parse_dump_batch(b, n_cols), batch_format="pyarrow"
    )
