"""HTML → text/geo/link extraction (SURVEY.md §2.C3/I1).

The Ray-Data analog of the reference's streaming dump parser
(bin/mysqldump_to_csv.py:15-115) + per-record filters (bin/filter_*.py):
a deterministic pure function of the ``html`` column applied as a
**stateless task-based** ``map_batches`` stage over zero-copy Arrow
batches (SURVEY.md §4: stateless parse/normalize stages = tasks — no
actor pool to ramp up, instant parallelism across the cluster). The
north-rule invariant is **byte-identical extracted text per url**
(BASELINE.json input_hint) — tested in tests/test_extract.py.

All hot-path work runs in Arrow C++ RE2 kernels (``pc.extract_regex``,
``pc.split_pattern``, ``pc.replace_substring``) — no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import EXTRACTED, META_LINKS, OUTLINKS

_ANCHOR_LIT = '<a href="/wiki/Doc_'
_CONTENT_OPEN = '<div id="content">'
_CONTENT_CLOSE = "</div>\n</body>"
_TITLE_RE = r"<title>(?P<title>[^<]*)</title>"
_GEO_RE = r'class="geo" data-lat="(?P<lat>[^"]*)" data-lon="(?P<lon>[^"]*)"'
# (?s): the text payload spans newlines; the template has exactly one
# content div and escapes '<' inside it, so non-greedy match is exact
_TEXT_RE = r'(?s)<div id="content">(?P<text>.*?)</div>\n</body>'
_DOCID_RE = r"Doc_(?P<id>\d+)$"


def _unescape(col: pa.ChunkedArray | pa.Array):
    # exact inverse of pages_gen._escape (order matters: &amp; last)
    col = pc.replace_substring(col, "&lt;", "<")
    col = pc.replace_substring(col, "&gt;", ">")
    return pc.replace_substring(col, "&amp;", "&")


def _text_between(html) -> pa.ChunkedArray:
    """Payload between the content-div sentinels.

    Fast path: two ``max_splits=1`` literal splits (~17× cheaper than the
    dot-all regex — RE2 lazy ``.*?`` walks the whole document). Falls back
    to the regex (null for malformed rows) if any row lacks a sentinel,
    so a stray page degrades one batch, never the job."""
    try:
        after = pc.list_element(
            pc.split_pattern(html, _CONTENT_OPEN, max_splits=1), 1
        )
        return pc.list_element(
            pc.split_pattern(after, _CONTENT_CLOSE, max_splits=1), 0
        )
    except pa.ArrowInvalid:
        return pc.struct_field(pc.extract_regex(html, _TEXT_RE), "text")


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages → EXTRACTED (one row per page), fully vectorized."""
    html = pc.cast(batch.column("html"), pa.large_string())
    urls = batch.column("url")

    doc_id = pc.cast(
        pc.struct_field(pc.extract_regex(urls, _DOCID_RE), "id"), pa.int64()
    )
    title = pc.struct_field(pc.extract_regex(html, _TITLE_RE), "title")
    text = _unescape(pc.cast(_text_between(html), pa.large_string()))
    geo = pc.extract_regex(html, _GEO_RE)
    lat = pc.cast(pc.struct_field(geo, "lat"), pa.float64())
    lon = pc.cast(pc.struct_field(geo, "lon"), pa.float64())
    has_geo = pc.is_valid(lat)
    n_out = pc.cast(pc.count_substring(html, _ANCHOR_LIT), pa.int32())

    return pa.Table.from_arrays(
        [
            pc.cast(urls, pa.string()),
            doc_id,
            pc.cast(batch.column("lang"), pa.string()),
            pc.cast(title, pa.string()),
            text,
            lat,
            lon,
            has_geo,
            n_out,
        ],
        schema=EXTRACTED,
    )


def outlinks_batch(batch: pa.Table) -> pa.Table:
    """pages → one row per anchor (the pagelinks analog, SURVEY.md §2.E1).

    Vectorized flatten: split html on the anchor literal → list array →
    ``list_parent_indices`` maps each fragment back to its source row;
    the leading digits of every fragment after the first are the target.
    """
    html = pc.cast(batch.column("html"), pa.large_string())
    src_id = pc.cast(
        pc.struct_field(pc.extract_regex(batch.column("url"), _DOCID_RE), "id"),
        pa.int64(),
    )
    langs = pc.cast(batch.column("lang"), pa.string())

    pieces = pc.split_pattern(html, _ANCHOR_LIT)
    parent = pc.list_parent_indices(pieces)
    flat = pc.list_flatten(pieces)
    # target fragments start with digits + '">'; the pre-anchor
    # fragment of each page yields null here and is dropped
    tgt = pc.struct_field(pc.extract_regex(flat, r'^(?P<t>\d+)">'), "t")
    keep = pc.is_valid(tgt)

    return pa.Table.from_arrays(
        [
            pc.take(src_id, pc.filter(parent, keep)),
            pc.take(langs, pc.filter(parent, keep)),
            pc.cast(pc.filter(tgt, keep), pa.int64()),
        ],
        schema=OUTLINKS,
    )


def meta_links_batch(batch: pa.Table) -> pa.Table:
    """pages → META_LINKS: one html parse for metadata AND link targets.

    Importance/export compositions consume both the per-page metadata
    (doc_id, lang, title, has_geo) and the outlink edges; running
    ``extract_batch`` + ``outlinks_batch`` parses every html document
    twice. This emits both in one pass — the targets stay nested as a
    ``list<int64>`` column so cardinality is one row per page, and
    ``outlinks_flatten`` recovers the OUTLINKS edge table without
    touching html again. Semantics are identical to the two-pass path
    (same regexes/splits), asserted in tests/test_extract.py.
    """
    html = pc.cast(batch.column("html"), pa.large_string()).combine_chunks()
    doc_id = pc.cast(
        pc.struct_field(pc.extract_regex(batch.column("url"), _DOCID_RE), "id"),
        pa.int64(),
    )
    title = pc.cast(pc.struct_field(pc.extract_regex(html, _TITLE_RE), "title"), pa.string())
    has_geo = pc.is_valid(pc.struct_field(pc.extract_regex(html, _GEO_RE), "lat"))

    pieces = pc.split_pattern(html, _ANCHOR_LIT)
    parent = pc.list_parent_indices(pieces)
    flat = pc.list_flatten(pieces)
    tgt = pc.struct_field(pc.extract_regex(flat, r'^(?P<t>\d+)">'), "t")
    keep = pc.is_valid(tgt)
    par = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
    vals = pc.cast(pc.filter(tgt, keep), pa.int64())
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    counts = np.bincount(par, minlength=len(batch)) if len(par) else np.zeros(len(batch), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), vals)
    return pa.Table.from_arrays(
        [doc_id, pc.cast(batch.column("lang"), pa.string()), title, has_geo, lists],
        schema=META_LINKS,
    )


def outlinks_flatten(t: pa.Table) -> pa.Table:
    """META_LINKS → OUTLINKS (pure list flatten — no html parse)."""
    lists = t.column("outlink_tgts")
    parent = pc.list_parent_indices(lists)
    return pa.Table.from_arrays(
        [
            pc.take(t.column("doc_id"), parent),
            pc.take(t.column("lang"), parent),
            pc.list_flatten(lists),
        ],
        schema=OUTLINKS,
    )


class HtmlExtractor:
    """Callable wrapper kept for API/back-compat; ``emit`` selects the
    output shape ("extracted" | "outlinks"). Stateless — usable as a plain
    function object in task-based ``map_batches``."""

    def __init__(self, emit: str = "extracted"):
        assert emit in ("extracted", "outlinks")
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit == "outlinks":
            return outlinks_batch(batch)
        return extract_batch(batch)
