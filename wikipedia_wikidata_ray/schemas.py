"""Explicit Arrow schemas for every logical table (SURVEY.md §1.2).

The reference declares DDL inline per step (steps/wikipedia_import.sh:30-33,
steps/wikidata_import.sh:28-32, steps/wikipedia_process.sh:80-92); we declare
one ``pyarrow.Schema`` constant per table and validate/cast at stage
boundaries. No schema inference anywhere.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# North-rule input table (BASELINE.json input_hint):
# Common-Crawl-style web pages. ``html`` is the only wide binary column.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

# Extraction output (stage I1/C3): pure function of html, byte-identical per
# url. One row per page; geo columns null when the page carries no coords.
EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("has_geo", pa.bool_()),
        ("n_outlinks", pa.int32()),
    ]
)

# One row per (source page, outlink target) — the pagelinks analog.
OUTLINKS = pa.schema(
    [
        ("src_doc_id", pa.int64()),
        ("src_lang", pa.string()),
        ("target_doc_id", pa.int64()),
    ]
)

# Single-parse extraction for compositions that need BOTH per-page metadata
# and the link edges (importance/export): one html parse emits the metadata
# columns plus the outlink targets as a list column; OUTLINKS is recovered
# by flattening (stages/extract.py:meta_links_batch / outlinks_flatten).
META_LINKS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("title", pa.string()),
        ("has_geo", pa.bool_()),
        ("outlink_tgts", pa.list_(pa.int64())),
    ]
)

# ---------------------------------------------------------------------------
# Reference-shaped relational tables (FIXTURES.md §2). Per-language Postgres
# tables become one table with an explicit ``lang`` column.
WP_PAGE = pa.schema(
    [("lang", pa.string()), ("page_id", pa.int64()), ("page_title", pa.string())]
)
WP_LINKTARGET = pa.schema(
    [("lang", pa.string()), ("lt_id", pa.int64()), ("lt_title", pa.string())]
)
WP_PAGELINKS_RAW = pa.schema(
    [
        ("lang", pa.string()),
        ("pl_from", pa.int64()),
        ("pl_namespace", pa.int64()),
        ("pl_target_id", pa.int64()),
    ]
)
WP_PAGELINKS = pa.schema(
    [
        ("lang", pa.string()),
        ("pl_title", pa.string()),
        ("langcount", pa.int64()),
        ("othercount", pa.int64()),
    ]
)
WP_LANGLINKS = pa.schema(
    [
        ("lang", pa.string()),
        ("ll_from", pa.int64()),
        ("ll_lang", pa.string()),
        ("ll_title", pa.string()),
    ]
)
WP_REDIRECT = pa.schema(
    [("lang", pa.string()), ("rd_from", pa.int64()), ("rd_title", pa.string())]
)
WD_GEO_TAGS = pa.schema(
    [("gt_page_id", pa.int64()), ("gt_lat", pa.float64()), ("gt_lon", pa.float64())]
)
WD_PAGE = pa.schema([("page_id", pa.int64()), ("page_title", pa.string())])
WB_ITEMS_PER_SITE = pa.schema(
    [
        ("ips_item_id", pa.int64()),
        ("ips_site_id", pa.string()),
        ("ips_site_page", pa.string()),
    ]
)
WD_PLACE_DUMP = pa.schema([("item", pa.string()), ("instance_of", pa.string())])
WD_PLACE_TYPE_LEVELS = pa.schema([("place_type", pa.string()), ("level", pa.int64())])

# Wide fact table (steps/wikipedia_process.sh:80-92)
ARTICLE_FULL = pa.schema(
    [
        ("language", pa.string()),
        ("title", pa.string()),
        ("langcount", pa.int64()),
        ("othercount", pa.int64()),
        ("totalcount", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("importance", pa.float64()),
        ("title_en", pa.string()),
        ("wd_page_title", pa.string()),
        ("instance_of", pa.string()),
    ]
)

# Final output (README.md:52-71, steps/output.sh:113-125)
WIKIMEDIA_IMPORTANCE = pa.schema(
    [
        ("language", pa.string()),
        ("type", pa.string()),  # 'a' | 'r'
        ("title", pa.string()),
        ("importance", pa.float64()),
        ("wikidata_id", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Graft spatial side tables (FIXTURES.md §2)
ADMIN_POLYGONS = pa.schema(
    [
        ("admin_code", pa.string()),
        ("level", pa.int32()),
        # flat ring coords: struct of lon/lat float64 lists (closed ring)
        ("ring_lon", pa.list_(pa.float64())),
        ("ring_lat", pa.list_(pa.float64())),
    ]
)
PLACES = pa.schema(
    [
        ("place_id", pa.int64()),
        ("name", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("rank", pa.int32()),
    ]
)


def cast_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + cast a table to an exact schema (stage-boundary validation)."""
    cols = [table.column(name).cast(schema.field(name).type) for name in schema.names]
    return pa.Table.from_arrays(cols, schema=schema)
