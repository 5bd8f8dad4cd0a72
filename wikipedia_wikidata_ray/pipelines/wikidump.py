"""END-TO-END reference pipeline over raw MySQL-dump files: the complete
user journey of the reference repo — ``.sql.gz`` dumps in, the sorted
``wikimedia_importance`` table out — re-expressed Ray-Data-first.

Composes (SURVEY.md §2): A3 dump parsing → B1/B2/B3 filters → C1
PER-LANGUAGE broadcast-lookup pagelinks counting (one id→title mapping
per language, steps/wikipedia_sql2csv.sh:55-59) → E1 counts → D2
othercount reshape (one grouped sum replaces the reference's 39×39
UPDATE loop, steps/wikipedia_process.sh:52-71) → E3 totals → B5/B6/B8
wikidata prep → D4/E7/F5 place-type→ont-level pick
(steps/wikidata_process.sh:44-66) → D3/B4/D5 coordinate enrichment →
D6 sitelinks → D7 enrichment → E4/E5 importance → D8/D9 redirect
semi/anti joins → F8 union → E6/D10 language sizes → F1 global sort.

Inputs follow the reference's file layout ({lang}page.sql.gz etc. —
sources/wikidump_gen.py renders the deterministic fixture tree); the
DuckDB oracle below (used via queries()) re-derives the expected output
closed-form from ``documents``.

Articles contract (documented composition): an article row exists for
every page whose own-language pagelinks count is ≥ 1 (inner join on
title, the reference's pagelinkcount semantics); ``othercount`` sums the
other-language counts of the article's langlink targets; output keeps
wikidata-linked articles only (F3), with redirects attached per D8/D9.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..functions.wikifilters import (
    filter_geo_tags,
    filter_ips,
    filter_page,
    filter_redirect,
    filter_wikidata_page,
)
from ..sources.mysqldump import read_mysqldump
from ..stages.salted import partial_count, partial_sum


def _langs_present(dump_dir: str) -> list[str]:
    return sorted(
        f[: -len("page.sql.gz")]
        for f in os.listdir(dump_dir)
        if f.endswith("page.sql.gz") and not f.startswith("wikidata_")
    )


def _with_lang(ds: Dataset, lang: str) -> Dataset:
    return ds.map_batches(
        lambda t: t.append_column(
            "lang", pa.array([lang] * len(t), type=pa.string())
        ),
        batch_format="pyarrow",
    )


def _cast_str(ds: Dataset, cols: list[str]) -> Dataset:
    """Normalize listed columns to pa.string() — Arrow joins require
    exactly matching key types and large_string sneaks in via block
    conversions."""

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            t = t.set_column(
                t.column_names.index(c), c, pc.cast(t[c], pa.string())
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def _union(parts: list[Dataset]) -> Dataset:
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def wikimedia_importance_from_dumps(dump_dir: str, num_partitions: int | None = None) -> Dataset:
    langs = _langs_present(dump_dir)
    lang_set = frozenset(langs)
    if num_partitions is None:
        # joins spawn aggregator actors; on small sessions too many
        # concurrent actor demands deadlock a 4-CPU cluster
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(8, cpus // 2))

    def table(name: str, n_cols: int) -> Dataset:
        return read_mysqldump(os.path.join(dump_dir, name), n_cols)

    # B1: per-language page tables (lang column carried from the start)
    pages = _union(
        [
            _with_lang(
                table(f"{L}page.sql.gz", 3).map_batches(
                    filter_page, batch_format="pyarrow"
                ),
                L,
            )
            for L in langs
        ]
    )
    pages = _cast_str(pages, ["lang", "page_title"]).materialize()  # reused by D1/D2/E3 joins

    # C1 + E1: PER-LANGUAGE linktarget broadcast → pagelinks ns-filter +
    # lookup + count per (lang, title). The reference builds one id→title
    # dict per language (steps/wikipedia_sql2csv.sh:55-59); mirroring
    # that, each language's pagelinks stream is resolved against its own
    # language's mapping (the fixture gives every language a distinct
    # mapping, so a shared mapping would fail the oracle). Each payload
    # is built from zero-copy plasma block views — no driver pandas pull.
    from .wikiprocess import resolve_pagelinks

    pl_parts = []
    for L in langs:
        lt = table(f"{L}linktarget.sql.gz", 3).map_batches(
            filter_redirect, batch_format="pyarrow"
        )
        raw = table(f"{L}pagelinks.sql.gz", 3).map_batches(
            lambda t, L=L: pa.table(
                {
                    "lang": pa.array([L] * len(t), type=pa.string()),
                    "pl_namespace": pc.cast(t["f1"], pa.int64()),
                    "pl_target_id": pc.cast(t["f2"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        # resolve_pagelinks gates the physical plan: broadcast lookup below
        # LINKTARGET_BROADCAST_LIMIT rows (en ≈ 30M → fits), hash join above
        # (the reference's per-process dict has no such escape hatch,
        # steps/wikipedia_sql2csv.sh:58-59)
        pl_parts.append(
            resolve_pagelinks(raw, lt, id_col="id", title_col="title")
        )
    plcounts = _cast_str(
        partial_count(_union(pl_parts), ["lang", "pl_title"], out="langcount"),
        ["lang", "pl_title"],
    ).materialize()

    # B3: langlinks (field-based variant of the line filter — same
    # semantics: lang ∈ config, title spaces → underscores)
    def ll_filter(t: pa.Table, L: str) -> pa.Table:
        keep = pc.is_in(
            t["f1"], value_set=pa.array(sorted(lang_set), type=pa.string())
        )
        t = t.filter(keep)
        return pa.table(
            {
                "src_lang": pa.array([L] * len(t), type=pa.string()),
                "ll_from": pc.cast(t["f0"], pa.int64()),
                "ll_lang": pc.cast(t["f1"], pa.string()),
                "ll_title": pc.replace_substring(
                    pc.cast(t["f2"], pa.string()), " ", "_"
                ),
            }
        )

    langlinks = _union(
        [
            table(f"{L}langlinks.sql.gz", 3).map_batches(
                lambda t, L=L: ll_filter(t, L), batch_format="pyarrow"
            )
            for L in langs
        ]
    )

    # D2 reshape: ONE grouped sum replaces the reference's 1521 UPDATEs.
    # langlinks ⋈ src pages (title of the source article) ⋈ other-language
    # pagelink counts → sum per (src_lang, src_title).
    ll_titled = langlinks.join(
        pages,
        "inner",
        num_partitions=num_partitions,
        on=("src_lang", "ll_from"),
        right_on=("lang", "page_id"),
    ).map_batches(
        lambda t: pa.table(
            {
                "src_lang": t["src_lang"],
                "src_title": t["page_title"],
                "ll_lang": t["ll_lang"],
                "ll_title": t["ll_title"],
            }
        ),
        batch_format="pyarrow",
    )
    oth_joined = ll_titled.join(
        plcounts,
        "inner",
        num_partitions=num_partitions,
        on=("ll_lang", "ll_title"),
        right_on=("lang", "pl_title"),
    )
    othercount = _cast_str(
        partial_sum(
            oth_joined.select_columns(["src_lang", "src_title", "langcount"]),
            ["src_lang", "src_title"],
            "langcount",
            out="othercount",
        ),
        ["src_lang", "src_title"],
    )

    # E3: articles = pages with an own-language in-link count; totals
    art = pages.join(
        plcounts,
        "inner",
        num_partitions=num_partitions,
        on=("lang", "page_title"),
        right_on=("lang", "pl_title"),
    ).join(
        othercount.map_batches(
            lambda t: t.rename_columns(["o_lang", "o_title", "othercount"]),
            batch_format="pyarrow",
        ),
        "left_outer",
        num_partitions=num_partitions,
        on=("lang", "page_title"),
        right_on=("o_lang", "o_title"),
    )

    def totals(t: pa.Table) -> pa.Table:
        oc = pc.fill_null(t["othercount"], 0)
        return pa.table(
            {
                "language": t["lang"],
                "title": t["page_title"],
                "langcount": t["langcount"],
                "othercount": oc,
                "totalcount": pc.add(t["langcount"], oc),
            }
        )

    art = _cast_str(
        art.map_batches(totals, batch_format="pyarrow"), ["language", "title"]
    )

    # B5/B6/B8 + D6: wikidata sitelinks → per-language wikidata titles
    wd_page = table("wikidata_page.sql.gz", 3).map_batches(
        filter_wikidata_page, batch_format="pyarrow"
    )
    ips = table("wikidata_wb_items_per_site.sql.gz", 4).map_batches(
        lambda t: filter_ips(t, lang_set), batch_format="pyarrow"
    )
    wd_keyed = wd_page.map_batches(
        lambda t: pa.table(
            {
                "item": t["page_title"],
                "item_id": pc.cast(
                    pc.utf8_ltrim(t["page_title"], characters="Q"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    wikidata_pages = wd_keyed.join(
        ips,
        "inner",
        num_partitions=num_partitions,
        on=("item_id",),
        right_on=("item_id",),
    ).map_batches(
        lambda t: pa.table(
            {
                "w_language": pc.cast(
                    pc.replace_substring(t["site_id"], "wiki", ""), pa.string()
                ),
                "w_title": pc.cast(
                    pc.replace_substring(t["title"], " ", "_"), pa.string()
                ),
                "item": pc.cast(t["item"], pa.string()),
                "item_id": t["item_id"],
            }
        ),
        batch_format="pyarrow",
    )

    # D4/E7/F5: place-type → ont-level pick per item (reference builds
    # wikidata_places from the place dump and keeps MAX(ont_level) per
    # item with a deterministic tie-break, steps/wikidata_process.sh:44-66)
    from .wikiprocess import PLACE_TYPE_LEVELS

    lvl_keys = sorted(PLACE_TYPE_LEVELS)
    karr = pa.array(lvl_keys, type=pa.string())
    varr = pa.array([PLACE_TYPE_LEVELS[k] for k in lvl_keys], type=pa.int64())

    def add_level(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "item_id": pc.cast(t["f0"], pa.int64()),
                "place_type": pc.cast(t["f1"], pa.string()),
            }
        )
        lv = pc.take(varr, pc.index_in(t["place_type"], value_set=karr))
        return t.append_column("ont_level", lv).filter(pc.is_valid(lv))

    pt_path = os.path.join(dump_dir, "wikidata_place_types.sql.gz")
    picks = None
    if os.path.exists(pt_path):
        # F5 deterministic DISTINCT ON via grouped_topk(k=1) — items are
        # MANY TINY groups (CLAUDE.md tiny-group rule)
        from ..ops.topk import grouped_topk

        picks = grouped_topk(
            table("wikidata_place_types.sql.gz", 2).map_batches(
                add_level, batch_format="pyarrow"
            ),
            ["item_id"],
            [("ont_level", False), ("place_type", True)],
            k=1,
        ).select_columns(["item_id", "place_type"])

    # D3/B4 + D5: primary earth coordinates per item (5-dp float policy,
    # functions/wikifilters.filter_geo_tags)
    geo = (
        table("wikidata_geo_tags.sql.gz", 6)
        .map_batches(filter_geo_tags, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {
                    "g_item_id": pc.cast(t["gt_page_id"], pa.int64()),
                    "lat": t["gt_lat"],
                    "lon": t["gt_lon"],
                }
            ),
            batch_format="pyarrow",
        )
    )

    if picks is not None:
        wikidata_pages = wikidata_pages.join(
            picks.map_batches(
                lambda t: t.rename_columns(["p_item_id", "place_type"]),
                batch_format="pyarrow",
            ),
            "left_outer",
            num_partitions=num_partitions,
            on=("item_id",),
            right_on=("p_item_id",),
        )
    else:
        wikidata_pages = wikidata_pages.map_batches(
            lambda t: t.append_column(
                "place_type", pa.nulls(len(t), type=pa.string())
            ),
            batch_format="pyarrow",
        )
    wikidata_pages = wikidata_pages.join(
        geo,
        "left_outer",
        num_partitions=num_partitions,
        on=("item_id",),
        right_on=("g_item_id",),
    ).select_columns(["w_language", "w_title", "item", "place_type", "lat", "lon"])

    # D7 enrichment + E4/E5 scoring
    artw = art.join(
        wikidata_pages,
        "left_outer",
        num_partitions=num_partitions,
        on=("language", "title"),
        right_on=("w_language", "w_title"),
    ).materialize()  # reused: max + scoring + joins below

    maxt = (
        artw.map_batches(
            lambda t: t.filter(pc.is_valid(t["item"])).select(["totalcount"]),
            batch_format="pyarrow",
        ).max("totalcount")
    )
    log_maxt = math.log(maxt)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["item"]))  # F3
        total = t["totalcount"].to_numpy(zero_copy_only=False).astype(np.float64)
        imp = np.round(np.maximum(np.log(total) / log_maxt, 1e-10), 10)
        return pa.table(
            {
                "language": t["language"],
                "type": pa.array(["a"] * len(t), type=pa.string()),
                "title": t["title"],
                "importance": pa.array(imp),
                "wikidata_id": t["item"],
                "place_type": pc.cast(t["place_type"], pa.string()),
                "lat": pc.cast(t["lat"], pa.float64()),
                "lon": pc.cast(t["lon"], pa.float64()),
            }
        )

    articles_out = artw.map_batches(score, batch_format="pyarrow").materialize()

    # D1 + D8 + D9: redirects resolve through pages, attach target
    # importance, articles win collisions
    redirects = _union(
        [
            _with_lang(
                table(f"{L}redirect.sql.gz", 3).map_batches(
                    lambda t: filter_redirect(t).rename_columns(
                        ["rd_from", "rd_title"]
                    ),
                    batch_format="pyarrow",
                ),
                L,
            )
            for L in langs
        ]
    )
    # materialize before the join: streamed union bundles of 0-row parse
    # shards can arrive schema-less and Ray joins are fragile on those
    # (CLAUDE.md empty-side rule; the redirect table is small by nature)
    redirects = redirects.materialize()
    red_full = redirects.join(
        pages,
        "inner",
        num_partitions=num_partitions,
        on=("lang", "rd_from"),
        right_on=("lang", "page_id"),
    ).map_batches(
        lambda t: pa.table(
            {
                "language": t["lang"],
                "from_title": t["page_title"],
                "to_title": t["rd_title"],
            }
        ),
        batch_format="pyarrow",
    )
    a_keyed = articles_out.map_batches(
        lambda t: pa.table(
            {
                "a_language": t["language"],
                "a_title": t["title"],
                "a_importance": t["importance"],
                "a_item": t["wikidata_id"],
                "a_place_type": t["place_type"],
                "a_lat": t["lat"],
                "a_lon": t["lon"],
            }
        ),
        batch_format="pyarrow",
    )
    red = red_full.join(
        a_keyed,
        "inner",
        num_partitions=num_partitions,
        on=("language", "to_title"),
        right_on=("a_language", "a_title"),
    ).map_batches(
        lambda t: pa.table(
            {
                "language": t["language"],
                "type": pa.array(["r"] * len(t), type=pa.string()),
                "title": t["from_title"],
                "importance": t["a_importance"],
                "wikidata_id": t["a_item"],
                "place_type": t["a_place_type"],
                "lat": t["a_lat"],
                "lon": t["a_lon"],
            }
        ),
        batch_format="pyarrow",
    )
    red = red.materialize()
    # guard: Ray joins crash on schema-less EMPTY inputs; zero surviving
    # redirects simply means an articles-only output (reference analog:
    # the INSERT just adds no rows)
    if red.count() > 0:
        red = red.join(
            a_keyed,
            "left_anti",
            num_partitions=num_partitions,
            on=("language", "title"),
            right_on=("a_language", "a_title"),
        ).materialize()
    if red.count() > 0:
        unioned = articles_out.union(red)
    else:
        unioned = articles_out

    # E6 + D10 + F1
    sizes = partial_count(
        unioned.select_columns(["language"]), ["language"], out="lang_size"
    )
    size_map = {r["language"]: r["lang_size"] for r in sizes.take_all()}
    key_arr = pa.array(sorted(size_map), type=pa.string())
    val_arr = pa.array([size_map[k.as_py()] for k in key_arr], type=pa.int64())

    def add_size(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["language"], value_set=key_arr)
        return t.append_column("lang_size", pc.take(val_arr, idx))

    return (
        unioned.map_batches(add_size, batch_format="pyarrow")
        .sort(
            ["lang_size", "language", "type", "title"],
            descending=[True, False, False, False],
        )
    )


def q_wikidump_importance_export(sf_dir: str) -> Dataset:
    from ..sources.wikidump_gen import ensure_wikidumps

    return wikimedia_importance_from_dumps(ensure_wikidumps(sf_dir))


SQL_WIKIDUMP_IMPORTANCE_EXPORT = """
WITH n AS (SELECT COUNT(*) AS c FROM documents),
lix AS (
  SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS BIGINT) AS li
  FROM (SELECT DISTINCT lang FROM documents)
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS r,
         COUNT(*) OVER (PARTITION BY lang) AS cl
  FROM documents
),
tgt_ord AS (
  SELECT lang, doc_id AS src, (r*3+1) % cl AS o FROM ranked
  UNION ALL SELECT lang, doc_id, (r*5+2) % cl FROM ranked
  UNION ALL SELECT lang, doc_id, r % 2 FROM ranked
  UNION ALL SELECT lang, doc_id, (r*7+3) % cl FROM ranked
  UNION ALL SELECT lang, doc_id, (r*13+7) % cl FROM ranked
  UNION ALL SELECT lang, doc_id, (r*17+11) % cl FROM ranked
),
edges AS (
  SELECT t.lang, t.src, rt.doc_id AS tgt
  FROM tgt_ord t JOIN ranked rt ON rt.lang = t.lang AND rt.r = t.o
),
plc AS (
  -- per-language linktarget: language li keeps targets with
  -- tgt % 13 != 0 AND (tgt + li) % 11 != 0 (sources/wikidump_gen.py)
  SELECT e.lang, e.tgt, COUNT(*) AS langcount
  FROM edges e JOIN lix x ON x.lang = e.lang
  WHERE (e.src + e.tgt) % 4 = 0 AND e.tgt % 13 <> 0
        AND (e.tgt + x.li) % 11 <> 0
  GROUP BY 1, 2
),
oth AS (
  SELECT d.doc_id, SUM(p.langcount) AS othercount
  FROM documents d
  JOIN plc p ON p.tgt = (d.doc_id*11+5) % (SELECT c FROM n) AND p.lang <> d.lang
  GROUP BY 1
),
art AS (
  SELECT d.lang AS language, 'Doc_' || d.doc_id AS title, d.doc_id,
         p.langcount + COALESCE(o.othercount, 0) AS totalcount
  FROM documents d
  JOIN plc p ON p.lang = d.lang AND p.tgt = d.doc_id
  LEFT JOIN oth o ON o.doc_id = d.doc_id
),
artw AS (
  SELECT a.*, CASE WHEN a.doc_id % 3 <> 1 THEN 'Q' || a.doc_id END AS item
  FROM art a
),
pt AS (
  SELECT doc_id AS item_id, 'T' || (doc_id % 5) AS place_type
  FROM documents WHERE doc_id % 4 <> 2
  UNION ALL
  SELECT doc_id, 'T' || ((doc_id*3+1) % 5)
  FROM documents WHERE doc_id % 4 <> 2
),
ptl AS (
  SELECT item_id, place_type,
         CASE place_type WHEN 'T0' THEN 1 WHEN 'T1' THEN 2 WHEN 'T2' THEN 3
              WHEN 'T3' THEN 3 ELSE 2 END AS ont_level
  FROM pt
),
pick AS (
  SELECT item_id, place_type FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY item_id ORDER BY ont_level DESC, place_type) AS rn
    FROM ptl
  ) WHERE rn = 1
),
geo AS (
  SELECT doc_id AS item_id,
    ROUND(CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 35.6895 WHEN 1 THEN 40.7127
            WHEN 2 THEN 51.5072 WHEN 3 THEN -23.5505 ELSE 28.6139 END)
      + ((doc_id * 37) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 7919) % 1600001) / 10000.0 - 80.0 END, 5) AS lat,
    ROUND(CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 139.6917 WHEN 1 THEN -74.0059
            WHEN 2 THEN -0.1275 WHEN 3 THEN -46.6333 ELSE 77.209 END)
      + ((doc_id * 61) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 104729) % 3600001) / 10000.0 - 180.0 END, 5) AS lon
  FROM documents WHERE doc_id % 10 < 7
),
maxt AS (SELECT MAX(totalcount) AS m FROM artw WHERE item IS NOT NULL),
articles_out AS (
  SELECT a.language, 'a' AS type, a.title,
         ROUND(GREATEST(LN(a.totalcount) / LN((SELECT m FROM maxt)), 1e-10), 10)
           AS importance,
         a.item AS wikidata_id,
         p.place_type, g.lat, g.lon
  FROM artw a
  LEFT JOIN pick p ON p.item_id = a.doc_id
  LEFT JOIN geo g ON g.item_id = a.doc_id
  WHERE a.item IS NOT NULL
),
redirects AS (
  SELECT a.lang AS language, 'Doc_' || a.doc_id AS from_title,
         'Doc_' || b.doc_id AS to_title
  FROM ranked a JOIN ranked b
    ON b.lang = a.lang AND b.r = (a.r*11+3) % a.cl
  WHERE a.doc_id % 7 = 3
),
red_kept AS (
  SELECT r.language, 'r' AS type, r.from_title AS title,
         a.importance, a.wikidata_id, a.place_type, a.lat, a.lon
  FROM redirects r
  JOIN articles_out a ON a.language = r.language AND a.title = r.to_title
  ANTI JOIN articles_out x ON x.language = r.language AND x.title = r.from_title
),
unioned AS (
  SELECT * FROM articles_out UNION ALL SELECT * FROM red_kept
),
sizes AS (SELECT language, COUNT(*) AS lang_size FROM unioned GROUP BY 1)
SELECT u.language, u.type, u.title, u.importance, u.wikidata_id,
       u.place_type, u.lat, u.lon, s.lang_size
FROM unioned u JOIN sizes s USING (language)
"""
