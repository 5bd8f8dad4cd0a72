"""Reference relational-core parity over the wiki fixture tables
(SURVEY.md §2: C1, D1, D3, D4, D5, D6, D7, E1, F4, F5, B7, B8).

Each query runs the REAL Ray Data operator (broadcast lookup join,
hash joins, distinct, grouped picks) over the reference-shaped tables of
sources/wiki_fixtures.py; the DuckDB oracle re-derives the expected result
closed-form from ``documents`` (the fixtures are deterministic functions
of doc_id — FIXTURES.md §2 contract).

Reference semantics cited per query:
- pagelinks counting     bin/filter_pagelinks.py:22-49 (C1/E1)
- redirect resolution    steps/wikipedia_process.sh:28-34 (D1)
- geo left-join+DISTINCT steps/wikidata_process.sh:27-36 (D3/F4)
- place pick             steps/wikidata_process.sh:44-66 (D4/E7/F5 — our
  deterministic rule: max ont_level, tie → lexicographic min instance_of;
  the reference's DISTINCT ON is unstable, documented divergence)
- sitelinks join         steps/wikidata_process.sh:96-117 (D6/B7/B8)
- article enrichment     steps/wikidata_process.sh:127-135 + 68-73 (D7/D5)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..sources import wiki_fixtures as wf
from ..stages.salted import default_partitions, partial_count

# F5/D4 broadcast level map — NON-injective so the tie-break is exercised
# (T2 and T3 share level 3; T1 and T4 share level 2).
PLACE_TYPE_LEVELS: dict[str, int] = {"T0": 1, "T1": 2, "T2": 3, "T3": 3, "T4": 2}

_SQL_N = "n AS (SELECT COUNT(*) AS c FROM documents)"

_SQL_PAGELINKS = """
pl AS (
  SELECT lang, doc_id AS pl_from, (doc_id*3+1) % (SELECT c FROM n) AS tgt FROM documents
  UNION ALL
  SELECT lang, doc_id, (doc_id*5+2) % (SELECT c FROM n) FROM documents
  UNION ALL
  SELECT lang, doc_id, doc_id % 2 FROM documents
)
"""


# ---------------------------------------------------------------------------
# C1/E1 — pagelinks broadcast lookup join + in-link counting


class LinktargetJoiner:
    """C1 stateful stage: the linktarget id→title mapping is fetched once
    per worker/actor from a ``ray.put`` broadcast ref (the reference loads
    the whole dict per process, bin/filter_pagelinks.py:22-27; at en scale
    that is ~30M entries — broadcast once, never per batch). Lookup misses
    are dropped (inner/semi-join semantics, :38-40).

    The broadcast payload is a ``(sorted_ids: np.int64, titles: pa.Array)``
    pair, NOT a Python dict: Arrow/numpy buffers deserialize zero-copy
    from plasma, so actor start-up stays O(ms) even for en-scale mappings
    (a 461k-entry dict cost ~1 s per actor to unpickle — measured). Plain
    dicts are still accepted for convenience/tests."""

    def __init__(self, mapping_ref):
        m = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        if isinstance(m, dict):
            ids = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
            order = np.argsort(ids)
            self.ids = ids[order]
            titles = np.asarray(list(m.values()), dtype=object)[order]
            self.titles = pa.array(titles, type=pa.string())
        else:
            self.ids, self.titles = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["pl_namespace"], 0))
        if len(self.ids) == 0:
            # empty mapping → inner-join semantics drop every row (and
            # searchsorted below would index -1 into an empty array)
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "pl_title": pa.array([], type=pa.string()),
                }
            )
        tgt = batch["pl_target_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.ids, tgt)
        idx_c = np.minimum(idx, len(self.ids) - 1)
        hit = self.ids[idx_c] == tgt
        return pa.table(
            {
                "lang": pc.filter(batch["lang"], pa.array(hit)),
                "pl_title": pc.take(self.titles, pa.array(idx_c[hit])),
            }
        )


def linktarget_broadcast(lt_table: pa.Table, id_col: str = "lt_id", title_col: str = "lt_title"):
    """Build the zero-copy broadcast payload from a linktarget table."""
    ids = lt_table.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    titles = pc.take(pc.cast(lt_table.column(title_col), pa.string()), pa.array(order))
    return ray.put((ids[order], titles.combine_chunks()))


def linktarget_broadcast_from_ds(lt_ds: Dataset, id_col: str = "id",
                                 title_col: str = "title"):
    """Broadcast payload straight from a Dataset — each ``ray.get`` of an
    Arrow block ref is a zero-copy plasma view, so the mapping is sorted
    and put without a driver pandas round-trip (the round-1 path pulled
    the whole linktarget table through the driver heap as pandas)."""
    tbls = [ray.get(r) for r in lt_ds.to_arrow_refs()]
    tbls = [t for t in tbls if len(t)]
    if not tbls:
        return ray.put(
            (np.empty(0, dtype=np.int64), pa.array([], type=pa.string()))
        )
    return linktarget_broadcast(
        pa.concat_tables(tbls), id_col=id_col, title_col=title_col
    )


# C1 physical-plan gate: broadcast the id→title mapping only while it is
# broadcast-SIZED. en-wiki linktarget ≈ 30M rows ≈ 1–2 GB payload — fine on
# 128-GiB nodes (the reference's own per-process dict is the same order,
# steps/wikipedia_sql2csv.sh:58-59) — but nothing in a 100× corpus keeps it
# there, so above the limit the lookup becomes a distributed hash join
# (same pattern as the importance fold's 20M-doc gate, queries.py:367-370).
LINKTARGET_BROADCAST_LIMIT = 50_000_000


def resolve_pagelinks(
    pl: Dataset,
    lt: Dataset,
    *,
    id_col: str = "lt_id",
    title_col: str = "lt_title",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """C1 pagelinks→title resolution with two physical plans of identical
    semantics (inner join on ``pl_target_id = id`` after the ns-0 filter,
    bin/filter_pagelinks.py:22-40):

    (a) ``lt`` rows ≤ ``broadcast_limit``: zero-copy broadcast of the sorted
        (ids, titles) pair + per-batch searchsorted lookup — ONE pass over
        pagelinks, no shuffle;
    (b) above the limit: distributed hash join ``pl ⋈ lt`` — pagelinks and
        linktarget each shuffle once on the id key; nothing is broadcast.

    ``pl`` must carry (lang, pl_namespace, pl_target_id); output is
    (lang: string, pl_title: string). The small side is materialized once
    to obtain the gate count; plan (b) reuses those pinned blocks for the
    join rather than re-reading."""
    if broadcast_limit is None:
        broadcast_limit = LINKTARGET_BROADCAST_LIMIT
    lt = lt.materialize()
    lt_rows = lt.count()
    if lt_rows <= broadcast_limit:
        ref = linktarget_broadcast_from_ds(lt, id_col=id_col, title_col=title_col)

        # task mode, not an actor pool: the payload deserializes zero-copy
        # from plasma so constructing the joiner per batch is O(ms), and
        # per-language callers would otherwise proliferate pools
        def resolve(t: pa.Table, _ref=ref) -> pa.Table:
            return LinktargetJoiner(_ref)(t)

        return pl.map_batches(resolve, batch_format="pyarrow")
    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(8, cpus // 2)

    def ns0(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pl_namespace"], 0))
        return pa.table(
            {
                "lang": pc.cast(t["lang"], pa.string()),
                "pl_target_id": pc.cast(t["pl_target_id"], pa.int64()),
            }
        )

    def lt_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lt_join_id": pc.cast(t[id_col], pa.int64()),
                "pl_title": pc.cast(t[title_col], pa.string()),
            }
        )

    joined = pl.map_batches(ns0, batch_format="pyarrow").join(
        lt.map_batches(lt_keyed, batch_format="pyarrow"),
        "inner",
        num_partitions=num_partitions,
        on=("pl_target_id",),
        right_on=("lt_join_id",),
    )
    return joined.select_columns(["lang", "pl_title"])


def q_wiki_pagelinks_counts(sf_dir: str) -> Dataset:
    # broadcast straight from plasma block refs — never a driver pandas
    # round-trip of a lookup table (round-2 verdict wrong #5); gated with
    # a hash-join fallback above LINKTARGET_BROADCAST_LIMIT rows
    joined = resolve_pagelinks(
        wf.wp_pagelinks(sf_dir),
        wf.wp_linktarget(sf_dir),
        id_col="lt_id",
        title_col="lt_title",
    )
    return partial_count(joined, ["lang", "pl_title"], out="langcount")


SQL_WIKI_PAGELINKS_COUNTS = f"""
WITH {_SQL_N}, {_SQL_PAGELINKS}
SELECT lang, 'Doc_' || tgt AS pl_title, COUNT(*) AS langcount
FROM pl
WHERE (pl_from + tgt) % 4 = 0 AND tgt % 13 <> 0
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# D1 — redirect ⋈ page


def q_wiki_redirect_resolve(sf_dir: str) -> Dataset:
    red = wf.wp_redirect(sf_dir)
    page = wf.wp_page(sf_dir)
    j = red.join(
        page,
        "inner",
        num_partitions=default_partitions(),
        on=("lang", "rd_from"),
        right_on=("lang", "page_id"),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "language": t["lang"],
                "from_title": t["page_title"],
                "to_title": t["rd_title"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_WIKI_REDIRECT_RESOLVE = f"""
WITH {_SQL_N}
SELECT lang AS language, 'Doc_' || doc_id AS from_title,
       'Doc_' || ((doc_id*11+3) % (SELECT c FROM n)) AS to_title
FROM documents WHERE doc_id % 7 = 3
"""


# ---------------------------------------------------------------------------
# D3/F4 — geo_tags ⟕ wd_page + exact DISTINCT


def q_wiki_geo_enrich(sf_dir: str) -> Dataset:
    geo = wf.wd_geo_tags(sf_dir)
    page = wf.wd_page(sf_dir)
    j = geo.join(
        page,
        "left_outer",
        num_partitions=default_partitions(),
        on=("gt_page_id",),
        right_on=("page_id",),
    ).select_columns(["gt_page_id", "gt_lat", "gt_lon", "page_title"])
    # exact dedup: per-batch distinct, then count-merge and drop the count
    dd = partial_count(
        j, ["gt_page_id", "gt_lat", "gt_lon", "page_title"], out="_n"
    )
    return dd.drop_columns(["_n"])


SQL_WIKI_GEO_ENRICH = """
WITH geo AS (
  SELECT doc_id AS gt_page_id,
    ROUND(CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 35.6895 WHEN 1 THEN 40.7127
            WHEN 2 THEN 51.5072 WHEN 3 THEN -23.5505 ELSE 28.6139 END)
      + ((doc_id * 37) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 7919) % 1600001) / 10000.0 - 80.0 END, 5) AS gt_lat,
    ROUND(CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 139.6917 WHEN 1 THEN -74.0059
            WHEN 2 THEN -0.1275 WHEN 3 THEN -46.6333 ELSE 77.209 END)
      + ((doc_id * 61) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 104729) % 3600001) / 10000.0 - 180.0 END, 5) AS gt_lon
  FROM documents WHERE doc_id % 10 < 7
),
geodup AS (
  SELECT * FROM geo
  UNION ALL SELECT * FROM geo WHERE gt_page_id % 4 = 0
)
SELECT DISTINCT g.gt_page_id, g.gt_lat, g.gt_lon,
       CASE WHEN g.gt_page_id % 3 <> 1 THEN 'Q' || g.gt_page_id END AS page_title
FROM geodup g
"""


# ---------------------------------------------------------------------------
# D4/E7/F5 — place-type level lookup + deterministic per-item pick


def q_wiki_place_pick(sf_dir: str) -> Dataset:
    # D4 tiny-side lookup vectorized (index_in against the broadcast
    # key/value arrays — no per-row dict probe)
    keys = sorted(PLACE_TYPE_LEVELS)
    karr = pa.array(keys, type=pa.string())
    varr = pa.array([PLACE_TYPE_LEVELS[k] for k in keys], type=pa.int64())

    def add_level(t: pa.Table) -> pa.Table:
        lv = pa.compute.take(
            varr, pa.compute.index_in(t["instance_of"], value_set=karr)
        )
        return t.append_column("ont_level", lv)

    dump = wf.wikidata_place_dump(sf_dir).map_batches(
        add_level, batch_format="pyarrow"
    )
    # F5 deterministic DISTINCT ON = grouped_topk(k=1) — items are MANY
    # TINY groups, the per-group dispatch regime (CLAUDE.md rule); the
    # sorted-run path replaces groupby().map_groups
    from ..ops.topk import grouped_topk

    return grouped_topk(
        dump, ["item"], [("ont_level", False), ("instance_of", True)], k=1
    )


SQL_WIKI_PLACE_PICK = """
WITH pd AS (
  SELECT 'Q' || d.doc_id AS item, 'T' || ((d.doc_id + t.j) % 5) AS instance_of
  FROM documents d, range(0, 3) t(j)
  WHERE d.doc_id % 3 <> 1 AND t.j <= d.doc_id % 3
),
lv AS (
  SELECT item, instance_of,
         CASE instance_of WHEN 'T0' THEN 1 WHEN 'T1' THEN 2 WHEN 'T2' THEN 3
              WHEN 'T3' THEN 3 ELSE 2 END AS ont_level
  FROM pd
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY item ORDER BY ont_level DESC, instance_of) AS rn
  FROM lv
)
SELECT item, instance_of, ont_level FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# D6/B7/B8 — places ⋈ sitelinks with Q-strip key + underscore titles


def q_wiki_sitelinks_join(sf_dir: str) -> Dataset:
    items = wf.wd_page(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        # B8: CAST(LTRIM(item,'Q') AS INTEGER) — computed once pre-join
        return pa.table(
            {
                "item": t["page_title"],
                "item_id": pc.cast(
                    pc.utf8_ltrim(t["page_title"], characters="Q"), pa.int64()
                ),
            }
        )

    items = items.map_batches(keyed, batch_format="pyarrow")
    j = items.join(
        wf.wb_items_per_site(sf_dir),
        "inner",
        num_partitions=default_partitions(),
        on=("item_id",),
        right_on=("ips_item_id",),
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                # B6-style replace-all of 'wiki' — fixture langs contain none
                "language": pc.replace_substring(t["ips_site_id"], "wiki", ""),
                # B7: underscore normalization
                "title": pc.replace_substring(t["ips_site_page"], " ", "_"),
                "item": t["item"],
            }
        )

    return j.map_batches(shape, batch_format="pyarrow")


SQL_WIKI_SITELINKS_JOIN = """
SELECT lang AS language, 'Doc_' || doc_id AS title, 'Q' || doc_id AS item
FROM documents WHERE doc_id % 3 <> 1
"""


# ---------------------------------------------------------------------------
# D7/D5 — article_full enrichment join


def q_wiki_article_full(sf_dir: str) -> Dataset:
    art = wf.wp_page(sf_dir).map_batches(
        lambda t: pa.table(
            {"language": t["lang"], "title": t["page_title"]}
        ),
        batch_format="pyarrow",
    )
    # D7: enrich with the wikidata sitelink on (language, title)
    enriched = art.join(
        q_wiki_sitelinks_join(sf_dir).map_batches(
            lambda t: t.rename_columns(["w_language", "w_title", "item"]),
            batch_format="pyarrow",
        ),
        "left_outer",
        num_partitions=default_partitions(),
        on=("language", "title"),
        right_on=("w_language", "w_title"),
    ).select_columns(["language", "title", "item"])

    def item_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "item_id",
            pc.cast(pc.utf8_ltrim(t["item"], characters="Q"), pa.int64()),
        )

    enriched = enriched.map_batches(item_key, batch_format="pyarrow")

    # D5: attach coordinates (left-enrichment; unmatched stay NULL)
    geo = q_wiki_geo_enrich(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "g_page_id": t["gt_page_id"],
                "lat": t["gt_lat"],
                "lon": t["gt_lon"],
            }
        ),
        batch_format="pyarrow",
    )
    out = enriched.join(
        geo,
        "left_outer",
        num_partitions=default_partitions(),
        on=("item_id",),
        right_on=("g_page_id",),
    )
    return out.select_columns(["language", "title", "item", "lat", "lon"])


SQL_WIKI_ARTICLE_FULL = """
WITH geo AS (
  SELECT doc_id,
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
)
SELECT d.lang AS language, 'Doc_' || d.doc_id AS title,
       CASE WHEN d.doc_id % 3 <> 1 THEN 'Q' || d.doc_id END AS item,
       CASE WHEN d.doc_id % 3 <> 1 THEN g.lat END AS lat,
       CASE WHEN d.doc_id % 3 <> 1 THEN g.lon END AS lon
FROM documents d LEFT JOIN geo g ON g.doc_id = d.doc_id
"""


WIKIPROCESS_QUERIES = {
    "wiki_pagelinks_counts": q_wiki_pagelinks_counts,
    "wiki_redirect_resolve": q_wiki_redirect_resolve,
    "wiki_geo_enrich": q_wiki_geo_enrich,
    "wiki_place_pick": q_wiki_place_pick,
    "wiki_sitelinks_join": q_wiki_sitelinks_join,
    "wiki_article_full": q_wiki_article_full,
}

WIKIPROCESS_ORACLES = {
    "wiki_pagelinks_counts": SQL_WIKI_PAGELINKS_COUNTS,
    "wiki_redirect_resolve": SQL_WIKI_REDIRECT_RESOLVE,
    "wiki_geo_enrich": SQL_WIKI_GEO_ENRICH,
    "wiki_place_pick": SQL_WIKI_PLACE_PICK,
    "wiki_sitelinks_join": SQL_WIKI_SITELINKS_JOIN,
    "wiki_article_full": SQL_WIKI_ARTICLE_FULL,
}
