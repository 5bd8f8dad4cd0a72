"""Reference-shaped relational fixture tables (FIXTURES.md §2), derived
1:1 from the driver's ``documents`` table with closed-form integer
arithmetic so every derived table is replicable in ANSI SQL (the DuckDB
oracle side lives in pipelines/wikiprocess.py).

Derivation contracts (N = row count of documents; keep in sync with SQL):

- wp_page        every doc:      (lang, page_id=doc_id, page_title='Doc_'||doc_id)
- wp_redirect    doc_id%7==3:    (lang, rd_from=doc_id,
                                  rd_title='Doc_'||((doc_id*11+3)%N))
- wp_linktarget  doc_id%13!=0:   (lt_id=doc_id, lt_title='Doc_'||doc_id)
                 (%13==0 ids missing → exercises C1 drop-miss semantics,
                  bin/filter_pagelinks.py:38-40)
- wp_pagelinks   3 edges/doc (the links contract of pages_gen):
                 (lang=src_lang, pl_from=src, pl_namespace=(src+tgt)%4,
                  pl_target_id=tgt)  — ns!=0 rows dropped downstream
- wd_page        doc_id%3!=1:    (page_id=doc_id, page_title='Q'||doc_id)
- wd_geo_tags    geo contract rows (doc_id%10<7) rounded to 5dp, with the
                 doc_id%4==0 rows DUPLICATED (exercises D3's DISTINCT,
                 steps/wikidata_process.sh:28)
- wb_items_per_site every doc:   (ips_item_id=doc_id,
                 ips_site_id=lang||'wiki', ips_site_page='Doc '||doc_id)
                 (space in title → exercises B7 underscore normalization)
- wikidata_place_dump doc_id%3!=1, j in 0..doc_id%3:
                 (item='Q'||doc_id, instance_of='T'||((doc_id+j)%5))
                 (multi-typed items → exercises F5's tie-break)
- place_type_levels (broadcast, D4): {'T0':1,'T1':2,'T2':3,'T3':4,'T4':5}
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

from .pages_gen import derive_geo, derive_outlinks

PLACE_TYPE_LEVELS: dict[str, int] = {f"T{k}": k + 1 for k in range(5)}


def n_documents(sf_dir: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def _docs(sf_dir: str) -> Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )


def _title(prefix: str, ids: np.ndarray) -> pa.Array:
    return pc.binary_join_element_wise(
        pa.array([prefix] * len(ids)), pc.cast(pa.array(ids), pa.string()), ""
    )


def wp_page(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "lang": t["lang"],
                "page_id": pa.array(ids),
                "page_title": _title("Doc_", ids),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wp_redirect(sf_dir: str) -> Dataset:
    n = n_documents(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % 7 == 3
        ids = ids[keep]
        return pa.table(
            {
                "lang": pc.filter(t["lang"], pa.array(keep)),
                "rd_from": pa.array(ids),
                "rd_title": _title("Doc_", (ids * 11 + 3) % n),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wp_linktarget(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids % 13 != 0]
        return pa.table(
            {"lt_id": pa.array(ids), "lt_title": _title("Doc_", ids)}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wp_pagelinks(sf_dir: str) -> Dataset:
    n = n_documents(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        tgts = derive_outlinks(ids, n)  # (len, 3)
        src = np.repeat(ids, 3)
        lang = pc.take(t["lang"], pa.array(np.repeat(np.arange(len(ids)), 3)))
        tgt = tgts.reshape(-1)
        return pa.table(
            {
                "lang": lang,
                "pl_from": pa.array(src),
                "pl_namespace": pa.array((src + tgt) % 4),
                "pl_target_id": pa.array(tgt),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wd_page(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids % 3 != 1]
        return pa.table(
            {"page_id": pa.array(ids), "page_title": _title("Q", ids)}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wd_geo_tags(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        lat, lon, has_geo = derive_geo(ids)
        ids, lat, lon = ids[has_geo], lat[has_geo], lon[has_geo]
        dup = ids % 4 == 0
        ids = np.concatenate([ids, ids[dup]])
        lat = np.concatenate([lat, lat[dup]])
        lon = np.concatenate([lon, lon[dup]])
        return pa.table(
            {
                "gt_page_id": pa.array(ids),
                "gt_lat": pa.array(np.round(lat, 5)),
                "gt_lon": pa.array(np.round(lon, 5)),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wb_items_per_site(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        site = pc.binary_join_element_wise(
            pc.cast(t["lang"], pa.string()), pa.array(["wiki"] * len(ids)), ""
        )
        return pa.table(
            {
                "ips_item_id": pa.array(ids),
                "ips_site_id": site,
                "ips_site_page": _title("Doc ", ids),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def wikidata_place_dump(sf_dir: str) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids % 3 != 1]
        reps = (ids % 3 + 1).astype(np.int64)
        item_ids = np.repeat(ids, reps)
        j = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "item": _title("Q", item_ids),
                "instance_of": _title("T", (item_ids + j) % 5),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")
