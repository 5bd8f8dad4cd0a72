"""Reference output-pipeline parity: the ``wikimedia_importance`` export
semantics (steps/output.sh:26-128) re-expressed over the derived pages
corpus.

Covers, in one oracle-checked pipeline (SURVEY.md §2):
- F3  output filter (scored, geotagged articles — the ``wd_page_title IS
      NOT NULL`` analog is ``has_geo``)
- D8  semi-join: redirects kept only when their target article exists
      (steps/output.sh:41-49)
- D9  anti-join first-wins dedup: a redirect whose (language, title)
      collides with an article is dropped (steps/output.sh:62-71)
- F8  union of article + redirect rows
- E6  per-language row counts (steps/output.sh:103-109)
- D10 broadcast join of language sizes (steps/output.sh:118-123)
- F1  global sort by (lang_size DESC, language, type, title) — the
      reference order plus an explicit language tiebreak (the reference
      leaves equal-size languages unordered; we define a deterministic
      total order, documented divergence)

Redirect derivation contract (closed-form, SQL-replicable — see
pipelines/queries.py SQL):

  every doc with ``doc_id % 7 == 3`` defines a redirect in its own lang:
    from_title = 'Doc_{id}'          if doc_id odd   (collides → D9 path)
                 'Doc_{id}_alias'    if doc_id even
    target     = 'Doc_{(id*11+3) % N}'
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from ..config import DEFAULT_CONFIG
from ..stages.extract import meta_links_batch, outlinks_flatten
from ..stages.salted import partial_count
from . import geopipeline as gp

# Same bar as queries._fold_links_broadcast: per-doc metadata (int codes +
# short title strings, ~40 B/doc) broadcasts comfortably to ~20M docs as a
# single ray.put object fetched once per node; above it, every lookup in
# this module falls back to the hash-join plan.
BROADCAST_DOC_LIMIT = 20_000_000


def _join_partitions() -> int:
    try:
        import ray

        return max(8, int(ray.cluster_resources().get("CPU", 16)) // 2)
    except Exception:
        return 8


def _articles(pages_fn, meta: Dataset | None = None) -> Dataset:
    """Scored, geotagged article rows: (language, type='a', title,
    importance, ref_doc_id). ``meta`` optionally supplies the shared
    extracted page metadata (doc_id, lang, title, has_geo)."""
    from .queries import importance_pipeline

    cfg = DEFAULT_CONFIG
    if meta is None:
        meta = gp.extract(pages_fn(), cfg).select_columns(
            ["doc_id", "lang", "title", "has_geo"]
        )
    imp = importance_pipeline(pages_fn, articles=meta).select_columns(
        ["doc_id", "importance"]
    )
    joined = imp.join(meta, "inner", num_partitions=_join_partitions(), on=("doc_id",))

    def shape(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("has_geo"))
        return pa.table(
            {
                "language": t.column("lang"),
                "type": pa.array(["a"] * len(t), type=pa.string()),
                "title": t.column("title"),
                "importance": t.column("importance"),
                "ref_doc_id": t.column("doc_id"),
            }
        )

    return joined.map_batches(shape, batch_format="pyarrow")


def _redirects_raw(pages_fn, n_docs: int, meta: Dataset | None = None) -> Dataset:
    """(language, from_title, target_title) per the derivation contract."""
    cfg = DEFAULT_CONFIG
    if meta is None:
        meta = gp.extract(pages_fn(), cfg)
    meta = meta.select_columns(["doc_id", "lang"])

    def derive(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy()
        keep = did % 7 == 3
        did = did[keep]
        langs = t.column("lang").filter(pa.array(keep))
        tgt = (did * 11 + 3) % n_docs

        def doc_title(ids: np.ndarray) -> pa.Array:
            return pc.binary_join_element_wise(
                pa.scalar("Doc_"), pc.cast(pa.array(ids), pa.string()), ""
            )

        base = doc_title(did)
        from_title = pc.if_else(
            pa.array(did % 2 == 1),
            base,
            pc.binary_join_element_wise(base, pa.scalar("_alias"), ""),
        )
        return pa.table(
            {
                "language": langs,
                "from_title": pc.cast(from_title, pa.string()),
                "target_title": pc.cast(doc_title(tgt), pa.string()),
            }
        )

    return meta.map_batches(derive, batch_format="pyarrow")


def q_page_importance_export(sf_dir: str) -> Dataset:
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return export_pipeline(lambda: gp.load_pages(sf_dir), n_docs)


def _join_keys(langs, titles) -> pa.Array:
    """(language, title) → one Arrow string key via '\\x1f' join. The unit
    separator cannot appear in titles (reference titles are
    underscore-normalized printable text, bin/filter_page.py semantics),
    so ``pc.index_in`` over these keys reproduces the two-column join's
    string-equality semantics exactly — entirely in Arrow C++. (Replaces a
    fixed-width numpy 'S'-dtype key build: its (n, maxlen) int64/bool
    temporaries hit multi-second first-touch page-fault stalls on fresh
    processes in this environment — measured 20+ s at 700K keys vs ~40 ms
    for this kernel.)"""
    joined = pc.binary_join_element_wise(
        pc.cast(langs, pa.string()), pc.cast(titles, pa.string()), "\x1f"
    )
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return joined


def _attach_meta_broadcast(imp: Dataset, meta: Dataset) -> Dataset:
    """F3 article shaping without a shuffle (broadcast path).

    The materialized per-doc metadata is assembled from its blocks as
    zero-copy plasma views and ray.put once (no driver-side sort — the
    probe is an Arrow hash lookup, not searchsorted); each importance
    batch resolves (lang, title, has_geo) with one ``pc.index_in``.
    Replaces a doc_id hash join that measured ~20 s on 1M×1M rows
    (round-2 bench regression, BASELINE.md); the join plan remains the
    > BROADCAST_DOC_LIMIT fallback."""
    import ray as _ray

    tbl = pa.concat_tables([_ray.get(r) for r in meta.to_arrow_refs()]).combine_chunks()
    ref = _ray.put(
        (
            pc.cast(tbl.column("doc_id"), pa.int64()).combine_chunks(),
            tbl.column("lang").combine_chunks(),
            tbl.column("title").combine_chunks(),
            tbl.column("has_geo").combine_chunks(),
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        ids, langs, titles, geo = _ray.get(ref)
        # an importance doc_id absent from meta must DROP (inner-join
        # semantics, matching the hash-join fallback): index_in yields
        # null there, and the is_valid conjunct filters it.
        idx = pc.index_in(pc.cast(t.column("doc_id"), pa.int64()), value_set=ids)
        hit = pc.is_valid(idx)
        out = pa.table(
            {
                "language": pc.take(langs, idx),
                "type": pa.array(["a"] * len(t), type=pa.string()),
                "title": pc.take(titles, idx),
                "importance": t.column("importance"),
                "ref_doc_id": t.column("doc_id"),
            }
        )
        return out.filter(
            pc.and_(hit, pc.fill_null(pc.take(geo, idx), False))
        )

    return imp.map_batches(attach, batch_format="pyarrow", batch_size=65536)


def _redirect_lookup_ref(articles: Dataset):
    """Broadcast (language,title)-keyed article lookup: Arrow string keys +
    aligned importance/ref arrays, built from zero-copy block views. No
    sort — the probe side uses ``pc.index_in`` (hash lookup), not
    searchsorted."""
    import ray as _ray

    tbl = pa.concat_tables(
        [_ray.get(r) for r in articles.to_arrow_refs()]
    ).combine_chunks()
    keys = _join_keys(tbl.column("language"), tbl.column("title"))
    return _ray.put(
        (
            keys,
            tbl.column("importance").combine_chunks(),
            tbl.column("ref_doc_id").combine_chunks(),
        )
    )


def _resolve_redirects_broadcast(red_raw: Dataset, lookup_ref) -> Dataset:
    """D8 semi + D9 anti in one vectorized pass against the broadcast
    article lookup: keep a redirect iff its target exists as an article
    (fetching that article's importance/ref) AND its own (language,
    from_title) does not collide with an article."""
    import ray as _ray

    def resolve(t: pa.Table) -> pa.Table:
        keys, imp, refv = _ray.get(lookup_ref)
        if len(keys) == 0 or len(t) == 0:
            return pa.table(
                {
                    "language": pa.array([], type=pa.string()),
                    "type": pa.array([], type=pa.string()),
                    "title": pa.array([], type=pa.string()),
                    "importance": pa.array([], type=pa.float64()),
                    "ref_doc_id": pa.array([], type=pa.int64()),
                }
            )
        tk = _join_keys(t.column("language"), t.column("target_title"))
        fk = _join_keys(t.column("language"), t.column("from_title"))
        ti = pc.index_in(tk, value_set=keys)  # null ⇔ target not an article
        fi = pc.index_in(fk, value_set=keys)  # null ⇔ no (lang,title) clash
        keep = pc.and_(pc.is_valid(ti), pc.is_null(fi))
        ti = ti.filter(keep)
        return pa.table(
            {
                "language": t.column("language").filter(keep),
                "type": pa.array(["r"] * len(ti), type=pa.string()),
                "title": t.column("from_title").filter(keep),
                "importance": pc.take(imp, ti),
                "ref_doc_id": pc.take(refv, ti),
            }
        )

    return red_raw.map_batches(resolve, batch_format="pyarrow", batch_size=65536)


def export_pipeline(pages_fn, n_docs: int,
                    broadcast_limit: int = BROADCAST_DOC_LIMIT) -> Dataset:
    """Full output pipeline (F3/D8/D9/F8/E6/D10/F1) over any pages source.

    Broadcast plan (n_docs ≤ broadcast_limit): ONE html parse emits
    metadata + outlink lists (``meta_links_batch``), and the three
    per-doc-keyed joins (importance⋈meta, D8, D9) become broadcast
    searchsorted lookups — zero extra shuffles; only the importance merge
    and the F1 sort move data. Above the limit: metadata is extracted once
    and pinned, and the same semantics run as hash joins."""
    from .queries import importance_pipeline

    if n_docs <= broadcast_limit:
        cfg = DEFAULT_CONFIG
        combined = pages_fn().map_batches(
            meta_links_batch, batch_format="pyarrow",
            batch_size=cfg.batch_size_extract,
        ).materialize()
        meta = combined.drop_columns(["outlink_tgts"])
        links = combined.select_columns(
            ["doc_id", "lang", "outlink_tgts"]
        ).map_batches(outlinks_flatten, batch_format="pyarrow")
        imp = importance_pipeline(
            pages_fn, articles=meta, links=links, n_articles=n_docs
        ).select_columns(["doc_id", "importance"])
        articles = _attach_meta_broadcast(imp, meta).materialize()
        red = _resolve_redirects_broadcast(
            _redirects_raw(pages_fn, n_docs, meta),
            _redirect_lookup_ref(articles),
        ).materialize()
        unioned = articles.union(red)
        return _finish_export(unioned)

    meta = gp.extract(pages_fn(), DEFAULT_CONFIG).select_columns(
        ["doc_id", "lang", "title", "has_geo"]
    ).materialize()
    articles = _articles(pages_fn, meta).materialize()  # reused 3× (join/anti/union)

    art_keyed = articles.map_batches(
        lambda t: pa.table(
            {
                "a_language": t.column("language"),
                "a_title": t.column("title"),
                "a_importance": t.column("importance"),
                "a_ref": t.column("ref_doc_id"),
            }
        ),
        batch_format="pyarrow",
    )

    # D8: redirect target must exist as kept article (inner join ≡ semi +
    # fetch of the target's importance, exactly output.sh:62-71)
    red = _redirects_raw(pages_fn, n_docs, meta).join(
        art_keyed, "inner", num_partitions=_join_partitions(),
        on=("language", "target_title"), right_on=("a_language", "a_title"),
    )

    red = red.map_batches(
        lambda t: pa.table(
            {
                "language": t.column("language"),
                "type": pa.array(["r"] * len(t), type=pa.string()),
                "title": t.column("from_title"),
                "importance": t.column("a_importance"),
                "ref_doc_id": t.column("a_ref"),
            }
        ),
        batch_format="pyarrow",
    )

    # D9: anti-join — articles win over redirects on (language, title).
    # Materialized: the union below is consumed twice (E6 sizes + final
    # output) and the redirect subgraph re-extracts pages — pin the small
    # result instead of running that subgraph twice.
    red = red.join(
        art_keyed, "left_anti", num_partitions=_join_partitions(),
        on=("language", "title"), right_on=("a_language", "a_title"),
    ).materialize()

    unioned = articles.union(red)
    return _finish_export(unioned)


def _finish_export(unioned: Dataset) -> Dataset:

    # E6 + D10: per-language sizes of the FINAL table, broadcast back
    sizes = partial_count(unioned.select_columns(["language"]), ["language"], out="lang_size")
    size_map = {r["language"]: r["lang_size"] for r in sizes.take_all()}
    key_arr = pa.array(sorted(size_map), type=pa.string())
    val_arr = pa.array([size_map[k.as_py()] for k in key_arr], type=pa.int64())

    def add_size(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("language"), value_set=key_arr)
        return t.append_column("lang_size", pc.take(val_arr, idx))

    out = unioned.map_batches(add_size, batch_format="pyarrow")

    # F1: global sort (range-partitioned shuffle in Ray Data)
    return out.sort(
        ["lang_size", "language", "type", "title"],
        descending=[True, False, False, False],
    )


SQL_PAGE_IMPORTANCE_EXPORT_BODY = """
imp AS (
  SELECT doc_id,
         ROUND(GREATEST(LN(totalcount) / LN((SELECT m FROM maxt)), 1e-10), 10)
           AS importance
  FROM scored
),
articles AS (
  SELECT d.lang AS language, 'a' AS type,
         'Doc_' || d.doc_id AS title, i.importance, d.doc_id AS ref_doc_id
  FROM documents d JOIN imp i ON i.doc_id = d.doc_id
  WHERE d.doc_id % 10 < 7
),
redirects AS (
  SELECT d.lang AS language, 'r' AS type,
         CASE WHEN d.doc_id % 2 = 1 THEN 'Doc_' || d.doc_id
              ELSE 'Doc_' || d.doc_id || '_alias' END AS title,
         a.importance, a.ref_doc_id
  FROM documents d
  JOIN articles a
    ON a.language = d.lang
   AND a.title = 'Doc_' || ((d.doc_id * 11 + 3) % (SELECT c FROM n))
  WHERE d.doc_id % 7 = 3
),
kept_redirects AS (
  SELECT r.language, r.type, r.title, r.importance, r.ref_doc_id
  FROM redirects r
  ANTI JOIN articles a ON a.language = r.language AND a.title = r.title
),
unioned AS (
  SELECT * FROM articles UNION ALL SELECT * FROM kept_redirects
),
sizes AS (SELECT language, COUNT(*) AS lang_size FROM unioned GROUP BY language)
SELECT u.language, u.type, u.title, u.importance, u.ref_doc_id, s.lang_size
FROM unioned u JOIN sizes s USING (language)
"""
