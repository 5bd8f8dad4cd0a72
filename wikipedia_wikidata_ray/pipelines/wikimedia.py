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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from ..config import DEFAULT_CONFIG
from ..stages.salted import partial_count
from . import geopipeline as gp


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
        from_title = [
            f"Doc_{d}" if d % 2 == 1 else f"Doc_{d}_alias" for d in did
        ]
        return pa.table(
            {
                "language": langs,
                "from_title": pa.array(from_title, type=pa.string()),
                "target_title": pa.array([f"Doc_{t_}" for t_ in tgt], type=pa.string()),
            }
        )

    return meta.map_batches(derive, batch_format="pyarrow")


def q_page_importance_export(sf_dir: str) -> Dataset:
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return export_pipeline(lambda: gp.load_pages(sf_dir), n_docs)


def export_pipeline(pages_fn, n_docs: int) -> Dataset:
    """Full output pipeline (F3/D8/D9/F8/E6/D10/F1) over any pages source.

    Page metadata is extracted ONCE and pinned — it feeds the importance
    article side, the article join, and the redirect derivation."""
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
