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
from ..stages.salted import partial_count
from . import geopipeline as gp


def _articles(sf_dir: str) -> Dataset:
    """Scored, geotagged article rows: (language, type='a', title,
    importance, ref_doc_id)."""
    from .queries import q_importance

    cfg = DEFAULT_CONFIG
    meta = gp.extract(gp.load_pages(sf_dir), cfg).select_columns(
        ["doc_id", "lang", "title", "has_geo"]
    )
    imp = q_importance(sf_dir).select_columns(["doc_id", "importance"])
    joined = imp.join(meta, "inner", num_partitions=8, on=("doc_id",))

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


def _redirects_raw(sf_dir: str) -> Dataset:
    """(language, from_title, target_title) per the derivation contract."""
    cfg = DEFAULT_CONFIG
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    meta = gp.extract(gp.load_pages(sf_dir), cfg).select_columns(["doc_id", "lang"])

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
    articles = _articles(sf_dir).materialize()  # reused 3× (join/anti/union)

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
    red = _redirects_raw(sf_dir).join(
        art_keyed, "inner", num_partitions=8,
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

    # D9: anti-join — articles win over redirects on (language, title)
    red = red.join(
        art_keyed, "left_anti", num_partitions=8,
        on=("language", "title"), right_on=("a_language", "a_title"),
    )

    unioned = articles.union(red)

    # E6 + D10: per-language sizes of the FINAL table, broadcast back
    sizes = partial_count(unioned.select_columns(["language"]), ["language"], out="lang_size")
    size_map = {r["language"]: r["lang_size"] for r in sizes.take_all()}

    def add_size(t: pa.Table) -> pa.Table:
        langs = t.column("language").to_pylist()
        return t.append_column(
            "lang_size", pa.array([size_map[l] for l in langs], type=pa.int64())
        )

    out = unioned.map_batches(add_size, batch_format="pyarrow")

    # F1: global sort (range-partitioned shuffle in Ray Data)
    return out.sort(
        ["lang_size", "language", "type", "title"],
        descending=[True, False, False, False],
    )


SQL_PAGE_IMPORTANCE_EXPORT_BODY = """
imp AS (
  SELECT doc_id,
         ROUND(GREATEST(LN(totalcount) / LN((SELECT m FROM maxt)), 1e-10), 9)
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
