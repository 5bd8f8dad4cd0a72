"""Physical-plan gate equality: every size-gated operator has two plans
(broadcast below the limit, distributed hash join / shuffle above), and
the two must be ROW-IDENTICAL on the same input. Forcing the limit to 0
exercises the at-scale plan on the small fixture (round-3 verdict next
items #2 and #7 — the shuffle plans existed but only the broadcast plans
were oracle-exercised)."""

from __future__ import annotations

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _sorted_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns), ignore_index=True)
    )


def test_resolve_pagelinks_broadcast_eq_join(ray_session):
    """C1: broadcast lookup == distributed hash join (same ns-0 filter,
    same drop-miss inner semantics; reference pressure point
    steps/wikipedia_sql2csv.sh:58-59)."""
    from wikipedia_wikidata_ray.pipelines.wikiprocess import resolve_pagelinks
    from wikipedia_wikidata_ray.sources import wiki_fixtures as wf
    from wikipedia_wikidata_ray.stages.salted import partial_count

    def run(limit):
        joined = resolve_pagelinks(
            wf.wp_pagelinks(SF_DIR),
            wf.wp_linktarget(SF_DIR),
            id_col="lt_id",
            title_col="lt_title",
            broadcast_limit=limit,
        )
        return _sorted_df(
            partial_count(joined, ["lang", "pl_title"], out="langcount")
        )

    bcast = run(None)  # default limit → broadcast plan
    join = run(0)  # forced join plan
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, join)


def test_importance_broadcast_eq_shuffle(ray_session):
    """E1-E5/D2: dense-broadcast link fold == pre-count + hash-join shuffle
    plan (queries.py:367-370). Scores must be bitwise identical — both
    plans feed integer counts into the same LN/GREATEST sequence."""
    from wikipedia_wikidata_ray.pipelines import geopipeline as gp
    from wikipedia_wikidata_ray.pipelines.queries import importance_pipeline

    def run(limit):
        return _sorted_df(
            importance_pipeline(
                lambda: gp.load_pages(SF_DIR), broadcast_limit=limit
            )
        )

    bcast = run(20_000_000)
    shuf = run(0)
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, shuf)


def test_tfidf_df_broadcast_eq_join(ray_session):
    """J14: index_in broadcast probe of the df vocabulary == token-keyed
    hash join (webtext.TFIDF_DF_BROADCAST_LIMIT gate)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.webtext import tfidf_top_terms

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    def run(limit):
        docs = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        return _sorted_df(tfidf_top_terms(docs, n_docs, df_broadcast_limit=limit))

    bcast = run(None)
    join = run(0)
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, join)


def test_bm25_df_broadcast_eq_join(ray_session):
    """J25: BM25 rides attach_df's gate too — index_in broadcast probe ==
    token-keyed hash join."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.webtext import bm25_top_terms

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    def run(limit):
        docs = rd.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        return _sorted_df(bm25_top_terms(docs, n_docs, df_broadcast_limit=limit))

    bcast = run(None)
    join = run(0)
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, join)


def test_export_broadcast_eq_join(ray_session):
    """F3/D8/D9/F8/F1: export_pipeline's broadcast-searchsorted plan ==
    its >20M-doc hash-join plan, full sorted output equality."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines import geopipeline as gp
    from wikipedia_wikidata_ray.pipelines.wikimedia import export_pipeline

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    def run(limit):
        return _sorted_df(
            export_pipeline(lambda: gp.load_pages(SF_DIR), n_docs,
                            broadcast_limit=limit)
        )

    bcast = run(20_000_000)
    join = run(0)
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, join)


def test_part_brand_revenue_plans_equal(ray_session):
    """Part-dimension attach: broadcast index_in plan == forced
    partkey-keyed hash join plan (the largest-TPC-H-dimension gate)."""
    from wikipedia_wikidata_ray.pipelines.relational import (
        q_part_brand_revenue)

    got = _sorted_df(q_part_brand_revenue(SF_DIR))
    forced = _sorted_df(
        q_part_brand_revenue(SF_DIR, part_broadcast_limit=0))
    pd.testing.assert_frame_equal(got, forced)
