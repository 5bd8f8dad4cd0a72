"""Corpus-analysis queries: vocabulary building, quality filtering, and
duplicate-cluster assignment (training-data suite, first-class per the
brief; all three DuckDB-oracle-checked).

- ``vocab_topk``: global word-bigram frequency top-k — the vocabulary /
  n-gram-counting primitive. The token distribution is heavily skewed
  (stop-bigrams), so the shuffle uses the combiner path: each block
  collapses to one row per bigram before anything moves
  (stages/salted.merge_group_sums).
- ``quality_filter``: Gopher-style document quality gate (word-count
  bounds, mean-word-length bounds, minimum stopword evidence — see
  Rae et al. 2021 §A1.1) expressed in pure integer arithmetic so the
  DuckDB oracle matches bitwise.
- ``dup_clusters``: transitive duplicate clusters — consecutive-pair
  char-3-gram Jaccard edges at ≥ 0.5 fed into distributed connected
  components (ops/cc.py, hash-to-min + pointer jumping); the oracle
  replicates the whole thing with a recursive CTE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

from ..ops.cc import connected_components
from ..ops.textstats import STOPWORDS, TOKEN_PATTERN
from ..stages.salted import merge_group_sums

# ---------------------------------------------------------------------------
# vocab_topk — word-bigram counts, global top-100


def _token_lists(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower → split on non-[a-z0-9] (RE2 kernel); empties filtered by
    the callers via flat-level masks."""
    low = pc.utf8_lower(texts)
    return pc.split_pattern_regex(low, "[^a-z0-9]+")


def q_vocab_topk(sf_dir: str) -> Dataset:
    k = 100

    def partial(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy()
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        if len(flat) < 2:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        # bigram = tok[j] + " " + tok[j+1] where both belong to one doc
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        bi = pc.binary_join_element_wise(left, right, " ")
        same_doc = parent[:-1] == parent[1:]
        bi = bi.filter(pa.array(same_doc))
        vc = pc.value_counts(bi)
        return pa.table(
            {"token": vc.field("values"),
             "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = docs.map_batches(partial, batch_format="pyarrow")
    merged = merge_group_sums(partials, ["token"], ["cnt"])
    return merged.sort(["cnt", "token"], descending=[True, False]).limit(k)


SQL_VOCAB_TOPK = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk FROM documents
),
bi AS (
  SELECT tk[CAST(i.i AS INT)] || ' ' || tk[CAST(i.i AS INT) + 1] AS token
  FROM t, range(1, 2001) i(i) WHERE i.i <= len(tk) - 1
)
SELECT token, COUNT(*) AS cnt FROM bi
GROUP BY token ORDER BY cnt DESC, token LIMIT 100
"""


# ---------------------------------------------------------------------------
# quality_filter — Gopher-style gate in integer arithmetic


def q_quality_filter(sf_dir: str) -> Dataset:
    stop_set = pa.array(sorted(STOPWORDS), type=pa.string())

    def score(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy()
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        parent = parent[keep]
        flat = flat.filter(pa.array(keep))
        ndocs = len(t)
        n_words = np.bincount(parent, minlength=ndocs).astype(np.int64)
        lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
        n_alpha = np.bincount(parent, weights=lens, minlength=ndocs).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parent, weights=is_stop, minlength=ndocs).astype(np.int64)
        passing = (
            (n_words >= 30)
            & (n_words <= 80)
            & (n_alpha >= 3 * n_words)
            & (n_alpha <= 8 * n_words)
            & (n_stop >= 2)
        )
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_alpha": pa.array(n_alpha),
                "n_stop": pa.array(n_stop),
            }
        )
        return out.filter(pa.array(passing))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(score, batch_format="pyarrow")


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

SQL_QUALITY_FILTER = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk
  FROM documents
),
s AS (
  SELECT doc_id, len(tk) AS n_words,
         CAST(COALESCE(list_sum(list_transform(tk, x -> length(x))), 0)
              AS BIGINT) AS n_alpha,
         len(list_filter(tk, x -> x IN ({_STOP_SQL}))) AS n_stop
  FROM t
)
SELECT doc_id, n_words, n_alpha, n_stop FROM s
WHERE n_words BETWEEN 30 AND 80
  AND n_alpha >= 3 * n_words AND n_alpha <= 8 * n_words
  AND n_stop >= 2
"""


# ---------------------------------------------------------------------------
# dup_clusters — transitive near-dup clusters via connected components


def q_dup_clusters(sf_dir: str) -> Dataset:
    """Edges: consecutive-doc pairs (d, d+1) with exact char-3-gram
    Jaccard ≥ 0.5 (the deterministic, SQL-replicable stand-in for an LSH
    candidate set — the CC machinery is candidate-source-agnostic);
    labels via ops/cc.connected_components."""
    from ..ops.dedup import ngram_jaccard_pairs

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def mk_pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids < n - 1]
        return pa.table({"doc_a": pa.array(ids), "doc_b": pa.array(ids + 1)})

    docs_ids = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    pairs = docs_ids.map_batches(mk_pairs, batch_format="pyarrow")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    jac = ngram_jaccard_pairs(pairs, docs, n=3)
    edges = jac.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], pa.scalar(0.5)))
        .select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
    )
    labels = connected_components(
        docs_ids, edges, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


SQL_DUP_CLUSTERS = """
WITH RECURSIVE grams AS (
  SELECT DISTINCT d.doc_id, substr(d.text, CAST(i.i AS INT), 3) AS g
  FROM documents d, range(1, 1001) i(i)
  WHERE i.i <= length(d.text) - 2
),
sizes AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY 1),
prs AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
  WHERE doc_id + 1 <= (SELECT MAX(doc_id) FROM documents)
),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS ni
  FROM prs p
  JOIN grams ga ON ga.doc_id = p.a
  JOIN grams gb ON gb.doc_id = p.b AND gb.g = ga.g
  GROUP BY 1, 2
),
jac AS (
  SELECT p.a, p.b,
         COALESCE(i.ni, 0) * 1.0 / (sa.ng + sb.ng - COALESCE(i.ni, 0)) AS j
  FROM prs p
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
  JOIN sizes sa ON sa.doc_id = p.a
  JOIN sizes sb ON sb.doc_id = p.b
),
und AS (
  SELECT a, b FROM jac WHERE j >= 0.5
  UNION ALL
  SELECT b, a FROM jac WHERE j >= 0.5
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""


CORPUSOPS_QUERIES = {
    "vocab_topk": q_vocab_topk,
    "quality_filter": q_quality_filter,
    "dup_clusters": q_dup_clusters,
}

CORPUSOPS_ORACLES = {
    "vocab_topk": SQL_VOCAB_TOPK,
    "quality_filter": SQL_QUALITY_FILTER,
    "dup_clusters": SQL_DUP_CLUSTERS,
}
