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
- ``corpus_curation``: the end-to-end curation composition a training-data
  user actually runs — quality gate → exact dedup (keep lowest doc_id per
  identical text) → per-language document/token totals — over the
  dup-augmented corpus. One pass computes gate features AND the content
  hash, so raw text never leaves the first stage; only (hash, id, lang,
  n_words) rows shuffle. Fully DuckDB-oracle-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

from ..ops.cc import connected_components
from ..ops.dedup import sha256_hex_col
from ..ops.textstats import STOPWORDS, TOKEN_PATTERN
from ..stages.salted import (
    default_partitions,
    merge_group_aggs,
    merge_group_sums,
)

# ---------------------------------------------------------------------------
# vocab_topk — word-bigram counts, global top-100


def _token_lists(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower → split on non-[a-z0-9] (RE2 kernel); empties filtered by
    the callers via flat-level masks."""
    low = pc.utf8_lower(texts)
    return pc.split_pattern_regex(low, "[^a-z0-9]+")


def q_vocab_topk(sf_dir: str) -> Dataset:
    return _vocab_topk_ds(sf_dir, k=100)


# Static caps for DuckDB range() cross-joins in oracle SQL (DuckDB's
# range() can't take lateral column params). Overflow would silently
# truncate grams → hidden divergence, so tools/check_oracle.py and
# tests/test_corpusops.py assert the fixture stays strictly below these.
ORACLE_TOKENS_CAP = 4000  # max tokens per document the oracles handle
ORACLE_CHARS_CAP = 4000   # max characters per document the oracles handle

SQL_VOCAB_TOPK = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk FROM documents
),
bi AS (
  SELECT tk[CAST(i.i AS INT)] || ' ' || tk[CAST(i.i AS INT) + 1] AS token
  FROM t, range(1, {ORACLE_TOKENS_CAP + 1}) i(i) WHERE i.i <= len(tk) - 1
)
SELECT token, COUNT(*) AS cnt FROM bi
GROUP BY token ORDER BY cnt DESC, token LIMIT 100
"""


# ---------------------------------------------------------------------------
# quality_filter — Gopher-style gate in integer arithmetic


_STOP_SET = pa.array(sorted(STOPWORDS), type=pa.string())


def _gate_features(t: pa.Table):
    """Vectorized Gopher-gate features for one Arrow batch: per-doc
    (n_words, n_alpha, n_stop, passing) as numpy arrays. Integer
    arithmetic only, so the DuckDB oracles match bitwise."""
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
    is_stop = pc.is_in(flat, value_set=_STOP_SET).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parent, weights=is_stop, minlength=ndocs).astype(np.int64)
    passing = (
        (n_words >= 30)
        & (n_words <= 80)
        & (n_alpha >= 3 * n_words)
        & (n_alpha <= 8 * n_words)
        & (n_stop >= 2)
    )
    return n_words, n_alpha, n_stop, passing


def q_quality_filter(sf_dir: str) -> Dataset:
    def score(t: pa.Table) -> pa.Table:
        n_words, n_alpha, n_stop, passing = _gate_features(t)
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


SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE grams AS (
  SELECT DISTINCT d.doc_id, substr(d.text, CAST(i.i AS INT), 3) AS g
  FROM documents d, range(1, {ORACLE_CHARS_CAP + 1}) i(i)
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


# ---------------------------------------------------------------------------
# corpus_curation — gate → exact dedup → per-language totals, end to end


def curate_survivors(docs: Dataset) -> Dataset:
    """Steps 1-3 of the curation pipeline (gate → hash-dedup →
    semi-join) as a reusable Dataset of surviving rows
    (doc_id, lang, n_words, content_hash) — consumed by curate_corpus's
    per-language rollup and by the geo composite
    (queries.q_curated_tile_corpus). Returns None when the gate passes
    zero rows (the caller short-circuits — empty-side join guard)."""

    def gate_hash(t: pa.Table) -> pa.Table:
        n_words, _, _, passing = _gate_features(t)
        kept = t.filter(pa.array(passing))
        h = sha256_hex_col(kept["text"])
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "lang": kept["lang"],
                "n_words": pa.array(n_words[passing]),
                "content_hash": pa.array(h, type=pa.string()),
            }
        )

    gated = docs.map_batches(gate_hash, batch_format="pyarrow")
    # consumed twice (dedup partials + semi-join left side); pin it
    gated = gated.materialize()
    if gated.count() == 0:
        return None

    def hash_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["content_hash"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["content_hash", "doc_id"])

    keep_ids = merge_group_aggs(
        gated.map_batches(hash_partial, batch_format="pyarrow"),
        ["content_hash"],
        [("doc_id", "min")],
    ).select_columns(["doc_id"])
    return gated.join(
        keep_ids,
        "left_semi",
        num_partitions=default_partitions(),
        on=("doc_id",),
    )


def curate_corpus(docs: Dataset) -> Dataset:
    """The composed curation pipeline over (doc_id, text, lang) rows:

    1. one ``map_batches`` pass computes the Gopher gate features AND the
       sha256 content hash of passing docs — raw text is dropped here, so
       everything downstream shuffles only (hash, id, lang, n_words);
    2. exact dedup keeps the LOWEST doc_id per identical text: per-batch
       (content_hash → min doc_id) partials merged by
       ``stages/salted.merge_group_aggs`` (one range-sort shuffle);
    3. survivors semi-join back on doc_id (unique key, hash join) to
       recover lang/n_words — identical texts may carry different langs,
       so the winner's OWN lang must be looked up, not aggregated;
    4. per-language totals ride the ``merge_group_sums`` combiner path.

    At 100 TB: text moves zero times, the dedup shuffle carries 48 bytes/
    row, and the semi-join is int64-keyed. Reference analog: the quality +
    DISTINCT + per-language GROUP BY sequence of
    steps/wikidata_process.sh:28-66, fused into one streaming plan."""

    surv = curate_survivors(docs)
    if surv is None:  # empty-side join guard (legitimate: strict gate)
        return rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "total_words": pa.array([], type=pa.int64()),
                }
            )
        )

    def lang_partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_docs", pa.array(np.ones(len(t), dtype=np.int64)))
        g = t.group_by(["lang"]).aggregate([("n_docs", "sum"), ("n_words", "sum")])
        return g.rename_columns(["lang", "n_docs", "total_words"])

    return merge_group_sums(
        surv.map_batches(lang_partial, batch_format="pyarrow"),
        ["lang"],
        ["n_docs", "total_words"],
    )


def q_corpus_curation(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def dup(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = t.filter(pa.array(ids % 5 == 0))
        shifted = keep.set_column(
            0, "doc_id", pc.add(keep["doc_id"], pa.scalar(n, type=pa.int64()))
        )
        return pa.concat_tables([t, shifted])

    return curate_corpus(docs.map_batches(dup, batch_format="pyarrow"))


SQL_CORPUS_CURATION = f"""
WITH docs2l AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + (SELECT COUNT(*) FROM documents), text, lang
  FROM documents WHERE doc_id % 5 = 0
),
t AS (
  SELECT doc_id, lang, text,
         regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk
  FROM docs2l
),
s AS (
  SELECT doc_id, lang, text, len(tk) AS n_words,
         CAST(COALESCE(list_sum(list_transform(tk, x -> length(x))), 0)
              AS BIGINT) AS n_alpha,
         len(list_filter(tk, x -> x IN ({_STOP_SQL}))) AS n_stop
  FROM t
),
gated AS (
  SELECT doc_id, lang, text, n_words FROM s
  WHERE n_words BETWEEN 30 AND 80
    AND n_alpha >= 3 * n_words AND n_alpha <= 8 * n_words
    AND n_stop >= 2
),
keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text)
SELECT g.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(g.n_words) AS BIGINT) AS total_words
FROM gated g SEMI JOIN keep k ON g.doc_id = k.doc_id
GROUP BY g.lang
"""


# ---------------------------------------------------------------------------
# hll_distinct_tokens — mergeable HyperLogLog registers per language


def q_hll_distinct_tokens(sf_dir: str) -> Dataset:
    """Per-language HLL registers (p=12) of the distinct-token set — the
    mergeable-sketch alternative to an exact COUNT(DISTINCT) shuffle.
    The query output IS the register state (pure integers, identical at
    any parallelism); ``ops.sketch.hll_estimate`` turns it into the
    cardinality estimate (accuracy pytest-checked)."""
    from ..ops.sketch import hll_token_registers

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    return hll_token_registers(docs, group_cols=["lang"])


SQL_HLL_DISTINCT_TOKENS = """
WITH toks AS (
  SELECT DISTINCT lang,
         UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
h AS (
  SELECT lang, CAST(('0x' || SUBSTR(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks
),
parts AS (
  SELECT lang, CAST(h >> 52 AS BIGINT) AS bucket,
         CAST(h & ((CAST(1 AS UBIGINT) << 52) - 1) AS BIGINT) AS w
  FROM h
)
SELECT lang, bucket,
       MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
FROM parts GROUP BY lang, bucket
"""


# ---------------------------------------------------------------------------
# heavy_hitter_tokens — exact ≥0.1% tokens via two-pass Misra–Gries


def q_heavy_hitter_tokens(sf_dir: str) -> Dataset:
    """Tokens with count ≥ N/1000 — exact output, but found with the
    Misra–Gries candidate sketch so the full vocabulary never shuffles
    (ops/sketch.heavy_hitter_tokens)."""
    from ..ops.sketch import heavy_hitter_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitter_tokens(docs, theta_denom=1000)


SQL_HEAVY_HITTER_TOKENS = """
WITH toks AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY token
HAVING COUNT(*) * 1000 >= (SELECT n FROM tot)
"""


# ---------------------------------------------------------------------------
# Q: bigram_pmi — top-k collocations by pointwise mutual information (the
# classic corpus-association statistic; useful for tokenizer/vocab design
# and boilerplate detection). Data movement is the vocab_topk shape: the
# corpus never shuffles — per-batch bigram/unigram value-count partials
# ride merge_group_sums, the top-k bigrams are a 50-row result, and the
# unigram counts needed for scoring are fetched for ≤ 2k candidate tokens
# only (candidate-bounded take; documented bound). Float policy: identical
# IEEE op sequence ln((c_ab·N)·1.0/(c_a·c_b)) rounded to 10 dp on BOTH
# sides (the importance-score precedent).

PMI_K = 50


def q_bigram_pmi(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values"),
             "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    uni = merge_group_sums(
        docs.map_batches(uni_partial, batch_format="pyarrow"), ["token"], ["cnt"]
    ).materialize()
    n_tokens = int(uni.sum("cnt") or 0)

    # top-PMI_K bigrams by count (deterministic tie-break on token) —
    # a PMI_K-row table by construction
    bi_tbl = pa.concat_tables(
        [b for b in _vocab_topk_ds(sf_dir, PMI_K).iter_batches(batch_format="pyarrow")]
    )
    pairs = bi_tbl.column("token").to_pylist()
    cand = sorted({w for p in pairs for w in p.split(" ")})
    cand_arr = pa.array(cand, type=pa.string())

    # unigram counts for candidate tokens only (≤ 2·PMI_K rows)
    need = uni.map_batches(
        lambda t, _c=cand_arr: t.filter(pc.is_in(t["token"], value_set=_c)),
        batch_format="pyarrow",
    ).take_all()
    cmap = {r["token"]: r["cnt"] for r in need}

    la = np.array([cmap[p.split(" ")[0]] for p in pairs], dtype=np.int64)
    lb = np.array([cmap[p.split(" ")[1]] for p in pairs], dtype=np.int64)
    c_ab = bi_tbl.column("cnt").to_numpy().astype(np.int64)
    pmi = np.round(
        np.log((c_ab * np.int64(n_tokens)).astype(np.float64) * 1.0 / (la * lb)),
        10,
    )
    out = pa.table(
        {
            "token": bi_tbl.column("token"),
            "cnt": pa.array(c_ab),
            "pmi": pa.array(pmi),
        }
    )
    return rd.from_arrow(out)


def _vocab_topk_ds(sf_dir: str, k: int) -> Dataset:
    """Top-k corpus bigrams by count (shared by q_vocab_topk and
    q_bigram_pmi): per-batch bigram value-count partials on the
    merge_group_sums combiner path, then one global sort+limit."""

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
        bi = bi.filter(pa.array(parent[:-1] == parent[1:]))
        vc = pc.value_counts(bi)
        return pa.table(
            {"token": vc.field("values"),
             "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = docs.map_batches(partial, batch_format="pyarrow")
    merged = merge_group_sums(partials, ["token"], ["cnt"])
    return merged.sort(["cnt", "token"], descending=[True, False]).limit(k)


SQL_BIGRAM_PMI = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk FROM documents
),
uni AS (SELECT unnest(tk) AS tok FROM t),
ucnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM uni),
bi AS (
  SELECT tk[CAST(i.i AS INT)] || ' ' || tk[CAST(i.i AS INT) + 1] AS token
  FROM t, range(1, {ORACLE_TOKENS_CAP + 1}) i(i) WHERE i.i <= len(tk) - 1
),
top AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM bi
  GROUP BY token ORDER BY cnt DESC, token LIMIT {PMI_K}
)
SELECT top.token, top.cnt,
       ROUND(LN((top.cnt * n.nn) * 1.0 / (ca.c * cb.c)), 10) AS pmi
FROM top, n
JOIN ucnt ca ON ca.tok = split_part(top.token, ' ', 1)
JOIN ucnt cb ON cb.tok = split_part(top.token, ' ', 2)
"""


# ---------------------------------------------------------------------------
# Q: phrase_match_counts — fixed-dictionary phrase analytics: count
# documents containing, and total occurrences of, each multi-word
# phrase (the keyword/brand-monitoring primitive).

# fixed phrase dictionary — the broadcast side of this operator is a
# curated keyword list, SMALL BY DEFINITION (hundreds to low thousands
# of phrases); for a dictionary too large to scan per batch, swap in
# tokenized n-gram joins against a phrase table (the decontaminate
# gram-join plan) — named fallback, not needed at dictionary scale.
PHRASES = (
    "data line",
    "merge data",
    "sort agg",
    "batch batch batch",
    "the fast key",
    "join order",
)


def q_phrase_match_counts(sf_dir: str) -> Dataset:
    """Per-phrase document frequency and total occurrence count via
    ONE vectorized Arrow substring-count kernel per phrase per batch
    (non-overlapping left-to-right occurrences — matched exactly by
    the SQL twin's length/replace idiom). Partials are K rows per
    block; the merge key space is the dictionary. Zero data movement
    beyond K-row partials; the corpus text never shuffles."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partials(t: pa.Table) -> pa.Table:
        text = t.column("text")
        names, docs_n, occ_n = [], [], []
        for p in PHRASES:
            c = pc.count_substring(text, pattern=p)
            c = pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
            names.append(p)
            docs_n.append(int((c > 0).sum()))
            occ_n.append(int(c.sum()))
        return pa.table(
            {
                "phrase": pa.array(names, type=pa.string()),
                "n_docs": pa.array(docs_n, type=pa.int64()),
                "n_occurrences": pa.array(occ_n, type=pa.int64()),
            }
        )

    return merge_group_sums(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["phrase"], ["n_docs", "n_occurrences"],
    )


def _phrase_sql() -> str:
    values = ", ".join(f"('{p}')" for p in PHRASES)
    return f"""
WITH p(phrase) AS (VALUES {values})
SELECT p.phrase,
       CAST(SUM(CASE WHEN length(text) - length(replace(text, p.phrase, ''))
                     > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM((length(text) - length(replace(text, p.phrase, '')))
                // length(p.phrase)) AS BIGINT) AS n_occurrences
FROM documents, p
GROUP BY 1
"""


SQL_PHRASE_MATCH_COUNTS = _phrase_sql()


# ---------------------------------------------------------------------------
# Q: cdc_chunk_dedup — content-defined chunking (rolling-window cut
# points) + cross-document chunk dedup estimation: the storage-dedup
# primitive (restic/borg/LBFS-style) that finds shared spans exact
# hashing misses when documents share paragraphs but differ overall.

CDC_MOD = 61  # prime: the cut test mixes all 3 gram chars (a power of
# two would reduce to the last char alone — ascii·2²⁰ and ·2¹⁰ vanish
# mod 64 — and the fixture's lowercase alphabet never cuts)


def q_cdc_chunk_dedup(sf_dir: str) -> Dataset:
    """One-row global dedup estimate: documents are split at content-
    defined cut points (packed char-3-gram code ≡ 0 mod {CDC_MOD}, the
    gear-hash idiom — boundaries move WITH the content, so an insertion
    reshuffles only its own chunk), each chunk signs as (gram-length,
    Σ gram codes), and signatures dedupe globally. Publishes
    total/distinct/duplicate chunk counts and the duplicated gram-span
    estimate Σ(n−1)·len. Signature collisions conflate chunks (a
    counting estimate, not byte-proof — documented; the SQL twin
    computes the identical signature so parity is exact).

    Distributed: per-batch vectorized chunking (one reduceat over the
    concatenated gram stream) → chunk-signature-bounded merge → one
    constant-key stats fold. Text never shuffles; movement is
    signature rows."""
    from ..ops.dedup import packed_char_gram_arrays

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def chunk_partials(t: pa.Table) -> pa.Table:
        glist = packed_char_gram_arrays(t.column("text"))
        glist = [g for g in glist if len(g)]
        if not glist:
            return pa.table(
                {
                    "ln": pa.array([], type=pa.int64()),
                    "sg": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        flat = np.concatenate(glist).astype(np.int64)
        lens = np.fromiter((len(g) for g in glist), dtype=np.int64,
                           count=len(glist))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        cut = flat % CDC_MOD == 0
        new_chunk = np.zeros(len(flat), dtype=bool)
        new_chunk[1:] = cut[:-1]  # boundary AFTER a cut gram
        new_chunk[starts] = True  # each doc restarts its chunks
        cstart = np.flatnonzero(new_chunk)
        ln = np.diff(np.append(cstart, len(flat)))
        sg = np.add.reduceat(flat, cstart)
        g = pa.table(
            {
                "ln": pa.array(ln, type=pa.int64()),
                "sg": pa.array(sg, type=pa.int64()),
                "n": pa.array(np.ones(len(ln), dtype=np.int64)),
            }
        ).group_by(["ln", "sg"]).aggregate([("n", "sum")])
        return g.rename_columns(["ln", "sg", "n"])

    merged = merge_group_sums(
        docs.map_batches(chunk_partials, batch_format="pyarrow"),
        ["ln", "sg"], ["n"],
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        ln = t.column("ln").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "total_chunks": pa.array([int(n.sum())], type=pa.int64()),
                "distinct_chunks": pa.array([len(t)], type=pa.int64()),
                "dup_positions": pa.array(
                    [int(((n - 1) * ln).sum())], type=pa.int64()
                ),
            }
        )

    out = merge_group_sums(
        merged.map_batches(stats_partial, batch_format="pyarrow"),
        ["k"], ["total_chunks", "distinct_chunks", "dup_positions"],
    )

    def finish(t: pa.Table) -> pa.Table:
        tot = t.column("total_chunks")
        dis = t.column("distinct_chunks")
        return pa.table(
            {
                "total_chunks": tot,
                "distinct_chunks": dis,
                "dup_chunks": pc.subtract(tot, dis),
                "dup_positions": t.column("dup_positions"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_CDC_CHUNK_DEDUP = f"""
WITH g AS (
  SELECT doc_id, i.i AS pos,
         ascii(substr(text, CAST(i.i AS INT), 1)) * 1048576
       + ascii(substr(text, CAST(i.i AS INT) + 1, 1)) * 1024
       + ascii(substr(text, CAST(i.i AS INT) + 2, 1)) AS gcode
  FROM documents, range(1, {ORACLE_CHARS_CAP + 1}) i(i)
  WHERE i.i <= length(text) - 2
),
c AS (
  SELECT doc_id, pos, gcode,
         COALESCE(SUM(CASE WHEN gcode % {CDC_MOD} = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cid
  FROM g
),
ch AS (
  SELECT doc_id, cid, COUNT(*) AS ln, SUM(gcode) AS sg
  FROM c GROUP BY 1, 2
),
d AS (SELECT ln, sg, COUNT(*) AS n FROM ch GROUP BY 1, 2)
SELECT CAST(SUM(n) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_chunks,
       CAST(SUM((n - 1) * ln) AS BIGINT) AS dup_positions
FROM d
"""


# ---------------------------------------------------------------------------
# Q: distinctive_terms_logodds — Monroe/Colaresi/Quinn "Fightin' Words"
# log-odds with a Dirichlet prior: the statistically-grounded answer to
# "which words distinguish corpus half A from half B" (raw frequency
# ratios over-weight rare words; the z-scored log-odds does not).

LOGODDS_ALPHA = 1.0
LOGODDS_K = 20


def q_distinctive_terms_logodds(sf_dir: str) -> Dataset:
    """Top-{LOGODDS_K} terms by z-scored Dirichlet log-odds for group
    A (sources src0–src9) vs B (src10–src19): δ_t = ln((y_At+α)/(n_A+
    αV−y_At−α)) − ln((y_Bt+α)/(n_B+αV−y_Bt−α)), z = δ/√(1/(y_At+α)+
    1/(y_Bt+α)) — LN/SQRT are in the bitwise parity family and every
    input is an exact integer count, so z_e10 matches the SQL twin
    term-for-term. Ranking is (z_e10 desc, token) — integer ranking,
    the round-5 rule.

    Distributed: (token, grp) occurrence partials → ONE vocab-bounded
    merge; totals fold to 2+1 scalars; the top-k rides grouped_topk's
    block-local k-prune (the vocabulary never co-locates)."""
    from ..ops.topk import grouped_topk

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partials(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pylist()
        grp = np.array([0 if int(x[3:]) < 10 else 1 for x in src],
                       dtype=np.int64)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        flat = toks.flatten()
        di = np.repeat(np.arange(len(src), dtype=np.int64), np.diff(offs))
        g_tok = grp[di]
        g = pa.table(
            {
                "token": flat,
                "y_a": pa.array((g_tok == 0).astype(np.int64)),
                "y_b": pa.array((g_tok == 1).astype(np.int64)),
            }
        ).group_by(["token"]).aggregate([("y_a", "sum"), ("y_b", "sum")])
        return g.rename_columns(["token", "y_a", "y_b"])

    counts = merge_group_sums(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["token"], ["y_a", "y_b"],
    ).materialize()

    def tot_partial(t: pa.Table) -> pa.Table:
        ya = t.column("y_a").to_numpy(zero_copy_only=False)
        yb = t.column("y_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "na": pa.array([int(ya.sum())], type=pa.int64()),
                "nb": pa.array([int(yb.sum())], type=pa.int64()),
                "v": pa.array([len(ya)], type=pa.int64()),
            }
        )

    totals = _pull_merged_local(
        merge_group_sums(
            counts.map_batches(tot_partial, batch_format="pyarrow"),
            ["k"], ["na", "nb", "v"],
        ),
        ["k", "na", "nb", "v"],
    )
    n_a = int(totals.column("na")[0].as_py())
    n_b = int(totals.column("nb")[0].as_py())
    v_size = int(totals.column("v")[0].as_py())
    a = LOGODDS_ALPHA
    av = a * v_size

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "y_a": pa.array([], type=pa.int64()),
                    "y_b": pa.array([], type=pa.int64()),
                    "z_e10": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        ya = t.column("y_a").to_numpy(zero_copy_only=False)
        yb = t.column("y_b").to_numpy(zero_copy_only=False)
        da = np.log((ya + a) / (n_a + av - ya - a))
        db = np.log((yb + a) / (n_b + av - yb - a))
        z = (da - db) / np.sqrt(1.0 / (ya + a) + 1.0 / (yb + a))
        return pa.table(
            {
                "token": pc.cast(t["token"], pa.string()),
                "y_a": pa.array(ya, type=pa.int64()),
                "y_b": pa.array(yb, type=pa.int64()),
                "z_e10": pa.array(
                    np.round(z * 1e10).astype(np.int64), type=pa.int64()
                ),
                "c": pa.array(np.zeros(len(ya), dtype=np.int64)),
            }
        )

    scored = counts.map_batches(score, batch_format="pyarrow")
    top = grouped_topk(
        scored, ["c"], [("z_e10", False), ("token", True)], LOGODDS_K,
        rank_col="rank",
    )

    def drop_c(t: pa.Table) -> pa.Table:
        return t.drop_columns(["c"])

    return top.map_batches(drop_c, batch_format="pyarrow")


def _pull_merged_local(ds: Dataset, cols: list[str]) -> pa.Table:
    from .analytics import _pull_merged

    return _pull_merged(ds, cols)


SQL_DISTINCTIVE_TERMS_LOGODDS = f"""
WITH toks AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10
              THEN 0 ELSE 1 END AS grp,
         UNNEST(string_split(text, ' ')) AS token
  FROM documents
),
c AS (SELECT token, grp, COUNT(*) AS n FROM toks GROUP BY 1, 2),
tot AS (
  SELECT SUM(CASE WHEN grp = 0 THEN n ELSE 0 END) AS na,
         SUM(CASE WHEN grp = 1 THEN n ELSE 0 END) AS nb,
         COUNT(DISTINCT token) AS v
  FROM c
),
p AS (
  SELECT token,
         SUM(CASE WHEN grp = 0 THEN n ELSE 0 END) AS y_a,
         SUM(CASE WHEN grp = 1 THEN n ELSE 0 END) AS y_b
  FROM c GROUP BY 1
),
z AS (
  SELECT p.token, p.y_a, p.y_b,
         CAST(ROUND((
           (LN((p.y_a + {LOGODDS_ALPHA!r})
               / (tot.na + {LOGODDS_ALPHA!r} * tot.v - p.y_a
                  - {LOGODDS_ALPHA!r}))
          - LN((p.y_b + {LOGODDS_ALPHA!r})
               / (tot.nb + {LOGODDS_ALPHA!r} * tot.v - p.y_b
                  - {LOGODDS_ALPHA!r})))
          / SQRT(1.0 / (p.y_a + {LOGODDS_ALPHA!r})
               + 1.0 / (p.y_b + {LOGODDS_ALPHA!r}))
         ) * 1e10) AS BIGINT) AS z_e10
  FROM p, tot
)
SELECT token, CAST(y_a AS BIGINT) AS y_a, CAST(y_b AS BIGINT) AS y_b,
       z_e10,
       CAST(ROW_NUMBER() OVER (ORDER BY z_e10 DESC, token) AS BIGINT)
         AS rank
FROM z
ORDER BY z_e10 DESC, token
LIMIT {LOGODDS_K}
"""


CORPUSOPS_QUERIES = {
    "distinctive_terms_logodds": q_distinctive_terms_logodds,
    "cdc_chunk_dedup": q_cdc_chunk_dedup,
    "phrase_match_counts": q_phrase_match_counts,
    "vocab_topk": q_vocab_topk,
    "bigram_pmi": q_bigram_pmi,
    "quality_filter": q_quality_filter,
    "dup_clusters": q_dup_clusters,
    "corpus_curation": q_corpus_curation,
    "hll_distinct_tokens": q_hll_distinct_tokens,
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
}

CORPUSOPS_ORACLES = {
    "cdc_chunk_dedup": SQL_CDC_CHUNK_DEDUP,
    "distinctive_terms_logodds": SQL_DISTINCTIVE_TERMS_LOGODDS,
    "phrase_match_counts": SQL_PHRASE_MATCH_COUNTS,
    "vocab_topk": SQL_VOCAB_TOPK,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "quality_filter": SQL_QUALITY_FILTER,
    "dup_clusters": SQL_DUP_CLUSTERS,
    "corpus_curation": SQL_CORPUS_CURATION,
    "hll_distinct_tokens": SQL_HLL_DISTINCT_TOKENS,
    "heavy_hitter_tokens": SQL_HEAVY_HITTER_TOKENS,
}


# ---------------------------------------------------------------------------
# Q: bigram_next_top3 — n-gram language-model table construction: for
# every left token, its top-3 most likely successors with counts (the
# artifact behind n-gram speculative-decoding / autocomplete tables —
# the conditional-probability view of the J24 bigram machinery).
# Per-batch (left, right) value-count partials on the combiner path
# (doc-boundary bigrams excluded via list_parent_indices, same rule as
# _vocab_topk_ds), ONE merge, then ops/topk.grouped_topk k=3 per left
# token (ties → right asc). Output is vocabulary-bounded (≤ 3·|V|),
# the natural size of an LM table; text never shuffles.


def q_bigram_next_top3(sf_dir: str, k: int = 3) -> Dataset:
    from ..ops.topk import grouped_topk

    def partial(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy()
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        empty = pa.table(
            {
                "left_tok": pa.array([], type=pa.string()),
                "right_tok": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(flat) < 2:
            return empty
        same = pa.array(parent[:-1] == parent[1:])
        left = flat.slice(0, len(flat) - 1).filter(same)
        right = flat.slice(1).filter(same)
        if len(left) == 0:
            return empty
        p = pa.table(
            {
                "left_tok": left,
                "right_tok": right,
                "cnt": pa.array(np.ones(len(left), dtype=np.int64)),
            }
        )
        g = p.group_by(["left_tok", "right_tok"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["left_tok", "right_tok", "cnt"])

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    merged = merge_group_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["left_tok", "right_tok"],
        ["cnt"],
    )
    return grouped_topk(
        merged,
        ["left_tok"],
        [("cnt", False), ("right_tok", True)],
        k,
        rank_col="rank",
    )


SQL_BIGRAM_NEXT_TOP3 = f"""
WITH t AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk
  FROM documents
),
bi AS (
  SELECT tk[CAST(i.i AS INT)] AS left_tok,
         tk[CAST(i.i AS INT) + 1] AS right_tok
  FROM t, range(1, {ORACLE_TOKENS_CAP + 1}) i(i)
  WHERE i.i <= len(tk) - 1
),
cnt AS (
  SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bi GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY left_tok ORDER BY cnt DESC, right_tok) AS rnk
  FROM cnt
)
SELECT left_tok, right_tok, cnt, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""

CORPUSOPS_QUERIES["bigram_next_top3"] = q_bigram_next_top3
CORPUSOPS_ORACLES["bigram_next_top3"] = SQL_BIGRAM_NEXT_TOP3


# ---------------------------------------------------------------------------
# Q: jsonl_doc_stats — the JSONL ingestion roundtrip (sources/jsonl.py):
# documents are serialized to sharded line-delimited JSON once (the
# cached deterministic fixture step), read back through the vectorized
# extract_regex reader (zero per-row Python; escape-free subset asserted
# per batch, json.loads fallback named), and aggregated per language —
# the oracle runs over the ORIGINAL parquet, so a green row proves the
# serialize→parse roundtrip byte-preserving END TO END, not just parsy.
# Movement: per-lang (count, char) partials through one combiner merge.


def q_jsonl_doc_stats(sf_dir: str) -> Dataset:
    from ..sources.jsonl import ensure_docs_jsonl, read_docs_jsonl
    from ..stages.salted import merge_group_sums

    path = ensure_docs_jsonl(sf_dir)
    docs = read_docs_jsonl(path)

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "lang": t["lang"],
                "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
                "sum_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                "min_doc": pc.cast(t["doc_id"], pa.int64()),
            }
        ).group_by(["lang"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum"), ("min_doc", "min")]
        )
        return g.rename_columns(["lang", "n_docs", "sum_chars", "min_doc"])

    from ..stages.salted import merge_group_aggs

    return merge_group_aggs(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["lang"],
        [("n_docs", "sum"), ("sum_chars", "sum"), ("min_doc", "min")],
    )


SQL_JSONL_DOC_STATS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents GROUP BY 1
"""

CORPUSOPS_QUERIES["jsonl_doc_stats"] = q_jsonl_doc_stats
CORPUSOPS_ORACLES["jsonl_doc_stats"] = SQL_JSONL_DOC_STATS


# ---------------------------------------------------------------------------
# Q: doc_cooccurrence — document-level term co-occurrence counts (the
# GloVe / PMI-embedding building block at document window size): for
# every unordered pair of DISTINCT content terms (token length ≥ 5 — a
# closed-form rarity proxy; production would swap in a df-threshold
# vocabulary via the gated attach_df machinery, named fallback), the
# number of documents containing BOTH. Complements bigram_pmi (adjacent
# pairs) and window_top_terms (windowed tf): this is the symmetric
# co-presence matrix. Distribution: per batch, ONE flatten + length
# mask + per-doc sort-dedupe, then the triangle-index fan-out (the
# wedge-index trick) emits each doc's C(k,2) pairs vectorized —
# k ≤ |vocab≥5| per doc, so fan-out is vocabulary-bounded, not
# length-bounded; only (w1, w2, n) COUNT PARTIALS shuffle through one
# grouped-sum merge. Pair-space output (≤ |vocab|²/2 rows).

COOC_MIN_LEN = 5


def q_doc_cooccurrence(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    empty = pa.table(
        {
            "w1": pa.array([], type=pa.string()),
            "w2": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
        }
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy()
        keep = pc.greater_equal(
            pc.utf8_length(flat), COOC_MIN_LEN
        ).to_numpy(zero_copy_only=False)
        parent = parent[keep]
        flat = flat.filter(pa.array(keep))
        if len(flat) == 0:
            return empty
        # per-doc sort-dedupe: lexicographic rank is order-preserving
        rank = pc.rank(flat, sort_keys="ascending", tiebreaker="dense")
        rank = rank.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rank, parent))
        parent, rank = parent[order], rank[order]
        srt = flat.take(pa.array(order))
        first = np.empty(len(parent), dtype=bool)
        first[0] = True
        first[1:] = (parent[1:] != parent[:-1]) | (rank[1:] != rank[:-1])
        parent, rank, srt = (
            parent[first],
            rank[first],
            srt.filter(pa.array(first)),
        )
        # triangle fan-out: within each doc run, all (earlier, later) pairs
        n = len(parent)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = parent[1:] != parent[:-1]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        local = np.arange(n) - run_start
        total = int(local.sum())
        if total == 0:
            return empty
        b_idx = np.repeat(np.arange(n), local)
        offsets = np.concatenate(([0], np.cumsum(local)))[:-1]
        a_idx = (
            np.arange(total)
            - np.repeat(offsets, local)
            + np.repeat(run_start, local)
        )
        p = pa.table(
            {
                "w1": srt.take(pa.array(a_idx)),
                "w2": srt.take(pa.array(b_idx)),
                "n_docs": pa.array(np.ones(total, dtype=np.int64)),
            }
        )
        g = p.group_by(["w1", "w2"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["w1", "w2", "n_docs"])

    return merge_group_sums(
        docs.map_batches(pair_partials, batch_format="pyarrow"),
        ["w1", "w2"],
        ["n_docs"],
    )


SQL_DOC_COOCCURRENCE = f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(
           regexp_extract_all(lower(text), '{TOKEN_PATTERN}'),
           x -> length(x) >= {COOC_MIN_LEN})) AS tk
  FROM documents
),
u AS (SELECT doc_id, unnest(tk) AS w FROM t),
p AS (
  SELECT a.w AS w1, b.w AS w2
  FROM u a JOIN u b ON b.doc_id = a.doc_id AND b.w > a.w
)
SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY 1, 2
"""

CORPUSOPS_QUERIES["doc_cooccurrence"] = q_doc_cooccurrence
CORPUSOPS_ORACLES["doc_cooccurrence"] = SQL_DOC_COOCCURRENCE


# ---------------------------------------------------------------------------
# Q: zipf_slope_stats — rank–frequency (Zipf) regression sufficient
# statistics over the top-K unigram vocabulary: n, Σln r, Σln c,
# Σln r·ln c, Σ(ln r)² as e10 int64 sums — consumers derive the log-log
# OLS slope (the Zipf exponent, the standard lexical-health diagnostic
# for crawled corpora: a slope far from −1 flags boilerplate or spam).
# Exactness: LN is in the bitwise-parity family, the product of two
# bitwise-equal doubles is one correctly-rounded multiply, and per-term
# e10 integer rounding makes the four sums order-free at any
# parallelism (the round-5 integer-sum policy). Distribution: unigram
# count partials → ONE grouped-sum merge → global top-K on the
# block-pruned grouped_topk path (≤K rows leave any block) → K-row
# term table → one constant-key sum merge. Output: a single row.

ZIPF_K = 50


def q_zipf_slope_stats(sf_dir: str) -> Dataset:
    from ..ops.topk import grouped_topk
    from ..stages.salted import merge_group_sums

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        lists = _token_lists(t["text"])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        p = pa.table(
            {
                "token": flat,
                "cnt": pa.array(np.ones(len(flat), dtype=np.int64)),
            }
        )
        g = p.group_by(["token"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["token", "cnt"])

    counts = merge_group_sums(
        docs.map_batches(partial, batch_format="pyarrow"), ["token"], ["cnt"]
    )
    keyed = counts.map_batches(
        lambda t: t.append_column(
            "_g", pa.array(np.zeros(len(t), dtype=np.int32))
        ),
        batch_format="pyarrow",
    )
    top = grouped_topk(
        keyed,
        ["_g"],
        [("cnt", False), ("token", True)],
        ZIPF_K,
        rank_col="rank",
    )

    def terms(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        lr = np.log(r)
        lc = np.log(c)
        e10 = 10000000000.0
        return pa.table(
            {
                "_k": pa.array(np.zeros(len(t), dtype=np.int32)),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "sx_e10": pa.array(np.round(lr * e10).astype(np.int64)),
                "sy_e10": pa.array(np.round(lc * e10).astype(np.int64)),
                "sxy_e10": pa.array(
                    np.round(lr * lc * e10).astype(np.int64)
                ),
                "sxx_e10": pa.array(
                    np.round(lr * lr * e10).astype(np.int64)
                ),
            }
        )

    summed = merge_group_sums(
        top.map_batches(terms, batch_format="pyarrow"),
        ["_k"],
        ["n", "sx_e10", "sy_e10", "sxy_e10", "sxx_e10"],
    )
    return summed.map_batches(
        lambda t: t.drop_columns(["_k"]), batch_format="pyarrow"
    )


SQL_ZIPF_SLOPE_STATS = f"""
WITH toks AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
r AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
  FROM c ORDER BY cnt DESC, token LIMIT {ZIPF_K}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(LN(rank) * 10000000000.0, 0) AS BIGINT))
            AS BIGINT) AS sx_e10,
       CAST(SUM(CAST(ROUND(LN(cnt) * 10000000000.0, 0) AS BIGINT))
            AS BIGINT) AS sy_e10,
       CAST(SUM(CAST(ROUND(LN(rank) * LN(cnt) * 10000000000.0, 0) AS BIGINT))
            AS BIGINT) AS sxy_e10,
       CAST(SUM(CAST(ROUND(LN(rank) * LN(rank) * 10000000000.0, 0) AS BIGINT))
            AS BIGINT) AS sxx_e10
FROM r
"""

CORPUSOPS_QUERIES["zipf_slope_stats"] = q_zipf_slope_stats
CORPUSOPS_ORACLES["zipf_slope_stats"] = SQL_ZIPF_SLOPE_STATS


# ---------------------------------------------------------------------------
# Q: source_dup_rates — dedup observability per source: which feeds
# send us copies? (The curation-ops dashboard number that decides
# where to spend crawl budget.)


def q_source_dup_rates(sf_dir: str) -> Dataset:
    """Per source: document count, distinct texts (by the buffer-view
    sha256 content hash), duplicate rows and the dup rate at e8 (exact
    floored half-up). Movement: (source, hash) distinct partials → ONE
    merge bounded by distinct texts; per-source fold via sorted runs.
    Text never shuffles — only 16-byte hashes move."""
    from ..ops.dedup import sha256_hex_col
    from ..ops.runs import sorted_group_apply

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partials(t: pa.Table) -> pa.Table:
        h = pa.array(sha256_hex_col(t.column("text")), type=pa.string())
        g = pa.table(
            {
                "source": t["source"],
                "h": h,
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["source", "h"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "h", "n"])

    merged = merge_group_sums(
        docs.map_batches(partials, batch_format="pyarrow"),
        ["source", "h"], ["n"],
    )

    empty = pa.table(
        {
            "source": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_distinct": pa.array([], type=pa.int64()),
            "n_dups": pa.array([], type=pa.int64()),
            "dup_rate_e8": pa.array([], type=pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        src = t.column("source")
        n = t.column("n").to_numpy(zero_copy_only=False)
        sk = pc.rank(
            src, sort_keys="ascending", tiebreaker="dense",
            null_placement="at_start",
        ).to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sks, ns = sk[order], n[order]
        starts = np.flatnonzero(np.r_[True, sks[1:] != sks[:-1]])
        run_id = np.cumsum(np.r_[False, sks[1:] != sks[:-1]])
        n_runs = len(starts)
        tot = np.zeros(n_runs, dtype=np.int64)
        np.add.at(tot, run_id, ns)
        dis = np.bincount(run_id, minlength=n_runs).astype(np.int64)
        dups = tot - dis
        rate = (2 * dups * 10**8 + tot) // (2 * tot)
        return pa.table(
            {
                "source": src.take(pa.array(order[starts])),
                "n_docs": pa.array(tot, type=pa.int64()),
                "n_distinct": pa.array(dis, type=pa.int64()),
                "n_dups": pa.array(dups, type=pa.int64()),
                "dup_rate_e8": pa.array(rate, type=pa.int64()),
            }
        )

    return sorted_group_apply(merged, ["source"], fold)


SQL_SOURCE_DUP_RATES = """
WITH c AS (
  SELECT source, text, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
p AS (
  SELECT source, SUM(n) AS n_docs, COUNT(*) AS n_distinct
  FROM c GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_docs - n_distinct AS BIGINT) AS n_dups,
       CAST((2 * (n_docs - n_distinct) * 100000000 + n_docs)
            // (2 * n_docs) AS BIGINT) AS dup_rate_e8
FROM p
"""


CORPUSOPS_QUERIES["source_dup_rates"] = q_source_dup_rates
CORPUSOPS_ORACLES["source_dup_rates"] = SQL_SOURCE_DUP_RATES
