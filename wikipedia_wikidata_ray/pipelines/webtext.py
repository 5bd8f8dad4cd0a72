"""Web-corpus curation queries over the Common-Crawl-style pages table:
URL parsing + per-host aggregation, eval-set decontamination, and
stratified sampling.

These complete the webtext axis of the training-data suite (brief:
"operations a large-scale training-data pipeline would need"). All three
are closed-form over the driver's ``documents`` table (the pages corpus
is derived from it deterministically, ``sources/pages_gen.py``), so every
query here carries a full DuckDB oracle.

Scale notes (SCALING.md has the full entries):

- ``url_host_stats``: host parse is a single vectorized
  ``pc.extract_regex`` over the url column; the aggregation is per-batch
  partial sums merged by ``stages/salted.merge_group_sums`` — the hosts
  key space is bounded (registered domains ≪ pages), only
  (host, count, sum) partials shuffle, never a page row.
- ``decontaminate``: the eval-benchmark side is SMALL by definition
  (benchmarks are MBs; the corpus is the 100-TB side). Its distinct
  n-grams are built distributedly, pulled once to the driver, and
  broadcast via ``ray.put`` as a sorted numpy array; the corpus side
  streams through a task ``map_batches`` doing a vectorized
  ``np.isin``-style membership probe. Nothing corpus-sized moves.
- ``stratified_sample``: pure per-row integer-hash arithmetic — a
  stateless filter, no shuffle at all.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ..ops.textstats import TOKEN_PATTERN
from ..stages.salted import merge_group_sums
from . import geopipeline as gp

WEBTEXT_QUERIES: dict = {}
WEBTEXT_ORACLES: dict = {}


# ---------------------------------------------------------------------------
# Q: url_host_stats — URL canonicalization + per-host (domain) aggregation
#
# The canonical webtext group-by: crawl curation reasons about quality,
# dedup and licensing per registered domain. Reference analog: the
# per-language (= per-wiki-host) size accounting in steps/output.sh.

_URL_RE = r"^(?P<scheme>https?)://(?P<host>[^/]+)(?P<path>/.*)?$"


def _host_partials(t: pa.Table) -> pa.Table:
    """Per-batch (host, n_pages, total_chars) partials — vectorized parse,
    no page row survives past this stage."""
    parsed = pc.extract_regex(t.column("url"), _URL_RE)
    host = pc.struct_field(parsed, "host")
    chars = pc.utf8_length(t.column("text")).cast(pa.int64())
    g = pa.table({"host": host, "chars": chars}).group_by("host").aggregate(
        [("chars", "sum"), ("chars", "count")]
    )
    return pa.table(
        {
            "host": g.column("host"),
            "n_pages": g.column("chars_count").cast(pa.int64()),
            "total_chars": g.column("chars_sum").cast(pa.int64()),
        }
    )


def _add_tld(t: pa.Table) -> pa.Table:
    tld = pc.extract_regex(t.column("host"), r"(?P<tld>[^.]+)$")
    return t.append_column("tld", pc.struct_field(tld, "tld"))


def q_url_host_stats(sf_dir: str) -> Dataset:
    ex = gp.extract(gp.load_pages(sf_dir)).select_columns(["url", "text"])
    partials = ex.map_batches(_host_partials, batch_format="pyarrow")
    merged = merge_group_sums(partials, ["host"], ["n_pages", "total_chars"])
    return merged.map_batches(_add_tld, batch_format="pyarrow")


SQL_URL_HOST_STATS = """
WITH pages AS (
  SELECT 'https://' || lang || '.example.org/wiki/Doc_' || doc_id AS url,
         text
  FROM documents
),
parsed AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, text FROM pages
)
SELECT host,
       COUNT(*) AS n_pages,
       -- SUM(BIGINT) is HUGEINT in DuckDB -> Arrow decimal128; cast so the
       -- physical type matches the Ray side's int64 (round-1 lesson).
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       regexp_extract(host, '([^.]+)$', 1) AS tld
FROM parsed GROUP BY 1
"""

WEBTEXT_QUERIES["url_host_stats"] = q_url_host_stats
WEBTEXT_ORACLES["url_host_stats"] = SQL_URL_HOST_STATS


# ---------------------------------------------------------------------------
# Q: decontaminate — eval-benchmark n-gram overlap flagging
#
# Standard pre-training hygiene: drop/flag training documents that share
# any word n-gram with the held-out eval set. Eval set here: documents
# with doc_id % 23 == 0 (deterministic, SQL-replicable).

GRAM_N = 5
EVAL_MOD = 23
# static range() cap in the oracle SQL (DuckDB range() takes no lateral
# column params); overflow silently truncates grams, so the checker and
# tests assert max tokens/doc stays strictly below this
ORACLE_TOKENS_CAP = 8192

_TOK = re.compile(TOKEN_PATTERN)

# per-worker memo of the deserialized eval-gram array (one entry: every
# pipeline construction makes a fresh ref; mirror geopipeline._WORKER_STATE
# eviction so looped benches don't accumulate arrays).
_EVAL_MEMO: dict = {}


def _gram_hash_arrays(col) -> tuple[np.ndarray, np.ndarray, int]:
    """Word-n-gram hashes for a whole Arrow string column with ZERO
    per-document Python (the corpus-side probe is the 100-TB side —
    round-2 verdict wrong #3):

    - tokenize every doc at once (utf8_lower + split on the [a-z0-9]+
      complement ≡ ``re.findall(TOKEN_PATTERN)``, empties filtered — the
      exact idiom property-proven in ``MinHasher.batch_shingle_arrays``),
    - 64-bit blake2b per DICTIONARY token (Zipfian vocab, not per
      occurrence; crc32 is only 32-bit — too collidable at vocab scale),
    - one vectorized rolling-FNV fold over all GRAM_N windows.

    Collision policy: distinct grams collide with probability
    ≈ n²/2⁶⁴ (< 1e-8 at a million distinct grams per batch/eval set) —
    counts may then differ from the string-gram oracle; accepted and
    documented, matching exact_dedup's sha256 assumption.

    Returns (gram_hashes_with_dups, parent_doc_index, n_docs); docs with
    fewer than GRAM_N tokens contribute zero grams (SQL semantics).
    """
    from hashlib import blake2b

    from ..ops.dedup import _FNV_OFFSET, _FNV_PRIME

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64), n)
    if n == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parent = pc.filter(pc.list_parent_indices(toks), nonempty).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    th = np.fromiter(
        (
            int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in vocab
        ),
        dtype=np.uint64,
        count=len(vocab),
    )
    tok_h = th[enc.indices.to_numpy()] if len(vocab) else np.empty(0, np.uint64)
    counts = np.bincount(parent, minlength=n).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    k = GRAM_N
    big = np.flatnonzero(counts >= k)
    if len(big) == 0:
        return empty
    n_g = counts[big] - k + 1
    g_offs = np.concatenate(([0], np.cumsum(n_g)))
    idx = np.arange(g_offs[-1], dtype=np.int64)
    within = idx - np.repeat(g_offs[:-1], n_g)
    base = np.repeat(offs[big], n_g) + within
    v = np.full(len(idx), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            v = (v ^ tok_h[base + j]) * _FNV_PRIME
    return v, np.repeat(big, n_g), n


def _eval_gram_hashes(sf_dir: str) -> np.ndarray:
    """Sorted distinct gram hashes of the eval slice, built distributedly;
    the driver pulls only per-batch unique uint64 arrays. The broadcast
    side is SMALL BY DEFINITION (a held-out eval benchmark, not the
    corpus); if an eval set ever outgrew broadcast, the fallback is the
    pair-id hash join used by attach_pair_texts."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sub = t.filter(pa.array(ids % EVAL_MOD == 0))
        v, _, _ = _gram_hash_arrays(sub.column("text"))
        return pa.table({"g": pa.array(np.unique(v))})

    parts = [
        b.column("g").to_numpy()
        for b in docs.map_batches(grams, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


class _Decontaminate:
    """Flags corpus docs whose distinct grams intersect the eval set:
    vectorized lexsort dedup per doc + one searchsorted probe against the
    broadcast sorted uint64 eval array — no per-row Python anywhere."""

    def __init__(self, eval_ref):
        key = eval_ref.hex()
        arr = _EVAL_MEMO.get(key)
        if arr is None:
            _EVAL_MEMO.clear()
            arr = _EVAL_MEMO[key] = ray.get(eval_ref)
        self.eval_arr = arr

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        gh, parent, _ = _gram_hash_arrays(t.column("text"))
        if len(gh):
            order = np.lexsort((gh, parent))
            gh, parent = gh[order], parent[order]
            keep = np.ones(len(gh), dtype=bool)
            keep[1:] = (parent[1:] != parent[:-1]) | (gh[1:] != gh[:-1])
            gh, parent = gh[keep], parent[keep]
            n_grams = np.bincount(parent, minlength=n).astype(np.int64)
        else:
            n_grams = np.zeros(n, dtype=np.int64)
        ev = self.eval_arr
        if len(ev) and len(gh):
            pos = np.minimum(np.searchsorted(ev, gh), len(ev) - 1)
            hit = ev[pos] == gh
            n_hit = np.bincount(parent[hit], minlength=n).astype(np.int64)
        else:
            n_hit = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(n_grams),
                "n_hit_grams": pa.array(n_hit),
                "contaminated": pa.array(n_hit > 0),
            }
        )


def q_decontaminate(sf_dir: str) -> Dataset:
    eval_ref = ray.put(_eval_gram_hashes(sf_dir))
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(t: pa.Table) -> pa.Table:
        return _Decontaminate(eval_ref)(t)

    return docs.map_batches(fn, batch_format="pyarrow")


SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t
  FROM documents
),
grams AS (
  -- static range + filter: DuckDB's range() can't take lateral column
  -- params; the cap is guarded loudly in tools/check_oracle.py + pytest
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{GRAM_N - 1}], ' ') AS g
  FROM toks, range(1, {ORACLE_TOKENS_CAP}) r(i)
  WHERE i <= len(t) - {GRAM_N - 1}
),
eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hit_grams
  FROM grams WHERE g IN (SELECT g FROM eval_g) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(ng.n_grams, 0) AS n_grams,
       COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
       COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN ng USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""

WEBTEXT_QUERIES["decontaminate"] = q_decontaminate
WEBTEXT_ORACLES["decontaminate"] = SQL_DECONTAMINATE


# ---------------------------------------------------------------------------
# Q: gram_repetition — within-document duplicate-n-gram fraction (the
# Gopher-style repetition quality signal: heavily self-repeating docs are
# boilerplate/spam). Rides the SAME vectorized gram-hash machinery as
# decontamination (zero per-row Python; 64-bit gram-hash collision policy
# documented at _gram_hash_arrays — distinct counts may differ from the
# string oracle with probability ≈ n²/2⁶⁴, accepted).


def q_gram_repetition(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(t: pa.Table) -> pa.Table:
        gh, parent, n = _gram_hash_arrays(t.column("text"))
        total = np.bincount(parent, minlength=n).astype(np.int64)
        if len(gh):
            order = np.lexsort((gh, parent))
            ps, vs = parent[order], gh[order]
            new = np.ones(len(ps), dtype=bool)
            new[1:] = (ps[1:] != ps[:-1]) | (vs[1:] != vs[:-1])
            distinct = np.bincount(ps[new], minlength=n).astype(np.int64)
        else:
            distinct = np.zeros(n, dtype=np.int64)
        frac = np.where(
            total > 0, (total - distinct) / np.maximum(total, 1), 0.0
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(total),
                "n_distinct_grams": pa.array(distinct),
                "dup_gram_frac": pa.array(frac),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


SQL_GRAM_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+{GRAM_N - 1}], ' ') AS g
  FROM toks, range(1, {ORACLE_TOKENS_CAP}) r(i)
  WHERE i <= len(t) - {GRAM_N - 1}
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         COUNT(DISTINCT g) AS n_distinct_grams
  FROM g GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_distinct_grams, 0) AS n_distinct_grams,
       CASE WHEN COALESCE(a.n_grams, 0) > 0
            THEN (a.n_grams - a.n_distinct_grams) * 1.0 / a.n_grams
            ELSE 0.0 END AS dup_gram_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

WEBTEXT_QUERIES["gram_repetition"] = q_gram_repetition
WEBTEXT_ORACLES["gram_repetition"] = SQL_GRAM_REPETITION


# ---------------------------------------------------------------------------
# Q: stratified_sample — per-language deterministic hash sampling
#
# Per-stratum rates (upsample the head language less): en keeps 1/2,
# everything else 1/4. Knuth-hash arithmetic is identical int64 math on
# both sides — exact row-set equality, no RNG.

_HASH_MULT = 2654435761
_HASH_MOD = 1 << 31
_RATE_NUM = {"en": _HASH_MOD // 2}  # default: _HASH_MOD // 4
_DEFAULT_NUM = _HASH_MOD // 4


def _sample_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    h = (ids * np.int64(_HASH_MULT)) % np.int64(_HASH_MOD)
    # vectorized rate lookup (D4 idiom): index_in against the tiny
    # per-language override set, default elsewhere
    idx = pc.index_in(
        pc.cast(t.column("lang"), pa.string()),
        value_set=pa.array(list(_RATE_NUM), type=pa.string()),
    )
    hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    iv = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = np.fromiter(_RATE_NUM.values(), dtype=np.int64, count=len(_RATE_NUM))
    thresh = np.where(hit, vals[iv], np.int64(_DEFAULT_NUM))
    return t.filter(pa.array(h < thresh))


def q_stratified_sample(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return docs.map_batches(_sample_batch, batch_format="pyarrow")


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang
FROM documents
WHERE (doc_id * {_HASH_MULT}) % {_HASH_MOD}
      < CASE WHEN lang = 'en' THEN {_HASH_MOD // 2} ELSE {_HASH_MOD // 4} END
"""

WEBTEXT_QUERIES["stratified_sample"] = q_stratified_sample
WEBTEXT_ORACLES["stratified_sample"] = SQL_STRATIFIED_SAMPLE


# ---------------------------------------------------------------------------
# Q: tfidf_top_terms — per-document top-3 TF-IDF terms
#
# Two-level aggregation: a global document-frequency pass over the corpus
# (vocabulary-sized result, broadcast back) + per-doc term frequencies
# (computed entirely in-batch — each doc is one row), then an exact
# distributed per-group top-k. Float policy: identical IEEE op sequence
# (tf * ln(N/df)) rounded to 10 dp on BOTH sides (the importance-score
# precedent, pipelines/queries.py:399).
#
# Scale: the tf table is materialized once at its genuine reuse point
# (feeds both the df count and the scoring pass); df is vocabulary-sized
# (≪ corpus — bounded by distinct tokens) so it broadcasts as sorted
# numpy arrays; beyond broadcastable vocabularies the probe becomes a
# token-keyed hash join (same shape as dedup verify's pair joins).

TFIDF_K = 3


def _tf_batch(t: pa.Table) -> pa.Table:
    """(doc_id, token, tf) rows — fully vectorized (the round-2 Counter
    loop was the last corpus-side per-doc Python in the TF-IDF path):
    Arrow tokenization (≡ re.findall(TOKEN_PATTERN) on lower(), the
    proven idiom), dictionary-encode, then ONE lexsort + run-length count
    over (doc, token-code). Same row set as the per-doc Counter."""
    ids = t.column("doc_id").to_numpy()
    col = t.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "token": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parent = pc.filter(pc.list_parent_indices(toks), nonempty).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if len(parent) == 0:
        return empty
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    order = np.lexsort((codes, parent))
    ps, cs = parent[order], codes[order]
    new = np.ones(len(ps), dtype=bool)
    new[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(ps)))
    return pa.table(
        {
            "doc_id": pa.array(ids[ps[starts]], type=pa.int64()),
            "token": enc.dictionary.take(pa.array(cs[starts])),
            "tf": pa.array(counts, type=pa.int64()),
        }
    )


# df-side physical-plan gate: a natural-language vocabulary is df-side
# SMALL BY DEFINITION (Heap's law: ~10M types at 100 TB), so broadcast is
# the default plan; above the limit (adversarial token spaces — URLs, ids)
# the probe becomes a distributed hash join on token. Same gate pattern as
# the importance fold (queries.py:367-370) and C1 (wikiprocess.py).
TFIDF_DF_BROADCAST_LIMIT = 20_000_000


def attach_token_stat(
    tf: Dataset,
    stat_ds: Dataset,
    stat_col: str,
    broadcast_limit: int | None = None,
) -> Dataset:
    """Append a per-token int64 statistic (``stat_ds``: one row per token
    with column ``stat_col``) to any Dataset carrying a ``token`` column.
    Inner semantics — callers derive the stat FROM the tf side, so every
    row matches. Two physical plans, gated on vocabulary size: ≤ limit →
    broadcast Arrow string vocab + one ``pc.index_in`` probe per batch
    (no per-row Python, no object-dtype searchsorted); above →
    token-keyed distributed hash join, both sides shuffle once."""
    from ..stages.salted import default_partitions

    vocab_rows = stat_ds.count()
    if broadcast_limit is None:
        broadcast_limit = TFIDF_DF_BROADCAST_LIMIT

    if vocab_rows <= broadcast_limit:
        # broadcast plan: Arrow string array + aligned stat vector,
        # assembled from zero-copy plasma block views
        tbl = pa.concat_tables(
            [ray.get(r) for r in stat_ds.to_arrow_refs()]
        ).combine_chunks()
        tok_values = pc.cast(tbl.column("token"), pa.string()).combine_chunks()
        stat_arr = tbl.column(stat_col).to_numpy().astype(np.int64)
        ref = ray.put((tok_values, stat_arr))

        def attach(t: pa.Table) -> pa.Table:
            toks_v, stats = ray.get(ref)
            idx = pc.index_in(
                pc.cast(t.column("token"), pa.string()), value_set=toks_v
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(stat_col, pa.array(stats[idx]))

        return tf.map_batches(attach, batch_format="pyarrow")

    # join plan: tf ⋈ stat on token — both sides shuffle once; nothing is
    # broadcast. Key dtypes normalized to pa.string() (house rule).
    def tf_keyed(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("token"), "token",
            pc.cast(t.column("token"), pa.string()),
        )

    def stat_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_stat_token": pc.cast(t.column("token"), pa.string()),
                stat_col: t.column(stat_col),
            }
        )

    joined = tf.map_batches(tf_keyed, batch_format="pyarrow").join(
        stat_ds.map_batches(stat_keyed, batch_format="pyarrow"),
        "inner",
        num_partitions=default_partitions(),
        on=("token",),
        right_on=("_stat_token",),
    )

    def shape(t: pa.Table) -> pa.Table:
        if "_stat_token" in t.column_names:
            t = t.drop_columns(["_stat_token"])
        return t.set_column(
            t.column_names.index(stat_col), stat_col,
            pc.cast(t.column(stat_col), pa.int64()),
        )

    return joined.map_batches(shape, batch_format="pyarrow")


def attach_df(tf: Dataset, df_broadcast_limit: int | None = None) -> Dataset:
    """Append each token's document frequency as an int64 ``df`` column
    (shared by TF-IDF and BM25) — the df instance of attach_token_stat."""
    from ..stages.salted import partial_count

    df_ds = partial_count(tf, ["token"], out="df").materialize()
    return attach_token_stat(tf, df_ds, "df", df_broadcast_limit)


def tfidf_top_terms(docs: Dataset, n_docs: int, k: int = TFIDF_K,
                    df_broadcast_limit: int | None = None) -> Dataset:
    """Top-``k`` TF-IDF terms per doc over a (doc_id, text) Dataset."""
    from ..ops.topk import grouped_topk

    tf = docs.map_batches(_tf_batch, batch_format="pyarrow").materialize()
    n_f = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        df_v = t.column("df").to_numpy().astype(np.float64)
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        tfidf = np.round(tf_v * np.log(n_f / df_v), 10)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "df": t.column("df"),
                "tfidf": pa.array(tfidf),
            }
        )

    scored = attach_df(tf, df_broadcast_limit).map_batches(
        score, batch_format="pyarrow"
    )

    return grouped_topk(
        scored,
        ["doc_id"],
        [("tfidf", False), ("token", True)],
        k,
        rank_col="rank",
    )


def q_tfidf_top_terms(sf_dir: str) -> Dataset:
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_top_terms(docs, n_docs)


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS c FROM documents),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         ROUND(CAST(t.tf AS DOUBLE)
               * LN(CAST((SELECT c FROM n) AS DOUBLE) / CAST(d.df AS DOUBLE)),
               10) AS tfidf
  FROM tf t JOIN df d USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, df, tfidf, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= {TFIDF_K}
"""

WEBTEXT_QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
WEBTEXT_ORACLES["tfidf_top_terms"] = SQL_TFIDF_TOP_TERMS


# ---------------------------------------------------------------------------
# Q: tile_top_terms — the geospatial × webtext cross: per-TILE distinctive
# vocabulary (regional TF-IDF). Each z12 tile is treated as one "document"
# whose term frequency is the token-count sum over the pages it contains;
# df is the TILE frequency of a token (tiles containing it) and
# n = occupied-tile count, so the score surfaces what makes a region's
# text distinctive (the geo-aware curation / region-conditioned retrieval
# primitive). Reference analog: per-language vocabulary accounting in
# steps/output.sh consumers, regionalized.
# Plan: per-batch (tile, token) counts through the SHARED `_tf_batch`
# kernel (pages never shuffle — only (tile, token, tf) partials), one
# combiner merge, then the gated `attach_df` plan (broadcast ≤20M vocab /
# hash join above — same plan-equality contract as TF-IDF/BM25) and
# `grouped_topk`'s block-local k-prune per tile. n is a driver scalar
# from one count over tile-sized rows. Float policy: identical op
# sequence both sides, rounded to 10 dp (house rule).

TILE_TFIDF_K = 3


def q_tile_top_terms(sf_dir: str, k: int = TILE_TFIDF_K,
                     df_broadcast_limit: int | None = None) -> Dataset:
    from ..config import DEFAULT_CONFIG
    from ..ops.topk import grouped_topk
    from ..stages.salted import partial_count

    cfg = DEFAULT_CONFIG
    ds = gp.geocode(gp.extract(gp.load_pages(sf_dir), cfg), cfg)

    def tile_text(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["tile_x"]))
        tx = t.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(tx * 8192 + ty), "text": t["text"]}
        )

    tf_parts = (
        ds.map_batches(tile_text, batch_format="pyarrow")
        .map_batches(_tf_batch, batch_format="pyarrow")
        .map_batches(
            lambda t: t.rename_columns(["tkey", "token", "tf"]),
            batch_format="pyarrow",
        )
    )
    tf = merge_group_sums(tf_parts, ["tkey", "token"], ["tf"]).materialize()
    n_tiles = float(partial_count(tf, ["tkey"], out="one").count())

    def score(t: pa.Table) -> pa.Table:
        df_v = t.column("df").to_numpy().astype(np.float64)
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        tfidf = np.round(tf_v * np.log(n_tiles / df_v), 10)
        return pa.table(
            {
                "tkey": t.column("tkey"),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "df": t.column("df"),
                "tfidf": pa.array(tfidf),
            }
        )

    scored = attach_df(tf, df_broadcast_limit).map_batches(
        score, batch_format="pyarrow"
    )
    top = grouped_topk(
        scored,
        ["tkey"],
        [("tfidf", False), ("token", True)],
        k,
        rank_col="rank",
    )

    def unpack(t: pa.Table) -> pa.Table:
        tkey = t.column("tkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": pa.array((tkey // 8192).astype(np.int32)),
                "tile_y": pa.array((tkey % 8192).astype(np.int32)),
                "token": t["token"],
                "tf": t["tf"],
                "df": t["df"],
                "tfidf": t["tfidf"],
                "rank": t["rank"],
            }
        )

    return top.map_batches(unpack, batch_format="pyarrow")


SQL_TILE_TOP_TERMS = """
WITH geo AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 35.6895 WHEN 1 THEN 40.7127
            WHEN 2 THEN 51.5072 WHEN 3 THEN -23.5505 ELSE 28.6139 END)
      + ((doc_id * 37) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 7919) % 1600001) / 10000.0 - 80.0 END AS lat,
    CASE WHEN doc_id % 10 < 3 THEN
      (CASE doc_id % 5 WHEN 0 THEN 139.6917 WHEN 1 THEN -74.0059
            WHEN 2 THEN -0.1275 WHEN 3 THEN -46.6333 ELSE 77.209 END)
      + ((doc_id * 61) % 2001 - 1000) / 10000.0
    ELSE ((doc_id * 104729) % 3600001) / 10000.0 - 180.0 END AS lon
  FROM documents WHERE doc_id % 10 < 7
),
toks AS (
  SELECT CAST(FLOOR((g.lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(g.lat)) + 1.0 / COS(RADIANS(g.lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y,
         UNNEST(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS token
  FROM geo g JOIN documents d ON d.doc_id = g.doc_id
),
tf AS (SELECT tile_x, tile_y, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS c FROM (SELECT DISTINCT tile_x, tile_y FROM tf)),
scored AS (
  SELECT t.tile_x, t.tile_y, t.token, t.tf, d.df,
         ROUND(CAST(t.tf AS DOUBLE)
               * LN(CAST((SELECT c FROM n) AS DOUBLE) / CAST(d.df AS DOUBLE)),
               10) AS tfidf
  FROM tf t JOIN df d USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER
            (PARTITION BY tile_x, tile_y ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
SELECT tile_x, tile_y, token, tf, df, tfidf, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""

WEBTEXT_QUERIES["tile_top_terms"] = q_tile_top_terms
WEBTEXT_ORACLES["tile_top_terms"] = SQL_TILE_TOP_TERMS


# ---------------------------------------------------------------------------
# Q: bm25_top_terms — per-document top-3 BM25 terms (Okapi BM25, the
# Robertson et al. formulation with the Lucene-style +1 inside the idf log
# so scores stay positive; k1=1.2, b=0.75)
#
# Rides the shared TF machinery: `_tf_dl_batch` additionally emits each
# doc's length dl IN-BATCH (one input row is one document, so dl never
# needs a per-doc shuffle); df attaches through the same gated
# `attach_df` plan as TF-IDF; avgdl is ONE driver-side scalar
# (`tf.sum("tf")` — an aggregate, not a materialization); top-k rides
# `grouped_topk`'s block-local k-prune. Float policy: identical op
# sequence on both sides, rounded to 10 dp (house rule).

BM25_K1 = 1.2
BM25_B = 0.75


def _tf_dl_batch(t: pa.Table) -> pa.Table:
    """(doc_id, token, tf, dl) rows — `_tf_batch` plus the per-document
    token count dl, computable in-batch because each input row is one
    whole document."""
    base = _tf_batch(t)
    if len(base) == 0:
        return base.append_column("dl", pa.array([], type=pa.int64()))
    ids = base.column("doc_id").to_numpy()
    # dl = total tokens of the doc = sum of its tf rows; tf rows for one
    # doc are contiguous within this batch's output (sorted by parent)
    new = np.ones(len(ids), dtype=bool)
    new[1:] = ids[1:] != ids[:-1]
    seg = np.cumsum(new) - 1
    tf_v = base.column("tf").to_numpy()
    dl_per_doc = np.bincount(seg, weights=tf_v).astype(np.int64)
    return base.append_column("dl", pa.array(dl_per_doc[seg]))


def bm25_top_terms(docs: Dataset, n_docs: int, k: int = TFIDF_K,
                   df_broadcast_limit: int | None = None) -> Dataset:
    """Top-``k`` BM25 terms per doc over a (doc_id, text) Dataset."""
    from ..ops.topk import grouped_topk

    tf = docs.map_batches(_tf_dl_batch, batch_format="pyarrow").materialize()
    total_tokens = tf.sum("tf")
    if not total_tokens:
        return tf.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "token": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "bm25": pa.array([], type=pa.float64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    n_f = float(n_docs)
    avgdl = float(total_tokens) / n_f

    def score(t: pa.Table) -> pa.Table:
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        dl_v = t.column("dl").to_numpy().astype(np.float64)
        df_v = t.column("df").to_numpy().astype(np.float64)
        # op sequence mirrored EXACTLY in SQL_BM25_TOP_TERMS
        idf = np.log((n_f - df_v + 0.5) / (df_v + 0.5) + 1.0)
        denom = tf_v + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl_v / avgdl))
        bm25 = np.round(idf * ((tf_v * (BM25_K1 + 1.0)) / denom), 10)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "dl": t.column("dl"),
                "df": t.column("df"),
                "bm25": pa.array(bm25),
            }
        )

    scored = attach_df(tf, df_broadcast_limit).map_batches(
        score, batch_format="pyarrow"
    )
    return grouped_topk(
        scored,
        ["doc_id"],
        [("bm25", False), ("token", True)],
        k,
        rank_col="rank",
    )


def q_bm25_top_terms(sf_dir: str) -> Dataset:
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_top_terms(docs, n_docs)


SQL_BM25_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM documents),
avgdl AS (SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT c FROM n) AS a FROM toks),
scored AS (
  SELECT t.doc_id, t.token, t.tf, l.dl, d.df,
         ROUND(
           LN(((SELECT c FROM n) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
           * ((CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0})
              / (CAST(t.tf AS DOUBLE)
                 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                     * (CAST(l.dl AS DOUBLE) / (SELECT a FROM avgdl))))),
           10) AS bm25
  FROM tf t JOIN dl l USING (doc_id) JOIN df d USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY bm25 DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, dl, df, bm25, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= {TFIDF_K}
"""

WEBTEXT_QUERIES["bm25_top_terms"] = q_bm25_top_terms
WEBTEXT_ORACLES["bm25_top_terms"] = SQL_BM25_TOP_TERMS


# ---------------------------------------------------------------------------
# Q: bm25_search — ad-hoc retrieval: score every document against a fixed
# query-term set (Okapi BM25, same k1/b/idf as bm25_top_terms) and return
# the global top-k matches. The search-engine consumer of the BM25
# machinery: one tokenization pass computes per-doc query-term tf + dl
# AND the corpus token total (for avgdl) — query-term rows are filtered
# IN-BATCH before anything shuffles, so the downstream movement is
# ≤ |query| rows per matching doc, never the tf table. df for the query
# terms is a ≤|query|-row aggregate pulled to the driver (bounded by the
# QUERY, not the corpus — the broadcast asymmetry decontamination
# documents). Scores ship as exact int64 ``score_e10`` (per-term score
# rounded at 1e-10 then summed in integer space), so the per-doc sum is
# order-free and bitwise-reproducible at any parallelism — float
# summation order can never flip a rank. Global top-k rides
# ``grouped_topk`` under a constant key: its block-local k-prune moves
# ≤ k rows per block into the single-group edge pass.

BM25_QUERY_TERMS = ("table", "fast", "query")
BM25_SEARCH_K = 20


def bm25_search(
    docs: Dataset,
    n_docs: int,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_SEARCH_K,
) -> Dataset:
    from ..ops.topk import grouped_topk
    from ..stages.salted import partial_count

    qlist = sorted(query_terms)
    qarr = pa.array(qlist, type=pa.string())

    def qtf_batch(t: pa.Table) -> pa.Table:
        base = _tf_dl_batch(t)
        total = pc.sum(base["tf"]).as_py() or 0
        filt = base.filter(pc.is_in(base["token"], value_set=qarr)).select(
            ["doc_id", "token", "tf", "dl"]
        )
        # one sentinel row per batch carries the batch's token total (for
        # avgdl) so the corpus is tokenized exactly once
        tot = pa.table(
            {
                "doc_id": pa.array([-1], type=pa.int64()),
                "token": pa.array([""], type=pa.string()),
                "tf": pa.array([int(total)], type=pa.int64()),
                "dl": pa.array([0], type=pa.int64()),
            }
        )
        return pa.concat_tables([filt, tot])

    mat = docs.map_batches(qtf_batch, batch_format="pyarrow").materialize()
    total_tokens = (
        mat.map_batches(
            lambda t: t.filter(pc.equal(t["doc_id"], -1)).select(["tf"]),
            batch_format="pyarrow",
        ).sum("tf")
        or 0
    )
    hits = mat.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 0)),
        batch_format="pyarrow",
    )
    # df of each query term = its (doc, term) row count in the tf rows;
    # the result is ≤ |query| rows BY DEFINITION — driver-side pull is the
    # bounded broadcast
    df_rows = partial_count(
        hits.map_batches(lambda t: t.select(["token"]), batch_format="pyarrow"),
        ["token"],
        out="df",
    ).take_all()
    df_map = {r["token"]: r["df"] for r in df_rows}

    def _empty() -> Dataset:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_terms": pa.array([], type=pa.int64()),
                    "score_e10": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        )

    if not df_map or total_tokens == 0:
        return _empty()

    n_f = float(n_docs)
    avgdl = float(total_tokens) / n_f
    df_arr = np.array([float(df_map.get(tk, 0)) for tk in qlist])

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_terms": pa.array([], type=pa.int64()),
                    "score_e10": pa.array([], type=pa.int64()),
                }
            )
        pos = pc.index_in(t["token"], value_set=qarr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df_v = df_arr[pos]
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        dl_v = t.column("dl").to_numpy().astype(np.float64)
        # op sequence mirrored EXACTLY in SQL_BM25_SEARCH; ×1e10 + round
        # moves the per-term score to exact integer space
        idf = np.log((n_f - df_v + 0.5) / (df_v + 0.5) + 1.0)
        denom = tf_v + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl_v / avgdl))
        s = np.round(
            idf * ((tf_v * (BM25_K1 + 1.0)) / denom) * 10000000000.0
        ).astype(np.int64)
        part = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_terms": pa.array(np.ones(len(t), dtype=np.int64)),
                "score_e10": pa.array(s),
            }
        )
        g = part.group_by(["doc_id"]).aggregate(
            [("n_terms", "sum"), ("score_e10", "sum")]
        )
        return g.rename_columns(["doc_id", "n_terms", "score_e10"])

    agg = merge_group_sums(
        hits.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        ["n_terms", "score_e10"],
    )
    keyed = agg.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(len(t), dtype=np.int32))),
        batch_format="pyarrow",
    )
    top = grouped_topk(
        keyed, ["_g"], [("score_e10", False), ("doc_id", True)], k, rank_col="rank"
    )
    return top.map_batches(
        lambda t: t.drop_columns(["_g"]), batch_format="pyarrow"
    )


def q_bm25_search(sf_dir: str) -> Dataset:
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_search(docs, n_docs)


def _sql_bm25_search() -> str:
    values = ", ".join(f"('{t}')" for t in sorted(BM25_QUERY_TERMS))
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM documents),
avgdl AS (SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT c FROM n) AS a FROM toks),
q(token) AS (VALUES {values}),
df AS (SELECT token, COUNT(*) AS df FROM tf JOIN q USING (token) GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(
           LN(((SELECT c FROM n) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
           * ((CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0})
              / (CAST(t.tf AS DOUBLE)
                 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                     * (CAST(l.dl AS DOUBLE) / (SELECT a FROM avgdl)))))
           * 10000000000.0, 0) AS BIGINT) AS s
  FROM tf t JOIN q USING (token) JOIN dl l USING (doc_id) JOIN df d USING (token)
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(s) AS BIGINT) AS score_e10
  FROM scored GROUP BY 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_e10 DESC, doc_id) AS rank
  FROM agg
)
SELECT doc_id, n_terms, score_e10, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {BM25_SEARCH_K}
"""


WEBTEXT_QUERIES["bm25_search"] = q_bm25_search
WEBTEXT_ORACLES["bm25_search"] = _sql_bm25_search()


# ---------------------------------------------------------------------------
# Q: lm_dirichlet_topk — Dirichlet-smoothed query-likelihood retrieval
# (Zhai & Lafferty's LM scoring, the other classical ad-hoc model next to
# BM25), in the standard rank-equivalent form
#   score(d) = Σ_{t ∈ q, tf>0} ln(1 + tf / (μ·cf_t/|C|))
#            + |q| · ln(μ / (dl + μ)),          μ = 2000
# which equals the full query likelihood Σ_{t∈q} ln((tf+μp_t)/(dl+μ))
# minus the doc-independent constant Σ ln(μ·p_t) — so the ranking over
# ALL docs is exact while only docs containing ≥1 query term need rows
# (a naive matched-term-only Σ ln((tf+μp)/(dl+μ)) would PENALIZE docs
# matching more terms — negative logs — caught by the semantics pytest).
#
# Shares bm25_search's one-pass plumbing: the corpus is tokenized ONCE
# (_tf_dl_batch), hit rows carry (tf, dl), the sentinel row carries the
# batch token total for |C|. The broadcast side — per-query-term
# collection frequency cf — is ≤ |query| rows BY DEFINITION (same bound
# as bm25's df pull; attach_df's gated join is the >limit plan family).
# Float policy: ln is in the bitwise family; each per-term score rounds
# to e10 int64 BEFORE the order-free grouped sum (CLAUDE.md e-integer
# rule). Reference analog: importance ranking consumers
# (steps/output.sh:26-128) — same ln-ratio shape as E5.

LM_MU = 2000.0


def lm_dirichlet_search(
    docs: Dataset,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_SEARCH_K,
) -> Dataset:
    from ..ops.topk import grouped_topk
    from ..stages.salted import partial_count

    qlist = sorted(query_terms)
    qarr = pa.array(qlist, type=pa.string())

    def qtf_batch(t: pa.Table) -> pa.Table:
        base = _tf_dl_batch(t)
        total = pc.sum(base["tf"]).as_py() or 0
        filt = base.filter(pc.is_in(base["token"], value_set=qarr)).select(
            ["doc_id", "token", "tf", "dl"]
        )
        tot = pa.table(
            {
                "doc_id": pa.array([-1], type=pa.int64()),
                "token": pa.array([""], type=pa.string()),
                "tf": pa.array([int(total)], type=pa.int64()),
                "dl": pa.array([0], type=pa.int64()),
            }
        )
        return pa.concat_tables([filt, tot])

    mat = docs.map_batches(qtf_batch, batch_format="pyarrow").materialize()
    total_tokens = (
        mat.map_batches(
            lambda t: t.filter(pc.equal(t["doc_id"], -1)).select(["tf"]),
            batch_format="pyarrow",
        ).sum("tf")
        or 0
    )
    hits = mat.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 0)),
        batch_format="pyarrow",
    )
    # collection frequency of each query term: ≤ |query| rows BY DEFINITION
    cf_rows = _pull_hits_sum(hits)
    cf_map = {r[0]: r[1] for r in cf_rows}

    def _empty() -> Dataset:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_terms": pa.array([], type=pa.int64()),
                    "score_e10": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        )

    if not cf_map or total_tokens == 0:
        return _empty()

    c_f = float(total_tokens)
    cf_arr = np.array([float(cf_map.get(tk, 0)) for tk in qlist])

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_terms": pa.array([], type=pa.int64()),
                    "score_e10": pa.array([], type=pa.int64()),
                }
            )
        pos = pc.index_in(t["token"], value_set=qarr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cf_v = cf_arr[pos]
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        dl_v = t.column("dl").to_numpy().astype(np.float64)
        nq = float(len(qlist))
        # op sequences mirrored EXACTLY in _sql_lm_dirichlet; each rounds
        # to e10 int64 BEFORE summing (order-free)
        s_term = np.round(
            np.log(1.0 + tf_v / (LM_MU * (cf_v / c_f))) * 10000000000.0
        ).astype(np.int64)
        # the per-DOC dl factor: every hit row of a doc carries the same
        # dl and one input row is one whole document (_tf_dl_batch), so
        # all of a doc's hit rows are in THIS batch — fold the factor
        # into the in-batch per-doc partial exactly once
        part = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_terms": pa.array(np.ones(len(t), dtype=np.int64)),
                "s_term": pa.array(s_term),
                "dl": t.column("dl"),
            }
        )
        g = part.group_by(["doc_id"]).aggregate(
            [("n_terms", "sum"), ("s_term", "sum"), ("dl", "min")]
        )
        g = g.rename_columns(["doc_id", "n_terms", "s_term", "dl"])
        dl_doc = g.column("dl").to_numpy().astype(np.float64)
        dl_fac = np.round(
            nq * np.log(LM_MU / (dl_doc + LM_MU)) * 10000000000.0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_terms": g.column("n_terms"),
                "score_e10": pa.array(
                    g.column("s_term").to_numpy().astype(np.int64) + dl_fac
                ),
            }
        )

    agg = merge_group_sums(
        hits.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        ["n_terms", "score_e10"],
    )
    keyed = agg.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(len(t), dtype=np.int32))),
        batch_format="pyarrow",
    )
    top = grouped_topk(
        keyed, ["_g"], [("score_e10", False), ("doc_id", True)], k, rank_col="rank"
    )
    return top.map_batches(
        lambda t: t.drop_columns(["_g"]), batch_format="pyarrow"
    )


def _pull_hits_sum(hits: Dataset) -> list:
    """(token, Σtf) over the ≤|query|-token hit rows — bounded pull."""
    merged = merge_group_sums(
        hits.map_batches(
            lambda t: pa.table({"token": t["token"], "cf": t["tf"]}),
            batch_format="pyarrow",
        ),
        ["token"],
        ["cf"],
    )
    return [
        (r["token"], r["cf"]) for r in merged.take_all()
    ]


def q_lm_dirichlet_topk(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lm_dirichlet_search(docs)


def _sql_lm_dirichlet() -> str:
    values = ", ".join(f"('{t}')" for t in sorted(BM25_QUERY_TERMS))
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
ctot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM toks),
q(token) AS (VALUES {values}),
cf AS (
  SELECT t.token, CAST(SUM(t.tf) AS BIGINT) AS cf
  FROM tf t JOIN q USING (token) GROUP BY 1
),
scored AS (
  SELECT t.doc_id, l.dl,
         CAST(ROUND(
           LN(1.0 + CAST(t.tf AS DOUBLE)
              / ({LM_MU} * (CAST(cf.cf AS DOUBLE) / (SELECT c FROM ctot))))
           * 10000000000.0, 0) AS BIGINT) AS s
  FROM tf t JOIN q USING (token) JOIN dl l USING (doc_id) JOIN cf USING (token)
),
nq AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM q),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(s)
              + CAST(ROUND((SELECT k FROM nq)
                           * LN({LM_MU} / (CAST(MIN(dl) AS DOUBLE) + {LM_MU}))
                           * 10000000000.0, 0) AS BIGINT)
              AS BIGINT) AS score_e10
  FROM scored GROUP BY 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_e10 DESC, doc_id) AS rank
  FROM agg
)
SELECT doc_id, n_terms, score_e10, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {BM25_SEARCH_K}
"""


WEBTEXT_QUERIES["lm_dirichlet_topk"] = q_lm_dirichlet_topk
WEBTEXT_ORACLES["lm_dirichlet_topk"] = _sql_lm_dirichlet()


# ---------------------------------------------------------------------------
# Q: length_percentiles — EXACT per-language percentiles of doc length
#
# Exact distributed percentiles over an integer-valued column without ever
# co-locating a group's raw values: per-batch (lang, n_chars) histogram
# partials → one `merge_group_sums` shuffle of counts → percentiles read
# off the merged cumulative histogram. Movement is bounded by
# langs × distinct lengths (≪ corpus; a quantile over a true continuous
# column would bucket first), so the final single-block assembly is
# histogram-sized, never corpus-sized. PERCENTILE_DISC semantics pinned
# to DuckDB's (1-based element at ceil(p·n); property-tested vs DuckDB
# across group sizes in tests/test_webtext.py).

PCTS = (0.25, 0.5, 0.9)


def _pct_from_hist(vals: np.ndarray, counts: np.ndarray, p: float) -> int:
    """values sorted ascending, counts aligned; DuckDB PERCENTILE_DISC."""
    n = int(counts.sum())
    idx = max(1, int(np.ceil(p * n)))  # 1-based rank
    cum = np.cumsum(counts)
    return int(vals[np.searchsorted(cum, idx)])


def q_length_percentiles(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "cnt"])

    merged = merge_group_sums(
        docs.map_batches(hist, batch_format="pyarrow"), ["lang", "n_chars"], ["cnt"]
    )

    def finalize(t: pa.Table) -> pa.Table:
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        vals = t.column("n_chars").to_numpy()
        cnts = t.column("cnt").to_numpy()
        o = np.lexsort((vals, langs))
        langs, vals, cnts = langs[o], vals[o], cnts[o]
        out = {"lang": [], "p25": [], "p50": [], "p90": [], "n_docs": []}
        for lg in np.unique(langs):
            m = langs == lg
            out["lang"].append(lg)
            for p, col in zip(PCTS, ("p25", "p50", "p90")):
                out[col].append(_pct_from_hist(vals[m], cnts[m], p))
            out["n_docs"].append(int(cnts[m].sum()))
        return pa.table(
            {
                "lang": pa.array(out["lang"], type=pa.string()),
                "p25": pa.array(out["p25"], type=pa.int64()),
                "p50": pa.array(out["p50"], type=pa.int64()),
                "p90": pa.array(out["p90"], type=pa.int64()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
            }
        )

    # histogram-sized by construction — single-block assembly is bounded
    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_LENGTH_PERCENTILES = """
SELECT lang,
       PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_chars) AS p25,
       PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY n_chars) AS p50,
       PERCENTILE_DISC(0.9)  WITHIN GROUP (ORDER BY n_chars) AS p90,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""

WEBTEXT_QUERIES["length_percentiles"] = q_length_percentiles
WEBTEXT_ORACLES["length_percentiles"] = SQL_LENGTH_PERCENTILES


# ---------------------------------------------------------------------------
# Q: pii_scrub — PII redaction (standard corpus-curation hygiene)
#
# The fixture texts carry no PII, so both sides append deterministic
# synthetic PII (closed-form from doc_id) BEFORE scrubbing — the oracle
# then genuinely exercises redaction parity, byte-exact on the scrubbed
# text: Arrow's replace_substring_regex and DuckDB's regexp_replace are
# both RE2, so identical patterns give identical bytes. Entirely
# vectorized Arrow kernels, stateless task stage, zero shuffle.

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\d{3}-\d{4}"


def _scrub_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id")
    mod = pa.array(ids.to_numpy() % 10000, type=pa.int64())
    pad4 = pc.utf8_lpad(pc.cast(mod, pa.string()), 4, "0")
    aug = pc.binary_join_element_wise(
        t.column("text"),
        " contact: user",
        pc.cast(ids, pa.string()),
        "@mail.example.com phone 555-",
        pad4,
        "",
    )
    n_emails = pc.count_substring_regex(aug, _EMAIL_RE)
    clean = pc.replace_substring_regex(aug, _EMAIL_RE, "<EMAIL>")
    n_phones = pc.count_substring_regex(clean, _PHONE_RE)
    clean = pc.replace_substring_regex(clean, _PHONE_RE, "<PHONE>")
    return pa.table(
        {
            "doc_id": ids,
            "clean_text": clean,
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
        }
    )


def q_pii_scrub(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(_scrub_batch, batch_format="pyarrow")


SQL_PII_SCRUB = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact: user' || doc_id || '@mail.example.com phone 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t2
  FROM aug
)
SELECT doc_id,
       regexp_replace(t2, '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t2, '{_PHONE_RE}')) AS BIGINT) AS n_phones
FROM e
"""

WEBTEXT_QUERIES["pii_scrub"] = q_pii_scrub
WEBTEXT_ORACLES["pii_scrub"] = SQL_PII_SCRUB


# ---------------------------------------------------------------------------
# Q: perplexity_buckets — CCNet-style language-model quality scoring
# (Wenzek et al. 2020: bucket documents into head/middle/tail by LM
# perplexity before training). The LM here is the corpus's own unigram
# model — a production deployment broadcasts an EXTERNAL pretrained
# logprob table through the same attach_token_stat plan (the table is
# vocabulary-sized BY DEFINITION; the token-keyed hash join is the named
# >limit fallback). Per-token negative log-prob is moved to exact
# integer space per the house e10 policy (ln/×/round are the identical
# IEEE op sequence on both sides; integer sums are order-free at any
# parallelism), and the per-doc mean is int64 floor division. Plan: ONE
# tokenization pass → cf partial-sums (vocab-sized, never re-shuffled)
# → gated cf attach → per-doc integer partials through one combiner
# merge. Movement: (doc × distinct-token) tf rows once; text never
# moves after tokenization.

# Bucket thresholds are CONFIG CONSTANTS (CCNet picks them as corpus
# percentiles offline); these split the synthetic fixture ≈ 35/40/25 at
# both test scales so every branch is exercised.
PPL_HEAD_E10 = 34_000_000_000  # mean nll < 3.40 nats → "head"
PPL_TAIL_E10 = 34_050_000_000  # mean nll ≥ 3.405 nats → "tail"


def perplexity_buckets(docs: Dataset, cf_broadcast_limit: int | None = None) -> Dataset:
    from ..stages.salted import merge_group_sums, partial_sum

    tf = docs.map_batches(_tf_batch, batch_format="pyarrow").materialize()
    cf_ds = partial_sum(tf, ["token"], "tf", out="cf").materialize()
    total_tokens = float(cf_ds.sum("cf"))  # ONE bounded scalar pull (E4)

    withcf = attach_token_stat(tf, cf_ds, "cf", cf_broadcast_limit)

    def score(t: pa.Table) -> pa.Table:
        tf_v = t.column("tf").to_numpy().astype(np.float64)
        cf_v = t.column("cf").to_numpy().astype(np.float64)
        # op sequence mirrored EXACTLY in SQL: LN(T/cf) * tf * 1e10, round
        s = np.round(
            np.log(total_tokens / cf_v) * tf_v * 10000000000.0
        ).astype(np.int64)
        part = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(t.column("tf"), pa.int64()),
                "nll_e10": pa.array(s),
            }
        )
        g = part.group_by(["doc_id"]).aggregate(
            [("n_tokens", "sum"), ("nll_e10", "sum")]
        )
        return g.rename_columns(["doc_id", "n_tokens", "nll_e10"])

    agg = merge_group_sums(
        withcf.map_batches(score, batch_format="pyarrow"),
        ["doc_id"],
        ["n_tokens", "nll_e10"],
    )

    def bucket(t: pa.Table) -> pa.Table:
        nll = t.column("nll_e10").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        mean = nll // n  # non-negative int64: floor == trunc == SQL //
        lab = np.where(
            mean < PPL_HEAD_E10,
            "head",
            np.where(mean < PPL_TAIL_E10, "middle", "tail"),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "nll_e10": t.column("nll_e10"),
                "mean_nll_e10": pa.array(mean),
                "bucket": pa.array(lab),
            }
        )

    return agg.map_batches(bucket, batch_format="pyarrow")


def q_perplexity_buckets(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return perplexity_buckets(docs)


SQL_PERPLEXITY_BUCKETS = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
cf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
tt AS (SELECT CAST(SUM(tf) AS DOUBLE) AS t FROM tf),
scored AS (
  SELECT t.doc_id, CAST(t.tf AS BIGINT) AS tf_i,
         CAST(ROUND(
           LN((SELECT t FROM tt) / CAST(c.cf AS DOUBLE))
           * CAST(t.tf AS DOUBLE) * 10000000000.0, 0) AS BIGINT) AS s
  FROM tf t JOIN cf c USING (token)
),
agg AS (
  SELECT doc_id, CAST(SUM(tf_i) AS BIGINT) AS n_tokens,
         CAST(SUM(s) AS BIGINT) AS nll_e10
  FROM scored GROUP BY 1
)
SELECT doc_id, n_tokens, nll_e10,
       CAST(nll_e10 // n_tokens AS BIGINT) AS mean_nll_e10,
       CASE WHEN nll_e10 // n_tokens < {PPL_HEAD_E10} THEN 'head'
            WHEN nll_e10 // n_tokens < {PPL_TAIL_E10} THEN 'middle'
            ELSE 'tail' END AS bucket
FROM agg
"""

WEBTEXT_QUERIES["perplexity_buckets"] = q_perplexity_buckets
WEBTEXT_ORACLES["perplexity_buckets"] = SQL_PERPLEXITY_BUCKETS


# ---------------------------------------------------------------------------
# Q: quality_ppl_crosstab — signal-correlation cross-tab: how the Gopher
# integer quality gate (J9, corpusops._gate_features) and the CCNet
# perplexity bucket (perplexity_buckets above) agree — the calibration
# dashboard every curation pipeline keeps (are the cheap rules and the
# LM-based score rejecting the SAME documents?). Plan: the gate flag is
# ONE stateless text pass (doc_id, passed); the bucket side reuses the
# perplexity pipeline; both are doc-keyed int64 tables and DENSE (every
# tokenized doc appears on each side), so the combine is one int64 hash
# join with floored partitions (round-4 sparse-side rule does not bite),
# then (bucket, passed) count partials through one combiner merge —
# constant-size output.


def q_quality_ppl_crosstab(sf_dir: str) -> Dataset:
    from ..stages.salted import default_partitions, merge_group_sums
    from .corpusops import _gate_features

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def flags(t: pa.Table) -> pa.Table:
        _, _, _, passing = _gate_features(t)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "passed": pa.array(np.asarray(passing, dtype=np.int64)),
            }
        )

    flag_ds = docs.map_batches(flags, batch_format="pyarrow")
    ppl = perplexity_buckets(docs).map_batches(
        lambda t: pa.table(
            {
                "p_doc": pc.cast(t["doc_id"], pa.int64()),
                "bucket": t["bucket"],
            }
        ),
        batch_format="pyarrow",
    )
    n_docs = docs.count()
    nparts = max(2, min(default_partitions(), n_docs // 100_000 + 1))
    joined = ppl.join(
        flag_ds, "inner", num_partitions=nparts,
        on=("p_doc",), right_on=("doc_id",),
    )

    def partials(t: pa.Table) -> pa.Table:
        p = pa.table(
            {
                "bucket": t["bucket"],
                "passed": t["passed"],
                "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        g = p.group_by(["bucket", "passed"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["bucket", "passed", "n_docs"])

    return merge_group_sums(
        joined.map_batches(partials, batch_format="pyarrow"),
        ["bucket", "passed"],
        ["n_docs"],
    )


def _sql_quality_ppl_crosstab() -> str:
    from .corpusops import SQL_QUALITY_FILTER

    return f"""
WITH ppl AS ({SQL_PERPLEXITY_BUCKETS}),
qf AS (SELECT doc_id FROM ({SQL_QUALITY_FILTER}))
SELECT p.bucket,
       CASE WHEN q.doc_id IS NULL THEN 0 ELSE 1 END AS passed,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ppl p LEFT JOIN qf q ON q.doc_id = p.doc_id
GROUP BY 1, 2
"""


WEBTEXT_QUERIES["quality_ppl_crosstab"] = q_quality_ppl_crosstab
WEBTEXT_ORACLES["quality_ppl_crosstab"] = _sql_quality_ppl_crosstab()


# ---------------------------------------------------------------------------
# Q: quality_skyline — the SKYLINE (Pareto-front preference) operator
# (Börzsönyi et al. 2001): documents not DOMINATED on the two quality
# axes (maximize n_tokens, minimize mean_nll_e10 — "longer AND cleaner
# wins"); b dominates a iff b.tokens ≥ a.tokens ∧ b.nll ≤ a.nll with at
# least one strict. Both axes are the exact integers of
# perplexity_buckets, so dominance is exact. Distributed plan: the
# skyline DISTRIBUTES over union (every global skyline point survives
# its own block's local skyline), so one vectorized local-skyline pass
# per block (sort by tokens desc / nll asc + two segmented running
# mins — dominated iff min-nll-among-strictly-more-tokens ≤ nll, or
# min-nll-among-equal-tokens < nll) prunes each block to its Pareto
# front, and ONE skyline-sized final pass over the coalesced candidates
# is exact. Output is Pareto-front-sized (typically ≪ corpus; the
# 2-D front over integer axes is bounded by the distinct token-count
# range — documented bound).


def _skyline_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return t
    tok = t.column("n_tokens").to_numpy(zero_copy_only=False)
    nll = t.column("mean_nll_e10").to_numpy(zero_copy_only=False)
    order = np.lexsort((nll, -tok))
    tok_s, nll_s = tok[order], nll[order]
    # running min nll over all STRICTLY-greater-token rows: group rows by
    # token value (sorted desc), min-nll per group, exclusive prefix min
    new_grp = np.concatenate(([True], tok_s[1:] != tok_s[:-1]))
    starts = np.flatnonzero(new_grp)
    grp_of = np.cumsum(new_grp) - 1
    grp_min = np.minimum.reduceat(nll_s, starts)
    prefix = np.minimum.accumulate(grp_min)
    big = np.int64(np.iinfo(np.int64).max)
    min_gt = np.concatenate(([big], prefix[:-1]))[grp_of]
    dominated = (min_gt <= nll_s) | (grp_min[grp_of] < nll_s)
    keep_idx = order[~dominated]
    return t.take(pa.array(np.sort(keep_idx)))


def q_quality_skyline(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ppl = perplexity_buckets(docs).map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "mean_nll_e10"]),
        batch_format="pyarrow",
    )
    local = ppl.map_batches(_skyline_block, batch_format="pyarrow")
    # candidates are the union of per-block fronts — front-sized; the
    # final exact pass runs on ONE coalesced block
    return local.repartition(1).map_batches(
        _skyline_block, batch_format="pyarrow", batch_size=None
    )


def _sql_quality_skyline() -> str:
    return f"""
WITH ppl AS (
  SELECT doc_id, n_tokens, mean_nll_e10 FROM ({SQL_PERPLEXITY_BUCKETS})
)
SELECT a.doc_id, a.n_tokens, a.mean_nll_e10
FROM ppl a
WHERE NOT EXISTS (
  SELECT 1 FROM ppl b
  WHERE b.n_tokens >= a.n_tokens AND b.mean_nll_e10 <= a.mean_nll_e10
    AND (b.n_tokens > a.n_tokens OR b.mean_nll_e10 < a.mean_nll_e10)
)
"""


WEBTEXT_QUERIES["quality_skyline"] = q_quality_skyline
WEBTEXT_ORACLES["quality_skyline"] = _sql_quality_skyline()


# ---------------------------------------------------------------------------
# Q: cms_registers — Count-Min sketch register state over the corpus's
# token stream (Cormode-Muthukrishnan 2005): the THIRD mergeable sketch
# family after HLL (distinct) and Misra-Gries (heavy hitters) — CMS
# answers point frequency queries with one-sided error (estimate =
# min over rows of register[j][col_j(t)] ≥ true count, overestimate
# bounded by N/w per row). d=4 rows × w=1024 columns; column hashes are
# the 4 disjoint 10-bit slices of the md5-based 64-bit token hash
# (SQL-replicable via the simhash idiom; md5 slices are independent
# enough for the demo — production would draw d pairwise-independent
# multipliers through the same closed-form-constant route as the seeded
# MinHash). The register table IS the output (pure integer sums,
# identical at any parallelism); the estimator + overestimate property
# are pytest-checked. Plan: per-batch token counts hash their
# DICTIONARY once (vocabulary-sized loop — Zipf-bounded, the sanctioned
# exception) → 4 register partials per distinct (row, col) per block →
# ONE combiner merge of ≤ d·w rows per block.

CMS_D = 4
CMS_W = 1024


def q_cms_registers(sf_dir: str) -> Dataset:
    import hashlib

    from ..stages.salted import merge_group_sums

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = docs.map_batches(_tf_batch, batch_format="pyarrow")

    def registers(t: pa.Table) -> pa.Table:
        toks = pc.cast(t.column("token"), pa.string())
        cnt = t.column("tf").to_numpy().astype(np.int64)
        uniq, inv = np.unique(
            np.asarray(toks.to_pylist(), dtype=object), return_inverse=True
        )
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(u.encode("utf-8")).digest()[:8], "big"
                )
                for u in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        hrow = h[inv]
        parts = []
        for j in range(CMS_D):
            col = ((hrow >> np.uint64(10 * j)) & np.uint64(CMS_W - 1)).astype(
                np.int64
            )
            parts.append(
                pa.table(
                    {
                        "row": pa.array(
                            np.full(len(col), j, dtype=np.int64)
                        ),
                        "col": pa.array(col),
                        "total": pa.array(cnt),
                    }
                )
            )
        allp = pa.concat_tables(parts)
        g = allp.group_by(["row", "col"]).aggregate([("total", "sum")])
        return g.rename_columns(["row", "col", "total"])

    return merge_group_sums(
        tf.map_batches(registers, batch_format="pyarrow"),
        ["row", "col"],
        ["total"],
    )


SQL_CMS_REGISTERS = f"""
WITH toks AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
th AS (
  SELECT token, c,
         CAST(('0x' || SUBSTR(md5(token), 1, 16)) AS UBIGINT) AS h
  FROM cf
)
SELECT j.j AS row,
       CAST((h >> CAST(10 * j.j AS INTEGER)) & {CMS_W - 1} AS BIGINT) AS col,
       CAST(SUM(c) AS BIGINT) AS total
FROM th, range(0, {CMS_D}) j(j)
GROUP BY 1, 2
"""

WEBTEXT_QUERIES["cms_registers"] = q_cms_registers
WEBTEXT_ORACLES["cms_registers"] = SQL_CMS_REGISTERS


# ---------------------------------------------------------------------------
# Q: window_top_terms — trending vocabulary: the top-3 tokens of every
# crawl-time window (5-minute bins over warc_ts = epoch + doc_id, the
# fixture's closed-form timestamp) — the "what is being crawled NOW"
# dashboard. ONE tokenization pass emits (bin, token, tf) partials
# pre-combined in-batch; a combiner merge collapses them and
# ops/topk.grouped_topk's sorted-run path takes k=3 per bin (ties →
# token asc). Movement: (bin × distinct-token) partial rows, then k
# rows per (bin, block).

WINDOW_BIN_S = 300
WINDOW_TOP_K = 3
_WARC_EPOCH_S = 1_767_225_600  # 2026-01-01T00:00:00Z (fixture contract)


def q_window_top_terms(sf_dir: str) -> Dataset:
    from ..ops.topk import grouped_topk
    from ..stages.salted import merge_group_sums

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = docs.map_batches(_tf_batch, batch_format="pyarrow")

    def binned(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        tb = (_WARC_EPOCH_S + ids) // WINDOW_BIN_S
        p = pa.table(
            {
                "t_bucket": pa.array(tb.astype(np.int64)),
                "token": pc.cast(t["token"], pa.string()),
                "tf": pc.cast(t["tf"], pa.int64()),
            }
        )
        g = p.group_by(["t_bucket", "token"]).aggregate([("tf", "sum")])
        return g.rename_columns(["t_bucket", "token", "tf"])

    merged = merge_group_sums(
        tf.map_batches(binned, batch_format="pyarrow"),
        ["t_bucket", "token"],
        ["tf"],
    )
    return grouped_topk(
        merged,
        ["t_bucket"],
        [("tf", False), ("token", True)],
        WINDOW_TOP_K,
        rank_col="rank",
    )


SQL_WINDOW_TOP_TERMS = f"""
WITH toks AS (
  SELECT CAST(({_WARC_EPOCH_S} + doc_id) // {WINDOW_BIN_S} AS BIGINT)
           AS t_bucket,
         UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS token
  FROM documents
),
tf AS (
  SELECT t_bucket, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY t_bucket ORDER BY tf DESC, token) AS rnk
  FROM tf
)
SELECT t_bucket, token, tf, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= {WINDOW_TOP_K}
"""

WEBTEXT_QUERIES["window_top_terms"] = q_window_top_terms
WEBTEXT_ORACLES["window_top_terms"] = SQL_WINDOW_TOP_TERMS


# ---------------------------------------------------------------------------
# Q: type_token_ratio — lexical diversity per document (distinct-token /
# total-token counts): the repetition-quality signal that complements
# gram_repetition (low TTR = template/boilerplate text; Gopher-family
# pipelines threshold it). ONE pass over the existing _tf_batch output:
# a (doc, token, tf) row IS one type with tf occurrences, so per-doc
# (n_types, n_tokens) are plain integer partials through one combiner
# merge — no second tokenization, no text movement, ratio is a consumer
# epilogue (exact integer pair published, house norm).


def q_type_token_ratio(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_sums

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = docs.map_batches(_tf_batch, batch_format="pyarrow")

    def partials(t: pa.Table) -> pa.Table:
        p = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_types": pa.array(np.ones(len(t), dtype=np.int64)),
                "n_tokens": pc.cast(t["tf"], pa.int64()),
            }
        )
        g = p.group_by(["doc_id"]).aggregate(
            [("n_types", "sum"), ("n_tokens", "sum")]
        )
        return g.rename_columns(["doc_id", "n_types", "n_tokens"])

    return merge_group_sums(
        tf.map_batches(partials, batch_format="pyarrow"),
        ["doc_id"],
        ["n_types", "n_tokens"],
    )


SQL_TYPE_TOKEN_RATIO = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
           AS token
  FROM documents
)
SELECT doc_id,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM toks GROUP BY 1
"""

WEBTEXT_QUERIES["type_token_ratio"] = q_type_token_ratio
WEBTEXT_ORACLES["type_token_ratio"] = SQL_TYPE_TOKEN_RATIO


# ---------------------------------------------------------------------------
# Q: inverted_postings — the search-index BUILD artifact behind
# bm25_search: for every mid-band BIGRAM phrase (2 ≤ df ≤ 60 — rare
# enough to be discriminative, the band a phrase-index pruner keeps
# hot; bigrams because they are where phrase search actually needs a
# prebuilt index), its document-frequency, corpus tf, and the doc_id
# posting list ORDERED BY doc_id (delta-encodable downstream),
# serialized as a CSV string so the driver's value hash covers the
# exact list CONTENT AND ORDER.
# Plan: one vectorized bigram-tf pass (the _tf_batch idiom on the
# vocab_topk bigram construction), df via the gated attach_df plan
# (broadcast ≤20M vocab, token join above), the band filter drops the
# corpus-sized head/tail BEFORE any sort, then ONE sorted_group_apply
# on token builds each posting list vectorized (ListArray.from_arrays
# over run offsets + pc.binary_join — no per-token Python). Movement
# after the filter is band-sized (≤ df_max rows/term).


POSTINGS_DF_MIN = 2
POSTINGS_DF_MAX = 60


def _bigram_tf_batch(t: pa.Table) -> pa.Table:
    """(doc_id, token=bigram, tf) rows, fully vectorized: adjacent-token
    join within each doc (vocab_topk's construction) then ONE lexsort +
    run-length count per (doc, bigram)."""
    ids = t.column("doc_id").to_numpy()
    col = t.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "token": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    flat = pc.filter(flat, nonempty)
    parent = pc.filter(pc.list_parent_indices(toks), nonempty).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if len(parent) < 2:
        return empty
    left = flat.slice(0, len(flat) - 1)
    right = flat.slice(1)
    bi = pc.binary_join_element_wise(left, right, " ")
    same_doc = parent[:-1] == parent[1:]
    bi = bi.filter(pa.array(same_doc))
    bparent = parent[:-1][same_doc]
    if len(bparent) == 0:
        return empty
    enc = pc.dictionary_encode(bi)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    order = np.lexsort((codes, bparent))
    ps, cs = bparent[order], codes[order]
    new = np.ones(len(ps), dtype=bool)
    new[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(ps)))
    return pa.table(
        {
            "doc_id": pa.array(ids[ps[starts]], type=pa.int64()),
            "token": enc.dictionary.take(pa.array(cs[starts])),
            "tf": pa.array(counts, type=pa.int64()),
        }
    )


def q_inverted_postings(sf_dir: str) -> Dataset:
    from ..ops.runs import run_starts, sorted_group_apply

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf = docs.map_batches(
        _bigram_tf_batch, batch_format="pyarrow"
    ).materialize()
    banded = attach_df(tf).filter(
        expr=f"(df >= {POSTINGS_DF_MIN}) and (df <= {POSTINGS_DF_MAX})"
    )

    empty = pa.table(
        {
            "token": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "total_tf": pa.array([], type=pa.int64()),
            "postings": pa.array([], type=pa.string()),
        }
    )

    def build_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        tok = pc.cast(t.column("token"), pa.string()).combine_chunks()
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        tfv = t.column("tf").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(tok)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((did, codes))
        codes, did, tfv = codes[order], did[order], tfv[order]
        starts = np.flatnonzero(run_starts([codes]))
        ends = np.append(starts[1:], len(codes))
        doc_strs = pc.cast(pa.array(did, type=pa.int64()), pa.string())
        offsets = pa.array(
            np.append(starts, len(codes)).astype(np.int32)
        )
        lists = pa.ListArray.from_arrays(offsets, doc_strs)
        postings = pc.binary_join(lists, ",")
        return pa.table(
            {
                "token": enc.dictionary.take(pa.array(codes[starts])),
                "df": pa.array(ends - starts),
                "total_tf": pa.array(
                    np.add.reduceat(tfv, starts).astype(np.int64)
                ),
                "postings": postings,
            }
        )

    return sorted_group_apply(
        banded.select_columns(["token", "doc_id", "tf"]),
        ["token"],
        build_block,
    )


SQL_INVERTED_POSTINGS = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS tk
  FROM documents
),
bi AS (
  SELECT doc_id, tk[CAST(i.i AS INT)] || ' ' || tk[CAST(i.i AS INT) + 1]
           AS token
  FROM t, range(1, 4001) i(i) WHERE i.i <= len(tk) - 1
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM bi GROUP BY 1, 2)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tf
GROUP BY token
HAVING COUNT(*) BETWEEN {POSTINGS_DF_MIN} AND {POSTINGS_DF_MAX}
"""

WEBTEXT_QUERIES["inverted_postings"] = q_inverted_postings
WEBTEXT_ORACLES["inverted_postings"] = SQL_INVERTED_POSTINGS
