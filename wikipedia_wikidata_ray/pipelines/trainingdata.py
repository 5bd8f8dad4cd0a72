"""Training-data pipeline queries: dedup, text analysis, similarity search
(north-rule "beyond the reference" suite; first-class per the brief).

Dedup queries run over a **dup-augmented** corpus derived from
``documents`` with closed-form arithmetic (so the DuckDB oracle can build
the identical corpus): every doc with ``doc_id % 5 == 0`` gains an exact
copy at ``doc_id + N``. Same pattern for embeddings (``vec_id % 10 == 0``
→ copy at ``vec_id + N``).

Four queries are deliberately rows-only (no ``oracle_sql`` entry — the
driver records the weaker check), and since round 3 EVERY rows-only
operator has a fully-oracled twin exercising the same machinery:

- ``near_dup_pairs_minhash``: production 64-perm crc32 MinHash —
  replicating crc32 in SQL would test DuckDB's bit ops, not the
  operator. Twin: ``near_dup_pairs_minhash_seeded`` runs the IDENTICAL
  signature→band→sorted-run-pairs→Jaccard-verify pipeline with
  closed-form permutations and packed char grams, fully oracle-checked;
  ``exact_dup_pairs_lsh`` and ``ngram_jaccard`` oracle the verify side.
- ``langid_predictions``: model scoring (n-gram profile cosine) —
  the genuinely-non-SQL category named in the driver brief (accuracy
  and determinism pytest-asserted). Twin: ``langid_scores_seeded``
  runs the IDENTICAL normalize→pack-grams→profile-probe→argmax
  machinery with a pinned integer-weight profile table, fully
  oracle-checked (round-5 verdict #1).
- ``ann_topk_ivf`` / ``ann_topk_ivf_partitioned``: the bucketing is a
  FITTED k-means model (non-SQL); the partitioned variant is
  pytest-asserted row-identical to the broadcast variant. Twin:
  ``ann_topk_ivf_grid`` oracle-checks the same inverted-file
  bucket→probe→top-k shape with a closed-form partition function, and
  ``ann_topk`` oracles the exact brute path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data import Dataset

from .corpusops import ORACLE_CHARS_CAP
from ..ops.ann import ann_topk, embedding_neardup_pairs, load_candidates
from ..ops.dedup import exact_dedup, minhash_lsh_pairs
from ..ops.textstats import STOPWORDS, LangId, SimHasher, TextStats, fit_langid_profiles

# ---------------------------------------------------------------------------
# dup-augmented corpora (closed-form, SQL-replicable)


def _augmented_docs(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def dup(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = t.filter(pa.array(ids % 5 == 0))
        shifted = keep.set_column(
            0, "doc_id", pc.add(keep["doc_id"], pa.scalar(n, type=pa.int64()))
        )
        return pa.concat_tables([t, shifted])

    return docs.map_batches(dup, batch_format="pyarrow")


SQL_DOCS2_CTE = """
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT COUNT(*) FROM documents), text
  FROM documents WHERE doc_id % 5 = 0
)
"""


def _augmented_embeddings(sf_dir: str) -> Dataset:
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows

    def dup(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        keep = t.filter(pa.array(ids % 10 == 0))
        shifted = keep.set_column(
            0, "vec_id", pc.add(keep["vec_id"], pa.scalar(n, type=pa.int64()))
        )
        return pa.concat_tables([t, shifted])

    return emb.map_batches(dup, batch_format="pyarrow")


def _augmented_candidates(sf_dir: str) -> dict:
    cand = load_candidates(sf_dir)
    n = len(cand["vec_id"])
    sel = cand["vec_id"] % 10 == 0
    return {
        "vec_id": np.concatenate([cand["vec_id"], cand["vec_id"][sel] + n]),
        "matrix": np.concatenate([cand["matrix"], cand["matrix"][sel]]),
    }


SQL_EMB2_CTE = """
emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT COUNT(*) FROM embeddings), embedding
  FROM embeddings WHERE vec_id % 10 = 0
)
"""


# ---------------------------------------------------------------------------
# Q: doc_stats — token counting + quality features (oracle-checked)


def q_doc_stats(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(TextStats, batch_format="pyarrow", concurrency=(1, 8))


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

SQL_DOC_STATS = f"""
WITH toks AS (
  SELECT doc_id, LENGTH(text) AS n_chars_text,
         regexp_extract_all(LOWER(text), '[a-z0-9]+') AS tk
  FROM documents
)
SELECT doc_id,
       LEN(tk) AS n_tokens,
       n_chars_text,
       LEN(list_filter(tk, x -> x IN ({_STOP_SQL}))) AS n_stopwords,
       CASE WHEN LEN(tk) > 0
            THEN CAST(LEN(list_filter(tk, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                 / LEN(tk) ELSE 0.0 END AS stop_ratio,
       CASE WHEN LEN(tk) > 0
            THEN CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk)
            ELSE 0.0 END AS uniq_ratio,
       CASE WHEN LEN(tk) > 0
            THEN CAST(list_sum(list_transform(tk, x -> LENGTH(x))) AS DOUBLE)
                 / LEN(tk) ELSE 0.0 END AS mean_token_len
FROM toks
"""


# ---------------------------------------------------------------------------
# Q: exact_dup_groups — hash-partitioned exact dedup (oracle-checked)


def q_exact_dup_groups(sf_dir: str) -> Dataset:
    return exact_dedup(_augmented_docs(sf_dir))


SQL_EXACT_DUP_GROUPS = f"""
WITH {SQL_DOCS2_CTE}
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM docs2 GROUP BY text
"""


# ---------------------------------------------------------------------------
# Q: exact_dup_pairs_lsh — MinHash-LSH candidates verified down to exact
# duplicates (oracle: text self-join). Identical texts always share every
# band hash, so LSH recall on exact dups is 1.0 — the oracle is exact.


def q_exact_dup_pairs_lsh(sf_dir: str) -> Dataset:
    docs = _augmented_docs(sf_dir)
    # verification joins text IN by pair id (attach_pair_texts inside
    # minhash_lsh_pairs) — no driver-side corpus materialization anywhere.
    # jaccard==1.0 on shingle sets can in principle differ from string
    # equality; the joined text_a/text_b columns make the equality check
    # exact and local to each pair row.
    pairs = minhash_lsh_pairs(docs, threshold=1.0, keep_texts=True)

    def eq_verify(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("text_a"), t.column("text_b"))
        return t.filter(keep).select(["doc_a", "doc_b"])

    return pairs.map_batches(eq_verify, batch_format="pyarrow")


SQL_EXACT_DUP_PAIRS = f"""
WITH {SQL_DOCS2_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM docs2 a JOIN docs2 b ON a.text = b.text AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# Q: near_dup_pairs_minhash — full MinHash-LSH near-dup detection
# (threshold 0.8; rows-only — near-dup sets are not SQL-expressible)


def q_near_dup_pairs_minhash(sf_dir: str) -> Dataset:
    return minhash_lsh_pairs(_augmented_docs(sf_dir), threshold=0.8)


# ---------------------------------------------------------------------------
# Q: near_dup_pairs_minhash_seeded — the SAME MinHash-LSH machinery
# (signature → banded buckets → sorted-run pair gen → exact-Jaccard
# verify) with every stochastic ingredient pinned to a closed form DuckDB
# can replicate exactly, turning the round-2 rows-only cell's machinery
# fully oracle-checkable:
#
# - shingles: packed char 3-grams (ascii(substr)·2²⁰+·2¹⁰+· — integer
#   arithmetic on both sides, ops/dedup.packed_char_gram_arrays);
# - 6 fixed permutations (a·h + b) mod (2⁶¹−1), a < 2⁴⁰ so a·h + b < 2⁶²
#   fits uint64 and ONE Mersenne fold ((x>>61)+(x&p), subtract p once)
#   is exact — SQL does the same mod in HUGEINT;
# - 1 row per band ⇒ band key IS the signature value (no FNV fold);
# - verify: exact packed-gram Jaccard as an unrounded int/int division
#   (bitwise-identical IEEE op on both sides), threshold 0.8.
#
# The production q_near_dup_pairs_minhash (64 crc32 perms) stays
# rows-only — replicating crc32 in SQL would test DuckDB's bit ops, not
# the operator — but every stage of it is now twinned green here.

_SEEDED_A = [596782941878, 278161508709, 308887987896,
             302367928617, 883394497736, 944939348523]
_SEEDED_B = [2305590535221616811, 1743718458342750304, 207987054516262610,
             309515851923806327, 1869647536228542142, 1385056066212948526]
_P61 = (1 << 61) - 1


def q_near_dup_pairs_minhash_seeded(sf_dir: str) -> Dataset:
    from ..ops.dedup import (PairShingleJaccard, _lsh_bucket_pairs,
                             attach_pair_texts, packed_char_gram_arrays)
    from ..stages.salted import partial_count

    docs = _augmented_docs(sf_dir)
    a_vec = np.array(_SEEDED_A, dtype=np.uint64)
    b_vec = np.array(_SEEDED_B, dtype=np.uint64)
    p61 = np.uint64(_P61)

    def sigs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        glist = packed_char_gram_arrays(t.column("text"))
        counts = np.fromiter((len(g) for g in glist), dtype=np.int64,
                             count=len(glist))
        keep = np.flatnonzero(counts > 0)  # gramless docs emit no sigs
        if len(keep) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "band_id": pa.array([], type=pa.int32()),
                 "band_hash": pa.array([], type=pa.uint64())}
            )
        allg = np.concatenate([glist[i] for i in keep])
        offs = np.concatenate(([0], np.cumsum(counts[keep])[:-1]))
        with np.errstate(over="ignore"):
            x = allg[:, None] * a_vec[None, :] + b_vec[None, :]  # < 2^62
            r = (x >> np.uint64(61)) + (x & p61)  # one Mersenne fold
            r = np.where(r >= p61, r - p61, r)
        sig = np.minimum.reduceat(r, offs, axis=0)  # (docs, 6)
        nb = len(a_vec)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids[keep], nb)),
                "band_id": pa.array(
                    np.tile(np.arange(nb, dtype=np.int32), len(keep))
                ),
                "band_hash": pa.array(sig.ravel()),
            }
        )

    sig_rows = docs.map_batches(sigs, batch_format="pyarrow")
    # no bucket cap: the SQL twin enumerates every bucket pair, so the Ray
    # side must too (fixture buckets are tiny; the capped production path
    # is q_near_dup_pairs_minhash)
    pairs = _lsh_bucket_pairs(sig_rows, max_bucket_size=1 << 30)
    cands = partial_count(pairs, ["doc_a", "doc_b"], out="_n").select_columns(
        ["doc_a", "doc_b"]
    )
    with_texts = attach_pair_texts(cands, docs)
    verified = with_texts.map_batches(
        lambda t: PairShingleJaccard(gram_fn=packed_char_gram_arrays)(t),
        batch_format="pyarrow", batch_size=4096,
    )

    def keep_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(0.8)))
        return t.select(["doc_a", "doc_b", "jaccard"])

    return verified.map_batches(keep_pairs, batch_format="pyarrow")


def _sql_minhash_seeded() -> str:
    from .corpusops import ORACLE_CHARS_CAP

    perms = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(zip(_SEEDED_A, _SEEDED_B))
    )
    return f"""
WITH {SQL_DOCS2_CTE},
grams AS (
  SELECT DISTINCT doc_id,
         ascii(substr(text, CAST(i.i AS INT), 1)) * 1048576
       + ascii(substr(text, CAST(i.i AS INT) + 1, 1)) * 1024
       + ascii(substr(text, CAST(i.i AS INT) + 2, 1)) AS h
  FROM docs2, range(1, {ORACLE_CHARS_CAP + 1}) i(i)
  WHERE i.i <= length(text) - 2
),
perms(j, a, b) AS (VALUES {perms}),
sigs AS (
  SELECT doc_id, j,
         CAST(MIN((CAST(a AS HUGEINT) * h + b) % {_P61}) AS BIGINT) AS sig
  FROM grams, perms GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT sa.doc_id AS doc_a, sb.doc_id AS doc_b
  FROM sigs sa JOIN sigs sb
    ON sa.j = sb.j AND sa.sig = sb.sig AND sa.doc_id < sb.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.h = ga.h
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       COALESCE(i.ni, 0) * 1.0
         / (sa.ng + sb.ng - COALESCE(i.ni, 0)) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE COALESCE(i.ni, 0) * 1.0
        / (sa.ng + sb.ng - COALESCE(i.ni, 0)) >= 0.8
"""


# ---------------------------------------------------------------------------
# Q: simhash_fingerprints / langid (rows-only; determinism in pytest)


def q_simhash_fingerprints(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))


# Seeded langid twin (round-5 verdict #1 — the last rows-only machinery
# gets a fully-oracled sibling, mirroring near_dup_pairs_minhash_seeded):
# a PINNED {lang: {3-char gram: int weight}} profile table scores every
# doc with the same normalization/packing/searchsorted machinery LangId
# uses, but with order-free integer sums and a lexicographic argmax that
# DuckDB replicates exactly (VALUES list + SUM + ROW_NUMBER). The grams
# are drawn from the fixture vocabulary so every profile gets real hits;
# weights are arbitrary pinned ints (accuracy is not the point — the
# fixture's lang label is independent of its text; scoring parity is).

_LANGID_SEED_PROFILES: dict[str, dict[str, int]] = {
    "de": {" jo": 7, "joi": 6, "oin": 5, " fi": 4, "fil": 3, "lte": 2,
           " gr": 5, "gro": 4},
    "en": {" ta": 7, "tab": 6, "abl": 5, "ble": 4, " qu": 5, "que": 4,
           "uer": 3, " th": 6},
    "es": {" so": 7, "sor": 6, "ort": 5, " sc": 4, "sca": 3, "can": 2,
           " ha": 5, "has": 4},
    "fr": {" me": 7, "mer": 6, "erg": 5, "rge": 4, " wi": 5, "win": 4,
           "ind": 3, "ndo": 2},
    "zh": {" ba": 7, "bat": 6, "atc": 5, "tch": 4, " st": 5, "str": 4,
           "tre": 3, "eam": 2},
}


def q_langid_scores_seeded(sf_dir: str) -> Dataset:
    from ..ops.textstats import LangIdSeeded

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        LangIdSeeded,
        fn_constructor_args=(_LANGID_SEED_PROFILES,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _sql_langid_seeded() -> str:
    rows = []
    for lang in sorted(_LANGID_SEED_PROFILES):
        for g, w in _LANGID_SEED_PROFILES[lang].items():
            h = ord(g[0]) * 1048576 + ord(g[1]) * 1024 + ord(g[2])
            rows.append(f"('{lang}', {h}, {w})")
    values = ", ".join(rows)
    return f"""
WITH norm AS (
  SELECT doc_id,
         ' ' || regexp_replace(lower(text), '[ \\t\\n\\r\\f\\v]+', ' ', 'g')
             || ' ' AS s
  FROM documents
),
grams AS (
  SELECT doc_id,
         ascii(substr(s, CAST(i.i AS INT), 1)) * 1048576
       + ascii(substr(s, CAST(i.i AS INT) + 1, 1)) * 1024
       + ascii(substr(s, CAST(i.i AS INT) + 2, 1)) AS h
  FROM norm, range(1, {ORACLE_CHARS_CAP + 3}) i(i)
  WHERE i.i <= length(s) - 2
),
prof(lang, h, w) AS (VALUES {values}),
hits AS (
  SELECT g.doc_id, p.lang, SUM(p.w) AS score
  FROM grams g JOIN prof p ON p.h = g.h GROUP BY 1, 2
),
alls AS (
  SELECT n.doc_id, l.lang, COALESCE(h.score, 0) AS score
  FROM norm n
  CROSS JOIN (SELECT DISTINCT lang FROM prof) l
  LEFT JOIN hits h ON h.doc_id = n.doc_id AND h.lang = l.lang
),
ranked AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM alls
)
SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS score
FROM ranked WHERE rn = 1
"""


def q_langid_predictions(sf_dir: str) -> Dataset:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    profiles = fit_langid_profiles(
        t.column("text").to_pylist()[:2000], t.column("lang").to_pylist()[:2000]
    )
    ref = ray.put(profiles)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        LangId, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=(1, 8)
    )


# ---------------------------------------------------------------------------
# Q: ann_topk — brute-force cosine top-k (oracle: list_cosine_similarity)


def q_ann_topk(sf_dir: str) -> Dataset:
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_topk(emb, load_candidates(sf_dir), k=5, variant="brute")


SQL_ANN_TOPK = """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS s,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id
         ) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, ROUND(s, 6) AS sim
FROM scored WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# Q: region_ann_topk — region-conditioned retrieval (similarity search ×
# geo): every embedding's top-5 cosine neighbors among ONLY the vectors
# whose document sits inside a z12 tile window (the Tokyo megacity bbox)
# — "find the most similar pages from THIS region". The query side
# streams through the same broadcast-once BruteCosineTopK actor pool as
# ann_topk; only the CANDIDATE set changes, selected by the closed-form
# geo contract (derive_geo + slippy tiles, identical FLOOR arithmetic in
# the SQL). A region's candidate set is city-bounded BY DEFINITION (the
# broadcast assumption, same as ann_topk's candidate matrix); when a
# "region" is continent-sized the sharded `ann_topk_ivf_partitioned`
# path with a tile pre-filter is the named fallback.

REGION_BBOX = (3630, 3642, 1608, 1620)  # z12 x0, x1, y0, y1 (Tokyo)


def q_region_ann_topk(sf_dir: str) -> Dataset:
    from ..geo.tiles import latlng_to_tile
    from ..ops.ann import _as_matrix
    from ..sources.pages_gen import derive_geo

    x0, x1, y0, y1 = REGION_BBOX
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = t.column("vec_id").to_numpy().astype(np.int64)
    lat, lon, has = derive_geo(vid)
    tx, ty = latlng_to_tile(lat[has], lon[has], 12)
    inb = (tx >= x0) & (tx <= x1) & (ty >= y0) & (ty <= y1)
    sel = np.flatnonzero(has)[inb]
    cand = {
        "vec_id": vid[sel],
        "matrix": _as_matrix(t.column("embedding").take(sel)),
    }
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann_topk(emb, cand, k=5, variant="brute")


SQL_REGION_ANN_TOPK = f"""
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
region AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN geo g ON g.doc_id = e.vec_id
  WHERE CAST(FLOOR((g.lon + 180.0) / 360.0 * 4096) AS INTEGER)
          BETWEEN {REGION_BBOX[0]} AND {REGION_BBOX[1]}
    AND CAST(FLOOR((1.0 - LN(TAN(RADIANS(g.lat)) + 1.0 / COS(RADIANS(g.lat)))
                    / PI()) / 2.0 * 4096) AS INTEGER)
          BETWEEN {REGION_BBOX[2]} AND {REGION_BBOX[3]}
),
scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS s,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id
         ) AS rnk
  FROM embeddings a JOIN region b ON a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, ROUND(s, 6) AS sim
FROM scored WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# Q: ann_topk_ivf_grid — IVF with DETERMINISTIC axis-sign buckets and a
# full SQL oracle. Same inverted-file shape as the k-means variants
# (bucket the vectors, probe a bucket, brute top-k inside it) but the
# partition function is the sign pattern of the first 4 components — a
# closed form DuckDB replicates exactly (the k-means IVF's centroids are
# a fitted model, the genuinely-non-SQL category; this twin turns the
# bucketing/probe/top-k machinery oracle-checkable). nprobe=1 by
# construction (a query's own bucket).


def _bucket_cosine_topk(group: pa.Table) -> pa.Table:
    """In-bucket brute cosine top-5 (shared by the sign-grid and k-means
    IVF twins; the ROUND(sim, 6) output convention the driver compare is
    green on since round 3)."""
    from ..ops.ann import _as_matrix, _normalize

    ids = group["vec_id"].to_numpy(zero_copy_only=False)
    n = len(ids)
    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int32()),
            "sim": pa.array([], type=pa.float64()),
        }
    )
    if n <= 1:
        return empty  # a lone vector has no in-bucket neighbors
    m = _normalize(_as_matrix(group.column("embedding")))
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    k = min(5, n - 1)
    order = np.lexsort((np.broadcast_to(ids, (n, n)), -sims), axis=1)[:, :k]
    rows = np.arange(n)[:, None]
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(ids, k)),
            "neighbor_id": pa.array(ids[order].ravel()),
            "rank": pa.array(
                np.tile(np.arange(1, k + 1, dtype=np.int32), n)
            ),
            "sim": pa.array(np.round(sims[rows, order].ravel(), 6)),
        }
    )


def q_ann_topk_ivf_grid(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column("embedding"))
        b = (
            (m[:, 0] > 0).astype(np.int64) * 8
            + (m[:, 1] > 0).astype(np.int64) * 4
            + (m[:, 2] > 0).astype(np.int64) * 2
            + (m[:, 3] > 0).astype(np.int64)
        )
        return t.append_column("_bucket", pa.array(b))

    # FEW (≤16) LARGE buckets — the regime where map_groups is the right
    # tool (CLAUDE.md tiny-group rule applies to MANY tiny groups)
    return (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_bucket_cosine_topk, batch_format="pyarrow")
    )


SQL_ANN_TOPK_IVF_GRID = """
WITH b AS (
  SELECT vec_id, embedding,
         CAST(embedding[1] > 0 AS INT) * 8
       + CAST(embedding[2] > 0 AS INT) * 4
       + CAST(embedding[3] > 0 AS INT) * 2
       + CAST(embedding[4] > 0 AS INT) AS bucket
  FROM embeddings
),
scored AS (
  SELECT a.vec_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS s,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(c.embedding AS DOUBLE[])) DESC,
                    c.vec_id
         ) AS rnk
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, ROUND(s, 6) AS sim
FROM scored WHERE rnk <= 5
"""


def q_ann_topk_ivf(sf_dir: str) -> Dataset:
    """Approximate IVF variant (rows-only; recall vs brute in pytest)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_topk(emb, load_candidates(sf_dir), k=5, variant="ivf")


def q_ann_topk_ivf_partitioned(sf_dir: str) -> Dataset:
    """Sharded-index IVF (ops/ann.ann_topk_ivf_partitioned — the 100-TB
    path: candidates partitioned by centroid bucket, queries routed via
    an equality shuffle). Rows match q_ann_topk_ivf at this scale (same
    centroids: corpus < fit_sample); equality asserted in pytest."""
    from ..ops.ann import ann_topk_ivf_partitioned

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_topk_ivf_partitioned(emb, emb, k=5)


# ---------------------------------------------------------------------------
# Q: embedding_neardups — cosine ≥ 0.999 pairs over augmented embeddings


def q_embedding_neardups(sf_dir: str) -> Dataset:
    emb = _augmented_embeddings(sf_dir)
    out = embedding_neardup_pairs(emb, _augmented_candidates(sf_dir), threshold=0.999)
    return out.select_columns(["vec_a", "vec_b"])


SQL_EMBEDDING_NEARDUPS = f"""
WITH {SQL_EMB2_CTE}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.999
"""


# ---------------------------------------------------------------------------
# Q: prefix_jaccard_pairs — EXACT set-similarity self-join (word-3-gram
# Jaccard ≥ τ) via prefix filtering (Chaudhuri/Ganti/Kaushik SSJoin,
# Bayardo et al. all-pairs) — the exact complement to the probabilistic
# MinHash-LSH path: no false negatives by construction.

PFX_TAU_NUM, PFX_TAU_DEN = 7, 10  # τ = 0.7
# df vocabulary broadcast gate — the gram vocabulary is NOT small by
# definition (it scales with the corpus); past this limit the df attach
# switches to attach_token_stat's token-keyed hash join (BOTH plans
# implemented; plan-equality pytest forces the join at limit 0)
PFX_VOCAB_BROADCAST_LIMIT = 20_000_000


def _word_gram_pairs(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, gram) word-3-gram rows for a batch — one
    split_pattern + one binary_join_element_wise kernel, no per-row
    Python. Gram strings equal the SQL twin's
    ``toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]`` exactly."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    text = t.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    flat = toks.flatten()
    total = len(flat)
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "gram": pa.array([], type=pa.string()),
        }
    )
    if total < 3:
        return empty
    tri = pc.binary_join_element_wise(
        flat.slice(0, total - 2),
        flat.slice(1, total - 2),
        flat.slice(2, total - 2),
        " ",
    )
    lens = np.diff(offs)
    di = np.repeat(np.arange(len(ids), dtype=np.int64), lens)[: total - 2]
    # gram at flat position j is within-doc iff j+2 < doc end
    valid = (np.arange(total - 2, dtype=np.int64) + 3) <= offs[1:][di]
    if not valid.any():
        return empty
    sel = pa.array(valid)
    g = pa.table(
        {
            "doc_id": pa.array(ids[di][valid], type=pa.int64()),
            "gram": tri.filter(sel),
        }
    ).group_by(["doc_id", "gram"]).aggregate([])
    return g


def q_prefix_jaccard_pairs(
    sf_dir: str, df_broadcast_limit: int | None = None
) -> Dataset:
    """All document pairs with word-3-gram-set Jaccard ≥ 0.7, found
    EXACTLY by prefix filtering: order the gram universe rarest-first
    (global df ascending, gram ascending), keep only each doc's first
    |d| − ⌈τ·|d|⌉ + 1 grams as its prefix, and generate candidates from
    docs sharing a PREFIX gram — the standard SSJoin guarantee: any
    pair at Jaccard ≥ τ must collide on at least one prefix gram, so
    the candidate set is a superset and exact verification closes it.

    Distributed plan (two passes over text, no corpus materialization,
    no driver pull of the vocabulary ANYWHERE):
    1. postings pass: distinct (doc, gram) rows in-batch;
    2. df attach rides the gated ``webtext.attach_token_stat``
       machinery — ≤ {PFX_VOCAB_BROADCAST_LIMIT} grams broadcast an
       Arrow vocab + one ``pc.index_in`` probe per batch; above, a
       token-keyed distributed hash join (both plans IMPLEMENTED;
       plan-equality pytest forces the join path at limit 0);
    3. per-doc prefix selection needs only the per-row df — each doc
       sorts ITS OWN grams by (df, gram) inside one
       ``sorted_group_apply`` on doc_id (no global rank exists, so no
       global rank is ever computed);
    4. prefix postings bucket by a per-batch-dictionary blake2b-64 of
       the gram (round-3 ≥64-bit rule) through the LSH run-pair path
       (`ops/dedup._lsh_bucket_pairs`) — a hash collision only MERGES
       buckets, enlarging the candidate superset, never dropping a
       true pair;
    5. exact verify: texts join in BY PAIR ID (attach_pair_texts —
       corpus never broadcast), intersections via batch-local
       injective word-trigram codes; the τ test is the PURE INTEGER
       comparison inter·10 ≥ 7·union (no float threshold anywhere);
       jac_e10 publishes via the exact floored half-up identity.

    Buckets are NOT capped (the SQL twin enumerates every bucket pair;
    rarest-first prefixes keep real buckets small — the capped
    engineering guard for adversarial hot grams is the documented
    max_bucket_size seam of _lsh_bucket_pairs, as in
    near_dup_pairs_minhash vs its seeded twin)."""
    import hashlib

    from ..ops.dedup import (PairShingleJaccard, _lsh_bucket_pairs,
                             attach_pair_texts)
    from ..ops.runs import sorted_group_apply
    from ..ops.textstats import word_trigram_arrays
    from ..stages.salted import partial_count
    from .webtext import attach_token_stat

    if df_broadcast_limit is None:
        df_broadcast_limit = PFX_VOCAB_BROADCAST_LIMIT

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        g = _word_gram_pairs(t)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "token": pc.cast(g.column("gram"), pa.string()),
            }
        )

    postings_tf = docs.map_batches(
        gram_rows, batch_format="pyarrow"
    ).materialize()
    df_ds = partial_count(postings_tf, ["token"], out="df").materialize()
    with_df = attach_token_stat(
        postings_tf, df_ds, "df", broadcast_limit=df_broadcast_limit
    )

    empty_post = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "band_id": pa.array([], type=pa.int32()),
            "band_hash": pa.array([], type=pa.int64()),
        }
    )

    def prefix_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "token": pa.array([], type=pa.string()),
                }
            )
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        df_v = t.column("df").to_numpy(zero_copy_only=False)
        # block-local order/equality proxy for the gram string (house
        # pc.rank rule) — preserves the global (df, gram) lex order
        tok_r = pc.rank(
            t.column("token"), sort_keys="ascending", tiebreaker="dense",
            null_placement="at_start",
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((tok_r, df_v, d))
        ds_ = d[order]
        new = np.r_[True, ds_[1:] != ds_[:-1]]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(ds_)))
        # prefix length k = s − ⌈τ·s⌉ + 1, integer ceil
        k = sizes - (PFX_TAU_NUM * sizes + PFX_TAU_DEN - 1) // PFX_TAU_DEN + 1
        within = np.arange(len(ds_)) - np.repeat(starts, sizes)
        keep = order[within < np.repeat(k, sizes)]
        return pa.table(
            {
                "doc_id": pa.array(d[keep], type=pa.int64()),
                "token": t.column("token").take(pa.array(keep)),
            }
        )

    prefix = sorted_group_apply(with_df, ["doc_id"], prefix_block)

    def to_band_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_post
        tok = t.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        enc = pc.dictionary_encode(tok)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # hash the DICTIONARY once per batch (round-3 blake2b-64 rule)
        dict_hash = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        s.as_py().encode(), digest_size=8
                    ).digest(), "big",
                ) >> 1  # keep inside int64
                for s in enc.dictionary
            ),
            dtype=np.int64, count=len(enc.dictionary),
        )
        codes = enc.indices.to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "band_id": pa.array(np.zeros(len(t), dtype=np.int32)),
                "band_hash": pa.array(dict_hash[codes], type=pa.int64()),
            }
        )

    post = prefix.map_batches(to_band_rows, batch_format="pyarrow")
    pairs = _lsh_bucket_pairs(post, max_bucket_size=1 << 30)
    cands = partial_count(pairs, ["doc_a", "doc_b"], out="_n").select_columns(
        ["doc_a", "doc_b"]
    )
    with_texts = attach_pair_texts(cands, docs)
    verified = with_texts.map_batches(
        PairShingleJaccard(gram_fn=word_trigram_arrays, emit_counts=True),
        batch_format="pyarrow", batch_size=4096,
    )

    def keep_pairs(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy(zero_copy_only=False)
        union = t.column("union_n").to_numpy(zero_copy_only=False)
        keep = (union > 0) & (inter * PFX_TAU_DEN >= PFX_TAU_NUM * union)
        t = t.filter(pa.array(keep))
        inter = t.column("inter").to_numpy(zero_copy_only=False)
        union = t.column("union_n").to_numpy(zero_copy_only=False)
        jac_e10 = (2 * inter * 10**10 + union) // (2 * union)
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "inter": t.column("inter"),
                "union_n": t.column("union_n"),
                "jac_e10": pa.array(jac_e10, type=pa.int64()),
            }
        )

    return verified.map_batches(keep_pairs, batch_format="pyarrow")


SQL_PREFIX_JACCARD_PAIRS = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         toks[CAST(i.i AS INT)] || ' ' || toks[CAST(i.i AS INT) + 1]
           || ' ' || toks[CAST(i.i AS INT) + 2] AS gram
  FROM t, range(1, {ORACLE_CHARS_CAP + 1}) i(i)
  WHERE i.i <= len(toks) - 2
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.i AS BIGINT) AS union_n,
       CAST((2 * i.i * 10000000000 + (sa.n + sb.n - i.i))
            // (2 * (sa.n + sb.n - i.i)) AS BIGINT) AS jac_e10
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE i.i * {PFX_TAU_DEN} >= {PFX_TAU_NUM} * (sa.n + sb.n - i.i)
"""


# ---------------------------------------------------------------------------
# Q: mutual_knn_pairs — reciprocal nearest neighbors: pairs (a, b)
# where b is a's cosine top-1 AND a is b's (the hubness-robust match
# criterion of RNN clustering and bitext mining).


def q_mutual_knn_pairs(sf_dir: str) -> Dataset:
    """Mutual top-1 pairs from the oracle-green brute-cosine machinery
    (k=1, self excluded; sim ties broken by neighbor id exactly as the
    ann_topk twin). Mutuality needs NO join: each direction emits its
    canonical (lo, hi) key once, ONE grouped merge counts directions
    (min-folds the equal 6-dp sims), and mutual pairs are the n = 2
    rows — the fold-a-subset-into-its-superset idiom (round-4 rule)
    instead of a self-join. Movement: N candidate rows once."""
    from ..stages.salted import merge_group_aggs

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    top1 = ann_topk(emb, load_candidates(sf_dir), k=1, variant="brute")

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("vec_id").to_numpy(zero_copy_only=False)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sim = t.column("sim").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(a, b), type=pa.int64()),
                "hi": pa.array(np.maximum(a, b), type=pa.int64()),
                "n": pa.array(np.ones(len(a), dtype=np.int64)),
                "sim_e6": pa.array(
                    np.round(sim * 1e6).astype(np.int64), type=pa.int64()
                ),
            }
        )

    merged = merge_group_aggs(
        top1.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"],
        [("n", "sum"), ("sim_e6", "min")],
    )

    def keep_mutual(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("n"), pa.scalar(2)))
        return t.select(["lo", "hi", "sim_e6"])

    return merged.map_batches(keep_mutual, batch_format="pyarrow")


SQL_MUTUAL_KNN_PAIRS = """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS s,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id
         ) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
t1 AS (
  SELECT vec_id, neighbor_id, CAST(ROUND(ROUND(s, 6) * 1000000) AS BIGINT)
           AS sim_e6
  FROM scored WHERE rnk = 1
)
SELECT a.vec_id AS lo, a.neighbor_id AS hi,
       CAST(LEAST(a.sim_e6, b.sim_e6) AS BIGINT) AS sim_e6
FROM t1 a JOIN t1 b
  ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
WHERE a.vec_id < a.neighbor_id
"""


# ---------------------------------------------------------------------------
# Q: near_dup_clusters_exact — transitive closure of the EXACT τ=0.7
# set-similarity pairs: the end-to-end "which documents are redundant
# together" surface (dup_clusters' exact-complement twin — that one
# clusters a heuristic adjacent-pair graph; this one clusters the
# provably-complete prefix-filter join).


def q_near_dup_clusters_exact(sf_dir: str) -> Dataset:
    """(doc_id, cluster_id) for every document in ≥1 exact near-dup
    pair; cluster_id = min doc id of the component (hash-to-min +
    pointer jumping, `ops/cc.connected_components` — O(log d) rounds
    of int64-pair shuffles over the PAIR-TOUCHED node set only)."""
    from ..ops.cc import connected_components

    pairs = q_prefix_jaccard_pairs(sf_dir).select_columns(
        ["doc_a", "doc_b"]
    ).materialize()

    def nodes_of(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate([a, b])))}
        )

    from ..stages.salted import partial_count

    nodes = partial_count(
        pairs.map_batches(nodes_of, batch_format="pyarrow"), ["node"],
        out="_n",
    ).select_columns(["node"])
    labels = connected_components(
        nodes, pairs, node_col="node", src_col="doc_a", dst_col="doc_b"
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "cluster_id"])

    return labels.map_batches(rename, batch_format="pyarrow")


def _near_dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs0 AS ({SQL_PREFIX_JACCARD_PAIRS.strip()}),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs0
  UNION ALL
  SELECT doc_b, doc_a FROM pairs0
),
ns AS (SELECT DISTINCT a AS node FROM und),
reach(node, label) AS (
  SELECT node, node FROM ns
  UNION
  SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


SQL_NEAR_DUP_CLUSTERS_EXACT = _near_dup_clusters_sql()


TRAININGDATA_QUERIES = {
    "near_dup_clusters_exact": q_near_dup_clusters_exact,
    "mutual_knn_pairs": q_mutual_knn_pairs,
    "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
    "doc_stats": q_doc_stats,
    "exact_dup_groups": q_exact_dup_groups,
    "exact_dup_pairs_lsh": q_exact_dup_pairs_lsh,
    "near_dup_pairs_minhash": q_near_dup_pairs_minhash,
    "near_dup_pairs_minhash_seeded": q_near_dup_pairs_minhash_seeded,
    "simhash_fingerprints": q_simhash_fingerprints,
    "langid_predictions": q_langid_predictions,
    "langid_scores_seeded": q_langid_scores_seeded,
    "ann_topk": q_ann_topk,
    "region_ann_topk": q_region_ann_topk,
    "ann_topk_ivf_grid": q_ann_topk_ivf_grid,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_ivf_partitioned": q_ann_topk_ivf_partitioned,
    "embedding_neardups": q_embedding_neardups,
}

TRAININGDATA_ORACLES = {
    "near_dup_clusters_exact": SQL_NEAR_DUP_CLUSTERS_EXACT,
    "mutual_knn_pairs": SQL_MUTUAL_KNN_PAIRS,
    "prefix_jaccard_pairs": SQL_PREFIX_JACCARD_PAIRS,
    "doc_stats": SQL_DOC_STATS,
    "exact_dup_groups": SQL_EXACT_DUP_GROUPS,
    "exact_dup_pairs_lsh": SQL_EXACT_DUP_PAIRS,
    "near_dup_pairs_minhash_seeded": _sql_minhash_seeded(),
    "langid_scores_seeded": _sql_langid_seeded(),
    "ann_topk": SQL_ANN_TOPK,
    "region_ann_topk": SQL_REGION_ANN_TOPK,
    "ann_topk_ivf_grid": SQL_ANN_TOPK_IVF_GRID,
    "embedding_neardups": SQL_EMBEDDING_NEARDUPS,
}


def q_ngram_jaccard(sf_dir: str) -> Dataset:
    """Exact raw char-3-gram Jaccard over the deterministic pair set
    (a, a + N//2) — the n-gram-Jaccard dedup primitive, oracle-checked
    (division of int counts → bitwise-equal floats)."""
    from ..ops.dedup import ngram_jaccard_pairs

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def mk_pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ids = ids[ids < n // 2]
        return pa.table(
            {"doc_a": pa.array(ids), "doc_b": pa.array(ids + n // 2)}
        )

    pairs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(mk_pairs, batch_format="pyarrow")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(pairs, docs, n=3)


SQL_NGRAM_JACCARD = f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
grams AS (
  SELECT DISTINCT d.doc_id, substr(d.text, CAST(i.i AS INT), 3) AS g
  FROM documents d, range(1, {ORACLE_CHARS_CAP + 1}) i(i)
  WHERE i.i <= length(d.text) - 2
),
sizes AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY 1),
pairs AS (
  SELECT doc_id AS doc_a, doc_id + (SELECT c // 2 FROM n) AS doc_b
  FROM documents WHERE doc_id < (SELECT c // 2 FROM n)
),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS ni
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.doc_a
  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CASE WHEN sa.ng + sb.ng - COALESCE(i.ni, 0) = 0 THEN 0.0
            ELSE COALESCE(i.ni, 0) * 1.0
                 / (sa.ng + sb.ng - COALESCE(i.ni, 0)) END AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
"""

TRAININGDATA_QUERIES["ngram_jaccard"] = q_ngram_jaccard
TRAININGDATA_ORACLES["ngram_jaccard"] = SQL_NGRAM_JACCARD


def q_hash_sample(sf_dir: str) -> Dataset:
    """Deterministic 10% hash-sample of documents (the reproducible
    sampling primitive a training-data pipeline needs — unlike
    random_sample it is stable across runs/parallelism and
    SQL-replicable): keep rows with doc_id * 2654435761 mod 2^31 mod 10
    == 0 (Knuth multiplicative hash)."""

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = (ids * np.int64(2654435761)) & np.int64((1 << 31) - 1)
        return t.filter(pa.array(h % 10 == 0))

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return docs.map_batches(pick, batch_format="pyarrow")


SQL_HASH_SAMPLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE ((doc_id * 2654435761) & 2147483647) % 10 = 0
"""

TRAININGDATA_QUERIES["hash_sample"] = q_hash_sample
TRAININGDATA_ORACLES["hash_sample"] = SQL_HASH_SAMPLE

# simhash became oracle-checkable once the token hash moved to md5
# (ops/textstats._stable_hash64): DuckDB replicates tokenization, the
# 64-bit hash, per-bit vote sums, and fingerprint reassembly exactly.
SQL_SIMHASH_FINGERPRINTS = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, CAST(('0x' || SUBSTR(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks
),
bits AS (
  SELECT t.doc_id, b.j,
         SUM(CASE WHEN (t.h >> CAST(b.j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th t, range(0, 64) b(j)
  GROUP BY 1, 2
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0
                       THEN CAST(CAST(1 AS UBIGINT) << CAST(j AS INTEGER) AS HUGEINT)
                       ELSE 0 END) AS UBIGINT) AS simhash
  FROM bits GROUP BY 1
)
SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash
FROM documents d LEFT JOIN fp f USING (doc_id)
"""
TRAININGDATA_ORACLES["simhash_fingerprints"] = SQL_SIMHASH_FINGERPRINTS


def q_simhash_near_dups(sf_dir: str) -> Dataset:
    """SimHash near-dup pairs over the dup-augmented corpus: 16-bit
    pigeonhole banding + exact hamming ≤ 3 (ops/dedup.simhash_pairs).
    Fully oracle-checked — the md5-based simhash is SQL-replicable and
    DuckDB verifies the pair set with bit_count(xor(a, b)) over the
    O(n²) self-join (exact at oracle scale; the Ray side never does
    all-pairs)."""
    from ..ops.dedup import simhash_pairs

    return simhash_pairs(_augmented_docs(sf_dir), max_hamming=3)


SQL_SIMHASH_NEAR_DUPS = f"""
WITH {SQL_DOCS2_CTE},
toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM docs2
),
th AS (
  SELECT doc_id, CAST(('0x' || SUBSTR(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM toks
),
bits AS (
  SELECT t.doc_id, b.j,
         SUM(CASE WHEN (t.h >> CAST(b.j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th t, range(0, 64) b(j)
  GROUP BY 1, 2
),
fp0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0
                       THEN CAST(CAST(1 AS UBIGINT) << CAST(j AS INTEGER) AS HUGEINT)
                       ELSE 0 END) AS UBIGINT) AS simhash
  FROM bits GROUP BY 1
),
fp AS (
  SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash
  FROM docs2 d LEFT JOIN fp0 f USING (doc_id)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT doc_a, doc_b, hamming FROM pairs
"""

TRAININGDATA_QUERIES["simhash_near_dups"] = q_simhash_near_dups
TRAININGDATA_ORACLES["simhash_near_dups"] = SQL_SIMHASH_NEAR_DUPS


def q_embedding_neardups_blocked(sf_dir: str) -> Dataset:
    """Exact near-dup pairs via the blocked all-pairs scale path (no
    broadcast candidate matrix; ops/ann.embedding_neardup_pairs_blocked).
    Shares the broadcast variant's oracle — the pair set is exact."""
    from ..ops.ann import embedding_neardup_pairs_blocked

    emb = _augmented_embeddings(sf_dir)
    out = embedding_neardup_pairs_blocked(emb, threshold=0.999)
    return out.select_columns(["vec_a", "vec_b"])


TRAININGDATA_QUERIES["embedding_neardups_blocked"] = q_embedding_neardups_blocked
TRAININGDATA_ORACLES["embedding_neardups_blocked"] = SQL_EMBEDDING_NEARDUPS


# BPE-style pretokenizer count: the GPT-2 pretokenizer shape restricted to
# an RE2-safe ASCII form (no lookahead — RE2 has none, and the SAME pattern
# string must run in pyarrow's count_substring_regex AND DuckDB's
# regexp_extract_all so the count is engine-exact on both sides).
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def q_token_counts_bpe(sf_dir: str) -> Dataset:
    """Token counting with a BPE-ish pretokenizer regex (north-rule text
    analysis suite) — fully vectorized: pyarrow count_substring_regex
    (RE2) per batch, no Python loop."""

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], BPE_TOKEN_PATTERN)
        return pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(fn, batch_format="pyarrow")


SQL_TOKEN_COUNTS_BPE = f"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text,
            '{BPE_TOKEN_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""

TRAININGDATA_QUERIES["token_counts_bpe"] = q_token_counts_bpe
TRAININGDATA_ORACLES["token_counts_bpe"] = SQL_TOKEN_COUNTS_BPE


def q_rolling_fingerprints(sf_dir: str) -> Dataset:
    from ..ops.textstats import RollingFingerprinter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        RollingFingerprinter, batch_format="pyarrow", concurrency=(1, 8)
    )


SQL_ROLLING_FINGERPRINTS = f"""
WITH pows AS (
  SELECT * FROM (VALUES
    (0, CAST(13163680 AS BIGINT)), (1, CAST(805498697 AS BIGINT)),
    (2, CAST(154885210 AS BIGINT)), (3, CAST(362470373 AS BIGINT)),
    (4, CAST(16974593 AS BIGINT)), (5, CAST(66049 AS BIGINT)),
    (6, CAST(257 AS BIGINT)), (7, CAST(1 AS BIGINT))
  ) AS t(k, p)
),
win AS (
  SELECT d.doc_id, i.i,
         SUM(ascii(substr(d.text, CAST(i.i + ks.k AS INT), 1)) * ks.p)
           % 1000000007 AS h
  FROM documents d, range(1, {ORACLE_CHARS_CAP + 1}) i(i), pows ks
  WHERE i.i <= length(d.text) - 7
  GROUP BY 1, 2
),
agg AS (
  -- h is HUGEINT (SUM % p); MIN stays HUGEINT -> Arrow decimal128, which
  -- the driver's value-hash sees as a different physical type than the
  -- Ray side's int64. CAST to BIGINT so both sides agree bitwise.
  SELECT doc_id, COUNT(*) AS n_windows, CAST(MIN(h) AS BIGINT) AS fp_min,
         COUNT(DISTINCT h) AS n_distinct_windows
  FROM win GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_windows, 0) AS n_windows,
       COALESCE(a.fp_min, -1) AS fp_min,
       COALESCE(a.n_distinct_windows, 0) AS n_distinct_windows
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

TRAININGDATA_QUERIES["rolling_fingerprints"] = q_rolling_fingerprints
TRAININGDATA_ORACLES["rolling_fingerprints"] = SQL_ROLLING_FINGERPRINTS


def q_warc_extract_text(sf_dir: str) -> Dataset:
    """pages via the WARC container (Common-Crawl's actual input format,
    sources/warc.py) → HTML extraction; shares extract_text's oracle
    contract — proving the byte-identical invariant holds through the
    WARC round-trip too."""
    from ..sources.warc import ensure_warc_fixture, read_warc
    from ..stages.extract import extract_batch

    warc_dir = ensure_warc_fixture(sf_dir)
    pages = read_warc(f"{warc_dir}/")

    def add_lang(t: pa.Table) -> pa.Table:
        # lang is the subdomain of the fixture url scheme
        host = pc.split_pattern(t["url"], "https://", max_splits=1)
        lang = pc.list_element(
            pc.split_pattern(pc.list_element(host, 1), ".", max_splits=1), 0
        )
        return t.append_column("lang", pc.cast(lang, pa.string()))

    ex = pages.map_batches(add_lang, batch_format="pyarrow").map_batches(
        extract_batch, batch_format="pyarrow"
    )
    return ex.select_columns(["url", "text"])


SQL_WARC_EXTRACT_TEXT = """
SELECT 'https://' || lang || '.example.org/wiki/Doc_' || doc_id AS url,
       text
FROM documents
"""

TRAININGDATA_QUERIES["warc_extract_text"] = q_warc_extract_text
TRAININGDATA_ORACLES["warc_extract_text"] = SQL_WARC_EXTRACT_TEXT


# ---------------------------------------------------------------------------
# Q: pq_codes — product-quantization encoding of the embedding table (the
# memory side of large-scale ANN: 64-dim float32 → M=8 one-byte codes,
# 32× compression; Jégou et al. 2011 "Product quantization for nearest
# neighbor search"). Codebooks here are CLOSED-FORM (deterministic
# formula over (m, k, j), range-matched to the fixture's ±0.5 values) so
# the encode is SQL-replicable end-to-end; a production deployment fits
# them with the per-subspace k-means machinery the IVF path already has
# (ops/ann.py bounded driver-sample fit — named seam, same contract).
# Float policy: each squared-difference TERM is rounded to e10 int64 and
# the 8-term subspace distance summed as integers (order-free; the
# argmin over 16 codes is then exact, ties → lowest code, mirrored by
# ORDER BY d2_e10, k). Plan: stateless vectorized map_batches — ZERO
# shuffle, no state; codes would pack to an M-byte binary column for
# storage via the J17 bytes-move pattern (named).

PQ_M = 8  # subspaces (64-dim → 8 dims each)
PQ_K = 16  # codes per subspace


def _pq_codebooks() -> np.ndarray:
    """(M, K, 8) closed-form centroids in [-0.5, 0.5]; j is 1-based in
    the formula to match the SQL's 1-based list indexing."""
    m = np.arange(PQ_M)[:, None, None]
    k = np.arange(PQ_K)[None, :, None]
    j = np.arange(1, 9)[None, None, :]
    return ((m * 37 + k * 17 + j * 7) % 21 - 10) / 20.0


def q_pq_codes(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix

    cb = _pq_codebooks()  # tiny constant: ships in the task closure

    def encode(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        n = len(t)
        sub = x.reshape(n, PQ_M, 1, 8)
        diff = sub - cb[None]
        terms = np.round(diff * diff * 10000000000.0).astype(np.int64)
        d2 = terms.sum(axis=3)  # (n, M, K) exact int64
        code = d2.argmin(axis=2)  # first min = lowest code id
        d2min = np.take_along_axis(d2, code[:, :, None], axis=2)[:, :, 0]
        vid = t.column("vec_id").to_numpy()
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, PQ_M)),
                "m": pa.array(np.tile(np.arange(PQ_M), n)),
                "code": pa.array(code.reshape(-1)),
                "d2_e10": pa.array(d2min.reshape(-1)),
            }
        )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return emb.map_batches(encode, batch_format="pyarrow")


def _sql_pq_codes() -> str:
    rows = ", ".join(
        f"({m}, {k}, {j}, {((m * 37 + k * 17 + j * 7) % 21 - 10) / 20.0!r})"
        for m in range(PQ_M)
        for k in range(PQ_K)
        for j in range(1, 9)
    )
    return f"""
WITH cent(m, k, j, c) AS (VALUES {rows}),
per_term AS (
  SELECT e.vec_id, cent.m, cent.k,
         CAST(ROUND(
           (CAST(e.embedding[cent.m * 8 + cent.j] AS DOUBLE) - cent.c)
           * (CAST(e.embedding[cent.m * 8 + cent.j] AS DOUBLE) - cent.c)
           * 10000000000.0, 0) AS BIGINT) AS t
  FROM embeddings e CROSS JOIN cent
),
d2 AS (
  SELECT vec_id, m, k, CAST(SUM(t) AS BIGINT) AS d2_e10
  FROM per_term GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id, m ORDER BY d2_e10, k) AS rn
  FROM d2
)
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(k AS BIGINT) AS code, d2_e10
FROM ranked WHERE rn = 1
"""


SQL_PQ_CODES = _sql_pq_codes()

TRAININGDATA_QUERIES["pq_codes"] = q_pq_codes
TRAININGDATA_ORACLES["pq_codes"] = SQL_PQ_CODES


# ---------------------------------------------------------------------------
# Q: pq_adc_topk — the SEARCH half of product quantization: asymmetric
# distance computation (Jégou et al. 2011 §IV). Queries (the house
# vec_id % 50 == 0 modular convention) never touch raw database vectors:
# each query precomputes a (M × K) lookup table of subspace distances to
# every centroid, and a database vector's approximate distance is the
# sum of M table lookups at its PQ codes. LUT terms reuse pq_codes'
# per-term e10 integer rounding, so every ADC distance is an exact
# order-free int64 and the per-query top-k is deterministic (ties →
# lowest vec_id). Plan: the query LUT is a tiny (Q × M × K) int64
# closure constant; ONE stateless map_batches fuses encode + LUT-sum
# (codes never leave the batch, avoiding any row-split hazard), emitting
# (qid, vec_id, adc_e10) score rows — Q rows per vector — into
# ops/topk.grouped_topk's block-pruned sorted-run top-k. At 10⁹ vectors
# the scores stage moves Q×n 24-B rows; the block-local k-prune keeps
# the shuffle at k rows per (query, block).

PQ_QUERY_MOD = 50
PQ_TOPK = 5
PQ_RECALL_K = 20


def q_pq_adc_topk(sf_dir: str, k: int = PQ_TOPK) -> Dataset:
    from ..ops.ann import _as_matrix
    from ..ops.topk import grouped_topk

    cb = _pq_codebooks()

    # bounded query-side pull: Q = n/50 vectors BY CONVENTION (the query
    # set is small by definition; at scale it ships exactly like this —
    # a LUT closure, never the database side)
    qtbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qmask = np.asarray(qtbl["vec_id"].to_numpy()) % PQ_QUERY_MOD == 0
    qids = qtbl["vec_id"].to_numpy()[qmask]
    qx = _as_matrix(qtbl.column("embedding"))[qmask].astype(np.float64)
    # LUT[q, m, k] = Σ_j round((q_sub_j − c_j)² · 1e10)  — same per-term
    # rounding as the encode, so ADC sums are exact ints
    sub = qx.reshape(len(qids), PQ_M, 1, 8)
    diff = sub - cb[None]
    lut = np.round(diff * diff * 10000000000.0).astype(np.int64).sum(axis=3)

    def score(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        n = len(t)
        d = x.reshape(n, PQ_M, 1, 8) - cb[None]
        terms = np.round(d * d * 10000000000.0).astype(np.int64)
        code = terms.sum(axis=3).argmin(axis=2)  # (n, M)
        # adc[i, q] = Σ_m lut[q, m, code[i, m]]
        gathered = lut[:, np.arange(PQ_M)[None, :], code]  # (Q, n, M)
        adc = gathered.sum(axis=2)  # (Q, n)
        vid = t.column("vec_id").to_numpy()
        qrep = np.repeat(qids, n)
        vrep = np.tile(vid, len(qids))
        keep = qrep != vrep  # exclude self-matches
        return pa.table(
            {
                "qid": pa.array(qrep[keep]),
                "vec_id": pa.array(vrep[keep]),
                "adc_e10": pa.array(adc.reshape(-1)[keep]),
            }
        )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    scores = emb.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scores,
        ["qid"],
        [("adc_e10", True), ("vec_id", True)],
        k,
        rank_col="rank",
    )


def _sql_pq_adc_topk(k: int = PQ_TOPK) -> str:
    rows = ", ".join(
        f"({m}, {k}, {j}, {((m * 37 + k * 17 + j * 7) % 21 - 10) / 20.0!r})"
        for m in range(PQ_M)
        for k in range(PQ_K)
        for j in range(1, 9)
    )
    return f"""
WITH cent(m, k, j, c) AS (VALUES {rows}),
per_term AS (
  SELECT e.vec_id, cent.m, cent.k,
         CAST(ROUND(
           (CAST(e.embedding[cent.m * 8 + cent.j] AS DOUBLE) - cent.c)
           * (CAST(e.embedding[cent.m * 8 + cent.j] AS DOUBLE) - cent.c)
           * 10000000000.0, 0) AS BIGINT) AS t
  FROM embeddings e CROSS JOIN cent
),
d2 AS (
  SELECT vec_id, m, k, CAST(SUM(t) AS BIGINT) AS d2_e10
  FROM per_term GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id, m ORDER BY d2_e10, k) AS rn
    FROM d2
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS qid, m, k, d2_e10 AS lut_e10 FROM d2
  WHERE vec_id % {PQ_QUERY_MOD} = 0
),
adc AS (
  SELECT l.qid, c.vec_id, CAST(SUM(l.lut_e10) AS BIGINT) AS adc_e10
  FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.code
  WHERE c.vec_id <> l.qid
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY adc_e10, vec_id) AS rank
  FROM adc
)
SELECT qid, vec_id, adc_e10, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_PQ_ADC_TOPK = _sql_pq_adc_topk()

TRAININGDATA_QUERIES["pq_adc_topk"] = q_pq_adc_topk
TRAININGDATA_ORACLES["pq_adc_topk"] = SQL_PQ_ADC_TOPK


# ---------------------------------------------------------------------------
# Q: mixture_sample — data-mixture reweighting (the "sampling weights per
# source" step of LLM pre-training data assembly: up/down-sample each
# source toward target mixture proportions — the Pile / LLaMA-style
# recipe). Target weights are CLOSED-FORM per source (W_s = suffix%4 + 1)
# so the whole op is SQL-replicable; a production run reads them from a
# config table broadcast the same way. Per-source sampling rates are
# EXACT INTEGER per-mille: pm_s = min(1000, (W_s·N·PM) // (ΣW·c_s)) —
# every quantity an int64, no float rounding anywhere — and row
# selection is the house Knuth multiplicative hash (deterministic,
# parallelism-independent, same stream family as hash_sample at a
# different modulus). Plan: per-source counts are a bounded aggregate
# (sources ≪ corpus BY DEFINITION — the mixture table is human-curated;
# same bounded-pull contract as D10 top_languages); the rate table ships
# as an Arrow value_set + aligned thresholds in the task closure; the
# sample itself is a stateless vectorized filter — zero shuffle.

MIXTURE_PERMILLE = 200  # overall 20% target sample


def q_mixture_sample(sf_dir: str) -> Dataset:
    from ..stages.salted import partial_count

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang"]
    )
    counts_ds = partial_count(
        docs.map_batches(
            lambda t: t.select(["source"]), batch_format="pyarrow"
        ),
        ["source"],
        out="c",
    )
    counts_tbl = pa.concat_tables(
        [ray.get(r).select(["source", "c"]) for r in
         counts_ds.materialize().to_arrow_refs()]
    )
    sources = counts_tbl.column("source").to_pylist()
    cs = counts_tbl.column("c").to_pylist()
    total = sum(cs)
    wts = [int(s[3:]) % 4 + 1 for s in sources]
    sw = sum(wts)
    pms = [
        min(1000, (w * total * MIXTURE_PERMILLE) // (sw * c))
        for w, c in zip(wts, cs)
    ]
    src_arr = pa.array(sources, type=pa.string())
    pm_arr = np.asarray(pms, dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t.column("source"), pa.string()), value_set=src_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        thr = pm_arr[idx]
        ids = t["doc_id"].to_numpy()
        h = (ids * np.int64(2654435761)) & np.int64((1 << 31) - 1)
        return t.filter(pa.array(h % 1000 < thr))

    return docs.map_batches(pick, batch_format="pyarrow")


SQL_MIXTURE_SAMPLE = f"""
WITH w AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUBSTR(source, 4) AS BIGINT) % 4 + 1 AS wt
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(wt) AS BIGINT) AS sw FROM w
),
r AS (
  SELECT source,
         LEAST(1000, (wt * (SELECT n FROM tot) * {MIXTURE_PERMILLE})
                     // ((SELECT sw FROM tot) * c)) AS pm
  FROM w
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id * 2654435761) & 2147483647) % 1000 < r.pm
"""

TRAININGDATA_QUERIES["mixture_sample"] = q_mixture_sample
TRAININGDATA_ORACLES["mixture_sample"] = SQL_MIXTURE_SAMPLE


# ---------------------------------------------------------------------------
# Q: pq_recall_eval — the evaluation half of the ANN stack: recall@k of
# the PQ-ADC search against the EXACT L2 top-k for the same query set
# (the accuracy/compression trade-off number every ANN deployment
# tracks; the IVF path so far had recall bounds only in pytest — this is
# the fully-oracled eval). Determinism: the exact side also ranks by
# per-element e10-rounded integer L2 (Σ_j round((q_j−b_j)²·1e10)) —
# float sqrt/sum-order ranking could flip near-ties between Ray and SQL,
# integer ranking cannot (ties → lowest vec_id on both sides). Plan: the
# exact side is one stateless map against the broadcast query matrix →
# grouped_topk; the hit count is an inner join of two (Q·k)-row tables —
# constant-size movement. Output (qid, n_hits) with recall@k = n_hits/k
# as the consumer epilogue. k = 20 (not the retrieval default 5): with
# UNTRAINED closed-form codebooks the quantization is coarse, and @20
# every fixture query has non-zero hits at both test scales — the eval
# measures exactly that coarseness.


def q_pq_recall_eval(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix
    from ..ops.topk import grouped_topk
    from ..stages.salted import merge_group_sums

    qtbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qmask = np.asarray(qtbl["vec_id"].to_numpy()) % PQ_QUERY_MOD == 0
    qids = qtbl["vec_id"].to_numpy()[qmask]
    qx = _as_matrix(qtbl.column("embedding"))[qmask].astype(np.float64)

    def exact_scores(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        n = len(t)
        diff = qx[:, None, :] - x[None, :, :]  # (Q, n, 64)
        terms = np.round(diff * diff * 10000000000.0).astype(np.int64)
        d2 = terms.sum(axis=2)  # (Q, n) exact int64
        vid = t.column("vec_id").to_numpy()
        qrep = np.repeat(qids, n)
        vrep = np.tile(vid, len(qids))
        keep = qrep != vrep
        return pa.table(
            {
                "qid": pa.array(qrep[keep]),
                "vec_id": pa.array(vrep[keep]),
                "d2_e10": pa.array(d2.reshape(-1)[keep]),
            }
        )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact_top = grouped_topk(
        emb.map_batches(exact_scores, batch_format="pyarrow"),
        ["qid"],
        [("d2_e10", True), ("vec_id", True)],
        PQ_RECALL_K,
    ).map_batches(
        lambda t: pa.table(
            {"e_qid": t["qid"], "e_vec": pc.cast(t["vec_id"], pa.int64())}
        ),
        batch_format="pyarrow",
    )

    adc_top = q_pq_adc_topk(sf_dir, k=PQ_RECALL_K).map_batches(
        lambda t: pa.table(
            {
                "key": pc.add(
                    pc.multiply(
                        pc.cast(t["qid"], pa.int64()),
                        pa.scalar(1 << 31, type=pa.int64()),
                    ),
                    pc.cast(t["vec_id"], pa.int64()),
                )
            }
        ),
        batch_format="pyarrow",
    )
    ekeys = exact_top.map_batches(
        lambda t: pa.table(
            {
                "ekey": pc.add(
                    pc.multiply(
                        pc.cast(t["e_qid"], pa.int64()),
                        pa.scalar(1 << 31, type=pa.int64()),
                    ),
                    t["e_vec"],
                )
            }
        ),
        batch_format="pyarrow",
    )
    hits = adc_top.join(ekeys, "inner", num_partitions=2,
                        on=("key",), right_on=("ekey",))

    def count_hits(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        p = pa.table(
            {
                "qid": pa.array(key >> 31),
                "n_hits": pa.array(np.ones(len(key), dtype=np.int64)),
            }
        )
        g = p.group_by(["qid"]).aggregate([("n_hits", "sum")])
        return g.rename_columns(["qid", "n_hits"])

    return merge_group_sums(
        hits.map_batches(count_hits, batch_format="pyarrow"),
        ["qid"],
        ["n_hits"],
    )


def _sql_pq_recall_eval() -> str:
    adc_sql = _sql_pq_adc_topk().strip().removeprefix("WITH")
    dims = ", ".join(f"({j})" for j in range(1, 65))
    return f"""
WITH {adc_sql.split("SELECT qid, vec_id, adc_e10,")[0]},
adc_top AS (
  SELECT qid, vec_id FROM ranked WHERE rank <= {PQ_RECALL_K}
),
dims(j) AS (VALUES {dims}),
eterms AS (
  SELECT q.vec_id AS qid, b.vec_id,
         CAST(ROUND(
           (CAST(q.embedding[dims.j] AS DOUBLE)
            - CAST(b.embedding[dims.j] AS DOUBLE))
           * (CAST(q.embedding[dims.j] AS DOUBLE)
              - CAST(b.embedding[dims.j] AS DOUBLE))
           * 10000000000.0, 0) AS BIGINT) AS t
  FROM embeddings q
  JOIN embeddings b ON b.vec_id <> q.vec_id
  CROSS JOIN dims
  WHERE q.vec_id % {PQ_QUERY_MOD} = 0
),
ed2 AS (
  SELECT qid, vec_id, CAST(SUM(t) AS BIGINT) AS d2 FROM eterms GROUP BY 1, 2
),
exact_top AS (
  SELECT qid, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY d2, vec_id) AS rn
    FROM ed2
  ) WHERE rn <= {PQ_RECALL_K}
)
SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM adc_top a JOIN exact_top e ON e.qid = a.qid AND e.vec_id = a.vec_id
GROUP BY 1
"""


SQL_PQ_RECALL_EVAL = _sql_pq_recall_eval()

TRAININGDATA_QUERIES["pq_recall_eval"] = q_pq_recall_eval
TRAININGDATA_ORACLES["pq_recall_eval"] = SQL_PQ_RECALL_EVAL


# ---------------------------------------------------------------------------
# Q: kmeans_2iter — distributed Lloyd's k-means over the embedding table,
# 2 FIXED iterations in fixed-point arithmetic, fully SQL-oracled (the
# iterative-ML twin the IVF path lacks: ann_topk_ivf's driver-sample fit
# is rows-only BY DESIGN; this is the oracle-green machinery proof for
# the same algorithm class, like langid_scores_seeded was for langid).
# Determinism policy: (a) assignment distances are per-element e10
# integer sums (ties → lowest cluster id) — exact at any parallelism;
# (b) the centroid update quantizes each coordinate to e6 integers
# (round(x·10⁶)) so the per-cluster numerators are EXACT int64 sums and
# the next centroid c = sum_e6 / (n·10⁶) is ONE IEEE division — bitwise
# identical on both sides; empty clusters keep their previous centroid
# (COALESCE rule, both sides). Plan per iteration: ONE stateless
# map_batches assigns AND emits long-format (cluster, dim, sum_e6, n)
# partials (≤ K·d rows per batch) → combiner merge → K·d-row bounded
# driver pull (centroids are the E4 scalar-broadcast family) → next
# closure. Movement per iteration: K·d·blocks partial rows — vectors
# never shuffle, ever.

KM_K = 8
KM_ITERS = 2


def _km_init_centroids() -> np.ndarray:
    """(K, 64) closed-form init in [-0.45, 0.45]."""
    k = np.arange(KM_K)[:, None]
    j = np.arange(64)[None, :]
    return ((k * 29 + j * 13) % 19 - 9) / 20.0


def _km_assign(x: np.ndarray, cents: np.ndarray):
    diff = x[:, None, :] - cents[None]  # (n, K, 64)
    d2 = np.round(diff * diff * 10000000000.0).astype(np.int64).sum(axis=2)
    return d2.argmin(axis=1), d2


def kmeans_fit_centroids(emb) -> np.ndarray:
    """The distributed fixed-point Lloyd fit (see q_kmeans_2iter header):
    KM_ITERS rounds of assign+partial map → combiner merge → K·d-row
    bounded driver pull. Returns the (K, 64) final centroids."""
    import ray

    from ..ops.ann import _as_matrix
    from ..stages.salted import merge_group_sums

    cents = _km_init_centroids()
    for _ in range(KM_ITERS):
        c_now = cents  # bind per-iteration closure value

        def partials(t: pa.Table, _c=c_now) -> pa.Table:
            x = _as_matrix(t.column("embedding")).astype(np.float64)
            lab, _ = _km_assign(x, _c)
            xe6 = np.round(x * 1000000.0).astype(np.int64)  # (n, 64)
            out_k, out_j, out_s, out_n = [], [], [], []
            for k in range(KM_K):
                m = lab == k
                nk = int(m.sum())
                if nk == 0:
                    continue
                s = xe6[m].sum(axis=0)
                out_k.append(np.full(64, k, dtype=np.int64))
                out_j.append(np.arange(64, dtype=np.int64))
                out_s.append(s)
                out_n.append(np.full(64, nk, dtype=np.int64))
            if not out_k:
                return pa.table(
                    {
                        "k": pa.array([], type=pa.int64()),
                        "j": pa.array([], type=pa.int64()),
                        "sum_e6": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "k": pa.array(np.concatenate(out_k)),
                    "j": pa.array(np.concatenate(out_j)),
                    "sum_e6": pa.array(np.concatenate(out_s)),
                    "n": pa.array(np.concatenate(out_n)),
                }
            )

        merged = merge_group_sums(
            emb.map_batches(partials, batch_format="pyarrow"),
            ["k", "j"],
            ["sum_e6", "n"],
        )
        tbl = pa.concat_tables(
            [ray.get(r).select(["k", "j", "sum_e6", "n"])
             for r in merged.materialize().to_arrow_refs()]
        )
        nxt = cents.copy()  # empty cluster → previous centroid
        kk = tbl.column("k").to_numpy()
        jj = tbl.column("j").to_numpy()
        ss = tbl.column("sum_e6").to_numpy()
        nn = tbl.column("n").to_numpy()
        nxt[kk, jj] = ss.astype(np.float64) / (nn.astype(np.float64) * 1000000.0)
        cents = nxt
    return cents


def q_kmeans_2iter(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    def assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
        diff = x[:, None, :] - cents[None]  # (n, K, 64)
        d2 = np.round(diff * diff * 10000000000.0).astype(np.int64).sum(
            axis=2
        )
        return d2.argmin(axis=1), d2

    c_fin = kmeans_fit_centroids(emb)

    def final_assign(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        lab, d2 = assign(x, c_fin)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(lab.astype(np.int64)),
                "d2_e10": pa.array(
                    np.take_along_axis(d2, lab[:, None], axis=1)[:, 0]
                ),
            }
        )

    return emb.map_batches(final_assign, batch_format="pyarrow")


def _sql_kmeans_body() -> str:
    """Shared CTE chain of the fixed-point k-means oracles (init VALUES →
    KM_ITERS assign/update rounds → final per-(vec,k) e10 distance table
    ``tf``). Suffixed by kmeans_2iter (argmin select) and
    kmeans_silhouette (rn1/rn2 pivot)."""
    c0 = _km_init_centroids()
    cent_rows = ", ".join(
        f"({k}, {j}, {c0[k, j]!r})" for k in range(KM_K) for j in range(64)
    )
    sql = f"""
WITH cent0(k, j, c) AS (VALUES {cent_rows}),
x AS (
  SELECT e.vec_id, d.j, CAST(e.embedding[d.j + 1] AS DOUBLE) AS v
  FROM embeddings e CROSS JOIN (SELECT j FROM cent0 WHERE k = 0) d
)"""
    prev = "cent0"
    for it in range(1, KM_ITERS + 1):
        sql += f""",
t{it} AS (
  SELECT x.vec_id, c.k,
         CAST(SUM(CAST(ROUND((x.v - c.c) * (x.v - c.c)
                              * 10000000000.0, 0) AS BIGINT)) AS BIGINT) AS d2
  FROM x JOIN {prev} c USING (j) GROUP BY 1, 2
),
a{it} AS (
  SELECT vec_id, k AS cluster FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d2, k) AS rn FROM t{it}
  ) WHERE rn = 1
),
u{it} AS (
  SELECT a.cluster AS k, x.j,
         CAST(SUM(CAST(ROUND(x.v * 1000000.0, 0) AS BIGINT)) AS BIGINT)
           AS sum_e6,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM x JOIN a{it} a USING (vec_id) GROUP BY 1, 2
),
cent{it} AS (
  SELECT c.k, c.j,
         COALESCE(CAST(u.sum_e6 AS DOUBLE) / (CAST(u.n AS DOUBLE)
                  * 1000000.0), c.c) AS c
  FROM {prev} c LEFT JOIN u{it} u ON u.k = c.k AND u.j = c.j
)"""
        prev = f"cent{it}"
    sql += f""",
tf AS (
  SELECT x.vec_id, c.k,
         CAST(SUM(CAST(ROUND((x.v - c.c) * (x.v - c.c)
                              * 10000000000.0, 0) AS BIGINT)) AS BIGINT) AS d2
  FROM x JOIN {prev} c USING (j) GROUP BY 1, 2
)"""
    return sql


def _sql_kmeans_2iter() -> str:
    return _sql_kmeans_body() + """
SELECT vec_id, CAST(k AS BIGINT) AS cluster, d2 AS d2_e10 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
  FROM tf
) WHERE rn = 1
"""


SQL_KMEANS_2ITER = _sql_kmeans_2iter()

TRAININGDATA_QUERIES["kmeans_2iter"] = q_kmeans_2iter
TRAININGDATA_ORACLES["kmeans_2iter"] = SQL_KMEANS_2ITER


# ---------------------------------------------------------------------------
# Q: ann_topk_ivf_kmeans — the FULLY-ORACLED end-to-end IVF: the
# fixed-point k-means fit (kmeans_fit_centroids — bitwise
# SQL-replicable) buckets the vectors, then the shared in-bucket brute
# cosine top-5 (_bucket_cosine_topk). Together with kmeans_2iter this
# upgrades the IVF family's evidence: ann_topk_ivf / _partitioned stay
# rows-only BY DESIGN (driver-sample fit on random projections), but
# every machinery stage — iterative fit, bucket assignment, probe,
# in-bucket top-k — now has an oracle-green twin. nprobe=1 (own
# cluster), same movement story as ann_topk_ivf_grid: vectors shuffle
# ONCE into ≤K large groups (map_groups' correct regime).


def q_ann_topk_ivf_kmeans(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    cents = kmeans_fit_centroids(emb)

    def bucketize(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        lab, _ = _km_assign(x, cents)
        return t.append_column("_bucket", pa.array(lab.astype(np.int64)))

    return (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(_bucket_cosine_topk, batch_format="pyarrow")
    )


SQL_ANN_TOPK_IVF_KMEANS = f"""
WITH asg AS ({SQL_KMEANS_2ITER}),
b AS (
  SELECT e.vec_id, e.embedding, a.cluster
  FROM embeddings e JOIN asg a USING (vec_id)
),
scored AS (
  SELECT a.vec_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS s,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(c.embedding AS DOUBLE[])) DESC,
                    c.vec_id
         ) AS rnk
  FROM b a JOIN b c ON a.cluster = c.cluster AND a.vec_id <> c.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, ROUND(s, 6) AS sim
FROM scored WHERE rnk <= 5
"""

TRAININGDATA_QUERIES["ann_topk_ivf_kmeans"] = q_ann_topk_ivf_kmeans
TRAININGDATA_ORACLES["ann_topk_ivf_kmeans"] = SQL_ANN_TOPK_IVF_KMEANS


# ---------------------------------------------------------------------------
# Q: weighted_sample — deterministic weighted sampling WITHOUT
# replacement (Efraimidis–Spirakis 2006: draw u ~ U(0,1) per row, keep
# the k LARGEST ln(u)/w keys — ln is monotonic, so this equals keeping
# the k largest u^(1/w); higher weight pulls the negative key toward 0). The "randomness" is the house Knuth hash mapped to
# (0, 1) — reproducible and parallelism-independent like hash_sample —
# and the key rounds to e10 int64 (LN and division are single IEEE ops,
# the established parity family) so the global top-k is exact. Weights =
# n_chars (longer docs proportionally likelier — the length-balanced
# sampling a curation pipeline uses). Plan: stateless key map → ONE
# grouped_topk on a constant key (block-local k-prune; k rows per block
# shuffle). Zero joins.

WSAMPLE_K = 100


def q_weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> Dataset:
    from ..ops.topk import grouped_topk

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def keys(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        w = t["n_chars"].to_numpy().astype(np.float64)
        h = (ids * np.int64(2654435761)) & np.int64((1 << 31) - 1)
        u = (h.astype(np.float64) + 1.0) / 2147483648.0  # (0, 1]
        key = np.round((np.log(u) / w) * 10000000000.0).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(t), dtype=np.int32)),
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "key_e10": pa.array(key),
            }
        )

    top = grouped_topk(
        docs.map_batches(keys, batch_format="pyarrow"),
        ["_g"],
        [("key_e10", False), ("doc_id", True)],
        k,
        rank_col="rank",
    )
    return top.map_batches(
        lambda t: t.drop_columns(["_g"]), batch_format="pyarrow"
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(ROUND(
           (LN((CAST((doc_id * 2654435761) & 2147483647 AS DOUBLE) + 1.0)
               / 2147483648.0)
            / CAST(n_chars AS DOUBLE)) * 10000000000.0, 0) AS BIGINT)
           AS key_e10
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY key_e10 DESC, doc_id) AS rank
  FROM keyed
)
SELECT doc_id, n_chars, key_e10, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {WSAMPLE_K}
"""

TRAININGDATA_QUERIES["weighted_sample"] = q_weighted_sample
TRAININGDATA_ORACLES["weighted_sample"] = SQL_WEIGHTED_SAMPLE


# ---------------------------------------------------------------------------
# Q: knn_label_eval — k-NN classifier evaluation over the embedding
# table (the labels column's first consumer): each vector's label is
# predicted by MAJORITY VOTE of its 5 exact cosine neighbors
# (ann_topk's oracle-green output; ties → smallest label id), and the
# confusion matrix (true_label, pred_label, n) is the published result —
# the standard embedding-quality probe (do nearby vectors share
# labels?). Plan: labels attach from a dense int64 array broadcast
# (vec-id space is dense, doc-count-bounded — the triangle-counts deg
# pattern; node-keyed join named above the limit); votes resolve on
# ops/runs.sorted_group_apply over vec_id (5-row runs = MANY TINY
# groups, exactly the sorted-run idiom's case); confusion partials ride
# one combiner merge. Output is (labels × labels)-bounded.


def q_knn_label_eval(sf_dir: str) -> Dataset:
    import ray

    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_sums

    lab_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    vids = lab_tbl["vec_id"].to_numpy()
    n_vecs = int(vids.max()) + 1
    lab_arr = np.zeros(n_vecs, dtype=np.int64)
    lab_arr[vids] = lab_tbl["label"].to_numpy().astype(np.int64)
    ref = ray.put(lab_arr)

    top = q_ann_topk(sf_dir)

    def vote_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "true_label": pa.array([], type=pa.int64()),
                "pred_label": pa.array([], type=pa.int64()),
                "n_vecs": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        labs = ray.get(ref)
        q = t.column("vec_id").to_numpy(zero_copy_only=False)
        nb = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        order = np.argsort(q, kind="stable")
        q, nb = q[order], nb[order]
        nl = labs[nb]
        starts = run_starts([q])
        offs = np.flatnonzero(starts)
        n_lab = int(labs.max()) + 1
        run_id = np.cumsum(starts) - 1
        # votes[run, label] via bincount on a packed key
        packed = run_id * n_lab + nl
        votes = np.bincount(packed, minlength=len(offs) * n_lab).reshape(
            len(offs), n_lab
        )
        pred = votes.argmax(axis=1)  # first max = smallest label id
        true = labs[q[offs]]
        p = pa.table(
            {
                "true_label": pa.array(true),
                "pred_label": pa.array(pred.astype(np.int64)),
                "n_vecs": pa.array(np.ones(len(offs), dtype=np.int64)),
            }
        )
        g = p.group_by(["true_label", "pred_label"]).aggregate(
            [("n_vecs", "sum")]
        )
        return g.rename_columns(["true_label", "pred_label", "n_vecs"])

    partials = sorted_group_apply(
        top.map_batches(
            lambda t: t.select(["vec_id", "neighbor_id"]),
            batch_format="pyarrow",
        ),
        ["vec_id"],
        vote_block,
    )
    return merge_group_sums(
        partials, ["true_label", "pred_label"], ["n_vecs"]
    )


SQL_KNN_LABEL_EVAL = """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id
         ) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
top5 AS (SELECT vec_id, neighbor_id FROM scored WHERE rnk <= 5),
votes AS (
  SELECT t.vec_id, CAST(l.label AS BIGINT) AS label, COUNT(*) AS c
  FROM top5 t JOIN embeddings l ON l.vec_id = t.neighbor_id
  GROUP BY 1, 2
),
pred AS (
  SELECT vec_id, label FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY c DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT CAST(e.label AS BIGINT) AS true_label, p.label AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM pred p JOIN embeddings e ON e.vec_id = p.vec_id
GROUP BY 1, 2
"""

TRAININGDATA_QUERIES["knn_label_eval"] = q_knn_label_eval
TRAININGDATA_ORACLES["knn_label_eval"] = SQL_KNN_LABEL_EVAL


# ---------------------------------------------------------------------------
# Q: dim_truncation_recall — the Matryoshka / truncated-dimension
# retrieval eval (Kusupati et al. 2022's deployment question: how much
# recall do the first 16 of 64 dims keep?): recall@20 of exact integer-
# L2 top-k computed on the 16-dim PREFIX against the exact 64-dim
# ground truth, per query (vec_id % 50 == 0, the PQ eval's query set).
# Both rankings use the e10 integer policy (per-element rounded terms,
# ties → lowest vec_id) so the whole eval is bitwise SQL-replicable —
# same determinism argument as pq_recall_eval. Plan: TWO stateless
# scoring passes against the broadcast query matrix (each block scores
# its vectors for all queries, (Q·k)-bounded output via grouped_topk's
# block-local prune), then one (Q·k)-row inner join on the packed
# (qid, vec) key counts overlaps. Vectors never shuffle.

TRUNC_DIMS = 16


def q_dim_truncation_recall(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix
    from ..ops.topk import grouped_topk
    from ..stages.salted import merge_group_sums

    qtbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qmask = np.asarray(qtbl["vec_id"].to_numpy()) % PQ_QUERY_MOD == 0
    qids = qtbl["vec_id"].to_numpy()[qmask]
    qx = _as_matrix(qtbl.column("embedding"))[qmask].astype(np.float64)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def topk_pairs(dims: int, tag: str) -> Dataset:
        qsub = qx[:, :dims]

        def scores(t: pa.Table, _q=qsub) -> pa.Table:
            x = _as_matrix(t.column("embedding")).astype(
                np.float64
            )[:, :dims]
            n = len(t)
            diff = _q[:, None, :] - x[None, :, :]
            terms = np.round(diff * diff * 10000000000.0).astype(np.int64)
            d2 = terms.sum(axis=2)
            vid = t.column("vec_id").to_numpy()
            qrep = np.repeat(qids, n)
            vrep = np.tile(vid, len(qids))
            keep = qrep != vrep
            return pa.table(
                {
                    "qid": pa.array(qrep[keep]),
                    "vec_id": pa.array(vrep[keep]),
                    "d2_e10": pa.array(d2.reshape(-1)[keep]),
                }
            )

        top = grouped_topk(
            emb.map_batches(scores, batch_format="pyarrow"),
            ["qid"],
            [("d2_e10", True), ("vec_id", True)],
            PQ_RECALL_K,
        )
        return top.map_batches(
            lambda t, _tag=tag: pa.table(
                {
                    _tag: pc.add(
                        pc.multiply(
                            pc.cast(t["qid"], pa.int64()),
                            pa.scalar(1 << 31, type=pa.int64()),
                        ),
                        pc.cast(t["vec_id"], pa.int64()),
                    )
                }
            ),
            batch_format="pyarrow",
        )

    trunc = topk_pairs(TRUNC_DIMS, "key")
    full = topk_pairs(64, "fkey")
    hits = trunc.join(full, "inner", num_partitions=2,
                      on=("key",), right_on=("fkey",))

    def count_hits(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        p = pa.table(
            {
                "qid": pa.array(key >> 31),
                "n_hits": pa.array(np.ones(len(key), dtype=np.int64)),
            }
        )
        g = p.group_by(["qid"]).aggregate([("n_hits", "sum")])
        return g.rename_columns(["qid", "n_hits"])

    return merge_group_sums(
        hits.map_batches(count_hits, batch_format="pyarrow"),
        ["qid"],
        ["n_hits"],
    )


def _sql_dim_truncation_recall() -> str:
    def top_cte(dims: int, name: str) -> str:
        vals = ", ".join(f"({j})" for j in range(1, dims + 1))
        return f"""
d{name}(j) AS (VALUES {vals}),
t{name} AS (
  SELECT q.vec_id AS qid, b.vec_id,
         CAST(ROUND(
           (CAST(q.embedding[d{name}.j] AS DOUBLE)
            - CAST(b.embedding[d{name}.j] AS DOUBLE))
           * (CAST(q.embedding[d{name}.j] AS DOUBLE)
              - CAST(b.embedding[d{name}.j] AS DOUBLE))
           * 10000000000.0, 0) AS BIGINT) AS t
  FROM embeddings q
  JOIN embeddings b ON b.vec_id <> q.vec_id
  CROSS JOIN d{name}
  WHERE q.vec_id % {PQ_QUERY_MOD} = 0
),
s{name} AS (
  SELECT qid, vec_id, CAST(SUM(t) AS BIGINT) AS d2 FROM t{name} GROUP BY 1, 2
),
top{name} AS (
  SELECT qid, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY d2, vec_id) AS rn
    FROM s{name}
  ) WHERE rn <= {PQ_RECALL_K}
)"""

    return f"""
WITH {top_cte(TRUNC_DIMS, 'tr').lstrip()},{top_cte(64, 'fu')}
SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM toptr a JOIN topfu e ON e.qid = a.qid AND e.vec_id = a.vec_id
GROUP BY 1
"""


SQL_DIM_TRUNCATION_RECALL = _sql_dim_truncation_recall()

TRAININGDATA_QUERIES["dim_truncation_recall"] = q_dim_truncation_recall
TRAININGDATA_ORACLES["dim_truncation_recall"] = SQL_DIM_TRUNCATION_RECALL


# ---------------------------------------------------------------------------
# Q: delta_exact_dups — INCREMENTAL ingest dedup: a new crawl batch
# checked against the existing corpus (the production shape of J1 —
# dedup is rarely one-shot at 100 TB; every nightly batch dedups against
# what's already stored). The delta batch is closed-form on both sides
# (the house augmentation convention): every doc_id % 3 == 0 document
# re-crawled UNCHANGED (must be flagged dup) and every doc_id % 3 == 1
# re-crawled with a ' v2' suffix (changed content — must be kept as
# new), so BOTH branches are exercised. Output per delta doc: the
# matched corpus doc (MIN doc_id per text, the exact-dedup group rule)
# or NULL + an is_dup flag.
# Plan: both sides collapse to (sha256-hex, id) rows at the source
# (text never moves — the J1/J20 shape; hex string key per the join
# dtype house rule); the corpus side pre-collapses to one MIN-id row
# per hash (combiner merge), then ONE left-outer hash join on the
# 64B/row streams. No broadcast: at scale the corpus hash set is
# corpus-sized BY DEFINITION, so the shuffle join IS the default plan
# (unlike attach_df's vocabulary, which is small by Heap's law).

DELTA_SUFFIX = " v2"


def q_delta_exact_dups(sf_dir: str) -> Dataset:
    from ..ops.dedup import sha256_hex_col
    from ..stages.salted import default_partitions, merge_group_aggs

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def corpus_hashes(t: pa.Table) -> pa.Table:
        h = pa.array(sha256_hex_col(t["text"]), type=pa.string())
        g = pa.table(
            {"h": h, "dup_of": t["doc_id"]}
        ).group_by(["h"]).aggregate([("dup_of", "min")])
        return g.rename_columns(["h", "dup_of"])

    corpus = merge_group_aggs(
        docs.map_batches(corpus_hashes, batch_format="pyarrow"),
        ["h"],
        [("dup_of", "min")],
    )

    def delta_hashes(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        unchanged = t.filter(pa.array(ids % 3 == 0))
        changed = t.filter(pa.array(ids % 3 == 1))
        changed = changed.set_column(
            changed.column_names.index("text"), "text",
            pc.binary_join_element_wise(
                changed["text"], pa.scalar(DELTA_SUFFIX), ""
            ),
        )
        both = pa.concat_tables([unchanged, changed])
        return pa.table(
            {
                "delta_id": pc.add(
                    both["doc_id"], pa.scalar(n, type=pa.int64())
                ),
                "dh": pa.array(
                    sha256_hex_col(both["text"]), type=pa.string()
                ),
            }
        )

    # join key dtypes must match EXACTLY (the _cast_str house rule) —
    # the merge path upgrades to large_string
    corpus = corpus.map_batches(
        lambda t: t.set_column(
            t.column_names.index("h"), "h", pc.cast(t["h"], pa.string())
        ),
        batch_format="pyarrow",
    )
    delta = docs.map_batches(delta_hashes, batch_format="pyarrow")
    joined = delta.join(
        corpus,
        "left_outer",
        num_partitions=default_partitions(),
        on=("dh",),
        right_on=("h",),
    )

    def shape(t: pa.Table) -> pa.Table:
        dup_of = t.column("dup_of")
        return pa.table(
            {
                "delta_id": pc.cast(t["delta_id"], pa.int64()),
                "dup_of": pc.cast(dup_of, pa.int64()),
                "is_dup": pc.cast(pc.is_valid(dup_of), pa.int64()),
            }
        )

    return joined.map_batches(shape, batch_format="pyarrow")


SQL_DELTA_EXACT_DUPS = f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
delta AS (
  SELECT doc_id + (SELECT c FROM n) AS delta_id, text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + (SELECT c FROM n), text || '{DELTA_SUFFIX}'
  FROM documents WHERE doc_id % 3 = 1
),
corpus AS (SELECT text, MIN(doc_id) AS dup_of FROM documents GROUP BY 1)
SELECT d.delta_id, c.dup_of,
       CAST(CASE WHEN c.dup_of IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS is_dup
FROM delta d LEFT JOIN corpus c USING (text)
"""

TRAININGDATA_QUERIES["delta_exact_dups"] = q_delta_exact_dups
TRAININGDATA_ORACLES["delta_exact_dups"] = SQL_DELTA_EXACT_DUPS


# ---------------------------------------------------------------------------
# Q: title_typo_pairs — the FUZZY-MATCH join family (entity resolution /
# typo-pair detection): all title pairs at Levenshtein distance EXACTLY
# 1, found without an all-pairs scan via SymSpell-style DELETION-
# NEIGHBORHOOD blocking (Garbe 2012, public algorithm): two strings are
# within distance 1 only if one equals the other or one equals a
# 1-deletion of the other — so every title emits itself + its ≤|t|
# 1-deletion variants (Arrow slice kernels, one vectorized call per
# deletion position), candidate pairs are same-variant-bucket pairs
# (ops/runs.sorted_group_apply — one range sort, lag-k pair expansion
# over runs), and each UNIQUE candidate verifies exactly.
# Verification never touches strings: titles are 'Doc_' || id, so
# lev(title_a, title_b) = lev(dec(a), dec(b)), checked on least-
# significant-digit matrices with sentinel padding — hamming == 1 for
# equal lengths, one vectorized shift-compare for the insert/delete
# case. All integer, bitwise-free, exact.
# Scale: candidates are bucket-bounded (deletion buckets are tiny by
# construction); movement = the variant-row sort + (candidate-pair,
# count) combiner merge. No join carries strings.


def _lev1_verify_ids(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True where lev(dec(a), dec(b)) == 1, fully vectorized."""
    W = 12
    cols = np.arange(W)

    def digits_and_len(x):
        d = (x[:, None] // 10 ** cols[None, :]) % 10
        ln = np.maximum(np.floor(np.log10(np.maximum(x, 1))), 0).astype(
            np.int64
        ) + 1
        d[cols[None, :] >= ln[:, None]] = -1  # sentinel beyond length
        return d, ln

    da, la = digits_and_len(a)
    db, lb = digits_and_len(b)
    # orient so a is the shorter side
    swap = la > lb
    da[swap], db[swap] = db[swap], da[swap].copy()
    la[swap], lb[swap] = lb[swap], la[swap].copy()

    same_len = la == lb
    ham = (da != db).sum(axis=1)
    ok_sub = same_len & (ham == 1)

    indel = lb - la == 1
    mism = da != db
    p = np.where(mism.any(axis=1), mism.argmax(axis=1), la)
    db_shift = np.concatenate(
        [db[:, 1:], np.full((len(b), 1), -1, dtype=db.dtype)], axis=1
    )
    ok_del = indel & (
        ((da == db_shift) | (cols[None, :] < p[:, None])).all(axis=1)
    )
    return ok_sub | ok_del


def q_title_typo_pairs(sf_dir: str) -> Dataset:
    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_sums, partial_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def variants(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        title = pc.binary_join_element_wise(
            pa.scalar("Doc_"), pc.cast(ids, pa.string()), ""
        )
        ln = pc.utf8_length(title).to_numpy(zero_copy_only=False)
        outs = [pa.table({"vkey": title, "doc_id": ids})]
        for d in range(int(ln.max()) if len(ln) else 0):
            m = pa.array(ln > d)
            sub_t = title.filter(m)
            sub_i = ids.filter(m)
            v = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub_t, 0, d),
                pc.utf8_slice_codeunits(sub_t, d + 1, 32),
                "",
            )
            outs.append(pa.table({"vkey": v, "doc_id": sub_i}))
        out = pa.concat_tables(outs)
        return pa.table(
            {
                "vkey": pc.cast(out["vkey"], pa.string()),
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
            }
        )

    empty = pa.table(
        {"pair": pa.array([], type=pa.int64()),
         "n": pa.array([], type=pa.int64())}
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        vk = pc.cast(t["vkey"], pa.string()).combine_chunks()
        enc = pc.dictionary_encode(vk)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        run = enc.indices.to_numpy().astype(np.int64)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((did, run))
        run, did = run[o], did[o]
        sizes = np.diff(
            np.append(np.flatnonzero(run_starts([run])), len(run))
        )
        max_s = int(sizes.max()) if len(sizes) else 0
        pairs = []
        for k in range(1, max_s):
            same = run[k:] == run[:-k]
            a, b = did[:-k][same], did[k:][same]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            pairs.append(lo * (1 << 31) + hi)
        if not pairs:
            return empty
        key = np.unique(np.concatenate(pairs))
        return pa.table(
            {
                "pair": pa.array(key),
                "n": pa.array(np.ones(len(key), dtype=np.int64)),
            }
        )

    cand = sorted_group_apply(
        docs.map_batches(variants, batch_format="pyarrow"),
        ["vkey"],
        bucket_pairs,
    )
    uniq = merge_group_sums(cand, ["pair"], ["n"])

    def verify(t: pa.Table) -> pa.Table:
        key = t.column("pair").to_numpy(zero_copy_only=False)
        a, b = key >> 31, key & ((1 << 31) - 1)
        ok = _lev1_verify_ids(a, b)
        return pa.table(
            {
                "doc_a": pa.array(a[ok].astype(np.int64)),
                "doc_b": pa.array(b[ok].astype(np.int64)),
            }
        )

    return uniq.map_batches(verify, batch_format="pyarrow")


SQL_TITLE_TYPO_PAIRS = """
WITH t AS (
  SELECT doc_id, 'Doc_' || CAST(doc_id AS VARCHAR) AS title FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) = 1
"""

TRAININGDATA_QUERIES["title_typo_pairs"] = q_title_typo_pairs
TRAININGDATA_ORACLES["title_typo_pairs"] = SQL_TITLE_TYPO_PAIRS


# ---------------------------------------------------------------------------
# Q: embedding_dim_stats — per-dimension moment statistics over the
# embedding table (the whitening / normalization fit every embedding
# pipeline runs before indexing): for each of the 64 dims, n, Σx and
# Σx² as exact integers. Scales are chosen for GLOBAL overflow headroom,
# not convenience: sums truncate at e6 (the tile_embedding_centroids
# convention — |Σ| < 1e6·n, safe to ~9×10¹² rows) while squares
# truncate the VALUE at e3 first (x_e3² ≤ 1e6 per row for |x| ≤ 1 →
# Σ safe to ~9×10¹² rows; squaring the e6 int instead would overflow
# int64 at ~10⁷ rows). Plan: one stateless pass emits 64 partial rows
# per batch (long format), one combiner merge — vectors never shuffle.


def q_embedding_dim_stats(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix
    from ..stages.salted import merge_group_sums

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partials(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        e6 = np.trunc(x * 1e6).astype(np.int64)
        e3 = np.trunc(x * 1e3).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(
                    np.arange(1, x.shape[1] + 1, dtype=np.int64)
                ),
                "n": pa.array(
                    np.full(x.shape[1], x.shape[0], dtype=np.int64)
                ),
                "sum_e6": pa.array(e6.sum(axis=0)),
                "sumsq_e6": pa.array((e3 * e3).sum(axis=0)),
            }
        )

    return merge_group_sums(
        emb.map_batches(partials, batch_format="pyarrow"),
        ["dim"],
        ["n", "sum_e6", "sumsq_e6"],
    )


SQL_EMBEDDING_DIM_STATS = """
SELECT CAST(i.i AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                           * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6,
       CAST(SUM(CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                           * 1000.0) AS BIGINT)
                * CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                             * 1000.0) AS BIGINT)) AS BIGINT) AS sumsq_e6
FROM embeddings, range(1, 65) i(i)
WHERE i.i <= len(embedding)
GROUP BY 1
"""

TRAININGDATA_QUERIES["embedding_dim_stats"] = q_embedding_dim_stats
TRAININGDATA_ORACLES["embedding_dim_stats"] = SQL_EMBEDDING_DIM_STATS


# ---------------------------------------------------------------------------
# Q: lang_confusion_matrix — the language-ID EVAL artifact on the
# oracle-green seeded scorer (langid_scores_seeded's consumer): the
# (true_lang, pred_lang, n) confusion matrix — the routing-quality
# readout a multilingual curation pipeline tracks. True labels attach
# from a dense doc-id-indexed array broadcast (doc ids are dense
# 0..N-1; the knn_label_eval pattern, ≤20M docs by the established
# gate, doc-keyed join named above it); (true, pred) count partials
# ride one combiner merge — output is |langs|²-bounded.


def q_lang_confusion_matrix(sf_dir: str) -> Dataset:
    from ..ops.textstats import LangIdSeeded
    from ..stages.salted import merge_group_sums

    lt = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    n = lt.num_rows
    dense = np.empty(n, dtype=object)
    dense[lt.column("doc_id").to_numpy()] = np.asarray(
        lt.column("lang").to_pylist(), dtype=object
    )
    langs_ref = ray.put(pa.array(dense, type=pa.string()))

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    preds = docs.map_batches(
        LangIdSeeded,
        fn_constructor_args=(_LANGID_SEED_PROFILES,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def partials(t: pa.Table) -> pa.Table:
        labels = ray.get(langs_ref)
        true = labels.take(t["doc_id"])
        g = pa.table(
            {
                "true_lang": true,
                "pred_lang": t["pred_lang"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["true_lang", "pred_lang"]).aggregate([("n", "sum")])
        return g.rename_columns(["true_lang", "pred_lang", "n"])

    return merge_group_sums(
        preds.map_batches(partials, batch_format="pyarrow"),
        ["true_lang", "pred_lang"],
        ["n"],
    )


def _sql_lang_confusion_matrix() -> str:
    seeded = _sql_langid_seeded().strip()
    return f"""
WITH pred AS ({seeded})
SELECT d.lang AS true_lang, p.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred p JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


SQL_LANG_CONFUSION_MATRIX = _sql_lang_confusion_matrix()

TRAININGDATA_QUERIES["lang_confusion_matrix"] = q_lang_confusion_matrix
TRAININGDATA_ORACLES["lang_confusion_matrix"] = SQL_LANG_CONFUSION_MATRIX


# ---------------------------------------------------------------------------
# Q: kmeans_silhouette — simplified silhouette score per vector (the
# standard clustering-quality diagnostic, centroid-distance variant:
# s = (b − a) / max(a, b) with a = distance to own centroid, b =
# distance to the second-closest) over the SAME fixed-point k-means fit
# as kmeans_2iter. Exactness: distances enter as the e10-int d2 matrix
# (the round-5 integer-comparison policy — ranking on ints cannot flip),
# the two smallest per row are exact, and a/b/s are then pure
# elementwise IEEE (SQRT / subtract / GREATEST / one division) on
# IDENTICAL integers — bitwise vs the SQL rn1/rn2 pivot. Distribution:
# centroids are a K×64 broadcast (kmeans_fit_centroids' bounded
# driver-side fixed-point fit), each batch resolves independently —
# vector-sized output, zero shuffles beyond the fit's own.


def q_kmeans_silhouette(sf_dir: str) -> Dataset:
    from ..ops.ann import _as_matrix

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    c_fin = kmeans_fit_centroids(emb)

    def silhouette(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column("embedding")).astype(np.float64)
        diff = x[:, None, :] - c_fin[None]
        d2 = np.round(diff * diff * 10000000000.0).astype(np.int64).sum(
            axis=2
        )
        cluster = d2.argmin(axis=1)
        two = np.sort(np.partition(d2, 1, axis=1)[:, :2], axis=1)
        a2, b2 = two[:, 0], two[:, 1]
        a = np.sqrt(a2.astype(np.float64))
        b = np.sqrt(b2.astype(np.float64))
        den = np.maximum(a, b)
        s = np.divide(
            b - a, den, out=np.zeros(len(a), dtype=np.float64),
            where=den != 0.0,
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(cluster.astype(np.int64)),
                "a2_e10": pa.array(a2),
                "b2_e10": pa.array(b2),
                "silhouette": pa.array(s),
            }
        )

    return emb.map_batches(silhouette, batch_format="pyarrow")


def _sql_kmeans_silhouette() -> str:
    return _sql_kmeans_body() + """,
r AS (
  SELECT vec_id, k, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
  FROM tf
)
SELECT a.vec_id, CAST(a.k AS BIGINT) AS cluster,
       a.d2 AS a2_e10, b.d2 AS b2_e10,
       CASE WHEN GREATEST(SQRT(a.d2), SQRT(b.d2)) = 0.0 THEN 0.0
            ELSE (SQRT(b.d2) - SQRT(a.d2))
                 / GREATEST(SQRT(a.d2), SQRT(b.d2)) END AS silhouette
FROM r a JOIN r b ON b.vec_id = a.vec_id AND b.rn = 2
WHERE a.rn = 1
"""


SQL_KMEANS_SILHOUETTE = _sql_kmeans_silhouette()

TRAININGDATA_QUERIES["kmeans_silhouette"] = q_kmeans_silhouette
TRAININGDATA_ORACLES["kmeans_silhouette"] = SQL_KMEANS_SILHOUETTE


# ---------------------------------------------------------------------------
# Q: fid_diag_labels — diagonal Fréchet distance between the label-0
# and label-1 embedding distributions: FID's diagonal-covariance form
# Σ_d (μ₁d−μ₂d)² + (σ₁d−σ₂d)² — the distribution-shift metric between
# two corpus slices (generated-vs-real, old-vs-new snapshot).


def q_fid_diag_labels(sf_dir: str) -> Dataset:
    """One row: group sizes, dims, and the two FID components at e8 —
    each per-dim term rounds to e8 int64 BEFORE summation (order-free)
    and fid_e8 is their integer sum. Moments ingest through the
    embedding_dim_stats quantization contract (means from e6-truncated
    values, second moments from e3 — float32 columns never touch a
    ROUND boundary); the per-dim float chain (two divisions, sqrt,
    squares) is one fixed IEEE sequence mirrored in SQL, with the
    quantization-mismatch variance clamped at 0 on both sides.

    Movement: 2·64 moment rows per block through ONE merge; vectors
    never shuffle."""
    from ..ops.ann import _as_matrix
    from ..stages.salted import merge_group_sums

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partials(t: pa.Table) -> pa.Table:
        lab = pc.cast(t["label"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = lab <= 1
        if not keep.any():
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "sum_e6": pa.array([], type=pa.int64()),
                    "sumsq_e6": pa.array([], type=pa.int64()),
                }
            )
        x = _as_matrix(
            t.filter(pa.array(keep)).column("embedding")
        ).astype(np.float64)
        lab = lab[keep]
        d = x.shape[1]
        outs = {"label": [], "dim": [], "n": [], "sum_e6": [], "sumsq_e6": []}
        for g in (0, 1):
            xg = x[lab == g]
            if len(xg) == 0:
                continue
            e6 = np.trunc(xg * 1e6).astype(np.int64)
            e3 = np.trunc(xg * 1e3).astype(np.int64)
            outs["label"].extend([g] * d)
            outs["dim"].extend(range(1, d + 1))
            outs["n"].extend([len(xg)] * d)
            outs["sum_e6"].extend(e6.sum(axis=0).tolist())
            outs["sumsq_e6"].extend((e3 * e3).sum(axis=0).tolist())
        return pa.table(
            {k: pa.array(v, type=pa.int64()) for k, v in outs.items()}
        )

    from .analytics import _pull_merged

    tbl = _pull_merged(
        merge_group_sums(
            emb.map_batches(partials, batch_format="pyarrow"),
            ["label", "dim"], ["n", "sum_e6", "sumsq_e6"],
        ),
        ["label", "dim", "n", "sum_e6", "sumsq_e6"],
    ).sort_by([("label", "ascending"), ("dim", "ascending")])
    lab = tbl.column("label").to_numpy(zero_copy_only=False)
    n = tbl.column("n").to_numpy(zero_copy_only=False)
    s6 = tbl.column("sum_e6").to_numpy(zero_copy_only=False)
    q6 = tbl.column("sumsq_e6").to_numpy(zero_copy_only=False)
    g0, g1 = lab == 0, lab == 1
    n0, n1 = int(n[g0][0]), int(n[g1][0])
    dims = int(g0.sum())
    mu0 = s6[g0] / (n0 * 1e6)
    mu1 = s6[g1] / (n1 * 1e6)
    m20 = q6[g0] / (n0 * 1e6)
    m21 = q6[g1] / (n1 * 1e6)
    v0 = m20 - mu0 * mu0
    v1 = m21 - mu1 * mu1
    v0 = np.where(v0 < 0, 0.0, v0)
    v1 = np.where(v1 < 0, 0.0, v1)
    s0, s1 = np.sqrt(v0), np.sqrt(v1)
    dm = mu0 - mu1
    ds_ = s0 - s1
    mean_sq_e8 = int(np.round(dm * dm * 1e8).astype(np.int64).sum())
    cov_e8 = int(np.round(ds_ * ds_ * 1e8).astype(np.int64).sum())
    return rd.from_arrow(
        pa.table(
            {
                "n0": pa.array([n0], type=pa.int64()),
                "n1": pa.array([n1], type=pa.int64()),
                "dims": pa.array([dims], type=pa.int64()),
                "mean_sq_e8": pa.array([mean_sq_e8], type=pa.int64()),
                "cov_e8": pa.array([cov_e8], type=pa.int64()),
                "fid_e8": pa.array(
                    [mean_sq_e8 + cov_e8], type=pa.int64()
                ),
            }
        )
    )


SQL_FID_DIAG_LABELS = """
WITH m AS (
  SELECT label, CAST(i.i AS BIGINT) AS dim, COUNT(*) AS n,
         SUM(CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                        * 1000000.0) AS BIGINT)) AS s6,
         SUM(CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                        * 1000.0) AS BIGINT)
             * CAST(TRUNC(CAST(embedding[CAST(i.i AS INT)] AS DOUBLE)
                          * 1000.0) AS BIGINT)) AS q6
  FROM embeddings, range(1, 65) i(i)
  WHERE i.i <= len(embedding) AND label <= 1
  GROUP BY 1, 2
),
s AS (
  SELECT a.dim,
         CAST(a.s6 AS DOUBLE) / (a.n * 1000000.0) AS mu0,
         CAST(b.s6 AS DOUBLE) / (b.n * 1000000.0) AS mu1,
         CAST(a.q6 AS DOUBLE) / (a.n * 1000000.0) AS m20,
         CAST(b.q6 AS DOUBLE) / (b.n * 1000000.0) AS m21,
         a.n AS n0, b.n AS n1
  FROM m a JOIN m b ON b.dim = a.dim AND a.label = 0 AND b.label = 1
),
t AS (
  SELECT dim, n0, n1,
         (mu0 - mu1) * (mu0 - mu1) AS tm,
         (SQRT(CASE WHEN m20 - mu0 * mu0 < 0 THEN 0.0
               ELSE m20 - mu0 * mu0 END)
          - SQRT(CASE WHEN m21 - mu1 * mu1 < 0 THEN 0.0
                 ELSE m21 - mu1 * mu1 END)) AS dsd
  FROM s
)
SELECT CAST(MIN(n0) AS BIGINT) AS n0,
       CAST(MIN(n1) AS BIGINT) AS n1,
       CAST(COUNT(*) AS BIGINT) AS dims,
       CAST(SUM(CAST(ROUND(tm * 1e8) AS BIGINT)) AS BIGINT) AS mean_sq_e8,
       CAST(SUM(CAST(ROUND(dsd * dsd * 1e8) AS BIGINT)) AS BIGINT)
         AS cov_e8,
       CAST(SUM(CAST(ROUND(tm * 1e8) AS BIGINT))
            + SUM(CAST(ROUND(dsd * dsd * 1e8) AS BIGINT)) AS BIGINT)
         AS fid_e8
FROM t
"""


TRAININGDATA_QUERIES["fid_diag_labels"] = q_fid_diag_labels
TRAININGDATA_ORACLES["fid_diag_labels"] = SQL_FID_DIAG_LABELS
