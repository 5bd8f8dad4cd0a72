"""Deduplication operators (north-rule training-data suite):

- ``exact_dedup``: content-hash → hash-partitioned groupby → first-wins
  (min doc_id). The canonical exact-dedup shape for 100 TB: only the
  16-byte hash + id shuffle, never the text.
- ``minhash_lsh_pairs``: shingle → MinHash signature → banded LSH →
  ``groupby(band, band_hash)`` candidate generation → exact Jaccard
  verification. Classic MinHash-LSH (Broder; public algorithm).
- ``simhash_pairs``: 64-bit SimHash → 16-bit band buckets → hamming
  verification.
- ``embedding_neardup_pairs``: cosine near-duplicates over an embedding
  column (ops/ann.py does the top-k search variant).

Hashing is crc32-based (process-independent); Python ``hash`` is salted
per process and MUST NOT be used in any shuffle key.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from .textstats import TOKEN_PATTERN

_MERSENNE = (1 << 61) - 1


def _content_hash_batch(text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = [hashlib.sha256(t.encode("utf-8")).hexdigest()[:32] for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content_hash": pa.array(h, type=pa.string()),
            }
        )

    return fn


def exact_dedup(ds: Dataset, text_col: str = "text") -> Dataset:
    """→ (doc_id=min id per identical text, n_copies).

    sha256 collisions are treated as impossible (documented assumption —
    the reference's exact dedup, SELECT DISTINCT at
    steps/wikidata_process.sh:28, has the same semantics)."""
    hashed = ds.map_batches(_content_hash_batch(text_col), batch_format="pyarrow")
    return (
        hashed.groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .select_columns(["doc_id", "n_copies"])
    )


class MinHasher:
    """Per-batch MinHash signatures over word shingles.

    ``num_perm`` universal-hash permutations ``(a·x + b) mod p`` over
    crc32 shingle hashes; emits one (band_id, band_hash, doc_id) row per
    band for the LSH groupby."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                 text_col: str = "text", seed: int = 7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.text_col = text_col
        self.tok = re.compile(TOKEN_PATTERN)

    def shingles(self, text: str) -> np.ndarray:
        toks = self.tok.findall(text.lower())
        k = self.shingle
        if len(toks) < k:
            items = [" ".join(toks)] if toks else [""]
        else:
            items = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return np.unique(
            np.fromiter(
                (zlib.crc32(s.encode()) for s in items), dtype=np.uint64, count=len(items)
            )
        )

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        # (S, P) universal hashes, min over shingles → (P,) signature
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        n = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        band_hashes = np.empty(n * self.bands, dtype=np.uint64)
        for i, t in enumerate(texts):
            sig = self.signature(t).reshape(self.bands, self.rows_per_band)
            # stable band hash: crc32 over the band's signature bytes
            for bnd in range(self.bands):
                band_hashes[i * self.bands + bnd] = zlib.crc32(sig[bnd].tobytes())
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(band_hashes),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].to_numpy())
    ids = np.unique(ids)
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def minhash_candidates(ds: Dataset, num_perm: int = 64, bands: int = 16,
                       shingle: int = 3, text_col: str = "text") -> Dataset:
    """LSH candidate pairs (doc_a < doc_b), deduplicated across bands."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle=shingle, text_col=text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = sigs.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # a pair can surface in several bands → exact dedup of the pair key
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["doc_a", "doc_b"])
    )


class JaccardVerifier:
    """Exact shingle-Jaccard for candidate pairs.

    Verification needs both texts per pair; the text lookup table is
    broadcast via ray.put (fine while the candidate set's text footprint
    fits a worker — at planet scale verification joins text in by doc_id
    range instead; documented partitioning assumption)."""

    def __init__(self, texts_ref, shingle: int = 3):
        import ray

        self.texts = (
            ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        )
        self.hasher = MinHasher(shingle=shingle)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        jac = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa = set(self.hasher.shingles(self.texts[int(a[i])]).tolist())
            sb = set(self.hasher.shingles(self.texts[int(b[i])]).tolist())
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            jac[i] = inter / union
        return batch.append_column("jaccard", pa.array(jac))


def minhash_lsh_pairs(ds: Dataset, texts: dict[int, str], threshold: float = 0.8,
                      **kw) -> Dataset:
    """Candidates → exact-Jaccard verify → pairs with jaccard ≥ threshold."""
    import ray

    cands = minhash_candidates(ds, **kw)
    ref = ray.put(texts)
    verified = cands.map_batches(
        JaccardVerifier,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    thr = threshold

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(thr)))

    return verified.map_batches(keep, batch_format="pyarrow")


def simhash_pairs(ds: Dataset, max_hamming: int = 3, text_col: str = "text") -> Dataset:
    """SimHash near-dup pairs: band by 4 × 16-bit chunks (any pair within
    hamming ≤ 3 of a 64-bit hash shares ≥1 identical 16-bit chunk —
    pigeonhole), verify hamming distance exactly."""
    from .textstats import SimHasher

    sims = ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow", concurrency=(1, 8),
    ).materialize()

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h = t.column("simhash").to_numpy()
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        chunk = np.empty(4 * n, dtype=np.uint64)
        for bnd in range(4):
            chunk[bnd::4] = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(h, 4)),
                "band_id": pa.array(band),
                "band_hash": pa.array(chunk),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int32)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ia][keep], "doc_b": ids[ib][keep], "hamming": ham[keep]}
        )

    pairs = (
        sims.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


class RawNgramJaccard:
    """Exact RAW character-n-gram Jaccard per candidate pair — unlike
    JaccardVerifier this uses unhashed substrings, making it
    SQL-replicable (DuckDB substr over a positions range). Texts broadcast
    once per worker via ray.put (same assumption as JaccardVerifier)."""

    def __init__(self, texts_ref, n: int = 3):
        import ray

        self.texts = (
            ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        )
        self.n = n
        self._cache: dict[int, set] = {}

    def _grams(self, did: int) -> set:
        s = self._cache.get(did)
        if s is None:
            t = self.texts[did]
            n = self.n
            s = {t[i : i + n] for i in range(len(t) - n + 1)}
            self._cache[did] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        jac = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa, sb = self._grams(int(a[i])), self._grams(int(b[i]))
            union = len(sa | sb)
            jac[i] = (len(sa & sb) / union) if union else 0.0
        return batch.append_column("jaccard", pa.array(jac))


def ngram_jaccard_pairs(pairs: Dataset, texts: dict[int, str], n: int = 3) -> Dataset:
    """(doc_a, doc_b) pairs → + exact raw n-gram jaccard column."""
    import ray

    ref = ray.put(texts)
    return pairs.map_batches(
        RawNgramJaccard,
        fn_constructor_args=(ref, n),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
