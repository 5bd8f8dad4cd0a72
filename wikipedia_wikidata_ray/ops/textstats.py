"""Text analysis operators for a training-data pipeline (north-rule
"beyond the reference" suite): token counting, quality scoring, language
ID, document fingerprinting.

All run as ``map_batches`` stages; ``TextStats`` is a callable class so
compiled regexes + the stopword set live once per actor
(SURVEY.md §2.C actor-pool rule). Tokenization uses the simple pattern
``[a-z0-9]+`` over lowercased text so the DuckDB oracle
(``regexp_extract_all(lower(text), '[a-z0-9]+')`` — both engines are RE2)
counts identically.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = "[a-z0-9]+"


def _batch_token_codes(col) -> tuple[np.ndarray, np.ndarray, pa.Array, int]:
    """Arrow-vectorized tokenization for a whole string column
    (utf8_lower + split on the [a-z0-9]+ complement ≡
    ``re.findall(TOKEN_PATTERN, text.lower())``, empties filtered — the
    proven idiom). Returns (dictionary codes per token occurrence,
    parent doc index per occurrence, unique-token dictionary, n_docs)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                pa.array([], type=pa.string()), 0)
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
    codes = (
        enc.indices.to_numpy().astype(np.int64)
        if len(parent)
        else np.empty(0, np.int64)
    )
    return codes, parent, enc.dictionary, n

# tiny fixed stopword set — mirrored verbatim in the SQL oracle
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "on", "for", "with")


class TextStats:
    """doc table → per-doc statistics.

    Output columns (exact int/int double ratios — bitwise SQL-matchable):
    ``doc_id, n_tokens, n_chars_text, n_stopwords, stop_ratio, uniq_ratio,
    mean_token_len``.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_PATTERN)
        self.stop = frozenset(STOPWORDS)

    def tokens(self, text: str) -> list[str]:
        return self.tok.findall(text.lower())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Fully vectorized (round-3: the per-doc loop built Python sets
        per document in a corpus-side stage): Arrow tokenization +
        dictionary codes; stopword membership tested once per UNIQUE
        token; per-doc distincts via one unique over (doc, code) keys.
        Ratios are the same int64/int64 numpy divisions as before —
        bitwise-equal to the SQL oracle."""
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, parent, vocab, n = _batch_token_codes(col)
        n_chars = (
            pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
            if n
            else np.zeros(0, dtype=np.int64)
        )
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        if len(codes):
            tok_lens = pc.utf8_length(vocab).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)[codes]
            tok_chars = np.bincount(
                parent, weights=tok_lens, minlength=n
            ).astype(np.int64)
            stop_vocab = pc.is_in(
                vocab, value_set=pa.array(STOPWORDS, type=pa.string())
            ).to_numpy(zero_copy_only=False)
            n_stop = np.bincount(
                parent, weights=stop_vocab[codes].astype(np.float64), minlength=n
            ).astype(np.int64)
            key = parent * np.int64(len(vocab)) + codes
            uniq_parents = np.unique(key) // np.int64(len(vocab))
            n_uniq = np.bincount(uniq_parents, minlength=n).astype(np.int64)
        else:
            tok_chars = np.zeros(n, dtype=np.int64)
            n_stop = np.zeros(n, dtype=np.int64)
            n_uniq = np.zeros(n, dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            stop_ratio = np.where(n_tokens > 0, n_stop / n_tokens, 0.0)
            uniq_ratio = np.where(n_tokens > 0, n_uniq / n_tokens, 0.0)
            mean_len = np.where(n_tokens > 0, tok_chars / n_tokens, 0.0)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "n_tokens": pa.array(n_tokens),
                "n_chars_text": pa.array(n_chars),
                "n_stopwords": pa.array(n_stop),
                "stop_ratio": pa.array(stop_ratio),
                "uniq_ratio": pa.array(uniq_ratio),
                "mean_token_len": pa.array(mean_len),
            }
        )


def _stable_hash64(token: str) -> int:
    """Deterministic 64-bit token hash: first 8 bytes of md5, big-endian —
    process-independent (unlike Python ``hash``) AND SQL-replicable
    (DuckDB: ``CAST('0x' || SUBSTR(md5(tok),1,16) AS UBIGINT)``), which is
    what makes the simhash fingerprints oracle-checkable."""
    import hashlib

    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


class SimHasher:
    """64-bit SimHash fingerprints over token hashes.

    Near-identical documents differ in few bits → hamming-ball grouping by
    16-bit bands finds near-dup candidates (ops/dedup.py)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_PATTERN)

    def simhash(self, text: str) -> int:
        toks = self.tok.findall(text.lower())
        if not toks:
            return 0
        hashes = np.fromiter(
            (_stable_hash64(w) for w in toks), dtype=np.uint64, count=len(toks)
        )
        bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return int((weights[acc > 0]).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized across the batch (round-3: the per-doc path hashed
        every token OCCURRENCE in Python): md5 only the token DICTIONARY
        (Zipfian vocab), then one (tokens × 64) bit matrix with per-doc
        ``np.add.reduceat`` sums — bitwise-identical fingerprints to
        ``simhash`` (same md5 token hash, same strict acc > 0 rule; the
        md5 bit-arithmetic SQL oracle stays green)."""
        codes, parent, vocab, n = _batch_token_codes(batch.column(self.text_col))
        sims = np.zeros(n, dtype=np.uint64)
        if len(codes):
            vh = np.fromiter(
                (_stable_hash64(w) for w in vocab.to_pylist()),
                dtype=np.uint64,
                count=len(vocab),
            )
            th = vh[codes]
            counts = np.bincount(parent, minlength=n)
            bits = (
                (th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.int64)
            nz = counts > 0
            offs = np.concatenate(([0], np.cumsum(counts)))
            ones = np.add.reduceat(bits, offs[:-1][nz], axis=0)
            acc = 2 * ones - counts[nz][:, None]
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            sims[nz] = ((acc > 0) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "simhash": pa.array(sims),
            }
        )


def packed_char_gram_arrays(col) -> list:
    """Per-doc packed char-3-gram codes from RAW text:
    ``cp1·2²⁰ + cp2·2¹⁰ + cp3`` — exactly
    ``ascii(substr(text,i,1))*1048576 + ascii(substr(text,i+1,1))*1024 +
    ascii(substr(text,i+2,1))`` in DuckDB, which makes MinHash over these
    grams fully SQL-oracle-able (q_near_dup_pairs_minhash_seeded).
    ASCII-only by contract (bytes == characters == codepoints); raises on
    non-ASCII input rather than silently diverging from substr semantics.
    Docs shorter than 3 chars contribute zero grams (SQL range semantics).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return []
    width = 8 if pa.types.is_large_string(col.type) else 4
    bufs = col.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=np.int64 if width == 8 else np.int32,
        count=n + 1, offset=col.offset * width,
    ).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    span = data[offs[0]:offs[-1]]
    if len(span) and span.max() >= 128:
        raise ValueError(
            "packed_char_gram_arrays requires ASCII text (byte==char "
            "invariant vs the DuckDB substr oracle)"
        )
    lens = np.diff(offs)
    out: list = [np.empty(0, np.uint64)] * n
    big = np.flatnonzero(lens >= 3)
    if len(big):
        n_g = lens[big] - 2
        g_offs = np.concatenate(([0], np.cumsum(n_g)))
        idx = np.arange(g_offs[-1], dtype=np.int64)
        within = idx - np.repeat(g_offs[:-1], n_g)
        s = np.repeat(offs[big], n_g) + within
        d = data.astype(np.uint64)
        v = d[s] * np.uint64(1 << 20) + d[s + 1] * np.uint64(1 << 10) + d[s + 2]
        for pos, i in enumerate(big):
            out[i] = v[g_offs[pos]:g_offs[pos + 1]]
    return out


def word_trigram_arrays(col) -> list:
    """Per-doc word-3-gram codes from single-space-separated text —
    BATCH-LOCAL dictionary codes packed base-V (V = distinct tokens in
    the batch), injective w.r.t. the gram STRINGS
    ``toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]`` of the DuckDB
    twin, so set intersections over these codes equal intersections
    over raw word trigrams exactly (no hashing, no collision caveat).
    Docs with < 3 tokens contribute zero grams (SQL range semantics).
    V is asserted < 2e6 so V³ stays inside uint64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return []
    toks = pc.split_pattern(col, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    flat = toks.flatten()  # sliced-chunk rule: flatten, never .values
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.uint64)
    v_sz = len(enc.dictionary)
    assert v_sz < 2_000_000, "batch token dictionary too large for base-V packing"
    v64 = np.uint64(v_sz)
    lens = np.diff(offs)
    out: list = [np.empty(0, np.uint64)] * n
    if len(codes) >= 3:
        tri = codes[:-2] * v64 * v64 + codes[1:-1] * v64 + codes[2:]
        for i in np.flatnonzero(lens >= 3):
            out[i] = tri[offs[i]:offs[i + 1] - 2]
    return out


def fit_langid_profiles(texts: list[str], langs: list[str], top: int = 300) -> dict[str, dict[str, float]]:
    """Per-language character-trigram frequency profiles (classic n-gram
    langid heuristic — Cavnar & Trenkle style). Driver-side fit over a
    small sample; the result is broadcast to LangId actors."""
    from collections import Counter, defaultdict

    counters: dict[str, Counter] = defaultdict(Counter)
    for t, l in zip(texts, langs):
        s = " " + re.sub(r"\s+", " ", t.lower()) + " "
        counters[l].update(s[i : i + 3] for i in range(len(s) - 2))
    profiles = {}
    for l, c in counters.items():
        total = sum(c.values()) or 1
        profiles[l] = {g: n / total for g, n in c.most_common(top)}
    return profiles


class LangId:
    """Trigram-profile language classifier (actor-pool stage; profiles
    broadcast once via ray.put)."""

    def __init__(self, profiles_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        self.profiles = (
            ray.get(profiles_ref)
            if isinstance(profiles_ref, ray.ObjectRef)
            else profiles_ref
        )
        self.langs = sorted(self.profiles)
        self.text_col = text_col
        self.id_col = id_col
        self.ws = re.compile(r"\s+")
        # vectorized scoring state: per-lang (sorted packed 3-gram codes,
        # aligned weights). Packing requires every profile-gram char to be
        # ASCII (the packed_char_gram_arrays byte==char invariant); a
        # non-ASCII profile disables the fast path entirely.
        self._vec = None
        try:
            per_lang = []
            for l in self.langs:
                items = self.profiles[l]
                grams = pa.array(list(items), type=pa.string())
                codes_list = packed_char_gram_arrays(grams)
                codes = np.array(
                    [c[0] for c in codes_list], dtype=np.uint64
                )
                if any(len(c) != 1 for c in codes_list):
                    raise ValueError("profile gram not exactly 3 chars")
                w = np.fromiter(items.values(), dtype=np.float64, count=len(items))
                o = np.argsort(codes)
                per_lang.append((codes[o], w[o]))
            self._vec = per_lang
        except ValueError:
            self._vec = None  # non-ASCII profiles → per-row path

    def predict(self, text: str) -> str:
        s = " " + self.ws.sub(" ", text.lower()) + " "
        grams = [s[i : i + 3] for i in range(len(s) - 2)]
        best_lang, best_score = self.langs[0], -1.0
        for l in self.langs:
            p = self.profiles[l]
            score = sum(p.get(g, 0.0) for g in grams)
            if score > best_score:
                best_lang, best_score = l, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized scoring (round-3): normalize the whole column with
        Arrow kernels ("[ \\t\\n\\r\\f\\v]+" ≡ Python \\s on ASCII), pack
        3-gram codes once, then one searchsorted + bincount per language
        (L is small). Gram-hit weights sum in a different order than the
        per-row path, so exact float ties at the argmax could in theory
        differ — profiles are distinct enough that this is vacuous, and
        the query is documented rows-only (model scoring). Non-ASCII
        batches (or profiles) fall back to the per-row ``predict``."""
        if self._vec is not None:
            try:
                col = batch.column(self.text_col)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                norm = pc.binary_join_element_wise(
                    " ",
                    pc.replace_substring_regex(
                        pc.utf8_lower(col), "[ \t\n\r\f\v]+", " "
                    ),
                    " ",
                    "",
                )
                glist = packed_char_gram_arrays(norm)
                n = len(glist)
                counts = np.fromiter(
                    (len(g) for g in glist), dtype=np.int64, count=n
                )
                grams = (
                    np.concatenate(glist) if n else np.empty(0, np.uint64)
                )
                parent = np.repeat(np.arange(n, dtype=np.int64), counts)
                scores = np.zeros((n, len(self.langs)), dtype=np.float64)
                for j, (codes, w) in enumerate(self._vec):
                    if len(codes) == 0 or len(grams) == 0:
                        continue
                    pos = np.minimum(
                        np.searchsorted(codes, grams), len(codes) - 1
                    )
                    hit = codes[pos] == grams
                    scores[:, j] = np.bincount(
                        parent[hit], weights=w[pos[hit]], minlength=n
                    )
                best = np.argmax(scores, axis=1)
                preds = np.array(self.langs, dtype=object)[best]
                return pa.table(
                    {
                        "doc_id": batch.column(self.id_col),
                        "pred_lang": pa.array(preds, type=pa.string()),
                    }
                )
            except ValueError:
                pass  # non-ASCII text in this batch → per-row path
        texts = batch.column(self.text_col).to_pylist()
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "pred_lang": pa.array([self.predict(t) for t in texts], type=pa.string()),
            }
        )


class LangIdSeeded:
    """Integer-weight trigram scorer — the fully-SQL-oracled twin of
    ``LangId`` (round-5 verdict #1; same pattern as the seeded-MinHash
    twin in pipelines/trainingdata.py): identical normalization (lower +
    whitespace collapse + space padding, the Arrow kernels LangId's
    vectorized path uses), identical gram packing
    (``packed_char_gram_arrays``), identical searchsorted profile probe —
    but with PINNED integer weights so per-doc scores are order-free
    integer sums DuckDB reproduces exactly, and the argmax (ties → lex
    smallest language, = np.argmax first-max) is a plain ROW_NUMBER.

    ``profiles``: {lang: {3-char ASCII gram: int weight}} — a closed-form
    VALUES list on the SQL side."""

    def __init__(self, profiles: dict[str, dict[str, int]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.langs = sorted(profiles)
        self.text_col = text_col
        self.id_col = id_col
        per_lang = []
        for l in self.langs:
            items = profiles[l]
            codes_list = packed_char_gram_arrays(
                pa.array(list(items), type=pa.string())
            )
            if any(len(c) != 1 for c in codes_list):
                raise ValueError("profile gram must be exactly 3 ASCII chars")
            codes = np.array([c[0] for c in codes_list], dtype=np.uint64)
            w = np.fromiter(items.values(), dtype=np.int64, count=len(items))
            o = np.argsort(codes)
            per_lang.append((codes[o], w[o]))
        self._vec = per_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        norm = pc.binary_join_element_wise(
            " ",
            pc.replace_substring_regex(pc.utf8_lower(col), "[ \t\n\r\f\v]+", " "),
            " ",
            "",
        )
        glist = packed_char_gram_arrays(norm)
        n = len(glist)
        counts = np.fromiter((len(g) for g in glist), dtype=np.int64, count=n)
        grams = np.concatenate(glist) if n else np.empty(0, np.uint64)
        parent = np.repeat(np.arange(n, dtype=np.int64), counts)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, (codes, w) in enumerate(self._vec):
            if len(codes) == 0 or len(grams) == 0:
                continue
            pos = np.minimum(np.searchsorted(codes, grams), len(codes) - 1)
            hit = codes[pos] == grams
            np.add.at(scores[:, j], parent[hit], w[pos[hit]])
        best = np.argmax(scores, axis=1)
        preds = np.array(self.langs, dtype=object)[best]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "pred_lang": pa.array(preds, type=pa.string()),
                "score": pa.array(scores[np.arange(n), best]),
            }
        )


ROLL_BASE = 257
ROLL_MOD = 1_000_000_007
ROLL_WINDOW = 8


class RollingFingerprinter:
    """Rabin-Karp rolling-hash document fingerprints (the classic
    content-fingerprinting primitive; winnowing-style selection reduced to
    the global minimum window hash for a compact per-doc signature).

    h(i) = Σ_{k<W} ord(c[i+k]) · B^(W-1-k) mod M over every W-char window;
    emits per doc: number of windows, MIN window hash, and the count of
    distinct window hashes. Pure integer arithmetic (B=257, M=1e9+7,
    products < 2^63) — bitwise-replicable in SQL."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.pows = np.array(
            [pow(ROLL_BASE, ROLL_WINDOW - 1 - k, ROLL_MOD) for k in range(ROLL_WINDOW)],
            dtype=np.int64,
        )

    def doc_hashes(self, text: str) -> np.ndarray:
        codes = np.fromiter((ord(c) for c in text), dtype=np.int64, count=len(text))
        n = len(codes) - ROLL_WINDOW + 1
        if n <= 0:
            return np.empty(0, dtype=np.int64)
        # windows as a strided view → vectorized mod-sum
        win = np.lib.stride_tricks.sliding_window_view(codes, ROLL_WINDOW)
        return (win * self.pows[None, :]).sum(axis=1) % ROLL_MOD

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized (round-3: the per-doc path ran an ``ord()``
        generator per CHARACTER): window hashes for every doc in one
        global fan-out straight off the Arrow string buffer (ASCII ⇒
        byte == ord == the oracle's ascii(substr)); per-doc min via
        ``np.minimum.reduceat`` and distinct-count via one lexsort —
        identical integer arithmetic to ``doc_hashes``. Non-ASCII batches
        fall back to the per-row path (ord ≠ byte there)."""
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        n_windows = np.zeros(n, dtype=np.int64)
        fp_min = np.full(n, -1, dtype=np.int64)
        n_distinct = np.zeros(n, dtype=np.int64)
        try:
            if n:
                width = 8 if pa.types.is_large_string(col.type) else 4
                bufs = col.buffers()
                offs = np.frombuffer(
                    bufs[1], dtype=np.int64 if width == 8 else np.int32,
                    count=n + 1, offset=col.offset * width,
                ).astype(np.int64)
                data = (
                    np.frombuffer(bufs[2], dtype=np.uint8)
                    if bufs[2] is not None else np.empty(0, np.uint8)
                )
                span = data[offs[0]:offs[-1]]
                if len(span) and span.max() >= 128:
                    raise ValueError("non-ascii")
                lens = np.diff(offs)
                big = np.flatnonzero(lens >= ROLL_WINDOW)
                if len(big):
                    n_w = lens[big] - ROLL_WINDOW + 1
                    w_offs = np.concatenate(([0], np.cumsum(n_w)))
                    idx = np.arange(w_offs[-1], dtype=np.int64)
                    within = idx - np.repeat(w_offs[:-1], n_w)
                    s = np.repeat(offs[big], n_w) + within
                    d = data.astype(np.int64)
                    v = np.zeros(len(idx), dtype=np.int64)
                    for k in range(ROLL_WINDOW):
                        v += d[s + k] * self.pows[k]
                    v %= ROLL_MOD
                    parent = np.repeat(big, n_w)
                    n_windows[big] = n_w
                    fp_min[big] = np.minimum.reduceat(v, w_offs[:-1])
                    order = np.lexsort((v, parent))
                    ps, vs = parent[order], v[order]
                    new = np.ones(len(ps), dtype=bool)
                    new[1:] = (ps[1:] != ps[:-1]) | (vs[1:] != vs[:-1])
                    n_distinct = np.bincount(ps[new], minlength=n).astype(np.int64)
        except ValueError:
            texts = col.to_pylist()
            for i, t in enumerate(texts):
                h = self.doc_hashes(t)
                n_windows[i] = len(h)
                fp_min[i] = h.min() if len(h) else -1
                n_distinct[i] = len(np.unique(h))
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "n_windows": pa.array(n_windows),
                "fp_min": pa.array(fp_min),
                "n_distinct_windows": pa.array(n_distinct),
            }
        )
