"""Mergeable cardinality sketches: HyperLogLog over token streams.

The sketch is the archetypal 100-TB aggregate: per-block partial registers
(4096 int8-sized values) replace the full distinct-value shuffle that an
exact COUNT(DISTINCT) needs, and register max is commutative/associative,
so the whole reduction rides ``stages/salted.merge_group_aggs`` — ONE
range-partitioned shuffle of (group, bucket, rho) rows regardless of
corpus size. Flajolet et al. 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm") for the register/estimator
math.

Determinism/oracle story: the value hash is the first 8 bytes of md5
(``ops/textstats._stable_hash64`` — the same SQL-replicable choice that
made simhash oracle-checkable), and the REGISTERS themselves are the query
output — pure integers, bitwise-reproducible at any parallelism, checked
exactly by a DuckDB replica (``bin()``-length bit arithmetic, no floating
``LOG2`` whose half-ULP rounding misclassifies w = 2^k - 1). The float
estimator is a driver-side helper over ≤ m rows, covered by an accuracy
pytest instead of the SQL gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..stages.salted import merge_group_aggs, merge_group_sums
from .textstats import _stable_hash64

HLL_P = 12  # 4096 registers → ~1.6% standard error
_M = 1 << HLL_P
_W_BITS = 64 - HLL_P  # 52: the w window converts to float64 EXACTLY
_W_MASK = np.uint64((1 << _W_BITS) - 1)


def _rho_of_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per 64-bit hash: bucket = top p bits; rho = leading-
    zero count of the remaining 52-bit window + 1 (= 53 - bit_length(w)).

    bit_length via ``np.frexp`` — w < 2^52 is exact in float64 and frexp
    returns the true binary exponent, so there is no log2 rounding
    hazard."""
    bucket = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & _W_MASK
    _, e = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, _W_BITS + 1, _W_BITS + 1 - e).astype(np.int64)
    return bucket, rho


def _token_hashes(texts, vocab_cache: dict[str, int] | None = None):
    """(parent_doc_index, uint64 hash) for every non-empty lowercase
    [a-z0-9]+ token of an Arrow string column. md5 is Python-level but runs
    once per DICTIONARY entry (Zipfian vocab), optionally memoized across
    batches via ``vocab_cache``."""
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = pc.filter(flat, keep)
    parent = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    if vocab_cache is None:
        dh = np.fromiter(
            (_stable_hash64(t) for t in vocab), dtype=np.uint64, count=len(vocab)
        )
    else:
        dh = np.fromiter(
            (vocab_cache.get(t) or vocab_cache.setdefault(t, _stable_hash64(t))
             for t in vocab),
            dtype=np.uint64,
            count=len(vocab),
        )
    return parent, dh[enc.indices.to_numpy()]


def hll_token_registers(
    ds: Dataset, text_col: str = "text", group_cols: list[str] | None = None
) -> Dataset:
    """→ (group_cols..., bucket, rho): nonzero HLL registers of the
    distinct-token multiset, optionally per group. Registers are EXACTLY
    the state an exact-distinct run would produce — partial max per block,
    merged once — so the result is identical at any partitioning."""
    group_cols = list(group_cols or [])

    def partial(t: pa.Table) -> pa.Table:
        parent, th = _token_hashes(t[text_col])
        bucket, rho = _rho_of_hash(th)
        cols = {g: pc.take(t[g], pa.array(parent, type=pa.int64())) for g in group_cols}
        p = pa.table({**cols, "bucket": pa.array(bucket), "rho": pa.array(rho)})
        g = p.group_by(group_cols + ["bucket"]).aggregate([("rho", "max")])
        return g.rename_columns(group_cols + ["bucket", "rho"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return merge_group_aggs(partials, group_cols + ["bucket"], [("rho", "max")])


def hll_estimate(rhos_by_bucket: np.ndarray, p: int = HLL_P) -> float:
    """Cardinality estimate from a DENSE register array (length 2^p,
    zeros for empty buckets): the standard biased-corrected harmonic mean
    with the small-range linear-counting correction."""
    m = 1 << p
    assert len(rhos_by_bucket) == m
    alpha = 0.7213 / (1 + 1.079 / m)
    z = np.sum(np.power(2.0, -rhos_by_bucket.astype(np.float64)))
    e = alpha * m * m / z
    zeros = int(np.sum(rhos_by_bucket == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def dense_registers(buckets: np.ndarray, rhos: np.ndarray, p: int = HLL_P) -> np.ndarray:
    out = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(out, buckets, rhos)
    return out


# ---------------------------------------------------------------------------
# Two-pass Misra–Gries heavy hitters (exact output, sketch-bounded shuffle)

_MG_TOTAL = "__total__"  # sentinels: '_' is outside the [a-z0-9]+ token
_MG_BOUND = "__bound__"  # alphabet, so they can never collide with a token


def _block_tokens(texts) -> pa.Array:
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    return pc.filter(flat, pc.not_equal(flat, ""))


def heavy_hitter_tokens(
    ds: Dataset,
    text_col: str = "text",
    theta_denom: int = 1000,
    capacity: int = 4096,
) -> Dataset:
    """→ (token, cnt): EXACTLY the tokens with count·theta_denom ≥ N
    (N = total token occurrences), found WITHOUT a full-vocabulary
    shuffle (Misra & Gries 1982; the two-pass exact-recount variant):

    pass 1 — per-block Misra–Gries summary of ``capacity`` counters
      (value_counts, subtract the (capacity+1)-th largest count): at most
      ``capacity`` (token, weight) rows leave each block, plus sentinel
      rows carrying the block's token total and its MG undercount bound.
      Summed via ``merge_group_sums``, the summary undercounts any token
      by at most B = Σ per-block bounds, so every true heavy hitter has
      merged weight ≥ N//theta_denom − B — the candidate filter. This is
      the scale story: the full vocabulary (10⁹+ n-grams at 100 TB) never
      moves, only capacity·n_blocks bounded summaries.
    pass 2 — broadcast the (small, guaranteed-superset) candidate list,
      exact-count ONLY candidates per block, merge, apply the exact
      integer threshold. Output is deterministic and parallelism-
      independent because pass 2 is exact; pass 1 only affects which
      non-hitters get pruned early.

    Degenerate fallback: if B ≥ N//theta_denom the bound is vacuous
    (too many blocks for the capacity) — recount everything exactly
    (correct, just unpruned); callers should raise ``capacity``."""
    import ray
    import ray.data as rd

    def mg_partial(t: pa.Table) -> pa.Table:
        flat = _block_tokens(t[text_col])
        n = len(flat)
        if n == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "w": pa.array([], type=pa.int64())}
            )
        vc = pc.value_counts(flat)
        toks, cnts = vc.field("values"), vc.field("counts").to_numpy().astype(np.int64)
        if len(cnts) > capacity:
            cstar = int(np.partition(cnts, -capacity - 1)[-capacity - 1])
        else:
            cstar = 0
        keep = cnts > cstar
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [toks.filter(pa.array(keep)).cast(pa.string()),
                     pa.array([_MG_TOTAL, _MG_BOUND], type=pa.string())]
                ),
                "w": pa.array(
                    np.concatenate([cnts[keep] - cstar, [n, cstar]]), type=pa.int64()
                ),
            }
        )

    _sent = pa.array([_MG_TOTAL, _MG_BOUND], type=pa.string())
    merged = merge_group_sums(
        ds.map_batches(mg_partial, batch_format="pyarrow"), ["token"], ["w"]
    ).materialize()
    stats = {
        r["token"]: r["w"]
        for r in merged.map_batches(
            lambda t: t.filter(pc.is_in(t["token"], value_set=_sent)),
            batch_format="pyarrow",
        ).take_all()
    }
    n_total = int(stats.get(_MG_TOTAL, 0))
    bound = int(stats.get(_MG_BOUND, 0))
    thresh_est = n_total // theta_denom - bound
    if n_total == 0:
        return rd.from_arrow(
            pa.table({"token": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
        )
    if thresh_est >= 1:
        cand_rows = merged.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["w"], pa.scalar(thresh_est)),
                    pc.invert(pc.is_in(t["token"], value_set=_sent)),
                )
            ),
            batch_format="pyarrow",
        ).take_all()
        cand_ref = ray.put(pa.array(sorted(r["token"] for r in cand_rows),
                                    type=pa.string()))

        def exact_partial(t: pa.Table) -> pa.Table:
            flat = _block_tokens(t[text_col])
            flat = pc.filter(flat, pc.is_in(flat, value_set=ray.get(cand_ref)))
            vc = pc.value_counts(flat)
            return pa.table(
                {"token": vc.field("values").cast(pa.string()),
                 "cnt": pc.cast(vc.field("counts"), pa.int64())}
            )
    else:  # vacuous bound — exact recount of everything (documented fallback)

        def exact_partial(t: pa.Table) -> pa.Table:
            vc = pc.value_counts(_block_tokens(t[text_col]))
            return pa.table(
                {"token": vc.field("values").cast(pa.string()),
                 "cnt": pc.cast(vc.field("counts"), pa.int64())}
            )

    exact = merge_group_sums(
        ds.map_batches(exact_partial, batch_format="pyarrow"), ["token"], ["cnt"]
    )
    return exact.map_batches(  # exact integer threshold
        lambda t: t.filter(
            pc.greater_equal(
                pc.multiply(t["cnt"], pa.scalar(theta_denom, type=pa.int64())),
                pa.scalar(n_total, type=pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
