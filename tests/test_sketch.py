"""HyperLogLog sketch: partition invariance, mergeability, accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from wikipedia_wikidata_ray.ops.sketch import (
    HLL_P,
    dense_registers,
    hll_estimate,
    hll_token_registers,
)


def _corpus(n_docs: int, vocab: int, seed: int = 11) -> pd.DataFrame:
    """Deterministic corpus whose TRUE distinct-token count is exactly
    ``vocab``: token ids are dealt round-robin so every one appears."""
    rng = np.random.RandomState(seed)
    texts = []
    per_doc = max(1, vocab * 3 // n_docs + 1)
    nxt = 0
    for _ in range(n_docs):
        ids = [(nxt + j) % vocab for j in range(per_doc)]
        nxt = (nxt + per_doc) % vocab
        ids += list(rng.randint(0, vocab, 5))  # repeats: multiset ≠ set
        texts.append(" ".join(f"tok{i}" for i in ids))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})


def _registers(df: pd.DataFrame, parts: int) -> pd.DataFrame:
    out = (
        hll_token_registers(rd.from_pandas(df).repartition(parts))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    return out


def test_hll_registers_partition_invariant():
    df = _corpus(200, 5000)
    a = _registers(df, 2)
    b = _registers(df, 13)
    pd.testing.assert_frame_equal(a, b)


def test_hll_registers_mergeable():
    # union corpus registers == elementwise max of the half corpora
    df = _corpus(300, 8000, seed=3)
    left, right = df.iloc[:150], df.iloc[150:]
    u = dense_registers(*_rb(_registers(df, 4)))
    l = dense_registers(*_rb(_registers(left, 4)))
    r = dense_registers(*_rb(_registers(right, 4)))
    assert (u == np.maximum(l, r)).all()


def _rb(reg: pd.DataFrame):
    return reg["bucket"].to_numpy(), reg["rho"].to_numpy()


def test_hll_estimate_accuracy():
    for vocab in (500, 30_000):
        df = _corpus(max(200, vocab // 60), vocab, seed=7)
        reg = _registers(df, 6)
        est = hll_estimate(dense_registers(*_rb(reg)))
        # 4096 registers → ~1.6% std error; 5% is > 3 sigma
        assert abs(est - vocab) / vocab < 0.05, (vocab, est)


def _zipf_corpus(n_docs: int, vocab: int, seed: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    texts = []
    for _ in range(n_docs):
        ids = rng.zipf(1.3, 120) % vocab  # heavy head, long tail
        texts.append(" ".join(f"w{i}" for i in ids))
    return pd.DataFrame({"text": texts})


def _hh_brute(df: pd.DataFrame, theta_denom: int) -> pd.DataFrame:
    import re

    cnt: dict[str, int] = {}
    n = 0
    for t in df["text"]:
        for w in re.findall("[a-z0-9]+", t.lower()):
            cnt[w] = cnt.get(w, 0) + 1
            n += 1
    rows = [(k, v) for k, v in cnt.items() if v * theta_denom >= n]
    return (
        pd.DataFrame(rows, columns=["token", "cnt"])
        .sort_values("token")
        .reset_index(drop=True)
    )


def test_heavy_hitters_exact_vs_brute_pruned_path():
    from wikipedia_wikidata_ray.ops.sketch import heavy_hitter_tokens

    df = _zipf_corpus(400, 5000, seed=9)
    got = (
        heavy_hitter_tokens(
            rd.from_pandas(df).repartition(6), theta_denom=500, capacity=2048
        )
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _hh_brute(df, 500), check_dtype=False)
    assert len(got) > 0


def test_heavy_hitters_vacuous_bound_fallback():
    from wikipedia_wikidata_ray.ops.sketch import heavy_hitter_tokens

    # capacity 4 over many blocks → B >= N//theta: the exact-recount
    # fallback must still produce the exact answer
    df = _zipf_corpus(200, 3000, seed=13)
    got = (
        heavy_hitter_tokens(
            rd.from_pandas(df).repartition(8), theta_denom=200, capacity=4
        )
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _hh_brute(df, 200), check_dtype=False)


def test_heavy_hitters_empty_input():
    from wikipedia_wikidata_ray.ops.sketch import heavy_hitter_tokens

    df = pd.DataFrame({"text": pd.array([], dtype="string")})
    out = heavy_hitter_tokens(rd.from_pandas(df))
    assert out.count() == 0


def test_hll_grouped_matches_per_group_run():
    df = _corpus(120, 3000, seed=5)
    df["lang"] = np.where(df["doc_id"] % 2 == 0, "en", "de")
    grouped = (
        hll_token_registers(rd.from_pandas(df).repartition(5), group_cols=["lang"])
        .to_pandas()
    )
    for lang in ("en", "de"):
        solo = _registers(df[df["lang"] == lang][["doc_id", "text"]], 3)
        got = (
            grouped[grouped["lang"] == lang][["bucket", "rho"]]
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, solo)
