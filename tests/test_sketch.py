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
