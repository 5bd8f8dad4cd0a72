"""Webtext-curation op tests: URL host stats, decontamination, stratified
sampling (pipelines/webtext.py). Driver tables at sf0.001 are the fixture;
the oracle checker covers SQL parity at sf0.01 — these tests pin the
operator-level invariants."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from wikipedia_wikidata_ray.pipelines.webtext import (
    EVAL_MOD,
    GRAM_N,
    _gram_hash_arrays,
    q_decontaminate,
    q_stratified_sample,
    q_url_host_stats,
)

SF = "/root/testdata/sf0.001"


def test_url_host_stats_partitions_pages_exactly():
    out = q_url_host_stats(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # every page lands in exactly one host bucket
    assert out["n_pages"].sum() == n_docs
    assert out["host"].is_unique
    assert (out["tld"] == "org").all()
    assert out["host"].str.endswith(".example.org").all()
    assert (out["total_chars"] > 0).all()


def test_gram_hashes_short_text_and_dedup():
    import numpy as np
    import pyarrow as pa

    # < GRAM_N tokens -> no grams (SQL semantics)
    gh, parent, n = _gram_hash_arrays(pa.array(["a b c"]))
    assert n == 1 and len(gh) == 0
    # repeated gram hashes to ONE distinct value; distinct texts differ
    toks = " ".join(["w"] * (GRAM_N + 3))
    gh, parent, n = _gram_hash_arrays(pa.array([toks, "x " * (GRAM_N + 1)]))
    assert n == 2
    assert len(np.unique(gh[parent == 0])) == 1
    assert set(np.unique(gh[parent == 0])) != set(np.unique(gh[parent == 1]))
    # punctuation/case tokenize like re.findall('[a-z0-9]+', lower())
    a, _, _ = _gram_hash_arrays(pa.array(["One, two THREE four five!"]))
    b, _, _ = _gram_hash_arrays(pa.array(["one two three four five"]))
    assert np.array_equal(np.sort(a), np.sort(b))


def test_decontaminate_eval_docs_fully_flagged():
    out = q_decontaminate(SF).to_pandas().set_index("doc_id").sort_index()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) == n_docs
    ev = out.loc[[i for i in out.index if i % EVAL_MOD == 0]]
    # an eval doc's grams ARE in the eval set: every gram hits
    assert (ev["n_hit_grams"] == ev["n_grams"]).all()
    assert (ev.loc[ev["n_grams"] > 0, "contaminated"]).all()
    # flag is exactly n_hit > 0 everywhere
    assert (out["contaminated"] == (out["n_hit_grams"] > 0)).all()
    assert (out["n_hit_grams"] <= out["n_grams"]).all()


def test_stratified_sample_deterministic_and_stratified():
    a = q_stratified_sample(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = q_stratified_sample(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)  # pure hash arithmetic, no RNG
    full = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    rates = (a["lang"].value_counts() / full["lang"].value_counts()).dropna()
    # en keeps ~1/2, others ~1/4 (loose band: 50-doc strata at sf0.001)
    assert 0.25 <= rates.get("en", 0.5) <= 0.75
    non_en = rates.drop(index="en", errors="ignore")
    assert ((non_en >= 0.05) & (non_en <= 0.55)).all()
    # sampled rows are a subset of the input keyed identically
    assert set(a["doc_id"]) <= set(full["doc_id"])


def test_events_hopping_is_3x_tumbling():
    """Each event lands in exactly HOP_WINDOWS windows, so totals are an
    exact 3× of the tumbling aggregate and every tumbling bucket equals
    the hopping window starting at the same hour minus its two hops."""
    from wikipedia_wikidata_ray.pipelines.relational import (
        HOP_WINDOWS,
        q_events_hopping,
        q_events_hourly,
    )

    hop = q_events_hopping(SF).to_pandas()
    tum = q_events_hourly(SF).to_pandas()
    assert hop["n_events"].sum() == HOP_WINDOWS * tum["n_events"].sum()
    assert abs(hop["sum_value"].sum() - HOP_WINDOWS * tum["sum_value"].sum()) < 1e-6
    # a hopping window (type, w) aggregates tumbling hours w, w+1h, w+2h
    tmap = {
        (r.event_type, r.hour): r.n_events for r in tum.itertuples()
    }
    import pandas as pd

    for r in hop.sample(n=min(50, len(hop)), random_state=7).itertuples():
        expect = sum(
            tmap.get((r.event_type, r.window_start + pd.Timedelta(hours=h)), 0)
            for h in range(HOP_WINDOWS)
        )
        assert r.n_events == expect


def test_pct_from_hist_matches_duckdb_percentile_disc():
    """Pin the ceil(p*n) 1-based rule to DuckDB's PERCENTILE_DISC across
    group sizes and duplicate-heavy histograms (the oracle contract)."""
    import duckdb
    import numpy as np

    from wikipedia_wikidata_ray.pipelines.webtext import PCTS, _pct_from_hist

    con = duckdb.connect()
    rng = np.random.RandomState(11)
    for n in [1, 2, 3, 4, 5, 7, 10, 19, 20, 33, 100, 218]:
        vals_raw = rng.randint(0, max(2, n // 2), size=n)  # heavy duplicates
        uniq, counts = np.unique(vals_raw, return_counts=True)
        lst = ",".join(str(v) for v in vals_raw)
        for p in PCTS:
            want = con.execute(
                f"SELECT PERCENTILE_DISC({p}) WITHIN GROUP (ORDER BY v) "
                f"FROM (SELECT UNNEST([{lst}]) AS v)"
            ).fetchone()[0]
            assert _pct_from_hist(uniq, counts, p) == want, (n, p)


def test_pii_scrub_redacts_all_injected_pii():
    from wikipedia_wikidata_ray.pipelines.webtext import q_pii_scrub

    out = q_pii_scrub(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) == n_docs
    # every doc got exactly the injected email + phone; none survive
    assert (out["n_emails"] == 1).all()
    assert (out["n_phones"] == 1).all()
    assert out["clean_text"].str.contains("<EMAIL>").all()
    assert out["clean_text"].str.contains("<PHONE>").all()
    assert not out["clean_text"].str.contains("@mail.example.com").any()
    assert not out["clean_text"].str.contains(r"555-\d", regex=True).any()


def test_tfidf_top_terms_ranks_and_bounds():
    from wikipedia_wikidata_ray.pipelines.webtext import TFIDF_K, q_tfidf_top_terms

    out = q_tfidf_top_terms(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    per_doc = out.groupby("doc_id")
    assert (per_doc.size() <= TFIDF_K).all()
    # ranks are 1..k and ordered by (tfidf desc, token asc) within a doc
    for _, g in per_doc:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        key = list(zip(-g["tfidf"], g["token"]))
        assert key == sorted(key)
    # df bounds: 1 <= df <= N; a token in every doc scores exactly 0
    assert out["df"].between(1, n_docs).all()
    assert (out.loc[out["df"] == n_docs, "tfidf"] == 0.0).all()
    assert (out["tfidf"] >= 0).all()


def test_textstats_and_simhash_vectorized_match_scalar():
    """The round-3 vectorized TextStats/SimHasher batch paths must equal
    the scalar definitions exactly (incl. unicode, empties, slices)."""
    import re

    import numpy as np
    import pyarrow as pa

    from wikipedia_wikidata_ray.ops.textstats import (
        STOPWORDS, SimHasher, TextStats)

    rng = np.random.default_rng(9)
    vocab = list(STOPWORDS) + ["alpha", "Beta", "GAMMA", "x1", "??", ""]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 50))) for _ in range(40)]
    texts += ["", "   ", "the the the", "é über ñ", "ab,cd!ef"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    got = TextStats()(t)
    tok = re.compile("[a-z0-9]+")
    stop = frozenset(STOPWORDS)
    for i, x in enumerate(texts):
        toks = tok.findall(x.lower())
        assert got["n_tokens"][i].as_py() == len(toks)
        assert got["n_chars_text"][i].as_py() == len(x)
        assert got["n_stopwords"][i].as_py() == sum(1 for w in toks if w in stop)
        assert got["uniq_ratio"][i].as_py() == (
            len(set(toks)) / len(toks) if toks else 0.0
        )
    sh = SimHasher()
    got2 = sh(t)
    for i, x in enumerate(texts):
        assert got2["simhash"][i].as_py() == sh.simhash(x)
    got3 = sh(t.slice(3, 10))
    for j in range(10):
        assert got3["simhash"][j].as_py() == sh.simhash(texts[3 + j])


def test_langid_vectorized_matches_predict():
    """The vectorized LangId batch path must equal per-row predict(),
    including empty/short docs and the non-ASCII fallback."""
    import numpy as np
    import pyarrow as pa

    from wikipedia_wikidata_ray.ops.textstats import LangId, fit_langid_profiles

    rng = np.random.default_rng(1)
    base = {
        "en": "the quick brown fox jumps over the lazy dog and then runs home",
        "de": "der schnelle braune fuchs springt ueber den faulen hund und laeuft",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et court",
    }
    texts, langs = [], []
    for l, s in base.items():
        texts += [s] * 40
        langs += [l] * 40
    li = LangId(fit_langid_profiles(texts, langs))
    assert li._vec is not None
    words = " ".join(texts).split()
    probe = [" ".join(rng.choice(words, rng.integers(0, 30))) for _ in range(80)]
    probe += ["", "a", "  \t ", "the der le"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(probe)), type=pa.int64()),
         "text": pa.array(probe)}
    )
    assert li(t).column("pred_lang").to_pylist() == [li.predict(x) for x in probe]
    t2 = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "text": pa.array(["héllo wörld"])}
    )
    assert li(t2).column("pred_lang").to_pylist() == [li.predict("héllo wörld")]


def test_rolling_fingerprinter_vectorized_matches_scalar():
    import numpy as np
    import pyarrow as pa

    from wikipedia_wikidata_ray.ops.textstats import RollingFingerprinter

    rng = np.random.default_rng(2)
    chars = list("abcdefgh XY.,!01")
    texts = ["".join(rng.choice(chars, rng.integers(0, 120))) for _ in range(60)]
    texts += ["", "short", "a" * 8, "a" * 7, "é" * 20 + "abcdefgh"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    rf = RollingFingerprinter()
    got = rf(t)  # mixed batch contains non-ascii → whole-batch fallback
    for i, x in enumerate(texts):
        h = rf.doc_hashes(x)
        assert got["n_windows"][i].as_py() == len(h)
        assert got["fp_min"][i].as_py() == (int(h.min()) if len(h) else -1)
        assert got["n_distinct_windows"][i].as_py() == len(np.unique(h))
    # pure-ascii slice exercises the vectorized path
    t2 = pa.table(
        {"doc_id": pa.array(np.arange(60), type=pa.int64()),
         "text": pa.array(texts[:60])}
    )
    got2 = rf(t2)
    for i in range(60):
        h = rf.doc_hashes(texts[i])
        assert got2["fp_min"][i].as_py() == (int(h.min()) if len(h) else -1)
        assert got2["n_distinct_windows"][i].as_py() == len(np.unique(h))


def test_bm25_search_matches_direct_formula(ray_session):
    """Recompute the query scores from raw text with the public BM25
    formula and verify ranking, integer scores, and top-k membership."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.webtext import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        BM25_SEARCH_K,
        q_bm25_search,
    )

    sf = "/root/testdata/sf0.001"
    out = q_bm25_search(sf).to_pandas().sort_values("rank").reset_index(drop=True)
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    tok = {
        int(d): re.findall(r"[a-z0-9]+", t.lower())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    n = float(len(docs))
    avgdl = sum(len(v) for v in tok.values()) / n
    df = {
        q: sum(1 for v in tok.values() if q in v) for q in BM25_QUERY_TERMS
    }
    exp = {}
    for d, toks in tok.items():
        s = 0
        nt = 0
        dl = float(len(toks))
        for q in BM25_QUERY_TERMS:
            tf = float(toks.count(q))
            if tf == 0:
                continue
            nt += 1
            idf = np.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            val = idf * ((tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl))))
            s += int(np.round(val * 1e10))
        if nt:
            exp[d] = (nt, s)
    order = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:BM25_SEARCH_K]
    assert len(out) == min(BM25_SEARCH_K, len(exp)) > 0
    for i, (d, (nt, s)) in enumerate(order):
        assert int(out["doc_id"][i]) == d
        assert int(out["n_terms"][i]) == nt
        assert int(out["score_e10"][i]) == s
        assert int(out["rank"][i]) == i + 1
