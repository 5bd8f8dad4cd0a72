"""Semantic (not-just-parity) tests for pipelines/analytics.py — the
prefix-aggregation family (running totals, sweep-line concurrency).

Brute-force twins are computed in pandas/numpy at sf0.001 so a bug shared
with the SQL oracle (the weighted_sample lesson) cannot hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_running_revenue_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_running_revenue

    out = q_running_revenue(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    orders["cents"] = np.round(orders.o_totalprice * 100).astype(np.int64)
    orders = orders.sort_values(
        ["o_orderdate", "o_orderkey"], ignore_index=True
    )
    want = orders.cents.cumsum().to_numpy()

    got = out.set_index("o_orderkey").running_cents
    got = got.loc[orders.o_orderkey].to_numpy()
    assert len(out) == len(orders)
    assert (got == want).all()
    # semantics: strictly increasing in the order position (prices > 0)
    assert (np.diff(got) > 0).all()


def _sessions(events: pd.DataFrame) -> pd.DataFrame:
    events = events.sort_values(["user_id", "ts"], ignore_index=True)
    gap = pd.Timedelta(minutes=30)
    new = (events.user_id != events.user_id.shift()) | (
        events.ts - events.ts.shift() > gap
    )
    events["sess"] = new.cumsum()
    g = events.groupby("sess").agg(start=("ts", "min"), end=("ts", "max"))
    return g.reset_index(drop=True)


def test_session_concurrency_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_session_concurrency,
    )

    out = (
        q_session_concurrency(SF)
        .to_pandas()
        .sort_values("hour", ignore_index=True)
    )
    events = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    sess = _sessions(events)
    s_us = sess.start.astype("int64").to_numpy()
    e_us = sess.end.astype("int64").to_numpy() + 1

    hours = out.hour.to_numpy()
    # spine is contiguous and covers the stream span
    assert (np.diff(hours) == 1).all()
    assert hours[0] == s_us.min() // US_PER_HOUR
    assert hours[-1] == e_us.max() // US_PER_HOUR

    # brute force: concurrency is piecewise-constant between boundaries;
    # evaluate the running sum at every boundary instant per hour, plus
    # the carry into each hour
    bounds = np.concatenate([s_us, e_us])
    deltas = np.concatenate(
        [np.ones(len(s_us), np.int64), -np.ones(len(e_us), np.int64)]
    )
    order = np.lexsort((-deltas, bounds))
    bounds, deltas = bounds[order], deltas[order]
    run = np.cumsum(deltas)
    bh = bounds // US_PER_HOUR
    for h, want_max in zip(out.hour, out.max_concurrent):
        before = run[bh < h]
        carry = before[-1] if len(before) else 0
        inside = run[bh == h]
        expect = max([carry, *inside.tolist()])
        assert want_max == expect, h
    # global sanity: every session opened must close
    assert run[-1] == 0
    # semantics: the busiest hour must see at least ceil(#users-active)
    # 1 concurrent session
    assert out.max_concurrent.max() >= 1


def test_embedding_covariance_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        EMB_DIM,
        q_embedding_covariance,
    )

    out = (
        q_embedding_covariance(SF)
        .to_pandas()
        .sort_values(["di", "dj"], ignore_index=True)
    )
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.vstack(emb.column("embedding").to_pylist()).astype(np.float64)
    n = len(m)
    assert len(out) == EMB_DIM * (EMB_DIM + 1) // 2
    assert (out.n == n).all()
    sx = np.round(m * 1e10).astype(np.int64).sum(axis=0)
    prod = np.einsum("bi,bj->bij", m, m)
    sxy = np.round(prod * 1e10).astype(np.int64).sum(axis=0)
    iu, ju = out.di.to_numpy() - 1, out.dj.to_numpy() - 1
    assert (out.sx_e10.to_numpy() == sx[iu]).all()
    assert (out.sy_e10.to_numpy() == sx[ju]).all()
    assert (out.sxy_e10.to_numpy() == sxy[iu, ju]).all()
    # semantics: the reconstructed Gram matrix must be PSD up to the
    # e10 rounding fuzz
    S = np.zeros((EMB_DIM, EMB_DIM))
    S[iu, ju] = out.sxy_e10 / 1e10
    S[ju, iu] = out.sxy_e10 / 1e10
    assert np.linalg.eigvalsh(S).min() > -1e-5


def test_pca_power_iter_increases_rayleigh(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        EMB_DIM,
        _cov_cells,
        _power_iterate,
        q_pca_power_iter,
    )
    import ray

    out = q_pca_power_iter(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.vstack(emb.column("embedding").to_pylist()).astype(np.float64)
    assert len(out) == len(m)

    cells = ray.get(_cov_cells(SF).to_arrow_refs())
    import pyarrow as pa

    t = pa.concat_tables(cells)
    S = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    di = t.column("di").to_numpy(zero_copy_only=False) - 1
    dj = t.column("dj").to_numpy(zero_copy_only=False) - 1
    S[di, dj] = t.column("sxy_e10").to_numpy(zero_copy_only=False)
    S[dj, di] = S[di, dj]
    v2 = np.asarray(_power_iterate(S), dtype=np.float64)

    # brute-force the projection
    xf = np.round(m * 1e5).astype(np.int64)
    want = (xf * v2.astype(np.int64)[None, :]).sum(axis=1)
    got = out.set_index("vec_id").proj_fx.loc[
        emb.column("vec_id").to_pylist()
    ].to_numpy()
    assert (got == want).all()

    # semantics: power iteration's Rayleigh quotient is non-decreasing,
    # so two rounds must beat the start vector and clear a meaningful
    # fraction of the true top eigenvalue (2 rounds on a 50-vector
    # fixture with a small λ2/λ1 gap: 76% measured; assert 60% so the
    # test checks direction-finding, not convergence speed)
    Sf = S.astype(np.float64)
    v0 = np.ones(EMB_DIM)
    rq = lambda v: (v @ Sf @ v) / (v @ v)
    assert rq(v2) >= rq(v0) * 0.999
    top = np.linalg.eigvalsh(Sf).max()
    assert rq(v2) >= 0.60 * top


def test_user_hourly_ffill_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_user_hourly_ffill,
    )

    out = (
        q_user_hourly_ffill(SF)
        .to_pandas()
        .sort_values(["user_id", "hour"], ignore_index=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).to_pandas()
    ev["hour"] = ev.ts.astype("int64") // US_PER_HOUR
    ev = ev.sort_values(["user_id", "hour", "ts", "event_id"], ignore_index=True)

    rows = []
    for uid, g in ev.groupby("user_id"):
        lastv = g.groupby("hour").value.last()  # last (ts, event_id) per hour
        for h in range(int(g.hour.min()), int(g.hour.max()) + 1):
            prior = lastv[lastv.index <= h]
            rows.append((uid, h, prior.iloc[-1]))
    want = pd.DataFrame(rows, columns=["user_id", "hour", "last_value"])
    assert len(out) == len(want)
    assert (out.user_id.to_numpy() == want.user_id.to_numpy()).all()
    assert (out.hour.to_numpy() == want.hour.to_numpy()).all()
    assert (out.last_value.to_numpy() == want.last_value.to_numpy()).all()
    # semantics: spine contiguity per user
    for uid, g in out.groupby("user_id"):
        assert (np.diff(g.hour.to_numpy()) == 1).all()


def test_event_hour_mutual_info_semantics(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_event_hour_mutual_info,
    )

    out = q_event_hour_mutual_info(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["hod"] = (ev.ts.astype("int64") // 3_600_000_000) % 24
    joint = ev.groupby(["event_type", "hod"]).size()
    assert len(out) == len(joint)
    assert out.n.sum() == len(ev)
    # brute-force one cell
    cell = out.set_index(["event_type", "hod"])
    k = joint.index[0]
    n, N = joint.iloc[0], len(ev)
    nx = joint.groupby(level=0).sum()[k[0]]
    ny = joint.groupby(level=1).sum()[k[1]]
    term = np.round(((n / N) * np.log((n * N) / (nx * ny))) * 1e10)
    assert cell.loc[k].term_e10 == term
    # semantics: MI >= 0 (up to e10 rounding fuzz across cells) and
    # bounded by min marginal entropy
    mi = out.term_e10.sum() / 1e10
    assert mi > -1e-6
    px = joint.groupby(level=0).sum() / len(ev)
    py = joint.groupby(level=1).sum() / len(ev)
    hx = -(px * np.log(px)).sum()
    hy = -(py * np.log(py)).sum()
    assert mi <= min(hx, hy) + 1e-6


def test_segment_price_trend_bruteforce_and_plan_equality(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        TPCH_DAY0,
        q_segment_price_trend,
    )

    out = q_segment_price_trend(SF).to_pandas().sort_values(
        "c_mktsegment", ignore_index=True
    )
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df["x"] = df.o_orderdate.astype("int64") // 86_400_000_000 - TPCH_DAY0
    df["y"] = np.round(df.o_totalprice * 100).astype(np.int64)
    for _, row in out.iterrows():
        g = df[df.c_mktsegment == row.c_mktsegment]
        n = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxy = int((g.x * g.y).sum())
        sxx = int((g.x * g.x).sum())
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        assert row.n == n
        assert row.slope_e10 == int(round(float(num) / float(den) * 1e10))
    # ordinary least squares sanity: slope matches np.polyfit direction
    g = df[df.c_mktsegment == out.c_mktsegment.iloc[0]]
    np_slope = np.polyfit(g.x, g.y, 1)[0]
    assert np.sign(np_slope) == np.sign(out.slope_e10.iloc[0])

    # plan equality: forced hash-join attach == broadcast attach
    forced = q_segment_price_trend(SF, broadcast_limit=0).to_pandas()
    forced = forced.sort_values("c_mktsegment", ignore_index=True)
    assert (forced.slope_e10.to_numpy() == out.slope_e10.to_numpy()).all()
    assert (forced.n.to_numpy() == out.n.to_numpy()).all()


def test_snapshot_orders_diff_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_snapshot_orders_diff,
    )

    out = q_snapshot_orders_diff(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    k = orders.o_orderkey.to_numpy()
    n_rem = int((k % 7 == 0).sum())
    n_chg = int((k % 7 == 1).sum())
    n_add = int((k % 7 == 2).sum())
    n_same = len(k) - n_rem - n_chg
    counts = out.change.value_counts()
    assert counts.get("removed", 0) == n_rem
    assert counts.get("changed", 0) == n_chg
    assert counts.get("added", 0) == n_add
    assert counts.get("same", 0) == n_same
    assert len(out) == len(k) + n_add
    # changed rows move by exactly +1000 cents; added rows carry +5000
    chg = out[out.change == "changed"]
    assert ((chg.new_cents - chg.old_cents) == 1000).all()
    add = out[out.change == "added"]
    assert (add.old_cents == -1).all()
    assert ((add.o_orderkey.to_numpy() - 10_000_000) % 7 == 2).all()


def test_event_type_user_overlap_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_event_type_user_overlap,
    )

    out = q_event_type_user_overlap(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas().drop_duplicates()
    sets = {t: set(g.user_id) for t, g in ev.groupby("event_type")}
    types = sorted(sets)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (inter, len(sets[a] | sets[b]))
    assert len(out) == len(want)
    for _, r in out.iterrows():
        wi, we = want[(r.type_a, r.type_b)]
        assert (r.n_common, r.n_either) == (wi, we)
        assert r.jac_e10 == int(np.round(wi / we * 1e10))
        # Jaccard bounds
        assert 0 < r.jac_e10 <= 10**10


def test_sliding_distinct_users_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_sliding_distinct_users,
    )

    out = (
        q_sliding_distinct_users(SF)
        .to_pandas()
        .sort_values("hour", ignore_index=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"]).to_pandas()
    ev["h"] = ev.ts.astype("int64") // US_PER_HOUR
    hu = ev[["h", "user_id"]].drop_duplicates()
    want = {}
    for h, u in hu.itertuples(index=False):
        for wh in (h, h + 1, h + 2):
            want.setdefault(wh, set()).add(u)
    assert len(out) == len(want)
    for _, r in out.iterrows():
        assert r.n_users == len(want[r.hour])
    # semantics: window counts dominate single-hour counts
    per_hour = hu.groupby("h").user_id.nunique()
    joined = out.set_index("hour").n_users
    common = per_hour.index.intersection(joined.index)
    assert (joined.loc[common] >= per_hour.loc[common]).all()


def test_acctbal_z_outliers_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_acctbal_z_outliers

    out = q_acctbal_z_outliers(SF).to_pandas()
    cust = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).to_pandas()
    cust["cents"] = np.round(cust.c_acctbal * 100).astype(np.int64)
    flagged = set()
    for nk, g in cust.groupby("c_nationkey"):
        n = len(g)
        s, sq = int(g.cents.sum()), int((g.cents.astype(object) ** 2).sum())
        mu = float(s) / float(n)
        sigma = np.sqrt(float(n * sq - s * s) / float(n * n))
        z = (g.cents.to_numpy().astype(np.float64) - mu) / sigma
        zi = np.round(z * 1e10).astype(np.int64)
        flagged |= set(g.c_custkey.to_numpy()[np.abs(zi) > 15 * 10**9])
    assert set(out.c_custkey) == flagged
    # semantics: both tails appear, and every |z| clears the fence
    assert (out.z_e10.abs() > 15 * 10**9).all()
    assert (out.z_e10 > 0).any() and (out.z_e10 < 0).any()


def test_order_percent_rank_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_order_percent_rank

    out = q_order_percent_rank(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    orders["cents"] = np.round(orders.o_totalprice * 100).astype(np.int64)
    # min-rank percent rank
    srt = orders.sort_values("cents", ignore_index=True)
    rank0 = srt.cents.rank(method="min").astype(np.int64) - 1
    n = len(srt)
    want = pd.Series(
        np.round((rank0.to_numpy().astype(np.float64) / np.float64(n - 1)) * 1e10)
        .astype(np.int64),
        index=srt.o_orderkey,
    )
    got = out.set_index("o_orderkey").pr_e10
    assert len(got) == n
    assert (got.loc[want.index].to_numpy() == want.to_numpy()).all()
    # semantics: bounds and monotonicity in value
    assert got.min() == 0 and got.max() == 10**10


def test_token_packing_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        PACK_BIN_TOKENS,
        q_token_packing,
    )

    out = (
        q_token_packing(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    tok = (docs.n_chars.to_numpy() + 3) // 4
    excl = np.concatenate(([0], np.cumsum(tok)[:-1]))
    assert (out.bin_id.to_numpy() == excl // PACK_BIN_TOKENS).all()
    assert (out.bin_offset.to_numpy() == excl % PACK_BIN_TOKENS).all()
    # semantics: bins fill monotonically; every bin except possibly the
    # last starts at or before a doc that overflows into it
    assert (np.diff(out.bin_id.to_numpy()) >= 0).all()
    assert out.bin_offset.max() < PACK_BIN_TOKENS
    # packing density: interior bins waste nothing (sequential packing
    # spans docs across bins)
    total_tok = int(tok.sum())
    assert out.bin_id.max() == (int(excl[-1]) // PACK_BIN_TOKENS)
    assert total_tok > int(out.bin_id.max()) * PACK_BIN_TOKENS


def test_segment_boxplot_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_segment_boxplot

    out = (
        q_segment_boxplot(SF)
        .to_pandas()
        .sort_values("c_mktsegment", ignore_index=True)
    )
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    ).to_pandas()
    cust["cents"] = np.round(cust.c_acctbal * 100).astype(np.int64)
    for _, r in out.iterrows():
        vals = np.sort(cust[cust.c_mktsegment == r.c_mktsegment].cents.to_numpy())
        n = len(vals)
        q1, q2, q3 = (
            vals[int(np.ceil(p * n)) - 1] for p in (0.25, 0.5, 0.75)
        )
        assert (r.n, r.q1, r.q2, r.q3) == (n, q1, q2, q3)
        iqr = q3 - q1
        lo, hi = q1 - (3 * iqr) // 2, q3 + (3 * iqr) // 2
        assert (r.lo_whisker, r.hi_whisker) == (lo, hi)
        assert r.n_low_outliers == int((vals < lo).sum())
        assert r.n_high_outliers == int((vals > hi).sum())
        # boxplot invariants
        assert r.q1 <= r.q2 <= r.q3
        assert r.n_low_outliers + r.n_high_outliers < n


def _classic_bpe(word_counts, merges_applied):
    """Reference BPE: tokens per word after applying merges in order with
    the classic greedy left-to-right rule."""
    def apply(toks, pair):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
                out.append(toks[i] + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    pair_counts = {}
    for w, c in word_counts.items():
        toks = list(w)
        for p in merges_applied:
            toks = apply(toks, p)
        for a, b in zip(toks, toks[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
    return pair_counts


def test_bpe_merges_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_bpe_merges

    out = q_bpe_merges(SF).to_pandas().sort_values("rank", ignore_index=True)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    wc = {}
    for t in docs.text:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1

    merges = []
    for rank in (1, 2):
        pc_ = _classic_bpe(wc, merges)
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        row = out[out["rank"] == rank].iloc[0]
        assert (row.lhs, row.rhs, row.n) == (l, r, n)
        merges.append((l, r))
    # semantics: the learned merge is a real bigram of the corpus and the
    # round-2 count can't exceed round-1's (argmax is non-increasing as
    # merges consume pairs)
    assert out.n.iloc[1] <= out.n.iloc[0]


def test_bpe_greedy_overlap_rule(ray_session):
    import pyarrow as pa

    from wikipedia_wikidata_ray.pipelines.analytics import _bpe_tokens

    # 'aaa' with merge (a,a) must merge ONCE (classic greedy): aa + a
    wid, T, tok_len = _bpe_tokens(
        pa.array(["aaa", "aaaa", "baab"]), [(b"a", b"a")]
    )
    toks = []
    for i in range(len(T)):
        toks.append(bytes(T[i, :tok_len[i]]).decode())
    words = {}
    for w, t in zip(wid, toks):
        words.setdefault(w, []).append(t)
    assert words[0] == ["aa", "a"]
    assert words[1] == ["aa", "aa"]
    assert words[2] == ["b", "aa", "b"]


def test_weighted_sssp_2round_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        SSSP_ROUNDS,
        q_weighted_sssp_2round,
    )

    out = q_weighted_sssp_2round(SF).to_pandas()
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    INF = float("inf")
    dist = {0: 0}
    for _ in range(SSSP_ROUNDS):
        nd = dict(dist)
        for lo, hi in edges:
            w = (lo + hi) % 97 + 1
            for a, b in ((lo, hi), (hi, lo)):
                if a in dist and dist[a] + w < nd.get(b, INF):
                    nd[b] = dist[a] + w
        dist = nd
    got = dict(zip(out.node, out.dist))
    assert got == dist
    # semantics: triangle inequality on relaxed edges both ends settled
    for lo, hi in list(edges)[:500]:
        if lo in got and hi in got:
            w = (lo + hi) % 97 + 1
            # after round k, dist may still exceed the edge bound (not
            # converged) but can never be negative, and node 0 is 0
            assert got.get(lo, 0) >= 0 and got.get(hi, 0) >= 0
    assert got[0] == 0


def test_sq8_quant_error_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_sq8_quant_error

    out = q_sq8_quant_error(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.vstack(emb.column("embedding").to_pylist()).astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    sc = (mx - mn) / 255.0
    q = np.round((m - mn) / sc)
    err = m - (mn + q * sc)
    err = np.where(sc == 0, 0.0, err)
    sse = np.round((err * err) * 1e10).astype(np.int64).sum(axis=1)
    got = out.set_index("vec_id").sse_e10.loc[
        emb.column("vec_id").to_pylist()
    ].to_numpy()
    assert (got == sse).all()
    # semantics: every per-element error is bounded by half a quantization
    # step, so sse <= d * (max_step/2)^2
    bound = len(mn) * (sc.max() / 2 * 1.0000001) ** 2 * 1e10
    assert (got <= bound).all()
    assert (got >= 0).all()


def test_boruvka_mst_2round_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        BORUVKA_ROUNDS,
        q_boruvka_mst_2round,
    )

    out = q_boruvka_mst_2round(SF).to_pandas().sort_values(
        "node", ignore_index=True
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = sorted(
        {
            (min(i, t), max(i, t))
            for i in range(n)
            for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2)
            if t != i
        }
    )

    comp = list(range(n))

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for _ in range(BORUVKA_ROUNDS):
        best = {}
        for lo, hi in edges:
            w = (lo + hi) % 97 + 1
            ca, cb = find(lo), find(hi)
            if ca == cb:
                continue
            for g in (ca, cb):
                k = (w, lo, hi)
                if g not in best or k < best[g]:
                    best[g] = k
        for _, lo, hi in best.values():
            ra, rb = find(lo), find(hi)
            if ra != rb:
                comp[max(ra, rb)] = min(ra, rb)
    want = [find(i) for i in range(n)]
    assert out.comp.tolist() == want
    # semantics: components coarsen (Borůvka at least halves component
    # count per round while edges remain), labels are component minima
    n_comps = len(set(want))
    assert n_comps < n
    for c in set(want):
        members = [i for i in range(n) if want[i] == c]
        assert min(members) == c


def test_conversion_latency_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_conversion_latency

    out = q_conversion_latency(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    want = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"]
        if views.empty:
            continue
        tv = views.ts.min()
        purch = g[(g.event_type == "purchase") & (g.ts >= tv)]
        if purch.empty:
            continue
        want[uid] = int(
            (purch.ts.min().value // 1000 - tv.value // 1000) // 1_000_000
        )
    got = dict(zip(out.user_id, out.latency_s))
    assert got == want
    # semantics: latencies are non-negative and some user converts
    assert len(out) > 0 and (out.latency_s >= 0).all()


def test_mask_spans_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        MASK_CHARS_PER_SPAN,
        MASK_MIX,
        MASK_SPAN_LEN,
        q_mask_spans,
    )

    out = (
        q_mask_spans(SF)
        .to_pandas()
        .sort_values(["doc_id", "span_id"], ignore_index=True)
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas()
    rows = []
    for did, nch in docs.itertuples(index=False):
        for j in range(nch // MASK_CHARS_PER_SPAN):
            rows.append(
                (did, j, ((did + 1) * (j + 1) * MASK_MIX) % (nch - MASK_SPAN_LEN))
            )
    rows.sort()
    assert len(out) == len(rows)
    assert out.doc_id.tolist() == [r[0] for r in rows]
    assert out.span_id.tolist() == [r[1] for r in rows]
    assert out.start.tolist() == [r[2] for r in rows]
    # semantics: every span fits inside its document
    m = out.merge(docs, on="doc_id")
    assert ((m.start + m.span_len) <= m.n_chars).all()
    assert (m.start >= 0).all()


def test_ndcg_truncation_eval_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        NDCG_K,
        NDCG_TRUNC_DIMS,
        q_ndcg_truncation_eval,
    )

    out = q_ndcg_truncation_eval(SF).to_pandas().set_index("vec_id")
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    M = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    o = np.argsort(ids)
    ids, M = ids[o], M[o]

    def ranking(X):
        n = np.sqrt((X * X).sum(1))
        ranks = {}
        for qi in range(len(ids)):
            cos = (X @ X[qi]) / (n * n[qi])
            se = np.round(cos * 1e6).astype(np.int64)
            order = sorted(
                (int(i) for i in range(len(ids)) if i != qi),
                key=lambda i: (-se[i], ids[i]),
            )
            ranks[ids[qi]] = [ids[i] for i in order[:NDCG_K]]
        return ranks

    exact = ranking(M)
    approx = ranking(M[:, :NDCG_TRUNC_DIMS])
    idcg = sum(
        int(np.round(((NDCG_K + 1 - j) / np.log(j + 1.0)) * 1e10))
        for j in range(1, NDCG_K + 1)
    )
    for qid in ids:
        dcg = 0
        for i, c in enumerate(approx[qid]):
            rel = NDCG_K - exact[qid].index(c) if c in exact[qid] else 0
            dcg += int(np.round((rel / np.log(i + 2.0)) * 1e10))
        assert out.loc[qid].dcg_e10 == dcg, qid
        assert out.loc[qid].ndcg_e10 == int(
            np.round((dcg / idcg) * 1e10)
        )
    # semantics: NDCG in [0, 1]; the self vector never scores
    # (perfect-retrieval would be ndcg == 1e10 for all queries —
    # truncation must lose SOME order somewhere)
    assert (out.ndcg_e10 <= 10**10).all() and (out.ndcg_e10 >= 0).all()
    assert (out.ndcg_e10 < 10**10).any()


def test_coordinated_sample_join_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        MASK_MIX,
        SAMPLE_KEEP,
        SAMPLE_MOD,
        q_coordinated_sample_join,
    )

    out = q_coordinated_sample_join(SF).to_pandas().set_index("o_orderpriority")
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).to_pandas()
    okeep = orders[(orders.o_orderkey * MASK_MIX) % SAMPLE_MOD < SAMPLE_KEEP]
    lkeep = li[(li.l_orderkey * MASK_MIX) % SAMPLE_MOD < SAMPLE_KEEP]
    j = lkeep.merge(okeep, left_on="l_orderkey", right_on="o_orderkey")
    j["rev"] = np.round(j.l_extendedprice * 100).astype(np.int64) * (
        100 - np.round(j.l_discount * 100).astype(np.int64)
    )
    for pr, g in j.groupby("o_orderpriority"):
        assert out.loc[pr].n == len(g)
        assert out.loc[pr].rev_c4 == g.rev.sum()
    # coordination property: the sampled join equals the join of samples
    # equals the sample of the join (filter commutes with the key join)
    full = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    sampled_join = full[
        (full.o_orderkey * MASK_MIX) % SAMPLE_MOD < SAMPLE_KEEP
    ]
    assert len(sampled_join) == len(j)


def test_pseudonymize_users_bruteforce(ray_session):
    import hashlib

    from wikipedia_wikidata_ray.pipelines.analytics import q_pseudonymize_users

    out = q_pseudonymize_users(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    counts = ev.user_id.value_counts()
    want = {
        hashlib.md5(str(int(u)).encode()).hexdigest()[:16]: int(c)
        for u, c in counts.items()
    }
    got = dict(zip(out.user_token, out.n_events))
    assert got == want
    # referential integrity: token count == distinct users; volumes match
    assert len(out) == ev.user_id.nunique()
    assert out.n_events.sum() == len(ev)


def test_tile_semivariogram_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        VARIOGRAM_BINS,
        q_tile_semivariogram,
    )
    from wikipedia_wikidata_ray.pipelines.geopipeline import (
        extract,
        geocode,
        load_pages,
    )

    out = (
        q_tile_semivariogram(SF)
        .to_pandas()
        .sort_values("bin_e6", ignore_index=True)
    )
    geo = (
        geocode(extract(load_pages(SF)))
        .to_pandas()
    )
    geo = geo[geo.has_geo]
    lat = geo.lat.to_numpy()
    lon = geo.lon.to_numpy()
    v = geo.text.str.len().to_numpy().astype(np.int64)
    n = len(geo)
    want = {}
    lo2 = 0.0
    for r in VARIOGRAM_BINS:
        want[int(round(r * 1e6))] = [0, 0, lo2, r * r]
        lo2 = r * r
    for i in range(n):
        d2 = (lat[i] - lat[i + 1:]) ** 2 + (lon[i] - lon[i + 1:]) ** 2
        dv2 = (v[i] - v[i + 1:]) ** 2
        for key, rec in want.items():
            m = (d2 > rec[2]) & (d2 <= rec[3])
            rec[0] += int(m.sum())
            rec[1] += int(dv2[m].sum())
    want = {k: (c, s) for k, (c, s, *_rest) in want.items() if c}
    got = {
        int(r.bin_e6): (int(r.n_pairs), int(r.sum_sqdiff))
        for _, r in out.iterrows()
    }
    assert got == want
    # semantics: gamma estimates are positive and pair counts grow with
    # annulus area for these bins on this fixture
    assert all(s > 0 for _, s in got.values())


def test_brand_cooccurrence_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_brand_cooccurrence

    out = q_brand_cooccurrence(SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    lb = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_orders = lb.l_orderkey.nunique()
    nb = lb.groupby("p_brand").size()
    want = {}
    for _, g in lb.groupby("l_orderkey"):
        brands = sorted(g.p_brand)
        for i, a in enumerate(brands):
            for b in brands[i + 1:]:
                want[(a, b)] = want.get((a, b), 0) + 1
    assert len(out) == len(want)
    for _, r in out.iterrows():
        n_ab = want[(r.brand_a, r.brand_b)]
        assert r.n_ab == n_ab
        lift = int(
            round(
                float(n_ab * n_orders)
                / float(int(nb[r.brand_a]) * int(nb[r.brand_b]))
                * 1e10
            )
        )
        assert r.lift_e10 == lift
    # semantics: lift centers near 1 for independent-ish brands; all
    # pairs have brand_a < brand_b
    assert (out.brand_a < out.brand_b).all()


def test_hourly_ewma_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_hourly_ewma,
    )

    out = q_hourly_ewma(SF).to_pandas().sort_values("hour", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hours = ev.ts.astype("int64") // US_PER_HOUR
    counts = hours.value_counts().sort_index()
    spine = range(int(counts.index.min()), int(counts.index.max()) + 1)
    e = None
    for i, h in enumerate(spine):
        x = int(counts.get(h, 0))
        e = float(x) if i == 0 else e + (x - e) / 8.0
        row = out.iloc[i]
        assert row.hour == h and row.n_events == x
        assert row.ewma_e10 == int(np.round(e * 1e10))
    # semantics: EWMA stays inside the running min/max envelope
    assert out.ewma_e10.max() <= out.n_events.max() * 10**10
    assert out.ewma_e10.min() >= 0


def test_ab_srm_check_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        MASK_MIX,
        SAMPLE_MOD,
        q_ab_srm_check,
    )

    out = q_ab_srm_check(SF).to_pandas().sort_values("arm", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    ev["arm"] = ((ev.user_id * MASK_MIX) % SAMPLE_MOD) % 2
    g = ev.groupby("arm").agg(
        n_users=("user_id", "nunique"), n_events=("user_id", "size")
    )
    assert out.n_users.tolist() == g.n_users.tolist()
    assert out.n_events.tolist() == g.n_events.tolist()
    total = g.n_users.sum()
    exp = total / 2.0
    chi = sum(((float(x) - exp) * (float(x) - exp)) / exp for x in g.n_users)
    assert (out.srm_chi2_e10 == int(np.round(chi * 1e10))).all()
    # semantics: both arms populated; every user in exactly one arm
    assert (out.n_users > 0).all()
    assert out.n_users.sum() == ev.user_id.nunique()


def test_session_overlap_pairs_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_session_overlap_pairs,
    )

    out = q_session_overlap_pairs(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    gap = pd.Timedelta(minutes=360)

    def sessions(df):
        df = df.sort_values(["user_id", "ts"], ignore_index=True)
        new = (df.user_id != df.user_id.shift()) | (df.ts - df.ts.shift() > gap)
        df["sn"] = new.cumsum()
        return df.groupby(["user_id", "sn"]).agg(
            st=("ts", "min"), en=("ts", "max")
        ).reset_index()

    c = sessions(ev[ev.event_type == "click"])
    e = sessions(ev[ev.event_type == "error"])
    want = {}
    for uid in set(c.user_id) & set(e.user_id):
        cs = c[c.user_id == uid]
        es = e[e.user_id == uid]
        n = 0
        for _, a in cs.iterrows():
            n += int(((a.st <= es.en) & (es.st <= a.en)).sum())
        if n:
            want[uid] = n
    got = dict(zip(out.user_id, out.n_overlaps))
    assert got == want
    # semantics: overlaps exist on this stream (the operator is not
    # vacuous at the chosen gap) and counts are bounded by |C|x|E|
    assert len(out) > 0
    for uid in got:
        assert got[uid] <= len(c[c.user_id == uid]) * len(e[e.user_id == uid])


def test_vocab_coverage_curve_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        COVERAGE_KS,
        q_vocab_coverage_curve,
    )

    out = q_vocab_coverage_curve(SF).to_pandas().sort_values(
        "k", ignore_index=True
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    counts = {}
    for t in docs.text:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    for i, k in enumerate(COVERAGE_KS):
        covered = sum(c for _, c in ranked[:k])
        r = out.iloc[i]
        assert (r.k, r.covered, r.total) == (k, covered, total)
        assert r.share_e10 == int(np.round(covered / total * 1e10))
    # semantics: monotone non-decreasing coverage, <= 1
    assert (np.diff(out.covered.to_numpy()) >= 0).all()
    assert (out.share_e10 <= 10**10).all()


def test_term_momentum_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_term_momentum

    out = q_term_momentum(SF).to_pandas().set_index("w")
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    half = len(docs) // 2
    a, b = {}, {}
    for did, t in docs.itertuples(index=False):
        tgt = a if did < half else b
        for w in t.split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    words = set(a) | set(b)
    assert set(out.index) == words
    for w in words:
        ca, cb = a.get(w, 0), b.get(w, 0)
        r = out.loc[w]
        assert (r.cnt_a, r.cnt_b) == (ca, cb)
        assert r.momentum_e10 == int(
            np.round(np.log((cb + 1) / (ca + 1)) * 1e10)
        )
    # semantics: momentum is antisymmetric under half swap around 0 for
    # balanced terms; totals conserve
    assert out.cnt_a.sum() + out.cnt_b.sum() == sum(
        len(t.split(" ")) for t in docs.text
    )


def test_nn_distance_histogram_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        NN_BINS,
        q_nn_distance_histogram,
    )
    from wikipedia_wikidata_ray.pipelines.geopipeline import (
        extract,
        geocode,
        load_pages,
    )

    out = (
        q_nn_distance_histogram(SF)
        .to_pandas()
        .sort_values("bin_e6", ignore_index=True)
    )
    geo = geocode(extract(load_pages(SF))).to_pandas()
    geo = geo[geo.has_geo]
    lat, lon = geo.lat.to_numpy(), geo.lon.to_numpy()
    n = len(geo)
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    nn = d2.min(axis=1)
    want = {}
    lo2 = 0.0
    for r in NN_BINS:
        c = int(((nn > lo2) & (nn <= r * r)).sum())
        if c:
            want[int(round(r * 1e6))] = c
        lo2 = r * r
    got = dict(zip(out.bin_e6, out.n_points))
    assert got == want
    # semantics: histogram is a partial count of points (truncation at
    # rmax drops the isolated mode), never more than n
    assert 0 < sum(got.values()) <= n


def test_doclen_ks_test_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_doclen_ks_test

    out = q_doclen_ks_test(SF).to_pandas().iloc[0]
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas()
    half = len(docs) // 2
    a = np.sort(docs[docs.doc_id < half].n_chars.to_numpy())
    b = np.sort(docs[docs.doc_id >= half].n_chars.to_numpy())
    n1, n2 = len(a), len(b)
    values = np.unique(np.concatenate([a, b]))
    d_num = 0
    for v in values:
        c1 = int((a <= v).sum())
        c2 = int((b <= v).sum())
        d_num = max(d_num, abs(c1 * n2 - c2 * n1))
    assert (out.n1, out.n2, out.d_num) == (n1, n2, d_num)
    assert out.d_e10 == int(np.round(float(d_num) / float(n1 * n2) * 1e10))
    # semantics: D in (0, 1]; scipy-free bound check D >= |mean shift|/range proxy skipped;
    # at minimum the statistic is achieved at an observed value
    assert 0 < out.d_e10 <= 10**10


def test_wilson_ci_conversion_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        WILSON_Z,
        q_wilson_ci_conversion,
    )

    out = q_wilson_ci_conversion(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    n = ev.user_id.nunique()
    for t, g in ev.groupby("event_type"):
        k = g.user_id.nunique()
        z = WILSON_Z
        p = float(k) / float(n)
        denom = 1.0 + (z * z) / float(n)
        center = p + (z * z) / (2.0 * float(n))
        spread = z * np.sqrt(
            p * (1.0 - p) / float(n) + (z * z) / (4.0 * float(n) * float(n))
        )
        r = out.loc[t]
        assert (r.k, r.n) == (k, n)
        assert r.lo_e10 == int(np.round((center - spread) / denom * 1e10))
        assert r.hi_e10 == int(np.round((center + spread) / denom * 1e10))
        # semantics: interval brackets the point estimate, inside [0,1]
        assert 0 <= r.lo_e10 <= int(p * 1e10) + 1 <= r.hi_e10 + 2 <= 10**10 + 2


def test_quantity_mode_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_quantity_mode

    out = q_quantity_mode(SF).to_pandas().set_index("l_returnflag")
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    ).to_pandas()
    li["qty"] = np.round(li.l_quantity).astype(np.int64)
    for f, g in li.groupby("l_returnflag"):
        counts = g.groupby("qty").size()
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        r = out.loc[f]
        assert (r.mode_qty, r.n) == best
        # semantics: the mode's count is the max count
        assert r.n == counts.max()


def test_logreg_2step_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        EMB_DIM,
        LR_WSCALE,
        LR_XSCALE,
        q_logreg_2step,
    )

    out = q_logreg_2step(SF).to_pandas().sort_values("di", ignore_index=True)
    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["embedding", "label"]
    )
    m = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    y = (t.column("label").to_numpy() < 5).astype(np.float64)
    n = len(m)
    w = np.zeros(EMB_DIM, dtype=np.int64)
    losses = []
    for _ in range(2):
        x_fx = np.round(m * LR_XSCALE).astype(np.int64)
        dot = (x_fx * w[None, :]).sum(axis=1)
        margin = dot.astype(np.float64) / np.float64(LR_XSCALE * LR_WSCALE)
        p = 1.0 / (1.0 + np.exp(-margin))
        losses.append(
            -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
        )
        g = np.round(((y - p)[:, None] * m) * 1e10).astype(np.int64).sum(axis=0)
        w = w + np.round(
            g.astype(np.float64) / np.float64(n * 10_000)
        ).astype(np.int64)
    assert out.w_fx.tolist() == w.tolist()
    # semantics: training reduces log-loss (step-2 loss < initial ln 2)
    x_fx = np.round(m * LR_XSCALE).astype(np.int64)
    margin = (x_fx * w[None, :]).sum(axis=1) / np.float64(
        LR_XSCALE * LR_WSCALE
    )
    p = 1.0 / (1.0 + np.exp(-margin))
    final_loss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert final_loss < losses[0] < np.log(2) + 1e-12


def test_nb_lang_classify_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_nb_lang_classify

    out = q_nb_lang_classify(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pandas()
    langs = sorted(docs.lang.unique())
    cnt, tot = {}, {L: 0 for L in langs}
    vocab = set()
    for _, r in docs.iterrows():
        for w in r.text.split(" "):
            cnt[(r.lang, w)] = cnt.get((r.lang, w), 0) + 1
            tot[r.lang] += 1
            vocab.add(w)
    V = len(vocab)
    nd = docs.lang.value_counts()
    n = len(docs)
    correct = 0
    for _, r in docs.iterrows():
        scores = {}
        for L in langs:
            s = int(np.round(np.log(float(nd[L]) / float(n)) * 1e10))
            denom = float(tot[L] + V)
            for w in r.text.split(" "):
                s += int(
                    np.round(
                        np.log((cnt.get((L, w), 0) + 1) / denom) * 1e10
                    )
                )
            scores[L] = s
        best = min(langs, key=lambda L: (-scores[L], L))
        row = out.loc[r.doc_id]
        assert row.pred_lang == best
        assert row.score_e10 == scores[best]
        correct += best == r.lang
    # semantics: training-set accuracy must beat the majority-class
    # baseline (the model actually learned language-discriminative
    # token distributions)
    assert correct / len(docs) > nd.max() / n


def test_rrf_fusion_topk_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        NDCG_K,
        NDCG_TRUNC_DIMS,
        RRF_K,
        RRF_TOP,
        q_rrf_fusion_topk,
    )

    out = q_rrf_fusion_topk(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    M = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    o = np.argsort(ids)
    ids, M = ids[o], M[o]

    def ranking(X):
        n = np.sqrt((X * X).sum(1))
        ranks = {}
        for qi in range(len(ids)):
            cos = (X @ X[qi]) / (n * n[qi])
            se = np.round(cos * 1e6).astype(np.int64)
            order = sorted(
                (i for i in range(len(ids)) if i != qi),
                key=lambda i: (-se[i], ids[i]),
            )
            ranks[ids[qi]] = [ids[i] for i in order[:NDCG_K]]
        return ranks

    exact = ranking(M)
    approx = ranking(M[:, :NDCG_TRUNC_DIMS])
    for qid in ids:
        scores = {}
        for lst in (exact[qid], approx[qid]):
            for r, c in enumerate(lst):
                scores[c] = scores.get(c, 0.0) + 1.0 / (RRF_K + r + 1)
        fused = sorted(
            ((int(np.round(s * 1e10)), c) for c, s in scores.items()),
            key=lambda kv: (-kv[0], kv[1]),
        )[:RRF_TOP]
        g = out[out.vec_id == qid].sort_values("fused_rank")
        assert g.neighbor_id.tolist() == [c for _, c in fused]
        assert g.rrf_e10.tolist() == [s for s, _ in fused]
    # semantics: a candidate in BOTH lists at rank 1 dominates any
    # single-list candidate (2/(61) > 1/61 max single)
    assert (out.fused_rank.between(1, RRF_TOP)).all()


def test_churn_features_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        CHURN_WEEK_US,
        q_churn_features,
    )

    out = q_churn_features(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"]).to_pandas()
    t0 = int(ev.ts.astype("int64").min())
    ev["wk"] = (ev.ts.astype("int64") - t0) // CHURN_WEEK_US
    for uid, g in ev.groupby("user_id"):
        r = out.loc[uid]
        assert r.w1 == (g.wk == 0).sum()
        assert r.w2 == (g.wk == 1).sum()
        assert r.w3 == (g.wk == 2).sum()
        assert r.churned == int((g.wk >= 3).sum() == 0)
    # semantics: every user appears once; labels are binary; feature
    # totals conserve the first-3-week event count
    assert len(out) == ev.user_id.nunique()
    assert set(out.churned.unique()) <= {0, 1}
    assert (out.w1 + out.w2 + out.w3).sum() == (ev.wk < 3).sum()


def test_lang_js_divergence_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_lang_js_divergence,
    )

    out = q_lang_js_divergence(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"]).to_pandas()
    langs = sorted(docs.lang.unique())
    counts = {L: {} for L in langs}
    for _, r in docs.iterrows():
        for w in r.text.split(" "):
            counts[r.lang][w] = counts[r.lang].get(w, 0) + 1
    vocab = sorted({w for d in counts.values() for w in d})
    got = {(r.lang_a, r.lang_b): r.jsd_e10 for _, r in out.iterrows()}
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            ta = sum(counts[a].values())
            tb = sum(counts[b].values())
            s = 0
            for w in vocab:
                na, nb_ = counts[a].get(w, 0), counts[b].get(w, 0)
                p, q = na / ta, nb_ / tb
                tp = p * np.log((2.0 * p) / (p + q)) if na > 0 else 0.0
                tq = q * np.log((2.0 * q) / (p + q)) if nb_ > 0 else 0.0
                s += int(np.round((0.5 * (tp + tq)) * 1e10))
            assert got[(a, b)] == s
            # JSD bounds: [0, ln 2]
            assert 0 <= got[(a, b)] <= int(np.log(2) * 1e10) + 1


def test_kcenter_seeds_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        KCENTER_K,
        LR_XSCALE,
        q_kcenter_seeds,
    )

    out = q_kcenter_seeds(SF).to_pandas().sort_values(
        "seed_rank", ignore_index=True
    )
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    M = np.round(
        np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
        * LR_XSCALE
    ).astype(np.int64)
    seeds = [int(ids.min())]
    dists = [0]
    for _ in range(KCENTER_K - 1):
        best = None
        for vi, vid in enumerate(ids):
            if vid in seeds:
                continue
            d = min(
                int(((M[vi] - M[np.flatnonzero(ids == s)[0]]) ** 2).sum())
                for s in seeds
            )
            key = (-d, vid)
            if best is None or key < best[0]:
                best = (key, vid, d)
        seeds.append(int(best[1]))
        dists.append(best[2])
    assert out.vec_id.tolist() == seeds
    assert out.mindist_fx.tolist() == dists
    # semantics: greedy farthest-point min-distances are non-increasing
    # after the first pick
    assert all(
        dists[i] >= dists[i + 1] for i in range(1, len(dists) - 1)
    )


def test_burst_states_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_burst_states,
    )

    out = q_burst_states(SF).to_pandas().sort_values("hour", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hours = ev.ts.astype("int64") // US_PER_HOUR
    counts = hours.value_counts().sort_index()
    spine = list(range(int(counts.index.min()), int(counts.index.max()) + 1))
    full = [int(counts.get(h, 0)) for h in spine]
    H, total = len(spine), sum(full)
    cur, want = 0, []
    for x in full:
        if 4 * x * H > 5 * total:
            cur = 1
        elif 4 * x * H < 3 * total:
            cur = 0
        want.append(cur)
    assert out.burst.tolist() == want
    assert out.n_events.tolist() == full
    # semantics: hysteresis — a burst hour's count cleared the hi bar at
    # entry; both states occur on this stream
    assert set(out.burst.unique()) == {0, 1}


def test_theil_sen_hourly_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_theil_sen_hourly,
    )

    out = q_theil_sen_hourly(SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hours = ev.ts.astype("int64") // US_PER_HOUR
    counts = hours.value_counts().sort_index()
    spine = np.arange(int(counts.index.min()), int(counts.index.max()) + 1)
    full = np.array([int(counts.get(h, 0)) for h in spine], dtype=np.int64)
    slopes = []
    for i in range(len(spine)):
        for j in range(i + 1, len(spine)):
            slopes.append(
                int(np.round((full[j] - full[i]) / (spine[j] - spine[i]) * 1e10))
            )
    slopes.sort()
    assert out.n_pairs == len(slopes)
    assert out.slope_e10 == slopes[int(np.ceil(0.5 * len(slopes))) - 1]
    # semantics: a stationary stream's robust trend is near zero — far
    # smaller than the hourly volume scale
    assert abs(out.slope_e10) < np.mean(full) * 1e10


def test_nb_confusion_kappa_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_nb_confusion_kappa,
        q_nb_lang_classify,
    )

    out = q_nb_confusion_kappa(SF).to_pandas()
    pred = q_nb_lang_classify(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    docs["pred"] = pred.pred_lang.loc[docs.doc_id].to_numpy()
    conf = docs.groupby(["lang", "pred"]).size()
    got = {(r.lang, r.pred_lang): r.n for _, r in out.iterrows()}
    assert got == dict(conf.items())
    total = len(docs)
    agree = int((docs.lang == docs.pred).sum())
    langs = sorted(set(docs.lang) | set(docs.pred))
    pe_num = sum(
        int((docs.lang == L).sum()) * int((docs.pred == L).sum())
        for L in langs
    )
    po = agree / total
    pe = pe_num / (total * total)
    kappa = int(np.round((po - pe) / (1.0 - pe) * 1e10))
    assert (out.kappa_e10 == kappa).all()
    # semantics: kappa must beat chance (positive) for a trained model
    # and cannot exceed 1
    assert 0 < kappa <= 10**10


def test_lang_source_chisq_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        q_lang_source_chisq,
    )

    out = q_lang_source_chisq(SF).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["lang", "source"]
    ).to_pandas()
    conf = docs.groupby(["lang", "source"]).size()
    got = {(r.lang, r.source): r.n for _, r in out.iterrows()}
    assert got == dict(conf.items())
    langs = sorted(docs.lang.unique())
    sources = sorted(docs.source.unique())
    N = len(docs)
    chi2 = 0
    for L in langs:
        rn = int((docs.lang == L).sum())
        for S in sources:
            cn = int((docs.source == S).sum())
            o = int(conf.get((L, S), 0))
            num = (o * N - rn * cn) ** 2
            chi2 += int(np.round(float(num) / float(rn * cn * N) * 1e10))
    assert (out.chi2_e10 == chi2).all()
    assert (out.dof == (len(langs) - 1) * (len(sources) - 1)).all()
    # semantics: chi2 >= 0 and, for this near-uniform synthetic grid,
    # not astronomically large
    assert 0 <= chi2


def _jarvis_py(pts):
    """Independent pure-Python Jarvis march (strict, farthest-on-ties) —
    the SQL oracle's algorithm, used as the hull twin."""
    pts = sorted(set(map(tuple, pts)))
    if len(pts) <= 2:
        return pts
    start = min(pts, key=lambda p: (p[1], p[0]))
    hull = [start]
    cur = start
    while True:
        nxt = None
        for q in pts:
            if q == cur:
                continue
            if nxt is None:
                nxt = q
                continue
            cr = (nxt[0] - cur[0]) * (q[1] - cur[1]) - (nxt[1] - cur[1]) * (
                q[0] - cur[0]
            )
            d_q = (q[0] - cur[0]) ** 2 + (q[1] - cur[1]) ** 2
            d_n = (nxt[0] - cur[0]) ** 2 + (nxt[1] - cur[1]) ** 2
            if cr > 0 or (cr == 0 and d_q > d_n):
                nxt = q
        if nxt is None or nxt == start:
            break
        hull.append(nxt)
        cur = nxt
    return hull


def test_hull_chain_matches_jarvis_bruteforce():
    from wikipedia_wikidata_ray.pipelines.queries import (
        _hull_at_prune,
        _hull_chain_int,
    )

    rng = np.random.RandomState(11)
    cases = [rng.randint(-500, 500, size=(n, 2)) for n in (1, 2, 3, 8, 60, 300)]
    cases.append(np.stack([np.arange(9) * 2, np.arange(9) * 4], axis=1))  # collinear
    cases.append(np.array([[5, 5]] * 7 + [[1, 2], [9, 9], [1, 9]]))  # dups
    # square lattice: many boundary-collinear points
    g = np.stack(np.meshgrid(np.arange(6), np.arange(6)), -1).reshape(-1, 2)
    cases.append(g)
    for pts in cases:
        pts = pts.astype(np.int64)
        uniq = np.unique(pts, axis=0)
        got = _hull_chain_int(_hull_at_prune(uniq))
        want = _jarvis_py(pts.tolist())
        assert sorted(map(tuple, got.tolist())) == sorted(want), pts
        # prune keeps a hull superset: chain without prune must agree
        full = _hull_chain_int(uniq)
        assert sorted(map(tuple, full.tolist())) == sorted(want)


def test_metro_convex_hulls_semantics(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_metro_convex_hulls

    out = q_metro_convex_hulls(SF).to_pandas().set_index("metro")
    # doc_id % 10 < 3 constrains doc_id % 5 to {0, 1, 2}: exactly 3 anchors
    assert sorted(out.index) == [0, 1, 2]
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    did = docs.doc_id.to_numpy()
    sel = did[(did % 10) < 3]
    for m in (0, 1, 2):
        ids = sel[sel % 5 == m]
        # brute-force the synthetic point lattice for this metro
        anch_lat = [35.6895, 40.7127, 51.5072][m]
        anch_lon = [139.6917, -74.0059, -0.1275][m]
        lat = anch_lat + ((ids * 37) % 2001 - 1000) / 10000.0
        lon = anch_lon + ((ids * 61) % 2001 - 1000) / 10000.0
        x = np.round(lon * 10000.0).astype(np.int64)
        y = np.round(lat * 10000.0).astype(np.int64)
        pts = np.unique(np.stack([x, y], 1), axis=0)
        r = out.loc[m]
        assert r.n_points == len(pts)
        hull = _jarvis_py(pts.tolist())
        assert r.hull_vertices == len(hull)
        # shoelace on the CCW Jarvis order
        a2 = 0
        for i in range(len(hull)):
            x0, y0 = hull[i]
            x1, y1 = hull[(i + 1) % len(hull)]
            a2 += x0 * y1 - x1 * y0
        assert r.area2 == abs(a2)
        dx = pts[:, 0][:, None] - pts[:, 0][None, :]
        dy = pts[:, 1][:, None] - pts[:, 1][None, :]
        assert r.diam2 == int((dx * dx + dy * dy).max())
        # semantics: hull area bounded by the jitter bbox, diameter by
        # its diagonal (spread is <= 2000 e4 units per axis)
        assert 0 < r.area2 <= 2 * 2001 * 2001
        assert 0 < r.diam2 <= 2 * 2001 * 2001


def test_lm_dirichlet_semantics(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from wikipedia_wikidata_ray.pipelines.webtext import (
        LM_MU,
        lm_dirichlet_search,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    [
                        "table fast query table",       # tf(table)=2, dl=4
                        "table slow filler words here", # tf(table)=1, dl=5
                        "fast fast fast",               # tf(fast)=3, dl=3
                        "nothing relevant at all",      # no match
                    ]
                ),
            }
        )
    )
    out = lm_dirichlet_search(docs, k=10).to_pandas().set_index("doc_id")
    assert 4 not in out.index  # unmatched doc never scores
    import math

    toks = {
        1: ["table", "fast", "query", "table"],
        2: ["table", "slow", "filler", "words", "here"],
        3: ["fast", "fast", "fast"],
        4: ["nothing", "relevant", "at", "all"],
    }
    cf = {}
    for ts in toks.values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    Ctot = float(sum(len(ts) for ts in toks.values()))
    want = {}
    for d, ts in toks.items():
        sc, n = 0, 0
        for q in ("fast", "query", "table"):
            tf = ts.count(q)
            if tf == 0:
                continue
            n += 1
            sc += int(
                np.round(
                    math.log(1.0 + tf / (LM_MU * (cf[q] / Ctot))) * 1e10
                )
            )
        if n:
            sc += int(
                np.round(3.0 * math.log(LM_MU / (len(ts) + LM_MU)) * 1e10)
            )
            want[d] = (n, sc)
    for d, (n, sc) in want.items():
        assert out.loc[d].n_terms == n
        assert out.loc[d].score_e10 == sc
    # semantics: more matched query mass with equal dl ranks higher —
    # doc 1 (2 terms incl. rare 'query') must outrank doc 2 (1 common term)
    assert out.loc[1, "rank"] < out.loc[2, "rank"]


def test_cohort_retention_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_cohort_retention

    out = q_cohort_retention(SF).to_pandas().set_index(
        ["cohort_day", "day_offset"]
    )
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"])
    us = ev.column("ts").cast("int64").to_numpy()
    uid = ev.column("user_id").to_numpy()
    day = (us - us.min()) // 86_400_000_000
    df = pd.DataFrame({"u": uid, "d": day}).drop_duplicates()
    first = df.groupby("u").d.min()
    df["cohort"] = first.reindex(df.u).to_numpy()
    df["off"] = df.d - df.cohort
    want = df.groupby(["cohort", "off"]).size()
    assert len(out) == len(want)
    for (c, o), n in want.items():
        assert out.loc[(c, o)].n_users == n
    # each user appears exactly once at offset 0, so offset-0 cells sum
    # to the number of distinct users
    assert out.xs(0, level="day_offset").n_users.sum() == first.size
    # retention can only shrink relative to each cohort's day-0 size
    for c in first.unique():
        base = out.loc[(c, 0)].n_users
        assert (out.loc[c].n_users <= base).all()


def test_fd_violations_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        FD_CANDIDATES, q_fd_violations)

    out = q_fd_violations(SF).to_pandas().set_index("fd_name")
    assert len(out) == len(FD_CANDIDATES)
    for fd_name, table, xcol, ycol in FD_CANDIDATES:
        df = pq.read_table(
            f"{SF}/{table}.parquet", columns=[xcol, ycol]
        ).to_pandas()
        pairs = df.groupby([xcol, ycol]).size().rename("n").reset_index()
        g = pairs.groupby(xcol).agg(
            ny=("n", "size"), rows=("n", "sum"), keep=("n", "max")
        )
        row = out.loc[fd_name]
        assert row.n_groups == len(g)
        assert row.n_pairs == len(pairs)
        assert row.violating_groups == int((g.ny > 1).sum())
        assert row.rows_total == len(df) == int(g.rows.sum())
        assert row.rows_keep == int(g.keep.sum())
        assert row.rows_to_fix == row.rows_total - row.rows_keep
        # deleting rows_to_fix rows must make the FD exact: keep >= 1 per group
        assert row.rows_keep >= row.n_groups
        # an FD holds iff no violations iff pairs == groups
        assert (row.violating_groups == 0) == (row.n_pairs == row.n_groups)


def test_apriori_triples_bruteforce(ray_session):
    from itertools import combinations

    from wikipedia_wikidata_ray.pipelines.analytics import q_apriori_triples

    out = q_apriori_triples(SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    baskets = m.groupby("l_orderkey").p_brand.apply(set)
    minsup = max(2, len(baskets) // 300)
    want = {}
    for b in baskets:
        for tri in combinations(sorted(b), 3):
            want[tri] = want.get(tri, 0) + 1
    want = {k: v for k, v in want.items() if v >= minsup}
    got = {
        (r.brand_a, r.brand_b, r.brand_c): r.support for r in out.itertuples()
    }
    assert got == want and len(want) > 0
    # downward closure: every sub-pair of a frequent triple is frequent
    pair_sup = {}
    for b in baskets:
        for pr in combinations(sorted(b), 2):
            pair_sup[pr] = pair_sup.get(pr, 0) + 1
    for (a, b, c), s in got.items():
        assert a < b < c
        for pr in ((a, b), (a, c), (b, c)):
            assert pair_sup[pr] >= s >= minsup


def test_ams_f2_sketch_quality(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        AMS_R, _AMS_A, q_ams_f2_users)

    out = q_ams_f2_users(SF).to_pandas().sort_values("r", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    uid = ev.column("user_id").to_numpy()
    counts = pd.Series(uid).value_counts()
    f2 = int((counts.astype(np.int64) ** 2).sum())
    assert (out.f2_exact == f2).all()
    assert len(out) == AMS_R
    for r, a in enumerate(_AMS_A):
        s = 1 - 2 * ((((uid + 1) * a) // 8192) % 2)
        assert out.z[r] == int(s.sum())
        assert out.z_sq[r] == out.z[r] ** 2
    # unbiased estimator sanity: the mean of 16 squares lands within a
    # factor of 3 of the truth on this fixture (Var(Z²) ≤ 2·F2²)
    assert f2 / 3 <= out.z_sq.mean() <= 3 * f2


def test_markov_next_accuracy_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        MARKOV_TRAIN_US, q_markov_next_accuracy)

    out = q_markov_next_accuracy(SF).to_pandas().set_index("from_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev.ts.astype("int64")
    split = ev.ts_us.min() + MARKOV_TRAIN_US
    train, test = {}, {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        types = g.event_type.tolist()
        tss = g.ts_us.tolist()
        for i in range(len(types) - 1):
            d = train if tss[i + 1] < split else test
            d.setdefault(types[i], {}).setdefault(types[i + 1], 0)
            d[types[i]][types[i + 1]] += 1
    assert set(out.index) == set(train)
    for f in train:
        pred = min(train[f], key=lambda k: (-train[f][k], k))
        r = out.loc[f]
        assert r.pred_next == pred
        assert r.n_train == sum(train[f].values())
        nt = sum(test.get(f, {}).values())
        assert r.n_test == nt
        assert r.n_correct == test.get(f, {}).get(pred, 0)
        assert r.n_correct <= r.n_test
        # the argmax predictor must beat or match uniform guessing
        assert r.acc_e8 / 1e8 >= 1.0 / (5 * 2) or nt == 0


def test_linear_counting_quality(ray_session):
    import math

    from wikipedia_wikidata_ray.pipelines.analytics import (
        LC_M, q_linear_counting_users)

    row = q_linear_counting_users(SF).take_all()[0]
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    uid = ev.column("user_id").to_numpy()
    distinct = len(np.unique(uid))
    bits = np.unique((((uid + 1) * 2654435761) // 65536) % LC_M)
    assert row["m"] == LC_M
    assert row["occupied"] == len(bits)
    assert row["exact_distinct"] == distinct
    est = LC_M * math.log(LC_M / (LC_M - len(bits)))
    assert abs(row["est_e8"] / 1e8 - est) < 1e-6
    # occupancy can only undercount distincts (collisions), and the
    # ln correction must recover to within 15% at this load factor
    assert row["occupied"] <= distinct
    assert abs(row["est_e8"] / 1e8 - distinct) < 0.15 * distinct


def test_join_skew_audit_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        SKEW_KEYS, q_join_skew_audit)

    out = q_join_skew_audit(SF).to_pandas().set_index("key_name")
    assert len(out) == len(SKEW_KEYS)
    for name, table, col in SKEW_KEYS:
        vals = pq.read_table(f"{SF}/{table}.parquet",
                             columns=[col]).column(col).to_numpy()
        counts = pd.Series(vals).value_counts()
        r = out.loc[name]
        assert r.n_rows == len(vals)
        assert r.n_distinct == len(counts)
        assert r.max_freq == int(counts.max())
        ss = int((counts.astype(np.int64) ** 2).sum())
        assert r.sum_sq == ss
        # sum_sq IS the self-equijoin cardinality
        merged = pd.DataFrame({"k": vals}).merge(
            pd.DataFrame({"k": vals}), on="k")
        assert len(merged) == ss
        # Cauchy-Schwarz sanity: n²/d ≤ Σc² ≤ n·max
        assert r.n_rows ** 2 / r.n_distinct <= ss <= r.n_rows * r.max_freq


def test_range_partition_audit_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        RPA_K, RPA_SAMPLE_MOD, RPA_SAMPLE_THR, q_range_partition_audit)

    out = q_range_partition_audit(SF).to_pandas().set_index("boundary")
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    cents = np.sort(np.round(orders.o_totalprice.to_numpy() * 100)
                    .astype(np.int64))
    samp_mask = (orders.o_orderkey.to_numpy() * 2654435761) \
        % RPA_SAMPLE_MOD < RPA_SAMPLE_THR
    samp = np.sort(np.round(
        orders.o_totalprice.to_numpy()[samp_mask] * 100).astype(np.int64))
    n, ns = len(cents), len(samp)
    assert ns > 0
    for i in range(1, RPA_K):
        r = out.loc[i]
        exact_v = cents[(i * n + RPA_K - 1) // RPA_K - 1]
        assert r.exact_v == exact_v
        samp_v = samp[(i * ns + RPA_K - 1) // RPA_K - 1]
        assert r.sampled_v == samp_v
        rank = int((cents <= samp_v).sum())
        assert r.sampled_rank == rank
        assert r.rank_err_scaled == abs(RPA_K * rank - i * n)
        # quantile-from-sample error is O(1/sqrt(ns)) — scale-aware bound
        assert r.rank_err_scaled <= RPA_K * n * 4.0 / np.sqrt(ns)
    # boundaries must be nondecreasing in i on both columns
    assert (np.diff(out.exact_v.to_numpy()) >= 0).all()
    assert (np.diff(out.sampled_v.to_numpy()) >= 0).all()


def test_consistent_hash_balance_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        CH_M, CH_REPLICAS, CH_WORKERS, q_consistent_hash_balance)

    out = q_consistent_hash_balance(SF).to_pandas().set_index("worker")
    uid = pq.read_table(f"{SF}/events.parquet",
                        columns=["user_id"]).column("user_id").to_numpy()
    i = np.arange(CH_WORKERS * CH_REPLICAS, dtype=np.int64)
    vh = ((i + 1) * 2654435761) % CH_M
    vw = i // CH_REPLICAS
    order = np.lexsort((vw, vh))
    ring_h, ring_w = vh[order], vw[order]

    def assign(u):
        hk = ((u + 1) * 2654435761) % CH_M
        p = int(np.searchsorted(ring_h, hk, side="left"))
        return int(ring_w[0 if p == len(ring_h) else p])

    users = {}
    events = {}
    for u in uid:
        w = assign(int(u))
        events[w] = events.get(w, 0) + 1
        users.setdefault(w, set()).add(int(u))
    assert set(out.index) == set(events)
    for w in events:
        r = out.loc[w]
        assert r.n_events == events[w]
        assert r.n_users == len(users[w])
        assert r.n_vnodes == CH_REPLICAS
    # conservation: every event and user lands on exactly one worker
    assert out.n_events.sum() == len(uid)
    assert out.n_users.sum() == len(np.unique(uid))


def test_association_rules_bruteforce(ray_session):
    from itertools import combinations

    from wikipedia_wikidata_ray.pipelines.analytics import (
        RULE_K, q_association_rules)

    out = q_association_rules(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    baskets = m.groupby("l_orderkey").p_brand.apply(set)
    n = len(baskets)
    minsup = max(2, n // 300)
    item, pair, tri = {}, {}, {}
    for b in baskets:
        sb = sorted(b)
        for it in sb:
            item[it] = item.get(it, 0) + 1
        for pr in combinations(sb, 2):
            pair[pr] = pair.get(pr, 0) + 1
        for tr in combinations(sb, 3):
            tri[tr] = tri.get(tr, 0) + 1
    rules = []
    for (a, b, c), s_ in tri.items():
        if s_ < minsup:
            continue
        for x, y, z in ((a, b, c), (a, c, b), (b, c, a)):
            den = pair[(x, y)] * item[z]
            lift = (2 * s_ * n * 10**8 + den) // (2 * den)
            rules.append((-lift, x, y, z, s_, pair[(x, y)]))
    rules.sort()
    want = rules[:RULE_K]
    got = list(map(tuple, out[["lift_e8", "ant_a", "ant_b", "cons",
                               "sup_abc", "sup_ab"]].itertuples(index=False)))
    expect = [(-r[0], r[1], r[2], r[3], r[4], r[5]) for r in want]
    assert got == expect and len(got) == RULE_K
    # the ranking is by lift and the top rule genuinely lifts:
    # P(z | x,y) > P(z) strictly
    top = out.iloc[0]
    assert top.lift_e8 > 10**8
    assert (out.lift_e8.to_numpy()[:-1] >= out.lift_e8.to_numpy()[1:]).all()
    for r in out.itertuples():
        assert r.conf_e8 == (2 * r.sup_abc * 10**8 + r.sup_ab) \
            // (2 * r.sup_ab)
