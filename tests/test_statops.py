"""Semantic brute-force checks for the statistical-test operators
(pipelines/statops.py) — each compares the distributed
sufficient-statistic path against a direct numpy computation on the
raw rows, and asserts statistic-level invariants the oracle parity
alone would not catch (the weighted_sample lesson: both sides can
share a bug)."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from wikipedia_wikidata_ray.pipelines import statops

SF = "/root/testdata/sf0.001"


def _cents(x: pd.Series) -> np.ndarray:
    # mirror pc.round (half-even) — fixture never lands on .5
    return np.round(x.to_numpy() * 100).astype(np.int64)


def _cust():
    return pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_mktsegment", "c_acctbal", "c_nationkey"],
    ).to_pandas()


def test_welch_matches_brute_force(ray_session):
    row = statops.q_welch_ttest_segments(SF).take_all()[0]
    df_ = _cust()
    a = _cents(df_[df_.c_mktsegment == statops.SEG_A].c_acctbal)
    b = _cents(df_[df_.c_mktsegment == statops.SEG_B].c_acctbal)
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["s1"] == int(a.sum()) and row["s2"] == int(b.sum())
    va = a.var(ddof=1)
    vb = b.var(ddof=1)
    se = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    df_ws = se * se / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(row["t_e8"] / 1e8 - t) < 1e-6
    assert abs(row["df_e8"] / 1e8 - df_ws) < 1e-3
    # Welch df is bracketed by min(n)-1 and n1+n2-2
    assert min(len(a), len(b)) - 1 <= row["df_e8"] / 1e8 <= len(a) + len(b) - 2


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    sv = v[order]
    ranks = np.empty(len(v), dtype=np.float64)
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_mannwhitney_matches_brute_force(ray_session):
    row = statops.q_mannwhitney_u_segments(SF).take_all()[0]
    df_ = _cust()
    a = _cents(df_[df_.c_mktsegment == statops.SEG_A].c_acctbal)
    b = _cents(df_[df_.c_mktsegment == statops.SEG_B].c_acctbal)
    pooled = np.concatenate([a, b])
    ranks = _avg_ranks(pooled)
    r1 = ranks[: len(a)].sum()
    assert row["two_r1"] == int(round(2 * r1))
    u1 = r1 - len(a) * (len(a) + 1) / 2
    assert row["two_u1"] == int(round(2 * u1))
    # U1 + U2 = n1*n2 identity
    u2 = len(a) * len(b) - u1
    assert 0 <= u1 <= len(a) * len(b) and u2 >= 0
    # z sign must match the mean-rank direction
    mean_rank_a = r1 / len(a)
    mean_rank_rest = (ranks.sum() - r1) / len(b)
    if mean_rank_a > mean_rank_rest:
        assert row["z_e8"] > 0
    elif mean_rank_a < mean_rank_rest:
        assert row["z_e8"] < 0


def test_benford_counts_and_terms(ray_session):
    rows = statops.q_benford_chisq(SF).take_all()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    cents = _cents(orders.o_totalprice)
    first = np.array([int(str(c)[0]) for c in cents])
    bc = np.bincount(first, minlength=10)
    n = len(cents)
    for r in rows:
        assert r["obs"] == int(bc[r["digit"]])
        assert r["n"] == n
        assert r["term_e6"] >= 0
        p = statops._BENFORD_P[r["digit"]]
        assert abs(r["exp_e6"] / 1e6 - n * p) < 1e-5
    assert sum(r["obs"] for r in rows) == n


def _spine():
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    hrs = (ev.ts.astype("int64") // 1_000_000 // 3600).to_numpy()
    lo, hi = hrs.min(), hrs.max()
    full = np.bincount(hrs - lo, minlength=hi - lo + 1).astype(np.int64)
    return np.arange(lo, hi + 1), full


def test_hourly_acf_matches_brute_force(ray_session):
    rows = {r["lag"]: r for r in statops.q_hourly_acf(SF).take_all()}
    _, c = _spine()
    m = c.mean()
    den = ((c - m) ** 2).sum()
    for k in statops.ACF_LAGS:
        r_direct = ((c[:-k] - m) * (c[k:] - m)).sum() / den
        assert abs(rows[k]["r_e10"] / 1e10 - r_direct) < 1e-9
        assert abs(rows[k]["r_e10"]) <= 10_000_000_000
        assert rows[k]["n_hours"] == len(c)


def test_cusum_matches_brute_force(ray_session):
    row = statops.q_cusum_changepoint(SF).take_all()[0]
    spine, c = _spine()
    n = len(c)
    csum = np.cumsum(c)
    k = np.arange(1, n + 1)
    stat = np.abs(csum * n - k * csum[-1])[:-1]
    k_star = int(np.argmax(stat)) + 1
    assert row["k_star"] == k_star
    assert row["stat_num"] == int(stat[k_star - 1])
    assert row["split_hour"] == int(spine[k_star - 1])
    # the two mean rates must reassemble the exact total
    total = (
        row["mean_before_e8"] / 1e8 * row["k_star"]
        + row["mean_after_e8"] / 1e8 * (n - row["k_star"])
    )
    assert abs(total - row["s_total"]) < 1e-4


def test_trimmed_mean_matches_numpy_trim(ray_session):
    rows = {
        r["c_mktsegment"]: r
        for r in statops.q_trimmed_mean_segments(SF).take_all()
    }
    df_ = _cust()
    for s, r in rows.items():
        v = np.sort(_cents(df_[df_.c_mktsegment == s].c_acctbal))
        g = len(v) // 10
        kept = v[g: len(v) - g]
        assert r["n"] == len(v) and r["g"] == g
        assert r["kept_sum"] == int(kept.sum())
        assert abs(r["mean_e8"] / 1e8 - kept.mean()) < 1e-6
        # trimming must pull the mean toward the median
        med = np.median(v)
        assert abs(kept.mean() - med) <= abs(v.mean() - med) + 1e-9


def test_k_anonymity_matches_pandas(ray_session):
    row = statops.q_k_anonymity_audit(SF).take_all()[0]
    df_ = _cust()
    df_["neg"] = (df_.c_acctbal < 0).astype(int)
    sizes = df_.groupby(["c_nationkey", "c_mktsegment", "neg"]).size()
    assert row["n_classes"] == len(sizes)
    assert row["classes_below_k"] == int((sizes < statops.ANON_K).sum())
    assert row["rows_at_risk"] == int(sizes[sizes < statops.ANON_K].sum())
    assert row["min_class_size"] == int(sizes.min())
    assert row["max_class_size"] == int(sizes.max())
    # audit must account for every row exactly once
    assert sizes.sum() == len(df_)


def test_geary_matches_pair_loop(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_tile_counts

    row = statops.q_geary_c_stats(SF).take_all()[0]
    tiles = q_tile_counts(SF).take_all()
    cnt = {(t["tile_x"], t["tile_y"]): t["n_pages"] for t in tiles}
    n = len(cnt)
    s = sum(cnt.values())
    assert row["n_tiles"] == n and row["s_total"] == s
    d = {k: v * n - s for k, v in cnt.items()}
    num = den = pairs = 0
    for (x, y), dv in d.items():
        den += dv * dv
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in d:
                pairs += 1
                num += (dv - d[nb]) ** 2
    assert row["n_pairs"] == pairs
    assert row["num_scaled"] == 2 * num
    assert row["den_scaled"] == den
    c_direct = (n - 1) * (2 * num) / (2 * (2 * pairs) * den)
    assert abs(row["c_e10"] / 1e10 - c_direct) < 1e-9
    # Geary's C is nonnegative by construction
    assert row["c_e10"] >= 0


def test_gini_best_split_matches_brute_force(ray_session):
    row = statops.q_gini_best_split(SF).take_all()[0]
    df_ = _cust()
    v = _cents(df_.c_acctbal)
    pos = (df_.c_mktsegment == statops.SEG_A).to_numpy().astype(np.int64)
    order = np.argsort(v, kind="stable")
    vs, ps = v[order], pos[order]
    uniq, idx = np.unique(vs, return_index=True)
    n, p = len(vs), int(ps.sum())
    assert row["n"] == n and row["pos"] == p
    best = (None, None)
    csum = np.cumsum(ps)
    for k, val in enumerate(uniq[:-1]):
        nl = int(idx[k + 1])
        pl = int(csum[nl - 1])
        nr, pr = n - nl, p - pl
        gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1.0 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        w = nl / n * gl + nr / n * gr
        if best[0] is None or w < best[0] - 1e-12:
            best = (w, int(val), nl, pl)
    assert row["split_v"] == best[1]
    assert row["nl"] == best[2] and row["pl"] == best[3]
    assert abs(row["gini_e10"] / 1e10 - best[0]) < 1e-8
    # splitting can never increase weighted Gini (concavity)
    assert row["gini_e10"] <= row["parent_gini_e10"]
    # both children must be non-empty
    assert 0 < row["nl"] < row["n"]


def test_poisson_bootstrap_matches_direct(ray_session):
    rows = {r["r"]: r for r in statops.q_poisson_bootstrap_means(SF).take_all()}
    assert sorted(rows) == list(range(1, statops.BOOT_R + 1))
    ord_ = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    key = ord_.column("o_orderkey").to_numpy(zero_copy_only=False)
    cents = _cents(ord_.column("o_totalprice").to_pandas())
    thr = np.asarray(statops._POIS_T, dtype=np.int64)
    n = len(key)
    plain_mean = cents.mean()
    for r in range(1, statops.BOOT_R + 1):
        u = ((key + 1) * (r + 1) * 2654435761) % 1000003
        w = np.searchsorted(thr, u, side="right")
        assert rows[r]["wsum"] == int(w.sum())
        assert rows[r]["wxsum"] == int((w * cents).sum())
        # Poisson(1) replicate size concentrates around n
        assert abs(rows[r]["wsum"] - n) < 6 * math.sqrt(n)
        # each replicate mean stays within a few sd of the corpus mean
        sd = cents.std() / math.sqrt(n)
        assert abs(rows[r]["mean_e8"] / 1e8 - plain_mean) < 8 * sd
        # exact half-up rounding of the integer ratio
        a, b = rows[r]["wxsum"], rows[r]["wsum"]
        assert rows[r]["mean_e8"] == (2 * a * 10**8 + b) // (2 * b)


def test_ols_matches_lstsq(ray_session):
    row = statops.q_ols_normal_equations(SF).take_all()[0]
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    ).to_pandas()
    q = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    d = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    y = _cents(li.l_extendedprice)
    X = np.column_stack([np.ones(len(q)), q, d]).astype(np.float64)
    beta, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)
    got = np.array([row["beta0_e8"], row["beta1_e8"], row["beta2_e8"]]) / 1e8
    assert np.allclose(got, beta, rtol=1e-6, atol=1e-4)
    # exact sufficient statistics
    assert row["n"] == len(q) and row["s1"] == int(q.sum())
    assert row["s1y"] == int((q * y).sum())
    # normal equations: X'(y - X beta) == 0 up to the e8 rounding
    resid = y - X @ got
    assert np.all(np.abs(X.T @ resid) / max(1.0, np.abs(X.T @ y).max()) < 1e-9)


def test_seasonal_residuals_match_brute_force(ray_session):
    df = statops.q_seasonal_residual_outliers(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"])
    hrs = ev.column("ts").cast("int64").to_numpy() // statops.US_PER_HOUR
    counts = pd.Series(hrs).value_counts().sort_index()
    assert len(df) == len(counts)
    df = df.sort_values("hr", ignore_index=True)
    assert (df.n.to_numpy() == counts.to_numpy()).all()
    hod = counts.index.to_numpy() % 24
    means = pd.DataFrame({"h": hod, "n": counts.to_numpy()}).groupby("h").n.mean()
    resid = counts.to_numpy() - means.reindex(hod).to_numpy()
    assert np.allclose(df.resid_e8.to_numpy() / 1e8, resid, atol=1e-7)
    # per-slot residuals sum to ~0 (mean removal), and the flag equals
    # the float 2-sigma rule computed directly
    for h in range(24):
        assert abs(resid[hod == h].sum()) < 1e-6
    sigma = np.sqrt((resid ** 2).mean())
    want_flag = (np.abs(resid) > 2 * sigma).astype(int)
    # e8 rounding can flip only exact-boundary cases; fixture has none
    assert (df.is_outlier.to_numpy() == want_flag).all()
    assert 0 < df.is_outlier.sum() < len(df) / 4


def test_event_type_fano_matches_brute_force(ray_session):
    rows = {r["event_type"]: r for r in statops.q_event_type_fano(SF).take_all()}
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    hrs = (ev.ts.astype("int64") // statops.US_PER_HOUR).to_numpy()
    span = int(hrs.max() - hrs.min() + 1)
    for et, g in ev.assign(h=hrs).groupby("event_type"):
        counts = np.bincount(g.h.to_numpy() - hrs.min(), minlength=span)
        assert len(counts) == span
        r = rows[et]
        assert r["n_hours"] == span
        assert r["n_events"] == int(counts.sum())
        assert r["sum_sq"] == int((counts.astype(np.int64) ** 2).sum())
        fano = counts.var() / counts.mean()  # population var over dense spine
        assert abs(r["fano_e8"] / 1e8 - fano) < 1e-6
        assert r["fano_e8"] > 0
    assert set(rows) == set(ev.event_type.unique())


def test_dp_noisy_counts_mechanism(ray_session):
    rows = {r["c_mktsegment"]: r for r in statops.q_dp_noisy_counts(SF).take_all()}
    df_ = _cust()
    true_counts = df_.c_mktsegment.value_counts()
    assert set(rows) == set(statops.DP_SEGMENTS)
    for k, seg in enumerate(statops.DP_SEGMENTS, start=1):
        r = rows[seg]
        assert r["true_n"] == int(true_counts.get(seg, 0))
        u = float((k * 2654435761) % 1000003) / 1000003.0
        d = u - 0.5
        mag = -statops.DP_B * math.log(1.0 - 2.0 * abs(d))
        noise = -mag if d < 0 else mag
        assert r["noisy_e8"] == int(np.round((r["true_n"] + noise) * 1e8))
        # Laplace(b) noise magnitude is b·ln(1/(2·tail)) — with b=20 the
        # seeded draws must stay within a sane envelope and be nonzero
        assert 0 < abs(noise) < 10 * statops.DP_B
    # the mechanism must not systematically inflate: mixed signs
    signs = {np.sign(rows[s]["noisy_e8"] / 1e8 - rows[s]["true_n"])
             for s in rows}
    assert signs == {-1.0, 1.0}


def test_metro_midpoints_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_metro_midpoints
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    out = {r["metro"]: r for r in q_metro_midpoints(SF).take_all()}
    n_docs = 500
    ids = np.arange(n_docs, dtype=np.int64)
    lat, lon, hg = derive_geo(ids)
    mega = (ids % 10 < 3) & hg
    for m in np.unique(ids[mega] % 5):
        sel = mega & (ids % 5 == m)
        phi, lam = np.radians(lat[sel]), np.radians(lon[sel])
        x = np.round(np.cos(phi) * np.cos(lam) * 1e10).astype(np.int64)
        y = np.round(np.cos(phi) * np.sin(lam) * 1e10).astype(np.int64)
        z = np.round(np.sin(phi) * 1e10).astype(np.int64)
        r = out[m]
        assert r["n_points"] == int(sel.sum())
        assert r["sx_e10"] == int(x.sum())
        assert r["sy_e10"] == int(y.sum())
        assert r["sz_e10"] == int(z.sum())
        # midpoint must land inside the city's point cloud bbox (the
        # cluster is ±0.1°, far from any wraparound)
        assert lat[sel].min() - 1e-6 <= r["mid_lat_e8"] / 1e8 <= lat[sel].max() + 1e-6
        assert lon[sel].min() - 1e-6 <= r["mid_lon_e8"] / 1e8 <= lon[sel].max() + 1e-6


def test_forecast_baseline_eval_bruteforce(ray_session):
    row = statops.q_forecast_baseline_eval(SF).take_all()[0]
    _, c = _spine()
    y = c.astype(np.int64)
    n_eval = len(y) - 24
    e1 = int(np.abs(y[24:] - y[23:-1]).sum())
    e24 = int(np.abs(y[24:] - y[:-24]).sum())
    assert row["n_evals"] == n_eval
    assert row["abs_err_naive"] == e1
    assert row["abs_err_seasonal"] == e24
    assert row["mae_naive_e8"] == (2 * e1 * 10**8 + n_eval) // (2 * n_eval)
    assert row["seasonal_wins"] == int(e24 < e1)
    # a persistence forecast of a positive series has MAE below 2x mean
    assert row["mae_naive_e8"] / 1e8 < 2 * y.mean()


def test_type_crosscorr_matches_numpy(ray_session):
    rows = {r["lag"]: r for r in statops.q_type_crosscorr(SF).take_all()}
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["h"] = ev.ts.astype("int64") // statops.US_PER_HOUR
    sub = ev[ev.event_type.isin([statops.CCF_A, statops.CCF_B])]
    lo, hi = sub.h.min(), sub.h.max()
    span = hi - lo + 1
    a = np.bincount(sub[sub.event_type == statops.CCF_A].h - lo,
                    minlength=span).astype(np.float64)
    b = np.bincount(sub[sub.event_type == statops.CCF_B].h - lo,
                    minlength=span).astype(np.float64)
    da, db = a - a.mean(), b - b.mean()
    den = np.sqrt((da ** 2).sum() * (db ** 2).sum())
    for k in statops.CCF_LAGS:
        if k >= 0:
            r_direct = (da[: span - k] * db[k:]).sum() / den
        else:
            r_direct = (da[-k:] * db[: span + k]).sum() / den
        assert abs(rows[k]["r_e10"] / 1e10 - r_direct) < 1e-9
        assert abs(rows[k]["r_e10"]) <= 10**10
        assert rows[k]["n_hours"] == span
    # symmetry sanity: r(0) equals the plain Pearson of the two series
    pearson = np.corrcoef(a, b)[0, 1]
    assert abs(rows[0]["r_e10"] / 1e10 - pearson) < 1e-9


def test_bootstrap_mean_diff_bruteforce(ray_session):
    rows = {r["r"]: r for r in statops.q_bootstrap_mean_diff(SF).take_all()}
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pandas()
    did = docs.doc_id.to_numpy()
    grp = np.array([0 if int(s[3:]) < 10 else 1 for s in docs.source])
    nc = docs.n_chars.to_numpy()
    thr = np.asarray(statops._POIS_T, dtype=np.int64)
    obs_diff = nc[grp == 0].mean() - nc[grp == 1].mean()
    diffs = []
    for r in range(1, statops.BOOT_R + 1):
        u = ((did + 1) * (r + 1) * 2654435761) % 1000003
        w = np.searchsorted(thr, u, side="right")
        a = grp == 0
        wa, xa = int(w[a].sum()), int((w[a] * nc[a]).sum())
        wb, xb = int(w[~a].sum()), int((w[~a] * nc[~a]).sum())
        rr = rows[r]
        assert (rr["wa"], rr["xa"], rr["wb"], rr["xb"]) == (wa, xa, wb, xb)
        num = xa * wb - xb * wa
        den = wa * wb
        assert rr["diff_e8"] == (2 * num * 10**8 + den) // (2 * den)
        diffs.append(rr["diff_e8"] / 1e8)
    # replicate diffs must bracket the observed diff (resampling noise
    # is centered on it)
    assert min(diffs) - 5 < obs_diff < max(diffs) + 5
