"""Fourth round-5 session operators: brute-force / property tests.

Each operator added this session gets (a) a brute-force or closed-form
semantic check at sf0.001 and (b) where the op has a size-gated plan, a
plan-equality assertion (forced alternate plan == default plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _undirected_edges(n: int) -> set[tuple[int, int]]:
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    return edges


def test_clustering_coefficients_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_clustering_coefficients,
    )

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = _undirected_edges(n)
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = (
        q_clustering_coefficients(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every deg>=2 node appears, including tri==0 ones
    want_nodes = sorted(v for v, s in adj.items() if len(s) >= 2)
    assert out.doc_id.tolist() == want_nodes
    for _, row in out.iterrows():
        nbrs = adj[row.doc_id]
        deg = len(nbrs)
        tri = 0
        for x in nbrs:
            for y in nbrs:
                if x < y and (x, y) in edges:
                    tri += 1
        assert row.deg == deg
        assert row.n_triangles == tri
        # bitwise: same IEEE expression
        assert row.cc == (2.0 * tri) / (deg * (deg - 1.0))
    # semantics, not just parity: cc bounded, and some node closes a wedge
    assert (out.cc >= 0).all() and (out.cc <= 1.0).all()
    assert (out.n_triangles > 0).any()


def test_clustering_coefficients_plans_agree(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_clustering_coefficients,
    )

    a = (
        q_clustering_coefficients(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_clustering_coefficients(SF, deg_broadcast_limit=0)  # join plan
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def _hits_bruteforce(n: int) -> tuple[dict, dict]:
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((i, t))
    a1: dict[int, int] = {}
    for _, v in edges:
        a1[v] = a1.get(v, 0) + 1
    h1: dict[int, int] = {}
    for u, v in edges:
        h1[u] = h1.get(u, 0) + a1.get(v, 0)
    a2: dict[int, int] = {}
    for u, v in edges:
        a2[v] = a2.get(v, 0) + h1.get(u, 0)
    h2: dict[int, int] = {}
    for u, v in edges:
        h2[u] = h2.get(u, 0) + a2.get(v, 0)
    return a2, h2


def test_hits_2iter_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_hits_2iter

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    auth, hub = _hits_bruteforce(n)
    out = q_hits_2iter(SF).to_pandas().sort_values("doc_id")
    assert len(out) == n
    got_a = dict(zip(out.doc_id.tolist(), out.auth.tolist()))
    got_h = dict(zip(out.doc_id.tolist(), out.hub.tolist()))
    for v in range(n):
        assert got_a[v] == auth.get(v, 0)
        assert got_h[v] == hub.get(v, 0)
    # semantics: the i%2 sinks (nodes 0/1) must dominate authority
    top2 = set(out.nlargest(2, "auth").doc_id.tolist())
    assert top2 == {0, 1}


def test_hits_2iter_plans_agree(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_hits_2iter

    a = (
        q_hits_2iter(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_hits_2iter(SF, broadcast_limit=0)  # force the join plan
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def _dbscan_bruteforce(eps: float, minpts: int):
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    ids = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    ids = np.sort(ids)
    lat, lon, has = derive_geo(ids)
    ids, lat, lon = ids[has], lat[has], lon[has]
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    nbr = (d2 <= eps * eps) & ~np.eye(len(ids), dtype=bool)
    n_nbrs = nbr.sum(axis=1)
    is_core = n_nbrs >= minpts
    # union-find over core-core eps edges
    parent = {int(v): int(v) for v in ids[is_core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.where(is_core)[0]
    for i in ci:
        for j in ci:
            if j > i and nbr[i, j]:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # union-toward-min keeps each root the component minimum
    label = {v: find(v) for v in parent}
    out = {}
    for i, v in enumerate(ids):
        v = int(v)
        if is_core[i]:
            out[v] = (int(n_nbrs[i]), "core", label[v])
        else:
            core_nbr_labels = [
                label[int(ids[j])] for j in np.where(nbr[i])[0] if is_core[j]
            ]
            if core_nbr_labels:
                out[v] = (int(n_nbrs[i]), "border", min(core_nbr_labels))
            else:
                out[v] = (int(n_nbrs[i]), "noise", -1)
    return out


def test_dbscan_clusters_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        DBSCAN_EPS,
        DBSCAN_MINPTS,
        q_dbscan_clusters,
    )

    want = _dbscan_bruteforce(DBSCAN_EPS, DBSCAN_MINPTS)
    out = q_dbscan_clusters(SF).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_neighbors), r.role, int(r.cluster_id))
        for r in out.itertuples()
    }
    assert got == want
    roles = set(out.role)
    # semantics: the fixture populates all three classes, labels are
    # component minima, and every cluster label belongs to a core point
    assert roles == {"core", "border", "noise"}
    core_ids = set(out[out.role == "core"].doc_id)
    labs = set(out[out.cluster_id >= 0].cluster_id)
    assert labs <= core_ids
    assert (out[out.role == "noise"].cluster_id == -1).all()


def test_dbscan_clusters_plans_agree(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_dbscan_clusters

    a = (
        q_dbscan_clusters(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_dbscan_clusters(SF, broadcast_limit=0)  # force the join plans
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_colocation_participation_bruteforce(ray_session):
    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_colocation_participation,
    )
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    ids = tbl["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    langs = np.asarray(tbl["lang"].to_pylist())[order]
    lat, lon, has = derive_geo(ids)
    ids, langs, lat, lon = ids[has], langs[has], lat[has], lon[has]
    tx, ty = latlng_to_tile(lat, lon, 12)
    cells: dict[tuple, dict] = {}
    for x, y, lg in zip(tx, ty, langs):
        cells.setdefault((int(x), int(y)), {}).setdefault(lg, 0)
        cells[(int(x), int(y))][lg] += 1
    total = {lg: int((langs == lg).sum()) for lg in set(langs)}
    want = {}
    for counts in cells.values():
        present = set(counts)
        for a in present:
            for b in present:
                if a != b:
                    want[(a, b)] = want.get((a, b), 0) + counts[a]
    out = q_colocation_participation(SF).to_pandas()
    got = {
        (r.lang_a, r.lang_b): (int(r.n_coloc), int(r.n_total))
        for r in out.itertuples()
    }
    assert got == {k: (v, total[k[0]]) for k, v in want.items()}
    # semantics: ratios in (0, 1], and the bitwise division contract
    for r in out.itertuples():
        assert 0 < r.participation <= 1.0
        assert r.participation == r.n_coloc / (1.0 * r.n_total)


def test_trajectory_chord_deviation_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_trajectory_chord_deviation,
    )

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    ev["lat"] = ((ev.event_id * 7919) % 1600001) / 10000.0 - 80.0
    ev["lon"] = ((ev.event_id * 104729) % 3600001) / 10000.0 - 180.0
    want = {}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        if len(g) < 3:
            continue
        lat, lon = g.lat.to_numpy(), g.lon.to_numpy()
        eid = g.event_id.to_numpy()
        cross = (lon[-1] - lon[0]) * (lat[0] - lat) - (lon[0] - lon) * (
            lat[-1] - lat[0]
        )
        dev = np.round(np.abs(cross) * 1e10).astype(np.int64)
        best, bdev = None, -1
        for i in range(1, len(g) - 1):
            if dev[i] > bdev or (dev[i] == bdev and eid[i] < best):
                best, bdev = int(eid[i]), int(dev[i])
        want[int(uid)] = (len(g), best, bdev)
    out = q_trajectory_chord_deviation(SF).to_pandas()
    got = {
        int(r.user_id): (int(r.n_points), int(r.split_event_id), int(r.dev_e10))
        for r in out.itertuples()
    }
    assert got == want
    assert len(want) > 0
    # semantics: the winner is a real event of the user and its
    # deviation dominates every interior point (checked by construction
    # above), and only >=3-point users appear
    assert (out.n_points >= 3).all()


def test_doc_cooccurrence_bruteforce(ray_session):
    import re

    from wikipedia_wikidata_ray.pipelines.corpusops import (
        COOC_MIN_LEN,
        q_doc_cooccurrence,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want: dict[tuple, int] = {}
    for tx in texts:
        toks = sorted(
            {
                w
                for w in re.findall("[a-z0-9]+", tx.lower())
                if len(w) >= COOC_MIN_LEN
            }
        )
        for i in range(len(toks)):
            for j in range(i + 1, len(toks)):
                want[(toks[i], toks[j])] = want.get((toks[i], toks[j]), 0) + 1
    out = q_doc_cooccurrence(SF).to_pandas()
    got = {(r.w1, r.w2): int(r.n_docs) for r in out.itertuples()}
    assert got == want
    # semantics: symmetric-pair canonical order and df upper bound
    assert (out.w1 < out.w2).all()
    assert out.n_docs.max() <= len(texts)
    assert len(out) > 0


def test_interarrival_stats_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_interarrival_stats,
    )

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    want = {}
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        if len(g) < 2:
            continue
        us = g.ts.astype("int64").to_numpy()
        gaps = (us[1:] - us[:-1]) // 1_000_000
        want[int(uid)] = (
            len(gaps),
            int(gaps.sum()),
            int((gaps * gaps).sum()),
            int(gaps.min()),
            int(gaps.max()),
        )
    out = q_interarrival_stats(SF).to_pandas()
    got = {
        int(r.user_id): (
            int(r.n_gaps),
            int(r.sum_gap_s),
            int(r.sum_gap_sq),
            int(r.min_gap_s),
            int(r.max_gap_s),
        )
        for r in out.itertuples()
    }
    assert got == want and len(want) > 0
    # semantics: Cauchy–Schwarz — n·Σx² ≥ (Σx)² for every user
    for n, s, sq, mn, mx in want.values():
        assert n * sq >= s * s and mn <= mx


def test_link_reciprocity_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_link_reciprocity

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    dedges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                dedges.add((i, t))
    want = {}
    for s, t in dedges:
        od, nr = want.get(s, (0, 0))
        want[s] = (od + 1, nr + (1 if (t, s) in dedges else 0))
    out = q_link_reciprocity(SF).to_pandas()
    got = {
        int(r.doc_id): (int(r.outdeg), int(r.n_recip))
        for r in out.itertuples()
    }
    assert got == want
    for r in out.itertuples():
        assert 0 <= r.reciprocity <= 1.0
        assert r.reciprocity == r.n_recip / (1.0 * r.outdeg)
    # semantics: some but not all edges are reciprocated in this graph
    assert out.n_recip.sum() > 0
    assert out.n_recip.sum() < out.outdeg.sum()


def test_kmeans_silhouette_bruteforce(ray_session):
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.ann import _as_matrix
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        kmeans_fit_centroids,
        q_kmeans_silhouette,
    )

    emb = rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    tbl = emb.to_pandas()
    c = kmeans_fit_centroids(emb)
    out = (
        q_kmeans_silhouette(SF)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    import pyarrow as pa

    x = _as_matrix(
        pa.chunked_array([pa.array(tbl.embedding.tolist())])
    ).astype(np.float64)
    vec_ids = tbl.vec_id.to_numpy()
    for i in range(0, len(vec_ids), 17):  # sampled brute force
        d2 = np.round((x[i][None] - c) ** 2 * 1e10).astype(np.int64).sum(
            axis=1
        )
        srt = np.sort(d2)
        a2, b2 = int(srt[0]), int(srt[1])
        row = out.loc[vec_ids[i]]
        assert int(row.a2_e10) == a2 and int(row.b2_e10) == b2
        assert int(row.cluster) == int(d2.argmin())
        a, b = np.sqrt(a2), np.sqrt(b2)
        den = max(a, b)
        want_s = 0.0 if den == 0 else (b - a) / den
        assert row.silhouette == want_s
    # semantics: silhouette bounded, a2 <= b2 everywhere, clusters used
    assert (out.a2_e10 <= out.b2_e10).all()
    assert ((out.silhouette >= 0) & (out.silhouette <= 1)).all()
    assert out.cluster.nunique() > 1


def test_cluster_extents_bruteforce(ray_session):
    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.queries import q_cluster_extents
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    ids = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    lat, lon, has = derive_geo(np.sort(ids))
    tx, ty = latlng_to_tile(lat[has], lon[has], 12)
    tiles = sorted({(int(x), int(y)) for x, y in zip(tx, ty)})
    # union-find over 8-connected occupied tiles (min-label roots)
    idx = {t: i for i, t in enumerate(tiles)}
    node = {t: t[0] * 8192 + t[1] + 1 for t in tiles}
    parent = {node[t]: node[t] for t in tiles}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for x, y in tiles:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb in idx and nb != (x, y):
                    ra, rb = find(node[(x, y)]), find(node[nb])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    want: dict[int, list] = {}
    for t in tiles:
        lab = find(node[t])
        x, y = t
        e = want.setdefault(
            lab, [x, x, y, y, x + y, x + y, x - y, x - y]
        )
        e[0] = min(e[0], x); e[1] = max(e[1], x)
        e[2] = min(e[2], y); e[3] = max(e[3], y)
        e[4] = min(e[4], x + y); e[5] = max(e[5], x + y)
        e[6] = min(e[6], x - y); e[7] = max(e[7], x - y)
    out = q_cluster_extents(SF).to_pandas()
    got = {
        int(r.cluster_id): [
            int(r.min_x), int(r.max_x), int(r.min_y), int(r.max_y),
            int(r.min_xpy), int(r.max_xpy), int(r.min_xmy), int(r.max_xmy),
        ]
        for r in out.itertuples()
    }
    assert got == want
    # semantics: the diagonal supports must lie within the bbox corners
    for e in got.values():
        assert e[0] + e[2] <= e[4] <= e[5] <= e[1] + e[3]
        assert e[0] - e[3] <= e[6] <= e[7] <= e[1] - e[2]


def test_two_hop_hll_estimates_accurate(ray_session):
    from wikipedia_wikidata_ray.ops.sketch import dense_registers, hll_estimate
    from wikipedia_wikidata_ray.pipelines.queries import q_two_hop_hll

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = _undirected_edges(n)
    adj: dict[int, set] = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    true2 = {}
    for v in range(n):
        s = {v} | adj[v]
        for u in adj[v]:
            s |= {u} | adj[u]
        true2[v] = len(s)
    out = q_two_hop_hll(SF).to_pandas()
    assert set(out.doc_id) == set(range(n))
    errs = []
    for v, g in out.groupby("doc_id"):
        regs = dense_registers(
            g.bucket.to_numpy().astype(np.int64),
            g.rho.to_numpy().astype(np.int64),
        )
        est = hll_estimate(regs)
        errs.append(abs(est - true2[int(v)]) / true2[int(v)])
    errs = np.asarray(errs)
    # p=12 → ~1.6% std error; every fixture set is in the linear-counting
    # regime or small-cardinality band, so demand tight accuracy overall
    assert np.median(errs) < 0.05
    assert errs.max() < 0.25


def test_zipf_slope_stats_bruteforce(ray_session):
    import re
    from collections import Counter

    from wikipedia_wikidata_ray.pipelines.corpusops import (
        ZIPF_K,
        q_zipf_slope_stats,
    )

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    cnt = Counter()
    for tx in texts:
        cnt.update(re.findall("[a-z0-9]+", tx.lower()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_K]
    lr = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    lc = np.log(np.array([c for _, c in top], dtype=np.float64))
    e10 = 1e10
    out = q_zipf_slope_stats(SF).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r.n) == len(top)
    assert int(r.sx_e10) == int(np.round(lr * e10).astype(np.int64).sum())
    assert int(r.sy_e10) == int(np.round(lc * e10).astype(np.int64).sum())
    assert int(r.sxy_e10) == int(
        np.round(lr * lc * e10).astype(np.int64).sum()
    )
    assert int(r.sxx_e10) == int(
        np.round(lr * lr * e10).astype(np.int64).sum()
    )
    # semantics: the derived Zipf slope must be NEGATIVE (frequency
    # falls with rank) — catches inverted-rank bugs the parity can't
    n = r.n
    slope = (n * r.sxy_e10 / 1e10 - (r.sx_e10 / 1e10) * (r.sy_e10 / 1e10) / 1) / (
        n * r.sxx_e10 / 1e10 - (r.sx_e10 / 1e10) ** 2 / 1
    )
    assert slope < 0


def test_event_value_correlation_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_event_value_correlation,
    )

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
    ).to_pandas()
    ev["v"] = np.round(ev.value.to_numpy() * 100.0).astype(np.int64)
    t = ev.groupby(["user_id", "event_type"]).v.sum().reset_index()
    g_sx = t.groupby("event_type").v.sum().to_dict()
    g_sxx = t.assign(v2=t.v * t.v).groupby("event_type").v2.sum().to_dict()
    n_users = ev.user_id.nunique()
    want = {}
    piv = t.pivot(index="user_id", columns="event_type", values="v")
    types = sorted(piv.columns)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            mask = piv[a].notna() & piv[b].notna()
            if mask.any():
                want[(a, b)] = int(
                    (piv.loc[mask, a] * piv.loc[mask, b]).sum()
                )
    out = q_event_value_correlation(SF).to_pandas()
    got = {(r.type_a, r.type_b): int(r.sxy) for r in out.itertuples()}
    assert got == want
    for r in out.itertuples():
        assert int(r.n_users) == n_users
        assert int(r.sx) == g_sx[r.type_a] and int(r.sy) == g_sx[r.type_b]
        assert int(r.sxx) == g_sxx[r.type_a] and int(r.syy) == g_sxx[r.type_b]
        # semantics: Cauchy–Schwarz on the centered moments of the
        # zero-imputed joint sample (python ints — the squares overflow
        # int64)
        n, sx, sy = int(r.n_users), int(r.sx), int(r.sy)
        sxy, sxx, syy = int(r.sxy), int(r.sxx), int(r.syy)
        cxy = n * sxy - sx * sy
        cxx = n * sxx - sx * sx
        cyy = n * syy - sy * sy
        assert cxx >= 0 and cyy >= 0
        assert cxy * cxy <= cxx * cyy
