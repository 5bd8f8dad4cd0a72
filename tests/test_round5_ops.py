"""Round-5 operator tests: seeded langid twin (verdict #1) et al."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _brute_langid(text: str, profiles: dict[str, dict[str, int]]):
    """Per-row reference scorer: normalized trigram weighted sum with
    multiplicity; argmax ties break to the lexicographically smallest
    language (the SQL ROW_NUMBER ORDER BY score DESC, lang semantics)."""
    s = " " + re.sub(r"[ \t\n\r\f\v]+", " ", text.lower()) + " "
    scores = {}
    for lang, prof in profiles.items():
        scores[lang] = sum(prof.get(s[i : i + 3], 0) for i in range(len(s) - 2))
    best = min(sorted(scores), key=lambda l: (-scores[l], l))
    return best, scores[best]


def test_langid_seeded_matches_bruteforce():
    from wikipedia_wikidata_ray.ops.textstats import LangIdSeeded
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        _LANGID_SEED_PROFILES,
    )

    texts = [
        "join the table and filter the group",
        "sort scan hash merge window",
        "batch stream query",
        "",          # no grams beyond padding
        "a",         # 3-char normalized ' a '
        "   \t  ",   # whitespace-only collapses to spaces
        "zzz qqq unmatched grams only",
        "table table table join join",  # repeated grams → multiplicity
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = LangIdSeeded(_LANGID_SEED_PROFILES)(t)
    want = [_brute_langid(x, _LANGID_SEED_PROFILES) for x in texts]
    assert out.column("pred_lang").to_pylist() == [w[0] for w in want]
    assert out.column("score").to_pylist() == [w[1] for w in want]
    # zero-hit rows tie at 0 across all languages → lex-smallest ('de')
    assert out.column("pred_lang")[3].as_py() == "de"
    # determinism: identical rerun
    out2 = LangIdSeeded(_LANGID_SEED_PROFILES)(t)
    assert out.equals(out2)


def test_compact_cover_single_pass_equals_leveled(ray_session):
    """The round-5 single-pass compact cover (one sorted_group_apply on
    the z6 ancestor) must be row-identical to the round-4 per-level
    barrier implementation it replaced (plan-equality contract)."""
    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        compact_cover_pipeline,
        compact_cover_pipeline_leveled,
    )

    sf = "/root/testdata/sf0.001"
    a = compact_cover_pipeline(_geotagged(sf)).to_pandas()
    b = compact_cover_pipeline_leveled(_geotagged(sf)).to_pandas()
    key = ["zoom", "tile_x", "tile_y"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)
    assert len(a) > 0


def _geo_tiles(sf):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    ids = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
        .astype(np.int64)
    )
    ids = np.sort(ids)
    lat, lon, has = derive_geo(ids)
    tx, ty = latlng_to_tile(lat[has], lon[has], 12)
    return ids[has], tx.astype(np.int64), ty.astype(np.int64)


def test_tile_time_bins_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        TIME_BIN_S,
        WARC_EPOCH_S,
        q_tile_time_bins,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_time_bins(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    import collections

    want = collections.Counter(
        zip(tx.tolist(), ty.tolist(), ((WARC_EPOCH_S + ids) // TIME_BIN_S).tolist())
    )
    got = {
        (r.tile_x, r.tile_y, r.t_bucket): r.n_pages for r in out.itertuples()
    }
    assert got == dict(want)
    assert out["n_pages"].sum() == len(ids)
    assert out["t_bucket"].nunique() > 1  # the time axis is non-degenerate


def test_tile_first_seen_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        WARC_EPOCH_S,
        q_tile_first_seen,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_first_seen(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    best: dict[tuple, tuple] = {}
    for i, x, y in zip(ids.tolist(), tx.tolist(), ty.tolist()):
        k = (x, y)
        v = (WARC_EPOCH_S + i, i)  # ts strictly increases with doc_id
        if k not in best or v < best[k]:
            best[k] = v
    assert len(out) == len(best)
    for r in out.itertuples():
        assert best[(r.tile_x, r.tile_y)] == (r.first_ts_s, r.doc_id)


def test_tile_sample_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        SAMPLE_HASH_MOD,
        SAMPLE_HASH_MULT,
        SAMPLE_K,
        q_tile_sample,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_sample(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    import collections

    per_tile = collections.defaultdict(list)
    for i, x, y in zip(ids.tolist(), tx.tolist(), ty.tolist()):
        per_tile[(x, y)].append(((i * SAMPLE_HASH_MULT) % SAMPLE_HASH_MOD, i))
    want = set()
    for k, rows in per_tile.items():
        for h, i in sorted(rows)[:SAMPLE_K]:
            want.add((k[0], k[1], h, i))
    got = set(
        zip(out["tile_x"], out["tile_y"], out["samp_h"], out["doc_id"])
    )
    assert got == want
    # determinism across reruns
    out2 = q_tile_sample(sf).to_pandas()
    assert set(zip(out2["tile_x"], out2["tile_y"], out2["doc_id"])) == {
        (a, b, d) for a, b, _, d in want
    }


def test_tile_embedding_centroids_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        EMB_SCALE,
        q_tile_embedding_centroids,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_embedding_centroids(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    tile_of = dict(zip(ids.tolist(), zip(tx.tolist(), ty.tolist())))
    et = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = et["vec_id"].to_numpy()
    mat = np.array(et["embedding"].to_pylist(), dtype=np.float64)
    want: dict[tuple, np.ndarray] = {}
    for v, row in zip(vid.tolist(), mat):
        if v in tile_of:
            k = tile_of[v]
            want[k] = want.get(k, 0) + np.trunc(row * EMB_SCALE).astype(np.int64)
    assert len(out) == len(want) * mat.shape[1]
    for r in out.itertuples():
        assert want[(r.tile_x, r.tile_y)][r.dim - 1] == r.sum_e6


def test_langid_seeded_shares_langid_packing():
    """The twin must score through the SAME gram-packing kernel LangId's
    vectorized path uses (machinery parity, not a reimplementation)."""
    from wikipedia_wikidata_ray.ops.textstats import (
        LangIdSeeded,
        packed_char_gram_arrays,
    )

    prof = {"aa": {" ab": 3, "abc": 2}, "bb": {"xyz": 9}}
    li = LangIdSeeded(prof)
    codes = packed_char_gram_arrays(pa.array([" ab", "abc", "xyz"]))
    assert sorted(li._vec[0][0].tolist()) == sorted(
        [codes[0][0], codes[1][0]]
    )
    assert li._vec[1][0].tolist() == [codes[2][0]]


def test_tile_od_matrix_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_tile_od_matrix,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_od_matrix(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    rows = sorted(
        zip(
            ev["user_id"].to_numpy().tolist(),
            ev["ts"].to_numpy().tolist(),
            eid.tolist(),
            tx.tolist(),
            ty.tolist(),
        )
    )
    want: dict[tuple, int] = {}
    for (u0, _, _, fx, fy), (u1, _, _, gx, gy) in zip(rows, rows[1:]):
        if u0 == u1:
            k = (fx, fy, gx, gy)
            want[k] = want.get(k, 0) + 1
    got = {
        (r.from_x, r.from_y, r.to_x, r.to_y): r.n_trans
        for r in out.itertuples()
    }
    assert got == want
    assert out["n_trans"].sum() == sum(want.values())


def test_tile_lang_entropy_matches_bruteforce(ray_session):
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_tile_lang_entropy

    sf = "/root/testdata/sf0.001"
    out = q_tile_lang_entropy(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    dt = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    lang_of = dict(zip(dt["doc_id"].to_numpy().tolist(), dt["lang"].to_pylist()))
    cnt: dict[tuple, dict[str, int]] = {}
    for i, x, y in zip(ids.tolist(), tx.tolist(), ty.tolist()):
        cnt.setdefault((x, y), {}).setdefault(lang_of[i], 0)
        cnt[(x, y)][lang_of[i]] += 1
    assert len(out) == len(cnt)
    for r in out.itertuples():
        langs = cnt[(r.tile_x, r.tile_y)]
        tot = sum(langs.values())
        want = sum(
            round(-(c / tot) * math.log(c / tot) * 1e10) for c in langs.values()
        )
        assert r.n_langs == len(langs)
        assert r.entropy_e10 == want
        # single-language tiles have exactly zero entropy
        if len(langs) == 1:
            assert r.entropy_e10 == 0


def test_spatial_joincount_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_spatial_joincount

    sf = "/root/testdata/sf0.001"
    out = q_spatial_joincount(sf).to_pandas()
    _, tx, ty = _geo_tiles(sf)
    cnt: dict[tuple, int] = {}
    for x, y in zip(tx.tolist(), ty.tolist()):
        cnt[(x, y)] = cnt.get((x, y), 0) + 1
    n_pairs = prod = 0
    for (x, y), c in cnt.items():
        for nx, ny in ((x + 1, y), (x, y + 1)):
            if (nx, ny) in cnt:
                n_pairs += 1
                prod += c * cnt[(nx, ny)]
    assert len(out) == 1
    assert out["n_pairs"][0] == n_pairs
    assert out["sum_prod"][0] == prod


def test_tile_top_terms_plan_equality_and_invariants(ray_session):
    """Gated attach_df contract: the forced >limit hash-join plan must be
    row-identical to the broadcast plan; ranks are 1..k per tile with
    score-desc/token-asc ordering."""
    from wikipedia_wikidata_ray.pipelines.webtext import q_tile_top_terms

    sf = "/root/testdata/sf0.001"
    a = (
        q_tile_top_terms(sf)
        .to_pandas()
        .sort_values(["tile_x", "tile_y", "rank"])
        .reset_index(drop=True)
    )
    b = (
        q_tile_top_terms(sf, df_broadcast_limit=0)
        .to_pandas()
        .sort_values(["tile_x", "tile_y", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    for (_, _), grp in a.groupby(["tile_x", "tile_y"]):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        sc = list(zip(-grp["tfidf"], grp["token"]))
        assert sc == sorted(sc)


def test_tile_dup_stats_plan_equality_and_bruteforce(ray_session):
    """Broadcast vs forced >limit join plan must be row-identical; values
    match a brute-force per-tile dup count."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_tile_dup_stats

    sf = "/root/testdata/sf0.001"
    a = (
        q_tile_dup_stats(sf)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    b = (
        q_tile_dup_stats(sf, dup_broadcast_limit=0)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    assert a.equals(b)

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    ids, tx, ty = _geo_tiles(sf)
    dt = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(dt["doc_id"].to_numpy().tolist(), dt["text"].to_pylist()))
    n = len(text_of)
    # (text, tile) multiset = original geotagged pages + augmented copies
    pages: list[tuple[str, int, int]] = [
        (text_of[i], x, y)
        for i, x, y in zip(ids.tolist(), tx.tolist(), ty.tolist())
    ]
    cop_ids = np.array(sorted(i for i in text_of if i % 5 == 0), dtype=np.int64)
    lat2, lon2, has2 = derive_geo(cop_ids + n)
    cx, cy = latlng_to_tile(lat2[has2], lon2[has2], 12)
    pages += [
        (text_of[int(i)], int(x), int(y))
        for i, x, y in zip(cop_ids[has2], cx.tolist(), cy.tolist())
    ]
    freq: dict[str, int] = {}
    for txt, _, _ in pages:
        freq[txt] = freq.get(txt, 0) + 1
    want: dict[tuple, list[int]] = {}
    for txt, x, y in pages:
        st = want.setdefault((x, y), [0, 0])
        st[0] += 1
        st[1] += 1 if freq[txt] > 1 else 0
    got = {
        (r.tile_x, r.tile_y): [r.n_pages, r.n_dups] for r in a.itertuples()
    }
    assert got == want
    # the augmentation must actually exercise the dup branch
    assert sum(v[1] for v in want.values()) > 0


def test_tile_dwell_time_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_tile_dwell_time,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_dwell_time(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    rows = sorted(
        zip(
            ev["user_id"].to_numpy().tolist(),
            ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64).tolist(),
            eid.tolist(),
            tx.tolist(),
            ty.tolist(),
        )
    )
    want: dict[tuple, list[int]] = {}
    for (u0, t0, _, fx, fy), (u1, t1, _, _, _) in zip(rows, rows[1:]):
        if u0 == u1:
            st = want.setdefault((fx, fy), [0, 0])
            st[0] += t1 - t0
            st[1] += 1
    got = {
        (r.tile_x, r.tile_y): [r.dwell_us, r.n_stays] for r in out.itertuples()
    }
    assert got == want


def test_region_ann_topk_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        REGION_BBOX,
        q_region_ann_topk,
    )
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    sf = "/root/testdata/sf0.001"
    out = q_region_ann_topk(sf).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lat, lon, has = derive_geo(vid)
    tx, ty = latlng_to_tile(lat[has], lon[has], 12)
    x0, x1, y0, y1 = REGION_BBOX
    inb = (tx >= x0) & (tx <= x1) & (ty >= y0) & (ty <= y1)
    region_idx = np.flatnonzero(has)[inb]
    region_ids = set(vid[region_idx].tolist())
    assert len(region_ids) > 5  # the bbox must actually bound a candidate pool
    assert set(out["neighbor_id"]) <= region_ids

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for q in [int(vid[0]), int(vid[len(vid) // 2]), int(vid[-1])]:
        qi = int(np.flatnonzero(vid == q)[0])
        scores = sorted(
            (
                (-round(cos(mat[qi], mat[int(np.flatnonzero(vid == r)[0])]), 6), r)
                for r in region_ids
                if r != q
            ),
        )[:5]
        got = out[out["vec_id"] == q].sort_values("rank")
        assert list(got["neighbor_id"]) == [r for _, r in scores]


def test_tile_quality_stats_matches_bruteforce(ray_session):
    import re as _re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import STOPWORDS
    from wikipedia_wikidata_ray.pipelines.queries import q_tile_quality_stats

    sf = "/root/testdata/sf0.001"
    out = q_tile_quality_stats(sf).to_pandas()
    ids, tx, ty = _geo_tiles(sf)
    dt = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(dt["doc_id"].to_numpy().tolist(), dt["text"].to_pylist()))
    stop = set(STOPWORDS)
    tok = _re.compile("[a-z0-9]+")
    want: dict[tuple, list[int]] = {}
    for i, x, y in zip(ids.tolist(), tx.tolist(), ty.tolist()):
        txt = text_of[i]
        tks = tok.findall(txt.lower())
        st = want.setdefault((x, y), [0, 0, 0, 0])
        st[0] += 1
        st[1] += len(tks)
        st[2] += len(txt)
        st[3] += sum(1 for w in tks if w in stop)
    got = {
        (r.tile_x, r.tile_y): [r.n_pages, r.n_tokens, r.n_chars, r.n_stopwords]
        for r in out.itertuples()
    }
    assert got == want
    assert sum(v[3] for v in want.values()) > 0


def test_zone_event_counts_matches_bruteforce(ray_session):
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_zone_event_counts

    sf = "/root/testdata/sf0.001"
    out = q_zone_event_counts(sf).to_pandas()
    eid = pq.read_table(f"{sf}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    want: dict[object, int] = {}
    for la, lo in zip(lat.tolist(), lon.tolist()):
        code = (
            None
            if lo >= 180.0 or la >= 90.0
            else f"A{math.floor((la + 90.0) / 30.0)}_{math.floor((lo + 180.0) / 30.0)}"
        )
        want[code] = want.get(code, 0) + 1
    got = {
        (None if r.admin_code is None else r.admin_code): r.n_events
        for r in out.itertuples()
    }
    assert got == want
    assert sum(want.values()) == len(eid)


def test_tile_hotspots_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        HOTSPOT_K,
        q_tile_hotspots,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_hotspots(sf).to_pandas().sort_values("rank")
    _, tx, ty = _geo_tiles(sf)
    cnt: dict[tuple, int] = {}
    for x, y in zip(tx.tolist(), ty.tolist()):
        cnt[(x, y)] = cnt.get((x, y), 0) + 1
    sm: dict[tuple, int] = {}
    for (x, y), c in cnt.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (x + dx, y + dy)
                sm[k] = sm.get(k, 0) + c
    want = sorted(((-c, x, y) for (x, y), c in sm.items()))[:HOTSPOT_K]
    got = [(-r.n_pages_3x3, r.tile_x, r.tile_y) for r in out.itertuples()]
    assert got == want
    assert list(out["rank"]) == list(range(1, HOTSPOT_K + 1))


def test_pagerank_3iter_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        PR_ITERS,
        PR_TELEPORT,
        PR_UNIT,
        q_pagerank_3iter,
    )

    sf = "/root/testdata/sf0.001"
    out = q_pagerank_3iter(sf).to_pandas()
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy().astype(np.int64)
    n = len(ids)
    u = {int(i): PR_UNIT // n for i in ids}
    base = PR_TELEPORT // n
    for _ in range(PR_ITERS):
        nxt = {int(i): base for i in ids}
        for i, ui in u.items():
            c = (ui * 85) // 300
            for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
                nxt[t] += c
        u = nxt
    got = dict(zip(out["doc_id"].tolist(), out["pr_units"].tolist()))
    assert got == u
    assert len(out) == n
    # the id%2 hub nodes must dominate (the hot-key path is exercised)
    top2 = sorted(u.values())[-2:]
    assert min(top2) > 10 * (PR_UNIT // n)


def test_tile_user_reach_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_tile_user_reach,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_user_reach(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "user_id"])
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    users: dict[tuple, set] = {}
    for u, x, y in zip(ev["user_id"].to_numpy().tolist(), tx.tolist(), ty.tolist()):
        users.setdefault((x, y), set()).add(u)
    got = {(r.tile_x, r.tile_y): r.n_users for r in out.itertuples()}
    assert got == {k: len(v) for k, v in users.items()}


def test_tile_retention_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        _events_ts_bounds_us,
        q_tile_retention,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_retention(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    ts_us = ev["ts"].cast("int64").to_numpy()
    lo, hi = _events_ts_bounds_us(sf)
    assert lo == int(ts_us.min()) and hi == int(ts_us.max())
    mid = (lo + hi) // 2
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    first: dict[tuple, set] = {}
    second: dict[tuple, set] = {}
    for u, x, y, t in zip(
        ev["user_id"].to_numpy().tolist(), tx.tolist(), ty.tolist(),
        ts_us.tolist(),
    ):
        (first if t < mid else second).setdefault((x, y), set()).add(u)
    tiles = set(first) | set(second)
    want = {
        k: (
            len(first.get(k, set())),
            len(second.get(k, set())),
            len(first.get(k, set()) & second.get(k, set())),
        )
        for k in tiles
    }
    got = {
        (r.tile_x, r.tile_y): (r.n_first, r.n_second, r.n_retained)
        for r in out.itertuples()
    }
    assert got == want
    # both halves must be populated (the split is real on the fixture)
    assert sum(v[0] for v in want.values()) > 0
    assert sum(v[1] for v in want.values()) > 0


def test_ripley_pair_counts_matches_bruteforce(ray_session):
    import numpy as np

    from wikipedia_wikidata_ray.pipelines.queries import (
        RIPLEY_RADII,
        _geotagged,
        q_ripley_pair_counts,
    )

    sf = "/root/testdata/sf0.001"
    out = q_ripley_pair_counts(sf).to_pandas()
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.has_geo]
    lat = geo.lat.to_numpy()
    lon = geo.lon.to_numpy()
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    iu = np.triu_indices(len(lat), k=1)
    want = {
        int(round(r * 1e6)): int(np.count_nonzero(d2[iu] <= r * r))
        for r in RIPLEY_RADII
    }
    want = {k: v for k, v in want.items() if v > 0}
    got = dict(zip(out.radius_e6.tolist(), out.n_pairs.tolist()))
    assert got == want
    # cumulative: counts must be non-decreasing in radius
    seq = [got.get(int(round(r * 1e6)), 0) for r in sorted(RIPLEY_RADII)]
    assert seq == sorted(seq) and seq[-1] > 0


def test_covisit_tile_pairs_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_covisit_tile_pairs,
    )

    sf = "/root/testdata/sf0.001"
    out = q_covisit_tile_pairs(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "user_id"])
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 6)
    visited: dict[int, set] = {}
    for u, x, y in zip(
        ev["user_id"].to_numpy().tolist(), tx.tolist(), ty.tolist()
    ):
        visited.setdefault(u, set()).add((int(x), int(y)))
    cnt: collections.Counter = collections.Counter()
    for tiles in visited.values():
        ordered = sorted(tiles, key=lambda t: t[0] * 8192 + t[1] + 1)
        for i in range(len(ordered)):
            for j in range(i + 1, len(ordered)):
                cnt[(ordered[i], ordered[j])] += 1
    want = {k: v for k, v in cnt.items() if v >= 2}
    got = {
        ((r.a_x, r.a_y), (r.b_x, r.b_y)): r.n_users for r in out.itertuples()
    }
    assert got == want
    assert len(want) > 0  # the z6 choice must make the test non-trivial


def test_perplexity_buckets_matches_bruteforce(ray_session):
    import collections
    import math
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.webtext import (
        PPL_HEAD_E10,
        PPL_TAIL_E10,
        q_perplexity_buckets,
    )

    sf = "/root/testdata/sf0.001"
    out = q_perplexity_buckets(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(TOKEN_PATTERN)
    per_doc = {
        i: collections.Counter(tok.findall(txt.lower()))
        for i, txt in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        )
    }
    cf: collections.Counter = collections.Counter()
    for c in per_doc.values():
        cf.update(c)
    total = float(sum(cf.values()))
    want = {}
    for i, c in per_doc.items():
        if not c:
            continue
        nll = sum(
            int(round(math.log(total / cf[t]) * float(n) * 1e10))
            for t, n in c.items()
        )
        n_tokens = sum(c.values())
        mean = nll // n_tokens
        bucket = (
            "head" if mean < PPL_HEAD_E10
            else ("middle" if mean < PPL_TAIL_E10 else "tail")
        )
        want[i] = (n_tokens, nll, mean, bucket)
    got = {
        r.doc_id: (r.n_tokens, r.nll_e10, r.mean_nll_e10, r.bucket)
        for r in out.itertuples()
    }
    assert got == want
    buckets = {b for (_, _, _, b) in want.values()}
    assert buckets == {"head", "middle", "tail"}  # thresholds split fixture


def test_perplexity_cf_attach_plans_agree(ray_session):
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.webtext import perplexity_buckets

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        perplexity_buckets(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        perplexity_buckets(docs, cf_broadcast_limit=0)  # force join plan
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def _triangles_bruteforce(n: int) -> dict[int, int]:
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_triangle_counts

    sf = "/root/testdata/sf0.001"
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    out = q_triangle_counts(sf).to_pandas()
    want = _triangles_bruteforce(n)
    got = dict(zip(out.doc_id.tolist(), out.n_triangles.tolist()))
    assert got == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_triangle_deg_attach_plans_agree(ray_session):
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.queries import q_triangle_counts

    sf = "/root/testdata/sf0.001"
    a = (
        q_triangle_counts(sf)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        q_triangle_counts(sf, deg_broadcast_limit=0)  # force join plan
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_event_funnel_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import q_event_funnel

    sf = "/root/testdata/sf0.001"
    out = q_event_funnel(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).to_pandas()
    ev = ev[ev.event_type.isin(["view", "click", "purchase"])]
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    n_a = n_b = n_c = 0
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        pa_ = next((i for i, t in enumerate(types) if t == "view"), None)
        if pa_ is None:
            continue
        n_a += 1
        pb = next(
            (i for i in range(pa_ + 1, len(types)) if types[i] == "click"),
            None,
        )
        if pb is None:
            continue
        n_b += 1
        if any(t == "purchase" for t in types[pb + 1:]):
            n_c += 1
    want = {
        k: v
        for k, v in {
            "view": n_a, "view_click": n_b, "view_click_purchase": n_c,
        }.items()
        if v
    }
    got = dict(zip(out.stage.tolist(), out.n_users.tolist()))
    assert got == want
    assert want.get("view", 0) >= want.get("view_click", 0) >= want.get(
        "view_click_purchase", 0
    )
    assert want.get("view_click_purchase", 0) > 0  # full funnel exercised


def test_idw_grid_matches_bruteforce(ray_session):
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        IDW_CUTOFF,
        IDW_EPS,
        q_idw_grid,
    )

    sf = "/root/testdata/sf0.001"
    out = q_idw_grid(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "value"])
    eid = ev["event_id"].to_numpy()
    val = ev["value"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    cy = np.floor(lat).astype(np.int64)
    cx = np.floor(lon).astype(np.int64)
    cells = sorted(set(zip(cy.tolist(), cx.tolist())))
    want: dict = {}
    for y, x in cells:
        dlat = lat - (y + 0.5)
        dlon = lon - (x + 0.5)
        near = (np.abs(cy - y) <= 1) & (np.abs(cx - x) <= 1)
        d = np.sqrt(dlat * dlat + dlon * dlon)
        keep = near & (d <= IDW_CUTOFF)
        if not keep.any():
            continue
        w = 1.0 / (IDW_EPS + d[keep])
        w_e10 = np.round(w * 1e10).astype(np.int64)
        wv_e10 = np.round(w * val[keep] * 1e10).astype(np.int64)
        want[(y, x)] = (int(keep.sum()), int(w_e10.sum()), int(wv_e10.sum()))
    got = {
        (r.cy, r.cx): (r.n_pts, r.w_e10, r.wv_e10) for r in out.itertuples()
    }
    assert got == want
    # every occupied cell center must attract at least its own events
    assert len(want) == len(cells)


def test_degree_family_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        q_degree_assortativity,
        q_degree_distribution,
    )

    sf = "/root/testdata/sf0.001"
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    deg: collections.Counter = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dist = collections.Counter(deg.values())
    out = q_degree_distribution(sf).to_pandas()
    assert dict(zip(out.deg.tolist(), out.n_nodes.tolist())) == dict(dist)

    s1 = sum(deg[a] + deg[b] for a, b in edges)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    s3 = sum(deg[a] * deg[b] for a, b in edges)
    got = q_degree_assortativity(sf).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n_edges, r.s1, r.s2, r.s3) == (len(edges), s1, s2, s3)
    # the sufficient statistics must yield a well-defined Pearson r
    m = 2 * len(edges)
    num = m * (2 * s3) - s1 * s1
    den = m * s2 - s1 * s1
    assert den != 0 and -1.0 <= num / den <= 1.0


def test_morans_i_stats_matches_bruteforce(ray_session):
    import collections

    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_morans_i_stats,
    )

    sf = "/root/testdata/sf0.001"
    out = q_morans_i_stats(sf).to_pandas()
    assert len(out) == 1
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    cnt = collections.Counter(
        zip(geo.tile_x.astype(int).tolist(), geo.tile_y.astype(int).tolist())
    )
    n = len(cnt)
    s = sum(cnt.values())
    d = {k: v * n - s for k, v in cnt.items()}
    num = 0
    pairs = 0
    for (x, y), dv in d.items():
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in d:
                pairs += 1
                num += dv * d[nb]
    den = sum(v * v for v in d.values())
    r = out.iloc[0]
    assert (r.n_tiles, r.s_total, r.n_pairs, r.num_scaled, r.den_scaled) == (
        n, s, pairs, 2 * num, den
    )
    # well-defined epilogue (Moran's I is NOT confined to [-1, 1] for
    # sparse irregular weight graphs — the fixture's few clustered
    # adjacent pairs push it ~5)
    assert pairs > 0 and den > 0
    _ = (n / (2 * pairs)) * (2 * num) / den


def test_tile_decayed_popularity_matches_bruteforce(ray_session):
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        DECAY_TAU_US,
        q_tile_decayed_popularity,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_decayed_popularity(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "ts"])
    ts = ev["ts"].cast("int64").to_numpy()
    eid = ev["event_id"].to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    t_max = int(ts.max())
    age = (t_max - ts).astype(np.float64)
    w_e10 = np.round(np.exp(-(age / float(DECAY_TAU_US))) * 1e10).astype(
        np.int64
    )
    want: dict = collections.defaultdict(lambda: [0, 0])
    for x, y, w in zip(tx.tolist(), ty.tolist(), w_e10.tolist()):
        want[(x, y)][0] += 1
        want[(x, y)][1] += w
    got = {
        (r.tile_x, r.tile_y): [r.n_events, r.w_e10] for r in out.itertuples()
    }
    assert got == dict(want)
    # decay must be non-trivial: newest events weigh ~1e10, oldest ≪
    assert w_e10.max() > 9_000_000_000 and w_e10.min() < 1_000_000_000


def test_pq_codes_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        PQ_K,
        PQ_M,
        _pq_codebooks,
        q_pq_codes,
    )

    sf = "/root/testdata/sf0.001"
    out = q_pq_codes(sf).to_pandas()
    emb = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb = _pq_codebooks()
    got = {
        (r.vec_id, r.m): (r.code, r.d2_e10) for r in out.itertuples()
    }
    vids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    used_codes: set = set()
    for vid, v in zip(vids, vecs):
        x = np.asarray(v, dtype=np.float32).astype(np.float64)
        for m in range(PQ_M):
            sub = x[m * 8:(m + 1) * 8]
            d2s = [
                int(np.round((sub - cb[m, k]) * (sub - cb[m, k]) * 1e10)
                    .astype(np.int64).sum())
                for k in range(PQ_K)
            ]
            best = min(range(PQ_K), key=lambda k: (d2s[k], k))
            assert got[(vid, m)] == (best, d2s[best])
            used_codes.add((m, best))
    assert len(out) == len(vids) * PQ_M
    # the codebooks must be non-degenerate on the fixture: several codes
    # in use per subspace
    per_m = {m: sum(1 for mm, _ in used_codes if mm == m) for m in range(PQ_M)}
    assert min(per_m.values()) >= 3


def test_pq_adc_topk_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        PQ_K,
        PQ_M,
        PQ_QUERY_MOD,
        PQ_TOPK,
        _pq_codebooks,
        q_pq_adc_topk,
    )

    sf = "/root/testdata/sf0.001"
    out = q_pq_adc_topk(sf).to_pandas()
    emb = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb = _pq_codebooks()
    vids = emb["vec_id"].to_numpy()
    X = np.array(emb["embedding"].to_pylist(), dtype=np.float32).astype(
        np.float64
    )
    n = len(vids)
    d = X.reshape(n, PQ_M, 1, 8) - cb[None]
    terms = np.round(d * d * 1e10).astype(np.int64)
    d2 = terms.sum(axis=3)
    codes = d2.argmin(axis=2)
    qsel = vids % PQ_QUERY_MOD == 0
    want = {}
    for qi in np.flatnonzero(qsel):
        lut = d2[qi]  # (M, K) — query's own distances ARE the LUT
        adc = lut[np.arange(PQ_M)[None, :], codes].sum(axis=1)
        order = sorted(
            (int(a), int(v))
            for a, v in zip(adc, vids)
            if v != vids[qi]
        )[:PQ_TOPK]
        for r, (a, v) in enumerate(order, 1):
            want[(int(vids[qi]), r)] = (v, a)
    got = {
        (r.qid, r.rank): (r.vec_id, r.adc_e10) for r in out.itertuples()
    }
    assert got == want
    assert len(out) == int(qsel.sum()) * PQ_TOPK


def test_mixture_sample_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        MIXTURE_PERMILLE,
        q_mixture_sample,
    )

    sf = "/root/testdata/sf0.001"
    out = q_mixture_sample(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "lang"]
    ).to_pandas()
    cnt = collections.Counter(docs.source)
    total = len(docs)
    wts = {s: int(s[3:]) % 4 + 1 for s in cnt}
    sw = sum(wts.values())
    pm = {
        s: min(1000, (wts[s] * total * MIXTURE_PERMILLE) // (sw * cnt[s]))
        for s in cnt
    }
    keep = docs[
        ((docs.doc_id * 2654435761) & 2147483647) % 1000
        < docs.source.map(pm)
    ]
    assert sorted(out.doc_id.tolist()) == sorted(keep.doc_id.tolist())
    # the mixture must actually reweight: rates differ across sources and
    # higher-weight sources sample at higher rates
    assert len(set(pm.values())) >= 3
    assert pm["src3"] > pm["src0"]  # wt 4 vs wt 1
    assert 0 < len(out) < total


def test_quality_ppl_crosstab_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.corpusops import _gate_features
    from wikipedia_wikidata_ray.pipelines.webtext import (
        q_perplexity_buckets,
        q_quality_ppl_crosstab,
    )

    sf = "/root/testdata/sf0.001"
    out = q_quality_ppl_crosstab(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    _, _, _, passing = _gate_features(docs)
    passed = dict(zip(docs["doc_id"].to_pylist(), passing.tolist()))
    ppl = q_perplexity_buckets(sf).to_pandas()
    want: collections.Counter = collections.Counter(
        (b, int(passed[d]))
        for d, b in zip(ppl.doc_id.tolist(), ppl.bucket.tolist())
    )
    got = {
        (r.bucket, r.passed): r.n_docs for r in out.itertuples()
    }
    assert got == dict(want)
    # both gate outcomes must appear (the cross-tab is non-degenerate)
    assert {p for _, p in got} == {0, 1}


def test_pq_recall_eval_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        PQ_M,
        PQ_QUERY_MOD,
        PQ_RECALL_K,
        _pq_codebooks,
        q_pq_recall_eval,
    )

    sf = "/root/testdata/sf0.001"
    out = q_pq_recall_eval(sf).to_pandas()
    emb = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb = _pq_codebooks()
    vids = emb["vec_id"].to_numpy()
    X = np.array(emb["embedding"].to_pylist(), dtype=np.float32).astype(
        np.float64
    )
    n = len(vids)
    d = X.reshape(n, PQ_M, 1, 8) - cb[None]
    d2 = np.round(d * d * 1e10).astype(np.int64).sum(axis=3)
    codes = d2.argmin(axis=2)
    want = {}
    for qi in np.flatnonzero(vids % PQ_QUERY_MOD == 0):
        lut = d2[qi]
        adc = lut[np.arange(PQ_M)[None, :], codes].sum(axis=1)
        adc_top = [
            v for _, v in sorted(
                (int(a), int(v)) for a, v in zip(adc, vids) if v != vids[qi]
            )[:PQ_RECALL_K]
        ]
        diff = X[qi][None, :] - X
        ed2 = np.round(diff * diff * 1e10).astype(np.int64).sum(axis=1)
        exact_top = [
            v for _, v in sorted(
                (int(e), int(v)) for e, v in zip(ed2, vids) if v != vids[qi]
            )[:PQ_RECALL_K]
        ]
        hits = len(set(adc_top) & set(exact_top))
        if hits:
            want[int(vids[qi])] = hits
    got = dict(zip(out.qid.tolist(), out.n_hits.tolist()))
    assert got == want
    # every fixture query must register hits at k=20 (coarse codebooks
    # still recover part of the true neighborhood)
    assert len(want) == int((vids % PQ_QUERY_MOD == 0).sum())


def test_tile_bearing_histogram_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_tile_bearing_histogram,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_bearing_histogram(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    eid = ev.event_id.to_numpy()
    ev["lat"] = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    ev["lon"] = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    want: collections.Counter = collections.Counter()
    for _, g in ev.groupby("user_id"):
        lat = g.lat.to_numpy()
        lon = g.lon.to_numpy()
        for i in range(len(g) - 1):
            dlat = lat[i + 1] - lat[i]
            dlon = lon[i + 1] - lon[i]
            if dlat == 0.0 and dlon == 0.0:
                continue
            if abs(dlon) >= abs(dlat):
                b = "E" if dlon >= 0.0 else "W"
            else:
                b = "N" if dlat > 0.0 else "S"
            tx, ty = latlng_to_tile(lat[i:i + 1], lon[i:i + 1], 12)
            want[(int(tx[0]), int(ty[0]), b)] += 1
    got = {
        (r.tile_x, r.tile_y, r.bearing): r.n_moves for r in out.itertuples()
    }
    assert got == dict(want)
    assert {b for _, _, b in want} == {"N", "E", "S", "W"}


def test_kmeans_2iter_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        KM_ITERS,
        KM_K,
        _km_init_centroids,
        q_kmeans_2iter,
    )

    sf = "/root/testdata/sf0.001"
    out = q_kmeans_2iter(sf).to_pandas()
    emb = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vids = emb["vec_id"].to_pylist()
    X = np.array(emb["embedding"].to_pylist(), dtype=np.float32).astype(
        np.float64
    )

    def assign(x, cents):
        diff = x[:, None, :] - cents[None]
        d2 = np.round(diff * diff * 1e10).astype(np.int64).sum(axis=2)
        return d2.argmin(axis=1), d2

    cents = _km_init_centroids()
    for _ in range(KM_ITERS):
        lab, _ = assign(X, cents)
        xe6 = np.round(X * 1e6).astype(np.int64)
        nxt = cents.copy()
        for k in range(KM_K):
            m = lab == k
            if m.sum():
                nxt[k] = xe6[m].sum(axis=0).astype(np.float64) / (
                    float(m.sum()) * 1e6
                )
        cents = nxt
    lab, d2 = assign(X, cents)
    want = {
        v: (int(lb), int(d2[i, lb]))
        for i, (v, lb) in enumerate(zip(vids, lab))
    }
    got = {r.vec_id: (r.cluster, r.d2_e10) for r in out.itertuples()}
    assert got == want
    # the fit must be non-degenerate: several clusters populated, and the
    # iterations must actually move assignments vs the init
    assert len(set(lab.tolist())) >= 3
    lab0, _ = assign(X, _km_init_centroids())
    assert (lab0 != lab).sum() > 0


def test_ann_topk_ivf_kmeans_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        KM_ITERS,
        KM_K,
        _km_init_centroids,
        q_ann_topk_ivf_kmeans,
    )

    sf = "/root/testdata/sf0.001"
    out = q_ann_topk_ivf_kmeans(sf).to_pandas()
    emb = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vids = np.asarray(emb["vec_id"].to_pylist())
    X = np.array(emb["embedding"].to_pylist(), dtype=np.float32).astype(
        np.float64
    )

    def assign(x, cents):
        diff = x[:, None, :] - cents[None]
        d2 = np.round(diff * diff * 1e10).astype(np.int64).sum(axis=2)
        return d2.argmin(axis=1)

    cents = _km_init_centroids()
    for _ in range(KM_ITERS):
        lab = assign(X, cents)
        xe6 = np.round(X * 1e6).astype(np.int64)
        nxt = cents.copy()
        for k in range(KM_K):
            m = lab == k
            if m.sum():
                nxt[k] = xe6[m].sum(axis=0).astype(np.float64) / (
                    float(m.sum()) * 1e6
                )
        cents = nxt
    lab = assign(X, cents)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = {}
    for ki in range(KM_K):
        idx = np.flatnonzero(lab == ki)
        if len(idx) <= 1:
            continue
        sims = Xn[idx] @ Xn[idx].T
        np.fill_diagonal(sims, -np.inf)
        k = min(5, len(idx) - 1)
        for row, vi in enumerate(idx):
            order = sorted(
                range(len(idx)),
                key=lambda c: (-sims[row, c], vids[idx[c]]),
            )[:k]
            for r, c in enumerate(order, 1):
                want[(int(vids[vi]), r)] = int(vids[idx[c]])
    got = {
        (r.vec_id, r.rank): r.neighbor_id for r in out.itertuples()
    }
    assert got == want
    assert len(out) > 0


def test_media_ahash_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import q_media_ahash

    sf = "/root/testdata/sf0.001"
    out = q_media_ahash(sf).to_pandas()
    ids = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    want = {}
    pop_bits = []
    for did in ids.tolist():
        w = 32 + (did % 5) * 16
        h = 24 + (did % 3) * 16
        i = np.arange(w * h, dtype=np.int64)
        px = (did * 31 + i * 7) % 256
        img = px.reshape(h, w)
        blocks = img.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
        total = int(blocks.sum())
        bits = (64 * blocks > total).astype(np.int64)
        sh = np.arange(64, dtype=np.int64).reshape(8, 8)
        lo = int((bits[:4] << sh[:4]).sum())
        hi = int((bits[4:] << (sh[4:] - 32)).sum())
        want[did] = (w, h, hi, lo)
        pop_bits.append(int(bits.sum()))
    got = {
        r.doc_id: (r.width, r.height, r.hash_hi, r.hash_lo)
        for r in out.itertuples()
    }
    assert got == want
    # the hash must be non-degenerate: bits split roughly half/half
    assert 10 <= np.mean(pop_bits) <= 54
    # both halves must be exercised and sign-safe
    assert all(0 <= v[2] < 1 << 32 and 0 <= v[3] < 1 << 32
               for v in want.values())


def test_media_ahash_neardups_matches_bruteforce(ray_session):
    import numpy as np

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_media_ahash,
        q_media_ahash_neardups,
    )

    sf = "/root/testdata/sf0.001"
    out = q_media_ahash_neardups(sf).to_pandas()
    fp = q_media_ahash(sf).to_pandas()
    h = (
        fp.hash_hi.to_numpy().astype(np.uint64) << np.uint64(32)
    ) | fp.hash_lo.to_numpy().astype(np.uint64)
    ids = fp.doc_id.to_numpy()
    want = {}
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1:]
        hd = np.array([bin(int(v)).count("1") for v in x])
        for j in np.flatnonzero(hd <= 3):
            a, b = ids[i], ids[i + 1 + j]
            want[(min(a, b), max(a, b))] = int(hd[j])
    got = {(r.doc_a, r.doc_b): r.hamming for r in out.itertuples()}
    assert got == want
    assert len(want) > 0 and min(want.values()) == 0  # exact-equal pair


def test_props_extract_stats_matches_bruteforce(ray_session):
    import json

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_props_extract_stats,
    )

    sf = "/root/testdata/sf0.001"
    out = q_props_extract_stats(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_type", "props"]
    ).to_pandas()
    ev["k"] = ev.props.map(lambda s: json.loads(s)["k"])
    want = {
        et: (len(g), int(g.k.sum()), int(g.k.min()), int(g.k.max()))
        for et, g in ev.groupby("event_type")
    }
    got = {
        r.event_type: (r.n_events, r.sum_k, r.min_k, r.max_k)
        for r in out.itertuples()
    }
    assert got == want
    assert len(want) == 5


def test_audio_features_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_audio_features,
    )

    sf = "/root/testdata/sf0.001"
    out = q_audio_features(sf).to_pandas()
    ids = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    want = {}
    for did in ids.tolist():
        n = 8000 + (did % 7) * 1000
        i = np.arange(n, dtype=np.int64)
        s = ((did * 17 + i * 11) % 4096) - 2048
        nn = s >= 0
        want[did] = (
            n,
            int((s * s).sum()),
            int((nn[:-1] != nn[1:]).sum()),
            int(np.abs(s).max()),
        )
    got = {
        r.doc_id: (r.n_samples, r.energy, r.zero_crossings, r.peak)
        for r in out.itertuples()
    }
    assert got == want
    # the waveform must actually oscillate
    assert min(v[2] for v in want.values()) > 10


def test_weighted_sample_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        WSAMPLE_K,
        q_weighted_sample,
    )

    sf = "/root/testdata/sf0.001"
    out = q_weighted_sample(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ids = docs["doc_id"].to_numpy()
    w = docs["n_chars"].to_numpy().astype(np.float64)
    h = (ids * np.int64(2654435761)) & np.int64((1 << 31) - 1)
    u = (h.astype(np.float64) + 1.0) / 2147483648.0
    key = np.round((np.log(u) / w) * 1e10).astype(np.int64)
    order = sorted(zip((-key).tolist(), ids.tolist()))[:WSAMPLE_K]
    want = {(d, r) for r, (_, d) in enumerate(order, 1)}
    got = {(r.doc_id, r.rank) for r in out.itertuples()}
    assert got == want
    # weighting must matter: the sample's mean n_chars exceeds the corpus
    # mean (longer docs proportionally likelier)
    sampled = set(d for d, _ in want)
    m_s = w[np.isin(ids, list(sampled))].mean()
    assert m_s > w.mean()


def test_curated_tile_corpus_matches_bruteforce(ray_session):
    import collections

    from wikipedia_wikidata_ray.pipelines.corpusops import _gate_features
    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_curated_tile_corpus,
    )
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = q_curated_tile_corpus(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n_words_arr, _, _, passing = _gate_features(docs)
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    first_by_text: dict = {}
    for i, (d, tx) in enumerate(zip(ids, texts)):
        if passing[i] and (tx not in first_by_text
                           or d < first_by_text[tx]):
            first_by_text[tx] = d
    keep = set(first_by_text.values())
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    tile_of = {
        int(r.doc_id): (int(r.tile_x), int(r.tile_y))
        for r in geo.itertuples()
    }
    want: dict = collections.defaultdict(lambda: [0, 0])
    for i, d in enumerate(ids):
        if d in keep and d in tile_of:
            key = (*tile_of[d], langs[i])
            want[key][0] += 1
            want[key][1] += int(n_words_arr[i])
    got = {
        (r.tile_x, r.tile_y, r.lang): [r.n_docs, r.total_words]
        for r in out.itertuples()
    }
    assert got == dict(want)
    assert len(want) > 0


def test_tile_dwell_median_matches_bruteforce(ray_session):
    import collections
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_tile_dwell_median,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_dwell_median(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    eid = ev.event_id.to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    ev["tx"], ev["ty"] = tx, ty
    ev["ts_us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    stays: dict = collections.defaultdict(list)
    for _, g in ev.groupby("user_id"):
        tsv = g.ts_us.to_numpy()
        txv = g.tx.to_numpy()
        tyv = g.ty.to_numpy()
        for i in range(len(g) - 1):
            stays[(int(txv[i]), int(tyv[i]))].append(
                int((tsv[i + 1] - tsv[i]) // 60_000_000)
            )
    want = {}
    for k, vals in stays.items():
        vals.sort()
        want[k] = vals[max(1, math.ceil(0.5 * len(vals))) - 1]
    got = {
        (r.tile_x, r.tile_y): r.median_dwell_min for r in out.itertuples()
    }
    assert got == want
    assert max(want.values()) > 0  # minute quantization is non-trivial


def test_bfs_hops_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        BFS_ROUNDS,
        q_bfs_hops,
    )

    sf = "/root/testdata/sf0.001"
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    out = q_bfs_hops(sf).to_pandas()
    adj: dict = collections.defaultdict(set)
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                adj[i].add(t)
                adj[t].add(i)
    dist = {0: 0}
    frontier = [0]
    r = 0
    while frontier:
        r += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = r
                    nxt.append(v)
        frontier = nxt
    got = dict(zip(out.doc_id.tolist(), out.hops.tolist()))
    assert got == dist
    # the fixed SQL chain must BE the fixpoint: eccentricity < rounds
    assert max(dist.values()) <= BFS_ROUNDS - 1
    assert len(dist) == n  # the hub topology reaches everything


def test_quality_skyline_matches_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.webtext import (
        q_perplexity_buckets,
        q_quality_skyline,
    )

    sf = "/root/testdata/sf0.001"
    out = q_quality_skyline(sf).to_pandas()
    ppl = q_perplexity_buckets(sf).to_pandas()
    rows = list(
        zip(ppl.doc_id.tolist(), ppl.n_tokens.tolist(),
            ppl.mean_nll_e10.tolist())
    )
    want = set()
    for d, t, v in rows:
        dominated = any(
            (t2 >= t and v2 <= v and (t2 > t or v2 < v))
            for _, t2, v2 in rows
        )
        if not dominated:
            want.add((d, t, v))
    got = {
        (r.doc_id, r.n_tokens, r.mean_nll_e10) for r in out.itertuples()
    }
    assert got == want
    # front is non-trivial: more than one point, far fewer than corpus
    assert 1 < len(want) < len(rows) / 5
    # Pareto property: sorted by tokens desc, nll must strictly improve
    front = sorted(want, key=lambda x: (-x[1], x[2]))
    for (_, t1, v1), (_, t2, v2) in zip(front, front[1:]):
        assert t1 > t2 or (t1 == t2 and v1 == v2)
        if t1 > t2:
            assert v2 < v1


def test_order_rollup_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.relational import q_order_rollup

    sf = "/root/testdata/sf0.001"
    out = q_order_rollup(sf).to_pandas()
    o = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    ).to_pandas()
    o["cents"] = (o.o_totalprice * 100.0).round().astype("int64")
    want = {}
    for (s_, p_), g in o.groupby(["o_orderstatus", "o_orderpriority"]):
        want[(s_, p_)] = (len(g), int(g.cents.sum()))
    for s_, g in o.groupby("o_orderstatus"):
        want[(s_, None)] = (len(g), int(g.cents.sum()))
    want[(None, None)] = (len(o), int(o.cents.sum()))
    got = {
        (
            None if r.o_orderstatus is None or r.o_orderstatus != r.o_orderstatus
            else r.o_orderstatus,
            None if r.o_orderpriority is None
            or r.o_orderpriority != r.o_orderpriority
            else r.o_orderpriority,
        ): (r.n_orders, r.total_cents)
        for r in out.itertuples()
    }
    assert got == want
    assert (None, None) in got  # grand total row present


def test_user_event_pivot_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.relational import (
        PIVOT_TYPES,
        q_user_event_pivot,
    )

    sf = "/root/testdata/sf0.001"
    out = q_user_event_pivot(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id", "event_type"]
    ).to_pandas()
    want = {}
    for u, g in ev.groupby("user_id"):
        counts = g.event_type.value_counts()
        want[u] = tuple(int(counts.get(t, 0)) for t in PIVOT_TYPES)
    got = {
        r.user_id: (r.n_view, r.n_click, r.n_purchase, r.n_signup, r.n_error)
        for r in out.itertuples()
    }
    assert got == want
    assert sum(sum(v) for v in want.values()) == len(ev)  # partition of rows


def test_knn_label_eval_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        q_ann_topk,
        q_knn_label_eval,
    )

    sf = "/root/testdata/sf0.001"
    out = q_knn_label_eval(sf).to_pandas()
    top = q_ann_topk(sf).to_pandas()
    lab = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    labels = dict(zip(lab.vec_id.tolist(), lab.label.tolist()))
    want: collections.Counter = collections.Counter()
    for q, g in top.groupby("vec_id"):
        votes: collections.Counter = collections.Counter(
            labels[n] for n in g.neighbor_id.tolist()
        )
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        want[(labels[q], pred)] += 1
    got = {
        (r.true_label, r.pred_label): r.n_vecs for r in out.itertuples()
    }
    assert got == dict(want)
    # totals partition the vector set
    assert sum(want.values()) == len(labels)


def test_tile_gini_matches_bruteforce(ray_session):
    import collections

    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_tile_gini,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_gini(sf).to_pandas()
    assert len(out) == 1
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    cnt = collections.Counter(
        zip(geo.tile_x.astype(int).tolist(), geo.tile_y.astype(int).tolist())
    )
    xs = list(cnt.values())
    n = len(xs)
    total = sum(xs)
    sad = sum(abs(a - b) for a in xs for b in xs)
    r = out.iloc[0]
    assert (r.n_tiles, r.total_pages, r.sum_abs_diff) == (n, total, sad)
    g = sad / (2 * n * total)
    assert 0.0 <= g < 1.0 and g > 0.0  # non-uniform but not degenerate


def test_cms_registers_estimator_property(ray_session):
    import collections
    import hashlib
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.webtext import (
        CMS_D,
        CMS_W,
        q_cms_registers,
    )

    sf = "/root/testdata/sf0.001"
    out = q_cms_registers(sf).to_pandas()
    reg = {(r.row, r.col): r.total for r in out.itertuples()}
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    tok = re.compile(TOKEN_PATTERN)
    cf: collections.Counter = collections.Counter()
    for txt in docs["text"].to_pylist():
        cf.update(tok.findall(txt.lower()))
    # register totals partition the token stream per row
    stream = sum(cf.values())
    for j in range(CMS_D):
        assert sum(v for (r, _), v in reg.items() if r == j) == stream
    exact = 0
    for t, c in cf.items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        est = min(
            reg.get((j, (h >> (10 * j)) & (CMS_W - 1)), 0)
            for j in range(CMS_D)
        )
        assert est >= c  # one-sided error, every token
        if est == c:
            exact += 1
    assert exact >= len(cf) * 0.5  # most point queries exact at this scale


def test_window_top_terms_matches_bruteforce(ray_session):
    import collections
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.webtext import (
        WINDOW_BIN_S,
        WINDOW_TOP_K,
        _WARC_EPOCH_S,
        q_window_top_terms,
    )

    sf = "/root/testdata/sf0.001"
    out = q_window_top_terms(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(TOKEN_PATTERN)
    per_bin: dict = collections.defaultdict(collections.Counter)
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        per_bin[(_WARC_EPOCH_S + d) // WINDOW_BIN_S].update(
            tok.findall(txt.lower())
        )
    want = {}
    for b, cnt in per_bin.items():
        order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (t, c) in enumerate(order[:WINDOW_TOP_K], 1):
            want[(b, r)] = (t, c)
    got = {
        (r.t_bucket, r.rank): (r.token, r.tf) for r in out.itertuples()
    }
    assert got == want
    assert len(per_bin) >= 2  # multiple windows exercised


def test_event_transition_matrix_matches_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_event_transition_matrix,
    )

    sf = "/root/testdata/sf0.001"
    out = q_event_transition_matrix(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    want: collections.Counter = collections.Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            want[(a, b)] += 1
    got = {
        (r.from_type, r.to_type): r.n_trans for r in out.itertuples()
    }
    assert got == dict(want)
    assert len(got) == 25  # full 5x5 matrix populated on the fixture


def test_ship_delay_stats_matches_bruteforce(ray_session):
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.relational import (
        q_ship_delay_stats,
    )

    sf = "/root/testdata/sf0.001"
    out = q_ship_delay_stats(sf).to_pandas()
    li = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    o = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["delay"] = (
        j.l_shipdate.dt.normalize() - j.o_orderdate.dt.normalize()
    ).dt.days
    want = {}
    for p_, g in j.groupby("o_orderpriority"):
        vals = sorted(g.delay.tolist())
        med = vals[max(1, math.ceil(0.5 * len(vals))) - 1]
        want[p_] = (len(vals), int(g.delay.sum()), med)
    got = {
        r.o_orderpriority: (r.n_items, r.sum_delay_days, r.median_delay_days)
        for r in out.itertuples()
    }
    assert got == want
    assert all(v[2] >= 0 for v in want.values())


def test_bigram_next_top3_matches_bruteforce(ray_session):
    import collections
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.corpusops import (
        q_bigram_next_top3,
    )

    sf = "/root/testdata/sf0.001"
    out = q_bigram_next_top3(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    tok = re.compile(TOKEN_PATTERN)
    cnt: collections.Counter = collections.Counter()
    for txt in docs["text"].to_pylist():
        toks = tok.findall(txt.lower())
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] += 1
    by_left: dict = collections.defaultdict(list)
    for (a, b), c in cnt.items():
        by_left[a].append((b, c))
    want = {}
    for a, succ in by_left.items():
        order = sorted(succ, key=lambda bc: (-bc[1], bc[0]))[:3]
        for r, (b, c) in enumerate(order, 1):
            want[(a, r)] = (b, c)
    got = {
        (r.left_tok, r.rank): (r.right_tok, r.cnt) for r in out.itertuples()
    }
    assert got == want
    assert len(by_left) > 10


def test_customer_rfm_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.relational import (
        RFM_F_CUTS,
        RFM_M_CENTS,
        RFM_R_DAYS,
        q_customer_rfm,
    )

    sf = "/root/testdata/sf0.001"
    out = q_customer_rfm(sf).to_pandas()
    o = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    o["day"] = (
        o.o_orderdate.dt.normalize()
        - __import__("pandas").Timestamp("1970-01-01")
    ).dt.days
    o["cents"] = (o.o_totalprice * 100.0).round().astype("int64")
    want = {}
    for cust, g in o.groupby("o_custkey"):
        d = int(g.day.max())
        f = len(g)
        m = int(g.cents.sum())
        r_s = 1 + (d >= RFM_R_DAYS[0]) + (d >= RFM_R_DAYS[1])
        f_s = 1 + (f >= RFM_F_CUTS[0]) + (f >= RFM_F_CUTS[1])
        m_s = 1 + (m >= RFM_M_CENTS[0]) + (m >= RFM_M_CENTS[1])
        want[cust] = (d, f, m, r_s * 100 + f_s * 10 + m_s)
    got = {
        r.o_custkey: (r.last_day, r.n_orders, r.total_cents, r.rfm_code)
        for r in out.itertuples()
    }
    assert got == want
    # thresholds must actually segment the fixture
    assert len({v[3] for v in want.values()}) >= 4


def test_tile_lorenz_deciles_matches_bruteforce(ray_session):
    import collections

    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_tile_lorenz_deciles,
    )

    sf = "/root/testdata/sf0.001"
    out = q_tile_lorenz_deciles(sf).to_pandas()
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    cnt = collections.Counter(
        zip(geo.tile_x.astype(int).tolist(), geo.tile_y.astype(int).tolist())
    )
    xs = sorted(cnt.values(), reverse=True)
    n = len(xs)
    want = {}
    for d in range(1, 11):
        k = (n * d) // 10
        if k:
            want[d] = (k, sum(xs[:k]))
    got = {
        r.decile: (r.n_top_tiles, r.pages_covered) for r in out.itertuples()
    }
    assert got == want
    # Lorenz curve is concave-increasing and ends at the total
    vals = [want[d][1] for d in sorted(want)]
    assert vals == sorted(vals) and vals[-1] == sum(xs)


def test_type_token_ratio_matches_bruteforce(ray_session):
    import collections
    import re

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.webtext import q_type_token_ratio

    sf = "/root/testdata/sf0.001"
    out = q_type_token_ratio(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(TOKEN_PATTERN)
    want = {}
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        c = collections.Counter(tok.findall(txt.lower()))
        if c:
            want[d] = (len(c), sum(c.values()))
    got = {r.doc_id: (r.n_types, r.n_tokens) for r in out.itertuples()}
    assert got == want
    # diversity varies across the fixture (the signal is non-constant)
    ratios = {round(t / n, 3) for t, n in want.values()}
    assert len(ratios) > 10


def test_zone_language_counts_matches_bruteforce(ray_session):
    import collections
    import math

    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_zone_language_counts,
    )

    sf = "/root/testdata/sf0.001"
    out = q_zone_language_counts(sf).to_pandas()
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.has_geo]
    want: collections.Counter = collections.Counter()
    for r in geo.itertuples():
        if r.lon >= 180.0 or r.lat >= 90.0:
            code = None
        else:
            code = f"A{math.floor((r.lat + 90.0) / 30.0)}_" \
                   f"{math.floor((r.lon + 180.0) / 30.0)}"
        want[(code, r.lang)] += 1
    got = {
        (
            None if r.admin_code != r.admin_code or r.admin_code is None
            else r.admin_code,
            r.lang,
        ): r.n_pages
        for r in out.itertuples()
    }
    assert got == dict(want)
    # the matrix is genuinely two-dimensional on the fixture
    assert len({c for c, _ in want}) > 3 and len({l for _, l in want}) > 3


# ---------------------------------------------------------------------------
# zorder_shards — the balanced range partitioner


def test_morton12_matches_reference():
    from wikipedia_wikidata_ray.pipelines.queries import _morton12

    rng = np.random.default_rng(11)
    x = rng.integers(0, 4096, size=500).astype(np.int64)
    y = rng.integers(0, 4096, size=500).astype(np.int64)

    def ref(a, b):
        z = 0
        for i in range(12):
            z |= ((int(a) >> i) & 1) << (2 * i)
            z |= ((int(b) >> i) & 1) << (2 * i + 1)
        return z

    got = _morton12(x, y)
    assert [ref(a, b) for a, b in zip(x, y)] == got.tolist()


def test_zorder_shards_partitioner_properties(ray_session):
    """The properties that make a range partitioner usable as an output
    sharder: (a) balanced — shard sizes differ by at most 1 (exact NTILE
    semantics); (b) ordered — shard key ranges never overlap (a shard's
    max zkey ≤ the next shard's min; equality allowed only at a zkey tie
    straddling the boundary)."""
    from wikipedia_wikidata_ray.pipelines.queries import q_zorder_shards

    df = q_zorder_shards("/root/testdata/sf0.001").to_pandas()
    df = df.sort_values("shard_id", ignore_index=True)
    assert len(df) > 1
    sizes = df["n_docs"].to_numpy()
    assert sizes.max() - sizes.min() <= 1, sizes
    # contiguous shard ids from 0
    assert df["shard_id"].tolist() == list(range(len(df)))
    prev_max = df["zkey_max"].to_numpy()[:-1]
    next_min = df["zkey_min"].to_numpy()[1:]
    assert (prev_max <= next_min).all()


def test_haversine_path_matches_scalar_bruteforce(ray_session):
    """Per-user great-circle length == a scalar libm recomputation from
    the raw events (order by ts, event_id), and every leg is a valid
    central angle (≤ π) — semantics, not just SQL parity."""
    import math

    import pandas as pd
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_haversine_path_length)

    sf = "/root/testdata/sf0.001"
    got = q_haversine_path_length(sf).to_pandas().sort_values(
        "user_id", ignore_index=True)

    ev = rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    ev["lat"] = ((ev.event_id * 7919) % 1600001) / 10000.0 - 80.0
    ev["lon"] = ((ev.event_id * 104729) % 3600001) / 10000.0 - 180.0
    rows = []
    for uid, g in ev.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        lat, lon = g.lat.to_numpy(), g.lon.to_numpy()
        total, n = 0, 0
        for i in range(1, len(lat)):
            sdlat = math.sin(math.radians(lat[i] - lat[i - 1]) / 2.0)
            sdlon = math.sin(math.radians(lon[i] - lon[i - 1]) / 2.0)
            a = min(sdlat * sdlat
                    + math.cos(math.radians(lat[i - 1]))
                    * math.cos(math.radians(lat[i])) * sdlon * sdlon, 1.0)
            leg = 2.0 * math.asin(math.sqrt(a))
            assert 0.0 <= leg <= math.pi + 1e-12
            total += round(leg * 1e8)
            n += 1
        if n:
            rows.append({"user_id": uid, "n_legs": n, "path_e8": total})
    want = pd.DataFrame(rows).sort_values("user_id", ignore_index=True)
    # numpy's SIMD arcsin vs libm differ ≤1 ulp; after e8 rounding the
    # integers must agree exactly
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_inverted_postings_semantics(ray_session):
    """Posting lists are strictly increasing doc_ids, df equals the list
    length, the band holds, and a spot token's postings match a
    brute-force scan of the raw documents."""
    import re

    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.webtext import (
        POSTINGS_DF_MAX, POSTINGS_DF_MIN, q_inverted_postings)

    sf = "/root/testdata/sf0.001"
    df = q_inverted_postings(sf).to_pandas()
    assert len(df) > 0
    for _, r in df.iterrows():
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(set(ids))
        assert r.df == len(ids)
        assert POSTINGS_DF_MIN <= r.df <= POSTINGS_DF_MAX

    docs = rd.read_parquet(f"{sf}/documents.parquet").to_pandas()
    tok = df.sort_values("token").iloc[0].token
    want = []
    for _, d in docs.iterrows():
        toks = re.findall(r"[a-z0-9]+", d.text.lower())
        if any(f"{a} {b}" == tok for a, b in zip(toks, toks[1:])):
            want.append(int(d.doc_id))
    got = [int(x) for x in
           df[df.token == tok].iloc[0].postings.split(",")]
    assert got == sorted(want)


def test_tile_lisa_stats_bruteforce(ray_session):
    """k_nb / sum_c_nb equal a dict-based recomputation from the tile
    counts, and phantom (unoccupied) tiles never appear."""
    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged, q_tile_lisa_stats)

    sf = "/root/testdata/sf0.001"
    got = q_tile_lisa_stats(sf).to_pandas()
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    counts = geo.groupby(["tile_x", "tile_y"]).size().to_dict()
    assert len(got) == len(counts)
    for _, r in got.iterrows():
        key = (r.tile_x, r.tile_y)
        assert counts[key] == r.c
        nb = [
            counts.get((r.tile_x + dx, r.tile_y + dy))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
        nb = [v for v in nb if v is not None]
        assert r.k_nb == len(nb)
        assert r.sum_c_nb == sum(nb)


def test_new_user_cumulative_semantics(ray_session):
    """cum_new is the prefix sum of n_new, ends at the number of distinct
    users, and n_new recomputes from a pandas first-seen scan."""
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_new_user_cumulative)

    sf = "/root/testdata/sf0.001"
    got = q_new_user_cumulative(sf).to_pandas().sort_values(
        "hour", ignore_index=True)
    assert (got.cum_new == got.n_new.cumsum()).all()
    assert got.hour.is_monotonic_increasing

    ev = rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    ev["hour"] = ev.ts.values.astype("datetime64[h]").astype("int64")
    first = ev.groupby("user_id").hour.min()
    assert got.cum_new.iloc[-1] == first.size
    want = first.value_counts().sort_index()
    assert got.n_new.tolist() == want.tolist()
    assert got.hour.tolist() == want.index.tolist()


def test_kcore_peel_semantics(ray_session):
    """The fixed 3-round chain IS the fixpoint on the fixture (round 4
    would peel nothing — asserted by recomputing one more round in
    numpy), the cascade actually peels (≥2 distinct depths incl. a
    nonempty final core), and every final-core node has ≥ K live
    neighbors (the k-core definition)."""
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.queries import (
        KCORE_K, KCORE_ROUNDS, _link_graph_edges, q_kcore_peel)

    sf = "/root/testdata/sf0.001"
    got = q_kcore_peel(sf).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    depth = got.peel_depth.to_numpy()
    assert len(set(depth.tolist())) >= 3  # a real cascade, not a cliff

    edges = _link_graph_edges(sf)[0].to_pandas()
    lo, hi = edges.lo.to_numpy(), edges.hi.to_numpy()

    def degrees(alive):
        live = alive[lo] & alive[hi]
        d = np.zeros(len(alive), dtype=np.int64)
        np.add.at(d, lo[live], 1)
        np.add.at(d, hi[live], 1)
        return d

    # brute-force replay of the peel
    alive = np.ones(len(depth), dtype=bool)
    for r in range(1, KCORE_ROUNDS + 1):
        alive = degrees(alive) >= KCORE_K
        assert (depth >= r).sum() == alive.sum()
        assert ((depth >= r) == alive).all()
    # fixpoint: one more round changes nothing
    assert ((degrees(alive) >= KCORE_K) == alive).all()
    # definition check on the final core (vacuously true if it emptied)
    d_final = degrees(alive)
    assert (d_final[alive] >= KCORE_K).all()


def test_dim_truncation_recall_bounds(ray_session):
    """Recall@k of the 16-dim prefix is in (0, k]; truncating to the
    FULL 64 dims gives perfect recall by construction (self-consistency
    of the eval harness)."""
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        PQ_RECALL_K, q_dim_truncation_recall)

    got = q_dim_truncation_recall("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    assert (got.n_hits >= 1).all()
    assert (got.n_hits <= PQ_RECALL_K).all()
    # the prefix loses SOME neighbors somewhere, or the eval is vacuous
    assert (got.n_hits < PQ_RECALL_K).any()


def test_tile_weighted_sample_semantics(ray_session):
    """Per-tile sample: ≤ k rows per tile, every sampled doc actually in
    that tile, and the E-S key direction is right — longer docs are
    overrepresented (mean sampled length > mean tile length) on tiles
    with enough candidates to choose from."""
    from wikipedia_wikidata_ray.pipelines.queries import (
        TILE_WSAMPLE_K, _geotagged, q_tile_weighted_sample)

    sf = "/root/testdata/sf0.001"
    got = q_tile_weighted_sample(sf).to_pandas()
    geo = _geotagged(sf).to_pandas()
    geo = geo[geo.tile_x.notna()]
    geo["n_chars"] = geo.text.str.len()
    per_tile = got.groupby(["tile_x", "tile_y"]).size()
    assert (per_tile <= TILE_WSAMPLE_K).all()
    tile_docs = geo.groupby(["tile_x", "tile_y"]).doc_id.apply(set)
    for _, r in got.iterrows():
        assert r.doc_id in tile_docs[(r.tile_x, r.tile_y)]
    # anti-weighting check (the weighted_sample round-5 lesson): pick
    # tiles with ≥ 4·k candidates, sampled mean length must exceed the
    # tile mean on average
    big = geo.groupby(["tile_x", "tile_y"]).filter(
        lambda g: len(g) >= 4 * TILE_WSAMPLE_K)
    if len(big):
        keys = set(map(tuple, big[["tile_x", "tile_y"]].drop_duplicates()
                       .to_numpy()))
        samp = got[[tuple(k) in keys for k in
                    got[["tile_x", "tile_y"]].to_numpy()]]
        lens = geo.set_index("doc_id").n_chars
        assert lens[samp.doc_id].mean() > big.n_chars.mean()


def test_delta_exact_dups_semantics(ray_session):
    """Recrawl dedup: every unchanged delta doc is flagged dup against
    its own original; every ' v2'-suffixed doc is new (no corpus text
    carries the suffix); counts split exactly by the doc_id % 3 rule."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        q_delta_exact_dups)

    sf = "/root/testdata/sf0.001"
    got = q_delta_exact_dups(sf).to_pandas()
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    orig = got.delta_id - n
    unchanged = got[orig % 3 == 0]
    changed = got[orig % 3 == 1]
    assert len(unchanged) + len(changed) == len(got)
    assert (unchanged.is_dup == 1).all()
    # an unchanged doc's dup group representative is MIN doc_id of its
    # text group — itself when the text is unique (raw corpus is)
    assert (unchanged.dup_of == unchanged.delta_id - n).all()
    assert (changed.is_dup == 0).all()
    assert changed.dup_of.isna().all()


def _lev(a: str, b: str) -> int:
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1,
                           prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev1_verify_kernel_bruteforce():
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        _lev1_verify_ids)

    rng = np.random.default_rng(3)
    a = rng.integers(0, 100000, size=4000).astype(np.int64)
    b = rng.integers(0, 100000, size=4000).astype(np.int64)
    m = a != b
    a, b = a[m], b[m]
    got = _lev1_verify_ids(a, b)
    want = np.array([_lev(str(x), str(y)) == 1 for x, y in zip(a, b)])
    assert (got == want).all()


def test_title_typo_pairs_complete_vs_bruteforce(ray_session):
    """Deletion-neighborhood blocking misses NOTHING: the distributed
    result equals the brute-force all-pairs lev==1 set on titles."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        q_title_typo_pairs)

    sf = "/root/testdata/sf0.001"
    got = q_title_typo_pairs(sf).to_pandas()
    gset = set(map(tuple, got[["doc_a", "doc_b"]].to_numpy()))
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()
    titles = {i: f"Doc_{i}" for i in ids}
    want = {
        (x, y)
        for i, x in enumerate(ids)
        for y in ids[i + 1:]
        if abs(len(titles[x]) - len(titles[y])) <= 1
        and _lev(titles[x], titles[y]) == 1
    }
    want = {(min(p), max(p)) for p in want}
    assert gset == want


def test_hourly_events_ma3_semantics(ray_session):
    """ma3 equals the calendar-neighbor sum recomputed from the hourly
    histogram, and every occupied hour appears exactly once."""
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_hourly_events_ma3)

    sf = "/root/testdata/sf0.001"
    got = q_hourly_events_ma3(sf).to_pandas().sort_values(
        "hour", ignore_index=True)
    ev = rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    hours = ev.ts.values.astype("datetime64[h]").astype("int64")
    import collections

    cnt = collections.Counter(hours.tolist())
    assert got.hour.tolist() == sorted(cnt)
    for _, r in got.iterrows():
        assert r.c == cnt[r.hour]
        assert r.ma3 == (cnt.get(r.hour - 1, 0) + cnt[r.hour]
                         + cnt.get(r.hour + 1, 0))


def test_numeric_column_stats_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.profiling import (
        NUMERIC_PROFILE_COLUMNS, q_numeric_column_stats)

    got = q_numeric_column_stats("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(NUMERIC_PROFILE_COLUMNS)
    for tbl, col, money in NUMERIC_PROFILE_COLUMNS:
        s = pq.read_table(
            f"/root/testdata/sf0.001/{tbl}.parquet", columns=[col]
        ).to_pandas()[col]
        v = (s * 100).round().astype("int64") if money else s.astype(
            "int64")
        r = got[(got.tbl == tbl) & (got.col == col)].iloc[0]
        assert r.n_rows == len(s)
        assert r.n_nulls == s.isna().sum()
        assert r.min_e2 == v.min() and r.max_e2 == v.max()
        assert r.sum_e2 == v.sum()


def test_daily_active_users_matches_pandas(ray_session):
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_daily_active_users)

    sf = "/root/testdata/sf0.001"
    got = q_daily_active_users(sf).to_pandas().sort_values(
        "day", ignore_index=True)
    ev = rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    ev["day"] = ev.ts.values.astype("datetime64[D]").astype("int64")
    want = ev.groupby("day").user_id.nunique().sort_index()
    assert got.day.tolist() == want.index.tolist()
    assert got.dau.tolist() == want.tolist()


def test_event_trigram_paths_matches_pandas(ray_session):
    import collections

    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_event_trigram_paths)

    sf = "/root/testdata/sf0.001"
    got = q_event_trigram_paths(sf).to_pandas()
    ev = rd.read_parquet(f"{sf}/events.parquet").to_pandas()
    cnt = collections.Counter()
    for _, g in ev.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        ts = g.event_type.tolist()
        for i in range(len(ts) - 2):
            cnt[(ts[i], ts[i + 1], ts[i + 2])] += 1
    assert len(got) == len(cnt)
    for _, r in got.iterrows():
        assert cnt[(r.t1, r.t2, r.t3)] == r.n


def test_jsonl_roundtrip_byte_exact(ray_session):
    """The JSONL serialize→vectorized-parse roundtrip reproduces the
    original rows byte-for-byte (ids, langs, texts)."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.sources.jsonl import (
        ensure_docs_jsonl, read_docs_jsonl)

    sf = "/root/testdata/sf0.001"
    path = ensure_docs_jsonl(sf)
    got = read_docs_jsonl(path).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    want = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.lang.tolist() == want.lang.tolist()
    assert got.text.tolist() == want.text.tolist()


def test_embedding_dim_stats_matches_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.ops.ann import _as_matrix
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        q_embedding_dim_stats)

    sf = "/root/testdata/sf0.001"
    got = q_embedding_dim_stats(sf).to_pandas().sort_values(
        "dim", ignore_index=True)
    x = _as_matrix(
        pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        .column("embedding")
    ).astype(np.float64)
    e6 = np.trunc(x * 1e6).astype(np.int64)
    e3 = np.trunc(x * 1e3).astype(np.int64)
    assert got.n.tolist() == [x.shape[0]] * x.shape[1]
    assert got.sum_e6.tolist() == e6.sum(axis=0).tolist()
    assert got.sumsq_e6.tolist() == (e3 * e3).sum(axis=0).tolist()


def test_lang_confusion_matrix_semantics(ray_session):
    """Matrix totals equal the corpus size, every cell is positive, and
    the diagonal dominance equals the seeded scorer's accuracy on the
    same docs (cross-checked against langid_scores_seeded + true langs)."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        q_lang_confusion_matrix, q_langid_scores_seeded)

    sf = "/root/testdata/sf0.001"
    got = q_lang_confusion_matrix(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    assert got.n.sum() == len(docs)
    preds = q_langid_scores_seeded(sf).to_pandas().merge(
        docs, on="doc_id")
    want = preds.groupby(["lang", "pred_lang"]).size()
    for _, r in got.iterrows():
        assert want[(r.true_lang, r.pred_lang)] == r.n


def _brute_lpa(n_docs: int, rounds: int) -> dict[int, int]:
    """Reference synchronous LPA over the closed-form link graph:
    majority neighbor label, ties to the smallest label, keep own label
    when a node has no neighbors."""
    edges = set()
    for i in range(n_docs):
        for t in ((i * 3 + 1) % n_docs, (i * 5 + 2) % n_docs, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    adj: dict[int, list[int]] = {i: [] for i in range(n_docs)}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lbl = {i: i for i in range(n_docs)}
    for _ in range(rounds):
        nxt = {}
        for v in range(n_docs):
            votes: dict[int, int] = {}
            for u in adj[v]:
                votes[lbl[u]] = votes.get(lbl[u], 0) + 1
            if not votes:
                nxt[v] = lbl[v]
            else:
                nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        lbl = nxt
    return lbl


def test_label_prop_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        LPA_ROUNDS, q_label_prop_2round)

    sf = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    got = (
        q_label_prop_2round(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = _brute_lpa(n_docs, LPA_ROUNDS)
    assert got.label.tolist() == [want[i] for i in range(n_docs)]
    # 2 rounds must actually coarsen: strictly fewer communities than nodes
    assert got.label.nunique() < n_docs


def test_label_prop_plans_equal(ray_session):
    """Endpoint-label attach gate: broadcast-searchsorted plan == forced
    node-keyed hash-join plan (limit=0), full output equality."""
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.queries import q_label_prop_2round

    sf = "/root/testdata/sf0.001"

    def run(limit):
        return (
            q_label_prop_2round(sf, labels_broadcast_limit=limit)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )

    pd.testing.assert_frame_equal(run(None), run(0))
