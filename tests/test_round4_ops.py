"""Round-4 operator invariants: BM25 top-terms, per-tile dominant
language, snap-to-grid geo dedup. The oracle checker covers SQL parity at
sf0.01; these pin operator-level invariants at sf0.001."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_bm25_top_terms_ranks_and_bounds(ray_session):
    from wikipedia_wikidata_ray.pipelines.webtext import TFIDF_K, q_bm25_top_terms

    out = q_bm25_top_terms(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    per_doc = out.groupby("doc_id")
    assert (per_doc.size() <= TFIDF_K).all()
    for _, g in per_doc:
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        key = list(zip(-g["bm25"], g["token"]))
        assert key == sorted(key)
    # df ∈ [1, N]; dl ≥ tf (a doc holds at least its own occurrences);
    # the +1-inside-the-log idf keeps every score strictly positive
    assert out["df"].between(1, n_docs).all()
    assert (out["dl"] >= out["tf"]).all()
    assert (out["bm25"] > 0).all()
    # dl is constant per doc
    assert (per_doc["dl"].nunique() == 1).all()


def test_bm25_matches_direct_formula_on_one_doc(ray_session):
    """Recompute one document's scores from raw text with the public BM25
    formula (k1=1.2, b=0.75, Lucene-style +1 idf) and compare."""
    import re

    import duckdb

    from wikipedia_wikidata_ray.pipelines.webtext import q_bm25_top_terms

    out = q_bm25_top_terms(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    n = len(docs)
    tok = {
        did: re.findall(r"[a-z0-9]+", txt.lower())
        for did, txt in zip(docs["doc_id"], docs["text"])
    }
    total_tokens = sum(len(v) for v in tok.values())
    avgdl = total_tokens / float(n)
    # df over the whole corpus
    df: dict = {}
    for toks in tok.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    did = int(out["doc_id"].iloc[0])
    g = out[out["doc_id"] == did]
    toks = tok[did]
    dl = len(toks)
    for _, row in g.iterrows():
        tf = toks.count(row["token"])
        assert tf == row["tf"] and dl == row["dl"] and df[row["token"]] == row["df"]
        idf = np.log((n - df[row["token"]] + 0.5) / (df[row["token"]] + 0.5) + 1.0)
        denom = tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))
        want = round(float(idf * ((tf * 2.2) / denom)), 10)
        assert row["bm25"] == want


def test_tile_top_lang_consistent_with_tile_counts(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_tile_counts, q_tile_top_lang

    top = q_tile_top_lang(SF).to_pandas()
    counts = q_tile_counts(SF).to_pandas()
    # exactly one winner per tile, same tile set as tile_counts
    t_top = set(zip(top["tile_x"], top["tile_y"]))
    t_all = set(zip(counts["tile_x"], counts["tile_y"]))
    assert t_top == t_all
    assert len(top) == len(t_top)
    # the winner's count never exceeds the tile total
    merged = top.merge(counts, on=["tile_x", "tile_y"], suffixes=("_win", "_tot"))
    assert (merged["n_pages_win"] <= merged["n_pages_tot"]).all()
    assert (merged["n_pages_win"] >= 1).all()


def test_tile_heat_smooth_conserves_mass_and_dominates(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_tile_counts,
        q_tile_heat_smooth,
    )

    sm = q_tile_heat_smooth(SF).to_pandas()
    counts = q_tile_counts(SF).to_pandas()
    # each point contributes to exactly 9 tiles → total mass is 9×
    assert sm["n_pages_3x3"].sum() == 9 * counts["n_pages"].sum()
    # a tile's smoothed count dominates its raw count
    m = counts.merge(sm, on=["tile_x", "tile_y"], how="left")
    assert (m["n_pages_3x3"] >= m["n_pages"]).all()
    assert not sm.duplicated(["tile_x", "tile_y"]).any()


def test_hex_ring_smooth_counts_matches_bruteforce():
    from wikipedia_wikidata_ray.geo import hexgrid

    rng = np.random.RandomState(3)
    lat = rng.uniform(-60, 60, 300)
    lon = rng.uniform(-170, 170, 300)
    cells = hexgrid.latlng_to_cell(lat, lon, 7)
    # collapse to unique (cell, count) input pairs
    uc, counts = np.unique(cells, return_counts=True)
    got_c, got_n = hexgrid.ring_smooth_counts(uc, counts)
    want: dict = {}
    for c, n in zip(uc, counts):
        ring = np.concatenate(([c], hexgrid.neighbors(int(c))))
        for rc in ring:
            want[int(rc)] = want.get(int(rc), 0) + int(n)
    assert dict(zip(got_c.astype(int), got_n.astype(int))) == want


def _supercover_scalar(x0, y0, x1, y1):
    """Per-segment reference walk with the same x-first corner convention."""
    tx, ty = int(np.floor(x0)), int(np.floor(y0))
    tx1, ty1 = int(np.floor(x1)), int(np.floor(y1))
    sx = 1 if x1 >= x0 else -1
    sy = 1 if y1 >= y0 else -1
    events = []
    k = 1
    while k <= abs(tx1 - tx):
        line = tx + k if sx > 0 else tx + 1 - k
        events.append(((line - x0) / (x1 - x0), 0))
        k += 1
    k = 1
    while k <= abs(ty1 - ty):
        line = ty + k if sy > 0 else ty + 1 - k
        events.append(((line - y0) / (y1 - y0), 1))
        k += 1
    events.sort(key=lambda e: (e[0], e[1]))  # corner ties: x-step first
    out = [(tx, ty)]
    for _, ax in events:
        if ax == 0:
            tx += sx
        else:
            ty += sy
        out.append((tx, ty))
    return out


def test_supercover_tiles_matches_scalar_walk():
    from wikipedia_wikidata_ray.geo.tiles import supercover_tiles

    rng = np.random.RandomState(11)
    n = 200
    x0 = rng.uniform(-5, 20, n)
    y0 = rng.uniform(-5, 20, n)
    x1 = x0 + rng.uniform(-15, 15, n)
    y1 = y0 + rng.uniform(-15, 15, n)
    # include degenerate shapes: vertical, horizontal, same-tile
    x1[:3], y1[3:6] = x0[:3], y0[3:6]
    x1[6], y1[6] = x0[6], y0[6]
    seg, tx, ty = supercover_tiles(x0, y0, x1, y1)
    for i in range(n):
        got = list(zip(tx[seg == i].tolist(), ty[seg == i].tolist()))
        want = _supercover_scalar(x0[i], y0[i], x1[i], y1[i])
        assert got == want, f"segment {i}"
    # structural properties: 4-connected path, endpoints covered
    for i in range(n):
        path = list(zip(tx[seg == i].tolist(), ty[seg == i].tolist()))
        assert path[0] == (int(np.floor(x0[i])), int(np.floor(y0[i])))
        assert path[-1] == (int(np.floor(x1[i])), int(np.floor(y1[i])))
        for (a, b), (c, d) in zip(path, path[1:]):
            assert abs(a - c) + abs(b - d) == 1  # one axis step at a time


def test_geo_cell_dedup_partitions_geotagged_exactly(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import q_geo_cell_dedup

    out = q_geo_cell_dedup(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    n_geo = sum(1 for d in range(n_docs) if d % 10 < 7)  # has_geo contract
    assert out["n_docs"].sum() == n_geo
    assert (out["n_docs"] >= 1).all()
    # cells are unique (at the default 0.01° grid the ±0.1° megacity
    # jitter spreads the sf0.001 points into singleton cells)
    assert not out.duplicated(["cell_lat", "cell_lon"]).any()
    # canonical id is geotagged itself
    assert (out["canon_doc_id"] % 10 < 7).all()


def test_segment_tile_cover_matches_pandas(ray_session):
    """Self-join + capped bbox expansion == a pandas recompute from the
    geotagged points (z8 tiles via exact >>4 of the encoded z12 tiles)."""
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.queries import (
        SEGMENT_TILE_CAP,
        _geotagged,
        q_segment_tile_cover,
    )

    out = (
        q_segment_tile_cover(SF)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"], ignore_index=True)
    )
    assert len(out) > 0

    pts = _geotagged(SF).to_pandas()
    pts = pts[pts["has_geo"]]
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    tx = dict(zip(pts["doc_id"], np.asarray(pts["tile_x"], dtype=np.int64) >> 4))
    ty = dict(zip(pts["doc_id"], np.asarray(pts["tile_y"], dtype=np.int64) >> 4))
    counts: dict = {}
    for d in pts["doc_id"]:
        p = (d * 13 + 7) % n_docs
        if p not in tx:
            continue  # partner not geotagged → inner-join drop
        x0, x1 = sorted((tx[d], tx[p]))
        y0, y1 = sorted((ty[d], ty[p]))
        if (x1 - x0 + 1) * (y1 - y0 + 1) > SEGMENT_TILE_CAP:
            continue
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                counts[(x, y)] = counts.get((x, y), 0) + 1
    want = (
        pd.DataFrame(
            [(x, y, c) for (x, y), c in counts.items()],
            columns=["tile_x", "tile_y", "n_segments"],
        )
        .sort_values(["tile_x", "tile_y"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_geo_cell_dedup_hot_cells_merge_min_and_count(ray_session):
    """1° cells DO collide (each megacity collapses into ≤4 cells), so the
    distributed min/count merge is exercised; verify against a pandas
    recompute from the raw geotagged points."""
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.queries import (
        _geotagged,
        q_geo_cell_dedup,
    )

    out = (
        q_geo_cell_dedup(SF, cells_per_degree=1.0)
        .to_pandas()
        .sort_values(["cell_lat", "cell_lon"], ignore_index=True)
    )
    assert out["n_docs"].max() > 1  # hot cells exist at this granularity

    pts = _geotagged(SF).to_pandas()
    pts = pts[pts["has_geo"]]
    want = (
        pd.DataFrame(
            {
                "cell_lat": np.floor(pts["lat"]).astype(np.int32),
                "cell_lon": np.floor(pts["lon"]).astype(np.int32),
                "doc_id": pts["doc_id"],
            }
        )
        .groupby(["cell_lat", "cell_lon"], as_index=False)
        .agg(canon_doc_id=("doc_id", "min"), n_docs=("doc_id", "size"))
        .sort_values(["cell_lat", "cell_lon"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        out, want, check_dtype=False, check_like=True
    )
