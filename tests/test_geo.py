"""Geo primitive tests: S2, hexgrid, tiles, STRtree, PIP, kNN.

Strategy per FIXTURES.md §4: spatial operators are checked against
slow-but-obvious single-process oracles (brute-force loops)."""

import numpy as np
import pytest

from wikipedia_wikidata_ray.geo import hexgrid, s2, tiles
from wikipedia_wikidata_ray.geo.knn import GridKNN
from wikipedia_wikidata_ray.geo.pip import points_in_polygon
from wikipedia_wikidata_ray.geo.strtree import STRtree

RNG = np.random.default_rng(42)


class TestS2:
    def test_lookup_tables_are_inverse(self):
        for o in range(4):
            for p in range(256):
                e = int(s2._LOOKUP_IJ[(p << 2) + o])
                e2 = int(s2._LOOKUP_POS[((e >> 2) << 2) + o])
                assert e2 >> 2 == p and (e2 & 3) == (e & 3)

    def test_hilbert_roundtrip(self):
        lat = RNG.uniform(-89.9, 89.9, 10000)
        lng = RNG.uniform(-180, 180, 10000)
        face, u, v = s2.latlng_to_face_uv(lat, lng)
        i = s2._ij_from_st(s2._st_from_uv(u))
        j = s2._ij_from_st(s2._st_from_uv(v))
        leaf = s2.cell_id_from_face_ij(face, i, j)
        f2, i2, j2 = s2.face_ij_from_cell_id(leaf)
        assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()

    def test_leaf_center_close(self):
        lat = RNG.uniform(-80, 80, 1000)
        lng = RNG.uniform(-179, 179, 1000)
        leaf = s2.latlng_to_cell(lat, lng)
        clat, clng = s2.cell_to_latlng(leaf)
        assert np.abs(clat - lat).max() < 1e-5
        assert np.abs(clng - lng).max() < 1e-4

    def test_faces(self):
        cases = [((0, 0), 0), ((0, 90), 1), ((90, 0), 2),
                 ((0, 179.99), 3), ((0, -90), 4), ((-90, 0), 5)]
        for (la, ln), want in cases:
            f, _, _ = s2.latlng_to_face_uv(np.array([la]), np.array([ln]))
            assert int(f[0]) == want

    def test_hierarchy_prefix(self):
        lat = RNG.uniform(-80, 80, 500)
        lng = RNG.uniform(-179, 179, 500)
        c10 = s2.latlng_to_cell(lat, lng, 10)
        c16 = s2.latlng_to_cell(lat, lng, 16)
        # the level-10 ancestor of the level-16 cell equals direct encoding
        assert (s2.parent_at_level(c16, 10) == c10).all()

    def test_nearby_points_share_coarse_cell(self):
        c1 = s2.latlng_to_cell(np.array([48.85]), np.array([2.35]), 10)
        c2 = s2.latlng_to_cell(np.array([48.851]), np.array([2.351]), 10)
        assert c1[0] == c2[0]


class TestHexgrid:
    def test_center_within_radius(self):
        lat = RNG.uniform(-85, 85, 2000)
        lon = RNG.uniform(-180, 180, 2000)
        for res in (5, 7, 9):
            c = hexgrid.latlng_to_cell(lat, lon, res)
            clat, clng = hexgrid.cell_to_latlng(c)
            d = np.sqrt((clat - lat) ** 2 + (clng - lon) ** 2)
            assert (d <= hexgrid.cell_size(res) * 1.0001).all()

    def test_pack_roundtrip(self):
        q = RNG.integers(-100000, 100000, 1000)
        r = RNG.integers(-100000, 100000, 1000)
        q2, r2, res = hexgrid.unpack(hexgrid.pack(q, r, 9))
        assert (q2 == q).all() and (r2 == r).all() and (res == 9).all()

    def test_parent_mostly_agrees_with_direct(self):
        lat = RNG.uniform(-85, 85, 5000)
        lon = RNG.uniform(-180, 180, 5000)
        c9 = hexgrid.latlng_to_cell(lat, lon, 9)
        agree = (hexgrid.cell_to_parent(c9, 5) == hexgrid.latlng_to_cell(lat, lon, 5)).mean()
        assert agree > 0.95  # hex hierarchies are approximate (like H3)

    def test_neighbors_and_kring(self):
        c = hexgrid.latlng_to_cell(np.array([10.0]), np.array([10.0]), 6)[0]
        nb = hexgrid.neighbors(int(c))
        assert len(set(nb.tolist())) == 6 and c not in nb
        ring1 = hexgrid.k_ring(int(c), 1)
        assert len(ring1) == 7 and c in ring1


class TestTiles:
    def test_known_tile(self):
        x, y = tiles.latlng_to_tile(np.array([48.8566]), np.array([2.3522]), 12)
        assert (int(x[0]), int(y[0])) == (2074, 1409)  # central Paris, z12

    def test_point_within_tile_bounds(self):
        lat = RNG.uniform(-84, 84, 1000)
        lon = RNG.uniform(-179, 179, 1000)
        x, y = tiles.latlng_to_tile(lat, lon, 10)
        for i in range(0, 1000, 97):
            lat_min, lat_max, lon_min, lon_max = tiles.tile_bounds(int(x[i]), int(y[i]), 10)
            assert lon_min <= lon[i] < lon_max + 1e-9
            assert lat_min - 1e-9 <= lat[i] <= lat_max + 1e-9


class TestSTRtree:
    def test_vs_brute_force(self):
        lo = RNG.uniform(0, 100, (300, 2))
        boxes = np.concatenate([lo, lo + RNG.uniform(1, 10, (300, 2))], axis=1)
        tree = STRtree(boxes)
        for _ in range(100):
            x, y = RNG.uniform(-5, 115, 2)
            got = np.sort(tree.query_point(x, y))
            want = np.nonzero(
                (boxes[:, 0] <= x) & (boxes[:, 1] <= y)
                & (boxes[:, 2] >= x) & (boxes[:, 3] >= y)
            )[0]
            assert (got == want).all()

    def test_empty(self):
        tree = STRtree(np.empty((0, 4)))
        assert len(tree.query_point(0, 0)) == 0


class TestPIP:
    def test_square(self):
        rx = np.array([0, 10, 10, 0, 0.0])
        ry = np.array([0, 0, 10, 10, 0.0])
        inside = points_in_polygon(
            np.array([5, 15, 0.5, -1, 9.99]), np.array([5, 5, 9.5, 5, 0.01]), rx, ry
        )
        assert inside.tolist() == [True, False, True, False, True]

    def test_concave(self):
        # L-shape
        rx = np.array([0, 4, 4, 2, 2, 0, 0.0])
        ry = np.array([0, 0, 2, 2, 4, 4, 0.0])
        inside = points_in_polygon(
            np.array([1, 3, 3, 1]), np.array([1, 1, 3, 3]), rx, ry
        )
        assert inside.tolist() == [True, True, False, True]


class TestGridKNN:
    @pytest.mark.parametrize("cell_deg", [2.0, 10.0])
    def test_vs_brute_force(self, cell_deg):
        P = 400
        plat = RNG.uniform(-80, 80, P)
        plon = RNG.uniform(-179, 179, P)
        pid = np.arange(P) * 3  # non-contiguous ids
        idx = GridKNN(plat, plon, pid, cell_deg=cell_deg)
        qlat = RNG.uniform(-80, 80, 200)
        qlon = RNG.uniform(-179, 179, 200)
        qi, gp, gd, gr = idx.query(qlat, qlon, 5)
        assert len(qi) == 200 * 5
        for t in range(0, 200, 23):
            d = np.sqrt((plat - qlat[t]) ** 2 + (plon - qlon[t]) ** 2)
            want = pid[np.lexsort((pid, d))[:5]]
            mine = gp[qi == t][np.argsort(gr[qi == t])]
            assert (mine == want).all()

    def test_fewer_places_than_k(self):
        idx = GridKNN(np.array([0.0]), np.array([0.0]), np.array([7]))
        qi, gp, gd, gr = idx.query(np.array([1.0]), np.array([1.0]), 5)
        assert len(gp) == 1 and gp[0] == 7


class TestPartitionedKNN:
    def test_matches_broadcast_joiner(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
        from wikipedia_wikidata_ray.geo.knn_partitioned import knn_join_partitioned
        from wikipedia_wikidata_ray.pipelines import geopipeline as gp
        from wikipedia_wikidata_ray.sources.admin_fixtures import places_dict

        cfg = DEFAULT_CONFIG
        geo = gp.geocode(
            gp.extract(gp.load_pages("/root/testdata/sf0.001"), cfg), cfg
        ).materialize()
        a = gp.knn_join(geo, cfg).to_pandas()
        b = knn_join_partitioned(geo, places_dict(), k=cfg.knn_k).to_pandas()

        def canon(df):
            return df[["doc_id", "place_id", "knn_rank", "knn_dist"]].sort_values(
                ["doc_id", "knn_rank"], ignore_index=True
            )

        pd.testing.assert_frame_equal(canon(a), canon(b))

    def test_fallback_pass_fires_with_tiny_cells(self, ray_session):
        """Force the exactness bound to fail (cells far smaller than the
        k-NN radius) — the fallback pass must still deliver exact results."""
        import pandas as pd

        from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
        from wikipedia_wikidata_ray.geo.knn_partitioned import knn_join_partitioned
        from wikipedia_wikidata_ray.pipelines import geopipeline as gp
        from wikipedia_wikidata_ray.sources.admin_fixtures import places_dict

        cfg = DEFAULT_CONFIG
        geo = gp.geocode(
            gp.extract(gp.load_pages("/root/testdata/sf0.001"), cfg), cfg
        ).materialize()
        a = gp.knn_join(geo, cfg).to_pandas()
        b = knn_join_partitioned(
            geo, places_dict(), k=cfg.knn_k, cell_deg=1.0
        ).to_pandas()

        def canon(df):
            return df[["doc_id", "place_id", "knn_rank", "knn_dist"]].sort_values(
                ["doc_id", "knn_rank"], ignore_index=True
            )

        pd.testing.assert_frame_equal(canon(a), canon(b))


class TestPartitionedPIP:
    def test_matches_broadcast_joiner(self, ray_session):
        import pandas as pd

        from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
        from wikipedia_wikidata_ray.geo.pip_partitioned import pip_join_partitioned
        from wikipedia_wikidata_ray.pipelines import geopipeline as gp
        from wikipedia_wikidata_ray.sources.admin_fixtures import admin_polygons_table

        cfg = DEFAULT_CONFIG
        geo = gp.geocode(
            gp.extract(gp.load_pages("/root/testdata/sf0.001"), cfg), cfg
        ).materialize()
        a = gp.pip_join(geo, cfg).to_pandas()
        # small cells force polygons to replicate across many cells
        b = pip_join_partitioned(
            geo, admin_polygons_table(), cell_deg=15.0
        ).to_pandas()
        cols = list(a.columns)
        canon = lambda df: df[cols].sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(canon(a), canon(b))


def test_actor_pool_spatial_mode(ray_session):
    """spatial_stage_mode='actors' (the heavy-state path) produces the
    same results as the default task mode."""
    import dataclasses

    import pandas as pd

    from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
    from wikipedia_wikidata_ray.pipelines import geopipeline as gp

    cfg_tasks = DEFAULT_CONFIG
    cfg_actors = dataclasses.replace(DEFAULT_CONFIG, spatial_stage_mode="actors")
    geo = gp.geocode(
        gp.extract(gp.load_pages("/root/testdata/sf0.001"), cfg_tasks), cfg_tasks
    ).materialize()
    canon = lambda df: df.sort_values("doc_id", ignore_index=True)
    a = canon(gp.pip_join(geo, cfg_tasks).to_pandas())
    b = canon(gp.pip_join(geo, cfg_actors).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    ka = canon(gp.knn_join(geo, cfg_tasks).to_pandas())
    kb = canon(gp.knn_join(geo, cfg_actors).to_pandas())
    pd.testing.assert_frame_equal(ka, kb)


def test_strtree_query_boxes_matches_bruteforce():
    """Both the dense (≤512 boxes) and frontier-descent paths of
    STRtree.query_boxes against an O(n·m) overlap scan."""
    import numpy as np

    from wikipedia_wikidata_ray.geo.strtree import STRtree

    rng = np.random.default_rng(7)
    for n in (30, 2000):
        boxes = rng.random((n, 2))
        boxes = np.hstack([boxes, boxes + rng.random((n, 2)) * 0.1])
        t = STRtree(boxes)
        q = rng.random((300, 2))
        q = np.hstack([q, q + rng.random((300, 2)) * 0.05])
        qi, bi = t.query_boxes(q)
        got = set(zip(qi.tolist(), bi.tolist()))
        exp = {
            (i, j)
            for i in range(len(q))
            for j in range(n)
            if boxes[j, 0] <= q[i, 2]
            and boxes[j, 2] >= q[i, 0]
            and boxes[j, 1] <= q[i, 3]
            and boxes[j, 3] >= q[i, 1]
        }
        assert got == exp
    # degenerate inputs
    empty = STRtree(np.empty((0, 4)))
    qi, bi = empty.query_boxes(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert len(qi) == 0 and len(bi) == 0
    one = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    qi, bi = one.query_boxes(np.empty((0, 4)))
    assert len(qi) == 0 and len(bi) == 0


def test_snap_to_segment_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        SNAP_CELL_E4, _snap_roads, q_snap_to_segment)
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    sf = "/root/testdata/sf0.001"
    out = q_snap_to_segment(sf).to_pandas().set_index("doc_id")
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    rid, ax, ay, bx, by, x0, x1, y0, y1, l2 = _snap_roads(n_docs)
    road_set = set(rid.tolist())
    ids = np.arange(n_docs, dtype=np.int64)
    lat, lon, hg = derive_geo(ids)
    matched = 0
    for d in ids[hg]:
        px = int(np.round(lon[d] * 1e4))
        py = int(np.round(lat[d] * 1e4))
        cx = (px + 1_800_000) // SNAP_CELL_E4
        cy = (py + 800_000) // SNAP_CELL_E4
        best = None
        for j in range(len(rid)):
            if not (x0[j] - 1 <= cx <= x1[j] + 1 and y0[j] - 1 <= cy <= y1[j] + 1):
                continue
            abx, aby = int(bx[j] - ax[j]), int(by[j] - ay[j])
            apx, apy = px - int(ax[j]), py - int(ay[j])
            dot = abx * apx + aby * apy
            if dot <= 0:
                tt = 0.0
            elif dot >= int(l2[j]):
                tt = 1.0
            else:
                tt = dot / int(l2[j])
            dx = px - (int(ax[j]) + tt * abx)
            dy = py - (int(ay[j]) + tt * aby)
            d2e2 = int(np.round((dx * dx + dy * dy) * 100))
            key = (d2e2, int(rid[j]))
            if best is None or key < best:
                best = key
        if best is None:
            assert d not in out.index
            continue
        matched += 1
        assert out.loc[d].road_id == best[1]
        assert out.loc[d].d2_e2 == best[0]
    assert matched == len(out) > 0
    # a road's own first endpoint snaps to itself at distance zero
    own = [d for d in out.index if d in road_set]
    assert own and all(out.loc[d].d2_e2 == 0 for d in own)
    assert (out.d2_e2 >= 0).all()
