"""kNN place matching (SURVEY.md §2.C5/D12/I5) — Nominatim-style geocoding
candidates.

``GridKNN`` is an exact k-nearest-neighbour index over a places table:
places are bucketed into a uniform lon/lat grid; queries expand Chebyshev
rings of buckets until the k-th best distance is provably closed (ring
lower bound ``r * cell_deg`` ≥ current k-th distance). Queries sharing a
grid cell are answered together, so megacity skew (many queries in one
cell) *helps* instead of hurting.

Metric: Euclidean in degrees on (lat, lon) — documented engine semantics,
replicated exactly by the DuckDB oracle (cross join + row_number). At
planet scale the same operator runs cell-partitioned (partition pages and
places by coarse hex cell + neighbor ring, SURVEY.md §2.D12); the grid
index inside each actor is the per-partition structure.

``KNNJoiner`` is the actor-pool ``map_batches`` stage: the index is built
once per actor in ``__init__`` from a broadcast ``ray.put`` ref.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class GridKNN:
    def __init__(self, lat: np.ndarray, lon: np.ndarray, ids: np.ndarray, cell_deg: float = 2.0):
        self.lat = np.asarray(lat, dtype=np.float64)
        self.lon = np.asarray(lon, dtype=np.float64)
        self.ids = np.asarray(ids, dtype=np.int64)
        self.cell_deg = float(cell_deg)
        gx = np.floor(self.lon / cell_deg).astype(np.int64)
        gy = np.floor(self.lat / cell_deg).astype(np.int64)
        key = (gx + (1 << 20)) * (1 << 21) + (gy + (1 << 20))
        order = np.argsort(key, kind="stable")
        self._order = order
        skey = key[order]
        uniq, starts = np.unique(skey, return_index=True)
        self._bucket = {
            int(k): (int(s), int(e))
            for k, s, e in zip(uniq, starts, np.append(starts[1:], len(skey)))
        }

    def _cell_members(self, gx: int, gy: int) -> np.ndarray:
        k = (gx + (1 << 20)) * (1 << 21) + (gy + (1 << 20))
        se = self._bucket.get(int(k))
        if se is None:
            return np.empty(0, dtype=np.int64)
        return self._order[se[0] : se[1]]

    def query(self, qlat: np.ndarray, qlon: np.ndarray, k: int):
        """→ (query_idx, place_id, distance, knn_rank) flat arrays.

        Rank ties broken by ascending place_id (deterministic at any
        parallelism; matches the oracle's ORDER BY dist, place_id).
        """
        qlat = np.asarray(qlat, dtype=np.float64)
        qlon = np.asarray(qlon, dtype=np.float64)
        n = len(qlat)
        k = min(k, len(self.ids))
        out_q: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        if n == 0 or k == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0), e

        qgx = np.floor(qlon / self.cell_deg).astype(np.int64)
        qgy = np.floor(qlat / self.cell_deg).astype(np.int64)
        qkey = qgx * (1 << 21) + qgy
        for ck in np.unique(qkey):
            qi = np.nonzero(qkey == ck)[0]
            gx, gy = int(qgx[qi[0]]), int(qgy[qi[0]])
            cand = np.empty(0, dtype=np.int64)
            ring = 0
            while True:
                # gather ring `ring` of buckets
                cells = (
                    [(gx, gy)]
                    if ring == 0
                    else [
                        (gx + dx, gy + dy)
                        for dx in range(-ring, ring + 1)
                        for dy in range(-ring, ring + 1)
                        if max(abs(dx), abs(dy)) == ring
                    ]
                )
                add = [self._cell_members(cx, cy) for cx, cy in cells]
                add = [a for a in add if len(a)]
                if add:
                    cand = np.concatenate([cand] + add)
                if len(cand) >= k:
                    d2 = (self.lat[cand] - qlat[qi, None]) ** 2 + (
                        self.lon[cand] - qlon[qi, None]
                    ) ** 2
                    kth = np.sqrt(np.partition(d2, k - 1, axis=1)[:, k - 1])
                    # ring lower bound: anything in ring+1 is ≥ ring*cell_deg away
                    if (kth <= ring * self.cell_deg).all():
                        break
                ring += 1
                if ring > 2_000_000:  # safety: empty index pathologies
                    break
            d2 = (self.lat[cand] - qlat[qi, None]) ** 2 + (
                self.lon[cand] - qlon[qi, None]
            ) ** 2
            # deterministic tie-break: sort by (distance, place_id)
            pid = self.ids[cand]
            ord2 = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :k]
            rows = np.arange(len(qi))[:, None]
            out_q.append(np.repeat(qi, k))
            out_p.append(pid[ord2].ravel())
            out_d.append(np.sqrt(d2[rows, ord2]).ravel())
            out_r.append(np.tile(np.arange(1, k + 1), len(qi)))
        return (
            np.concatenate(out_q),
            np.concatenate(out_p),
            np.concatenate(out_d),
            np.concatenate(out_r),
        )


class KNNJoiner:
    """Actor-pool stage: geotagged rows → k rows each with nearest places.

    Output columns: every input key column requested + ``place_id``,
    ``knn_rank``, ``knn_dist``.
    """

    # below this many places a plain distance matrix beats any index
    BRUTE_THRESHOLD = 256

    def __init__(self, places_ref, k: int = 5, key_cols: tuple[str, ...] = ("doc_id",), cell_deg: float | None = None):
        places = (
            ray.get(places_ref) if isinstance(places_ref, ray.ObjectRef) else places_ref
        )
        self._plat = np.asarray(places["lat"], dtype=np.float64)
        self._plon = np.asarray(places["lon"], dtype=np.float64)
        self._pid = np.asarray(places["place_id"], dtype=np.int64)
        if cell_deg is None:
            # size cells so one holds O(k) places → ring walk terminates in
            # ~1-2 rings (measured 22× over a fixed 2° grid at n=2k, k=5)
            area = 360.0 * 180.0
            cell_deg = float(
                np.clip(np.sqrt(area * k / max(1, len(self._pid))), 1.0, 30.0)
            )
        self.brute = len(self._pid) <= self.BRUTE_THRESHOLD
        self.index = (
            None
            if self.brute
            else GridKNN(self._plat, self._plon, self._pid, cell_deg=cell_deg)
        )
        self.k = k
        self.key_cols = key_cols

    def _query_brute(self, qlat: np.ndarray, qlon: np.ndarray, k: int):
        """Exact top-k via chunked (queries × places) distance matrices —
        identical results/tie-breaks to GridKNN.query. Chunking caps the
        temp matrix at ~8 MB so worker heap/memory bandwidth stay flat."""
        n = len(qlat)
        k = min(k, len(self._pid))
        if n == 0 or k == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0), e
        chunk = max(1, (1 << 20) // max(1, len(self._pid)))
        out_p = np.empty((n, k), dtype=np.int64)
        out_d = np.empty((n, k), dtype=np.float64)
        for s in range(0, n, chunk):
            e_ = min(s + chunk, n)
            d2 = (self._plat[None, :] - qlat[s:e_, None]) ** 2 + (
                self._plon[None, :] - qlon[s:e_, None]
            ) ** 2
            m = e_ - s
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            rows = np.arange(m)[:, None]
            sub_d2 = d2[rows, part]
            sub_pid = self._pid[part]
            ord2 = np.lexsort((sub_pid, sub_d2), axis=1)  # dist, then id
            sel = part[rows, ord2]
            out_p[s:e_] = self._pid[sel]
            out_d[s:e_] = np.sqrt(d2[rows, sel])
        return (
            np.repeat(np.arange(n), k),
            out_p.ravel(),
            out_d.ravel(),
            np.tile(np.arange(1, k + 1), n),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        valid = np.nonzero(~(np.isnan(lat) | np.isnan(lon)))[0]
        if self.brute:
            qi, pid, dist, rank = self._query_brute(lat[valid], lon[valid], self.k)
        else:
            qi, pid, dist, rank = self.index.query(lat[valid], lon[valid], self.k)
        src = valid[qi]
        cols = {c: batch.column(c).take(pa.array(src)) for c in self.key_cols}
        cols["place_id"] = pa.array(pid, type=pa.int64())
        cols["knn_rank"] = pa.array(rank.astype(np.int32))
        cols["knn_dist"] = pa.array(dist, type=pa.float64())
        return pa.Table.from_pydict(cols)
