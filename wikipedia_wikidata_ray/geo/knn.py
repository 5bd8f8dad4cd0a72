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

    def __init__(self, places_ref, k: int = 5, key_cols: tuple[str, ...] = ("doc_id",), cell_deg: float = 2.0):
        places = (
            ray.get(places_ref) if isinstance(places_ref, ray.ObjectRef) else places_ref
        )
        self.index = GridKNN(
            places["lat"], places["lon"], places["place_id"], cell_deg=cell_deg
        )
        self.k = k
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        valid = np.nonzero(~(np.isnan(lat) | np.isnan(lon)))[0]
        qi, pid, dist, rank = self.index.query(lat[valid], lon[valid], self.k)
        src = valid[qi]
        cols = {c: batch.column(c).take(pa.array(src)) for c in self.key_cols}
        cols["place_id"] = pa.array(pid, type=pa.int64())
        cols["knn_rank"] = pa.array(rank.astype(np.int32))
        cols["knn_dist"] = pa.array(dist, type=pa.float64())
        return pa.Table.from_pydict(cols)
