"""Cell-partitioned exact kNN (SURVEY.md §2.D12 scale path).

The broadcast ``KNNJoiner`` (geo/knn.py) assumes the places table fits one
``ray.put`` object. At planet scale (10^9+ places) it doesn't — this
module implements the documented partitioned layout instead:

1. every PLACE is replicated to its coarse cell and the 8 ring-1
   neighbors (9×, constant — places ≪ pages);
2. every QUERY goes to exactly its own cell;
3. one equality shuffle on the cell key co-locates each query with every
   place in its 3×3 neighborhood; per group, chunked brute-force top-k;
4. **exactness bound**: any place outside the 3×3 ring is ≥ ``cell_deg``
   away (Chebyshev ⇒ Euclidean), so a query whose k-th candidate distance
   is ≤ ``cell_deg`` is provably exact. Queries failing the bound (sparse
   neighborhoods — rare when ``cell_deg`` is sized to O(k) places/cell)
   are resolved in a FALLBACK pass through the broadcast joiner.

Partitioning assumption (custom-operator rule): one cell-neighborhood's
places + queries fit a worker heap — the same locality assumption every
spatial bucketing engine makes; skewed megacity cells hold many QUERIES
but the per-group work is a chunked vectorized matrix, and query count per
group is bounded by the groupby shuffle's block splitting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .knn import KNNJoiner


def _cell_key(lat: np.ndarray, lon: np.ndarray, cell_deg: float) -> np.ndarray:
    gx = np.floor(lon / cell_deg).astype(np.int64)
    gy = np.floor(lat / cell_deg).astype(np.int64)
    return (gx + (1 << 20)) * (1 << 21) + (gy + (1 << 20))


def knn_join_partitioned(
    queries: Dataset,
    places: dict[str, np.ndarray],
    k: int = 5,
    key_cols: tuple[str, ...] = ("doc_id",),
    cell_deg: float | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Exact k nearest places per geotagged query row.

    Output: ``key_cols + (place_id, knn_rank, knn_dist)`` — identical
    content to ``geopipeline.knn_join`` at any parallelism.
    """
    from ..stages.salted import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    plat = np.asarray(places["lat"], dtype=np.float64)
    plon = np.asarray(places["lon"], dtype=np.float64)
    pid = np.asarray(places["place_id"], dtype=np.int64)
    if cell_deg is None:
        cell_deg = float(
            np.clip(np.sqrt(360.0 * 180.0 * k / max(1, len(pid))), 1.0, 30.0)
        )

    # places side: 9× replication to the 3×3 neighborhood, shipped as a
    # (small) Dataset through the shuffle — NOT broadcast
    reps = []
    gx = np.floor(plon / cell_deg).astype(np.int64)
    gy = np.floor(plat / cell_deg).astype(np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            key = ((gx + dx) + (1 << 20)) * (1 << 21) + ((gy + dy) + (1 << 20))
            reps.append(
                pa.table(
                    {
                        "_cell": pa.array(key),
                        "lat": pa.array(plat),
                        "lon": pa.array(plon),
                        "place_id": pa.array(pid),
                        "_side": pa.array(np.ones(len(pid), dtype=np.int8)),
                    }
                )
            )
    import ray.data as rd

    places_ds = rd.from_arrow(pa.concat_tables(reps))

    keep = [*key_cols, "lat", "lon"]

    def tag_query(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lat) | np.isnan(lon))
        t = t.select(keep).filter(pa.array(valid))
        lat, lon = lat[valid], lon[valid]
        t = t.append_column("_cell", pa.array(_cell_key(lat, lon, cell_deg)))
        t = t.append_column("place_id", pa.nulls(len(t), type=pa.int64()))
        return t.append_column("_side", pa.array(np.zeros(len(t), dtype=np.int8)))

    q_tag = queries.map_batches(tag_query, batch_format="pyarrow")
    union_names = [*key_cols, "lat", "lon", "_cell", "place_id", "_side"]
    q_types = dict(zip(queries.schema().names, queries.schema().types))

    def pad_place(t: pa.Table) -> pa.Table:
        for c in key_cols:
            t = t.append_column(c, pa.nulls(len(t), type=q_types[c]))
        return t.select(union_names)

    unioned = q_tag.map_batches(
        lambda t: t.select(union_names), batch_format="pyarrow"
    ).union(places_ds.map_batches(pad_place, batch_format="pyarrow"))

    out_cols = [*key_cols, "place_id", "knn_rank", "knn_dist", "_exact"]

    def resolve(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        qmask = side == 0
        qs = group.filter(pa.array(qmask))
        nq = len(qs)
        if nq == 0:
            return pa.table({c: pa.array([], type=t) for c, t in zip(
                out_cols,
                [q_types[c] for c in key_cols] + [pa.int64(), pa.int32(), pa.float64(), pa.bool_()],
            )})
        qlat = qs["lat"].to_numpy(zero_copy_only=False)
        qlon = qs["lon"].to_numpy(zero_copy_only=False)
        cmask = ~qmask
        clat = group["lat"].to_numpy(zero_copy_only=False)[cmask]
        clon = group["lon"].to_numpy(zero_copy_only=False)[cmask]
        cpid = group["place_id"].to_numpy(zero_copy_only=False)[cmask].astype(np.int64) if cmask.any() else np.empty(0, dtype=np.int64)
        nc = len(cpid)
        kk = min(k, nc)
        keys_out = {c: [] for c in key_cols}
        pids, ranks, dists, exact = [], [], [], []
        if kk > 0:
            chunk = max(1, (1 << 20) // max(1, nc))
            for s in range(0, nq, chunk):
                e = min(s + chunk, nq)
                d2 = (clat[None, :] - qlat[s:e, None]) ** 2 + (
                    clon[None, :] - qlon[s:e, None]
                ) ** 2
                m = e - s
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                rows = np.arange(m)[:, None]
                ord2 = np.lexsort((cpid[part], d2[rows, part]), axis=1)
                sel = part[rows, ord2]
                dist = np.sqrt(d2[rows, sel])
                # exact iff we had k candidates AND the k-th is strictly
                # inside the ring guarantee radius: places outside the 3x3
                # block are only guaranteed >= cell_deg away, so at exactly
                # cell_deg a just-outside place with a smaller place_id
                # could win the (dist, place_id) tie-break — boundary
                # queries fall through to the exact fallback pass instead.
                # (Equal-distance ties AT rank k among in-ring candidates
                # are still broken identically to the broadcast joiner via
                # the lexsort on (place_id, dist).)
                ok = (nc >= k) & (dist[:, kk - 1] < cell_deg)
                for c in key_cols:
                    keys_out[c].append(np.repeat(qs[c].to_numpy(zero_copy_only=False)[s:e], kk))
                pids.append(cpid[sel].ravel())
                ranks.append(np.tile(np.arange(1, kk + 1, dtype=np.int32), m))
                dists.append(dist.ravel())
                exact.append(np.repeat(ok, kk))
        else:
            # no candidates at all → every query unresolved
            for c in key_cols:
                keys_out[c].append(qs[c].to_numpy(zero_copy_only=False))
            pids.append(np.full(nq, -1, dtype=np.int64))
            ranks.append(np.ones(nq, dtype=np.int32))  # rank 1 → marker row
            dists.append(np.full(nq, np.inf))
            exact.append(np.zeros(nq, dtype=bool))
        return pa.table(
            {
                **{c: pa.array(np.concatenate(keys_out[c])) for c in key_cols},
                "place_id": pa.array(np.concatenate(pids)),
                "knn_rank": pa.array(np.concatenate(ranks)),
                "knn_dist": pa.array(np.concatenate(dists)),
                "_exact": pa.array(np.concatenate(exact)),
            }
        )

    resolved = unioned.groupby("_cell", num_partitions=num_partitions).map_groups(
        resolve, batch_format="pyarrow"
    ).materialize()

    exact_part = resolved.map_batches(
        lambda t: t.filter(t["_exact"]).drop_columns(["_exact"]),
        batch_format="pyarrow",
    )

    # fallback pass: the (rare) unresolved queries re-run through the
    # broadcast joiner — exact by construction. At scale where even that
    # is impossible, iterate with a wider ring instead.
    def unresolved_queries(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.invert(t["_exact"]),
                pc.equal(t["knn_rank"], pa.scalar(1, type=pa.int32())),
            )
        )
        return t.select(list(key_cols))

    # rank==1 dedups the k replicated marker rows per unresolved query
    unresolved_keys = resolved.map_batches(
        lambda t: unresolved_queries(t), batch_format="pyarrow"
    )
    # nothing unresolved is the common case — check cheaply before joining
    n_unresolved = unresolved_keys.count()
    if n_unresolved == 0:
        return exact_part

    fallback_src = unresolved_keys.join(
        queries.map_batches(lambda t: t.select(keep), batch_format="pyarrow"),
        "inner",
        num_partitions=max(1, num_partitions // 2),
        on=tuple(key_cols),
    )
    ref = ray.put(places)
    fb = fallback_src.map_batches(
        KNNJoiner,
        fn_constructor_args=(ref, k, tuple(key_cols)),
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    )
    return exact_part.union(fb)
