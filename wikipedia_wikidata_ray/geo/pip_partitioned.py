"""Cell-partitioned point-in-polygon join (SURVEY.md §2.D11 scale path).

``geopipeline.pip_join`` broadcasts the whole polygon set — right while
admin boundaries fit plasma (country/admin sets do). For polygon sets that
don't (parcel-level, 10^8+ rings), this variant ships each polygon only to
the coarse cells its bbox intersects and shuffles points to their own
cell: one equality exchange, no broadcast, and — unlike kNN — no fallback
pass is ever needed (containment is local: a point can only be inside a
polygon whose bbox covers it, and that polygon is replicated to the
point's cell by construction).

Determinism: the global polygon ORDER (input row index) is carried through
the shuffle, so the lowest-index-wins tie-break matches the broadcast
joiner exactly at any parallelism.

Partitioning assumption: one cell's polygons + points fit a worker heap;
replication factor = mean bbox-to-cell cover count (≈1 for admin-sized
cells; pick ``cell_deg`` ≥ typical polygon extent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .pip import PolygonSet, assign_codes


def pip_join_partitioned(
    ds: Dataset,
    polygons: pa.Table,
    specs: tuple[tuple[int, str], ...] = ((0, "admin_code"), (1, "metro_code")),
    cell_deg: float = 30.0,
    num_partitions: int | None = None,
) -> Dataset:
    """Adds one code column per ``(level, out_col)`` spec; identical output
    to the broadcast ``PIPMultiJoiner`` at any parallelism."""

    from ..stages.salted import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    codes = polygons.column("admin_code").to_pylist()
    levels = polygons.column("level").to_numpy()
    rings_x = [np.asarray(r, dtype=np.float64) for r in polygons.column("ring_lon").to_pylist()]
    rings_y = [np.asarray(r, dtype=np.float64) for r in polygons.column("ring_lat").to_pylist()]

    # replicate each polygon to every cell its bbox touches
    rep_rows: dict[str, list] = {
        "_cell": [], "_pidx": [], "admin_code": [], "level": [],
        "ring_lon": [], "ring_lat": [],
    }
    for i, (rx, ry) in enumerate(zip(rings_x, rings_y)):
        cx0, cx1 = int(np.floor(rx.min() / cell_deg)), int(np.floor(rx.max() / cell_deg))
        cy0, cy1 = int(np.floor(ry.min() / cell_deg)), int(np.floor(ry.max() / cell_deg))
        for cx in range(cx0, cx1 + 1):
            for cy in range(cy0, cy1 + 1):
                rep_rows["_cell"].append((cx + (1 << 20)) * (1 << 21) + (cy + (1 << 20)))
                rep_rows["_pidx"].append(i)
                rep_rows["admin_code"].append(codes[i])
                rep_rows["level"].append(int(levels[i]))
                rep_rows["ring_lon"].append(rx.tolist())
                rep_rows["ring_lat"].append(ry.tolist())
    import ray.data as rd

    poly_ds = rd.from_arrow(
        pa.table(
            {
                "_cell": pa.array(rep_rows["_cell"], type=pa.int64()),
                "_pidx": pa.array(rep_rows["_pidx"], type=pa.int64()),
                "admin_code": pa.array(rep_rows["admin_code"], type=pa.string()),
                "level": pa.array(rep_rows["level"], type=pa.int32()),
                "ring_lon": pa.array(rep_rows["ring_lon"], type=pa.list_(pa.float64())),
                "ring_lat": pa.array(rep_rows["ring_lat"], type=pa.list_(pa.float64())),
                "_side": pa.array([1] * len(rep_rows["_cell"]), type=pa.int8()),
            }
        )
    )

    in_schema = ds.schema()
    in_names = list(in_schema.names)
    in_types = dict(zip(in_schema.names, in_schema.types))
    union_names = [*in_names, "_cell", "_pidx", "admin_code_p", "level",
                   "ring_lon", "ring_lat", "_side"]

    def tag_points(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lat) | np.isnan(lon))
        cells = np.where(
            valid,
            (np.floor(np.where(valid, lon, 0.0) / cell_deg).astype(np.int64) + (1 << 20)) * (1 << 21)
            + (np.floor(np.where(valid, lat, 0.0) / cell_deg).astype(np.int64) + (1 << 20)),
            -1,  # invalid-geo rows share one bucket; they get null codes
        )
        t = t.append_column("_cell", pa.array(cells))
        t = t.append_column("_pidx", pa.nulls(len(t), type=pa.int64()))
        t = t.append_column("admin_code_p", pa.nulls(len(t), type=pa.string()))
        t = t.append_column("level", pa.nulls(len(t), type=pa.int32()))
        t = t.append_column("ring_lon", pa.nulls(len(t), type=pa.list_(pa.float64())))
        t = t.append_column("ring_lat", pa.nulls(len(t), type=pa.list_(pa.float64())))
        return t.append_column("_side", pa.array(np.zeros(len(t), dtype=np.int8)))

    def pad_polys(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            ["_cell", "_pidx", "admin_code_p", "level", "ring_lon", "ring_lat", "_side"]
        )
        for c in in_names:
            t = t.append_column(c, pa.nulls(len(t), type=in_types[c]))
        return t.select(union_names)

    unioned = ds.map_batches(tag_points, batch_format="pyarrow").map_batches(
        lambda t: t.select(union_names), batch_format="pyarrow"
    ).union(poly_ds.map_batches(pad_polys, batch_format="pyarrow"))

    out_names = [*in_names, *[oc for _, oc in specs]]

    def resolve(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        pts = group.filter(pa.array(side == 0)).select(in_names)
        if len(pts) == 0:
            empty = {c: pa.array([], type=in_types[c]) for c in in_names}
            for _, oc in specs:
                empty[oc] = pa.array([], type=pa.string())
            return pa.table(empty)
        pmask = side == 1
        lat = pts["lat"].to_numpy(zero_copy_only=False)
        lon = pts["lon"].to_numpy(zero_copy_only=False)
        if pmask.any():
            pidx = group["_pidx"].to_numpy(zero_copy_only=False)[pmask].astype(np.int64)
            # restore GLOBAL polygon order → identical lowest-id-wins
            order = np.argsort(pidx, kind="stable")
            g_codes = np.asarray(group["admin_code_p"].to_pylist(), dtype=object)[pmask][order]
            g_levels = group["level"].to_numpy(zero_copy_only=False)[pmask].astype(np.int32)[order]
            g_rx = [np.asarray(r) for r in np.asarray(group["ring_lon"].to_pylist(), dtype=object)[pmask][order]]
            g_ry = [np.asarray(r) for r in np.asarray(group["ring_lat"].to_pylist(), dtype=object)[pmask][order]]
        else:
            g_codes, g_levels, g_rx, g_ry = np.array([], dtype=object), np.array([], dtype=np.int32), [], []
        for level, oc in specs:
            keep = g_levels == level
            sub = PolygonSet(
                list(g_codes[keep]),
                g_levels[keep],
                [r for r, k in zip(g_rx, keep) if k],
                [r for r, k in zip(g_ry, keep) if k],
            ) if keep.any() else None
            col = (
                assign_codes(sub, lon, lat)
                if sub is not None
                else pa.nulls(len(pts), type=pa.string())
            )
            pts = pts.append_column(oc, col)
        return pts

    return unioned.groupby("_cell", num_partitions=num_partitions).map_groups(
        resolve, batch_format="pyarrow"
    ).select_columns(out_names)
