"""As-of (most-recent-at-or-before) join — a custom temporal operator Ray
Data lacks natively (SURVEY.md §2 "custom operators" path (a): composition
of groupby().map_groups over key-partitioned groups; the shuffle key is the
equality key, time resolution is vectorized numpy searchsorted per group).

Partitioning assumption (documented per the custom-operator rule): one
equality-key group must fit in a worker's heap — true for per-user event
streams (the hot path at 100 TB partitions by user/session, the classic
sessionization layout). Deterministic tie-break: greatest ``ts``, then
greatest ``tie_col``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    tie_col: str,
    right_value_cols: list[str],
    num_partitions: int | None = None,
) -> Dataset:
    """For every left row, attach the right row with the greatest
    ``ts`` ≤ left ``ts`` within the same ``key`` group (nulls when no such
    row). Exact at any parallelism."""

    from ..stages.salted import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    # resolve() reads tie_col from the unioned table; it survives the
    # pad().select(union_names) projection only if it is a left column or
    # listed in right_value_cols — validate here instead of a KeyError
    # deep inside map_groups.
    _l_names = left.schema().names
    if tie_col not in _l_names and tie_col not in right_value_cols:
        raise ValueError(
            f"asof_join: tie_col {tie_col!r} must be a left column or "
            f"included in right_value_cols (got {right_value_cols!r})"
        )
    l_tag = left.map_batches(
        lambda t: t.append_column("_side", pa.array(np.zeros(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    keep = list(dict.fromkeys([key, ts, tie_col, *right_value_cols]))
    r_tag = right.map_batches(
        lambda t: t.select(keep).append_column(
            "_side", pa.array(np.ones(len(t), dtype=np.int8))
        ),
        batch_format="pyarrow",
    )

    # schema-align the union: each side gets null columns for the other's
    r_schema = right.schema()
    l_schema = left.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    l_types = dict(zip(l_schema.names, l_schema.types))
    union_names = [
        *l_schema.names,
        *[c for c in right_value_cols if c not in l_schema.names],
        "_side",
    ]

    def pad(to_types: dict[str, pa.DataType]):
        def fn(t: pa.Table) -> pa.Table:
            for c, typ in to_types.items():
                if c not in t.column_names:
                    t = t.append_column(c, pa.nulls(len(t), type=typ))
            return t.select(union_names)

        return fn

    types = {c: r_types[c] for c in right_value_cols}
    types.update(l_types)
    l_tag = l_tag.map_batches(pad(types), batch_format="pyarrow")
    r_tag = r_tag.map_batches(pad(types), batch_format="pyarrow")
    unioned = l_tag.union(r_tag)

    out_cols = [*l_schema.names, *[f"asof_{c}" for c in right_value_cols]]

    def resolve(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        tsv = group[ts].to_numpy(zero_copy_only=False)
        tie = group[tie_col].to_numpy(zero_copy_only=False)
        lmask = side == 0
        rmask = ~lmask
        lefts = group.filter(pa.array(lmask))
        if not rmask.any():
            res = lefts.select(list(l_schema.names))
            for c in right_value_cols:
                res = res.append_column(
                    f"asof_{c}", pa.nulls(len(res), type=r_types[c])
                )
            return res
        r_ts, r_tie = tsv[rmask], tie[rmask]
        order = np.lexsort((r_tie, r_ts))  # ts asc, tie asc
        r_ts = r_ts[order]
        # searchsorted right → index of last right row with ts <= left ts
        idx = np.searchsorted(r_ts, tsv[lmask], side="right") - 1
        hit = idx >= 0
        res = lefts.select(list(l_schema.names))
        r_rows = group.filter(pa.array(rmask)).take(order)
        for c in right_value_cols:
            vals = r_rows[c].take(pa.array(np.where(hit, idx, 0)))
            res = res.append_column(
                f"asof_{c}",
                pc.if_else(pa.array(hit), vals, pa.nulls(len(res), type=r_types[c])),
            )
        return res

    return unioned.groupby(key, num_partitions=num_partitions).map_groups(
        resolve, batch_format="pyarrow"
    ).select_columns(out_cols)
