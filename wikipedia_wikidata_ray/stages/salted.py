"""Skew-aware aggregation (SURVEY.md §2.I7 hot-cell salting + §4 skew).

Two exact strategies for counts/sums over skewed keys (megacity tiles, the
"United States"-style hot link targets):

- ``partial_count`` / ``partial_sum``: combiner-style pre-aggregation —
  each ``map_batches`` call collapses its batch to one row per key
  (pyarrow ``Table.group_by``), so the all-to-all shuffle moves at most
  ``n_batches`` rows per key regardless of skew. This is the default for
  algebraic aggregates.
- ``salted_count``: explicit salting — append ``_salt = hash(key) %
  fanout``, aggregate by ``keys + _salt`` (hot key split across ``fanout``
  reducers), then a second tiny aggregate merges salt shards. Needed when
  the per-group computation cannot pre-combine (e.g. ``map_groups`` over
  full groups).

Both are provably exact for commutative/associative aggregates (the same
argument that validates re-shaping the reference's 1521 accumulating
UPDATEs, steps/wikipedia_process.sh:58-68, into one grouped sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def _partial_count_batch(keys: list[str], out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [out])

    return fn


def partial_count(ds: Dataset, keys: list[str], out: str = "count") -> Dataset:
    """count(*) per key with per-batch combining; one shuffle over partials."""
    partial = ds.map_batches(_partial_count_batch(keys, out), batch_format="pyarrow")
    return partial.groupby(keys).aggregate(Sum(out, alias_name=out))


def _partial_sum_batch(keys: list[str], col: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(col, "sum")])
        return g.rename_columns(keys + [out])

    return fn


def partial_sum(ds: Dataset, keys: list[str], col: str, out: str | None = None) -> Dataset:
    out = out or f"sum_{col}"
    partial = ds.map_batches(_partial_sum_batch(keys, col, out), batch_format="pyarrow")
    return partial.groupby(keys).aggregate(Sum(out, alias_name=out))


def add_salt(ds: Dataset, salt_from: str, fanout: int, col: str = "_salt") -> Dataset:
    """Deterministic salt column: spreads one hot key over ``fanout``
    sub-keys. ``salt_from`` must be a high-cardinality column (e.g. the row
    id), NOT the hot key itself."""

    def fn(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(salt_from).to_numpy(zero_copy_only=False), dtype=np.int64)
        salt = ((v * np.int64(2654435761)) & np.int64((1 << 31) - 1)) % fanout
        return batch.append_column(col, pa.array(salt.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_count(ds: Dataset, keys: list[str], salt_from: str, fanout: int = 16, out: str = "count") -> Dataset:
    """Two-stage explicitly-salted count(*): groupby(keys+salt) → merge.

    Count is expressed as Sum of ones so both stages use the same algebraic
    aggregate (stable arrow types across ray versions)."""

    def ones(batch: pa.Table) -> pa.Table:
        return batch.append_column("_ones", pa.array(np.ones(len(batch), dtype=np.int64)))

    salted = add_salt(ds.map_batches(ones, batch_format="pyarrow"), salt_from, fanout)
    stage1 = salted.groupby(keys + ["_salt"]).aggregate(Sum("_ones", alias_name=out))
    return stage1.groupby(keys).aggregate(Sum(out, alias_name=out))
