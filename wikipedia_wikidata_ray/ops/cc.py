"""Distributed connected components via min-label propagation.

The duplicate-clustering step every dedup pipeline ends with: candidate
pairs (from LSH / SimHash / n-gram verification) are EDGES; the cluster id
of a document is the minimum doc_id reachable through any chain of
near-duplicate pairs. Transitivity matters — A~B and B~C puts A and C in
one cluster even when A and C were never a candidate pair.

Algorithm (hash-to-min with pointer jumping, the standard MapReduce CC
shape — e.g. Rastogi et al., "Finding Connected Components in Map-Reduce
in Logarithmic Rounds"):

- labels(node, label) starts as label = node.
- Each round does two exact, deterministic contractions:
  1. neighbor-min: push every node's label across its (undirected) edges
     and take the per-node min — one hash join (edges ⋈ labels on src)
     plus one grouped-min merge;
  2. pointer jump: label ← label(label) — a self-join that halves the
     remaining chain depth, turning O(diameter) rounds into O(log d).
- Converged when Σ label stops decreasing (labels are monotonically
  non-increasing node ids, so the sum is a strictly decreasing integer
  until the fixpoint — an exact, cheap test).

Partitioning assumption: none beyond hash-join co-partitioning; every
stage is a Dataset join / map_batches / grouped-min, so the only state is
the labels table itself (O(#nodes) rows, never the payload). Per-round
cost at scale: 2 hash shuffles of (int64, int64) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..stages.salted import default_partitions, merge_group_aggs


def connected_components(
    nodes: Dataset,
    edges: Dataset,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> Dataset:
    """``nodes(node_col)`` + ``edges(src_col, dst_col)`` → Dataset
    ``(node_col, label)`` where ``label`` is the min node id in the
    node's connected component. Isolated nodes label themselves.

    Exact and deterministic at any parallelism (min is commutative/
    associative; every step is a join or a grouped min).

    ``num_partitions``: join/shuffle width per round. Callers whose node
    set is SMALL relative to the cluster (e.g. occupied tiles) should
    size it to the data — every round pays per-partition actor overhead
    twice, so 16-way shuffles of a 10⁴-row labels table are pure fixed
    cost (see grid_clusters' data-aware sizing).
    """
    nparts = num_partitions or default_partitions()

    def _named(ds: Dataset) -> Dataset:
        # both exits (edgeless early return + converged) must present the
        # caller's node_col name, not the internal "node"
        if node_col == "node":
            return ds
        return ds.map_batches(
            lambda t: t.rename_columns([node_col, "label"]),
            batch_format="pyarrow",
        )

    labels = nodes.map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t[node_col], pa.int64()),
             "label": pc.cast(t[node_col], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    # undirected: replicate each edge in both directions once, up front
    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    und = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    # Ray joins crash on empty/schema-less sides; an edgeless graph is a
    # legitimate input (no duplicates found) — every node is its own cluster
    if und.count() == 0:
        return _named(labels)

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        # 1. neighbor-min: (src,dst) ⋈ labels(node=src) → (dst, label)
        pushed = (
            und.join(
                labels,
                "inner",
                num_partitions=nparts,
                on=("src",),
                right_on=("node",),
            )
            .map_batches(
                lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
                batch_format="pyarrow",
            )
        )
        labels = merge_group_aggs(
            labels.union(pushed), ["node"], [("label", "min")]
        ).materialize()

        # 2. pointer jump: label ← label(label)
        parents = labels.map_batches(
            lambda t: pa.table({"p_node": t["node"], "p_label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.join(
                parents,
                "inner",
                num_partitions=nparts,
                on=("label",),
                right_on=("p_node",),
            )
            .map_batches(
                lambda t: pa.table({"node": t["node"], "label": t["p_label"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )

        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return _named(labels)
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(pointer jumping bounds rounds by O(log diameter) — this "
        "indicates label/node id corruption, not a large graph)"
    )
