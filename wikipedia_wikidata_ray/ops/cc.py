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


def _local_min_labels(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label propagation over a driver-local edge list —
    the SAME hash-to-min + pointer-jump algorithm as the distributed
    rounds, on numpy arrays. Returns (touched_nodes, labels), exact and
    identical to the distributed result (min is order-free)."""
    nodes = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        pushed = lab.copy()
        np.minimum.at(pushed, d, lab[s])
        np.minimum.at(pushed, s, lab[d])
        pushed = pushed[pushed]  # pointer jump
        if np.array_equal(pushed, lab):
            break
        lab = pushed
    return nodes, nodes[lab]


def connected_components(
    nodes: Dataset,
    edges: Dataset,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
    num_partitions: int | None = None,
    local_edge_limit: int = 5_000_000,
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

    all_nodes = nodes.map_batches(
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
    n_edges = und.count()
    if n_edges == 0:
        return _named(all_nodes)

    if n_edges <= local_edge_limit:
        # gated small-graph fast path (the house broadcast-below-threshold
        # pattern, e.g. the importance fold): the EDGE list fits the driver
        # (≤ 80 MB at the default limit), so label locally with the same
        # vectorized hash-to-min + pointer jumping and skip the per-round
        # hash joins — each distributed join pays multi-second shuffle-actor
        # startup, which dominates when the touched set is small. The
        # distributed rounds below remain the >limit plan
        # (equality-pytested against this path).
        import ray
        import ray.data as rd

        tbl = pa.concat_tables(ray.get(und.to_arrow_refs()))
        t_nodes, t_labels = _local_min_labels(
            tbl["src"].to_numpy(zero_copy_only=False),
            tbl["dst"].to_numpy(zero_copy_only=False),
        )
        touched = rd.from_arrow(
            pa.table({"node": pa.array(t_nodes), "label": pa.array(t_labels)})
        )
        return _named(
            merge_group_aggs(
                all_nodes.union(touched), ["node"], [("label", "min")]
            )
        )

    # EXACT shrink: a node with no incident edge never receives a pushed
    # label and never changes — iterate ONLY on the edge-touched subset
    # (≤ 2|E| rows; for sparse graphs ≪ |V|, e.g. dedup candidate pairs
    # over a mostly-unique corpus, or adjacency among scattered tiles),
    # then union the untouched nodes (label = node) back once at the end.
    # Measured on the 1M-page tile graph (400K nodes, 208 edge rows):
    # per-round range sort of 400K labels → per-round sort of 208.
    labels = merge_group_aggs(
        und.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        ),
        ["node"],
        [("label", "min")],
    ).materialize()

    # Join width sized to the TOUCHED set, floored at ~100K rows per
    # partition: Ray's hash join hands pyarrow a SCHEMA-LESS table for a
    # partition that received zero rows of a side, which crashes with
    # "No match ... for key field" — a tiny labels table across many
    # partitions guarantees that. One partition is correct (and cheapest)
    # until the touched set is actually large.
    nparts = max(1, min(nparts, labels.count() // 100_000 + 1))

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
            # fold the untouched nodes back in with ONE grouped-min merge:
            # every node contributes (node, node) from all_nodes, touched
            # nodes additionally contribute their converged label, and
            # min-labels are ≤ the node id by construction — so MIN picks
            # the converged label where one exists and the self-label
            # elsewhere. No join → no sparse-right empty-partition hazard
            # (the pyarrow "no match for key field" crash mode).
            return _named(
                merge_group_aggs(
                    all_nodes.union(labels), ["node"], [("label", "min")]
                )
            )
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(pointer jumping bounds rounds by O(log diameter) — this "
        "indicates label/node id corruption, not a large graph)"
    )
