"""Packed STR (Sort-Tile-Recursive) R-tree over bounding boxes, numpy.

No shapely in this container, so the STRtree the north rule mandates
(BASELINE.json north_star: "STRtree-backed PIP") is implemented from
scratch: classic STR bulk loading (Leutenegger et al., 1997 — public
algorithm), nodes stored as flat numpy arrays, point queries by iterative
descent. Built once per actor in the PIP stage's ``__init__``
(SURVEY.md §2.C4).
"""

from __future__ import annotations

import math

import numpy as np


class STRtree:
    """Static packed R-tree; ``boxes`` is (n, 4) [xmin, ymin, xmax, ymax]."""

    def __init__(self, boxes: np.ndarray, leaf_size: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.leaf_size = leaf_size
        if self.n == 0:
            self.levels: list[np.ndarray] = []
            self.children: list[np.ndarray] = []
            self.order = np.empty(0, dtype=np.int64)
            return

        # --- STR bulk load of the leaf ordering -------------------------
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        n_leaves = math.ceil(self.n / leaf_size)
        n_slabs = math.ceil(math.sqrt(n_leaves))
        by_x = np.argsort(cx, kind="stable")
        slab_sz = math.ceil(self.n / n_slabs)
        order = np.concatenate(
            [
                s[np.argsort(cy[s], kind="stable")]
                for s in np.array_split(by_x, range(slab_sz, self.n, slab_sz))
            ]
        )
        self.order = order  # original box index per leaf slot
        self.boxes = boxes[order]

        # --- build packed levels bottom-up ------------------------------
        # levels[0] = leaf-group bboxes; each upper level groups leaf_size
        # consecutive child nodes (valid because STR ordering clusters).
        self.levels = []
        self.children = []  # (start, stop) ranges into the level below
        cur = self.boxes
        while len(cur) > 1:
            m = math.ceil(len(cur) / leaf_size)
            starts = np.arange(m, dtype=np.int64) * leaf_size
            stops = np.minimum(starts + leaf_size, len(cur))
            lvl = np.empty((m, 4))
            for g in range(m):
                seg = cur[starts[g] : stops[g]]
                lvl[g] = (
                    seg[:, 0].min(),
                    seg[:, 1].min(),
                    seg[:, 2].max(),
                    seg[:, 3].max(),
                )
            self.levels.append(lvl)
            self.children.append(np.stack([starts, stops], axis=1))
            cur = lvl

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Original indices of boxes containing (x, y)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            hit = (
                (self.boxes[:, 0] <= x)
                & (self.boxes[:, 1] <= y)
                & (self.boxes[:, 2] >= x)
                & (self.boxes[:, 3] >= y)
            )
            return self.order[np.nonzero(hit)[0]]
        # descend from the top level
        top = len(self.levels) - 1
        lvl = self.levels[top]
        nodes = np.nonzero(
            (lvl[:, 0] <= x) & (lvl[:, 1] <= y) & (lvl[:, 2] >= x) & (lvl[:, 3] >= y)
        )[0]
        for d in range(top, -1, -1):
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            ranges = self.children[d][nodes]
            idx = np.concatenate([np.arange(a, b) for a, b in ranges])
            child = self.levels[d - 1] if d > 0 else self.boxes
            seg = child[idx]
            hit = (
                (seg[:, 0] <= x) & (seg[:, 1] <= y) & (seg[:, 2] >= x) & (seg[:, 3] >= y)
            )
            nodes = idx[hit]
        return self.order[nodes]

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query → (point_idx, box_idx) candidate pairs, fully
        vectorized.

        Small trees (≤ 512 boxes) use a dense broadcast containment test —
        cheaper than any traversal at batch sizes in the thousands. Larger
        trees use level-synchronous frontier expansion: one (point, node)
        pair array per level, expanded with numpy repeats — no Python
        per-point loop.
        """
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n == 0 or len(xs) == 0:
            return empty

        if self.n <= 512:
            # dense: (n_points, n_boxes) broadcast — vectorized end to end
            b = self.boxes
            hit = (
                (b[None, :, 0] <= xs[:, None])
                & (b[None, :, 1] <= ys[:, None])
                & (b[None, :, 2] >= xs[:, None])
                & (b[None, :, 3] >= ys[:, None])
            )
            p_idx, slot = np.nonzero(hit)
            return p_idx, self.order[slot]

        # frontier descent: start every point at every top-level node hit
        top = len(self.levels) - 1
        lvl = self.levels[top]
        hit = (
            (lvl[None, :, 0] <= xs[:, None])
            & (lvl[None, :, 1] <= ys[:, None])
            & (lvl[None, :, 2] >= xs[:, None])
            & (lvl[None, :, 3] >= ys[:, None])
        )
        p_idx, nodes = np.nonzero(hit)
        for d in range(top, -1, -1):
            if len(nodes) == 0:
                return empty
            ranges = self.children[d][nodes]
            counts = ranges[:, 1] - ranges[:, 0]
            # expand each (point, node) pair to its children
            child_idx = np.repeat(ranges[:, 0], counts) + (
                np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
            )
            p_exp = np.repeat(p_idx, counts)
            child = self.levels[d - 1] if d > 0 else self.boxes
            seg = child[child_idx]
            px = xs[p_exp]
            py = ys[p_exp]
            ok = (
                (seg[:, 0] <= px) & (seg[:, 1] <= py)
                & (seg[:, 2] >= px) & (seg[:, 3] >= py)
            )
            p_idx = p_exp[ok]
            nodes = child_idx[ok]
        return p_idx, self.order[nodes]

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch box-overlap query → (query_idx, box_idx) pairs of CLOSED
        bbox intersections, same vectorization strategy as
        ``query_points`` (dense broadcast for small trees, level-
        synchronous frontier descent above 512 boxes)."""
        q = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n == 0 or len(q) == 0:
            return empty

        def _overlap(seg, qi):
            return (
                (seg[:, 0] <= q[qi, 2]) & (seg[:, 2] >= q[qi, 0])
                & (seg[:, 1] <= q[qi, 3]) & (seg[:, 3] >= q[qi, 1])
            )

        if self.n <= 512:
            b = self.boxes
            hit = (
                (b[None, :, 0] <= q[:, None, 2])
                & (b[None, :, 2] >= q[:, None, 0])
                & (b[None, :, 1] <= q[:, None, 3])
                & (b[None, :, 3] >= q[:, None, 1])
            )
            q_idx, slot = np.nonzero(hit)
            return q_idx, self.order[slot]

        top = len(self.levels) - 1
        lvl = self.levels[top]
        hit = (
            (lvl[None, :, 0] <= q[:, None, 2])
            & (lvl[None, :, 2] >= q[:, None, 0])
            & (lvl[None, :, 1] <= q[:, None, 3])
            & (lvl[None, :, 3] >= q[:, None, 1])
        )
        q_idx, nodes = np.nonzero(hit)
        for d in range(top, -1, -1):
            if len(nodes) == 0:
                return empty
            ranges = self.children[d][nodes]
            counts = ranges[:, 1] - ranges[:, 0]
            child_idx = np.repeat(ranges[:, 0], counts) + (
                np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
            )
            q_exp = np.repeat(q_idx, counts)
            child = self.levels[d - 1] if d > 0 else self.boxes
            ok = _overlap(child[child_idx], q_exp)
            q_idx = q_exp[ok]
            nodes = child_idx[ok]
        return q_idx, self.order[nodes]
