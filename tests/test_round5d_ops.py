"""Fourth round-5 session operators: brute-force / property tests.

Each operator added this session gets (a) a brute-force or closed-form
semantic check at sf0.001 and (b) where the op has a size-gated plan, a
plan-equality assertion (forced alternate plan == default plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _undirected_edges(n: int) -> set[tuple[int, int]]:
    edges = set()
    for i in range(n):
        for t in ((i * 3 + 1) % n, (i * 5 + 2) % n, i % 2):
            if t != i:
                edges.add((min(i, t), max(i, t)))
    return edges


def test_clustering_coefficients_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_clustering_coefficients,
    )

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    edges = _undirected_edges(n)
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = (
        q_clustering_coefficients(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every deg>=2 node appears, including tri==0 ones
    want_nodes = sorted(v for v, s in adj.items() if len(s) >= 2)
    assert out.doc_id.tolist() == want_nodes
    for _, row in out.iterrows():
        nbrs = adj[row.doc_id]
        deg = len(nbrs)
        tri = 0
        for x in nbrs:
            for y in nbrs:
                if x < y and (x, y) in edges:
                    tri += 1
        assert row.deg == deg
        assert row.n_triangles == tri
        # bitwise: same IEEE expression
        assert row.cc == (2.0 * tri) / (deg * (deg - 1.0))
    # semantics, not just parity: cc bounded, and some node closes a wedge
    assert (out.cc >= 0).all() and (out.cc <= 1.0).all()
    assert (out.n_triangles > 0).any()


def test_clustering_coefficients_plans_agree(ray_session):
    from wikipedia_wikidata_ray.pipelines.queries import (
        q_clustering_coefficients,
    )

    a = (
        q_clustering_coefficients(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_clustering_coefficients(SF, deg_broadcast_limit=0)  # join plan
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
