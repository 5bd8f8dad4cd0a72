"""Round-5 operator suite bench: best-of-two wall times for the new
geo × webtext cross operators at sf0.1, one JSON line with the embedded
host probe (the BASELINE.md evidence convention — ratios/pairs quoted
only from saved JSON). Run standalone:

    python tools/bench_r5_suite.py [sf_dir]

Same session policy as bench.py (all sections best-of-two in one fresh
process); the probe self-documents the host phase.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_probe() -> dict:
    import numpy as np

    t0 = time.time()
    a = np.random.rand(2000, 2000)
    _ = a @ a
    t1 = time.time()
    x = np.empty(64 * 1024 * 1024 // 8)
    x[::512] = 1.0
    t2 = time.time()
    return {
        "matmul_2k_sec": round(t1 - t0, 3),
        "fault_64mb_sec": round(t2 - t1, 3),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    probe = host_probe()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            logging_level="ERROR",
        )

    from wikipedia_wikidata_ray.pipelines import queries as q
    from wikipedia_wikidata_ray.pipelines import temporal_media as tm
    from wikipedia_wikidata_ray.pipelines import trainingdata as td
    from wikipedia_wikidata_ray.pipelines import webtext as wt

    sections = {
        "tile_lang_entropy": lambda: q.q_tile_lang_entropy(sf_dir)
        .materialize()
        .count(),
        "spatial_joincount": lambda: q.q_spatial_joincount(sf_dir)
        .materialize()
        .count(),
        "tile_dup_stats": lambda: q.q_tile_dup_stats(sf_dir)
        .materialize()
        .count(),
        "tile_quality_stats": lambda: q.q_tile_quality_stats(sf_dir)
        .materialize()
        .count(),
        "tile_top_terms": lambda: wt.q_tile_top_terms(sf_dir)
        .materialize()
        .count(),
        "tile_hotspots": lambda: q.q_tile_hotspots(sf_dir)
        .materialize()
        .count(),
        "tile_embedding_centroids": lambda: q.q_tile_embedding_centroids(
            sf_dir
        )
        .materialize()
        .count(),
        "tile_dwell_time": lambda: tm.q_tile_dwell_time(sf_dir)
        .materialize()
        .count(),
        "zone_event_counts": lambda: q.q_zone_event_counts(sf_dir)
        .materialize()
        .count(),
        "region_ann_topk": lambda: td.q_region_ann_topk(sf_dir)
        .materialize()
        .count(),
    }
    runs: dict[str, list[float]] = {k: [] for k in sections}
    rows: dict[str, int] = {}
    for _ in range(2):
        for name, fn in sections.items():
            gc.collect()
            t0 = time.perf_counter()
            rows[name] = fn()
            runs[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "metric": "round-5 operator suite best-of-two wall sec",
        "sections": {k: min(v) for k, v in runs.items()},
        "runs": runs,
        "rows": rows,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "host_probe": probe,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
