"""Forced >limit plans for the round-5c gates (bloom verify, FK parent
attach) vs their broadcast plans at sf0.1 — the bench-exercise-the-
fallback policy (round-4 verdict #4): every gate's at-scale plan gets a
TIMED run with rows asserted equal, not just a plan-equality pytest.
One JSON line, best-of-two interleaved, embedded host probe.

    python tools/bench_r5c_forced.py [sf_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_r5b_suite import host_probe  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    probe = host_probe()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from wikipedia_wikidata_ray.pipelines.profiling import q_fk_orphan_audit
    from wikipedia_wikidata_ray.pipelines.relational import (
        q_bloom_semijoin_revenue)

    sections = {
        "bloom_verify_broadcast": lambda: q_bloom_semijoin_revenue(sf_dir)
        .materialize()
        .count(),
        "bloom_verify_forced_join": lambda: q_bloom_semijoin_revenue(
            sf_dir, verify_broadcast_limit=0
        )
        .materialize()
        .count(),
        "fk_audit_broadcast": lambda: q_fk_orphan_audit(sf_dir)
        .materialize()
        .count(),
        "fk_audit_forced_join": lambda: q_fk_orphan_audit(
            sf_dir, parent_broadcast_limit=0
        )
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
    best = {k: min(v) for k, v in runs.items()}
    assert rows["bloom_verify_broadcast"] == rows["bloom_verify_forced_join"]
    assert rows["fk_audit_broadcast"] == rows["fk_audit_forced_join"]
    out = {
        "metric": "round-5c forced >limit plans vs broadcast, best-of-two wall sec",
        "sections": best,
        "runs": runs,
        "rows": rows,
        "ratios": {
            "bloom_verify": round(
                best["bloom_verify_forced_join"]
                / best["bloom_verify_broadcast"], 3
            ),
            "fk_audit": round(
                best["fk_audit_forced_join"] / best["fk_audit_broadcast"], 3
            ),
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "host_probe": probe,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
