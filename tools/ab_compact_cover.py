"""A/B: round-4 per-level compact cover (six materialize barriers) vs the
round-5 single-pass sorted_group_apply on the z6 ancestor key — over the
1M-page bench corpus, interleaved fresh processes, best-of-two per leg,
host probe embedded (the round-4 timing-evidence policy).

Usage: python tools/ab_compact_cover.py [repeats]
Prints one JSON line: per-mode run lists + bests + row counts + probe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LEG = r"""
import os, sys, time, json
import ray, ray.data as rd
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from wikipedia_wikidata_ray.config import DEFAULT_CONFIG as cfg
from wikipedia_wikidata_ray.pipelines import geopipeline as gp
from wikipedia_wikidata_ray.pipelines.queries import (
    compact_cover_pipeline, compact_cover_pipeline_leveled)
from wikipedia_wikidata_ray.sources.pages_gen import ensure_bench_pages_parquet

pages_path = ensure_bench_pages_parquet(
    os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    int(os.environ.get("GRAFT_PAGES_MULT", "200")),
)
import glob
paths = sorted(glob.glob(os.path.join(pages_path, "*"))) if os.path.isdir(pages_path) else [pages_path]
for p in paths:
    with open(p, "rb") as fh:
        while fh.read(1 << 24):
            pass
def _warm(b):
    import numpy as _np
    import wikipedia_wikidata_ray as _pkg
    if not getattr(_pkg, "_mem_warmed", False):
        s = _np.empty(128 << 20, dtype=_np.uint8); s[::4096] = 1; del s
        _pkg._mem_warmed = True
    return {"id": b["id"]}
rd.range(int(ray.cluster_resources()["CPU"]) * 4).map_batches(_warm, batch_size=1).count()

mode = sys.argv[1]
pipe = compact_cover_pipeline_leveled if mode == "leveled" else compact_cover_pipeline
vals, rows = [], None
for _ in range(2):
    ds = rd.read_parquet(pages_path, columns=gp.EXTRACT_COLUMNS)
    t0 = time.perf_counter()
    rows = pipe(gp.geocode(gp.extract(ds, cfg), cfg)).materialize().count()
    vals.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"mode": mode, "runs": vals, "best": min(vals), "cells": rows}))
ray.shutdown()
"""


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _host_probe

    probe = _host_probe()
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = {"host_probe": probe, "legs": []}
    for _ in range(repeats):
        for mode in ("leveled", "single"):  # interleaved
            r = subprocess.run(
                [sys.executable, "-c", LEG, mode],
                capture_output=True, text=True, timeout=1200,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            out["legs"].append(json.loads(line[-1]) if line else {"mode": mode, "error": r.stderr[-300:]})
    for mode in ("leveled", "single"):
        bests = [lg["best"] for lg in out["legs"] if lg.get("mode") == mode and "best" in lg]
        if bests:
            out[f"{mode}_best"] = min(bests)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
