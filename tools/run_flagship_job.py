"""Job-submission entry point for the flagship pipeline.

On a real multi-node cluster this runs as

    ray job submit --working-dir . -- python tools/run_flagship_job.py \\
        --pages /data/pages --out /data/tiles_out --shards 512

(north rule: "run via ray job submit on fixed-size clusters"). The job is
the CHECKPOINTED flagship: shard-committed, lineage-tagged, resumable —
re-submitting after a failure skips completed shards. In this sandbox it
runs against the local session (`RAY_ADDRESS=local`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from anywhere: the package lives at the repo root (ray job
# submit ships the working dir; this mirrors that layout)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="directory of pages parquet")
    ap.add_argument("--out", required=True, help="checkpoint/output root")
    ap.add_argument("--shards", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
    from wikipedia_wikidata_ray.pipelines.checkpointed import flagship_checkpointed

    t0 = time.perf_counter()
    tiles = flagship_checkpointed(args.pages, args.out, DEFAULT_CONFIG, args.shards)
    n = tiles.count()
    print(
        json.dumps(
            {
                "job": "flagship_tiles",
                "tiles": n,
                "out": args.out,
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
