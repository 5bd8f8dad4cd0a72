"""Checkpointed flagship pipeline (SURVEY.md §2.I8 + §7 step 7).

Splits the pages corpus into input-file shards; each shard runs the heavy
extract → encode → PIP stages and lands its PRE-AGGREGATED tile partials
in ``out_dir/shard=<id>/`` with a lineage manifest (state/checkpoint.py).
The global tile merge is exact over per-shard partials (commutative sums)
and cheap, so resume recomputes only missing shards + the final merge —
the heavy per-page work is never repeated after a failure.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.salted import _partial_count_batch, merge_group_sums
from ..state.checkpoint import CheckpointedRun, shard_files
from . import geopipeline as gp


def _shard_pipeline(cfg: EngineConfig):
    def fn(files: Sequence[str]) -> Dataset:
        pages = rd.read_parquet(list(files))
        joined = gp.pip_join(gp.geocode(gp.extract(pages, cfg), cfg), cfg)
        geo = joined.map_batches(
            lambda t: t.filter(pc.is_valid(t["tile_x"])).select(
                ["tile_x", "tile_y"]
            ),
            batch_format="pyarrow",
        )
        return geo.map_batches(
            _partial_count_batch(["tile_x", "tile_y"], "n_pages"),
            batch_format="pyarrow",
        )

    return fn


def config_fingerprint(cfg: EngineConfig) -> str:
    import hashlib

    return hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]


def flagship_checkpointed(
    pages_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_shards: int = 8,
) -> Dataset:
    """Resumable flagship: returns the merged per-tile counts; all heavy
    work is checkpointed per shard under ``out_dir``."""
    from ..sources.catalog import catalog_parquet_dir

    # A1-style admission: every input file must be complete and readable
    files = [
        f.path
        for f in catalog_parquet_dir(
            pages_dir, expect_schema_names=["url", "html", "lang"]
        )
    ]
    run = CheckpointedRun(
        out_dir, pipeline="flagship_tiles", config_fingerprint=config_fingerprint(cfg)
    )
    run.run(shard_files(files, num_shards), _shard_pipeline(cfg))
    return merge_group_sums(run.output_dataset(), ["tile_x", "tile_y"], ["n_pages"])
