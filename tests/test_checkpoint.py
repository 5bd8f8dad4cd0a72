"""I8 checkpoint/lineage/resume semantics (SURVEY.md §5 item (f)):
kill mid-run → restart → identical final output, completed shards not
recomputed."""

from __future__ import annotations

import json
import os

import pytest

from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
from wikipedia_wikidata_ray.pipelines.checkpointed import (
    _shard_pipeline,
    config_fingerprint,
    flagship_checkpointed,
)
from wikipedia_wikidata_ray.sources.pages_gen import ensure_bench_pages_parquet
from wikipedia_wikidata_ray.state.checkpoint import (
    CheckpointedRun,
    shard_files,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    return ensure_bench_pages_parquet(SF, 1)


def _files(pages_dir):
    return [
        os.path.join(pages_dir, f)
        for f in sorted(os.listdir(pages_dir))
        if f.endswith(".parquet")
    ]


def test_failure_then_resume(pages_dir, tmp_path):
    out = str(tmp_path / "ckpt")
    cfg = DEFAULT_CONFIG
    shards = shard_files(_files(pages_dir), 4)
    run = CheckpointedRun(out, "flagship_tiles", config_fingerprint(cfg))
    good = _shard_pipeline(cfg)

    calls = {"n": 0}

    def failing(files):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("injected mid-run failure")
        return good(files)

    with pytest.raises(RuntimeError, match="injected"):
        run.run(shards, failing, max_concurrent=1)

    # exactly the first two shards committed, each with a valid manifest
    lineage = run.lineage()
    assert sorted(lineage) == [0, 1]
    m = lineage[0]
    assert m["pipeline"] == "flagship_tiles"
    assert m["rows"] > 0
    assert [i["path"] for i in m["inputs"]] == sorted(shards[0])

    # resume: completed shards skipped, the rest computed
    mtime_before = os.path.getmtime(os.path.join(out, "shard=0", "_MANIFEST.json"))
    results = run.run(shards, good, max_concurrent=1)
    assert [r.skipped for r in results] == [True, True, False, False]
    assert os.path.getmtime(
        os.path.join(out, "shard=0", "_MANIFEST.json")
    ) == mtime_before  # not recomputed

    # re-running a complete run touches nothing
    results2 = run.run(shards, good)
    assert all(r.skipped for r in results2)


def test_resumed_output_matches_single_shot(pages_dir, tmp_path):
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines import geopipeline as gp

    cfg = DEFAULT_CONFIG
    out = str(tmp_path / "ckpt2")
    merged = flagship_checkpointed(pages_dir, out, cfg, num_shards=4).to_pandas()

    import ray.data as rd

    single = gp.tile_aggregate(
        gp.pip_join(gp.geocode(gp.extract(rd.read_parquet(pages_dir), cfg), cfg), cfg),
        cfg,
    ).to_pandas()

    canon = lambda df: df.sort_values(list(df.columns), ignore_index=True)
    pd.testing.assert_frame_equal(canon(merged), canon(single))


def test_config_change_invalidates_shards(pages_dir, tmp_path):
    out = str(tmp_path / "ckpt3")
    cfg = DEFAULT_CONFIG
    shards = shard_files(_files(pages_dir), 2)
    run = CheckpointedRun(out, "flagship_tiles", config_fingerprint(cfg))
    run.run(shards, _shard_pipeline(cfg))

    run2 = CheckpointedRun(out, "flagship_tiles", "different-config")
    results = run2.run(shards, _shard_pipeline(cfg))
    assert all(not r.skipped for r in results)  # stale manifests not trusted


def test_manifest_is_lineage_complete(pages_dir, tmp_path):
    out = str(tmp_path / "ckpt4")
    cfg = DEFAULT_CONFIG
    shards = shard_files(_files(pages_dir), 2)
    CheckpointedRun(out, "flagship_tiles", config_fingerprint(cfg)).run(
        shards, _shard_pipeline(cfg)
    )
    with open(os.path.join(out, "shard=1", "_MANIFEST.json")) as f:
        m = json.load(f)
    for key in (
        "schema_version",
        "pipeline",
        "engine_version",
        "inputs",
        "input_fingerprint",
        "config_fingerprint",
        "rows",
    ):
        assert key in m
    assert all("bytes" in i for i in m["inputs"])


def test_same_size_corruption_invalidates_shard(pages_dir, tmp_path):
    """A byte-flipped (same-size) input must fail manifest admission and
    force recompute — path+size fingerprints alone cannot see it."""
    import shutil

    src = _files(pages_dir)
    data_dir = tmp_path / "inputs"
    data_dir.mkdir()
    files = []
    for f in src:
        dst = str(data_dir / os.path.basename(f))
        shutil.copy(f, dst)
        files.append(dst)

    out = str(tmp_path / "ckpt5")
    cfg = DEFAULT_CONFIG
    shards = shard_files(files, 2)
    run = CheckpointedRun(out, "flagship_tiles", config_fingerprint(cfg))
    run.run(shards, _shard_pipeline(cfg))

    # flip one byte mid-file in the first shard's first input (size unchanged)
    victim = sorted(shards[0])[0]
    size = os.path.getsize(victim)
    with open(victim, "r+b") as f:
        f.seek(size // 2)
        b = f.read(1)
        f.seek(size // 2)
        f.write(bytes([b[0] ^ 0xFF]))
    assert os.path.getsize(victim) == size

    # admission check: the corrupted shard's manifest no longer matches its
    # inputs (content digest diverges) → would be recomputed; the untouched
    # shard still admits. (No actual recompute here — the flipped byte makes
    # the parquet unreadable, which is the point: the OLD path+size
    # fingerprint would have silently SKIPPED this shard.)
    assert run.completed_manifest(0, shards[0]) is None
    assert run.completed_manifest(1, shards[1]) is not None


def test_orphan_shards_dropped_on_smaller_layout(pages_dir, tmp_path):
    """Re-running into the same out_dir with fewer shards must not merge
    stale shard dirs from the old layout into the output."""
    out = str(tmp_path / "ckpt6")
    cfg = DEFAULT_CONFIG
    files = _files(pages_dir)
    run = CheckpointedRun(out, "flagship_tiles", config_fingerprint(cfg))
    run.run(shard_files(files, 4), _shard_pipeline(cfg))
    rows_4 = run.output_dataset().count()

    run.run(shard_files(files, 2), _shard_pipeline(cfg))
    dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert sorted(dirs) == ["shard=0", "shard=1"]
    # same logical output (tile aggregate is shard-count dependent in row
    # grouping but the union of shard outputs covers the same pages; with
    # orphans present rows would roughly double)
    rows_2 = run.output_dataset().count()
    assert rows_2 <= rows_4 * 1.1
