"""Per-partition checkpoint + lineage (SURVEY.md §2.I8; north rule:
"every partition carries lineage metadata so the job resumes from
per-partition checkpoints after failure").

Model — the Ray-Data re-expression of the reference's skip-if-exists
caching (steps/wikipedia_download.sh:22-25) and DROP-recreate idempotent
steps (steps/wikipedia_import.sh:29):

- the input is split into deterministic **shards** (groups of input
  files — at 100 TB, one shard ≈ one input prefix/partition, with
  shards ≫ nodes so each shard's Dataset pipeline still saturates the
  cluster);
- each shard runs the full pipeline and lands in
  ``out_dir/shard=<id>/`` via write-to-tmp + atomic rename — the rename
  is the commit point, so a killed run leaves either nothing or a
  complete shard;
- a ``_MANIFEST.json`` inside each shard dir carries the lineage:
  exact input files (path/size), pipeline name, config fingerprint,
  engine version, output row count;
- ``resume`` = rescan manifests, recompute only shards whose manifest is
  missing or whose fingerprint/inputs changed. Output is idempotent:
  re-running a completed run touches nothing.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable, Sequence
from dataclasses import dataclass

import pyarrow.parquet as pq
from ray.data import Dataset

from .. import __version__

MANIFEST_NAME = "_MANIFEST.json"
MANIFEST_SCHEMA_VERSION = 1


_DIGEST_SAMPLE = 4 * 1024 * 1024


def content_digest(path: str, sample_bytes: int = _DIGEST_SAMPLE) -> str:
    """Content fingerprint of one input file (reference analog: the
    md5-verified downloads, steps/wikipedia_download.sh:60-66).

    Files up to 3×sample_bytes are hashed in full; larger files hash
    (size, head, middle, tail) samples so a resume scan costs O(12 MB)
    per file instead of re-reading 100 TB. Sampled hashing is a
    documented tradeoff: it catches truncation, header/footer damage and
    any corruption inside the sampled windows; full verification remains
    the ingest step's job (A2 cached-verified ingest)."""
    size = os.path.getsize(path)
    h = hashlib.sha256()
    h.update(str(size).encode())
    with open(path, "rb") as f:
        if size <= 3 * sample_bytes:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        else:
            for ofs in (0, (size - sample_bytes) // 2, size - sample_bytes):
                f.seek(ofs)
                h.update(f.read(sample_bytes))
    return h.hexdigest()[:16]


def input_fingerprint(files: Sequence[str]) -> str:
    """Deterministic digest of the exact input file set (path + size +
    content digest — a silently-corrupted same-size input invalidates
    the shard and forces recompute)."""
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(os.path.getsize(f)).encode())
        h.update(content_digest(f).encode())
    return h.hexdigest()[:16]


def shard_files(files: Sequence[str], num_shards: int) -> list[list[str]]:
    """Deterministic round-robin grouping of input files into shards."""
    files = sorted(files)
    shards: list[list[str]] = [[] for _ in range(min(num_shards, len(files)))]
    for i, f in enumerate(files):
        shards[i % len(shards)].append(f)
    return shards


@dataclass
class ShardResult:
    shard_id: int
    rows: int
    skipped: bool


class CheckpointedRun:
    """Resumable sharded execution of ``pipeline_fn`` over input shards.

    Parameters
    ----------
    out_dir : output root; one ``shard=<id>/`` parquet dir per shard.
    pipeline : logical pipeline name recorded in lineage.
    config_fingerprint : digest of the engine config that shaped the run —
        a changed config invalidates prior shards (recorded, compared).
    """

    def __init__(self, out_dir: str, pipeline: str, config_fingerprint: str = ""):
        self.out_dir = out_dir
        self.pipeline = pipeline
        self.config_fingerprint = config_fingerprint
        os.makedirs(out_dir, exist_ok=True)

    # -- manifest handling --------------------------------------------------

    def _shard_dir(self, shard_id: int) -> str:
        return os.path.join(self.out_dir, f"shard={shard_id}")

    def completed_manifest(self, shard_id: int, files: Sequence[str]) -> dict | None:
        """The shard's manifest iff it is complete AND matches the inputs +
        config of this run (stale shards are recomputed, not trusted)."""
        path = os.path.join(self._shard_dir(shard_id), MANIFEST_NAME)
        try:
            with open(path, encoding="utf-8") as f:
                m = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        if m.get("schema_version") != MANIFEST_SCHEMA_VERSION:
            return None
        if m.get("pipeline") != self.pipeline:
            return None
        if m.get("config_fingerprint") != self.config_fingerprint:
            return None
        if m.get("input_fingerprint") != input_fingerprint(files):
            return None
        return m

    # -- execution ----------------------------------------------------------

    def run_shard(
        self,
        shard_id: int,
        files: Sequence[str],
        pipeline_fn: Callable[[Sequence[str]], Dataset],
    ) -> ShardResult:
        if self.completed_manifest(shard_id, files) is not None:
            return ShardResult(shard_id, self._manifest_rows(shard_id), True)

        final_dir = self._shard_dir(shard_id)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)

        ds = pipeline_fn(files)
        ds.write_parquet(tmp_dir)
        rows = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        manifest = {
            "schema_version": MANIFEST_SCHEMA_VERSION,
            "pipeline": self.pipeline,
            "engine_version": __version__,
            "shard_id": shard_id,
            "inputs": [
                {"path": f, "bytes": os.path.getsize(f), "digest": content_digest(f)}
                for f in sorted(files)
            ],
            "input_fingerprint": input_fingerprint(files),
            "config_fingerprint": self.config_fingerprint,
            "rows": rows,
        }
        with open(os.path.join(tmp_dir, MANIFEST_NAME), "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp_dir, final_dir)  # commit point
        return ShardResult(shard_id, rows, False)

    def _drop_orphan_shards(self, active_count: int) -> None:
        """Remove committed shard dirs whose id falls outside the current
        shard layout (id >= active_count). Without this, re-running into the
        same out_dir with fewer shards silently merges stale shards from the
        old layout into output_dataset()/lineage() — the exact staleness the
        per-shard fingerprints exist to prevent."""
        for d in os.listdir(self.out_dir):
            if not d.startswith("shard="):
                continue
            sid = d[len("shard="):].split(".")[0]
            if not sid.isdigit() or int(sid) < active_count:
                continue
            shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)

    def _manifest_rows(self, shard_id: int) -> int:
        with open(
            os.path.join(self._shard_dir(shard_id), MANIFEST_NAME), encoding="utf-8"
        ) as f:
            return json.load(f)["rows"]

    def run(
        self,
        shards: Sequence[Sequence[str]],
        pipeline_fn: Callable[[Sequence[str]], Dataset],
        max_concurrent: int = 4,
    ) -> list[ShardResult]:
        """Execute all shards, skipping completed ones.

        Up to ``max_concurrent`` shard pipelines run at once (driver
        threads; each is an independent Ray Data streaming pipeline, so
        while one shard is in its shuffle tail another keeps the cluster's
        map slots busy). Failure isolation stays per-shard: one failing
        shard doesn't roll back committed ones. The first exception is
        re-raised after in-flight shards finish."""
        from concurrent.futures import ThreadPoolExecutor

        self._drop_orphan_shards(len(shards))
        results: list[ShardResult | None] = [None] * len(shards)
        if max_concurrent <= 1:
            return [
                self.run_shard(i, files, pipeline_fn)
                for i, files in enumerate(shards)
            ]
        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futs = {
                pool.submit(self.run_shard, i, files, pipeline_fn): i
                for i, files in enumerate(shards)
            }
            first_err: Exception | None = None
            for fut in list(futs):
                try:
                    results[futs[fut]] = fut.result()
                except Exception as e:  # noqa: BLE001 — re-raised below
                    if first_err is None:
                        first_err = e
            if first_err is not None:
                raise first_err
        return [r for r in results if r is not None]

    # -- consumption --------------------------------------------------------

    def output_dataset(self) -> Dataset:
        import ray.data as rd

        dirs = [
            os.path.join(self.out_dir, d)
            for d in sorted(os.listdir(self.out_dir))
            if d.startswith("shard=") and not d.endswith(".tmp")
        ]
        files = [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        return rd.read_parquet(files)

    def lineage(self) -> dict[int, dict]:
        """shard_id → manifest for every committed shard."""
        out: dict[int, dict] = {}
        for d in sorted(os.listdir(self.out_dir)):
            if not d.startswith("shard=") or d.endswith(".tmp"):
                continue
            try:
                with open(
                    os.path.join(self.out_dir, d, MANIFEST_NAME), encoding="utf-8"
                ) as f:
                    m = json.load(f)
                out[m["shard_id"]] = m
            except (FileNotFoundError, json.JSONDecodeError):
                continue
        return out
