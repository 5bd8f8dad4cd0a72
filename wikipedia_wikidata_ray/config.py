"""Engine configuration.

Replaces the reference's env-var + config-file surface
(``complete_run.sh:22-27``, ``lib/languages.py:4-12``,
``config/languages.txt``) with one typed config object.
"""

from __future__ import annotations

from dataclasses import dataclass


# The reference ships 39 languages (config/languages.txt:2-40). We keep the
# same list as the default language universe; fixture data uses a subset.
DEFAULT_LANGUAGES: tuple[str, ...] = (
    "ar", "bg", "ca", "cs", "da", "de", "en", "es", "eo", "eu", "fa", "fr",
    "gl", "hu", "id", "it", "ja", "ko", "lt", "ms", "nl", "nn", "no", "pl",
    "pt", "ro", "ru", "sk", "sl", "sr", "sv", "tr", "uk", "vi", "vo", "war",
    "zh", "ceb", "he",
)


@dataclass(frozen=True)
class EngineConfig:
    """Typed engine configuration (SURVEY.md §2.H).

    Attributes mirror the knobs that matter at 100 TB scale:

    - ``hex_resolutions``: hierarchical hex-cell resolutions computed per
      point (north rule: res 5..9).
    - ``s2_level``: S2 cell level for the ``s2_cell`` column.
    - ``tile_zoom``: slippy-tile zoom for raster/vector tile assignment.
    - ``salt_fanout``: number of sub-buckets a hot key is split into during
      salted two-stage aggregation (SURVEY.md §2.I7).
    - ``hot_cell_threshold``: rows-per-key above which a key counts as hot.
    - ``pip_pool`` / ``knn_pool``: actor-pool sizes for the stateful spatial
      stages (SURVEY.md §2.C4/C5).
    - ``batch_size_*``: map_batches batch sizes; ``html`` is a wide binary
      column so the extract stage uses a smaller batch.
    """

    languages: tuple[str, ...] = DEFAULT_LANGUAGES
    hex_resolutions: tuple[int, ...] = (5, 6, 7, 8, 9)
    s2_level: int = 16
    tile_zoom: int = 12
    salt_fanout: int = 16
    hot_cell_threshold: int = 50_000
    pip_pool: int = 4
    knn_pool: int = 4
    knn_k: int = 5
    batch_size_extract: int = 4096
    batch_size_default: int = 8192
    # "tasks": stateful spatial stages run as task-based map_batches with a
    # per-worker-process memo of the built index (state still constructed
    # once per worker from the ray.put broadcast, but no dedicated actor
    # processes to cold-start — measured 2× faster end-to-end for the
    # light fixture indexes). "actors": dedicated autoscaling actor pool —
    # the right mode when the index is heavy (GB-scale polygon sets) and
    # must not be rebuilt per worker pool churn.
    spatial_stage_mode: str = "tasks"
    # "exact": per-point crossing-number PIP (geo/pip.py). "raster":
    # per-tile memoized classification with exact boundary refine
    # (geo/pip_raster.py) — bitwise-identical output (pytest row
    # equality), and the A/B (tools/ab_pip_raster.py, BENCH_ab_pip_r4
    # .json: raster ≤ exact in every interleaved pair, combined bests
    # 3.76 vs 4.70 s end-to-end at 1M pages) made it the default. The
    # gap widens with polygon count (memo amortizes ray casting) and
    # with megacity skew (hot tiles classify once).
    pip_mode: str = "raster"

    def language_set(self) -> frozenset[str]:
        return frozenset(self.languages)

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Reference-compatible env surface: ``LANGUAGES=de,fr,it,en``
        overrides the language universe (lib/languages.py:4-6,
        tests/run.sh:9-13); explicit kwargs win over env."""
        import os

        if "languages" not in overrides and os.environ.get("LANGUAGES"):
            overrides["languages"] = tuple(
                s for s in os.environ["LANGUAGES"].split(",") if s
            )
        return cls(**overrides)


DEFAULT_CONFIG = EngineConfig()


def tune_data_context() -> None:
    """Engine-wide Ray Data context tuning (idempotent; never inits Ray).

    ``use_polars_sort``: polars-backed range-partitioned sort is ~5× faster
    than the default path on this workload (measured on the 400 K-row tile
    merge) and backs every wide op we issue (sort / groupby merge).
    """
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.use_polars_sort = True
    except Exception:
        pass

    # Workaround for a Ray 2.49 bug: path_util._is_http_filesystem catches
    # only ModuleNotFoundError, but when two driver THREADS create Datasets
    # concurrently (our concurrent checkpoint shards) the fsspec http
    # import (aiohttp absent here) surfaces as a plain ImportError
    # ("cannot import name 'HTTPFileSystem'") and crashes the read. Wrap it
    # to treat any ImportError as "not an http filesystem".
    try:
        from ray.data.datasource import path_util as _pu

        if getattr(_pu._is_http_filesystem, "__name__", "") != "_safe_is_http":
            _orig = _pu._is_http_filesystem

            def _safe_is_http(fs):
                try:
                    return _orig(fs)
                except ImportError:
                    return False

            _pu._is_http_filesystem = _safe_is_http
    except Exception:
        pass
