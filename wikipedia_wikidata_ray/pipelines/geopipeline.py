"""Flagship pipeline: extract → encode → spatial-join → tile
(BASELINE.json metric: "pages/sec end-to-end extract→H3-encode→
spatial-join→tile").

Every stage is a streaming ``Dataset`` transform; nothing materializes the
full page set. Stage shapes (SURVEY.md §7):

  read_parquet(pages, columns pruned)
    → map_batches(extract_batch)                     # I1, stateless tasks
    → map_batches(encode_batch)                      # I2/I3/I6, stateless
    → map_batches(PIPMultiJoiner, actor pool, ray.put polygons)  # I4
    → map_batches(KNNJoiner, actor pool, ray.put places)         # I5
    → partial-agg tile groupby                       # I6 + I7 skew-safe

The small sides (polygon set ~77 rings, places ~2k rows) are broadcast
once via ``ray.put`` and fetched once per actor in ``__init__`` — never
re-shipped per batch.
"""

from __future__ import annotations

import ray
import ray.data as rd
from ray.data import Dataset

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo.knn import KNNJoiner
from ..geo.pip import PIPMultiJoiner, PolygonSet
from ..sources.admin_fixtures import admin_polygons_table, places_dict
from ..sources.pages_gen import ensure_pages_parquet
from ..stages.extract import extract_batch, outlinks_batch
from ..stages.geocode import encode_batch
from ..stages.salted import partial_count


def _pool_max(floor: int = 4) -> int:
    """Actor-pool upper bound scaled to the session's CPU budget — pools
    must grow with cluster size or added nodes sit idle."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", floor))
    except Exception:
        cpus = floor
    return max(floor, cpus)


EXTRACT_COLUMNS = ["url", "html", "lang"]


def load_pages(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    """pages Dataset for an sf dir (generating the parquet if absent).

    Defaults to the columns the extract stage consumes — ``text`` and
    ``warc_ts`` never leave storage unless asked for (prune-at-the-read:
    the stored ``text`` column is the golden for tests, not a pipeline
    input; extraction re-derives it from ``html``)."""
    path = ensure_pages_parquet(sf_dir)
    return rd.read_parquet(path, columns=columns or EXTRACT_COLUMNS)


def extract(pages: Dataset, cfg: EngineConfig = DEFAULT_CONFIG, emit: str = "extracted") -> Dataset:
    """HTML → EXTRACTED rows (or outlink edges).

    Stateless Arrow-kernel transform → task-based ``map_batches``
    (SURVEY.md §4: stateless parse stages are tasks, not actor pools — no
    pool ramp-up, parallelism = cluster width immediately). Batch size kept
    moderate because ``html`` is a wide binary column."""
    fn = outlinks_batch if emit == "outlinks" else extract_batch
    return pages.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=cfg.batch_size_extract,
    )


def geocode(extracted: Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> Dataset:
    return extracted.map_batches(
        lambda b: encode_batch(b, cfg), batch_format="pyarrow",
        batch_size=cfg.batch_size_default,
    )


# Per-worker-process state memo for task-mode stateful stages: an index is
# built at most once per (worker, broadcast-ref) — the task-based twin of
# actor-pool __init__ state (see EngineConfig.spatial_stage_mode).
_WORKER_STATE: dict = {}


def _stateful_stage(ds: Dataset, cfg: EngineConfig, builder_cls, ctor_args: tuple, memo_key: str) -> Dataset:
    if cfg.spatial_stage_mode == "actors":
        return ds.map_batches(
            builder_cls,
            fn_constructor_args=ctor_args,
            batch_format="pyarrow",
            batch_size=cfg.batch_size_default,
            concurrency=(1, _pool_max()),
            num_cpus=1,
        )

    def fn(batch):
        st = _WORKER_STATE.get(memo_key)
        if st is None:
            # one live index per stage kind: every pipeline construction
            # creates a fresh ray.put ref, so long-lived workers would
            # otherwise accumulate one index per run (looped benches, the
            # oracle checker) with no eviction.
            kind = memo_key.split("-", 1)[0]
            for stale in [k for k in _WORKER_STATE if k.split("-", 1)[0] == kind]:
                del _WORKER_STATE[stale]
            st = _WORKER_STATE[memo_key] = builder_cls(*ctor_args)
        return st(batch)

    return ds.map_batches(
        fn, batch_format="pyarrow", batch_size=cfg.batch_size_default
    )


def pip_join(ds: Dataset, cfg: EngineConfig = DEFAULT_CONFIG, polygons=None) -> Dataset:
    """Both admin levels (country rectangle grid → ``admin_code``, metro
    hexagons → ``metro_code``) in ONE stateful stage: STRtrees built once
    per worker/actor from a single ``ray.put`` broadcast ref.
    ``cfg.pip_mode`` selects the exact per-point joiner or its
    bitwise-identical raster-accelerated twin."""
    if cfg.pip_mode == "raster":
        return pip_join_rasterized(ds, cfg, polygons)
    polys = PolygonSet.from_arrow(polygons if polygons is not None else admin_polygons_table())
    ref = ray.put(polys)
    specs = ((0, "admin_code"), (1, "metro_code"))
    return _stateful_stage(
        ds, cfg, PIPMultiJoiner, (ref, specs), memo_key=f"pip-{ref.hex()}"
    )


def pip_join_rasterized(ds: Dataset, cfg: EngineConfig = DEFAULT_CONFIG, polygons=None) -> Dataset:
    """Raster-accelerated twin of ``pip_join`` (geo/pip_raster.py):
    per-tile memoized classification, exact refine only for tiles a
    polygon edge crosses. Bitwise-identical output (pytest + shared
    oracle); the fast path amortizes megacity-hot batches to one
    classification per occupied tile per worker."""
    from ..geo.pip_raster import RasterPIPJoiner

    polys = PolygonSet.from_arrow(polygons if polygons is not None else admin_polygons_table())
    ref = ray.put(polys)
    specs = ((0, "admin_code"), (1, "metro_code"))
    return _stateful_stage(
        ds, cfg, RasterPIPJoiner, (ref, specs), memo_key=f"pipraster-{ref.hex()}"
    )


def knn_join(ds: Dataset, cfg: EngineConfig = DEFAULT_CONFIG, key_cols=("doc_id",)) -> Dataset:
    ref = ray.put(places_dict())
    return _stateful_stage(
        ds,
        cfg,
        KNNJoiner,
        (ref, cfg.knn_k, tuple(key_cols)),
        memo_key=f"knn-{ref.hex()}-{cfg.knn_k}-{key_cols}",
    )


def tile_aggregate(ds: Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> Dataset:
    """Per-tile page counts. Combiner pre-aggregation keeps megacity tiles
    from overloading one reducer (SURVEY.md §2.I7)."""
    import pyarrow.compute as pc

    geo = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tile_x"])).select(["tile_x", "tile_y"]),
        batch_format="pyarrow",
    )
    return partial_count(geo, ["tile_x", "tile_y"], out="n_pages")


def flagship(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> Dataset:
    """End-to-end: pages → extract → encode → PIP → tile aggregate.

    Returns the per-tile aggregate (small, stable schema) — the consuming
    step for smoke checks; bench.py additionally drives the kNN branch.
    """
    pages = load_pages(sf_dir)
    ex = extract(pages, cfg)
    enc = geocode(ex, cfg)
    joined = pip_join(enc, cfg)
    return tile_aggregate(joined, cfg)
