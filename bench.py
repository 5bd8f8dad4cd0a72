"""Benchmark entry point (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...}

The flagship (extract→encode→PIP→tile) runs over a deterministic
``multiplier × documents`` replicated pages corpus (default 200× = 1M pages
at sf0.1; override with GRAFT_PAGES_MULT) so throughput and scaling are
measurable — 5k raw docs finish in noise. Corpus generation is cached and
untimed.

``--scaling``: re-runs this script in fresh processes at num_cpus=8 and 32
on the SAME input and reports both throughputs + scaling efficiency
(= (t8/t32)/4). Evidence for the north rule's two-cluster-size criterion.

``--forced-plans``: times the >limit (hash-join/shuffle) plans behind the
broadcast gates with broadcast_limit=0, interleaved with the default
plans, and asserts row equality (round-5 verdict Next #4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _host_probe() -> dict:
    """One-shot host-health probe recorded in the bench JSON: this VM's
    host overcommits CPU and memory in multi-minute phases (BASELINE.md,
    round 4) — wall-clock sections are only comparable across runs whose
    probes match. Reference values on a quiet host: matmul ≈ 0.3-0.6 s,
    fault ≈ 0.05-0.3 s; observed during bad phases: 10-14 s / 11-16 s."""
    import time as _t

    import numpy as _np

    t0 = _t.perf_counter()
    x = _np.random.rand(2000, 2000)
    _ = x @ x
    matmul = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    a = _np.empty(64 << 20, dtype=_np.uint8)
    a[::4096] = 1
    fault = _t.perf_counter() - t0
    return {"matmul_2k_sec": round(matmul, 3), "fault_64mb_sec": round(fault, 3)}


def _warm_cluster(pages_path: str, num_cpus: int) -> None:
    """Page-cache + worker-pool + driver/plasma warm-up (untimed): see the
    inline notes below — this host overcommits VM memory, so first-touch
    page faults must be absorbed once per process, not inside a timed
    section."""
    import glob

    import ray
    import ray.data as rd

    # warm the OS page cache so we measure compute + shuffle, not cold disk.
    # NB: read_parquet().count() is metadata-only and touches no data pages —
    # actually stream the file bytes (measured: cold cache costs up to 3×).
    paths = (
        sorted(glob.glob(os.path.join(pages_path, "*")))
        if os.path.isdir(pages_path)
        else [pages_path]
    )
    for p in paths:
        with open(p, "rb") as fh:
            while fh.read(1 << 24):
                pass
    # warm the Ray worker pool (process spawn + package import is per-worker
    # one-time cost, not pipeline throughput): one tiny task per CPU slot.
    # Each warm task also FAULTS IN ~128 MB of worker heap: this host
    # overcommits VM memory, so first-touch page faults on fresh
    # allocations run at ~20-80 MB/s (measured; re-touch 3 GB/s, pages
    # stay resident via malloc arena reuse). Without the touch, whichever
    # section first allocates large batch temporaries absorbs multi-second
    # fault stalls and timings swing 3-5x run to run — warming moves that
    # one-time host cost out of every timed section.
    from wikipedia_wikidata_ray.stages.extract import extract_batch as _wb

    def _warm(b):
        _ = _wb  # closure forces the engine package import in each worker
        import numpy as _np

        import wikipedia_wikidata_ray as _pkg

        # ONCE per worker process: >128 MB mallocs are fresh mmaps that
        # munmap on free, so an unguarded touch would re-fault per task
        # (measured ~50 CPU-s per 256 MB task during the first attempt)
        if not getattr(_pkg, "_mem_warmed", False):
            scratch = _np.empty(128 << 20, dtype=_np.uint8)
            scratch[::4096] = 1
            del scratch
            _pkg._mem_warmed = True
        return {"id": b["id"]}

    rd.range(num_cpus * 4).map_batches(_warm, batch_size=1).count()

    # fault in driver-heap + plasma pages the same way (broadcast payloads
    # and materialized blocks live there)
    _d = __import__("numpy").empty(256 << 20, dtype="uint8")
    _d[::4096] = 1
    del _d
    _r = ray.put(__import__("numpy").zeros(512 << 20, dtype="uint8"))
    del _r


def run_bench() -> dict:
    import ray
    import ray.data as rd

    host_probe = _host_probe()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("GRAFT_PAGES_MULT", "200"))

    from wikipedia_wikidata_ray.sources.pages_gen import ensure_bench_pages_parquet

    pages_path = ensure_bench_pages_parquet(sf_dir, mult)  # cached, untimed

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
    from wikipedia_wikidata_ray.pipelines import geopipeline as gp
    from wikipedia_wikidata_ray.pipelines.queries import importance_pipeline

    import gc

    cfg = DEFAULT_CONFIG
    timings: dict[str, float] = {}
    section_runs: dict[str, list[float]] = {}

    def timed(name: str, fn):
        """Best-of-two per section (round-2 verdict #6: single-shot section
        timings don't reproduce across machine drift; the min of two runs
        of a deterministic job is the least-noise estimator — same policy
        the flagship and --scaling already used). Both runs are recorded
        in the JSON (`runs`) so BASELINE.md can quote reproducible pairs."""
        vals = []
        rows = None
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            rows = fn()
            vals.append(time.perf_counter() - t0)
        timings[name] = min(vals)
        section_runs[name] = [round(v, 3) for v in vals]
        return rows

    _warm_cluster(pages_path, num_cpus)

    from wikipedia_wikidata_ray.pipelines.geopipeline import EXTRACT_COLUMNS

    def pages_ds():
        # prune at the read: the stored `text`/`warc_ts` columns are dead
        # weight for every benchmarked pipeline (extraction re-derives text
        # from html)
        return rd.read_parquet(pages_path, columns=EXTRACT_COLUMNS)

    n_pages = pages_ds().count()
    # --scaling subprocesses time ONLY the headline (efficiency is defined
    # on it); the full bench runs every section
    headline_only = os.environ.get("GRAFT_BENCH_ONLY") == "flagship"

    # --- headline: flagship extract → encode → PIP → tile ---------------
    n_tiles = timed(
        "flagship_extract_encode_pip_tile",
        lambda: gp.tile_aggregate(
            gp.pip_join(gp.geocode(gp.extract(pages_ds(), cfg), cfg), cfg), cfg
        ).count(),
    )
    flagship_runs = section_runs["flagship_extract_encode_pip_tile"]

    if headline_only:
        headline = timings["flagship_extract_encode_pip_tile"]
        return {
            "metric": "flagship extract→encode→PIP→tile wall sec on replicated pages corpus",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "n_pages": n_pages,
            "pages_per_sec": round(n_pages / headline, 1),
            "host_probe": host_probe,
            "rows": {"tiles": n_tiles},
        }

    # --- kNN place-matching branch ---------------------------------------
    kn_rows = timed(
        "knn_places",
        lambda: gp.knn_join(gp.geocode(gp.extract(pages_ds(), cfg), cfg), cfg).count(),
    )

    # --- importance scoring (links shuffle + join + grouped sums) --------
    # runs over the SAME replicated corpus (3 links/page → 3M edges at 1M
    # pages) so the D2-analog shuffle is measured at scale
    imp_rows = timed("importance", lambda: importance_pipeline(pages_ds).count())

    # --- full relational export (D8/D9 joins + union + E6/D10 + F1 sort) --
    gc.collect()
    from wikipedia_wikidata_ray.pipelines.wikimedia import export_pipeline

    # materialize: count() alone would shortcut the final global sort
    exp_rows = timed(
        "importance_export",
        lambda: export_pipeline(pages_ds, n_pages).materialize().count(),
    )

    # --- dedup suite: exact + MinHash-LSH near-dup over a near-dup-rich
    # corpus (documents × GRAFT_DEDUP_MULT replicas, each replica's text
    # mutated with a suffix so replicas are NEAR dups: every stage —
    # vectorized signatures, banded LSH, join-based verify — does real work)
    gc.collect()
    import pyarrow as pa
    import pyarrow.compute as pc

    from wikipedia_wikidata_ray.ops.dedup import exact_dedup, minhash_lsh_pairs

    dmult = int(os.environ.get("GRAFT_DEDUP_MULT", "10"))
    docs_path = os.path.join(sf_dir, "documents.parquet")
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(docs_path).num_rows

    def replicate(t: pa.Table) -> pa.Table:
        parts = [t]
        for i in range(1, dmult):
            ids = pc.add(t["doc_id"], pa.scalar(i * n_docs, type=pa.int64()))
            suffix = pa.array([f" rep{i}"] * len(t))
            txt = pc.binary_join_element_wise(t["text"], suffix, "")
            parts.append(pa.table({"doc_id": ids, "text": txt}))
        return pa.concat_tables(parts)

    def dedup_docs():
        # documents.parquet is ONE file → one block; repartition first so
        # every downstream stage runs at cluster width, not parallelism 1
        return (
            rd.read_parquet(docs_path, columns=["doc_id", "text"])
            .repartition(num_cpus)
            .map_batches(replicate, batch_format="pyarrow")
        )

    exact_rows = timed("exact_dedup", lambda: exact_dedup(dedup_docs()).count())

    neardup_rows = timed(
        "near_dup_minhash",
        lambda: minhash_lsh_pairs(dedup_docs(), threshold=0.8).count(),
    )

    # --- corpus analysis: curation composition + sketches over the same
    # replicated doc corpus (lang carried through for the per-lang stages)
    from wikipedia_wikidata_ray.ops.sketch import (
        heavy_hitter_tokens,
        hll_token_registers,
    )
    from wikipedia_wikidata_ray.pipelines.corpusops import curate_corpus

    def replicate_lang(t: pa.Table) -> pa.Table:
        parts = [t]
        for i in range(1, dmult):
            ids = pc.add(t["doc_id"], pa.scalar(i * n_docs, type=pa.int64()))
            suffix = pa.array([f" rep{i}"] * len(t))
            txt = pc.binary_join_element_wise(t["text"], suffix, "")
            parts.append(pa.table({"doc_id": ids, "text": txt, "lang": t["lang"]}))
        return pa.concat_tables(parts)

    def curation_docs():
        return (
            rd.read_parquet(docs_path, columns=["doc_id", "text", "lang"])
            .repartition(num_cpus)
            .map_batches(replicate_lang, batch_format="pyarrow")
        )

    curation_rows = timed(
        "corpus_curation", lambda: curate_corpus(curation_docs()).materialize().count()
    )

    hh_rows = timed(
        "heavy_hitters",
        lambda: heavy_hitter_tokens(dedup_docs(), theta_denom=1000).materialize().count(),
    )

    hll_rows = timed(
        "hll_distinct", lambda: hll_token_registers(dedup_docs()).materialize().count()
    )

    from wikipedia_wikidata_ray.pipelines.webtext import tfidf_top_terms

    tfidf_rows = timed(
        "tfidf_topk",
        lambda: tfidf_top_terms(dedup_docs(), n_docs * dmult).materialize().count(),
    )

    # --- temporal: sessionize over replicated events (sorted-run idiom) --
    from wikipedia_wikidata_ray.ops.windows import sessionize

    ev_path = os.path.join(sf_dir, "events.parquet")
    n_ev = pq.read_metadata(ev_path).num_rows
    emult = int(os.environ.get("GRAFT_EVENTS_MULT", "10"))

    def replicate_events(t: pa.Table) -> pa.Table:
        parts = [t]
        for i in range(1, emult):
            uid = pc.add(t["user_id"], pa.scalar(i * 1_000_000, type=pa.int64()))
            parts.append(pa.table({"user_id": uid, "ts": t["ts"], "value": t["value"]}))
        return pa.concat_tables(parts)

    def events_ds():
        return (
            rd.read_parquet(ev_path, columns=["user_id", "ts", "value"])
            .repartition(num_cpus)
            .map_batches(replicate_events, batch_format="pyarrow")
        )

    sess_rows = timed(
        "sessionize", lambda: sessionize(events_ds(), gap_minutes=30).count()
    )

    # --- spatiotemporal: OD tile transitions over replicated events with
    # DISTINCT event_ids per replica (round 5) — each replica's events land
    # on different tiles, so the sorted-run + OD-partial merge does real
    # work at n_ev × emult rows.
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        tile_od_matrix_pipeline,
    )

    def replicate_events_geo(t: pa.Table) -> pa.Table:
        parts = [t]
        for i in range(1, emult):
            uid = pc.add(t["user_id"], pa.scalar(i * 1_000_000, type=pa.int64()))
            eid = pc.add(
                t["event_id"], pa.scalar(i * 10_000_000, type=pa.int64())
            )
            parts.append(
                pa.table({"event_id": eid, "ts": t["ts"], "user_id": uid})
            )
        return pa.concat_tables(parts)

    def events_geo_ds():
        return (
            rd.read_parquet(ev_path, columns=["event_id", "ts", "user_id"])
            .repartition(num_cpus)
            .map_batches(replicate_events_geo, batch_format="pyarrow")
        )

    od_rows = timed(
        "tile_od_matrix",
        lambda: tile_od_matrix_pipeline(events_geo_ds()).materialize().count(),
    )

    # --- tile analytics suite (round 4): pyramid rollup, compact cover,
    # grid clustering — all over the SAME 1M-page corpus (each section
    # re-runs extract+geocode end-to-end, same policy as the flagship).
    # materialize() before count(): these pipelines end in merge sorts /
    # CC rounds that count() alone would shortcut.
    from wikipedia_wikidata_ray.pipelines.queries import (
        compact_cover_pipeline,
        grid_cluster_stats_pipeline,
        tile_pyramid_pipeline,
    )

    def geo_b():
        return gp.geocode(gp.extract(pages_ds(), cfg), cfg)

    pyr_rows = timed(
        "tile_pyramid",
        lambda: tile_pyramid_pipeline(geo_b()).materialize().count(),
    )
    cover_rows = timed(
        "compact_cover",
        lambda: compact_cover_pipeline(geo_b()).materialize().count(),
    )
    cluster_rows = timed(
        "grid_cluster_stats",
        lambda: grid_cluster_stats_pipeline(geo_b()).materialize().count(),
    )

    headline = timings["flagship_extract_encode_pip_tile"]
    return {
        "metric": "flagship extract→encode→PIP→tile wall sec on replicated pages corpus",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "flagship_runs": flagship_runs,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_dedup_docs": n_docs * dmult,
        "pages_per_sec": round(n_pages / headline, 1),
        "host_probe": host_probe,
        "runs": section_runs,
        "n_events": n_ev * emult,
        "rows": {
            "tiles": n_tiles,
            "knn": kn_rows,
            "importance": imp_rows,
            "export": exp_rows,
            "exact_dedup_groups": exact_rows,
            "near_dup_pairs": neardup_rows,
            "curation_langs": curation_rows,
            "heavy_hitters": hh_rows,
            "hll_registers": hll_rows,
            "tfidf_topk": tfidf_rows,
            "sessions": sess_rows,
            "od_pairs": od_rows,
            "pyramid_cells": pyr_rows,
            "cover_cells": cover_rows,
            "clusters": cluster_rows,
        },
    }


def run_forced_plans() -> dict:
    """Bench-exercise the >limit (shuffle/hash-join) plans that normally
    hide behind the broadcast gates (round-5 verdict Next #4: every gate
    was equality-pytested at sf0.01 but never TIMED — the 100-TB story
    rested on untimed code paths). Runs importance_export and tfidf_topk
    with broadcast_limit=0 (forcing the distributed plan) interleaved
    with the default broadcast plans on the same input, best-of-two per
    section, and asserts row equality between the plans."""
    import ray
    import ray.data as rd

    host_probe = _host_probe()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("GRAFT_PAGES_MULT", "200"))

    from wikipedia_wikidata_ray.sources.pages_gen import ensure_bench_pages_parquet

    pages_path = ensure_bench_pages_parquet(sf_dir, mult)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _warm_cluster(pages_path, num_cpus)

    import gc

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.geopipeline import EXTRACT_COLUMNS
    from wikipedia_wikidata_ray.pipelines.webtext import tfidf_top_terms
    from wikipedia_wikidata_ray.pipelines.wikimedia import export_pipeline

    def pages_ds():
        return rd.read_parquet(pages_path, columns=EXTRACT_COLUMNS)

    n_pages = pages_ds().count()

    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(docs_path).num_rows
    dmult = int(os.environ.get("GRAFT_DEDUP_MULT", "10"))

    def replicate(t: pa.Table) -> pa.Table:
        parts = [t]
        for i in range(1, dmult):
            ids = pc.add(t["doc_id"], pa.scalar(i * n_docs, type=pa.int64()))
            suffix = pa.array([f" rep{i}"] * len(t))
            txt = pc.binary_join_element_wise(t["text"], suffix, "")
            parts.append(pa.table({"doc_id": ids, "text": txt}))
        return pa.concat_tables(parts)

    def dedup_docs():
        return (
            rd.read_parquet(docs_path, columns=["doc_id", "text"])
            .repartition(num_cpus)
            .map_batches(replicate, batch_format="pyarrow")
        )

    sections = {
        "export_broadcast": lambda: export_pipeline(pages_ds, n_pages)
        .materialize()
        .count(),
        "export_forced_join": lambda: export_pipeline(
            pages_ds, n_pages, broadcast_limit=0
        )
        .materialize()
        .count(),
        "tfidf_broadcast": lambda: tfidf_top_terms(dedup_docs(), n_docs * dmult)
        .materialize()
        .count(),
        "tfidf_forced_join": lambda: tfidf_top_terms(
            dedup_docs(), n_docs * dmult, df_broadcast_limit=0
        )
        .materialize()
        .count(),
    }
    runs: dict[str, list[float]] = {k: [] for k in sections}
    rows: dict[str, int] = {}
    for _ in range(2):  # interleaved best-of-two
        for name, fn in sections.items():
            gc.collect()
            t0 = time.perf_counter()
            rows[name] = fn()
            runs[name].append(round(time.perf_counter() - t0, 3))
    best = {k: min(v) for k, v in runs.items()}
    assert rows["export_broadcast"] == rows["export_forced_join"], rows
    assert rows["tfidf_broadcast"] == rows["tfidf_forced_join"], rows
    return {
        "metric": "forced >limit plans (broadcast_limit=0) vs broadcast plans",
        "sections": best,
        "runs": runs,
        "rows": rows,
        "ratios": {
            "export": round(best["export_forced_join"] / best["export_broadcast"], 3),
            "tfidf": round(best["tfidf_forced_join"] / best["tfidf_broadcast"], 3),
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_dedup_docs": n_docs * dmult,
        "host_probe": host_probe,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_ONLY="flagship")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # best-of-two per leg, interleaved (lo, hi, lo, hi): single fresh-process
    # runs swing up to ~2x with machine state (BASELINE.md), which can tip a
    # single-shot efficiency below the 0.8 bar in either direction; the min
    # of two runs of a deterministic job is the standard least-noise
    # estimator (same policy as the headline flagship timing).
    lo, hi = 8, 32
    runs_lo = [one(lo)]
    runs_hi = [one(hi)]
    runs_lo.append(one(lo))
    runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 vs 32, same input)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_runs": [r["value"] for r in runs_lo],
        "sec_32_runs": [r["value"] for r in runs_hi],
        "pages_per_sec_8": r_lo["pages_per_sec"],
        "pages_per_sec_32": r_hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_pages": r_hi["n_pages"],
        "host_probes": [
            r.get("host_probe") for r in (runs_lo[0], runs_hi[0], runs_lo[1], runs_hi[1])
        ],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--forced-plans" in sys.argv:
        result = run_forced_plans()
        import ray

        ray.shutdown()
        print(json.dumps(result))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
