"""Round-5 second-batch operator suite bench: best-of-two wall times for
the session's new operators at sf0.1, one JSON line with the embedded
host probe (the BASELINE.md evidence convention — ratios/pairs quoted
only from saved JSON). Run standalone:

    python tools/bench_r5b_suite.py [sf_dir]

Same session policy as bench_r5_suite.py (all sections best-of-two in one
fresh process); the probe self-documents the host phase.
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

    from wikipedia_wikidata_ray.pipelines import corpusops as co
    from wikipedia_wikidata_ray.pipelines import profiling as pf
    from wikipedia_wikidata_ray.pipelines import queries as q
    from wikipedia_wikidata_ray.pipelines import relational as rel
    from wikipedia_wikidata_ray.pipelines import temporal_media as tm
    from wikipedia_wikidata_ray.pipelines import trainingdata as td
    from wikipedia_wikidata_ray.pipelines import webtext as wt

    sections = {
        "tile_retention": lambda: tm.q_tile_retention(sf_dir)
        .materialize()
        .count(),
        "ripley_pair_counts": lambda: q.q_ripley_pair_counts(sf_dir)
        .materialize()
        .count(),
        "covisit_tile_pairs": lambda: tm.q_covisit_tile_pairs(sf_dir)
        .materialize()
        .count(),
        "perplexity_buckets": lambda: wt.q_perplexity_buckets(sf_dir)
        .materialize()
        .count(),
        "triangle_counts": lambda: q.q_triangle_counts(sf_dir)
        .materialize()
        .count(),
        "event_funnel": lambda: tm.q_event_funnel(sf_dir)
        .materialize()
        .count(),
        "idw_grid": lambda: tm.q_idw_grid(sf_dir).materialize().count(),
        "degree_distribution": lambda: q.q_degree_distribution(sf_dir)
        .materialize()
        .count(),
        "degree_assortativity": lambda: q.q_degree_assortativity(sf_dir)
        .materialize()
        .count(),
        "morans_i_stats": lambda: q.q_morans_i_stats(sf_dir)
        .materialize()
        .count(),
        "tile_decayed_popularity": lambda: tm.q_tile_decayed_popularity(
            sf_dir
        )
        .materialize()
        .count(),
        "pq_codes": lambda: td.q_pq_codes(sf_dir).materialize().count(),
        "pq_adc_topk": lambda: td.q_pq_adc_topk(sf_dir)
        .materialize()
        .count(),
        "pq_recall_eval": lambda: td.q_pq_recall_eval(sf_dir)
        .materialize()
        .count(),
        "mixture_sample": lambda: td.q_mixture_sample(sf_dir)
        .materialize()
        .count(),
        "quality_ppl_crosstab": lambda: wt.q_quality_ppl_crosstab(sf_dir)
        .materialize()
        .count(),
        "tile_bearing_histogram": lambda: tm.q_tile_bearing_histogram(
            sf_dir
        )
        .materialize()
        .count(),
        "kmeans_2iter": lambda: td.q_kmeans_2iter(sf_dir)
        .materialize()
        .count(),
        "ann_topk_ivf_kmeans": lambda: td.q_ann_topk_ivf_kmeans(sf_dir)
        .materialize()
        .count(),
        "media_ahash": lambda: tm.q_media_ahash(sf_dir)
        .materialize()
        .count(),
        "media_ahash_neardups": lambda: tm.q_media_ahash_neardups(sf_dir)
        .materialize()
        .count(),
        "props_extract_stats": lambda: tm.q_props_extract_stats(sf_dir)
        .materialize()
        .count(),
        "audio_features": lambda: tm.q_audio_features(sf_dir)
        .materialize()
        .count(),
        "weighted_sample": lambda: td.q_weighted_sample(sf_dir)
        .materialize()
        .count(),
        "curated_tile_corpus": lambda: q.q_curated_tile_corpus(sf_dir)
        .materialize()
        .count(),
        "tile_dwell_median": lambda: tm.q_tile_dwell_median(sf_dir)
        .materialize()
        .count(),
        "bfs_hops": lambda: q.q_bfs_hops(sf_dir).materialize().count(),
        "quality_skyline": lambda: wt.q_quality_skyline(sf_dir)
        .materialize()
        .count(),
        "order_rollup": lambda: rel.q_order_rollup(sf_dir)
        .materialize()
        .count(),
        "user_event_pivot": lambda: rel.q_user_event_pivot(sf_dir)
        .materialize()
        .count(),
        "knn_label_eval": lambda: td.q_knn_label_eval(sf_dir)
        .materialize()
        .count(),
        "tile_gini": lambda: q.q_tile_gini(sf_dir).materialize().count(),
        "cms_registers": lambda: wt.q_cms_registers(sf_dir)
        .materialize()
        .count(),
        "window_top_terms": lambda: wt.q_window_top_terms(sf_dir)
        .materialize()
        .count(),
        "event_transition_matrix": lambda: tm.q_event_transition_matrix(
            sf_dir
        )
        .materialize()
        .count(),
        "ship_delay_stats": lambda: rel.q_ship_delay_stats(sf_dir)
        .materialize()
        .count(),
        "bigram_next_top3": lambda: co.q_bigram_next_top3(sf_dir)
        .materialize()
        .count(),
        "customer_rfm": lambda: rel.q_customer_rfm(sf_dir)
        .materialize()
        .count(),
        "tile_lorenz_deciles": lambda: q.q_tile_lorenz_deciles(sf_dir)
        .materialize()
        .count(),
        "type_token_ratio": lambda: wt.q_type_token_ratio(sf_dir)
        .materialize()
        .count(),
        "zone_language_counts": lambda: q.q_zone_language_counts(sf_dir)
        .materialize()
        .count(),
        "bloom_semijoin_revenue": lambda: rel.q_bloom_semijoin_revenue(
            sf_dir
        )
        .materialize()
        .count(),
        "zorder_shards": lambda: q.q_zorder_shards(sf_dir)
        .materialize()
        .count(),
        "haversine_path_length": lambda: tm.q_haversine_path_length(sf_dir)
        .materialize()
        .count(),
        "inverted_postings": lambda: wt.q_inverted_postings(sf_dir)
        .materialize()
        .count(),
        "tile_lisa_stats": lambda: q.q_tile_lisa_stats(sf_dir)
        .materialize()
        .count(),
        "new_user_cumulative": lambda: tm.q_new_user_cumulative(sf_dir)
        .materialize()
        .count(),
        "column_stats": lambda: pf.q_column_stats(sf_dir)
        .materialize()
        .count(),
        "fk_orphan_audit": lambda: pf.q_fk_orphan_audit(sf_dir)
        .materialize()
        .count(),
        "kcore_peel": lambda: q.q_kcore_peel(sf_dir).materialize().count(),
        "dim_truncation_recall": lambda: td.q_dim_truncation_recall(sf_dir)
        .materialize()
        .count(),
        "tile_weighted_sample": lambda: q.q_tile_weighted_sample(sf_dir)
        .materialize()
        .count(),
        "delta_exact_dups": lambda: td.q_delta_exact_dups(sf_dir)
        .materialize()
        .count(),
        "title_typo_pairs": lambda: td.q_title_typo_pairs(sf_dir)
        .materialize()
        .count(),
        "order_cube": lambda: rel.q_order_cube(sf_dir)
        .materialize()
        .count(),
        "session_length_histogram": lambda: tm.q_session_length_histogram(
            sf_dir
        )
        .materialize()
        .count(),
        "numeric_column_stats": lambda: pf.q_numeric_column_stats(sf_dir)
        .materialize()
        .count(),
        "hourly_events_ma3": lambda: tm.q_hourly_events_ma3(sf_dir)
        .materialize()
        .count(),
        "daily_active_users": lambda: tm.q_daily_active_users(sf_dir)
        .materialize()
        .count(),
        "event_trigram_paths": lambda: tm.q_event_trigram_paths(sf_dir)
        .materialize()
        .count(),
        "jsonl_doc_stats": lambda: co.q_jsonl_doc_stats(sf_dir)
        .materialize()
        .count(),
        "embedding_dim_stats": lambda: td.q_embedding_dim_stats(sf_dir)
        .materialize()
        .count(),
        "lang_confusion_matrix": lambda: td.q_lang_confusion_matrix(sf_dir)
        .materialize()
        .count(),
        "region_trade_flows": lambda: rel.q_region_trade_flows(sf_dir)
        .materialize()
        .count(),
        "part_brand_revenue": lambda: rel.q_part_brand_revenue(sf_dir)
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
        "metric": "round-5b operator suite best-of-two wall sec",
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
