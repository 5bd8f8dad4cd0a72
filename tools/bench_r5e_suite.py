"""Round-5 fifth-session operator suite bench: best-of-two wall times
at sf0.1 for the session's new operators (stat tests, basket mining,
exact set-similarity join, map matching, graph support, stream eval),
one JSON line with the embedded host probe (BASELINE.md evidence
convention — pairs quoted only from saved JSON). Run standalone:

    python tools/bench_r5e_suite.py [sf_dir]
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

    from wikipedia_wikidata_ray.pipelines import analytics as an
    from wikipedia_wikidata_ray.pipelines import corpusops as co
    from wikipedia_wikidata_ray.pipelines import queries as qq
    from wikipedia_wikidata_ray.pipelines import statops as st
    from wikipedia_wikidata_ray.pipelines import temporal_media as tm
    from wikipedia_wikidata_ray.pipelines import trainingdata as td

    sections = {
        "gini_best_split": lambda: st.q_gini_best_split(sf_dir)
        .materialize().count(),
        "poisson_bootstrap_means": lambda: st.q_poisson_bootstrap_means(sf_dir)
        .materialize().count(),
        "ols_normal_equations": lambda: st.q_ols_normal_equations(sf_dir)
        .materialize().count(),
        "seasonal_residual_outliers": lambda:
        st.q_seasonal_residual_outliers(sf_dir).materialize().count(),
        "event_type_fano": lambda: st.q_event_type_fano(sf_dir)
        .materialize().count(),
        "cohort_retention": lambda: an.q_cohort_retention(sf_dir)
        .materialize().count(),
        "fd_violations": lambda: an.q_fd_violations(sf_dir)
        .materialize().count(),
        "apriori_triples": lambda: an.q_apriori_triples(sf_dir)
        .materialize().count(),
        "ams_f2_users": lambda: an.q_ams_f2_users(sf_dir)
        .materialize().count(),
        "phrase_match_counts": lambda: co.q_phrase_match_counts(sf_dir)
        .materialize().count(),
        "prefix_jaccard_pairs": lambda: td.q_prefix_jaccard_pairs(sf_dir)
        .materialize().count(),
        "snap_to_segment": lambda: qq.q_snap_to_segment(sf_dir)
        .materialize().count(),
        "edge_triangle_support": lambda: qq.q_edge_triangle_support(sf_dir)
        .materialize().count(),
        "event_debounce": lambda: tm.q_event_debounce(sf_dir)
        .materialize().count(),
        "markov_next_accuracy": lambda: tm.q_markov_next_accuracy(sf_dir)
        .materialize().count(),
        "geofence_transitions": lambda: tm.q_geofence_transitions(sf_dir)
        .materialize().count(),
        "user_burst_rate": lambda: tm.q_user_burst_rate(sf_dir)
        .materialize().count(),
        "linear_attribution": lambda: tm.q_linear_attribution(sf_dir)
        .materialize().count(),
        "cdc_chunk_dedup": lambda: co.q_cdc_chunk_dedup(sf_dir)
        .materialize().count(),
        "linear_counting_users": lambda: an.q_linear_counting_users(sf_dir)
        .materialize().count(),
        "dp_noisy_counts": lambda: st.q_dp_noisy_counts(sf_dir)
        .materialize().count(),
        "forecast_baseline_eval": lambda: st.q_forecast_baseline_eval(sf_dir)
        .materialize().count(),
        "join_skew_audit": lambda: an.q_join_skew_audit(sf_dir)
        .materialize().count(),
        "range_partition_audit": lambda: an.q_range_partition_audit(sf_dir)
        .materialize().count(),
        "consistent_hash_balance": lambda:
        an.q_consistent_hash_balance(sf_dir).materialize().count(),
        "metro_midpoints": lambda: qq.q_metro_midpoints(sf_dir)
        .materialize().count(),
        "avg_neighbor_degree": lambda: qq.q_avg_neighbor_degree(sf_dir)
        .materialize().count(),
        "square_counts": lambda: qq.q_square_counts(sf_dir)
        .materialize().count(),
        "media_dhash": lambda: tm.q_media_dhash(sf_dir)
        .materialize().count(),
        "audio_energy_hash": lambda: tm.q_audio_energy_hash(sf_dir)
        .materialize().count(),
        "mutual_knn_pairs": lambda: td.q_mutual_knn_pairs(sf_dir)
        .materialize().count(),
        "near_dup_clusters_exact": lambda:
        td.q_near_dup_clusters_exact(sf_dir).materialize().count(),
        "distinctive_terms_logodds": lambda:
        co.q_distinctive_terms_logodds(sf_dir).materialize().count(),
        "log_compaction": lambda: tm.q_log_compaction(sf_dir)
        .materialize().count(),
        "diameter_double_sweep": lambda:
        qq.q_diameter_double_sweep(sf_dir).materialize().count(),
        "type_crosscorr": lambda: st.q_type_crosscorr(sf_dir)
        .materialize().count(),
        "bootstrap_mean_diff": lambda: st.q_bootstrap_mean_diff(sf_dir)
        .materialize().count(),
        "user_type_entropy": lambda: tm.q_user_type_entropy(sf_dir)
        .materialize().count(),
        "solar_hour_histogram": lambda: tm.q_solar_hour_histogram(sf_dir)
        .materialize().count(),
        "tile_trending": lambda: tm.q_tile_trending(sf_dir)
        .materialize().count(),
        "daily_value_percentiles": lambda:
        tm.q_daily_value_percentiles(sf_dir).materialize().count(),
        "association_rules": lambda: an.q_association_rules(sf_dir)
        .materialize().count(),
        "fid_diag_labels": lambda: td.q_fid_diag_labels(sf_dir)
        .materialize().count(),
        "tile_rate_shrinkage": lambda: tm.q_tile_rate_shrinkage(sf_dir)
        .materialize().count(),
        "diversified_top_docs": lambda: qq.q_diversified_top_docs(sf_dir)
        .materialize().count(),
        "source_dup_rates": lambda: co.q_source_dup_rates(sf_dir)
        .materialize().count(),
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
        "metric": "round-5e operator suite best-of-two wall sec",
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
