"""Round-5 fourth-session operator suite bench: best-of-two wall times
for pipelines/analytics.py at sf0.1, one JSON line with the embedded
host probe (the BASELINE.md evidence convention — pairs quoted only from
saved JSON). Run standalone:

    python tools/bench_r5d_suite.py [sf_dir]
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

    sections = {
        "running_revenue": lambda: an.q_running_revenue(sf_dir)
        .materialize().count(),
        "session_concurrency": lambda: an.q_session_concurrency(sf_dir)
        .materialize().count(),
        "embedding_covariance": lambda: an.q_embedding_covariance(sf_dir)
        .materialize().count(),
        "pca_power_iter": lambda: an.q_pca_power_iter(sf_dir)
        .materialize().count(),
        "user_hourly_ffill": lambda: an.q_user_hourly_ffill(sf_dir)
        .materialize().count(),
        "event_hour_mutual_info": lambda: an.q_event_hour_mutual_info(sf_dir)
        .materialize().count(),
        "segment_price_trend": lambda: an.q_segment_price_trend(sf_dir)
        .materialize().count(),
        "snapshot_orders_diff": lambda: an.q_snapshot_orders_diff(sf_dir)
        .materialize().count(),
        "event_type_user_overlap": lambda: an.q_event_type_user_overlap(sf_dir)
        .materialize().count(),
        "sliding_distinct_users": lambda: an.q_sliding_distinct_users(sf_dir)
        .materialize().count(),
        "acctbal_z_outliers": lambda: an.q_acctbal_z_outliers(sf_dir)
        .materialize().count(),
        "order_percent_rank": lambda: an.q_order_percent_rank(sf_dir)
        .materialize().count(),
        "token_packing": lambda: an.q_token_packing(sf_dir)
        .materialize().count(),
        "segment_boxplot": lambda: an.q_segment_boxplot(sf_dir)
        .materialize().count(),
        "bpe_merges": lambda: an.q_bpe_merges(sf_dir)
        .materialize().count(),
        "weighted_sssp_2round": lambda: an.q_weighted_sssp_2round(sf_dir)
        .materialize().count(),
        "sq8_quant_error": lambda: an.q_sq8_quant_error(sf_dir)
        .materialize().count(),
        "boruvka_mst_2round": lambda: an.q_boruvka_mst_2round(sf_dir)
        .materialize().count(),
        "conversion_latency": lambda: an.q_conversion_latency(sf_dir)
        .materialize().count(),
        "mask_spans": lambda: an.q_mask_spans(sf_dir)
        .materialize().count(),
        "ndcg_truncation_eval": lambda: an.q_ndcg_truncation_eval(sf_dir)
        .materialize().count(),
        "coordinated_sample_join": lambda: an.q_coordinated_sample_join(sf_dir)
        .materialize().count(),
        "pseudonymize_users": lambda: an.q_pseudonymize_users(sf_dir)
        .materialize().count(),
        "tile_semivariogram": lambda: an.q_tile_semivariogram(sf_dir)
        .materialize().count(),
        "brand_cooccurrence": lambda: an.q_brand_cooccurrence(sf_dir)
        .materialize().count(),
        "hourly_ewma": lambda: an.q_hourly_ewma(sf_dir)
        .materialize().count(),
        "ab_srm_check": lambda: an.q_ab_srm_check(sf_dir)
        .materialize().count(),
        "session_overlap_pairs": lambda: an.q_session_overlap_pairs(sf_dir)
        .materialize().count(),
        "vocab_coverage_curve": lambda: an.q_vocab_coverage_curve(sf_dir)
        .materialize().count(),
        "term_momentum": lambda: an.q_term_momentum(sf_dir)
        .materialize().count(),
        "nn_distance_histogram": lambda: an.q_nn_distance_histogram(sf_dir)
        .materialize().count(),
        "doclen_ks_test": lambda: an.q_doclen_ks_test(sf_dir)
        .materialize().count(),
        "wilson_ci_conversion": lambda: an.q_wilson_ci_conversion(sf_dir)
        .materialize().count(),
        "quantity_mode": lambda: an.q_quantity_mode(sf_dir)
        .materialize().count(),
        "logreg_2step": lambda: an.q_logreg_2step(sf_dir)
        .materialize().count(),
        "nb_lang_classify": lambda: an.q_nb_lang_classify(sf_dir)
        .materialize().count(),
        "rrf_fusion_topk": lambda: an.q_rrf_fusion_topk(sf_dir)
        .materialize().count(),
        "churn_features": lambda: an.q_churn_features(sf_dir)
        .materialize().count(),
        "lang_js_divergence": lambda: an.q_lang_js_divergence(sf_dir)
        .materialize().count(),
        "kcenter_seeds": lambda: an.q_kcenter_seeds(sf_dir)
        .materialize().count(),
        "burst_states": lambda: an.q_burst_states(sf_dir)
        .materialize().count(),
        "theil_sen_hourly": lambda: an.q_theil_sen_hourly(sf_dir)
        .materialize().count(),
        "nb_confusion_kappa": lambda: an.q_nb_confusion_kappa(sf_dir)
        .materialize().count(),
        "lang_source_chisq": lambda: an.q_lang_source_chisq(sf_dir)
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
        "metric": "round-5d analytics suite best-of-two wall sec",
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
