"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines — first the full per-query detail
({"detail_queries": {...}}), then a SHORT final summary line
  {"metric": "...", "value": <total sec>, "unit": "sec", "sf": <sf>,
   "r01_comparable_subtotal": <sec>, "sweeps": N, "n_queries": N,
   "queries": {20 slowest}}
sized to survive the harness's last-2000-chars stdout window (the
full dict outgrew it in r4 and the headline was lost to truncation).

Execution is measured with the `noop` sink (full pipeline runs, no
driver-side collect cost), after a small warm-up action to absorb JVM
/ codegen startup. Every registry query is either in a sweep list or
enumerated in BENCH_EXCLUDED with a reason class (machine-checked
partition); exact all-pairs queries additionally run once per round
in EXACT_PAIRS_PROBE paired against their benched LSH twin so the
approximation speedup is a recorded number. The summary line carries
the git commit and a CPU-calibration stamp so cross-round totals can
be normalized for host variance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from reddit_hn_etl_spark.plans.queries import QUERIES  # noqa: E402

BENCH_QUERIES = [
    # relational core
    "pricing_summary",
    "daily_metrics",
    "type_daily",
    "user_activity",
    "segment_revenue",
    "top_orders",
    "top_orders_per_segment",
    "customer_order_deltas",
    "dedup_keep_last",
    "merge_upsert",
    "dup_detect",
    "filter_project",
    "json_props",
    "local_supplier_volume",
    "shipping_priority",
    "brand_revenue",
    "rollup_daily",
    "distinct_users_daily",
    "pivot_daily_types",
    # time-series ops
    "asof_rates",
    "interval_purchases_near_errors",
    "sessionize",
    # north-star text / vector
    "doc_exact_dedup",
    "doc_fingerprint",
    "doc_tokens",
    "doc_quality",
    "doc_lang_id",
    "top_words",
    "knn_cosine",
    "embedding_near_dup",
]

# Added in round 2 — benched for per-query visibility, but kept out of
# the r1-comparable subtotal (BENCH_r01 is the 30-query baseline).
BENCH_QUERIES_R2 = [
    "min_cost_supplier",
    "sole_late_suppliers",
    "bulk_suppliers",
    "nation_share_by_year",
    "top_revenue_supplier",
    "train_val_split_counts",
    "benchmark_contamination",
    # r2 continuation: TPC-H family completion + training-data ops
    "order_priority_check",
    "volume_shipping",
    "product_type_profit",
    "returned_item_revenue",
    "small_qty_revenue",
    "disjunctive_part_revenue",
    "curation_funnel",
    "doc_chunking",
    "pack_token_budget",
    "stratified_sample_counts",
    "pii_redaction",
    # r2 continuation: curation depth + real-decode multimodal
    "doc_repetition",
    "weighted_doc_sample",
    "doc_distinctive_token",
    "near_dup_clusters",
    "audio_wav_metrics",
    "image_bmp_metrics",
    # r2 continuation: product analytics
    "session_funnel",
    "weekly_cohort_retention",
    "customer_rfm_segments",
]

# Added in round 4: approximation-switch / PIT / runtime-filter /
# real-decode queries. Same subtotal policy as R2 (excluded from the
# r01-comparable figure).
BENCH_QUERIES_R4 = [
    "user_engagement_rank",
    "bpe_merge_pairs",
    # incremental_near_dup is excluded like its sibling
    # doc_minhash_pairs: the query's cost is its exact-Jaccard
    # bound-check baseline, not the incremental operator under test.
    "doc_token_jaccard_capped",
    "pit_user_features",
    "selective_order_lines",
    "media_features",
    "media_resize",
    # r4 continuation: corpus-cleaning + sparse-similarity additions.
    # doc_containment_pairs is excluded like doc_token_jaccard: same
    # inverted-index cost class, already represented in the sweep.
    "doc_boilerplate_strip",
    "doc_tf_cosine_pairs",
    # r4 continuation: hierarchical-prefix Pareto + drift monitor.
    "customer_revenue_pareto",
    "value_drift_weekly",
    # r4 fourth session: span-level dedup, lexical retrieval,
    # anomaly monitoring, rule-based filtering, and the fully
    # oracle-checked composed curation pipeline (exact-jaccard mode).
    "duplicate_token_spans",
    "bm25_doc_search",
    "rolling_zscore_anomalies",
    "doc_gopher_rules",
    "curate_documents",
    "semantic_dedup_cells",
    "scd2_user_state",
    "event_sequence_funnel",
    "doc_unigram_logprob",
    "heavy_hitters_sketch",
    "orders_column_stats",
    "orders_group_checksum",
    "customer_chain_rollup",
    "lateral_recent_orders",
    # r4 fifth session: clustering / selection / centrality / QA
    "kmeans_assign",
    "kmeans_update_step",
    "semantic_dedup_kmeans",
    "doc_dsir_weights",
    "customer_graph_pagerank",
    "orders_constraint_report",
    "cluster_balanced_sample",
    "pq_codes",
    "pq_adc_topk",
    "ivf_pq_knn",
    "hopping_window_counts",
    "array_map_kitchen_sink",
    "pq_residual_codes",
    "ivf_pq_residual_knn",
    "purchases_asof_state",
    "kfold_split_counts",
    "doc_unicode_normalize",
    "dsir_gumbel_sample",
    "related_customers_ppr",
    # r4 sixth session: order-based relational analytics + BFS +
    # exact-moment statistics + privacy audit.
    "parts_price_size_skyline",
    "brand_copurchase_lift",
    "referral_reach_bfs",
    "order_value_percentiles",
    "brand_price_regression",
    "customer_kanonymity_risk",
    "doc_c4_rules",
    "hard_negative_mining",
    "source_mixture_weights",
    "doc_chunks_udtf",
    "daily_value_cusum",
    "robust_value_outliers",
    "incremental_daily_metrics",
    "order_value_equidepth_hist",
    "customer_name_jw_pairs",
    "event_value_auc",
    "referral_lpa_communities",
    "daily_value_ohlc",
    "customer_revenue_gini",
    "event_transition_matrix",
    "source_diversity_entropy",
    "monthly_value_growth",
    "rolling_median_value",
    "value_distribution_moments",
    "order_priority_multiset_ops",
    "props_key_histogram",
    "sorted_neighborhood_pairs",
    "binary_hamming_knn",
    "matryoshka_two_stage_knn",
    "hybrid_search_rrf",
    "type_dow_chisquare",
    "null_semantics_battery",
    "knn_ndcg_eval",
    "value_psi_weekly",
    "ab_test_ztest",
    "embeddings_constraint_report",
    "trimmed_mean_value",
    "value_benford_audit",
    "brand_item_item_cf",
    "signup_purchase_km",
    "purchase_attribution_counts",
    "quality_calibration_bins",
    "fuzzy_decontamination",
    "lang_id_confusion",
    "cohort_ltv_curve",
    "dow_adjusted_anomalies",
    "cms_user_counts",
    # r4 seventh session: distributed PCA (exact-int moments pass +
    # rounded power iteration + corpus projection). The covariance
    # row prices the one corpus-sized pass; project re-runs the
    # chain end to end including the driver collect of loadings.
    "embedding_covariance",
    "pca_project_top1",
    # r4 seventh session: delta-join view maintenance (cost of the
    # three delta terms + state merge vs the direct recompute the
    # oracle performs).
    "ivm_nation_revenue",
    # r4 seventh session: positional phrase retrieval + perceptual
    # image near-dup over real BMP decode.
    "phrase_search_positional",
    "image_ahash_pairs",
    # r4 seventh session: level+trend forecasting fold + the
    # Fellegi-Sunter linkage decision layer.
    "daily_value_holt_winters",
    "customer_fellegi_sunter",
    "daily_value_changepoint",
    "event_value_bootstrap_se",
    "bigram_pmi_collocations",
    "pca_second_component",
    "neyman_allocation",
    "attribution_credit_models",
    "source_temperature_mix",
    "image_ahash_clusters",
    "purchase_absorption_3step",
    "brand_copurchase_pagerank",
    "cluster_top_terms",
    "quality_brier_decomposition",
    "daily_trend_theil_sen",
    "daily_value_stl_lite",
    "video_scene_cuts",
    "holt_backtest_skill",
    "audio_activity_segments",
    # r4 eighth session: trend/correlation statistics, portable
    # membership + cardinality sketches, dense-region graph peel,
    # weighted SSSP, ER survivorship, CDC apply, LM scoring,
    # mutual-kNN and JL projection over embeddings.
    "daily_mann_kendall",
    "value_conformal_intervals",
    "bloom_customer_screen",
    "cms_selfjoin_size_estimate",
    "doc_bigram_lm_logprob",
    "mutual_knn_pairs",
    "copurchase_kcore",
    "referral_weighted_sssp",
    "customer_golden_records",
    "cdc_user_state_apply",
    "embedding_jl_distortion",
    "hll_user_overlap_estimate",
    "quantile_sketch_order_values",
    "corpus_zipf_fit",
    "user_interarrival_burstiness",
    "join_key_skew_report",
    "rolling_corr_value_count",
    "dsir_ess_report",
    "rm3_feedback_search",
]

# Added in round 5: sweep-line concurrency, time-weighted average,
# grid-bucketed spatial nearest neighbor. Same subtotal policy
# (excluded from the r01-comparable figure).
BENCH_QUERIES_R5 = [
    "peak_concurrent_sessions",
    "type_daily_twap",
    "customer_nearest_supplier_geo",
    "sliding_distinct_users_hll",
    "top_event_trigram_paths",
    "ab_test_sprt",
    "padding_waste_report",
    # r5 continuation: privacy / regression / calibration / linkage-EM
    "dp_noisy_type_daily",
    "lineitem_ridge_regression",
    "quality_isotonic_calibration",
    "fs_em_weights",
    "dp_median_exponential",
    "purchase_diff_in_diff",
    "lang_token_fertility",
    "knn_shapley_data_value",
    "value_ks_test",
    "mmr_diverse_rerank",
    "knn_label_diagnostics",
    "value_mannwhitney_test",
    "purchase_cem_att",
    "cluster_label_purity",
    "source_overlap_matrix",
    "corpus_heaps_fit",
    "uplift_qini_deciles",
    "lang_id_kappa",
    "embedding_isotropy_audit",
    "purchase_ipw_ate",
    "heldout_oov_rate",
    "corpus_datasheet",
    "daily_value_its",
    "audio_fingerprint_match",
    "brand_bradley_terry",
    "user_markov_surprisal",
    "covariate_balance_smd",
    "term_burstiness",
    "source_loo_impact",
    "signup_purchase_logrank",
    "value_qte",
    "corpus_textrank_keywords",
    "cdc_chunk_dedup",
    "daily_spearman_rho",
    "value_median_ci",
    "feature_mi_ranking",
    "source_quality_thresholds",
]

# Added in round 6 — the approximate/sketch scale paths that were
# previously unbenched while their exact twins were probed only ad
# hoc (VERDICT r5 #4): LSH/IVF ANN, minhash/simhash banding, the
# incremental near-dup index, HLL, and the remaining moderate-cost
# plan shapes (EMA recurrence, UCB ranking, PCA power iteration,
# leakage-safe split, audit state, keep-best collapse).
BENCH_QUERIES_R6 = [
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "incremental_near_dup",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "hll_sketch_weekly_users",
    "user_value_ema",
    "ucb1_brand_ranking",
    "approx_distinct_users",
    "audit_current_state",
    "pca_power_component",
    "leakage_safe_split",
    "cluster_keep_best",
]

# Added in round 9 with the registry-freeze lift: the two newly
# registered queries whose cost actually scales with SF (the other
# eight promoted codec/media queries are bounded synth families —
# see the `synth-bounded` exclusion class below).
BENCH_QUERIES_R9 = [
    # 3 full-batch GD steps = 3 scans + 1-row reduces over documents
    "doc_quality_logistic",
    # binary search on repeated-L-gram predicate: O(log max_len)
    # corpus-wide gram aggregations — the priciest benched query by
    # design (it replaces a suffix-array build)
    "corpus_longest_repeated_span",
    # occurrence-mode twin (min_count): same probe cost shape
    "corpus_repeated_span_occurrences",
    # ExactSubstr removal: gram agg + hit join + doc-bounded rebuild
    "doc_exact_substring_trim",
    # growing-corpus twin: index join + batch-sized trim
    "incremental_span_trim",
    # URL canonicalization dedup: scan → native string project →
    # hash agg on the canonical key (SF-scaled)
    "url_canonical_dedup",
]

BENCH_QUERIES_R10 = [
    # IVF kNN-JOIN: every vector queries the corpus through the
    # distributed probe path — executor-side cell assignment, one
    # shuffle join on cell, window top-k (plus the exact bruteforce
    # side for the recall floor). SF-scaled in BOTH the corpus and
    # the query set.
    "embedding_knn_join",
    # IVF-PQ kNN-JOIN: encode projection + cell join + per-query ADC
    # tables built executor-side (40 fixed queries, SF-scaled corpus)
    "pq_knn_join",
    # residual mode: per-(query, cell) ADC tables, same join shape
    "pq_residual_knn_join",
]

BENCH_QUERIES_R11 = [
    # persisted-IVF-index join differential: index build (carrying
    # assignment) + knn_join_ivf_index vs the fitted end-to-end path
    "ivf_index_knn_join",
]

BENCH_QUERIES_R12 = [
    # persisted-PQ-index join differential: pq_encode_corpus index
    # + pq_knn_join(encoded=...) vs the inline path, raw AND residual
    "pq_index_knn_join",
    # exact-rerank stage differential: full-probe full-rerank PQ join
    # vs exact L2 brute-force (the IVFPQR anchor identity)
    "pq_rerank_knn_join",
]

# Exact all-pairs similarity: run ONCE per round (no repeat sweeps)
# after the budgeted sweeps, each alongside the name of its benched
# approximate twin, so the exact-vs-LSH speedup is a recorded number
# every round (VERDICT r5 #4). These are the documented NON-scale
# mode — at 100 TB the twin is the only viable plan; at local SFs
# they complete and the ratio is the evidence.
EXACT_PAIRS_PROBE = {
    "doc_token_jaccard": "doc_minhash_pairs",
    "doc_token_jaccard_prefix": "doc_minhash_pairs",
    "doc_containment_pairs": "doc_minhash_pairs",
    "near_dup_edit_distance": "doc_simhash_pairs",
    "radius_cosine_search": "knn_cosine_lsh",
    "source_dup_matrix": "doc_minhash_pairs",
}

# Every registry query NOT in the sweep lists, with its reason class
# (VERDICT r5 #4: the exclusion set is now enumerated and
# machine-checked — tests/test_queries_misc.py asserts that sweep
# lists + this dict partition the registry exactly). Classes:
#   exact-pairs — exact all-pairs / brute-force similarity whose
#       100 TB mode is the benched LSH/banded twin; measured once
#       per round head-to-head in EXACT_PAIRS_PROBE (sf0.1 cost
#       1-15s each, quadratic in corpus size by construction).
#   approx-eval — approximation-QUALITY evaluation harnesses
#       (planted recall, bound consistency, triangle closure); their
#       engine work is the same minhash/simhash plans benched via
#       doc_minhash_pairs / doc_simhash_pairs.
#   micro — ≤ ~2.5s at sf0.1 (measured r6), exercising a physical
#       plan shape already covered by a benched sibling; adds sweep
#       wall-time and scheduler noise, not signal.
#   synth-bounded — codec-correctness queries over a FIXED-size
#       synthetic payload family (doc_id < 20..60): cost is constant
#       in SF, so a timing carries no scale signal; the SF-scaled
#       mapInPandas media plan shape is benched via media_features /
#       media_resize / audio_wav_metrics / image_bmp_metrics.
BENCH_EXCLUDED = {
    **{
        n: "synth-bounded"
        for n in [
            "image_png_metrics",
            "gif_lzw_roundtrip",
            "image_jpeg_metrics",
            "audio_g711_adpcm_metrics",
            "audio_flac_roundtrip",
            "video_y4m_scene_cuts",
            "image_phash_clusters",
            "media_catalog_report",
        ]
    },
    **{n: "exact-pairs" for n in EXACT_PAIRS_PROBE},
    "near_dup_triangles": "approx-eval",
    "simhash_planted_recall": "approx-eval",
    "simhash_jaccard_consistency": "approx-eval",
    **{
        n: "micro"
        for n in [
            "approx_value_percentiles",
            "brand_value_concentration",
            "calendar_breakdown",
            "cheapest_order_per_customer",
            "conditional_agg",
            "corpus_mix_allocation",
            "customer_order_distribution",
            "customers_no_orders",
            "customers_with_orders",
            "daily_kendall_tau",
            "daily_spearman_corr",
            "daily_value_ar1",
            "doc_token_dropout",
            "domain_extract",
            "events_last_day",
            "forward_fill_values",
            "interpolate_missing_values",
            "kmeans_prototypes",
            "large_volume_orders",
            "media_frames",
            "nation_trade_volume",
            "not_in_null_semantics",
            "null_semantics",
            "order_price_ranks",
            "orders_above_global_avg",
            "orders_cube",
            "orders_version_diff",
            "orders_with_heavy_lines",
            "part_supplier_counts",
            "part_type_norm",
            "promo_revenue_share",
            "props_variant_agg",
            "quantize_embeddings_int8",
            "quarter_hour_counts",
            "revenue_forecast",
            "rich_idle_customers",
            "running_user_value",
            "salted_event_enrichment",
            "salted_user_counts",
            "sample_k_per_group",
            "scalar_subqueries",
            "scalar_summary",
            "shipping_lag_stats",
            "status_priority_grouping_sets",
            "string_kitchen_sink",
            "suppliers_outside_region",
            "table_counts",
            "try_cast_semantics",
            "type_value_mutual_info",
            "unpivot_daily_types",
            "user_event_type_sets",
            "user_missing_days",
            "users_purchase_and_error",
            "users_purchase_no_error",
            "value_histogram",
            "value_percentiles",
            "value_range_frame_sums",
            "value_stats",
            "weekly_counts",
        ]
    },
}


def cpu_calibration_ms() -> float:
    """Fixed pure-Python work loop, timed — a box-speed proxy stamped
    into the bench JSON so cross-round totals can be normalized for
    host variance (VERDICT r5 #5: r4's 'faster box' ambiguity)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    assert x > 0
    return round((time.perf_counter() - t0) * 1000, 1)


def _calib_worker(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    assert x > 0
    return time.perf_counter() - t0


def cpu_multicore_parallelism(workers: int) -> float:
    """Effective parallelism of the box: `workers` copies of the
    calibration loop in separate processes; returns (workers ×
    single-proc time) / wall — the number of single-thread-equivalent
    cores ACTUALLY delivered out of `workers`. Single-thread calib
    alone mislabels a box whose logical CPUs share fewer physical
    cores or suffer hypervisor steal (r9: calib said 'fast box' while
    a 32-thread sweep ran ~2× slow — measured parallelism was
    16.8/32). `workers` follows the session's SPARK_GRAFT_CPUS so the
    stamp measures the same parallelism the sweep used; the summary
    records the denominator (cpu_parallelism_of) alongside the
    ratio."""
    import multiprocessing as mp

    single = _calib_worker(None)
    with mp.Pool(workers) as pool:
        t0 = time.perf_counter()
        pool.map(_calib_worker, range(workers))
        wall = time.perf_counter() - t0
    return round(workers * single / wall, 1) if wall > 0 else 0.0


def two_axis_norm(
    sec: float, calib_ms: float, par: float, par_of: int
) -> float | None:
    """Memory-pinned cross-round normalization (SCALING.md): raw wall
    time rescaled to a reference box — ×(100/calib_ms) for
    single-thread speed, ×(par/par_of) for delivered parallelism.
    Valid for comparing parallelism-bound queries across boxes; at
    par < ~16/32 it over-corrects (NOTES_r10) so treat as a flag, not
    a verdict."""
    if not calib_ms or calib_ms <= 0 or not par or not par_of:
        return None
    return sec * (100.0 / calib_ms) * (par / par_of)


def load_prior_summary(repo_dir: str) -> dict | None:
    """Summary JSON of the latest recorded round (BENCH_r*.json).
    The driver stores only the last ~2000 chars of stdout ('tail');
    the final self-contained summary line survives by design — parse
    it back out for the outlier re-run rule."""
    import glob
    import re

    # Main-round records ONLY (BENCH_r<N>.json): the driver also
    # writes variant artifacts like BENCH_r12_c8.json (the 8-core
    # scaling run) whose round number TIES the main record in a loose
    # glob — r13 inherited a loader/test pair that broke the tie in
    # opposite directions, and the outlier rules must baseline against
    # the main 32-core record, not the low-core rerun.
    def _round(p: str) -> int | None:
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        return int(m.group(1)) if m else None

    paths = sorted(
        (p for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
         if _round(p) is not None),
        key=_round,
    )
    if not paths:
        return None
    try:
        with open(paths[-1], encoding="utf-8") as f:
            rec = json.load(f)
        tail = rec.get("tail", "")
        i = tail.rfind('{"metric"')
        return json.loads(tail[i:]) if i >= 0 else None
    except Exception:
        return None


def outlier_names(
    timings: dict[str, float | None],
    cur_calib: float,
    cur_par: float,
    cur_par_of: int,
    prior: dict | None,
) -> list[str]:
    """Queries whose two-axis-normalized time regressed >2× vs the
    prior round's recorded value (VERDICT r10 #4: BENCH_r10 shipped a
    4× steal artifact for fuzzy_decontamination on a 16.2/32-core
    box). Applied only when the box is degraded — delivering less
    than 7/8 of its own logical cores (ADVICE r11: the original
    absolute `>= 28` gate misclassified EVERY healthy box with fewer
    than 28 cores as degraded) — on a healthy box a 2× regression is
    signal, not steal. Prior per-query values exist only for the
    recorded slowest-20; that is exactly the set where a steal burst
    distorts the round's story. Pure function — pinned by
    test_queries_misc."""
    if prior is None or cur_par >= 0.875 * cur_par_of:
        return []
    p_calib = prior.get("cpu_calib_ms")
    p_par = prior.get("cpu_parallelism")
    p_par_of = prior.get("cpu_parallelism_of", 32)
    flagged = []
    for name, p_sec in (prior.get("queries") or {}).items():
        c_sec = timings.get(name)
        if c_sec is None or p_sec is None:
            continue
        c_n = two_axis_norm(c_sec, cur_calib, cur_par, cur_par_of)
        p_n = two_axis_norm(p_sec, p_calib, p_par, p_par_of)
        if c_n is not None and p_n is not None and c_n > 2.0 * p_n:
            flagged.append(name)
    return flagged


def record_outlier_names(
    timings: dict[str, float | None],
    cur_calib: float,
    cur_par: float,
    cur_par_of: int,
    prior: dict | None,
) -> list[str]:
    """Queries setting a NEW all-time record (VERDICT r12 #3):
    BENCH_r12 crowned url_canonical_dedup the round's slowest query at
    30.3 s when it solo-times at ~3 s — a steal burst on a query with
    NO prior-round record (prior per-query values exist only for the
    recorded slowest-20, so the >2× rule in `outlier_names` could
    never fire for it). A query absent from the prior slowest-20 is
    bounded ABOVE by the prior round's 20th-slowest time (the cutoff);
    if its two-axis-normalized time now exceeds 2.5× that normalized
    cutoff, it jumped from below the leaderboard to far above it in
    one round — re-run it before recording. Applies on ANY box (a
    single burst can strike a box whose average parallelism passes the
    0.875 degradation gate). Additive: never unflags anything
    `outlier_names` flags. Pure function — pinned by
    test_queries_misc."""
    if prior is None:
        return []
    p_vals = [v for v in (prior.get("queries") or {}).values() if v]
    if not p_vals:
        return []
    p_cut = two_axis_norm(
        min(p_vals),
        prior.get("cpu_calib_ms"),
        prior.get("cpu_parallelism"),
        prior.get("cpu_parallelism_of", 32),
    )
    if p_cut is None:
        return []
    flagged = []
    for name, c_sec in timings.items():
        if c_sec is None or name in (prior.get("queries") or {}):
            continue
        c_n = two_axis_norm(c_sec, cur_calib, cur_par, cur_par_of)
        if c_n is not None and c_n > 2.5 * p_cut:
            flagged.append(name)
    return flagged


def r01_subtotal_fields(
    first: dict[str, float],
    best: dict[str, float | None],
    sweeps_done: int,
) -> dict:
    """Self-describing r01-comparable subtotal (VERDICT r11 #5): when
    the budget allowed only ONE sweep, the subtotal includes first-run
    plan compile for all 30 original queries and must not be read as
    a warm regression against a multi-sweep round (BENCH_r11's 26.5s
    normalized vs r10's 17.8s warm was compile + steal — previously
    that caveat lived only in NOTES, invisible to a reader of the
    JSON alone). The summary therefore stamps the cold flag AND both
    numbers: the best-of subtotal (the cross-round series) and the
    first-sweep subtotal (the cold bound; equal to best-of when only
    one sweep ran). Pure function — pinned by test_queries_misc."""
    sub_best = round(
        sum(t for n in BENCH_QUERIES if (t := best.get(n)) is not None), 3
    )
    sub_first = round(
        sum(t for n in BENCH_QUERIES if (t := first.get(n)) is not None), 3
    )
    return {
        "r01_comparable_subtotal": sub_best,
        "r01_subtotal_cold": sweeps_done < 2,
        "r01_subtotal_first_sweep": sub_first,
    }


def git_head() -> str:
    """Commit the bench ran against (VERDICT r5 #5 — BENCH_r04 was
    generated mid-r5 and the label ambiguity cost a round of
    cross-round comparability)."""
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("reddit-hn-etl-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: touch every input table once (JVM + reader init) and
    # the noop sink path (first write initializes the datasource v2
    # machinery — ~1s of one-time cost that isn't query work).
    QUERIES["table_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Best-of-3 per query: the first execution of a query also pays
    # plan compilation + codegen; the repeats measure steady-state
    # engine throughput (what a warm cluster delivers). The three
    # runs are INTERLEAVED as full sweeps rather than back-to-back:
    # local[32] shares the box with the harness, and a noisy-neighbor
    # window poisons all back-to-back repeats of one query (observed
    # r2↔r3: ±3× phantom swings on byte-identical code, VERDICT r3
    # #9) but at most one of three sweep-separated runs.
    # Wall-clock budget: the sweep list has grown past the point
    # where three full sweeps fit a 10-minute harness window. The
    # first sweep ALWAYS completes (every query gets a number);
    # repeat sweeps run only while the budget holds, so noise
    # suppression degrades gracefully instead of the whole bench
    # timing out.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "400"))
    names = (
        BENCH_QUERIES
        + BENCH_QUERIES_R2
        + BENCH_QUERIES_R4
        + BENCH_QUERIES_R5
        + BENCH_QUERIES_R6
        + BENCH_QUERIES_R9
        + BENCH_QUERIES_R10
        + BENCH_QUERIES_R11
        + BENCH_QUERIES_R12
    )
    # The sweep lists + BENCH_EXCLUDED must partition the registry
    # exactly — a new registry entry that lands in neither is a
    # silent coverage gap (also enforced by tests/test_queries_misc).
    missing = set(QUERIES) - set(names) - set(BENCH_EXCLUDED)
    overlap = set(names) & set(BENCH_EXCLUDED)
    assert not missing and not overlap, (sorted(missing), sorted(overlap))

    timings: dict[str, float] = {n: float("inf") for n in names}
    first_timings: dict[str, float] = {}
    t_start = time.perf_counter()
    sweeps_done = 0
    for _sweep in range(3):
        if sweeps_done >= 1 and time.perf_counter() - t_start > budget_s:
            break
        for name in names:
            # Repeat sweeps also honor the budget BETWEEN queries —
            # a partial second sweep still improves min() for the
            # queries it reached, and the probe below keeps room.
            if sweeps_done >= 1 and time.perf_counter() - t_start > budget_s:
                break
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            first_timings.setdefault(name, dt)
            timings[name] = min(timings[name], dt)
        sweeps_done += 1

    # Outlier re-run rule (VERDICT r10 #4): on a degraded box
    # (delivered parallelism < 28/32), a single steal burst can stamp
    # a 4× phantom regression (BENCH_r10's fuzzy_decontamination:
    # 30.9 s in-bench, 7.2-8.2 s solo ×3). Re-run any query whose
    # two-axis-normalized time is >2× its prior-round record and keep
    # the best — bounded re-runs, inside a 1.5× budget guard.
    calib = cpu_calibration_ms()
    cpu_par = cpu_multicore_parallelism(int(cpus))
    outlier_reruns: dict[str, dict] = {}
    _prior = load_prior_summary(os.path.dirname(os.path.abspath(__file__)))
    _finite = {
        n: (None if t == float("inf") else t) for n, t in timings.items()
    }
    flagged = outlier_names(_finite, calib, cpu_par, int(cpus), _prior)
    # Additive record-rule (VERDICT r12 #3): also re-run queries that
    # jumped past 2.5x the prior round's slowest-20 cutoff without a
    # prior record of their own.
    flagged += [
        n
        for n in record_outlier_names(
            _finite, calib, cpu_par, int(cpus), _prior
        )
        if n not in flagged
    ]
    for name in flagged:
        if time.perf_counter() - t_start > budget_s * 1.5:
            break
        before = timings[name]
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = min(timings[name], time.perf_counter() - t0)
        outlier_reruns[name] = {
            "before": round(before, 3),
            "after": round(timings[name], 3),
        }

    # Exact all-pairs probe: one run each, paired with the benched
    # approximate twin's sweep timing so the speedup is recorded.
    probe: dict[str, dict] = {}
    for name, twin in EXACT_PAIRS_PROBE.items():
        if time.perf_counter() - t_start > budget_s * 1.25:
            break  # leave the summary lines room under a hard kill
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t_exact = round(time.perf_counter() - t0, 3)
        t_twin = timings.get(twin, float("inf"))
        probe[name] = {
            "sec": t_exact,
            "lsh_twin": twin,
            "twin_sec": t_twin if t_twin != float("inf") else None,
            "exact_over_twin": (
                round(t_exact / t_twin, 2) if t_twin != float("inf") else None
            ),
        }

    # ANN recall probe (VERDICT r8 #4): the registered LSH/IVF queries
    # assert a per-query recall FLOOR over 5 query vectors; this
    # records the actual average recall@10 over a 50-query panel at
    # the bench SF, so approximation QUALITY is a per-round number
    # next to the speedup the twins' timings already record. Work is
    # server-side (semi-join + count); only two scalars collect.
    # The panel itself costs ~15s — keep it unless the run is already
    # 2x past budget, and NEVER drop it silently (a slow box skipped
    # it twice in r9 and the round lost its quality number).
    ann_recall: dict = {}
    if time.perf_counter() - t_start > budget_s * 2:
        ann_recall["skipped"] = (
            f"run at {round(time.perf_counter() - t_start)}s exceeded "
            f"2x budget ({budget_s}s) before the recall panel"
        )
    else:
        from pyspark.sql import functions as F

        from reddit_hn_etl_spark.operators import similarity
        from reddit_hn_etl_spark.sources.tables import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        qvecs = emb.where(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = similarity.knn_cosine_bruteforce(emb, qvecs, k=10).select(
            "query_id", "vec_id"
        ).localCheckpoint(eager=True)
        n_q = qvecs.count()
        approxes = {
            "lsh": similarity.knn_cosine_lsh(
                emb, qvecs, dim=64, k=10, n_planes=3, n_tables=8
            ),
            # auto = √N cells / quarter probe (r10 sweep: fixed 16
            # cells gave 0.716 recall@10; auto gives 0.926 at the
            # same ~25% probed fraction).
            "ivf": similarity.knn_cosine_ivf(
                emb, qvecs, dim=64, k=10, n_cells="auto", n_probe="auto",
                iters=3
            ),
        }
        for kind, approx in approxes.items():
            hits = exact.join(
                approx.select("query_id", "vec_id"),
                ["query_id", "vec_id"],
                "left_semi",
            ).count()
            ann_recall[f"{kind}_recall_at_10"] = round(
                hits / (10 * n_q), 4
            )
        ann_recall["n_queries"] = n_q
        # Corpus-wide kNN-join mean recall (r10): the vec_id<50 panel
        # is planted-easy (tail vectors are near-isotropic, mean
        # top-10 cosine ~0.35), so also record the honest number —
        # EVERY vector as a query through the distributed probe path.
        qall = emb.select(F.col("vec_id").alias("query_id"), "embedding")
        exact_all = similarity.knn_cosine_bruteforce(
            emb, qall, k=10
        ).select("query_id", "vec_id").localCheckpoint(eager=True)
        join_hits = exact_all.join(
            similarity.knn_cosine_ivf(
                emb, qall, dim=64, k=10, iters=3, distributed_queries=True
            ).select("query_id", "vec_id"),
            ["query_id", "vec_id"],
            "left_semi",
        ).count()
        n_all = qall.count()
        ann_recall["ivf_knn_join_mean_recall_at_10"] = round(
            join_hits / (10 * n_all), 4
        )
        ann_recall["knn_join_n_queries"] = n_all

    # A query that never completed a sweep (budget expiry / hard
    # kill mid-first-sweep) must not leak bare Infinity into the
    # JSON (ADVICE r5) — report null and keep totals finite.
    incomplete = sorted(n for n, t in timings.items() if t == float("inf"))
    timings = {
        n: (round(t, 3) if t != float("inf") else None)
        for n, t in timings.items()
    }

    total = round(sum(t for t in timings.values() if t is not None), 3)
    sub_fields = r01_subtotal_fields(first_timings, timings, sweeps_done)
    base_total = sub_fields["r01_comparable_subtotal"]
    # The harness records only the LAST ~2000 characters of stdout and
    # parses the final JSON line. The full per-query dict has outgrown
    # that window (BENCH_r04 lost its headline `value` to truncation),
    # so: the complete detail goes on a FIRST line (may truncate away)
    # and the LAST line is a short, self-contained summary — headline
    # totals plus only the slowest queries — that always survives.
    print(
        json.dumps(
            {
                "detail_queries": timings,
                "exact_pairs_probe": probe,
                "excluded": BENCH_EXCLUDED,
            }
        )
    )
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t is not None),
            key=lambda kv: -kv[1],
        )[:20]
    )
    # Box speeds vary ~1.7x round to round; `value` is the raw wall
    # time, `value_normalized` rescales it to a reference box where
    # the fixed Python calibration loop takes 100 ms (value x
    # 100/cpu_calib_ms) so cross-round totals compare directly
    # (VERDICT r6 #5). Per-query map stays raw.
    norm = 100.0 / calib if calib and calib > 0 else None
    print(
        json.dumps(
            {
                "metric": "headline-query wall time, local[%s], noop sink" % cpus,
                "value": total,
                "value_normalized": round(total * norm, 3) if norm else None,
                "unit": "sec",
                "sf": sf_val,
                # Apples-to-apples vs BENCH_r01: the original 30-query
                # subtotal (r2 added 7 queries; totals aren't comparable).
                **sub_fields,
                "r01_comparable_subtotal_normalized": (
                    round(base_total * norm, 3) if norm else None
                ),
                "sweeps": sweeps_done,
                "n_queries": len(timings),
                "n_incomplete": len(incomplete),
                "n_excluded": len(BENCH_EXCLUDED),
                "exact_pairs_probe_n": len(probe),
                "ann_recall": ann_recall,
                "git_head": git_head(),
                "cpu_calib_ms": calib,
                "cpu_parallelism": cpu_par,
                "outlier_reruns": outlier_reruns,
                "cpu_parallelism_of": int(cpus),
                "queries": slowest,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
