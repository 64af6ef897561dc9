"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full payload JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} followed by a compact ~150-char summary
JSON line (same metric/value/unit/sf, no per-query map) as the FINAL
stdout line — the driver tails stdout to ~2000 chars, which truncated the
full line every round since r3, so the last line must fit the tail.

Timeout-survivability (r11, after BENCH_r10.json came back rc=124 with
an EMPTY tail): the orchestrator now STREAMS a parsable compact line
after every bucket, prints a provisional summary (and writes the full
BENCH_full_latest.json) BEFORE the isolated-triage loop, and re-prints
the final summary last — a run killed at any point still leaves a
valid headline_queries_total line as the last stdout line. Wall is cut
by (a) folding the dedicated cold pass into the measurement loop
(pass 0 = cold record, passes 1..N = warm samples, min-of-N estimator)
and (b) the HEADLINE_CURATED retirement policy below (~124 rows
instead of the full registry; SPARK_GRAFT_BENCH_FULL=1 restores the
full sweep).

Each query is forced end-to-end with the noop write sink (materializes
every row, no driver collect, no output I/O skew).

Registry-size invariance (r6 verdict "what's wrong" #3): one JVM
running the whole registry accretes codegen classes, metaspace, and
old-gen pressure, so a query's recorded time drifted upward with how
many queries PRECEDED it (the same code measured 1.18-1.43× slower as
the registry grew r5→r6, with identical plans). The harness therefore
shards the headline list into batches and runs each batch in a FRESH
PYTHON SUBPROCESS — a new JVM, because stopping a SparkContext
in-process reuses the running py4j gateway JVM and keeps its metaspace.
Recorded times are then a function of the query, not of the registry
size. The orchestrator merges the per-batch JSON lines into the same
single-line payload as before.

Batch-composition pinning (r7 verdict next #2): positional slices of
HEADLINE meant every round's prepends reshuffled which queries share a
JVM, and warm medians on UNCHANGED code moved 1.5-2× with batch
placement (cohort_retention 2.08×). Batches are now assigned by a
STABLE name hash — bucket = md5(name) % $SPARK_GRAFT_BENCH_BUCKETS
(default 12) — so an existing query keeps its JVM cohort forever;
additions join their hash bucket without displacing anyone. Changing
the bucket count is the one thing that reshuffles — bump it only with
a round-note. Self-triage (r10): after the batched run, any query whose
warm median exceeds 2x its previous-committed value (and >=0.5 s) is
re-measured ONCE in a fresh single-query JVM and recorded under
"isolated" — the artifact explains its own outliers instead of
requiring manual noise archaeology. Per-query warm estimators (min2 vs
median3) are recorded under "queries_warm_estimator" since min-of-2 is
biased low vs a true median. ROUND-NOTE r8: bumped 6 -> 12 after measuring in-JVM
accretion drag: every >1.5x "regression" in the first r8 run sat in a
bucket that had gained new-query co-residents (token_allocation 3.3 ->
8.0 s sharing with entity_clusters, isolated-JVM ground truth 3.7 s),
while the median unchanged-query ratio was 0.996. Halving batch size
(~45 -> ~24 queries/JVM) bounds codegen/metaspace accretion; the one-
time reshuffle makes THIS round's committed bench the new cohort
baseline. SPARK_GRAFT_BATCH_RANGE=lo:hi still runs a manual
positional slice for debugging.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_FULL = [
    "r3_load_aggregate",
    "r4_keyset_page",
    "r9_time_scan",
    "r10_replay_grouped",
    "r11_replay_by_type",
    "window_commit_order",
    "x1_index_day_counts",
    "x2_index_day_read",
    "c3_counters",
    "join_revenue_by_nation",
    "supplier_margin",
    "q1_pricing_summary",
    "topk_per_group",
    "rollup_orders",
    "cube_orders",
    "time_bucket_rollup",
    "pivot_status_priority",
    "scalar_funcs",
    "window_funcs",
    "value_histogram",
    "regression_trend",
    "json_props_extract",
    "exists_semi_join",
    "distinct_users",
    "asof_join",
    "sessionize",
    "range_join_windows",
    "dedup_exact",
    "corpus_split",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_stats",
    "token_count",
    "text_lang_id",
    "sim_topk_l2",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_cosine_near_dup",
    "multimodal_features",
    "multimodal_frame_plan",
    "curation_gopher",
    "curation_top_bigram",
    "dedup_bloom_membership",
    "pii_redaction",
    "session_windows",
    "sim_topk_ivfpq",
    "dedup_corpus_lines",
    "stratified_sample",
    "decontaminate",
    "merge_changelog",
    "kmeans_assign",
    "cluster_balanced_sample",
    "pack_sequences",
    "quality_quantile_filter",
    "dsir_importance",
    "bow_embedding_buckets",
    "tfidf_weights",
    "embedding_dim_stats",
    "domain_stats",
    "chunk_docs",
    "vocab_top100",
    "lm_bigram_score",
    "dedup_survivors",
    "mixture_temperature",
    "funnel_conversion",
    "cohort_retention",
    "value_percentiles",
    "embedding_covariance",
    "pca_project",
    "event_transitions",
    "multimodal_real_decode",
    "sim_multi_topk",
    "nearest_join",
    "profile_events",
    "expectations",
    "retrieval_bm25",
    "fuzzy_join_names",
    "dedup_substring_spans",
    "knn_graph",
    "bpe_pair_counts",
    "pmi_collocations",
    "pagerank_custsupp",
    "q6_forecast_revenue",
    "q12_priority_lines",
    "q13_customer_distribution",
    "q19_or_pushdown",
    "q22_acctbal_antijoin",
    "rolling_anomalies",
    "zorder_cells",
    "props_index_lookup",
    "basket_lift",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "matview_orders",
    "q15_top_supplier",
    "epoch_shuffle",
    "length_batches",
    "knn_graph_lsh",
    "q3_shipping_priority",
    "q10_returned_items",
    "retrieval_bm25_multi",
    "lm_stupid_backoff",
    "q7_nation_volume",
    "q14_promo_share",
    "q16_supplier_counts",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_profit",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "text_entropy",
    "graph_lpa_knn",
    "graph_triangles_knn",
    "graph_adamic_adar_knn",
    "ewma_events",
    "weighted_sample_docs",
    "skipgram_ppmi",
    "multimodal_sample_frames",
    "multimodal_resize",
    "text_normalize",
    "random_projection",
    "bpe_encode_words",
    "dedup_containment",
    "quality_model_score",
    "sliding_active_users",
    "resample_ffill",
    "session_concurrency",
    "sq8_codes",
    "sq8_recall",
    "abandoned_after",
    "weighted_sample_by_lang",
    "negative_samples",
    "psi_drift",
    "canonical_urls",
    "state_runs",
    "string_indexer",
    "ks_drift",
    "latest_property_state",
    "weighted_median",
    "ngram_uniqueness",
    "ppl_buckets",
    "domain_reweight",
    "winnow_fingerprints",
    "winnow_matches",
    "semdedup",
    "soft_dedup_weights",
    "contamination_fraction",
    "token_allocation",
    "quality_correlations",
    "image_phash",
    "phash_near_dup",
    "audio_fingerprint",
    "audio_near_dup",
    "video_near_dup",
    "hard_negatives",
    "token_fertility",
    "matryoshka_overlap",
    "phash_index_probe",
    "phash_clusters",
    "k_anonymity",
    "suppress_to_k",
    "psi_timeline",
    "hll_distinct",
    "heavy_hitters_cms",
    "graph_bfs_hops",
    "l_diversity",
    "t_closeness",
    "embedding_outliers",
    "rrf_fusion",
    "seasonal_naive",
    "mutual_information",
    "vocab_growth",
    "approx_quantiles_binned",
    "langid_confusion",
    "langid_kappa",
    "quality_auc",
    "tfidf_cosine_topk",
    "rfm_segments",
    # r6 additions
    "bq_hamming_topk",
    "property_scd2",
    "span_corruption",
    "skew_profile",
    "zipf_slope",
    "kfold_leakage",
    "score_percentiles",
    "oov_rates",
    "js_drift",
    "burstiness",
    "cdc_dedup",
    "heldout_ppl",
    "embedding_isotropy",
    "ooo_arrivals",
    "incremental_projection",
    "trimmed_stats",
    "funnel_latency",
    "calibration_curve",
    "simhash_calibration",
    "join_cardinality",
    "pareto_frontier",
    "decayed_topk",
    "attribution_credit",
    "km_survival",
    "mmr_diverse_topk",
    "graph_kcore",
    "benford_audit",
    "cusum_changepoints",
    "retrieval_ndcg",
    "snapshot_diff",
    "conversion_ci",
    "frequent_paths",
    "acf_daily",
    "gini_concentration",
    "sim_topk_filtered",
    "markov_stationary",
    "session_flow",
    "woe_iv",
    "did_estimate",
    "label_noise",
    "kmv_distinct",
    "bootstrap_ci",
    "cuped_estimate",
    "srm_check",
    "ccf_leadlag",
    "dbscan_clusters",
    "theil_sen_trend",
    "rake_keywords",
    "holt_linear",
    "item_item_cf",
    "isotonic_calibration",
    "hll_sliding_distinct",
    "quantile_normalize",
    "mad_outlier_days",
    "ess_report",
    "source_similarity_js",
    "ratio_metric_ci",
    "threshold_sweep",
    "dispersion_report",
    "lsh_band_plan",
    # r7 additions
    "multimodal_mp4_meta",
    "mann_kendall",
    "mann_whitney_u",
    "phrase_search",
    "dp_noisy_counts",
    "propensity_strata",
    "eb_shrunk_rates",
    "logrank_test",
    "brier_decomposition",
    # r8 additions
    "multimodal_mp4_frames",
    "chi_square_independence",
    "kruskal_wallis",
    "spearman_corr",
    "ipw_ate",
    "seasonal_decompose",
    "permutation_pvalue",
    "v_optimal_histogram",
    "cochran_armitage",
    "retrieval_ql_dirichlet",
    "haar_energy_daily",
    "changepoints_lsq",
    "entity_clusters",
    "boilerplate_fraction",
    "blocklist_hits",
    "holt_winters",
    "simpsons_check",
    # r9 additions
    "anova_oneway",
    "welch_ttest",
    "mcnemar_test",
    "kendall_tau_daily",
    "nelson_aalen",
    "forecast_accuracy",
    "retrieval_ql_jm",
    "target_encoding",
    "hits_custsupp",
    "brown_forsythe",
    "ece_calibration",
    "borda_fusion",
    "multimodal_bmp",
    "cohens_d",
    "rank_overlap_rbo",
    # r10 additions
    "ann_recall_audit",
    "bpe_learn_merges",
    "wilcoxon_signed_rank",
    "ngram_novelty",
    "readability",
    "hill_tail_index",
    "ppr_custsupp",
    "hhi_supplier_nation",
    "aalen_johansen",
    "quantile_pinball",
    "sprt_purchase",
    "capture_recapture",
    "good_turing",
    "interval_join_windows",
    # r11 additions
    "kn_continuation",
    "retrieval_map",
    "graph_modularity",
    "conformal_interval",
    "bh_fdr_signtest",
    "hilbert_cells",
    "graph_assortativity",
    "kmv_users_setops",
    "croston_purchases",
    "gains_acctbal",
    "wasserstein_value_drift",
]

# ---- headline retirement policy (r11, VERDICT r10 next #4) ----
# 297 queries x (cold + warm passes) in 12 JVMs outgrew the driver's
# wall budget (BENCH_r10.json: rc=124, empty tail). The correctness
# gate (tools/check_oracle.py, ~5 min at sf0.01) already covers every
# registered query, so the per-round HEADLINE bench is CURATED:
#   (a) every §2 core/eventstore query,
#   (b) all 31 queries of the r1 BASELINE set (BENCH_r01.json) so
#       bench_vs_baseline stays computable round-over-round,
#   (c) every query whose previous COMMITTED warm median was >= 2.5 s
#       (the perf-sensitive tail where regressions actually live),
#   (d) one representative per operator family that (c) would
#       otherwise drop entirely (ANN probes, multimodal decode,
#       sketches, packing/sampling, CDC/merge, survival, interval
#       join, TPC-H heavies),
#   (e) every query added or touched in the current round.
# Retired queries stay in HEADLINE_FULL and still run under
# SPARK_GRAFT_BENCH_FULL=1 (the occasional full sweep); bucket
# assignment is by name hash, so curation never moves a surviving
# query to a different JVM cohort — it only removes co-residents.
HEADLINE_CURATED = [
    "r3_load_aggregate",
    "r4_keyset_page",
    "r9_time_scan",
    "r10_replay_grouped",
    "r11_replay_by_type",
    "window_commit_order",
    "x1_index_day_counts",
    "x2_index_day_read",
    "c3_counters",
    "join_revenue_by_nation",
    "q1_pricing_summary",
    "topk_per_group",
    "rollup_orders",
    "pivot_status_priority",
    "scalar_funcs",
    "json_props_extract",
    "exists_semi_join",
    "distinct_users",
    "asof_join",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_stats",
    "token_count",
    "text_lang_id",
    "sim_topk_l2",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_cosine_near_dup",
    "multimodal_features",
    "curation_gopher",
    "curation_top_bigram",
    "dedup_bloom_membership",
    "sim_topk_ivfpq",
    "merge_changelog",
    "pack_sequences",
    "dsir_importance",
    "tfidf_weights",
    "lm_bigram_score",
    "dedup_survivors",
    "multimodal_real_decode",
    "profile_events",
    "expectations",
    "retrieval_bm25",
    "fuzzy_join_names",
    "dedup_substring_spans",
    "pagerank_custsupp",
    "props_index_lookup",
    "basket_lift",
    "q2_min_cost_supplier",
    "matview_orders",
    "epoch_shuffle",
    "knn_graph_lsh",
    "retrieval_bm25_multi",
    "lm_stupid_backoff",
    "q21_waiting_suppliers",
    "graph_lpa_knn",
    "graph_triangles_knn",
    "skipgram_ppmi",
    "dedup_containment",
    "session_concurrency",
    "ks_drift",
    "ngram_uniqueness",
    "ppl_buckets",
    "domain_reweight",
    "winnow_matches",
    "semdedup",
    "soft_dedup_weights",
    "token_allocation",
    "quality_correlations",
    "image_phash",
    "phash_near_dup",
    "audio_near_dup",
    "phash_clusters",
    "psi_timeline",
    "heavy_hitters_cms",
    "graph_bfs_hops",
    "rrf_fusion",
    "langid_kappa",
    "quality_auc",
    "tfidf_cosine_topk",
    "span_corruption",
    "score_percentiles",
    "cdc_dedup",
    "trimmed_stats",
    "funnel_latency",
    "simhash_calibration",
    "graph_kcore",
    "retrieval_ndcg",
    "acf_daily",
    "woe_iv",
    "label_noise",
    "kmv_distinct",
    "dbscan_clusters",
    "item_item_cf",
    "isotonic_calibration",
    "quantile_normalize",
    "ess_report",
    "threshold_sweep",
    "lsh_band_plan",
    "mann_kendall",
    "logrank_test",
    "multimodal_mp4_frames",
    "kruskal_wallis",
    "spearman_corr",
    "ipw_ate",
    "seasonal_decompose",
    "entity_clusters",
    "hits_custsupp",
    "brown_forsythe",
    "ece_calibration",
    "borda_fusion",
    "rank_overlap_rbo",
    "ann_recall_audit",
    "bpe_learn_merges",
    "wilcoxon_signed_rank",
    "ngram_novelty",
    "ppr_custsupp",
    "hhi_supplier_nation",
    "sprt_purchase",
    "capture_recapture",
    "interval_join_windows",
    # r11: new this round (rule e)
    "kn_continuation",
    "retrieval_map",
    "graph_modularity",
    "conformal_interval",
    "bh_fdr_signtest",
    "hilbert_cells",
    "graph_assortativity",
    "kmv_users_setops",
    "croston_purchases",
    "gains_acctbal",
    "wasserstein_value_drift",
]

HEADLINE = (
    HEADLINE_FULL
    if os.environ.get("SPARK_GRAFT_BENCH_FULL")
    else HEADLINE_CURATED
)


def _bucket(name: str, n_buckets: int) -> int:
    """Stable JVM-cohort assignment: md5, never python hash() (which is
    salted per process). A query's bucket depends only on its name and
    the bucket count, so round-over-round warm medians compare the same
    JVM cohort."""
    import hashlib

    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % n_buckets


def _run_batch(batch: list[str], sf_dir: str) -> dict:
    """Worker: run one batch of headline queries in THIS process's
    (fresh) JVM and return the partial payload."""
    from inception_eventstore_spark.plans.queries import (
        prebuild_ann_indexes,
        prebuild_phash_index,
        prebuild_prop_index,
        spark_queries,
    )
    from inception_eventstore_spark.session import get_spark

    # local-mode default driver heap is 1g for the WHOLE JVM (driver +
    # all 32 executor threads) — the wide-row joins (semdedup pair
    # verify, CC rounds) need real executor memory, same setting the
    # scale smokes use
    # spark.ui.enabled=false: the UI's AppStatusListener retains live
    # state for every stage/task of the run — after ~150 queries
    # (2000+ stages in one JVM) the listener bus measurably throttles
    # scheduling (semdedup mid-bench: 15.2 s with UI on, 3.5 s with UI
    # off at identical plans — the true root cause of the r5
    # warm>cold anomaly). A per-query production job never carries
    # another 200 queries' UI state, so benching without it is the
    # faithful setup; retention caps are defense-in-depth for tools
    # that re-enable the UI.
    spark = get_spark(
        "bench",
        extra_configs={
            "spark.driver.memory": "16g",
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "10",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    # Warm the JVM + parquet footers once (excluded from timings).
    qs["x5_min_ts"](spark, sf_dir).collect()

    # ANN/property/phash indexes are ingest-time state: build them
    # before the timed loop (reported separately under "ann_build_sec")
    # so the headline rows for the probe queries measure the probe — a
    # partition-pruned scan — not quantizer training + full encode +
    # index write. Only the kinds THIS batch probes are built; the
    # probe queries also prebuild lazily, so correctness never depends
    # on this. Both ANN probes use the pinned-quantizer variants
    # (value-oracle-able); k-means-trained builds stay covered by
    # tests/test_pq.py.
    ann_build: dict[str, float] = {}
    kinds = tuple(
        kind
        for q, kind in (
            ("sim_topk_ivf", "ivf_pinned"),
            ("sim_topk_ivfpq", "ivfpq_pinned"),
        )
        if q in batch
    )
    if kinds:
        ann_build.update(prebuild_ann_indexes(spark, sf_dir, kinds=kinds))
    if "props_index_lookup" in batch:
        ann_build["prop_index"] = prebuild_prop_index(spark, sf_dir)
    if "phash_index_probe" in batch:
        ann_build["phash_index"] = prebuild_phash_index(spark, sf_dir)

    # Several operators pin intermediates with localCheckpoint; the
    # blocks are reaped by the ContextCleaner only after a JVM GC
    # notices the dropped RDD references — which a 16g heap may not
    # run for the whole batch, so storage would accumulate
    # pass-over-pass (r5: warm_total > cold_total). Nudge a GC after
    # every query, OUTSIDE the timed sections, so each query runs
    # against a clean executor storage pool like it would in a fresh
    # job.
    #
    # r12 (VERDICT r11 #1 — cache honesty): clearCache() as well.
    # persist() registers the plan in the session CacheManager, which
    # pins the InMemoryRelation until an explicit unpersist — the GC
    # nudge alone cannot reap it. A warm pass that rebuilds the
    # IDENTICAL plan then reads the previous pass's columnar cache and
    # the min-of-N estimator reports near-zero recompute (r11: winnow
    # cold 5.75 s vs cache-assisted warm 1.78 s). Clearing the session
    # cache between timed queries makes every sample an honest
    # fresh-computation measurement; the ANN/prop/phash prebuilds are
    # parquet directories on disk, untouched by this.
    def _gc() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    # Pass structure (r11, VERDICT r10 next #1b — cut wall): the old
    # harness ran 1 dedicated cold pass + 2-3 warm passes; the cold
    # pass is now FOLDED into the loop — pass 0 is recorded under
    # "queries" (the cold number, same position it always had: after
    # the x5 warmup + prebuilds, first execution of this plan in this
    # JVM), passes 1..WARM_RUNS are the warm samples. Warm estimator
    # is min-of-N (a mean/median of 2 is corrupted by one GC
    # straggler; min is a fine steady-state estimator and is RECORDED
    # per query so round-over-round diffs know min2 is biased low vs
    # the median3 used through r10).
    warm_runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "2"))
    timings: dict[str, float] = {}
    warm_median: dict[str, float] = {}
    warm_estimator: dict[str, str] = {}
    samples: dict[str, list[float]] = {n: [] for n in batch}
    for pass_i in range(1 + warm_runs):
        for name in batch:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            del df
            _gc()
            if pass_i == 0:
                timings[name] = round(dt, 3)
            else:
                samples[name].append(dt)
    for name, xs in samples.items():
        if not xs:
            continue
        warm_median[name] = round(min(xs), 3)
        warm_estimator[name] = f"min{len(xs)}"

    spark.stop()
    return {
        "queries": timings,
        "queries_warm_median": warm_median,
        "queries_warm_estimator": warm_estimator,
        "warm_runs": warm_runs,
        "ann_build_sec": ann_build,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    rng = os.environ.get("SPARK_GRAFT_BATCH_RANGE")
    if rng:
        # ---- worker mode (manual positional slice, debugging) ----
        lo, hi = (int(x) for x in rng.split(":"))
        print(json.dumps(_run_batch(HEADLINE[lo:hi], sf_dir)))
        return

    iso_env = os.environ.get("SPARK_GRAFT_ISOLATE_QUERY")
    if iso_env:
        # ---- worker mode: ONE query, completely fresh JVM — the
        # ground-truth re-measurement for >2x triage ----
        print(json.dumps(_run_batch([iso_env], sf_dir)))
        return

    n_buckets = int(os.environ.get("SPARK_GRAFT_BENCH_BUCKETS", "12"))
    bucket_env = os.environ.get("SPARK_GRAFT_BATCH_BUCKET")
    if bucket_env is not None:
        # ---- worker mode: one stable-hash bucket, fresh JVM ----
        b = int(bucket_env)
        batch = [n for n in HEADLINE if _bucket(n, n_buckets) == b]
        print(json.dumps(_run_batch(batch, sf_dir)))
        return

    # ---- orchestrator: one fresh-JVM subprocess per hash bucket ----
    # Streaming partials (r11, VERDICT r10 next #1a): BENCH_r10.json was
    # rc=124 with an EMPTY tail because this loop used to buffer
    # everything and print once at the end — a run that outlives the
    # driver's wall budget must still leave a parsable
    # headline_queries_total line on stdout. Every partial line below is
    # a complete compact payload (metric/value/unit/sf) so the driver's
    # last-line JSON parse succeeds no matter where a timeout lands.
    queries: dict[str, float] = {}
    warm_median: dict[str, float] = {}
    warm_estimator: dict[str, str] = {}
    ann_build: dict[str, float] = {}
    warm_runs = 0
    n_batches = 0
    active = [
        b for b in range(n_buckets)
        if any(_bucket(n, n_buckets) == b for n in HEADLINE)
    ]
    for b in active:
        env = dict(os.environ, SPARK_GRAFT_BATCH_BUCKET=str(b))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"bench bucket {b}/{n_buckets} failed "
                f"(rc={proc.returncode}): {proc.stdout[-2000:]}"
            )
        part = json.loads(lines[-1])
        queries.update(part["queries"])
        warm_median.update(part["queries_warm_median"])
        warm_estimator.update(part.get("queries_warm_estimator", {}))
        ann_build.update(part["ann_build_sec"])
        warm_runs = part["warm_runs"]
        n_batches += 1
        print(json.dumps({
            "metric": "headline_queries_total",
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "warm_total": round(sum(warm_median.values()), 3),
            "n_queries": len(queries),
            "partial": f"{n_batches}/{len(active)}",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }), flush=True)

    # ---- self-triage (r9 verdict next #1): any query whose warm
    # median exceeds 2x its value in the PREVIOUS COMMITTED
    # BENCH_full_latest.json gets ONE automatic re-measurement in a
    # fresh single-query JVM. Co-tenant load on this host spikes
    # 3-10x unpredictably (r7-r9 all carried unreproducible >2x rows
    # that each took a round of manual isolated-JVM archaeology);
    # recording the isolated ground truth INSIDE the artifact makes
    # the bench self-explaining. Sub-0.5 s rows are skipped (pure
    # JIT/GC jitter territory), and the rerun count is capped so a
    # globally-loaded machine can't double the bench wall time.
    isolated: dict[str, float] = {}
    prev_warm: dict[str, float] = {}
    cur_sf = float(sf) if sf.replace(".", "").isdigit() else sf
    here = os.path.dirname(os.path.abspath(__file__))
    prev_payload: dict = {}
    try:
        gp = subprocess.run(
            ["git", "show", "HEAD:BENCH_full_latest.json"],
            cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
        )
        if gp.returncode == 0:
            prev_payload = json.loads(gp.stdout)
    except (OSError, ValueError):
        pass
    if not prev_payload:
        try:
            with open(os.path.join(here, "BENCH_full_latest.json")) as fh:
                prev_payload = json.load(fh)
        except (OSError, ValueError):
            pass
    # only comparable at the same scale factor — an sf0.001 debug run
    # must not isolated-rerun against committed sf0.1 medians
    if prev_payload.get("sf") == cur_sf:
        prev_warm = prev_payload.get("queries_warm_median", {})
    # Outlier selection (widened r11, VERDICT r10 next #3): the >2x
    # ratio rule alone left the 1.5-2x drift band unexplained
    # (quantile_normalize +56%, basket_lift +55% in r10 with no
    # isolated evidence). In addition to every >2x row, the 3 largest
    # ABSOLUTE regressions (delta >= 1.0 s and ratio > 1.3) are
    # isolated too, all under the same cap. Ordered by delta
    # descending so the cap keeps the most expensive drifts.
    regress = {
        n: (w - prev_warm[n], w / prev_warm[n])
        for n, w in warm_median.items()
        if n in prev_warm and prev_warm[n] > 0
    }
    over2 = {
        n for n, (dlt, ratio) in regress.items()
        if warm_median[n] >= 0.5 and ratio > 2.0
    }
    top_delta = [
        n for n, (dlt, ratio) in sorted(
            regress.items(), key=lambda kv: -kv[1][0]
        )
        if n not in over2 and dlt >= 1.0 and ratio > 1.3
    ][:3]
    outliers = sorted(
        over2 | set(top_delta), key=lambda n: -regress[n][0]
    )
    max_iso = int(os.environ.get("SPARK_GRAFT_MAX_ISOLATED", "8"))

    # Provisional record BEFORE the triage loop (r11): if the driver's
    # timeout lands during the isolated re-runs, the last stdout line
    # is this parsable summary and BENCH_full_latest.json already
    # holds the complete per-query map (minus "isolated").
    total = round(sum(queries.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "queries_warm_median": warm_median,
        "queries_warm_estimator": warm_estimator,
        "warm_runs": warm_runs,
        "warm_total": round(sum(warm_median.values()), 3),
        "isolated": {},
        "ann_build_sec": ann_build,
        "bench_buckets": n_buckets,
        "n_batches": n_batches,
        "n_headline_full": len(HEADLINE_FULL),
        "headline_mode": "full" if HEADLINE is HEADLINE_FULL
        else "curated",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_full_latest.json"),
    )

    def _write_full() -> None:
        try:
            with open(out, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
                fh.write("\n")
        except OSError:
            pass  # read-only checkout must not fail the bench

    def _compact(**extra) -> str:
        return json.dumps({
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "warm_total": payload["warm_total"],
            "n_queries": len(queries),
            "sf": payload["sf"],
            **extra,
        })

    _write_full()
    print(_compact(n_isolated_pending=min(len(outliers), max_iso)),
          flush=True)

    for name in outliers[:max_iso]:
        env = dict(os.environ, SPARK_GRAFT_ISOLATE_QUERY=name)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            isolated[name] = -1.0  # rerun itself failed — flag, don't hide
            continue
        part = json.loads(lines[-1])
        isolated[name] = part["queries_warm_median"].get(name, -1.0)

    payload["isolated"] = isolated
    _write_full()
    # Full per-query payload line (auditable from a teed log), then the
    # compact summary as the FINAL stdout line: the driver keeps only a
    # ~2000-char tail of stdout and its last-line JSON parse must
    # succeed (the full line outgrew the tail at r3 — BENCH_r03..r08
    # all record "parsed": null).
    print(json.dumps(payload), flush=True)
    print(_compact(n_isolated=len(isolated)), flush=True)


if __name__ == "__main__":
    main()
