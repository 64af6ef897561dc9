"""Generate PLANS.md: physical-plan evidence that the declared queries
hit the intended execution strategies (pushdown, pruning, broadcast,
whole-stage codegen) at sf0.1.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    "r9_time_scan": [
        ("time window reaches parquet pushdown", r"PushedFilters: \[.*GreaterThanOrEqual\(ts"),
        ("column pruning (3-col read)", r"ReadSchema: struct<event_id:bigint,ts:(bigint|timestamp(_ntz)?),user_id:bigint"),
    ],
    "r11_replay_by_type": [
        ("type + time predicates pushed", r"PushedFilters: \[.*EqualTo\(event_type,click\)"),
    ],
    "join_revenue_by_nation": [
        ("dims broadcast (no shuffle join)", r"BroadcastHashJoin"),
        ("aggregation partial/final split", r"HashAggregate"),
    ],
    "q1_pricing_summary": [
        ("shipdate filter pushed", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("whole-stage codegen over scan+agg", r"\*\(\d+\) HashAggregate"),
    ],
    "window_commit_order": [
        ("single shuffle for window", r"Exchange hashpartitioning\(user_id"),
        ("window runs in one pass", r"RunningWindowFunction|Window"),
    ],
    "r10_replay_grouped": [
        ("map-side partial aggregation", r"HashAggregate.*partial|partial_count"),
    ],
    "r3_load_aggregate": [
        ("point filter pushed to scan", r"PushedFilters: \[.*EqualTo\(user_id,42\)"),
    ],
    "range_join_windows": [
        ("interval join runs as a hash/merge join on bucket ids, "
         "not BroadcastNestedLoopJoin",
         r"BroadcastHashJoin \[_rb|SortMergeJoin \[_rb|HashJoin.*_rb"),
    ],
    "chunk_docs": [
        ("chunking shuffles nothing", "!Exchange"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("index sequence explodes in Generate", r"Generate explode"),
    ],
    "mixture_temperature": [
        ("sample filter shuffles the corpus nowhere", "!Exchange"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("md5 bucket test runs in whole-stage codegen",
         r"\*\(\d+\) (Project|Filter)"),
    ],
    # funnel_conversion materializes each step eagerly and returns the
    # literal counts frame, so the declared query's plan carries no
    # joins — the per-step join shape is probed in EXTRA_CHECKS
    # ("funnel_step_join") instead.
    "lm_bigram_score": [
        ("count tables partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "pca_project": [
        ("projection is map-side only — no aggregation/join shuffle "
         "(the only Exchange is the final presentation sort)",
         "!Exchange hashpartitioning"),
        ("Arrow-batched matmul kernel", r"ArrowEvalPython"),
    ],
    "approx_stats": [
        ("all three sketch rollups partial-aggregate map-side",
         r"partial_count|HashAggregate.*partial"),
        ("CMS sketch broadcast to the probe side",
         r"BroadcastHashJoin"),
        ("no row-at-a-time python UDF", "!BatchEvalPython"),
    ],
    "dedup_survivors": [
        ("winner window partitions by component only (clustered subset)",
         r"Exchange hashpartitioning\(component"),
        ("untouched corpus passes via broadcast anti-join",
         r"BroadcastHashJoin [^\n]*LeftAnti"),
    ],
    "retrieval_bm25": [
        ("idf table joins back broadcast", r"BroadcastHashJoin"),
        ("postings partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "fuzzy_join_names": [
        ("deletion-neighborhood blocking joins on keys — never a cross "
         "product", "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("levenshtein verify is a JVM expression, no UDF",
         "!BatchEvalPython|ArrowEvalPython"),
    ],
    "dedup_substring_spans": [
        ("gram-count window shuffles the 8-byte hash, never gram strings",
         r"Exchange hashpartitioning\(_gh"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "knn_graph": [
        ("block pairs meet in a pandas COGROUP (no joined pair rows)",
         r"FlatMapCoGroupsInPandas"),
        ("global reduce is a window top-k", r"Window|RunningWindowFunction"),
    ],
    "bpe_pair_counts": [
        ("vocabulary and pair counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "pmi_collocations": [
        ("margin tables join back broadcast", r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    # pagerank_custsupp's declared query localCheckpoints the final rank
    # table (so its caches can be dropped), which hides the iteration
    # DAG — the iteration plan is probed via EXTRA_CHECKS instead.
    "q6_forecast_revenue": [
        # on legacy TIMESTAMP(NANOS) testdata the loader rewrites
        # l_shipdate as timestamp_micros(col div 1000) — a derived
        # column whose bound can't push; the alternation keeps the
        # check generation-aware (CLAUDE.md dtype invariant)
        ("shipdate bound pushed to the scan (µs data) or applied on the "
         "ns→µs conversion (legacy data)",
         r"PushedFilters: \[[^\n]*GreaterThanOrEqual\(l_shipdate"
         r"|div 1000"),
        ("single-row answer from partial+final agg",
         r"HashAggregate.*partial|partial_count"),
    ],
    "q19_or_pushdown": [
        ("OR-of-ANDs reaches the parquet scan as a pushed Or filter",
         r"PushedFilters: \[.*Or\("),
    ],
    "q22_acctbal_antijoin": [
        ("NOT EXISTS runs as a broadcast anti-join",
         r"BroadcastHashJoin [^\n]*LeftAnti"),
    ],
    "props_index_lookup": [
        ("index side reads ONE hash-bucket directory (driver-planned), "
         "not the whole index",
         r"PartitionFilters: \[[^\n]*_vb|_vb=\d+"),
        ("log joined via semi-join on the clustered key",
         r"LeftSemi"),
    ],
    "rolling_anomalies": [
        ("one hash shuffle on the key serves every frame aggregate",
         r"Exchange hashpartitioning\(user_id"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "zorder_cells": [
        ("bit interleave + histogram stay in whole-stage codegen",
         r"\*\(\d+\) HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    # (the edge set is localCheckpointed, so the upstream knn COGROUP
    # kernel is evidenced under knn_graph, not here)
    "graph_triangles_knn": [
        ("wedge/degree counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("closing-edge membership is a semi-join", r"LeftSemi"),
        ("wedge join is a key equi-join, never nested-loop",
         "!CartesianProduct|BroadcastNestedLoopJoin"),
    ],
    "graph_adamic_adar_knn": [
        ("degree table joins onto wedges broadcast",
         r"BroadcastHashJoin"),
        ("adjacent pairs removed by anti-join, not a filter scan",
         r"LeftAnti"),
    ],
    "ewma_events": [
        ("one hash shuffle on the key serves the whole lag chain",
         r"Exchange hashpartitioning\(user_id"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "weighted_sample_docs": [
        ("global top-k runs as TakeOrdered (per-partition heaps), "
         "never a full sort", r"TakeOrderedAndProject"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "quality_correlations": [
        ("one partial-aggregated correlation fold",
         r"HashAggregate.*partial|partial_corr|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "token_allocation": [
        ("weight table joins broadcast", r"BroadcastHashJoin"),
        ("domain aggregates partial-first",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "soft_dedup_weights": [
        ("size table joins back without reshuffling the corpus body "
         "more than once", r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "contamination_fraction": [
        ("benchmark gram set joins broadcast — the corpus never "
         "shuffles to meet it", r"BroadcastHashJoin"),
        ("per-doc fold partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "semdedup": [
        ("pair comparison is a cluster-key equi-join, never a corpus "
         "cross join on the pair side",
         r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*cluster"),
        ("pair cosines run in the Arrow kernel", r"ArrowEvalPython"),
    ],
    "winnow_fingerprints": [
        ("selection is one running window per document — no self-join, "
         "no global sort", r"Exchange hashpartitioning\(doc_id"),
        ("k-gram explode runs in Generate", r"Generate posexplode"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "winnow_matches": [
        ("pairs form on the fingerprint equi-join, never a document "
         "cross join", "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("shared counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
    ],
    "ppl_buckets": [
        # the rank is the two-phase shard rank: the final plan reads
        # the range-partitioned checkpoint and windows WITHIN each
        # (shard, lang) — a plain per-language window would be a
        # single task holding ~half a web corpus (English)
        ("rank window is per (range-shard, language) — never a "
         "per-language single task",
         r"Exchange hashpartitioning\(_gr_pid"),
        ("shard offsets join back broadcast", r"BroadcastHashJoin"),
        ("no per-language (or global) single-task window",
         "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "string_indexer": [
        ("vocabulary rank is the two-phase shard rank — no "
         "partitionBy(lit(1)) single-task window",
         "!Exchange SinglePartition"),
        ("within-shard window shuffles on the shard id",
         r"Exchange hashpartitioning\(_gr_pid"),
    ],
    "token_fertility": [
        ("one partial-aggregated scan per language",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "k_anonymity": [
        ("class sizes partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "l_diversity": [
        ("class sizes + distinct secrets partial-aggregated before "
         "the shuffle", r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "quality_auc": [
        ("distinct-score group table partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        # NOTE: the query ENDS in a one-row scalar aggregate, whose
        # final stage is legitimately a SinglePartition exchange — the
        # skew property to assert is that the RUNNING SUM keys on the
        # range-shard pid (the global Window-over-SinglePartition lint
        # still guards every Window in this plan)
        ("neg-below running sum is the two-phase shard form — window "
         "keys on the range-shard pid",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "langid_kappa": [
        ("joint (truth, pred) table partial-aggregated before the "
         "shuffle", r"HashAggregate.*partial|partial_count"),
        ("no window anywhere — label-keyed folds only", "!Window"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "t_closeness": [
        ("cell counts partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("global value distribution broadcast back, not shuffled",
         r"BroadcastExchange|BroadcastHashJoin"),
        ("no window anywhere — scalar folds only", "!Window"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "suppress_to_k": [
        ("survivors via a semi-join on the class keys — no row-level "
         "anti cross join",
         r"LeftSemi"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "seasonal_naive": [
        ("stream collapses to the (key, day) rollup partial-first",
         r"HashAggregate.*partial|partial_sum"),
        ("season lag is a self-equi-join of the rollup — no per-key "
         "ordered window anywhere", "!Window"),
        ("no single-partition exchange", "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "rrf_fusion": [
        ("fusion groupBy partial-aggregates the union of top-k lists",
         r"HashAggregate.*partial|partial_sum"),
        ("fused rank window shuffles on the query key, never a single "
         "partition", "!Exchange SinglePartition"),
        ("semantic side stays the Arrow batch kernel",
         r"MapInPandas|ArrowEvalPython"),
    ],
    "embedding_outliers": [
        ("scoring pass is literal-array arithmetic — no stats join",
         "!SortMergeJoin|ShuffledHashJoin"),
        ("z² micro-unit sum partial-aggregates before the id shuffle",
         r"partial_sum|HashAggregate.*partial"),
        ("top-20 via per-partition TakeOrdered merge, not a global sort",
         r"TakeOrderedAndProject"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "rfm_segments": [
        ("per-user rollup partial-aggregates before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("quintile edges broadcast back — scoring is a map-side CASE, "
         "no window anywhere", "!Window"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "tfidf_cosine_topk": [
        ("tf / norm aggregations partial-first",
         r"HashAggregate.*partial|partial_count"),
        ("query weights broadcast to the postings side",
         r"BroadcastHashJoin"),
        ("rank window shuffles on the query key, never one partition",
         "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "langid_confusion": [
        ("(truth, pred) cells partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("class totals join back broadcast", r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "hll_distinct": [
        ("register max is map-side combinable (partial_max before the "
         "shuffle — the input never moves, only ≤ groups·512 registers)",
         r"partial_max|HashAggregate.*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no single-partition exchange", "!Exchange SinglePartition"),
    ],
    "heavy_hitters_cms": [
        ("top-10 candidates via per-partition TakeOrdered merge, not a "
         "global sort", r"TakeOrderedAndProject"),
        ("the 256-counter sketch broadcasts to the probe side",
         r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "psi_timeline": [
        ("period-bin counts partial-aggregated (one scan, not a "
         "pass per period)",
         r"HashAggregate.*partial|partial_count"),
        ("baseline counts and totals join back broadcast",
         r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "domain_reweight": [
        ("per-domain stats aggregate partial-first",
         r"HashAggregate.*partial|partial_count"),
        ("global totals join back broadcast — the corpus never "
         "shuffles to meet them", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "epoch_shuffle": [
        ("rank is two-phase shard prefix + within-shard row_number — "
         "no single-partition Exchange anywhere",
         "!Exchange SinglePartition"),
        ("within-shard window shuffles on the shard key",
         r"Exchange hashpartitioning\(_shard"),
        ("shard offsets join back broadcast", r"BroadcastHashJoin"),
    ],
    "skipgram_ppmi": [
        ("margin tables join back broadcast", r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "multimodal_sample_frames": [
        ("frame extraction is one Arrow-batched python kernel",
         r"MapInPandas"),
        ("no shuffle anywhere — chunk slicing is map-side", "!Exchange"),
    ],
    "multimodal_mp4_meta": [
        ("moov box walk is one Arrow-batched python kernel",
         r"MapInPandas"),
        ("header parse is map-side — the only Exchange is the final "
         "presentation sort", "!Exchange hashpartitioning"),
    ],
    "multimodal_mp4_frames": [
        ("sample-table slicing is one Arrow-batched python kernel",
         r"MapInPandas"),
        ("frame extraction is map-side — no shuffle", "!Exchange"),
    ],
    "quality_model_score": [
        # r11: seeded weights are driver-inlined as a literal array
        # (element_at lookup per token) — no weight join exists at all,
        # and the whole score is one partial-aggregated groupBy(doc)
        ("seeded weights inlined — no join anywhere in the score",
         r"!BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
        ("score aggregate partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "dedup_containment": [
        ("candidate generation is a key equi-join, never a cross "
         "product", "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "sliding_active_users": [
        ("contribution explode runs in Generate", r"Generate explode"),
        ("per-day distinct partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no ranking window anywhere", "!Window"),
    ],
    "text_normalize": [
        ("NFC is the one Arrow seam", r"ArrowEvalPython"),
        ("no shuffle — cleaning is a map pass",
         "!Exchange hashpartitioning"),
    ],
    "bpe_encode_words": [
        ("vocabulary counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("merge chain is JVM regex — no python UDF",
         "!BatchEvalPython|ArrowEvalPython"),
    ],
    "resample_ffill": [
        ("grid points explode in Generate", r"Generate explode"),
        ("one hash shuffle on the key serves the fill window",
         r"Exchange hashpartitioning\(_k"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "session_concurrency": [
        ("per-day sweep window partitioned by day — no single-"
         "partition global sort", "!Exchange SinglePartition"),
        ("per-day peaks partial-aggregated",
         r"HashAggregate.*partial|partial_max"),
    ],
    "sq8_codes": [
        ("per-dim bounds join back broadcast", r"BroadcastHashJoin"),
        ("bounds and code groupBys partial-aggregated",
         r"HashAggregate.*partial|partial_min"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "sq8_recall": [
        ("both top-10 cuts run as TakeOrdered, never a full sort",
         r"TakeOrderedAndProject"),
        ("hit check is a semi-join", r"LeftSemi"),
    ],
    "negative_samples": [
        ("uniforms meet the CDF through the bucketized range join — "
         "never a nested loop", "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("bucket ids join hash-side", r"Join [^\n]*_rb|HashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "canonical_urls": [
        ("URL explode runs in Generate", r"Generate"),
        ("canonical counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "abandoned_after": [
        ("absence check is union + window — NO join operator anywhere",
         "!SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct"),
        ("one hash shuffle on the key",
         r"Exchange hashpartitioning\(user_id"),
    ],
    "state_runs": [
        ("island numbering shuffles on the key",
         r"Exchange hashpartitioning\(user_id"),
        ("run collapse partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "psi_drift": [
        ("binning is a map-side CASE chain — no UDF",
         "!BatchEvalPython|ArrowEvalPython"),
        ("bucket counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
    ],
    "ks_drift": [
        ("per-side distinct-value counts partial-aggregated",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "latest_property_state": [
        ("latest-wins is a max_by AGGREGATE — no ranking window",
         "!Window"),
        ("property explode runs in Generate", r"Generate"),
        ("state fold partial-aggregated",
         r"HashAggregate.*partial|partial_max"),
    ],
    "weighted_median": [
        ("one hash shuffle on the group serves both running sums",
         r"Exchange hashpartitioning\(event_type"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "property_scd2": [
        ("lag/lead/version share ONE (aggregate, property) sort — a "
         "single hash exchange, no single-partition window",
         r"Exchange hashpartitioning\(user_id"),
        ("no single-partition exchange", "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "span_corruption": [
        ("token TEXT never shuffles — only (doc_id, position) pairs "
         "explode (Generate over sequence, no token column downstream)",
         r"Generate explode"),
        ("mask/span windows partition by doc_id, never one partition",
         "!Exchange SinglePartition"),
        ("per-doc aggregates partial-first",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "skew_profile": [
        # counts + TakeOrdered run INSIDE the two-phase rank's eager
        # checkpoint, so the probed plan starts at the checkpoint scan;
        # the visible property is the shard-keyed rank + broadcast
        # offsets (the pre-rank shape is pinned by TestKeySkewProfile)
        ("rank over the k survivors is the two-phase shard rank",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("shard offsets join back broadcast", r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "zipf_slope": [
        ("vocab counts partial-aggregate — one row per distinct token "
         "shuffles, never per occurrence",
         r"HashAggregate.*partial|partial_count"),
        # the query ends in a one-row scalar aggregate (legit
        # SinglePartition final stage) — assert the rank's shard keying
        ("head rank via the two-phase shard rank — window keys on the "
         "range-shard pid", r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "kfold_leakage": [
        ("fold assignment is a map-side hash expression — the only "
         "shuffles carry one row per group, then one per fold",
         r"HashAggregate.*partial|partial_count"),
        ("no single-partition exchange", "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "score_percentiles": [
        ("prefix counts over the distinct-score table use the two-phase "
         "sharded running sum (window keys on the range-shard pid)",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        # (the 1-row totals crossJoin is a legit BroadcastNestedLoop —
        # broadcast of exactly one row; the scale-relevant join is the
        # score-keyed re-join, which must be a hash join)
        ("percentile table re-joins rows on the score key as a hash "
         "join", r"BroadcastHashJoin \[(knownfloatingpointnormalized\()?"
         r"(normalizenanandzero\()?(score|_s)"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "oov_rates": [
        ("vocab head is a TakeOrdered merge, not a global sort",
         r"TakeOrderedAndProject"),
        ("vocab joins onto the token stream broadcast",
         r"BroadcastHashJoin"),
        ("per-language aggregate partial-first",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "js_drift": [
        ("binning is map-side against literal edges — counts "
         "partial-aggregate", r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "burstiness": [
        ("one hash shuffle on the key serves the lag window",
         r"Exchange hashpartitioning\(user_id"),
        ("moment fold aggregates on the window's existing key "
         "partitioning — no second shuffle", r"HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "embedding_isotropy": [
        ("dim-group aggregate partial-first — the corpus never "
         "shuffles, only dim·partitions partial rows",
         r"HashAggregate.*partial|partial_count"),
        ("components explode in Generate", r"Generate posexplode"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "ooo_arrivals": [
        ("one hash shuffle on the key serves the running-max window "
         "and the rollup", r"Exchange hashpartitioning\(user_id"),
        ("rollup aggregates on the window's partitioning",
         r"HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "cdc_dedup": [
        ("Gear boundary stream is ONE Arrow mapInPandas kernel "
         "(m shift-adds per char, emits ~1/2^mask_bits of positions) — "
         "not an md5 per position",
         r"MapInPandas"),
        ("fingerprint dedup shuffles one row per CHUNK keyed by fp, "
         "partial-aggregated", r"HashAggregate.*partial|partial_count"),
        ("no row-at-a-time python UDF in the path",
         "!BatchEvalPython"),
    ],
    "heldout_ppl": [
        ("count tables partial-aggregated before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        ("fold split is a map-side hash filter — no extra shuffle "
         "beyond the scorer's count joins", r"\*\(\d+\) Filter"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "trimmed_stats": [
        ("rank cut is the two-phase shard rank — window keys on the "
         "range-shard pid, a skewed group never funnels one task",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("moment sums partial-aggregate", r"HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "incremental_projection": [
        ("both sides fold with max_by AGGREGATES — no ranking window",
         "!Window"),
        ("folds partial-aggregate before the key shuffle",
         r"HashAggregate.*partial|partial_max"),
        ("merge is one key equi-join, never nested-loop",
         "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "funnel_latency": [
        ("percentile ranks are the two-phase shard rank — a popular "
         "step pair never funnels one task",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("chained step joins are key equi-joins, never nested-loop",
         "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "calibration_curve": [
        ("bin rollup partial-aggregates before the shuffle",
         r"HashAggregate.*partial|partial_count"),
        # r11: seeded weights driver-inlined (element_at) — no
        # bucket-keyed weight join (the lang-label join remains a
        # legit broadcast)
        ("no bucket-keyed weight join in the scoring subtree",
         r"!BroadcastHashJoin \[bucket"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "simhash_calibration": [
        # r8: the <= 7-row result is eagerly checkpointed (the token
        # table is persisted across its three consumers and released),
        # so the probe sees the local relation — CLAUDE.md checkpoint
        # plan-check rule
        ("bounded calibration table (checkpoint-visible)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("candidates come from the banded bucket join — never an "
         "all-pairs product", "!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "join_cardinality": [
        ("per-key counts partial-aggregate — the prediction never "
         "executes the predicted join",
         r"HashAggregate.*partial|partial_count"),
        ("count tables meet in one key equi-join",
         r"BroadcastHashJoin|SortMergeJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "label_noise": [
        ("class thresholds broadcast — the scored corpus never "
         "reshuffles", r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("cell counts partial-aggregate map-side",
         r"HashAggregate.*partial|partial_count"),
    ],
    "did_estimate": [
        ("split day broadcast to the scan — the log never shuffles "
         "for the scalar",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("4-cell rollup partial-aggregates map-side",
         r"HashAggregate.*partial|partial_sum"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "woe_iv": [
        ("bin rollup partial-aggregates map-side",
         r"HashAggregate.*partial|partial_count"),
        ("class totals broadcast — one row crossed in",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "session_flow": [
        ("session assignment is one user-keyed window pass",
         r"hashpartitioning\(user_id"),
        ("per-session firsts/lasts partial-aggregate",
         r"HashAggregate.*partial|partial_min"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "markov_stationary": [
        # transition counting (user-keyed lag window + partial agg)
        # executes at call time; the |states|² matrix iterates on the
        # driver (km_survival pattern)
        ("returned relation is the driver-computed state table (local "
         "scan)", r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "sim_topk_filtered": [
        ("label predicate pushed to the parquet scan — the distance "
         "kernel sees the filtered slice only",
         r"PushedFilters: \[[^\]]*label"),
        ("one Arrow kernel pass (mapInPandas), not per-row python",
         r"MapInPandas|ArrowEvalPython"),
        ("reduce stage is a bounded per-query window, no global sort",
         r"hashpartitioning\(query_id"),
    ],
    "gini_concentration": [
        ("rank fans across range shards — window keyed by shard pid "
         "(two-phase rank), never one task per nation",
         r"hashpartitioning\(_gr_pid"),
        ("concentration sums partial-aggregate",
         r"HashAggregate.*partial|partial_sum"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "acf_daily": [
        ("per-(key, day) counting partial-aggregates over the log",
         r"HashAggregate.*partial|partial_count"),
        ("all lags share one key-partitioned window sort over the "
         "bounded grid", r"hashpartitioning\(_k"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "frequent_paths": [
        ("all leads share one user-keyed window sort",
         r"hashpartitioning\(user_id"),
        ("path counts partial-aggregate map-side",
         r"HashAggregate.*partial|partial_count"),
        ("top-N via TakeOrderedAndProject, not a global sort",
         r"TakeOrderedAndProject"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "conversion_ci": [
        ("per-user firsts partial-aggregate before any join",
         r"HashAggregate.*partial|partial_min"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no cartesian product anywhere", "!CartesianProduct"),
    ],
    "snapshot_diff": [
        ("one key-equi full outer join — the only shuffle",
         r"SortMergeJoin FullOuter|ShuffledHashJoin.*FullOuter"),
        ("all metrics from ONE partial-aggregated pass",
         r"HashAggregate.*partial|partial_sum"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no cartesian product anywhere", "!CartesianProduct"),
    ],
    "retrieval_ndcg": [
        # r12: the scorecard eager-checkpoints its |queries|-row result
        # so the persisted BM25 aggregate can be released; the inner
        # dataflow is probed un-checkpointed via EXTRA_CHECKS
        # (retrieval_ndcg_inner)
        ("result is the checkpointed |queries|-row scorecard",
         r"Scan ExistingRDD"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "cusum_changepoints": [
        # per-(type, day) counting executes at call time; the bounded
        # key×day axis crosses to the driver for the inherently
        # sequential max(0, ·) recurrence (km_survival pattern)
        ("returned relation is the driver-computed day walk (local "
         "scan)", r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "benford_audit": [
        ("digit rollup partial-aggregates map-side",
         r"HashAggregate.*partial|partial_count"),
        ("digit frame and total broadcast — the scan never reshuffles",
         r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "graph_kcore": [
        # peel rounds execute at call time (eager checkpoints, the
        # bfs_hops idiom); the probed plan is the final survivor-degree
        # aggregate read from the last checkpoint
        ("final core-degree relation reads the checkpointed survivor "
         "fold", r"Scan ExistingRDD"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "mmr_diverse_topk": [
        # the pool stage (one-scan Arrow kernel + bounded window
        # reduce) executes at call time; the greedy over the
        # dial-bounded |Q|·pool² working set is centroid-class driver
        # state, so the probed plan is the returned local selection
        ("returned relation is the driver-computed selection (local "
         "scan)", r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the returned plan",
         "!BatchEvalPython|ArrowEvalPython"),
    ],
    "km_survival": [
        # the distributed per-user/per-day aggregation executes at
        # call time (the bounded day axis crosses to the driver for
        # the inherently sequential product-limit recurrence); the
        # probed plan is the returned local day table
        ("returned relation is the driver-computed day table (local "
         "scan, no lingering distributed stages)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "attribution_credit": [
        ("touch-conversion pairing is a per-user equi-join (hash or "
         "sort-merge on the user key), never a cartesian",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("per-conversion stats partial-aggregate before the join back",
         r"HashAggregate.*partial|partial_count"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no cartesian product anywhere", "!CartesianProduct"),
    ],
    "decayed_topk": [
        ("reference day broadcast to the scan — the event log never "
         "shuffles for the scalar",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("decayed BIGINT sum partial-aggregates map-side",
         r"HashAggregate.*partial|partial_sum"),
        ("top-k via TakeOrderedAndProject, not a global sort",
         r"TakeOrderedAndProject"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "pareto_frontier": [
        ("per-user points partial-aggregate before any frontier work",
         r"HashAggregate.*partial|partial_count"),
        ("running max fans across range shards — window keyed by shard "
         "pid, never a single-task global window",
         r"hashpartitioning\(_gr_pid"),
        ("frontier-x set broadcast back to the points",
         r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "bq_hamming_topk": [
        ("query codes broadcast — the hamming scan never shuffles the "
         "corpus codes", r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("rerank window partitions by query_id over radius survivors, "
         "never one partition", "!Exchange SinglePartition"),
        ("no python UDF anywhere — codes, hamming, and the cosine fold "
         "are all JVM expressions", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "lsh_band_plan": [
        ("sampled all-pairs join reads the checkpointed shingle sets "
         "(sample fraction is the quadratic dial)",
         r"Scan ExistingRDD"),
        ("split table broadcast onto the bins-row histogram",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("histogram partial-aggregates before the shuffle",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "dispersion_report": [
        ("per-day counts partial-aggregate over the log",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere — two rollups", "!Window"),
    ],
    "ratio_metric_ci": [
        ("per-user moments partial-aggregate on the user key",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere — two rollups", "!Window"),
    ],
    "threshold_sweep": [
        ("one corpus scan feeds all thresholds (conditional sums in a "
         "single scalar aggregate)", r"HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere", "!Window"),
    ],
    "source_similarity_js": [
        ("token counts partial-aggregate over the corpus — only "
         "(group, token) rows shuffle", r"HashAggregate[^\n]*partial"),
        ("pair terms come from a token-keyed equi-join of the "
         "checkpointed vocab grid", r"Scan ExistingRDD"),
        ("no cartesian of the corpus", "!CartesianProduct"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "ess_report": [
        ("per-group weight moments partial-aggregate over the corpus",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere — one rollup", "!Window"),
    ],
    "mad_outlier_days": [
        ("per-day count rollup sits behind the grid checkpoint; the "
         "visible work runs on the bounded grid scans",
         r"Scan ExistingRDD"),
        ("median/MAD join back broadcast — the grid never reshuffles "
         "to meet two scalars per key", r"BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "quantile_normalize": [
        # both rankings run through grouped_row_number, whose eager
        # checkpoint hides upstream — assert the visible shard keying
        ("ranks fan across range shards, never a single task",
         r"hashpartitioning\(_gr_pid"),
        ("the rank-keyed mapping join is an equi-join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "hll_sliding_distinct": [
        ("daily register rollup is map-side combinable (partial_max "
         "before the shuffle — the log moves once, as registers)",
         r"partial_max|HashAggregate.*partial"),
        ("window merge re-aggregates only the exploded register table",
         r"HashAggregate"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window function anywhere — merges, not frames", "!Window"),
    ],
    "isotonic_calibration": [
        ("per-bin label rollup partial-aggregates over the corpus",
         r"HashAggregate[^\n]*partial"),
        ("minimax runs on the checkpointed ≤ bins-row table",
         r"Scan ExistingRDD"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere — closed-form minimax joins", "!Window"),
    ],
    "item_item_cf": [
        ("pair generation is a basket-keyed self-equi-join, never a "
         "cartesian", "!CartesianProduct"),
        ("pair/margin counts partial-aggregate before their shuffles",
         r"HashAggregate[^\n]*partial"),
        ("rank window partitions on item_a over its candidate list, "
         "never one partition", "!Exchange SinglePartition"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "holt_linear": [
        # km_survival pattern: the day-axis rollup executes at call
        # time, the sequential recurrence runs driver-side in exact
        # integers; the probed plan is the returned local day table
        ("returned relation is the driver-computed state table",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "rake_keywords": [
        ("word-score join back is broadcast — the phrase instances "
         "never shuffle to meet the vocab", r"BroadcastHashJoin"),
        ("phrase/word rollups partial-aggregate before their shuffles",
         r"HashAggregate[^\n]*partial"),
        ("top-k via TakeOrdered, not a global sort",
         r"TakeOrderedAndProject"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "theil_sen_trend": [
        # the per-day rollup sits behind the grid's checkpoint barrier
        # (probe-hidden); what must be visible: the bounded grid scans
        # and a non-cartesian pairing
        ("pairing runs on the checkpointed bounded day grid",
         r"Scan ExistingRDD"),
        ("day-grid self-join is never a cartesian of the log",
         "!CartesianProduct"),
        # the per-key rank window runs on day-span²/2 rows per key —
        # cardinality-bounded by construction (acf_daily acceptance),
        # and never a single partition (global lint covers that)
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "dbscan_clusters": [
        ("stencil pairing is a cell-key equi-join, never a cartesian "
         "of the points", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian product anywhere", "!CartesianProduct"),
        ("neighbor counts partial-aggregate before the shuffle",
         r"HashAggregate[^\n]*partial"),
        ("core components come from the checkpointed CC fixpoint",
         r"Scan ExistingRDD"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "ccf_leadlag": [
        ("per-day count rollups partial-aggregate over the log",
         r"HashAggregate[^\n]*partial"),
        ("lag pairing is a broadcast join of the bounded day grid",
         r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere — pure integer moments", "!Window"),
    ],
    # both A/B readouts END in a one-row scalar aggregate — the final
    # SinglePartition exchange is the legitimate global-agg stage, so
    # no blanket !SinglePartition here (CLAUDE.md plan-check rule)
    "cuped_estimate": [
        ("split-day bounds broadcast back — the log never shuffles "
         "to meet them", r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("per-user pre/post sums partial-aggregate on the user key",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "srm_check": [
        ("distinct users partial-aggregate before the k-row rollup",
         r"HashAggregate[^\n]*partial"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ("no window anywhere", "!Window"),
    ],
    "bootstrap_ci": [
        # the exploded (replicate, weight) aggregation executes at
        # call time (b integer rows cross to the driver for the order
        # statistics); the probed plan is the returned 1-row table
        ("returned relation is the driver-assembled CI row (local "
         "scan, no lingering distributed stages)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "kmv_distinct": [
        ("distinct (type, hash) pairs partial-aggregate before the "
         "shuffle — only distinct survivors move",
         r"HashAggregate.*partial|partial_count"),
        # the merge rank is a DRIVER FINISH over the ≤ Σk-row bounded
        # union (r11, km_survival bounded-axis pattern) — the merged
        # certificate re-enters as a 1-slice local frame; the grouped
        # sketch stays checkpointed (≤ k·|types| rows)
        ("merged sketch + per-group sketch re-enter as bounded local "
         "frames (driver finish)",
         r"Scan ExistingRDD"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
}

# Round-7 coverage widening: conservative plan assertions for the
# previously unprobed registry tail. Shared shapes:
# - "partial agg": map-side combine before any shuffle
#   (HashAggregate functions=[partial_*]) — the 100 TB shuffle dial
# - "!CartesianProduct": no pair surface is an all-pairs join
# - "!BatchEvalPython": no row-at-a-time python in the hot path
#   (ArrowEvalPython/MapInPandas Arrow kernels are allowed where the
#   operator is numpy-shaped by design)
_PARTIAL_AGG = ("aggregation partial-aggregates map-side",
                r"HashAggregate[^\n]*partial_")
_NO_CARTESIAN = ("never a cartesian product", "!CartesianProduct")
_NO_PY_ROW = ("no row-at-a-time python UDF", "!BatchEvalPython")
_JVM_ONLY = ("fully JVM-side — no python worker at all",
             "!BatchEvalPython|ArrowEvalPython|MapInPandas")

CHECKS.update({
    name: [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY]
    for name in [
        "q3_shipping_priority", "q4_order_priority",
        "q5_local_supplier_volume", "q7_nation_volume",
        "q8_market_share", "q9_product_profit", "q10_returned_items",
        "q12_priority_lines", "q13_customer_distribution",
        "q14_promo_share", "q16_supplier_counts",
        "q17_small_qty_revenue", "q18_large_orders",
        "q20_excess_shippers", "q21_waiting_suppliers",
        "q2_min_cost_supplier", "q11_important_parts",
        "q15_top_supplier", "supplier_margin", "rollup_orders",
        "cube_orders", "week_rollup", "value_histogram",
        "pivot_status_priority", "distinct_users", "time_bucket_rollup",
        "vocab_top100",
        "cohort_retention", "value_percentiles", "event_transitions",
        "regression_trend", "text_stats",
        "text_entropy", "lm_stupid_backoff", "retrieval_bm25_multi",
        "curation_top_bigram",
        "dedup_exact", "dedup_corpus_lines", "corpus_split",
        "embedding_dim_stats", "domain_stats",
        "hll_user_overlap",
    ]
})
CHECKS.update({
    "topk_per_group": [
        ("rank window shuffles once on the group key (never a single "
         "partition)", r"Exchange hashpartitioning"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "funnel_conversion": [
        # distributed min-ts step joins shrink to 3 scalar counts,
        # returned via a local relation (km_survival bounded-axis shape)
        ("result is the bounded step axis, not a data-sized relation",
         r"Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "basket_lift": [
        # pair mining persists + eager-checkpoints the bounded result
        # (CLAUDE.md localCheckpoint discipline) — upstream stages are
        # hidden from the probe, the visible side is the pair relation
        ("visible plan is the checkpointed bounded pair relation",
         r"Scan ExistingRDD"),
        ("final cut is a top-k, not a global sort",
         r"TakeOrderedAndProject"),
        _NO_CARTESIAN,
    ],
    "token_count": [
        ("pure map-side projection — no shuffle at all", "!Exchange"),
        ("column pruning reaches the scan",
         r"ReadSchema: struct<doc_id:bigint,text:string>"),
        _JVM_ONLY,
    ],
})
CHECKS.update({
    # eventstore read surface
    "r4_keyset_page": [
        ("point filter reaches the scan (pushed or as a scan-level "
         "data filter)",
         r"PushedFilters: \[[^\n]*EqualTo|DataFilters: \[[^\]]*="), _JVM_ONLY,
    ],
    "r5_load_desc": [
        ("point filter reaches the scan (pushed or as a scan-level "
         "data filter)",
         r"PushedFilters: \[[^\n]*EqualTo|DataFilters: \[[^\]]*="), _JVM_ONLY,
    ],
    "r6_point_lookup": [
        ("point filter reaches the scan (pushed or as a scan-level "
         "data filter)",
         r"PushedFilters: \[[^\n]*EqualTo|DataFilters: \[[^\]]*="), _JVM_ONLY,
    ],
    "json_props_extract": [
        ("column pruning: only (event_id, props) read",
         r"ReadSchema: struct<event_id:bigint,props:string>"),
        ("pure map-side JSON projection — no shuffle",
         "!Exchange hashpartitioning"),
        _JVM_ONLY,
    ],
    "x1_index_day_counts": [_PARTIAL_AGG, _JVM_ONLY],
    "x2_index_day_read": [
        # the analytics-table analog filters on a DERIVED pid
        # (year·1000 + dayofyear over the dtype-normalized ts), which
        # cannot push to the scan by construction; the envelope-store
        # X2 directory pruning is proven by the EXTRA_CHECKS probes
        ("day filter applied before the presentation sort",
         r"Filter [^\n]*(pid|dayofyear|2024003)"),
        ("only the presentation sort shuffles",
         "!Exchange hashpartitioning"), _JVM_ONLY,
    ],
    "x5_min_ts": [_PARTIAL_AGG, _JVM_ONLY],
    "c3_counters": [_PARTIAL_AGG, _JVM_ONLY],
    "m2_message_scan": [
        # raw archive scan: pure projection, no filter to push
        ("column pruning: only (event_id, props) read",
         r"ReadSchema: struct<event_id:bigint,props:string>"),
        ("map-side only", "!Exchange"), _JVM_ONLY,
    ],
    # core SQL shapes
    "window_funcs": [
        ("window shuffles once on its key (never single-partition)",
         r"Exchange hashpartitioning"), _JVM_ONLY,
    ],
    "scalar_funcs": [("map-side only", "!Exchange hashpartitioning"), _JVM_ONLY],
    "null_funcs": [("map-side only", "!Exchange hashpartitioning"), _JVM_ONLY],
    "string_agg": [_PARTIAL_AGG, _JVM_ONLY],
    "above_own_average": [
        ("window shuffles once on user_id", r"Exchange hashpartitioning\(user_id"),
        _JVM_ONLY,
    ],
    "exists_semi_join": [
        ("EXISTS runs as a semi join, not a rescan",
         r"LeftSemi"), _NO_CARTESIAN, _JVM_ONLY,
    ],
    "setop_users": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    "asof_join": [_NO_CARTESIAN, _JVM_ONLY],
    "sessionize": [
        ("session window shuffles once on the key",
         r"Exchange hashpartitioning"), _JVM_ONLY,
    ],
    "matview_orders": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    # dedup / similarity
    "dedup_minhash_lsh": [_NO_CARTESIAN, _NO_PY_ROW],
    "dedup_simhash": [_NO_CARTESIAN, _JVM_ONLY],
    "dedup_ngram_jaccard": [_NO_CARTESIAN, _JVM_ONLY],
    "dedup_cc_clusters": [_NO_CARTESIAN, _NO_PY_ROW],
    "dedup_bloom_membership": [_NO_CARTESIAN, _NO_PY_ROW],
    "sim_topk_l2": [
        ("brute-force cosine is map-side compute + top-k, no join",
         r"TakeOrderedAndProject"), _NO_CARTESIAN, _JVM_ONLY,
    ],
    "sim_topk_lsh": [_NO_CARTESIAN, _NO_PY_ROW],
    "sim_topk_ivf": [
        ("probe scans only the n_probe cell directories "
         "(partition pruning on the persisted index)",
         r"PartitionFilters: \[[^\]]*_cell"), _NO_CARTESIAN,
    ],
    "sim_topk_ivfpq": [
        ("probe scans only the n_probe cell directories",
         r"PartitionFilters: \[[^\]]*_cell"), _NO_CARTESIAN,
    ],
    "sim_cosine_near_dup": [_NO_CARTESIAN, _NO_PY_ROW],
    "sim_multi_topk": [_NO_CARTESIAN, _NO_PY_ROW],
    "nearest_join": [_NO_CARTESIAN, _NO_PY_ROW],
    "knn_graph_lsh": [_NO_CARTESIAN, _NO_PY_ROW],
    "graph_lpa_knn": [_NO_CARTESIAN, _NO_PY_ROW],
    "random_projection": [_NO_CARTESIAN, _NO_PY_ROW],
    "matryoshka_overlap": [_NO_CARTESIAN, _NO_PY_ROW],
    "hard_negatives": [_NO_CARTESIAN, _NO_PY_ROW],
    "decontaminate": [_NO_CARTESIAN, _JVM_ONLY],
    # multimodal Arrow kernels
    "multimodal_features": [
        ("decode+feature kernel is one Arrow mapInPandas", r"MapInPandas"),
        _NO_CARTESIAN,
    ],
    "multimodal_real_decode": [
        ("decode+feature kernel is one Arrow mapInPandas", r"MapInPandas"),
        _NO_CARTESIAN,
    ],
    "multimodal_resize": [
        ("decode-resize-encode is one Arrow mapInPandas", r"MapInPandas"),
        _NO_CARTESIAN,
    ],
    "multimodal_frame_plan": [
        ("schedule is pure column math over exploded sequences",
         r"Generate"), _JVM_ONLY,
    ],
    # perceptual hashing family: operators eager-checkpoint bounded
    # results (CLAUDE.md localCheckpoint discipline) — the probed plan
    # shows the checkpointed relation
    "image_phash": [("checkpointed bounded result", r"Scan ExistingRDD"),
                    _NO_CARTESIAN],
    "phash_near_dup": [("checkpointed bounded result", r"Scan ExistingRDD"),
                       _NO_CARTESIAN],
    "audio_fingerprint": [("checkpointed bounded result",
                           r"Scan ExistingRDD"), _NO_CARTESIAN],
    "audio_near_dup": [("checkpointed bounded result",
                        r"Scan ExistingRDD"), _NO_CARTESIAN],
    "video_near_dup": [("checkpointed bounded result",
                        r"Scan ExistingRDD"), _NO_CARTESIAN],
    "phash_clusters": [("checkpointed bounded result",
                        r"Scan ExistingRDD"), _NO_CARTESIAN],
    "phash_index_probe": [
        ("probe joins the persisted bucket table without re-decoding "
         "the corpus", r"Scan ExistingRDD|FileScan parquet"),
        _NO_CARTESIAN,
    ],
})
CHECKS.update({
    "pack_sequences": [_NO_CARTESIAN, _JVM_ONLY],
    "pack_greedy_stats": [_NO_CARTESIAN, _NO_PY_ROW],
    "kmeans_assign": [
        ("centroid table joins broadcast (bounded driver sample, "
         "single assignment pass)", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
        _NO_PY_ROW,
    ],
    "cluster_balanced_sample": [_NO_CARTESIAN, _NO_PY_ROW],
    "merge_changelog": [_NO_CARTESIAN, _JVM_ONLY],
    "dsir_importance": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    "quality_quantile_filter": [_NO_CARTESIAN, _JVM_ONLY],
    "tfidf_weights": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    "bow_embedding_buckets": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    "stratified_sample": [_NO_CARTESIAN, _JVM_ONLY],
    "weighted_sample_by_lang": [_NO_CARTESIAN, _JVM_ONLY],
    "token_count_bpe": [("map-side only", "!Exchange hashpartitioning"),
                        _JVM_ONLY],
    "pii_redaction": [("map-side only", "!Exchange hashpartitioning"),
                      _JVM_ONLY],
    "session_windows": [
        ("session window shuffles once on the key",
         r"Exchange hashpartitioning"), _JVM_ONLY,
    ],
    "approx_quantiles_binned": [("distributed aggregation (hash/object/sort) or checkpointed bounded result",
         r"HashAggregate|ObjectHashAggregate|SortAggregate|Scan ExistingRDD"),
        _NO_CARTESIAN, _JVM_ONLY],
    "graph_bfs_hops": [_NO_CARTESIAN, _NO_PY_ROW],
    "pagerank_custsupp": [_NO_CARTESIAN, _NO_PY_ROW],
    "profile_events": [("distributed aggregation (hash/object/sort) or checkpointed bounded result",
         r"HashAggregate|ObjectHashAggregate|SortAggregate|Scan ExistingRDD"),
        _NO_CARTESIAN, _JVM_ONLY],
    "expectations": [("distributed aggregation (hash/object/sort) or checkpointed bounded result",
         r"HashAggregate|ObjectHashAggregate|SortAggregate|Scan ExistingRDD"),
        _NO_CARTESIAN, _JVM_ONLY],
    "text_quality_scores": [("map-side scoring", "!Exchange hashpartitioning"),
                            _JVM_ONLY],
    "text_fingerprints": [("map-side digest", "!Exchange hashpartitioning"),
                          _JVM_ONLY],
    "text_lang_id": [("map-side classification",
                      "!Exchange hashpartitioning"), _JVM_ONLY],
})
CHECKS.update({
    "embedding_covariance": [
        ("moment accumulation is one Arrow mapInPandas matmul kernel "
         "per batch", r"MapInPandas|Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN,
    ],
    "corpus_curation": [_NO_CARTESIAN, _JVM_ONLY],
})
CHECKS.update({
    name: [("distributed aggregation (hash/object/sort) or "
            "checkpointed bounded result",
            r"HashAggregate|ObjectHashAggregate|SortAggregate"
            r"|Scan ExistingRDD"),
           _NO_CARTESIAN, _NO_PY_ROW]
    for name in ["ngram_uniqueness",
                 "mutual_information", "vocab_growth", "length_batches"]
})
CHECKS.update({
    "curation_gopher": [
        # per-doc heuristic flags: pure map-side column math; the only
        # shuffle is the presentation sort
        ("no aggregation/join shuffle", "!Exchange hashpartitioning"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})
CHECKS.update({
    "mann_kendall": [
        # grid is lazily checkpointed (bounded day axis) — the probe
        # sees the rewritten Scan ExistingRDD side (CLAUDE.md plan-check
        # rule); the stats are plain aggregations, no window anywhere
        ("bounded day-grid relation (checkpoint-visible)",
         r"Scan ExistingRDD"),
        ("no window at all — S and ties are aggregations",
         "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "mann_whitney_u": [
        # r8: the scalar fold runs at call time (tie lanes recombined
        # driver-side in exact python ints — ADVICE r7 overflow fix);
        # the returned plan is the one-row local relation, km pattern
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all in the visible plan", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "phrase_search": [
        ("phrase slot map joins broadcast before any shuffle",
         r"BroadcastHashJoin"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "dp_noisy_counts": [_PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY],
    "propensity_strata": [
        ("rank runs through the two-phase shard machinery "
         "(checkpoint-visible)",
         r"Scan ExistingRDD|hashpartitioning\(_gr_pid"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
})
CHECKS.update({
    "eb_shrunk_rates": [
        # r8: rollup persisted, result eagerly checkpointed so the
        # persist can be released at call time (ADVICE r7) — the
        # visible plan is the final select over the local relation
        ("result reads the checkpointed per-key rollup",
         r"Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})
CHECKS.update({
    "logrank_test": [
        # km bounded-axis pattern: distributed per-user/per-day
        # rollups shrink to the day axis, the prefix recurrence runs
        # driver-side, the result returns as a local relation
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "brier_decomposition": [
        ("bin table eagerly checkpointed — corpus scored once for two "
         "folds", r"Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})
CHECKS.update({
    # broadcast-dimension joins: the small side must broadcast, never
    # shuffle the fact table to meet it. NOTE: dict.update REPLACES
    # the whole list for these names, so this literal must carry every
    # assertion the earlier entry gave them — _JVM_ONLY included
    # (ADVICE r7: the old literal silently dropped it).
    name: [_PARTIAL_AGG,
           ("small dimension joins broadcast", r"BroadcastHashJoin"),
           _NO_CARTESIAN, _JVM_ONLY]
    for name in [
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q7_nation_volume", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q12_priority_lines", "q14_promo_share",
        "q2_min_cost_supplier", "q17_small_qty_revenue",
        "q18_large_orders", "q20_excess_shippers",
    ]
})


CHECKS.update({
    # r8 analytics family
    "chi_square_independence": [
        ("bounded R×C grid sides broadcast", r"BroadcastHashJoin"),
        ("no window anywhere", "!Window"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "kruskal_wallis": [
        # mann_whitney_u pattern: tie lanes + per-group terms fold at
        # call time, the returned plan is the bounded local relation
        ("result is the bounded per-group local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all in the visible plan", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "spearman_corr": [
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all in the visible plan", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "ipw_ate": [
        ("rank runs through the two-phase shard machinery "
         "(checkpoint-visible)",
         r"Scan ExistingRDD|hashpartitioning\(_gr_pid"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "seasonal_decompose": [
        # moving average is an offset-explode equi-join on the bounded
        # day axis (checkpoint-visible), NEVER a window function
        ("bounded day-grid relation (checkpoint-visible)",
         r"Scan ExistingRDD"),
        ("no window at all — trend/seasonal are joins+aggregations",
         "!Window"),
        ("seasonal means join broadcast back", r"BroadcastHashJoin"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "permutation_pvalue": [
        ("observed stats meet replicates in a broadcast join",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("explode collapses map-side before the replicate shuffle",
         r"partial"),
        ("no window anywhere", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r8 batch 2
    "v_optimal_histogram": [
        # km bounded-axis pattern: one partial-agg pass to 32 bins,
        # the DP runs driver-side, the result is the local relation
        ("result is the bounded segment local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "cochran_armitage": [
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r8 batch 3
    "retrieval_ql_dirichlet": [
        ("query-term cf table broadcast-crosses the doc lengths",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("postings narrowed to query terms before the agg shuffle",
         r"PushedFilters|Filter"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "haar_energy_daily": [
        # bounded dyadic pyramid: every level is a checkpoint-visible
        # bounded relation, never a window
        ("bounded dyadic grid (checkpoint-visible)",
         r"Scan ExistingRDD"),
        ("no window at all — the pyramid is chained aggregations",
         "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r8 batch 4
    "changepoints_lsq": [
        ("result is the bounded regime local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "entity_clusters": [
        # CC output is eagerly checkpointed each round — the visible
        # plan reads the converged edge relation
        ("converged components relation (checkpoint-visible)",
         r"Scan ExistingRDD"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r8 batch 5
    "boilerplate_fraction": [
        # line-df pass persisted + result eagerly checkpointed so the
        # explode runs once for both consumers
        ("result reads the checkpointed per-doc rollup",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "blocklist_hits": [
        ("blocklist IN-set evaluated map-side before the shuffle",
         r"partial"),
        ("no window at all", "!Window"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r8 batch 6
    "holt_winters": [
        ("result is the bounded day-axis local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "simpsons_check": [
        ("aggregate gap meets strata in a broadcast join",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("no window at all", "!Window"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
})


CHECKS.update({
    # r9 batch 1 — stats/timeseries driver folds + distributed joins
    "anova_oneway": [
        # group moments fold at call time over the bounded group axis
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "welch_ttest": [
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "mcnemar_test": [
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "kendall_tau_daily": [
        ("result is the bounded one-row local relation (day axis "
         "folded driver-side, km pattern)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "nelson_aalen": [
        ("result is the driver-computed day table (km pattern)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
    ],
    "forecast_accuracy": [
        # lag-7 / lag-1 are day-offset equi-joins of the bounded
        # rollup — never an ordered window
        ("no window at all — lags are self-equi-joins", "!Window"),
        ("scalar metric rollups meet in broadcast joins",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "retrieval_ql_jm": [
        ("query-term cf table broadcast-crosses the doc lengths",
         r"BroadcastNestedLoopJoin|BroadcastHashJoin"),
        ("postings narrowed to query terms before the agg shuffle",
         r"PushedFilters|Filter"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "target_encoding": [
        ("category totals re-aggregate the bounded (cat, fold) cells "
         "and join back broadcast", r"BroadcastHashJoin"),
        ("no window at all", "!Window"),
        _PARTIAL_AGG, _NO_CARTESIAN, _JVM_ONLY,
    ],
    "hits_custsupp": [
        # below the distinct-pair dial the exact-integer recurrence
        # finishes DRIVER-SIDE (r12) and the visible plan is the local
        # result relation; above it, the checkpointed converged scores
        ("converged scores (driver-finish local relation / "
         "checkpoint-visible)", r"Scan ExistingRDD"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "brown_forsythe": [
        # grouped_row_number eagerly checkpoints the rank pass; the
        # returned relation is the bounded one-row local fold
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "ece_calibration": [
        ("one-row rollup of the bounded bin axis — final scalar agg",
         r"HashAggregate"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "borda_fusion": [
        # per-query window over the bounded fused candidate set —
        # partitioned by query_id, never a single partition
        ("fused rank windows by query_id",
         r"Window.*query_id|hashpartitioning\(query_id"),
        ("fused rank never a single partition",
         "!Exchange SinglePartition"),
        # the semantic input is the same Arrow batch kernel rrf_fusion
        # fuses — a python worker is expected there, not in the fusion
        ("semantic side stays the Arrow batch kernel",
         r"MapInPandas|ArrowEvalPython"),
        _NO_CARTESIAN,
    ],
    "multimodal_bmp": [
        ("local fixture relation feeds the Arrow kernel",
         r"Scan ExistingRDD|LocalTableScan"),
        ("decode runs in ONE Arrow python kernel (mapInPandas), "
         "never row-at-a-time", r"MapInPandas"),
        _NO_CARTESIAN,
    ],
    "cohens_d": [
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "rank_overlap_rbo": [
        # both retrieval plans execute at call time; the returned
        # relation is the one-row driver fold
        ("result is the bounded one-row local relation",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


def _ann_lsh_probe(spark, sf_dir: str):
    """Persisted-LSH probe: build the _sig-partitioned index in a temp
    dir, return the candidate scan — must show PartitionFilters on _sig
    (ingest-maintained index, VERDICT r1 #2)."""
    import tempfile

    from inception_eventstore_spark.operators.ann_index import LshVectorIndex
    from inception_eventstore_spark.plans.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select("embedding").first()["embedding"]
    idx = LshVectorIndex.build(
        emb.where("vec_id <> 0"),
        tempfile.mkdtemp(prefix="lsh_idx_") + "/idx",
        n_planes=6,
    )
    return idx.candidates([float(x) for x in q], probe_radius=2)


def _ann_ivf_probe(spark, sf_dir: str):
    """Persisted-IVF probe — PartitionFilters on _cell."""
    import tempfile

    from inception_eventstore_spark.operators.ann_index import IvfVectorIndex
    from inception_eventstore_spark.plans.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select("embedding").first()["embedding"]
    idx = IvfVectorIndex.build(
        emb.where("vec_id <> 0"),
        tempfile.mkdtemp(prefix="ivf_idx_") + "/idx",
        n_cells=8,
    )
    return idx.candidates([float(x) for x in q], n_probe=3)


def _pq_code_scan(spark, sf_dir: str):
    """IVF-PQ ADC scan: the candidate pass must read ONLY the probed
    cell directories (PartitionFilters on _cell) and only the 8-byte
    _code column — the float embedding column stays untouched until
    the k·rerank exact re-rank."""
    import tempfile

    from inception_eventstore_spark.operators.pq import IvfPqVectorIndex
    from inception_eventstore_spark.plans.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select("embedding").first()["embedding"]
    idx = IvfPqVectorIndex.build(
        emb.where("vec_id <> 0"),
        tempfile.mkdtemp(prefix="pq_idx_") + "/idx",
        n_cells=8, m_subspaces=8, n_codes=64,
    )
    probe = idx.probe_cells([float(x) for x in q], n_probe=3)
    from pyspark.sql import functions as F

    return (
        idx.vectors()
        .where(F.col("_cell").isin(probe))
        .select("vec_id", "_code")
    )


def _pca_moments_plan(spark, sf_dir: str):
    """One-pass PCA moment accumulation: the d²-row Gram partials come
    out of an Arrow-batched MapInPandas and partial-aggregate before
    the (tiny) shuffle — the corpus is scanned exactly once."""
    from inception_eventstore_spark.operators.pca import moment_partials
    from inception_eventstore_spark.plans.queries import _t

    return moment_partials(_t(spark, sf_dir, "embeddings"))


def _curation_projection(spark, sf_dir: str):
    """Gopher metrics must be one shuffle-free codegen'd projection —
    no Exchange, no python UDF, arrays staged once."""
    from inception_eventstore_spark.operators.curation import (
        gopher_quality_flags,
    )
    from inception_eventstore_spark.plans.queries import _t

    return gopher_quality_flags(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _pii_projection(spark, sf_dir: str):
    """PII counting + redaction: one codegen'd projection."""
    from inception_eventstore_spark.operators.pii import redact_documents
    from inception_eventstore_spark.plans.queries import _t

    return redact_documents(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _split_projection(spark, sf_dir: str):
    """hash_split over documents WITHOUT the rollup — the assignment
    itself must be a shuffle-free, codegen'd projection (no Exchange,
    no python UDF)."""
    from inception_eventstore_spark.operators.sampling import hash_split
    from inception_eventstore_spark.plans.queries import _t

    return hash_split(_t(spark, sf_dir, "documents").select("doc_id", "text"))


def _decontaminate_pass(spark, sf_dir: str):
    """Corpus-side decontamination pass: the benchmark gram set must be
    broadcast (semi-join), so the corpus is never shuffled."""
    from inception_eventstore_spark.operators.decontaminate import decontaminate
    from inception_eventstore_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql import functions as F

    return decontaminate(d, d.where(F.col("doc_id") % 53 == 0), n=5)


def _merge_plan(spark, sf_dir: str):
    """CDC merge: union + window — no join operator at all."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.merge import merge_changelog
    from inception_eventstore_spark.plans.queries import _t

    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("bal")
    )
    ch = base.limit(10).select(
        "k", (F.col("bal") + 1).alias("bal"), F.lit(5).alias("seq"),
        F.lit("U").alias("op"),
    )
    return merge_changelog(base, ch, ["k"])


def _pack_offsets_plan(spark, sf_dir: str):
    """Two-phase token offsets: per-shard window only — the plan must
    NOT contain a single-partition global sort/window exchange."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.packing import pack_chunked
    from inception_eventstore_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_tok")
    )
    return pack_chunked(d, budget=128, shard_size=100)


def _quantile_filter_plan(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.filtering import (
        quantile_threshold_filter,
    )
    from inception_eventstore_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("double").alias("v")
    )
    return quantile_threshold_filter(d, "v", "lang", 0.7)


def _dsir_score_plan(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.importance import (
        importance_scores,
        token_logratios,
    )
    from inception_eventstore_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    w = token_logratios(d.where(F.col("lang") == "en"), d)
    return importance_scores(d, w)


def _funnel_step_plan(spark, sf_dir: str):
    """One funnel step's survivor join, lazily (funnel_steps itself
    materializes each step eagerly and returns literal counts): the
    step-2 candidates joined to the step-1 (user, min ts) survivor
    set — must plan as a key equi-join, with the join strategy left to
    AQE (broadcast at runtime for small survivor sets)."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.plans.queries import _t

    e = _t(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t"))
    )
    return (
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") >= F.col("_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t2"))
    )


def _retrieval_map_inner(spark, sf_dir: str):
    """retrieval_map's un-checkpointed dataflow (the declared query
    eager-checkpoints its |queries|-row result, r12)."""
    from inception_eventstore_spark.operators.retrieval import retrieval_map
    from inception_eventstore_spark.plans.queries import _local_df, _t

    docs = _t(spark, sf_dir, "documents")
    qdf = _local_df(
        spark,
        [(1, ["spark", "merge", "key"]), (2, ["window", "batch"])],
        "query_id long, terms array<string>",
    )
    return retrieval_map(docs, qdf, k=10, checkpoint=False)


def _retrieval_ndcg_inner(spark, sf_dir: str):
    from inception_eventstore_spark.operators.retrieval import (
        retrieval_ndcg,
    )
    from inception_eventstore_spark.plans.queries import _local_df, _t

    docs = _t(spark, sf_dir, "documents")
    qdf = _local_df(
        spark,
        [(1, ["spark", "merge", "key"]), (2, ["window", "batch"])],
        "query_id long, terms array<string>",
    )
    return retrieval_ndcg(docs, qdf, k=10, checkpoint=False)


def _pagerank_iteration_plan(spark, sf_dir: str):
    """The un-checkpointed PageRank DAG (the declared query checkpoints
    the final ranks, hiding the iteration plan)."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.graph import pagerank
    from inception_eventstore_spark.plans.queries import _t

    li = _t(spark, sf_dir, "lineitem").limit(10000)
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # driver_finish_edges=0 forces the DISTRIBUTED loop — this probe
    # exists precisely to inspect the big-graph iteration DAG (the
    # declared queries take the r12 driver finish below the dial)
    return pagerank(j, iterations=2, checkpoint=False,
                    driver_finish_edges=0)


def _lpa_iteration_plan(spark, sf_dir: str):
    """The un-checkpointed label-propagation DAG (the declared query
    checkpoints the final labels, hiding the iteration plan)."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.graph import label_propagation
    from inception_eventstore_spark.plans.queries import _t

    li = _t(spark, sf_dir, "lineitem").limit(10000)
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # driver_finish_edges=0 forces the DISTRIBUTED loop (the declared
    # queries take the r12 driver finish below the dial)
    return label_propagation(j, iterations=2, checkpoint=False,
                             driver_finish_edges=0)


def _phash_pair_plan(spark, sf_dir):
    from inception_eventstore_spark.operators.phash import (
        phash_near_duplicates,
    )
    from inception_eventstore_spark.plans.queries import _phash_fixture_rows

    assets = spark.createDataFrame(
        _phash_fixture_rows(8), "asset_id long, payload binary"
    ).coalesce(2)
    return phash_near_duplicates(assets, max_hamming=6, materialize=False)


def _video_pair_plan(spark, sf_dir):
    from inception_eventstore_spark.operators.phash import (
        video_near_duplicates,
    )
    from inception_eventstore_spark.plans.queries import _video_fixture_rows

    assets = spark.createDataFrame(
        _video_fixture_rows(4), "asset_id long, payload binary"
    ).coalesce(2)
    return video_near_duplicates(assets, materialize=False)


def _hard_negatives_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from inception_eventstore_spark.operators.similarity import (
        hard_negatives,
    )
    from inception_eventstore_spark.plans.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    anchors = [
        (int(r["vec_id"]), list(r["embedding"]), int(r["label"]))
        for r in emb.where(F.col("vec_id") < 4).collect()
    ]
    return hard_negatives(emb, anchors, k=5)


def _bfs_level_plan(spark, sf_dir):
    """One un-checkpointed BFS level (the declared graph_bfs_hops query
    eager-checkpoints each visited set, hiding the per-level plan):
    frontier⋈edges on src, distinct, anti-join against visited."""
    from pyspark.sql import functions as F

    from inception_eventstore_spark.plans.queries import _t

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_quantity") > 45)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    edges = j.repartition("src")
    visited = j.select(F.col("src").alias("node")).limit(5)
    frontier = visited
    return (
        frontier.join(edges, frontier["node"] == edges["src"])
        .select(F.col("dst").alias("node"))
        .distinct()
        .join(visited, "node", "left_anti")
    )


def _binned_histogram_plan(spark, sf_dir):
    """The distributed half of approx_quantiles_binned (the quantile
    read collects the ≤ groups·bins sketch rows, leaving a
    LocalTableScan as the declared plan)."""
    from inception_eventstore_spark.operators.sketches import (
        binned_histogram,
    )
    from inception_eventstore_spark.plans.queries import _t

    e = _t(spark, sf_dir, "events")
    return binned_histogram(
        e, "value", 0.0, 200.0, bins=512, group_cols=["event_type"]
    )


def _vocab_growth_plan(spark, sf_dir):
    """The distributed half of vocab_growth (the public function
    collects the ≤ n_buckets rows for a driver-side cumsum, leaving a
    LocalTableScan as the declared plan)."""
    from inception_eventstore_spark.operators.tokenstats import (
        vocab_growth_buckets,
    )
    from inception_eventstore_spark.plans.queries import _t

    return vocab_growth_buckets(_t(spark, sf_dir, "documents"), 0, 50)


def _mutual_information_plan(spark, sf_dir):
    """The un-checkpointed MI DAG (the declared query eager-checkpoints
    the 1-row result, hiding the aggregation plan)."""
    from inception_eventstore_spark.operators.infotheory import (
        mutual_information,
    )
    from inception_eventstore_spark.plans.queries import _t

    d = _t(spark, sf_dir, "documents")
    return mutual_information(d, "lang", "source", checkpoint=False)


#: Non-declared plan probes: (section name, df builder, checks).
#: A pattern starting with "!" asserts the pattern does NOT occur.
EXTRA_CHECKS = [
    (
        "binned_histogram_sketch",
        _binned_histogram_plan,
        [
            ("bin counts partial-aggregated before the shuffle — the "
             "sketch is ≤ groups·512 counters however large the input",
             r"HashAggregate.*partial|partial_count"),
            ("bin assignment is JVM floor arithmetic",
             "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "vocab_growth_buckets",
        _vocab_growth_plan,
        [
            ("first-occurrence min per token partial-aggregates "
             "before the shuffle — no corpus-wide running window",
             r"partial_min|HashAggregate.*partial"),
            ("no window operator anywhere (cumsum is ≤ n_buckets "
             "driver rows)", "!Window"),
            ("no python UDF in the path",
             "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "mutual_information_dag",
        _mutual_information_plan,
        [
            ("contingency table partial-aggregates before the shuffle",
             r"HashAggregate.*partial|partial_count"),
            ("marginals join back broadcast — the table never "
             "reshuffles to meet them",
             r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
            ("no python UDF in the path",
             "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "bfs_level",
        _bfs_level_plan,
        [
            ("level expansion is an equi-join on src — never a "
             "cartesian frontier×graph product",
             "!CartesianProduct"),
            ("visited-set exclusion is a hash anti-join",
             r"LeftAnti"),
            ("frontier dedup is a keyed hash aggregate (function-less "
             "distinct — runs map-side then post-shuffle)",
             r"HashAggregate\(keys=\[node"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "phash_pair_join",
        _phash_pair_plan,
        [
            ("pairs form on the (block, value) equi-join — never an "
             "all-pairs image join",
             "!CartesianProduct|BroadcastNestedLoopJoin"),
            ("bucket join is a hash/merge join on the block key",
             r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
            ("hamming verify is JVM bit_count on the BIGINT hash — "
             "python only decodes pixels",
             r"bit_count"),
        ],
    ),
    (
        "video_pair_join",
        _video_pair_plan,
        [
            ("frame pairs form on the (block, value) equi-join — "
             "never an all-pairs frame join",
             "!CartesianProduct|BroadcastNestedLoopJoin"),
            ("per-video frame counts join back broadcast",
             r"BroadcastHashJoin"),
            ("match counts partial-aggregated before the shuffle",
             r"HashAggregate.*partial|partial_count"),
        ],
    ),
    (
        "hard_negatives_scan",
        _hard_negatives_plan,
        [
            ("one corpus scan for all anchors — no join at all "
             "(anchor matrix broadcast by value into the kernel)",
             "!SortMergeJoin|ShuffledHashJoin|CartesianProduct"),
            ("local per-batch top-k runs in the Arrow kernel",
             r"MapInPandas|ArrowEvalPython"),
            ("final rank window shuffles on the anchor key",
             r"Exchange hashpartitioning\(anchor_id"),
        ],
    ),
    (
        "lpa_iteration",
        _lpa_iteration_plan,
        [
            ("vote mode computed as a plain aggregate — NO ranking "
             "window anywhere in the iteration", "!Window"),
            ("per-step vote counts partial-aggregated",
             r"HashAggregate.*partial|partial_count"),
            ("no python UDF in the path",
             "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "decontaminate_pass",
        _decontaminate_pass,
        [
            ("benchmark gram set broadcast into a semi-join",
             r"BroadcastHashJoin [^\n]*LeftSemi"),
            ("contaminated-id set broadcast into the anti-join",
             r"BroadcastHashJoin [^\n]*LeftAnti"),
            # the only Exchanges are the tiny contaminated-id distinct;
            # the corpus text column reaches both joins scan-side, so a
            # shuffle of full documents would surface as a sort-merge
            # join — assert none exists
            ("no shuffle join anywhere", "!SortMergeJoin|ShuffledHashJoin"),
        ],
    ),
    (
        "merge_changelog_plan",
        _merge_plan,
        [
            ("merge is union + window, no join operator",
             "!SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("latest-wins window on the key",
             r"Exchange hashpartitioning\(k"),
        ],
    ),
    (
        "pack_token_offsets",
        _pack_offsets_plan,
        [
            ("no single-partition global window",
             "!Exchange SinglePartition"),
            ("per-shard cumsum window", r"Window \[sum"),
            ("shard offsets broadcast back", r"BroadcastHashJoin"),
        ],
    ),
    (
        "quantile_filter_plan",
        _quantile_filter_plan,
        [
            ("thresholds broadcast; corpus pass map-side",
             r"BroadcastHashJoin"),
            ("corpus rows never exchange", "!Exchange hashpartitioning\\(doc_id"),
        ],
    ),
    (
        "dsir_score_plan",
        _dsir_score_plan,
        [
            ("weight table broadcast into the scoring pass",
             r"BroadcastHashJoin [^\n]*token"),
            ("model counts partial-aggregated",
             r"HashAggregate.*partial|partial_count"),
        ],
    ),
    (
        "hash_split_projection",
        _split_projection,
        [
            ("split assignment shuffles nothing", "!Exchange"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
            ("md5 bucket math runs in whole-stage codegen", r"\*\(\d+\) Project"),
        ],
    ),
    (
        "ann_lsh_persisted_probe",
        _ann_lsh_probe,
        [("probe scans only signature partitions",
          r"PartitionFilters: \[[^\]]*_sig")],
    ),
    (
        "ann_ivf_persisted_probe",
        _ann_ivf_probe,
        [("probe scans only the selected cells",
          r"PartitionFilters: \[[^\]]*_cell")],
    ),
    (
        "ann_ivfpq_code_scan",
        _pq_code_scan,
        [
            ("ADC scan prunes to the probed cells",
             r"PartitionFilters: \[[^\]]*_cell"),
            ("only the 8-byte code column is read, not the vectors",
             r"!ReadSchema: [^\n]*embedding"),
        ],
    ),
    (
        "pca_moment_accumulation",
        _pca_moments_plan,
        [
            ("moments accumulate via Arrow-batched MapInPandas",
             r"MapInPandas"),
            ("d²-row partials partial-aggregated before the shuffle",
             r"HashAggregate.*partial|partial_sum"),
        ],
    ),
    (
        "curation_gopher_projection",
        _curation_projection,
        [
            ("metrics shuffle nothing", "!Exchange"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "pii_redaction_projection",
        _pii_projection,
        [
            ("redaction shuffles nothing", "!Exchange"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "funnel_step_join",
        _funnel_step_plan,
        [
            ("survivor join is a key equi-join (strategy left to AQE)",
             r"ShuffledHashJoin|BroadcastHashJoin|SortMergeJoin"),
            ("never a nested-loop/cartesian of the raw log",
             "!CartesianProduct|BroadcastNestedLoopJoin"),
            ("per-step survivor set partial-aggregated",
             r"HashAggregate[^\n]*partial_min"),
        ],
    ),
    (
        "retrieval_map_inner",
        _retrieval_map_inner,
        [
            ("ONE corpus pass: a single tokenize+explode feeds both the "
             "BM25 score and the conjunctive relevance (r12 — exactly "
             "one partial tf aggregate subtree)",
             r"HashAggregate[^\n]*partial"),
            ("query terms broadcast into the postings filter",
             r"BroadcastHashJoin"),
            ("running hit count windows only the ≤k ranked rows",
             r"Window"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "retrieval_ndcg_inner",
        _retrieval_ndcg_inner,
        [
            ("query terms broadcast into the postings filter",
             r"BroadcastHashJoin"),
            ("relevance and slot tables partial-aggregate",
             r"HashAggregate[^\n]*partial"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
    (
        "pagerank_iteration",
        _pagerank_iteration_plan,
        [
            ("per-iteration contribution sums are partial-aggregated",
             r"HashAggregate[^\n]*partial_sum"),
            ("message passing is a key equi-join, never nested-loop",
             "!CartesianProduct|BroadcastNestedLoopJoin"),
            ("small-n rank table broadcasts — cached edges never "
             "shuffle per iteration (r8)", r"BroadcastHashJoin"),
            ("no python UDF in the path", "!BatchEvalPython|ArrowEvalPython"),
        ],
    ),
]


#: Queries allowed to window over a single partition, with the reason
#: (must be a documented cardinality bound, never "it was fast at sf0.1").
_SINGLE_TASK_WINDOW_ALLOWED: dict[str, str] = {}


def window_over_single_partition(plan: str) -> bool:
    """True if any Window node in the physical-plan tree sits on a
    single-partition Exchange (directly or through Sort / AQE shuffle
    stages) — the rank-skew bug class that hit epoch_shuffle (r4),
    ppl_buckets and string_indexer (r5): the whole input of the window
    funnels through ONE task. A global scalar aggregate over
    SinglePartition is fine (tiny partials); a WINDOW over one is a
    full-data straggler."""
    lines = plan.split("\n")
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow\b", ln):
            for nxt in lines[i + 1:i + 6]:
                if "Window" in nxt or "HashAggregate" in nxt:
                    break
                if "SinglePartition" in nxt:
                    return True
    return False


CHECKS.update({
    # r10 batch — recall audit, BPE learning, monitoring stats,
    # novelty/readability/tail profiling, PPR, interval join
    "ann_recall_audit": [
        ("audited per-strategy recall is the eagerly-pinned bounded "
         "result (3 rows)", r"Scan ExistingRDD"),
        _NO_CARTESIAN,
    ],
    "bpe_learn_merges": [
        ("learned merge table is the bounded local relation "
         "(n_merges-round driver argmax loop, km pattern)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "wilcoxon_signed_rank": [
        ("result is the bounded one-row local relation (rank prefix "
         "via two-phase shard cumsum at build time)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "ngram_novelty": [
        ("novel grams via an anti-join on the 8-byte hash",
         r"LeftAnti"),
        ("gram sets partial-aggregated before their shuffles",
         r"HashAggregate[^\n]*partial|partial_count"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "readability": [
        ("map-only scoring pass — no shuffle anywhere", "!Exchange"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "hill_tail_index": [
        ("result is the bounded one-row local relation (TakeOrdered "
         "top-k at build time, rank-ordered driver ln fold)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "ppr_custsupp": [
        ("converged seeded ranks (driver-finish local relation / "
         "checkpoint-visible)", r"Scan ExistingRDD"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "hhi_supplier_nation": [
        ("dimension joins broadcast — the lineitem body never "
         "shuffles to meet them", r"BroadcastHashJoin"),
        ("count shares partial-aggregated before the pair-key "
         "shuffle", r"HashAggregate[^\n]*partial|partial_count"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "aalen_johansen": [
        ("competing-risk CIF table is the bounded local relation "
         "(day axis folded driver-side, km pattern)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "quantile_pinball": [
        ("weekday-quantile rank window partitions by weekday over "
         "the checkpointed bounded day rollup",
         r"hashpartitioning\(_wd"),
        ("forecast joins back broadcast", r"BroadcastHashJoin"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "sprt_purchase": [
        ("running counts via the two-phase shard cumsum",
         r"hashpartitioning\(_gr_pid|Window.*_gr_pid"),
        ("no single-partition window",
         "!Window[^\n]*Exchange SinglePartition"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "capture_recapture": [
        ("recapture overlap is a semi-join on the id", r"LeftSemi"),
        ("snapshot counts partial-aggregated",
         r"HashAggregate[^\n]*partial|partial_count"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "good_turing": [
        ("frequency-of-frequencies table pinned once and self-joined "
         "(checkpoint-visible)", r"Scan ExistingRDD"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "interval_join_windows": [
        ("both sides explode into week buckets", r"Generate explode"),
        ("pairs meet on the bucket equi-key, never a cross product",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("multi-bucket repeats removed by a partial-aggregated "
         "distinct", r"HashAggregate[^\n]*partial|partial_count"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    # ---- r11 ----
    "kn_continuation": [
        ("unigram/pair-type tables partial-aggregated",
         r"HashAggregate[^\n]*partial|partial_count"),
        ("top-k is a TakeOrdered over the count table, never a "
         "global sort + window", r"TakeOrderedAndProject"),
        ("no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "retrieval_map": [
        # r12: eager-checkpointed |queries|-row result (see
        # retrieval_map_inner in EXTRA_CHECKS for the dataflow probe)
        ("result is the checkpointed |queries|-row scorecard",
         r"Scan ExistingRDD"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "graph_modularity": [
        ("canonical edge set pinned once and reused "
         "(checkpoint-visible)", r"Scan ExistingRDD"),
        ("per-label rollups partial-aggregated",
         r"HashAggregate[^\n]*partial|partial_count"),
        ("label table meets the edge endpoints on equi-joins",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "conformal_interval": [
        ("calibration quantile ranks via the two-phase shard rank, "
         "never a single-partition window",
         r"hashpartitioning\(_gr_pid"),
        ("per-group model broadcast back onto the splits",
         r"BroadcastHashJoin"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "bh_fdr_signtest": [
        ("BH finish is the bounded driver fold over per-group exact "
         "tails (km pattern)", r"Scan ExistingRDD|LocalTableScan"),
        ("no window in the emitted plan", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "hilbert_cells": [
        ("one partial-aggregated cell rollup",
         r"HashAggregate[^\n]*partial|partial_count"),
        ("unrolled descent stays in one codegen'd projection over "
         "the scan — no join, no window", "!Window"),
        ("no join at all", "!Join"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "graph_assortativity": [
        ("canonical edge set pinned once and reused "
         "(checkpoint-visible)", r"Scan ExistingRDD"),
        ("degree sums partial-aggregated",
         r"HashAggregate[^\n]*partial|partial_count"),
        ("degree table meets the endpoints on equi-joins",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "kmv_users_setops": [
        ("both sketches + union are pinned k-row certificates "
         "(checkpoint-visible)", r"Scan ExistingRDD"),
        ("intersection = semi-joins on the bounded sketch rows",
         r"LeftSemi"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "croston_purchases": [
        ("recurrence finishes driver-side over the bounded "
         "demand-day axis (km pattern)",
         r"Scan ExistingRDD|LocalTableScan"),
        ("no window in the emitted plan", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "gains_acctbal": [
        # the shard-rank machinery runs at construction and the
        # bounded per-bucket table is checkpointed, so the visible
        # plan starts at the ExistingRDD scan (CLAUDE.md
        # grouped_row_number consumer convention)
        ("bounded per-bucket table pinned (checkpoint-visible; rank "
         "ran via the two-phase shard rank at construction)",
         r"Scan ExistingRDD"),
        ("cumulative sums are a bounded triangular join over "
         "n_buckets rows — no window at all", "!Window"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
    "wasserstein_value_drift": [
        ("per-side histograms partial-aggregated",
         r"HashAggregate[^\n]*partial|partial_count"),
        ("running CDFs via sharded_running_sums "
         "(checkpoint-visible shard rank)", r"hashpartitioning|Scan ExistingRDD"),
        _NO_CARTESIAN, _JVM_ONLY,
    ],
})


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # optional 2nd arg: comma-list of query names — probe ONLY those and
    # print check statuses without touching PLANS.md (fast iteration on
    # a single query's checks; the full run still gates the file)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    from inception_eventstore_spark.plans.queries import spark_queries
    from inception_eventstore_spark.session import get_spark

    spark = get_spark("plan-dump", master="local[4]",
                      extra_configs={"spark.sql.shuffle.partitions": "8",
                                     # 150+ probed plans in one JVM:
                                     # UI listener throttles (CLAUDE.md)
                                     "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    lines = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Each query lists the plan",
        "properties the implementation is designed around, with the",
        "matching physical-plan fragment. Regenerate after plan-affecting",
        "changes.",
        "",
    ]
    ok = True
    skew_offenders = []
    targets = [(n, (lambda s, d, _n=n: qs[_n](s, d)), c) for n, c in CHECKS.items()]
    targets += EXTRA_CHECKS
    if only is not None:
        targets = [t for t in targets if t[0] in only]
    for name, build, checks in targets:
        df = build(spark, sf_dir)
        # collect() executes THIS queryExecution so AQE finalizes —
        # codegen markers (*(n)) only appear in the final plan (a noop
        # write would wrap the df in a fresh, unfinalised plan)
        df.collect()
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = qe.executedPlan().toString() + "\n" + qe.explainString(mode)
        lines.append(f"## {name}")
        lines.append("")
        for desc, pattern in checks:
            negated = pattern.startswith("!")
            m = re.search(pattern[1:] if negated else pattern, plan)
            hit = (m is None) if negated else (m is not None)
            status = "✓" if hit else "✗ MISSING"
            ok = ok and hit
            lines.append(f"- **{status}** {desc}")
            if m and not negated:
                frag_line = next(
                    (ln.strip() for ln in plan.split("\n") if re.search(pattern, ln)),
                    m.group(0),
                )
                frag = frag_line[:240]
                lines.append(f"  - `{frag}`")
        if (
            window_over_single_partition(plan)
            and name not in _SINGLE_TASK_WINDOW_ALLOWED
        ):
            skew_offenders.append(name)
            ok = False
            lines.append(
                "- **✗ SKEW LINT** Window over a single-partition "
                "Exchange — full input through one task; use the "
                "two-phase shard rank (functions/ranking.py)"
            )
        lines.append("")

    lines.append("## Global skew lint")
    lines.append("")
    lines.append(
        "Every probed plan is checked for a Window fed by an "
        "`Exchange SinglePartition` — the single-task rank bug class "
        "(epoch_shuffle r4, ppl_buckets/string_indexer r5). "
        f"Offenders: {skew_offenders or 'none'}."
    )
    lines.append("")

    if only is not None:
        print("\n".join(lines[-(len(lines)):]))
        print(f"subset probe; checks {'passed' if ok else 'FAILED'}")
        spark.stop()
        return 0 if ok else 1
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; all checks {'passed' if ok else 'FAILED'}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
