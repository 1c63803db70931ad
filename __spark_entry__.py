"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins for the hash compare.

Registration order is deliberate: one representative of every operator
family (CDC pipeline, sessionization, asof/range/skew joins, dedup,
similarity, sketches, text, multimodal, packing) is registered BEFORE the
long tail of TPC-H-shaped analytics, so a driver that grades a prefix of
the dict still sees every distinct component.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from debezium_server_bigquery_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _collect(attr: str) -> dict:
    """Merge module.<attr> dicts in operator-family-first order.

    An import failure must not silently drop a query group (the gate would
    record nothing at all for it); instead register a callable that raises
    the original error so the failure shows up as an erring row.
    """
    groups = [
        ("debezium_server_bigquery_spark.plans.analytics",),
        ("debezium_server_bigquery_spark.plans.cdc_queries",),
        ("debezium_server_bigquery_spark.plans.pipeline_queries",),
        ("debezium_server_bigquery_spark.streaming.sessions",),
        ("debezium_server_bigquery_spark.streaming.stream_join",),
        ("debezium_server_bigquery_spark.operators.asof",),
        ("debezium_server_bigquery_spark.operators.rangejoin",),
        ("debezium_server_bigquery_spark.operators.skewjoin",),
        ("debezium_server_bigquery_spark.operators.scd",),
        ("debezium_server_bigquery_spark.functions.dedup_fuzzy",),
        ("debezium_server_bigquery_spark.functions.dedup_incremental",),
        ("debezium_server_bigquery_spark.functions.decontamination",),
        ("debezium_server_bigquery_spark.functions.timeseries",),
        ("debezium_server_bigquery_spark.functions.similarity",),
        ("debezium_server_bigquery_spark.functions.pq",),
        ("debezium_server_bigquery_spark.functions.contrastive",),
        ("debezium_server_bigquery_spark.functions.kmeans",),
        ("debezium_server_bigquery_spark.functions.graph",),
        ("debezium_server_bigquery_spark.functions.sketches",),
        ("debezium_server_bigquery_spark.functions.text",),
        ("debezium_server_bigquery_spark.functions.bpe",),
        ("debezium_server_bigquery_spark.functions.bm25",),
        ("debezium_server_bigquery_spark.functions.lm",),
        ("debezium_server_bigquery_spark.functions.pca",),
        ("debezium_server_bigquery_spark.functions.regression",),
        ("debezium_server_bigquery_spark.functions.features",),
        ("debezium_server_bigquery_spark.functions.fusion",),
        ("debezium_server_bigquery_spark.functions.multimodal",),
        ("debezium_server_bigquery_spark.functions.packing",),
        ("debezium_server_bigquery_spark.functions.chunking",),
        ("debezium_server_bigquery_spark.functions.recipe",),
        ("debezium_server_bigquery_spark.functions.spans",),
        ("debezium_server_bigquery_spark.functions.curation",),
        ("debezium_server_bigquery_spark.functions.datacard",),
        ("debezium_server_bigquery_spark.functions.quantize",),
        ("debezium_server_bigquery_spark.functions.dedup_clusters",),
        ("debezium_server_bigquery_spark.functions.mixing",),
        ("debezium_server_bigquery_spark.functions.sharding",),
        ("debezium_server_bigquery_spark.functions.geo",),
        ("debezium_server_bigquery_spark.functions.linkage",),
        ("debezium_server_bigquery_spark.functions.stattests",),
        ("debezium_server_bigquery_spark.operators.zorder",),
        ("debezium_server_bigquery_spark.operators.bucketing",),
        ("debezium_server_bigquery_spark.operators.skyline",),
        ("debezium_server_bigquery_spark.plans.funnel",),
        ("debezium_server_bigquery_spark.plans.experiments",),
        ("debezium_server_bigquery_spark.plans.behavior",),
        ("debezium_server_bigquery_spark.plans.segmentation",),
        ("debezium_server_bigquery_spark.plans.diagnostics",),
        ("debezium_server_bigquery_spark.plans.profiler",),
        ("debezium_server_bigquery_spark.plans.validation",),
        ("debezium_server_bigquery_spark.plans.constraints",),
        ("debezium_server_bigquery_spark.plans.analytics_windows",),
        ("debezium_server_bigquery_spark.plans.analytics_ext",),
        ("debezium_server_bigquery_spark.plans.analytics_tpch2",),
    ]
    import importlib

    out: dict = {}
    for (modname,) in groups:
        try:
            mod = importlib.import_module(modname)
            out.update(getattr(mod, attr))
        except Exception as exc:  # loud, per-group: one broken module must
            if attr == "QUERIES":  # not hide the rest, nor vanish silently
                msg = f"import of {modname} failed: {exc!r}"

                def _raiser(spark, sf_dir, _msg=msg):
                    raise ImportError(_msg)

                out[f"IMPORT_ERROR_{modname.rsplit('.', 1)[-1]}"] = _raiser
    return out


# One representative set covering EVERY operator family, emitted first so
# a driver that grades a prefix of the dict still sees each component; the
# remaining members and the TPC-H-shaped tail follow.
#
# ROTATION POLICY (amended in round 8 per the r7 verdict): a query whose
# MOST RECENT driver row is red (err/fail) re-enters the next graded
# prefix automatically, ahead of never-graded queries — the round-7 board
# looked all-green only because three round-1 reds were never re-queued.
# Otherwise: never-graded queries enter first; members green in the TWO
# most recent consecutive rounds rotate out (they stay registered and
# locally oracle-checked; they re-enter in later rotations).
# REFRESH RULE (recorded in round 9 per the r8 verdict's ask #6): the CDC
# parity core (the coercion trio + route/dedup/upsert/append/nested-
# envelope) never goes more than 3 rounds without a driver row — rotated
# out in r8 with r6+r7 greens, it re-enters HERE in r9; the same 3-round
# ceiling then applies to every reference-component representative, and
# remaining slots go to the longest-ungraded tail so no query's latest
# row ages past ~5 rounds.
#
# Round-9 prefix (50), per the r8 verdict's asks #1/#2/#6 — no reds in
# CORRECTNESS_r08, so no fast-lane entries:
#   - q1_pricing_summary stays as the flagship anchor (entry() runs it);
#   - the 21 first-row-r8 members stay for their second consecutive green
#     (5 gate e2e rows incl. retry/stream/transform/backfill/composite,
#     the 3 stale-red re-grades, the decontamination trio, and the r7
#     shortlist's analytics — bpe_train_merges now carries a full DuckDB
#     twin, unrolled-CTE trainer, so its row upgrades from rows-only to
#     hash-checked);
#   - the 13 never-graded round-8-new queries enter for first rows
#     (fertility/PPMI/spans/k-anon/char-gini/percentile/burstiness/
#     watermark-dedup e2e/norm-stats/span-trim/purity/dup-histogram/
#     affinity; quality_percentile_by_lang's DECIMAL-vs-DOUBLE twin
#     mismatch fixed FIRST per ask #1);
#   - the 7-query CDC core re-enters under the refresh rule (ask #6);
#   - 8 slots to the longest-ungraded r1-r4 cohort (q3, lazy-upsert e2e,
#     windowed counts, rollup, range join, minhash/simhash, ivf).
# Displaced (green r7+r8 rows; stay registered, re-enter later): the 23
# first-row-r7 members (cli/schema-history/keyless/incremental-snapshot/
# ivm-join e2e, session_window_stats, containment/LSH-recall/cross-source
# dedup, LM pair, covariance/hashed-features/fusion/weighted-sample/
# profiler, trend/stickiness/trimmed-mean/next-event/open-orders/
# seasonality/gini) plus 5 multi-green anchors (cdc_flatten, replay e2e,
# sessionize_events, dedup_exact, ann_cosine_topk).
_TIER1 = [
    # -- flagship anchor ------------------------------------------------------
    "q1_pricing_summary",
    # -- gate e2e write paths: second consecutive green (first rows in r8) ---
    "pipeline_retry_e2e",
    "pipeline_stream_e2e",
    "pipeline_transform_hook_e2e",
    "pipeline_backfill_e2e",
    "pipeline_composite_key_e2e",
    # -- never-graded round-8/9-new: streaming dedup e2e ----------------------
    "stream_dedup_watermark_e2e",
    # -- CDC parity core refresh (ask #6: 3-round ceiling; last rows r7) ------
    "cdc_route",
    "cdc_dedup_last_writer",
    "cdc_upsert_final_state",
    "cdc_append_stats",
    "cdc_coerce_scalars",
    "cdc_coerce_exotic",
    "cdc_nested_envelope",
    # -- stale-red re-grades: second consecutive green (first greens in r8) --
    "q_events_props",
    "q12_priority_class",
    "w_moving_avg_events",
    # -- LLM-pipeline families: r8 first-rows needing their second green -----
    "decontaminate_test_overlap",
    "split_leakage_matrix",
    "decontamination_report",
    "lang_id_confusion",
    "corpus_curation_funnel",
    "paragraph_dup_rate",
    "term_collocations_lift",
    "split_balance_chisq",
    "geometry_wkt_decode",
    "bpe_train_merges",
    "user_recency_weighted_value",
    "events_drift_report",
    "value_outliers_mad",
    # -- never-graded round-8-new: first driver rows --------------------------
    "tokenizer_fertility_by_lang",
    "term_ppmi_similarity",
    "longest_shared_span_pairs",
    "k_anonymity_report",
    "char_diversity_gini",
    "quality_percentile_by_lang",
    "user_interarrival_burstiness",
    "embedding_norm_stats",
    "span_trim_estimate",
    "language_purity_report",
    "dup_cluster_size_histogram",
    "session_event_affinity",
    # -- longest-ungraded tail refresh (r1-r4 cohort) -------------------------
    "q3_shipping_priority",
    "pipeline_lazy_upsert_e2e",
    "windowed_event_counts",
    "rollup_nation_year_revenue",
    "range_attr_views_before_purchase",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf",
    # -- end of the 50-query graded prefix ----------------------------------
    # Round-10 rotation shortlist: FIRST any red in CORRECTNESS_r09 (the
    # amended policy's fast lane), THEN the never-graded round-9-new
    # queries (winnowing_dup_pairs, exact_quantiles_by_type,
    # session_path_trigrams, boilerplate_prefix_clusters, zipf_slope_fit,
    # vocab_coverage_curve, embedding_similarity_histogram,
    # source_quality_report, quality_vs_dup_calibration,
    # stream_window_finalize_e2e, events_cusum_changepoint,
    # winnowing_verified_pairs, order_to_ship_latency_quantiles,
    # props_key_profile, session_duration_quantiles,
    # embedding_label_knn_accuracy, cluster_safe_splits,
    # entity_match_part_names, entity_blocking_stats,
    # events_autocorrelation, customer_revenue_pareto,
    # supplier_triangle_census, source_vocab_overlap,
    # events_seasonal_strength, label_contradiction_matrix,
    # l_diversity_report, t_closeness_report,
    # graph_degree_assortativity, events_crosscorrelation,
    # orders_benford_check, heaps_law_fit, funnel_latency_quantiles,
    # fk_fanout_profile, event_markov_entropy,
    # discount_quantity_elasticity, split_ks_statistic,
    # label_agreement_kappa, events_ewma_forecast_error,
    # encoding_anomaly_report, ngram_novelty_by_split,
    # retrieval_self_mrr, stream_static_enrich_e2e,
    # mann_whitney_source_shift, join_cardinality_profile,
    # funnel_survival_km, rbo_ranker_agreement, bucketed_join_e2e,
    # functional_dependency_audit, denormalized_export_e2e,
    # asof_purchase_last_view_7d, orders_lineitem_consistency,
    # stream_checkpoint_resume_e2e, dedup_exact_keep_priority_source,
    # entity_reciprocal_best_match, events_dispersion_index,
    # graph_kcore_supply, dp_noisy_histogram_eval,
    # skyline_parts_price_size, attribution_model_comparison,
    # ab_test_proportion_z, cuped_adjusted_lift, target_encoding_loo,
    # conformal_volume_intervals, ann_dim_truncation_eval,
    # woe_value_bins, logistic_irls_conversion, did_revenue_readout,
    # ab_power_mde, neyman_allocation_plan, forecast_mase_by_type,
    # poisson_bootstrap_ci, stratified_ate_click_effect, ab_srm_check,
    # user_active_streaks, uplift_by_score_decile,
    # lineitem_correlation_matrix, embedding_intrinsic_dim,
    # dedup_threshold_sensitivity, hill_tail_index_doclen,
    # user_activity_by_tenure_day, vision_token_budget_plan,
    # event_mix_jsd_weekly, cosupply_nation_modularity,
    # lang_source_mutual_information, spearman_quality_length,
    # quality_items_cronbach_alpha) — more never-graded names than a
    # 50-slot prefix holds, so they drain over rounds 10-11 in the listed
    # order (gate e2e members first) — THEN the
    # r8-first-green members above rotate out after their second green and
    # the remaining slots continue the longest-ungraded tail (next up:
    # pagerank_trade_graph, scd2_state_as_of, snapshot_diff_epochs,
    # scd2_temporal_enrich, session_stats_daily, supplier_cooccurrence,
    # retention_cohorts, anomaly/sliding/pivot/funnel/rfm/transition/
    # kwic/oov/datacard members, then the r5 cohort).  Under the refresh
    # rule the CDC core next re-enters by r12.
    # Rotated out THIS round (green r7+r8 driver rows; re-enter later):
    "cdc_flatten",
    "pipeline_replay_idempotent_e2e",
    "cli_run_e2e",
    "pipeline_schema_history_e2e",
    "pipeline_keyless_append_e2e",
    "incremental_snapshot_e2e",
    "ivm_incremental_join_e2e",
    "sessionize_events",
    "session_window_stats",
    "dedup_exact",
    "dedup_containment_pairs",
    "dedup_lsh_recall",
    "cross_source_dup_matrix",
    "ann_cosine_topk",
    "lm_bigram_topk",
    "doc_lm_quality_bottomk",
    "embedding_covariance_upper",
    "doc_hashed_features",
    "quality_rank_fusion",
    "sample_weighted_by_quality",
    "profile_table_columns",
    "revenue_trend_by_segment",
    "dau_wau_stickiness",
    "trimmed_mean_value_by_type",
    "event_next_prediction_accuracy",
    "open_orders_over_time",
    "revenue_weekday_seasonality",
    "customer_revenue_gini",
    # Rotated out in round 8 (green r6+r7 driver rows; re-enter later):
    "pipeline_schema_evolution_e2e",
    "pipeline_keep_deletes_e2e",
    "pipeline_metrics_e2e",
    "pipeline_rejects_e2e",
    "pipeline_fanin_rewrite_e2e",
    "ivm_incremental_agg_e2e",
    "w_running_customer_spend",
    "gsets_returnflag_year_revenue",
    "set_returned_open_orders",
    "asof_purchase_last_view",
    "skew_join_above_user_avg",
    "contrastive_triplets",
    "bm25_search_topk",
    "media_header_probe",
    # Rotated out in round 7 (passing r6 driver rows):
    "pagerank_trade_graph",
    "scd2_state_as_of",
    "snapshot_diff_epochs",
    "scd2_temporal_enrich",
    "session_stats_daily",
    "supplier_cooccurrence_topk",
    "retention_cohorts",
    "events_volume_anomaly",
    "sliding_event_counts",
    "pivot_event_type_daily",
    "funnel_conversion_window",
    "rfm_customer_segments",
    "event_transition_matrix",
    "text_kwic_contexts",
    "vocab_oov_rate",
    "dataset_datacard",
    "dataset_splits",
    "select_quality_budget",
    "skew_report_lineitem_suppkey",
    "events_value_histogram",
    "validate_referential_integrity",
    "validate_constraints",
    "bpe_first_merge",
    # Earlier rotations (r5-graded members):
    "scd2_sink_e2e",
    "scd2_user_history",
    "stream_view_purchase_pairs",
    "dedup_clusters",
    "dedup_incremental_minhash",
    "semantic_dedup_pairs",
    "ann_ivf_recall",
    "ann_pq_adc_topk",
    "ts_similarity_topk",
    "sketch_value_quantiles",
    "sketch_heavy_hitters",
    "docs_by_lang_summary",
    "text_common_spans",
    "chunk_documents",
    "text_pii_scrub",
    "multimodal_manifest",
    "zorder_events_roundtrip",
    "pack_token_budget_scalable",
    "profile_documents",
    "sample_bernoulli_by_lang",
    "curate_canonical_docs",
    "corpus_export_manifest",
    "export_shards",
    "shard_manifest",
    "vocab_top_terms",
    "embedding_quantize_int8",
    "funnel_view_click_purchase",
    "validate_rowcounts_all_tables",
    "mix_domain_weights",
    # Earlier rotations' members (prior-green r1-r4):
    "ann_pq_rerank",
    "kmeans_clusters",
    "sketch_distinct_users",
    "text_lang_id",
    "text_span_dup_ratio",
    "corpus_recipe",
    "sample_stratified",
    "validate_orders_checksum",
    "q6_forecast_revenue",
    "pipeline_append_e2e",
    "embedding_centroid_by_label",
    "pack_token_budget",
    "cdc_upsert_keep_deletes",
    "pipeline_upsert_e2e",
    "text_token_stats",
    "embedding_neardup_pairs",
    "dedup_ngram_jaccard",
    "ann_lsh_bucketed",
    "multimodal_frame_sample",
]


def _tiered(out: dict) -> dict:
    head = {k: out[k] for k in _TIER1 if k in out}
    return head | {k: v for k, v in out.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _tiered(_collect("QUERIES"))


def oracle_sql() -> dict[str, str]:
    return _tiered(_collect("ORACLES"))
