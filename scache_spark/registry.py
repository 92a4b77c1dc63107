"""Query registry: the contract between the engine and the driver.

Each registered query is a named, pure ``(spark, sf_dir) -> DataFrame``
callable plus (where SQL-expressible) an ANSI-SQL oracle string DuckDB
runs on the same parquet files.  ``__spark_entry__.py`` exposes the
registry to the driver; tests iterate it.

Determinism contract (FIXTURES.md): every aggregate/computed column is
aliased identically in the Spark plan and the oracle SQL; all
randomness is seeded; results are compared order-insensitively by the
driver, so no ORDER BY is required except under LIMIT/top-k, where
ordering must be total (ties broken by a unique key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False

# Curated registry order: the round driver grades the FIRST 50 entries,
# so the first 50 are exactly one-per-family coverage of SURVEY §2 —
# every B1-B27 component (incl. all streaming, all three UDF shapes,
# knn/LSH/IVF, text analytics, the scheduling/prediction Part-A
# algorithms) has at least one entry inside the window.  Everything
# else stays registered (pytest still oracle-checks all of it) but
# sits after the window.  tests/test_registry_order.py asserts the
# coverage invariant.
PRIORITY: tuple[str, ...] = (
    # relational core, one per component
    "flagship_revenue_by_region",  # B1/B3/B4/B5/B7
    "decimal_money_battery",  # B2 exact-DECIMAL cast battery (r5 rotation)
    "recursive_cte_reachability",  # B1/B4/B7 engine-iterated recursive CTE (r5)
    "bloom_filter_join_prune",  # B6/B21
    "rollup_region_nation",  # B8
    "sort_nulls_handling",  # B9
    "ivm_join_view_delta",  # B4/B7/B19 bilinear join-view IVM (r5)
    # r10 rotation (r9 verdict item 8: rotate to the strongest
    # never-graded backlog, keep the one-per-family invariant): 14
    # seats turn over.  IN: the four r10-optimized paths (bm25, rrf,
    # ann_ivf, label-propagation — their plans changed this round, so
    # the driver itself re-attests them, the r9 precedent for q17/q21)
    # plus ten never-driver-graded entries (the r9 operator batch,
    # the curation/eval/federation backlog, transformWithState).
    # OUT: 14 already-attested veterans (r9/r7/r5 green in their
    # CORRECTNESS files) cede seats; coverage invariant re-checked by
    # tests/test_registry_order.py (multi_format_federation carries
    # B12 for theta_sketch_set_ops; zipf_slope_fit stays for B26).
    "text_bm25_topk",  # B24/B7/B10 BM25 postings dataflow (r10 rewrite)
    "hybrid_rrf_retrieval",  # B25/B24/B10 RRF fusion over bm25 (r10 rewrite)
    "ann_ivf_nprobe_recall",  # B25/B10 one-pass nprobe recall (r10 rewrite)
    "community_label_propagation",  # graph/B7/B11 LPA (r10 ckpt change)
    "winnowing_neardup_pairs",  # B24/B13/B17 MOSS winnowing (never graded)
    "matryoshka_truncation_recall",  # B25/B17/B10 truncation recall (never graded)
    "pii_redaction_audit",  # B24/B14/B20 PII audit (never graded)
    "multimodal_decode_audit",  # north-star/B23/B7 decode health (never graded)
    "embedding_ingest_audit",  # B25/B20/B17 vector defect census (never graded)
    "url_canonical_dedup",  # B24/B14/B13 canonical-URL dedup (never graded)
    "stream_transform_with_state_mix",  # B27/B23 transformWithState (never graded)
    "training_corpus_e2e",  # B3/B7/B13/B14/B17 end-to-end curation (never graded)
    "retrieval_ndcg_at_k",  # B25/B20/B10 NDCG eval (never graded)
    "multi_format_federation",  # B1/B12/B13/B7 cross-format union (never graded)
    "classifier_auc_rank",  # B24/B20/B11 ROC-AUC (r9; stays — r10 plan shrink)
    "tpch_q17_small_quantity_revenue",  # B4/B5/B7 TPC-H Q17 (r9)
    "tpch_q21_waiting_suppliers",  # B4/B6/B7 TPC-H Q21 (r9)
    # r7 rotation survivors (kept for tag coverage)
    "zipf_slope_fit",  # B24/B26/B16 Zipf rank-frequency slope fit (r7, B26 cover)
    # r6 rotation survivors (first graded r6)
    "statestore_dedup_audit",  # B27/B22/B20 state-store reader audit (r6)
    "stream_scd2_pit_enrich",  # B27/B4/B11 SCD2 point-in-time enrich (r6)
    "pq_encode_codes",  # B25/B23 PQ codebook encode (r6)
    "bpe_merge_rounds",  # B24/B7 BPE merge-rounds training (r6)
    "variant_props_extract",  # B18 VARIANT property extraction (r6)
    "compaction_plan_ffd",  # B21/B23/B1 FFD small-file compaction plan (r6)
    "woe_iv_binning",  # B16/B7/B19 weight-of-evidence binning (r6)
    "interval_union_minutes",  # B11/B15/B7 interval union (x10 tie fix, r6)
    "cdc_agg_apply_delta",  # B7/B4/B19 CDC delta apply (x10 tol fix, r6)
    "udtf_chunk_spans",  # B23/B24 UDTF table function (r6)
    "sequence_pattern_match",  # temporal/B11/B14 regex-over-sequence (r6)
    "table_checksum_manifest",  # B7/B16 order-independent table checksum (r6)
    "avro_source_roundtrip",  # B1/B7/B15 Avro OCF DataSource round-trip (r6)
    # hardest evaluation plans kept from earlier windows
    "mapstatus_highly_compressed",  # A.2/B16/B18 >2000-reducer MapStatus twin (r5)
    "lru_cache_hit_sim",  # A.3/B22 — the MemoryStore LRU policy, verified
    "skew_split_plan",  # A.2/A.5/B7/B11 AQE-style skew split planning (r5)
    # UDF surface
    "broadcast_decision_audit",  # B22/B5/A.2 SizeEstimator admission audit (r5)
    # temporal
    "task_host_utilization_align",  # A.5/temporal sim/util.py span align (r5)
    # dedup / LLM pipeline
    "blocktrace_source_agg",  # B1/A.2 — custom Python data source scan
    # scheduling & prediction (Part A)
    "lpt_schedule_locality_swap",  # A.2 — the COMPLETE reference heuristic
    "schedule_race_from_trace",  # A.2/A.5/B14 parsed trace → policy race (r5)
    # streaming
    "stream_cdc_serving_table",  # B27/B1 CDC upsert serving table (r5)
    "stream_neardup_suppress",  # B27/B24/B13 ingestion near-dup state (r5)
    "stream_cms_heavy_users",  # B27/B16 streaming Count-Min sketch (r5)
    "stream_late_data_filter",
    # --- end of the 50-entry graded window ---
    # Next in line if the driver widens its window: first the
    # strongest never-driver-graded queries (graded automatically if
    # the window widens), then the rotated-out veterans (all graded
    # green in earlier rounds).
    "dedup_normalized_exact",  # B13/B24/B14 normalized exact dedup (never graded)
    "blockmanager_added_log_parse",  # B14/B18/A.5 log parse (never graded)
    "partition_pruned_read",  # B1/B3/B21 partition pruning (never graded)
    "salted_skew_join",  # B4/B21 salting for skew (never graded)
    "triangle_count_transitions",  # B4/B7/B12 graph triangles (never graded)
    "holt_linear_forecast",  # B15/B16/B23 Holt linear forecast (never graded)
    "ann_ivf_pq_topk",  # B25/B10 IVF-PQ ANN (never graded)
    # the rest of the never-graded TPC-H battery (the 4 strongest are
    # in the r9 window; these follow if the driver widens its window)
    "tpch_q3_shipping_priority",  # B4/B7/B10 TPC-H Q3 (never graded)
    "tpch_q5_local_supplier_volume",  # B4/B7 (never graded)
    "tpch_q8_market_share",  # B4/B5/B7/B19 (never graded)
    "tpch_q20_potential_promotion",  # B4/B6/B7 (never graded)
    "tpch_q2_min_cost_supplier",  # B4/B10 correlated-min (never graded)
    "tpch_q15_top_supplier",  # B4/B7 view-max (never graded)
    "tpch_q22_dormant_accounts",  # B6/B7/B14 (never graded)
    "tpch_q13_customer_distribution",  # B4/B7/B19 (never graded)
    "tpch_q12_late_shipping_priority",  # B4/B7/B19 (never graded)
    "tpch_q19_disjunctive_revenue",  # B3/B4/B7 (never graded)
    "tpch_q16_supplier_count",  # B6/B7/B13 (never graded)
    "tpch_q11_important_parts",  # B4/B7 (never graded)
    "tpch_q14_promo_revenue",  # B4/B7/B19 (never graded)
    "tpch_q10_returned_items",  # B4/B7/B10 (never graded)
    "tpch_q7_volume_shipping",  # B4/B7/B15 (never graded)
    "tpch_q6_forecast_revenue",  # B3/B7 (never graded)
    "tpch_q4_order_priority",  # B6/B7 (never graded)
    # r10 rotated-out veterans (graded green r9/r7/r5; seats ceded to
    # the r10 rotation above)
    "fellegi_sunter_linkage",  # B13/B24/B19 (r10: seat ceded to text_bm25_topk)
    "colbert_maxsim_topk",  # B25/B17/B10 (r10: seat ceded to hybrid_rrf_retrieval)
    "url_domain_curation",  # B24/B14/B7 (r10: seat ceded to ann_ivf_nprobe_recall)
    "manifest_time_travel_diff",  # B1/B22/B7 (r10: seat ceded to community_label_propagation)
    "fastss_edit1_pairs",  # B13/B14/B24 (r10: seat ceded to winnowing_neardup_pairs)
    "snm_neighbor_pairs",  # B13/B24 (r10: seat ceded to matryoshka_truncation_recall)
    "pareto_frontier_docs",  # B24/B20/B11 (r10: seat ceded to pii_redaction_audit)
    "quality_calibration_ece",  # B24/B20/B19 (r10: seat ceded to multimodal_decode_audit)
    "sql_udf_money_tiers",  # B23/B19/B7 (r10: seat ceded to embedding_ingest_audit)
    "arrow_token_stats",  # B23/B24 (r10: seat ceded to url_canonical_dedup)
    "tpch_q9_product_type_profit",  # B4/B5/B7/B14 (r10: seat ceded to stream_transform_with_state_mix)
    "tpch_q18_large_volume_orders",  # B4/B7/B10 (r10: seat ceded to training_corpus_e2e)
    "multimodal_frame_sample",  # north-star/B23 (r10: seat ceded to retrieval_ndcg_at_k)
    "theta_sketch_set_ops",  # B12/B7/B20 (r10: seat ceded to multi_format_federation, which carries B12)
    # r9 rotated-out veterans (first graded r8)
    "dedup_minhash_capped_pairs",  # B24/B21 (r9: seat ceded to fellegi_sunter_linkage)
    "dedup_source_overlap_matrix",  # B24/B7/B13 (r9: seat ceded to classifier_auc_rank)
    "dedup_incremental_batch",  # B24/B6 (r9: seat ceded to colbert_maxsim_topk)
    "knn_batch_topk",  # B25/B10/B11 (r9: seat ceded to url_domain_curation)
    "ann_lsh_multiprobe",  # B25 (r9: seat ceded to manifest_time_travel_diff)
    "embedding_int8_quantize",  # B17/B25 (r9: seat ceded to fastss_edit1_pairs)
    "heavy_hitters_cms",  # B7/B16/B24 (r9: seat ceded to snm_neighbor_pairs)
    "hll_rolling_distinct",  # B7/B20/B15 (r9: seat ceded to pareto_frontier_docs)
    "kll_quantile_sketch_merge",  # B7/B20/B16 (r9: seat ceded to quality_calibration_ece)
    "observe_scan_metrics",  # B22/B20/B18 (r9: seat ceded to sql_udf_money_tiers)
    "hadoop_attempt_trace_parse",  # B14/B18/A.5 (r9: seat ceded to arrow_token_stats)
    "kcore_peeling",  # graph/B6/B7 (r9: seat ceded to tpch_q17)
    "dsir_importance_weights",  # B24/B16 (r9: seat ceded to tpch_q18)
    "tokenizer_fertility_stats",  # B24/B14 (r9: seat ceded to tpch_q21)
    # r8 rotated-out veterans (first graded r7/r6)
    "dedup_substring_pairs",  # B24 (r8: seat ceded to dedup_minhash_capped_pairs)
    "setjoin_prefix_filter",  # B24/B17 (r8: seat ceded to dedup_source_overlap_matrix)
    "multimodal_phash_neardup",  # north-star/B23/B24 (r8: seat ceded to dedup_incremental_batch)
    "multimodal_audio_energy",  # north-star/B23/B16 (r8: seat ceded to knn_batch_topk)
    "text_repetition_signals",  # B24/B7 (r8: seat ceded to ann_lsh_multiprobe)
    "tseries_subsequence_topk",  # temporal/B25/B17 (r8: seat ceded to embedding_int8_quantize)
    "sentiment_lexicon_score",  # B24/B14 (r8: seat ceded to heavy_hitters_cms)
    "corpus_ngram_novelty",  # B24/B7 (r8: seat ceded to hll_rolling_distinct)
    "heaps_law_fit",  # B24/B26/B20 (r8: seat ceded to kll_quantile_sketch_merge)
    "sequence_packing_bins",  # B23/B24 (r8: seat ceded to observe_scan_metrics)
    "leakage_safe_split",  # B24/B13 (r8: seat ceded to hadoop_attempt_trace_parse)
    "curriculum_interleave",  # B11/mining (r8: seat ceded to community_label_propagation)
    "contamination_ngram_overlap",  # B24/B6 (r8: seat ceded to kcore_peeling)
    "mmr_diverse_rerank",  # B25/B10 (r8: seat ceded to dsir_importance_weights)
    "ccnet_perplexity_buckets",  # B24/B20 (r8: seat ceded to tokenizer_fertility_stats)
    "kll_sketch_ks_drift",  # B20/B16 (r7: seat ceded to heaps_law_fit)
    "array_funcs",  # B17 (r7: seat ceded to setjoin_prefix_filter)
    "jsonl_corrupt_records_audit",  # B1/B18/B14 (r7: seat ceded to sentiment_lexicon_score)
    "funnel_session_conversion",  # B11/B27/temporal (r7: seat ceded to curriculum_interleave)
    "dedup_semantic_cells",  # B25/B24 (r7: seat ceded to tseries_subsequence_topk)
    "dedup_embedding_lsh",  # B24/B25 (r7: seat ceded to dedup_substring_pairs)
    "dedup_span_rewrite",  # B24/B13 (r7: seat ceded to leakage_safe_split)
    "text_tfidf_top_terms",  # B24 (r7: seat ceded to text_repetition_signals)
    "pq_adc_topk",  # B25/B10 (r7: seat ceded to zipf_slope_fit)
    "multimodal_features",  # north-star/B23 (r7: seat ceded to multimodal_phash_neardup)
    "expected_reduce_size_weighted",  # B26/A.5 (r7: seat ceded to multimodal_audio_energy)
    "stream_session_window",  # B27 (r7: seat ceded to multimodal_frame_sample)
    "stream_stateful_user_totals",  # B23/B27 (r7: seat ceded to sequence_packing_bins)
    "dedup_clusters",  # B24 (r7: seat ceded to contamination_ngram_overlap)
    "topk_per_group",  # B10 (r6: seat ceded to mmr_diverse_rerank)
    "window_analytics",  # B11 (r6: seat ceded to interval_union_minutes)
    "pagerank_event_graph",  # B4/B7/B11 (r6: seat ceded to cdc_agg_apply_delta)
    "bucketed_join_revenue",  # B21/B22 (r6: seat ceded to compaction_plan_ffd)
    "schedule_policy_compare",  # A.2/A.5/B23 (r6: seat ceded to udtf_chunk_spans)
    "token_budget_selection",  # B11/B10 (r6: seat ceded to sequence_pattern_match)
    "udf_grouped_zscore",  # B23 (r6: seat ceded to woe_iv_binning)
    "udf_cogrouped_stats",  # B23 (r6: seat ceded to table_checksum_manifest)
    "blocktrace_stream_waves",  # B27/A.5/B1 (r6: seat ceded to statestore_dedup_audit)
    "retrieval_rerank_two_stage",  # B25 (r6: seat ceded to stream_scd2_pit_enrich)
    "dedup_exact_hash",  # B13/B24 (r6: seat ceded to bpe_merge_rounds)
    "dedup_minhash_pairs",  # B24 (r6: seat ceded to variant_props_extract)
    "stream_stream_join",  # B27/B4 (r6: seat ceded to avro_source_roundtrip)
    "filter_project_cast",  # B2/B3 (r5: seat ceded to decimal_money_battery)
    "agg_battery",  # B7 (r5: seat ceded to recursive_cte_reachability)
    "set_except",  # B12 (r5: seat ceded to theta_sketch_set_ops)
    "join_left_outer",  # B4/B19 (r5: seat ceded to ivm_join_view_delta)
    "math_funcs",  # B16 (r5: seat ceded to kll_sketch_ks_drift)
    "map_funcs_json",  # B18 (r5: seat ceded to mapstatus_highly_compressed)
    "stats_summary",  # B20 (r5: seat ceded to skew_split_plan)
    "partition_stats",  # B21 (r5: seat ceded to jsonl_corrupt_records_audit)
    "udf_scalar_pandas",  # B23 (r5: seat ceded to broadcast_decision_audit)
    "event_log_parse",  # B14/B18/A.5 (r5: seat ceded to schedule_race_from_trace)
    "asof_join_last_click",  # temporal (r5: seat ceded to task_host_utilization_align)
    "stream_tumbling_window",  # B27 (r5: seat ceded to stream_cdc_serving_table)
    "stream_sliding_window",  # B27 (r5: seat ceded to stream_neardup_suppress)
    "stream_dedup",  # B27/B13 (r5: seat ceded to stream_cms_heavy_users)
    "stream_static_join",  # B27/B4 (r5: seat ceded to dedup_span_rewrite)
    "string_funcs",  # B14 (r4: seat ceded to ann_ivf_nprobe_recall)
    "date_funcs",  # B15 (r4: seat ceded to schedule_policy_compare)
    "knn_brute_cosine",  # B25 (window seat ceded to rerank)
    "collect_sorted_arrays",  # B17/B7 (seat ceded to token budget)
    "text_langid",  # B24 (seat ceded to PQ ADC)
    "ann_ivf_cells",  # B25 (seat ceded to dedup_semantic_cells)
    "dedup_simhash_pairs",  # B24 (seat ceded to blocktrace source)
    "text_quality_score",  # B24 (seat ceded to BM25)
    "time_bucket_rollup",  # B15 (seat ceded to wave streaming)
    "lpt_schedule",  # A.2 (seat ceded to the +locality-swap variant)
    "ann_lsh_probe",  # B25 (seat ceded to hybrid RRF fusion)
    "conditional_null",  # B19 (seat ceded to LRU sim; B19 via join_left_outer)
    "minhash_merge_property",
    "bloom_bitmap_membership",
    "join_size_histogram_estimate",
    "weighted_priority_sample",
    "contrastive_negative_sample",
    "source_token_kl",
    "cdc_snapshot_diff",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent), then
    rebuild the registry in curated order (PRIORITY first)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from scache_spark.operators import (  # noqa: F401
        blocks,
        clustering,
        corpus,
        curation,
        dedup,
        eventlog,
        extra,
        graph,
        linkage,
        mining,
        multimodal,
        pipeline,
        prediction,
        privacy,
        relational,
        retrieval,
        scalar,
        scheduling,
        similarity,
        temporal,
        text,
        tpch2,
        udf,
    )
    from scache_spark.streaming import stateful, windows  # noqa: F401

    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
