#!/usr/bin/env python3
"""Generate PLANS.md: a physical-plan audit of the headline queries.

For each bench headline query this prints the plan properties that decide
100 TB viability — join strategies chosen, exchange (shuffle) count, pushed
filters, partition filters, whole-stage-codegen spans — plus the first scan
node's ReadSchema so column pruning is visible. Run from the repo root:

    python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mapreduce_infrastructure_spark.plans.checks import explain_str  # noqa: E402
from mapreduce_infrastructure_spark.registry import all_queries  # noqa: E402
from mapreduce_infrastructure_spark.session import get_spark  # noqa: E402

# Round-2 additions audited alongside the headline: the plans a reviewer
# should be able to inspect without rerunning anything.
FLAGSHIP_EXTRA = [
    "corpus_assemble_pipeline",
    "merge_upsert_customers",
    "sample_stratified_mix",
    "sample_temperature_mix",
    "decontaminate_benchmark",
    "dedup_clusters",
    "substring_dedup",
    "semantic_dedup_clusters",
    # round-2 late additions
    "q7_nation_volume",
    "q10_returned_items",
    "q18_large_orders",
    "gapfill_hourly_value",
    "anomaly_zscore_events",
    "repetition_signals",
    "chunk_documents",
    "dedup_canonical_docs",
    "pagerank_trade_graph",
    # TPC-H remainder + iterative/interval additions
    "q8_market_share",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "kmeans_embeddings",
    "interval_overlap_join",
    "orc_roundtrip_orders",
    # round-5 window heavy hitters + additions
    "q2_min_cost_supplier",
    "q9_profit_by_nation_year",
    "q20_excess_stock_suppliers",
    "salted_join_hot_users",
    "bloom_prune_semi_join",
    "triangle_counts_parts",
    "pack_sequences",
    "pii_redact",
    "scd2_event_type_runs",
    "boilerplate_ngram_filter",
    # round-7 additions: corpus telemetry + weighted sampling
    "source_unigram_kl",
    "doc_char_entropy",
    "sample_weighted_aes",
    # round-7 wave 2
    "doc_unigram_logloss",
    "source_js_divergence",
    "sample_weighted_by_quality",
    # round-7 wave 3
    "ngram_novelty_ratio",
    "source_type_token_curve",
    "stopword_profile_drift",
    # round-7 wave 4
    "source_dup_mass",
    "budget_pack_efficiency",
    "doc_lang_confusion",
    # round-7 wave 5
    "dup_cluster_size_histogram",
    "source_novelty_trend",
    "quality_flag_transition_by_source",
    # round-8 q15/q11 rewrite (scalar-agg broadcast, no unpartitioned window)
    "q15_top_supplier",
    "q11_important_stock",
    # round-8 wave 1
    "ngram_idf_weighted_novelty",
    "source_pair_jaccard",
    "packing_bin_fill_histogram",
    "doc_bigram_cond_entropy",
    "source_vocab_gini",
    # round-8 wave 2
    "cross_source_dup_matrix",
    "doc_repeated_ngram_ratio",
    "label_centroid_cohesion",
    # round-8 wave 3
    "token_budget_epoch_plan",
    "source_quality_trend",
    "embedding_dim_variance",
    # round-8 wave 4
    "ngram_lm_bigram_logloss",
    "source_embedding_centroid_drift",
    "dup_mass_by_lang_cross",
    "packing_overflow_report",
    # round-8 wave 5
    "source_char_class_profile",
    "source_zipf_alpha_mle",
    "embedding_norm_profile",
    "user_activity_skew",
    # round-8 wave 6
    "source_bigram_js_divergence",
    "doc_length_percentile_by_source",
    "event_interarrival_stats",
    # round-8 waves 9-11 (batch-plan queries; PCA and the streaming top-K
    # execute eagerly/driver-side and are audited by their tests instead)
    "multimodal_frame_sample",
    "dedup_incremental_new_batch",
    "source_length_lognormal_fit",
    "xml_roundtrip_region",
    "binaryfile_ingest_stats",
    # round-9 stratum-window rewrites (histogram / bucketed-prefix-sum
    # forms — the plans the round-8 verdict asked to change)
    "exact_percentiles_disc",
    "winsorized_stats",
    "quality_quantile_filter",
    # round-9 additions (batch-plan queries; the three stream_* additions
    # execute eagerly and are audited by their tests instead)
    "minhash_estimate_error",
    "event_value_winsor_by_type",
    "source_quality_dup_interaction",
    "epoch_sample_overlap",
    "corpus_interleave_plan",
    "approx_vs_exact_quantile_error",
    "dedup_keeper_policy_sensitivity",
    # round-11 additions (stream_dow_hour_profile executes eagerly and is
    # audited by its twin-equality test instead)
    "split_assign_cluster_safe",
    "split_leakage_after_fix",
    "weighted_khop_cheapest_compare",
    "trade_graph_degree_assortativity",
    "supplier_concentration_hhi",
    "events_dow_hour_profile",
    "knn_graph_reciprocity",
    # round-11 order-statistic primitives: the audited plan is the final
    # ≤|strata|-row assembly (the queries execute their ≤13 narrowing
    # rounds eagerly — each round's census plan is ONE pushed-filter scan
    # + partial agg, described in functions/ranks.py docstrings and
    # asserted by tests/test_ranks.py).
    "exact_customer_spend_percentiles",
    "event_value_percentiles_by_type",
    # round-12 additions (stream_backlog_daily and
    # stream_trade_balance_matrix execute eagerly — twin equality +
    # shared oracles audit them instead)
    "supplier_leadtime_percentiles",
    "knn_purity_vs_reciprocity_compare",
    "order_volume_weekly_trend",
    "customer_order_gap_percentiles",
    "parts_clustering_by_degree",
    "knn_label_confusion_matrix",
    "session_duration_percentiles",
    "mr_bigram_count",
    "event_mix_weekly_drift",
    "label_centroid_distance_matrix",
    "return_rate_by_nation_parttype",
    "discount_band_margin_report",
    "customer_revenue_concentration",
    "leadtime_weekly_trend",
    "customer_value_migration_matrix",
    "parts_graph_degree_distribution",
    "event_value_concentration_by_type",
    # round-13 additions (stream_leadtime_weekly_trend executes eagerly —
    # twin equality + the shared oracle audit it instead)
    "supplier_leadtime_migration",
    "events_user_lifetime_span_percentiles",
    "parts_graph_component_sizes",
    "doc_token_concentration_by_source",
    "part_demand_concentration",
    "customer_order_gap_migration",
    "parts_triangle_participation_by_degree",
    "supplier_return_rate_migration",
    "orders_priority_mix_weekly_drift",
    # round-14 additions (stream_modal_priority_by_nation executes eagerly —
    # twin equality + the shared oracle audit it instead; mr_topk_per_key's
    # mapper/reducer plan is the MR runner's, audited via mr_bigram_count)
    "parts_graph_weighted_degree_distribution",
    "events_value_weighted_dow_hour_profile",
    "source_quality_flag_share_drift",
    "customer_gap_vs_value_matrix",
    "modal_priority_by_nation",
    "order_price_reconciliation",
    "revenue_weighted_leadtime_percentiles",
    "priority_leadtime_sla_profile",
    # round-15 additions (stream_events_value_dow_hour_profile executes
    # eagerly — twin equality + the shared oracle audit it instead;
    # mr_distinct_count_per_key's plan is the MR runner's, audited via
    # mr_bigram_count)
    "supplier_balance_leadtime_interaction",
    "parts_graph_strength_vs_degree_matrix",
    "source_flag_vs_length_matrix",
    "events_value_weighted_dow_hour_drift",
    # round-16 additions (stream_events_user_value_concentration executes
    # eagerly — twin equality + the shared oracle audit it instead;
    # mr_histogram_per_key is the MR runner's plan, audited via
    # mr_bigram_count)
    "parts_graph_strength_assortativity",
    "events_user_value_concentration",
    "customer_priority_mix_by_value_quintile",
    "source_length_drift",
]

JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def audit(name: str, plan: str, simple: str) -> str:
    # Count NODES on the simple plan (formatted mode prints each node twice:
    # tree line + details header). \bExchange\b already excludes
    # BroadcastExchange (no word boundary inside the token).
    joins = {k: simple.count(k) for k in JOIN_KINDS if simple.count(k)}
    n_exchange = len(re.findall(r"\bExchange\b", simple))
    n_bcast = simple.count("BroadcastExchange")
    # Codegen spans appear as *(n) prefixes in the simple plan.
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\n]*)\]", plan)))
    pushed = [p for p in pushed if p.strip()]
    part_filters = [
        p.strip()
        for p in set(re.findall(r"PartitionFilters: \[([^\n]*)\]", plan))
        if p.strip()
    ]
    lines = [f"### {name}", ""]
    props = [
        f"- joins: {joins if joins else 'none'}",
        f"- shuffle exchanges: {max(n_exchange, 0)}; broadcast exchanges: {n_bcast}",
        f"- whole-stage-codegen spans: {n_codegen}",
    ]
    if "InMemoryTableScan" in simple or "InMemoryRelation" in simple:
        n_cache = simple.count("InMemoryTableScan")
        props.append(
            f"- persisted subplans: {n_cache} InMemoryTableScan reference(s) — "
            "the counts above OVERCOUNT, because explain re-prints the whole "
            "cache-build subtree at every reference; the executed DAG builds "
            "each cached table once and reuses it"
        )
    if pushed:
        props.append(f"- pushed filters: `{'; '.join(pushed)[:200]}`")
    if part_filters:
        props.append(f"- partition filters: `{'; '.join(part_filters)[:200]}`")
    reads = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    if reads:
        props.append(f"- scan schema (pruned): `{reads[0][:200]}`")
    return "\n".join(lines + props) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark(app_name="plan-report")
    qs = all_queries()
    out = [
        "# PLANS — physical-plan audit of the bench headline queries",
        "",
        f"Generated by `tools/plan_report.py` at `{os.path.basename(sf_dir)}`.",
        "Join strategy, shuffle count, pushdown and codegen per query —",
        "the properties that decide whether each plan survives a 100 TB",
        "scale-up. Counts are from the FINAL (AQE-resolved) plan where the",
        "query executes eagerly, else the initial physical plan.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name].fn(spark, sf_dir)
        # Execute THIS frame's queryExecution (collect, not a write — a
        # write wraps the plan in a new command): AQE only finalizes (and
        # reveals codegen spans, runtime join choices) after a run.
        df.collect()
        plan = explain_str(df, "formatted")
        simple = explain_str(df, "simple")
        out.append(audit(name, plan, simple))
    out.append("## Round-2 flagship operators (not in the bench headline)\n")
    for name in FLAGSHIP_EXTRA:
        if name not in qs:
            continue
        df = qs[name].fn(spark, sf_dir)
        df.collect()
        plan = explain_str(df, "formatted")
        simple = explain_str(df, "simple")
        out.append(audit(name, plan, simple))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
