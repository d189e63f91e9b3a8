"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdataentrytask_spark/``; operators
register themselves into ``operators.REGISTRY`` / ``ORACLES``
(one entry per SURVEY.md §2 item).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all

load_all()

# Registry emission order. The driver's correctness sweep covers the first 50
# entries in dict order, so ordering is part of the contract. Round-3 rotation:
# (a) the 29 operators with no CORRECTNESS row in r1 OR r2 (TPC-H join suite,
# stateful streaming, new ANN/clustering, contamination/text, timeseries),
# (b) segment_top_balances — r2's only red row, output contract fixed from an
# ARRAY column to exploded (segment, rnk, balance) rows,
# (c) 20 rotation picks whose last green row dates from round 1 — stalest
# signal first. Operators added after this list was written slot in next;
# everything with a recent (r1/r2) green row closes the list.
_PRIORITY = [
    # (a) never driver-checked — ANN / clustering
    "semdedup_resolve",
    "knn_lsh_multiprobe",
    "kmeans_step",
    "knn_ivf_kmeans",
    # (a) never driver-checked — stateful Structured Streaming
    "stream_ohlc_minute",
    "stream_dedup_exactly_once",
    "stream_sessionize_stateful",
    "stream_signup_attribution",
    # (a) never driver-checked — corpus / text analysis
    "ngram_contamination",
    "dup_ngram_share",
    "doc_word_chunks",
    "inverted_index",
    "vocab_coverage",
    "lm_surprisal_score",
    # (a) never driver-checked — timeseries + SQL surface
    "events_gap_fill",
    "events_ohlc_hour",
    "order_agg_extras",
    # (a) never driver-checked — TPC-H-shaped join suite
    "q3_shipping_priority",
    "q4_priority_checks",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    # (b) r2 harness crash, output shape fixed
    "segment_top_balances",
    # (d) round-3 additions: the 9 TPC-H shapes that complete the
    # 22-query suite (adapted to the fixture schema) — never checked
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_priority_mix",
    "q13_customer_distribution",
    "q20_heavy_suppliers",
    "q21_waiting_suppliers",
    # (d) round-3 additions: live source/sink round-trip edges
    # (S8 append, S9+S5 bucketed ORC, S10 streaming landing)
    "jdbc_append_roundtrip",
    "bucketed_orc_join",
    "file_landing_roundtrip",
    # (d) round-3 addition from the image-header-decode commit
    "multimodal_image_probe",
    # (d) S1/S2 generator contract — rows-only (xxhash64 has no DuckDB
    # twin; the result row carries the contract booleans)
    "mock_orders_profile",
    # (d) corpus-curation decision layer (round-3 additions)
    "quality_classifier_score",
    "shard_manifest",
    "heavy_hitter_tokens",
    # (d) native session-window streaming agg (round-3 addition)
    "stream_session_window",
    # (d) late round-3 additions: new operator families
    "name_typo_pairs",
    "segment_price_trend",
]


def _ordered(mapping: dict) -> dict:
    listed = [n for n in _PRIORITY if n in mapping]
    new = [n for n in mapping if n not in _PRIORITY and n not in _RECENT_GREEN]
    rest = [n for n in mapping if n in _RECENT_GREEN and n not in _PRIORITY]
    return {n: mapping[n] for n in (*listed, *new, *rest)}


# Entries with a green driver row in r1 or r2 that are not in this round's
# rotation — re-checked last (their signal is already on file).
_RECENT_GREEN = frozenset({
    "q1_daily_uv_payment", "q2_tumble_minute", "q3_user_payment",
    "q4_channel_payment", "b1_hourly_uv_distinct", "knn_ivf_label",
    "regional_revenue", "priority_revenue", "pricing_summary",
    "embedding_norms", "multimodal_resize_plan", "latest_event_per_user",
    "multimodal_decode", "topk_orders_per_segment", "sql_correlated_subquery",
    "knn_bruteforce",
    "jaccard_pairs", "simhash_pairs",
    "asof_purchase_attribution",
    "approx_distinct_users", "b1_hourly_uv", "b2_trailing_window",
    "chunk_dedup_corpus", "cohort_retention", "cube_status_priority",
    "customers_with_orders", "customers_without_urgent_orders",
    "daily_channel_pivot", "daily_channel_unpivot", "dataset_mix",
    "decontaminate_ngram", "dedup_cluster_sizes", "dedup_resolve",
    "doc_fingerprint", "embedding_hof_stats", "embedding_label_centroids",
    "embedding_neardup_lsh", "embedding_neardup_pairs", "embedding_quantize",
    "events_rate_anomaly", "funnel_view_click_purchase",
    "grouping_sets_orders", "jdbc_roundtrip", "jdbc_upsert_roundtrip",
    "knn_lsh", "lang_id", "llm_token_estimate", "minhash_dedup",
    "multimodal_frame_sample", "multimodal_meta_stats",
    "nation_customer_stats", "order_date_exprs", "order_price_histogram",
    "order_value_bands", "order_window_functions", "part_string_funcs",
    "pii_scrub", "profile_orders", "props_json_extract",
    "q1_cumulative_minute", "quality_filter", "repetition_ratio",
    "rollup_revenue", "running_revenue_per_customer", "salted_user_payment",
    "scalar_time_exprs", "segment_percentiles", "segment_percentiles_approx",
    "sequence_pack", "setops_urgent_low", "signup_purchase_within_5m",
    "sliding_window_5m_1m", "status_extreme_orders", "stratified_sample",
    "stream_channel_weighted", "stream_daily_uv", "stream_sliding_5m",
    "stream_tumble_minute", "stream_user_totals", "text_quality",
    "text_token_stats", "tfidf_top_term", "top_bigrams",
    "trailing_hour_user_revenue", "train_test_split", "user_sessions",
})


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B1 hourly uv/cnt/amount two-level agg) on sf0.001."""
    return REGISTRY["b1_hourly_uv"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; operators absent here get the rows-only check."""
    return _ordered(dict(ORACLES))
