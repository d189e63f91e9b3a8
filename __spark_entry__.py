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

# Registry emission order. The round-1 correctness sweep covered the first 50
# entries in dict order, so ordering is part of the contract: entries that most
# need a fresh differential row go first — (a) operators with no round-1 row,
# (b) operators whose round-1 row failed on the since-fixed DuckDB HUGEINT
# typing artifact, (c) operators that previously ran rows-only and now carry a
# real oracle. Anything not listed (operators added after this list was
# written) slots in next, and the round-1 stable-green entries close the list.
_PRIORITY = [
    # (a) no driver row in CORRECTNESS_r01
    "setops_urgent_low",
    "running_revenue_per_customer",
    "approx_distinct_users",
    "nation_customer_stats",
    "stream_tumble_minute",
    "stream_user_totals",
    "stream_daily_uv",
    "stream_sliding_5m",
    "stream_channel_weighted",
    "text_token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "top_bigrams",
    "tfidf_top_term",
    "quality_filter",
    "train_test_split",
    "llm_token_estimate",
    "dataset_mix",
    "pii_scrub",
    "repetition_ratio",
    "stratified_sample",
    "sequence_pack",
    "order_window_functions",
    "daily_channel_pivot",
    "cube_status_priority",
    "grouping_sets_orders",
    "segment_top_balances",
    "sliding_window_5m_1m",
    "trailing_hour_user_revenue",
    # (b) round-1 hash_match:false, root-caused to oracle HUGEINT typing (fixed)
    "b1_hourly_uv",
    "b2_trailing_window",
    "q1_cumulative_minute",
    "profile_orders",
    "multimodal_meta_stats",
    "multimodal_frame_sample",
    "embedding_quantize",
    # (c) round-1 no_oracle, now differential
    "dedup_resolve",
    "knn_lsh",
    "segment_percentiles_approx",
    "embedding_neardup_pairs",
    "minhash_dedup",
]


def _ordered(mapping: dict) -> dict:
    listed = [n for n in _PRIORITY if n in mapping]
    new = [n for n in mapping if n not in _PRIORITY and n not in _R1_GREEN]
    rest = [n for n in mapping if n in _R1_GREEN and n not in _PRIORITY]
    return {n: mapping[n] for n in (*listed, *new, *rest)}


# Round-1 driver-green entries (hash_match true) — re-checked last.
_R1_GREEN = frozenset({
    "funnel_view_click_purchase", "cohort_retention", "status_extreme_orders",
    "order_price_histogram", "events_rate_anomaly", "dedup_exact",
    "jaccard_pairs", "simhash_pairs", "latest_event_per_user",
    "multimodal_decode", "multimodal_resize_plan", "b1_hourly_uv_distinct",
    "q1_daily_uv_payment", "q2_tumble_minute", "q3_user_payment",
    "q4_channel_payment", "scalar_time_exprs", "embedding_norms",
    "knn_bruteforce", "knn_ivf_label", "props_json_extract", "rollup_revenue",
    "segment_percentiles", "part_string_funcs", "order_value_bands",
    "asof_purchase_attribution", "user_sessions", "signup_purchase_within_5m",
    "order_date_exprs", "daily_channel_unpivot", "salted_user_payment",
    "sql_correlated_subquery", "pricing_summary", "regional_revenue",
    "priority_revenue", "customers_with_orders",
    "customers_without_urgent_orders", "topk_orders_per_segment",
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
