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

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all

load_all()

# Registry emission order — the driver's correctness sweep covers the
# first 50 entries in dict order, so ordering is part of the contract.
# Round 2's lesson: a hand-maintained priority list goes stale the
# moment operators are added, so the order is now DERIVED from the
# recorded driver results themselves:
#   1. red rows first (a prior sweep ran the query and it failed or
#      crashed the harness — the fix needs a fresh row),
#   2. then operators with NO row in any CORRECTNESS_r*.json
#      (never driver-checked), in registry order,
#   3. then greens, stalest round first (their signal is on file;
#      re-validation rotates through them as slots allow).
# _PIN is a manual escape hatch: names listed there go first UNTIL
# they earn a green row, then expire automatically (so a pin can
# never re-waste future sweep slots). Round-3 pins: the curated
# never-checked set from the round-2 verdict — TPC-H join suite,
# stateful streaming, ANN/clustering, contamination/text, plus the
# round-2b additions — kept ahead of the registry-order unchecked
# pool so the join-planner proof lands this round.
_PIN: list[str] = [
    "segment_top_balances",
    "semdedup_resolve", "knn_lsh_multiprobe", "kmeans_step",
    "knn_ivf_kmeans",
    "stream_ohlc_minute", "stream_dedup_exactly_once",
    "stream_sessionize_stateful", "stream_signup_attribution",
    "ngram_contamination", "dup_ngram_share", "doc_word_chunks",
    "inverted_index", "vocab_coverage", "lm_surprisal_score",
    "events_gap_fill", "events_ohlc_hour", "order_agg_extras",
    "q3_shipping_priority", "q4_priority_checks",
    "q5_local_supplier_volume", "q7_nation_volume",
    "q10_returned_items", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q2_min_cost_supplier", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q11_important_parts",
    "q12_late_priority_mix", "q13_customer_distribution",
    "q20_heavy_suppliers", "q21_waiting_suppliers",
    "jdbc_append_roundtrip", "bucketed_orc_join",
    "file_landing_roundtrip", "multimodal_image_probe",
    "mock_orders_profile", "quality_classifier_score",
    "shard_manifest", "heavy_hitter_tokens", "stream_session_window",
    "name_typo_pairs", "segment_price_trend",
]


def _driver_status(here: str | None = None) -> dict[str, tuple[int, bool]]:
    """name -> (round of latest row, row was green). A row is green if
    it produced no error and nothing compared false (rows-only checks
    count as green: rows_match true, hash_match null)."""
    status: dict[str, tuple[int, bool]] = {}
    here = _HERE if here is None else here
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            status[name] = (rnd, ok)
    return status


def _ordered(mapping: dict) -> dict:
    status = _driver_status()
    # pins expire once green — they never re-occupy future slots
    pinned = [
        n for n in _PIN
        if n in mapping and not (n in status and status[n][1])
    ]
    red = [
        n for n in mapping
        if n not in pinned and n in status and not status[n][1]
    ]
    unchecked = [n for n in mapping if n not in pinned and n not in status]
    greens = sorted(
        (n for n in mapping
         if n not in pinned and n in status and status[n][1]),
        key=lambda n: status[n][0],
    )
    return {n: mapping[n] for n in (*pinned, *red, *unchecked, *greens)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B1 hourly uv/cnt/amount two-level agg) on sf0.001."""
    return REGISTRY["b1_hourly_uv"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(REGISTRY))


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; operators absent here get the rows-only check."""
    return _ordered(dict(ORACLES))
