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
# never re-waste future sweep slots). Round-4 pins (exactly 50): the
# 3 round-3 reds (HUGEINT oracle artifacts, now CAST-fixed) first,
# the two new ST6/ST7 streaming round-trips, then 45 of the 49
# never-checked round-3 additions. Four low-risk mechanical ops are
# deliberately PARKED for round 5 (54 candidates, 50 slots):
# table_checksum, snapshot_table_diff, zorder_locality_stats,
# token_feature_hashing — all pure-column-expression ops that
# pre-verify clean and carry the least semantic novelty.
_PIN: list[str] = [
    # round-3 reds, fixed this round
    "order_agg_extras", "q12_late_priority_mix", "shard_manifest",
    # new ST7 / ST6 hard-signal conversions
    "stream_restart_recovery", "stream_concurrent_topology",
    # never-checked round-3 additions (registry order, minus 4 parked)
    "events_mad_anomaly", "order_price_quantile_bins",
    "part_abc_classification", "events_ewma_hourly",
    "customer_rfm_segments", "event_transition_matrix",
    "order_cohort_ltv", "top_session_paths",
    "ab_test_conversion_ztest", "order_skyline_2d",
    "user_time_weighted_value", "customer_revenue_gini",
    "dau_wau_mau", "hourly_uniformity_chi2",
    "revenue_growth_mom_yoy", "new_vs_returning_daily",
    "corpus_zipf_fit", "weighted_sample_ares",
    "multimodal_audio_probe", "multimodal_video_probe",
    "knn_quantized_rerank", "pca_power_iteration",
    "embedding_outlier_mahalanobis", "pricing_summary_decimal",
    "null_semantics_probe", "session_window_overlap",
    "collection_functions_probe", "variant_props_probe",
    "uv_sketch_union_daily", "cms_user_event_counts",
    "bloom_membership_probe", "stream_user_totals_jdbc",
    "stream_signup_attribution_outer", "source_vocab_divergence",
    "doc_char_entropy", "order_backlog_timeseries",
    "basket_part_pairs", "referential_integrity_audit",
    "scd2_priority_history", "attribution_linear_multitouch",
    "segment_order_cadence", "part_recommendations",
    "classifier_eval_metrics", "dedup_survivorship",
    "source_label_cramers_v",
]


def _driver_status(here: str | None = None) -> dict[str, tuple[int, bool]]:
    """name -> (round of latest row, row was green). A row is green if
    it produced no error and nothing compared false (rows-only checks
    count as green: rows_match true, hash_match null)."""
    status: dict[str, tuple[int, bool]] = {}
    here = _HERE if here is None else here
    # Sort by the PARSED round number, not the filename: lexicographic
    # order misfiles an unpadded r3 or a future r100, letting an older
    # round's row overwrite a newer one (latest-round-wins contract).
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        digits = "".join(c for c in os.path.basename(path) if c.isdigit())
        if digits:
            rounds.append((int(digits), path))
    for rnd, path in sorted(rounds):
        try:
            with open(path) as fh:
                data = json.load(fh)
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
