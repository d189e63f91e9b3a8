"""Differential tests for the star-schema operator layer."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

STAR_QUERIES = [
    "pricing_summary",
    "regional_revenue",
    "priority_revenue",
    "customers_with_orders",
    "customers_without_urgent_orders",
    "topk_orders_per_segment",
    "setops_urgent_low",
    "running_revenue_per_customer",
    "nation_customer_stats",
    "approx_distinct_users",
]


@pytest.mark.parametrize("name", STAR_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_approx_distinct_bounded_error(spark, duck):
    """HLL(0.01) must be within 5% of exact distinct per channel (the
    operator carries the check as a hashable boolean column)."""
    rows = {
        r.channel: (r.exact_uv, r.approx_ok)
        for r in REGISTRY["approx_distinct_users"](spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert rows.keys() == exact.keys()
    for ch, (uv, ok) in rows.items():
        assert uv == exact[ch] and ok is True, (ch, uv, exact[ch], ok)


def test_broadcast_in_plan(spark):
    """The dim joins must be broadcast, not shuffled (scale posture)."""
    plan = REGISTRY["regional_revenue"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
