"""Differential tests for the extended SQL-surface operators."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

SURFACE = [
    "props_json_extract",
    "rollup_revenue",
    "segment_percentiles",
    "segment_percentiles_approx",
    "part_string_funcs",
    "order_value_bands",
    "asof_purchase_attribution",
    "user_sessions",
    "signup_purchase_within_5m",
]


@pytest.mark.parametrize("name", SURFACE)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


WINDOWS_PIVOT = [
    "order_window_functions",
    "daily_channel_pivot",
    "cube_status_priority",
    "order_date_exprs",
    "daily_channel_unpivot",
    "salted_user_payment",
    "profile_orders",
    "sql_correlated_subquery",
    "grouping_sets_orders",
    "segment_top_balances",
]


@pytest.mark.parametrize("name", WINDOWS_PIVOT)
def test_windows_pivot_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)
