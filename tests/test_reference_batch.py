"""Differential tests: every reference-parity operator vs its DuckDB oracle."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

REFERENCE_QUERIES = [
    "b1_hourly_uv",
    "b1_hourly_uv_distinct",
    "b2_trailing_window",
    "q1_daily_uv_payment",
    "q1_cumulative_minute",
    "q2_tumble_minute",
    "q3_user_payment",
    "q4_channel_payment",
    "scalar_time_exprs",
]


@pytest.mark.parametrize("name", REFERENCE_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_b1_equivalence(spark):
    """Two-level agg and countDistinct formulations agree (SURVEY A5)."""
    a = REGISTRY["b1_hourly_uv"](spark, SF_DIR).collect()
    b = REGISTRY["b1_hourly_uv_distinct"](spark, SF_DIR).collect()
    assert [(r.dt, r.uv, r.buy_cnt, r.amount) for r in a] == [
        (r.dt, r.uv, r.buy_cnt, r.amount) for r in b
    ]
