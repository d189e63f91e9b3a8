"""The preverify HUGEINT dtype-parity gate: the round-3 failure class
(DuckDB HUGEINT -> float64 in pandas vs Spark's exact int64) must be
flagged, while legitimately-float and both-sides-nullable-coerced
columns must pass."""

import os
import sys

import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from preverify import hugeint_cols  # noqa: E402


def test_flags_int_spark_vs_float_oracle():
    spdf = pd.DataFrame({"n": pd.array([3, 4], dtype="int64")})
    odf = pd.DataFrame({"n": pd.array([3.0, 4.0], dtype="float64")})
    assert hugeint_cols(spdf, odf) == ["n"]


def test_passes_when_both_sides_float():
    # a nullable Spark long column coerces to float64 in toPandas too —
    # both sides then hash as floats and agree; not a defect
    spdf = pd.DataFrame({"n": pd.array([3.0, None], dtype="float64")})
    odf = pd.DataFrame({"n": pd.array([3.0, None], dtype="float64")})
    assert hugeint_cols(spdf, odf) == []


def test_passes_on_true_float_metric():
    spdf = pd.DataFrame({"ratio": pd.array([0.5], dtype="float64")})
    odf = pd.DataFrame({"ratio": pd.array([0.5], dtype="float64")})
    assert hugeint_cols(spdf, odf) == []


def test_passes_when_both_integral():
    spdf = pd.DataFrame({"n": pd.array([3], dtype="int64")})
    odf = pd.DataFrame({"n": pd.array([3], dtype="int64")})
    assert hugeint_cols(spdf, odf) == []


def test_real_duckdb_hugeint_fingerprint():
    import duckdb

    con = duckdb.connect()
    odf = con.execute(
        "SELECT SUM(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS n "
        "FROM (VALUES (1), (2), (3)) t(x)"
    ).fetch_df()
    spdf = pd.DataFrame({"n": pd.array([2], dtype="int64")})
    assert hugeint_cols(spdf, odf) == ["n"]

    fixed = con.execute(
        "SELECT CAST(SUM(CASE WHEN x > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n "
        "FROM (VALUES (1), (2), (3)) t(x)"
    ).fetch_df()
    assert hugeint_cols(spdf, fixed) == []
