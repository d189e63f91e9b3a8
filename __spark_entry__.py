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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (B1 hourly uv/cnt/amount two-level agg) on sf0.001."""
    return REGISTRY["b1_hourly_uv"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; operators absent here get the rows-only check."""
    return dict(ORACLES)
