"""Analytic-window breadth and pivot/cube — completing the OLAP
surface (SURVEY.md §2.5 notes the reference has no OVER-clause
windows; a complete engine ships them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Ranking + offset window functions in one pass over one window spec —
# a single sort-shuffle serves all of them.
# --------------------------------------------------------------------------
@operator(
    "order_window_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile,
           ROUND(COALESCE(LAG(o_totalprice)  OVER w, 0.0), 2) AS prev_price,
           ROUND(COALESCE(LEAD(o_totalprice) OVER w, 0.0), 2) AS next_price,
           ROUND(o_totalprice - FIRST_VALUE(o_totalprice) OVER w, 2) AS delta_first
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def order_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_price"
        ),
        F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "next_price"
        ),
        F.round(
            F.col("o_totalprice") - F.first("o_totalprice").over(w), 2
        ).alias("delta_first"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------
# Pivot: per-day revenue by event_type as columns. Spark's pivot() is
# sugar over conditional aggregation — the oracle states that form.
# --------------------------------------------------------------------------
_CHANNELS = ("click", "error", "purchase", "signup", "view")


@operator(
    "daily_channel_pivot",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS date_str,
           {", ".join(
               f"ROUND(COALESCE(SUM(CASE WHEN event_type = '{c}' THEN value END), 0.0), 2) AS {c}"
               for c in _CHANNELS
           )}
    FROM events GROUP BY 1 ORDER BY date_str
    """,
)
def daily_channel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date_str"))
        .pivot("event_type", list(_CHANNELS))
        .agg(F.sum("value"))
    )
    return pivoted.select(
        "date_str",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in _CHANNELS],
    ).orderBy("date_str")


# --------------------------------------------------------------------------
# CUBE: all subtotal combinations of (status, priority).
# --------------------------------------------------------------------------
@operator(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return (
        o.cube("status", "priority")
        .agg(
            F.grouping("status").alias("g_status"),
            F.grouping("priority").alias("g_priority"),
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.col("status").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# GROUPING SETS with explicit set list — finer control than ROLLUP/CUBE
# (exactly the two single-dimension subtotals plus the grand total).
# --------------------------------------------------------------------------
@operator(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.catalog import register_views

    ensure_session_confs(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Ordered array aggregation: top-3 account balances per segment as an
# ARRAY result — collect_list has no deterministic order, so the
# contract is sort-then-slice (matching the oracle's ordered list agg).
# --------------------------------------------------------------------------
@operator(
    "segment_top_balances",
    oracle="""
    SELECT c_mktsegment AS segment,
           list(ROUND(c_acctbal, 2) ORDER BY c_acctbal DESC, c_custkey)[1:3]
             AS top_balances
    FROM customer GROUP BY 1 ORDER BY segment
    """,
)
def segment_top_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    # struct sort gives the deterministic (balance desc, custkey) order:
    # sort ascending on (-balance, custkey), then project the balance
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                (-F.col("c_acctbal")).alias("neg"), F.col("c_custkey").alias("ck")
            )
        )
    )
    top = F.slice(
        F.transform(packed, lambda s: F.round(-s["neg"], 2)), 1, 3
    )
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(top.alias("top_balances"))
        .orderBy("segment")
    )
