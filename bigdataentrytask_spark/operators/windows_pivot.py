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
# Ordered array aggregation: top-3 account balances per segment built as an
# ARRAY — collect_list has no deterministic order, so the contract is
# sort-then-slice. The public output is the exploded (segment, rnk, balance)
# rows: array-typed result columns aren't canonicalizable by order-insensitive
# value hashing (unhashable in pandas factorize), so the array is an internal
# intermediate and posexplode defines the row contract.
# --------------------------------------------------------------------------
@operator(
    "segment_top_balances",
    oracle="""
    SELECT segment, rnk, balance
    FROM (
        SELECT c_mktsegment AS segment,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk,
               ROUND(c_acctbal, 2) AS balance
        FROM customer
    )
    WHERE rnk <= 3
    ORDER BY segment, rnk
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
    agged = (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(top.alias("top_balances"))
    )
    return (
        agged.select(
            "segment", F.posexplode("top_balances").alias("pos", "balance")
        )
        .select(
            "segment",
            (F.col("pos") + F.lit(1)).cast("long").alias("rnk"),
            "balance",
        )
        .orderBy("segment", "rnk")
    )


# --------------------------------------------------------------------------
# Sliding (hopping) window: 5-minute windows advancing every minute —
# the generalization of the reference's 1-min tumble
# (/root/reference/doc/temp.md:391-394; tumble == slide where
# hop = width). Spark expands each row into width/hop assignments
# before the hash-agg; the oracle mirrors that expansion with a
# LATERAL range(5). Shuffle key is the window start (bounded
# cardinality), partials map-side.
# --------------------------------------------------------------------------
@operator(
    "sliding_window_5m_1m",
    oracle="""
    SELECT strftime(date_trunc('minute', ts) - to_minutes(k),
                    '%Y-%m-%d %H:%M:%S')   AS window_start,
           COUNT(*)                        AS cnt,
           ROUND(SUM(value), 2)            AS payment
    FROM events, range(0, 5) t(k)
    GROUP BY 1
    ORDER BY window_start
    """,
)
def sliding_window_5m_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("payment"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "payment",
        )
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Time-RANGE window frame: per-user revenue over the trailing hour at
# every event — RANGE BETWEEN on epoch seconds, so rows with equal
# timestamps share a frame (deterministic under ties, unlike a ROWS
# frame). One sort-shuffle on user_id; frame state is a sliding sum.
# --------------------------------------------------------------------------
@operator(
    "trailing_hour_user_revenue",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id
             ORDER BY epoch_ns(ts) // 1000000000
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_1h
    FROM events
    ORDER BY event_id
    """,
)
def trailing_hour_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("order_time")  # epoch seconds (catalog-derived, exact)
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Gaps-and-islands: consecutive-month purchase streaks per customer.
# The classic (month_index - ROW_NUMBER) grouping trick — island
# identity falls out of two per-customer window functions, no
# self-join over the calendar.
# --------------------------------------------------------------------------
@operator(
    "orders_gap_islands",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m
      FROM orders
    ),
    grp AS (
      SELECT o_custkey, m,
             m - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY m) AS g
      FROM months
    ),
    islands AS (
      SELECT o_custkey, g, CAST(COUNT(*) AS BIGINT) AS len
      FROM grp GROUP BY 1, 2
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT)  AS n_streaks,
           CAST(MAX(len) AS BIGINT)  AS longest_streak_months,
           CAST(SUM(len) AS BIGINT)  AS active_months
    FROM islands GROUP BY 1 ORDER BY custkey
    """,
)
def orders_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-streak islands: for each customer, the runs of
    consecutive active months. Per-customer windows over a
    months-sized frame (≤ ~80 rows/key) — the island id is pure
    arithmetic, so no extra shuffle beyond the dedup."""
    o = _t(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    grp = months.withColumn("g", F.col("m") - F.row_number().over(w))
    islands = grp.groupBy("o_custkey", "g").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak_months"),
            F.sum("len").cast("bigint").alias("active_months"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Correlated LATERAL subquery with LIMIT — per-key top-N as the SQL
# standard writes it. Catalyst rewrites the lateral into the same
# ranked-window plan as the DataFrame formulation (`topk_orders_per
# _segment`); this probe proves the SQL surface accepts the lateral
# form and agrees with DuckDB's.
# --------------------------------------------------------------------------
@operator(
    "lateral_topn_orders",
    oracle="""
    SELECT c.c_custkey AS custkey,
           t.o_orderkey,
           CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS cents
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_custkey <= 300
    ORDER BY custkey, cents DESC, o_orderkey
    """,
)
def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey,
               t.o_orderkey,
               CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS cents
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_custkey <= 300
        ORDER BY custkey, cents DESC, o_orderkey
        """
    )
