"""TPC-H-shaped multi-way join queries over the star schema (Q3/Q5/Q10
adapted to the fixture's columns). The reference has no joins at all —
its entire batch surface is single-table GROUP BY
(/root/reference/doc/temp.md:509-530) — so these are the canonical
engine-capability queries that prove the join/agg planner end-to-end:
selective dimension filters, multi-way equi-joins, grouped revenue
aggregation, deterministic top-k.

Scale posture (100 TB):
* Filters sit directly on the scans (pushed to parquet row groups);
  Catalyst reorders the joins around the most selective side.
* Every join is a key-partitioned shuffle join under AQE — customer
  and supplier are NOT hinted broadcast because at TPC-H scale
  factors they grow with the fact tables; AQE demotes to broadcast
  at runtime when a filtered side turns out small (and splits skewed
  partitions).
* nation/region ARE broadcast — bounded reference tables (25/5 rows
  at any scale factor).
* Top-k uses ORDER BY ... LIMIT with a deterministic tie-break
  (unique key last), which Spark executes as TakeOrderedAndProject —
  per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q3 shape: shipping-priority revenue — orders not yet shipped as of the
# cutoff, for one market segment; top 10 orders by open revenue.
# --------------------------------------------------------------------------
_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1996-03-15"


@operator(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d')                   AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '{_Q3_CUTOFF} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUTOFF).cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUTOFF).cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 shape: local-supplier volume — revenue per nation within one
# region and one order-date year, counting only lineitems whose
# supplier and customer share the nation.
# --------------------------------------------------------------------------
_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01"
_Q5_TO = "1997-01-01"


@operator(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_FROM} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q5_TO} 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q5_TO).cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue loss — top 20 customers by revenue
# on returned lineitems for one order-date quarter.
# --------------------------------------------------------------------------
_Q10_FROM = "1995-10-01"
_Q10_TO = "1996-01-01"


@operator(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q10_FROM} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q10_TO} 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q10_TO).cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 shape: promotion revenue share — lineitem joined to part for one
# ship-date month; percentage of revenue from PROMO-type parts. The
# part side at cluster SF shuffles on p_partkey (AQE may demote to
# broadcast after the month filter reduces the probe side).
# --------------------------------------------------------------------------
_Q14_FROM = "1996-03-01"
_Q14_TO = "1996-04-01"


@operator(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN l.l_extendedprice * (1 - l.l_discount)
                    ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS promo_pct,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS total_revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q14_FROM} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{_Q14_TO} 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q14_TO).cast("timestamp_ntz"))
    )
    rev = _revenue()
    promo_rev = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return li.join(p, p.p_partkey == li.l_partkey).agg(
        F.round(100.0 * promo_rev / F.sum(rev), 4).alias("promo_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
