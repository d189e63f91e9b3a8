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


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between a nation pair — revenue by
# (supplier nation, customer nation, ship year) for two named nations
# in both directions. Exercises a double dimension-join against the
# same table (nation aliased twice) plus a disjunctive pair predicate.
# Scale: nation broadcasts on both sides; the fact-side joins shuffle
# on their keys and the year extraction stays in codegen.
# --------------------------------------------------------------------------
_Q7_N1, _Q7_N2 = "NATION_3", "NATION_7"
_Q7_FROM, _Q7_TO = "1996-01-01", "1998-01-01"


@operator(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
        OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
      AND l.l_shipdate >= TIMESTAMP '{_Q7_FROM} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{_Q7_TO} 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = [_Q7_N1, _Q7_N2]
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q7_TO).cast("timestamp_ntz"))
    )
    return (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier — quarterly revenue per supplier, return the
# supplier(s) whose revenue equals the maximum. The max is computed as
# a 1-row aggregate joined back (broadcast), NOT a global window —
# no single-partition WindowExec at any scale.
# --------------------------------------------------------------------------
_Q15_FROM, _Q15_TO = "1996-01-01", "1996-04-01"


@operator(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_TO} 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q15_TO).cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier count by part attributes — distinct suppliers
# observed (via lineitem) per (brand, type, size) for selected sizes,
# excluding one brand and suppliers with negative balance (NOT IN →
# anti join; s_suppkey is non-null so the null-aware form degenerates
# to a plain left-anti, which is what Spark plans).
# --------------------------------------------------------------------------
_Q16_EXCL_BRAND = "Brand#13"
_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


@operator(
    "q16_supplier_part_counts",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
      AND p.p_size IN {_Q16_SIZES}
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & F.col("p_size").isin(list(_Q16_SIZES))
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    # no broadcast hint: supplier grows with scale factor (module posture,
    # header) — AQE demotes the anti join to broadcast when `bad` is small
    li = _t(spark, sf_dir, "lineitem").join(
        bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity revenue — lineitems of one brand whose
# quantity is below 20% of that part's average quantity. The
# correlated scalar subquery is decorrelated into a grouped average
# joined back on partkey (exactly Catalyst's rewrite, stated
# explicitly in the plan).
# --------------------------------------------------------------------------
_Q17_BRAND = "Brand#23"


@operator(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{_Q17_BRAND}'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == _Q17_BRAND)
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(thresh, F.col("t_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders — orders whose total quantity exceeds
# a threshold (GROUP BY + HAVING as a semi-join filter), with customer
# detail and a deterministic top-100. The HAVING side aggregates
# lineitem once, map-side partials first; the semi join then prunes
# the detail join to qualifying orders only.
# --------------------------------------------------------------------------
_Q18_QTY = 300


@operator(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single lineitem pass: the HAVING aggregate already IS the
    # per-order total the output wants, so the qualifying orders carry
    # their quantity into the detail join instead of re-aggregating
    # lineitem a second time (the literal TPC-H text's re-join). The
    # oracle keeps the textbook IN-subquery formulation to prove
    # equivalence.
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity predicates over the
# part join. The OR-of-ANDs sits in one filter after the join; the
# common join key still drives a single equi-join (no fanout), and
# Catalyst extracts the brand/size disjunction down to the part scan.
# --------------------------------------------------------------------------
_Q19_ARMS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
)


@operator(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = '{_Q19_ARMS[0][0]}' AND p.p_size BETWEEN {_Q19_ARMS[0][1]} AND {_Q19_ARMS[0][2]}
           AND l.l_quantity BETWEEN {_Q19_ARMS[0][3]} AND {_Q19_ARMS[0][4]})
       OR (p.p_brand = '{_Q19_ARMS[1][0]}' AND p.p_size BETWEEN {_Q19_ARMS[1][1]} AND {_Q19_ARMS[1][2]}
           AND l.l_quantity BETWEEN {_Q19_ARMS[1][3]} AND {_Q19_ARMS[1][4]})
       OR (p.p_brand = '{_Q19_ARMS[2][0]}' AND p.p_size BETWEEN {_Q19_ARMS[2][1]} AND {_Q19_ARMS[2][2]}
           AND l.l_quantity BETWEEN {_Q19_ARMS[2][3]} AND {_Q19_ARMS[2][4]})
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    arm = None
    for brand, smin, smax, qmin, qmax in _Q19_ARMS:
        this = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        arm = this if arm is None else (arm | this)
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(arm)
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape (adapted: the fixture has no phone column, so the country
# prefix becomes the customer's nation): dormant high-balance
# customers — above the positive-balance average, with no order since
# the cutoff — counted per nation. Scalar-average broadcast + anti
# join against recent orders.
# --------------------------------------------------------------------------
_Q22_CUTOFF = "2000-08-01"


@operator(
    "q22_dormant_customers",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Q4 shape: order-priority checking — orders in one half-year with at
# least one lineitem shipped more than 60 days after the order date,
# counted per priority. The correlated EXISTS becomes a left-semi join
# whose condition references both sides (l_shipdate > o_orderdate + 60
# days): an equi-join on the key with a residual predicate, not a
# theta join.
# --------------------------------------------------------------------------
_Q4_FROM, _Q4_TO = "1996-01-01", "1996-07-01"
_Q4_LATE_DAYS = 60


@operator(
    "q4_priority_checks",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_FROM} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_TO} 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_priority_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q4_TO).cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 shape: forecasting revenue change — single-table scan with three
# range predicates and SUM(price * discount). The whole WHERE clause
# is parquet-pushable (PushedFilters on l_shipdate / l_discount /
# l_quantity); no shuffle at all except the 1-row final agg.
# --------------------------------------------------------------------------
_Q6_FROM, _Q6_TO = "1996-01-01", "1997-01-01"
_Q6_DISC_LO, _Q6_DISC_HI = 0.05, 0.07
_Q6_MAX_QTY = 24


@operator(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_FROM} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q6_TO} 00:00:00'
      AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
      AND l_quantity < {_Q6_MAX_QTY}
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q6_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q6_TO).cast("timestamp_ntz"))
        & F.col("l_discount").between(_Q6_DISC_LO, _Q6_DISC_HI)
        & (F.col("l_quantity") < _Q6_MAX_QTY)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Q8 shape: national market share — within one region and part type,
# the share of revenue supplied by one nation, per order year. The
# share is a conditional-sum / sum ratio inside one grouped agg (no
# second pass); nation/region broadcast, fact joins shuffle under AQE.
# --------------------------------------------------------------------------
_Q8_REGION = "EUROPE"
_Q8_TYPE = "STANDARD"
_Q8_NATION = "NATION_5"
_Q8_FROM, _Q8_TO = "1996-01-01", "1998-01-01"


@operator(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN ns.n_name = '{_Q8_NATION}'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS mkt_share
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    WHERE r.r_name = '{_Q8_REGION}'
      AND p.p_type = '{_Q8_TYPE}'
      AND o.o_orderdate >= TIMESTAMP '{_Q8_FROM} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q8_TO} 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_FROM).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(_Q8_TO).cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    nc = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("nc_key"))
    rev = _revenue()
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(0.0)
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(nation_rev / F.sum(rev), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit (adapted: the fixture has no partsupp,
# so supply cost is proxied as 0.5 * p_retailprice per unit) — profit
# by (supplier nation, order year) over parts whose name contains a
# token. The LIKE filter prunes the part scan; profit arithmetic stays
# in codegen on the joined rows.
# --------------------------------------------------------------------------
_Q9_TOKEN = "red"
_Q9_COST_FACTOR = 0.5


@operator(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - {_Q9_COST_FACTOR} * p.p_retailprice * l.l_quantity), 2)
               AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%{_Q9_TOKEN}%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains(_Q9_TOKEN))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    amount = _revenue() - _Q9_COST_FACTOR * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 shape: important inventory (adapted: no partsupp, so "value" is
# lineitem revenue through one nation's suppliers) — parts whose value
# exceeds a fraction of the nation total. The fraction threshold is a
# 1-row aggregate broadcast back against the same grouped relation
# (exchange reuse: one shuffle computes both); both sides compare on
# ROUND(...,2) so float accumulation order cannot flip the cut.
# --------------------------------------------------------------------------
_Q11_NATION = "NATION_4"
_Q11_FRACTION = 0.002


@operator(
    "q11_important_parts",
    oracle=f"""
    WITH partval AS (
      SELECT l.l_partkey AS p_partkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{_Q11_NATION}'
      GROUP BY 1)
    SELECT p_partkey, value
    FROM partval
    WHERE value > (SELECT ROUND(SUM(value) * {_Q11_FRACTION}, 2) FROM partval)
    ORDER BY value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    partval = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.round(F.sum(_revenue()), 2).alias("value"))
    )
    thresh = partval.agg(
        F.round(F.sum("value") * _Q11_FRACTION, 2).alias("cut")
    )
    return (
        partval.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("cut"))
        .select("p_partkey", "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12 shape: late-shipment priority mix (adapted: no shipmode/commit/
# receipt columns — "late" is shipped > 90 days after the order date,
# and the grouping carrier is l_linestatus) — per linestatus, counts of
# critical- vs low-priority orders among late lineitems of one ship
# year. The priority CASE collapses at the scan; one equi-join with a
# residual date predicate; one grouped agg.
# --------------------------------------------------------------------------
_Q12_FROM, _Q12_TO = "1996-01-01", "1997-01-01"
_Q12_LATE_DAYS = 90
_Q12_CRITICAL = ("1-URGENT", "2-HIGH")


@operator(
    "q12_late_priority_mix",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('{_Q12_CRITICAL[0]}', '{_Q12_CRITICAL[1]}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('{_Q12_CRITICAL[0]}', '{_Q12_CRITICAL[1]}')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q12_FROM} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{_Q12_TO} 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q12_TO).cast("timestamp_ntz"))
    )
    is_critical = F.col("o_orderpriority").isin(list(_Q12_CRITICAL))
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — LEFT OUTER join so
# zero-order customers survive with count 0, then a histogram over the
# per-customer counts. Two chained aggs: the first shuffles on
# c_custkey (the outer join's own key — AQE reuses the partitioning),
# the second on the tiny count domain.
# --------------------------------------------------------------------------
_Q13_EXCLUDE = "4-NOT SPECIFIED"


@operator(
    "q13_customer_distribution",
    oracle=f"""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '{_Q13_EXCLUDE}'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != _Q13_EXCLUDE)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier (adapted: no partsupp, so "cost" is
# the minimum observed unit price l_extendedprice / l_quantity for the
# part through suppliers of one region) — for each part of one size,
# the supplier(s) achieving that minimum. The correlated MIN subquery
# decorrelates into a grouped MIN joined back on (partkey, unit
# price); MIN is order-insensitive so the float equality is exact
# (identical IEEE division on both engines).
# --------------------------------------------------------------------------
_Q2_REGION = "EUROPE"
_Q2_SIZE = 15


@operator(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{_Q2_REGION}'),
    offers AS (
      SELECT l.l_partkey, eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM lineitem l JOIN eu ON eu.s_suppkey = l.l_suppkey)
    SELECT p.p_partkey, p.p_name,
           ROUND(o.s_acctbal, 2) AS s_acctbal,
           o.s_name, o.n_name,
           -- scaled-integer output: ROUND(x, 4) disagrees across
           -- engines on half-boundary doubles (found at sf0.001:
           -- 26.24125 -> .2412 vs .2413); ROUND(x * 1e4) rounds the
           -- SAME exact binary double in both engines
           CAST(ROUND(o.unit_price * 10000) AS BIGINT) AS unit_price_x1e4
    FROM part p
    JOIN offers o ON o.l_partkey = p.p_partkey
    WHERE p.p_size = {_Q2_SIZE}
      AND o.unit_price = (SELECT MIN(o2.unit_price) FROM offers o2
                          WHERE o2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    eu = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    offers = li.join(eu, eu.s_suppkey == li.l_suppkey)
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("best_price")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == _Q2_SIZE)
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .join(p, p.p_partkey == F.col("l_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            # scaled-integer output — see the oracle comment
            F.round(F.col("unit_price") * 10000)
            .cast("bigint")
            .alias("unit_price_x1e4"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20 shape: heavy suppliers of a part family (adapted: no partsupp,
# so "excess stock" is a (supplier, part) shipped-quantity total above
# a threshold) — suppliers of one nation who shipped more than the
# threshold of any matching part in one year. Semi-join chain: part
# family → qualifying (supplier, part) totals → distinct suppliers.
# --------------------------------------------------------------------------
_Q20_NATION = "NATION_2"
_Q20_PREFIX = "small"
_Q20_FROM, _Q20_TO = "1996-01-01", "1997-01-01"
_Q20_MIN_QTY = 40


@operator(
    "q20_heavy_suppliers",
    oracle=f"""
    SELECT s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = '{_Q20_NATION}'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '{_Q20_PREFIX}%')
          AND l.l_shipdate >= TIMESTAMP '{_Q20_FROM} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q20_TO} 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > {_Q20_MIN_QTY})
    ORDER BY s.s_name
    """,
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q20_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(_Q20_TO).cast("timestamp_ntz"))
    )
    heavy = (
        li.join(parts, parts.p_partkey == li.l_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > _Q20_MIN_QTY)
        .select("l_suppkey")
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == _Q20_NATION)
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(heavy, heavy.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting (adapted: no commit/
# receipt dates — "late" is shipped > 90 days after the order date) —
# for finalized orders with at least two suppliers where EXACTLY ONE
# supplier shipped late, count that supplier's late lineitems.
#
# The textbook formulation is two correlated (NOT) EXISTS self-joins
# of lineitem (the oracle keeps it). The engine computes it as ONE
# grouped pass per (orderkey, suppkey) followed by a per-order window
# — at 100 TB that is two key-partitioned shuffles of the PRE-AGGREGATED
# per-(order,supplier) rows instead of two shuffles of raw lineitem
# for the EXISTS pair; the window key (l_orderkey) matches the
# grouping key prefix so AQE plans it without an extra exchange.
# --------------------------------------------------------------------------
_Q21_LATE_DAYS = 90
_Q21_TOP = 20


@operator(
    "q21_waiting_suppliers",
    oracle=f"""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
      AND EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l3.o_orderdate
                            + INTERVAL {_Q21_LATE_DAYS} DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT {_Q21_TOP}
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_flag = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAYS"
    )
    per_os = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late_flag, 1).otherwise(0)).alias("late_cnt"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "late_cnt",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum(F.when(F.col("late_cnt") > 0, 1).otherwise(0))
        .over(w)
        .alias("n_late_supp"),
    ).filter(
        (F.col("late_cnt") > 0)
        & (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        flagged.join(s, s.s_suppkey == flagged.l_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_cnt").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(_Q21_TOP)
    )
