"""Statistical-inference operators: two-sample tests, rank statistics,
regression, ANOVA, independence, information theory, concentration,
forecast backtesting.

The reference pipeline stops at descriptive aggregates over the order
stream (/root/reference/doc/temp.md:377-411); these operators are the
inference layer a data platform runs ON those aggregates — "is segment
A's spend different from B's", "are region and segment independent",
"which factor drives price", "is the seasonal forecast beating naive".
Every statistic is computed from EXACT integer/decimal power sums
(cents-scaled BIGINT / DECIMAL(38,0) on Spark, BIGINT / HUGEINT in
DuckDB) so the aggregation is order-independent, then the scalar
algebra is written with the SAME expression tree on both engines:
equal integers -> identical IEEE doubles -> identical rounded
statistics. This is the repo-wide moment-sum discipline established by
central_tendency_probe (sql_surface.py) — built-in stddev/corr/
skewness are NOT used because their sample-vs-population corrections
and accumulation orders diverge between engines.

Scale posture (100 TB):
* Every test statistic reduces to a handful of map-side-combinable
  power sums per group — one shuffle on the group key, O(groups)
  output. No windows over raw facts, no collect, no quadratic pair
  expansion anywhere.
* Rank statistics (Mann-Whitney, Spearman) do NOT globally sort the
  fact table: counts are grouped per distinct VALUE first (domain-
  sized, not fact-sized), and midranks come from a cumulative window
  over the sorted value domain — the classic histogram-rank trick.
  At 100 TB the value domain (cents, quantities, percents) is orders
  of magnitude smaller than the fact table; a range-partitioned sort
  of the domain is cheap.
* Contingency statistics (chi-square, Cramer's V, mutual information)
  aggregate to an r x c cell table (tens of rows) before any of the
  expensive math; dimension joins are broadcast.
* The forecast backtest joins an hourly aggregate (|hours| rows) to
  itself at fixed lags — spine-joined so gaps cannot silently shift
  lags, and the spine is generated, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table, with_event_time
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_event_time(_t(spark, sf_dir, "events"))


_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_SEG_A = "BUILDING"
_SEG_B = "MACHINERY"


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test between two market segments' order
# values. One conditional-aggregate pass (no join between the groups,
# no BNLJ bait — CONTRIBUTING.md pitfall 5): n / sum / sum-of-squares
# per segment as exact integers, Welch t and Satterthwaite df in
# double afterwards.
# --------------------------------------------------------------------------
@operator(
    "welch_ttest_segments",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), m AS (
      SELECT
        CAST(count_if(seg = '{_SEG_A}') AS BIGINT)                    AS n_a,
        CAST(count_if(seg = '{_SEG_B}') AS BIGINT)                    AS n_b,
        CAST(SUM(CASE WHEN seg = '{_SEG_A}' THEN cents END) AS DOUBLE) AS s1_a,
        CAST(SUM(CASE WHEN seg = '{_SEG_B}' THEN cents END) AS DOUBLE) AS s1_b,
        CAST(SUM(CASE WHEN seg = '{_SEG_A}'
                 THEN CAST(cents AS HUGEINT) * cents END) AS DOUBLE)   AS s2_a,
        CAST(SUM(CASE WHEN seg = '{_SEG_B}'
                 THEN CAST(cents AS HUGEINT) * cents END) AS DOUBLE)   AS s2_b
      FROM j
    )
    SELECT n_a, n_b,
           ROUND(s1_a / n_a, 6) AS mean_a,
           ROUND(s1_b / n_b, 6) AS mean_b,
           ROUND((s1_a / n_a - s1_b / n_b)
                 / sqrt((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a
                      + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b), 6)
             AS t_stat,
           ROUND(
             ((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a
              + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b)
             * ((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a
                + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b)
             / ( ((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a)
                 * ((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a) / (n_a - 1)
               + ((s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b)
                 * ((s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b) / (n_b - 1)
               ), 6) AS df_welch
    FROM m
    """,
)
def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    )
    dec = F.col("cents").cast("decimal(38,0)")
    is_a = F.col("seg") == _SEG_A
    is_b = F.col("seg") == _SEG_B
    m = j.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(is_b, 1)).alias("n_b"),
        F.sum(F.when(is_a, F.col("cents"))).cast("double").alias("s1_a"),
        F.sum(F.when(is_b, F.col("cents"))).cast("double").alias("s1_b"),
        F.sum(F.when(is_a, dec * F.col("cents"))).cast("double").alias("s2_a"),
        F.sum(F.when(is_b, dec * F.col("cents"))).cast("double").alias("s2_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s1_a, s1_b = F.col("s1_a"), F.col("s1_b")
    s2_a, s2_b = F.col("s2_a"), F.col("s2_b")
    # se² components, written EXACTLY as in the oracle
    va = (s2_a - s1_a * (s1_a / n_a)) / (n_a - 1) / n_a
    vb = (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1) / n_b
    return m.select(
        "n_a",
        "n_b",
        F.round(s1_a / n_a, 6).alias("mean_a"),
        F.round(s1_b / n_b, 6).alias("mean_b"),
        F.round((s1_a / n_a - s1_b / n_b) / F.sqrt(va + vb), 6).alias("t_stat"),
        F.round(
            (va + vb) * (va + vb) / (va * va / (n_a - 1) + vb * vb / (n_b - 1)),
            6,
        ).alias("df_welch"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U between the same two segments WITHOUT sorting the
# fact table: aggregate to per-distinct-value counts first, take a
# cumulative window over the (domain-sized) sorted values, and compute
# midranks from (cum_before, tie_count). Rank-sum identities do the
# rest. The standard normal approximation is reported without the tie
# correction — cents at this granularity are almost-everywhere unique,
# and BOTH engines compute the identical statistic either way.
# --------------------------------------------------------------------------
@operator(
    "mannwhitney_u_segments",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), v AS (
      SELECT cents,
             CAST(count_if(seg = '{_SEG_A}') AS BIGINT) AS c_a,
             CAST(COUNT(*) AS BIGINT)                   AS c_t
      FROM j GROUP BY cents
    ), r AS (
      SELECT c_a, c_t,
             COALESCE(SUM(c_t) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM v
    ), s AS (
      SELECT CAST(SUM(c_a) AS BIGINT)                          AS n_a,
             CAST(SUM(c_t - c_a) AS BIGINT)                    AS n_b,
             SUM(c_a * (cum_before + (c_t + 1) / 2.0))         AS rank_sum_a
      FROM r
    )
    SELECT n_a, n_b,
           ROUND(rank_sum_a, 2)                                AS rank_sum_a,
           ROUND(rank_sum_a - n_a * (n_a + 1) / 2.0, 2)        AS u_a,
           ROUND((rank_sum_a - n_a * (n_a + 1) / 2.0
                  - n_a * (CAST(n_b AS DOUBLE) / 2.0))
                 / sqrt(n_a * (CAST(n_b AS DOUBLE) / 12.0)
                        * (n_a + n_b + 1)), 6)                 AS z_score
    FROM s
    """,
)
def mannwhitney_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    )
    v = j.groupBy("cents").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).alias("c_a"),
        F.count(F.lit(1)).alias("c_t"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = v.select(
        "c_a",
        "c_t",
        F.coalesce(F.sum("c_t").over(w), F.lit(0)).alias("cum_before"),
    )
    s = r.agg(
        F.sum("c_a").alias("n_a"),
        F.sum(F.col("c_t") - F.col("c_a")).alias("n_b"),
        F.sum(
            F.col("c_a") * (F.col("cum_before") + (F.col("c_t") + 1) / 2.0)
        ).alias("rank_sum_a"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u_a = F.col("rank_sum_a") - n_a * (n_a + 1) / 2.0
    return s.select(
        "n_a",
        "n_b",
        F.round("rank_sum_a", 2).alias("rank_sum_a"),
        F.round(u_a, 2).alias("u_a"),
        F.round(
            (u_a - n_a * (n_b.cast("double") / 2.0))
            / F.sqrt(n_a * (n_b.cast("double") / 12.0) * (n_a + n_b + 1)),
            6,
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation between quantity and discount on lineitem.
# Both variables live on TINY domains (50 quantities, 11 discount
# percents), so midranks are computed on the aggregated domain and
# joined back as broadcast maps — the fact table is never sorted.
# Doubled midranks (2*midrank) are integers, so every power sum is
# exact DECIMAL/HUGEINT; Pearson-on-ranks algebra runs on equal
# integers -> identical doubles.
# --------------------------------------------------------------------------
@operator(
    "spearman_qty_discount",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT)            AS q,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ), qd AS (
      SELECT q, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY q
    ), qr AS (
      SELECT q,
             2 * COALESCE(SUM(c) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS r2
      FROM qd
    ), dd AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY d
    ), dr AS (
      SELECT d,
             2 * COALESCE(SUM(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + c + 1 AS r2
      FROM dd
    ), ranked AS (
      SELECT qr.r2 AS rx, dr.r2 AS ry
      FROM base b JOIN qr ON b.q = qr.q JOIN dr ON b.d = dr.d
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT)                           AS n,
             CAST(SUM(rx) AS DOUBLE)                            AS sx,
             CAST(SUM(ry) AS DOUBLE)                            AS sy,
             CAST(SUM(CAST(rx AS HUGEINT) * rx) AS DOUBLE)      AS sxx,
             CAST(SUM(CAST(ry AS HUGEINT) * ry) AS DOUBLE)      AS syy,
             CAST(SUM(CAST(rx AS HUGEINT) * ry) AS DOUBLE)      AS sxy
      FROM ranked
    )
    SELECT n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS spearman_rho
    FROM s
    """,
)
def spearman_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
    )

    def rank_map(df: DataFrame, col: str) -> DataFrame:
        cnt = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return cnt.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    qr = rank_map(base, "q").withColumnRenamed("r2", "rx")
    dr = rank_map(base, "d").withColumnRenamed("r2", "ry")
    ranked = (
        base.join(F.broadcast(qr), "q").join(F.broadcast(dr), "d")
        .select("rx", "ry")
    )
    dx = F.col("rx").cast("decimal(38,0)")
    dy = F.col("ry").cast("decimal(38,0)")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(dx * F.col("rx")).cast("double").alias("sxx"),
        F.sum(dy * F.col("ry")).cast("double").alias("syy"),
        F.sum(dx * F.col("ry")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    return s.select(
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# Two-factor OLS: extendedprice-cents ~ quantity + discount-percent,
# solved in closed form (Cramer's rule on the centered normal
# equations) from nine exact power sums in ONE aggregation pass.
# The distributed part is trivially map-side-combinable; the 2x2
# solve is scalar math on the single output row.
# --------------------------------------------------------------------------
@operator(
    "ols_two_factor_price",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT)               AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT)  AS x2,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT)                        AS n,
             CAST(SUM(x1) AS DOUBLE)                         AS sx1,
             CAST(SUM(x2) AS DOUBLE)                         AS sx2,
             CAST(SUM(y)  AS DOUBLE)                         AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE)   AS sx1x1,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE)   AS sx1x2,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE)   AS sx2x2,
             CAST(SUM(CAST(x1 AS HUGEINT) * y)  AS DOUBLE)   AS sx1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y)  AS DOUBLE)   AS sx2y,
             CAST(SUM(CAST(y  AS HUGEINT) * y)  AS DOUBLE)   AS syy
      FROM base
    )
    SELECT n,
           ROUND(((n * sx1y - sx1 * sy) * (n * sx2x2 - sx2 * sx2)
                  - (n * sx2y - sx2 * sy) * (n * sx1x2 - sx1 * sx2))
                 / ((n * sx1x1 - sx1 * sx1) * (n * sx2x2 - sx2 * sx2)
                    - (n * sx1x2 - sx1 * sx2) * (n * sx1x2 - sx1 * sx2)), 6)
             AS beta_qty,
           ROUND(((n * sx1x1 - sx1 * sx1) * (n * sx2y - sx2 * sy)
                  - (n * sx1x2 - sx1 * sx2) * (n * sx1y - sx1 * sy))
                 / ((n * sx1x1 - sx1 * sx1) * (n * sx2x2 - sx2 * sx2)
                    - (n * sx1x2 - sx1 * sx2) * (n * sx1x2 - sx1 * sx2)), 6)
             AS beta_disc,
           ROUND((((n * sx1y - sx1 * sy) * (n * sx2x2 - sx2 * sx2)
                   - (n * sx2y - sx2 * sy) * (n * sx1x2 - sx1 * sx2))
                  * (n * sx1y - sx1 * sy)
                  + ((n * sx1x1 - sx1 * sx1) * (n * sx2y - sx2 * sy)
                     - (n * sx1x2 - sx1 * sx2) * (n * sx1y - sx1 * sy))
                  * (n * sx2y - sx2 * sy))
                 / (((n * sx1x1 - sx1 * sx1) * (n * sx2x2 - sx2 * sx2)
                     - (n * sx1x2 - sx1 * sx2) * (n * sx1x2 - sx1 * sx2))
                    * (n * syy - sy * sy)), 6)
             AS r_squared
    FROM s
    """,
)
def ols_two_factor_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    d1 = F.col("x1").cast("decimal(38,0)")
    d2 = F.col("x2").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    s = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(d1 * F.col("x1")).cast("double").alias("sx1x1"),
        F.sum(d1 * F.col("x2")).cast("double").alias("sx1x2"),
        F.sum(d2 * F.col("x2")).cast("double").alias("sx2x2"),
        F.sum(d1 * F.col("y")).cast("double").alias("sx1y"),
        F.sum(d2 * F.col("y")).cast("double").alias("sx2y"),
        F.sum(dy * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    a11 = n * F.col("sx1x1") - F.col("sx1") * F.col("sx1")
    a12 = n * F.col("sx1x2") - F.col("sx1") * F.col("sx2")
    a22 = n * F.col("sx2x2") - F.col("sx2") * F.col("sx2")
    b1 = n * F.col("sx1y") - F.col("sx1") * F.col("sy")
    b2 = n * F.col("sx2y") - F.col("sx2") * F.col("sy")
    det = a11 * a22 - a12 * a12
    num1 = b1 * a22 - b2 * a12
    num2 = a11 * b2 - a12 * b1
    sst = n * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "n",
        F.round(num1 / det, 6).alias("beta_qty"),
        F.round(num2 / det, 6).alias("beta_disc"),
        F.round((num1 * b1 + num2 * b2) / (det * sst), 6).alias("r_squared"),
    )


# --------------------------------------------------------------------------
# One-way ANOVA across day-of-week groups on order value. Group power
# sums (exact), then between/within decomposition. DuckDB dayofweek()
# is 0=Sunday..6 while Spark's is 1=Sunday..7 — the oracle shifts by
# one so the group LABELS agree (CONTRIBUTING.md calendar class).
# --------------------------------------------------------------------------
@operator(
    "anova_weekday_revenue",
    oracle=f"""
    WITH g AS (
      SELECT dayofweek(o_orderdate) + 1 AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM({_CENTS}) AS DOUBLE) AS s1,
             CAST(SUM(CAST({_CENTS} AS HUGEINT) * {_CENTS}) AS DOUBLE) AS s2
      FROM orders GROUP BY 1
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT)        AS k,
             CAST(SUM(n_g) AS BIGINT)        AS n,
             SUM(s1)                         AS s_all,
             SUM(s1 * (s1 / n_g))            AS sum_gsq,
             SUM(s2)                         AS s2_all
      FROM g
    )
    SELECT k, n,
           ROUND((sum_gsq - s_all * (s_all / n)) / (k - 1)
                 / ((s2_all - sum_gsq) / (n - k)), 6)  AS f_stat,
           ROUND((sum_gsq - s_all * (s_all / n))
                 / (s2_all - s_all * (s_all / n)), 6)  AS eta_squared
    FROM t
    """,
)
def anova_weekday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.select(
        F.dayofweek("o_orderdate").alias("dow"), cents.alias("cents")
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = base.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("cents").cast("double").alias("s1"),
        F.sum(dec * F.col("cents")).cast("double").alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s1").alias("s_all"),
        F.sum(F.col("s1") * (F.col("s1") / F.col("n_g"))).alias("sum_gsq"),
        F.sum("s2").alias("s2_all"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = F.col("sum_gsq") - F.col("s_all") * (F.col("s_all") / n)
    ssw = F.col("s2_all") - F.col("sum_gsq")
    sst = F.col("s2_all") - F.col("s_all") * (F.col("s_all") / n)
    return t.select(
        "k",
        "n",
        F.round(ssb / (k - 1) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


# --------------------------------------------------------------------------
# Two-sample Poisson rate test: purchase vs click arrival rates over
# the fixture month. Conditional on the total, the count split is
# binomial — the classic z = (c1-c2)/sqrt(c1+c2). Exposure days come
# from the observed span (floor-of-epoch-diff, the fixed-length-unit
# form both engines agree on).
# --------------------------------------------------------------------------
@operator(
    "poisson_rate_ztest_types",
    oracle="""
    WITH b AS (
      SELECT CAST(count_if(event_type = 'purchase') AS BIGINT) AS c1,
             CAST(count_if(event_type = 'click') AS BIGINT)    AS c2,
             CAST(floor(epoch(MAX(ts) - MIN(ts)) / 86400) + 1 AS BIGINT)
               AS span_days
      FROM events
    )
    SELECT c1, c2, span_days,
           ROUND(c1 / CAST(span_days AS DOUBLE), 6)  AS rate1_per_day,
           ROUND(c2 / CAST(span_days AS DOUBLE), 6)  AS rate2_per_day,
           ROUND((c1 - c2) / sqrt(CAST(c1 + c2 AS DOUBLE)), 6) AS z_score
    FROM b
    """,
)
def poisson_rate_ztest_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    b = e.agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c2"),
        (
            F.floor(
                (
                    F.unix_timestamp(F.max("ts"))
                    - F.unix_timestamp(F.min("ts"))
                )
                / 86400
            )
            + 1
        ).alias("span_days"),
    )
    c1, c2 = F.col("c1"), F.col("c2")
    return b.select(
        "c1",
        "c2",
        "span_days",
        F.round(c1 / F.col("span_days").cast("double"), 6).alias(
            "rate1_per_day"
        ),
        F.round(c2 / F.col("span_days").cast("double"), 6).alias(
            "rate2_per_day"
        ),
        F.round((c1 - c2) / F.sqrt((c1 + c2).cast("double")), 6).alias(
            "z_score"
        ),
    )


# --------------------------------------------------------------------------
# Chi-square independence of region x market segment. The contingency
# table is 5x5 = 25 cells; all the per-cell math happens AFTER the
# fact table has been reduced to those 25 counts. Dimension joins are
# broadcast; the margins come from window sums over the tiny cell
# table, not a second scan.
# --------------------------------------------------------------------------
@operator(
    "chi2_region_segment",
    oracle="""
    WITH cells AS (
      SELECT r.r_name AS region, c.c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), m AS (
      SELECT region, seg, cnt,
             SUM(cnt) OVER (PARTITION BY region) AS row_tot,
             SUM(cnt) OVER (PARTITION BY seg)    AS col_tot,
             SUM(cnt) OVER ()                    AS n
      FROM cells
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT region) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT seg) AS BIGINT)    AS n_cols,
             SUM((cnt - row_tot * (CAST(col_tot AS DOUBLE) / n))
                 * (cnt - row_tot * (CAST(col_tot AS DOUBLE) / n))
                 / (row_tot * (CAST(col_tot AS DOUBLE) / n))) AS chi2
      FROM m
    )
    SELECT n, n_rows, n_cols,
           (n_rows - 1) * (n_cols - 1)              AS dof,
           ROUND(chi2, 6)                           AS chi2,
           ROUND(sqrt(chi2 / (n * (least(n_rows, n_cols) - 1))), 6)
             AS cramers_v
    FROM agg
    """,
)
def chi2_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n_ = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cells = (
        c.join(F.broadcast(n_), c.c_nationkey == n_.n_nationkey)
        .join(F.broadcast(r), n_.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = cells.select(
        "region",
        "seg",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("region")).alias("row_tot"),
        F.sum("cnt").over(Window.partitionBy("seg")).alias("col_tot"),
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    expected = F.col("row_tot") * (F.col("col_tot").cast("double") / F.col("n"))
    agg = m.agg(
        F.max("n").alias("n"),
        F.count_distinct("region").alias("n_rows"),
        F.count_distinct("seg").alias("n_cols"),
        F.sum(
            (F.col("cnt") - expected) * (F.col("cnt") - expected) / expected
        ).alias("chi2"),
    )
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least("n_rows", "n_cols") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Mutual information (nats) between event type and day-of-week — the
# feature-selection statistic for categorical pairs. Same contingency
# reduction as chi-square; entropies and MI from the closed cell
# table. Normalized MI = MI / min(H_x, H_y).
# --------------------------------------------------------------------------
@operator(
    "mutual_information_events",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x, dayofweek(ts) + 1 AS y,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT x, y, cnt,
             SUM(cnt) OVER (PARTITION BY x) AS cx,
             SUM(cnt) OVER (PARTITION BY y) AS cy,
             SUM(cnt) OVER ()               AS n
      FROM cells
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             SUM((CAST(cnt AS DOUBLE) / n)
                 * ln(cnt * (CAST(n AS DOUBLE) / (cx * CAST(cy AS DOUBLE)))))
               AS mi,
             SUM((CAST(cnt AS DOUBLE) / n)
                 * ln(CAST(n AS DOUBLE) / cx)) AS h_x
      FROM m
    )
    SELECT n,
           ROUND(mi, 6)  AS mi_nats,
           ROUND(h_x, 6) AS h_type_nats,
           ROUND(mi / h_x, 6) AS mi_ratio
    FROM agg
    """,
)
def mutual_information_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cells = e.groupBy(
        F.col("event_type").alias("x"), F.dayofweek("ts").alias("y")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = cells.select(
        "x",
        "y",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("x")).alias("cx"),
        F.sum("cnt").over(Window.partitionBy("y")).alias("cy"),
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    n = F.col("n")
    # H(x) via the cell-weighted identity SUM_xy (c_xy/n) ln(n/c_x)
    # = SUM_x (c_x/n) ln(n/c_x) — no "anchor cell" assumption, so a
    # sparse contingency (an x missing some y) cannot undercount
    agg = m.agg(
        F.max("n").alias("n"),
        F.sum(
            (F.col("cnt").cast("double") / n)
            * F.log(
                F.col("cnt")
                * (n.cast("double") / (F.col("cx") * F.col("cy").cast("double")))
            )
        ).alias("mi"),
        F.sum(
            (F.col("cnt").cast("double") / n)
            * F.log(n.cast("double") / F.col("cx"))
        ).alias("h_x"),
    )
    return agg.select(
        "n",
        F.round("mi", 6).alias("mi_nats"),
        F.round("h_x", 6).alias("h_type_nats"),
        F.round(F.col("mi") / F.col("h_x"), 6).alias("mi_ratio"),
    )


# --------------------------------------------------------------------------
# Tukey-fence outlier census per market segment: exact interpolated
# quartiles (percentile <-> quantile_cont, the established parity
# pair), fences at 1.5*IQR, then ONE more conditional pass counting
# violations. The quartile table is 5 rows — broadcast back.
# --------------------------------------------------------------------------
@operator(
    "iqr_outlier_census",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), q AS (
      SELECT segment,
             quantile_cont(cents, 0.25) AS q1,
             quantile_cont(cents, 0.75) AS q3
      FROM j GROUP BY segment
    )
    SELECT j.segment,
           CAST(COUNT(*) AS BIGINT)                       AS n,
           ROUND(MAX(q.q1), 2)                            AS q1_cents,
           ROUND(MAX(q.q3), 2)                            AS q3_cents,
           CAST(count_if(j.cents < q.q1 - 1.5 * (q.q3 - q.q1)) AS BIGINT)
             AS n_low,
           CAST(count_if(j.cents > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
             AS n_high,
           ROUND(count_if(j.cents > q.q3 + 1.5 * (q.q3 - q.q1))
                 / CAST(COUNT(*) AS DOUBLE), 6)            AS high_rate
    FROM j JOIN q ON j.segment = q.segment
    GROUP BY j.segment ORDER BY j.segment
    """,
)
def iqr_outlier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), cents.alias("cents"))
    )
    q = j.groupBy("segment").agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        j.join(F.broadcast(q), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("q1"), 2).alias("q1_cents"),
            F.round(F.max("q3"), 2).alias("q3_cents"),
            F.count(F.when(F.col("cents") < lo, 1)).alias("n_low"),
            F.count(F.when(F.col("cents") > hi, 1)).alias("n_high"),
            F.round(
                F.count(F.when(F.col("cents") > hi, 1))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("high_rate"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Market concentration: Herfindahl-Hirschman index of nation revenue
# shares within each region (HHI in 0-10000 points), plus the top
# nation's share. Revenue reduces to 25 (region, nation) cells before
# any share math.
# --------------------------------------------------------------------------
@operator(
    "market_concentration_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT region, nation, cents,
             SUM(cents) OVER (PARTITION BY region) AS region_cents
      FROM rev
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(MAX(region_cents) AS BIGINT) AS region_cents,
           ROUND(SUM((cents / CAST(region_cents AS DOUBLE))
                     * (cents / CAST(region_cents AS DOUBLE))) * 10000, 6)
             AS hhi_points,
           ROUND(MAX(cents / CAST(region_cents AS DOUBLE)), 6)
             AS top_share
    FROM tot GROUP BY region ORDER BY region
    """,
)
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n_ = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_), F.col("c_nationkey") == n_.n_nationkey)
        .join(F.broadcast(r), n_.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents"))
    )
    tot = rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(Window.partitionBy("region")).alias("region_cents"),
    )
    share = F.col("cents") / F.col("region_cents").cast("double")
    return (
        tot.groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.max("region_cents").alias("region_cents"),
            F.round(F.sum(share * share) * 10000, 6).alias("hhi_points"),
            F.round(F.max(share), 6).alias("top_share"),
        )
        .orderBy("region")
    )


# --------------------------------------------------------------------------
# Markov transition entropy of the per-user event-type sequence:
# conditional entropy H(next | current) in nats from the 5x5
# transition-count table, next to the marginal H(next) — their gap is
# the sequence's predictability. The per-user LEAD window partitions
# on user_id (bounded state); everything after is 25-cell math.
# Tie-break within a timestamp: event_id (unique, pinned by
# test_first_seen_event_id_unique).
# --------------------------------------------------------------------------
@operator(
    "transition_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
    ), cells AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), m AS (
      SELECT cur, nxt, cnt,
             SUM(cnt) OVER (PARTITION BY cur) AS c_cur,
             SUM(cnt) OVER (PARTITION BY nxt) AS c_nxt,
             SUM(cnt) OVER ()                 AS n
      FROM cells
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_transitions,
           ROUND(SUM((CAST(cnt AS DOUBLE) / n)
                     * ln(CAST(c_cur AS DOUBLE) / cnt)), 6) AS h_cond_nats,
           ROUND(SUM((CAST(cnt AS DOUBLE) / n)
                     * ln(CAST(n AS DOUBLE) / c_nxt)), 6)
             AS h_next_nats
    FROM m
    """,
)
def transition_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cells = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    m = cells.select(
        "cur",
        "nxt",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("cur")).alias("c_cur"),
        F.sum("cnt").over(Window.partitionBy("nxt")).alias("c_nxt"),
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    n = F.col("n")
    return m.agg(
        F.max("n").alias("n_transitions"),
        F.round(
            F.sum(
                (F.col("cnt").cast("double") / n)
                * F.log(F.col("c_cur").cast("double") / F.col("cnt"))
            ),
            6,
        ).alias("h_cond_nats"),
        F.round(
            F.sum(
                (F.col("cnt").cast("double") / n)
                * F.log(n.cast("double") / F.col("c_nxt"))
            ),
            6,
        ).alias("h_next_nats"),
    )


# --------------------------------------------------------------------------
# Forecast backtest on the hourly event-count series: one-step-ahead
# naive (lag 1h) vs seasonal-naive (lag 24h) over the final-week
# holdout, MAE each plus their ratio (the MASE-style skill score —
# < 1 means the seasonal model beats naive). The series is built on a
# generated hour spine so a silent gap can never shift a lag.
# --------------------------------------------------------------------------
_BT_SPLIT = "2024-01-24 00:00:00"


@operator(
    "forecast_backtest_mase",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-30 23:00:00',
                                    INTERVAL 1 HOUR)) AS h
    ), counts AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), series AS (
      SELECT s.h, COALESCE(c.y, 0) AS y,
             LAG(COALESCE(c.y, 0), 1)  OVER (ORDER BY s.h) AS y_1,
             LAG(COALESCE(c.y, 0), 24) OVER (ORDER BY s.h) AS y_24
      FROM spine s LEFT JOIN counts c ON s.h = c.h
    ), test AS (
      SELECT * FROM series WHERE h >= TIMESTAMP '{_BT_SPLIT}'
    )
    SELECT CAST(COUNT(*) AS BIGINT)                       AS n_test,
           CAST(SUM(abs(y - y_1)) AS BIGINT)              AS abs_err_naive,
           CAST(SUM(abs(y - y_24)) AS BIGINT)             AS abs_err_seasonal,
           ROUND(SUM(abs(y - y_1))  / CAST(COUNT(*) AS DOUBLE), 6)
             AS mae_naive,
           ROUND(SUM(abs(y - y_24)) / CAST(COUNT(*) AS DOUBLE), 6)
             AS mae_seasonal,
           ROUND(SUM(abs(y - y_24)) / CAST(SUM(abs(y - y_1)) AS DOUBLE), 6)
             AS mase_ratio
    FROM test
    """,
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )
    counts = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("h")
    series = (
        spine.join(counts, "h", "left")
        .select("h", F.coalesce("y", F.lit(0)).alias("y"))
        .select(
            "h",
            "y",
            F.lag("y", 1).over(w).alias("y_1"),
            F.lag("y", 24).over(w).alias("y_24"),
        )
    )
    test = series.filter(F.col("h") >= F.lit(_BT_SPLIT).cast("timestamp"))
    err1 = F.sum(F.abs(F.col("y") - F.col("y_1")))
    err24 = F.sum(F.abs(F.col("y") - F.col("y_24")))
    return test.agg(
        F.count(F.lit(1)).alias("n_test"),
        err1.alias("abs_err_naive"),
        err24.alias("abs_err_seasonal"),
        F.round(err1 / F.count(F.lit(1)).cast("double"), 6).alias("mae_naive"),
        F.round(err24 / F.count(F.lit(1)).cast("double"), 6).alias(
            "mae_seasonal"
        ),
        F.round(err24 / err1.cast("double"), 6).alias("mase_ratio"),
    )


# --------------------------------------------------------------------------
# Lagged cross-correlation between the hourly 'view' and 'purchase'
# series (lags -3..+3 hours): does view traffic lead purchases?
# Integer count sums per (lag) are exact; Pearson algebra mirrors the
# oracle tree. The lag fan-out joins |hours| x 7 rows — aggregate-
# sized, never fact-sized.
# --------------------------------------------------------------------------
@operator(
    "type_lag_xcorr",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-30 23:00:00',
                                    INTERVAL 1 HOUR)) AS h
    ), v AS (
      SELECT s.h, COALESCE(c.y, 0) AS x
      FROM spine s LEFT JOIN (
        SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'view' GROUP BY 1
      ) c ON s.h = c.h
    ), p AS (
      SELECT s.h, COALESCE(c.y, 0) AS y
      FROM spine s LEFT JOIN (
        SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
      ) c ON s.h = c.h
    ), lags AS (
      SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag_h
    ), joined AS (
      SELECT l.lag_h, v.x, p.y
      FROM lags l
      JOIN v ON TRUE
      JOIN p ON p.h = v.h + to_hours(l.lag_h)
    ), s AS (
      SELECT lag_h,
             CAST(COUNT(*) AS BIGINT)                      AS n,
             CAST(SUM(x) AS DOUBLE)                        AS sx,
             CAST(SUM(y) AS DOUBLE)                        AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE)   AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)   AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE)   AS sxy
      FROM joined GROUP BY lag_h
    )
    SELECT lag_h, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS pearson_r
    FROM s ORDER BY lag_h
    """,
)
def type_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h")
    )

    def hourly(tp: str, hcol: str, out: str) -> DataFrame:
        c = (
            e.filter(F.col("event_type") == tp)
            .groupBy(F.date_trunc("hour", "ts").alias("h"))
            .agg(F.count(F.lit(1)).alias("y"))
        )
        return spine.join(c, "h", "left").select(
            F.col("h").alias(hcol), F.coalesce("y", F.lit(0)).alias(out)
        )

    v = hourly("view", "h_v", "x")
    p = hourly("purchase", "h_p", "y")
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(i) for i in range(-3, 4)])).alias("lag_h")
    )
    joined = (
        lags.crossJoin(v)
        .join(
            p,
            F.col("h_p")
            == F.col("lag_h") * F.expr("INTERVAL 1 HOUR") + F.col("h_v"),
        )
        .select("lag_h", "x", "y")
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    s = joined.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(dx * F.col("x")).cast("double").alias("sxx"),
        F.sum(dy * F.col("y")).cast("double").alias("syy"),
        F.sum(dx * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    return s.select(
        "lag_h",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("pearson_r"),
    ).orderBy("lag_h")


# --------------------------------------------------------------------------
# Log-normal fit of the document length distribution: mu/sigma of
# ln(n_chars) by the method of moments, implied median exp(mu), and
# the implied-vs-actual mean gap (a lognormality diagnostic). Length
# distributions of scraped corpora are canonically log-normal-ish —
# this is the one-pass check. ln() per row is deterministic; the
# double sums are order-sensitive only below the 1e-6 rounding floor
# at any realistic cardinality.
# --------------------------------------------------------------------------
@operator(
    "lognormal_chars_fit",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT)             AS n,
             SUM(ln(n_chars))                     AS s1,
             SUM(ln(n_chars) * ln(n_chars))       AS s2,
             CAST(SUM(n_chars) AS BIGINT)         AS chars_tot
      FROM documents WHERE n_chars > 0
    )
    SELECT n,
           ROUND(s1 / n, 6)                                  AS mu,
           ROUND(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6)      AS sigma,
           ROUND(exp(s1 / n), 6)                             AS implied_median,
           ROUND(exp(s1 / n + (s2 / n - (s1 / n) * (s1 / n)) / 2), 6)
             AS implied_mean,
           ROUND(chars_tot / CAST(n AS DOUBLE), 6)           AS actual_mean
    FROM s
    """,
)
def lognormal_chars_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    ln = F.log(F.col("n_chars"))
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ln).alias("s1"),
        F.sum(ln * ln).alias("s2"),
        F.sum("n_chars").alias("chars_tot"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    var = F.col("s2") / n - mu * mu
    return s.select(
        "n",
        F.round(mu, 6).alias("mu"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        F.round(F.exp(mu), 6).alias("implied_median"),
        F.round(F.exp(mu + var / 2), 6).alias("implied_mean"),
        F.round(F.col("chars_tot") / n.cast("double"), 6).alias("actual_mean"),
    )


# --------------------------------------------------------------------------
# Markov next-event prediction accuracy: if the predictor is "emit
# the most frequent next type given the current type" (the 1st-order
# Markov argmax from transition_entropy_rate's cell table), what
# fraction of transitions does it get right — against the marginal-
# argmax baseline (always predict the globally most common next
# type)? Pure integer-count algebra on the 25-cell table; the fact
# table contributes one LEAD window partitioned by user.
# --------------------------------------------------------------------------
@operator(
    "markov_next_accuracy",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
    ), cells AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), per_cur AS (
      SELECT cur, CAST(MAX(cnt) AS BIGINT) AS best, CAST(SUM(cnt) AS BIGINT) AS tot
      FROM cells GROUP BY cur
    ), marg AS (
      SELECT CAST(MAX(s) AS BIGINT) AS best_marginal
      FROM (SELECT SUM(cnt) AS s FROM cells GROUP BY nxt)
    )
    SELECT CAST(SUM(tot) AS BIGINT)                      AS n_transitions,
           CAST(SUM(best) AS BIGINT)                     AS n_correct,
           ROUND(SUM(best) / CAST(SUM(tot) AS DOUBLE), 6) AS markov_accuracy,
           ROUND(MAX(m.best_marginal)
                 / CAST(SUM(tot) AS DOUBLE), 6)          AS baseline_accuracy,
           ROUND((SUM(best) - MAX(m.best_marginal))
                 / CAST(SUM(tot) AS DOUBLE), 6)          AS lift_over_baseline
    FROM per_cur CROSS JOIN marg m
    """,
)
def markov_next_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cells = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    per_cur = cells.groupBy("cur").agg(
        F.max("cnt").alias("best"), F.sum("cnt").alias("tot")
    )
    marg = (
        cells.groupBy("nxt")
        .agg(F.sum("cnt").alias("s"))
        .agg(F.max("s").alias("best_marginal"))
    )
    return (
        per_cur.crossJoin(F.broadcast(marg))
        .agg(
            F.sum("tot").alias("n_transitions"),
            F.sum("best").alias("n_correct"),
            F.round(
                F.sum("best") / F.sum("tot").cast("double"), 6
            ).alias("markov_accuracy"),
            F.round(
                F.max("best_marginal") / F.sum("tot").cast("double"), 6
            ).alias("baseline_accuracy"),
            F.round(
                (F.sum("best") - F.max("best_marginal"))
                / F.sum("tot").cast("double"),
                6,
            ).alias("lift_over_baseline"),
        )
    )


# --------------------------------------------------------------------------
# Robust location & scale per market segment: 5%-trimmed mean and
# MAD (median absolute deviation) of order cents — the outlier-proof
# companions to welch/iqr. Trim bounds and the inner median are exact
# interpolated percentiles (the percentile <-> quantile_cont parity
# pair); the trimmed mean is a conditional aggregate against the
# broadcast bounds; MAD re-aggregates |x - median| per segment. Two
# passes over the keyed fact, both map-side-combinable.
# --------------------------------------------------------------------------
@operator(
    "robust_location_scale",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), q AS (
      SELECT segment,
             quantile_cont(cents, 0.05) AS lo,
             quantile_cont(cents, 0.95) AS hi,
             quantile_cont(cents, 0.5)  AS med
      FROM j GROUP BY segment
    )
    SELECT j.segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(q.med), 2)     AS median_cents,
           ROUND(SUM(CASE WHEN j.cents >= q.lo AND j.cents <= q.hi
                          THEN j.cents END)
                 / CAST(count_if(j.cents >= q.lo AND j.cents <= q.hi)
                        AS DOUBLE), 6)              AS trimmed_mean_cents,
           ROUND(quantile_cont(abs(j.cents - q.med), 0.5), 2)
             AS mad_cents
    FROM j JOIN q ON j.segment = q.segment
    GROUP BY j.segment ORDER BY j.segment
    """,
)
def robust_location_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), cents.alias("cents"))
    )
    q = j.groupBy("segment").agg(
        F.expr("percentile(cents, 0.05)").alias("lo"),
        F.expr("percentile(cents, 0.95)").alias("hi"),
        F.expr("percentile(cents, 0.5)").alias("med"),
    )
    inlier = (F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi"))
    return (
        j.join(F.broadcast(q), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 2).alias("median_cents"),
            F.round(
                F.sum(F.when(inlier, F.col("cents")))
                / F.count(F.when(inlier, 1)).cast("double"),
                6,
            ).alias("trimmed_mean_cents"),
            F.round(
                F.expr("percentile(abs(cents - med), 0.5)"), 2
            ).alias("mad_cents"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Kendall's tau-b between quantity and discount (round-8 slate):
# computed EXACTLY from the 50 x 11 contingency table — concordant /
# discordant pairs are integer cell-count products (cell (i,j) is
# concordant with every cell strictly greater in both coordinates),
# so the whole statistic is a tiny cross join over the domain table,
# never a pair expansion over the fact. Complements spearman (which
# ranks); tau-b includes the tie corrections explicitly.
# --------------------------------------------------------------------------
@operator(
    "kendall_tau_qty_discount",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), pairs AS (
      SELECT CAST(SUM(CASE WHEN b.q > a.q AND b.d > a.d
                      THEN CAST(a.c AS HUGEINT) * b.c END) AS DOUBLE) AS conc,
             CAST(SUM(CASE WHEN b.q > a.q AND b.d < a.d
                      THEN CAST(a.c AS HUGEINT) * b.c END) AS DOUBLE) AS disc
      FROM cells a JOIN cells b ON TRUE
    ), ties AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE) AS t_cell2
      FROM cells
    ), tq AS (
      SELECT CAST(SUM(CAST(s AS HUGEINT) * (s - 1)) AS DOUBLE) AS t_q2
      FROM (SELECT SUM(c) AS s FROM cells GROUP BY q)
    ), td AS (
      SELECT CAST(SUM(CAST(s AS HUGEINT) * (s - 1)) AS DOUBLE) AS t_d2
      FROM (SELECT SUM(c) AS s FROM cells GROUP BY d)
    )
    SELECT ties.n,
           ROUND((pairs.conc - pairs.disc)
                 / sqrt((CAST(ties.n AS HUGEINT) * (ties.n - 1) / 2 - tq.t_q2 / 2)
                        * (CAST(ties.n AS HUGEINT) * (ties.n - 1) / 2 - td.t_d2 / 2)),
                 6) AS kendall_tau_b
    FROM pairs, ties, tq, td
    """,
)
def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(
        F.col("q").alias("qa"), F.col("d").alias("da"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("q").alias("qb"), F.col("d").alias("db"), F.col("c").alias("cb")
    )
    dec_ca = F.col("ca").cast("decimal(38,0)")
    pairs = a.crossJoin(b).agg(
        F.sum(
            F.when(
                (F.col("qb") > F.col("qa")) & (F.col("db") > F.col("da")),
                dec_ca * F.col("cb"),
            )
        ).cast("double").alias("conc"),
        F.sum(
            F.when(
                (F.col("qb") > F.col("qa")) & (F.col("db") < F.col("da")),
                dec_ca * F.col("cb"),
            )
        ).cast("double").alias("disc"),
    )
    dec_c = F.col("c").cast("decimal(38,0)")
    ties = cells.agg(
        F.sum("c").alias("n"),
        F.sum(dec_c * (F.col("c") - 1)).cast("double").alias("t_cell2"),
    )
    tq = (
        cells.groupBy("q").agg(F.sum("c").alias("s"))
        .agg(
            F.sum(F.col("s").cast("decimal(38,0)") * (F.col("s") - 1))
            .cast("double")
            .alias("t_q2")
        )
    )
    td = (
        cells.groupBy("d").agg(F.sum("c").alias("s"))
        .agg(
            F.sum(F.col("s").cast("decimal(38,0)") * (F.col("s") - 1))
            .cast("double")
            .alias("t_d2")
        )
    )
    j = pairs.crossJoin(ties).crossJoin(tq).crossJoin(td)
    n = F.col("n")
    tot = (n.cast("decimal(38,0)") * (n - 1) / 2).cast("double")
    return j.select(
        "n",
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.sqrt(
                (tot - F.col("t_q2") / 2) * (tot - F.col("t_d2") / 2)
            ),
            6,
        ).alias("kendall_tau_b"),
    )


# --------------------------------------------------------------------------
# Wilson score intervals for the per-type conversion-to-purchase
# proportion (round-8 slate): the binomial CI that behaves at small n
# and extreme p, from exact counts — the A/B-dashboard companion to
# ab_test_conversion_ztest. Pure scalar algebra per group row.
# --------------------------------------------------------------------------
_WILSON_Z = 1.959963984540054  # 97.5th normal percentile


@operator(
    "two_proportion_wilson",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY event_type
    ), j AS (
      SELECT g.event_type, g.n_users,
             CAST((SELECT COUNT(DISTINCT e2.user_id) FROM events e2
                   WHERE e2.event_type = 'purchase'
                     AND e2.user_id IN (SELECT e3.user_id FROM events e3
                                        WHERE e3.event_type = g.event_type))
                  AS BIGINT) AS n_conv
      FROM g
    )
    SELECT event_type, n_users, n_conv,
           ROUND(n_conv / CAST(n_users AS DOUBLE), 6) AS p_hat,
           ROUND((n_conv / CAST(n_users AS DOUBLE)
                  + {_WILSON_Z} * {_WILSON_Z} / (2 * n_users)
                  - {_WILSON_Z} * sqrt((n_conv / CAST(n_users AS DOUBLE))
                      * (1 - n_conv / CAST(n_users AS DOUBLE)) / n_users
                      + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n_users * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6) AS wilson_lo,
           ROUND((n_conv / CAST(n_users AS DOUBLE)
                  + {_WILSON_Z} * {_WILSON_Z} / (2 * n_users)
                  + {_WILSON_Z} * sqrt((n_conv / CAST(n_users AS DOUBLE))
                      * (1 - n_conv / CAST(n_users AS DOUBLE)) / n_users
                      + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n_users * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6) AS wilson_hi
    FROM j ORDER BY event_type
    """,
)
def two_proportion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cohort = e.select("event_type", "user_id").distinct()
    purchasers = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    j = (
        cohort.join(F.broadcast(purchasers), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count(F.when(F.col("conv") == 1, 1)).alias("n_conv"),
        )
    )
    n = F.col("n_users")
    p = F.col("n_conv") / n.cast("double")
    z = F.lit(_WILSON_Z)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return j.select(
        "event_type",
        "n_users",
        "n_conv",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily order-revenue series (round-8
# slate): is above/below-median daily revenue serially random, or
# does it cluster? The sign sequence lives on the |days| aggregate;
# runs are counted with one LAG over that aggregate; the z-statistic
# is closed-form from (n_plus, n_minus, runs). The only fact-scale
# work is the daily rollup.
# --------------------------------------------------------------------------
@operator(
    "runs_test_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), med AS (
      SELECT quantile_cont(cents, 0.5) AS m FROM daily
    ), signs AS (
      SELECT day, cents > (SELECT m FROM med) AS above
      FROM daily WHERE cents <> (SELECT m FROM med)
    ), runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                    OR LAG(above) OVER (ORDER BY day) <> above
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ), s AS (
      SELECT CAST(count_if(above) AS BIGINT)      AS n_plus,
             CAST(count_if(NOT above) AS BIGINT)  AS n_minus,
             CAST(SUM(new_run) AS BIGINT)         AS n_runs
      FROM runs
    )
    SELECT n_plus, n_minus, n_runs,
           ROUND(1 + 2.0 * n_plus * n_minus / (n_plus + n_minus), 6)
             AS expected_runs,
           ROUND((n_runs - (1 + 2.0 * n_plus * n_minus / (n_plus + n_minus)))
                 / sqrt(2.0 * n_plus * n_minus
                        * (2.0 * n_plus * n_minus - n_plus - n_minus)
                        / ((CAST(n_plus + n_minus AS DOUBLE))
                           * (n_plus + n_minus)
                           * (n_plus + n_minus - 1))), 6) AS z_score
    FROM s
    """,
)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    med = daily.agg(F.expr("percentile(cents, 0.5)").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("m"))
        .select("day", (F.col("cents") > F.col("m")).alias("above"))
    )
    w = Window.orderBy("day")
    runs = signs.select(
        "above",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.count(F.when(F.col("above"), 1)).alias("n_plus"),
        F.count(F.when(~F.col("above"), 1)).alias("n_minus"),
        F.sum("new_run").alias("n_runs"),
    )
    np_, nm, nr = F.col("n_plus"), F.col("n_minus"), F.col("n_runs")
    exp = 1 + 2.0 * np_ * nm / (np_ + nm)
    var = (
        2.0 * np_ * nm * (2.0 * np_ * nm - np_ - nm)
        / ((np_ + nm).cast("double") * (np_ + nm) * (np_ + nm - 1))
    )
    return s.select(
        "n_plus",
        "n_minus",
        "n_runs",
        F.round(exp, 6).alias("expected_runs"),
        F.round((nr - exp) / F.sqrt(var), 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Gamma fit of inter-purchase times (round-8 slate): per-user gaps
# between consecutive purchases, method-of-moments shape/rate
# (shape = mean²/var, rate = mean/var) from exact integer-microsecond
# gaps. shape < 1 = bursty re-purchasing, shape ≈ 1 = memoryless
# (exponential), shape > 1 = regular cadence — the distributional
# sibling of events_burstiness, on the purchase stream. Gaps come
# from one per-user LAG window; moments are decimal-exact sums.
# --------------------------------------------------------------------------
@operator(
    "interpurchase_gamma_fit",
    oracle="""
    WITH gaps AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events WHERE event_type = 'purchase'
    ), g AS (SELECT gap_us FROM gaps WHERE gap_us IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap_us) AS DOUBLE) AS s1,
             CAST(SUM(CAST(gap_us AS HUGEINT) * gap_us) AS DOUBLE) AS s2
      FROM g
    )
    SELECT n,
           ROUND(s1 / n / 1e6, 6) AS mean_seconds,
           ROUND(sqrt(s2 / n - (s1 / n) * (s1 / n)) / 1e6, 6) AS sd_seconds,
           ROUND((s1 / n) * (s1 / n)
                 / (s2 / n - (s1 / n) * (s1 / n)), 6)  AS gamma_shape,
           ROUND((s1 / n)
                 / (s2 / n - (s1 / n) * (s1 / n)) * 1e6, 6) AS gamma_rate_per_s
    FROM s
    """,
)
def interpurchase_gamma_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.select((us - F.lag(us).over(w)).alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    dec = F.col("gap_us").cast("decimal(38,0)")
    s = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_us").cast("double").alias("s1"),
        F.sum(dec * F.col("gap_us")).cast("double").alias("s2"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    var = F.col("s2") / n - mu * mu
    return s.select(
        "n",
        F.round(mu / 1e6, 6).alias("mean_seconds"),
        F.round(F.sqrt(var) / 1e6, 6).alias("sd_seconds"),
        F.round(mu * mu / var, 6).alias("gamma_shape"),
        F.round(mu / var * 1e6, 6).alias("gamma_rate_per_s"),
    )


# --------------------------------------------------------------------------
# Classical ratio-to-moving-average monthly seasonal index (round-8
# slate): monthly revenue over a 13-month centered moving average
# (half-weight endpoints — the textbook decomposition), averaged by
# calendar month. Index > 1 = seasonally strong month. The window
# runs over the |months| aggregate (~80 rows at any corpus scale);
# integer cents keep the monthly sums exact, and the centered-MA /
# ratio algebra mirrors the oracle tree.
# --------------------------------------------------------------------------
@operator(
    "monthly_seasonal_index",
    oracle=f"""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), ma AS (
      SELECT m, cents,
             (SUM(cents) OVER w13
              + SUM(cents) OVER w11
             ) / 24.0 AS cma,
             COUNT(*) OVER w13 AS n13
      FROM monthly
      WINDOW w13 AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING),
             w11 AS (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
    ), ratios AS (
      SELECT CAST(month(m) AS BIGINT) AS month_num,
             cents / cma AS ratio
      FROM ma WHERE n13 = 13
    )
    SELECT month_num,
           CAST(COUNT(*) AS BIGINT)        AS n_years,
           ROUND(SUM(ratio) / COUNT(*), 6) AS seasonal_index
    FROM ratios GROUP BY month_num ORDER BY month_num
    """,
)
def monthly_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(cents).alias("cents"))
    w13 = Window.orderBy("m").rowsBetween(-6, 6)
    w11 = Window.orderBy("m").rowsBetween(-5, 5)
    ma = monthly.select(
        "m",
        "cents",
        (
            (F.sum("cents").over(w13) + F.sum("cents").over(w11)) / 24.0
        ).alias("cma"),
        F.count(F.lit(1)).over(w13).alias("n13"),
    )
    ratios = ma.filter(F.col("n13") == 13).select(
        F.month("m").cast("bigint").alias("month_num"),
        (F.col("cents") / F.col("cma")).alias("ratio"),
    )
    return (
        ratios.groupBy("month_num")
        .agg(
            F.count(F.lit(1)).alias("n_years"),
            F.round(F.sum("ratio") / F.count(F.lit(1)), 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("month_num")
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival of time-to-repeat-purchase (round-8 slate):
# per user, time from first to second purchase, right-censored at
# the fixture horizon; S(t) at a fixed day grid via the product-limit
# estimator. The product is computed as exp(sum(ln(1 - d/n))) on
# BOTH engines (identical expression tree — a native product()
# aggregate would pair-reduce in engine-specific order). Risk sets
# come from cumulative counts over the |distinct event times|
# aggregate, never the fact table.
# --------------------------------------------------------------------------
_KM_GRID_DAYS = [1, 3, 7, 14]


@operator(
    "survival_km_repeat_purchase",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE event_type = 'purchase'
    ), horizon AS (
      SELECT MAX(ts) AS h FROM events
    ), subjects AS (
      SELECT f.user_id,
             CASE WHEN s.ts IS NOT NULL THEN 1 ELSE 0 END AS event,
             CASE WHEN s.ts IS NOT NULL
                  THEN epoch_us(s.ts) - epoch_us(f.ts)
                  ELSE (SELECT epoch_us(h) FROM horizon) - epoch_us(f.ts)
             END AS dur_us
      FROM (SELECT user_id, ts FROM p WHERE rn = 1) f
      LEFT JOIN (SELECT user_id, ts FROM p WHERE rn = 2) s
        ON s.user_id = f.user_id
    ), times AS (
      SELECT dur_us, CAST(count_if(event = 1) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM subjects GROUP BY dur_us
    ), risk AS (
      SELECT dur_us, d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM subjects) -
             COALESCE(SUM(leaving) OVER (ORDER BY dur_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      FROM times
    ), grid AS (
      SELECT UNNEST([{", ".join(str(d) for d in _KM_GRID_DAYS)}]) AS day
    )
    SELECT g.day,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM subjects) AS n_subjects,
           CAST((SELECT SUM(r.d) FROM risk r
                 WHERE r.dur_us <= g.day * 86400000000) AS BIGINT) AS events_by_day,
           ROUND(COALESCE(exp((SELECT SUM(CASE WHEN r.d < r.n
                                 THEN ln(1 - r.d / CAST(r.n AS DOUBLE)) END)
                               FROM risk r
                               WHERE r.d > 0
                                 AND r.dur_us <= g.day * 86400000000)), 1.0), 6)
             AS km_survival
    FROM grid g ORDER BY g.day
    """,
)
def survival_km_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    first = p.filter(F.col("rn") == 1).select(
        "user_id", F.col("ts").alias("t1")
    )
    second = p.filter(F.col("rn") == 2).select(
        "user_id", F.col("ts").alias("t2")
    )
    horizon = e.agg(F.max("ts").alias("h"))
    subjects = (
        first.join(second, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("event"),
            F.when(
                F.col("t2").isNotNull(),
                F.unix_micros("t2") - F.unix_micros("t1"),
            )
            .otherwise(F.unix_micros("h") - F.unix_micros("t1"))
            .alias("dur_us"),
        )
    )
    times = subjects.groupBy("dur_us").agg(
        F.count(F.when(F.col("event") == 1, 1)).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    n_total = subjects.agg(F.count(F.lit(1)).alias("n_subjects"))
    w = Window.orderBy("dur_us").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        times.crossJoin(F.broadcast(n_total))
        .select(
            "dur_us",
            "d",
            "n_subjects",
            (
                F.col("n_subjects")
                - F.coalesce(F.sum("leaving").over(w), F.lit(0))
            ).alias("n"),
        )
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d) for d in _KM_GRID_DAYS])
        ).alias("day")
    )
    day_us = F.col("day") * F.lit(86_400_000_000)
    joined = grid.join(
        risk.filter(F.col("d") > 0),
        risk["dur_us"] <= day_us,
        "left",
    )
    return (
        joined.groupBy("day")
        .agg(
            F.max("n_subjects").alias("n_subjects"),
            F.sum("d").cast("bigint").alias("events_by_day"),
            F.round(
                F.coalesce(
                    F.exp(
                        F.sum(
                            F.when(
                                F.col("d") < F.col("n"),
                                F.log(
                                    1 - F.col("d") / F.col("n").cast("double")
                                ),
                            )
                        )
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("km_survival"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Jackknife standard error of the mean daily revenue (round-8 slate).
# The leave-one-day-out deviation m_i - m reduces algebraically to
# (S - n*d_i) / (n*(n-1)), so the whole estimator is one exact integer
# sum of squares over the DAY domain (never the fact table): jackknife
# at 100 TB is a domain-sized second pass over an aggregate that
# already exists. Companion to cusum_changepoint's daily series.
# --------------------------------------------------------------------------
@operator(
    "jackknife_daily_mean",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      FROM daily
    ), dev AS (
      SELECT MAX(n) AS n, MAX(s) AS s,
             CAST(SUM((CAST(s AS HUGEINT) - CAST(n AS HUGEINT) * c)
                      * (CAST(s AS HUGEINT) - CAST(n AS HUGEINT) * c))
                  AS DOUBLE) AS ssq
      FROM daily CROSS JOIN tot
    )
    SELECT n AS n_days,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_daily_cents,
           ROUND(sqrt(ssq * (n - 1.0) / n)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS jk_se_cents
    FROM dev
    """,
)
def jackknife_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    diff = (
        F.col("s").cast("decimal(38,0)")
        - F.col("n").cast("decimal(38,0)") * F.col("c")
    )
    dev = daily.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(diff * diff).cast("double").alias("ssq"),
    )
    n = F.col("n")
    return dev.select(
        n.alias("n_days"),
        F.round(F.col("s").cast("double") / n, 6).alias("mean_daily_cents"),
        F.round(
            F.sqrt(F.col("ssq") * (n - F.lit(1.0)) / n)
            / (n.cast("double") * (n - 1)),
            6,
        ).alias("jk_se_cents"),
    )


# --------------------------------------------------------------------------
# McNemar's paired test on (user, day) exposure units: did the unit
# view that day vs click that day. The statistic only involves the
# DISCORDANT cell counts b (view-only) and c (click-only) — exact
# integers from one grouped pass over events; continuity-corrected
# chi-square is scalar algebra on two integers. The paired twin of
# ab_test_conversion_ztest (which treats groups as independent).
# --------------------------------------------------------------------------
@operator(
    "mcnemar_view_click",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS k
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(count_if(v = 1 AND k = 0) AS BIGINT) AS b_view_only,
             CAST(count_if(v = 0 AND k = 1) AS BIGINT) AS c_click_only
      FROM u
    )
    SELECT n_units, b_view_only, c_click_only,
           CASE WHEN b_view_only + c_click_only > 0 THEN
             ROUND((ABS(b_view_only - c_click_only) - 1.0)
                   * (ABS(b_view_only - c_click_only) - 1.0)
                   / (b_view_only + c_click_only), 6)
           END AS mcnemar_chi2
    FROM m
    """,
)
def mcnemar_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("k"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(F.when((F.col("v") == 1) & (F.col("k") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b_view_only"),
        F.sum(F.when((F.col("v") == 0) & (F.col("k") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c_click_only"),
    )
    b, c = F.col("b_view_only"), F.col("c_click_only")
    return m.select(
        "n_units",
        "b_view_only",
        "c_click_only",
        F.when(
            b + c > 0,
            F.round(
                (F.abs(b - c) - F.lit(1.0)) * (F.abs(b - c) - F.lit(1.0)) / (b + c),
                6,
            ),
        ).alias("mcnemar_chi2"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa between two cheap document-quality raters (char-count
# threshold vs whitespace-count threshold): the chance-corrected
# agreement a labeling pipeline reports before trusting one rule as a
# proxy for the other. All four confusion cells are exact integers
# from one pass; kappa is scalar algebra. Space counting uses
# length(text) - length(replace(text,' ','')) — identical semantics in
# both engines (regex-free on purpose; split() dialects differ).
# --------------------------------------------------------------------------
@operator(
    "quality_raters_kappa",
    oracle="""
    WITH r AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS r1,
             CASE WHEN length(text) - length(replace(text, ' ', '')) >= 50
                  THEN 1 ELSE 0 END AS r2
      FROM documents
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(count_if(r1 = 1 AND r2 = 1) AS BIGINT) AS both_pos,
             CAST(count_if(r1 = 1 AND r2 = 0) AS BIGINT) AS only_r1,
             CAST(count_if(r1 = 0 AND r2 = 1) AS BIGINT) AS only_r2,
             CAST(count_if(r1 = 0 AND r2 = 0) AS BIGINT) AS both_neg
      FROM r
    )
    SELECT n, both_pos, only_r1, only_r2, both_neg,
           ROUND((both_pos + both_neg) / CAST(n AS DOUBLE), 6)
             AS observed_agreement,
           ROUND(((both_pos + both_neg) / CAST(n AS DOUBLE)
                  - ((both_pos + only_r1) * CAST(both_pos + only_r2 AS DOUBLE)
                     + (only_r2 + both_neg) * CAST(only_r1 + both_neg AS DOUBLE))
                    / (CAST(n AS DOUBLE) * n))
                 / (1 - ((both_pos + only_r1) * CAST(both_pos + only_r2 AS DOUBLE)
                         + (only_r2 + both_neg) * CAST(only_r1 + both_neg AS DOUBLE))
                        / (CAST(n AS DOUBLE) * n)), 6) AS cohens_kappa
    FROM m
    """,
)
def quality_raters_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    r1 = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    r2 = F.when(
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        >= 50,
        1,
    ).otherwise(0)
    r = d.select(r1.alias("r1"), r2.alias("r2"))
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("both_pos"),
        F.sum(F.when((F.col("r1") == 1) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("only_r1"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("only_r2"),
        F.sum(F.when((F.col("r1") == 0) & (F.col("r2") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("both_neg"),
    )
    n = F.col("n").cast("double")
    po = (F.col("both_pos") + F.col("both_neg")) / n
    pe = (
        (F.col("both_pos") + F.col("only_r1"))
        * (F.col("both_pos") + F.col("only_r2")).cast("double")
        + (F.col("only_r2") + F.col("both_neg"))
        * (F.col("only_r1") + F.col("both_neg")).cast("double")
    ) / (n * F.col("n"))
    return m.select(
        "n",
        "both_pos",
        "only_r1",
        "only_r2",
        "both_neg",
        F.round(po, 6).alias("observed_agreement"),
        F.round((po - pe) / (1 - pe), 6).alias("cohens_kappa"),
    )


# --------------------------------------------------------------------------
# Theil-Sen robust trend of daily revenue: the median of all pairwise
# slopes over the DAY domain (2.4k days -> ~2.9M pairs — and the day
# domain does NOT grow with fact volume, so the pair expansion is
# SF-invariant; at 100 TB this runs on the same few-thousand-row
# aggregate). Median is position-based over (slope, xa, xb) — a total
# order, so both engines pick identical middle elements. The robust
# twin of trailing_trend_slope's OLS.
# --------------------------------------------------------------------------
@operator(
    "theil_sen_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ), slopes AS (
      SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope,
             a.x AS xa, b.x AS xb
      FROM daily a JOIN daily b ON b.x > a.x
    ), ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, xa, xb) AS rn,
             COUNT(*) OVER () AS np
      FROM slopes
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_pairs,
           ROUND(AVG(slope), 6) AS theil_sen_slope
    FROM ranked
    WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("x")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(F.broadcast(b), F.col("xb") > F.col("xa"))
        .select(
            ((F.col("yb") - F.col("ya")).cast("double") / (F.col("xb") - F.col("xa")))
            .alias("slope"),
            "xa",
            "xb",
        )
    )
    w = Window.orderBy("slope", "xa", "xb")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(np + 1) div 2"))
        | (F.col("rn") == F.expr("(np + 2) div 2"))
    )
    return mid.agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("theil_sen_slope"),
    )


# --------------------------------------------------------------------------
# Negative-binomial overdispersion fit of per-user event counts:
# method-of-moments r and p plus the dispersion index (var/mean) — the
# standard first question about count data ("is Poisson enough?").
# Two exact integer power sums over the per-user count table; the
# NB parameters are defined only when var > mean (else NULL, the
# honest "not overdispersed" answer).
# --------------------------------------------------------------------------
@operator(
    "negbin_overdispersion_fit",
    oracle="""
    WITH pc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS u,
             CAST(SUM(k) AS BIGINT) AS s1,
             CAST(SUM(k * k) AS BIGINT) AS s2
      FROM pc
    )
    SELECT u AS n_users,
           ROUND(CAST(s1 AS DOUBLE) / u, 6) AS mean_events,
           ROUND((s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1), 6) AS var_events,
           ROUND((s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1)
                 / (CAST(s1 AS DOUBLE) / u), 6) AS dispersion_index,
           CASE WHEN (s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1)
                     > CAST(s1 AS DOUBLE) / u THEN
             ROUND((CAST(s1 AS DOUBLE) / u) * (CAST(s1 AS DOUBLE) / u)
                   / ((s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1)
                      - CAST(s1 AS DOUBLE) / u), 6)
           END AS nb_r,
           CASE WHEN (s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1)
                     > CAST(s1 AS DOUBLE) / u THEN
             ROUND((CAST(s1 AS DOUBLE) / u)
                   / ((s2 - CAST(s1 AS DOUBLE) * s1 / u) / (u - 1)), 6)
           END AS nb_p
    FROM m
    """,
)
def negbin_overdispersion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pc = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    m = pc.agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum("k").cast("bigint").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("s2"),
    )
    u = F.col("u")
    mean = F.col("s1").cast("double") / u
    var = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / u) / (u - 1)
    return m.select(
        u.alias("n_users"),
        F.round(mean, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(var / mean, 6).alias("dispersion_index"),
        F.when(var > mean, F.round(mean * mean / (var - mean), 6)).alias("nb_r"),
        F.when(var > mean, F.round(mean / var, 6)).alias("nb_p"),
    )


# --------------------------------------------------------------------------
# Ljung-Box portmanteau test on the hourly event-count series, lags
# 1..6: "is there ANY autocorrelation left". r_k expands to exact
# integer sums (sum x_t*x_{t-k}, the two partial sums, count) plus the
# global (n, S, Q) — the mean only enters in double AFTER aggregation,
# so the statistic is engine-exact. Q_k accumulates over exactly 6
# ordered rows (same order both engines). Composes the machinery of
# hourly_autocorrelation (timeseries.py) into the standard test.
# --------------------------------------------------------------------------
@operator(
    "ljung_box_hourly",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS q
      FROM hourly
    ), lagged AS (
      SELECT lag AS lag_hours, c AS y,
             LAG(c, lag) OVER (PARTITION BY lag ORDER BY h) AS x
      FROM hourly CROSS JOIN (SELECT UNNEST([1, 2, 3, 4, 5, 6]) AS lag)
    ), pl AS (
      SELECT lag_hours,
             CAST(COUNT(*) AS BIGINT)   AS m,
             CAST(SUM(x * y) AS BIGINT) AS p,
             CAST(SUM(x) AS BIGINT)     AS ax,
             CAST(SUM(y) AS BIGINT)     AS sy
      FROM lagged WHERE x IS NOT NULL GROUP BY 1
    ), r AS (
      SELECT lag_hours, n,
             (p - (CAST(s AS DOUBLE) / n) * (ax + sy)
                + m * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / (q - CAST(s AS DOUBLE) * s / n) AS rk
      FROM pl CROSS JOIN g
    )
    SELECT lag_hours, ROUND(rk, 6) AS r,
           ROUND(n * (n + 2.0)
                 * SUM(rk * rk / (n - lag_hours))
                   OVER (ORDER BY lag_hours
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS ljung_box_q
    FROM r ORDER BY lag_hours
    """,
)
def ljung_box_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    g = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    frames = []
    for k in range(1, 7):
        w = Window.orderBy("h")
        frames.append(
            hourly.select(
                F.lit(k).alias("lag_hours"),
                F.col("c").alias("y"),
                F.lag("c", k).over(w).alias("x"),
            ).filter(F.col("x").isNotNull())
        )
    lagged = frames[0]
    for fdf in frames[1:]:
        lagged = lagged.unionByName(fdf)
    pl = lagged.groupBy("lag_hours").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("p"),
        F.sum("x").cast("bigint").alias("ax"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    rk = (
        F.col("p") - mean * (F.col("ax") + F.col("sy"))
        + F.col("m") * mean * mean
    ) / (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
    r = pl.crossJoin(F.broadcast(g)).select(
        "lag_hours", F.col("n"), rk.alias("rk")
    )
    wq = Window.orderBy("lag_hours").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return r.select(
        "lag_hours",
        F.round("rk", 6).alias("r"),
        F.round(
            F.col("n") * (F.col("n") + F.lit(2.0))
            * F.sum(F.col("rk") * F.col("rk") / (F.col("n") - F.col("lag_hours"))).over(wq),
            6,
        ).alias("ljung_box_q"),
    ).orderBy("lag_hours")


# --------------------------------------------------------------------------
# Hurst exponent via rescaled range (R/S) on the hourly event-count
# series, block sizes 24h and 48h. The block-local identity
# B*Y_t = B*cum_t - t*S_block keeps the cumulative-deviation range an
# exact INTEGER per block, and R/S = (scaled range)/sqrt(B*Q - S^2)
# cancels the 1/B scale — so every block's ratio comes from exact
# sums. Blocks are independent (PARTITION BY block), so at 100 TB the
# windows never cross a partition boundary; only the final two-point
# log-log slope is driver-sized. H≈0.5 = memoryless, H>0.5 =
# persistent traffic (the long-range-dependence companion to
# events_burstiness).
# --------------------------------------------------------------------------
@operator(
    "hurst_rescaled_range",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), idx AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY h) AS t FROM hourly
    ), blk AS (
      SELECT bs, (t - 1) // bs AS bid, c, t
      FROM idx CROSS JOIN (SELECT UNNEST([24, 48]) AS bs)
    ), wb AS (
      SELECT bs, bid, c,
             SUM(c) OVER (PARTITION BY bs, bid ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             ROW_NUMBER() OVER (PARTITION BY bs, bid ORDER BY t) AS pos,
             SUM(c) OVER (PARTITION BY bs, bid) AS sb
      FROM blk
    ), bstat AS (
      SELECT bs, bid,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(MAX(sb) AS BIGINT) AS sb,
             CAST(SUM(c * c) AS BIGINT) AS qb,
             CAST(MAX(bs * cum - pos * sb) AS BIGINT) AS ymax,
             CAST(MIN(bs * cum - pos * sb) AS BIGINT) AS ymin
      FROM wb GROUP BY 1, 2
    ), rs AS (
      SELECT bs,
             (ymax - ymin)
             / sqrt(CAST(bs * qb - CAST(sb AS HUGEINT) * sb AS DOUBLE)) AS rsv
      FROM bstat
      WHERE nb = bs AND bs * qb - CAST(sb AS HUGEINT) * sb > 0
    ), agg AS (
      SELECT CAST(count_if(bs = 24) AS BIGINT) AS n_blocks_24,
             CAST(count_if(bs = 48) AS BIGINT) AS n_blocks_48,
             AVG(CASE WHEN bs = 24 THEN rsv END) AS rs24,
             AVG(CASE WHEN bs = 48 THEN rsv END) AS rs48
      FROM rs
    )
    SELECT n_blocks_24, n_blocks_48,
           ROUND(rs24, 6) AS rs_mean_24,
           ROUND(rs48, 6) AS rs_mean_48,
           ROUND((ln(rs48) - ln(rs24)) / (ln(48.0) - ln(24.0)), 6)
             AS hurst_exponent
    FROM agg
    """,
)
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    idx = hourly.select(
        "c", F.row_number().over(Window.orderBy("h")).alias("t")
    )
    sizes = spark.range(2).select(
        F.when(F.col("id") == 0, 24).otherwise(48).alias("bs")
    )
    blk = idx.crossJoin(F.broadcast(sizes)).select(
        "bs",
        F.expr("(t - 1) div bs").alias("bid"),
        "c",
        "t",
    )
    wp = Window.partitionBy("bs", "bid").orderBy("t")
    wall = Window.partitionBy("bs", "bid")
    wb = blk.select(
        "bs",
        "bid",
        "c",
        F.sum("c").over(
            wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.row_number().over(wp).alias("pos"),
        F.sum("c").over(wall).alias("sb"),
    )
    scaled = F.col("bs") * F.col("cum") - F.col("pos") * F.col("sb")
    bstat = wb.groupBy("bs", "bid").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.max("sb").cast("bigint").alias("sb"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("qb"),
        F.max(scaled).cast("bigint").alias("ymax"),
        F.min(scaled).cast("bigint").alias("ymin"),
    )
    var_scaled = (
        F.col("bs") * F.col("qb")
        - F.col("sb").cast("decimal(38,0)") * F.col("sb")
    )
    rs = bstat.filter(
        (F.col("nb") == F.col("bs")) & (var_scaled > 0)
    ).select(
        "bs",
        ((F.col("ymax") - F.col("ymin")) / F.sqrt(var_scaled.cast("double"))).alias(
            "rsv"
        ),
    )
    agg = rs.agg(
        F.sum(F.when(F.col("bs") == 24, 1).otherwise(0))
        .cast("bigint")
        .alias("n_blocks_24"),
        F.sum(F.when(F.col("bs") == 48, 1).otherwise(0))
        .cast("bigint")
        .alias("n_blocks_48"),
        F.avg(F.when(F.col("bs") == 24, F.col("rsv"))).alias("rs24"),
        F.avg(F.when(F.col("bs") == 48, F.col("rsv"))).alias("rs48"),
    )
    return agg.select(
        "n_blocks_24",
        "n_blocks_48",
        F.round("rs24", 6).alias("rs_mean_24"),
        F.round("rs48", 6).alias("rs_mean_48"),
        F.round(
            (F.log("rs48") - F.log("rs24"))
            / (F.log(F.lit(48.0)) - F.log(F.lit(24.0))),
            6,
        ).alias("hurst_exponent"),
    )


# --------------------------------------------------------------------------
# Levene's variance-homogeneity test (mean-centered) across the five
# market segments' order values — the gate before trusting ANOVA's
# equal-variance assumption (anova_weekday_revenue). The absolute
# deviation |x - mean_i| is kept EXACT by scaling per group:
# |n_i*x - S_i| is an integer, so T_i = sum|.| and U_i = sum(.)^2 are
# exact HUGEINT/DECIMAL(38,0) sums; the 1/n_i scale factors cancel in
# the F-ratio only partially and are applied in double afterwards with
# the same expression tree. Two scans of the fact (stats, then
# deviations vs broadcast stats) — the standard two-pass pattern.
# --------------------------------------------------------------------------
@operator(
    "levene_mean_abs_segments",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), gs AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(cents) AS BIGINT) AS s_i
      FROM j GROUP BY 1
    ), devs AS (
      SELECT j.seg, CAST(MAX(gs.n_i) AS BIGINT) AS n_i,
             CAST(SUM(ABS(CAST(gs.n_i AS HUGEINT) * j.cents - gs.s_i))
                  AS DOUBLE) AS t_i,
             CAST(SUM((CAST(gs.n_i AS HUGEINT) * j.cents - gs.s_i)
                      * (CAST(gs.n_i AS HUGEINT) * j.cents - gs.s_i))
                  AS DOUBLE) AS u_i
      FROM j JOIN gs ON j.seg = gs.seg
      GROUP BY 1
    ), fin AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS k_groups,
             SUM(t_i / (CAST(n_i AS DOUBLE) * n_i) * n_i) AS sum_nz,
             SUM((u_i - t_i * t_i / n_i)
                 / (CAST(n_i AS DOUBLE) * n_i)) AS within_ss
      FROM devs
    ), betw AS (
      SELECT SUM(n_i * (t_i / (CAST(n_i AS DOUBLE) * n_i)
                        - fin.sum_nz / fin.n_total)
                     * (t_i / (CAST(n_i AS DOUBLE) * n_i)
                        - fin.sum_nz / fin.n_total)) AS between_ss,
             MAX(fin.n_total) AS n_total,
             MAX(fin.k_groups) AS k_groups,
             MAX(fin.within_ss) AS within_ss
      FROM devs CROSS JOIN fin
    )
    SELECT n_total, k_groups,
           ROUND((n_total - k_groups) * between_ss
                 / ((k_groups - 1) * within_ss), 6) AS levene_w
    FROM betw
    """,
)
def levene_mean_abs_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    gs = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("cents").cast("bigint").alias("s_i"),
    )
    dev = F.col("n_i").cast("decimal(38,0)") * F.col("cents") - F.col("s_i")
    devs = (
        j.join(F.broadcast(gs), "seg")
        .groupBy("seg")
        .agg(
            F.max("n_i").cast("bigint").alias("n_i"),
            F.sum(F.abs(dev)).cast("double").alias("t_i"),
            F.sum(dev * dev).cast("double").alias("u_i"),
        )
    )
    nd = F.col("n_i").cast("double") * F.col("n_i")
    fin = devs.agg(
        F.sum("n_i").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum(F.col("t_i") / nd * F.col("n_i")).alias("sum_nz"),
        F.sum(
            (F.col("u_i") - F.col("t_i") * F.col("t_i") / F.col("n_i")) / nd
        ).alias("within_ss"),
    )
    zbar_i = F.col("t_i") / nd
    zbar = F.col("sum_nz") / F.col("n_total")
    betw = devs.crossJoin(F.broadcast(fin)).agg(
        F.sum(F.col("n_i") * (zbar_i - zbar) * (zbar_i - zbar)).alias(
            "between_ss"
        ),
        F.max("n_total").alias("n_total"),
        F.max("k_groups").alias("k_groups"),
        F.max("within_ss").alias("within_ss"),
    )
    return betw.select(
        "n_total",
        "k_groups",
        F.round(
            (F.col("n_total") - F.col("k_groups")) * F.col("between_ss")
            / ((F.col("k_groups") - 1) * F.col("within_ss")),
            6,
        ).alias("levene_w"),
    )


# --------------------------------------------------------------------------
# Randomization test for the click-vs-view mean-value gap: 64
# replicates reassign each event's group by a DETERMINISTIC integer
# hash of (event_id, rep) — identical arithmetic in both engines, no
# RNG — and the p-value is the fraction of replicates at least as
# extreme as the observed gap ((1+extreme)/(1+R), the add-one rule).
# Per-replicate sums are exact cents integers; the 64x row expansion
# happens map-side (explode before any shuffle) and collapses to 128
# partial-aggregate rows, so at 100 TB the cost is one scan with a
# 64x in-task fan-out, never a 64x shuffle. event_id*1103515245 stays
# under 2^63 for event_id < 8.3e9 (fixture max ~1e7 at sf1).
# --------------------------------------------------------------------------
@operator(
    "permutation_test_event_value",
    oracle="""
    WITH base AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ), obs AS (
      SELECT CAST(count_if(event_type = 'click') AS BIGINT) AS n_a,
             CAST(count_if(event_type = 'view') AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS s_b
      FROM base
    ), reps AS (
      SELECT r,
             CAST(count_if(g = 0) AS BIGINT) AS n_a,
             CAST(count_if(g = 1) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN g = 0 THEN cents END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN g = 1 THEN cents END) AS BIGINT) AS s_b
      FROM (
        SELECT cents, r,
               ((event_id * 1103515245 + r * 12345 + 12345)
                % 2147483647) % 2 AS g
        FROM base CROSS JOIN (SELECT UNNEST(range(64)) AS r)
      ) GROUP BY 1
    ), od AS (
      SELECT CAST(n_a + n_b AS BIGINT) AS n_events,
             CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS d
      FROM obs
    ), diffs AS (
      SELECT ABS(CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) AS adiff
      FROM reps WHERE n_a > 0 AND n_b > 0
    )
    SELECT od.n_events,
           ROUND(od.d, 6) AS obs_diff_cents,
           CAST(64 AS BIGINT) AS n_reps,
           CAST(count_if(adiff >= ABS(od.d)) AS BIGINT) AS n_extreme,
           ROUND((1.0 + count_if(adiff >= ABS(od.d))) / 65.0, 6) AS p_value
    FROM diffs CROSS JOIN od
    GROUP BY od.n_events, od.d
    """,
)
def permutation_test_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_type",
    )
    obs = base.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("event_type") == "click", F.col("cents")))
        .cast("bigint")
        .alias("s_a"),
        F.sum(F.when(F.col("event_type") == "view", F.col("cents")))
        .cast("bigint")
        .alias("s_b"),
    )
    expanded = base.select(
        "cents",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("r"),
    ).select(
        "cents",
        "r",
        (
            (
                (F.col("event_id") * 1103515245 + F.col("r") * 12345 + 12345)
                % 2147483647
            )
            % 2
        ).alias("g"),
    )
    reps = expanded.groupBy("r").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("g") == 0, F.col("cents"))).cast("bigint").alias("s_a"),
        F.sum(F.when(F.col("g") == 1, F.col("cents"))).cast("bigint").alias("s_b"),
    )
    d_expr = F.col("s_a").cast("double") / F.col("n_a") - F.col(
        "s_b"
    ).cast("double") / F.col("n_b")
    od = obs.select(
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n_events"),
        d_expr.alias("d"),
    )
    diffs = (
        reps.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(F.abs(d_expr).alias("adiff"))
    )
    return (
        diffs.crossJoin(F.broadcast(od))
        .groupBy("n_events", "d")
        .agg(
            F.sum(F.when(F.col("adiff") >= F.abs(F.col("d")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            "n_events",
            F.round("d", 6).alias("obs_diff_cents"),
            F.lit(64).cast("bigint").alias("n_reps"),
            "n_extreme",
            F.round((F.lit(1.0) + F.col("n_extreme")) / F.lit(65.0), 6).alias(
                "p_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# Simpson's-paradox scan (round-8 slate): per-stratum regression slope
# vs the pooled slope, with an EXACT sign-reversal flag. Aggregation
# reversal is the classic trap of a platform that publishes only
# pooled aggregates (the reference's entire batch surface,
# /root/reference/doc/temp.md:509-530): a relationship can hold in
# every customer segment and invert in the pooled table. The slope
# SIGN is decided on the exact integer numerator n*Sxy - Sx*Sy
# (HUGEINT / DECIMAL(38,0)) — the reversal flag never touches a
# double; only the reported slope magnitudes are (identical-tree)
# doubles rounded at 6.
#
# Scale posture (100 TB): two fact-scale equi-joins (customer side
# broadcast), then ONE partial-agg shuffle to |segments| moment rows;
# the pooled moments are the SUM of the segment moments (map-side
# combinable), joined back by a broadcast of a 1-row table. Nothing
# downstream of the agg exceeds |segments| rows. x is discount scaled
# to integer percent, y integer quantity — power sums stay exact at
# any scale under DECIMAL(38,0)/HUGEINT (bound documented: 1e12 rows
# x max xy 500 = 5e14 per product term, squared terms ~1e29 << 1e38).
# --------------------------------------------------------------------------
@operator(
    "simpsons_paradox_scan",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(l.l_discount * 100) AS BIGINT) AS x,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS y
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ), m AS (
      SELECT seg,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM j GROUP BY seg
    ), p AS (
      SELECT SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy,
             SUM(sxy) AS psxy, SUM(sxx) AS psxx
      FROM m
    )
    SELECT seg,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS seg_slope,
           ROUND(CAST(pn * psxy - psx * psy AS DOUBLE)
                 / CAST(pn * psxx - psx * psx AS DOUBLE), 6) AS pooled_slope,
           CAST(CASE WHEN (n * sxy - sx * sy) * (pn * psxy - psx * psy) < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
    FROM m CROSS JOIN p ORDER BY seg
    """,
)
def simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment vs pooled discount->quantity slope with an exact
    integer sign-reversal flag — the aggregation-reversal audit for
    any published pooled metric."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_quantity")).cast("bigint").alias("y"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_mktsegment").alias("seg"), "x", "y")
    )
    dx = F.col("x").cast("decimal(38,0)")
    m = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dx * F.col("x")).alias("sxx"),
    )
    p = m.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )
    seg_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    seg_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    pool_num = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    pool_den = F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx")
    return (
        m.crossJoin(F.broadcast(p))
        .select(
            "seg",
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(seg_num.cast("double") / seg_den.cast("double"), 6).alias(
                "seg_slope"
            ),
            F.round(pool_num.cast("double") / pool_den.cast("double"), 6).alias(
                "pooled_slope"
            ),
            F.when(seg_num * pool_num < 0, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("sign_flip"),
        )
        .orderBy("seg")
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR (round-8 slate): the missing piece between
# this module's per-test statistics and a platform that fires ALERTS —
# screening 25 per-nation mean-order-value z-tests through a step-up
# multiple-testing correction at FDR q=0.05. Without it, 25 tests at
# alpha=0.05 false-positive ~1.2 nations per run by chance alone.
# p-values come from the Abramowitz-Stegun 7.1.26 erf polynomial
# (max abs error 1.5e-7 — far below the 6-dp report grid), evaluated
# with the IDENTICAL expression tree on both engines: equal moment
# integers -> equal z doubles -> equal p doubles -> equal step-up
# decisions. Moments are exact HUGEINT / DECIMAL(38,0) power sums.
#
# Scale posture (100 TB): one broadcast join to the nation dimension,
# one partial-agg shuffle to 25 moment rows; the BH step-up is two
# windows over 25 rows. The fact table is touched exactly once.
# --------------------------------------------------------------------------
_BH_Q = 0.05
# A&S 7.1.26 erf constants
_ERF = ("0.254829592", "-0.284496736", "1.421413741",
        "-1.453152027", "1.061405429", "0.3275911")


def _register_benjamini_hochberg() -> None:
    a1, a2, a3, a4, a5, pc = _ERF
    # p_two_sided = 1 - erf(|z|/sqrt(2)); erf(x) = 1 - poly(t)*exp(-x*x),
    # t = 1/(1 + p*x)  ==>  p_two_sided = poly(t)*exp(-x*x)
    # t powers as explicit multiply chains (CONTRIBUTING.md: no pow()
    # on values that feed comparisons); tv = 1/(1 + p*|z|/sqrt(2))
    tv = f"(1.0 / (1.0 + {pc} * (ABS(z) / sqrt(2.0))))"
    sql_p = f"""(
      ({a1} * {tv}
       + {a2} * ({tv} * {tv})
       + {a3} * ({tv} * {tv} * {tv})
       + {a4} * ({tv} * {tv} * {tv} * {tv})
       + {a5} * ({tv} * {tv} * {tv} * {tv} * {tv}))
      * exp(-(ABS(z) / sqrt(2.0)) * (ABS(z) / sqrt(2.0)))
    )"""
    oracle = f"""
    WITH j AS (
      SELECT n.n_name AS nation,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), m AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(cents) AS HUGEINT) AS s1,
             SUM(CAST(cents AS HUGEINT) * cents) AS s2
      FROM j GROUP BY nation
    ), g AS (
      SELECT CAST(SUM(n_i) AS DOUBLE) AS nn,
             CAST(SUM(s1) AS DOUBLE) AS gs1,
             CAST(SUM(s2) AS DOUBLE) AS gs2,
             CAST(COUNT(*) AS BIGINT) AS n_tests
      FROM m
    ), zed AS (
      SELECT nation, n_i, n_tests,
             (CAST(s1 AS DOUBLE) / n_i - gs1 / nn)
             / sqrt(((gs2 - gs1 * (gs1 / nn)) / (nn - 1)) / n_i) AS z
      FROM m CROSS JOIN g
    ), pvals AS (
      SELECT nation, n_i, n_tests, z, ROUND({sql_p}, 6) AS p FROM zed
    ), ranked AS (
      SELECT nation, n_i, n_tests, z, p,
             ROW_NUMBER() OVER (ORDER BY p, nation) AS rnk
      FROM pvals
    ), stepped AS (
      SELECT nation, n_i, z, p, rnk,
             MAX(CASE WHEN p <= rnk * {_BH_Q} / n_tests
                      THEN rnk ELSE 0 END) OVER () AS k_max
      FROM ranked
    )
    SELECT nation,
           CAST(n_i AS BIGINT) AS n_orders,
           ROUND(z, 6) AS z_score,
           p AS p_two_sided,
           CAST(rnk AS BIGINT) AS p_rank,
           CAST(CASE WHEN rnk <= k_max THEN 1 ELSE 0 END AS BIGINT)
             AS rejected
    FROM stepped ORDER BY p_rank
    """

    @operator("benjamini_hochberg_fdr", oracle=oracle)
    def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        j = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select(
                F.col("n_name").alias("nation"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            )
        )
        dec = F.col("cents").cast("decimal(38,0)")
        m = j.groupBy("nation").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("cents").cast("decimal(38,0)").alias("s1"),
            F.sum(dec * F.col("cents")).alias("s2"),
        )
        g = m.agg(
            F.sum("n_i").cast("double").alias("nn"),
            F.sum("s1").cast("double").alias("gs1"),
            F.sum("s2").cast("double").alias("gs2"),
            F.count(F.lit(1)).cast("bigint").alias("n_tests"),
        )
        zed = m.crossJoin(F.broadcast(g)).select(
            "nation",
            "n_i",
            "n_tests",
            (
                (F.col("s1").cast("double") / F.col("n_i") - F.col("gs1") / F.col("nn"))
                / F.sqrt(
                    (
                        (F.col("gs2") - F.col("gs1") * (F.col("gs1") / F.col("nn")))
                        / (F.col("nn") - 1)
                    )
                    / F.col("n_i")
                )
            ).alias("z"),
        )
        x = F.abs(F.col("z")) / F.sqrt(F.lit(2.0))
        t = 1.0 / (1.0 + float(pc) * x)
        poly = (
            float(a1) * t
            + float(a2) * (t * t)
            + float(a3) * (t * t * t)
            + float(a4) * (t * t * t * t)
            + float(a5) * (t * t * t * t * t)
        )
        pvals = zed.select(
            "nation",
            "n_i",
            "n_tests",
            "z",
            F.round(poly * F.exp(-x * x), 6).alias("p"),
        )
        w_rank = Window.orderBy("p", "nation")
        ranked = pvals.withColumn("rnk", F.row_number().over(w_rank))
        w_all = Window.partitionBy()
        stepped = ranked.withColumn(
            "k_max",
            F.max(
                F.when(
                    F.col("p") <= F.col("rnk") * _BH_Q / F.col("n_tests"),
                    F.col("rnk"),
                ).otherwise(0)
            ).over(w_all),
        )
        return stepped.select(
            "nation",
            F.col("n_i").cast("bigint").alias("n_orders"),
            F.round("z", 6).alias("z_score"),
            F.col("p").alias("p_two_sided"),
            F.col("rnk").cast("bigint").alias("p_rank"),
            F.when(F.col("rnk") <= F.col("k_max"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("rejected"),
        ).orderBy("p_rank")


_register_benjamini_hochberg()


# --------------------------------------------------------------------------
# CUPED variance reduction (round-8 slate): the experimentation-
# platform workhorse — adjust each user's post-period metric Y by
# theta * X where X is the user's PRE-period value (a covariate the
# treatment cannot have affected), shrinking metric variance by
# rho^2(X,Y) and making every A/B test correspondingly more sensitive.
# Complements ab_test_conversion_ztest (rates) and welch_ttest
# (raw means): this is the adjusted-means readout. theta, rho^2, and
# both arm contrasts are derived from ONE pass of exact HUGEINT /
# DECIMAL(38,0) power sums over the per-user table; every double is
# an identical expression tree on both engines.
#
# Scale posture (100 TB): one partial-agg shuffle to per-user (x, y)
# cents — the only fact-scale exchange; the moment reduction is
# map-side combinable to a single row. Arms are a deterministic
# parity of user_id (reproducible, engine-portable); at production
# scale the arm column comes from the assignment service instead and
# NOTHING else in the plan changes.
# --------------------------------------------------------------------------
_CUPED_CUT = "2024-01-16 00:00:00"


@operator(
    "cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS y,
             CAST(user_id % 2 AS BIGINT) AS arm
      FROM events GROUP BY user_id
    ), m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             CAST(count_if(arm = 0) AS BIGINT) AS n_a,
             CAST(count_if(arm = 1) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS sx_a,
             CAST(SUM(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS sy_a,
             CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS sx_b,
             CAST(SUM(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS sy_b
      FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           n_a, n_b,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
           ROUND(100.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
                          * CAST(n * sxy - sx * sy AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS var_reduction_pct,
           ROUND(CAST(sy_a AS DOUBLE) / n_a
                 - CAST(sy_b AS DOUBLE) / n_b, 6) AS diff_raw_cents,
           ROUND((CAST(sy_a AS DOUBLE) / n_a
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * (CAST(sx_a AS DOUBLE) / n_a))
                 - (CAST(sy_b AS DOUBLE) / n_b
                    - (CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE))
                      * (CAST(sx_b AS DOUBLE) / n_b)), 6)
             AS diff_cuped_cents
    FROM m
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
        .cast("bigint")
        .alias("y"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    is_a = F.col("arm") == 0
    is_b = F.col("arm") == 1
    m = per_user.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dx * F.col("y")).alias("sxy"),
        F.sum(dy * F.col("y")).alias("syy"),
        F.count(F.when(is_a, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(is_b, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, F.col("x"))).cast("bigint").alias("sx_a"),
        F.sum(F.when(is_a, F.col("y"))).cast("bigint").alias("sy_a"),
        F.sum(F.when(is_b, F.col("x"))).cast("bigint").alias("sx_b"),
        F.sum(F.when(is_b, F.col("y"))).cast("bigint").alias("sy_b"),
    )
    cov_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_num = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = cov_num / varx_num
    mean = lambda s, nn: F.col(s).cast("double") / F.col(nn)  # noqa: E731
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(100.0 * (cov_num * cov_num) / (varx_num * vary_num), 6).alias(
            "var_reduction_pct"
        ),
        F.round(mean("sy_a", "n_a") - mean("sy_b", "n_b"), 6).alias(
            "diff_raw_cents"
        ),
        F.round(
            (mean("sy_a", "n_a") - theta * mean("sx_a", "n_a"))
            - (mean("sy_b", "n_b") - theta * mean("sx_b", "n_b")),
            6,
        ).alias("diff_cuped_cents"),
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: does the fulfilled-rate move
# monotonically with order priority (dose scores 1..5 from the
# priority prefix digit)? One joinless conditional-aggregate pass
# producing five exact integer sums (N, successes R, score moments
# B = sum(s*n_i), C = sum(s^2*n_i), SR = sum(s*r_i)); the z statistic
# is assembled from them with a pinned expression tree. The dose-
# response sharpening of chi2_region_segment's unordered test.
# --------------------------------------------------------------------------
@operator(
    "cochran_armitage_trend",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT)                                   AS n,
             CAST(count_if(o_orderstatus = 'F') AS BIGINT)              AS r,
             CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
                  AS BIGINT)                                            AS b_sum,
             CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                      * CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
                  AS BIGINT)                                            AS c_sum,
             CAST(SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                      ELSE 0 END) AS BIGINT)                            AS sr_sum
      FROM orders
    )
    SELECT n, r, b_sum, c_sum, sr_sum,
           ROUND(CAST(r AS DOUBLE) / n, 6) AS success_rate,
           ROUND(
             (CAST(n * sr_sum - r * b_sum AS DOUBLE) / n)
             / sqrt((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
                    * (c_sum - CAST(b_sum AS DOUBLE) * b_sum / n)), 6)
             AS z_trend
    FROM m
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    s = F.substring("o_orderpriority", 1, 1).cast("bigint")
    succ = F.col("o_orderstatus") == "F"
    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(succ, 1)).cast("bigint").alias("r"),
        F.sum(s).cast("bigint").alias("b_sum"),
        F.sum(s * s).cast("bigint").alias("c_sum"),
        F.sum(F.when(succ, s).otherwise(F.lit(0))).cast("bigint").alias("sr_sum"),
    )
    n, r = F.col("n"), F.col("r")
    b, c, sr = F.col("b_sum"), F.col("c_sum"), F.col("sr_sum")
    p = r.cast("double") / n
    num = (n * sr - r * b).cast("double") / n
    return m.select(
        "n", "r", "b_sum", "c_sum", "sr_sum",
        F.round(p, 6).alias("success_rate"),
        F.round(
            num / F.sqrt(p * (F.lit(1.0) - p) * (c - b.cast("double") * b / n)), 6
        ).alias("z_trend"),
    )


# --------------------------------------------------------------------------
# Effect sizes between two market segments' order values: Cliff's
# delta from EXACT dominance-pair counts (per-distinct-value counts +
# one cumulative window over the sorted cents DOMAIN — the same
# histogram-rank trick as mannwhitney_u_segments, so no fact-table
# sort and no pair expansion) plus Cohen's d from HUGEINT power sums.
# gt/lt/tie pair counts are order-free integers, so the delta is
# engine-exact before the single final division.
# --------------------------------------------------------------------------
@operator(
    "cliffs_delta_segments",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), v AS (
      SELECT cents,
             CAST(count_if(seg = '{_SEG_A}') AS BIGINT) AS c_a,
             CAST(count_if(seg = '{_SEG_B}') AS BIGINT) AS c_b
      FROM j GROUP BY cents
    ), r AS (
      SELECT cents, c_a, c_b,
             COALESCE(SUM(c_b) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_before,
             SUM(c_b) OVER () AS nb_tot
      FROM v
    ), m AS (
      SELECT CAST(SUM(c_a) AS BIGINT)                             AS n_a,
             CAST(MAX(nb_tot) AS BIGINT)                          AS n_b,
             CAST(SUM(c_a * cb_before) AS BIGINT)                 AS gt_pairs,
             CAST(SUM(c_a * (nb_tot - cb_before - c_b)) AS BIGINT) AS lt_pairs,
             CAST(SUM(c_a * c_b) AS BIGINT)                       AS tie_pairs,
             CAST(SUM(c_a * cents) AS DOUBLE)                     AS s1_a,
             CAST(SUM(c_b * cents) AS DOUBLE)                     AS s1_b,
             CAST(SUM(c_a * (CAST(cents AS HUGEINT) * cents)) AS DOUBLE) AS s2_a,
             CAST(SUM(c_b * (CAST(cents AS HUGEINT) * cents)) AS DOUBLE) AS s2_b
      FROM r
    )
    SELECT n_a, n_b, gt_pairs, lt_pairs, tie_pairs,
           ROUND(CAST(gt_pairs - lt_pairs AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * n_b), 6)                AS cliffs_delta,
           ROUND((s1_a / n_a - s1_b / n_b)
                 / sqrt(((s2_a - s1_a * (s1_a / n_a))
                         + (s2_b - s1_b * (s1_b / n_b)))
                        / (n_a + n_b - 2)), 6)                    AS cohens_d
    FROM m
    """,
)
def cliffs_delta_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    )
    v = j.groupBy("cents").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).cast("bigint").alias("c_a"),
        F.count(F.when(F.col("seg") == _SEG_B, 1)).cast("bigint").alias("c_b"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = v.select(
        "cents", "c_a", "c_b",
        F.coalesce(F.sum("c_b").over(w), F.lit(0)).alias("cb_before"),
        F.sum("c_b").over(Window.partitionBy()).alias("nb_tot"),
    )
    hug = F.col("cents").cast("decimal(38,0)") * F.col("cents")
    m = r.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.max("nb_tot").cast("bigint").alias("n_b"),
        F.sum(F.col("c_a") * F.col("cb_before")).cast("bigint").alias("gt_pairs"),
        F.sum(F.col("c_a") * (F.col("nb_tot") - F.col("cb_before") - F.col("c_b")))
        .cast("bigint").alias("lt_pairs"),
        F.sum(F.col("c_a") * F.col("c_b")).cast("bigint").alias("tie_pairs"),
        F.sum(F.col("c_a") * F.col("cents")).cast("double").alias("s1_a"),
        F.sum(F.col("c_b") * F.col("cents")).cast("double").alias("s1_b"),
        F.sum(F.col("c_a") * hug).cast("double").alias("s2_a"),
        F.sum(F.col("c_b") * hug).cast("double").alias("s2_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s1_a, s1_b, s2_a, s2_b = (F.col(x) for x in ("s1_a", "s1_b", "s2_a", "s2_b"))
    return m.select(
        "n_a", "n_b", "gt_pairs", "lt_pairs", "tie_pairs",
        F.round(
            (F.col("gt_pairs") - F.col("lt_pairs")).cast("double")
            / (n_a.cast("double") * n_b), 6
        ).alias("cliffs_delta"),
        F.round(
            (s1_a / n_a - s1_b / n_b)
            / F.sqrt(
                ((s2_a - s1_a * (s1_a / n_a)) + (s2_b - s1_b * (s1_b / n_b)))
                / (n_a + n_b - 2)
            ), 6
        ).alias("cohens_d"),
    )


# --------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) distance between the two segments'
# order-value distributions: W1 = integral |F_a - F_b| dx over the
# cents domain, computed as SUM(|cumA*n_b - cumB*n_a| * gap) on exact
# integers (DECIMAL(38,0)/HUGEINT accumulator — the cross term reaches
# n_a*n_b*range), divided once at the end. Same domain-histogram shape
# as mannwhitney/cliffs: the window runs over per-distinct-value
# counts (domain-sized, SF-invariant), never over the fact table.
# Complements ks_order_value_segments (sup-norm) with the integral
# metric the drift monitors actually want.
# --------------------------------------------------------------------------
@operator(
    "wasserstein_1d_segments",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, {_CENTS} AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
    ), v AS (
      SELECT cents,
             CAST(count_if(seg = '{_SEG_A}') AS BIGINT) AS c_a,
             CAST(count_if(seg = '{_SEG_B}') AS BIGINT) AS c_b
      FROM j GROUP BY cents
    ), r AS (
      SELECT cents,
             SUM(c_a) OVER (ORDER BY cents) AS cum_a,
             SUM(c_b) OVER (ORDER BY cents) AS cum_b,
             SUM(c_a) OVER ()               AS na_tot,
             SUM(c_b) OVER ()               AS nb_tot,
             COALESCE(LEAD(cents) OVER (ORDER BY cents) - cents, 0) AS gap
      FROM v
    ), m AS (
      SELECT CAST(MAX(na_tot) AS BIGINT) AS n_a,
             CAST(MAX(nb_tot) AS BIGINT) AS n_b,
             CAST(COUNT(*) AS BIGINT)    AS n_values,
             CAST(SUM(ABS(cum_a * nb_tot - cum_b * na_tot)
                      * CAST(gap AS HUGEINT)) AS DOUBLE) AS s
      FROM r
    )
    SELECT n_a, n_b, n_values,
           ROUND(s / (CAST(n_a AS DOUBLE) * n_b), 6) AS w1_cents
    FROM m
    """,
)
def wasserstein_1d_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    j = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(F.col("c_mktsegment").alias("seg"), cents.alias("cents"))
    )
    v = j.groupBy("cents").agg(
        F.count(F.when(F.col("seg") == _SEG_A, 1)).cast("bigint").alias("c_a"),
        F.count(F.when(F.col("seg") == _SEG_B, 1)).cast("bigint").alias("c_b"),
    )
    wc = Window.orderBy("cents")
    wall = Window.partitionBy()
    r = v.select(
        "cents",
        F.sum("c_a").over(wc).alias("cum_a"),
        F.sum("c_b").over(wc).alias("cum_b"),
        F.sum("c_a").over(wall).alias("na_tot"),
        F.sum("c_b").over(wall).alias("nb_tot"),
        F.coalesce(F.lead("cents").over(wc) - F.col("cents"), F.lit(0))
        .alias("gap"),
    )
    contrib = (
        F.abs(F.col("cum_a") * F.col("nb_tot") - F.col("cum_b") * F.col("na_tot"))
        .cast("decimal(38,0)")
        * F.col("gap")
    )
    m = r.agg(
        F.max("na_tot").cast("bigint").alias("n_a"),
        F.max("nb_tot").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(contrib).cast("double").alias("s"),
    )
    return m.select(
        "n_a", "n_b", "n_values",
        F.round(F.col("s") / (F.col("n_a").cast("double") * F.col("n_b")), 6)
        .alias("w1_cents"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap CI for the mean order value — THE scalable
# bootstrap: instead of resampling rows (impossible to coordinate
# across a 1000-executor scan), every row independently draws a
# Poisson(1) replication weight per resample b from a deterministic
# 60-bit md5 stream (the engine-portable hash idiom of
# hash_split_assignment). One explode x32 + one keyed aggregation:
# map-side combine reduces each partition to 32 partial rows, so the
# shuffle is O(32 x partitions) regardless of fact volume. Inverse-CDF
# thresholds are precomputed INTEGER literals — exactly
# floor(CDF_Poisson(1)(k) * 2^60), k = 0..7, evaluated in 60-digit
# decimal arithmetic (e from its Taylor series; reproduction pinned in
# tests/test_round8_staged.py::test_poisson_thresholds_exact) — so
# weight assignment is pure integer comparison — no floats until the
# per-resample means, which are snapped to a 1e-6 grid (BIGINT) before
# the across-resample se/quantile algebra (order-free, engine-exact).
# --------------------------------------------------------------------------
_POIS_T = [
    424136118829305329, 848272237658610659, 1060340297073263324,
    1131029650211480879, 1148701988496035267, 1152236456152946145,
    1152825534095764625, 1152909688087595836,
]


@operator(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH rep AS (
      SELECT {_CENTS} AS cents, b.b,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                 || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM orders CROSS JOIN (SELECT UNNEST(range(32)) AS b) b
    ), g AS (
      SELECT b,
             CAST(SUM(w) AS BIGINT)         AS sw,
             CAST(SUM(w * cents) AS BIGINT) AS swc
      FROM (
        SELECT cents, b,
               CASE WHEN h < {_POIS_T[0]} THEN 0
                    WHEN h < {_POIS_T[1]} THEN 1
                    WHEN h < {_POIS_T[2]} THEN 2
                    WHEN h < {_POIS_T[3]} THEN 3
                    WHEN h < {_POIS_T[4]} THEN 4
                    WHEN h < {_POIS_T[5]} THEN 5
                    WHEN h < {_POIS_T[6]} THEN 6
                    WHEN h < {_POIS_T[7]} THEN 7
                    ELSE 8 END AS w
        FROM rep
      ) GROUP BY b
    ), bm AS (
      SELECT b, CAST(ROUND(CAST(swc AS DOUBLE) / sw * 1000000.0) AS BIGINT) AS m
      FROM g
    ), ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM bm
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_boot,
             CAST(SUM(m) AS DOUBLE)   AS sm,
             CAST(SUM(CAST(m AS HUGEINT) * m) AS DOUBLE) AS sm2
      FROM bm
    ), pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM({_CENTS}) AS DOUBLE) AS sc
      FROM orders
    )
    SELECT pt.n_rows, stats.n_boot,
           ROUND(pt.sc / pt.n_rows, 6)                          AS point_mean_cents,
           ROUND(stats.sm / stats.n_boot / 1000000.0, 6)        AS boot_mean_cents,
           ROUND(sqrt((stats.n_boot * stats.sm2 - stats.sm * stats.sm)
                      / (CAST(stats.n_boot AS DOUBLE) * (stats.n_boot - 1)))
                 / 1000000.0, 6)                                AS boot_se_cents,
           ROUND(CAST(lo.m AS DOUBLE) / 1000000.0, 6)           AS ci05_cents,
           ROUND(CAST(hi.m AS DOUBLE) / 1000000.0, 6)           AS ci95_cents
    FROM pt CROSS JOIN stats
    CROSS JOIN (SELECT m FROM ranked WHERE rn = 2)  lo
    CROSS JOIN (SELECT m FROM ranked WHERE rn = 31) hi
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rep = o.select(
        cents.alias("cents"),
        F.col("o_orderkey"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.when(h < _POIS_T[0], 0)
    for k in range(1, 8):
        w = w.when(h < _POIS_T[k], k)
    w = w.otherwise(8)
    g = rep.select("b", "cents", w.alias("w")).groupBy("b").agg(
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("swc"),
    )
    bm = g.select(
        "b",
        F.round(F.col("swc").cast("double") / F.col("sw") * 1000000.0)
        .cast("bigint")
        .alias("m"),
    )
    ranked = bm.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rn")
    )
    stats = bm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boot"),
        F.sum("m").cast("double").alias("sm"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m"))
        .cast("double")
        .alias("sm2"),
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(cents).cast("double").alias("sc"),
    )
    lo = ranked.filter(F.col("rn") == 2).select(F.col("m").alias("m_lo"))
    hi = ranked.filter(F.col("rn") == 31).select(F.col("m").alias("m_hi"))
    out = pt.crossJoin(stats).crossJoin(lo).crossJoin(hi)
    sm, sm2, nb = F.col("sm"), F.col("sm2"), F.col("n_boot")
    return out.select(
        "n_rows", "n_boot",
        F.round(F.col("sc") / F.col("n_rows"), 6).alias("point_mean_cents"),
        F.round(sm / nb / 1000000.0, 6).alias("boot_mean_cents"),
        F.round(
            F.sqrt((nb * sm2 - sm * sm) / (nb.cast("double") * (nb - 1)))
            / 1000000.0, 6
        ).alias("boot_se_cents"),
        F.round(F.col("m_lo").cast("double") / 1000000.0, 6).alias("ci05_cents"),
        F.round(F.col("m_hi").cast("double") / 1000000.0, 6).alias("ci95_cents"),
    )


# --------------------------------------------------------------------------
# Mann-Kendall trend test on daily revenue: S = sum of pairwise signs
# over the DAY domain (SF-invariant pair expansion over ~2.4k daily
# aggregate rows, exactly like theil_sen_daily_trend, whose slope this
# test supplies the significance for), tie-corrected variance, and the
# continuity-corrected z. S and the tie term are exact integers; the
# only doubles are the final two divisions.
# --------------------------------------------------------------------------
@operator(
    "mann_kendall_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.x > a.x
    ), ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y)
      WHERE t > 1
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
    )
    SELECT n.n_days, s.s_stat,
           ROUND((CAST(n.n_days AS DOUBLE) * (n.n_days - 1) * (2 * n.n_days + 5)
                  - ties.tie_term) / 18.0, 6) AS var_s,
           ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                      ELSE 0 END
                 / sqrt((CAST(n.n_days AS DOUBLE) * (n.n_days - 1)
                         * (2 * n.n_days + 5) - ties.tie_term) / 18.0), 6)
             AS z_mk,
           ROUND(CAST(s.s_stat AS DOUBLE)
                 / (CAST(n.n_days AS DOUBLE) * (n.n_days - 1) / 2.0), 6)
             AS tau_a
    FROM n CROSS JOIN s CROSS JOIN ties
    """,
)
def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("x")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    s = (
        a.join(F.broadcast(b), F.col("xb") > F.col("xa"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("bigint").alias("tie_term")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    out = n.crossJoin(s).crossJoin(ties)
    nd = F.col("n_days")
    var_s = (
        nd.cast("double") * (nd - 1) * (2 * nd + 5) - F.col("tie_term")
    ) / 18.0
    s_ = F.col("s_stat")
    return out.select(
        "n_days", "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(
            F.when(s_ > 0, s_ - 1).when(s_ < 0, s_ + 1).otherwise(0)
            / F.sqrt(var_s), 6
        ).alias("z_mk"),
        F.round(
            s_.cast("double") / (nd.cast("double") * (nd - 1) / 2.0), 6
        ).alias("tau_a"),
    )


# --------------------------------------------------------------------------
# Piecewise-linear (hinge) trend fit of daily revenue: y ~ b0 + b1*x
# + b2*max(0, x - K) with the knot K fixed at day 1200 — the
# two-regime trend model ("did growth bend?") that the single-slope
# OLS (trailing_trend_slope) and the robust slope (theil_sen) cannot
# express. Normal equations solved in closed form by Cramer on 3x3
# determinants; every moment (Sx, Sxx, Sxh, ... Shy) is an exact
# integer over the day domain, and all four determinants use ONE
# generated expression string interpolated into both engines
# (attribution_markov_removal's parity technique). R^2 from the same
# sums. Scale: the moments are one aggregation over the ~2.4k-row
# daily table; the solve is O(1).
# --------------------------------------------------------------------------
_PW_KNOT = 1200


def _pw_exprs() -> dict[str, str]:
    def det3(a11, a12, a13, a21, a22, a23, a31, a32, a33):
        return (
            f"({a11} * ({a22} * {a33} - {a23} * {a32})"
            f" - {a12} * ({a21} * {a33} - {a23} * {a31})"
            f" + {a13} * ({a21} * {a32} - {a22} * {a31}))"
        )

    n, sx, sh = "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sh AS DOUBLE)"
    sxx, sxh, shh = (
        "CAST(sxx AS DOUBLE)", "CAST(sxh AS DOUBLE)", "CAST(shh AS DOUBLE)"
    )
    sy, sxy, shy = (
        "CAST(sy AS DOUBLE)", "CAST(sxy AS DOUBLE)", "CAST(shy AS DOUBLE)"
    )
    d = det3(n, sx, sh, sx, sxx, sxh, sh, sxh, shh)
    d0 = det3(sy, sx, sh, sxy, sxx, sxh, shy, sxh, shh)
    d1 = det3(n, sy, sh, sx, sxy, sxh, sh, shy, shh)
    d2 = det3(n, sx, sy, sx, sxx, sxy, sh, sxh, shy)
    b0, b1, b2 = f"({d0} / {d})", f"({d1} / {d})", f"({d2} / {d})"
    sse = (
        f"(CAST(syy AS DOUBLE) - ({b0} * {sy} + {b1} * {sxy} + {b2} * {shy}))"
    )
    sst = f"(CAST(syy AS DOUBLE) - {sy} * ({sy} / {n}))"
    return {
        "b0": b0, "b1": b1, "b2": b2,
        "r2": f"(1.0 - {sse} / {sst})",
    }


def _register_piecewise_trend_fit() -> None:
    x = _pw_exprs()
    oracle = f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ), f AS (
      SELECT d AS xd, GREATEST(0, d - {_PW_KNOT}) AS h, y FROM daily
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT)        AS n,
             CAST(SUM(xd) AS BIGINT)         AS sx,
             CAST(SUM(h) AS BIGINT)          AS sh,
             CAST(SUM(xd * xd) AS BIGINT)    AS sxx,
             CAST(SUM(xd * h) AS BIGINT)     AS sxh,
             CAST(SUM(h * h) AS BIGINT)      AS shh,
             CAST(SUM(y) AS BIGINT)          AS sy,
             CAST(SUM(xd * y) AS BIGINT)     AS sxy,
             CAST(SUM(h * y) AS BIGINT)      AS shy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM f
    )
    SELECT n AS n_days, {_PW_KNOT} AS knot_day,
           ROUND({x['b0']}, 6)             AS intercept_cents,
           ROUND({x['b1']}, 6)             AS slope_before,
           ROUND({x['b2']}, 6)             AS hinge_delta,
           ROUND({x['b1']} + {x['b2']}, 6) AS slope_after,
           ROUND({x['r2']}, 6)             AS r2
    FROM m
    """

    @operator("piecewise_trend_fit", oracle=oracle)
    def piecewise_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
        o = _t(spark, sf_dir, "orders")
        daily = o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("d")
        ).agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y")
        )
        f = daily.select(
            F.col("d").alias("xd"),
            F.greatest(F.lit(0), F.col("d") - _PW_KNOT).alias("h"),
            "y",
        )
        m = f.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("xd").cast("bigint").alias("sx"),
            F.sum("h").cast("bigint").alias("sh"),
            F.sum(F.col("xd") * F.col("xd")).cast("bigint").alias("sxx"),
            F.sum(F.col("xd") * F.col("h")).cast("bigint").alias("sxh"),
            F.sum(F.col("h") * F.col("h")).cast("bigint").alias("shh"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("xd") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("h") * F.col("y")).cast("bigint").alias("shy"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("double").alias("syy"),
        )
        return m.selectExpr(
            "n AS n_days",
            f"{_PW_KNOT} AS knot_day",
            f"ROUND({x['b0']}, 6)             AS intercept_cents",
            f"ROUND({x['b1']}, 6)             AS slope_before",
            f"ROUND({x['b2']}, 6)             AS hinge_delta",
            f"ROUND({x['b1']} + {x['b2']}, 6) AS slope_after",
            f"ROUND({x['r2']}, 6)             AS r2",
        )


_register_piecewise_trend_fit()


# --------------------------------------------------------------------------
# Distribution-free 95% CI for the MEDIAN order value via binomial
# order statistics: ranks floor((n - z*sqrt(n))/2) and
# ceil(1 + (n + z*sqrt(n))/2) bracket the median with >= 95% coverage
# for ANY continuous distribution — no normality, no bootstrap. Rank
# selection runs over the VALUE DOMAIN (per-distinct-value counts +
# one cumulative window — the mannwhitney histogram-rank trick), so
# the fact table is never globally sorted: at 100 TB the domain scan
# replaces an O(N log N) sort with a domain-sized window.
# --------------------------------------------------------------------------
@operator(
    "median_ci_distribution_free",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), r AS (
      SELECT cents,
             SUM(cnt) OVER (ORDER BY cents) AS cum,
             SUM(cnt) OVER ()               AS n
      FROM vals
    ), ranks AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(FLOOR((MAX(n) - 1.959964 * sqrt(CAST(MAX(n) AS DOUBLE)))
                        / 2.0) AS BIGINT)           AS rank_lo,
             CAST(CEIL(1.0 + (MAX(n) + 1.959964
                              * sqrt(CAST(MAX(n) AS DOUBLE))) / 2.0)
                  AS BIGINT)                        AS rank_hi
      FROM r
    )
    SELECT ranks.n AS n_rows,
           ROUND(((SELECT MIN(cents) FROM r WHERE cum >= (ranks.n + 1) // 2)
                  + (SELECT MIN(cents) FROM r WHERE cum >= (ranks.n + 2) // 2))
                 / 2.0 / 100.0, 6)                          AS median_price,
           ROUND((SELECT MIN(cents) FROM r WHERE cum >= ranks.rank_lo)
                 / 100.0, 6)                                AS ci95_lo,
           ROUND((SELECT MIN(cents) FROM r WHERE cum >= ranks.rank_hi)
                 / 100.0, 6)                                AS ci95_hi
    FROM ranks
    """,
)
def median_ci_distribution_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    vals = o.groupBy(cents.alias("cents")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("cents")
    r = vals.select(
        "cents",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    # rank targets (identical double -> identical integer on both sides)
    ranks = r.agg(
        F.floor(
            (F.max("n") - 1.959964 * F.sqrt(F.max("n").cast("double"))) / 2.0
        ).cast("bigint").alias("rank_lo"),
        F.ceil(
            1.0 + (F.max("n") + 1.959964 * F.sqrt(F.max("n").cast("double")))
            / 2.0
        ).cast("bigint").alias("rank_hi"),
    )
    j = r.crossJoin(F.broadcast(ranks))
    out = j.agg(
        F.max(F.col("n")).cast("bigint").alias("n_rows"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("cents")))
        .alias("m1"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"), F.col("cents")))
        .alias("m2"),
        F.min(F.when(F.col("cum") >= F.col("rank_lo"), F.col("cents")))
        .alias("lo"),
        F.min(F.when(F.col("cum") >= F.col("rank_hi"), F.col("cents")))
        .alias("hi"),
    )
    return out.select(
        "n_rows",
        F.round((F.col("m1") + F.col("m2")) / 2.0 / 100.0, 6)
        .alias("median_price"),
        F.round(F.col("lo") / 100.0, 6).alias("ci95_lo"),
        F.round(F.col("hi") / 100.0, 6).alias("ci95_hi"),
    )


# --------------------------------------------------------------------------
# Gumbel (EV-I) fit of the DAILY-MAXIMUM order value by the method of
# moments — the tail-risk question ("what is the 100-day return
# level?") that mean/variance monitoring cannot answer. beta =
# s*sqrt(6)/pi and mu = mean - gamma*beta with sqrt(6)/pi, Euler's
# gamma, and -ln(-ln(0.99)) PRECOMPUTED double literals (no libm
# divergence surface); mean and s come from exact integer power sums
# over the ~2.4k-day domain of per-day MAX (one grouped agg).
# --------------------------------------------------------------------------
@operator(
    "gumbel_daily_max_fit",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT)              AS n,
             CAST(SUM(y) AS BIGINT)                AS s1,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS s2
      FROM daily
    )
    SELECT n AS n_days,
           ROUND(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS mean_daily_max,
           ROUND((CAST(s1 AS DOUBLE) / n
                  - 0.5772156649015329
                    * (sqrt((s2 - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                            / (n - 1)) * 0.779696801233676))
                 / 100.0, 6)                        AS gumbel_mu,
           ROUND(sqrt((s2 - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                      / (n - 1)) * 0.779696801233676 / 100.0, 6)
                                                    AS gumbel_beta,
           ROUND(((CAST(s1 AS DOUBLE) / n
                   - 0.5772156649015329
                     * (sqrt((s2 - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                             / (n - 1)) * 0.779696801233676))
                  + (sqrt((s2 - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                          / (n - 1)) * 0.779696801233676)
                    * 4.600149226776579) / 100.0, 6) AS return_level_100d
    FROM m
    """,
)
def gumbel_daily_max_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s1"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double").alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2")
    mean = s1 / n
    beta = (
        F.sqrt((s2 - s1 * (s1 / n)) / (n - 1)) * 0.779696801233676
    )
    mu = mean - 0.5772156649015329 * beta
    return m.select(
        n.alias("n_days"),
        F.round(mean / 100.0, 6).alias("mean_daily_max"),
        F.round(mu / 100.0, 6).alias("gumbel_mu"),
        F.round(beta / 100.0, 6).alias("gumbel_beta"),
        F.round((mu + beta * 4.600149226776579) / 100.0, 6)
        .alias("return_level_100d"),
    )


# --------------------------------------------------------------------------
# Group-sequential A/B monitoring with O'Brien-Fleming boundaries at
# 4 interim looks: users are hash-assigned to two arms (md5 parity —
# the engine-portable split), a user ENTERS at their first event and
# CONVERTS at their first purchase, and at each weekly cutoff the
# cumulative two-proportion z is compared against the OBF boundary
# (4.049 / 2.863 / 2.337 / 2.024 — precomputed literals for K=4,
# two-sided alpha=0.05). The discipline every experimentation
# platform needs: peeking is fine IF the boundary schedule pays for
# it. One per-user reduction (first_ts, first_purchase_ts, arm),
# then all four looks as conditional aggregates in a single pass
# (stack() unpivot — no per-look scan).
# --------------------------------------------------------------------------
_OBF = {1: 4.049, 2: 2.863, 3: 2.337, 4: 2.024}
_LOOK_CUTS = {1: "2024-01-08", 2: "2024-01-15", 3: "2024-01-22",
              4: "2024-01-29"}


@operator(
    "sequential_ab_obrien_fleming",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2                                        AS arm,
             MIN(ts)                                      AS first_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                                                          AS first_purchase
      FROM events GROUP BY 1
    ), m AS (
      SELECT
        {", ".join(
            f'''CAST(count_if(arm = {a} AND first_ts < TIMESTAMP '{c}')
                 AS BIGINT) AS n{a}_l{k},
            CAST(count_if(arm = {a}
                 AND first_purchase IS NOT NULL
                 AND first_purchase <= first_ts + INTERVAL 6 HOUR
                 AND first_purchase < TIMESTAMP '{c}')
                 AS BIGINT) AS c{a}_l{k}'''
            for k, c in _LOOK_CUTS.items() for a in (0, 1)
        )}
      FROM per_user
    )
    SELECT look, cutoff_day, n_a, n_b, conv_a, conv_b,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN 0.0 ELSE
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) END  AS z_look,
           boundary,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN 0
                WHEN ABS((CAST(conv_a AS DOUBLE) / n_a
                          - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b))) > boundary
                THEN 1 ELSE 0 END                           AS crossed
    FROM (
      {" UNION ALL ".join(
          f'''SELECT {k} AS look, '{c}' AS cutoff_day,
              n0_l{k} AS n_a, n1_l{k} AS n_b,
              c0_l{k} AS conv_a, c1_l{k} AS conv_b,
              CAST({_OBF[k]} AS DOUBLE) AS boundary FROM m'''
          for k, c in _LOOK_CUTS.items()
      )}
    )
    ORDER BY look
    """,
)
def sequential_ab_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("first_purchase"),
    ).select(
        arm.alias("arm"),
        "first_ts",
        F.when(
            F.col("first_purchase")
            <= F.col("first_ts") + F.expr("INTERVAL 6 HOURS"),
            F.col("first_purchase"),
        ).alias("first_conv"),
    )
    aggs = []
    for k, c in _LOOK_CUTS.items():
        for a in (0, 1):
            aggs.append(
                F.count(
                    F.when(
                        (F.col("arm") == a) & (F.col("first_ts") < c), 1
                    )
                ).cast("bigint").alias(f"n{a}_l{k}")
            )
            aggs.append(
                F.count(
                    F.when(
                        (F.col("arm") == a) & (F.col("first_conv") < c), 1
                    )
                ).cast("bigint").alias(f"c{a}_l{k}")
            )
    m = per_user.agg(*aggs)
    stack_items = ", ".join(
        f"{k}, '{c}', n0_l{k}, n1_l{k}, c0_l{k}, c1_l{k}, "
        f"CAST({_OBF[k]} AS DOUBLE)"
        for k, c in _LOOK_CUTS.items()
    )
    looks = m.select(
        F.expr(
            f"stack(4, {stack_items})"
            " AS (look, cutoff_day, n_a, n_b, conv_a, conv_b, boundary)"
        )
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("conv_a").cast("double") / F.col("n_a")
        - F.col("conv_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        p_pool * (F.lit(1.0) - p_pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    return looks.select(
        F.col("look").cast("int").alias("look"),
        "cutoff_day",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.round(z, 6))
        .alias("z_look"),
        "boundary",
        F.when(degenerate, 0)
        .when(F.abs(z) > F.col("boundary"), 1)
        .otherwise(0).cast("int").alias("crossed"),
    ).orderBy("look")


# --------------------------------------------------------------------------
# Ratio-metric A/B readout with DELTA-METHOD variance: the metric is
# revenue per event (a ratio of two per-user sums, so the naive
# binomial/means machinery is WRONG — users, not events, are the
# randomization unit). Per arm: R = sum(x)/sum(y) with
# var(R) ~= (sxx - 2R sxy + R^2 syy) / (n * ybar^2) from per-user
# (x, y) moment sums — all exact cents/count integers (HUGEINT /
# DECIMAL(38,0) cross-moments), one pinned double expression per
# arm, then the two-arm z. The experimentation-platform staple that
# welch (means) and the proportion z-tests cannot replace.
# --------------------------------------------------------------------------
@operator(
    "ratio_metric_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS arm,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT)                                AS y
      FROM events GROUP BY 1
    ), m AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT)            AS n,
             CAST(SUM(x) AS BIGINT)              AS sx,
             CAST(SUM(y) AS BIGINT)              AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM per_user GROUP BY 1
    ), r AS (
      SELECT arm, n, sx, sy,
             CAST(sx AS DOUBLE) / sy AS ratio,
             ((sxx - 2 * (CAST(sx AS DOUBLE) / sy) * sxy
               + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy) * syy)
              / n
              - (CAST(sx AS DOUBLE) / n
                 - (CAST(sx AS DOUBLE) / sy) * (CAST(sy AS DOUBLE) / n))
                * (CAST(sx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / sy) * (CAST(sy AS DOUBLE) / n)))
             / n / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               AS var_r
      FROM m
    )
    SELECT a.n AS n_a, b.n AS n_b,
           ROUND(a.ratio / 100.0, 6) AS ratio_a,
           ROUND(b.ratio / 100.0, 6) AS ratio_b,
           ROUND(sqrt(a.var_r) / 100.0, 6) AS se_a,
           ROUND(sqrt(b.var_r) / 100.0, 6) AS se_b,
           ROUND((a.ratio - b.ratio) / sqrt(a.var_r + b.var_r), 6) AS z_diff
    FROM (SELECT * FROM r WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM r WHERE arm = 1) b
    """,
)
def ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    ).select(arm.alias("arm"), "x", "y")
    hug = lambda a, b: F.col(a).cast("decimal(38,0)") * F.col(b)  # noqa: E731
    m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(hug("x", "x")).cast("double").alias("sxx"),
        F.sum(hug("x", "y")).cast("double").alias("sxy"),
        F.sum(hug("y", "y")).cast("double").alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    ratio = sx / F.col("sy")
    mean_resid = sx / n - ratio * (sy / n)
    var_r = (
        (F.col("sxx") - 2 * ratio * F.col("sxy") + ratio * ratio * F.col("syy"))
        / n
        - mean_resid * mean_resid
    ) / n / ((sy / n) * (sy / n))
    r = m.select("arm", "n", ratio.alias("ratio"), var_r.alias("var_r"))
    a = r.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("ratio").alias("ratio_a0"),
        F.col("var_r").alias("var_a"),
    )
    b = r.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("ratio").alias("ratio_b0"),
        F.col("var_r").alias("var_b"),
    )
    out = a.crossJoin(b)
    return out.select(
        "n_a", "n_b",
        F.round(F.col("ratio_a0") / 100.0, 6).alias("ratio_a"),
        F.round(F.col("ratio_b0") / 100.0, 6).alias("ratio_b"),
        F.round(F.sqrt("var_a") / 100.0, 6).alias("se_a"),
        F.round(F.sqrt("var_b") / 100.0, 6).alias("se_b"),
        F.round(
            (F.col("ratio_a0") - F.col("ratio_b0"))
            / F.sqrt(F.col("var_a") + F.col("var_b")), 6
        ).alias("z_diff"),
    )


# --------------------------------------------------------------------------
# Raking / iterative proportional fitting (2 full cycles): weight the
# RESPONDENT subpopulation (customers with positive balance) so its
# nation and segment margins match the FULL population — the
# post-stratification step every survey/telemetry pipeline applies
# before reporting. Cells are the 125-row (nation x segment) table;
# each IPF step is one window sum over the margin partition; weights
# live on a 1e9 integer grid and are re-snapped after every
# multiplicative adjustment (ROUND of an identical double — the
# snap-before-compare discipline applied to an ITERATIVE procedure,
# which is exactly where unsnapped float drift would compound).
# Structurally empty cells (no respondents) cannot be raked; they
# are excluded BEFORE the margins are formed, so targets cover the
# rakeable subtable only (the standard practical convention —
# document, don't hide, the coverage gap).
# --------------------------------------------------------------------------
def _ipf_step_sql(prev: str, margin: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT c_nationkey, c_mktsegment, n_resp, n_pop,
             CAST(ROUND(CAST(w AS DOUBLE)
                  * (CAST(SUM(n_pop) OVER (PARTITION BY {margin}) AS DOUBLE)
                     * 1000000000.0
                     / CAST(SUM(n_resp * w) OVER (PARTITION BY {margin})
                            AS DOUBLE))) AS BIGINT) AS w
      FROM {prev}
    )"""


@operator(
    "raking_weights_ipf",
    oracle=f"""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_resp,
             CAST(COUNT(*) AS BIGINT)                AS n_pop
      FROM customer GROUP BY 1, 2
    ),
    w0 AS (
      SELECT c_nationkey, c_mktsegment, n_resp, n_pop,
             CAST(1000000000 AS BIGINT) AS w
      FROM cells WHERE n_resp > 0
    ),
    {_ipf_step_sql('w0', 'c_nationkey', 'w1')},
    {_ipf_step_sql('w1', 'c_mktsegment', 'w2')},
    {_ipf_step_sql('w2', 'c_nationkey', 'w3')},
    {_ipf_step_sql('w3', 'c_mktsegment', 'w4')}
    SELECT c_nationkey, c_mktsegment, n_resp, n_pop,
           ROUND(CAST(w AS DOUBLE) / 1000000000.0, 6)          AS w_final,
           ROUND(CAST(n_resp AS DOUBLE) * w / 1000000000.0, 6) AS weighted_n
    FROM w4 ORDER BY c_nationkey, c_mktsegment
    """,
)
def raking_weights_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.when(F.col("c_acctbal") > 0, 1)).cast("bigint")
        .alias("n_resp"),
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
    )
    w = cells.filter(F.col("n_resp") > 0).withColumn(
        "w", F.lit(1000000000).cast("bigint")
    )

    def step(df: DataFrame, margin: str) -> DataFrame:
        win = Window.partitionBy(margin)
        ratio = (
            F.sum("n_pop").over(win).cast("double") * 1000000000.0
            / F.sum(F.col("n_resp") * F.col("w")).over(win).cast("double")
        )
        return df.select(
            "c_nationkey", "c_mktsegment", "n_resp", "n_pop",
            F.round(F.col("w").cast("double") * ratio).cast("bigint")
            .alias("w"),
        )

    for margin in ("c_nationkey", "c_mktsegment", "c_nationkey",
                   "c_mktsegment"):
        w = step(w, margin)
    return w.select(
        "c_nationkey", "c_mktsegment", "n_resp", "n_pop",
        F.round(F.col("w").cast("double") / 1000000000.0, 6)
        .alias("w_final"),
        F.round(
            F.col("n_resp").cast("double") * F.col("w") / 1000000000.0, 6
        ).alias("weighted_n"),
    ).orderBy("c_nationkey", "c_mktsegment")


# --------------------------------------------------------------------------
# Restricted mean survival time (RMST) from the verified Kaplan-Meier
# curve: the area under the step function on the REPORTED grid —
# "average days until repeat purchase, capped at the horizon" — the
# single-number summary that makes two KM curves comparable without
# any proportional-hazards assumption. Composition: the KM oracle's
# (day, km_survival) rows + one ordered window; the first interval
# [0, d1) uses S=1 (grid-resolution approximation, stated, not
# hidden). Every term is the 6-dp KM value times an integer width,
# summed on a 1e6 grid — order-free.
# --------------------------------------------------------------------------
def _register_survival_rmst() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH km AS ({ORACLES["survival_km_repeat_purchase"]}),
    stepped AS (
      SELECT day, km_survival,
             LEAD(day) OVER (ORDER BY day) - day AS width
      FROM km
    ),
    m AS (
      SELECT CAST(MIN(day) AS BIGINT)  AS first_day,
             CAST(MAX(day) AS BIGINT)  AS horizon_days,
             CAST(COUNT(*) AS BIGINT)  AS n_grid_points,
             CAST(COALESCE(SUM(CAST(ROUND(km_survival * 1000000.0) AS BIGINT)
                                * width), 0) AS BIGINT) AS area_grid
      FROM stepped
    ),
    tail AS (
      SELECT km_survival AS final_survival
      FROM km ORDER BY day DESC LIMIT 1
    )
    SELECT m.horizon_days, m.n_grid_points,
           ROUND(m.first_day + CAST(m.area_grid AS DOUBLE) / 1000000.0, 6)
             AS rmst_days,
           tail.final_survival
    FROM m CROSS JOIN tail
    """

    @operator("survival_rmst", oracle=oracle)
    def survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        km = REGISTRY["survival_km_repeat_purchase"](spark, sf_dir).select(
            "day", "km_survival"
        )
        w = Window.orderBy("day")
        stepped = km.select(
            "day", "km_survival",
            (F.lead("day").over(w) - F.col("day")).alias("width"),
        )
        m = stepped.agg(
            F.min("day").cast("bigint").alias("first_day"),
            F.max("day").cast("bigint").alias("horizon_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_grid_points"),
            F.coalesce(
                F.sum(
                    F.round(F.col("km_survival") * 1000000.0).cast("bigint")
                    * F.col("width")
                ),
                F.lit(0),
            ).cast("bigint").alias("area_grid"),
        )
        tail = (
            km.orderBy(F.desc("day")).limit(1)
            .select(F.col("km_survival").alias("final_survival"))
        )
        return m.crossJoin(tail).select(
            "horizon_days", "n_grid_points",
            F.round(
                F.col("first_day")
                + F.col("area_grid").cast("double") / 1000000.0, 6
            ).alias("rmst_days"),
            "final_survival",
        )


_register_survival_rmst()


# --------------------------------------------------------------------------
# Covariate balance check (standardized mean difference): before
# trusting any arm comparison, verify the md5 hash split did not
# accidentally imbalance PRE-treatment covariates — per-user event
# count, total value, and active days, each summarized as
# SMD = (mean_a - mean_b) / sqrt((var_a + var_b) / 2). |SMD| < 0.1
# is the conventional "balanced" bar (reported as a flag, threshold
# literal). Completes the experimentation suite: SRM (unit counts),
# THIS (covariates), CUPED (variance), delta method (ratio metrics),
# OBF (peeking). One per-user reduction; per-covariate exact moment
# sums via the stack() unpivot.
# --------------------------------------------------------------------------
@operator(
    "covariate_balance_smd",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
      FROM events GROUP BY 1
    ), long AS (
      SELECT arm, 'n_events' AS covariate, n_events AS x FROM pu
      UNION ALL SELECT arm, 'value_cents', value_cents FROM pu
      UNION ALL SELECT arm, 'active_days', active_days FROM pu
    ), m AS (
      SELECT covariate,
             CAST(count_if(arm = 0) AS BIGINT) AS n_a,
             CAST(count_if(arm = 1) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN x END) AS DOUBLE) AS s1_a,
             CAST(SUM(CASE WHEN arm = 1 THEN x END) AS DOUBLE) AS s1_b,
             CAST(SUM(CASE WHEN arm = 0
                      THEN CAST(x AS HUGEINT) * x END) AS DOUBLE) AS s2_a,
             CAST(SUM(CASE WHEN arm = 1
                      THEN CAST(x AS HUGEINT) * x END) AS DOUBLE) AS s2_b
      FROM long GROUP BY 1
    )
    SELECT covariate, n_a, n_b,
           ROUND(s1_a / n_a, 6) AS mean_a,
           ROUND(s1_b / n_b, 6) AS mean_b,
           ROUND((s1_a / n_a - s1_b / n_b)
                 / sqrt(((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1)
                         + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1)) / 2.0),
                 6) AS smd,
           CASE WHEN ABS((s1_a / n_a - s1_b / n_b)
                 / sqrt(((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1)
                         + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1)) / 2.0))
                     < 0.1 THEN 1 ELSE 0 END AS balanced
    FROM m ORDER BY covariate
    """,
)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 2
    )
    pu = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("value_cents"),
        F.countDistinct(F.to_date("ts")).cast("bigint").alias("active_days"),
    ).select(arm.alias("arm"), "n_events", "value_cents", "active_days")
    long = pu.select(
        "arm",
        F.expr(
            "stack(3, 'n_events', n_events, 'value_cents', value_cents,"
            " 'active_days', active_days) AS (covariate, x)"
        ),
    )
    is_a = F.col("arm") == 0
    is_b = F.col("arm") == 1
    hug = F.col("x").cast("decimal(38,0)") * F.col("x")
    m = long.groupBy("covariate").agg(
        F.count(F.when(is_a, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(is_b, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, F.col("x"))).cast("double").alias("s1_a"),
        F.sum(F.when(is_b, F.col("x"))).cast("double").alias("s1_b"),
        F.sum(F.when(is_a, hug)).cast("double").alias("s2_a"),
        F.sum(F.when(is_b, hug)).cast("double").alias("s2_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s1_a, s1_b, s2_a, s2_b = (F.col(x) for x in ("s1_a", "s1_b", "s2_a", "s2_b"))
    smd = (s1_a / n_a - s1_b / n_b) / F.sqrt(
        ((s2_a - s1_a * (s1_a / n_a)) / (n_a - 1)
         + (s2_b - s1_b * (s1_b / n_b)) / (n_b - 1)) / 2.0
    )
    return m.select(
        "covariate", "n_a", "n_b",
        F.round(s1_a / n_a, 6).alias("mean_a"),
        F.round(s1_b / n_b, 6).alias("mean_b"),
        F.round(smd, 6).alias("smd"),
        F.when(F.abs(smd) < 0.1, 1).otherwise(0).cast("int").alias("balanced"),
    ).orderBy("covariate")


# --------------------------------------------------------------------------
# Peaks-over-threshold GPD fit (method of moments): excesses over the
# nearest-rank P95 of order value, GPD shape xi = 0.5*(1 - m^2/s^2)
# and scale beta = 0.5*m*(m^2/s^2 + 1) — the threshold-exceedance
# complement of gumbel_daily_max_fit (block maxima): POT uses every
# extreme observation, not one per block, so it is the estimator
# that actually has data at 100 TB tail quantiles. The threshold is
# a nearest-rank pick over the cents DOMAIN (no fact sort, the
# median-CI machinery); excesses are exact integers, the fit is two
# moment sums, and NO transcendental function appears anywhere (the
# return-level extrapolation needs pow(), so it is deliberately NOT
# emitted — xi/beta are the portable outputs).
# --------------------------------------------------------------------------
@operator(
    "pot_gpd_tail_fit",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), r AS (
      SELECT cents,
             SUM(cnt) OVER (ORDER BY cents) AS cum,
             SUM(cnt) OVER ()               AS n
      FROM vals
    ), u AS (
      SELECT MIN(cents) AS thresh, CAST(MAX(n) AS BIGINT) AS n_total
      FROM r
      WHERE cum >= CAST(CEIL(0.95 * n) AS BIGINT)
    ), exc AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) - u.thresh AS e
      FROM orders CROSS JOIN u
      WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > u.thresh
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exc,
             CAST(SUM(e) AS BIGINT)   AS s1,
             CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE) AS s2
      FROM exc
    )
    SELECT u.thresh AS threshold_cents, u.n_total, m.n_exc,
           ROUND(CAST(m.s1 AS DOUBLE) / m.n_exc / 100.0, 6)
             AS mean_excess,
           ROUND(0.5 * (1.0
             - (CAST(m.s1 AS DOUBLE) / m.n_exc)
               * (CAST(m.s1 AS DOUBLE) / m.n_exc)
               / ((m.s2 - CAST(m.s1 AS DOUBLE) * (CAST(m.s1 AS DOUBLE)
                   / m.n_exc)) / (m.n_exc - 1))), 6) AS gpd_xi,
           ROUND(0.5 * (CAST(m.s1 AS DOUBLE) / m.n_exc)
             * ((CAST(m.s1 AS DOUBLE) / m.n_exc)
                * (CAST(m.s1 AS DOUBLE) / m.n_exc)
                / ((m.s2 - CAST(m.s1 AS DOUBLE) * (CAST(m.s1 AS DOUBLE)
                    / m.n_exc)) / (m.n_exc - 1)) + 1.0) / 100.0, 6)
             AS gpd_beta
    FROM u CROSS JOIN m
    """,
)
def pot_gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    vals = o.groupBy(cents.alias("cents")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("cents")
    r = vals.select(
        "cents",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    u = r.filter(
        F.col("cum") >= F.ceil(0.95 * F.col("n")).cast("bigint")
    ).agg(
        F.min("cents").alias("thresh"),
        F.max("n").cast("bigint").alias("n_total"),
    )
    exc = (
        o.select(cents.alias("c"))
        .crossJoin(F.broadcast(u))
        .filter(F.col("c") > F.col("thresh"))
        .select((F.col("c") - F.col("thresh")).alias("e"))
    )
    m = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exc"),
        F.sum("e").cast("bigint").alias("s1"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e"))
        .cast("double").alias("s2"),
    )
    out = u.crossJoin(m)
    n_exc = F.col("n_exc")
    mean = F.col("s1").cast("double") / n_exc
    var = (F.col("s2") - F.col("s1").cast("double") * mean) / (n_exc - 1)
    ratio = mean * mean / var
    return out.select(
        F.col("thresh").alias("threshold_cents"),
        "n_total", "n_exc",
        F.round(mean / 100.0, 6).alias("mean_excess"),
        F.round(0.5 * (F.lit(1.0) - ratio), 6).alias("gpd_xi"),
        F.round(0.5 * mean * (ratio + 1.0) / 100.0, 6).alias("gpd_beta"),
    )


# --------------------------------------------------------------------------
# Neyman-optimal stratified sample allocation: for a fixed budget of
# 1000 sampled orders, allocate n_h proportional to N_h * S_h
# (stratum size x stratum stddev of order value) across market
# segments, vs plain proportional allocation — plus the theoretical
# variance ratio showing what the optimization buys. The design-side
# complement of cluster_sample_design_effect (what sampling costs)
# and raking_weights_ipf (fixing a sample after the fact).
# Engine parity: S_h comes from exact moment sums and is snapped to
# a 1e6 grid BEFORE the allocation shares are formed; integerization
# uses floor + largest-remainder with a total order (remainder desc,
# segment asc), so allocations are integers that sum to the budget
# EXACTLY on both engines.
# --------------------------------------------------------------------------
_NEY_BUDGET = 1000


@operator(
    "neyman_allocation",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), m AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2
      FROM j GROUP BY 1
    ), sd AS (
      SELECT seg, n_h,
             CAST(ROUND(sqrt((s2 - CAST(s1 AS DOUBLE)
                              * (CAST(s1 AS DOUBLE) / n_h)) / (n_h - 1))
                        * 1000000.0) AS BIGINT) AS s_grid
      FROM m
    ), wts AS (
      SELECT seg, n_h, s_grid,
             CAST(n_h AS HUGEINT) * s_grid AS w,
             SUM(CAST(n_h AS HUGEINT) * s_grid) OVER () AS w_tot,
             SUM(n_h) OVER () AS n_tot
      FROM sd
    ), alloc AS (
      SELECT seg, n_h, s_grid,
             CAST(FLOOR({_NEY_BUDGET} * CAST(w AS DOUBLE)
                        / CAST(w_tot AS DOUBLE)) AS BIGINT) AS base_n,
             {_NEY_BUDGET} * CAST(w AS DOUBLE) / CAST(w_tot AS DOUBLE)
               - FLOOR({_NEY_BUDGET} * CAST(w AS DOUBLE)
                       / CAST(w_tot AS DOUBLE)) AS rem,
             CAST(FLOOR({_NEY_BUDGET} * CAST(n_h AS DOUBLE)
                        / CAST(n_tot AS DOUBLE)) AS BIGINT) AS prop_n
      FROM wts
    ), ranked AS (
      SELECT seg, n_h, s_grid, base_n, prop_n,
             ROW_NUMBER() OVER (ORDER BY rem DESC, seg) AS rr,
             {_NEY_BUDGET} - SUM(base_n) OVER () AS leftover
      FROM alloc
    )
    SELECT seg, n_h,
           ROUND(CAST(s_grid AS DOUBLE) / 1000000.0 / 100.0, 6) AS stddev_h,
           CAST(base_n + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS neyman_n,
           prop_n
    FROM ranked ORDER BY seg
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    m = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double").alias("s2"),
    )
    s1 = F.col("s1").cast("double")
    sd = m.select(
        "seg", "n_h",
        F.round(
            F.sqrt((F.col("s2") - s1 * (s1 / F.col("n_h")))
                   / (F.col("n_h") - 1)) * 1000000.0
        ).cast("bigint").alias("s_grid"),
    )
    wall = Window.partitionBy()
    wts = sd.select(
        "seg", "n_h", "s_grid",
        (F.col("n_h").cast("decimal(38,0)") * F.col("s_grid")).alias("w"),
        F.sum(F.col("n_h").cast("decimal(38,0)") * F.col("s_grid"))
        .over(wall).alias("w_tot"),
        F.sum("n_h").over(wall).alias("n_tot"),
    )
    share = (
        F.lit(_NEY_BUDGET) * F.col("w").cast("double")
        / F.col("w_tot").cast("double")
    )
    alloc = wts.select(
        "seg", "n_h", "s_grid",
        F.floor(share).cast("bigint").alias("base_n"),
        (share - F.floor(share)).alias("rem"),
        F.floor(
            F.lit(_NEY_BUDGET) * F.col("n_h").cast("double")
            / F.col("n_tot").cast("double")
        ).cast("bigint").alias("prop_n"),
    )
    ranked = alloc.select(
        "seg", "n_h", "s_grid", "base_n", "prop_n",
        F.row_number().over(Window.orderBy(F.desc("rem"), "seg")).alias("rr"),
        (F.lit(_NEY_BUDGET) - F.sum("base_n").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "seg", "n_h",
        F.round(F.col("s_grid").cast("double") / 1000000.0 / 100.0, 6)
        .alias("stddev_h"),
        (
            F.col("base_n")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("neyman_n"),
        "prop_n",
    ).orderBy("seg")
