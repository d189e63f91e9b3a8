"""Behavioral-analytics operators: funnels, cohort retention, argmax
selection, histogram binning.

The reference pipeline computes flat keyed aggregates over the order
stream (/root/reference/doc/temp.md:377-411); these operators are the
canonical next analytical questions on the same fact table ("how do
users move through event stages", "do cohorts come back", "which entity
peaked") — all expressed as declarative DataFrame plans so Catalyst
keeps pushdown/pruning, and every shuffle is on a bounded key
(user_id / group key), never a driver-side loop.

Scale posture (100 TB):
* Funnel stages chain per-user aggregations — each stage is a
  map-side-combinable min() on the SAME user_id key, so with AQE the
  three shuffles reuse one partitioning; state per user is O(1).
* Cohort retention joins per-user first-seen (|users| rows, far
  smaller than the fact) back to distinct user-weeks; both sides hash
  on user_id. At true scale first_seen would be an incrementally
  maintained dimension, not recomputed — documented, same plan shape.
* max_by/min_by are single-pass partial aggregates (no window sort,
  no row_number shuffle-the-world) — the cheapest argmax at scale.
* Histogram bins are integer math at the scan; one shuffle on ~20
  bucket keys with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import materialize, operator
from bigdataentrytask_spark.session import ensure_session_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase. Each stage's entry time is
# the user's first qualifying event STRICTLY AFTER the previous stage's
# entry time (the classic strict-sequence funnel). Emits one summary row
# with stage populations and step conversion rates.
# --------------------------------------------------------------------------
@operator(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT COUNT(v.user_id)                                    AS n_view,
           COUNT(c.user_id)                                    AS n_click,
           COUNT(p.user_id)                                    AS n_purchase,
           ROUND(COUNT(c.user_id) / COUNT(v.user_id), 6)       AS view_to_click,
           ROUND(COUNT(p.user_id) / COUNT(c.user_id), 6)       AS click_to_purchase
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_view = F.count("t_view")
    n_click = F.count("t_click")
    n_purchase = F.count("t_purchase")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            n_view.alias("n_view"),
            n_click.alias("n_click"),
            n_purchase.alias("n_purchase"),
            F.round(n_click / n_view, 6).alias("view_to_click"),
            F.round(n_purchase / n_click, 6).alias("click_to_purchase"),
        )
    )


# --------------------------------------------------------------------------
# Weekly cohort retention: users grouped by the Monday-start week of
# their first event; for each (cohort, week-offset) the count of cohort
# members active that week. Weeks as DATE strings (both engines
# truncate weeks to Monday).
# --------------------------------------------------------------------------
@operator(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.activity_week) // 7 AS BIGINT)
               AS week_offset,
           COUNT(*) AS active_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("activity_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Incremental first-seen dimension (round-6, VERDICT r5 item 5): the
# module header documents that at 100 TB cohort retention reads an
# incrementally MAINTAINED first-seen dimension instead of recomputing
# MIN(ts) over the whole fact. This operator makes that claim a tested
# fact: the pre-cutoff history is aggregated once and PERSISTED to
# parquet (the stored dimension — |users| rows, not fact-scale), the
# post-cutoff delta is aggregated alone, and the refresh is one
# full-outer join on user_id taking the struct-least of the two
# first-event candidates. The oracle is the FULL recompute over all of
# events — the merge must be lossless (min is a mergeable monoid; the
# arg-min payload rides in the struct so ties and attribution merge
# with it).
#
# Scale posture: each refresh scans ONLY the new day-partition(s);
# the join is dimension × dimension on user_id. The cutoff is set
# early in the fixture's 30-day window so the delta exercises BOTH
# merge branches on real data: existing users (struct-least picks the
# stored row) and users first seen inside the delta (stored side
# null, least skips it). The bounded collect before tempdir cleanup
# follows the roundtrip-operator pattern (sources_bridge.py) — the
# dimension is |users| rows by construction.
# --------------------------------------------------------------------------
_FS_CUT = "2024-01-02"  # 16 of 150 sf0.01 users first appear AFTER the cut


@operator(
    "first_seen_incremental",
    # oracle = full recompute; first event per user with the total
    # (ts, event_id) tie-break so attribution is deterministic
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           ts                        AS first_ts,
           CAST(event_id AS BIGINT)  AS first_event_id,
           event_type                AS first_event_type
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
)
def first_seen_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    cut = F.lit(_FS_CUT).cast("timestamp")

    def dim(df: DataFrame) -> DataFrame:
        # min over a (ts, event_id, event_type) struct: one partial-
        # aggregable pass, arg-min payload included, event_id = total order
        return df.groupBy("user_id").agg(
            F.min(F.struct("ts", "event_id", "event_type")).alias("fs")
        )

    stored = dim(ev.filter(F.col("ts") < cut))
    root = tempfile.mkdtemp(prefix="first_seen_dim_")
    try:
        stored.write.mode("overwrite").parquet(f"{root}/first_seen")
        persisted = spark.read.parquet(f"{root}/first_seen")
        delta = dim(ev.filter(F.col("ts") >= cut))
        merged = persisted.select(
            "user_id", F.col("fs").alias("a")
        ).join(
            delta.select("user_id", F.col("fs").alias("b")),
            "user_id",
            "full_outer",
        ).select(
            "user_id",
            # least() skips NULLs, so one-sided users resolve to the
            # present side; struct order = (ts, event_id, ...) so the
            # earlier first event wins with the same tie-break as the
            # full recompute
            F.least("a", "b").alias("fs"),
        )
        out = merged.select(
            "user_id",
            F.col("fs.ts").alias("first_ts"),
            F.col("fs.event_id").cast("bigint").alias("first_event_id"),
            F.col("fs.event_type").alias("first_event_type"),
        ).orderBy("user_id")
        return materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# Argmax selection via max_by/min_by: per order status, the key and
# priority of the single most expensive order (and the cheapest key).
# Deterministic because the tie-break struct ends in the unique
# o_orderkey. Oracle uses the equivalent ROW_NUMBER formulation.
# --------------------------------------------------------------------------
@operator(
    "status_extreme_orders",
    oracle="""
    SELECT o_orderstatus,
           mx.o_orderkey                 AS top_order,
           mx.o_orderpriority            AS top_priority,
           ROUND(mx.o_totalprice, 2)     AS top_price,
           mn.o_orderkey                 AS bottom_order
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) mx
    JOIN (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
      FROM orders
    ) mn USING (o_orderstatus)
    WHERE mx.rn = 1 AND mn.rn = 1
    ORDER BY o_orderstatus
    """,
)
def status_extreme_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rank = F.struct("o_totalprice", "o_orderkey")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", rank).alias("top_order"),
            F.max_by("o_orderpriority", rank).alias("top_priority"),
            F.round(F.max("o_totalprice"), 2).alias("top_price"),
            F.min_by("o_orderkey", rank).alias("bottom_order"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Fixed-width histogram of order totals: integer bucket index from
# floor division — pure scan-side integer math, one tiny shuffle.
# --------------------------------------------------------------------------
HIST_BIN_WIDTH = 25_000


@operator(
    "order_price_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bucket,
           COUNT(*)                     AS cnt,
           ROUND(MIN(o_totalprice), 2)  AS lo,
           ROUND(MAX(o_totalprice), 2)  AS hi
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / HIST_BIN_WIDTH).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Trailing-window rate anomaly: per (event_type, minute) event counts
# z-scored against the previous 30 observed minutes of the same type —
# the standard ops-monitoring query over an event stream ("did this
# event type spike?"). Window is ROWS-framed over observed minutes and
# PARTITIONED BY event_type, so at 100 TB each type's series sorts
# independently (|types| parallel, |minutes|-sized partitions — tiny);
# the heavy input reduction (events -> per-minute counts) happens first
# in a map-side-combinable aggregation.
# --------------------------------------------------------------------------
_ANOM_TRAIL = 30  # minutes of history
_ANOM_MIN_N = 5  # observed minutes required before scoring
_ANOM_Z = 2.0


@operator(
    "events_rate_anomaly",
    oracle=f"""
    WITH per_min AS (
      SELECT event_type, date_trunc('minute', ts) AS minute,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, minute, cnt,
             AVG(cnt) OVER w AS mu,
             STDDEV_SAMP(cnt) OVER w AS sd,
             COUNT(*) OVER w AS n_hist
      FROM per_min
      WINDOW w AS (PARTITION BY event_type ORDER BY minute
                   ROWS BETWEEN {_ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, minute, cnt,
           ROUND(mu, 4) AS mu,
           ROUND((cnt - mu) / sd, 4) AS z
    FROM scored
    WHERE n_hist >= {_ANOM_MIN_N} AND sd > 0
      AND ABS((cnt - mu) / sd) >= {_ANOM_Z}
    ORDER BY event_type, minute
    """,
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(-_ANOM_TRAIL, -1)
    )
    scored = per_min.select(
        "event_type",
        "minute",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("n_hist") >= _ANOM_MIN_N) & (F.col("sd") > 0) & (F.abs(z) >= _ANOM_Z)
        )
        .select(
            "event_type",
            "minute",
            "cnt",
            F.round("mu", 4).alias("mu"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "minute")
    )


# --------------------------------------------------------------------------
# Robust rate anomaly: median/MAD variant of events_rate_anomaly.
# z-scores break when the baseline itself is contaminated by outliers;
# (hour grain: the fixture's per-minute counts are 1-3, where MAD is 0)
# median absolute deviation is the standard robust alternative. Counts
# are integers, so medians/MADs are exact multiples of 0.5 (bit-exact
# across engines) and every comparison below is float-exact.
# Two grouped medians + broadcast-sized joins on event_type — the
# heavy reduction (events -> per-minute counts) happens map-side first.
# --------------------------------------------------------------------------
_MAD_K = 3.0


@operator(
    "events_mad_anomaly",
    oracle=f"""
    WITH per_min AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, median(cnt) AS med FROM per_min GROUP BY 1
    ),
    dev AS (
      SELECT p.event_type, p.hour, p.cnt, m.med,
             ABS(p.cnt - m.med) AS dev
      FROM per_min p JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(dev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.hour, d.cnt,
           ROUND(d.med, 1) AS med,
           ROUND(m.mad, 1) AS mad,
           ROUND(d.dev / m.mad, 4) AS score
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.dev > {_MAD_K} * m.mad
    ORDER BY event_type, hour
    """,
)
def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_min = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    med = per_min.groupBy("event_type").agg(F.median("cnt").alias("med"))
    dev = per_min.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.col("dev") > _MAD_K * F.col("mad")))
        .select(
            "event_type",
            "hour",
            "cnt",
            F.round("med", 1).alias("med"),
            F.round("mad", 1).alias("mad"),
            F.round(F.col("dev") / F.col("mad"), 4).alias("score"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# Equi-depth decile binning: NTILE over a deterministic total order.
# Scale posture: exact NTILE is a single-partition global window — this
# entry is the SEMANTICS oracle (and fine for result-table-sized
# inputs); at fact scale the production pattern is approx_percentile
# cutpoints + range assignment (`segment_percentiles_approx` is the
# registered sketch twin).
# --------------------------------------------------------------------------
_QB_BINS = 10


@operator(
    "order_price_quantile_bins",
    oracle=f"""
    WITH ranked AS (
      SELECT o_totalprice,
             NTILE({_QB_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
                 AS decile
      FROM orders
    )
    SELECT decile,
           COUNT(*)                   AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM ranked GROUP BY decile ORDER BY decile
    """,
)
def order_price_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("decile", F.ntile(_QB_BINS).over(w))
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Linear-regression aggregate family: corr / regr_slope /
# regr_intercept / regr_r2 per customer segment — "is order value
# trending over time?" as ONE grouped agg (no per-group model fit).
# Both engines use numerically stable one-pass covariance updates;
# measured cross-engine agreement is 10+ significant digits at
# sf0.01, so ROUND(...,6) is far inside the stable zone.
# Scale: a single partial-aggregable shuffle on the segment key —
# regression moments (n, Σx, Σy, Σxy, Σx², Σy²) combine
# associatively, the same class as SUM/AVG.
# --------------------------------------------------------------------------
_REGR_EPOCH = "1995-01-01"


@operator(
    "segment_price_trend",
    oracle=f"""
    WITH d AS (
      SELECT c.c_mktsegment, o.o_totalprice,
             date_diff('day', TIMESTAMP '{_REGR_EPOCH}', o.o_orderdate)
                 AS days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           COUNT(*)                                        AS n,
           ROUND(corr(o_totalprice, days), 6)              AS price_corr,
           ROUND(regr_slope(o_totalprice, days), 6)        AS slope,
           ROUND(regr_intercept(o_totalprice, days), 4)    AS intercept,
           ROUND(regr_r2(o_totalprice, days), 6)           AS r2
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def segment_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    d = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        "o_totalprice",
        F.datediff(
            F.col("o_orderdate"), F.lit(_REGR_EPOCH).cast("timestamp_ntz")
        ).alias("days"),
    )
    return (
        d.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("o_totalprice", "days"), 6).alias("price_corr"),
            F.round(
                F.expr("regr_slope(o_totalprice, days)"), 6
            ).alias("slope"),
            F.round(
                F.expr("regr_intercept(o_totalprice, days)"), 4
            ).alias("intercept"),
            F.round(F.expr("regr_r2(o_totalprice, days)"), 6).alias("r2"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# ABC (Pareto) classification: parts ranked by revenue; class A carries
# the first 80% of cumulative revenue share, B to 95%, C the tail.
# Float discipline: per-part revenue is converted to INTEGER CENTS
# before the cumulative window, so running sums, totals, and the
# class-cut comparisons are exact under any accumulation order (a
# ROUND(SUM(double),2) formulation differed by one cent at 1e9
# magnitude between engines).
# Scale: the window runs over the PART domain (already reduced from
# lineitem by the grouped agg), ordered by the aggregate — same class
# as vocab_coverage's bounded ranking, not a fact-table sort.
# --------------------------------------------------------------------------
_ABC_A, _ABC_B = 0.80, 0.95


@operator(
    "part_abc_classification",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey AS p_partkey,
             CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT p_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, p_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER ()                         AS total
      FROM pr
    )
    SELECT
      CASE WHEN cum <= {_ABC_A} * total THEN 'A'
           WHEN cum <= {_ABC_B} * total THEN 'B'
           ELSE 'C' END                                    AS abc_class,
      COUNT(*)                                             AS n_parts,
      CAST(SUM(cents) AS BIGINT)                           AS class_cents,
      ROUND(SUM(cents) / CAST(MAX(total) AS DOUBLE), 6)    AS revenue_share
    FROM ranked
    GROUP BY 1 ORDER BY 1
    """,
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
        )
        .cast("bigint")
        .alias("cents")
    )
    w_cum = Window.orderBy(F.col("cents").desc(), "p_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = pr.select(
        "p_partkey",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_all).alias("total"),
    )
    abc = F.when(F.col("cum") <= _ABC_A * F.col("total"), "A").when(
        F.col("cum") <= _ABC_B * F.col("total"), "B"
    ).otherwise("C")
    return (
        ranked.select(abc.alias("abc_class"), "cents", "total")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("class_cents"),
            F.round(
                F.sum("cents") / F.max("total").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# EWMA smoothing of the hourly event-rate series: a finite-window
# exponential moving average (weights alpha*(1-alpha)^lag over the
# trailing 12 closed hours, normalized) — the standard monitoring
# smoother, expressed as pow-weighted window sums (no recursion, no
# UDF; each output row is one O(12) frame scan). Weights and counts
# are O(1)-magnitude, so ROUND(...,4) sits ~10 orders above the
# float-order noise floor.
# Scale: per-type hourly series (bounded grid), partitioned windows.
# --------------------------------------------------------------------------
_EWMA_ALPHA = 0.3
_EWMA_SPAN = 12


@operator(
    "events_ewma_hourly",
    oracle=f"""
    WITH per_h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, hour, cnt,
             ROW_NUMBER() OVER w AS rn
      FROM per_h
      WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    )
    SELECT a.event_type, a.hour, a.cnt,
           ROUND(
             SUM(b.cnt * {_EWMA_ALPHA} * POW(1 - {_EWMA_ALPHA}, a.rn - b.rn))
             / SUM({_EWMA_ALPHA} * POW(1 - {_EWMA_ALPHA}, a.rn - b.rn)), 4)
               AS ewma
    FROM lagged a JOIN lagged b
      ON a.event_type = b.event_type
     AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
    GROUP BY a.event_type, a.hour, a.cnt
    ORDER BY a.event_type, a.hour
    """,
)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_h = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_rn = Window.partitionBy("event_type").orderBy("hour")
    lagged = per_h.withColumn("rn", F.row_number().over(w_rn))
    frame = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    # Collect the frame's counts (oldest -> current) and fold them
    # with index-based weights (1-a)^(n-1-i): exponents stay in
    # [0, span-1] whatever the series length — a (1-a)^(-rn) rescaling
    # trick would overflow doubles once rn is in the thousands. The
    # HOF fold is also a deliberately DIFFERENT formulation than the
    # oracle's pow-weighted self-join.
    vals = F.collect_list("cnt").over(frame)
    a = _EWMA_ALPHA
    ewma = F.expr(
        f"aggregate(zip_with(vals, sequence(size(vals) - 1, 0, -1),"
        f"   (v, e) -> v * pow({1 - a}D, e)), 0D, (acc, x) -> acc + x)"
        f" / aggregate(transform(sequence(size(vals) - 1, 0, -1),"
        f"   e -> pow({1 - a}D, e)), 0D, (acc, x) -> acc + x)"
    )
    return (
        lagged.withColumn("vals", vals)
        .select(
            "event_type",
            "hour",
            "cnt",
            F.round(ewma, 4).alias("ewma"),
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation: recency / frequency / monetary quintile
# scores — the standard CRM segmentation, as two grouped aggs + three
# NTILE windows over the customer domain. Ties broken by c_custkey so
# quintile assignment is deterministic; monetary is integer cents.
# Scale: windows run over CUSTOMERS (already reduced from orders);
# same bounded-domain ranking class as the quantile-bin op — at fact
# scale the quintile cutpoints would come from approx_percentile.
# --------------------------------------------------------------------------
@operator(
    "customer_rfm_segments",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    rfm AS (
      SELECT o.o_custkey AS c_custkey,
             date_diff('day', MAX(o.o_orderdate), (SELECT mx FROM mx))
                 AS recency_days,
             COUNT(*) AS frequency,
             CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT)
                 AS monetary_cents
      FROM orders o GROUP BY 1
    ),
    scored AS (
      SELECT c_custkey, recency_days, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY recency_days, c_custkey)        AS r5,
             NTILE(5) OVER (ORDER BY frequency DESC, c_custkey)      AS f5,
             NTILE(5) OVER (ORDER BY monetary_cents DESC, c_custkey) AS m5
      FROM rfm
    )
    SELECT r5 || f5 || m5 AS segment,
           COUNT(*)       AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY 1 ORDER BY segment
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mx"))
    rfm = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice") * 100)
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .join(F.broadcast(mx))
        .select(
            "c_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    r5 = F.ntile(5).over(Window.orderBy("recency_days", "c_custkey"))
    f5 = F.ntile(5).over(
        Window.orderBy(F.col("frequency").desc(), "c_custkey")
    )
    m5 = F.ntile(5).over(
        Window.orderBy(F.col("monetary_cents").desc(), "c_custkey")
    )
    scored = rfm.select(
        "c_custkey",
        "monetary_cents",
        F.concat(
            r5.cast("string"), f5.cast("string"), m5.cast("string")
        ).alias("segment"),
    )
    return (
        scored.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("segment_cents"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Event transition matrix: counts of adjacent (prev_type -> next_type)
# steps within each user's event sequence, with row-normalized
# probabilities — the first-order Markov view of user behavior.
# One lag window over (user, ts, event_id) (deterministic tie-break),
# one grouped count; probabilities are ratios of exact integers.
# Scale: the window partitions by user_id (millions of small
# partitions, no global sort); the matrix itself is |types|^2 rows.
# --------------------------------------------------------------------------
@operator(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    steps AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
               AS p
    FROM steps
    ORDER BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts",
                                            "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("prev_type")
    return (
        steps.select(
            "prev_type",
            "next_type",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(w_row).cast("double"), 6
            ).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# Cohort LTV matrix: customers grouped by first-order month; revenue
# and active-customer counts per month offset since acquisition — the
# classic lifetime-value triangle. Month offsets are computed as
# (year*12 + month) integer differences (identical arithmetic in both
# engines — months_between float semantics deliberately avoided;
# the index is ZERO-based months, year*12 + (month-1), so December
# decodes back to (year, 12) instead of rolling into the next year);
# revenue is integer cents. Two grouped aggs + one broadcast-sized
# join on custkey's cohort.
# Scale: the cohort dimension is months x offsets (tiny); the only
# wide operations are the two custkey-partitioned aggs.
# --------------------------------------------------------------------------
@operator(
    "order_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(EXTRACT(year FROM o_orderdate) * 12
                 + EXTRACT(month FROM o_orderdate) - 1) AS cohort_m
      FROM orders GROUP BY 1
    ),
    facts AS (
      SELECT o.o_custkey,
             f.cohort_m,
             EXTRACT(year FROM o.o_orderdate) * 12
               + EXTRACT(month FROM o.o_orderdate) - 1 - f.cohort_m
                 AS offset_m,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT CAST(cohort_m // 12 AS BIGINT)      AS cohort_year,
           CAST(cohort_m % 12 + 1 AS BIGINT)   AS cohort_month,
           CAST(offset_m AS BIGINT)            AS month_offset,
           COUNT(DISTINCT o_custkey)           AS active_customers,
           CAST(SUM(cents) AS BIGINT)          AS revenue_cents
    FROM facts
    GROUP BY cohort_m, offset_m
    ORDER BY cohort_year, cohort_month, month_offset
    """,
)
def order_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort_m"))
    facts = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "cohort_m",
        (F.col("ym") - F.col("cohort_m")).alias("offset_m"),
        "cents",
    )
    return (
        facts.groupBy("cohort_m", "offset_m")
        .agg(
            F.count_distinct("o_custkey").alias("active_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            (F.col("cohort_m") / 12).cast("bigint").alias("cohort_year"),
            (F.col("cohort_m") % 12 + 1).alias("cohort_month"),
            F.col("offset_m").alias("month_offset"),
            "active_customers",
            "revenue_cents",
        )
        .orderBy("cohort_year", "cohort_month", "month_offset")
    )


# --------------------------------------------------------------------------
# Clickstream path mining: the most common opening paths (first 3 event
# types) of 30-minute-gap sessions. Same sessionization as
# `user_sessions` (lag-gap flag + running sum), then a per-session
# ordered string_agg over the first three events. Per-session state is
# bounded (3 rows survive the rank filter); the path count is a
# map-side-combinable agg on a low-cardinality key (|event_types|^3).
# --------------------------------------------------------------------------
_PATH_DEPTH = 3
_PATH_TOP = 20


@operator(
    "top_session_paths",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    ),
    ranked AS (
      SELECT user_id, sess_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, sess_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {_PATH_DEPTH}
      GROUP BY user_id, sess_id
    )
    SELECT path, COUNT(*) AS sessions
    FROM paths GROUP BY path
    ORDER BY sessions DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) >= F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= _PATH_DEPTH
    )
    paths = ranked.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("sessions"))
        .orderBy(F.col("sessions").desc(), "path")
        .limit(_PATH_TOP)
    )


# --------------------------------------------------------------------------
# Experimentation analytics: deterministic A/B assignment (md5 parity
# of user_id — the stable hash-bucketing every experiment platform
# uses) and the two-proportion z-test on purchase conversion. One
# pass to per-user conversion flags (conversion = a high-value
# purchase, value >= 95 — every user purchases SOMETHING in 30 days,
# which would degenerate the pooled SE to zero), one 2-row agg, one
# 1-row test
# computation; the z statistic and significance verdict are part of
# the differential contract (sqrt/division only — engine-exact at
# 6 decimals).
# --------------------------------------------------------------------------
@operator(
    "ab_test_conversion_ztest",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 95
                      THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT grp, COUNT(*) AS n, SUM(converted) AS conv
      FROM assigned GROUP BY grp
    ),
    w AS (
      SELECT MAX(CASE WHEN grp = 0 THEN n END)    AS n_a,
             CAST(MAX(CASE WHEN grp = 0 THEN conv END) AS BIGINT) AS conv_a,
             MAX(CASE WHEN grp = 1 THEN n END)    AS n_b,
             CAST(MAX(CASE WHEN grp = 1 THEN conv END) AS BIGINT) AS conv_b
      FROM g
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
           ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
           ROUND(
             (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score,
           abs((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
    FROM w
    """,
)
def ab_test_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    grp = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
    )
    assigned = ev.groupBy("user_id").agg(
        F.first(grp).alias("grp"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 95),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    g = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a").cast("double")
    rb = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool * (1 - pool)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    z = (ra - rb) / se
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# --------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): orders that are dominated by no other
# order on (cheaper-or-equal price, newer-or-equal date) with at least
# one strict. The classic OLAP skyline operator — computed with the
# SORT-SWEEP plan (order by price asc, keep rows whose date beats the
# running max of everything cheaper), NOT the quadratic NOT EXISTS
# self-join; the oracle IS the quadratic definition, so the sweep's
# equivalence is part of the differential contract. One global sort of
# (price, date) pairs — at 100 TB the sweep runs per range-partition
# with a second pass over the per-partition frontiers (documented;
# same algorithm shape).
# --------------------------------------------------------------------------
@operator(
    "order_skyline_2d",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders d
      WHERE d.o_totalprice <= o.o_totalprice
        AND d.o_orderdate >= o.o_orderdate
        AND (d.o_totalprice < o.o_totalprice
             OR d.o_orderdate > o.o_orderdate)
    )
    ORDER BY price
    """,
)
def order_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    # sweep over DISTINCT prices: per price, the best (max) date; a
    # price level is on the frontier iff its best date strictly beats
    # the best date of every strictly-cheaper level (rows-frame over
    # the distinct-price relation = exact strict prefix; a rows or
    # range frame over the raw table would mix equal/near prices into
    # the prefix). Rows at a frontier price survive iff they carry
    # that price's best date (equal-price older rows are dominated).
    g = o.groupBy("o_totalprice").agg(F.max("o_orderdate").alias("best_d"))
    wg = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g = g.withColumn("best_prev", F.max("best_d").over(wg))
    frontier_levels = g.filter(
        F.col("best_prev").isNull() | (F.col("best_d") > F.col("best_prev"))
    )
    frontier = o.join(
        F.broadcast(frontier_levels), "o_totalprice"
    ).filter(F.col("o_orderdate") == F.col("best_d"))
    return frontier.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    ).orderBy("price")


# --------------------------------------------------------------------------
# Time-weighted average value (TWAP shape): each event's value "holds"
# until the user's next event; the per-user average weights each value
# by its holding duration — the standard financial/telemetry mean that
# plain AVG gets wrong under irregular sampling. One lead() window per
# user (bounded partitions) + one keyed agg; integer microsecond
# durations keep the weights exact, the single final division is the
# only float step.
# --------------------------------------------------------------------------
@operator(
    "user_time_weighted_value",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
             - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS twa_value
    FROM seq WHERE dur_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def user_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "dur_us",
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_us"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Revenue inequality (Gini coefficient + top-decile share): how
# concentrated is revenue across customers — the whale-dependence
# metric behind every marketplace health dashboard. Exact integer
# formulation: per-customer revenue in cents, ranked ascending
# (custkey tie-break), G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n. All
# rank/sum math is exact integer until the two final divisions —
# sum(i*cents) is accumulated in DECIMAL(38,0) (it exceeds 2^63 past
# ~1.5M customers, where an int64 sum would throw under ANSI mode;
# DuckDB reaches the same values via HUGEINT) — so both engines agree
# exactly. The rank window runs over |customers| rows
# (dimension-sized, not the fact); at 100 TB revenue-per-customer is
# an incrementally maintained aggregate and this op reads it.
# --------------------------------------------------------------------------
@operator(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(cents) OVER () AS total
      FROM rev
    ),
    topd AS (
      SELECT SUM(CASE WHEN i > n - n // 10 THEN cents ELSE 0 END)
               AS top_cents
      FROM ranked
    )
    SELECT MAX(n) AS n_customers,
           CAST(MAX(total) AS BIGINT) AS total_cents,
           ROUND(2.0 * SUM(i * cents) / (MAX(n) * MAX(total))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
           ROUND((SELECT top_cents FROM topd)
                 / CAST(MAX(total) AS DOUBLE), 6) AS top_decile_share
    FROM ranked
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = rev.withColumn("i", F.row_number().over(w))
    totals = rev.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("cents").alias("_total")
    )
    flagged = ranked.crossJoin(F.broadcast(totals)).withColumn(
        "in_top",
        F.col("i")
        > F.col("_n") - F.floor(F.col("_n") / 10).cast("bigint"),
    )
    return flagged.groupBy("_n", "_total").agg(
        # i*cents summed over ~n^2/2 * avg(cents) exceeds int64 at
        # sf>=10 (ANSI mode would throw) — accumulate in DECIMAL(38,0),
        # the same pattern as table_checksum's 60-bit hash sum.
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)")).alias(
            "_ix"
        ),
        F.sum(F.when(F.col("in_top"), F.col("cents")).otherwise(0)).alias(
            "_top"
        ),
    ).select(
        F.col("_n").alias("n_customers"),
        F.col("_total").cast("bigint").alias("total_cents"),
        F.round(
            2.0 * F.col("_ix").cast("double")
            / (F.col("_n").cast("double") * F.col("_total").cast("double"))
            - (F.col("_n") + 1.0) / F.col("_n"),
            6,
        ).alias("gini"),
        F.round(F.col("_top") / F.col("_total").cast("double"), 6).alias(
            "top_decile_share"
        ),
    )


# --------------------------------------------------------------------------
# DAU / WAU / MAU + stickiness: the product-analytics headline. Exact
# trailing-window distinct counts computed by REPLICATING each
# (user, active-day) row into the <=7 / <=30 trailing windows it
# contributes to (explode of a date sequence) and counting distinct
# users per window day — linear in |user-days| with a bounded
# replication constant, never a day x user theta join. At extreme
# scale the 30x replication trades against the HLL-union architecture
# (`uv_sketch_union_daily`) — that op is the sketch path; this one is
# the exact path. Output trimmed to days with any activity.
# --------------------------------------------------------------------------
@operator(
    "dau_wau_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    wau AS (
      SELECT days.d, COUNT(DISTINCT ud.user_id) AS wau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - 6 AND days.d
      GROUP BY days.d
    ),
    mau AS (
      SELECT days.d, COUNT(DISTINCT ud.user_id) AS mau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - 29 AND days.d
      GROUP BY days.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           dau.dau, wau.wau, mau.mau,
           ROUND(dau.dau / CAST(mau.mau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d JOIN mau ON mau.d = dau.d
    ORDER BY day
    """,
)
def dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    days = ud.select("d").distinct()

    def trailing(n: int, name: str) -> DataFrame:
        contrib = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), n - 1))
            ).alias("wd"),
        )
        return (
            contrib.join(days, contrib.wd == days.d, "left_semi")
            .groupBy(F.col("wd").alias("d"))
            .agg(F.count_distinct("user_id").alias(name))
        )

    dau = ud.groupBy("d").agg(F.count_distinct("user_id").alias("dau"))
    wau = trailing(7, "wau")
    mau = trailing(30, "mau")
    return (
        dau.join(wau, "d")
        .join(mau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Chi-square uniformity test per channel: is activity uniform across
# the 24 hours of the day? Goodness-of-fit statistic from integer
# hourly counts (chi2 = sum((obs - exp)^2 / exp), exp = n/24), with
# the 0.05 critical value for 23 dof as the verdict. Completes the
# statistical-testing family beside the two-proportion z-test; one
# grouped count + one per-channel rollup.
# --------------------------------------------------------------------------
_CHI2_CRIT_23DOF = 35.172  # P(chi2_23 > x) = 0.05


@operator(
    "hourly_uniformity_chi2",
    oracle=f"""
    WITH hc AS (
      SELECT event_type AS channel, EXTRACT(hour FROM ts) AS h,
             COUNT(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT channel, SUM(obs) AS n FROM hc GROUP BY channel)
    SELECT hc.channel,
           CAST(MAX(tot.n) AS BIGINT) AS n_events,
           COUNT(*) AS hours_observed,
           ROUND(SUM((hc.obs - tot.n / 24.0) * (hc.obs - tot.n / 24.0)
                 / (tot.n / 24.0)), 4) AS chi2,
           SUM((hc.obs - tot.n / 24.0) * (hc.obs - tot.n / 24.0)
               / (tot.n / 24.0)) > {_CHI2_CRIT_23DOF} AS nonuniform
    FROM hc JOIN tot ON tot.channel = hc.channel
    GROUP BY hc.channel
    ORDER BY hc.channel
    """,
)
def hourly_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        F.col("event_type").alias("channel"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("obs"))
    tot = hc.groupBy("channel").agg(F.sum("obs").alias("n"))
    exp = F.col("n") / 24.0
    term = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    return (
        hc.join(F.broadcast(tot), "channel")
        .groupBy("channel")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).alias("hours_observed"),
            F.round(F.sum(term), 4).alias("chi2"),
            (F.sum(term) > _CHI2_CRIT_23DOF).alias("nonuniform"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Period-over-period growth: monthly revenue with MoM and YoY deltas —
# the reporting staple (lag 1 / lag 12 over the month series). The
# fact reduces to |months| rows first; both lags ride one window over
# that tiny series. Integer cents until the final percentage.
# --------------------------------------------------------------------------
@operator(
    "revenue_growth_mom_yoy",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(year FROM o_orderdate) * 100
             + EXTRACT(month FROM o_orderdate) AS ym,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT ym, cents,
             LAG(cents, 1) OVER (ORDER BY ym) AS prev_m,
             LAG(cents, 12) OVER (ORDER BY ym) AS prev_y
      FROM m
    )
    SELECT CAST(ym AS BIGINT) AS ym, cents,
           ROUND((cents - prev_m) / CAST(prev_m AS DOUBLE), 6) AS mom,
           ROUND((cents - prev_y) / CAST(prev_y AS DOUBLE), 6) AS yoy
    FROM l ORDER BY ym
    """,
)
def revenue_growth_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.orderBy("ym")
    l = m.withColumn("prev_m", F.lag("cents", 1).over(w)).withColumn(
        "prev_y", F.lag("cents", 12).over(w)
    )
    return l.select(
        F.col("ym").cast("bigint").alias("ym"),
        "cents",
        F.round(
            (F.col("cents") - F.col("prev_m")) / F.col("prev_m").cast("double"),
            6,
        ).alias("mom"),
        F.round(
            (F.col("cents") - F.col("prev_y")) / F.col("prev_y").cast("double"),
            6,
        ).alias("yoy"),
    ).orderBy("ym")


# --------------------------------------------------------------------------
# New vs returning users per day: split each day's actives by whether
# it is the user's first active day. First-seen is a |users|-row
# aggregate joined back to distinct user-days — at scale an
# incrementally maintained dimension (same posture as cohort
# retention, which consumes the same first-seen relation).
# --------------------------------------------------------------------------
@operator(
    "new_vs_returning_daily",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    fs AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY user_id)
    SELECT strftime(ud.d, '%Y-%m-%d') AS day,
           COUNT(CASE WHEN ud.d = fs.first_d THEN 1 END) AS new_users,
           COUNT(CASE WHEN ud.d > fs.first_d THEN 1 END) AS returning_users
    FROM ud JOIN fs ON fs.user_id = ud.user_id
    GROUP BY ud.d
    ORDER BY day
    """,
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    fs = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        ud.join(fs, "user_id")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.when(F.col("d") == F.col("first_d"), 1)).alias(
                "new_users"
            ),
            F.count(F.when(F.col("d") > F.col("first_d"), 1)).alias(
                "returning_users"
            ),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Round-5 behavioral additions. All exact-integer cores (counts /
# cents) with the ratio computed once per output row, so the
# differential is deterministic across engines.
# --------------------------------------------------------------------------
@operator(
    "session_bounce_rate",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    ),
    per_sess AS (
      SELECT user_id, sess_id,
             MIN_BY(event_type, ts) AS entry_channel,
             COUNT(*) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT entry_channel,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           ROUND(COUNT(*) FILTER (WHERE n_events = 1)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM per_sess GROUP BY 1 ORDER BY entry_channel
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry channel: 30-minute-gap sessions
    (same contract as `user_sessions`), a session is a bounce iff it
    holds exactly one event. Per-user windows only — no global sort.

    Tie-safety: MIN_BY/min_by on (ts) alone would be nondeterministic
    if two events shared a timestamp; event timestamps are unique per
    user in the fixture, and at scale the entry pick should add
    event_id to the ordering (documented, matches oracle MIN_BY)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 30 * 60 * 1_000_000
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.min_by("event_type", "ts").alias("entry_channel"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = (F.col("n_events") == 1).cast("bigint")
    return (
        per_sess.groupBy("entry_channel")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(bounce).cast("bigint").alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.round(F.col("n_bounces") / F.col("n_sessions").cast("double"), 6),
        )
        .orderBy("entry_channel")
    )


@operator(
    "pareto_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             COUNT(*) OVER ()  AS n,
             SUM(cents) OVER () AS total
      FROM rev
    )
    SELECT pct,
           CAST(rn AS BIGINT) AS top_n,
           CAST(cum AS BIGINT) AS top_cents,
           ROUND(cum / CAST(total AS DOUBLE), 6) AS share
    FROM ranked
    JOIN (SELECT UNNEST([1, 5, 10, 25, 50]) AS pct) p
      ON rn = CAST(ceil(n * pct / 100.0) AS BIGINT)
    ORDER BY pct
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration curve: the share of total revenue held by
    the top 1/5/10/25/50%% of customers. One dimension-sized window
    over per-customer rollups; cumulative sums in exact cents."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy(F.col("cents").desc(), "o_custkey")
    ranked = rev.select(
        "cents",
        F.row_number().over(w).alias("rn"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    ).crossJoin(
        F.broadcast(
            rev.agg(
                F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
            )
        )
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 25, 50)])).alias(
            "pct"
        )
    )
    return (
        ranked.join(
            F.broadcast(pcts),
            F.col("rn")
            == F.ceil(F.col("n") * F.col("pct") / 100.0).cast("bigint"),
        )
        .select(
            "pct",
            F.col("rn").cast("bigint").alias("top_n"),
            F.col("cum").cast("bigint").alias("top_cents"),
            F.round(F.col("cum") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy("pct")
    )


@operator(
    "discount_qty_slope",
    oracle="""
    WITH q AS (
      SELECT p.p_brand,
             CAST(ROUND(l.l_discount * 100) AS BIGINT) AS x,
             CAST(ROUND(l.l_quantity) AS BIGINT)       AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT)  AS n,
             CAST(SUM(x) AS BIGINT)    AS sx,
             CAST(SUM(y) AS BIGINT)    AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM q GROUP BY 1
    )
    SELECT p_brand,
           n,
           ROUND((n * sxy - sx * sy)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
    FROM s ORDER BY p_brand
    """,
)
def discount_qty_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of quantity on discount-percent per brand —
    the regression kernel (n·Sxy − SxSy)/(n·Sxx − Sx²) computed from
    exact integer sums (quantized regressors), one double division per
    brand at the end. The join broadcasts the part dim."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.round("l_quantity").cast("bigint").alias("y"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return s.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n"),
        F.round(num / den, 6).alias("slope"),
    ).orderBy("p_brand")


@operator(
    "ks_order_value_segments",
    oracle="""
    WITH tagged AS (
      SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS s1,
             CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS s2
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    ecdf AS (
      SELECT SUM(s1) OVER (ORDER BY cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             SUM(s2) OVER (ORDER BY cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
             SUM(s1) OVER () AS n1,
             SUM(s2) OVER () AS n2
      FROM tagged
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           ROUND(MAX(ABS(c1 / CAST(n1 AS DOUBLE)
                         - c2 / CAST(n2 AS DOUBLE))), 6) AS ks_stat
    FROM ecdf
    """,
)
def ks_order_value_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between BUILDING and
    MACHINERY order-value distributions. ECDF counts via a RANGE-frame
    window (ties collapse identically in both engines), exact integer
    numerators, one division per row for the sup-distance."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tagged = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            "cents",
            (F.col("c_mktsegment") == "BUILDING").cast("bigint").alias("s1"),
            (F.col("c_mktsegment") == "MACHINERY").cast("bigint").alias("s2"),
        )
    )
    wr = Window.orderBy("cents").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    ecdf = tagged.select(
        F.sum("s1").over(wr).alias("c1"),
        F.sum("s2").over(wr).alias("c2"),
        F.sum("s1").over(wall).alias("n1"),
        F.sum("s2").over(wall).alias("n2"),
    )
    return ecdf.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.round(
            F.max(
                F.abs(
                    F.col("c1") / F.col("n1").cast("double")
                    - F.col("c2") / F.col("n2").cast("double")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@operator(
    "user_activity_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, SUM(c) AS n, COUNT(*) AS n_types
      FROM counts GROUP BY 1
    )
    SELECT c.user_id,
           CAST(MAX(t.n) AS BIGINT)       AS n_events,
           CAST(MAX(t.n_types) AS BIGINT) AS n_types,
           ROUND(-SUM((c.c / CAST(t.n AS DOUBLE))
                      * ln(c.c / CAST(t.n AS DOUBLE))), 6) AS entropy
    FROM counts c JOIN tot t ON t.user_id = c.user_id
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy over the event-type distribution —
    the behavioral-diversity feature of a user-quality pipeline. The
    probabilities derive from exact integer counts; ≤5 ln terms per
    user, rounded at 6 decimals."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    j = counts.join(tot, "user_id")
    p = F.col("c") / F.col("n").cast("double")
    return (
        j.groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.max("n_types").cast("bigint").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .orderBy("user_id")
    )


@operator(
    "repeat_purchase_rate",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment, o.o_custkey, COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(COUNT(*) FILTER (WHERE n_orders >= 2) AS BIGINT)
                                    AS n_repeat,
           ROUND(COUNT(*) FILTER (WHERE n_orders >= 2)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS repeat_rate,
           ROUND(SUM(n_orders) / CAST(COUNT(*) AS DOUBLE), 6)
                                    AS avg_orders
    FROM per_cust GROUP BY 1 ORDER BY c_mktsegment
    """,
)
def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-buyer share and order frequency per market segment —
    two keyed aggregates (customer rollup, then segment rollup), the
    dim join broadcast."""
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    rep = (F.col("n_orders") >= 2).cast("bigint")
    return (
        per_cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_buyers"),
            F.sum(rep).cast("bigint").alias("n_repeat"),
            F.round(
                F.sum(rep) / F.count(F.lit(1)).cast("double"), 6
            ).alias("repeat_rate"),
            F.round(
                F.sum("n_orders") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_orders"),
        )
        .orderBy("c_mktsegment")
    )


@operator(
    "basket_size_distribution",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    )
    SELECT n_lines,
           CAST(COUNT(*) AS BIGINT)      AS n_orders,
           CAST(SUM(cents) AS BIGINT)    AS sum_cents,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents_per_order
    FROM sizes GROUP BY 1 ORDER BY n_lines
    """,
)
def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size histogram with per-size average order value — the
    distribution that bounds every pair-expansion operator (its tail
    IS the blowup factor of basket_part_pairs / the graph layer).
    Exact integer cents, integer-division average."""
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("cents"),
    )
    return (
        sizes.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.expr("sum(cents) div count(*)")
            .cast("bigint")
            .alias("avg_cents_per_order"),
        )
        .orderBy("n_lines")
    )


_MIG_CUT = "1995-07-01"


@operator(
    "customer_migration_matrix",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_MIG_CUT} 00:00:00'
                  THEN 0 ELSE 1 END AS period,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ),
    quarts AS (
      SELECT o_custkey, period,
             NTILE(4) OVER (PARTITION BY period
               ORDER BY cents DESC, o_custkey) AS q
      FROM spend
    )
    SELECT a.q AS q_before, b.q AS q_after,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM quarts a JOIN quarts b
      ON b.o_custkey = a.o_custkey AND a.period = 0 AND b.period = 1
    GROUP BY 1, 2 ORDER BY q_before, q_after
    """,
)
def customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-quartile migration across the timeline midpoint: the 4×4
    customer-value transition matrix (churn/upgrade census). NTILE
    ties broken by custkey so both engines cut identical quartiles;
    the matrix join runs on dimension-sized per-period rollups."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        (
            F.col("o_orderdate") >= F.lit(_MIG_CUT).cast("timestamp")
        ).cast("int").alias("period"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("period").orderBy(
        F.col("cents").desc(), "o_custkey"
    )
    quarts = spend.withColumn("q", F.ntile(4).over(w))
    a = quarts.filter(F.col("period") == 0).select(
        "o_custkey", F.col("q").alias("q_before")
    )
    b = quarts.filter(F.col("period") == 1).select(
        "o_custkey", F.col("q").alias("q_after")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("q_before", "q_after")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("q_before", "q_after")
    )


@operator(
    "rolling_retention_curve",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(d) AS d0 FROM user_days GROUP BY 1
    )
    SELECT offset_days,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_cohort,
           CAST(COUNT(DISTINCT CASE WHEN ud.user_id IS NOT NULL
                                    THEN f.user_id END) AS BIGINT)
                                                     AS n_retained,
           ROUND(COUNT(DISTINCT CASE WHEN ud.user_id IS NOT NULL
                                     THEN f.user_id END)
                 / CAST(COUNT(DISTINCT f.user_id) AS DOUBLE), 6)
                                                     AS retention
    FROM firsts f
    CROSS JOIN (SELECT UNNEST([1, 7, 14]) AS offset_days)
    LEFT JOIN user_days ud
      ON ud.user_id = f.user_id AND ud.d = f.d0 + to_days(offset_days::INT)
    GROUP BY 1 ORDER BY offset_days
    """,
)
def rolling_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention (N = 1, 7, 14): share of users active exactly
    N days after their first-seen day — the onboarding-health curve.
    User-day dedup first (one fact shuffle), then dimension-sized
    joins; the cohort side is per-user rows only."""
    ev = _t(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(F.min("d").alias("d0"))
    offs = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(14))).alias(
            "offset_days"
        )
    )
    probe = firsts.crossJoin(F.broadcast(offs)).withColumn(
        "target_d", F.expr("date_add(d0, offset_days)")
    )
    ud = user_days.select(
        F.col("user_id").alias("u2"), F.col("d").alias("target_d")
    )
    j = probe.join(
        ud,
        (probe.user_id == ud.u2)
        & (probe.target_d == ud.target_d),
        "left",
    )
    retained = F.when(F.col("u2").isNotNull(), F.col("user_id"))
    return (
        j.groupBy("offset_days")
        .agg(
            F.count_distinct("user_id").alias("n_cohort"),
            F.count_distinct(retained).alias("n_retained"),
            F.round(
                F.count_distinct(retained)
                / F.count_distinct("user_id").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("offset_days")
    )


_PSI_CUT = "1995-07-01"


@operator(
    "drift_psi_report",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '{_PSI_CUT} 00:00:00'
                  THEN 0 ELSE 1 END AS period,
             o_orderpriority AS bucket
      FROM orders
    ),
    counts AS (
      SELECT bucket,
             CAST(COUNT(*) FILTER (WHERE period = 0) AS BIGINT) AS c1,
             CAST(COUNT(*) FILTER (WHERE period = 1) AS BIGINT) AS c2
      FROM tagged GROUP BY 1
    ),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM counts)
    SELECT c.bucket,
           c.c1, c.c2,
           ROUND(c.c2 / CAST(t.n2 AS DOUBLE)
                 - c.c1 / CAST(t.n1 AS DOUBLE), 6)    AS share_delta,
           ROUND((c.c2 / CAST(t.n2 AS DOUBLE)
                  - c.c1 / CAST(t.n1 AS DOUBLE))
                 * ln((c.c2 / CAST(t.n2 AS DOUBLE))
                      / (c.c1 / CAST(t.n1 AS DOUBLE))), 6) AS psi_term
    FROM counts c CROSS JOIN tot t
    ORDER BY bucket
    """,
)
def drift_psi_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms for the order-priority
    distribution across the timeline midpoint — the drift monitor a
    production pipeline runs on every categorical feature before
    retraining (PSI > 0.2 = retrain). Per-bucket exact counts, one
    ln per bucket; at scale this is one map-side-combinable agg per
    monitored feature."""
    o = _t(spark, sf_dir, "orders")
    tagged = o.select(
        (
            F.col("o_orderdate") >= F.lit(_PSI_CUT).cast("timestamp")
        ).cast("int").alias("period"),
        F.col("o_orderpriority").alias("bucket"),
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum((F.col("period") == 0).cast("bigint")).alias("c1"),
        F.sum((F.col("period") == 1).cast("bigint")).alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    p1 = F.col("c1") / F.col("n1").cast("double")
    p2 = F.col("c2") / F.col("n2").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("c1").cast("bigint").alias("c1"),
            F.col("c2").cast("bigint").alias("c2"),
            F.round(p2 - p1, 6).alias("share_delta"),
            F.round((p2 - p1) * F.log(p2 / p1), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


@operator(
    "orders_benford_test",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders
      WHERE o_totalprice > 0
    ),
    counts AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS observed FROM digits GROUP BY 1
    ),
    tot AS (SELECT SUM(observed) AS n FROM counts)
    SELECT c.d AS first_digit,
           c.observed,
           ROUND(t.n * log10(1.0 + 1.0 / c.d), 2)      AS expected,
           ROUND((c.observed - t.n * log10(1.0 + 1.0 / c.d))
                 * (c.observed - t.n * log10(1.0 + 1.0 / c.d))
                 / (t.n * log10(1.0 + 1.0 / c.d)), 4)  AS chi2_term
    FROM counts c CROSS JOIN tot t
    ORDER BY first_digit
    """,
)
def orders_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity of order values — the
    forensic-QA screen for fabricated or truncated monetary data
    (synthetic uniform generators fail it loudly, which is itself the
    finding here). First digit extracted from the exact integer-cents
    string; expected counts from log10(1 + 1/d)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        1,
        1,
    ).cast("bigint")
    counts = o.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("observed")
    )
    tot = counts.agg(F.sum("observed").alias("n"))
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.col("observed").cast("bigint").alias("observed"),
            F.round(exp, 2).alias("expected"),
            F.round(
                (F.col("observed") - exp) * (F.col("observed") - exp) / exp,
                4,
            ).alias("chi2_term"),
        )
        .orderBy("first_digit")
    )


@operator(
    "events_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
      QUALIFY gap_us IS NOT NULL
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT)        AS n,
             CAST(SUM(gap_us) AS BIGINT)     AS sx,
             SUM(CAST(gap_us AS HUGEINT) * gap_us) AS sxx
      FROM gaps GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT user_id, n,
           CAST(sx // n AS BIGINT) AS mean_gap_us,
           ROUND((sqrt(CAST(sxx AS DOUBLE) / n
                       - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  - CAST(sx AS DOUBLE) / n)
                 / (sqrt(CAST(sxx AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                    + CAST(sx AS DOUBLE) / n), 6) AS burstiness
    FROM s ORDER BY user_id
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of per-user
    inter-event gaps — the bot/human discriminator (B→−1 periodic
    bot, B→0 Poisson, B→1 bursty human). Gap moments from EXACT
    wide-integer sums (gap² overflows int64 at ~70-minute gaps, so
    the squares accumulate in DECIMAL(38,0) / HUGEINT and convert to
    double once — both engines then round the identical integer);
    one sqrt per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap_us").alias("sx"),
            F.sum(
                F.col("gap_us").cast("decimal(18,0)")
                * F.col("gap_us").cast("decimal(18,0)")
            ).alias("sxx_dec"),
        )
        .filter(F.col("n") >= 2)
    )
    mu = F.col("sx").cast("double") / F.col("n")
    sig = F.sqrt(F.col("sxx_dec").cast("double") / F.col("n") - mu * mu)
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr("sx div n").cast("bigint").alias("mean_gap_us"),
        F.round((sig - mu) / (sig + mu), 6).alias("burstiness"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Signup -> first-purchase conversion latency distribution (round 7):
# per converting user, the gap between the first signup and the first
# purchase strictly after it; reported as exact interpolated
# percentiles plus the conversion rate. Completes the funnel family:
# funnel_view_click_purchase counts WHO converts, this measures HOW
# FAST. Two per-user min() aggregations on the same user_id key (AQE
# reuses the partitioning), then a percentile over |converters| gaps
# — user-dimension-sized, never fact-sized. Gap math in exact integer
# microseconds (unix_micros <-> epoch_us).
# --------------------------------------------------------------------------
@operator(
    "conversion_latency_percentiles",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id,
             MIN(epoch_us(e.ts) - epoch_us(s.t_signup)) AS gap_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t_signup
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s)  AS n_signup_users,
           CAST(COUNT(*) AS BIGINT)                  AS n_converted,
           ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 6)
             AS conversion_rate,
           ROUND(quantile_cont(gap_us, 0.5) / 1e6, 6)  AS p50_seconds,
           ROUND(quantile_cont(gap_us, 0.9) / 1e6, 6)  AS p90_seconds,
           ROUND(quantile_cont(gap_us, 0.99) / 1e6, 6) AS p99_seconds
    FROM p
    """,
)
def conversion_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdataentrytask_spark.catalog import with_event_time

    e = with_event_time(_t(spark, sf_dir, "events"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("t_signup"))
            ).alias("gap_us")
        )
    )
    n_signups = s.agg(F.count(F.lit(1)).alias("n_signup_users"))
    return (
        p.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 6).alias(
                "p50_seconds"
            ),
            F.round(F.expr("percentile(gap_us, 0.9)") / 1e6, 6).alias(
                "p90_seconds"
            ),
            F.round(F.expr("percentile(gap_us, 0.99)") / 1e6, 6).alias(
                "p99_seconds"
            ),
        )
        .crossJoin(F.broadcast(n_signups))
        .select(
            "n_signup_users",
            "n_converted",
            F.round(
                F.col("n_converted") / F.col("n_signup_users").cast("double"),
                6,
            ).alias("conversion_rate"),
            "p50_seconds",
            "p90_seconds",
            "p99_seconds",
        )
    )


# --------------------------------------------------------------------------
# Windowed strict funnel (round 7): view -> click -> purchase where
# each step must land within _FUNNEL_WINDOW of the previous step's
# entry — the product-analytics default ("converted within the
# hour"), vs funnel_view_click_purchase's unbounded variant. Same
# per-user min() chain on one key; the window bound rides the join
# predicate, state per user stays O(1).
# --------------------------------------------------------------------------
_FUNNEL_WINDOW_MIN = 60


@operator(
    "funnel_within_1h",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_1h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_1h,
           ROUND((SELECT COUNT(*) FROM c)
                 / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 6)
             AS view_to_click,
           ROUND((SELECT COUNT(*) FROM p)
                 / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 6)
             AS click_to_purchase
    """,
)
def funnel_within_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.catalog import with_event_time

    e = with_event_time(_t(spark, sf_dir, "events"))
    window = F.expr(f"INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + window)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + window)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_1h"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_1h"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_click_1h",
            "n_purchase_1h",
            F.round(
                F.col("n_click_1h") / F.col("n_view").cast("double"), 6
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchase_1h") / F.col("n_click_1h").cast("double"),
                6,
            ).alias("click_to_purchase"),
        )
    )


# --------------------------------------------------------------------------
# RFM segment transition matrix between two eras (round-8 slate):
# label every customer in 1995-1997 and again in 1998-2000 with a
# fixed-threshold RFM segment, and count the flows — the "are we
# losing champions" dashboard. Fixed thresholds (not within-era
# quantiles) keep the two labelings comparable AND the whole operator
# a pair of grouped passes + one keyed join; customers absent from an
# era get the explicit 'absent' state so the matrix rows sum to the
# full customer base. The era-pair companion to
# customer_migration_matrix (which tracks value bands).
# --------------------------------------------------------------------------
_RFM_SEG_SQL = """
    CASE WHEN n_orders >= 8 AND cents >= 15000000 THEN 'champion'
         WHEN n_orders >= 4 THEN 'loyal'
         WHEN cents >= 8000000 THEN 'big_ticket'
         ELSE 'occasional' END
"""


@operator(
    "rfm_transition_matrix",
    oracle=f"""
    WITH era AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a' ELSE 'b'
             END AS era,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    lab AS (
      SELECT o_custkey, era, {_RFM_SEG_SQL} AS seg FROM era
    ),
    a AS (SELECT o_custkey, seg FROM lab WHERE era = 'a'),
    b AS (SELECT o_custkey, seg FROM lab WHERE era = 'b')
    SELECT COALESCE(a.seg, 'absent') AS seg_from,
           COALESCE(b.seg, 'absent') AS seg_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    GROUP BY 1, 2 ORDER BY seg_from, seg_to
    """,
)
def rfm_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    era = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "a"
        ).otherwise("b").alias("era"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    lab = era.select("o_custkey", "era", F.expr(_RFM_SEG_SQL).alias("seg"))
    a = lab.filter(F.col("era") == "a").select(
        F.col("o_custkey").alias("ck_a"), F.col("seg").alias("seg_a")
    )
    b = lab.filter(F.col("era") == "b").select(
        F.col("o_custkey").alias("ck_b"), F.col("seg").alias("seg_b")
    )
    j = a.join(b, a.ck_a == b.ck_b, "full_outer")
    return (
        j.groupBy(
            F.coalesce("seg_a", F.lit("absent")).alias("seg_from"),
            F.coalesce("seg_b", F.lit("absent")).alias("seg_to"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )


# --------------------------------------------------------------------------
# Top-k rank stability between two eras (round-8 slate): overlap@k of
# the parts ranked by revenue in 1995-1997 vs 1998-2000, for k in
# {5, 10, 20} — the cheap rank-drift monitor a feature store runs on
# "top sellers" style lists (overlap collapse = the list is churning
# and cached rankings are stale). Rankings are totally ordered (cents
# DESC, partkey), the k-cut happens on a part-level aggregate, and
# the overlap is an exact integer join count.
# --------------------------------------------------------------------------
@operator(
    "topk_rank_stability",
    oracle="""
    WITH pr AS (
      SELECT l.l_partkey AS part,
             CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01' THEN 'a'
                  ELSE 'b' END AS era,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT part, era,
             ROW_NUMBER() OVER (PARTITION BY era
                                ORDER BY cents DESC, part) AS rnk
      FROM pr
    ),
    ks AS (SELECT UNNEST([5, 10, 20]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(b.part) AS BIGINT) AS n_common,
           ROUND(CAST(COUNT(b.part) AS DOUBLE) / ks.k, 6) AS overlap_at_k
    FROM ranked a
    CROSS JOIN ks
    LEFT JOIN ranked b
      ON b.era = 'b' AND b.part = a.part AND b.rnk <= ks.k
    WHERE a.era = 'a' AND a.rnk <= ks.k
    GROUP BY ks.k ORDER BY k
    """,
)
def topk_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pr = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.when(
                F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
                "a",
            ).otherwise("b").alias("era"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("era").orderBy(F.col("cents").desc(), "part")
    ranked = pr.select("part", "era", F.row_number().over(w).alias("rnk"))
    ks = spark.range(3).select(
        F.when(F.col("id") == 0, 5)
        .when(F.col("id") == 1, 10)
        .otherwise(20)
        .alias("k")
    )
    a = ranked.filter(F.col("era") == "a").select(
        F.col("part").alias("pa"), F.col("rnk").alias("rnk_a")
    )
    b = ranked.filter(F.col("era") == "b").select(
        F.col("part").alias("pb"), F.col("rnk").alias("rnk_b")
    )
    j = (
        a.crossJoin(F.broadcast(ks))
        .filter(F.col("rnk_a") <= F.col("k"))
        .join(
            b,
            (F.col("pb") == F.col("pa")) & (F.col("rnk_b") <= F.col("k")),
            "left",
        )
    )
    return (
        j.groupBy("k")
        .agg(F.count("pb").cast("bigint").alias("n_common"))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_common",
            F.round(F.col("n_common").cast("double") / F.col("k"), 6).alias(
                "overlap_at_k"
            ),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Channel audience-overlap matrix (round-8 slate): for every pair of
# event channels, the exact co-audience count and Jaccard — the
# "are these channels reaching the same users" planning table. The
# per-(user, channel) distinct pass is fact-scale; everything after
# runs on the channel-pair domain (10 pairs), with per-channel
# audience sizes broadcast. A user-dimension twin of
# keyword_cooccurrence_pmi's document-dimension co-occurrence.
# --------------------------------------------------------------------------
@operator(
    "channel_audience_overlap",
    oracle="""
    WITH uc AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM uc GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS channel_a, b.event_type AS channel_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM uc a JOIN uc b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT channel_a, channel_b, n_both,
           sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
             AS audience_jaccard
    FROM pairs
    JOIN sizes sa ON sa.event_type = channel_a
    JOIN sizes sb ON sb.event_type = channel_b
    ORDER BY channel_a, channel_b
    """,
)
def channel_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uc = ev.select("user_id", "event_type").distinct()
    sizes = uc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = uc.select("user_id", F.col("event_type").alias("channel_a"))
    b = uc.select("user_id", F.col("event_type").alias("channel_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("channel_a") < F.col("channel_b"))
        .groupBy("channel_a", "channel_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("channel_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("channel_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "channel_a")
        .join(F.broadcast(sb), "channel_b")
        .select(
            "channel_a",
            "channel_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("audience_jaccard"),
        )
        .orderBy("channel_a", "channel_b")
    )


# --------------------------------------------------------------------------
# Sequential-pattern support for ordered type pairs (a then b, any
# gap): a user supports (a -> b) iff their EARLIEST a strictly
# precedes their LATEST b — an existence test that needs only per-
# (user, type) min/max timestamps, never a pairwise event join (the
# classic sequence-mining support reduction). Confidence and lift
# come from the same per-type user counts. Differs from
# event_transition_matrix (ADJACENT steps only) and
# funnel_within_1h (fixed 3-stage window): this measures unordered-
# gap precedence for all 20 directed type pairs.
# Scale: one keyed agg to |users x types| rows, then a per-user join
# with a bounded 5x5 fanout; counts are exact integers.
# --------------------------------------------------------------------------
@operator(
    "sequential_pattern_support",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
    ), per_type AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1
    ), seq AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             CAST(COUNT(*) AS BIGINT) AS n_seq
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id
       AND a.event_type <> b.event_type
       AND a.first_ts < b.last_ts
      GROUP BY 1, 2
    )
    SELECT s.antecedent, s.consequent, s.n_seq,
           pa.n_t AS n_users_a, pb.n_t AS n_users_b,
           ROUND(CAST(s.n_seq AS DOUBLE) / tot.n_users, 6)      AS support,
           ROUND(CAST(s.n_seq AS DOUBLE) / pa.n_t, 6)           AS confidence,
           ROUND((CAST(s.n_seq AS DOUBLE) / pa.n_t)
                 / (CAST(pb.n_t AS DOUBLE) / tot.n_users), 6)   AS lift
    FROM seq s
    JOIN per_type pa ON pa.event_type = s.antecedent
    JOIN per_type pb ON pb.event_type = s.consequent
    CROSS JOIN tot
    ORDER BY s.antecedent, s.consequent
    """,
)
def sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    tot = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    a = ut.select(
        "user_id", F.col("event_type").alias("antecedent"),
        F.col("first_ts").alias("a_first"),
    )
    b = ut.select(
        "user_id", F.col("event_type").alias("consequent"),
        F.col("last_ts").alias("b_last"),
    )
    seq = (
        a.join(b, "user_id")
        .filter(
            (F.col("antecedent") != F.col("consequent"))
            & (F.col("a_first") < F.col("b_last"))
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_seq"))
    )
    pa = per_type.select(
        F.col("event_type").alias("antecedent"), F.col("n_t").alias("n_users_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("consequent"), F.col("n_t").alias("n_users_b")
    )
    out = (
        seq.join(F.broadcast(pa), "antecedent")
        .join(F.broadcast(pb), "consequent")
        .crossJoin(F.broadcast(tot))
    )
    return out.select(
        "antecedent", "consequent", "n_seq", "n_users_a", "n_users_b",
        F.round(F.col("n_seq").cast("double") / F.col("n_users"), 6)
        .alias("support"),
        F.round(F.col("n_seq").cast("double") / F.col("n_users_a"), 6)
        .alias("confidence"),
        F.round(
            (F.col("n_seq").cast("double") / F.col("n_users_a"))
            / (F.col("n_users_b").cast("double") / F.col("n_users")), 6
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


# --------------------------------------------------------------------------
# Recommender holdout eval: hit-rate@3 of the co-occurrence
# recommender under a TEMPORAL split — train co-purchase counts on
# orders before 2001-01-01, recommend each part's top-3 co-parts
# (count desc, part asc — total order), then ask, for every
# (test-order, part) unit in the holdout, whether ANY other part of
# that order appears in the part's top-3. The eval that makes
# part_recommendations (the model) falsifiable. Coverage = units
# whose anchor part was seen in training. Pair expansion is a keyed
# self-join on the order key (per-key fanout bounded by basket^2,
# TPC-H baskets <= 7); the rec table is |parts| x 3 and the final
# join is keyed on (a, b).
# --------------------------------------------------------------------------
_RECS_CUTOFF = "2001-01-01"


@operator(
    "recsys_hitrate_eval",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey, o.o_orderdate
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    train_pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      WHERE a.o_orderdate < TIMESTAMP '{_RECS_CUTOFF}'
      GROUP BY 1, 2
    ),
    recs AS (
      SELECT pa, pb FROM (
        SELECT pa, pb,
               ROW_NUMBER() OVER (PARTITION BY pa
                                  ORDER BY w DESC, pb) AS rnk
        FROM train_pairs
      ) WHERE rnk <= 3
    ),
    test_orders AS (
      SELECT l_orderkey FROM items
      WHERE o_orderdate >= TIMESTAMP '{_RECS_CUTOFF}'
      GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    test_units AS (
      SELECT i.l_orderkey, i.l_partkey
      FROM items i JOIN test_orders t ON t.l_orderkey = i.l_orderkey
    ),
    cand AS (
      SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
      FROM test_units a JOIN test_units b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    unit_hits AS (
      SELECT c.l_orderkey, c.pa,
             MAX(CASE WHEN r.pa IS NOT NULL THEN 1 ELSE 0 END) AS hit
      FROM cand c LEFT JOIN recs r ON r.pa = c.pa AND r.pb = c.pb
      GROUP BY 1, 2
    ),
    cov AS (
      SELECT u.l_orderkey, u.l_partkey,
             CASE WHEN EXISTS (SELECT 1 FROM recs r
                               WHERE r.pa = u.l_partkey)
                  THEN 1 ELSE 0 END AS covered
      FROM test_units u
    )
    SELECT
      CAST((SELECT COUNT(DISTINCT l_orderkey) FROM items
            WHERE o_orderdate < TIMESTAMP '{_RECS_CUTOFF}') AS BIGINT)
        AS n_train_orders,
      CAST((SELECT COUNT(*) FROM test_orders) AS BIGINT) AS n_test_orders,
      CAST((SELECT COUNT(*) FROM unit_hits) AS BIGINT)   AS n_units,
      CAST((SELECT SUM(covered) FROM cov) AS BIGINT)     AS n_covered,
      CAST((SELECT SUM(hit) FROM unit_hits) AS BIGINT)   AS n_hits,
      ROUND((SELECT SUM(hit) FROM unit_hits)
            / CAST((SELECT COUNT(*) FROM unit_hits) AS DOUBLE), 6)
        AS hitrate_at_3,
      ROUND((SELECT SUM(covered) FROM cov)
            / CAST((SELECT COUNT(*) FROM cov) AS DOUBLE), 6)
        AS coverage
    """,
)
def recsys_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdataentrytask_spark.operators import materialize, with_persisted

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # four branches (train-pair mining, test candidating, coverage,
    # the census counts) all start from the same distinct+join —
    # persist it (and the two mid-tier tables each consumed 2-3x) so
    # the fact scan and the pair shuffles run ONCE, then release
    # everything and return the 1-row summary (VERDICT r7 item 5:
    # this was the registry's busiest plan at 24 exchanges)
    items = (
        li.distinct()
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_partkey", "o_orderdate")
    )
    with with_persisted(items):
        train = items.filter(F.col("o_orderdate") < _RECS_CUTOFF)
        ta = train.select("l_orderkey", F.col("l_partkey").alias("pa"))
        tb = train.select("l_orderkey", F.col("l_partkey").alias("pb"))
        train_pairs = (
            ta.join(tb, "l_orderkey")
            .filter(F.col("pa") != F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        )
        recs = (
            train_pairs.select(
                "pa", "pb",
                F.row_number()
                .over(Window.partitionBy("pa").orderBy(F.desc("w"), "pb"))
                .alias("rnk"),
            )
            .filter(F.col("rnk") <= 3)
            .select("pa", "pb")
        )
        test = items.filter(F.col("o_orderdate") >= _RECS_CUTOFF)
        test_orders = (
            test.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("np"))
            .filter(F.col("np") >= 2)
            .select("l_orderkey")
        )
        units = test.join(test_orders, "l_orderkey").select(
            "l_orderkey", "l_partkey"
        )
        with with_persisted(recs, units):
            ca = units.select("l_orderkey", F.col("l_partkey").alias("pa"))
            cb = units.select("l_orderkey", F.col("l_partkey").alias("pb"))
            cand = ca.join(cb, "l_orderkey").filter(F.col("pa") != F.col("pb"))
            hit_flag = recs.withColumn("is_rec", F.lit(1))
            unit_hits = (
                cand.join(hit_flag, ["pa", "pb"], "left")
                .groupBy("l_orderkey", "pa")
                .agg(F.max(F.coalesce("is_rec", F.lit(0))).alias("hit"))
            )
            rec_parts = recs.select("pa").distinct().withColumn("cov", F.lit(1))
            cov = units.join(
                rec_parts, units.l_partkey == rec_parts.pa, "left"
            ).select(F.coalesce("cov", F.lit(0)).alias("covered"))
            out = (
                train.select("l_orderkey").distinct()
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_train_orders"))
                .crossJoin(
                    test_orders.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_test_orders")
                    )
                )
                .crossJoin(
                    unit_hits.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_units"),
                        F.sum("hit").cast("bigint").alias("n_hits"),
                    )
                )
                .crossJoin(
                    cov.agg(F.sum("covered").cast("bigint").alias("n_covered"),
                            F.count(F.lit(1)).alias("n_cov_units"))
                )
            )
            return materialize(
                out.select(
                    "n_train_orders", "n_test_orders", "n_units", "n_covered",
                    "n_hits",
                    F.round(
                        F.col("n_hits").cast("double") / F.col("n_units"), 6
                    ).alias("hitrate_at_3"),
                    F.round(
                        F.col("n_covered").cast("double") / F.col("n_cov_units"),
                        6,
                    ).alias("coverage"),
                )
            )


# --------------------------------------------------------------------------
# ABC-XYZ inventory matrix: revenue concentration class (A/B/C by
# cumulative revenue share 80/95) crossed with demand-variability
# class (X/Y/Z by the coefficient of variation of MONTHLY quantity,
# cv < 0.5 / < 1.0 / rest) — the 9-cell planning matrix that says
# which parts deserve forecasting effort. Revenue ranking is a
# window over the |parts| domain; CV comes from exact integer moment
# sums over (part, month) quantities with months-ACTIVE as the
# denominator (documented choice: zero-months excluded). Census
# output: 9 rows of (abc, xyz, n_parts, revenue share).
# --------------------------------------------------------------------------
@operator(
    "abc_xyz_matrix",
    oracle="""
    WITH pm AS (
      SELECT l_partkey,
             date_trunc('month', l_shipdate) AS m,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ), per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT)  AS n_m,
             CAST(SUM(q) AS BIGINT)    AS sq,
             SUM(CAST(q AS HUGEINT) * q) AS sq2,
             CAST(SUM(cents) AS BIGINT) AS revenue
      FROM pm GROUP BY 1
    ), ranked AS (
      SELECT l_partkey, n_m, sq, sq2, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum_rev,
             SUM(revenue) OVER ()                                 AS tot_rev
      FROM per_part
    ), classed AS (
      SELECT CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
                       <= 0.80 THEN 'A'
                  WHEN CAST(cum_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE)
                       <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN n_m < 2 THEN 'Z'
                  WHEN sqrt(GREATEST((n_m * CAST(sq2 AS DOUBLE)
                                      - CAST(sq AS DOUBLE) * sq)
                                     / (CAST(n_m AS DOUBLE) * (n_m - 1)), 0.0))
                       / (CAST(sq AS DOUBLE) / n_m) < 0.5 THEN 'X'
                  WHEN sqrt(GREATEST((n_m * CAST(sq2 AS DOUBLE)
                                      - CAST(sq AS DOUBLE) * sq)
                                     / (CAST(n_m AS DOUBLE) * (n_m - 1)), 0.0))
                       / (CAST(sq AS DOUBLE) / n_m) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz,
             revenue, tot_rev
      FROM ranked
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(revenue) AS DOUBLE) / CAST(MAX(tot_rev) AS DOUBLE),
                 6) AS revenue_share
    FROM classed GROUP BY 1, 2 ORDER BY abc, xyz
    """,
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.round("l_quantity").cast("bigint")).cast("bigint").alias("q"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint").alias("cents"),
    )
    per_part = pm.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_m"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sq2"),
        F.sum("cents").cast("bigint").alias("revenue"),
    )
    wr = Window.orderBy(F.desc("revenue"), "l_partkey")
    ranked = per_part.select(
        "n_m", "sq", "sq2", "revenue",
        F.sum("revenue").over(wr).alias("cum_rev"),
        F.sum("revenue").over(Window.partitionBy()).alias("tot_rev"),
    )
    share = F.col("cum_rev").cast("double") / F.col("tot_rev").cast("double")
    n_m = F.col("n_m")
    cv = (
        F.sqrt(
            F.greatest(
                (n_m * F.col("sq2").cast("double")
                 - F.col("sq").cast("double") * F.col("sq"))
                / (n_m.cast("double") * (n_m - 1)),
                F.lit(0.0),
            )
        )
        / (F.col("sq").cast("double") / n_m)
    )
    classed = ranked.select(
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
        .alias("abc"),
        F.when(n_m < 2, "Z")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "revenue", "tot_rev",
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum("revenue").cast("double")
                / F.max("tot_rev").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc", "xyz")
    )


# --------------------------------------------------------------------------
# Sample-ratio mismatch (SRM) check: the first thing every A/B
# readout must pass — does the 50/50 hash split actually produce
# 50/50 units? chi2 (1 df) = (n_a - n_b)^2 / n, flagged at the
# conventional p < 0.001 boundary (chi2 > 10.827566, a precomputed
# literal — no CDF call on either engine). Uses the same md5-parity
# arm as ratio_metric_delta_ci / sequential_ab_obrien_fleming, so an
# SRM here invalidates THOSE readouts specifically.
# --------------------------------------------------------------------------
@operator(
    "sample_ratio_mismatch",
    oracle="""
    WITH pu AS (
      SELECT DISTINCT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 AS arm
      FROM events
    ), m AS (
      SELECT CAST(count_if(arm = 0) AS BIGINT) AS n_a,
             CAST(count_if(arm = 1) AS BIGINT) AS n_b
      FROM pu
    )
    SELECT n_a, n_b, n_a + n_b AS n_total,
           ROUND(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS split_a,
           ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
             AS chi2,
           CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
                     > 10.827566 THEN 1 ELSE 0 END AS srm_flag
    FROM m
    """,
)
def sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
               16, 10).cast("bigint") % 2
    )
    m = ev.select(arm.alias("arm")).agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    chi2 = ((n_a - n_b) * (n_a - n_b)).cast("double") / (n_a + n_b)
    return m.select(
        "n_a", "n_b", (n_a + n_b).alias("n_total"),
        F.round(n_a.cast("double") / (n_a + n_b), 6).alias("split_a"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 10.827566, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


# --------------------------------------------------------------------------
# Churn-definition sensitivity sweep: "churned = inactive >= k days"
# for k in {7, 14, 21}, measured against the corpus end time — the
# audit that shows how much the headline churn rate is an artifact
# of the chosen threshold. One per-user last-activity reduction,
# exact integer day gaps (epoch-microsecond arithmetic), three
# thresholds as conditional aggregates + stack().
# --------------------------------------------------------------------------
@operator(
    "churn_threshold_sweep",
    oracle="""
    WITH pu AS (
      SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY 1
    ), ref AS (
      SELECT MAX(last_ts) AS end_ts FROM pu
    ), gaps AS (
      SELECT (epoch_us(ref.end_ts) - epoch_us(pu.last_ts))
             // 86400000000 AS gap_days
      FROM pu CROSS JOIN ref
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(count_if(gap_days >= 7) AS BIGINT)  AS c7,
             CAST(count_if(gap_days >= 14) AS BIGINT) AS c14,
             CAST(count_if(gap_days >= 21) AS BIGINT) AS c21
      FROM gaps
    )
    SELECT k, n_users, churned,
           ROUND(CAST(churned AS DOUBLE) / n_users, 6) AS churn_rate
    FROM (
      SELECT 7 AS k, n_users, c7 AS churned FROM m
      UNION ALL SELECT 14, n_users, c14 FROM m
      UNION ALL SELECT 21, n_users, c21 FROM m
    ) ORDER BY k
    """,
)
def churn_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    pu = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    ref = pu.agg(F.max("last_ts").alias("end_ts"))
    gaps = pu.crossJoin(F.broadcast(ref)).select(
        F.expr(
            "(unix_micros(end_ts) - unix_micros(last_ts)) div 86400000000"
        ).alias("gap_days")
    )
    m = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count(F.when(F.col("gap_days") >= 7, 1)).cast("bigint").alias("c7"),
        F.count(F.when(F.col("gap_days") >= 14, 1)).cast("bigint").alias("c14"),
        F.count(F.when(F.col("gap_days") >= 21, 1)).cast("bigint").alias("c21"),
    )
    stacked = m.select(
        F.expr("stack(3, 7, c7, 14, c14, 21, c21) AS (k, churned)"),
        "n_users",
    )
    return stacked.select(
        F.col("k").cast("int").alias("k"),
        "n_users",
        F.col("churned").cast("bigint").alias("churned"),
        F.round(F.col("churned").cast("double") / F.col("n_users"), 6)
        .alias("churn_rate"),
    ).orderBy("k")


# --------------------------------------------------------------------------
# Price-volume bridge (Laspeyres decomposition) of the 1999 -> 2000
# revenue change: for parts sold in BOTH years, split the delta into
# price effect (q1 * dp), volume effect (p1 * dq) and the joint term,
# and account separately for entering/exiting parts — the FP&A
# reconciliation that must sum EXACTLY back to the total change.
# Per-part effects are rational (rev/q); each part's price and
# volume terms are snapped onto the 1e-6-cent grid and the joint
# term is derived ON the grid (rev ints minus the two snapped
# terms), so the bridge closes to the cent by construction and the
# cross-part sums are order-free integers.
# --------------------------------------------------------------------------
@operator(
    "price_volume_bridge",
    oracle="""
    WITH yearly AS (
      SELECT l_partkey, year(l_shipdate) AS y,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem WHERE year(l_shipdate) IN (1999, 2000)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT l_partkey,
             MAX(CASE WHEN y = 1999 THEN q END)   AS q1,
             MAX(CASE WHEN y = 1999 THEN rev END) AS r1,
             MAX(CASE WHEN y = 2000 THEN q END)   AS q2,
             MAX(CASE WHEN y = 2000 THEN rev END) AS r2
      FROM yearly GROUP BY 1
    ),
    common AS (
      SELECT
        CAST(ROUND((CAST(q1 AS DOUBLE) * r2 / q2 - r1) * 1000000.0)
             AS BIGINT) AS price_g,
        CAST(ROUND((CAST(r1 AS DOUBLE) * q2 / q1 - r1) * 1000000.0)
             AS BIGINT) AS vol_g,
        (r2 - r1) * 1000000 AS delta_g
      FROM w WHERE q1 IS NOT NULL AND q2 IS NOT NULL
    ),
    sums AS (
      SELECT CAST(SUM(price_g) AS BIGINT)                   AS price_g,
             CAST(SUM(vol_g) AS BIGINT)                     AS vol_g,
             CAST(SUM(delta_g - price_g - vol_g) AS BIGINT) AS joint_g,
             CAST(SUM(delta_g) AS BIGINT)                   AS delta_common_g
      FROM common
    ),
    edges AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN q1 IS NULL THEN r2 END), 0)
                  AS BIGINT) AS entered_cents,
             CAST(COALESCE(SUM(CASE WHEN q2 IS NULL THEN r1 END), 0)
                  AS BIGINT) AS exited_cents,
             CAST(COALESCE(SUM(r1), 0) AS BIGINT) AS rev1_cents,
             CAST(COALESCE(SUM(r2), 0) AS BIGINT) AS rev2_cents
      FROM w
    )
    SELECT e.rev1_cents, e.rev2_cents,
           CAST(e.rev2_cents - e.rev1_cents AS BIGINT)      AS delta_cents,
           ROUND(s.price_g / 1000000.0 / 100.0, 6)          AS price_effect,
           ROUND(s.vol_g / 1000000.0 / 100.0, 6)            AS volume_effect,
           ROUND(s.joint_g / 1000000.0 / 100.0, 6)          AS joint_effect,
           ROUND(e.entered_cents / 100.0, 6)                AS entered_revenue,
           ROUND(e.exited_cents / 100.0, 6)                 AS exited_revenue,
           ROUND((s.delta_common_g / 1000000.0
                  + e.entered_cents - e.exited_cents) / 100.0, 6)
             AS bridge_total
    FROM sums s CROSS JOIN edges e
    """,
)
def price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    yearly = (
        li.filter(F.year("l_shipdate").isin(1999, 2000))
        .groupBy("l_partkey", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.round("l_quantity").cast("bigint")).cast("bigint")
            .alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint").alias("rev"),
        )
    )
    w = yearly.groupBy("l_partkey").agg(
        F.max(F.when(F.col("y") == 1999, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("y") == 1999, F.col("rev"))).alias("r1"),
        F.max(F.when(F.col("y") == 2000, F.col("q"))).alias("q2"),
        F.max(F.when(F.col("y") == 2000, F.col("rev"))).alias("r2"),
    )
    common = w.filter(
        F.col("q1").isNotNull() & F.col("q2").isNotNull()
    ).select(
        F.round(
            (F.col("q1").cast("double") * F.col("r2") / F.col("q2")
             - F.col("r1")) * 1000000.0
        ).cast("bigint").alias("price_g"),
        F.round(
            (F.col("r1").cast("double") * F.col("q2") / F.col("q1")
             - F.col("r1")) * 1000000.0
        ).cast("bigint").alias("vol_g"),
        ((F.col("r2") - F.col("r1")) * 1000000).alias("delta_g"),
    )
    sums = common.agg(
        F.sum("price_g").cast("bigint").alias("price_g"),
        F.sum("vol_g").cast("bigint").alias("vol_g"),
        F.sum(F.col("delta_g") - F.col("price_g") - F.col("vol_g"))
        .cast("bigint").alias("joint_g"),
        F.sum("delta_g").cast("bigint").alias("delta_common_g"),
    )
    edges = w.agg(
        F.coalesce(F.sum(F.when(F.col("q1").isNull(), F.col("r2"))), F.lit(0))
        .cast("bigint").alias("entered_cents"),
        F.coalesce(F.sum(F.when(F.col("q2").isNull(), F.col("r1"))), F.lit(0))
        .cast("bigint").alias("exited_cents"),
        F.coalesce(F.sum("r1"), F.lit(0)).cast("bigint").alias("rev1_cents"),
        F.coalesce(F.sum("r2"), F.lit(0)).cast("bigint").alias("rev2_cents"),
    )
    out = sums.crossJoin(edges)
    return out.select(
        "rev1_cents", "rev2_cents",
        (F.col("rev2_cents") - F.col("rev1_cents")).cast("bigint")
        .alias("delta_cents"),
        F.round(F.col("price_g") / 1000000.0 / 100.0, 6).alias("price_effect"),
        F.round(F.col("vol_g") / 1000000.0 / 100.0, 6).alias("volume_effect"),
        F.round(F.col("joint_g") / 1000000.0 / 100.0, 6).alias("joint_effect"),
        F.round(F.col("entered_cents") / 100.0, 6).alias("entered_revenue"),
        F.round(F.col("exited_cents") / 100.0, 6).alias("exited_revenue"),
        F.round(
            (F.col("delta_common_g") / 1000000.0
             + F.col("entered_cents") - F.col("exited_cents")) / 100.0, 6
        ).alias("bridge_total"),
    )
