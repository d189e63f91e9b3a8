"""Time-series operators over the event stream: calendar gap-fill and
hypertable-style OHLC downsampling.

The reference's batch layer only aggregates hours that HAVE data
(/root/reference/doc/temp.md:509-530 — its GROUP BY silently skips
empty buckets); these operators add the densified forms a monitoring /
feature-engineering pipeline needs: an explicit zero row for every
(bucket, key) cell, and first/last-in-bucket selection (open/close)
without a sort-the-world window.

Scale posture (100 TB):
* `events_gap_fill` reduces the fact to per-(day, type) partial counts
  FIRST (map-side combinable, one shuffle on a tiny key space); the
  dense calendar grid is |days| x |types| rows — thousands — built
  from the aggregate's own min/max bounds and broadcast-joined back.
  No shuffle ever touches the dense side.
* `events_ohlc_hour` is a single-pass grouped aggregation using
  min_by/max_by over a (ts, event_id) tie-break struct — the cheapest
  argmax at scale (partial aggregates, no ROW_NUMBER shuffle+sort of
  the raw stream). The oracle uses the equivalent ROW_NUMBER
  formulation, proving the two plans agree.
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
# Calendar gap-fill: daily event counts per type, with an explicit 0 row
# for every (day, type) cell of the full [min_day, max_day] calendar.
# --------------------------------------------------------------------------
@operator(
    "events_gap_fill",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT MIN(d) AS lo, MAX(d) AS hi FROM c
    ), cal AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM b
    ), ty AS (
      SELECT DISTINCT event_type FROM c
    )
    SELECT strftime(cal.d, '%Y-%m-%d') AS day,
           ty.event_type               AS event_type,
           COALESCE(c.cnt, 0)          AS cnt
    FROM cal CROSS JOIN ty
    LEFT JOIN c ON c.d = cal.d AND c.event_type = ty.event_type
    ORDER BY day, event_type
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    counts = ev.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    bounds = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    types = counts.select("event_type").distinct()
    grid = calendar.crossJoin(types)
    # counts is post-aggregation (<= |days| x |types| rows) — broadcast
    # the probe side so the dense grid never shuffles.
    return (
        grid.join(F.broadcast(counts), ["d", "event_type"], "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# OHLC downsample: per (event_type, hour) the first/last/min/max of
# `value`, first/last picked by (ts, event_id) — deterministic even
# under timestamp collisions.
# --------------------------------------------------------------------------
@operator(
    "events_ohlc_hour",
    oracle="""
    WITH base AS (
      SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
      FROM events
    ), rn AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, h
                                ORDER BY ts, event_id)            AS rf,
             ROW_NUMBER() OVER (PARTITION BY event_type, h
                                ORDER BY ts DESC, event_id DESC)  AS rl
      FROM base
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S')               AS hour,
           ROUND(MIN(CASE WHEN rf = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4)                           AS high,
           ROUND(MIN(value), 4)                           AS low,
           ROUND(MIN(CASE WHEN rl = 1 THEN value END), 4) AS close,
           COUNT(*)                                       AS n
    FROM rn GROUP BY 1, 2
    ORDER BY event_type, hour
    """,
)
def events_ohlc_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        "ts",
        "event_id",
        "value",
    )
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", "h")
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
        .orderBy("event_type", "hour")
    )


# --------------------------------------------------------------------------
# Interval concurrency (order backlog): how many orders are "open" on
# each day — opened at o_orderdate, closed at the order's last
# lineitem shipdate. The classic concurrent-intervals pattern: fold
# every interval into (+1 at open, -1 after close) delta events, one
# keyed agg to per-day net deltas, one cumulative window over the
# (tiny) day domain. Never a day x interval join — the fact is
# touched twice (open scan, close agg) and everything after is
# |days|-sized.
# --------------------------------------------------------------------------
@operator(
    "order_backlog_timeseries",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey AS okey, MAX(l_shipdate) AS close_d
      FROM lineitem GROUP BY 1
    ),
    deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta
      FROM orders JOIN closes ON okey = o_orderkey
      UNION ALL
      SELECT CAST(close_d AS DATE) + 1, -1
      FROM orders JOIN closes ON okey = o_orderkey
    ),
    daily AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_orders
    FROM daily
    ORDER BY day
    """,
)
def order_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    closes = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_shipdate").alias("close_d"))
    )
    spans = orders.join(closes, "o_orderkey")
    opens = spans.select(F.to_date("o_orderdate").alias("d"), F.lit(1).alias("delta"))
    shuts = spans.select(
        F.date_add(F.to_date("close_d"), 1).alias("d"), F.lit(-1).alias("delta")
    )
    daily = (
        opens.unionByName(shuts)
        .groupBy("d")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("open_orders", F.sum("net").over(w).cast("bigint"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "open_orders")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Interval (range) containment join WITHOUT an equi key: orders joined
# to overlapping promotion windows by date containment alone. The
# promo dimension is generated deterministically (24 windows, 14-day
# stride, 21-day span — consecutive windows genuinely OVERLAP by 7
# days, so one order can match several promos, and windows cross
# month boundaries, so no single calendar bucket contains a window).
#
# The naive plan for a pure range predicate is a nested-loop join —
# O(|fact| x |intervals|), the classic range-join trap. The engine
# uses the BUCKETED range join: each interval is exploded into the
# months it spans (bounded fan-out: 21-day windows touch <= 2
# months), the fact equi-joins on its own month bucket, and the exact
# containment predicate runs as a residual filter. The plan is a
# broadcast/shuffle HASH join on the bucket — survives a 100x fact
# scale-up where the nested loop dies. The oracle states the naive
# range join directly; agreement proves bucketing loses no pairs
# (every [start, end) window is fully covered by its month buckets).
# --------------------------------------------------------------------------
_RJ_N_PROMOS = 24
# stride < span: adjacent windows share a 7-day overlap, so the
# one-order-to-many-promos path of the join is actually exercised
_RJ_STRIDE_DAYS = 14
_RJ_SPAN_DAYS = 21
_RJ_BASE = "1995-01-01"


@operator(
    "range_interval_join",
    oracle=f"""
    WITH promos AS (
      SELECT range AS promo_id,
             TIMESTAMP '{_RJ_BASE} 00:00:00'
               + to_days((range * {_RJ_STRIDE_DAYS})::INT) AS start_ts,
             TIMESTAMP '{_RJ_BASE} 00:00:00'
               + to_days((range * {_RJ_STRIDE_DAYS}
                          + {_RJ_SPAN_DAYS})::INT) AS end_ts
      FROM range({_RJ_N_PROMOS})
    )
    SELECT p.promo_id,
           strftime(p.start_ts, '%Y-%m-%d') AS start_day,
           COUNT(o.o_orderkey)              AS n_orders,
           ROUND(SUM(o.o_totalprice), 2)    AS revenue
    FROM promos p
    LEFT JOIN orders o
      ON o.o_orderdate >= p.start_ts AND o.o_orderdate < p.end_ts
    GROUP BY 1, 2
    ORDER BY promo_id
    """,
)
def range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.date_trunc("month", "o_orderdate").alias("bucket"),
    )
    promos = spark.range(_RJ_N_PROMOS).select(
        F.col("id").alias("promo_id"),
        F.date_add(
            F.lit(_RJ_BASE).cast("date"), (F.col("id") * _RJ_STRIDE_DAYS).cast("int")
        )
        .cast("timestamp_ntz")
        .alias("start_ts"),
        F.date_add(
            F.lit(_RJ_BASE).cast("date"),
            (F.col("id") * _RJ_STRIDE_DAYS + _RJ_SPAN_DAYS).cast("int"),
        )
        .cast("timestamp_ntz")
        .alias("end_ts"),
    )
    # bucketed form: explode each interval to the month buckets it
    # touches (sequence of month starts), equi-join on the bucket,
    # exact containment as residual
    exploded = promos.select(
        "promo_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.date_trunc("month", "start_ts"),
                # end_ts is exclusive: the last covered instant is
                # end_ts - 1 microsecond's month
                F.date_trunc(
                    "month", F.col("end_ts") - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bucket"),
    )
    joined = o.join(
        F.broadcast(exploded),
        (o.bucket == exploded.bucket)
        & (o.o_orderdate >= exploded.start_ts)
        & (o.o_orderdate < exploded.end_ts),
    ).select("promo_id", "o_orderkey", "o_totalprice")
    # LEFT semantics of the oracle: re-attach promos with no orders
    agg = joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return (
        promos.join(agg, "promo_id", "left")
        .select(
            "promo_id",
            F.date_format("start_ts", "yyyy-MM-dd").alias("start_day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            "revenue",
        )
        .orderBy("promo_id")
    )


# --------------------------------------------------------------------------
# Hour-of-day seasonal baseline: the additive-decomposition first step
# (seasonal index per (event_type, hour-of-day) from per-day-hour
# counts) plus the peak/trough shape summary a capacity planner and a
# seasonal anomaly detector both read. Complements the level-based
# detectors (`events_mad_anomaly` robust-z, `events_ewma_hourly`
# trend): those flag deviation from recent LEVEL; this one extracts
# the DAILY SHAPE the level oscillates around.
#
# Scale posture: two grouped aggregations — fact -> (type, day, hour)
# partial counts (map-side combinable, the only fact-scale shuffle),
# then -> (type, hour) over a <= |types| * 24 key space. The dense
# (type, hour) grid never touches the fact.
# --------------------------------------------------------------------------
@operator(
    "seasonal_hourly_baseline",
    oracle="""
    WITH per_day AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             EXTRACT(hour FROM ts) AS hod, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(hod AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT)  AS n_days,
           CAST(SUM(cnt) AS BIGINT)  AS total,
           ROUND(AVG(cnt), 4)        AS baseline,
           CAST(MIN(cnt) AS BIGINT)  AS lo,
           CAST(MAX(cnt) AS BIGINT)  AS hi
    FROM per_day
    GROUP BY 1, 2
    ORDER BY event_type, hod
    """,
)
def seasonal_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").cast("long").alias("hod"),
    )
    per_day = ev.groupBy("event_type", "d", "hod").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_day.groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("cnt").alias("total"),
            F.round(F.avg("cnt"), 4).alias("baseline"),
            F.min("cnt").alias("lo"),
            F.max("cnt").alias("hi"),
        )
        .orderBy("event_type", "hod")
    )


# --------------------------------------------------------------------------
# Round-5 statistical time-series layer. Every core statistic reduces
# to exact integer sums (counts / cents / quantized indexes) with the
# floating division applied once per output row — the differential is
# engine-exact, and every window is keyed (per channel / global day
# domain), never a sort of the raw fact.
# --------------------------------------------------------------------------
@operator(
    "hourly_autocorrelation",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT lag AS lag_hours, c AS y,
             LAG(c, lag) OVER (PARTITION BY lag ORDER BY h) AS x
      FROM hourly CROSS JOIN (SELECT UNNEST([1, 24]) AS lag)
    ),
    s AS (
      SELECT lag_hours,
             CAST(COUNT(*) AS BIGINT)   AS n,
             CAST(SUM(x) AS BIGINT)     AS sx,
             CAST(SUM(y) AS BIGINT)     AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM lagged WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT lag_hours, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
    FROM s ORDER BY lag_hours
    """,
)
def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lag 1 and
    lag 24 (the diurnal signature). Pearson r from exact integer sums
    over the hour-domain series (thousands of rows)."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    out = []
    for lag in (1, 24):
        w = Window.orderBy("h")
        lagged = hourly.select(
            F.lit(lag).alias("lag_hours"),
            F.col("c").alias("y"),
            F.lag("c", lag).over(w).alias("x"),
        ).filter(F.col("x").isNotNull())
        out.append(
            lagged.groupBy("lag_hours").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
            )
        )
    s = out[0].unionByName(out[1])
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "lag_hours",
        F.col("n").cast("bigint").alias("n"),
        F.round(num / den, 6).alias("r"),
    ).orderBy("lag_hours")


@operator(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT d, c,
             ROW_NUMBER() OVER (ORDER BY d) AS t,
             SUM(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             COUNT(*) OVER () AS n,
             SUM(c) OVER ()   AS total
      FROM daily
    ),
    scored AS (
      SELECT strftime(d, '%Y-%m-%d') AS day,
             ABS(n * cum_c - t * total) AS dev,
             n
      FROM cum
    )
    SELECT CAST(MAX(n) AS BIGINT)            AS n_days,
           CAST(MAX(dev) AS BIGINT)          AS max_dev_scaled,
           MIN(day) FILTER (WHERE dev = (SELECT MAX(dev) FROM scored))
                                             AS changepoint_day
    FROM scored
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point over daily revenue: the day where the
    cumulative deviation from the global mean peaks. The statistic is
    kept in scaled integer form (n·cum_t − t·total — CUSUM·n, exact
    in int64), so the argmax is engine-exact; earliest day breaks
    ties."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c")
    )
    w = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.row_number().over(w).alias("t"),
        F.sum("c")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_c"),
    ).crossJoin(
        F.broadcast(
            daily.agg(
                F.count(F.lit(1)).alias("n"), F.sum("c").alias("total")
            )
        )
    )
    scored = cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.abs(
            F.col("n") * F.col("cum_c") - F.col("t") * F.col("total")
        ).alias("dev"),
        "n",
    )
    return scored.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max("dev").cast("bigint").alias("max_dev_scaled"),
        F.min_by("day", F.struct(-F.col("dev"), F.col("day"))).alias(
            "changepoint_day"
        ),
    )


@operator(
    "trailing_trend_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type,
             COUNT(*)   OVER w AS n,
             SUM(t)     OVER w AS sx,
             SUM(c)     OVER w AS sy,
             SUM(t * t) OVER w AS sxx,
             SUM(t * c) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY t
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    slopes AS (
      SELECT event_type,
             ROUND((n * sxy - sx * sy)
                   / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
      FROM win WHERE n = 7
    )
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT)                       AS n_windows,
           CAST(COUNT(*) FILTER (WHERE slope > 0) AS BIGINT) AS n_up,
           CAST(COUNT(*) FILTER (WHERE slope < 0) AS BIGINT) AS n_down,
           ROUND(MAX(slope), 6)                           AS max_slope,
           ROUND(MIN(slope), 6)                           AS min_slope
    FROM slopes GROUP BY 1 ORDER BY channel
    """,
)
def trailing_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day regression slope of daily activity per channel,
    summarized to up/down-trend day counts and the extreme slopes.
    The regression sums live in a per-channel ROWS window over exact
    integers; only full 7-day windows score."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "event_type",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("t").over(w).alias("sx"),
        F.sum("c").over(w).alias("sy"),
        F.sum(F.col("t") * F.col("t")).over(w).alias("sxx"),
        F.sum(F.col("t") * F.col("c")).over(w).alias("sxy"),
    ).filter(F.col("n") == 7)
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        ),
        6,
    )
    slopes = win.select("event_type", slope.alias("slope"))
    return (
        slopes.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("slope") > 0).cast("bigint"))
            .cast("bigint")
            .alias("n_up"),
            F.sum((F.col("slope") < 0).cast("bigint"))
            .cast("bigint")
            .alias("n_down"),
            F.round(F.max("slope"), 6).alias("max_slope"),
            F.round(F.min("slope"), 6).alias("min_slope"),
        )
        .orderBy("channel")
    )


_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3


@operator(
    "holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    init AS (
      SELECT a.event_type,
             b.x                    AS l,
             b.x - a.x              AS b,
             a.n
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type AND a.i = 1 AND b.i = 2
    ),
    rec AS (
      SELECT event_type, 2 AS i, l, b, n FROM init
      UNION ALL
      SELECT r.event_type, r.i + 1,
             {_HOLT_ALPHA} * v.x
               + (1 - {_HOLT_ALPHA}) * (r.l + r.b) AS l,
             {_HOLT_BETA} * (({_HOLT_ALPHA} * v.x
               + (1 - {_HOLT_ALPHA}) * (r.l + r.b)) - r.l)
               + (1 - {_HOLT_BETA}) * r.b          AS b,
             r.n
      FROM rec r JOIN idx v
        ON v.event_type = r.event_type AND v.i = r.i + 1
      WHERE r.i < r.n
    )
    SELECT event_type AS channel,
           CAST(n AS BIGINT)        AS n_days,
           ROUND(l, 4)              AS level_cents,
           ROUND(b, 4)              AS trend_cents,
           ROUND(l + 7 * b, 4)      AS forecast_7d_cents
    FROM rec WHERE i = n ORDER BY channel
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over daily spend per channel
    (level+trend recursion, alpha=0.5, beta=0.3), with a 7-day-ahead
    forecast. The inherently sequential fold runs INSIDE the JVM via
    F.aggregate over the per-channel day array (bounded: |days| per
    channel), after one keyed aggregation of the fact — the scale
    pattern for per-key recursions that windows cannot express. The
    oracle replays the identical recursion as a recursive CTE; both
    engines evaluate the same IEEE expression tree, so results match
    bit-for-bit before the final rounding."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("double")
        .alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "x"))), lambda s: s.x
        ).alias("xs")
    ).filter(
        # a channel with one active day has no (l0, b0) init; the
        # oracle's i=1 JOIN i=2 drops it silently — match that instead
        # of letting slice(xs, 3, size-2) throw on a negative length
        F.size("xs") >= 2
    )
    a, b_ = _HOLT_ALPHA, _HOLT_BETA
    lvl0 = F.element_at("xs", 2)
    trd0 = F.element_at("xs", 2) - F.element_at("xs", 1)
    folded = series.select(
        F.col("event_type").alias("channel"),
        F.size("xs").cast("bigint").alias("n_days"),
        F.aggregate(
            F.slice("xs", 3, F.size("xs") - 2),
            F.struct(lvl0.alias("l"), trd0.alias("b")),
            lambda acc, x: F.struct(
                (a * x + (1 - a) * (acc.l + acc.b)).alias("l"),
                (
                    b_ * ((a * x + (1 - a) * (acc.l + acc.b)) - acc.l)
                    + (1 - b_) * acc.b
                ).alias("b"),
            ),
        ).alias("st"),
    )
    return folded.select(
        "channel",
        "n_days",
        F.round(F.col("st.l"), 4).alias("level_cents"),
        F.round(F.col("st.b"), 4).alias("trend_cents"),
        F.round(F.col("st.l") + 7 * F.col("st.b"), 4).alias(
            "forecast_7d_cents"
        ),
    ).orderBy("channel")


def _register_seasonal_residuals() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH base AS ({ORACLES["seasonal_hourly_baseline"]}),
    per_cell AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3
    )
    SELECT p.event_type,
           strftime(p.d, '%Y-%m-%d') AS day,
           p.hod, p.cnt, b.baseline,
           ROUND(p.cnt - b.baseline, 4) AS residual
    FROM per_cell p JOIN base b
      ON b.event_type = p.event_type AND b.hod = p.hod
    ORDER BY ABS(p.cnt - b.baseline) DESC, p.event_type, day, p.hod
    LIMIT 20
    """

    @operator("seasonal_residual_anomalies", oracle=oracle)
    def seasonal_residual_anomalies(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Top deviations from the hour-of-day seasonal baseline —
        anomaly detection that respects diurnal shape (a midnight
        spike and a noon spike are judged against different
        expectations). Composes the verified baseline plan; the join
        key space is (channel × 24)."""
        base = REGISTRY["seasonal_hourly_baseline"](spark, sf_dir).select(
            "event_type", "hod", "baseline"
        )
        ev = _t(spark, sf_dir, "events")
        per_cell = ev.groupBy(
            "event_type",
            F.to_date("ts").alias("d"),
            F.hour("ts").cast("long").alias("hod"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        j = per_cell.join(F.broadcast(base), ["event_type", "hod"])
        return (
            j.select(
                "event_type",
                F.date_format("d", "yyyy-MM-dd").alias("day"),
                "hod",
                "cnt",
                "baseline",
                F.round(F.col("cnt") - F.col("baseline"), 4).alias(
                    "residual"
                ),
            )
            .orderBy(
                F.abs(F.col("cnt") - F.col("baseline")).desc(),
                "event_type",
                "day",
                "hod",
            )
            .limit(20)
        )


_register_seasonal_residuals()


# --------------------------------------------------------------------------
# SPC control-chart rules (round-8 slate): Western Electric rules over
# the daily-revenue control chart — rule 1 (point beyond 3 sigma),
# rule 4 (8 consecutive points on one side of the center line), and
# rule 5 (2 of 3 consecutive points beyond 2 sigma on the same side).
# cusum_changepoint finds WHERE the level shifted after the fact; the
# control chart is the ONLINE monitor that pages before the shift is
# ancient history. Every comparison is EXACT integer algebra: z^2 > k^2
# is rewritten as dev^2*(n-1) > k^2*n*(n*ss - s^2) with dev = n*x - s,
# all in HUGEINT (DuckDB) / DECIMAL(38,0) (Spark) — no doubles exist
# anywhere, so the flags are engine-identical by construction (the
# same trick as cusum's scaled argmax, one sigma tier up).
#
# Scale posture (100 TB): the chart is computed over the DAILY
# aggregate (|days| rows), never the fact table — one partial-agg
# shuffle to daily cents, one broadcastable 1-row moment table, then
# short ROWS-frame windows (8 and 3) over thousands of rows on one
# partition. Headroom: dev^2*(n-1) at 100 TB daily cents (~1e15) and
# ~10 years of days stays under 1e38 (documented bound; DECIMAL(38,0)
# holds).
# --------------------------------------------------------------------------
@operator(
    "spc_control_rules",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS ss
      FROM daily
    ), scored AS (
      SELECT d, c, n,
             CAST(n AS HUGEINT) * c - s AS dev,
             (CAST(n AS HUGEINT) * ss - s * s) * n AS denom,
             ROW_NUMBER() OVER (ORDER BY d) AS t
      FROM daily CROSS JOIN tot
    ), flagged AS (
      SELECT d, c, t,
             CASE WHEN dev > 0 THEN 1 ELSE 0 END AS above,
             CASE WHEN dev * dev * (n - 1) > 9 * denom THEN 1 ELSE 0 END
               AS beyond3,
             CASE WHEN dev * dev * (n - 1) > 4 * denom THEN 1 ELSE 0 END
               AS beyond2
      FROM scored
    ), runs AS (
      SELECT d, c, t, above, beyond3,
             SUM(above) OVER (ORDER BY t
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sum8,
             SUM(CASE WHEN beyond2 = 1 AND above = 1 THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS hi3,
             SUM(CASE WHEN beyond2 = 1 AND above = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS lo3
      FROM flagged
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(c AS BIGINT) AS cents,
           CAST(above AS BIGINT) AS above_center,
           CAST(beyond3 AS BIGINT) AS rule1_beyond3,
           CAST(CASE WHEN t >= 8 AND (sum8 = 8 OR sum8 = 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS rule4_run8,
           CAST(CASE WHEN t >= 3 AND (hi3 >= 2 OR lo3 >= 2)
                     THEN 1 ELSE 0 END AS BIGINT) AS rule5_2of3
    FROM runs
    WHERE beyond3 = 1
       OR (t >= 8 AND (sum8 = 8 OR sum8 = 0))
       OR (t >= 3 AND (hi3 >= 2 OR lo3 >= 2))
    ORDER BY day
    """,
)
def spc_control_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric rules 1/4/5 on the daily-revenue chart, flags
    from pure integer algebra. Reference scope: no monitoring layer
    exists (/root/reference/doc/temp.md:377-411); this is the SPC
    monitor a platform runs on every published daily aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c")
    )
    dec = F.col("c").cast("decimal(38,0)")
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * F.col("c")).alias("ss"),
    )
    w = Window.orderBy("d")
    scored = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "c",
        "n",
        (F.col("n").cast("decimal(38,0)") * F.col("c") - F.col("s")).alias("dev"),
        (
            (F.col("n").cast("decimal(38,0)") * F.col("ss") - F.col("s") * F.col("s"))
            * F.col("n")
        ).alias("denom"),
        F.row_number().over(w).alias("t"),
    )
    flagged = scored.select(
        "d",
        "c",
        "t",
        F.when(F.col("dev") > 0, 1).otherwise(0).alias("above"),
        F.when(
            F.col("dev") * F.col("dev") * (F.col("n") - 1) > 9 * F.col("denom"), 1
        )
        .otherwise(0)
        .alias("beyond3"),
        F.when(
            F.col("dev") * F.col("dev") * (F.col("n") - 1) > 4 * F.col("denom"), 1
        )
        .otherwise(0)
        .alias("beyond2"),
    )
    wt = Window.orderBy("t")
    runs = flagged.select(
        "d",
        "c",
        "t",
        "above",
        "beyond3",
        F.sum("above").over(wt.rowsBetween(-7, 0)).alias("sum8"),
        F.sum(F.when((F.col("beyond2") == 1) & (F.col("above") == 1), 1).otherwise(0))
        .over(wt.rowsBetween(-2, 0))
        .alias("hi3"),
        F.sum(F.when((F.col("beyond2") == 1) & (F.col("above") == 0), 1).otherwise(0))
        .over(wt.rowsBetween(-2, 0))
        .alias("lo3"),
    )
    rule4 = (F.col("t") >= 8) & ((F.col("sum8") == 8) | (F.col("sum8") == 0))
    rule5 = (F.col("t") >= 3) & ((F.col("hi3") >= 2) | (F.col("lo3") >= 2))
    return (
        runs.filter((F.col("beyond3") == 1) | rule4 | rule5)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("cents"),
            F.col("above").cast("bigint").alias("above_center"),
            F.col("beyond3").cast("bigint").alias("rule1_beyond3"),
            F.when(rule4, 1).otherwise(0).cast("bigint").alias("rule4_run8"),
            F.when(rule5, 1).otherwise(0).cast("bigint").alias("rule5_2of3"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# STL-lite seasonality/trend strength of daily revenue (the Hyndman
# "STL features" pair, on a centered-MA trend instead of loess):
#   trend    T = 7-day centered moving average (full windows only),
#   detrend  d = y - T,
#   seasonal S = day-of-week mean of d,
#   strengths: F_trend = max(0, 1 - Var(d)/Var(y)),
#              F_seas  = max(0, 1 - Var(d - S)/Var(d)).
# Differs from anova_weekday_revenue (per-ORDER weekday ANOVA): this
# decomposes the daily SERIES, so the trend is removed before the
# weekday effect is measured. Engine parity: the MA is kept as the
# INTEGER window sum t7 (denominator 7 deferred), the detrended value
# is snapped once onto a 1e-6 grid (ROUND((7y - t7) * 1e6 / 7.0) —
# identical double -> identical BIGINT), and every variance is a
# within/between decomposition of DECIMAL(38,0)/HUGEINT power sums of
# that grid. Scale: all windows run over the ~2.4k-row day domain.
# --------------------------------------------------------------------------
@operator(
    "seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayofweek(o_orderdate) + 1 AS dow,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1, 2
    ), ma AS (
      SELECT day, dow, y,
             SUM(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS t7,
             COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS w_cnt
      FROM daily
    ), d AS (
      SELECT dow,
             CAST(y AS BIGINT) * 1000000 AS yg,
             CAST(ROUND((7 * y - t7) * 1000000.0 / 7.0) AS BIGINT) AS dg
      FROM ma WHERE w_cnt = 7
    ), grp AS (
      SELECT dow,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(dg) AS HUGEINT) AS s1_d,
             SUM(CAST(dg AS HUGEINT) * dg) AS s2_d
      FROM d GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT)            AS n,
             CAST(SUM(yg) AS HUGEINT)            AS sy1,
             SUM(CAST(yg AS HUGEINT) * yg)       AS sy2,
             CAST(SUM(dg) AS HUGEINT)            AS sd1,
             SUM(CAST(dg AS HUGEINT) * dg)       AS sd2
      FROM d
    ), ssw AS (
      -- per-group within-SS snapped onto a 1e12 grid BEFORE the
      -- 7-term cross-group sum (order-free integer addition; the
      -- snap-before-sum rule, CONTRIBUTING.md)
      SELECT CAST(SUM(CAST(ROUND((CAST(s2_d AS DOUBLE)
                       - CAST(s1_d AS DOUBLE)
                         * (CAST(s1_d AS DOUBLE) / n_d))
                       / 1000000000000.0) AS HUGEINT)) AS DOUBLE)
             * 1000000000000.0 AS w
      FROM grp
    )
    SELECT tot.n AS n_days,
           ROUND(CAST(tot.sy1 AS DOUBLE) / tot.n / 1000000.0, 6)
             AS mean_daily_cents,
           ROUND(GREATEST(0.0, 1.0 -
             (CAST(tot.sd2 AS DOUBLE)
              - CAST(tot.sd1 AS DOUBLE) * (CAST(tot.sd1 AS DOUBLE) / tot.n))
             / (CAST(tot.sy2 AS DOUBLE)
                - CAST(tot.sy1 AS DOUBLE) * (CAST(tot.sy1 AS DOUBLE) / tot.n))
           ), 6) AS trend_strength,
           ROUND(GREATEST(0.0, 1.0 -
             ssw.w
             / (CAST(tot.sd2 AS DOUBLE)
                - CAST(tot.sd1 AS DOUBLE) * (CAST(tot.sd1 AS DOUBLE) / tot.n))
           ), 6) AS seasonal_strength
    FROM tot CROSS JOIN ssw
    """,
)
def seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "dow", "y",
        F.sum("y").over(w7).alias("t7"),
        F.count(F.lit(1)).over(w7).alias("w_cnt"),
    )
    d = ma.filter(F.col("w_cnt") == 7).select(
        "dow",
        (F.col("y").cast("bigint") * 1000000).alias("yg"),
        F.round((7 * F.col("y") - F.col("t7")) * 1000000.0 / 7.0)
        .cast("bigint")
        .alias("dg"),
    )
    hug = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    grp = d.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("dg").cast("decimal(38,0)").alias("s1_d"),
        F.sum(hug("dg") * F.col("dg")).alias("s2_d"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yg").cast("decimal(38,0)").alias("sy1"),
        F.sum(hug("yg") * F.col("yg")).alias("sy2"),
        F.sum("dg").cast("decimal(38,0)").alias("sd1"),
        F.sum(hug("dg") * F.col("dg")).alias("sd2"),
    )
    ssw = grp.agg(
        (
            F.sum(
                F.round(
                    (
                        F.col("s2_d").cast("double")
                        - F.col("s1_d").cast("double")
                        * (F.col("s1_d").cast("double") / F.col("n_d"))
                    )
                    / 1000000000000.0
                ).cast("decimal(38,0)")
            ).cast("double")
            * 1000000000000.0
        ).alias("w")
    )
    out = tot.crossJoin(ssw)
    sy1, sy2 = F.col("sy1").cast("double"), F.col("sy2").cast("double")
    sd1, sd2 = F.col("sd1").cast("double"), F.col("sd2").cast("double")
    n = F.col("n")
    var_y = sy2 - sy1 * (sy1 / n)
    var_d = sd2 - sd1 * (sd1 / n)
    return out.select(
        n.alias("n_days"),
        F.round(sy1 / n / 1000000.0, 6).alias("mean_daily_cents"),
        F.round(F.greatest(F.lit(0.0), F.lit(1.0) - var_d / var_y), 6)
        .alias("trend_strength"),
        F.round(F.greatest(F.lit(0.0), F.lit(1.0) - F.col("w") / var_d), 6)
        .alias("seasonal_strength"),
    )


# --------------------------------------------------------------------------
# Quantile-forecast evaluation by pinball loss: forecast each hour of
# the LAST week of events as the (dow, hour)-conditional historical
# quantile (q10/q50/q90, exact interpolated over the training hours)
# and score with the pinball (quantile) loss — the metric that makes
# quantile forecasts comparable and calibration visible (q10 should
# under-predict ~90% of the time). Train/test split at the last
# Monday; quantiles per (dow, hour) come from one window over the
# (168-cell x history) domain; per-hour losses are snapped onto a
# 1e-6 grid before the cross-hour mean (snap-before-sum).
# Complements forecast_backtest_mase (point forecasts) with the
# probabilistic readout.
# --------------------------------------------------------------------------
_PB_SPLIT = "2024-01-22"  # last full Monday-anchored week of the fixture


@operator(
    "quantile_forecast_pinball",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             dayofweek(ts) + 1      AS dow,
             hour(ts)               AS hod,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2, 3
    ),
    train AS (SELECT * FROM hourly WHERE h <  TIMESTAMP '{_PB_SPLIT}'),
    test  AS (SELECT * FROM hourly WHERE h >= TIMESTAMP '{_PB_SPLIT}'),
    ranked AS (
      SELECT dow, hod, y,
             ROW_NUMBER() OVER (PARTITION BY dow, hod ORDER BY y) AS rn,
             COUNT(*)    OVER (PARTITION BY dow, hod)             AS n
      FROM train
    ),
    q AS (
      SELECT dow, hod,
             MIN(CASE WHEN rn - 1 >= CAST(floor(0.1 * (n - 1)) AS BIGINT)
                      THEN y END) AS q10_lo,
             MIN(CASE WHEN rn - 1 >= CAST(ceil(0.1 * (n - 1)) AS BIGINT)
                      THEN y END) AS q10_hi,
             MIN(CASE WHEN rn - 1 >= CAST(floor(0.5 * (n - 1)) AS BIGINT)
                      THEN y END) AS q50_lo,
             MIN(CASE WHEN rn - 1 >= CAST(ceil(0.5 * (n - 1)) AS BIGINT)
                      THEN y END) AS q50_hi,
             MIN(CASE WHEN rn - 1 >= CAST(floor(0.9 * (n - 1)) AS BIGINT)
                      THEN y END) AS q90_lo,
             MIN(CASE WHEN rn - 1 >= CAST(ceil(0.9 * (n - 1)) AS BIGINT)
                      THEN y END) AS q90_hi,
             MAX(n) AS n_train
      FROM ranked GROUP BY 1, 2
    ),
    fc AS (
      SELECT dow, hod,
             q10_lo + (q10_hi - q10_lo) * (0.1 * (n_train - 1)
                      - floor(0.1 * (n_train - 1))) AS f10,
             q50_lo + (q50_hi - q50_lo) * (0.5 * (n_train - 1)
                      - floor(0.5 * (n_train - 1))) AS f50,
             q90_lo + (q90_hi - q90_lo) * (0.9 * (n_train - 1)
                      - floor(0.9 * (n_train - 1))) AS f90
      FROM q
    ),
    scored AS (
      SELECT t.y, f.f10, f.f50, f.f90,
             CAST(ROUND(GREATEST(0.1 * (t.y - f.f10),
                                 -0.9 * (t.y - f.f10)) * 1000000.0)
                  AS BIGINT) AS l10,
             CAST(ROUND(GREATEST(0.5 * (t.y - f.f50),
                                 -0.5 * (t.y - f.f50)) * 1000000.0)
                  AS BIGINT) AS l50,
             CAST(ROUND(GREATEST(0.9 * (t.y - f.f90),
                                 -0.1 * (t.y - f.f90)) * 1000000.0)
                  AS BIGINT) AS l90,
             CASE WHEN t.y > f.f10 THEN 1 ELSE 0 END AS above10,
             CASE WHEN t.y > f.f90 THEN 1 ELSE 0 END AS above90
      FROM test t JOIN fc f ON f.dow = t.dow AND f.hod = t.hod
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_hours,
           ROUND(CAST(SUM(l10) AS DOUBLE) / COUNT(*) / 1000000.0 / 100.0, 6)
             AS pinball_q10,
           ROUND(CAST(SUM(l50) AS DOUBLE) / COUNT(*) / 1000000.0 / 100.0, 6)
             AS pinball_q50,
           ROUND(CAST(SUM(l90) AS DOUBLE) / COUNT(*) / 1000000.0 / 100.0, 6)
             AS pinball_q90,
           ROUND(CAST(SUM(above10) AS DOUBLE) / COUNT(*), 6)
             AS share_above_q10,
           ROUND(CAST(SUM(above90) AS DOUBLE) / COUNT(*), 6)
             AS share_above_q90
    FROM scored
    """,
)
def quantile_forecast_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("y")
    )
    train = hourly.filter(F.col("h") < _PB_SPLIT)
    test = hourly.filter(F.col("h") >= _PB_SPLIT)
    wq = Window.partitionBy("dow", "hod").orderBy("y")
    wn = Window.partitionBy("dow", "hod")
    ranked = train.select(
        "dow", "hod", "y",
        F.row_number().over(wq).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def pick(p: float, side: str):
        fn = F.floor if side == "lo" else F.ceil
        return F.min(
            F.when(
                F.col("rn") - 1 >= fn(F.lit(p) * (F.col("n") - 1)).cast("bigint"),
                F.col("y"),
            )
        )
    q = ranked.groupBy("dow", "hod").agg(
        pick(0.1, "lo").alias("q10_lo"), pick(0.1, "hi").alias("q10_hi"),
        pick(0.5, "lo").alias("q50_lo"), pick(0.5, "hi").alias("q50_hi"),
        pick(0.9, "lo").alias("q90_lo"), pick(0.9, "hi").alias("q90_hi"),
        F.max("n").alias("n_train"),
    )
    def interp(p: float, lo: str, hi: str):
        frac = F.lit(p) * (F.col("n_train") - 1) - F.floor(
            F.lit(p) * (F.col("n_train") - 1)
        )
        return F.col(lo) + (F.col(hi) - F.col(lo)) * frac
    fc = q.select(
        "dow", "hod",
        interp(0.1, "q10_lo", "q10_hi").alias("f10"),
        interp(0.5, "q50_lo", "q50_hi").alias("f50"),
        interp(0.9, "q90_lo", "q90_hi").alias("f90"),
    )
    j = test.join(F.broadcast(fc), ["dow", "hod"])
    def pin(tau: float, f: str):
        d = F.col("y") - F.col(f)
        return F.round(
            F.greatest(F.lit(tau) * d, F.lit(tau - 1.0) * d) * 1000000.0
        ).cast("bigint")
    scored = j.select(
        pin(0.1, "f10").alias("l10"),
        pin(0.5, "f50").alias("l50"),
        pin(0.9, "f90").alias("l90"),
        F.when(F.col("y") > F.col("f10"), 1).otherwise(0).alias("above10"),
        F.when(F.col("y") > F.col("f90"), 1).otherwise(0).alias("above90"),
    )
    cnt = F.count(F.lit(1))
    return scored.agg(
        cnt.cast("bigint").alias("n_test_hours"),
        F.round(F.sum("l10").cast("double") / cnt / 1000000.0 / 100.0, 6)
        .alias("pinball_q10"),
        F.round(F.sum("l50").cast("double") / cnt / 1000000.0 / 100.0, 6)
        .alias("pinball_q50"),
        F.round(F.sum("l90").cast("double") / cnt / 1000000.0 / 100.0, 6)
        .alias("pinball_q90"),
        F.round(F.sum("above10").cast("double") / cnt, 6)
        .alias("share_above_q10"),
        F.round(F.sum("above90").cast("double") / cnt, 6)
        .alias("share_above_q90"),
    )
