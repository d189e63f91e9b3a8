"""Reference-parity batch operators over the `events` fact table.

`events` stands in for the reference's `user_behavior` order stream
(FIXTURES.md §1 mapping: event_id→order_id, value→amount,
event_type→channel_id-like key). Q1–Q4 are the Flink streaming
queries (/root/reference/doc/temp.md:377-411) expressed batch-first;
B1/B2 are the Spark batch jobs (/root/reference/doc/temp.md:463-474,
/root/reference/doc/Cumulative.java:63-80). The streaming module
re-runs the same logical plans incrementally.

Scale notes (100 TB posture):
* Every agg here is a hash aggregate with map-side partial
  aggregation — one shuffle on the group key, no more.
* The two-level distinct (B1's idiom) is exactly how exact
  COUNT(DISTINCT) should be computed at scale: pre-aggregate by
  (bucket, user) spreads the heavy key over the cluster before the
  per-bucket count. Catalyst's own countDistinct rewrite produces the
  same two-exchange shape.
* The cumulative series aggregates to minute granularity FIRST
  (cardinality = minutes, tiny) and only then applies an unbounded
  window — the window runs over ~1e3 rows per month regardless of
  input size, so the single-partition window stage is never the
  bottleneck.
* All money stays DOUBLE for oracle-hash stability; aggregates are
  rounded to 2 decimals at the result edge only (SURVEY.md §7 risk 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.functions.time import day_bucket, hour_bucket, minute_bucket
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# B1 — the flagship: per-hour uv / order-count / amount via two-level agg.
# Reference: /root/reference/doc/temp.md:463-474 (inner GROUP BY dt,user_id;
# outer GROUP BY dt). The reference's `${last_hour}` filter never
# interpolated (SURVEY.md P3) — we implement the intent as the unfiltered
# full series; b2_trailing_window carries the range-filtered variant.
# --------------------------------------------------------------------------
@operator(
    "b1_hourly_uv",
    oracle="""
    SELECT dt,
           COUNT(user_id)       AS uv,
           CAST(SUM(buy_cnt) AS BIGINT) AS buy_cnt,
           ROUND(SUM(amount),2) AS amount
    FROM (
      SELECT strftime(ts, '%Y-%m-%d %H') AS dt,
             user_id,
             COUNT(1)   AS buy_cnt,
             SUM(value) AS amount
      FROM events
      GROUP BY 1, 2
    ) t1
    GROUP BY dt
    ORDER BY dt DESC
    """,
)
def b1_hourly_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    inner = (
        ev.select(hour_bucket("ts").alias("dt"), "user_id", "value")
        .groupBy("dt", "user_id")
        .agg(F.count(F.lit(1)).alias("buy_cnt"), F.sum("value").alias("amount"))
    )
    return (
        inner.groupBy("dt")
        .agg(
            F.count("user_id").alias("uv"),
            F.sum("buy_cnt").alias("buy_cnt"),
            F.round(F.sum("amount"), 2).alias("amount"),
        )
        .orderBy(F.col("dt").desc())
    )


# --------------------------------------------------------------------------
# B1' — same semantics via countDistinct, the single-pass formulation.
# Demonstrates Catalyst's distinct rewrite produces the same result as the
# manual two-level form (SURVEY.md A5 equivalence).
# --------------------------------------------------------------------------
@operator(
    "b1_hourly_uv_distinct",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d %H') AS dt,
           COUNT(DISTINCT user_id)  AS uv,
           COUNT(*)                 AS buy_cnt,
           ROUND(SUM(value),2)      AS amount
    FROM events
    GROUP BY 1
    ORDER BY dt DESC
    """,
)
def b1_hourly_uv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(hour_bucket("ts").alias("dt"))
        .agg(
            F.countDistinct("user_id").alias("uv"),
            F.count(F.lit(1)).alias("buy_cnt"),
            F.round(F.sum("value"), 2).alias("amount"),
        )
        .orderBy(F.col("dt").desc())
    )


# --------------------------------------------------------------------------
# B2 — trailing-window agg: range filter then the two-level agg, sorted.
# Reference: /root/reference/doc/Cumulative.java:59-80 computes `now-24h`
# driver-side and filters `order_time >= startTime`. Fixture time spans
# 2024-01-01..01-30, so the deterministic "last 24h" cutoff is 01-30 00:00.
# The range predicate is pushed down to the parquet scan (row-group
# min/max skipping at scale).  B2's inner GROUP BY full-timestamp drift is
# NOT reproduced — B1 semantics are the documented-correct variant
# (SURVEY.md §7 risk 4).
# --------------------------------------------------------------------------
B2_CUTOFF = "2024-01-30 00:00:00"


@operator(
    "b2_trailing_window",
    oracle=f"""
    SELECT dt,
           COUNT(user_id)       AS uv,
           CAST(SUM(buy_cnt) AS BIGINT) AS buy_cnt,
           ROUND(SUM(amount),2) AS amount
    FROM (
      SELECT strftime(ts, '%Y-%m-%d %H') AS dt,
             user_id,
             COUNT(1)   AS buy_cnt,
             SUM(value) AS amount
      FROM events
      WHERE ts >= TIMESTAMP '{B2_CUTOFF}'
      GROUP BY 1, 2
    ) t1
    GROUP BY dt
    ORDER BY dt DESC
    """,
)
def b2_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("ts") >= F.lit(B2_CUTOFF).cast("timestamp"))
    inner = (
        ev.select(hour_bucket("ts").alias("dt"), "user_id", "value")
        .groupBy("dt", "user_id")
        .agg(F.count(F.lit(1)).alias("buy_cnt"), F.sum("value").alias("amount"))
    )
    return (
        inner.groupBy("dt")
        .agg(
            F.count("user_id").alias("uv"),
            F.sum("buy_cnt").alias("buy_cnt"),
            F.round(F.sum("amount"), 2).alias("amount"),
        )
        .orderBy(F.col("dt").desc())
    )


# --------------------------------------------------------------------------
# Q1 (batch form) — per-day cumulative uv + payment with last-seen minute.
# Reference: /root/reference/doc/temp.md:377-386.
# --------------------------------------------------------------------------
@operator(
    "q1_daily_uv_payment",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date_str,
           MAX(strftime(ts, '%H:%M')) AS time_str,
           COUNT(DISTINCT user_id)    AS uv,
           ROUND(SUM(value),2)        AS payment
    FROM events
    GROUP BY 1
    ORDER BY date_str
    """,
)
def q1_daily_uv_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # Reference Q1 projects (date_str, time_str, user_id, amount) in a
    # subquery first (manual column pruning, doc/temp.md:380-385);
    # Catalyst prunes identically from this direct form.
    return (
        ev.select(
            day_bucket("ts").alias("date_str"),
            minute_bucket("ts").alias("time_str"),
            "user_id",
            "value",
        )
        .groupBy("date_str")
        .agg(
            F.max("time_str").alias("time_str"),
            F.countDistinct("user_id").alias("uv"),
            F.round(F.sum("value"), 2).alias("payment"),
        )
        .orderBy("date_str")
    )


# --------------------------------------------------------------------------
# Q1 (changelog materialization) — the per-minute cumulative series that
# Q1's upsert-by-(date,minute) PK trick materializes in MySQL (SURVEY.md
# ST4): for every active minute, running uv and running payment so far
# that day. Batch twin of the streaming update-mode output.
# Cumulative distinct is computed as "users whose FIRST event of the day
# is <= this minute" — one small agg per user, then a prefix-sum window
# over per-minute rows (cardinality = minutes/day, so the window stage is
# tiny no matter the input size).
# --------------------------------------------------------------------------
@operator(
    "q1_cumulative_minute",
    oracle="""
    WITH per_min AS (
      SELECT strftime(ts, '%Y-%m-%d') AS date_str,
             strftime(ts, '%H:%M')    AS time_str,
             SUM(value)               AS pay
      FROM events GROUP BY 1, 2
    ),
    first_seen AS (
      SELECT date_str, time_str, COUNT(*) AS new_users
      FROM (
        SELECT strftime(ts, '%Y-%m-%d') AS date_str,
               user_id,
               MIN(strftime(ts, '%H:%M')) AS time_str
        FROM events GROUP BY 1, 2
      ) GROUP BY 1, 2
    )
    SELECT p.date_str,
           p.time_str,
           CAST(SUM(COALESCE(f.new_users, 0)) OVER w AS BIGINT) AS uv,
           ROUND(SUM(p.pay) OVER w, 2)          AS payment
    FROM per_min p LEFT JOIN first_seen f USING (date_str, time_str)
    WINDOW w AS (PARTITION BY p.date_str ORDER BY p.time_str
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY date_str, time_str
    """,
)
def q1_cumulative_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        day_bucket("ts").alias("date_str"),
        minute_bucket("ts").alias("time_str"),
        "user_id",
        "value",
    )
    per_min = ev.groupBy("date_str", "time_str").agg(F.sum("value").alias("pay"))
    first_seen = (
        ev.groupBy("date_str", "user_id")
        .agg(F.min("time_str").alias("time_str"))
        .groupBy("date_str", "time_str")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.partitionBy("date_str")
        .orderBy("time_str")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_min.join(first_seen, ["date_str", "time_str"], "left")
        .select(
            "date_str",
            "time_str",
            F.sum(F.coalesce(F.col("new_users"), F.lit(0))).over(w).alias("uv"),
            F.round(F.sum("pay").over(w), 2).alias("payment"),
        )
        .orderBy("date_str", "time_str")
    )


# --------------------------------------------------------------------------
# Q2 — tumbling 1-minute event counts (batch twin of the streaming tumble,
# /root/reference/doc/temp.md:391-394). F.window == TUMBLE_START.
# --------------------------------------------------------------------------
@operator(
    "q2_tumble_minute",
    oracle="""
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS buy_cnt
    FROM events
    GROUP BY 1
    ORDER BY window_start
    """,
)
def q2_tumble_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("buy_cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "buy_cnt",
        )
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Q3 — running total per user (/root/reference/doc/temp.md:399-402).
# Streaming form is update-mode upsert keyed by user_id; batch form is the
# final state of that changelog.
# --------------------------------------------------------------------------
@operator(
    "q3_user_payment",
    oracle="""
    SELECT user_id, ROUND(SUM(value),2) AS payment
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q3_user_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("payment"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q4 — running total per channel (/root/reference/doc/temp.md:407-410);
# event_type plays channel_id (FIXTURES.md §1).
# --------------------------------------------------------------------------
@operator(
    "q4_channel_payment",
    oracle="""
    SELECT event_type AS channel, ROUND(SUM(value),2) AS payment,
           COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY channel
    """,
)
def q4_channel_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.round(F.sum("value"), 2).alias("payment"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Scalar-expression surface: every scalar function the reference touches
# (SURVEY.md §2.2 table) in one projection — FROM_UNIXTIME/TO_TIMESTAMP
# round-trip, DATE_FORMAT, SUBSTR-on-cast, CAST, arithmetic.
# --------------------------------------------------------------------------
@operator(
    "scalar_time_exprs",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H')                   AS hour_str,
           substr(CAST(ts AS VARCHAR), 1, 13)            AS hour_substr,
           CAST(floor(epoch(ts)) AS BIGINT)              AS epoch_s,
           strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S')                 AS ts_roundtrip,
           CAST(round(value * 1000, 0) AS BIGINT)        AS value_millis
    FROM events ORDER BY event_id
    """,
)
def scalar_time_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_str"),
        # the reference's substr(cast(ts AS string),1,13) idiom
        # (/root/reference/doc/Cumulative.java:70)
        F.substring(F.col("ts").cast("string"), 1, 13).alias("hour_substr"),
        F.col("order_time").alias("epoch_s"),
        # FROM_UNIXTIME -> TO_TIMESTAMP round-trip (doc/temp.md:301)
        F.date_format(
            F.to_timestamp(F.from_unixtime("order_time")), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_roundtrip"),
        # round before the integral cast: Spark casts truncate toward
        # zero while ANSI engines round, and 64.46*1000 is 64459.999…
        F.round(F.col("value") * 1000, 0).cast("bigint").alias("value_millis"),
    )
