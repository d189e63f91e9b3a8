"""End-to-end pipeline topologies — the reference's two architectures
(diagram at /root/reference/images, README.md:5) as single functions.

Reference real-time path:  Kafka → Flink (4 concurrent INSERT jobs)
→ MySQL upsert tables. Here: one SparkSession runs all four streaming
queries concurrently (the reference needed 5 Flink task slots for
this, doc/temp.md:259-268; concurrent writeStream queries are native
in Spark — ST6).

Reference offline path:  Kafka → landing (Flume→Hive / Flink→files)
→ Spark SQL batch agg → MySQL. Here: stream → partitioned parquet
landing → batch two-level agg → keyed result write.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.sinks import KeyedUpsertSink
from bigdataentrytask_spark.sources import writers
from bigdataentrytask_spark.streaming import jobs
from bigdataentrytask_spark.streaming.replay import events_file_stream


def offline_topology(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """Stream-land-aggregate-publish: the reference's offline plan
    (doc/temp.md:101-107) with Flume/Hive/MySQL replaced by
    checkpointed landing + parquet publish."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="offline_out_")
    landing = f"{out_dir}/events_landed"
    result_path = f"{out_dir}/cumulative"

    # 1. land the stream (exactly-once, checkpointed) — S10/ST7
    stream = events_file_stream(spark, sf_dir).drop("ts")  # keep raw cols
    q = writers.land_stream_to_parquet(
        stream.withColumnRenamed("ts_nanos", "ts"), landing
    )
    q.awaitTermination(300)

    # 2. batch two-level agg over the landed table (B1 semantics),
    #    reading through the same loader path as the fixture
    landed = spark.read.parquet(landing)
    ev = landed.withColumn("ts2", F.expr("timestamp_micros(ts div 1000)"))
    inner = (
        ev.select(
            F.date_format("ts2", "yyyy-MM-dd HH").alias("dt"), "user_id", "value"
        )
        .groupBy("dt", "user_id")
        .agg(F.count(F.lit(1)).alias("buy_cnt"), F.sum("value").alias("amount"))
    )
    result = (
        inner.groupBy("dt")
        .agg(
            F.count("user_id").alias("uv"),
            F.sum("buy_cnt").alias("buy_cnt"),
            F.round(F.sum("amount"), 2).alias("amount"),
        )
        .orderBy(F.col("dt").desc())
    )

    # 3. publish (stands in for the MySQL overwrite sink, S7)
    result.write.mode("overwrite").parquet(result_path)
    return spark.read.parquet(result_path).orderBy(F.col("dt").desc())


def realtime_topology(
    spark: SparkSession, sf_dir: str
) -> dict[str, KeyedUpsertSink]:
    """All four reference streaming queries concurrently in one
    session, each upserting into its keyed sink (Q1-Q4 → the four
    MySQL tables, doc/temp.md:317-371)."""
    sinks = {
        "buy_cnt_per_min": KeyedUpsertSink(["window_start"]),
        "payment_user_list": KeyedUpsertSink(["user_id"]),
        "payment_channels_list": KeyedUpsertSink(["channel"]),
        "cumulative_payment_uv_partials": KeyedUpsertSink(["date_str", "user_id"]),
    }

    def start(df: DataFrame, sink: KeyedUpsertSink, mode: str):
        return (
            df.writeStream.outputMode(mode)
            .foreachBatch(sink.upsert_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_rt_"))
            .start()
        )

    queries = [
        start(
            jobs.tumble_minute(events_file_stream(spark, sf_dir)),
            sinks["buy_cnt_per_min"],
            "append",
        ),
        start(
            jobs.user_totals(events_file_stream(spark, sf_dir)),
            sinks["payment_user_list"],
            "update",
        ),
        start(
            jobs.channel_totals(events_file_stream(spark, sf_dir)),
            sinks["payment_channels_list"],
            "update",
        ),
        start(
            jobs.daily_user_partials(events_file_stream(spark, sf_dir)),
            sinks["cumulative_payment_uv_partials"],
            "update",
        ),
    ]
    for q in queries:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("realtime topology query did not finish replay")
    return sinks
