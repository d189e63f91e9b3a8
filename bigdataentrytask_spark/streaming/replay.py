"""Streaming source construction.

The reference's streaming source is a Kafka topic consumed by a Flink
dynamic table with computed event-time + watermark
(/root/reference/doc/temp.md:293-312). Here the same logical stream is
built from either source interchangeably — identical downstream code,
which is the point of Structured Streaming:

* `events_file_stream`  — deterministic replay of the fixture parquet
  (tests, offline harness); availableNow triggers give exactly-once
  batch-equivalent runs.
* `events_kafka_stream` — the production shape: format("kafka") +
  from_json with the explicit schema (never inferred — the reference
  declares DDL, /root/reference/doc/temp.md:293-303). Untested in this
  container (no broker); the returned plan is identical from the
  parse step onward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import (
    SCHEMAS,
    events_physical_schema,
    with_event_time,
)
from bigdataentrytask_spark.session import ensure_session_confs

WATERMARK = "5 seconds"  # reference: ts - INTERVAL '5' SECOND (doc/temp.md:303)


def events_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events fixture as a file-source stream with the
    reference's 5s watermark. The read schema is sniffed from the
    fixture footer (NANOS vs MICROS layout) and canonicalized by the
    same helper as the batch loader — the streaming twin of the Flink
    computed column `ts AS TO_TIMESTAMP(FROM_UNIXTIME(order_time))`."""
    ensure_session_confs(spark)
    raw = (
        spark.readStream.schema(
            events_physical_schema(f"{sf_dir}/events.parquet")
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return with_event_time(raw).withWatermark("ts", WATERMARK)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """The Kafka record -> typed events parse stage, shared by the
    live stream below and the batch equivalence test (no broker in
    this environment, so the PARSE semantics are proven on a batch
    frame with the identical (key, value) binary shape —
    tests/test_streaming.py::test_kafka_parse_stage_equivalence)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), SCHEMAS["events"]).alias("e")
    ).select("e.*")
    return with_event_time(parsed)


def events_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "entrytask-mockdata-order",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka JSON stream -> typed events frame (production path).

    Mirrors the reference source table: earliest-offset startup
    (/root/reference/doc/temp.md:307), JSON value format (:310).
    """
    ensure_session_confs(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_events(raw).withWatermark("ts", WATERMARK)
