"""Deterministic synthetic order generator — the engine-native form of
the reference's mock producer (S1/S2).

The reference emits one random order dict every 3-10 s from a Python
loop through a per-message Kafka producer
(/root/reference/code/project/entryTask/src/main/entryTask/__init__.py:13-25,
datagenkafka.py:29-33 — note it rebuilds the producer per message).
Here generation is a distributed, reproducible DataFrame: `spark.range`
partitions the id space across executors and every column is a pure
hash expression of the id — same seed, same rows, any cluster size.
Rate-limited streaming demos swap `spark.range` for the `rate` source
with the same column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# generation rules mirror the reference generator's distributions
# (__init__.py:15-21): 15-digit order ids, user_id 1..5000,
# amount 1..10000, channel_id 0..200, constant tz/currency.
BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC


def _bounded_hash(col, lo: int, hi: int, salt: str):
    """Deterministic uniform integer in [lo, hi] from (id, salt)."""
    span = hi - lo + 1
    return (F.abs(F.xxhash64(col, F.lit(salt))) % span + lo).cast("long")


def mock_orders(
    spark: SparkSession,
    n_rows: int,
    seed: str = "entrytask",
    mean_gap_s: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """user_behavior-shaped frame (SURVEY.md §1.2 schema)."""
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    gap = _bounded_hash(F.col("id"), 3, 10, seed + ":gap")  # ref: 3-10 s
    return base.select(
        (
            F.lit(10**14)
            + _bounded_hash(F.col("id"), 0, 9 * 10**14 - 1, seed + ":oid")
        ).alias("order_id"),
        _bounded_hash(F.col("id"), 1, 5000, seed + ":uid").alias("user_id"),
        F.lit("beijing").alias("order_tz"),
        _bounded_hash(F.col("id"), 1, 10000, seed + ":amt").alias("amount"),
        F.lit("rmb").alias("currency"),
        _bounded_hash(F.col("id"), 0, 200, seed + ":ch").alias("channel_id"),
        (F.lit(BASE_EPOCH) + F.col("id") * F.lit(mean_gap_s) + gap).alias(
            "order_time"
        ),
    )


def mock_orders_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Streaming variant on the rate source — same columns, live."""
    base = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    gap = _bounded_hash(F.col("value"), 3, 10, "stream:gap")
    return base.select(
        (
            F.lit(10**14)
            + _bounded_hash(F.col("value"), 0, 9 * 10**14 - 1, "stream:oid")
        ).alias("order_id"),
        _bounded_hash(F.col("value"), 1, 5000, "stream:uid").alias("user_id"),
        F.lit("beijing").alias("order_tz"),
        _bounded_hash(F.col("value"), 1, 10000, "stream:amt").alias("amount"),
        F.lit("rmb").alias("currency"),
        _bounded_hash(F.col("value"), 0, 200, "stream:ch").alias("channel_id"),
        (F.unix_timestamp("timestamp") + gap).alias("order_time"),
    )
