"""Batch/stream writers: the reference's landing patterns made native.

Reference patterns covered (SURVEY.md §2.1):
* S9  Hive ORC transactional table, bucketed by order_id into 2 buckets
  (/root/reference/doc/temp.md:639-648, loaded by Flume :676-705) →
  `write_bucketed` — a bucketed, sorted table whose bucket key makes
  subsequent joins/aggs on that key shuffle-free.
* S10 Flink→HDFS file landing read back by Spark (doc/temp.md:103) →
  `land_stream_to_parquet` — checkpointed Structured Streaming file
  sink (exactly-once, replacing Flume's at-least-once memory channel).
* Date partitioning (the 100 TB posture from SURVEY.md §4): fact
  tables land as dt=yyyy-MM-dd directories so time-bucket predicates
  (P3/P4) become partition pruning, not row filtering.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.functions.time import day_bucket


def write_partitioned_events(
    events: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    """Land the events fact partitioned by event date. At 100 TB the
    dt= layout turns every trailing-window query (B2) into a partition-
    pruned scan."""
    (
        events.withColumn("dt", day_bucket("ts"))
        .repartition("dt")  # one writer task per partition dir, no tiny files
        .write.mode("overwrite")
        .partitionBy("dt")
        .format(fmt)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 2,
    fmt: str = "orc",
    path: str | None = None,
) -> None:
    """Bucketed + sorted table — the native analog of the reference's
    `CLUSTERED BY (order_id) INTO 2 BUCKETS` ORC table
    (/root/reference/doc/temp.md:648). Joins/aggregations keyed on
    `bucket_col` between tables bucketed the same way plan with zero
    exchanges. With `path` the table is EXTERNAL (data at the given
    location, metadata in the session catalog) — use this from
    sessions whose warehouse dir must stay untouched."""
    w = (
        df.write.mode("overwrite")
        .format(fmt)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def land_stream_to_parquet(
    stream: DataFrame, path: str, checkpoint: str | None = None
):
    """Checkpointed streaming file sink (S10): exactly-once landing,
    micro-batch durability without Flume's channel/txn knobs
    (doc/temp.md:695-700 → ST7)."""
    return (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ck_land_"),
        )
        .trigger(availableNow=True)
        .start()
    )


def read_landed(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def merge_upsert_parquet(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """Batch MERGE into a parquet table: rows matching on the key are
    replaced by the update, new keys are appended — the lakehouse-
    native analog of the reference's MySQL `ON DUPLICATE KEY UPDATE`
    sink (/root/reference/doc/temp.md:322-329). Implemented as an
    anti-join rewrite (keep base rows whose key has no update, union
    the updates). Without a transaction log the swap is
    write-temp-then-replace; Delta/Iceberg provide the atomic commit in
    production — the plan shape (anti-join + union) is identical.
    """
    base = spark.read.parquet(base_path)
    keep = base.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = keep.unionByName(updates)
    tmp = base_path.rstrip("/") + "__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # re-materialize over the original path (non-atomic without a table
    # format; see docstring)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(base_path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_rows: int = 1_000_000,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows/target) files. Streaming sinks and incremental merges
    accumulate small files; at scale, scan throughput collapses without
    periodic compaction (file-open overhead + lost vectorization).
    Returns the new file count."""
    import math

    df = spark.read.parquet(path)
    n = df.count()
    parts = max(1, math.ceil(n / target_file_rows))
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(parts).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    return parts


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_ts: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge, as one declarative plan.

    `dim` carries (key_cols, tracked_cols, valid_from, valid_to,
    is_current); `updates` carries (key_cols, tracked_cols). Keys whose
    tracked attributes changed get their current version closed
    (valid_to = effective_ts) and a new open version appended; brand-new
    keys get an open version; unchanged keys pass through untouched.

    The reference's sinks overwrite state per key (MySQL upsert,
    /root/reference/doc/temp.md:322-329) — SCD2 is the auditable
    variant a warehouse actually wants: history is kept, and a point-in-time
    lookup is just a `valid_from <= t < valid_to` predicate.

    Plan shape: one join of dim⋈updates on the key (both sides hashed
    on key_cols — at scale the dim would be bucketed on the key so this
    is shuffle-free) + a union of three branches; no window, no loop.
    """
    from pyspark.sql import functions as F

    changed_cond = F.lit(False)
    for c in tracked_cols:
        changed_cond = changed_cond | ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))

    d = dim.alias("d")
    u = updates.alias("u")
    key = [F.col(f"d.{k}") == F.col(f"u.{k}") for k in key_cols]

    current = d.filter(F.col("is_current"))
    history = d.filter(~F.col("is_current")).select("d.*")

    joined = current.join(u, key, "full_outer")
    k0 = F.col(f"d.{key_cols[0]}")
    uk0 = F.col(f"u.{key_cols[0]}")

    untouched = joined.filter(uk0.isNull() | (k0.isNotNull() & ~changed_cond)).select(
        "d.*"
    )
    closed = (
        joined.filter(k0.isNotNull() & uk0.isNotNull() & changed_cond)
        .select("d.*")
        .withColumn("valid_to", F.lit(effective_ts).cast("timestamp_ntz"))
        .withColumn("is_current", F.lit(False))
    )
    opened = (
        joined.filter(uk0.isNotNull() & (k0.isNull() | changed_cond))
        .select("u.*")
        .withColumn("valid_from", F.lit(effective_ts).cast("timestamp_ntz"))
        .withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
        .withColumn("is_current", F.lit(True))
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(opened)
