"""Live JDBC round-trip operators — the reference's MySQL batch-sink
and PK-upsert edges (S4/S6/S7, /root/reference/doc/temp.md:446-485,
/root/reference/doc/Cumulative.java:84-90) executed against a REAL
database: Spark's bundled embedded Derby (`jdbc:derby:memory:`).

These are registered queries so the differential harness checks the
whole edge — Spark aggregate -> JDBC write -> (MERGE upsert) ->
partitioned JDBC read — against a plain-SQL oracle on the source
parquet. A round-trip that loses rows, mangles types, or mis-merges
keys shows up as a hash mismatch.

Scale posture: the JDBC edge carries RESULT tables (per-user totals,
dashboards) — thousands to millions of rows — never the 100 TB fact
side. The partitioned read splits on the key range (one connection
per task); the upsert stages each micro-batch and issues ONE MERGE
statement per batch, not per-row writes (the reference's
row-at-a-time flush, datagenkafka.py:24, is the anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs
from bigdataentrytask_spark.sinks import jdbc_upsert_batch
from bigdataentrytask_spark.sources.jdbc import read_jdbc_table, write_jdbc_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, "events")


def _drop_if_exists(execute, table: str) -> None:
    """Derby has no DROP TABLE IF EXISTS; a missing table raises
    SQLState 42Y55, which is exactly the ignorable case."""
    try:
        execute(f"DROP TABLE {table}")
    except Exception:
        pass


# --------------------------------------------------------------------------
# S7 + S4: overwrite-write a result table, read it back partitioned.
# --------------------------------------------------------------------------
@operator(
    "jdbc_roundtrip",
    oracle="""
    SELECT user_id, ROUND(SUM(value), 2) AS payment
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id ORDER BY user_id
    """,
)
def jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase totals -> Derby (overwrite) -> partitioned
    JDBC scan back. The read splits user_id into 4 range predicates —
    Spark's first/last slices are open-ended, so fixed bounds still
    cover every row."""
    agg = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("payment"))
    )
    url = "jdbc:derby:memory:jdbc_roundtrip;create=true"
    write_jdbc_table(agg, url, "user_payment", mode="overwrite")
    back = read_jdbc_table(
        spark,
        url,
        "user_payment",
        partition_column='"user_id"',
        lower_bound=0,
        upper_bound=150,
        num_partitions=4,
    )
    return back.select("user_id", "payment").orderBy("user_id")


# --------------------------------------------------------------------------
# S6: staged MERGE upsert, two overlapping micro-batches.
# --------------------------------------------------------------------------
@operator(
    "jdbc_upsert_roundtrip",
    oracle="""
    WITH b1 AS (
      SELECT user_id, ROUND(SUM(value), 2) AS payment
      FROM events
      WHERE event_type = 'purchase' AND day(ts) <= 15
      GROUP BY user_id
    ),
    b2 AS (
      SELECT user_id, ROUND(SUM(value), 2) AS payment
      FROM events
      WHERE event_type = 'purchase' AND day(ts) > 15
      GROUP BY user_id
    )
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.payment, b1.payment) AS payment
    FROM b1 FULL OUTER JOIN b2 ON b1.user_id = b2.user_id
    ORDER BY user_id
    """,
)
def jdbc_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Flink->MySQL PK-upsert pattern
    (doc/temp.md:317-371) driven end-to-end: two month-halves of
    per-user purchase totals upserted in order; a key present in both
    batches must hold the SECOND batch's value. The oracle's FULL
    OUTER + COALESCE states exactly that last-writer-wins contract."""
    from bigdataentrytask_spark.sources.jdbc import jvm_jdbc_execute

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")

    def half(cond) -> DataFrame:
        return (
            ev.filter(cond)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 2).alias("payment"))
        )

    b1 = half(F.dayofmonth("ts") <= 15)
    b2 = half(F.dayofmonth("ts") > 15)

    url = "jdbc:derby:memory:jdbc_upsert;create=true"
    execute = jvm_jdbc_execute(spark, url)
    _drop_if_exists(execute, "user_totals")
    _drop_if_exists(execute, "user_totals__stage")
    execute(
        'CREATE TABLE user_totals ("user_id" BIGINT PRIMARY KEY, "payment" DOUBLE)'
    )
    for batch_df in (b1, b2):
        jdbc_upsert_batch(
            batch_df,
            url,
            "user_totals",
            key_cols=["user_id"],
            execute=execute,
            dialect="merge",
        )
    back = read_jdbc_table(spark, url, "user_totals")
    return back.select("user_id", "payment").orderBy("user_id")
