"""Live JDBC edges against embedded Derby (SURVEY.md §2.1 S4/S6/S7/S8):
real writes, real partitioned reads, real MERGE upserts through
`java.sql.DriverManager` — no mocks. Derby ships in Spark's own jars
(its Hive-metastore dependency), so these run wherever Spark runs;
`jdbc:derby:memory:` keeps the database inside the test JVM, which is
exactly the topology of local-mode Spark.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.sinks import build_upsert_sql, jdbc_upsert_batch
from bigdataentrytask_spark.sources.jdbc import (
    jvm_jdbc_execute,
    partition_predicates,
    read_jdbc_table,
    write_jdbc_table,
)


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


# --------------------------------------------------------------------------
# S7 overwrite + S4 partitioned read
# --------------------------------------------------------------------------
def test_overwrite_write_and_partitioned_read_roundtrip(spark):
    url = _url("t_rt")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.5).alias("v")
    )
    write_jdbc_table(df, url, "kv", mode="overwrite")
    back = read_jdbc_table(
        spark,
        url,
        "kv",
        partition_column='"k"',
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 2.5) for i in range(100)
    ]


def test_overwrite_replaces_previous_contents(spark):
    url = _url("t_ow")
    first = spark.range(0, 10).select(F.col("id").alias("k"))
    second = spark.range(100, 105).select(F.col("id").alias("k"))
    write_jdbc_table(first, url, "ow", mode="overwrite")
    write_jdbc_table(second, url, "ow", mode="overwrite")
    assert sorted(r.k for r in read_jdbc_table(spark, url, "ow").collect()) == [
        100,
        101,
        102,
        103,
        104,
    ]


# --------------------------------------------------------------------------
# S8 append
# --------------------------------------------------------------------------
def test_append_accumulates_rows(spark):
    url = _url("t_ap")
    half1 = spark.range(0, 50).select(F.col("id").alias("k"))
    half2 = spark.range(50, 100).select(F.col("id").alias("k"))
    write_jdbc_table(half1, url, "ap", mode="overwrite")
    write_jdbc_table(half2, url, "ap", mode="append")
    assert sorted(r.k for r in read_jdbc_table(spark, url, "ap").collect()) == list(
        range(100)
    )


# --------------------------------------------------------------------------
# S4: predicates-based read — each generated slice becomes one Spark
# partition; together they return every row exactly once.
# --------------------------------------------------------------------------
def test_predicates_read_covers_all_rows_once(spark):
    url = _url("t_pred")
    df = spark.range(0, 200).select(F.col("id").alias("k"))
    write_jdbc_table(df, url, "pr", mode="overwrite")
    preds = [p.replace("v", '"k"') for p in partition_predicates("v", 0, 200, 5)]
    back = spark.read.jdbc(url, "pr", predicates=preds)
    assert back.rdd.getNumPartitions() == 5
    assert sorted(r.k for r in back.collect()) == list(range(200))


# --------------------------------------------------------------------------
# S6: staged MERGE upsert — executable semantics on a live database.
# --------------------------------------------------------------------------
def test_merge_upsert_last_writer_wins(spark):
    url = _url("t_up")
    execute = jvm_jdbc_execute(spark, url)
    execute('CREATE TABLE totals ("k" BIGINT PRIMARY KEY, "v" DOUBLE)')
    b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double")
    b2 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k bigint, v double")
    for b in (b1, b2):
        jdbc_upsert_batch(b, url, "totals", ["k"], execute=execute, dialect="merge")
    back = sorted((r.k, r.v) for r in read_jdbc_table(spark, url, "totals").collect())
    assert back == [(1, 10.0), (2, 99.0), (3, 30.0)]


def test_merge_sql_text():
    sql = build_upsert_sql("t", ["k", "a", "b"], ["k"], dialect="merge")
    assert sql == (
        'MERGE INTO t t USING t__stage s ON t."k" = s."k" '
        'WHEN MATCHED THEN UPDATE SET "a" = s."a", "b" = s."b" '
        'WHEN NOT MATCHED THEN INSERT ("k", "a", "b") '
        'VALUES (s."k", s."a", s."b")'
    )


def test_upsert_without_execute_raises_with_statement(spark):
    """The no-database path must fail loudly AND carry the merge text
    (the declared contract of the shape-only fallback)."""
    url = _url("t_noexec")
    b = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    with pytest.raises(NotImplementedError, match="MERGE INTO|ON DUPLICATE"):
        jdbc_upsert_batch(b, url, "nx", ["k"], execute=None, dialect="merge")
