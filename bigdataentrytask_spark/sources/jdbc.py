"""JDBC sources/sinks — the reference's MySQL/Hive-over-JDBC edges
(SURVEY.md §2.1 S4/S5/S7/S8) in native Spark form.

No MySQL exists in this container, but Spark bundles embedded Derby
(its Hive-metastore dependency), so every edge below is exercised for
REAL against `jdbc:derby:memory:` databases — actual partitioned
reads, overwrite/append writes, and MERGE upserts through a live JDBC
connection (tests/test_jdbc_derby.py, operators/jdbc_bridge.py).
Memory-backed Derby is single-JVM, which exactly matches local-mode
Spark; on a real cluster the same code points at a server database:

* S4 `read_jdbc_table` — partitioned parallel read: WHERE-clause
  splitting on a numeric column, the scalable form of the reference's
  single-connection read (/root/reference/doc/temp.md:446-453).
* S5 Hive: the reference detours through HiveServer2 JDBC plus a
  custom dialect to un-quote identifiers (Cumulative.java:37-44,
  97-109). Native Spark reads Hive tables through the catalog
  (`spark.read.table`), which makes both the detour and the dialect
  hack disappear — nothing to implement, documented here for parity.
* S7/S8 `write_jdbc_table` — overwrite/append batch sink
  (doc/temp.md:477-485; Cumulative.java:84-90).
* S6 upsert lives in sinks.jdbc_upsert_batch (foreachBatch merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def partition_predicates(
    column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
) -> list[str]:
    """The WHERE clauses of a range-partitioned JDBC scan — the same
    stride arithmetic Spark's JDBCRelation.columnPartition uses
    (first slice catches NULLs and everything below the lower bound;
    last slice is open-ended above), exposed as a pure function so the
    split algebra is unit-testable without a database, and reusable
    with `spark.read.jdbc(..., predicates=...)` for columns Spark's
    built-in numeric splitter can't handle.

    Laws the tests assert: slices are pairwise disjoint, their union
    is all values (every integer and NULL lands in exactly one slice),
    and there are exactly `num_partitions` of them.
    """
    if num_partitions <= 1 or upper_bound <= lower_bound:
        return ["1=1"]
    stride = max(upper_bound // num_partitions - lower_bound // num_partitions, 1)
    preds: list[str] = []
    current = lower_bound + stride
    for i in range(num_partitions):
        if i == 0:
            preds.append(f"{column} < {current} OR {column} IS NULL")
        elif i == num_partitions - 1:
            preds.append(f"{column} >= {current - stride}")
        else:
            preds.append(f"{column} >= {current - stride} AND {column} < {current}")
        current += stride
    return preds


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan. With a partition column, Spark issues
    `num_partitions` range-split queries — one connection per task —
    instead of the reference's single-threaded read."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """Batch JDBC write, S7 (overwrite) / S8 (append). rewriteBatched
    inserts beat the reference's row-at-a-time flush pattern
    (datagenkafka.py:24) by orders of magnitude."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def jvm_jdbc_execute(spark: SparkSession, url: str):
    """A statement runner over the driver JVM's `java.sql.DriverManager`
    — the `execute` callback for `sinks.jdbc_upsert_batch` (DDL and the
    post-stage MERGE run on the DB server, one round trip, no per-row
    Python). Uses the same JVM classpath as Spark's own JDBC
    source/sink, so any driver Spark can load, this can execute
    against."""

    def execute(sql: str) -> None:
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.execute(sql)
            finally:
                st.close()
        finally:
            conn.close()

    return execute
