"""Typed catalog of the fixture tables.

The reference declares every schema as DDL and never infers
(/root/reference/doc/temp.md:293-303, 639-648). We keep that stance:
each table has an explicit StructType matching the parquet physical
schema; loaders attach derived event-time columns in one canonical
place so every query buckets time identically (SURVEY.md §7 risk 3).

At 100 TB these tables would be directory-partitioned (e.g.
``events/dt=2024-01-01/``) and the loaders pick up partition pruning
for free — the fixture is a single file per table, so the code path
is identical, just with one partition.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Physical schemas (what the parquet footers declare). `events.ts` has
# shipped in two fixture layouts: TIMESTAMP(NANOS) (read as int64 nanos
# via nanosAsLong, see session.py) and TIMESTAMP(MICROS). load_table
# sniffs the footer and canonicalizes either into the same derived
# columns, so queries never see the difference.
SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampNTZType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampNTZType()),
        ]
    ),
    # Wire/JSON schema for events (Kafka value parse and the NANOS
    # parquet layout): `ts` as epoch-nanos int64. File reads use
    # events_physical_schema() instead, which sniffs the footer.
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),  # epoch NANOSECONDS on the wire
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}


_EVENTS_SCHEMA_TS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # TIMESTAMP(MICROS) layout
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _sniff_events_schema(path: str) -> StructType:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # pq.read_schema resolves filesystem from the URI (local, hdfs://,
    # s3://, ...) — a footer-only metadata read either way, no data IO.
    t = pq.read_schema(path).field("ts").type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return _EVENTS_SCHEMA_TS
    return SCHEMAS["events"]


@lru_cache(maxsize=64)
def _cached_events_schema(path: str, mtime_ns: int) -> StructType:
    return _sniff_events_schema(path)


def events_physical_schema(path: str) -> StructType:
    """Pick the read schema for an events parquet by sniffing its
    footer. TIMESTAMP(NANOS) columns are read as raw int64 via
    nanosAsLong; MICROS/MILLIS are read as native timestamps.
    The cache key is (path, mtime) so a fixture regenerated in-place
    with the other ts layout is re-sniffed; non-statable paths
    (remote URIs, directory datasets) skip the cache entirely."""
    try:
        mtime_ns = os.stat(path).st_mtime_ns
    except OSError:
        return _sniff_events_schema(path)
    return _cached_events_schema(path, mtime_ns)


def with_event_time(df: DataFrame) -> DataFrame:
    """Canonicalize an events frame from either physical layout into
    the same derived columns: ``ts`` TIMESTAMP (session-UTC),
    ``ts_nanos`` epoch-nanos BIGINT, ``order_time`` epoch-seconds
    BIGINT. This mirrors the reference's `user_behavior` computed
    column ``ts AS TO_TIMESTAMP(FROM_UNIXTIME(order_time))``
    (/root/reference/doc/temp.md:293-303). Integer division to micros
    matches DuckDB/pyarrow truncation bit-for-bit."""
    if dict(df.dtypes)["ts"] == "bigint":  # NANOS layout: raw int64
        return (
            df.withColumnRenamed("ts", "ts_nanos")
            .withColumn("ts", F.expr("timestamp_micros(ts_nanos div 1000)"))
            .withColumn("order_time", F.expr("ts_nanos div 1000000000"))
        )
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("ts_nanos", F.expr("unix_micros(ts) * 1000"))
        .withColumn("order_time", F.expr("unix_micros(ts) div 1000000"))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its canonical derived columns."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = spark.read.schema(events_physical_schema(path)).parquet(path)
        return with_event_time(df)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view — the SQL surface
    of the engine (reference keeps both surfaces too: temp views at
    /root/reference/doc/temp.md:456, Cumulative.java:54)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
