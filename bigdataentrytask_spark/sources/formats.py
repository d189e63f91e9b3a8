"""Text-format round-trips: CSV and JSON-lines with declared schemas.

The reference's stance is schema-on-write everywhere — every table is
declared DDL, JSON deserialization is schema-driven
(/root/reference/doc/temp.md:293-312) — so these readers NEVER infer:
an explicit StructType is required, exactly like the Kafka `from_json`
path (S3). Inference would mean a full extra pass over 100 TB before
the real scan; a declared schema costs nothing and catches drift
(columns appearing/vanishing) as nulls + `_corrupt_record` instead of
silent type flips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Header-less compressed CSV — the lowest-common-denominator
    export sink (reference sinks to MySQL for the same interoperability
    reason, doc/temp.md:477-485)."""
    df.write.mode("overwrite").option("compression", compression).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """PERMISSIVE mode: malformed rows land as nulls instead of
    failing the 100-TB job at file 99,999."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSON-lines — the reference's wire format (UTF-8 JSON per order,
    datagenkafka.py:22-24) as a file sink."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
