"""bigdataentrytask_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline zion325/bigDataEntryTask
(/root/reference, read-only): Kafka -> Flink SQL streaming aggs +
Spark batch aggs -> MySQL. Here everything is idiomatic PySpark:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for
the streaming path, and a north-star operator layer (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Layout:
  session       SparkSession factory with scale-aware defaults
  catalog       explicit schemas + loaders for the fixture tables
  functions/    scalar/vector/text column-expression helpers
  operators/    named query operators  (spark, sf_dir) -> DataFrame
  streaming/    Structured Streaming jobs (watermark, tumble, upsert)
  plans/        plan-inspection helpers (pushdown / join assertions)
"""

from bigdataentrytask_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
