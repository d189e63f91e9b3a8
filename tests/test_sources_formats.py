"""Round-trip, SCD2, and Python-DataSource connector tests."""

import datetime

from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import SCHEMAS, load_table
from bigdataentrytask_spark.sources import formats, pyds, writers
from tests.conftest import SF_DIR


def test_csv_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").limit(500)
    path = str(tmp_path / "orders_csv")
    formats.write_csv(orders, path)
    back = formats.read_csv(spark, path, SCHEMAS["orders"])
    assert back.schema == orders.schema
    assert back.count() == 500
    a = sorted(orders.collect())
    b = sorted(back.collect())
    assert a == b


def test_jsonl_roundtrip_preserves_rows(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, path)
    back = formats.read_jsonl(spark, path, SCHEMAS["documents"])
    assert back.schema == docs.schema
    assert sorted(docs.collect()) == sorted(back.collect())


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_mktsegment string, valid_from timestamp_ntz, "
        "valid_to timestamp_ntz, is_current boolean",
    )


def test_scd2_apply_versions_changed_keys(spark):
    t0 = datetime.datetime(2024, 1, 1)
    dim = _dim(
        spark,
        [
            (1, "BUILDING", t0, None, True),
            (2, "MACHINERY", t0, None, True),
            (3, "AUTOMOBILE", t0, None, True),
        ],
    )
    updates = spark.createDataFrame(
        [(1, "FURNITURE"), (2, "MACHINERY"), (9, "HOUSEHOLD")],
        "c_custkey long, c_mktsegment string",
    )
    out = writers.scd2_apply(
        dim, updates, ["c_custkey"], ["c_mktsegment"], "2024-06-01 00:00:00"
    )
    rows = {(r.c_custkey, r.is_current): r for r in out.collect()}
    assert len(rows) == 5  # 3 current survivors/new + 1 closed + 1 unchanged
    closed = rows[(1, False)]
    assert closed.valid_to == datetime.datetime(2024, 6, 1)
    assert rows[(1, True)].c_mktsegment == "FURNITURE"
    assert rows[(2, True)].c_mktsegment == "MACHINERY"  # unchanged, untouched
    assert rows[(2, True)].valid_from == t0
    assert rows[(9, True)].c_mktsegment == "HOUSEHOLD"  # brand-new key
    assert rows[(3, True)].valid_from == t0  # absent from updates → untouched


def test_scd2_point_in_time_lookup(spark):
    t0 = datetime.datetime(2024, 1, 1)
    dim = _dim(spark, [(1, "BUILDING", t0, None, True)])
    updates = spark.createDataFrame([(1, "FURNITURE")], "c_custkey long, c_mktsegment string")
    out = writers.scd2_apply(dim, updates, ["c_custkey"], ["c_mktsegment"], "2024-06-01 00:00:00")
    asof = datetime.datetime(2024, 3, 1)
    hit = out.filter(
        (F.col("valid_from") <= F.lit(asof))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(asof)))
    ).collect()
    assert len(hit) == 1 and hit[0].c_mktsegment == "BUILDING"


def test_python_datasource_deterministic_and_partitioned(spark):
    pyds.register(spark)
    df = (
        spark.read.format("mock_orders")
        .option("n_rows", 1000)
        .option("num_partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 1000
    assert all(1 <= r.user_id <= 5000 for r in rows)
    assert all(1 <= r.amount <= 10000 for r in rows)
    assert all(0 <= r.channel_id <= 200 for r in rows)
    # partition-count invariance: same rows with a different split
    again = sorted(
        spark.read.format("mock_orders")
        .option("n_rows", 1000)
        .option("num_partitions", 3)
        .load()
        .collect()
    )
    assert again == sorted(rows)


def test_python_datasource_matches_reference_shape(spark):
    pyds.register(spark)
    df = spark.read.format("mock_orders").option("n_rows", 10).load()
    assert [f.name for f in df.schema.fields] == [
        "order_id",
        "user_id",
        "order_tz",
        "amount",
        "currency",
        "channel_id",
        "order_time",
    ]
    r = df.collect()[0]
    assert len(str(r.order_id)) == 15
    assert r.order_tz == "beijing" and r.currency == "rmb"
