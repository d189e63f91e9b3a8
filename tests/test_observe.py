"""Quality-gate and observed-metrics tests."""

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.observe import (
    QualityGateError,
    land_with_quality_gate,
    streaming_observed_metrics,
)
from bigdataentrytask_spark.streaming.replay import events_file_stream
from tests.conftest import SF_DIR


def _metrics():
    return {
        "rows": F.count(F.lit(1)),
        "null_users": F.sum(F.col("user_id").isNull().cast("long")),
        "max_value": F.max("value"),
    }


def test_quality_gate_passes_and_reports(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    got = land_with_quality_gate(
        ev.select("event_id", "user_id", "value"),
        str(tmp_path / "landed"),
        _metrics(),
        {"rows": lambda v: v == 10_000, "null_users": lambda v: v == 0},
    )
    assert got["rows"] == 10_000 and got["null_users"] == 0
    assert spark.read.parquet(str(tmp_path / "landed")).count() == 10_000


def test_quality_gate_raises_on_violation(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    with pytest.raises(QualityGateError) as err:
        land_with_quality_gate(
            ev,
            str(tmp_path / "landed2"),
            _metrics(),
            {"rows": lambda v: v > 10_000_000, "max_value": lambda v: v is not None},
        )
    assert "rows" in err.value.failures
    assert "max_value" not in err.value.failures
    assert err.value.metrics["rows"] == 10_000


def test_streaming_observed_metrics(spark, tmp_path):
    stream = events_file_stream(spark, SF_DIR).observe(
        "batch_stats", F.count(F.lit(1)).alias("rows"), F.max("ts").alias("max_ts")
    )
    q = (
        stream.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    assert q.awaitTermination(300)
    rows = streaming_observed_metrics(q)
    assert rows and sum(r["rows"] for r in rows) == 10_000
