"""End-to-end topology tests: both reference architectures replayed."""

from bigdataentrytask_spark import pipelines
from bigdataentrytask_spark.operators import REGISTRY, load_all
from tests.conftest import SF_DIR_SMALL

load_all()


def test_offline_topology_matches_direct_query(spark, tmp_path):
    """stream → landing → batch agg → publish must equal the direct
    b1_hourly_uv over the fixture."""
    via_pipeline = [
        tuple(r)
        for r in pipelines.offline_topology(
            spark, SF_DIR_SMALL, str(tmp_path / "out")
        ).collect()
    ]
    direct = [tuple(r) for r in REGISTRY["b1_hourly_uv"](spark, SF_DIR_SMALL).collect()]
    assert via_pipeline == direct


def test_realtime_topology_all_four_queries(spark):
    """Four concurrent streaming queries; each sink's final state must
    match its batch twin."""
    sinks = pipelines.realtime_topology(spark, SF_DIR_SMALL)

    users = {
        r["user_id"]: r["payment"] for r in sinks["payment_user_list"].snapshot()
    }
    batch_users = {
        r.user_id: r.payment
        for r in REGISTRY["q3_user_payment"](spark, SF_DIR_SMALL).collect()
    }
    assert users == batch_users

    channels = {
        r["channel"]: (r["payment"], r["cnt"])
        for r in sinks["payment_channels_list"].snapshot()
    }
    batch_channels = {
        r.channel: (r.payment, r.cnt)
        for r in REGISTRY["q4_channel_payment"](spark, SF_DIR_SMALL).collect()
    }
    assert channels == batch_channels

    # tumble sink: subset of batch windows (watermark withholds the tail)
    tumble = {
        r["window_start"]: r["buy_cnt"] for r in sinks["buy_cnt_per_min"].snapshot()
    }
    batch_tumble = {
        r.window_start: r.buy_cnt
        for r in REGISTRY["q2_tumble_minute"](spark, SF_DIR_SMALL).collect()
    }
    assert set(tumble) <= set(batch_tumble)
    assert len(batch_tumble) - len(tumble) <= 2
    assert all(batch_tumble[k] == v for k, v in tumble.items())

    # daily partials re-aggregate to the Q1 batch result
    from bigdataentrytask_spark.streaming.jobs import reaggregate_daily

    daily = [
        (r.date_str, r.uv, r.payment)
        for r in reaggregate_daily(
            sinks["cumulative_payment_uv_partials"], spark
        ).collect()
    ]
    batch_daily = [
        (r.date_str, r.uv, r.payment)
        for r in REGISTRY["q1_daily_uv_payment"](spark, SF_DIR_SMALL).collect()
    ]
    assert daily == batch_daily


def test_restart_recovery_exactly_once(spark):
    """ST7 hard case: a checkpointed landing killed between halves and
    restarted must land the full corpus exactly once — per-type count
    equals distinct-id count (no duplication), and the totals equal
    the batch aggregate over the whole fixture."""
    from pyspark.sql import functions as F

    from bigdataentrytask_spark.catalog import load_table

    out = {
        r.event_type: (r.cnt, r.n_distinct, r.total_value)
        for r in REGISTRY["stream_restart_recovery"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    batch = {
        r.event_type: (r.cnt, r.n_distinct, r.total_value)
        for r in load_table(spark, SF_DIR_SMALL, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("event_id").alias("n_distinct"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert out == batch
    for cnt, n_distinct, _ in out.values():
        assert cnt == n_distinct  # restart duplicated nothing


def test_concurrent_topology_operator_summarizes_all_sinks(spark):
    """ST6 registry entry: the 4-sink summary frame has one row per
    sink with positive counts, and the update-mode user sink count
    equals the batch distinct-user count."""
    rows = {
        r.sink: (r.n_rows, r.total_cents)
        for r in REGISTRY["stream_concurrent_topology"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(rows) == {
        "buy_cnt_per_min",
        "payment_user_list",
        "payment_channels_list",
        "cumulative_payment_uv_partials",
    }
    assert all(n > 0 for n, _ in rows.values())
    n_users = REGISTRY["q3_user_payment"](spark, SF_DIR_SMALL).count()
    assert rows["payment_user_list"][0] == n_users


def test_restart_recovery_after_midstream_kill(spark, tmp_path):
    """ST7, hard case: the landing query is stopped after its FIRST
    micro-batch (maxFilesPerTrigger=1 — a genuine mid-stream kill with
    unprocessed source files remaining), then a fresh query resumes
    from the checkpoint. The landed table must hold every source row
    exactly once."""
    import time

    from pyspark.sql import functions as F

    from bigdataentrytask_spark.catalog import load_table

    ev = load_table(spark, SF_DIR_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    src, land, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "land"),
        str(tmp_path / "ck"),
    )
    ev.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema

    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q1 = (
        raw.writeStream.format("parquet")
        .option("path", land)
        .option("checkpointLocation", ck)
        .start()
    )
    # wait for at least one committed micro-batch, then kill mid-run
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q1.lastProgress
        if p and p["numInputRows"] > 0:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(60)

    # resume from the same checkpoint; drain the remainder
    raw2 = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    q2 = (
        raw2.writeStream.format("parquet")
        .option("path", land)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)

    back = spark.read.parquet(land)
    n_src = ev.count()
    stats = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("nd"),
    ).collect()[0]
    assert stats.n == n_src        # nothing lost
    assert stats.nd == n_src       # nothing duplicated
