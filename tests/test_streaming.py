"""Streaming replay tests: real Structured Streaming jobs (availableNow
replay, checkpointed) compared against DuckDB oracles and batch twins."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

STREAMING = [
    "stream_tumble_minute",
    "stream_user_totals",
    "stream_daily_uv",
    "stream_sliding_5m",
    "stream_channel_weighted",
]
MULTIMODAL = [
    "multimodal_decode",
    "multimodal_meta_stats",
    "multimodal_resize_plan",
]


@pytest.mark.parametrize("name", STREAMING + MULTIMODAL)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_stream_tumble_equals_batch_minus_open_windows(spark):
    """The streamed tumble result must be the batch tumble minus the
    windows the watermark hasn't closed (append-mode semantics)."""
    batch = {
        r.window_start: r.buy_cnt
        for r in REGISTRY["q2_tumble_minute"](spark, SF_DIR).collect()
    }
    stream = {
        r.window_start: r.buy_cnt
        for r in REGISTRY["stream_tumble_minute"](spark, SF_DIR).collect()
    }
    assert set(stream) <= set(batch)
    assert all(batch[k] == v for k, v in stream.items())
    assert len(batch) - len(stream) <= 2  # only trailing open windows withheld


def test_stream_daily_uv_equals_batch(spark):
    a = [tuple(r) for r in REGISTRY["q1_daily_uv_payment"](spark, SF_DIR).collect()]
    b = [tuple(r) for r in REGISTRY["stream_daily_uv"](spark, SF_DIR).collect()]
    assert a == b


def test_stateful_sessionizer_matches_batch(spark):
    """applyInPandasWithState sessionizer: emitted (closed) sessions
    must equal the batch session_window result minus sessions the
    final watermark could not close."""
    import datetime

    from bigdataentrytask_spark.catalog import load_table
    from bigdataentrytask_spark.streaming.stateful import (
        SESSION_GAP_S,
        run_stateful_sessions_replay,
    )

    got = {
        (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S"), r.n_events,
         r.duration_us)
        for r in run_stateful_sessions_replay(spark, SF_DIR).collect()
    }

    max_ts = (
        load_table(spark, SF_DIR, "events").selectExpr("max(ts) AS m").collect()[0].m
    )
    watermark = max_ts - datetime.timedelta(seconds=5)
    expected = set()
    for r in REGISTRY["user_sessions"](spark, SF_DIR).collect():
        start = datetime.datetime.strptime(r.session_start, "%Y-%m-%d %H:%M:%S")
        # reconstruct session end to µs precision from duration
        end = start + datetime.timedelta(microseconds=r.duration_us)
        # closed iff a successor event existed OR the watermark passed
        # end+GAP; replay has no successor info here, so compare only
        # sessions provably closed by watermark, and assert the rest
        # are absent from the stream output
        if end + datetime.timedelta(seconds=SESSION_GAP_S) <= watermark:
            expected.add((r.user_id, r.session_start, r.n_events, r.duration_us))
    # every watermark-closed batch session must be emitted...
    missing = expected - got
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:3]}"
    # ...and nothing emitted that batch doesn't know about
    batch_all = {
        (r.user_id, r.session_start, r.n_events, r.duration_us)
        for r in REGISTRY["user_sessions"](spark, SF_DIR).collect()
    }
    extra = got - batch_all
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:3]}"


def test_stream_stream_join_equals_batch(spark):
    """Inner stream-stream interval join over a fully-replayed source
    must equal the batch range join exactly."""
    from bigdataentrytask_spark.streaming.jobs import (
        run_stream_stream_attribution_replay,
    )

    got = sorted(
        tuple(r)
        for r in run_stream_stream_attribution_replay(spark, SF_DIR).collect()
    )
    want = sorted(
        tuple(r)
        for r in REGISTRY["signup_purchase_within_5m"](spark, SF_DIR).collect()
    )
    assert got == want


def test_from_json_malformed_rows_are_permissive(spark):
    """Connector-format JSON robustness: malformed payloads must yield
    NULL-field rows (PERMISSIVE), never fail the stream."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    df = spark.createDataFrame(
        [
            ('{"k": 1, "v": 2}',),
            ("not json at all",),
            ('{"k": "wrong-type"}',),
            (None,),
            ('{"k": 3}',),
        ],
        "payload string",
    ).select(F.from_json("payload", schema).alias("j"))
    rows = df.select("j.k", "j.v").collect()
    assert [tuple(r) for r in rows] == [
        (1, 2),
        (None, None),
        (None, None),
        (None, None),
        (3, None),
    ]


def test_stream_dedup_equals_batch_distinct(spark):
    from bigdataentrytask_spark.streaming.jobs import run_stream_dedup_replay

    got = run_stream_dedup_replay(spark, SF_DIR)
    src = REGISTRY["q3_user_payment"](spark, SF_DIR)  # warm fixture only
    from bigdataentrytask_spark.catalog import load_table

    batch = (
        load_table(spark, SF_DIR, "events")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "value")
    )
    assert got.count() == batch.count()
    assert got.selectExpr("round(sum(value), 2)").collect() == batch.selectExpr(
        "round(sum(value), 2)"
    ).collect()


def test_stream_sessionize_oracle(spark, duck):
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    df = REGISTRY["stream_sessionize_stateful"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["stream_sessionize_stateful"], "stream_sessionize"
    )


def test_stream_signup_attribution_oracle(spark, duck):
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    df = REGISTRY["stream_signup_attribution"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["stream_signup_attribution"], "stream_signup_attr"
    )


def test_kafka_parse_stage_equivalence(spark):
    """No broker exists in this environment, so the Kafka path's PARSE
    stage is proven on a batch frame with the exact Kafka record shape
    (key/value binary): serializing the canonical events to JSON wire
    values and running `parse_kafka_events` must reproduce every
    canonical column — event ids, nano timestamps, doubles, and the
    nested props JSON string — bit-for-bit."""
    from pyspark.sql import functions as F

    from bigdataentrytask_spark.catalog import load_table
    from bigdataentrytask_spark.streaming.replay import parse_kafka_events
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props",
            "ts_nanos", "order_time"]
    wire = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                F.col("ts_nanos").alias("ts"),  # epoch-nanos on the wire
                "user_id",
                "event_type",
                "value",
                "props",
            )
        ).cast("binary").alias("value"),
    )
    parsed = parse_kafka_events(wire).select(*cols)
    expected = ev.select(*cols)
    assert parsed.exceptAll(expected).count() == 0
    assert expected.exceptAll(parsed).count() == 0


def test_kafka_parse_stage_tolerates_malformed_records(spark):
    """A poisoned record on the wire (broken JSON / wrong shape) must
    not fail the stream: from_json is PERMISSIVE, yielding NULL fields
    the pipeline can quarantine — while valid records still parse."""
    from pyspark.sql import functions as F

    from bigdataentrytask_spark.streaming.replay import parse_kafka_events

    good = (
        '{"event_id": 7, "ts": 1704067200000000000, "user_id": 42,'
        ' "event_type": "purchase", "value": 9.5, "props": "{}"}'
    )
    rows = [
        (good,),
        ("this is not json",),
        ('{"event_id": "not-a-number"}',),
        (None,),
    ]
    wire = spark.createDataFrame(rows, "value string").select(
        F.col("value").cast("binary").alias("value")
    )
    parsed = parse_kafka_events(wire).collect()
    assert len(parsed) == len(rows)
    ok = [r for r in parsed if r.event_id == 7]
    assert len(ok) == 1 and ok[0].user_id == 42 and ok[0].value == 9.5
    bad = [r for r in parsed if r.event_id is None]
    assert len(bad) == 3
    for r in bad:
        assert r.user_id is None


def test_stream_session_window_oracle(spark, duck):
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY
    from tests.conftest import SF_DIR, assert_matches_oracle

    df = REGISTRY["stream_session_window"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["stream_session_window"], "stream_session_window"
    )


def test_stream_jdbc_upsert_restart_is_idempotent(spark):
    """Checkpoint-resume semantics: re-running the availableNow replay
    against the SAME checkpoint finds no new data, triggers no new
    micro-batches, and leaves the Derby table byte-identical — the
    exactly-once contract of the foreachBatch MERGE sink."""
    import tempfile

    from pyspark.sql import functions as F

    from bigdataentrytask_spark.sinks import jdbc_upsert_batch
    from bigdataentrytask_spark.sources.jdbc import (
        jvm_jdbc_execute,
        read_jdbc_table,
    )
    from bigdataentrytask_spark.streaming import jobs
    from bigdataentrytask_spark.streaming.replay import events_file_stream
    from tests.conftest import SF_DIR

    url = "jdbc:derby:memory:restart_upsert;create=true"
    execute = jvm_jdbc_execute(spark, url)
    for tbl in ("rst_totals", "rst_totals__stage"):
        try:
            execute(f"DROP TABLE {tbl}")
        except Exception:
            pass
    execute(
        'CREATE TABLE rst_totals ("user_id" BIGINT PRIMARY KEY, "payment" DOUBLE)'
    )
    ck = tempfile.mkdtemp(prefix="ck_rst_")
    batches = []

    def sink(batch_df, batch_id):
        batches.append(batch_id)
        jdbc_upsert_batch(
            batch_df, url, "rst_totals", key_cols=["user_id"],
            execute=execute, dialect="merge",
        )

    def run_once():
        q = (
            jobs.user_totals(events_file_stream(spark, SF_DIR))
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    first = sorted(
        (r.user_id, r.payment)
        for r in read_jdbc_table(spark, url, "rst_totals").collect()
    )
    n_batches_first = len(batches)
    assert first and n_batches_first >= 1

    run_once()  # same checkpoint: no new files -> no data batches
    second = sorted(
        (r.user_id, r.payment)
        for r in read_jdbc_table(spark, url, "rst_totals").collect()
    )
    assert second == first
    assert len(batches) == n_batches_first  # nothing re-processed
