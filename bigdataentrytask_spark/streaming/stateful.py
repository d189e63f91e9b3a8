"""Custom stateful streaming operator: per-user sessionization with
explicit state management (`applyInPandasWithState`).

This is the escape hatch for streaming semantics the built-in
operators can't express (SURVEY.md §2.8 / north-star custom stateful
ops): arbitrary per-key state, event-time timeouts, custom emission
policy. The built-in `F.session_window` could compute these sessions
too — which is exactly why it makes a good showcase: the custom
operator's output is verifiable against the batch twin
(`user_sessions`), while the state-machine skeleton generalizes to
logic window functions cannot express (e.g. cart-abandonment, fraud
sequences, per-entity CEP).

State model per user: open session (start, last_ts, n_events, sum
value). An event extends the session if it falls within GAP of
last_ts, else the open session is EMITTED and a new one starts.
Sessions are also emitted on event-time timeout — when the watermark
passes last_ts + GAP the session can never be extended again
(exactly-once, late-data-safe closure). Sessions still open when the
replay ends remain in state (matching append-mode semantics: only
finalized results are emitted).
"""

from __future__ import annotations

import tempfile
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdataentrytask_spark.streaming.replay import events_file_stream

SESSION_GAP_S = 30 * 60  # 30 minutes, matching the batch user_sessions op

OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, "
    "sum_value double, duration_us long"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def _emit(state_tuple: tuple) -> dict[str, Any]:
    start_us, last_us, n, total = state_tuple
    return {
        "user_id": None,  # filled by caller
        "session_start": pd.Timestamp(start_us, unit="us"),
        "n_events": n,
        "sum_value": total,
        "duration_us": last_us - start_us,
    }


def sessionize(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State function: one invocation per (user, micro-batch)."""
    (user_id,) = key
    out: list[dict[str, Any]] = []

    if state.hasTimedOut:
        # watermark passed last+GAP: the open session is final
        if state.exists:
            row = _emit(state.get)
            row["user_id"] = user_id
            out.append(row)
            state.remove()
        yield pd.DataFrame(out, columns=OUT_SCHEMA_COLS) if out else pd.DataFrame(
            columns=OUT_SCHEMA_COLS
        )
        return

    rows = pd.concat(list(pdfs))
    # micro-batch arrival order is not event order — sort within batch
    rows = rows.sort_values("ts")
    # normalize to ns first: pandas may hand datetime64[ns] or [us]
    ts_us = (
        rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).to_numpy()
    vals = rows["value"].to_numpy()

    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us, last_us, n, total = 0, 0, 0, 0.0

    for t, v in zip(ts_us, vals):
        # >= : an event at exactly GAP starts a new session, matching
        # both F.session_window and the batch gaps-and-islands oracle
        if n > 0 and t - last_us >= SESSION_GAP_S * 1_000_000:
            row = _emit((start_us, last_us, n, total))
            row["user_id"] = user_id
            out.append(row)
            n, total = 0, 0.0
        if n == 0:
            start_us = int(t)
        last_us, n, total = int(t), n + 1, total + float(v)

    state.update((int(start_us), int(last_us), int(n), float(total)))
    # close the session once the watermark passes last + GAP
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_S * 1000)
    yield (
        pd.DataFrame(out, columns=OUT_SCHEMA_COLS)
        if out
        else pd.DataFrame(columns=OUT_SCHEMA_COLS)
    )


OUT_SCHEMA_COLS = ["user_id", "session_start", "n_events", "sum_value", "duration_us"]


def run_stateful_sessions_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic replay of the stateful sessionizer; returns the
    emitted (closed) sessions."""
    import uuid

    events = events_file_stream(spark, sf_dir).select("user_id", "ts", "value")
    sessions = events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stateful_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_state_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stateful session replay did not finish")
    return spark.table(name).orderBy("user_id", "session_start")
