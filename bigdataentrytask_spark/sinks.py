"""Sinks: keyed upsert (the reference's MySQL PK-upsert pattern) and
plain JDBC writes.

The reference sinks every streaming query into MySQL via Flink JDBC
PK-upsert tables (/root/reference/doc/temp.md:317-371) and batch
results via Spark JDBC overwrite/append
(/root/reference/doc/temp.md:477-485, Cumulative.java:84-90). Spark
JDBC has no native upsert, so streaming upserts ride foreachBatch —
`KeyedUpsertSink` is the in-process stand-in used by tests (no MySQL
in this container) and `jdbc_upsert_batch` the production-shaped
variant: same merge semantics, same call site.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame


class KeyedUpsertSink:
    """In-memory keyed upsert target: every batch merges rows by key —
    exactly the observable behavior of `INSERT ... ON DUPLICATE KEY
    UPDATE` driven from foreachBatch. Thread-safe: micro-batches of
    concurrent queries may land from different threads.
    """

    def __init__(self, key_cols: list[str]):
        self.key_cols = key_cols
        self.rows: dict[tuple, dict[str, Any]] = {}
        self._lock = threading.Lock()

    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # .collect() here is the sink edge, not a plan step: foreachBatch
        # hands us a batch whose size is bounded by the trigger, exactly
        # like the JDBC writer would buffer it.
        rows = [r.asDict() for r in batch_df.collect()]
        with self._lock:
            for r in rows:
                self.rows[tuple(r[k] for k in self.key_cols)] = r

    def snapshot(self) -> list[dict[str, Any]]:
        with self._lock:
            return list(self.rows.values())


def jdbc_upsert_batch(
    batch_df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
) -> None:
    """foreachBatch body for JDBC upsert: stage the micro-batch into a
    temp table, then merge. Spark's JDBC writer only appends/overwrites,
    so the merge statement runs over the staged rows — one round trip
    per batch, no per-row Python. Untestable here (no database in the
    container); the tested twin is KeyedUpsertSink.
    """
    staging = f"{table}__stage"
    (
        batch_df.write.mode("overwrite")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .options(**(properties or {}))
        .save()
    )
    cols = batch_df.columns
    updates = ", ".join(f"{c}=VALUES({c})" for c in cols if c not in key_cols)
    merge_sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"SELECT {', '.join(cols)} FROM {staging} "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )
    raise NotImplementedError(
        "execute merge_sql over a JDBC connection here; no database is "
        f"available in this environment. Statement: {merge_sql}"
    )
