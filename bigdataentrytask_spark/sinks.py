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


def build_upsert_sql(
    table: str,
    cols: list[str],
    key_cols: list[str],
    dialect: str = "mysql",
    staging: str | None = None,
) -> str:
    """The staged-merge statement, as a pure function of the schema —
    unit-testable without a database, and executable against any engine
    that speaks the dialect (the ANSI form runs verbatim on DuckDB /
    Postgres, which is how tests exercise its semantics end-to-end).

    Contract: the staged batch is key-unique (foreachBatch callers
    dedupe by key first — `latest_event_per_user` is that operator);
    ANSI ON CONFLICT rejects double-updates of one row in a single
    statement, and MySQL would apply them in arbitrary order.
    """
    staging = staging or f"{table}__stage"
    collist = ", ".join(cols)
    if dialect == "mysql":
        updates = ", ".join(f"{c}=VALUES({c})" for c in cols if c not in key_cols)
        return (
            f"INSERT INTO {table} ({collist}) "
            f"SELECT {collist} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "ansi":
        updates = ", ".join(f"{c}=excluded.{c}" for c in cols if c not in key_cols)
        return (
            f"INSERT INTO {table} ({collist}) "
            f"SELECT {collist} FROM {staging} "
            f"ON CONFLICT ({', '.join(key_cols)}) DO UPDATE SET {updates}"
        )
    if dialect == "merge":
        # ANSI MERGE (Derby / DB2 / Oracle / SQL Server). Identifiers
        # are double-quoted because Spark's JDBC writer creates the
        # staging table with quoted (case-preserved) column names — an
        # unquoted reference would fold to the engine's default case
        # and miss them. Executed for REAL against embedded Derby in
        # tests and in the jdbc_upsert_roundtrip operator.
        def q(c: str) -> str:
            return f'"{c}"'

        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in cols if c not in key_cols)
        ins_cols = ", ".join(q(c) for c in cols)
        ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
        return (
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
    raise ValueError(f"unknown dialect: {dialect}")


def jdbc_upsert_batch(
    batch_df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
    execute=None,
    dialect: str = "mysql",
) -> None:
    """foreachBatch body for JDBC upsert: stage the micro-batch into a
    temp table, then merge. Spark's JDBC writer only appends/overwrites,
    so the merge statement runs over the staged rows — one round trip
    per batch, no per-row Python. `execute` is the post-stage statement
    runner — `sources.jdbc.jvm_jdbc_execute` is the live implementation
    (used against embedded Derby by `jdbc_upsert_roundtrip` and
    tests/test_jdbc_derby.py); without one this raises with the merge
    text. The merge TEXT is `build_upsert_sql`: the ANSI form runs on
    DuckDB in tests, the MERGE form on Derby.
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
    merge_sql = build_upsert_sql(table, batch_df.columns, key_cols, dialect, staging)
    if execute is None:
        raise NotImplementedError(
            "execute merge_sql over a JDBC connection here; no database is "
            f"available in this environment. Statement: {merge_sql}"
        )
    execute(merge_sql)
