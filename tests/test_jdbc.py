"""JDBC edge confidence without a database (SURVEY.md §2.1 S4/S6/S7/S8):
the partition-split algebra and the upsert-merge statement are pure
functions, so their laws are checked directly — and the ANSI merge text
is EXECUTED against DuckDB and compared with the in-memory upsert twin.
"""

import duckdb
import pytest

from bigdataentrytask_spark.sinks import KeyedUpsertSink, build_upsert_sql
from bigdataentrytask_spark.sources.jdbc import partition_predicates


# --------------------------------------------------------------------------
# S4: range-split predicates — every value (and NULL) lands in exactly
# one slice, evaluated by a real SQL engine rather than by re-deriving
# the arithmetic.
# --------------------------------------------------------------------------
@pytest.mark.parametrize(
    "lo,hi,parts",
    [(0, 1000, 8), (1, 7, 3), (-500, 500, 4), (0, 10, 32), (5, 5, 4), (0, 3, 1)],
)
def test_partition_predicates_partition_the_line(lo, hi, parts):
    preds = partition_predicates("v", lo, hi, parts)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT UNNEST(range(-2000, 2001)) AS v "
        "UNION ALL SELECT NULL"
    )
    total = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
    covered = 0
    for p in preds:
        covered += con.execute(f"SELECT COUNT(*) FROM t WHERE {p}").fetchone()[0]
    # disjoint + covering <=> per-slice counts sum to the total
    assert covered == total, (preds, covered, total)
    if parts > 1 and hi > lo:
        assert len(preds) == parts


def test_partition_predicates_null_lands_in_first_slice():
    preds = partition_predicates("v", 0, 100, 4)
    assert "IS NULL" in preds[0]
    assert all("IS NULL" not in p for p in preds[1:])


# --------------------------------------------------------------------------
# S6: the merge statement. Text shape for the MySQL dialect; executable
# semantics for the ANSI dialect (DuckDB speaks it verbatim).
# --------------------------------------------------------------------------
def test_upsert_sql_mysql_text():
    sql = build_upsert_sql(
        "user_total", ["user_id", "total", "ts"], ["user_id"], dialect="mysql"
    )
    assert sql == (
        "INSERT INTO user_total (user_id, total, ts) "
        "SELECT user_id, total, ts FROM user_total__stage "
        "ON DUPLICATE KEY UPDATE total=VALUES(total), ts=VALUES(ts)"
    )


def test_upsert_sql_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["k", "v"], ["k"], dialect="oracle11g")


def test_ansi_upsert_sql_executes_and_matches_keyed_sink():
    """Run the generated ANSI merge over three micro-batches in DuckDB;
    the final table must equal KeyedUpsertSink fed the same batches."""
    batches = [
        [(1, 10.0, "a"), (2, 20.0, "b")],
        [(2, 25.0, "b2"), (3, 30.0, "c")],
        [(1, 99.0, "z"), (4, 40.0, "d")],
    ]
    cols = ["user_id", "total", "tag"]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE user_total (user_id BIGINT PRIMARY KEY, "
        "total DOUBLE, tag VARCHAR)"
    )
    con.execute(
        "CREATE TABLE user_total__stage (user_id BIGINT, total DOUBLE, tag VARCHAR)"
    )
    merge = build_upsert_sql("user_total", cols, ["user_id"], dialect="ansi")

    sink = KeyedUpsertSink(["user_id"])
    for batch in batches:
        con.execute("DELETE FROM user_total__stage")
        con.executemany("INSERT INTO user_total__stage VALUES (?, ?, ?)", batch)
        con.execute(merge)
        # feed the twin without Spark: mimic upsert_batch's row merging
        for row in batch:
            sink.rows[(row[0],)] = dict(zip(cols, row))

    db = sorted(con.execute("SELECT * FROM user_total").fetchall())
    mem = sorted(tuple(r[c] for c in cols) for r in sink.snapshot())
    assert db == mem == [
        (1, 99.0, "z"),
        (2, 25.0, "b2"),
        (3, 30.0, "c"),
        (4, 40.0, "d"),
    ]
