"""Canonical event-time bucketing.

The reference mixes three inconsistent epoch conventions:
* epoch-seconds -> `TO_TIMESTAMP(FROM_UNIXTIME(order_time))`
  (/root/reference/doc/temp.md:301)
* epoch-ms with `from_utc_timestamp(order_time*1000,'PRC')`
  (/root/reference/doc/temp.md:468)
* cast-to-timestamp with `from_utc_timestamp(cast(...), 'PRC')`
  (/root/reference/doc/Cumulative.java:70)

SURVEY.md §7 risk 3 mandates ONE canonical path. Everything here
formats in the session time zone (UTC) so results hash-match the
DuckDB oracle; a deployment wanting Asia/Shanghai buckets flips the
session time zone, not the query code.

All helpers are pure Column expressions — they stay inside
whole-stage codegen and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_from_epoch_seconds(col: Column | str) -> Column:
    """BIGINT epoch-seconds -> TIMESTAMP.

    Reference: `ts AS TO_TIMESTAMP(FROM_UNIXTIME(order_time))`
    (/root/reference/doc/temp.md:301). `timestamp_seconds` is the
    direct builtin — no string round-trip.
    """
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hour_bucket(ts: Column | str) -> Column:
    """'yyyy-MM-dd HH' — the reference's `substr(ts_string, 1, 13)`
    hour slice (/root/reference/doc/temp.md:468, Cumulative.java:70),
    done with date_format instead of string surgery."""
    return F.date_format(_c(ts), "yyyy-MM-dd HH")


def minute_bucket(ts: Column | str) -> Column:
    """'HH:mm' minute-of-day string — Q1's `DATE_FORMAT(ts,'HH:mm')`
    (/root/reference/doc/temp.md:382)."""
    return F.date_format(_c(ts), "HH:mm")


def day_bucket(ts: Column | str) -> Column:
    """'yyyy-MM-dd' — Q1's `DATE_FORMAT(ts,'yyyy-MM-dd')`
    (/root/reference/doc/temp.md:381)."""
    return F.date_format(_c(ts), "yyyy-MM-dd")
