"""Plan inspection: assert the physical plan is the one we designed.

Correct results from a bad plan don't survive a 100x scale-up — these
helpers make plan shape part of the test suite (scan pruning, filter
pushdown, broadcast choice, exchange counts), per the SURVEY.md §4
posture.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — the column-
    pruning check."""
    m = re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    cols: list[str] = []
    for schema in m:
        cols.extend(p.split(":")[0].strip() for p in schema.split(",") if p.strip())
    return cols


def pushed_filters(df: DataFrame) -> str:
    """PushedFilters clauses from every scan — the predicate-pushdown
    check."""
    return " ; ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)))


def _final_plan(df: DataFrame) -> str:
    """Executed plan, truncated to AQE's final section (the string
    otherwise repeats the initial plan and double-counts operators)."""
    plan = executed_plan(df)
    marker = "== Initial Plan =="
    return plan.split(marker)[0] if marker in plan else plan


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the executed plan (AQE-final where available)."""
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)",
            _final_plan(df),
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _final_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans, marked `*(N)` in plan strings."""
    return len(set(re.findall(r"\*\((\d+)\)", _final_plan(df))))
