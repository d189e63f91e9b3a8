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


def _final_segments(df: DataFrame) -> list[str]:
    """Executed plan, reduced to AQE final sections only (the string
    otherwise repeats the initial plan and double-counts operators).

    Persisted subtrees print their own nested ``== Final Plan ==`` /
    ``== Initial Plan ==`` blocks under each InMemoryRelation, so a
    truncate-at-first-Initial heuristic would drop the remainder of
    the OUTER plan; instead keep every Final segment and drop every
    Initial segment. Returned as a LIST so callers can dedupe
    identical segments (a persisted subtree reprints its whole Final
    segment under each InMemoryTableScan consumer)."""
    parts = re.split(r"== (Initial|Final) Plan ==", executed_plan(df))
    kept = [parts[0]]
    kept.extend(
        parts[i + 1] for i in range(1, len(parts), 2) if parts[i] == "Final"
    )
    return kept


def _final_plan(df: DataFrame) -> str:
    return "\n".join(_final_segments(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the executed plan (AQE-final where available).

    A persisted subtree's plan is printed once PER InMemoryTableScan
    consumer although it executes once — dedupe by plan_id where the
    plan tags one; exchanges WITHOUT a plan_id tag (common inside
    reprinted cached subtrees) are deduped by counting them only in
    the first occurrence of each identical Final segment (ADVICE r8:
    text-identical reprints must not inflate the count).

    Known limit of the text-identity heuristic (ADVICE r9): two
    GENUINELY DISTINCT executions whose Final segments happen to be
    byte-identical (e.g. the same uncached subquery instantiated twice
    in one plan) are merged and their shuffles undercounted by the
    unlabeled-exchange path. Spark tags plan_id on all top-level AQE
    exchanges, so the exposure is only unlabeled exchanges inside
    repeated identical segments — accepted as an undercount-biased
    audit (an audit that can only under-report shuffles never hides a
    regression behind an inflated baseline)."""
    ids: set[str] = set()
    n_unlabeled = 0
    seen_segments: set[str] = set()
    for seg in _final_segments(df):
        is_reprint = seg.strip() in seen_segments
        seen_segments.add(seg.strip())
        for m in re.finditer(
            r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)[^\n]*",
            seg,
        ):
            idm = re.search(r"plan_id=(\d+)", m.group(0))
            if idm:
                ids.add(idm.group(1))
            elif not is_reprint:
                n_unlabeled += 1
    return len(ids) + n_unlabeled


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _final_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans, marked `*(N)` in plan strings."""
    return len(set(re.findall(r"\*\((\d+)\)", _final_plan(df))))
