"""Observability: single-pass data-quality gates via observed metrics.

The reference's author lists validation/monitoring/cleansing as the
pipeline's missing pieces (/root/reference/doc/temp.md:921-929); its
only verification was eyeballing `result.show()` against MySQL rows
(doc/temp.md:872-904). This module closes that gap the Spark-native
way: `Dataset.observe` attaches aggregate metrics to the SAME job that
lands the data — at 100 TB that matters, because a separate validation
query would be a second full scan. The metrics ride the action;
constraint checks run driver-side on the handful of aggregated values.

Streaming queries get the same treatment for free: observed metrics
surface in every micro-batch's progress event
(`StreamingQuery.recentProgress[*].observedMetrics`).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQuery


class QualityGateError(ValueError):
    """A landed batch violated its declared constraints."""

    def __init__(self, failures: dict[str, Any], metrics: dict[str, Any]):
        self.failures = failures
        self.metrics = metrics
        super().__init__(f"quality gate failed: {failures} (all metrics: {metrics})")


def land_with_quality_gate(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    checks: dict[str, Callable[[Any], bool]],
    fmt: str = "parquet",
) -> dict[str, Any]:
    """Write `df` while computing `metrics` in the same pass; then
    evaluate `checks` (metric name -> predicate) on the observed
    values. Raises QualityGateError listing every violated check.
    Returns the metric values on success.

    Note the write has already happened when a check fails — the gate
    is a *publish* gate: in production the write targets a staging
    path and promotion to the live path happens only on success
    (same two-phase shape as merge_upsert_parquet).
    """
    obs = Observation("quality_gate")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode("overwrite").format(fmt).save(path)
    got = obs.get
    failures = {k: got[k] for k, pred in checks.items() if not pred(got[k])}
    if failures:
        raise QualityGateError(failures, got)
    return got


def streaming_observed_metrics(query: StreamingQuery) -> list[dict[str, Any]]:
    """All observed-metric rows reported so far by a streaming query,
    one dict per micro-batch that produced them."""
    out: list[dict[str, Any]] = []
    for progress in query.recentProgress:
        om = progress.get("observedMetrics") or {}
        for row in om.values():
            out.append(row.asDict() if hasattr(row, "asDict") else dict(row))
    return out
