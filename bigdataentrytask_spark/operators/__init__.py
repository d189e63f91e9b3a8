"""Operator library: every named query is `(spark, sf_dir) -> DataFrame`.

`REGISTRY` maps operator name -> callable; `ORACLES` maps the same
names -> equivalent DuckDB SQL (the differential-correctness spec,
SURVEY.md §5). Operators without SQL-expressible semantics appear in
REGISTRY only — the harness then runs a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


# Plan-audit capture (plans/audit.py): `materialize` returns a
# LocalRelation, so the interesting executed plan would be invisible
# to the audit. materialize records the lazy DataFrame it evaluated
# here (outermost call wins); with_persisted records its inputs so
# scan-pruning columns survive even when the scans sit inside a
# cached subtree the formatted explain doesn't recurse into.
LAST_MATERIALIZED: list[DataFrame] = []
PERSISTED_INPUTS: list[DataFrame] = []


@contextmanager
def with_persisted(*dfs: DataFrame) -> Iterator[DataFrame | tuple[DataFrame, ...]]:
    """Persist shared intermediates for the duration of an operator
    body, guaranteeing release on exit.

    Composed operators re-consume an expensive verified input several
    times (degree agg + semi-join + census, or csize + both pair
    sides); a bare ``.cache()`` makes the kernel run once but pins the
    blocks for the rest of a 400-operator sweep session. This helper
    is the sanctioned pattern: persist -> build and MATERIALIZE the
    bounded result inside the block (see :func:`materialize`) ->
    unpersist in ``finally``. Returning a still-lazy plan from inside
    the block defeats the persist (the driver's later collect would
    recompute the unpersisted input), so pair it with ``materialize``.
    """
    PERSISTED_INPUTS.extend(dfs)
    for df in dfs:
        df.persist()
    try:
        yield dfs[0] if len(dfs) == 1 else dfs
    finally:
        for df in dfs:
            df.unpersist()


def materialize(df: DataFrame) -> DataFrame:
    """Evaluate a BOUNDED result eagerly and rebuild it as a
    local-relation DataFrame, so persisted inputs can be released
    before the operator returns.

    Only for domain-sized outputs (census rows, top-k rankings,
    cluster-size rollups) — the same bounded-summary contract the
    repo's existing ``createDataFrame(collect())`` sites declare.
    Never call this on fact-scale frames."""
    LAST_MATERIALIZED.clear()
    LAST_MATERIALIZED.append(df)
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


def operator(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query operator and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        # duplicate names silently overwrite (dict semantics) and the
        # earlier operator vanishes from the registry — refuse loudly
        # (idempotent for the same function object, so module reloads
        # in long-lived test sessions stay safe)
        prior = REGISTRY.get(name)
        if prior is not None and (
            prior.__module__,
            prior.__qualname__,
        ) != (fn.__module__, fn.__qualname__):
            raise ValueError(
                f"operator name {name!r} already registered by "
                f"{prior.__module__}.{prior.__qualname__}"
            )
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so REGISTRY is fully populated."""
    from bigdataentrytask_spark.operators import (  # noqa: F401
        analytics,
        curation,
        dedup,
        graph,
        jdbc_bridge,
        multimodal,
        reference_batch,
        similarity,
        sources_bridge,
        sql_surface,
        star,
        stats,
        streaming_bridge,
        text_analysis,
        timeseries,
        tpch,
        warehouse,
        windows_pivot,
    )
    # evaluation composes other operators' ORACLES — must import last
    from bigdataentrytask_spark.operators import evaluation  # noqa: F401
