"""Round-9 hygiene: the bounded-collect guard (VERDICT r8 item 3) and
the ADVICE-r8 fixes — capture-scoped plan audit, identity-based
materialize substitution, and segment-deduped exchange counting.
"""

from __future__ import annotations

import pytest

import bigdataentrytask_spark.plans as plans
from bigdataentrytask_spark.operators import (
    LAST_MATERIALIZED,
    MATERIALIZE_MAX_ROWS,
    PERSISTED_INPUTS,
    capture,
    collect_bounded,
    materialize,
    with_persisted,
)


# ---------------------------------------------------------------- guard


def test_collect_bounded_passes_small(spark):
    rows = collect_bounded(spark.range(10))
    assert len(rows) == 10


def test_collect_bounded_rejects_fact_scale(spark):
    with pytest.raises(RuntimeError, match="bounded-summary contract"):
        collect_bounded(spark.range(501), n_max=500)


def test_materialize_enforces_guard(spark):
    # materialize shares the guard — a fact-scale frame must fail
    # loudly, not silently ship a driver-side collect
    assert MATERIALIZE_MAX_ROWS == 100_000
    with pytest.raises(RuntimeError, match="bounded-summary contract"):
        materialize(spark.range(MATERIALIZE_MAX_ROWS + 1))


# ------------------------------------------------------- capture scope


def test_no_capture_outside_audit(spark):
    """Normal operator execution (sweep/pytest/bench) must not
    accumulate DataFrame references in the module globals."""
    LAST_MATERIALIZED.clear()
    PERSISTED_INPUTS.clear()
    df = spark.range(5)
    with with_persisted(df):
        materialize(df.groupBy().count())
    assert LAST_MATERIALIZED == []
    assert PERSISTED_INPUTS == []


def test_capture_records_pairs_and_inputs(spark):
    df = spark.range(5)
    with capture():
        with with_persisted(df):
            local = materialize(df.groupBy().count())
        assert len(PERSISTED_INPUTS) == 1 and PERSISTED_INPUTS[0] is df
        assert len(LAST_MATERIALIZED) == 1
        lazy, recorded_local = LAST_MATERIALIZED[0]
        assert recorded_local is local  # identity — the audit's key
        assert lazy is not local
    # capture() clears on ENTRY (not exit) so the audit can read the
    # capture after the block; a fresh capture starts empty
    with capture():
        assert LAST_MATERIALIZED == [] and PERSISTED_INPUTS == []


def test_capture_identity_distinguishes_composed_ops(spark):
    """A composed op returns its own lazy frame built on top of an
    inner materialize — the audit must NOT substitute in that case."""
    with capture():
        inner_local = materialize(spark.range(3).groupBy().count())
        composed = inner_local.selectExpr("count * 2 as c2")  # lazy
    matches = [local for _lazy, local in LAST_MATERIALIZED if composed is local]
    assert matches == []  # no identity match -> audit composed as-is
    assert any(inner_local is local for _lazy, local in LAST_MATERIALIZED)


# --------------------------------------------- exchange segment dedupe


def test_count_exchanges_dedupes_reprinted_segments(spark, monkeypatch):
    """Unlabeled exchanges inside a text-identical reprinted Final
    segment (a persisted subtree printed under each consumer) must
    count once (ADVICE r8)."""
    seg = "HashAggregate\n  Exchange hashpartitioning(k, 32)\n    Scan\n"
    fake = (
        "TopPlan\n== Final Plan ==" + seg +
        "== Initial Plan ==IGNORED\n"
        "== Final Plan ==" + seg  # identical reprint
    )
    monkeypatch.setattr(plans, "executed_plan", lambda df: fake)
    assert plans.count_exchanges(spark.range(1)) == 1


def test_count_exchanges_distinct_segments_both_count(spark, monkeypatch):
    fake = (
        "Top\n== Final Plan ==A\n  Exchange hashpartitioning(k1, 32)\n"
        "== Final Plan ==B\n  Exchange hashpartitioning(k2, 32)\n"
    )
    monkeypatch.setattr(plans, "executed_plan", lambda df: fake)
    assert plans.count_exchanges(spark.range(1)) == 2


def test_count_exchanges_plan_id_still_dedupes(spark, monkeypatch):
    fake = (
        "Top\n== Final Plan ==A\n  Exchange hashpartitioning(k, 32), plan_id=7\n"
        "== Final Plan ==B\n  Exchange hashpartitioning(k, 32), plan_id=7\n"
    )
    monkeypatch.setattr(plans, "executed_plan", lambda df: fake)
    assert plans.count_exchanges(spark.range(1)) == 1


def test_count_exchanges_real_plan_unchanged(spark):
    """Smoke: a real single-shuffle aggregation still counts 1."""
    df = spark.range(100).selectExpr("id % 7 as k").groupBy("k").count()
    df.collect()
    assert plans.count_exchanges(df) == 1


# ------------------------------------------------- static collect scan


def test_no_raw_collect_in_package_source():
    """VERDICT r10 item 5: every driver-side collect in the operator
    library must route through collect_bounded (which materialize
    wraps), so the 100k loud-failure contract is universal. Sanctioned
    raw sites: the guard's own implementation (operators/__init__.py)
    the declared sink edge (sinks.py foreachBatch upsert, where the
    micro-batch is the unit of delivery), and the plan auditor's
    execute-to-get-the-final-AQE-plan step (plans/audit.py)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "bigdataentrytask_spark"
    )
    allowed = {"operators/__init__.py", "sinks.py", "plans/audit.py"}
    offenders = []
    for py in pkg.rglob("*.py"):
        rel = py.relative_to(pkg).as_posix()
        if rel in allowed:
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".collect()" in line and not line.lstrip().startswith("#"):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert offenders == [], offenders
