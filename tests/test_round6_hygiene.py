"""Round-6 hygiene gates (VERDICT r5 items 6 and 7).

1. Composed-oracle dependency invariant: several oracles interpolate
   other operators' ORACLES strings at import time (f-strings), so a
   rename fails loudly — but a SQL edit in a base oracle silently
   changes every composition built on it. This test makes the
   dependency graph explicit: it extracts every ``ORACLES["..."]``
   reference from the operator sources and asserts each base entry
   still exists and still EXPLAINs standalone in DuckDB.

2. Tempdir cleanup under mid-write failure: the roundtrip operators
   (csv/jsonl/partitioned) write a table-sized copy under tempfile
   inside every sweep; their ``finally: rmtree`` must hold when the
   write itself blows up halfway, or a crashing sweep leaks /tmp.
"""

from __future__ import annotations

import glob
import os
import re
import tempfile

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all

load_all()

_OPS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bigdataentrytask_spark",
    "operators",
)

_REF_RE = re.compile(r"ORACLES\[[\"'](\w+)[\"']\]")


def _composed_oracle_refs() -> dict[str, set[str]]:
    """module basename -> set of base-oracle names it interpolates."""
    refs: dict[str, set[str]] = {}
    # recursive: the operator surface is now partly packages
    # (similarity/, warehouse/, text_analysis/ — the r11/r14 splits)
    for path in glob.glob(
        os.path.join(_OPS_DIR, "**", "*.py"), recursive=True
    ):
        if os.path.basename(path) == "__init__.py":
            continue
        with open(path) as fh:
            names = set(_REF_RE.findall(fh.read()))
        if names:
            refs[os.path.relpath(path, _OPS_DIR)] = names
    return refs


def test_composed_oracle_refs_exist():
    refs = _composed_oracle_refs()
    # the composition pattern is load-bearing across >= 5 modules; if
    # this shrinks to zero the regex (or the pattern) broke, not the code
    assert len(refs) >= 5, f"expected composed oracles in >=5 modules, got {refs}"
    all_names = set().union(*refs.values())
    assert len(all_names) >= 12
    missing = {
        mod: sorted(n for n in names if n not in ORACLES)
        for mod, names in refs.items()
        if any(n not in ORACLES for n in names)
    }
    assert not missing, (
        f"composed oracles reference base entries missing from ORACLES "
        f"(renamed or unregistered): {missing}"
    )
    # every referenced base must also still be a registered operator —
    # an oracle whose Spark twin vanished is a dead spec
    unregistered = sorted(n for n in all_names if n not in REGISTRY)
    assert not unregistered, f"base oracles without operators: {unregistered}"


def test_composed_oracle_bases_explain(duck):
    """Each interpolated base oracle must still parse standalone —
    an edit that breaks the base breaks every composition built on it
    before the driver ever runs."""
    refs = _composed_oracle_refs()
    for names in refs.values():
        for name in sorted(names):
            try:
                duck.execute(f"EXPLAIN {ORACLES[name]}")
            except Exception as exc:  # pragma: no cover - failure path
                pytest.fail(f"base oracle {name!r} no longer parses: {exc}")


# --------------------------------------------------------------------------
# /tmp hygiene under injected mid-write failure
# --------------------------------------------------------------------------
class _Boom(RuntimeError):
    pass


@pytest.fixture
def tracked_mkdtemp(monkeypatch):
    """Record every mkdtemp the operator creates so the test can
    assert the finally-block removed them."""
    created: list[str] = []
    real = tempfile.mkdtemp

    def recorder(*args, **kwargs):
        path = real(*args, **kwargs)
        created.append(path)
        return path

    monkeypatch.setattr(tempfile, "mkdtemp", recorder)
    return created


def _assert_cleaned(created):
    assert created, "operator never reached mkdtemp — injection fired too early"
    leaked = [p for p in created if os.path.exists(p)]
    assert not leaked, f"tempdirs leaked after mid-write failure: {leaked}"


@pytest.mark.parametrize(
    "op_name,write_fn",
    [("csv_roundtrip", "write_csv"), ("jsonl_roundtrip", "write_jsonl")],
)
def test_text_roundtrip_cleanup_on_write_failure(
    spark, monkeypatch, tracked_mkdtemp, op_name, write_fn
):
    from bigdataentrytask_spark.sources import formats

    def boom(*args, **kwargs):
        raise _Boom(f"injected {write_fn} failure")

    monkeypatch.setattr(formats, write_fn, boom)
    with pytest.raises(_Boom):
        REGISTRY[op_name](spark, "/root/testdata/sf0.001")
    _assert_cleaned(tracked_mkdtemp)


def test_partitioned_roundtrip_cleanup_on_write_failure(
    spark, monkeypatch, tracked_mkdtemp
):
    # the partitioned writer derives the partition column via F.year
    # AFTER mkdtemp — failing it simulates a plan-build crash mid-write
    from pyspark.sql import functions as pf

    def boom(*args, **kwargs):
        raise _Boom("injected year() failure")

    monkeypatch.setattr(pf, "year", boom)
    with pytest.raises(_Boom):
        REGISTRY["partitioned_write_prune_read"](spark, "/root/testdata/sf0.001")
    _assert_cleaned(tracked_mkdtemp)
