"""Property tests for the round-4 algebraic laws on RANDOM synthetic
tables — shapes the fixed TPC-H fixture never produces (keys present
only in old, only in new, empty sides, single-row tables):

* incremental view maintenance: merge(agg(old), agg(delta)) must
  equal agg(old ∪ delta) for ANY split of the rows (count/sum by +,
  min/max by least/greatest);
* CDC round trip: apply(old, diff(old, new)) must equal new for ANY
  pair of keyed states.

Both drive the PRODUCTION cores — `merge_partial_aggs`,
`diff_snapshots`, `apply_changelog` from operators/warehouse.py, the
exact code `incremental_agg_merge` and `cdc_apply_changelog` run —
and compare against independent driver-side Python folds.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.operators.warehouse import (
    apply_changelog,
    diff_snapshots,
    merge_partial_aggs,
)


def _random_rows(rng, keys):
    return [
        (k, rng.randint(1, 10_000))
        for k in keys
        for _ in range(rng.randint(0, 4))
    ]


def _py_agg(rows):
    out = {}
    for k, c in rows:
        n, s, lo, hi = out.get(k, (0, 0, None, None))
        out[k] = (
            n + 1,
            s + c,
            c if lo is None else min(lo, c),
            c if hi is None else max(hi, c),
        )
    return out


def _spark_agg(spark, rows):
    if not rows:
        return spark.createDataFrame([], "k long, n long, s long, lo long, hi long")
    return (
        spark.createDataFrame(rows, "k long, c long")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
        )
    )


@pytest.mark.parametrize("seed", range(12))
def test_ivm_merge_equals_full_recompute(spark, seed):
    rng = random.Random(seed)
    keys = range(1, rng.randint(2, 25))
    rows = _random_rows(rng, keys)
    cut = rng.randint(0, len(rows))
    old, delta = rows[:cut], rows[cut:]

    merged_df = merge_partial_aggs(
        _spark_agg(spark, old),
        _spark_agg(spark, delta),
        key="k",
        add_cols=("n", "s"),
        min_cols=("lo",),
        max_cols=("hi",),
    )
    merged = {r.k: (r.n, r.s, r.lo, r.hi) for r in merged_df.collect()}
    assert merged == _py_agg(rows)


def _state_df(spark, state):
    if not state:
        return spark.createDataFrame([], "k long, n long, s long")
    return spark.createDataFrame(
        [(k, n, s) for k, (n, s) in state.items()], "k long, n long, s long"
    )


@pytest.mark.parametrize("seed", range(12))
def test_cdc_apply_after_diff_is_identity(spark, seed):
    rng = random.Random(seed)
    universe = list(range(1, 30))

    def val(r):
        # NULLs in value columns are first-class: side-presence (not
        # value nullness) must drive insert/delete, and NULL<->value
        # transitions must register as updates (null-safe drift)
        return (
            None if r.random() < 0.1 else r.randint(1, 5),
            None if r.random() < 0.2 else r.randint(1, 999),
        )

    old = {
        k: val(rng) for k in rng.sample(universe, rng.randint(0, 20))
    }
    new = {
        k: val(rng) for k in rng.sample(universe, rng.randint(0, 20))
    }
    # keep identical values for a random overlap subset so 'unchanged'
    # keys (no changelog row) are exercised too
    for k in set(old) & set(new):
        if rng.random() < 0.5:
            new[k] = old[k]

    old_df, new_df = _state_df(spark, old), _state_df(spark, new)
    changelog_df = diff_snapshots(old_df, new_df, "k")

    # the changelog itself must name exactly the changed keys with the
    # right change types
    expect_types = {}
    for k in set(old) | set(new):
        if k not in old:
            expect_types[k] = "insert"
        elif k not in new:
            expect_types[k] = "delete"
        elif old[k] != new[k]:
            expect_types[k] = "update"
    assert {
        r.k: r.change_type for r in changelog_df.collect()
    } == expect_types

    applied = {
        r.k: (r.n, r.s)
        for r in apply_changelog(old_df, changelog_df, "k").collect()
    }
    assert applied == new


@pytest.mark.parametrize("seed", range(12))
def test_compacted_changelog_applies_to_final_state(spark, seed):
    """Round-7 compaction law: for ANY chain S0 -> S1 -> S2,
    apply(S0, compact(diff(S0,S1) + diff(S1,S2))) == S2. Random
    states exercise every (first_op, last_op) transition the CASE
    analysis in compact_changelogs handles — including
    insert..delete (must vanish) and delete..insert (must net to an
    update against the base)."""
    from bigdataentrytask_spark.operators.warehouse import compact_changelogs

    rng = random.Random(1000 + seed)
    universe = list(range(1, 25))

    def state(r):
        return {
            k: (r.randint(1, 5), r.randint(1, 999))
            for k in r.sample(universe, r.randint(0, 18))
        }

    s0, s1, s2 = state(rng), state(rng), state(rng)
    # force value-identical overlaps so 'unchanged' (no changelog row)
    # paths interleave with real transitions
    for a, b in ((s0, s1), (s1, s2)):
        for k in set(a) & set(b):
            if rng.random() < 0.4:
                b[k] = a[k]

    d0, d1, d2 = (_state_df(spark, s) for s in (s0, s1, s2))
    stamped = (
        diff_snapshots(d0, d1, "k").withColumn("seq", F.lit(1))
    ).unionByName(diff_snapshots(d1, d2, "k").withColumn("seq", F.lit(2)))
    net = compact_changelogs(stamped, ["n", "s"])

    # compaction must never emit more rows than keys that differ
    # between the endpoints OR that round-tripped through a change
    applied = {
        r.k: (r.n, r.s)
        for r in apply_changelog(d0, net, "k").collect()
    }
    assert applied == s2

    # and insert..delete keys must be absent from the net changelog
    gone = set(s1) - set(s0) - set(s2)
    net_keys = {r.k for r in net.collect()}
    assert not (gone & net_keys)
