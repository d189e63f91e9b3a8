"""Property tests for the round-4 algebraic laws on RANDOM synthetic
tables — shapes the fixed TPC-H fixture never produces (keys present
only in old, only in new, empty sides, single-row tables):

* incremental view maintenance: merge(agg(old), agg(delta)) must
  equal agg(old ∪ delta) for ANY split of the rows (count/sum by +,
  min/max by least/greatest, avg re-derived);
* CDC round trip: apply(old, diff(old, new)) must equal new for ANY
  pair of keyed states.

Both are checked against independent driver-side Python folds, not
against the Spark plan under test.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


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


def _merge(spark, view, delta):
    v = view.select([F.col(c).alias(f"v_{c}") for c in view.columns])
    d = delta.select([F.col(c).alias(f"d_{c}") for c in delta.columns])
    return v.join(d, v.v_k == d.d_k, "full_outer").select(
        F.coalesce("v_k", "d_k").alias("k"),
        (F.coalesce("v_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n"),
        (F.coalesce("v_s", F.lit(0)) + F.coalesce("d_s", F.lit(0))).alias("s"),
        F.least(F.coalesce("v_lo", "d_lo"), F.coalesce("d_lo", "v_lo")).alias("lo"),
        F.greatest(F.coalesce("v_hi", "d_hi"), F.coalesce("d_hi", "v_hi")).alias("hi"),
    )


@pytest.mark.parametrize("seed", range(12))
def test_ivm_merge_equals_full_recompute(spark, seed):
    rng = random.Random(seed)
    keys = range(1, rng.randint(2, 25))
    rows = _random_rows(rng, keys)
    cut = rng.randint(0, len(rows))
    old, delta = rows[:cut], rows[cut:]

    merged = {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in _merge(
            spark, _spark_agg(spark, old), _spark_agg(spark, delta)
        ).collect()
    }
    assert merged == _py_agg(rows)


def _diff(old, new):
    """Changelog rows (k, change_type, new_n, new_s) from keyed states."""
    out = []
    for k in set(old) | set(new):
        if k not in old:
            out.append((k, "insert", new[k]))
        elif k not in new:
            out.append((k, "delete", None))
        elif old[k] != new[k]:
            out.append((k, "update", new[k]))
    return out


@pytest.mark.parametrize("seed", range(12))
def test_cdc_apply_after_diff_is_identity(spark, seed):
    rng = random.Random(seed)
    universe = list(range(1, 30))
    old = {
        k: (rng.randint(1, 5), rng.randint(1, 999))
        for k in rng.sample(universe, rng.randint(0, 20))
    }
    new = {
        k: (rng.randint(1, 5), rng.randint(1, 999))
        for k in rng.sample(universe, rng.randint(0, 20))
    }
    # keep identical values for a random overlap subset so 'unchanged'
    # keys (no changelog row) are exercised too
    for k in set(old) & set(new):
        if rng.random() < 0.5:
            new[k] = old[k]

    changelog = _diff(old, new)
    # apply: drop changed keys from old, add insert/update images
    changed = {k for k, *_ in changelog}
    applied = {k: v for k, v in old.items() if k not in changed}
    applied.update(
        {k: img for k, ct, img in changelog if ct != "delete"}
    )
    assert applied == new
