"""Differential + invariant tests for the round-4 additions: CDC
apply round-trip, PageRank step, stratified sampling, BPE pair
counts, bucketed range join, and PQ code assignment."""

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

ROUND4_QUERIES = [
    "cdc_apply_changelog",
    "pagerank_step",
    "language_rebalance_sample",
    "bpe_pair_counts",
    "range_interval_join",
    "embedding_pq_assign",
    "incremental_agg_merge",
    "seasonal_hourly_baseline",
]


@pytest.mark.parametrize("name", ROUND4_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_pagerank_step_is_a_probability_mass_step(spark):
    """Every node has outgoing weight (symmetric co-occurrence graph),
    so one step conserves total mass: top ranks are in (0, 1) and
    strictly ordered by the (pr desc, part) total order."""
    rows = REGISTRY["pagerank_step"](spark, SF_DIR).collect()
    assert len(rows) == 100
    assert all(0 < r.pr < 1 for r in rows)
    assert all(
        (a.pr, -a.part) >= (b.pr, -b.part)
        for a, b in zip(rows, rows[1:])
    )


def test_language_rebalance_tracks_target_rates(spark, duck):
    """Per-language sampled share lands near its configured rate
    (binomial 5-sigma bound) — the hash is uniform per stratum."""
    import math

    from bigdataentrytask_spark.operators.curation import (
        _STRATA_DEFAULT,
        _STRATA_PER_MILLE,
    )

    totals = dict(
        duck.execute(
            "SELECT lang, COUNT(*) FROM documents GROUP BY 1"
        ).fetchall()
    )
    sampled = {
        r.lang: r.n_sampled
        for r in REGISTRY["language_rebalance_sample"](spark, SF_DIR).collect()
    }
    for lang, n in totals.items():
        p = _STRATA_PER_MILLE.get(lang, _STRATA_DEFAULT) / 1000.0
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(sampled.get(lang, 0) - n * p) <= 5 * sigma + 1, lang


def test_range_join_bucketing_loses_no_pairs(spark, duck):
    """The bucketed plan's total matched orders equal the naive range
    join's total (DuckDB side) — month-bucket explosion fully covers
    every interval."""
    bucketed = (
        REGISTRY["range_interval_join"](spark, SF_DIR)
        .agg(F.sum("n_orders"))
        .collect()[0][0]
    )
    from bigdataentrytask_spark.operators.timeseries import (
        _RJ_BASE,
        _RJ_N_PROMOS,
        _RJ_SPAN_DAYS,
        _RJ_STRIDE_DAYS,
    )

    naive = duck.execute(
        f"""
        SELECT COUNT(*) FROM orders o
        JOIN (SELECT TIMESTAMP '{_RJ_BASE} 00:00:00'
                       + to_days((range * {_RJ_STRIDE_DAYS})::INT) AS s,
                     TIMESTAMP '{_RJ_BASE} 00:00:00'
                       + to_days((range * {_RJ_STRIDE_DAYS}
                                  + {_RJ_SPAN_DAYS})::INT) AS e
              FROM range({_RJ_N_PROMOS})) p
          ON o.o_orderdate >= p.s AND o.o_orderdate < p.e
        """
    ).fetchone()[0]
    assert bucketed == naive
    # stride < span: the overlap region must actually multi-match
    assert _RJ_STRIDE_DAYS < _RJ_SPAN_DAYS


def test_pq_assignment_is_total_and_bounded(spark):
    """Every vector gets exactly one code per subspace: per-subspace
    populations sum to the corpus size; codes stay inside the
    codebook."""
    from bigdataentrytask_spark.operators.similarity import _PQ_K, _PQ_SUB

    rows = REGISTRY["embedding_pq_assign"](spark, SF_DIR).collect()
    n_vecs = 500
    per_sub = {}
    for r in rows:
        assert 0 <= r.code < _PQ_K
        assert 0 <= r.sub < _PQ_SUB
        per_sub[r.sub] = per_sub.get(r.sub, 0) + r.n_vecs
    assert per_sub == {s: n_vecs for s in range(_PQ_SUB)}


def test_bpe_pairs_ordered_and_adjacent(spark, duck):
    """Counts are non-increasing and the top pair really is the most
    frequent adjacent pair (cross-checked against a DuckDB recount)."""
    rows = REGISTRY["bpe_pair_counts"](spark, SF_DIR).collect()
    assert len(rows) == 50
    assert all(a.cnt >= b.cnt for a, b in zip(rows, rows[1:]))
    top = duck.execute(
        """
        WITH toks AS (
          SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS t
          FROM documents
        )
        SELECT MAX(cnt) FROM (
          SELECT COUNT(*) AS cnt FROM (
            SELECT t[i] AS a, t[i + 1] AS b
            FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM toks)
          ) GROUP BY a, b
        )
        """
    ).fetchone()[0]
    assert rows[0].cnt == top
