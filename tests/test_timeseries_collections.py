"""Differential + property tests for the round-2 surface additions:
time-series gap-fill / OHLC downsampling, context chunking, inverted
index, array higher-order functions, and aggregate breadth."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

NEW_QUERIES = [
    "events_gap_fill",
    "events_ohlc_hour",
    "doc_word_chunks",
    "inverted_index",
    "embedding_hof_stats",
    "order_agg_extras",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_gap_fill_is_dense(spark):
    """Every (day, type) cell of the calendar must be present exactly
    once — the defining property gap-fill adds over a plain GROUP BY."""
    rows = REGISTRY["events_gap_fill"](spark, SF_DIR).collect()
    days = {r.day for r in rows}
    types = {r.event_type for r in rows}
    assert len(rows) == len(days) * len(types)
    assert all(r.cnt >= 0 for r in rows)


def test_ohlc_bounds(spark):
    """open/close always lie within [low, high]."""
    rows = REGISTRY["events_ohlc_hour"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


def test_word_chunks_reassemble(spark, duck):
    """Concatenating a doc's chunks in order reproduces its text."""
    rows = REGISTRY["doc_word_chunks"](spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    originals = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    assert set(by_doc) == set(originals)
    for doc_id, chunks in by_doc.items():
        joined = " ".join(t for _, t in sorted(chunks))
        assert joined == originals[doc_id], doc_id


def test_inverted_index_postings_sorted_and_capped(spark):
    rows = REGISTRY["inverted_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 20)


TPCH_QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "vocab_coverage",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_tpch_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_q3_filters_pushed_to_scan(spark):
    """Both date predicates and the segment filter must reach parquet."""
    plan = REGISTRY["q3_shipping_priority"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan


def test_vocab_coverage_reaches_target(spark):
    """Last emitted row must cross the 50% coverage target; the
    preceding row must not."""
    rows = REGISTRY["vocab_coverage"](spark, SF_DIR).collect()
    assert rows[-1].cum_share >= 0.5
    if len(rows) > 1:
        assert rows[-2].cum_share < 0.5


def test_stream_ohlc_matches_oracle(spark, duck):
    """Streaming OHLC replay (append mode, watermark cutoff) equals the
    batch ROW_NUMBER formulation on closed windows."""
    df = REGISTRY["stream_ohlc_minute"](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES["stream_ohlc_minute"], "stream_ohlc_minute")


def test_stream_dedup_matches_oracle(spark, duck):
    df = REGISTRY["stream_dedup_exactly_once"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["stream_dedup_exactly_once"], "stream_dedup_exactly_once"
    )


def test_dedup_cluster_sizes_matches_oracle(spark, duck):
    df = REGISTRY["dedup_cluster_sizes"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["dedup_cluster_sizes"], "dedup_cluster_sizes"
    )


def test_dedup_cluster_sizes_consistency(spark):
    """Totals must reconcile with the resolved component table."""
    rows = REGISTRY["dedup_cluster_sizes"](spark, SF_DIR).collect()
    n_docs = sum(r.n_docs for r in rows)
    n_kept = sum(r.n_clusters for r in rows)
    n_dropped = sum(r.n_dropped for r in rows)
    assert n_docs == n_kept + n_dropped
    resolve = REGISTRY["dedup_resolve"](spark, SF_DIR).collect()
    assert n_docs == len(resolve)
    assert n_kept == sum(1 for r in resolve if r.keep)
