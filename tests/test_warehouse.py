"""Differential + invariant tests for the warehouse-modeling ops
(basket mining, integrity audit, SCD2 build, multi-touch attribution)
and the round-3 retrieval/text additions (quantized rerank, vocab
divergence)."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

WAREHOUSE_QUERIES = [
    "basket_part_pairs",
    "referential_integrity_audit",
    "scd2_priority_history",
    "attribution_linear_multitouch",
    "knn_quantized_rerank",
    "source_vocab_divergence",
]


@pytest.mark.parametrize("name", WAREHOUSE_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_basket_pairs_canonical_and_supported(spark):
    """Pairs are canonical (p1 < p2) and meet min support."""
    rows = REGISTRY["basket_part_pairs"](spark, SF_DIR).collect()
    assert rows
    assert all(r.p1 < r.p2 and r.support >= 2 and r.lift > 0 for r in rows)


def test_integrity_audit_fixture_is_clean(spark):
    """The driver fixture satisfies every published-table constraint;
    the audit must report exactly one row per constraint, all ok."""
    rows = REGISTRY["referential_integrity_audit"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r.ok and r.violated == 0 and r.checked > 0 for r in rows)


def test_integrity_audit_flags_orphans(spark, tmp_path):
    """An injected orphan FK row is counted as a violation."""
    import shutil

    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orphan = li.limit(1).withColumn(
        "l_orderkey", li.l_orderkey * 0 - 999999
    )
    li.unionByName(orphan).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = {
        r.constraint_name: r
        for r in REGISTRY["referential_integrity_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    bad = rows["fk_lineitem_orders"]
    assert bad.violated == 1 and not bad.ok


def test_scd2_intervals_partition_time(spark):
    """Per customer: versions are 1..n, intervals chain (each valid_to
    equals the next valid_from), exactly one open current row."""
    from collections import defaultdict

    rows = REGISTRY["scd2_priority_history"](spark, SF_DIR).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.custkey].append(r)
    assert by_cust
    for hist in by_cust.values():
        assert [h.version for h in hist] == list(range(1, len(hist) + 1))
        assert sum(h.is_current for h in hist) == 1
        assert hist[-1].is_current and hist[-1].valid_to == "9999-12-31"
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from
            assert a.priority != b.priority


def test_attribution_conserves_value(spark, duck):
    """Linear attribution splits each purchase's value without loss:
    total credited == total value of purchases that HAVE a touch."""
    rows = REGISTRY["attribution_linear_multitouch"](spark, SF_DIR).collect()
    credited = sum(r.credited_revenue for r in rows)
    expected = duck.execute("""
        WITH p AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase')
        SELECT SUM(value) FROM p WHERE EXISTS (
          SELECT 1 FROM events t
          WHERE t.event_type IN ('view','click') AND t.user_id = p.user_id
            AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 30 MINUTE)
    """).fetchone()[0]
    assert abs(credited - expected) < 0.05


def test_rerank_agrees_with_bruteforce_at_top1(spark):
    """The int8 pool is deep enough that rank-1 neighbors survive the
    quantization stage on this corpus."""
    exact = {
        r.query_id: r.neighbor_id
        for r in REGISTRY["knn_bruteforce"](spark, SF_DIR).collect()
        if r.rnk == 1
    }
    reranked = {
        r.query_id: r.neighbor_id
        for r in REGISTRY["knn_quantized_rerank"](spark, SF_DIR).collect()
        if r.rnk == 1
    }
    agree = sum(exact[q] == reranked.get(q) for q in exact)
    assert agree >= len(exact) - 1, (agree, len(exact))


def test_vocab_divergence_nonnegative(spark):
    """KL divergence is >= 0 (Gibbs), and every source is reported."""
    rows = REGISTRY["source_vocab_divergence"](spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r.kl_divergence >= 0 for r in rows)


ROUND3_EXTRA = ["top_session_paths", "token_feature_hashing"]


@pytest.mark.parametrize("name", ROUND3_EXTRA)
def test_extra_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_session_paths_shape(spark):
    """Paths are at most 3 hops and counts are non-increasing."""
    rows = REGISTRY["top_session_paths"](spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    assert all(1 <= len(r.path.split(">")) <= 3 for r in rows)
    counts = [r.sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_feature_hashing_bounds(spark):
    """Sparse-vector invariants: nnz is bounded by the bucket space and
    by the token count; the L2 norm sits between sqrt(n) and n."""
    import math

    rows = REGISTRY["token_feature_hashing"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert 1 <= r.nnz <= min(64, r.n_tokens)
        assert math.sqrt(r.n_tokens) - 1e-6 <= r.l2_norm <= r.n_tokens


def test_pca_power_iteration_unit_and_match(spark, duck):
    """Oracle match + the loading vector is unit-norm."""
    import math

    assert_matches_oracle(
        REGISTRY["pca_power_iteration"](spark, SF_DIR), duck,
        ORACLES["pca_power_iteration"], "pca_power_iteration",
    )
    rows = REGISTRY["pca_power_iteration"](spark, SF_DIR).collect()
    assert len(rows) == 64
    assert abs(math.sqrt(sum(r.loading ** 2 for r in rows)) - 1.0) < 1e-4


LIFECYCLE_OPS = ["snapshot_table_diff", "table_checksum"]


@pytest.mark.parametrize("name", LIFECYCLE_OPS)
def test_lifecycle_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_snapshot_diff_monotone_append_only(spark):
    """Append-only source: no deletes; updates only grow; inserts have
    no old state."""
    rows = REGISTRY["snapshot_table_diff"](spark, SF_DIR).collect()
    assert rows
    kinds = {r.change_type for r in rows}
    assert "delete" not in kinds
    for r in rows:
        if r.change_type == "insert":
            assert r.old_n is None and r.new_n > 0
        else:
            assert r.old_n < r.new_n or r.old_cents != r.new_cents


def test_table_checksum_detects_mutation(spark, tmp_path):
    """A single mutated row flips the table checksum; counts alone
    would miss it."""
    import shutil

    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    from pyspark.sql import functions as F
    mutated = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 1, F.col("c_acctbal") + 0.01)
        .otherwise(F.col("c_acctbal")),
    )
    mutated.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    base = {r.table_name: r for r in
            REGISTRY["table_checksum"](spark, SF_DIR).collect()}
    after = {r.table_name: r for r in
             REGISTRY["table_checksum"](spark, str(tmp_path)).collect()}
    assert base["customer"].row_count == after["customer"].row_count
    assert base["customer"].checksum != after["customer"].checksum
    assert base["orders"].checksum == after["orders"].checksum


def test_stream_jdbc_and_weighted_sample(spark, duck):
    """Round-3 late additions: streaming JDBC upsert edge + A-ES."""
    for name in ("stream_user_totals_jdbc", "weighted_sample_ares"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )


def test_weighted_sample_favors_long_docs(spark, duck):
    """The A-ES sample's mean doc length must exceed the corpus mean
    (weights are n_chars)."""
    rows = REGISTRY["weighted_sample_ares"](spark, SF_DIR).collect()
    assert len(rows) == 50
    corpus_mean = duck.execute(
        "SELECT AVG(n_chars) FROM documents").fetchone()[0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_uv_sketch_union(spark, duck):
    """Daily HLL sketches union to the period UV within tolerance."""
    assert_matches_oracle(
        REGISTRY["uv_sketch_union_daily"](spark, SF_DIR), duck,
        ORACLES["uv_sketch_union_daily"], "uv_sketch_union_daily",
    )
    row = REGISTRY["uv_sketch_union_daily"](spark, SF_DIR).collect()[0]
    assert row.n_days == 30 and row.union_ok


def test_outer_stream_join_and_zorder(spark, duck):
    for name in ("stream_signup_attribution_outer", "zorder_locality_stats"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )


def test_zorder_bucket_locality_bound(spark):
    """The Morton-code guarantee: a 256-wide z-range touches <= 16
    distinct values of each interleaved dimension byte."""
    rows = REGISTRY["zorder_locality_stats"](spark, SF_DIR).collect()
    assert rows
    assert all(r.n_cust_bytes <= 16 and r.n_day_bytes <= 16 for r in rows)


def test_outer_stream_join_has_null_rows(spark):
    """The LEFT OUTER replay emits watermark-closed signups without a
    purchase as NULL rows (the outer semantics, not an inner join)."""
    rows = REGISTRY["stream_signup_attribution_outer"](spark, SF_DIR).collect()
    nulls = [r for r in rows if r.purchase_id is None]
    matched = [r for r in rows if r.purchase_id is not None]
    assert nulls and len(nulls) > len(matched)
    assert all(r.gap_us is None for r in nulls)


def test_decimal_and_null_semantics(spark, duck):
    for name in ("pricing_summary_decimal", "null_semantics_probe"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    row = REGISTRY["null_semantics_probe"](spark, SF_DIR).collect()[0]
    assert row.n_rows == row.n_st_nonnull + row.n_null
    assert row.n_null == row.n_nullsafe_eq


def test_interval_overlap_and_collections(spark, duck):
    for name in ("session_window_overlap", "collection_functions_probe"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )


def test_collection_probe_set_identities(spark):
    """|A ∪ B| = |A| + |B| - |A ∩ B| and |A \\ B| = |A| - |A ∩ B|."""
    rows = REGISTRY["collection_functions_probe"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_all == r.n_first + r.n_second - r.n_common
        assert r.n_only_first == r.n_first - r.n_common


def test_classifier_eval_metrics(spark, duck):
    assert_matches_oracle(
        REGISTRY["classifier_eval_metrics"](spark, SF_DIR), duck,
        ORACLES["classifier_eval_metrics"], "classifier_eval_metrics",
    )
    row = REGISTRY["classifier_eval_metrics"](spark, SF_DIR).collect()[0]
    assert row.tp + row.fp + row.fn + row.tn == 500
    assert 0.0 <= row.f1 <= 1.0 and 0.0 <= row.accuracy <= 1.0


def test_sketch_probes(spark, duck):
    """CMS + Bloom: oracle match and the probability-gate booleans."""
    for name in ("cms_user_event_counts", "bloom_membership_probe"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    cms = REGISTRY["cms_user_event_counts"](spark, SF_DIR).collect()
    assert all(r.cms_ok for r in cms)
    b = REGISTRY["bloom_membership_probe"](spark, SF_DIR).collect()[0]
    assert b.no_false_negatives and b.fp_ok


def test_skyline_and_twap(spark, duck):
    for name in ("order_skyline_2d", "user_time_weighted_value"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )


def test_skyline_is_mutually_nondominating(spark):
    """No frontier row dominates another (both frontier invariants)."""
    rows = REGISTRY["order_skyline_2d"](spark, SF_DIR).collect()
    assert rows
    for a in rows:
        for b in rows:
            if a.o_orderkey == b.o_orderkey:
                continue
            dominated = (
                b.price <= a.price and b.order_date >= a.order_date
                and (b.price < a.price or b.order_date > a.order_date)
            )
            assert not dominated, (a, b)


def test_dedup_survivorship(spark, duck):
    assert_matches_oracle(
        REGISTRY["dedup_survivorship"](spark, SF_DIR), duck,
        ORACLES["dedup_survivorship"], "dedup_survivorship",
    )
    rows = REGISTRY["dedup_survivorship"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_members > 1 and r.survivor_doc <= r.max_member_doc


def test_backlog_and_gini(spark, duck):
    for name in ("order_backlog_timeseries", "customer_revenue_gini"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    g = REGISTRY["customer_revenue_gini"](spark, SF_DIR).collect()[0]
    assert 0.0 <= g.gini <= 1.0
    assert 0.1 <= g.top_decile_share <= 1.0
    backlog = REGISTRY["order_backlog_timeseries"](spark, SF_DIR).collect()
    assert backlog[-1].open_orders == 0  # every order eventually ships
    assert max(r.open_orders for r in backlog) > 0


def test_dau_wau_mau(spark, duck):
    assert_matches_oracle(
        REGISTRY["dau_wau_mau"](spark, SF_DIR), duck,
        ORACLES["dau_wau_mau"], "dau_wau_mau",
    )
    rows = REGISTRY["dau_wau_mau"](spark, SF_DIR).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.dau <= r.wau <= r.mau
        assert 0 < r.stickiness <= 1.0


def test_mahalanobis_and_chi2(spark, duck):
    for name in ("embedding_outlier_mahalanobis", "hourly_uniformity_chi2"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    outliers = REGISTRY["embedding_outlier_mahalanobis"](spark, SF_DIR).collect()
    scores = [r.mahalanobis_sq for r in outliers]
    assert scores == sorted(scores, reverse=True) and min(scores) > 0
    chi = REGISTRY["hourly_uniformity_chi2"](spark, SF_DIR).collect()
    assert all(r.hours_observed == 24 and r.chi2 >= 0 for r in chi)


def test_entropy_and_cramers_v(spark, duck):
    for name in ("doc_char_entropy", "source_label_cramers_v"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    import math

    ents = REGISTRY["doc_char_entropy"](spark, SF_DIR).collect()
    for r in ents:
        assert 0 < r.entropy_bits <= math.log2(r.alphabet) + 1e-9
    v = REGISTRY["source_label_cramers_v"](spark, SF_DIR).collect()[0]
    assert 0.0 <= v.cramers_v <= 1.0
    assert v.cramers_v < 0.3  # independent by construction


def test_growth_and_new_returning(spark, duck):
    for name in ("revenue_growth_mom_yoy", "new_vs_returning_daily"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    nr = REGISTRY["new_vs_returning_daily"](spark, SF_DIR).collect()
    assert sum(r.new_users for r in nr) == 150  # every user is new once
    assert nr[0].returning_users == 0


def test_cadence_and_recommendations(spark, duck):
    for name in ("segment_order_cadence", "part_recommendations"):
        assert_matches_oracle(
            REGISTRY[name](spark, SF_DIR), duck, ORACLES[name], name
        )
    recos = REGISTRY["part_recommendations"](spark, SF_DIR).collect()
    from collections import defaultdict
    by_anchor = defaultdict(list)
    for r in recos:
        by_anchor[r.anchor].append(r)
    for rows in by_anchor.values():
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        lifts = [r.lift for r in rows]
        assert lifts == sorted(lifts, reverse=True)
