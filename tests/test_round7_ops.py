"""Round-7 operators: statistical-inference layer, graph link
prediction / k-core, warehouse changelog compaction + band join,
text-curation diagnostics, embedding profiles, ML eval features.

Every operator gets the oracle differential (the driver's gate);
the extra tests pin the algebraic invariants the oracles can't see
(rank-sum identities, band-join plan shape, peel monotonicity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all

from .conftest import SF_DIR, assert_matches_oracle

load_all()

ROUND7_OPS = [
    # stats.py
    "welch_ttest_segments",
    "mannwhitney_u_segments",
    "spearman_qty_discount",
    "ols_two_factor_price",
    "anova_weekday_revenue",
    "poisson_rate_ztest_types",
    "chi2_region_segment",
    "mutual_information_events",
    "iqr_outlier_census",
    "market_concentration_hhi",
    "transition_entropy_rate",
    "forecast_backtest_mase",
    "type_lag_xcorr",
    "lognormal_chars_fit",
    # graph.py
    "link_prediction_adamic_adar",
    "kcore_peel_step",
    # warehouse.py
    "cdc_net_changes",
    "price_band_join_bucketed",
    "key_version_retention",
    "value_range_expectations",
    "asof_nearest_tolerance",
    # text_analysis.py
    "shingle_df_distribution",
    "lexicon_hit_rate",
    "corpus_datacard_summary",
    # similarity.py
    "embedding_dim_variance",
    "centroid_affinity_matrix",
    # evaluation.py / curation.py / analytics.py
    "score_decile_lift",
    "target_encoding_smoothed",
    "conversion_latency_percentiles",
    "stump_split_gain",
    # stretch additions
    "knn_rrf_fusion",
    "markov_next_accuracy",
    "funnel_within_1h",
    "robust_location_scale",
    "rank_semantics_probe",
]


@pytest.mark.parametrize("name", ROUND7_OPS)
def test_round7_oracle(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_round7_all_registered():
    missing = [n for n in ROUND7_OPS if n not in REGISTRY or n not in ORACLES]
    assert not missing, f"round-7 ops missing from registry/oracles: {missing}"


def test_mannwhitney_rank_sum_identity(spark):
    """U_A + U_B = n_a * n_b — the rank-sum identity that holds for
    ANY data; catches midrank or cumulative-window bugs the single
    driver row might not."""
    row = REGISTRY["mannwhitney_u_segments"](spark, SF_DIR).collect()[0]
    # rank_sum over BOTH groups = N(N+1)/2, so
    # U_B = n_a*n_b - U_A by the identity
    n = row.n_a + row.n_b
    total_ranks = n * (n + 1) / 2.0
    u_b = (total_ranks - row.rank_sum_a) - row.n_b * (row.n_b + 1) / 2.0
    assert abs((row.u_a + u_b) - row.n_a * row.n_b) < 1e-6


def test_welch_t_sign_flips_with_group_order(spark, duck):
    """t(A,B) must equal -t(B,A) per the formula: check against the
    oracle with the segments swapped."""
    sql = ORACLES["welch_ttest_segments"]
    swapped = (
        sql.replace("'BUILDING'", "'__TMP__'")
        .replace("'MACHINERY'", "'BUILDING'")
        .replace("'__TMP__'", "'MACHINERY'")
    )
    t_ab = duck.execute(sql).fetchall()[0]
    t_ba = duck.execute(swapped).fetchall()[0]
    # columns: n_a n_b mean_a mean_b t_stat df_welch
    assert abs(t_ab[4] + t_ba[4]) < 1e-5
    assert abs(t_ab[5] - t_ba[5]) < 1e-5


def test_price_band_join_has_no_nested_loop(spark):
    """The whole point of the bucketed rewrite: the physical plan
    must contain NO BroadcastNestedLoopJoin / CartesianProduct.
    (crossJoin on literal one-row lag/threshold frames is fine in
    other ops; here every join must be hash/sort-merge.)"""
    df = REGISTRY["price_band_join_bucketed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kcore_peel_monotone(spark):
    row = REGISTRY["kcore_peel_step"](spark, SF_DIR).collect()[0]
    assert row.nodes_after <= row.nodes_before - row.peeled_nodes + 0
    assert row.edges_after <= row.edges_before
    # peeling only removes: every survivor had degree >= k originally
    assert row.nodes_after == row.nodes_before - row.peeled_nodes or (
        # nodes that kept no edges vanish from the induced edge list
        row.nodes_after < row.nodes_before - row.peeled_nodes
    )


def test_adamic_adar_candidates_nonadjacent(spark):
    """No reported pair may be an existing backbone edge."""
    from bigdataentrytask_spark.operators.graph import _edges

    cand = REGISTRY["link_prediction_adamic_adar"](spark, SF_DIR)
    backbone = (
        _edges(spark, SF_DIR)
        .filter(F.col("w") >= 2)
        .select(F.col("s").alias("u"), F.col("d").alias("v"))
    )
    overlap = cand.join(backbone, ["u", "v"]).count()
    assert overlap == 0


def test_value_range_expectations_clean_fixture(spark):
    """The TPC-H generator respects its own value contracts — all
    five rules should pass 100% on the fixture; a violation here
    means the RULE is wrong, not the data."""
    rows = REGISTRY["value_range_expectations"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_violations == 0, f"{r.rule}: {r.n_violations} violations"
        assert r.pass_rate == 1.0


def test_decile_lift_cum_capture_monotone(spark):
    rows = REGISTRY["score_decile_lift"](spark, SF_DIR).collect()
    caps = [r.cum_capture for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    assert sum(r.n_pos for r in rows) > 0


def test_datacard_marginals_consistent(spark):
    """CUBE self-consistency: the grand total equals the sum of the
    per-source marginal, which equals the sum of the leaf cells."""
    rows = REGISTRY["corpus_datacard_summary"](spark, SF_DIR).collect()
    total = [r for r in rows if r.g_source == 1 and r.g_lang == 1]
    by_source = [r for r in rows if r.g_source == 0 and r.g_lang == 1]
    leaves = [r for r in rows if r.g_source == 0 and r.g_lang == 0]
    assert len(total) == 1
    assert total[0].n_docs == sum(r.n_docs for r in by_source)
    assert total[0].total_tokens == sum(r.total_tokens for r in leaves)
