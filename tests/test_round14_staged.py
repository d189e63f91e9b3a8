"""Round-15 staged operators (ROADMAP §"Round 15+"): implemented and
differential-tested DURING round 14; zero registry delta until the
round-15 boundary activates them via staging.register_all(), per
CONTRIBUTING.md §"Staging operators during a registry freeze".

Differentials go through DuckDB's PANDAS path with the dtype check
(the preverify gate) so the HUGEINT class is covered before any op
reaches the driver.
"""

from __future__ import annotations

import pytest

from bigdataentrytask_spark.operators import REGISTRY, load_all
from bigdataentrytask_spark.operators.staging import STAGED

from .conftest import SF_DIR, assert_matches_oracle

# Staged-slate suite: excluded from the default driver gate (see
# pytest.ini); run with `pytest -m slow`.
pytestmark = pytest.mark.slow

load_all()

STAGED_NAMES = sorted(STAGED)


def test_round15_staged_not_registered():
    """The freeze: 11 staged round-15 ops, none registered, registry
    still exactly 498. Flip this to an activation assertion (registry
    == 509, identity per name) at the round-15 boundary."""
    assert len(STAGED) == 11
    assert len(REGISTRY) == 498
    for name in STAGED:
        assert name not in REGISTRY


def test_round15_staged_all_have_oracles():
    for name, (fn, osql) in STAGED.items():
        assert callable(fn) and isinstance(osql, str) and "SELECT" in osql
        assert "{" not in osql, f"{name}: unexpanded template in oracle"


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_matches_oracle(spark, duck, name):
    fn, osql = STAGED[name]
    assert_matches_oracle(fn(spark, SF_DIR), duck, osql, name)


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_pandas_dtype_parity(spark, duck, name):
    """The preverify gate: DuckDB's pandas fetch must not coerce an
    integral column to float64 (HUGEINT fingerprint) while the Spark
    side stays integral."""
    fn, osql = STAGED[name]
    spdf = fn(spark, SF_DIR).toPandas()
    odf = duck.execute(osql).fetch_df()
    assert sorted(spdf.columns) == sorted(odf.columns)
    for c in odf.columns:
        if spdf[c].dtype.kind in "iu":
            assert odf[c].dtype.kind in "iu", (
                f"{name}.{c}: oracle {odf[c].dtype} vs spark {spdf[c].dtype}"
            )


# ----------------------------------------------------- similarity/probes


def test_tail_probe_schedule_reachability(spark):
    """The honest surprise this table pins: EVERY query can reach at
    least one true neighbor in its first Lloyd cell (n_first_hit ==
    N_QUERIES at nprobe=1), so adc_recall_tail's min_hits=0 is
    scorer-side, not a probing gap. Full cover is the expensive
    target; all columns are monotone non-decreasing and the sweep
    ends at full pair coverage."""
    from bigdataentrytask_spark.operators.similarity.core import (
        KMEANS_K,
        N_QUERIES,
    )

    fn, _ = STAGED["tail_probe_schedule"]
    pdf = fn(spark, SF_DIR).toPandas().sort_values("nprobe")
    assert list(pdf.nprobe) == list(range(1, KMEANS_K + 1))
    assert pdf.n_first_hit.iloc[0] == N_QUERIES
    for col in ("n_first_hit", "n_full_cover", "pairs_covered_ppm"):
        assert (pdf[col].diff().dropna() >= 0).all(), col
    assert pdf.n_full_cover.iloc[-1] == N_QUERIES
    assert pdf.pairs_covered_ppm.iloc[-1] == 1_000_000
    # the tail query's full-cover budget is strictly past nprobe=1
    assert pdf.n_full_cover.iloc[0] < N_QUERIES


def test_probe_budget_allocator_savings(spark):
    """first_hit saves nothing (need == 1 for every query, the
    reachability finding); full_cover saves strictly — the tail
    query's whole-sweep need is an outlier the uniform budget
    charges to everyone."""
    fn, _ = STAGED["probe_budget_allocator"]
    pdf = fn(spark, SF_DIR).toPandas().set_index("target")
    fh = pdf.loc["a_first_hit"]
    assert fh.fixed_nprobe == 1 and fh.savings_ppm == 0
    fc = pdf.loc["b_full_cover"]
    assert fc.savings_ppm > 0
    assert (pdf.adaptive_total_probes <= pdf.fixed_total_probes).all()


def test_cell_anisotropy_lloyd_vs_toy(spark):
    """b_lloyd1 captures strictly more variance than a_toy in every
    subspace; a_toy is negative (seed cells are worse than no
    cells); the b_lloyd1 capture stays under 10% — the measured
    "nothing to gain" behind the pinned residual no-recall-gain."""
    fn, _ = STAGED["cell_anisotropy_probe"]
    pdf = fn(spark, SF_DIR).toPandas()
    toy = pdf[pdf.variant == "a_toy"].set_index("sub")
    lld = pdf[pdf.variant == "b_lloyd1"].set_index("sub")
    for sub in toy.index:
        assert lld.loc[sub].captured_ppm > toy.loc[sub].captured_ppm
        assert toy.loc[sub].captured_ppm < 0
        assert 0 < lld.loc[sub].captured_ppm < 100_000
        assert (
            pdf[pdf.variant == "b_lloyd1"].set_index("sub").within_ss[sub]
            <= lld.loc[sub].total_ss
        )


def test_cell_overlap_lifts_tail_at_fixed_budget(spark):
    """At every nprobe the top-2 overlap assignment covers at least
    as many true pairs and at least as high a per-query floor as the
    single assignment, and pays strictly more candidates."""
    fn, _ = STAGED["cell_overlap_assignment"]
    pdf = fn(spark, SF_DIR).toPandas()
    a = pdf[pdf.variant == "a_single"].set_index("nprobe")
    b = pdf[pdf.variant == "b_overlap2"].set_index("nprobe")
    for p in a.index:
        assert b.loc[p].pairs_covered_ppm >= a.loc[p].pairs_covered_ppm
        assert b.loc[p].min_query_hits >= a.loc[p].min_query_hits
        assert b.loc[p].mean_candidates > a.loc[p].mean_candidates


# ------------------------------------------------------------- curation


def test_boundary_margin_convention(spark):
    """Boundary rank = n_grp * frac // 1e6 + 1 per group; margin is
    NULL exactly when the group has no quality-cut doc; the at-or-
    below count never exceeds the group's quality-cut count."""
    from bigdataentrytask_spark.operators.curation import _GSL_FRAC_PPM

    fn, _ = STAGED["boundary_doc_margin_audit"]
    pdf = fn(spark, SF_DIR).toPandas()
    assert (
        pdf.boundary_rn == pdf.n_grp * _GSL_FRAC_PPM // 1_000_000 + 1
    ).all()
    assert (pdf.margin_docs.isna() == (pdf.n_quality_cut == 0)).all()
    assert (pdf.n_qcut_at_or_below <= pdf.n_quality_cut).all()
    # the corpus has at least one fragile group to price
    assert (pdf.n_quality_cut > 0).any()


def test_gate_overlap_partition_is_exact(spark, duck):
    """The combo rows partition the corpus exactly; the 'q' mass
    equals the quality classifier's keep=false count; and the
    documents fixture has NO byte-exact duplicates (the reason the
    near-dup gate is the LSH band-0 bucket, not an md5 fingerprint)."""
    fn, _ = STAGED["gate_overlap_matrix"]
    pdf = fn(spark, SF_DIR).toPandas()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert pdf.n_docs.sum() == n_docs
    assert set(pdf.combo) <= {
        "---", "--q", "-p-", "-pq", "d--", "d-q", "dp-", "dpq",
    }
    from bigdataentrytask_spark.operators import ORACLES

    n_qcut = duck.execute(
        f"SELECT count_if(NOT keep) FROM ("
        f"{ORACLES['quality_classifier_score']})"
    ).fetchone()[0]
    assert pdf[pdf.combo.str.contains("q")].n_docs.sum() == n_qcut
    n_exact = duck.execute(
        "SELECT COUNT(*) - COUNT(DISTINCT text) FROM documents"
    ).fetchone()[0]
    assert n_exact == 0
    # the near-dup gate is live on this corpus
    assert pdf[pdf.combo.str.startswith("d")].n_docs.sum() > 0


def test_gate_overlap_band_width_matches_dedup(spark):
    """The band-0 width used by the near-dup gate is dedup's
    _ROWS_PER_BAND (one source of truth for the bucketing)."""
    from bigdataentrytask_spark.operators.curation import _GOM_RPB
    from bigdataentrytask_spark.operators.dedup import _ROWS_PER_BAND

    assert _GOM_RPB == _ROWS_PER_BAND


def test_pooling_ablation_is_not_a_noop(spark):
    """delta_docs == kept_pooled - kept_own by construction; pooling
    moves at least one source's kept count on this corpus, and every
    group keeps at least one doc under both conventions."""
    fn, _ = STAGED["ppl_threshold_pooling_ablation"]
    pdf = fn(spark, SF_DIR).toPandas()
    assert (pdf.delta_docs == pdf.kept_pooled - pdf.kept_own).all()
    assert (pdf.delta_docs != 0).any()
    assert (pdf.kept_own >= 1).all() and (pdf.kept_pooled >= 0).all()
    assert (pdf.kept_own <= pdf.n_grp).all()


# ------------------------------------------------------------ streaming


def test_deficit_frontier_monotone_and_cross_pinned(spark):
    """deficit_keys non-decreasing and n_batches strictly decreasing
    in trigger_s per (ttl, policy) (nested tick grids: 60 | 300 |
    900 | 3600); >= 1 undominated row per group; and on the two
    triggers shared with trigger_sampling_deficit the deficits agree
    exactly."""
    fn, _ = STAGED["deficit_cost_frontier"]
    pdf = fn(spark, SF_DIR).toPandas()
    for (_ttl, _pol), g in pdf.groupby(["ttl_s", "policy"]):
        g = g.sort_values("trigger_s")
        assert (g.deficit_keys.diff().dropna() >= 0).all()
        assert (g.n_batches.diff().dropna() < 0).all()
        assert (~g.dominated).any()
    from bigdataentrytask_spark.operators.staging import ROUND14_ACTIVATED

    tsd = (
        ROUND14_ACTIVATED["trigger_sampling_deficit"][0](spark, SF_DIR)
        .toPandas()
        .set_index(["ttl_s", "trigger_s", "policy"])
    )
    mine = pdf.set_index(["ttl_s", "trigger_s", "policy"])
    for key, row in tsd.iterrows():
        assert mine.loc[key].deficit_keys == row.deficit_keys, key
        assert mine.loc[key].cont_peak_keys == row.cont_peak_keys, key


# ------------------------------------------------------------ warehouse


def test_face_transfer_base_equals_pareto(spark):
    """Every b_base row equals compaction_policy_pareto exactly (the
    dense-rank live-file repair is a no-op wherever no scaled month
    spans multiple floor widths — true at base scale), including the
    dominance flags."""
    fn, _ = STAGED["compaction_face_transfer"]
    mine = (
        fn(spark, SF_DIR)
        .toPandas()
        .query("scale == 'b_base'")
        .set_index(["floor_rows", "policy"])
    )
    from bigdataentrytask_spark.operators.staging import ROUND14_ACTIVATED

    cpp = (
        ROUND14_ACTIVATED["compaction_policy_pareto"][0](spark, SF_DIR)
        .toPandas()
        .set_index(["floor_rows", "policy"])
    )
    for key, row in cpp.iterrows():
        m = mine.loc[key]
        assert m.write_amp_ppm == row.write_amp_ppm, key
        assert m.mean_live_files_e3 == row.mean_live_files_e3, key
        assert m.read_amp_ppm == row.read_amp_ppm, key
        assert m.n_dominators == row.n_dominators, key
        assert bool(m.dominated) == bool(row.dominated), key


def test_face_transfer_crossover(spark):
    """The finding: at_end sits ON the face at every floor in the
    small-month regime (a_div4 — the synthetic sf0.001), is
    DOMINATED at every floor at base scale, and in the big-month
    regime (d_x16 at floors 200/400, where every scaled month
    exceeds the floor) the three policies collapse to identical
    metrics — there is nothing left to compact, so the verdict
    cannot transfer upward."""
    fn, _ = STAGED["compaction_face_transfer"]
    pdf = fn(spark, SF_DIR).toPandas()
    a = pdf[(pdf.scale == "a_div4") & (pdf.policy == "at_end")]
    assert (~a.dominated).all()
    b = pdf[(pdf.scale == "b_base") & (pdf.policy == "at_end")]
    assert b.dominated.all()
    for fr in (200, 400):
        g = pdf[(pdf.scale == "d_x16") & (pdf.floor_rows == fr)]
        assert g.write_amp_ppm.nunique() == 1
        assert g.mean_live_files_e3.nunique() == 1
        assert g.read_amp_ppm.nunique() == 1
        assert (~g.dominated).all()


def test_rerank_depth_recovers_the_tail(spark):
    """The scorer-side repair: the B = TOP_K row is exactly
    adc_recall_tail's b_joint @ nprobe=4 hit distribution (reranking
    top-5 by exact distance permutes, never changes, the set);
    recall and min_hits are non-decreasing in B; the tail recovers
    (min_hits 0 at B=5, >= 1 at the ceiling B) but NOT fully — the
    residue at full exact rerank is the reachability bound
    (min_hits < TOP_K and mean_reranked < B at the largest budget)."""
    from bigdataentrytask_spark.operators.similarity.core import TOP_K

    fn, _ = STAGED["adc_rerank_depth_recall"]
    pdf = fn(spark, SF_DIR).toPandas().sort_values("budget")
    assert (pdf.recall_ppm.diff().dropna() >= 0).all()
    assert (pdf.min_hits.diff().dropna() >= 0).all()
    b5 = pdf[pdf.budget == TOP_K].iloc[0]
    assert b5.min_hits == 0
    from bigdataentrytask_spark.operators.staging import ROUND14_ACTIVATED

    art = (
        ROUND14_ACTIVATED["adc_recall_tail"][0](spark, SF_DIR)
        .toPandas()
        .query("variant == 'b_joint' and nprobe == nprobe.max()")
        .iloc[0]
    )
    for col in ("min_hits", "p50_hits", "max_hits", "recall_ppm"):
        assert b5[col] == art[col], col
    top = pdf.iloc[-1]
    assert 1 <= top.min_hits < TOP_K
    assert top.mean_reranked < top.budget


def test_knee_advisor_cross_pinned(spark):
    """Knee rows agree pointwise with deficit_cost_frontier: the knee
    trigger has deficit 0 in the parent; a NULL knee means the group
    has no deficit-0 row; savings are 0 exactly when the knee is the
    finest trigger; and the honest asymmetry holds — at the longest
    ttl the fixed store has a coarse knee while the sliding store's
    knee stays at the finest trigger."""
    fn, _ = STAGED["deficit_knee_advisor"]
    kn = fn(spark, SF_DIR).toPandas().set_index(["ttl_s", "policy"])
    dcf = (
        STAGED["deficit_cost_frontier"][0](spark, SF_DIR)
        .toPandas()
    )
    for (ttl, pol), row in kn.iterrows():
        g = dcf[(dcf.ttl_s == ttl) & (dcf.policy == pol)]
        zero = g[g.deficit_keys == 0]
        if zero.empty:
            assert row.isna().knee_trigger_s
        else:
            assert row.knee_trigger_s == zero.trigger_s.max()
            assert (
                row.knee_batches
                == g[g.trigger_s == row.knee_trigger_s].n_batches.iloc[0]
            )
    tmax = int(kn.reset_index().ttl_s.max())
    fixed = kn.loc[(tmax, "b_fixed")]
    sliding = kn.loc[(tmax, "a_sliding")]
    assert fixed.knee_trigger_s > sliding.knee_trigger_s
    assert fixed.savings_ppm > 900_000 and sliding.savings_ppm == 0
