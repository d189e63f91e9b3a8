"""Mathematical invariants of the operators touched in round 8 —
cheap structural truths that hold at ANY scale factor, complementing
the oracle differentials (which pin exact values at one SF)."""

from __future__ import annotations

import math

from bigdataentrytask_spark.operators import REGISTRY, load_all

from .conftest import SF_DIR

load_all()


def test_rrf_fusion_bounds(spark):
    """Every fused candidate appears in 1 or 2 source lists; the RRF
    score is bounded by the two-list maximum 2/(60+1); fused_rank is
    dense 1..k per query."""
    rows = REGISTRY["knn_rrf_fusion"](spark, SF_DIR).collect()
    assert rows
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert r.n_lists in (1, 2)
        # rrf_score is rounded to 6 dp, which can land up to 5e-7
        # ABOVE the true two-list maximum 2/61
        assert 0 < r.rrf_score <= 2.0 / 61.0 + 1e-6
        by_q.setdefault(r.query_id, []).append(r.fused_rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_profile_drift_approx_gates_and_bounds(spark):
    """HLL gates must pass at this NDV scale; exact NDVs never exceed
    row counts; both snapshots non-empty; the approx twin agrees with
    the exact op on every shared exact column."""
    approx = {
        r.col_name: r
        for r in REGISTRY["column_profile_drift_approx"](spark, SF_DIR).collect()
    }
    exact = {
        r.col_name: r
        for r in REGISTRY["column_profile_drift"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for name, r in approx.items():
        assert r.approx_a_ok and r.approx_b_ok, name
        assert 0 < r.ndv_a <= r.n_a and 0 < r.ndv_b <= r.n_b
        ex = exact[name]
        assert (r.n_a, r.n_b, r.ndv_a, r.ndv_b) == (
            ex.n_a, ex.n_b, ex.ndv_a, ex.ndv_b,
        )


def test_contrastive_partner_in_id_domain(spark):
    """The dense-rank ring walk (round-8 advisor fix) must mine
    negatives that reference REAL documents: every negative count is
    bounded by the corpus, and collisions by the negatives."""
    r = REGISTRY["contrastive_pair_mining"](spark, SF_DIR).collect()[0]
    assert 0 < r.n_neg <= r.n_docs
    assert 0 <= r.n_collision <= r.n_neg
    assert abs(r.neg_per_pos - r.n_neg / r.n_pos) < 1e-4


def test_pca_loading_unit_norm(spark):
    """The grid-normalized loading vector is a unit vector to within
    the 1e-6 grid resolution, and dims are exactly 1..64."""
    rows = REGISTRY["pca_power_iteration"](spark, SF_DIR).collect()
    assert [r.dim for r in rows] == list(range(1, 65))
    norm = math.sqrt(sum(r.loading * r.loading for r in rows))
    assert abs(norm - 1.0) < 1e-4


def test_kmeans_partition_census(spark):
    """Cluster sizes sum to the corpus; every seed claims itself
    (distance 0 -> its own cluster is non-empty); SSE non-negative."""
    rows = REGISTRY["kmeans_step"](spark, SF_DIR).collect()
    n_total = REGISTRY["embedding_norms"](spark, SF_DIR).count() if (
        "embedding_norms" in REGISTRY
    ) else None
    assert len(rows) == 8  # every seed cluster non-empty
    assert all(r.sse >= 0 for r in rows)
    assert all(r.n_vecs >= 1 for r in rows)
    if n_total is not None:
        assert sum(r.n_vecs for r in rows) == n_total


def test_silhouette_sign_census_consistent(spark):
    """n_negative never exceeds n_vecs; mean silhouette in [-1, 1]."""
    for r in REGISTRY["silhouette_by_label"](spark, SF_DIR).collect():
        assert 0 <= r.n_negative <= r.n_vecs
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9


def test_centroid_affinity_full_triangle(spark):
    """Exactly C(L,2) rows for L labels, each cosine in [-1, 1]."""
    rows = REGISTRY["centroid_affinity_matrix"](spark, SF_DIR).collect()
    labels = set()
    for r in rows:
        labels.add(r.label_a)
        labels.add(r.label_b)
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        assert r.label_a < r.label_b
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2
