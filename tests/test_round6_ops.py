"""Round-6 operators: mutual top-k triangle backbone + incremental
first-seen dimension (VERDICT r5 items 4 and 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from bigdataentrytask_spark.operators.analytics import _FS_CUT
from bigdataentrytask_spark.operators.graph import _TRI_TOPK, _edges

from .conftest import SF_DIR, assert_matches_oracle

load_all()


def test_part_pair_triangles_topk_oracle(spark, duck):
    df = REGISTRY["part_pair_triangles_topk"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["part_pair_triangles_topk"], "part_pair_triangles_topk"
    )


def test_topk_backbone_degree_bound(spark):
    """The whole point of the mutual top-k backbone: degree <= k by
    construction, hence wedges <= n*k*(k-1)/2 regardless of raw
    density. Check the reported census against the bound AND the
    per-node degrees directly."""
    row = REGISTRY["part_pair_triangles_topk"](spark, SF_DIR).collect()[0]
    k = _TRI_TOPK
    assert row.n_edges <= row.n_nodes * k / 2
    assert row.n_wedges <= row.n_nodes * k * (k - 1) / 2
    # direct degree check on the reconstructed backbone
    from pyspark.sql import Window

    e = _edges(spark, SF_DIR)
    und = e.select(
        F.col("s").alias("node"), F.col("d").alias("nbr"), "w"
    ).unionByName(
        e.select(F.col("d").alias("node"), F.col("s").alias("nbr"), "w")
    )
    rn = F.row_number().over(
        Window.partitionBy("node").orderBy(F.col("w").desc(), F.col("nbr"))
    )
    backbone = (
        und.select("node", "nbr", rn.alias("rn"))
        .groupBy(
            F.least("node", "nbr").alias("s"),
            F.greatest("node", "nbr").alias("d"),
        )
        .agg(F.max("rn").alias("mx"))
        .filter(F.col("mx") <= k)
    )
    max_deg = (
        backbone.select(F.col("s").alias("node"))
        .unionByName(backbone.select(F.col("d").alias("node")))
        .groupBy("node")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_deg <= k


def test_first_seen_incremental_oracle(spark, duck):
    df = REGISTRY["first_seen_incremental"](spark, SF_DIR)
    assert_matches_oracle(
        df, duck, ORACLES["first_seen_incremental"], "first_seen_incremental"
    )


def test_first_seen_delta_exercises_new_user_branch(spark, duck):
    """The cutoff must leave users whose FIRST event is inside the
    delta — otherwise the full-outer merge's insert branch is dead
    code at driver scale and the equality proof proves less than it
    claims. (Guards against a fixture regen silently moving the user
    arrival distribution.)"""
    n_new = duck.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT user_id, MIN(ts) AS m FROM events GROUP BY 1
        ) WHERE m >= TIMESTAMP '{_FS_CUT}'
        """
    ).fetchall()[0][0]
    assert n_new > 0, (
        f"no user first appears after {_FS_CUT}; move _FS_CUT earlier"
    )
    # and users ARE split across the cut (stored side non-trivial too)
    n_old = duck.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT user_id, MIN(ts) AS m FROM events GROUP BY 1
        ) WHERE m < TIMESTAMP '{_FS_CUT}'
        """
    ).fetchall()[0][0]
    assert n_old > 0


def test_first_seen_event_id_unique(spark, duck):
    """first_seen_incremental's struct-min tie-breaks on (ts, event_id,
    event_type) while the oracle's ROW_NUMBER ties only on (ts,
    event_id); the two agree ONLY because event_id is a total order.
    Pin that assumption: if a fixture regen ever produced duplicate
    event_ids the equality proof would silently weaken (ADVICE r6)."""
    n, n_distinct = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT event_id) FROM events"
    ).fetchall()[0]
    assert n == n_distinct, (
        f"events.event_id is no longer unique ({n} rows, {n_distinct} "
        "distinct) — the first_seen tie-break assumption is broken"
    )
