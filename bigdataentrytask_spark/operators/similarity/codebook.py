from __future__ import annotations

import random  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.functions import pandas_udf  # noqa: F401
from pyspark.sql.types import ArrayType, LongType  # noqa: F401

from bigdataentrytask_spark.catalog import load_table  # noqa: F401
from bigdataentrytask_spark.functions.vector import (  # noqa: F401
    cosine,
    cosine_seq,
    norm,
    seq_dot,
    stack_f64,
)
from bigdataentrytask_spark.operators import (  # noqa: F401
    materialize,
    operator,
    with_persisted,
)
from bigdataentrytask_spark.session import ensure_session_confs  # noqa: F401

from bigdataentrytask_spark.operators.similarity.core import (  # noqa: F401,E501
    N_QUERIES,
    TOP_K,
    EMB_DIM,
    LSH_TABLES,
    LSH_BITS,
    _rng,
    HYPERPLANES,
    _emb,
    _SQL_NORMS,
    embedding_norms,
    knn_bruteforce,
    knn_ivf_label,
    _sql_planes,
    _SQL_CODES,
    _bucket_keys,
    _lsh_codes,
    _bucketed,
    knn_lsh,
    embedding_quantize,
    NEARDUP_COS,
    NEARDUP_TILE_GROUPS,
    _NEARDUP_ORACLE,
    embedding_neardup_pairs,
    _neardup_tile,
    _neardup_bucket_kernel,
    embedding_neardup_lsh,
    _HOF_BIG,
    embedding_hof_stats,
    embedding_label_centroids,
    _semdedup_oracle,
    semdedup_resolve,
    knn_lsh_multiprobe,
    KMEANS_K,
    kmeans_step,
    _IVF_CTES,
    knn_ivf_kmeans,
    _RERANK_POOL,
    _QUANT_AMAX_SQL,
    knn_quantized_rerank,
    pca_power_iteration,
    _MAHA_TOP,
    embedding_outlier_mahalanobis,
    _PQ_SUB,
    _PQ_K,
    _PQ_DIM,
    embedding_pq_assign,
)

from bigdataentrytask_spark.operators.similarity.diagnostics import (  # noqa: F401,E501
    _register_pair_compositions,
    _register_knn_recall_eval,
    lsh_bucket_balance,
    _MRL_DIM,
    matryoshka_prefix_recall,
    _DRIFT_CUT,
    embedding_centroid_drift,
    embedding_dim_variance,
    centroid_affinity_matrix,
    _register_rrf_fusion,
    neardup_transitivity_audit,
    mutual_knn_symmetry,
    _ORACLES,
    ivf_nprobe_recall_sweep,
    _register_knn_ndcg_eval,
    silhouette_by_label,
    _register_dbscan_core_census,
    embedding_dim_correlation_top,
    embedding_isotropy_score,
    embedding_hubness,
    _JL_K,
    _jl_oracle,
    jl_projection_distortion,
    _MATRYOSHKA_DIMS,
    _MATRYOSHKA_ORACLE,
    matryoshka_recall_sweep,
    ROUND10_STAGED,
)

from bigdataentrytask_spark.operators.similarity.quantization import (  # noqa: F401,E501
    _RESIDUAL_PQ_ORACLE,
    residual_pq_distortion,
    _HNSW_M,
    _HNSW_MAX_LEVEL,
    _HNSW_HASH_A,
    _HNSW_HASH_P,
    _HNSW_LEVEL_SQL,
    _HNSW_AUDIT_ORACLE,
    hnsw_layer_audit,
    _BINQ_ORACLE,
    binary_quantization_recall,
    _GEXP_M,
    _GRAPH_EXPANSION_ORACLE,
    graph_expansion_recall,
    _ASYM_BINQ_ORACLE,
    asymmetric_binary_retrieval,
    _TWO_HOP_ORACLE,
    two_hop_expansion_ceiling,
    ROUND11_STAGED,
    _pareto_oracle,
    quantization_pareto_table,
    _PROBE_RADII,
    _PROBE_SCHEDULE_ORACLE,
    multiprobe_schedule_advisor,
    _PQ_ADC_ORACLE,
    pq_adc_recall,
    _IVF_ADC_PROBES,
    _IVF_ADC_ORACLE,
    ivf_adc_recall,
)



# ==========================================================================
# ROUND-12 STAGED (VERDICT r10 item 7; zero registry delta until the
# round-12 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# IVF cell-balance audit (ROADMAP round-12 "Retrieval"): the
# retrieval twin of partition_skew_report. IVFADC's cost model
# assumes roughly uniform cell populations; a skewed coarse quantizer
# makes nprobe=1 either scan a giant cell (latency) or miss most of
# the corpus (recall) — it is the mechanism BEHIND ivf_adc_recall's
# pinned honest negative, surfaced as a table: per cell (empties
# included), population, share, size rank, and the cumulative share
# of the top-r cells — read row r as "probing the r largest cells
# scans this fraction of the corpus". Assignment is the verified
# knn_ivf_kmeans coarse quantizer (first-K seeds, exact grid-integer
# distances).
# Scale: one broadcast seed join + one keyed argmin window + a
# K-domain rollup; the audit is O(n * K) with K fixed.
# --------------------------------------------------------------------------
_CELL_BALANCE_ORACLE = f"""
    WITH {_IVF_CTES},
    counts AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM assigned GROUP BY k
    ),
    cells AS (
      SELECT UNNEST(range(0, {KMEANS_K})) AS cell
    ),
    full_c AS (
      SELECT c.cell, COALESCE(t.n_vecs, 0) AS n_vecs,
             (SELECT SUM(n_vecs) FROM counts) AS n_total
      FROM cells c LEFT JOIN counts t ON t.k = c.cell
    ),
    ranked AS (
      SELECT cell, n_vecs, n_total,
             ROW_NUMBER() OVER (ORDER BY n_vecs DESC, cell) AS size_rank,
             SUM(n_vecs) OVER (ORDER BY n_vecs DESC, cell
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM full_c
    )
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(ROUND(n_vecs * 1000000.0 / n_total) AS BIGINT)
             AS share_ppm,
           CAST(size_rank AS BIGINT) AS size_rank,
           CAST(ROUND(cum * 1000000.0 / n_total) AS BIGINT)
             AS cum_share_ppm
    FROM ranked
    ORDER BY cell
    """


def ivf_cell_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell population census of the IVF coarse quantizer (see
    block comment): skew here is the mechanism behind nprobe recall
    pathologies."""
    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    seeds = (
        e.filter(F.col("vec_id") < KMEANS_K)
        .select(
            F.col("vec_id").alias("k"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos0", "x"),
        )
        .select("k", (F.col("pos0") + 1).alias("pos"), grid.alias("si"))
    )
    diff = F.col("xi") - F.col("si")
    dist = (
        dims.join(F.broadcast(seeds), "pos")
        .groupBy("vec_id", "k")
        .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
    )
    wa = Window.partitionBy("vec_id").orderBy("dd", "k")
    assigned = (
        dist.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "k")
    )
    counts = assigned.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    cells = spark.createDataFrame(
        [(c,) for c in range(KMEANS_K)], "cell long"
    )
    tot = counts.agg(F.sum("n_vecs").alias("n_total"))
    full_c = (
        cells.join(counts.withColumnRenamed("k", "cell"), "cell", "left")
        .select("cell", F.coalesce("n_vecs", F.lit(0)).alias("n_vecs"))
        .crossJoin(F.broadcast(tot))
    )
    wr = Window.orderBy(F.col("n_vecs").desc(), "cell")
    ranked = full_c.select(
        "cell",
        "n_vecs",
        "n_total",
        F.row_number().over(wr).alias("size_rank"),
        F.sum("n_vecs")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    return ranked.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.round(F.col("n_vecs") * 1000000.0 / F.col("n_total"))
        .cast("bigint")
        .alias("share_ppm"),
        F.col("size_rank").cast("bigint").alias("size_rank"),
        F.round(F.col("cum") * 1000000.0 / F.col("n_total"))
        .cast("bigint")
        .alias("cum_share_ppm"),
    ).orderBy("cell")


# --------------------------------------------------------------------------
# PQ codebook Lloyd refinement (ROADMAP round-12 "Retrieval"; the
# learned-codebook-quality advisor VERDICT r10 item 7 asked for):
# ivf_adc_recall pinned an honest negative — recall FALLS with nprobe
# under the toy first-K-vectors codebook — and ivf_cell_balance_audit
# shows the coarse cells are balanced, so the defect is subspace
# codebook DISTORTION. This operator runs exactly ONE Lloyd step on
# the PQ codebook (assign -> per-(sub, code) centroid update ->
# re-assign; empty codes keep their old centroid) and prices both
# codebooks on the same table: total assignment distortion, dead
# codes, and end-to-end ADC recall@5 vs exact-L2 truth. The update
# arithmetic is exact: centroids snap back onto the 1e6 integer grid
# via ROUND(SUM/COUNT) (sums < 2^53, so the double division is the
# same on both engines); distances stay grid-integer BIGINTs.
# Plan shape: dims feeds both assignment passes, the ADC query side,
# and the exact truth -> with_persisted; the two variants stack into
# ONE tagged assignment/codebook frame so the ADC ranking pipeline
# runs once over both (the ivf_adc_recall composition lesson —
# score the superset once, rank per variant in one window).
# --------------------------------------------------------------------------
_LLOYD_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id,
             ((generate_subscripts(e, 1) - 1) * {_PQ_SUB}) // {_PQ_DIM}
               AS sub,
             generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    cb0 AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    ),
    d0 AS (
      SELECT d.vec_id, d.sub, cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb0 cb ON cb.pos = d.pos AND cb.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    a0 AS (
      SELECT vec_id, sub, code, dd FROM (
        SELECT vec_id, sub, code, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM d0
      ) WHERE rn = 1
    ),
    refined AS (
      SELECT a.sub, a.code, d.pos,
             CAST(ROUND(SUM(d.xi) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
               AS ci
      FROM a0 a
      JOIN dims d ON d.vec_id = a.vec_id AND d.sub = a.sub
      GROUP BY 1, 2, 3
    ),
    cb1 AS (
      SELECT c.code, c.sub, c.pos, COALESCE(r.ci, c.ci) AS ci
      FROM cb0 c
      LEFT JOIN refined r ON r.sub = c.sub AND r.code = c.code
                         AND r.pos = c.pos
    ),
    d1 AS (
      SELECT d.vec_id, d.sub, cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb1 cb ON cb.pos = d.pos AND cb.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    a1 AS (
      SELECT vec_id, sub, code, dd FROM (
        SELECT vec_id, sub, code, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    a AS (
      SELECT 'a_toy' AS variant, * FROM a0
      UNION ALL
      SELECT 'b_lloyd1', * FROM a1
    ),
    cb AS (
      SELECT 'a_toy' AS variant, * FROM cb0
      UNION ALL
      SELECT 'b_lloyd1', * FROM cb1
    ),
    adc AS (
      SELECT a.variant, q.vec_id AS query_id, a.vec_id AS neighbor_id,
             CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS dd
      FROM a
      JOIN cb ON cb.variant = a.variant AND cb.sub = a.sub
             AND cb.code = a.code
      JOIN dims q ON q.pos = cb.pos AND q.vec_id <> a.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2, 3
    ),
    top_adc AS (
      SELECT variant, query_id, neighbor_id FROM (
        SELECT variant, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY variant, query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM adc
      ) WHERE rnk <= {TOP_K}
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM((q.xi - c.xi) * (q.xi - c.xi)) AS BIGINT) AS dd
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_K}
    ),
    hits AS (
      SELECT a.variant,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
               AS n_hits
      FROM top_adc a
      LEFT JOIN truth t ON t.query_id = a.query_id
                       AND t.neighbor_id = a.neighbor_id
      GROUP BY 1
    ),
    dist_tot AS (
      SELECT variant, CAST(SUM(dd) AS BIGINT) AS total_distortion,
             CAST({_PQ_SUB * _PQ_K} - COUNT(DISTINCT (sub, code))
                  AS BIGINT) AS n_dead_codes
      FROM a GROUP BY 1
    )
    SELECT d.variant, d.total_distortion, d.n_dead_codes,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_5
    FROM dist_tot d JOIN hits h ON h.variant = d.variant
    ORDER BY d.variant
    """


def pq_lloyd_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step on the PQ subspace codebook, priced end-to-end
    (see block comment): distortion, dead codes, and ADC recall for
    the toy vs refined codebook on one tagged pipeline."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        cb0 = (
            e.filter(F.col("vec_id") < _PQ_K)
            .select(
                F.col("vec_id").alias("code"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select(
                "code",
                ((F.col("pos0") * _PQ_SUB) / _PQ_DIM)
                .cast("long")
                .alias("sub"),
                (F.col("pos0") + 1).alias("pos"),
                grid.alias("ci"),
            )
        )

        def _assign(cb):
            diff = F.col("xi") - F.col("ci")
            dist = (
                dims_p.join(
                    F.broadcast(cb),
                    (F.col("cb_pos") == F.col("pos"))
                    & (F.col("cb_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
            )
            wa = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return materialize(
                dist.withColumn("rn", F.row_number().over(wa))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code", "dd")
            )

        def _cb_joinable(cb):
            return cb.select(
                "code",
                F.col("sub").alias("cb_sub"),
                F.col("pos").alias("cb_pos"),
                "ci",
            )

        a0 = _assign(_cb_joinable(cb0))
        refined = (
            a0.select(
                F.col("vec_id").alias("a_vid"),
                F.col("sub").alias("a_sub"),
                "code",
            )
            .join(
                dims_p,
                (F.col("a_vid") == F.col("vec_id"))
                & (F.col("a_sub") == F.col("sub")),
            )
            .groupBy(F.col("a_sub").alias("g_sub"), "code", "pos")
            .agg(
                F.round(F.sum("xi") / F.count(F.lit(1)).cast("double"))
                .cast("bigint")
                .alias("r_ci")
            )
            .withColumnRenamed("g_sub", "sub")
        )
        cb1 = (
            cb0.join(refined, ["sub", "code", "pos"], "left")
            .select(
                "code",
                "sub",
                "pos",
                F.coalesce("r_ci", "ci").alias("ci"),
            )
        )
        a1 = _assign(_cb_joinable(cb1))
        a = a0.select(F.lit("a_toy").alias("variant"), "*").unionByName(
            a1.select(F.lit("b_lloyd1").alias("variant"), "*")
        )
        cbs = cb0.select(
            F.lit("a_toy").alias("variant"), "code", "sub", "pos", "ci"
        ).unionByName(
            cb1.select(
                F.lit("b_lloyd1").alias("variant"), "code", "sub", "pos",
                "ci",
            )
        )
        qd = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("pos").alias("q_pos"),
            F.col("xi").alias("qi"),
        )
        adc = (
            a.join(
                F.broadcast(
                    cbs.withColumnRenamed("sub", "cb_sub")
                    .withColumnRenamed("pos", "cb_pos")
                ),
                ["variant", "code"],
            )
            .filter(F.col("cb_sub") == F.col("sub"))
            .join(
                F.broadcast(qd),
                (F.col("q_pos") == F.col("cb_pos"))
                & (F.col("query_id") != F.col("vec_id")),
            )
            .groupBy(
                "variant", "query_id", F.col("vec_id").alias("neighbor_id")
            )
            .agg(
                F.sum(
                    (F.col("qi") - F.col("ci"))
                    * (F.col("qi") - F.col("ci"))
                )
                .cast("bigint")
                .alias("qdd")
            )
        )
        wr = Window.partitionBy("variant", "query_id").orderBy(
            "qdd", "neighbor_id"
        )
        top_adc = adc.withColumn("rnk", F.row_number().over(wr)).filter(
            F.col("rnk") <= TOP_K
        )
        qx = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "pos",
            F.col("xi").alias("qi"),
        )
        cx = dims_p.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("pos").alias("pos_c"),
            F.col("xi").alias("ci2"),
        )
        exact = (
            F.broadcast(qx)
            .join(cx, F.col("pos_c") == F.col("pos"))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.sum(
                    (F.col("qi") - F.col("ci2"))
                    * (F.col("qi") - F.col("ci2"))
                )
                .cast("bigint")
                .alias("edd")
            )
        )
        wt = Window.partitionBy("query_id").orderBy("edd", "neighbor_id")
        truth = (
            exact.withColumn("rnk", F.row_number().over(wt))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", F.lit(1).alias("is_true"))
        )
        hits = (
            top_adc.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("variant")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        dist_tot = a.groupBy("variant").agg(
            F.sum("dd").cast("bigint").alias("total_distortion"),
            (
                F.lit(_PQ_SUB * _PQ_K)
                - F.count_distinct("sub", "code")
            )
            .cast("bigint")
            .alias("n_dead_codes"),
        )
        return materialize(
            dist_tot.join(hits, "variant")
            .select(
                "variant",
                "total_distortion",
                "n_dead_codes",
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K),
                    6,
                ).alias("recall_at_5"),
            )
            .orderBy("variant")
        )


# --------------------------------------------------------------------------
# Candidate-budget recall (ROADMAP round-12 "Retrieval"): the
# apples-to-apples index selector. ivf_nprobe_recall_sweep and
# two_hop_expansion_ceiling each vary their OWN knob, so their rows
# are not comparable — this table fixes the one resource that costs
# money (exact-scoring candidates per query) and asks which index
# family spends it better. Per (method, budget): LSH candidates are
# truncated in neighbor_id order (the scan-order contract — scoring
# order would defeat the budget), IVF candidates in (cell-distance
# rank, neighbor_id) order (probe order — the order a real IVF scan
# discovers them); the kept set is exact-cosine scored and its top-5
# compared to the brute-force truth.
# Plan shape: the two methods' kept sets (budget = max budget;
# smaller budgets are prefixes by construction) merge via one full
# outer join into a superset pair frame; dots are computed ONCE over
# it and every (method, budget) ranks via conditional running counts
# over ONE shared window (the two_hop single-window lesson).
# Zero-norm sentinel: cc = 0 -> sim -2.0 on both engines (ADVICE r9).
# --------------------------------------------------------------------------
_CBR_BUDGETS = [10, 50]

_CBR_ORACLE = f"""
    WITH {{SQL_PLANES}},
    {{SQL_CODES}},
    {{IVF_CTES}},
    lsh0 AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM codes q JOIN codes c ON q.t = c.t AND q.code = c.code
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    lshc AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY neighbor_id) AS rn
      FROM lsh0
    ),
    qrank AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rank
      FROM dist WHERE vec_id < {N_QUERIES}
    ),
    ivf0 AS (
      SELECT qr.query_id, a.vec_id AS neighbor_id, qr.cell_rank
      FROM qrank qr JOIN assigned a ON a.k = qr.k
      WHERE a.vec_id <> qr.query_id
    ),
    ivfc AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cell_rank, neighbor_id) AS rn
      FROM ivf0
    ),
    sup AS (
      SELECT COALESCE(l.query_id, i.query_id) AS query_id,
             COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
             l.rn AS rn_lsh, i.rn AS rn_ivf
      FROM (SELECT * FROM lshc WHERE rn <= {max(_CBR_BUDGETS)}) l
      FULL JOIN (SELECT * FROM ivfc WHERE rn <= {max(_CBR_BUDGETS)}) i
        ON i.query_id = l.query_id AND i.neighbor_id = l.neighbor_id
    ),
    pn AS (
      SELECT vec_id, CAST(SUM(xi * xi) AS DOUBLE) AS cc
      FROM dims GROUP BY 1
    ),
    dotg AS (
      SELECT s.query_id, s.neighbor_id, s.rn_lsh, s.rn_ivf,
             CAST(SUM(dq.xi * dn.xi) AS DOUBLE) AS dot
      FROM sup s
      JOIN dims dq ON dq.vec_id = s.query_id
      JOIN dims dn ON dn.vec_id = s.neighbor_id AND dn.pos = dq.pos
      GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT d.query_id, d.neighbor_id, d.rn_lsh, d.rn_ivf,
             {", ".join(
               f'''SUM(CASE WHEN d.rn_{m} <= {b} THEN 1 ELSE 0 END)
                     OVER w AS rk_{m}{b}'''
               for m in ("lsh", "ivf") for b in _CBR_BUDGETS)}
      FROM dotg d JOIN pn p ON p.vec_id = d.neighbor_id
      WINDOW w AS (PARTITION BY d.query_id
                   ORDER BY CASE WHEN p.cc = 0
                                 THEN CAST(-2.0 AS DOUBLE)
                            ELSE d.dot / sqrt(p.cc) END DESC,
                            d.neighbor_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    picks AS (
      {" UNION ALL ".join(
        f'''SELECT '{'a_lsh' if m == 'lsh' else 'b_ivf'}' AS method,
               {b} AS budget, query_id, neighbor_id
        FROM ranked WHERE rn_{m} <= {b} AND rk_{m}{b} <= {TOP_K}'''
        for m in ("lsh", "ivf") for b in _CBR_BUDGETS)}
    ),
    vol AS (
      {" UNION ALL ".join(
        f'''SELECT '{'a_lsh' if m == 'lsh' else 'b_ivf'}' AS method,
               {b} AS budget, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM {m}c WHERE rn <= {b}'''
        for m in ("lsh", "ivf") for b in _CBR_BUDGETS)}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    ),
    hits AS (
      SELECT p.method, p.budget,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
               AS n_hits
      FROM picks p
      LEFT JOIN truth t ON t.query_id = p.query_id
                       AND t.neighbor_id = p.neighbor_id
      GROUP BY 1, 2
    )
    SELECT h.method, CAST(h.budget AS BIGINT) AS budget,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_kept AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.method = h.method AND v.budget = h.budget
    ORDER BY h.method, h.budget
    """


def candidate_budget_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH vs IVF recall at a FIXED exact-scoring candidate budget
    (see block comment): superset pairs scored once, every
    (method, budget) ranked in one shared window."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    bmax = max(_CBR_BUDGETS)
    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    bucketed = _bucketed(e)
    with with_persisted(dims) as dims_p:
        qb = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "bucket"
        )
        cb = bucketed.select(F.col("vec_id").alias("neighbor_id"), "bucket")
        wl = Window.partitionBy("query_id").orderBy("neighbor_id")
        lshc = materialize(
            qb.join(cb, "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .withColumn("rn", F.row_number().over(wl))
            .filter(F.col("rn") <= bmax)
        )
        seeds = (
            e.filter(F.col("vec_id") < KMEANS_K)
            .select(
                F.col("vec_id").alias("k"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select("k", (F.col("pos0") + 1).alias("pos"), grid.alias("si"))
        )
        diff = F.col("xi") - F.col("si")
        dist = (
            dims_p.join(F.broadcast(seeds), "pos")
            .groupBy("vec_id", "k")
            .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
        )
        wa = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned = (
            dist.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        qrank = (
            dist.filter(F.col("vec_id") < N_QUERIES)
            .withColumn("cell_rank", F.row_number().over(wa))
            .select(F.col("vec_id").alias("query_id"), "k", "cell_rank")
        )
        wi = Window.partitionBy("query_id").orderBy(
            "cell_rank", "neighbor_id"
        )
        ivfc = materialize(
            qrank.join(
                assigned.select(
                    F.col("vec_id").alias("neighbor_id"), "k"
                ),
                "k",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rn", F.row_number().over(wi))
            .filter(F.col("rn") <= bmax)
            .select("query_id", "neighbor_id", "rn")
        )
        sup = lshc.select(
            "query_id", "neighbor_id", F.col("rn").alias("rn_lsh")
        ).join(
            ivfc.select(
                "query_id", "neighbor_id", F.col("rn").alias("rn_ivf")
            ),
            ["query_id", "neighbor_id"],
            "full",
        )
        pn = dims_p.groupBy("vec_id").agg(
            F.sum(F.col("xi") * F.col("xi")).cast("double").alias("cc")
        )
        dq = dims_p.select(
            F.col("vec_id").alias("query_id"), "pos",
            F.col("xi").alias("qi"),
        )
        dn = dims_p.select(
            F.col("vec_id").alias("nb"),
            F.col("pos").alias("pos_n"),
            F.col("xi").alias("ni"),
        )
        dotg = (
            sup.join(dq, "query_id")
            .join(
                dn,
                (F.col("pos_n") == F.col("pos"))
                & (F.col("nb") == F.col("neighbor_id")),
            )
            .groupBy("query_id", "neighbor_id", "rn_lsh", "rn_ivf")
            .agg(
                F.sum(F.col("qi") * F.col("ni")).cast("double").alias("dot")
            )
        )
        scored = dotg.join(
            pn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        ).withColumn(
            "sim",
            F.when(F.col("cc") == 0, F.lit(-2.0)).otherwise(
                F.col("dot") / F.sqrt("cc")
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), "neighbor_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rank_cols = [
            F.sum(
                F.when(F.col(f"rn_{m}") <= b, 1).otherwise(0)
            )
            .over(w)
            .alias(f"rk_{m}{b}")
            for m in ("lsh", "ivf")
            for b in _CBR_BUDGETS
        ]
        flagged = scored.select(
            "query_id", "neighbor_id", "rn_lsh", "rn_ivf", *rank_cols
        )
        stack_args = ", ".join(
            f"'{'a_lsh' if m == 'lsh' else 'b_ivf'}', {b}, "
            f"rn_{m} IS NOT NULL AND rn_{m} <= {b} AND rk_{m}{b} <= {TOP_K}"
            for m in ("lsh", "ivf")
            for b in _CBR_BUDGETS
        )
        picks = (
            flagged.select(
                "query_id",
                "neighbor_id",
                F.expr(
                    f"stack({2 * len(_CBR_BUDGETS)}, {stack_args})"
                    " AS (method, budget, in_top)"
                ),
            )
            .filter(F.col("in_top"))
            .select("method", "budget", "query_id", "neighbor_id")
        )
        vol = None
        for m, frame in (("a_lsh", lshc), ("b_ivf", ivfc)):
            for b in _CBR_BUDGETS:
                arm = frame.filter(F.col("rn") <= b).agg(
                    F.lit(m).alias("method"),
                    F.lit(b).alias("budget"),
                    F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                )
                vol = arm if vol is None else vol.unionByName(arm)
        truth = knn_bruteforce(spark, sf_dir).select(
            "query_id", "neighbor_id", F.lit(1).alias("is_true")
        )
        hits = (
            picks.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("method", "budget")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, ["method", "budget"])
            .select(
                "method",
                F.col("budget").cast("bigint").alias("budget"),
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_kept").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("method", "budget")
        )


# --------------------------------------------------------------------------
# Seed-spread advisor (ROADMAP round-13, pulled forward): the cheap
# fix the weak-codebook regime suggests trying FIRST. The verified
# coarse quantizer seeds on the first K vectors (knn_ivf_kmeans);
# k-means++ intuition says spread seeds beat adjacent ones. This
# table prices two deterministic seeding policies — a_first (vec_id
# < K) vs b_strided (every floor(n/K)-th vec_id) — on the numbers a
# quantizer owner reads: min pairwise seed distance (the spread),
# total assignment distortion, and the largest cell share. Both
# policies assign in ONE stacked pass (seeds tagged by policy; the
# per-policy argmin windows share a shuffle).
# Exact math: grid-integer L2 throughout; stride = n // K from an
# exact count.
# --------------------------------------------------------------------------
_SEED_SPREAD_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    seeds AS (
      SELECT 'a_first' AS policy, vec_id AS k, pos, xi
      FROM dims WHERE vec_id < {KMEANS_K}
      UNION ALL
      SELECT 'b_strided', CAST(vec_id / GREATEST(1, nn.n // {KMEANS_K}) AS BIGINT),
             pos, xi
      FROM dims CROSS JOIN nn
      WHERE vec_id % GREATEST(1, nn.n // {KMEANS_K}) = 0
        AND vec_id < {KMEANS_K} * GREATEST(1, nn.n // {KMEANS_K})
    ),
    spread AS (
      SELECT a.policy,
             CAST(MIN(p.dd) AS BIGINT) AS min_seed_dist
      FROM (SELECT DISTINCT policy FROM seeds) a
      JOIN (
        SELECT s1.policy, s1.k AS k1, s2.k AS k2,
               CAST(SUM((s1.xi - s2.xi) * (s1.xi - s2.xi)) AS BIGINT)
                 AS dd
        FROM seeds s1
        JOIN seeds s2 ON s2.policy = s1.policy AND s2.pos = s1.pos
                     AND s2.k > s1.k
        GROUP BY 1, 2, 3
      ) p ON p.policy = a.policy
      GROUP BY 1
    ),
    dist AS (
      SELECT s.policy, d.vec_id, s.k,
             CAST(SUM((d.xi - s.xi) * (d.xi - s.xi)) AS BIGINT) AS dd
      FROM dims d JOIN seeds s ON s.pos = d.pos
      GROUP BY 1, 2, 3
    ),
    assigned AS (
      SELECT policy, vec_id, k, dd FROM (
        SELECT policy, vec_id, k, dd,
               ROW_NUMBER() OVER (PARTITION BY policy, vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    cells AS (
      SELECT policy, k, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM assigned GROUP BY 1, 2
    )
    SELECT a.policy,
           s.min_seed_dist,
           CAST(SUM(a.dd) AS BIGINT) AS total_distortion,
           (SELECT CAST(ROUND(MAX(c.n_vecs * 1000000.0 / nn.n))
                        AS BIGINT)
              FROM cells c CROSS JOIN nn
             WHERE c.policy = a.policy) AS max_cell_share_ppm
    FROM assigned a JOIN spread s ON s.policy = a.policy
    GROUP BY a.policy, s.min_seed_dist
    ORDER BY a.policy
    """


def seed_spread_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-K vs strided-K coarse-quantizer seeding, priced as seed
    spread, assignment distortion, and max cell share (see block
    comment); both policies share one stacked assignment pass."""
    from bigdataentrytask_spark.operators import collect_bounded

    e = _emb(spark, sf_dir)
    n = int(collect_bounded(e.agg(F.count(F.lit(1)).alias("n")))[0].n)
    # clamp (ADVICE r11): n < KMEANS_K would make stride 0 — Spark
    # % 0 yields NULLs while DuckDB's % 0 errors; with stride 1 the
    # b_strided arm degrades to a_first's seed set in BOTH engines.
    stride = max(1, n // KMEANS_K)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    seeds = (
        dims.filter(F.col("vec_id") < KMEANS_K)
        .select(
            F.lit("a_first").alias("policy"),
            F.col("vec_id").alias("k"),
            "pos",
            "xi",
        )
        .unionByName(
            dims.filter(
                (F.col("vec_id") % stride == 0)
                & (F.col("vec_id") < KMEANS_K * stride)
            ).select(
                F.lit("b_strided").alias("policy"),
                (F.col("vec_id") / stride).cast("bigint").alias("k"),
                "pos",
                "xi",
            )
        )
    )
    s1 = seeds.select(
        "policy", F.col("k").alias("k1"), "pos", F.col("xi").alias("x1")
    )
    s2 = seeds.select(
        "policy",
        F.col("k").alias("k2"),
        F.col("pos").alias("pos2"),
        F.col("xi").alias("x2"),
    )
    sd = F.col("x1") - F.col("x2")
    spread = (
        s1.join(
            s2,
            (F.col("pos2") == F.col("pos"))
            & (s1.policy == s2.policy)
            & (F.col("k2") > F.col("k1")),
        )
        .drop(s2.policy)
        .groupBy("policy", "k1", "k2")
        .agg(F.sum(sd * sd).cast("bigint").alias("dd"))
        .groupBy("policy")
        .agg(F.min("dd").cast("bigint").alias("min_seed_dist"))
    )
    diff = F.col("xi") - F.col("sx")
    dist = (
        dims.join(
            F.broadcast(
                seeds.select(
                    "policy",
                    "k",
                    F.col("pos").alias("s_pos"),
                    F.col("xi").alias("sx"),
                )
            ),
            F.col("s_pos") == F.col("pos"),
        )
        .groupBy("policy", "vec_id", "k")
        .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
    )
    wa = Window.partitionBy("policy", "vec_id").orderBy("dd", "k")
    assigned = (
        dist.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("policy", "vec_id", "k", "dd")
    )
    cells = assigned.groupBy("policy", "k").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    maxshare = cells.groupBy("policy").agg(
        F.round(F.max("n_vecs") * 1000000.0 / n)
        .cast("bigint")
        .alias("max_cell_share_ppm")
    )
    tot = assigned.groupBy("policy").agg(
        F.sum("dd").cast("bigint").alias("total_distortion")
    )
    return (
        tot.join(spread, "policy")
        .join(maxshare, "policy")
        .select(
            "policy", "min_seed_dist", "total_distortion",
            "max_cell_share_ppm",
        )
        .orderBy("policy")
    )


# --------------------------------------------------------------------------
# PQ Lloyd convergence curve (ROADMAP round-13, pulled forward):
# pq_lloyd_refinement prices ONE step; this runs the loop one step
# further and emits the distortion trajectory (step 0 = toy seeds,
# 1, 2), per-step gain, and dead codes — the diminishing-returns
# curve a 100 TB codebook trainer reads to decide when to stop
# (training cost per Lloyd pass at scale is a full corpus sweep).
# The first step's gain dwarfs the second's (28% vs <5% here,
# pinned): the plateau arrives immediately on this corpus.
# Exact math: same grid-snapped ROUND(SUM/COUNT) centroid update and
# grid-integer distances as pq_lloyd_refinement; the per-step
# distortion chain is monotone non-increasing (pinned — the Lloyd
# update+reassign argument, robust here to the 1e-6 grid snap).
# Plan: dims persisted once; each step is one broadcast-codebook
# assignment pass + one domain-sized centroid update.
# --------------------------------------------------------------------------
_LLOYD_STEPS = 2


def _sql_lloyd_chain() -> str:
    """CTE chain cb0/a0 -> cb1/a1 -> ... for _LLOYD_STEPS updates."""
    parts = [f"""
    cb0 AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    )"""]
    for s in range(_LLOYD_STEPS + 1):
        parts.append(f"""
    d{s} AS (
      SELECT d.vec_id, d.sub, cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb{s} cb ON cb.pos = d.pos AND cb.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    a{s} AS (
      SELECT vec_id, sub, code, dd FROM (
        SELECT vec_id, sub, code, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM d{s}
      ) WHERE rn = 1
    )""")
        if s < _LLOYD_STEPS:
            parts.append(f"""
    ref{s + 1} AS (
      SELECT a.sub, a.code, d.pos,
             CAST(ROUND(SUM(d.xi) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
               AS ci
      FROM a{s} a
      JOIN dims d ON d.vec_id = a.vec_id AND d.sub = a.sub
      GROUP BY 1, 2, 3
    ),
    cb{s + 1} AS (
      SELECT c.code, c.sub, c.pos, COALESCE(r.ci, c.ci) AS ci
      FROM cb{s} c
      LEFT JOIN ref{s + 1} r ON r.sub = c.sub AND r.code = c.code
                            AND r.pos = c.pos
    )""")
    return ",".join(parts)


_LLOYD_CONV_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id,
             ((generate_subscripts(e, 1) - 1) * {_PQ_SUB}) // {_PQ_DIM}
               AS sub,
             generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    {_sql_lloyd_chain()},
    steps AS (
      {" UNION ALL ".join(
        f'''SELECT {s} AS step,
               CAST(SUM(dd) AS BIGINT) AS total_distortion,
               CAST({_PQ_SUB * _PQ_K} - COUNT(DISTINCT (sub, code))
                    AS BIGINT) AS n_dead_codes
        FROM a{s}''' for s in range(_LLOYD_STEPS + 1))}
    )
    SELECT CAST(step AS BIGINT) AS step, total_distortion, n_dead_codes,
           CAST(COALESCE(LAG(total_distortion) OVER (ORDER BY step)
                         - total_distortion, 0) AS BIGINT) AS gain,
           CAST(ROUND(COALESCE(LAG(total_distortion) OVER (ORDER BY step)
                               - total_distortion, 0) * 1000000.0
                      / MAX(total_distortion) OVER ()) AS BIGINT)
             AS gain_ppm_of_step0
    FROM steps
    ORDER BY step
    """


def pq_lloyd_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distortion trajectory over _LLOYD_STEPS Lloyd iterations of the
    PQ codebook (see block comment): the diminishing-returns curve."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        cb = (
            e.filter(F.col("vec_id") < _PQ_K)
            .select(
                F.col("vec_id").alias("code"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select(
                "code",
                ((F.col("pos0") * _PQ_SUB) / _PQ_DIM)
                .cast("long")
                .alias("sub"),
                (F.col("pos0") + 1).alias("pos"),
                grid.alias("ci"),
            )
        )

        def assign(cbf):
            j = cbf.select(
                "code",
                F.col("sub").alias("cb_sub"),
                F.col("pos").alias("cb_pos"),
                "ci",
            )
            diff = F.col("xi") - F.col("ci")
            dist = (
                dims_p.join(
                    F.broadcast(j),
                    (F.col("cb_pos") == F.col("pos"))
                    & (F.col("cb_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
            )
            wa = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return materialize(
                dist.withColumn("rn", F.row_number().over(wa))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code", "dd")
            )

        def update(cbf, a):
            refined = (
                a.select(
                    F.col("vec_id").alias("a_vid"),
                    F.col("sub").alias("a_sub"),
                    "code",
                )
                .join(
                    dims_p,
                    (F.col("a_vid") == F.col("vec_id"))
                    & (F.col("a_sub") == F.col("sub")),
                )
                .groupBy(F.col("a_sub").alias("g_sub"), "code", "pos")
                .agg(
                    F.round(
                        F.sum("xi") / F.count(F.lit(1)).cast("double")
                    )
                    .cast("bigint")
                    .alias("r_ci")
                )
                .withColumnRenamed("g_sub", "sub")
            )
            return cbf.join(refined, ["sub", "code", "pos"], "left").select(
                "code", "sub", "pos",
                F.coalesce("r_ci", "ci").alias("ci"),
            )

        rows = None
        a = assign(cb)
        for s in range(_LLOYD_STEPS + 1):
            stat = a.agg(
                F.lit(s).cast("bigint").alias("step"),
                F.sum("dd").cast("bigint").alias("total_distortion"),
                (
                    F.lit(_PQ_SUB * _PQ_K) - F.count_distinct("sub", "code")
                )
                .cast("bigint")
                .alias("n_dead_codes"),
            )
            rows = stat if rows is None else rows.unionByName(stat)
            if s < _LLOYD_STEPS:
                cb = update(cb, a)
                a = assign(cb)
        w0 = Window.orderBy("step")
        gain = F.coalesce(
            F.lag("total_distortion").over(w0) - F.col("total_distortion"),
            F.lit(0),
        )
        return materialize(
            rows.select(
                "step",
                "total_distortion",
                "n_dead_codes",
                gain.cast("bigint").alias("gain"),
                F.round(
                    gain
                    * 1000000.0
                    / F.max("total_distortion").over(
                        Window.partitionBy()
                    )
                )
                .cast("bigint")
                .alias("gain_ppm_of_step0"),
            ).orderBy("step")
        )


# --------------------------------------------------------------------------
# IVFADC with the Lloyd-refined PQ codebook (ROADMAP round-13,
# pulled forward — "Stronger-codebook IVFADC", the direct attempt to
# flip ivf_adc_recall's pinned honest negative). The diagnostic
# chain so far: cells are balanced (ivf_cell_balance_audit), the
# toy codebook's distortion is the defect (pq_lloyd_refinement cuts
# it 28% in one step), and one step is where the gains live
# (pq_lloyd_convergence). This operator re-runs the IVFADC
# nprobe sweep with the ONE-STEP-REFINED subspace codebook —
# identical coarse probe, identical superset-ADC/nested-rank plan —
# so the row-by-row diff against ivf_adc_recall isolates the
# codebook's effect on end-to-end retrieval. The regime answer is
# pinned in tests, whichever way it lands.
# --------------------------------------------------------------------------
_IVF_ADC_LLOYD_ORACLE = f"""
    WITH {{IVF_CTES}},
    cb0 AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    ),
    pq_dist0 AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb0 cb ON cb.pos = d.pos
                 AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned0 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist0
      ) WHERE rn = 1
    ),
    refined AS (
      SELECT a.sub, a.code, d.pos,
             CAST(ROUND(SUM(d.xi) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
               AS ci
      FROM pq_assigned0 a
      JOIN dims d ON d.vec_id = a.vec_id
                 AND ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} = a.sub
      GROUP BY 1, 2, 3
    ),
    codebook AS (
      SELECT c.code, c.sub, c.pos, COALESCE(r.ci, c.ci) AS ci
      FROM cb0 c
      LEFT JOIN refined r ON r.sub = c.sub AND r.code = c.code
                         AND r.pos = c.pos
    ),
    pq_dist AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN codebook cb ON cb.pos = d.pos
                      AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rnk
      FROM dist WHERE vec_id < {N_QUERIES}
    ),
    need AS (
      SELECT qc.query_id, ac.vec_id AS neighbor_id,
             MIN(qc.cell_rnk) AS need_probe
      FROM qcells qc
      JOIN assigned ac ON ac.k = qc.k
      WHERE ac.vec_id <> qc.query_id
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT n.query_id, n.neighbor_id, n.need_probe,
             CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS dd
      FROM need n
      JOIN pq_assigned a ON a.vec_id = n.neighbor_id
      JOIN codebook cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN dims q ON q.vec_id = n.query_id AND q.pos = cb.pos
      WHERE n.need_probe <= {max(_IVF_ADC_PROBES)}
      GROUP BY 1, 2, 3
    ),
    pr(nprobe) AS (VALUES {", ".join(f"({p})" for p in _IVF_ADC_PROBES)}),
    ranked AS (
      SELECT pr.nprobe, a.query_id, a.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY pr.nprobe, a.query_id
                                ORDER BY a.dd, a.neighbor_id) AS rnk
      FROM adc a JOIN pr ON a.need_probe <= pr.nprobe
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM((q.xi - c.xi) * (q.xi - c.xi)) AS BIGINT) AS dd
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_K}
    ),
    vol AS (
      SELECT pr.nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM need n JOIN pr ON n.need_probe <= pr.nprobe
      GROUP BY 1
    ),
    hits AS (
      SELECT r.nprobe,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT CAST(h.nprobe AS BIGINT) AS nprobe,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.nprobe = h.nprobe
    ORDER BY nprobe
    """


def ivf_adc_lloyd_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC nprobe sweep under the one-Lloyd-step PQ codebook (see
    block comment; plan identical to ivf_adc_recall plus the
    assignment/update refinement stage)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        cdist = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wc = Window.partitionBy("vec_id").orderBy("dd", "k")
        cell_rank = cdist.withColumn("rn", F.row_number().over(wc))
        assigned_cell = materialize(
            cell_rank.filter(F.col("rn") == 1).select("vec_id", "k")
        )
        qcells = materialize(
            cell_rank.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                "k",
                F.col("rn").alias("cell_rnk"),
            )
        )
        need = materialize(
            qcells.join(
                assigned_cell.withColumnRenamed("vec_id", "neighbor_id"),
                "k",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.min("cell_rnk").alias("need_probe"))
        )
        cb0 = (
            e.filter(F.col("vec_id") < _PQ_K)
            .select(
                F.col("vec_id").alias("cb_code"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select(
                "cb_code",
                ((F.col("pos0") * _PQ_SUB) / _PQ_DIM)
                .cast("long")
                .alias("cb_sub"),
                (F.col("pos0") + 1).alias("cb_pos"),
                grid.alias("ci"),
            )
        )

        def pq_assign(cbf):
            dist0 = (
                dims_p.join(
                    F.broadcast(cbf),
                    (F.col("cb_pos") == F.col("pos"))
                    & (F.col("cb_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", F.col("cb_code").alias("code"))
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wp = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return materialize(
                dist0.withColumn("rn", F.row_number().over(wp))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )

        a0 = pq_assign(cb0)
        refined = (
            a0.select(
                F.col("vec_id").alias("a_vid"),
                F.col("sub").alias("a_sub"),
                "code",
            )
            .join(
                dims_p,
                (F.col("a_vid") == F.col("vec_id"))
                & (F.col("a_sub") == F.col("sub")),
            )
            .groupBy(
                F.col("a_sub").alias("cb_sub"),
                F.col("code").alias("cb_code"),
                F.col("pos").alias("cb_pos"),
            )
            .agg(
                F.round(F.sum("xi") / F.count(F.lit(1)).cast("double"))
                .cast("bigint")
                .alias("r_ci")
            )
        )
        codebook = (
            cb0.join(refined, ["cb_sub", "cb_code", "cb_pos"], "left")
            .select(
                "cb_code",
                "cb_sub",
                "cb_pos",
                F.coalesce("r_ci", "ci").alias("ci"),
            )
        )
        pq_assigned = pq_assign(codebook)
        rmax = max(_IVF_ADC_PROBES)
        qd = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_qid"),
            F.col("pos").alias("q_pos"),
            F.col("xi").alias("qi"),
        )
        adc = (
            need.filter(F.col("need_probe") <= rmax)
            .join(
                pq_assigned.withColumnRenamed("vec_id", "neighbor_id"),
                "neighbor_id",
            )
            .join(
                F.broadcast(codebook),
                (F.col("cb_sub") == F.col("sub"))
                & (F.col("cb_code") == F.col("code")),
            )
            .join(
                F.broadcast(qd),
                (F.col("q_pos") == F.col("cb_pos"))
                & (F.col("q_qid") == F.col("query_id")),
            )
            .groupBy("query_id", "neighbor_id", "need_probe")
            .agg(
                F.sum(
                    (F.col("qi") - F.col("ci")) * (F.col("qi") - F.col("ci"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wr = Window.partitionBy("query_id").orderBy(
            "dd", "neighbor_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        flags = adc.select(
            "query_id",
            "neighbor_id",
            *[
                F.sum((F.col("need_probe") <= p).cast("long"))
                .over(wr)
                .alias(f"rnk_{p}")
                for p in _IVF_ADC_PROBES
            ],
            *[
                (F.col("need_probe") <= p).cast("int").alias(f"in_{p}")
                for p in _IVF_ADC_PROBES
            ],
        )
        stack_expr = ", ".join(
            f"CAST({p} AS BIGINT), in_{p} = 1 AND rnk_{p} <= {TOP_K}"
            for p in _IVF_ADC_PROBES
        )
        ranked = flags.select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"stack({len(_IVF_ADC_PROBES)}, {stack_expr})"
                " AS (nprobe, in_top)"
            ),
        ).filter(F.col("in_top")).select("nprobe", "query_id", "neighbor_id")
        cx = dims_p.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("pos").alias("pos_c"),
            F.col("xi").alias("ci2"),
        )
        exact = (
            F.broadcast(
                dims_p.filter(F.col("vec_id") < N_QUERIES).select(
                    F.col("vec_id").alias("query_id"),
                    "pos",
                    F.col("xi").alias("qi"),
                )
            )
            .join(cx, F.col("pos_c") == F.col("pos"))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.sum(
                    (F.col("qi") - F.col("ci2"))
                    * (F.col("qi") - F.col("ci2"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wt = Window.partitionBy("query_id").orderBy("dd", "neighbor_id")
        truth = (
            exact.withColumn("rnk", F.row_number().over(wt))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", F.lit(1).alias("is_true"))
        )
        pr = spark.createDataFrame(
            [(p,) for p in _IVF_ADC_PROBES], "nprobe long"
        )
        vol = (
            need.crossJoin(F.broadcast(pr))
            .filter(F.col("need_probe") <= F.col("nprobe"))
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        )
        hits = (
            ranked.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("nprobe")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, "nprobe")
            .select(
                F.col("nprobe").cast("bigint").alias("nprobe"),
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_candidates").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("nprobe")
        )


from bigdataentrytask_spark.operators import ORACLES as _REG_ORACLES  # noqa: E402

ROUND12_STAGED: dict[str, tuple] = {
    "ivf_cell_balance_audit": (
        ivf_cell_balance_audit,
        _CELL_BALANCE_ORACLE,
    ),
    "pq_lloyd_refinement": (pq_lloyd_refinement, _LLOYD_ORACLE),
    "candidate_budget_recall": (
        candidate_budget_recall,
        _CBR_ORACLE.replace("{SQL_PLANES}", _sql_planes())
        .replace("{SQL_CODES}", _SQL_CODES.strip())
        .replace("{IVF_CTES}", _IVF_CTES)
        .replace("{KNN_TRUTH}", _REG_ORACLES["knn_bruteforce"]),
    ),
    "seed_spread_advisor": (seed_spread_advisor, _SEED_SPREAD_ORACLE),
    "pq_lloyd_convergence": (pq_lloyd_convergence, _LLOYD_CONV_ORACLE),
    "ivf_adc_lloyd_recall": (
        ivf_adc_lloyd_recall,
        _IVF_ADC_LLOYD_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
    ),
}


# ==========================================================================
# ROUND-13 STAGED (VERDICT r11 item 6; zero registry delta until the
# round-13 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Coarse-quantizer (cell-seed) Lloyd refinement (ROADMAP round-13
# "Retrieval", the chain's coarse side): ivf_adc_lloyd_recall refined
# the PQ CODEBOOK under the toy coarse quantizer and broke the
# falling-recall regime; this op refines the COARSE CELLS themselves
# (one Lloyd step on the KMEANS_K first-K seeds: per-cell per-dim
# integer-grid mean, reassign) and prices what the coarse side alone
# buys, per (variant, nprobe): the true-neighbor CELL COVERAGE — the
# fraction of brute-force top-5 neighbors living in the query's top-
# nprobe cells, i.e. the recall CEILING any in-cell scorer inherits —
# plus the probed-candidate volume, with the per-variant Lloyd
# yardsticks (total coarse distortion, max cell share) alongside.
# Exact math: integer-grid distances throughout; refined centroids
# are ROUND(SUM(xi)/n) on exact integer sums (both engines round the
# identical double, away-from-zero on ties); coverage and candidate
# ratios are the only two final roundings.
# Scale posture: the seed/centroid side is K x dim rows (broadcast);
# assignment is one keyed argmin window per variant over dimension
# rows; coverage is a TOP_K x N_QUERIES-domain join. One stacked
# pass computes both variants (the seed_spread_advisor pattern).
# --------------------------------------------------------------------------
_CELL_PROBES = [1, 2, 4]

_CELL_LLOYD_ORACLE = f"""
    WITH {{IVF_CTES}},
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    alldist AS (
      SELECT 'a_toy' AS variant, vec_id, k, dd FROM dist
      UNION ALL
      SELECT 'b_lloyd1', vec_id, k, dd FROM dist2
    ),
    asg AS (
      SELECT variant, vec_id, k, dd FROM (
        SELECT variant, vec_id, k, dd,
               ROW_NUMBER() OVER (PARTITION BY variant, vec_id
                                  ORDER BY dd, k) AS rn
        FROM alldist
      ) WHERE rn = 1
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
           FROM dims),
    cells AS (
      SELECT variant, k, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM asg GROUP BY 1, 2
    ),
    vstats AS (
      SELECT a.variant,
             CAST(SUM(a.dd) AS BIGINT) AS total_distortion,
             (SELECT CAST(ROUND(MAX(c.n_vecs * 1000000.0 / nn.n))
                          AS BIGINT)
                FROM cells c CROSS JOIN nn
               WHERE c.variant = a.variant) AS max_cell_share_ppm
      FROM asg a GROUP BY a.variant
    ),
    qrank AS (
      SELECT variant, vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY variant, vec_id
                                ORDER BY dd, k) AS cell_rank
      FROM alldist WHERE vec_id < {N_QUERIES}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    ),
    tcell AS (
      SELECT t.query_id, t.neighbor_id, an.variant,
             qr.cell_rank
      FROM truth t
      JOIN asg an ON an.vec_id = t.neighbor_id
      JOIN qrank qr ON qr.variant = an.variant
                   AND qr.query_id = t.query_id AND qr.k = an.k
    ),
    pr(nprobe) AS (VALUES {", ".join(f"({p})" for p in _CELL_PROBES)}),
    cand AS (
      SELECT qr.variant, pr.nprobe,
             CAST(SUM(c.n_vecs) AS BIGINT) AS n_probed_vecs
      FROM qrank qr
      CROSS JOIN pr
      JOIN cells c ON c.variant = qr.variant AND c.k = qr.k
      WHERE qr.cell_rank <= pr.nprobe
      GROUP BY qr.variant, pr.nprobe
    )
    SELECT v.variant,
           CAST(pr.nprobe AS BIGINT) AS nprobe,
           CAST(ROUND((SELECT count_if(tc.cell_rank <= pr.nprobe)
                         FROM tcell tc
                        WHERE tc.variant = v.variant) * 1000000.0
                      / ({N_QUERIES} * {TOP_K})) AS BIGINT)
             AS coverage_ppm,
           (SELECT CAST(ROUND((ca.n_probed_vecs - {N_QUERIES}) * 1.0
                              / {N_QUERIES}) AS BIGINT)
              FROM cand ca
             WHERE ca.variant = v.variant AND ca.nprobe = pr.nprobe)
             AS mean_candidates,
           v.total_distortion,
           v.max_cell_share_ppm
    FROM vstats v CROSS JOIN pr
    ORDER BY v.variant, nprobe
    """


def ivf_cell_lloyd_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toy vs one-Lloyd-step coarse quantizer, priced as per-nprobe
    true-neighbor cell coverage (the recall ceiling), candidate
    volume, and the Lloyd yardsticks (see block comment)."""
    from bigdataentrytask_spark.operators import REGISTRY

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"), "pos", F.col("xi").alias("si")
        )
        dist = (
            dims_p.join(seeds, "pos")
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("si"))
                    * (F.col("xi") - F.col("si"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wv = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned = (
            dist.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        cent = (
            assigned.join(dims_p, "vec_id")
            .groupBy("k", "pos")
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        dist2 = (
            dims_p.join(cent, "pos")
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("si"))
                    * (F.col("xi") - F.col("si"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        alldist = dist.select(
            F.lit("a_toy").alias("variant"), "vec_id", "k", "dd"
        ).unionByName(
            dist2.select(
                F.lit("b_lloyd1").alias("variant"), "vec_id", "k", "dd"
            )
        )
        with with_persisted(alldist) as ad:
            wva = Window.partitionBy("variant", "vec_id").orderBy(
                "dd", "k"
            )
            asg = (
                ad.withColumn("rn", F.row_number().over(wva))
                .filter(F.col("rn") == 1)
                .select("variant", "vec_id", "k", "dd")
            )
            with with_persisted(asg) as asg_p:
                nn = dims_p.agg(F.count_distinct("vec_id").alias("n"))
                cells = asg_p.groupBy("variant", "k").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_vecs")
                )
                vstats = (
                    asg_p.groupBy("variant")
                    .agg(
                        F.sum("dd")
                        .cast("bigint")
                        .alias("total_distortion")
                    )
                    .join(
                        cells.crossJoin(F.broadcast(nn))
                        .groupBy("variant")
                        .agg(
                            F.round(
                                F.max(
                                    F.col("n_vecs")
                                    * 1000000.0
                                    / F.col("n")
                                )
                            )
                            .cast("bigint")
                            .alias("max_cell_share_ppm")
                        ),
                        "variant",
                    )
                )
                qrank = (
                    ad.filter(F.col("vec_id") < N_QUERIES)
                    .withColumn(
                        "cell_rank",
                        F.row_number().over(
                            Window.partitionBy(
                                "variant", "vec_id"
                            ).orderBy("dd", "k")
                        ),
                    )
                    .select(
                        "variant",
                        F.col("vec_id").alias("query_id"),
                        "k",
                        "cell_rank",
                    )
                )
                truth = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
                    "query_id", "neighbor_id"
                )
                tcell = truth.join(
                    asg_p.select(
                        "variant",
                        F.col("vec_id").alias("neighbor_id"),
                        "k",
                    ),
                    "neighbor_id",
                ).join(
                    qrank.select(
                        "variant", "query_id", "k", "cell_rank"
                    ),
                    ["variant", "query_id", "k"],
                )
                pr = spark.createDataFrame(
                    [(p,) for p in _CELL_PROBES], "nprobe long"
                )
                cov = (
                    tcell.crossJoin(F.broadcast(pr))
                    .groupBy("variant", "nprobe")
                    .agg(
                        F.sum(
                            (
                                F.col("cell_rank") <= F.col("nprobe")
                            ).cast("long")
                        ).alias("n_covered")
                    )
                )
                cand = (
                    qrank.crossJoin(F.broadcast(pr))
                    .filter(F.col("cell_rank") <= F.col("nprobe"))
                    .join(cells, ["variant", "k"])
                    .groupBy("variant", "nprobe")
                    .agg(
                        F.sum("n_vecs")
                        .cast("bigint")
                        .alias("n_probed_vecs")
                    )
                )
                out = (
                    vstats.crossJoin(F.broadcast(pr))
                    .join(cov, ["variant", "nprobe"])
                    .join(cand, ["variant", "nprobe"])
                    .select(
                        "variant",
                        F.col("nprobe").cast("bigint").alias("nprobe"),
                        F.round(
                            F.col("n_covered")
                            * 1000000.0
                            / (N_QUERIES * TOP_K)
                        )
                        .cast("bigint")
                        .alias("coverage_ppm"),
                        F.round(
                            (F.col("n_probed_vecs") - N_QUERIES)
                            * 1.0
                            / N_QUERIES
                        )
                        .cast("bigint")
                        .alias("mean_candidates"),
                        "total_distortion",
                        "max_cell_share_ppm",
                    )
                    .orderBy("variant", "nprobe")
                )
                return materialize(out)


ROUND13_STAGED: dict[str, tuple] = {
    "ivf_cell_lloyd_probe": (
        ivf_cell_lloyd_probe,
        _CELL_LLOYD_ORACLE.replace("{IVF_CTES}", _IVF_CTES)
        .replace("{KNN_TRUTH}", _REG_ORACLES["knn_bruteforce"]),
    ),
}


# --------------------------------------------------------------------------
# Budget-normalized quantization pareto (ROADMAP round-13
# "Retrieval"): quantization_pareto_table prices bytes/vector vs
# recall with each codec ranking the WHOLE corpus; a serving system
# instead spends a fixed exact-scoring budget B — the codec's cheap
# score picks B candidates, the f32 vectors re-rank them, and recall
# is whatever survives the funnel. This table crosses three
# candidate generators (a_exact_f32 256 B — the calibration row
# whose funnel is lossless by construction once B >= TOP_K;
# b_matryoshka_d16 64 B prefix cosine; c_binary_asym 8 B sign-dot)
# with the candidate budgets, all sharing ONE exact-cosine rerank
# and ONE brute-force truth. Read it as recall-per-byte at equal
# exact-scoring spend — the number that actually sizes a two-stage
# retrieval tier.
# Exact math: grid-integer dots everywhere (the binary cheap score
# is an exact INTEGER — query grid ints times sign bits); the only
# doubles are the two norm divisions (identical expressions both
# engines) and the final recall rounding.
# Scale: scores are query-domain x corpus rows (N_QUERIES bounded);
# at index scale the cheap-score scan is the codec's compressed
# sweep and the rerank touches exactly B f32 rows per query.
# --------------------------------------------------------------------------
_QBP_BUDGETS = [10, 50]
_QBP_PREFIX = 16  # matryoshka prefix dims (b_matryoshka_d16)

_QBP_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    cc AS (
      SELECT vec_id, CAST(SUM(xi * xi) AS DOUBLE) AS cc,
             CAST(SUM(CASE WHEN pos <= {_QBP_PREFIX}
                           THEN xi * xi ELSE 0 END) AS DOUBLE) AS cc16
      FROM dims GROUP BY vec_id
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(q.xi * c.xi) AS BIGINT) AS dot,
             CAST(SUM(CASE WHEN q.pos <= {_QBP_PREFIX}
                           THEN q.xi * c.xi ELSE 0 END) AS BIGINT)
               AS dot16,
             CAST(SUM(q.xi * CASE WHEN c.xi >= 0 THEN 1 ELSE -1 END)
                  AS BIGINT) AS sdot
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.query_id, p.neighbor_id,
             CASE WHEN n.cc = 0 THEN -2.0
                  ELSE p.dot / sqrt(n.cc) END AS s_exact,
             CASE WHEN n.cc16 = 0 THEN -2.0
                  ELSE p.dot16 / sqrt(n.cc16) END AS s_m16,
             CAST(p.sdot AS DOUBLE) AS s_bin
      FROM pairs p JOIN cc n ON n.vec_id = p.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, s_exact,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s_exact DESC, neighbor_id)
               AS r_exact,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s_m16 DESC, neighbor_id)
               AS r_m16,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s_bin DESC, neighbor_id)
               AS r_bin
      FROM scored
    ),
    bud(budget) AS (VALUES {", ".join(f"({b})" for b in _QBP_BUDGETS)}),
    cfg(config, bytes_per_vec, rcol) AS (VALUES
      ('a_exact_f32', 256, 'r_exact'),
      ('b_matryoshka_d16', {_QBP_PREFIX * 4}, 'r_m16'),
      ('c_binary_asym', 8, 'r_bin')),
    funnel AS (
      SELECT cf.config, cf.bytes_per_vec, b.budget,
             r.query_id, r.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY cf.config, b.budget,
                                             r.query_id
                                ORDER BY r.s_exact DESC, r.neighbor_id)
               AS rr
      FROM ranked r
      CROSS JOIN bud b
      JOIN cfg cf ON (CASE cf.rcol WHEN 'r_exact' THEN r.r_exact
                                   WHEN 'r_m16' THEN r.r_m16
                                   ELSE r.r_bin END) <= b.budget
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    )
    SELECT f.config, CAST(f.bytes_per_vec AS BIGINT) AS bytes_per_vec,
           CAST(f.budget AS BIGINT) AS budget,
           CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
             AS n_hits,
           ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_5
    FROM (SELECT * FROM funnel WHERE rr <= {TOP_K}) f
    LEFT JOIN truth t ON t.query_id = f.query_id
                     AND t.neighbor_id = f.neighbor_id
    GROUP BY f.config, f.bytes_per_vec, f.budget
    ORDER BY f.config, f.budget
    """


def quantization_budget_pareto(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Three candidate generators x candidate budgets through one
    exact-cosine rerank funnel against one brute-force truth (see
    block comment): bytes/vector vs recall at equal exact-scoring
    spend."""
    from bigdataentrytask_spark.operators import REGISTRY

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    with with_persisted(dims) as dims_p:
        cc = dims_p.groupBy("vec_id").agg(
            F.sum(F.col("xi") * F.col("xi")).cast("double").alias("cc"),
            F.sum(
                F.when(
                    F.col("pos") <= _QBP_PREFIX,
                    F.col("xi") * F.col("xi"),
                ).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("cc16"),
        )
        q = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            "pos",
            F.col("xi").alias("qx"),
        )
        c = dims_p.select(
            F.col("vec_id").alias("neighbor_id"),
            "pos",
            F.col("xi").alias("cx"),
        )
        pairs = (
            q.join(c, "pos")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.sum(F.col("qx") * F.col("cx"))
                .cast("bigint")
                .alias("dot"),
                F.sum(
                    F.when(
                        F.col("pos") <= _QBP_PREFIX,
                        F.col("qx") * F.col("cx"),
                    ).otherwise(F.lit(0))
                )
                .cast("bigint")
                .alias("dot16"),
                F.sum(
                    F.col("qx")
                    * F.when(F.col("cx") >= 0, 1).otherwise(-1)
                )
                .cast("bigint")
                .alias("sdot"),
            )
        )
        scored = pairs.join(
            cc.select(
                F.col("vec_id").alias("neighbor_id"), "cc", "cc16"
            ),
            "neighbor_id",
        ).select(
            "query_id",
            "neighbor_id",
            F.when(F.col("cc") == 0, F.lit(-2.0))
            .otherwise(F.col("dot") / F.sqrt("cc"))
            .alias("s_exact"),
            F.when(F.col("cc16") == 0, F.lit(-2.0))
            .otherwise(F.col("dot16") / F.sqrt("cc16"))
            .alias("s_m16"),
            F.col("sdot").cast("double").alias("s_bin"),
        )
        wq = Window.partitionBy("query_id")
        ranked = scored.select(
            "query_id",
            "neighbor_id",
            "s_exact",
            F.row_number()
            .over(wq.orderBy(F.col("s_exact").desc(), "neighbor_id"))
            .alias("r_exact"),
            F.row_number()
            .over(wq.orderBy(F.col("s_m16").desc(), "neighbor_id"))
            .alias("r_m16"),
            F.row_number()
            .over(wq.orderBy(F.col("s_bin").desc(), "neighbor_id"))
            .alias("r_bin"),
        )
        with with_persisted(ranked) as ranked_p:
            bud = spark.createDataFrame(
                [(b,) for b in _QBP_BUDGETS], "budget long"
            )
            cfg = spark.createDataFrame(
                [
                    ("a_exact_f32", 256, "r_exact"),
                    ("b_matryoshka_d16", _QBP_PREFIX * 4, "r_m16"),
                    ("c_binary_asym", 8, "r_bin"),
                ],
                "config string, bytes_per_vec long, rcol string",
            )
            cheap_rank = (
                F.when(F.col("rcol") == "r_exact", F.col("r_exact"))
                .when(F.col("rcol") == "r_m16", F.col("r_m16"))
                .otherwise(F.col("r_bin"))
            )
            funnel = (
                ranked_p.crossJoin(F.broadcast(bud))
                .crossJoin(F.broadcast(cfg))
                .filter(cheap_rank <= F.col("budget"))
                .withColumn(
                    "rr",
                    F.row_number().over(
                        Window.partitionBy(
                            "config", "budget", "query_id"
                        ).orderBy(F.col("s_exact").desc(), "neighbor_id")
                    ),
                )
                .filter(F.col("rr") <= TOP_K)
            )
            truth = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
                "query_id", "neighbor_id", F.lit(1).alias("hit")
            )
            out = (
                funnel.join(truth, ["query_id", "neighbor_id"], "left")
                .groupBy("config", "bytes_per_vec", "budget")
                .agg(
                    F.sum(F.coalesce("hit", F.lit(0)))
                    .cast("bigint")
                    .alias("n_hits")
                )
                .select(
                    "config",
                    F.col("bytes_per_vec")
                    .cast("bigint")
                    .alias("bytes_per_vec"),
                    F.col("budget").cast("bigint").alias("budget"),
                    "n_hits",
                    F.round(
                        F.col("n_hits")
                        / F.lit(float(N_QUERIES * TOP_K)),
                        6,
                    ).alias("recall_at_5"),
                )
                .orderBy("config", "budget")
            )
            return materialize(out)


ROUND13_STAGED["quantization_budget_pareto"] = (
    quantization_budget_pareto,
    _QBP_ORACLE.replace("{KNN_TRUTH}", _REG_ORACLES["knn_bruteforce"]),
)


# --------------------------------------------------------------------------
# Coarse-cell Lloyd convergence (round-12 original; completes the
# Lloyd chain's symmetry — PQ side has pq_lloyd_refinement +
# pq_lloyd_convergence, the coarse side has ivf_cell_lloyd_probe +
# THIS): the stop-decision curve for the cell trainer. Steps 0/1/2
# of Lloyd on the KMEANS_K coarse seeds, each step's total
# assignment distortion, per-step gain, and live-cell count. Step 0
# and step 1 cross-pin ivf_cell_lloyd_probe's a_toy/b_lloyd1 totals
# (same arithmetic, independent implementation). At 100 TB each
# Lloyd pass is a full corpus sweep over the dimension rows — this
# curve says when to stop paying for them.
# Exact math: grid-integer distances; centroids ROUND(SUM/n) on
# exact integer sums per step, so every step's distortion is an
# exact integer in any accumulation order.
# Scale: |steps| keyed argmin windows over dimension rows with
# K x dim broadcast centroids — the kmeans_step posture iterated a
# fixed, bounded number of times.
# --------------------------------------------------------------------------
_CELL_CONV_STEPS = 2


def _cell_conv_oracle() -> str:
    # unrolled fixed-step Lloyd: dist0 uses the first-K seeds; each
    # subsequent step recomputes integer-grid centroids from the
    # previous assignment and re-measures
    ctes = [f"""{_IVF_CTES},
    asg0 AS (
      SELECT vec_id, k, dd FROM (
        SELECT vec_id, k, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist
      ) WHERE rn = 1
    )"""]
    for s in range(1, _CELL_CONV_STEPS + 1):
        ctes.append(f"""
    cent{s} AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM asg{s - 1} a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist{s} AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent{s} c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    asg{s} AS (
      SELECT vec_id, k, dd FROM (
        SELECT vec_id, k, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist{s}
      ) WHERE rn = 1
    )""")
    steps_union = " UNION ALL ".join(
        f"""SELECT {s} AS step,
               CAST(SUM(dd) AS BIGINT) AS total_distortion,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_cells_used
        FROM asg{s}"""
        for s in range(_CELL_CONV_STEPS + 1)
    )
    return f"""
    WITH {",".join(ctes)},
    steps AS ({steps_union})
    SELECT CAST(step AS BIGINT) AS step, total_distortion,
           n_cells_used,
           CAST(COALESCE(LAG(total_distortion)
                           OVER (ORDER BY step)
                         - total_distortion, 0) AS BIGINT) AS gain
    FROM steps
    ORDER BY step
    """


def ivf_cell_lloyd_convergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distortion trajectory of 0/1/2 Lloyd steps on the coarse cell
    seeds with per-step gains and live-cell counts (see block
    comment)."""
    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"), "pos", F.col("xi").alias("si")
        )

        def assign(cent):
            dist = (
                dims_p.join(cent, "pos")
                .groupBy("vec_id", "k")
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("si"))
                        * (F.col("xi") - F.col("si"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wv = Window.partitionBy("vec_id").orderBy("dd", "k")
            return (
                dist.withColumn("rn", F.row_number().over(wv))
                .filter(F.col("rn") == 1)
                .select("vec_id", "k", "dd")
            )

        def recenter(asg):
            return (
                asg.join(dims_p, "vec_id")
                .groupBy("k", "pos")
                .agg(
                    F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                    .cast("bigint")
                    .alias("si")
                )
            )

        steps = None
        asg = assign(seeds)
        for s in range(_CELL_CONV_STEPS + 1):
            stat = asg.agg(
                F.lit(s).alias("step"),
                F.sum("dd").cast("bigint").alias("total_distortion"),
                F.count_distinct("k").cast("bigint").alias(
                    "n_cells_used"
                ),
            )
            steps = stat if steps is None else steps.unionByName(stat)
            if s < _CELL_CONV_STEPS:
                asg = assign(recenter(asg))
        wlag = Window.orderBy("step")
        out = (
            steps.withColumn(
                "gain",
                F.coalesce(
                    F.lag("total_distortion").over(wlag)
                    - F.col("total_distortion"),
                    F.lit(0),
                ).cast("bigint"),
            )
            .select(
                F.col("step").cast("bigint").alias("step"),
                "total_distortion",
                "n_cells_used",
                "gain",
            )
            .orderBy("step")
        )
        return materialize(out)


ROUND13_STAGED["ivf_cell_lloyd_convergence"] = (
    ivf_cell_lloyd_convergence,
    _cell_conv_oracle(),
)


# ==========================================================================
# ROUND-14 STAGED (ROADMAP §"Round 14+"; zero registry delta until the
# round-14 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# IVFADC 2x2 completion — refined cells x refined codebook (ROADMAP
# round-14 "Retrieval"): the refinement chain priced each axis alone
# (ivf_adc_lloyd_recall: toy cells + 1-Lloyd-step PQ codebook;
# ivf_cell_lloyd_probe: 1-Lloyd-step cells, coverage-only). This op
# fills the missing quadrant: ONE Lloyd step on the COARSE CELLS
# (toy assign -> per-cell per-dim integer-grid mean -> reassign) AND
# the one-step-refined PQ codebook, then the identical superset-ADC /
# nested-rank nprobe sweep — so row-by-row diffs against
# ivf_adc_recall (toy x toy) and ivf_adc_lloyd_recall (toy cells x
# refined codebook) pin whether the two refinements COMPOSE or
# overlap. Output schema matches both siblings exactly (nprobe,
# n_queries, mean_candidates, n_hits, recall_at_5).
# Exact math: grid-integer distances end to end; refined centroids
# and codewords are ROUND(mean) on exact integer sums (both engines
# round the identical double); the only other doubles are the two
# final ratio roundings.
# Scale posture: identical to ivf_adc_lloyd_recall plus one extra
# assignment pass (the cell Lloyd step) — centroid/codebook sides
# stay K x dim broadcast rows, candidate work stays
# need_probe-bounded.
# --------------------------------------------------------------------------
_IVF_ADC_2X2_ORACLE = f"""
    WITH {{IVF_CTES}},
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    assigned2 AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist2
      ) WHERE rn = 1
    ),
    cb0 AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    ),
    pq_dist0 AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb0 cb ON cb.pos = d.pos
                 AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned0 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist0
      ) WHERE rn = 1
    ),
    refined AS (
      SELECT a.sub, a.code, d.pos,
             CAST(ROUND(SUM(d.xi) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
               AS ci
      FROM pq_assigned0 a
      JOIN dims d ON d.vec_id = a.vec_id
                 AND ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} = a.sub
      GROUP BY 1, 2, 3
    ),
    codebook AS (
      SELECT c.code, c.sub, c.pos, COALESCE(r.ci, c.ci) AS ci
      FROM cb0 c
      LEFT JOIN refined r ON r.sub = c.sub AND r.code = c.code
                         AND r.pos = c.pos
    ),
    pq_dist AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN codebook cb ON cb.pos = d.pos
                      AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rnk
      FROM dist2 WHERE vec_id < {N_QUERIES}
    ),
    need AS (
      SELECT qc.query_id, ac.vec_id AS neighbor_id,
             MIN(qc.cell_rnk) AS need_probe
      FROM qcells qc
      JOIN assigned2 ac ON ac.k = qc.k
      WHERE ac.vec_id <> qc.query_id
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT n.query_id, n.neighbor_id, n.need_probe,
             CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS dd
      FROM need n
      JOIN pq_assigned a ON a.vec_id = n.neighbor_id
      JOIN codebook cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN dims q ON q.vec_id = n.query_id AND q.pos = cb.pos
      WHERE n.need_probe <= {max(_IVF_ADC_PROBES)}
      GROUP BY 1, 2, 3
    ),
    pr(nprobe) AS (VALUES {", ".join(f"({p})" for p in _IVF_ADC_PROBES)}),
    ranked AS (
      SELECT pr.nprobe, a.query_id, a.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY pr.nprobe, a.query_id
                                ORDER BY a.dd, a.neighbor_id) AS rnk
      FROM adc a JOIN pr ON a.need_probe <= pr.nprobe
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM((q.xi - c.xi) * (q.xi - c.xi)) AS BIGINT) AS dd
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_K}
    ),
    vol AS (
      SELECT pr.nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM need n JOIN pr ON n.need_probe <= pr.nprobe
      GROUP BY 1
    ),
    hits AS (
      SELECT r.nprobe,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT CAST(h.nprobe AS BIGINT) AS nprobe,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.nprobe = h.nprobe
    ORDER BY nprobe
    """


def ivf_adc_refined_joint_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVFADC nprobe sweep under BOTH one-Lloyd-step refinements —
    coarse cells and PQ codebook — completing the 2x2 (see block
    comment; plan = ivf_adc_lloyd_recall plus one cell reassignment
    pass)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        cdist0 = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wc = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned0 = (
            cdist0.withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        cent = (
            assigned0.join(dims_p, "vec_id")
            .groupBy("k", F.col("pos").alias("s_pos"))
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        cdist = (
            dims_p.join(F.broadcast(cent), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        cell_rank = cdist.withColumn("rn", F.row_number().over(wc))
        assigned_cell = materialize(
            cell_rank.filter(F.col("rn") == 1).select("vec_id", "k")
        )
        qcells = materialize(
            cell_rank.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                "k",
                F.col("rn").alias("cell_rnk"),
            )
        )
        need = materialize(
            qcells.join(
                assigned_cell.withColumnRenamed("vec_id", "neighbor_id"),
                "k",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.min("cell_rnk").alias("need_probe"))
        )
        cb0 = (
            e.filter(F.col("vec_id") < _PQ_K)
            .select(
                F.col("vec_id").alias("cb_code"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select(
                "cb_code",
                ((F.col("pos0") * _PQ_SUB) / _PQ_DIM)
                .cast("long")
                .alias("cb_sub"),
                (F.col("pos0") + 1).alias("cb_pos"),
                grid.alias("ci"),
            )
        )

        def pq_assign(cbf):
            dist0 = (
                dims_p.join(
                    F.broadcast(cbf),
                    (F.col("cb_pos") == F.col("pos"))
                    & (F.col("cb_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", F.col("cb_code").alias("code"))
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wp = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return materialize(
                dist0.withColumn("rn", F.row_number().over(wp))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )

        a0 = pq_assign(cb0)
        refined = (
            a0.select(
                F.col("vec_id").alias("a_vid"),
                F.col("sub").alias("a_sub"),
                "code",
            )
            .join(
                dims_p,
                (F.col("a_vid") == F.col("vec_id"))
                & (F.col("a_sub") == F.col("sub")),
            )
            .groupBy(
                F.col("a_sub").alias("cb_sub"),
                F.col("code").alias("cb_code"),
                F.col("pos").alias("cb_pos"),
            )
            .agg(
                F.round(F.sum("xi") / F.count(F.lit(1)).cast("double"))
                .cast("bigint")
                .alias("r_ci")
            )
        )
        codebook = (
            cb0.join(refined, ["cb_sub", "cb_code", "cb_pos"], "left")
            .select(
                "cb_code",
                "cb_sub",
                "cb_pos",
                F.coalesce("r_ci", "ci").alias("ci"),
            )
        )
        pq_assigned = pq_assign(codebook)
        rmax = max(_IVF_ADC_PROBES)
        adc = (
            need.filter(F.col("need_probe") <= rmax)
            .join(
                pq_assigned.select(
                    F.col("vec_id").alias("neighbor_id"), "sub", "code"
                ),
                "neighbor_id",
            )
            .join(
                F.broadcast(
                    codebook.select(
                        F.col("cb_sub").alias("sub"),
                        F.col("cb_code").alias("code"),
                        F.col("cb_pos").alias("pos"),
                        "ci",
                    )
                ),
                ["sub", "code"],
            )
            .join(
                dims_p.select(
                    F.col("vec_id").alias("query_id"), "pos", "xi"
                ),
                ["query_id", "pos"],
            )
            .groupBy("query_id", "neighbor_id", "need_probe")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("ci")) * (F.col("xi") - F.col("ci"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        pr = spark.createDataFrame(
            [(p,) for p in _IVF_ADC_PROBES], "nprobe long"
        )
        ranked = (
            adc.crossJoin(F.broadcast(pr))
            .filter(F.col("need_probe") <= F.col("nprobe"))
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("nprobe", "query_id").orderBy(
                        "dd", "neighbor_id"
                    )
                ),
            )
            .filter(F.col("rnk") <= TOP_K)
        )
        exact = (
            dims_p.filter(F.col("vec_id") < N_QUERIES)
            .select(F.col("vec_id").alias("query_id"), "pos", "xi")
            .join(
                dims_p.select(
                    F.col("vec_id").alias("neighbor_id"),
                    "pos",
                    F.col("xi").alias("ci"),
                ),
                "pos",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.sum(
                    (F.col("xi") - F.col("ci")) * (F.col("xi") - F.col("ci"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        wt = Window.partitionBy("query_id").orderBy("dd", "neighbor_id")
        truth = (
            exact.withColumn("rnk", F.row_number().over(wt))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", F.lit(1).alias("is_true"))
        )
        vol = (
            need.crossJoin(F.broadcast(pr))
            .filter(F.col("need_probe") <= F.col("nprobe"))
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        )
        hits = (
            ranked.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("nprobe")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, "nprobe")
            .select(
                F.col("nprobe").cast("bigint").alias("nprobe"),
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_candidates").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("nprobe")
        )


ROUND14_STAGED: dict[str, tuple] = {
    "ivf_adc_refined_joint_recall": (
        ivf_adc_refined_joint_recall,
        _IVF_ADC_2X2_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
    ),
}


# --------------------------------------------------------------------------
# Residual-PQ under refined cells (ROADMAP round-14 "Retrieval"):
# residual_pq_distortion pinned an honest NEGATIVE gain — two-level
# quantization loses to flat PQ on this near-isotropic corpus — but
# its residuals came from the WEAK first-K coarse seeds. One cell-
# Lloyd step shrinks the coarse distortion (ivf_cell_lloyd_probe
# prices it), which shrinks residual variance; this op re-prices the
# residual-vs-flat trade under the REFINED cells and answers the
# queued question directly: does the sign flip? Per subspace: flat-PQ
# error (the unchanged baseline), the toy-seed residual error (the
# original op's column, recomputed in the same pass for a same-query
# diff), the refined-cell residual error, both gains, and the
# sign_flipped flag (toy gain <= 0 < refined gain).
# Exact math: refined centroids are ROUND(mean) on exact integer
# sums, so refined residuals stay grid integers and every distance
# is exact; per-subspace sums go through the module's canonical
# decimal(19,0) before the final double casts.
# Scale posture: residual_pq_distortion's plan plus one extra
# assignment pass and one extra residual branch — dimension-level
# rows, broadcast codebooks, bounded argmin windows.
# --------------------------------------------------------------------------
_RPQ_REFINED_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             ((generate_subscripts(e, 1) - 1) * {_PQ_SUB}) // {_PQ_DIM}
               AS sub,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    seeds AS (
      SELECT vec_id AS k, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS si
      FROM v WHERE vec_id < {KMEANS_K}
    ),
    cdist AS (
      SELECT d.vec_id, se.k,
             CAST(SUM((d.xi - se.si) * (d.xi - se.si)) AS BIGINT) AS dd
      FROM dims d JOIN seeds se ON se.pos = d.pos
      GROUP BY 1, 2
    ),
    cassign AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
        FROM cdist
      ) WHERE rn = 1
    ),
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM cassign a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    cdist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    cassign2 AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
        FROM cdist2
      ) WHERE rn = 1
    ),
    resid AS (
      SELECT d.vec_id, d.pos, d.sub, d.xi - se.si AS ri
      FROM dims d
      JOIN cassign a ON a.vec_id = d.vec_id
      JOIN seeds se ON se.k = a.k AND se.pos = d.pos
    ),
    resid2 AS (
      SELECT d.vec_id, d.pos, d.sub, d.xi - c.si AS ri
      FROM dims d
      JOIN cassign2 a ON a.vec_id = d.vec_id
      JOIN cent c ON c.k = a.k AND c.pos = d.pos
    ),
    rcode AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid WHERE vec_id < {_PQ_K}
    ),
    rcode2 AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid2 WHERE vec_id < {_PQ_K}
    ),
    rdist AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid r JOIN rcode c ON c.pos = r.pos AND c.sub = r.sub
      GROUP BY 1, 2, 3
    ),
    rdist2 AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid2 r JOIN rcode2 c ON c.pos = r.pos AND c.sub = r.sub
      GROUP BY 1, 2, 3
    ),
    rbest AS (
      SELECT vec_id, sub, dd FROM (
        SELECT vec_id, sub, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM rdist
      ) WHERE rn = 1
    ),
    rbest2 AS (
      SELECT vec_id, sub, dd FROM (
        SELECT vec_id, sub, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM rdist2
      ) WHERE rn = 1
    ),
    fcode AS (
      SELECT vec_id AS code, sub, pos, xi AS ci
      FROM dims WHERE vec_id < {_PQ_K}
    ),
    fdist AS (
      SELECT d.vec_id, d.sub, c.code,
             CAST(SUM((d.xi - c.ci) * (d.xi - c.ci)) AS BIGINT) AS dd
      FROM dims d JOIN fcode c ON c.pos = d.pos AND c.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    fbest AS (
      SELECT vec_id, sub, dd FROM (
        SELECT vec_id, sub, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM fdist
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT f.sub,
             COUNT(*) AS n_vecs,
             SUM(f.dd::HUGEINT) AS flat_g,
             SUM(r.dd::HUGEINT) AS res_toy_g,
             SUM(r2.dd::HUGEINT) AS res_lloyd_g
      FROM fbest f
      JOIN rbest r ON r.vec_id = f.vec_id AND r.sub = f.sub
      JOIN rbest2 r2 ON r2.vec_id = f.vec_id AND r2.sub = f.sub
      GROUP BY 1
    )
    SELECT CAST(sub AS BIGINT) AS sub,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           ROUND(CAST(flat_g AS DOUBLE) / 1e12, 4) AS flat_sq_error,
           ROUND(CAST(res_toy_g AS DOUBLE) / 1e12, 4)
             AS resid_toy_sq_error,
           ROUND(CAST(res_lloyd_g AS DOUBLE) / 1e12, 4)
             AS resid_lloyd_sq_error,
           CAST(ROUND((CAST(flat_g AS DOUBLE) - CAST(res_toy_g AS DOUBLE))
                      * 1000000.0 / CAST(flat_g AS DOUBLE)) AS BIGINT)
             AS gain_toy_ppm,
           CAST(ROUND((CAST(flat_g AS DOUBLE)
                       - CAST(res_lloyd_g AS DOUBLE))
                      * 1000000.0 / CAST(flat_g AS DOUBLE)) AS BIGINT)
             AS gain_lloyd_ppm,
           (CAST(ROUND((CAST(flat_g AS DOUBLE)
                        - CAST(res_toy_g AS DOUBLE))
                       * 1000000.0 / CAST(flat_g AS DOUBLE)) AS BIGINT)
              <= 0
            AND CAST(ROUND((CAST(flat_g AS DOUBLE)
                            - CAST(res_lloyd_g AS DOUBLE))
                           * 1000000.0 / CAST(flat_g AS DOUBLE))
                     AS BIGINT) > 0) AS sign_flipped
    FROM agg ORDER BY sub
    """


def residual_pq_refined_cells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Residual-PQ distortion under one-Lloyd-step coarse cells, with
    the toy-seed residual and flat-PQ baselines in the same pass and
    the sign-flip verdict per subspace (see block comment)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    sub_of = ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        sub_of.alias("sub"),
        grid.alias("xi"),
    )
    d19 = "decimal(19,0)"
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        sqd = (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
        cdist = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        wv = Window.partitionBy("vec_id").orderBy("dd", "k")
        cassign = (
            cdist.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("k").alias("ck"))
        )
        cent = (
            cassign.join(dims_p, "vec_id")
            .groupBy(F.col("ck").alias("k"), F.col("pos").alias("s_pos"))
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        cdist2 = (
            dims_p.join(F.broadcast(cent), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        cassign2 = (
            cdist2.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("k").alias("ck"))
        )

        def resid_of(assign_df, cent_df):
            return (
                dims_p.join(assign_df, "vec_id")
                .join(
                    F.broadcast(cent_df),
                    (F.col("s_pos") == F.col("pos"))
                    & (F.col("k") == F.col("ck")),
                )
                .select(
                    "vec_id", "pos", "sub",
                    (F.col("xi") - F.col("si")).alias("ri"),
                )
            )

        def best_of(resid_p):
            rcode = resid_p.filter(F.col("vec_id") < _PQ_K).select(
                F.col("vec_id").alias("code"),
                F.col("sub").alias("c_sub"),
                F.col("pos").alias("c_pos"),
                F.col("ri").alias("ci"),
            )
            rdiff = F.col("ri") - F.col("ci")
            rdist = (
                resid_p.join(
                    F.broadcast(rcode),
                    (F.col("c_pos") == F.col("pos"))
                    & (F.col("c_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dd"))
            )
            ws = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return (
                rdist.withColumn("rn", F.row_number().over(ws))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "dd")
            )

        seeds_c = seeds.select(
            "k", "s_pos", "si"
        )
        with with_persisted(resid_of(cassign, seeds_c)) as resid_toy:
            with with_persisted(resid_of(cassign2, cent)) as resid_ll:
                rbest = best_of(resid_toy).select(
                    "vec_id", "sub", F.col("dd").alias("rdd")
                )
                rbest2 = best_of(resid_ll).select(
                    "vec_id", "sub", F.col("dd").alias("r2dd")
                )
                fcode = dims_p.filter(F.col("vec_id") < _PQ_K).select(
                    F.col("vec_id").alias("code"),
                    F.col("sub").alias("c_sub"),
                    F.col("pos").alias("c_pos"),
                    F.col("xi").alias("ci"),
                )
                fdiff = F.col("xi") - F.col("ci")
                fdist = (
                    dims_p.join(
                        F.broadcast(fcode),
                        (F.col("c_pos") == F.col("pos"))
                        & (F.col("c_sub") == F.col("sub")),
                    )
                    .groupBy("vec_id", "sub", "code")
                    .agg(F.sum(fdiff * fdiff).cast("bigint").alias("dd"))
                )
                wsb = Window.partitionBy("vec_id", "sub").orderBy(
                    "dd", "code"
                )
                fbest = (
                    fdist.withColumn("rn", F.row_number().over(wsb))
                    .filter(F.col("rn") == 1)
                    .select("vec_id", "sub", F.col("dd").alias("fdd"))
                )
                agg = (
                    fbest.join(rbest, ["vec_id", "sub"])
                    .join(rbest2, ["vec_id", "sub"])
                    .groupBy("sub")
                    .agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                        F.sum(F.col("fdd").cast(d19))
                        .cast("double")
                        .alias("flat_g"),
                        F.sum(F.col("rdd").cast(d19))
                        .cast("double")
                        .alias("res_toy_g"),
                        F.sum(F.col("r2dd").cast(d19))
                        .cast("double")
                        .alias("res_lloyd_g"),
                    )
                )
                gain_toy = F.round(
                    (F.col("flat_g") - F.col("res_toy_g"))
                    * 1000000.0
                    / F.col("flat_g")
                ).cast("bigint")
                gain_ll = F.round(
                    (F.col("flat_g") - F.col("res_lloyd_g"))
                    * 1000000.0
                    / F.col("flat_g")
                ).cast("bigint")
                return materialize(
                    agg.select(
                        F.col("sub").cast("bigint").alias("sub"),
                        "n_vecs",
                        F.round(F.col("flat_g") / 1e12, 4).alias(
                            "flat_sq_error"
                        ),
                        F.round(F.col("res_toy_g") / 1e12, 4).alias(
                            "resid_toy_sq_error"
                        ),
                        F.round(F.col("res_lloyd_g") / 1e12, 4).alias(
                            "resid_lloyd_sq_error"
                        ),
                        gain_toy.alias("gain_toy_ppm"),
                        gain_ll.alias("gain_lloyd_ppm"),
                        ((gain_toy <= 0) & (gain_ll > 0)).alias(
                            "sign_flipped"
                        ),
                    ).orderBy("sub")
                )


ROUND14_STAGED["residual_pq_refined_cells"] = (
    residual_pq_refined_cells,
    _RPQ_REFINED_ORACLE,
)


# --------------------------------------------------------------------------
# Residual-ADC end-to-end recall — true IVF-PQ (round-15 queue item,
# pulled forward): residual_pq_refined_cells flipped the DISTORTION
# sign under refined cells; the serving question is whether that win
# survives the ADC funnel. This is the real IVF-PQ layout: refined
# coarse cells, per-vector RESIDUAL codes (x - centroid(cell),
# quantized against the refined-residual codebook drawn from the
# first _PQ_K refined residuals), and ASYMMETRIC distances — the
# query re-centers against each CANDIDATE's cell centroid before the
# table lookup, so the scored geometry matches what a FAISS IVF-PQ
# scan computes. Output schema matches the sweep family
# (ivf_adc_recall / ivf_adc_lloyd_recall /
# ivf_adc_refined_joint_recall) so the codebook story reads as one
# four-row diff per nprobe: toy x toy, toy x lloyd, refined x lloyd,
# refined x residual.
# Exact math: residuals and refined centroids are grid integers
# (ROUND(mean) on exact sums), so every coarse, code-assignment, and
# ADC distance is an exact BIGINT; the two final ratio roundings are
# the only doubles.
# Scale posture: the 2x2 plan plus one residual encode pass; the ADC
# join re-centers per (query, candidate-cell) — still need_probe-
# bounded, with the centroid side a K x dim broadcast.
# --------------------------------------------------------------------------
_RESIDUAL_ADC_ORACLE = f"""
    WITH {{IVF_CTES}},
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    assigned2 AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist2
      ) WHERE rn = 1
    ),
    resid2 AS (
      SELECT d.vec_id, d.pos,
             ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             d.xi - c.si AS ri
      FROM dims d
      JOIN assigned2 a ON a.vec_id = d.vec_id
      JOIN cent c ON c.k = a.k AND c.pos = d.pos
    ),
    rcode2 AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid2 WHERE vec_id < {_PQ_K}
    ),
    rdist2 AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid2 r JOIN rcode2 c ON c.pos = r.pos AND c.sub = r.sub
      GROUP BY 1, 2, 3
    ),
    rassign2 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM rdist2
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rnk
      FROM dist2 WHERE vec_id < {N_QUERIES}
    ),
    need AS (
      SELECT qc.query_id, ac.vec_id AS neighbor_id, ac.k AS n_cell,
             MIN(qc.cell_rnk) AS need_probe
      FROM qcells qc
      JOIN assigned2 ac ON ac.k = qc.k
      WHERE ac.vec_id <> qc.query_id
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT n.query_id, n.neighbor_id, n.need_probe,
             CAST(SUM(((q.xi - ct.si) - cb.ci)
                      * ((q.xi - ct.si) - cb.ci)) AS BIGINT) AS dd
      FROM need n
      JOIN rassign2 a ON a.vec_id = n.neighbor_id
      JOIN rcode2 cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN cent ct ON ct.k = n.n_cell AND ct.pos = cb.pos
      JOIN dims q ON q.vec_id = n.query_id AND q.pos = cb.pos
      WHERE n.need_probe <= {max(_IVF_ADC_PROBES)}
      GROUP BY 1, 2, 3
    ),
    pr(nprobe) AS (VALUES {", ".join(f"({p})" for p in _IVF_ADC_PROBES)}),
    ranked AS (
      SELECT pr.nprobe, a.query_id, a.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY pr.nprobe, a.query_id
                                ORDER BY a.dd, a.neighbor_id) AS rnk
      FROM adc a JOIN pr ON a.need_probe <= pr.nprobe
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM((q.xi - c.xi) * (q.xi - c.xi)) AS BIGINT) AS dd
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_K}
    ),
    vol AS (
      SELECT pr.nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM need n JOIN pr ON n.need_probe <= pr.nprobe
      GROUP BY 1
    ),
    hits AS (
      SELECT r.nprobe,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT CAST(h.nprobe AS BIGINT) AS nprobe,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.nprobe = h.nprobe
    ORDER BY nprobe
    """


def residual_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVF-PQ nprobe sweep: refined coarse cells, residual codes,
    asymmetric query-recentered ADC (see block comment)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        sqd = (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
        cdist0 = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        wc = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned0 = (
            cdist0.withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        cent = (
            assigned0.join(dims_p, "vec_id")
            .groupBy("k", F.col("pos").alias("s_pos"))
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        cdist = (
            dims_p.join(F.broadcast(cent), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        cell_rank = cdist.withColumn("rn", F.row_number().over(wc))
        assigned2 = materialize(
            cell_rank.filter(F.col("rn") == 1).select("vec_id", "k")
        )
        qcells = materialize(
            cell_rank.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                "k",
                F.col("rn").alias("cell_rnk"),
            )
        )
        need = materialize(
            qcells.join(
                assigned2.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("k"),
                ),
                "k",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id", F.col("k").alias("n_cell"))
            .agg(F.min("cell_rnk").alias("need_probe"))
        )
        resid2 = (
            dims_p.join(
                assigned2.select("vec_id", F.col("k").alias("v_cell")),
                "vec_id",
            )
            .join(
                F.broadcast(cent),
                (F.col("s_pos") == F.col("pos"))
                & (F.col("k") == F.col("v_cell")),
            )
            .select(
                "vec_id", "pos", "sub",
                (F.col("xi") - F.col("si")).alias("ri"),
            )
        )
        with with_persisted(resid2) as resid_p:
            rcode2 = resid_p.filter(F.col("vec_id") < _PQ_K).select(
                F.col("vec_id").alias("code"),
                F.col("sub").alias("c_sub"),
                F.col("pos").alias("c_pos"),
                F.col("ri").alias("ci"),
            )
            rdiff = F.col("ri") - F.col("ci")
            rdist2 = (
                resid_p.join(
                    F.broadcast(rcode2),
                    (F.col("c_pos") == F.col("pos"))
                    & (F.col("c_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dd"))
            )
            wp = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            rassign2 = materialize(
                rdist2.withColumn("rn", F.row_number().over(wp))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )
            rmax = max(_IVF_ADC_PROBES)
            adc = (
                need.filter(F.col("need_probe") <= rmax)
                .join(
                    rassign2.select(
                        F.col("vec_id").alias("neighbor_id"), "sub", "code"
                    ),
                    "neighbor_id",
                )
                .join(
                    F.broadcast(
                        rcode2.select(
                            F.col("c_sub").alias("sub"),
                            "code",
                            F.col("c_pos").alias("pos"),
                            "ci",
                        )
                    ),
                    ["sub", "code"],
                )
                .join(
                    F.broadcast(
                        cent.select(
                            F.col("k").alias("n_cell"),
                            F.col("s_pos").alias("pos"),
                            "si",
                        )
                    ),
                    ["n_cell", "pos"],
                )
                .join(
                    dims_p.select(
                        F.col("vec_id").alias("query_id"), "pos", "xi"
                    ),
                    ["query_id", "pos"],
                )
                .groupBy("query_id", "neighbor_id", "need_probe")
                .agg(
                    F.sum(
                        ((F.col("xi") - F.col("si")) - F.col("ci"))
                        * ((F.col("xi") - F.col("si")) - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            pr = spark.createDataFrame(
                [(p,) for p in _IVF_ADC_PROBES], "nprobe long"
            )
            ranked = (
                adc.crossJoin(F.broadcast(pr))
                .filter(F.col("need_probe") <= F.col("nprobe"))
                .withColumn(
                    "rnk",
                    F.row_number().over(
                        Window.partitionBy("nprobe", "query_id").orderBy(
                            "dd", "neighbor_id"
                        )
                    ),
                )
                .filter(F.col("rnk") <= TOP_K)
            )
            exact = (
                dims_p.filter(F.col("vec_id") < N_QUERIES)
                .select(F.col("vec_id").alias("query_id"), "pos", "xi")
                .join(
                    dims_p.select(
                        F.col("vec_id").alias("neighbor_id"),
                        "pos",
                        F.col("xi").alias("ci"),
                    ),
                    "pos",
                )
                .filter(F.col("neighbor_id") != F.col("query_id"))
                .groupBy("query_id", "neighbor_id")
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wt = Window.partitionBy("query_id").orderBy(
                "dd", "neighbor_id"
            )
            truth = (
                exact.withColumn("rnk", F.row_number().over(wt))
                .filter(F.col("rnk") <= TOP_K)
                .select(
                    "query_id", "neighbor_id", F.lit(1).alias("is_true")
                )
            )
            vol = (
                need.crossJoin(F.broadcast(pr))
                .filter(F.col("need_probe") <= F.col("nprobe"))
                .groupBy("nprobe")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_candidates")
                )
            )
            hits = (
                ranked.join(truth, ["query_id", "neighbor_id"], "left")
                .groupBy("nprobe")
                .agg(
                    F.sum(F.coalesce("is_true", F.lit(0)))
                    .cast("bigint")
                    .alias("n_hits")
                )
            )
            return materialize(
                hits.join(vol, "nprobe")
                .select(
                    F.col("nprobe").cast("bigint").alias("nprobe"),
                    F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                    F.round(
                        F.col("n_candidates").cast("double") / N_QUERIES, 6
                    ).alias("mean_candidates"),
                    "n_hits",
                    F.round(
                        F.col("n_hits").cast("double")
                        / (N_QUERIES * TOP_K),
                        6,
                    ).alias("recall_at_5"),
                )
                .orderBy("nprobe")
            )


ROUND14_STAGED["residual_adc_recall"] = (
    residual_adc_recall,
    _RESIDUAL_ADC_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
)


# --------------------------------------------------------------------------
# Residual-code utilization audit (round-15 queue item, pulled
# forward): residual_adc_recall pinned an honest no-gain-on-recall
# despite the distortion flip; the first diagnostic a codebook owner
# reaches for is WHERE the codes collapse. Per (codebook, sub):
# codes actually used, dead codes, and the max single-code share —
# for the FLAT codebook (raw first-K codewords over raw vectors) and
# the REFINED-RESIDUAL codebook (refined-cell residuals quantized
# against refined-residual codewords, residual_adc_recall's encode
# path, bit-identical construction). A residual codebook whose
# assignments concentrate (fewer live codes, fatter max share)
# explains a distortion win that fails to separate NEIGHBORS —
# everything lands in the same few cells of quantized space.
# Exact math: grid-integer assignment distances end to end; the max
# share is the only rounded ratio.
# Scale: two bounded argmin passes over dimension rows (broadcast
# codebooks), two (codebook, sub, code)-keyed rollups.
# --------------------------------------------------------------------------
_RCU_ORACLE = f"""
    WITH {{IVF_CTES}},
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    assigned2 AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist2
      ) WHERE rn = 1
    ),
    resid2 AS (
      SELECT d.vec_id, d.pos,
             ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             d.xi - c.si AS ri
      FROM dims d
      JOIN assigned2 a ON a.vec_id = d.vec_id
      JOIN cent c ON c.k = a.k AND c.pos = d.pos
    ),
    rcode2 AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid2 WHERE vec_id < {_PQ_K}
    ),
    rdist2 AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid2 r JOIN rcode2 c ON c.pos = r.pos AND c.sub = r.sub
      GROUP BY 1, 2, 3
    ),
    fdims AS (
      SELECT vec_id, pos,
             ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub, xi
      FROM dims
    ),
    fcode AS (
      SELECT vec_id AS code, sub, pos, xi AS ci
      FROM fdims WHERE vec_id < {_PQ_K}
    ),
    fdist AS (
      SELECT d.vec_id, d.sub, c.code,
             CAST(SUM((d.xi - c.ci) * (d.xi - c.ci)) AS BIGINT) AS dd
      FROM fdims d JOIN fcode c ON c.pos = d.pos AND c.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    asg AS (
      SELECT 'a_flat' AS codebook, vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM fdist
      ) WHERE rn = 1
      UNION ALL
      SELECT 'b_residual', vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM rdist2
      ) WHERE rn = 1
    ),
    percode AS (
      SELECT codebook, sub, code, CAST(COUNT(*) AS BIGINT) AS n
      FROM asg GROUP BY 1, 2, 3
    )
    SELECT codebook, CAST(sub AS BIGINT) AS sub,
           CAST(SUM(n) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS BIGINT) AS n_codes_used,
           CAST({_PQ_K} - COUNT(*) AS BIGINT) AS n_dead,
           CAST(ROUND(MAX(n) * 1000000.0 / SUM(n)) AS BIGINT)
             AS max_share_ppm
    FROM percode
    GROUP BY 1, 2
    ORDER BY codebook, sub
    """


def residual_code_utilization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Code-usage histogram rollup per (codebook, subspace): live
    codes, dead codes, max single-code share — flat vs refined-
    residual codebooks on identical encode paths (see block
    comment)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        sqd = (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
        cdist0 = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        wc = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned0 = (
            cdist0.withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        cent = (
            assigned0.join(dims_p, "vec_id")
            .groupBy("k", F.col("pos").alias("s_pos"))
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        cdist2 = (
            dims_p.join(F.broadcast(cent), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        assigned2 = (
            cdist2.withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("k").alias("v_cell"))
        )
        resid2 = (
            dims_p.join(assigned2, "vec_id")
            .join(
                F.broadcast(cent),
                (F.col("s_pos") == F.col("pos"))
                & (F.col("k") == F.col("v_cell")),
            )
            .select(
                "vec_id", "pos", "sub",
                (F.col("xi") - F.col("si")).alias("ri"),
            )
        )

        def assign(frame, val):
            code = frame.filter(F.col("vec_id") < _PQ_K).select(
                F.col("vec_id").alias("code"),
                F.col("sub").alias("c_sub"),
                F.col("pos").alias("c_pos"),
                F.col(val).alias("ci"),
            )
            diff = F.col(val) - F.col("ci")
            dist = (
                frame.join(
                    F.broadcast(code),
                    (F.col("c_pos") == F.col("pos"))
                    & (F.col("c_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
            )
            ws = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return (
                dist.withColumn("rn", F.row_number().over(ws))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )

        with with_persisted(resid2) as resid_p:
            asg = assign(dims_p, "xi").select(
                F.lit("a_flat").alias("codebook"), "vec_id", "sub", "code"
            ).unionByName(
                assign(resid_p, "ri").select(
                    F.lit("b_residual").alias("codebook"),
                    "vec_id",
                    "sub",
                    "code",
                )
            )
            percode = asg.groupBy("codebook", "sub", "code").agg(
                F.count(F.lit(1)).cast("bigint").alias("n")
            )
            return materialize(
                percode.groupBy("codebook", "sub")
                .agg(
                    F.sum("n").cast("bigint").alias("n_vecs"),
                    F.count(F.lit(1)).cast("bigint").alias("n_codes_used"),
                    (F.lit(_PQ_K) - F.count(F.lit(1)))
                    .cast("bigint")
                    .alias("n_dead"),
                    F.round(F.max("n") * 1000000.0 / F.sum("n"))
                    .cast("bigint")
                    .alias("max_share_ppm"),
                )
                .select(
                    "codebook",
                    F.col("sub").cast("bigint").alias("sub"),
                    "n_vecs",
                    "n_codes_used",
                    "n_dead",
                    "max_share_ppm",
                )
                .orderBy("codebook", "sub")
            )


ROUND14_STAGED["residual_code_utilization"] = (
    residual_code_utilization,
    _RCU_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
)


# --------------------------------------------------------------------------
# ADC per-query recall tail (round-15 queue item, pulled forward):
# every sweep row reports MEAN recall over the 10 query vectors; a
# serving SLO is set on the TAIL. This table re-runs the two
# refined-cell scorers — b_joint (the 2x2's refined RAW codebook)
# and c_residual (true IVF-PQ residual codes) — over their SHARED
# candidate funnel and reports per (variant, nprobe) the per-query
# hit distribution: min, lower-median (5th smallest of 10), max,
# and the mean as recall ppm. The funnel is computed ONCE (same
# refined cells -> same need sets), so any tail difference is the
# in-cell scorer alone — the column that says whether a codebook
# fixes the worst query or just the average.
# Exact math: grid-integer distances; hit counts are integers; the
# lower median is an exact order statistic (no interpolation); the
# one ppm rounding is the only double.
# Scale posture: the 2x2 plan + the residual encode, sharing one
# need computation; the tail rollup is a (variant, nprobe, query)-
# domain aggregation.
# --------------------------------------------------------------------------
_ART_ORACLE = f"""
    WITH {{IVF_CTES}},
    cent AS (
      SELECT a.k, d.pos,
             CAST(ROUND(SUM(d.xi) * 1.0 / COUNT(*)) AS BIGINT) AS si
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    dist2 AS (
      SELECT d.vec_id, c.k,
             CAST(SUM((d.xi - c.si) * (d.xi - c.si)) AS BIGINT) AS dd
      FROM dims d JOIN cent c ON c.pos = d.pos
      GROUP BY d.vec_id, c.k
    ),
    assigned2 AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist2
      ) WHERE rn = 1
    ),
    qcells AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rnk
      FROM dist2 WHERE vec_id < {N_QUERIES}
    ),
    need AS (
      SELECT qc.query_id, ac.vec_id AS neighbor_id, ac.k AS n_cell,
             MIN(qc.cell_rnk) AS need_probe
      FROM qcells qc
      JOIN assigned2 ac ON ac.k = qc.k
      WHERE ac.vec_id <> qc.query_id
      GROUP BY 1, 2, 3
    ),
    cb0 AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    ),
    pq_dist0 AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN cb0 cb ON cb.pos = d.pos
                 AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned0 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist0
      ) WHERE rn = 1
    ),
    refined AS (
      SELECT a.sub, a.code, d.pos,
             CAST(ROUND(SUM(d.xi) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
               AS ci
      FROM pq_assigned0 a
      JOIN dims d ON d.vec_id = a.vec_id
                 AND ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} = a.sub
      GROUP BY 1, 2, 3
    ),
    codebook AS (
      SELECT c.code, c.sub, c.pos, COALESCE(r.ci, c.ci) AS ci
      FROM cb0 c
      LEFT JOIN refined r ON r.sub = c.sub AND r.code = c.code
                         AND r.pos = c.pos
    ),
    pq_dist AS (
      SELECT d.vec_id, ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN codebook cb ON cb.pos = d.pos
                      AND cb.sub = ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM}
      GROUP BY 1, 2, 3
    ),
    pq_assigned AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM pq_dist
      ) WHERE rn = 1
    ),
    resid2 AS (
      SELECT d.vec_id, d.pos,
             ((d.pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             d.xi - c.si AS ri
      FROM dims d
      JOIN assigned2 a ON a.vec_id = d.vec_id
      JOIN cent c ON c.k = a.k AND c.pos = d.pos
    ),
    rcode2 AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid2 WHERE vec_id < {_PQ_K}
    ),
    rdist2 AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid2 r JOIN rcode2 c ON c.pos = r.pos AND c.sub = r.sub
      GROUP BY 1, 2, 3
    ),
    rassign2 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM rdist2
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT 'b_joint' AS variant, n.query_id, n.neighbor_id,
             n.need_probe,
             CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS dd
      FROM need n
      JOIN pq_assigned a ON a.vec_id = n.neighbor_id
      JOIN codebook cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN dims q ON q.vec_id = n.query_id AND q.pos = cb.pos
      WHERE n.need_probe <= {max(_IVF_ADC_PROBES)}
      GROUP BY 2, 3, 4
      UNION ALL
      SELECT 'c_residual', n.query_id, n.neighbor_id, n.need_probe,
             CAST(SUM(((q.xi - ct.si) - cb.ci)
                      * ((q.xi - ct.si) - cb.ci)) AS BIGINT) AS dd
      FROM need n
      JOIN rassign2 a ON a.vec_id = n.neighbor_id
      JOIN rcode2 cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN cent ct ON ct.k = n.n_cell AND ct.pos = cb.pos
      JOIN dims q ON q.vec_id = n.query_id AND q.pos = cb.pos
      WHERE n.need_probe <= {max(_IVF_ADC_PROBES)}
      GROUP BY 2, 3, 4
    ),
    pr(nprobe) AS (VALUES {", ".join(f"({p})" for p in _IVF_ADC_PROBES)}),
    ranked AS (
      SELECT a.variant, pr.nprobe, a.query_id, a.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY a.variant, pr.nprobe,
                                             a.query_id
                                ORDER BY a.dd, a.neighbor_id) AS rnk
      FROM adc a JOIN pr ON a.need_probe <= pr.nprobe
    ),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM((q.xi - c.xi) * (q.xi - c.xi)) AS BIGINT) AS dd
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dd, neighbor_id) AS rnk
        FROM exact
      ) WHERE rnk <= {TOP_K}
    ),
    qdom AS (SELECT vec_id AS query_id FROM v
             WHERE vec_id < {N_QUERIES}),
    vp(variant) AS (VALUES ('b_joint'), ('c_residual')),
    perq AS (
      SELECT g.variant, g.nprobe, g.query_id,
             COALESCE(h.n_hits, 0) AS n_hits
      FROM (SELECT vp.variant, pr.nprobe, q.query_id
            FROM vp CROSS JOIN pr CROSS JOIN qdom q) g
      LEFT JOIN (
        SELECT r.variant, r.nprobe, r.query_id,
               CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
                 AS n_hits
        FROM ranked r
        LEFT JOIN truth t ON t.query_id = r.query_id
                         AND t.neighbor_id = r.neighbor_id
        WHERE r.rnk <= {TOP_K}
        GROUP BY 1, 2, 3
      ) h ON h.variant = g.variant AND h.nprobe = g.nprobe
         AND h.query_id = g.query_id
    ),
    ordd AS (
      SELECT variant, nprobe, n_hits,
             ROW_NUMBER() OVER (PARTITION BY variant, nprobe
                                ORDER BY n_hits, query_id) AS rn
      FROM perq
    )
    SELECT variant, CAST(nprobe AS BIGINT) AS nprobe,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST(MIN(n_hits) AS BIGINT) AS min_hits,
           CAST(MIN(CASE WHEN rn = {(N_QUERIES + 1) // 2}
                         THEN n_hits END) AS BIGINT) AS p50_hits,
           CAST(MAX(n_hits) AS BIGINT) AS max_hits,
           CAST(ROUND(SUM(n_hits) * 1000000.0
                      / ({N_QUERIES} * {TOP_K})) AS BIGINT)
             AS recall_ppm
    FROM ordd
    GROUP BY 1, 2
    ORDER BY variant, nprobe
    """


def adc_recall_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query hit distribution (min / lower-median / max / mean
    ppm) per (variant, nprobe) for the two refined-cell ADC scorers
    over their shared candidate funnel (see block comment)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select(
        "vec_id",
        ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("sub"),
        (F.col("pos0") + 1).alias("pos"),
        grid.alias("xi"),
    )
    with with_persisted(dims) as dims_p:
        seeds = dims_p.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("k"),
            F.col("pos").alias("s_pos"),
            F.col("xi").alias("si"),
        )
        sqd = (F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si"))
        cdist0 = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        wc = Window.partitionBy("vec_id").orderBy("dd", "k")
        assigned0 = (
            cdist0.withColumn("rn", F.row_number().over(wc))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k")
        )
        cent = (
            assigned0.join(dims_p, "vec_id")
            .groupBy("k", F.col("pos").alias("s_pos"))
            .agg(
                F.round(F.sum("xi") * 1.0 / F.count(F.lit(1)))
                .cast("bigint")
                .alias("si")
            )
        )
        cdist = (
            dims_p.join(F.broadcast(cent), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(sqd).cast("bigint").alias("dd"))
        )
        cell_rank = cdist.withColumn("rn", F.row_number().over(wc))
        assigned2 = materialize(
            cell_rank.filter(F.col("rn") == 1).select("vec_id", "k")
        )
        qcells = materialize(
            cell_rank.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                "k",
                F.col("rn").alias("cell_rnk"),
            )
        )
        need = materialize(
            qcells.join(
                assigned2.select(
                    F.col("vec_id").alias("neighbor_id"), F.col("k")
                ),
                "k",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id", F.col("k").alias("n_cell"))
            .agg(F.min("cell_rnk").alias("need_probe"))
        )
        # refined RAW codebook (the 2x2's scorer)
        cb0 = (
            e.filter(F.col("vec_id") < _PQ_K)
            .select(
                F.col("vec_id").alias("cb_code"),
                F.posexplode(
                    F.transform("embedding", lambda x: x.cast("double"))
                ).alias("pos0", "x"),
            )
            .select(
                "cb_code",
                ((F.col("pos0") * _PQ_SUB) / _PQ_DIM)
                .cast("long")
                .alias("cb_sub"),
                (F.col("pos0") + 1).alias("cb_pos"),
                grid.alias("ci"),
            )
        )

        def pq_assign(cbf):
            dist0 = (
                dims_p.join(
                    F.broadcast(cbf),
                    (F.col("cb_pos") == F.col("pos"))
                    & (F.col("cb_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", F.col("cb_code").alias("code"))
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wp = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
            return materialize(
                dist0.withColumn("rn", F.row_number().over(wp))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )

        a0 = pq_assign(cb0)
        refined = (
            a0.select(
                F.col("vec_id").alias("a_vid"),
                F.col("sub").alias("a_sub"),
                "code",
            )
            .join(
                dims_p,
                (F.col("a_vid") == F.col("vec_id"))
                & (F.col("a_sub") == F.col("sub")),
            )
            .groupBy(
                F.col("a_sub").alias("cb_sub"),
                F.col("code").alias("cb_code"),
                F.col("pos").alias("cb_pos"),
            )
            .agg(
                F.round(F.sum("xi") / F.count(F.lit(1)).cast("double"))
                .cast("bigint")
                .alias("r_ci")
            )
        )
        codebook = cb0.join(
            refined, ["cb_sub", "cb_code", "cb_pos"], "left"
        ).select(
            "cb_code", "cb_sub", "cb_pos",
            F.coalesce("r_ci", "ci").alias("ci"),
        )
        pq_assigned = pq_assign(codebook)
        # residual codebook (true IVF-PQ scorer)
        resid2 = (
            dims_p.join(
                assigned2.select("vec_id", F.col("k").alias("v_cell")),
                "vec_id",
            )
            .join(
                F.broadcast(cent),
                (F.col("s_pos") == F.col("pos"))
                & (F.col("k") == F.col("v_cell")),
            )
            .select(
                "vec_id", "pos", "sub",
                (F.col("xi") - F.col("si")).alias("ri"),
            )
        )
        with with_persisted(resid2) as resid_p:
            rcode2 = resid_p.filter(F.col("vec_id") < _PQ_K).select(
                F.col("vec_id").alias("code"),
                F.col("sub").alias("c_sub"),
                F.col("pos").alias("c_pos"),
                F.col("ri").alias("ci"),
            )
            rdiff = F.col("ri") - F.col("ci")
            rdist2 = (
                resid_p.join(
                    F.broadcast(rcode2),
                    (F.col("c_pos") == F.col("pos"))
                    & (F.col("c_sub") == F.col("sub")),
                )
                .groupBy("vec_id", "sub", "code")
                .agg(F.sum(rdiff * rdiff).cast("bigint").alias("dd"))
            )
            wp2 = Window.partitionBy("vec_id", "sub").orderBy(
                "dd", "code"
            )
            rassign2 = materialize(
                rdist2.withColumn("rn", F.row_number().over(wp2))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", "code")
            )
            rmax = max(_IVF_ADC_PROBES)
            nf = need.filter(F.col("need_probe") <= rmax)
            adc_raw = (
                nf.join(
                    pq_assigned.select(
                        F.col("vec_id").alias("neighbor_id"), "sub", "code"
                    ),
                    "neighbor_id",
                )
                .join(
                    F.broadcast(
                        codebook.select(
                            F.col("cb_sub").alias("sub"),
                            F.col("cb_code").alias("code"),
                            F.col("cb_pos").alias("pos"),
                            "ci",
                        )
                    ),
                    ["sub", "code"],
                )
                .join(
                    dims_p.select(
                        F.col("vec_id").alias("query_id"), "pos", "xi"
                    ),
                    ["query_id", "pos"],
                )
                .groupBy("query_id", "neighbor_id", "need_probe")
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
                .select(
                    F.lit("b_joint").alias("variant"),
                    "query_id",
                    "neighbor_id",
                    "need_probe",
                    "dd",
                )
            )
            adc_res = (
                nf.join(
                    rassign2.select(
                        F.col("vec_id").alias("neighbor_id"), "sub", "code"
                    ),
                    "neighbor_id",
                )
                .join(
                    F.broadcast(
                        rcode2.select(
                            F.col("c_sub").alias("sub"),
                            "code",
                            F.col("c_pos").alias("pos"),
                            "ci",
                        )
                    ),
                    ["sub", "code"],
                )
                .join(
                    F.broadcast(
                        cent.select(
                            F.col("k").alias("n_cell"),
                            F.col("s_pos").alias("pos"),
                            "si",
                        )
                    ),
                    ["n_cell", "pos"],
                )
                .join(
                    dims_p.select(
                        F.col("vec_id").alias("query_id"), "pos", "xi"
                    ),
                    ["query_id", "pos"],
                )
                .groupBy("query_id", "neighbor_id", "need_probe")
                .agg(
                    F.sum(
                        ((F.col("xi") - F.col("si")) - F.col("ci"))
                        * ((F.col("xi") - F.col("si")) - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
                .select(
                    F.lit("c_residual").alias("variant"),
                    "query_id",
                    "neighbor_id",
                    "need_probe",
                    "dd",
                )
            )
            adc = adc_raw.unionByName(adc_res)
            pr = spark.createDataFrame(
                [(p,) for p in _IVF_ADC_PROBES], "nprobe long"
            )
            ranked = (
                adc.crossJoin(F.broadcast(pr))
                .filter(F.col("need_probe") <= F.col("nprobe"))
                .withColumn(
                    "rnk",
                    F.row_number().over(
                        Window.partitionBy(
                            "variant", "nprobe", "query_id"
                        ).orderBy("dd", "neighbor_id")
                    ),
                )
                .filter(F.col("rnk") <= TOP_K)
            )
            exact = (
                dims_p.filter(F.col("vec_id") < N_QUERIES)
                .select(F.col("vec_id").alias("query_id"), "pos", "xi")
                .join(
                    dims_p.select(
                        F.col("vec_id").alias("neighbor_id"),
                        "pos",
                        F.col("xi").alias("ci"),
                    ),
                    "pos",
                )
                .filter(F.col("neighbor_id") != F.col("query_id"))
                .groupBy("query_id", "neighbor_id")
                .agg(
                    F.sum(
                        (F.col("xi") - F.col("ci"))
                        * (F.col("xi") - F.col("ci"))
                    )
                    .cast("bigint")
                    .alias("dd")
                )
            )
            wt = Window.partitionBy("query_id").orderBy(
                "dd", "neighbor_id"
            )
            truth = (
                exact.withColumn("rnk", F.row_number().over(wt))
                .filter(F.col("rnk") <= TOP_K)
                .select(
                    "query_id", "neighbor_id", F.lit(1).alias("is_true")
                )
            )
            qdom = e.filter(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id")
            )
            vp = spark.createDataFrame(
                [("b_joint",), ("c_residual",)], "variant string"
            )
            hcounts = (
                ranked.join(truth, ["query_id", "neighbor_id"], "left")
                .groupBy("variant", "nprobe", "query_id")
                .agg(
                    F.sum(F.coalesce("is_true", F.lit(0)))
                    .cast("bigint")
                    .alias("n_hits")
                )
            )
            perq = (
                vp.crossJoin(F.broadcast(pr))
                .crossJoin(qdom)
                .join(hcounts, ["variant", "nprobe", "query_id"], "left")
                .select(
                    "variant",
                    "nprobe",
                    "query_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                )
            )
            wo = Window.partitionBy("variant", "nprobe").orderBy(
                "n_hits", "query_id"
            )
            ordd = perq.withColumn("rn", F.row_number().over(wo))
            p50_rn = (N_QUERIES + 1) // 2
            return materialize(
                ordd.groupBy("variant", "nprobe")
                .agg(
                    F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                    F.min("n_hits").cast("bigint").alias("min_hits"),
                    F.min(
                        F.when(F.col("rn") == p50_rn, F.col("n_hits"))
                    )
                    .cast("bigint")
                    .alias("p50_hits"),
                    F.max("n_hits").cast("bigint").alias("max_hits"),
                    F.round(
                        F.sum("n_hits") * 1000000.0 / (N_QUERIES * TOP_K)
                    )
                    .cast("bigint")
                    .alias("recall_ppm"),
                )
                .select(
                    "variant",
                    F.col("nprobe").cast("bigint").alias("nprobe"),
                    "n_queries",
                    "min_hits",
                    "p50_hits",
                    "max_hits",
                    "recall_ppm",
                )
                .orderBy("variant", "nprobe")
            )


ROUND14_STAGED["adc_recall_tail"] = (
    adc_recall_tail,
    _ART_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
)
