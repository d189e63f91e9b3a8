"""Model-evaluation operators — composed on top of other registered
operators, so this module must load LAST (it reads their ORACLES
entries to build composed differential oracles).

* classifier_eval_metrics — confusion counts + precision / recall /
  F1 / accuracy of the learned quality classifier
  (`quality_classifier_score`, prediction = keep) against the
  heuristic rule labels (`quality_filter` membership = truth): the
  eval loop every filtered-corpus pipeline runs before swapping a
  heuristic for a model. The join is on doc_id; the metric rollup is
  a single 1-row agg — at 100 TB this costs one pass over the scored
  corpus plus the broadcast of the (much smaller) label set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# composed oracles read entries owned by these modules — import them
# explicitly so evaluation is importable STANDALONE (load_all()'s
# import-last ordering still works, but is no longer load-bearing)
from bigdataentrytask_spark.operators import (  # noqa: F401
    curation,
    dedup,
    text_analysis,
)
from bigdataentrytask_spark.operators import ORACLES, REGISTRY, operator


def _register() -> None:
    oracle = f"""
    WITH qc AS ({ORACLES["quality_classifier_score"]}),
    qf AS ({ORACLES["quality_filter"]}),
    joined AS (
      SELECT qc.doc_id, qc.keep AS pred,
             qf.doc_id IS NOT NULL AS truth
      FROM qc LEFT JOIN qf ON qf.doc_id = qc.doc_id
    ),
    cm AS (
      SELECT COUNT(CASE WHEN pred AND truth THEN 1 END)         AS tp,
             COUNT(CASE WHEN pred AND NOT truth THEN 1 END)     AS fp,
             COUNT(CASE WHEN NOT pred AND truth THEN 1 END)     AS fn,
             COUNT(CASE WHEN NOT pred AND NOT truth THEN 1 END) AS tn
      FROM joined
    )
    SELECT tp, fp, fn, tn,
           ROUND(tp / CAST(GREATEST(tp + fp, 1) AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(GREATEST(tp + fn, 1) AS DOUBLE), 6) AS recall,
           ROUND(2.0 * tp / CAST(GREATEST(2 * tp + fp + fn, 1) AS DOUBLE), 6)
                                                               AS f1,
           ROUND((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
                                                               AS accuracy
    FROM cm
    """

    @operator("classifier_eval_metrics", oracle=oracle)
    def classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
        pred = REGISTRY["quality_classifier_score"](spark, sf_dir).select(
            "doc_id", F.col("keep").alias("pred")
        )
        truth = (
            REGISTRY["quality_filter"](spark, sf_dir)
            .select("doc_id")
            .withColumn("truth", F.lit(True))
        )
        joined = pred.join(F.broadcast(truth), "doc_id", "left").select(
            "pred", F.coalesce("truth", F.lit(False)).alias("truth")
        )
        tp = F.count(F.when(F.col("pred") & F.col("truth"), 1))
        fp = F.count(F.when(F.col("pred") & ~F.col("truth"), 1))
        fn = F.count(F.when(~F.col("pred") & F.col("truth"), 1))
        tn = F.count(F.when(~F.col("pred") & ~F.col("truth"), 1))
        cm = joined.agg(
            tp.alias("tp"), fp.alias("fp"), fn.alias("fn"), tn.alias("tn")
        )
        g = lambda c: F.greatest(c, F.lit(1)).cast("double")  # noqa: E731
        return cm.select(
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(F.col("tp") / g(F.col("tp") + F.col("fp")), 6).alias(
                "precision"
            ),
            F.round(F.col("tp") / g(F.col("tp") + F.col("fn")), 6).alias(
                "recall"
            ),
            F.round(
                2.0 * F.col("tp")
                / g(2 * F.col("tp") + F.col("fp") + F.col("fn")),
                6,
            ).alias("f1"),
            F.round(
                (F.col("tp") + F.col("tn"))
                / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast(
                    "double"
                ),
                6,
            ).alias("accuracy"),
        )


_register()


# --------------------------------------------------------------------------
# Survivorship after entity resolution (the MDM "golden record" step):
# for each duplicate cluster from `dedup_resolve`, merge the members'
# metadata onto the canonical survivor — member count, total chars,
# distinct sources, and the id range absorbed. Composes the resolve
# operator (and its recursive-CTE oracle) verbatim; the merge itself
# is one join on doc_id + one agg on the component key.
# --------------------------------------------------------------------------
def _register_survivorship() -> None:
    oracle = f"""
    WITH resolved AS ({ORACLES["dedup_resolve"]}),
    enriched AS (
      SELECT r.component, r.doc_id, d.n_chars, d.source
      FROM resolved r JOIN documents d ON d.doc_id = r.doc_id
    )
    SELECT component AS survivor_doc,
           COUNT(*) AS n_members,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources,
           MAX(doc_id) AS max_member_doc
    FROM enriched
    GROUP BY component
    HAVING COUNT(*) > 1
    ORDER BY survivor_doc
    """

    @operator("dedup_survivorship", oracle=oracle)
    def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bigdataentrytask_spark.catalog import load_table

        resolved = REGISTRY["dedup_resolve"](spark, sf_dir).select(
            "doc_id", "component"
        )
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars", "source"
        )
        return (
            resolved.join(docs, "doc_id")
            .groupBy(F.col("component").alias("survivor_doc"))
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.count_distinct("source").alias("n_sources"),
                F.max("doc_id").alias("max_member_doc"),
            )
            .filter(F.col("n_members") > 1)
            .orderBy("survivor_doc")
        )


_register_survivorship()


# --------------------------------------------------------------------------
# Cross-modal association: Cramér's V between a document's source and
# its embedding's cluster label (doc_id = vec_id) — "does the text
# provenance predict the embedding cluster?". Contingency chi-square
# over a (|sources| x |labels|) table — the heavy work is ONE grouped
# count over the join; everything after runs on the tiny cell table.
# The verdict (V ~ 0 on this synthetic corpus) is part of the
# contract: label and source are independent by construction.
# --------------------------------------------------------------------------
def _register_cramers_v() -> None:
    oracle = """
    WITH joined AS (
      SELECT d.source, e.label
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    cells AS (
      SELECT source, label, COUNT(*) AS obs FROM joined GROUP BY 1, 2
    ),
    rt AS (SELECT source, SUM(obs) AS r_tot FROM cells GROUP BY source),
    ct AS (SELECT label, SUM(obs) AS c_tot FROM cells GROUP BY label),
    n AS (SELECT SUM(obs) AS n FROM cells),
    chi AS (
      SELECT SUM((cells.obs - rt.r_tot * ct.c_tot / CAST(n.n AS DOUBLE))
                 * (cells.obs - rt.r_tot * ct.c_tot / CAST(n.n AS DOUBLE))
                 / (rt.r_tot * ct.c_tot / CAST(n.n AS DOUBLE))) AS chi2
      FROM cells
      JOIN rt ON rt.source = cells.source
      JOIN ct ON ct.label = cells.label
      CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n_pairs,
           (SELECT COUNT(*) FROM rt) AS n_sources,
           (SELECT COUNT(*) FROM ct) AS n_labels,
           ROUND(chi.chi2, 4) AS chi2,
           ROUND(sqrt(chi.chi2 / (n.n * LEAST(
             (SELECT COUNT(*) FROM rt) - 1,
             (SELECT COUNT(*) FROM ct) - 1))), 6) AS cramers_v
    FROM chi CROSS JOIN n
    """

    @operator("source_label_cramers_v", oracle=oracle)
    def source_label_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bigdataentrytask_spark.catalog import load_table

        d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        e = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "label"
        )
        cells = (
            d.join(e, "doc_id")
            .groupBy("source", "label")
            .agg(F.count(F.lit(1)).alias("obs"))
        )
        rt = cells.groupBy("source").agg(F.sum("obs").alias("r_tot"))
        ct = cells.groupBy("label").agg(F.sum("obs").alias("c_tot"))
        n = cells.agg(F.sum("obs").alias("n"))
        exp = F.col("r_tot") * F.col("c_tot") / F.col("n").cast("double")
        chi = (
            cells.join(F.broadcast(rt), "source")
            .join(F.broadcast(ct), "label")
            .crossJoin(F.broadcast(n))
            .agg(
                F.sum(
                    (F.col("obs") - exp) * (F.col("obs") - exp) / exp
                ).alias("chi2"),
                F.max("n").alias("n_pairs"),
                F.count_distinct("source").alias("n_sources"),
                F.count_distinct("label").alias("n_labels"),
            )
        )
        return chi.select(
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            "n_sources",
            "n_labels",
            F.round("chi2", 4).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n_pairs")
                        * F.least(
                            F.col("n_sources") - 1, F.col("n_labels") - 1
                        )
                    )
                ),
                6,
            ).alias("cramers_v"),
        )


_register_cramers_v()


def _register_calibration_bins() -> None:
    oracle = f"""
    WITH qc AS ({ORACLES["quality_classifier_score"]}),
    qf AS ({ORACLES["quality_filter"]}),
    joined AS (
      -- scores snap onto the 1e6 grid so the per-bin mean is an exact
      -- integer sum divided once (order-free; round-8 hardening).
      -- y is 0/1 so its mean is exact by construction.
      SELECT LEAST(CAST(FLOOR(qc.score * 10) AS BIGINT), 9) AS bin,
             CAST(ROUND(qc.score * 1000000) AS BIGINT) AS score_g,
             CASE WHEN qf.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y
      FROM qc LEFT JOIN qf ON qf.doc_id = qc.doc_id
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT)        AS n,
           ROUND(SUM(score_g) / (COUNT(*) * 1000000.0), 6) AS avg_score,
           CAST(SUM(y) AS BIGINT)          AS n_pos,
           ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate,
           ROUND(ABS(SUM(score_g) / (COUNT(*) * 1000000.0)
                     - SUM(y) / CAST(COUNT(*) AS DOUBLE)), 6) AS gap
    FROM joined GROUP BY 1 ORDER BY bin
    """

    @operator("calibration_bins", oracle=oracle)
    def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Reliability diagram of the quality classifier: scores in 10
        equal-width bins, per-bin mean confidence vs realized positive
        rate (truth = heuristic `quality_filter` membership); the gap
        column is each bin's contribution shape of expected
        calibration error. Composes the two registered plans — one
        broadcast join, 10-row output."""
        pred = REGISTRY["quality_classifier_score"](spark, sf_dir).select(
            "doc_id", "score"
        )
        truth = (
            REGISTRY["quality_filter"](spark, sf_dir)
            .select("doc_id")
            .withColumn("y", F.lit(1))
        )
        # snapped scores -> exact integer sums (order-free means)
        joined = pred.join(F.broadcast(truth), "doc_id", "left").select(
            F.least(
                F.floor(F.col("score") * 10).cast("bigint"), F.lit(9)
            ).alias("bin"),
            F.round(F.col("score") * 1000000).cast("bigint").alias("score_g"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
        cnt = F.count(F.lit(1))
        mean_s = F.sum("score_g") / (cnt * 1000000.0)
        mean_y = F.sum("y") / cnt.cast("double")
        return (
            joined.groupBy("bin")
            .agg(
                cnt.alias("n"),
                F.round(mean_s, 6).alias("avg_score"),
                F.sum("y").cast("bigint").alias("n_pos"),
                F.round(mean_y, 6).alias("pos_rate"),
                F.round(F.abs(mean_s - mean_y), 6).alias("gap"),
            )
            .orderBy("bin")
        )


_register_calibration_bins()


def _register_score_decile_lift() -> None:
    """Decile lift table of the quality classifier (round 7): rank
    docs by score into 10 equal bins (deterministic tie-break on
    doc_id), report per-bin positive rate vs the global rate (lift)
    and the cumulative capture curve — the selection-oriented twin of
    `calibration_bins` (which asks "are the probabilities honest";
    this asks "how much quality does the top decile buy"). Truth is
    `quality_filter` membership, same as classifier_eval_metrics.

    Scale: the decile split is the only global sort, and it runs on
    the (doc_id, score, truth) projection, not the corpus; at 100 TB
    the same table comes from an approx-quantile cut of the score
    column instead of NTILE — documented trade, identical schema."""
    oracle = f"""
    WITH qc AS ({ORACLES["quality_classifier_score"]}),
    qf AS ({ORACLES["quality_filter"]}),
    scored AS (
      SELECT qc.doc_id, qc.score,
             qf.doc_id IS NOT NULL AS truth,
             NTILE(10) OVER (ORDER BY qc.score DESC, qc.doc_id) AS decile
      FROM qc LEFT JOIN qf ON qf.doc_id = qc.doc_id
    ),
    bins AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT)           AS n_docs,
             CAST(count_if(truth) AS BIGINT)    AS n_pos
      FROM scored GROUP BY decile
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all,
             CAST(SUM(n_pos) AS BIGINT)  AS pos_all
      FROM bins
    )
    SELECT b.decile, b.n_docs, b.n_pos,
           ROUND(b.n_pos / CAST(b.n_docs AS DOUBLE), 6)          AS pos_rate,
           ROUND((b.n_pos / CAST(b.n_docs AS DOUBLE))
                 / (t.pos_all / CAST(t.n_all AS DOUBLE)), 6)     AS lift,
           ROUND(SUM(b.n_pos) OVER (ORDER BY b.decile)
                 / CAST(t.pos_all AS DOUBLE), 6)                 AS cum_capture
    FROM bins b CROSS JOIN tot t
    ORDER BY b.decile
    """

    @operator("score_decile_lift", oracle=oracle)
    def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        pred = REGISTRY["quality_classifier_score"](spark, sf_dir).select(
            "doc_id", "score"
        )
        truth = (
            REGISTRY["quality_filter"](spark, sf_dir)
            .select("doc_id")
            .withColumn("truth", F.lit(True))
        )
        scored = (
            pred.join(F.broadcast(truth), "doc_id", "left")
            .select(
                "doc_id",
                "score",
                F.coalesce("truth", F.lit(False)).alias("truth"),
            )
            .withColumn(
                "decile",
                F.ntile(10).over(
                    Window.orderBy(F.col("score").desc(), F.col("doc_id"))
                ),
            )
        )
        bins = scored.groupBy("decile").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("truth"), 1)).alias("n_pos"),
        )
        w_tot = Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        w_cum = Window.orderBy("decile")
        return (
            bins.select(
                "decile",
                "n_docs",
                "n_pos",
                F.sum("n_docs").over(w_tot).alias("n_all"),
                F.sum("n_pos").over(w_tot).alias("pos_all"),
                F.sum("n_pos").over(w_cum).alias("cum_pos"),
            )
            .select(
                "decile",
                "n_docs",
                "n_pos",
                F.round(
                    F.col("n_pos") / F.col("n_docs").cast("double"), 6
                ).alias("pos_rate"),
                F.round(
                    (F.col("n_pos") / F.col("n_docs").cast("double"))
                    / (F.col("pos_all") / F.col("n_all").cast("double")),
                    6,
                ).alias("lift"),
                F.round(
                    F.col("cum_pos") / F.col("pos_all").cast("double"), 6
                ).alias("cum_capture"),
            )
            .orderBy("decile")
        )


_register_score_decile_lift()


def _register_dedup_cluster_cohesion() -> None:
    """Cohesion audit of the MinHash dedup output (round-8 slate):
    for every resolved near-dup cluster of size >= 2, the exact
    pairwise Jaccard over distinct token sets, rolled up by cluster
    size — LOW cohesion means the LSH banding is merging docs the
    exact measure would keep apart (the precision failure mode
    minhash_precision_eval quantifies at the PAIR level; this is the
    CLUSTER-level view after transitive closure, where one bad edge
    can glue two good clusters).

    Scale: intra-cluster pairs only — near-dup clusters are small by
    construction (a giant cluster is itself the pathology this op
    exists to flag), so the pair expansion is bounded by the cluster
    size distribution (`dedup_cluster_sizes`), never corpus-quadratic."""
    from bigdataentrytask_spark.functions.text import sql_tokens, tokens

    oracle = f"""
    WITH comp AS (
      SELECT doc_id, component FROM ({ORACLES["dedup_resolve"]})
    ),
    csize AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS csz
      FROM comp GROUP BY component HAVING COUNT(*) >= 2
    ),
    arrs AS (
      SELECT doc_id, list_distinct({sql_tokens('text')}) AS toks
      FROM documents
    ),
    ipairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, s.csz
      FROM comp a
      JOIN comp b ON a.component = b.component AND a.doc_id < b.doc_id
      JOIN csize s ON s.component = a.component
    ),
    jac AS (
      SELECT p.csz,
             len(list_filter(ta.toks, t -> list_contains(tb.toks, t)))
             / CAST(len(ta.toks) + len(tb.toks)
                    - len(list_filter(ta.toks, t -> list_contains(tb.toks, t)))
                    AS DOUBLE) AS j
      FROM ipairs p
      JOIN arrs ta ON ta.doc_id = p.da
      JOIN arrs tb ON tb.doc_id = p.db
    )
    SELECT csz AS cluster_size,
           CAST(COUNT(*) AS BIGINT)  AS n_pairs,
           ROUND(SUM(j) / COUNT(*), 6) AS avg_jaccard,
           ROUND(MIN(j), 6)            AS min_jaccard
    FROM jac GROUP BY csz ORDER BY cluster_size
    """

    @operator("dedup_cluster_cohesion", oracle=oracle)
    def dedup_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bigdataentrytask_spark.catalog import load_table
        from bigdataentrytask_spark.operators import materialize, with_persisted

        # the resolved component table feeds THREE consumers (csize +
        # both pair sides); persisting it runs the MinHash resolve
        # (banding + iterative CC) ONCE instead of three times, and
        # the blocks are released before returning the bounded
        # cluster-size rollup
        comp = REGISTRY["dedup_resolve"](spark, sf_dir).select(
            "doc_id", "component"
        )
        with with_persisted(comp):
            csize = (
                comp.groupBy("component")
                .agg(F.count(F.lit(1)).alias("csz"))
                .filter(F.col("csz") >= 2)
            )
            arrs = load_table(spark, sf_dir, "documents").select(
                "doc_id", F.array_distinct(tokens("text")).alias("toks")
            )
            a = comp.select(
                F.col("doc_id").alias("da"), F.col("component").alias("component")
            )
            b = comp.select(
                F.col("doc_id").alias("db"), F.col("component").alias("component")
            )
            ipairs = (
                a.join(b, "component")
                .filter(F.col("da") < F.col("db"))
                .join(csize, "component")
                .select("da", "db", "csz")
            )
            jac = (
                ipairs.join(
                    arrs.select(
                        F.col("doc_id").alias("da"), F.col("toks").alias("ta")
                    ),
                    "da",
                )
                .join(
                    arrs.select(
                        F.col("doc_id").alias("db"), F.col("toks").alias("tb")
                    ),
                    "db",
                )
                .withColumn("i", F.size(F.array_intersect("ta", "tb")))
                .withColumn(
                    "j",
                    F.col("i")
                    / (F.size("ta") + F.size("tb") - F.col("i")).cast("double"),
                )
            )
            return materialize(
                jac.groupBy(F.col("csz").alias("cluster_size"))
                .agg(
                    F.count(F.lit(1)).alias("n_pairs"),
                    F.round(F.sum("j") / F.count(F.lit(1)), 6).alias("avg_jaccard"),
                    F.round(F.min("j"), 6).alias("min_jaccard"),
                )
                .orderBy("cluster_size")
            )


_register_dedup_cluster_cohesion()
