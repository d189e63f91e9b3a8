"""Graph operators over the basket co-occurrence graph (nodes =
parts, an edge when two parts share an order, weight = co-order
count) — the relational-native graph layer a warehouse team runs
without a dedicated graph engine. Completes the family started by
`pagerank_step` (operators/warehouse.py): degree profile, triangle
census, and one label-propagation round.

Reference lineage: the reference has no graph surface at all (its
spec stops at keyed aggregates, /root/reference/doc/temp.md:377-411);
this layer exists for the LLM-curation side — co-occurrence graphs
over documents/entities use the identical plans.

Scale posture (100 TB):
* The edge build is the bounded basket expansion proven by
  `basket_part_pairs`: per-order item sets (one fact-scale shuffle),
  in-JVM pair explode with blowup <= basket size squared (TPC-H
  baskets <= 7 -> <= 21 undirected pairs/order). Never a fact x fact
  self-join.
* `part_pair_triangles` joins the edge list to itself twice on node
  keys; cost is wedge-bound (SUM(deg^2)), which the operator reports
  alongside. MEASURED on the 8x-wide-basket stress (~64x wedges):
  both the id-oriented join AND a degree-ordered compact-forward
  rewrite exceed 9.5 min — on a near-regular graph the wedge volume
  IS the wall (orientation only helps under degree skew; the degree
  histogram says which regime applies). The production dial for
  dense co-occurrence graphs is sparsification first:
  `part_pair_triangles_support` counts on the w >= 2 backbone and
  finishes the same stress in 332s (vs DNF).
* `label_propagation_step` is one grouped argmax per node over its
  neighbor multiset — the iterated form ping-pongs labels through
  parquet exactly like `dedup.resolve_components`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs

_SQL_EDGES = """
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d, CAST(COUNT(*) AS BIGINT) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-order edges (s < d, weight = co-order count) via
    the bounded in-JVM basket expansion (cites basket_part_pairs)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = (
        li.distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda p: F.transform(
                        F.filter("parts", lambda q: q > p),
                        lambda q: F.struct(p.alias("s"), q.alias("d")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.s", "e.d")
    return pairs.groupBy("s", "d").agg(F.count(F.lit(1)).alias("w"))


@operator(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_SQL_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM edges
            UNION ALL SELECT d FROM edges)
      GROUP BY 1
    )
    SELECT CAST(FLOOR(log2(degree)) AS BIGINT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT)            AS n_nodes,
           CAST(MIN(degree) AS BIGINT)         AS min_degree,
           CAST(MAX(degree) AS BIGINT)         AS max_degree,
           CAST(SUM(degree) AS BIGINT)         AS sum_degree
    FROM deg GROUP BY 1 ORDER BY degree_bucket
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the co-order graph — the
    first skew diagnostic before any graph algorithm (a heavy bucket
    at the top predicts wedge explosion in triangle/LP steps)."""
    e = _edges(spark, sf_dir)
    deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy(
            F.floor(F.log2("degree")).cast("bigint").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
            F.sum("degree").cast("bigint").alias("sum_degree"),
        )
        .orderBy("degree_bucket")
    )


@operator(
    "part_pair_triangles",
    oracle=f"""
    WITH {_SQL_EDGES},
    tri AS (
      SELECT COUNT(*) AS triangles
      FROM edges e1
      JOIN edges e2 ON e2.s = e1.d
      JOIN edges e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT s AS node FROM edges UNION ALL SELECT d FROM edges)
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT)  AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT)    AS n_nodes,
           CAST((SELECT SUM(degree * (degree - 1) / 2) FROM deg) AS BIGINT)
                                                         AS n_wedges,
           CAST((SELECT triangles FROM tri) AS BIGINT)   AS n_triangles,
           ROUND((SELECT triangles FROM tri) * 3.0
                 / (SELECT SUM(degree * (degree - 1) / 2) FROM deg), 6)
                                                         AS clustering_coeff
    FROM (SELECT 1)
    """,
)
def part_pair_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient. Edges are
    oriented (s < d), so each triangle is counted exactly once by the
    two-hop join; wedge count = SUM(deg·(deg−1)/2) comes from the
    degree table, no join. 3·triangles / wedges is the standard
    transitivity ratio — exact integers up to the final division.

    Scale posture (MEASURED, SCALE.md round-5): on the 8x-wide-basket
    stress corpus (~64x wedges) BOTH this id-oriented join and the
    degree-ordered compact-forward rewrite exceed 9.5 min — on a
    near-REGULAR graph the wedge volume itself is the wall, and
    orientation tricks only help under degree skew (the degree
    histogram operator is the dial that says which regime you're in).
    The production path for dense co-occurrence graphs is
    SPARSIFICATION first — `part_pair_triangles_support` below counts
    on the min-support backbone (w >= 2), cutting edges ~34x and
    wedges ~3 orders of magnitude on this corpus."""
    e = _edges(spark, sf_dir).select("s", "d")
    e1 = e.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = e.select(F.col("s").alias("b"), F.col("d").alias("c"))
    e3 = e.select(F.col("s").alias("a"), F.col("d").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("degree") * (F.col("degree") - 1) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(stats)
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            "n_wedges",
            F.col("triangles").cast("bigint").alias("n_triangles"),
            F.round(
                F.col("triangles") * 3.0 / F.col("n_wedges").cast("double"),
                6,
            ).alias("clustering_coeff"),
        )
    )


@operator(
    "label_propagation_step",
    oracle=f"""
    WITH {_SQL_EDGES},
    und AS (
      SELECT s AS node, d AS nbr, w FROM edges
      UNION ALL
      SELECT d, s, w FROM edges
    ),
    labels AS (SELECT p_partkey, p_brand FROM part),
    votes AS (
      SELECT u.node, l.p_brand AS cand, CAST(SUM(u.w) AS BIGINT) AS votes
      FROM und u JOIN labels l ON l.p_partkey = u.nbr
      GROUP BY 1, 2
    ),
    winner AS (
      SELECT node, cand AS new_brand,
             ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY votes DESC, cand) AS rn
      FROM votes
    )
    SELECT l.p_brand AS old_brand, w.new_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM winner w JOIN labels l ON l.p_partkey = w.node
    WHERE w.rn = 1
    GROUP BY 1, 2 ORDER BY old_brand, new_brand
    """,
)
def label_propagation_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous label-propagation round: each part adopts the
    brand with the highest co-order weight among its neighbors
    (deterministic tie-break: lexicographic brand). Output is the
    25×25 old→new transition census. Per-node argmax is min_by over a
    (−votes, cand) struct — partial-aggregable, no ranked window over
    the vote table. Iterate by ping-ponging the label table through
    parquet (resolve_components pattern, dedup.py)."""
    e = _edges(spark, sf_dir)
    und = e.select(
        F.col("s").alias("node"), F.col("d").alias("nbr"), "w"
    ).unionByName(
        e.select(F.col("d").alias("node"), F.col("s").alias("nbr"), "w")
    )
    labels = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), "p_brand"
    )
    votes = (
        und.join(F.broadcast(labels), und.nbr == labels.pk)
        .groupBy("node", F.col("p_brand").alias("cand"))
        .agg(F.sum("w").cast("bigint").alias("votes"))
    )
    winner = votes.groupBy("node").agg(
        F.min_by("cand", F.struct(-F.col("votes"), F.col("cand"))).alias(
            "new_brand"
        )
    )
    return (
        winner.join(F.broadcast(labels), winner.node == labels.pk)
        .groupBy(F.col("p_brand").alias("old_brand"), "new_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("old_brand", "new_brand")
    )


@operator(
    "graph_cc_min_label_step",
    oracle=f"""
    WITH {_SQL_EDGES},
    und AS (
      SELECT s AS node, d AS nbr FROM edges
      UNION ALL SELECT d, s FROM edges
    ),
    new_labels AS (
      SELECT node, LEAST(node, MIN(nbr)) AS lbl
      FROM und GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT)                          AS n_nodes,
           CAST(COUNT(*) FILTER (WHERE lbl < node) AS BIGINT) AS n_dropped,
           CAST(COUNT(DISTINCT lbl) AS BIGINT)               AS n_labels,
           CAST(MIN(lbl) AS BIGINT)                          AS min_label
    FROM new_labels
    """,
)
def graph_cc_min_label_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One min-label round of connected components (each node adopts
    the minimum of itself and its neighbors) — the per-iteration unit
    of the parquet-ping-pong CC loop (`dedup.resolve_components` is
    the converged form, property-tested against union-find). The
    census (labels dropped, distinct labels left) is the loop's
    convergence meter."""
    e = _edges(spark, sf_dir)
    und = e.select(F.col("s").alias("node"), F.col("d").alias("nbr")).unionByName(
        e.select(F.col("d").alias("node"), F.col("s").alias("nbr"))
    )
    new_labels = und.groupBy("node").agg(
        F.least(F.col("node"), F.min("nbr")).alias("lbl")
    )
    return new_labels.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum((F.col("lbl") < F.col("node")).cast("bigint"))
        .cast("bigint")
        .alias("n_dropped"),
        F.count_distinct("lbl").alias("n_labels"),
        F.min("lbl").cast("bigint").alias("min_label"),
    )


@operator(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_SQL_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM edges UNION ALL SELECT d FROM edges)
      GROUP BY 1
    ),
    pairs AS (
      SELECT da.degree AS x, db.degree AS y
      FROM edges e
      JOIN deg da ON da.node = e.s
      JOIN deg db ON db.node = e.d
    ),
    sym AS (
      SELECT x, y FROM pairs UNION ALL SELECT y, x FROM pairs
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT)    AS n,
             CAST(SUM(x) AS BIGINT)      AS sx,
             CAST(SUM(y) AS BIGINT)      AS sy,
             CAST(SUM(x * x) AS BIGINT)  AS sxx,
             CAST(SUM(y * y) AS BIGINT)  AS syy,
             CAST(SUM(x * y) AS BIGINT)  AS sxy
      FROM sym
    )
    SELECT n AS n_edge_ends,
           ROUND((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman): Pearson correlation of endpoint
    degrees over all edge ends — do hubs attach to hubs? Negative on
    TPC-H-style bipartite-projected graphs. Exact integer sums over
    the symmetrized edge list; one double division."""
    e = _edges(spark, sf_dir).select("s", "d")
    deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("s"), F.col("degree").alias("x"))
    db = deg.select(F.col("node").alias("d"), F.col("degree").alias("y"))
    pairs = e.join(da, "s").join(db, "d").select("x", "y")
    sym = pairs.unionByName(
        pairs.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    s = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_edge_ends"),
        F.round(num / den, 6).alias("assortativity"),
    )


_TRI_MIN_W = 2
_TRI_TOPK = 8


@operator(
    "part_pair_triangles_support",
    oracle=f"""
    WITH {_SQL_EDGES},
    backbone AS (SELECT s, d FROM edges WHERE w >= {_TRI_MIN_W}),
    tri AS (
      SELECT COUNT(*) AS triangles
      FROM backbone e1
      JOIN backbone e2 ON e2.s = e1.d
      JOIN backbone e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT s AS node FROM backbone UNION ALL SELECT d FROM backbone)
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM backbone) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT)      AS n_nodes,
           CAST(COALESCE((SELECT SUM(degree * (degree - 1) / 2) FROM deg), 0)
                AS BIGINT)                                 AS n_wedges,
           CAST((SELECT triangles FROM tri) AS BIGINT)     AS n_triangles
    FROM (SELECT 1)
    """,
)
def part_pair_triangles_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census on the min-support BACKBONE (edges with
    co-order weight >= _TRI_MIN_W) — the scale path for dense
    co-occurrence graphs: sparsify first, count second. Repeated
    co-occurrence is the signal (a single shared order is mostly
    noise), and the support filter is a pushed-down predicate on the
    already-aggregated edge table, so the wedge volume collapses
    before any join runs (measured ~34x fewer edges at sf0.01; the
    8x-wide-basket stress finishes in 332s where the dense census
    exceeds 9.5 min — SCALE.md round-5 stress table)."""
    e = _edges(spark, sf_dir).filter(F.col("w") >= _TRI_MIN_W).select("s", "d")
    e1 = e.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = e.select(F.col("s").alias("b"), F.col("d").alias("c"))
    e3 = e.select(F.col("s").alias("a"), F.col("d").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum(F.col("degree") * (F.col("degree") - 1) / 2).cast("bigint"),
            F.lit(0),
        ).alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(stats)
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            "n_wedges",
            F.col("triangles").cast("bigint").alias("n_triangles"),
        )
    )


@operator(
    "part_pair_triangles_topk",
    oracle=f"""
    WITH {_SQL_EDGES},
    und AS (
      SELECT s AS node, d AS nbr, w FROM edges
      UNION ALL SELECT d, s, w FROM edges
    ),
    ranked AS (
      SELECT node, nbr,
             ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY w DESC, nbr) AS rn
      FROM und
    ),
    backbone AS (
      SELECT LEAST(node, nbr) AS s, GREATEST(node, nbr) AS d
      FROM ranked GROUP BY 1, 2 HAVING MAX(rn) <= {_TRI_TOPK}
    ),
    tri AS (
      SELECT COUNT(*) AS triangles
      FROM backbone e1
      JOIN backbone e2 ON e2.s = e1.d
      JOIN backbone e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT s AS node FROM backbone UNION ALL SELECT d FROM backbone)
      GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM backbone) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT)      AS n_nodes,
           CAST(COALESCE((SELECT SUM(degree * (degree - 1) / 2) FROM deg), 0)
                AS BIGINT)                                 AS n_wedges,
           CAST((SELECT triangles FROM tri) AS BIGINT)     AS n_triangles
    FROM (SELECT 1)
    """,
)
def part_pair_triangles_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census on the mutual top-k backbone — the SECOND
    production dial for dense co-occurrence graphs (`graph.py` header;
    the first is min-support). Each node ranks its incident edges by
    weight (tie-break: neighbor id, a total order) and an edge
    survives iff BOTH endpoints rank it within their top _TRI_TOPK —
    so backbone degree <= k by construction and the wedge volume is
    bounded by n*k*(k-1)/2 REGARDLESS of how dense the raw graph is.
    That is the bound min-support cannot give: uniform-weight graphs
    (the measured DNF regime, SCALE.md round-5) sparsify under top-k
    even when every weight clears the support threshold.

    Plan shape: symmetrize edges, one ROW_NUMBER window partitioned
    by node (sort is per-node, degree-bounded), then ONE groupBy on
    the canonical (s,d) pair — each edge appears exactly twice in the
    symmetrized list, so HAVING MAX(rn) <= k is the mutual test
    without any self-join of the kept list. Census joins are the same
    wedge-bound two-hop as the dense twin, but on <= n*k/2 edges.
    Measured at sf0.01: 3,543 backbone edges vs ~115k dense (~32x);
    on the 8x-wide-basket stress corpus it finishes where the dense
    census DNFs (scripts/stress_baskets.py row, SCALE.md round-6)."""
    e = _edges(spark, sf_dir)
    und = e.select(
        F.col("s").alias("node"), F.col("d").alias("nbr"), "w"
    ).unionByName(
        e.select(F.col("d").alias("node"), F.col("s").alias("nbr"), "w")
    )
    rn = F.row_number().over(
        Window.partitionBy("node").orderBy(F.col("w").desc(), F.col("nbr"))
    )
    ranked = und.select("node", "nbr", rn.alias("rn"))
    backbone = (
        ranked.groupBy(
            F.least("node", "nbr").alias("s"),
            F.greatest("node", "nbr").alias("d"),
        )
        .agg(F.max("rn").alias("mx"))
        .filter(F.col("mx") <= _TRI_TOPK)
        .select("s", "d")
    )
    e1 = backbone.select(F.col("s").alias("a"), F.col("d").alias("b"))
    e2 = backbone.select(F.col("s").alias("b"), F.col("d").alias("c"))
    e3 = backbone.select(F.col("s").alias("a"), F.col("d").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        backbone.select(F.col("s").alias("node"))
        .unionByName(backbone.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum(F.col("degree") * (F.col("degree") - 1) / 2).cast("bigint"),
            F.lit(0),
        ).alias("n_wedges"),
    )
    n_edges = backbone.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_edges.crossJoin(stats)
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            "n_wedges",
            F.col("triangles").cast("bigint").alias("n_triangles"),
        )
    )


# --------------------------------------------------------------------------
# Adamic-Adar link prediction on the w >= 2 support backbone: for
# non-adjacent part pairs, score = sum over common neighbors z of
# 1/ln(deg(z)). The candidate ranking key is the INTEGER common-
# neighbor count (deterministic cutoff); the AA score rides along as
# the tie-aware quality column. Wedge volume is bounded by the same
# backbone sparsification the triangle census ships with
# (graph.py:13-31) — at 100 TB this is the standard "friend of
# friend" candidate generator, and it never materializes more than
# the wedge list.
# --------------------------------------------------------------------------
_AA_TOPN = 15


@operator(
    "link_prediction_adamic_adar",
    oracle=f"""
    WITH {_SQL_EDGES},
    backbone AS (SELECT s, d FROM edges WHERE w >= 2),
    und AS (
      SELECT s AS z, d AS nbr FROM backbone
      UNION ALL SELECT d, s FROM backbone
    ),
    deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY z),
    wedges AS (
      SELECT a.nbr AS u, b.nbr AS v, a.z
      FROM und a JOIN und b ON a.z = b.z AND a.nbr < b.nbr
    ),
    cand AS (
      SELECT w.u, w.v,
             CAST(COUNT(*) AS BIGINT)      AS common_neighbors,
             SUM(1.0 / ln(deg.degree))     AS aa_score
      FROM wedges w
      JOIN deg ON w.z = deg.z
      LEFT JOIN backbone e ON w.u = e.s AND w.v = e.d
      WHERE e.s IS NULL
      GROUP BY w.u, w.v
    )
    SELECT u, v, common_neighbors, ROUND(aa_score, 6) AS aa_score
    FROM cand
    ORDER BY common_neighbors DESC, u, v
    LIMIT {_AA_TOPN}
    """,
)
def link_prediction_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top non-adjacent pairs by common-neighbor count with their
    Adamic-Adar scores — the classic link-prediction candidate list,
    computed on the sparsified backbone so the wedge join is bounded."""
    backbone = _edges(spark, sf_dir).filter(F.col("w") >= 2).select("s", "d")
    und = backbone.select(F.col("s").alias("z"), F.col("d").alias("nbr")).unionByName(
        backbone.select(F.col("d").alias("z"), F.col("s").alias("nbr"))
    )
    deg = und.groupBy("z").agg(F.count(F.lit(1)).alias("degree"))
    a = und.select(F.col("z"), F.col("nbr").alias("u"))
    b = und.select(F.col("z"), F.col("nbr").alias("v"))
    wedges = a.join(b, "z").filter(F.col("u") < F.col("v"))
    cand = (
        wedges.join(deg, "z")
        .join(
            backbone.select(
                F.col("s").alias("u"), F.col("d").alias("v"), F.lit(1).alias("adj")
            ),
            ["u", "v"],
            "left",
        )
        .filter(F.col("adj").isNull())
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(1.0 / F.log("degree")).alias("aa_score"),
        )
    )
    return (
        cand.select(
            "u", "v", "common_neighbors", F.round("aa_score", 6).alias("aa_score")
        )
        .orderBy(F.col("common_neighbors").desc(), "u", "v")
        .limit(_AA_TOPN)
    )


# --------------------------------------------------------------------------
# One k-core peel step (k = 3): drop nodes with degree < k, re-derive
# the induced subgraph, and report the before/after census. Iterated
# to fixpoint this is the standard k-core decomposition; one step is
# the driver-checkable unit (same contract as graph_cc_min_label_step
# and pagerank_step — the loop is parquet ping-pong, each iteration
# this exact plan). Degrees are grouped counts; the induced-subgraph
# filter is two broadcast-sized semi-joins against the survivor set.
# --------------------------------------------------------------------------
_KCORE_K = 3


@operator(
    "kcore_peel_step",
    oracle=f"""
    WITH {_SQL_EDGES},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM edges UNION ALL SELECT d FROM edges)
      GROUP BY 1
    ),
    survivors AS (SELECT node FROM deg WHERE degree >= {_KCORE_K}),
    kept AS (
      SELECT e.s, e.d FROM edges e
      JOIN survivors a ON e.s = a.node
      JOIN survivors b ON e.d = b.node
    ),
    deg2 AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM kept UNION ALL SELECT d FROM kept)
      GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg)       AS nodes_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges)     AS edges_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg
            WHERE degree < {_KCORE_K})                      AS peeled_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg2)      AS nodes_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM kept)      AS edges_after,
           (SELECT CAST(COALESCE(MAX(degree), 0) AS BIGINT) FROM deg2)
             AS max_degree_after,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg2
            WHERE degree < {_KCORE_K})                      AS still_below_k
    """,
)
def kcore_peel_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after census of one k-core peel at k=3 — still_below_k
    counts nodes the NEXT iteration would drop (0 means converged)."""
    edges = _edges(spark, sf_dir).select("s", "d")
    deg = (
        edges.select(F.col("s").alias("node"))
        .unionByName(edges.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    survivors = deg.filter(F.col("degree") >= _KCORE_K).select("node")
    kept = edges.join(
        survivors.withColumnRenamed("node", "s"), "s"
    ).join(survivors.withColumnRenamed("node", "d"), "d").select("s", "d")
    deg2 = (
        kept.select(F.col("s").alias("node"))
        .unionByName(kept.select(F.col("d").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    before = deg.agg(
        F.count(F.lit(1)).alias("nodes_before"),
        F.count(F.when(F.col("degree") < _KCORE_K, 1)).alias("peeled_nodes"),
    )
    eb = edges.agg(F.count(F.lit(1)).alias("edges_before"))
    after = deg2.agg(
        F.count(F.lit(1)).alias("nodes_after"),
        F.coalesce(F.max("degree"), F.lit(0)).cast("bigint").alias(
            "max_degree_after"
        ),
        F.count(F.when(F.col("degree") < _KCORE_K, 1)).alias("still_below_k"),
    )
    ea = kept.agg(F.count(F.lit(1)).alias("edges_after"))
    return (
        before.crossJoin(eb)
        .crossJoin(after)
        .crossJoin(ea)
        .select(
            "nodes_before",
            "edges_before",
            "peeled_nodes",
            "nodes_after",
            "edges_after",
            "max_degree_after",
            "still_below_k",
        )
    )


# --------------------------------------------------------------------------
# Local clustering coefficient bucketed by degree (round-8 slate):
# per node on the w >= 2 backbone, triangles_at_node / wedges_at_node,
# then averaged within log2 degree buckets — the "is this graph
# locally clique-ish, and does clustering decay with degree" curve
# (hierarchical networks show C(k) ~ 1/k). Node-level triangle
# counts reuse the same bounded wedge join as the census; everything
# downstream is a |nodes|-sized aggregation.
# --------------------------------------------------------------------------
@operator(
    "clustering_coefficient_by_degree",
    oracle=f"""
    WITH {_SQL_EDGES},
    backbone AS (SELECT s, d FROM edges WHERE w >= 2),
    und AS (
      SELECT s AS z, d AS nbr FROM backbone
      UNION ALL SELECT d, s FROM backbone
    ),
    deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY z),
    tri_at AS (
      SELECT a.z, CAST(COUNT(*) AS BIGINT) AS tri2
      FROM und a
      JOIN und b ON a.z = b.z AND a.nbr < b.nbr
      JOIN backbone e ON e.s = a.nbr AND e.d = b.nbr
      GROUP BY a.z
    ),
    node AS (
      SELECT deg.z, deg.degree,
             COALESCE(t.tri2, 0) AS tri,
             deg.degree * (deg.degree - 1) / 2 AS wedges
      FROM deg LEFT JOIN tri_at t ON t.z = deg.z
    )
    SELECT CAST(FLOOR(log2(degree)) AS BIGINT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT)            AS n_nodes,
           CAST(SUM(tri) AS BIGINT)            AS sum_triangles,
           CAST(SUM(wedges) AS BIGINT)         AS sum_wedges,
           ROUND(SUM(CASE WHEN wedges > 0
                     THEN tri / CAST(wedges AS DOUBLE) ELSE 0 END)
                 / COUNT(*), 6)                AS avg_clustering
    FROM node GROUP BY 1 ORDER BY degree_bucket
    """,
)
def clustering_coefficient_by_degree(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    backbone = _edges(spark, sf_dir).filter(F.col("w") >= 2).select("s", "d")
    und = backbone.select(
        F.col("s").alias("z"), F.col("d").alias("nbr")
    ).unionByName(backbone.select(F.col("d").alias("z"), F.col("s").alias("nbr")))
    deg = und.groupBy("z").agg(F.count(F.lit(1)).alias("degree"))
    a = und.select("z", F.col("nbr").alias("u"))
    b = und.select("z", F.col("nbr").alias("v"))
    tri_at = (
        a.join(b, "z")
        .filter(F.col("u") < F.col("v"))
        .join(
            backbone.select(F.col("s").alias("u"), F.col("d").alias("v")),
            ["u", "v"],
        )
        .groupBy("z")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    node = deg.join(tri_at, "z", "left").select(
        "degree",
        F.coalesce("tri", F.lit(0)).alias("tri"),
        (F.col("degree") * (F.col("degree") - 1) / 2).alias("wedges"),
    )
    cc = F.when(
        F.col("wedges") > 0, F.col("tri") / F.col("wedges").cast("double")
    ).otherwise(F.lit(0.0))
    return (
        node.groupBy(
            F.floor(F.log2("degree")).cast("bigint").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("tri").cast("bigint").alias("sum_triangles"),
            F.sum("wedges").cast("bigint").alias("sum_wedges"),
            F.round(F.sum(cc) / F.count(F.lit(1)), 6).alias("avg_clustering"),
        )
        .orderBy("degree_bucket")
    )


# --------------------------------------------------------------------------
# Modularity of the brand partition on the co-purchase backbone
# (round-8 slate): does "same brand" explain the co-purchase graph's
# community structure? Newman's Q for a fixed node labeling reduces to
# Q = (4m*sum_c e_c - sum_c d_c^2) / (4m^2) — every term an exact
# integer on the w>=2 support backbone (the same sparsification dial
# as the triangle census), so the statistic is one keyed join pass +
# a degree aggregation, engine-exact up to the single final division.
# The evaluation twin of label_propagation_step: run LP, relabel, and
# THIS operator scores any labeling you like at 100 TB.
# --------------------------------------------------------------------------
@operator(
    "brand_modularity_backbone",
    oracle=f"""
    WITH {_SQL_EDGES},
    bb AS (SELECT s, d FROM edges WHERE w >= 2),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM bb),
    lab AS (SELECT p_partkey AS node, p_brand AS com FROM part),
    intra AS (
      SELECT ls.com, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM bb JOIN lab ls ON ls.node = bb.s JOIN lab ld ON ld.node = bb.d
      WHERE ls.com = ld.com GROUP BY 1
    ),
    deg AS (
      SELECT lab.com, CAST(COUNT(*) AS BIGINT) AS d_c
      FROM (SELECT s AS node FROM bb UNION ALL SELECT d FROM bb) v
      JOIN lab ON lab.node = v.node GROUP BY 1
    ),
    terms AS (
      SELECT deg.com, COALESCE(intra.e_c, 0) AS e_c, deg.d_c
      FROM deg LEFT JOIN intra ON intra.com = deg.com
    )
    SELECT m.m AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(e_c) AS BIGINT) AS n_intra_edges,
           ROUND(CAST(4 * m.m * SUM(e_c)
                      - SUM(CAST(d_c AS HUGEINT) * d_c) AS DOUBLE)
                 / (4.0 * m.m * m.m), 6) AS modularity
    FROM terms CROSS JOIN m GROUP BY m.m
    """,
)
def brand_modularity_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    bb = _edges(spark, sf_dir).filter(F.col("w") >= 2).select("s", "d")
    m = bb.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    p = _t(spark, sf_dir, "part")
    lab = p.select(F.col("p_partkey").alias("node"), F.col("p_brand").alias("com"))
    ls = lab.select(F.col("node").alias("s"), F.col("com").alias("com_s"))
    ld = lab.select(F.col("node").alias("d"), F.col("com").alias("com_d"))
    intra = (
        bb.join(F.broadcast(ls), "s")
        .join(F.broadcast(ld), "d")
        .filter(F.col("com_s") == F.col("com_d"))
        .groupBy(F.col("com_s").alias("com"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        bb.select(F.col("s").alias("node"))
        .unionByName(bb.select(F.col("d").alias("node")))
        .join(F.broadcast(lab), "node")
        .groupBy("com")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    terms = deg.join(intra, "com", "left").select(
        "com", F.coalesce("e_c", F.lit(0)).alias("e_c"), "d_c"
    )
    num = (
        F.lit(4) * F.col("m") * F.sum("e_c")
        - F.sum(F.col("d_c").cast("decimal(38,0)") * F.col("d_c"))
    )
    return (
        terms.crossJoin(F.broadcast(m))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
            F.sum("e_c").cast("bigint").alias("n_intra_edges"),
            F.round(
                num.cast("double")
                / (F.lit(4.0) * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
        .select(
            F.col("m").alias("n_edges"),
            "n_communities",
            "n_intra_edges",
            "modularity",
        )
    )


# --------------------------------------------------------------------------
# One HITS iteration on the co-order backbone from the uniform start:
# authority_1(v) = deg(v), hub_1(v) = sum of neighbor degrees — the
# Kleinberg twin of `pagerank_step` (operators/warehouse.py). On an
# undirected graph one iteration makes hub_1 the WEDGE-CENTRALITY
# ranking (sum over neighbors of their degree), and its global total
# is exactly sum(deg^2) — the same wedge bound part_pair_triangles
# reports as its cost predictor, so the two operators cross-check.
# All scores are exact integer sums; the only double is the final
# L1-normalized share. Scale: symmetrized edges -> one keyed join
# against the degree table -> grouped sum; never touches facts.
# --------------------------------------------------------------------------
@operator(
    "hits_step",
    oracle=f"""
    WITH {_SQL_EDGES},
    sym AS (SELECT s AS u, d AS v FROM edges
            UNION ALL SELECT d AS u, s AS v FROM edges),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM sym GROUP BY 1),
    h AS (
      SELECT sym.u AS node, CAST(SUM(dg.degree) AS BIGINT) AS hub_1
      FROM sym JOIN deg dg ON dg.node = sym.v
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(hub_1) AS DOUBLE) AS th FROM h)
    SELECT h.node, d2.degree AS auth_1, h.hub_1,
           ROUND(CAST(h.hub_1 AS DOUBLE) / tot.th, 6) AS hub_share
    FROM h JOIN deg d2 ON d2.node = h.node CROSS JOIN tot
    ORDER BY h.hub_1 DESC, h.node
    LIMIT 20
    """,
)
def hits_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    sym = edges.select(
        F.col("s").alias("u"), F.col("d").alias("v")
    ).unionAll(edges.select(F.col("d").alias("u"), F.col("s").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    h = (
        sym.join(deg.select(F.col("node").alias("v"), "degree"), "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.sum("degree").cast("bigint").alias("hub_1"))
    )
    tot = h.agg(F.sum("hub_1").cast("double").alias("th"))
    out = (
        h.join(deg.withColumnRenamed("degree", "auth_1"), "node")
        .crossJoin(F.broadcast(tot))
    )
    return (
        out.select(
            "node", "auth_1", "hub_1",
            F.round(F.col("hub_1").cast("double") / F.col("th"), 6)
            .alias("hub_share"),
        )
        .orderBy(F.desc("hub_1"), "node")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Rich-club coefficient phi(k) for k in {2, 4, 8, 16}: among nodes
# with degree > k, what fraction of possible edges exist? The
# hub-interconnection diagnostic that degree distribution and
# assortativity (one number) cannot show — a rising phi(k) curve
# means the high-degree parts form a tightly co-purchased core.
# One degree table, one edge pass with BOTH endpoint degrees joined,
# then the four k levels as conditional aggregates (joinless sweep
# shape). All counts exact integers; scale is |edges| + |nodes|.
# --------------------------------------------------------------------------
@operator(
    "rich_club_coefficient",
    oracle=f"""
    WITH {_SQL_EDGES},
    sym AS (SELECT s AS u, d AS v FROM edges
            UNION ALL SELECT d, s FROM edges),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM sym GROUP BY 1),
    tagged AS (
      SELECT e.s, e.d, da.degree AS deg_s, db.degree AS deg_d
      FROM edges e
      JOIN deg da ON da.node = e.s
      JOIN deg db ON db.node = e.d
    ),
    m AS (
      SELECT
        {", ".join(
            f'''CAST((SELECT COUNT(*) FROM deg WHERE degree > {k})
                 AS BIGINT) AS n{k},
            CAST(count_if(deg_s > {k} AND deg_d > {k}) AS BIGINT) AS e{k}'''
            for k in (2, 4, 8, 16)
        )}
      FROM tagged
    )
    SELECT k, n_rich, e_rich,
           CAST(n_rich * (n_rich - 1) / 2 AS BIGINT) AS possible,
           ROUND(CASE WHEN n_rich < 2 THEN 0.0
                      ELSE CAST(e_rich AS DOUBLE)
                           / (n_rich * (n_rich - 1) / 2.0) END, 6) AS phi
    FROM (
      {" UNION ALL ".join(
          f"SELECT {k} AS k, n{k} AS n_rich, e{k} AS e_rich FROM m"
          for k in (2, 4, 8, 16)
      )}
    )
    ORDER BY k
    """,
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    sym = edges.select(F.col("s").alias("u")).unionAll(
        edges.select(F.col("d").alias("u"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    tagged = (
        edges.join(
            deg.select(F.col("node").alias("s"), F.col("degree").alias("deg_s")),
            "s",
        )
        .join(
            deg.select(F.col("node").alias("d"), F.col("degree").alias("deg_d")),
            "d",
        )
    )
    ks = (2, 4, 8, 16)
    e_aggs = [
        F.count(F.when((F.col("deg_s") > k) & (F.col("deg_d") > k), 1))
        .cast("bigint").alias(f"e{k}")
        for k in ks
    ]
    em = tagged.agg(*e_aggs)
    n_aggs = [
        F.count(F.when(F.col("degree") > k, 1)).cast("bigint").alias(f"n{k}")
        for k in ks
    ]
    nm = deg.agg(*n_aggs)
    m = em.crossJoin(nm)
    stacked = m.select(
        F.expr(
            "stack(4, "
            + ", ".join(f"{k}, n{k}, e{k}" for k in ks)
            + ") AS (k, n_rich, e_rich)"
        )
    )
    n_rich = F.col("n_rich")
    return stacked.select(
        F.col("k").cast("int").alias("k"),
        n_rich.cast("bigint").alias("n_rich"),
        F.col("e_rich").cast("bigint").alias("e_rich"),
        (n_rich * (n_rich - 1) / 2).cast("bigint").alias("possible"),
        F.round(
            F.when(n_rich < 2, F.lit(0.0)).otherwise(
                F.col("e_rich").cast("double") / (n_rich * (n_rich - 1) / 2.0)
            ), 6
        ).alias("phi"),
    ).orderBy("k")
