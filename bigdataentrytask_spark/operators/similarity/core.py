"""Similarity search over `embeddings` (north-star layer, SURVEY.md
§2.8): brute-force cosine top-k as the correctness baseline, an
IVF-style partitioned variant (coarse cells = `label`), and a
random-hyperplane LSH variant for the billion-vector scale path.

All vector math is pure Column expressions (functions/vector.py) in
double precision — no UDFs, no Python in the hot path.

Scale posture:
* brute-force is O(Q x N) — correct, and fine when Q is small and the
  candidate side is broadcast; it is the oracle for recall tests.
* IVF: search only the query's coarse cell — the candidate join key is
  the cell id, so the shuffle is bounded by cell population, not N.
* LSH: 8 signed hyperplane projections -> 256 buckets; neighbor search
  joins on bucket equality. Recall tested against brute force.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.functions.vector import (
    cosine,
    cosine_seq,
    norm,
    seq_dot,
    stack_f64,
)
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
EMB_DIM = 64
# Multi-table LSH: L independent tables of B sign-bits each. One table
# of many bits has near-zero recall on weakly-correlated vectors; the
# union of L small-bucket tables trades candidate volume for recall
# (candidates ≈ L * N / 2^B per query).
LSH_TABLES = 6
LSH_BITS = 5
_rng = random.Random(20240814)
HYPERPLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)] for _ in range(LSH_BITS)]
    for _ in range(LSH_TABLES)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, "embeddings")


# Shared oracle scaffolding: element-wise double math via DuckDB's
# positional-zip UNNEST, same accumulation order as Spark's aggregate().
_SQL_NORMS = """
    norms AS (
      SELECT vec_id,
             sqrt((SELECT SUM(e * e) FROM
                   (SELECT UNNEST(embedding::DOUBLE[]) AS e) u)) AS nrm
      FROM embeddings
    )
"""


# --------------------------------------------------------------------------
# Per-vector norms — the scalar surface of the vector layer.
# --------------------------------------------------------------------------
@operator(
    "embedding_norms",
    oracle=f"""
    WITH {_SQL_NORMS}
    SELECT vec_id, len(embedding) AS dim, ROUND(nrm, 6) AS l2_norm
    FROM embeddings JOIN norms USING (vec_id)
    ORDER BY vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm("embedding"), 6).alias("l2_norm"),
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k: query side (10 vectors) broadcast against
# every candidate; rank with a deterministic tiebreak.
# --------------------------------------------------------------------------
@operator(
    "knn_bruteforce",
    oracle=f"""
    WITH {_SQL_NORMS},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM embeddings q, embeddings c
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS cosine
    FROM sims WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    # cosine_seq (the Arrow kernel twin, IEEE-identical accumulation
    # order — functions/vector.py) instead of the interpreted HOF fold:
    # N_QUERIES x N pair dots are exactly the volume where per-element
    # lambda interpretation loses (measured 0.95s -> 0.46s at sf0.1)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_seq("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", F.round("sim", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# IVF-style ANN: `label` is the coarse-quantizer cell (inverted file);
# search only the query's own cell. Join key = cell id -> shuffle bounded
# by cell population, never O(N) per query.
# --------------------------------------------------------------------------
@operator(
    "knn_ivf_label",
    oracle=f"""
    WITH {_SQL_NORMS},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM embeddings q JOIN embeddings c
        ON q.label = c.label AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS cosine
    FROM sims WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        q.join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # Arrow cosine twin, same rationale as knn_bruteforce
        .withColumn("sim", cosine_seq("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", F.round("sim", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH ANN — the billion-vector scale path. Each vector
# explodes into LSH_TABLES bucket keys (table_id, sign-bit code);
# candidates are the union of same-bucket matches across tables, then
# exact-cosine re-ranked. The oracle embeds the (deterministic, seeded)
# hyperplane constants as a SQL VALUES list and recomputes the same
# sign-bit codes — so bucketing itself is differential-tested, the same
# trick as simhash_pairs.
# --------------------------------------------------------------------------
def _sql_planes() -> str:
    """The hyperplane constants as a DuckDB VALUES relation (t, i, w)."""
    rows = []
    for t, planes in enumerate(HYPERPLANES):
        for i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[]"
            rows.append(f"({t}, {i}, {lit})")
    return "planes(t, i, w) AS (VALUES " + ",\n      ".join(rows) + ")"


# Per-(vector, table) sign-bit code, identical bit layout to
# `_bucket_keys`: bit i set iff dot(embedding, plane[t][i]) > 0.
_SQL_CODES = """
    codes AS (
      SELECT e.vec_id, p.t,
             SUM(CASE WHEN (SELECT SUM(z.a * z.b) FROM
                            (SELECT UNNEST(e.embedding::DOUBLE[]) AS a,
                                    UNNEST(p.w) AS b) z) > 0
                      THEN (1 << p.i) ELSE 0 END) AS code
      FROM embeddings e CROSS JOIN planes p
      GROUP BY e.vec_id, p.t
    )
"""


def _bucket_keys(emb_col: str):
    """Array of LSH_TABLES (table_id, code) structs for one vector —
    pure-Column form (the small-fixture reference; `_bucketed` below is
    the Arrow form used in the registered operators)."""
    keys = []
    for t, planes in enumerate(HYPERPLANES):
        bits = []
        for i, plane in enumerate(planes):
            arr = F.array(*[F.lit(wv) for wv in plane])
            proj = F.aggregate(
                F.zip_with(F.col(emb_col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        keys.append(F.struct(F.lit(t).alias("t"), sum(bits).alias("code")))
    return F.array(*keys)


@pandas_udf(ArrayType(LongType()))
def _lsh_codes(emb):
    """Arrow twin of `_bucket_keys`: per vector, the LSH_TABLES
    sign-bit codes. Projections accumulate column-sequentially
    (functions/vector.py bit-identity argument), so the sign decisions
    — and therefore the buckets — match the Column form and the
    DuckDB oracle exactly. One vectorized pass replaces
    LSH_TABLES*LSH_BITS interpreted HOF dot products per row
    (measured: the bucketing stage alone cost ~4s of knn_lsh's 8.6s
    at sf0.1)."""
    import numpy as np
    import pandas as pd

    X = stack_f64(emb)
    n = X.shape[0]
    out = np.zeros((n, LSH_TABLES), dtype=np.int64)
    for t, planes in enumerate(HYPERPLANES):
        code = np.zeros(n, dtype=np.int64)
        for i, plane in enumerate(planes):
            proj = np.zeros(n)
            for j in range(EMB_DIM):
                proj += X[:, j] * plane[j]
            code |= (proj > 0).astype(np.int64) << i
        out[:, t] = code
    return pd.Series(list(out))


def _bucketed(e: DataFrame) -> DataFrame:
    """(vec_id, bucket) rows, one per (vector, LSH table) — the Arrow
    bucketing path, same struct key layout as `_bucket_keys`."""
    return e.select("vec_id", F.posexplode(_lsh_codes("embedding")).alias("t", "code")).select(
        "vec_id", F.struct(F.col("t").cast("int").alias("t"), "code").alias("bucket")
    )


@operator(
    "knn_lsh",
    oracle=f"""
    WITH {_sql_planes()},
    {_SQL_CODES},
    {_SQL_NORMS},
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM codes q JOIN codes c ON q.t = c.t AND q.code = c.code
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT cand.query_id, cand.neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS cosine
    FROM sims WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    # The bucketed frame is consumed twice (query side, corpus side)
    # and simply RECOMPUTED for each: it is a narrow (vec_id, bucket)
    # projection off a columnar scan, and recomputing it twice is
    # measurably cheaper than the persist/unpersist round-trip the
    # earlier formulation paid (persist machinery 0.45s vs 2 x 0.22s
    # recompute at sf0.1; at scale the same judgment holds — guide §5:
    # cache only when recomputation beats the memory pressure, and a
    # projection scan does not).
    bucketed = _bucketed(e)
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    c = bucketed.select(F.col("vec_id").alias("neighbor_id"), "bucket")
    # dedupe bare id pairs first; re-attach vectors afterwards so the
    # distinct never shuffles embedding payloads
    cand = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = e.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("sim", cosine_seq("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id", "rnk", "neighbor_id", F.round("sim", 6).alias("cosine")
        )
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Symmetric int8 quantization per vector: scale = max|x| / 127,
# q_i = round(x_i * 127 / max|x|). The standard embedding-store
# compression (4x smaller than float32, 8x than float64). All math is
# double-precision higher-order-functions (transform/aggregate) in
# codegen — IEEE-identical on both engines, so even this numeric op is
# exactly differential-testable. Zero shuffles: scan -> project.
# --------------------------------------------------------------------------
@operator(
    "embedding_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 127 /
                     list_aggregate(list_transform(embedding,
                       y -> abs(CAST(y AS DOUBLE))), 'max')) AS BIGINT)) AS qv
      FROM embeddings
      WHERE list_aggregate(list_transform(embedding,
              y -> abs(CAST(y AS DOUBLE))), 'max') > 0
    )
    SELECT vec_id,
           CAST(list_aggregate(qv, 'sum') AS BIGINT)                   AS q_sum,
           list_aggregate(list_transform(qv, v -> abs(v)), 'max')      AS q_peak
    FROM q ORDER BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    absd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    amax = F.array_max(absd)
    qv = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 127 / F.col("amax")).cast("long")
    )
    return (
        e.withColumn("amax", amax)
        .filter(F.col("amax") > 0)
        .withColumn("qv", qv)
        .select(
            "vec_id",
            F.aggregate("qv", F.lit(0).cast("long"), lambda a, v: a + v).alias("q_sum"),
            F.array_max(F.transform("qv", lambda v: F.abs(v))).alias("q_peak"),
        )
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs: every unordered pair whose
# cosine clears the threshold — the semantic-dedup primitive (minhash/
# simhash catch lexical dups; embedding cosine catches paraphrases).
#
# EXACT all-pairs at scale: a tiled self-join. Rows are hashed into G
# groups; every unordered group-pair (i <= j) is one tile, and each row
# is replicated to the G+1 tiles it participates in (as the "A" side of
# tiles (g, j>=g), as the "B" side of tiles (i<=g, g)). The join is a
# plain equi-join on (ti, tj) — every executor gets a bounded tile, no
# broadcast of the whole table, no driver ceiling, no NestedLoop in the
# plan. Compute stays O(N^2/2) — that is inherent to an EXACT
# threshold join at tau=0.4 on isotropic vectors: hyperplane LSH
# collision prob at tau=0.4 is 0.631 vs 0.5 for random pairs, so 100%
# recall needs ~40 tables of 3-bit codes = MORE work than brute force
# (measured on this corpus: qualifying pairs sit at 0.40-0.60, at
# chance level w.r.t. `label`). G scales as sqrt(cluster cores);
# replication cost is G+1 copies of each row — the standard theta-join
# tiling trade.  The sub-quadratic APPROXIMATE path is
# `embedding_neardup_lsh` below.
# Threshold applies to the 6-decimal-rounded value so both engines
# make the identical boundary decision.
# --------------------------------------------------------------------------
NEARDUP_COS = 0.4
NEARDUP_TILE_GROUPS = 8  # G: tune to ~sqrt(cores) on a real cluster

_NEARDUP_ORACLE = f"""
    WITH {_SQL_NORMS},
    sims AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND((SELECT SUM(z.ae * z.be) FROM
                    (SELECT UNNEST(a.embedding::DOUBLE[]) AS ae,
                            UNNEST(b.embedding::DOUBLE[]) AS be) z)
                   / (na.nrm * nb.nrm), 6) AS cosine
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id
      JOIN norms na ON na.vec_id = a.vec_id
      JOIN norms nb ON nb.vec_id = b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM sims
    WHERE cosine >= {NEARDUP_COS}
    ORDER BY vec_a, vec_b
    """


@operator("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    g = NEARDUP_TILE_GROUPS
    base = e.select(
        "vec_id", "embedding", F.pmod(F.hash("vec_id"), F.lit(g)).alias("g")
    )
    # Tile membership as ONE side-tagged frame (the same rewrite the
    # minhash pair stage got this round): a row in group g is side 0
    # of the diagonal tile (g, g) — emitted ONCE where the cogroup
    # form shipped it on both sides — side 1 (A) of tiles (g, tj>g),
    # side 2 (B) of tiles (ti<g, g). One exchange and one Arrow stream
    # instead of two of each; each tile's N^2/G^2 pair dots still
    # happen in-kernel as vectorized outer-product accumulations — NOT
    # as a 1KB-per-pair join stream (the original pair-join
    # formulation shipped both embeddings through Arrow for every
    # pair: ~12 GB at sf0.1, measured 15.4s vs 2.2s for the tiling).
    # Cross-group pairs meet in exactly one tile (ti < tj); same-group
    # pairs meet in tile (g, g), deduped in-kernel by id order. The
    # single-frame form also removes the cogroup attribute-conflation
    # hazard the B-side aliases used to work around.
    memb = F.expr(
        "concat("
        " array(named_struct('ti', g, 'tj', g, 'side', 0)),"
        f" transform(filter(sequence(0, {g - 1}), t -> t > g),"
        "           t -> named_struct('ti', g, 'tj', t, 'side', 1)),"
        f" transform(filter(sequence(0, {g - 1}), t -> t < g),"
        "           t -> named_struct('ti', t, 'tj', g, 'side', 2)))"
    )
    tiled = base.select(
        "vec_id", "embedding", F.explode(memb).alias("m")
    ).select(
        "vec_id",
        "embedding",
        F.col("m.ti").alias("ti"),
        F.col("m.tj").alias("tj"),
        F.col("m.side").alias("side"),
    )
    pairs = tiled.groupBy("ti", "tj").applyInPandas(
        _neardup_tile(NEARDUP_COS), schema="vec_a long, vec_b long, raw double"
    )
    # The kernel pre-filters on the RAW cosine with a one-ulp-safe
    # margin; the contractual boundary decision stays JVM-side on the
    # 6-decimal HALF_UP rounding, identical to the oracle's ROUND.
    return (
        pairs.withColumn("cosine", F.round("raw", 6))
        .filter(F.col("cosine") >= NEARDUP_COS)
        .select("vec_a", "vec_b", "cosine")
    )


def _neardup_tile(tau: float):
    """Tile kernel: all qualifying A x B cosines for one (ti, tj) tile
    of the side-tagged frame (diagonal tiles hold one member set,
    side 0; off-diagonal tiles pair the side-1 rows against side-2).

    The dot matrix accumulates column-sequentially
    (``D += X[:, j] outer Y[:, j]`` for j in order) so every pairwise
    dot — and both norms — is IEEE-identical to the per-pair Column
    fold and the DuckDB oracle (functions/vector.py bit-identity
    argument). Emission pre-filters on raw cosine at ``tau - 1e-6``;
    the exact >= tau decision is made on the JVM-rounded value so the
    kernel never owns a rounding-mode decision.
    """
    margin = tau - 1e-6

    def fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "raw": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) == 0:
            return empty
        same_chunk = int(pdf["ti"].iloc[0]) == int(pdf["tj"].iloc[0])
        if same_chunk:
            left = right = pdf
        else:
            sides = pdf["side"].to_numpy()
            left = pdf[sides == 1]
            right = pdf[sides == 2]
            if len(left) == 0 or len(right) == 0:
                return empty
        ia = left["vec_id"].to_numpy()
        ib = right["vec_id"].to_numpy()
        X = stack_f64(left["embedding"])
        Y = X if same_chunk else stack_f64(right["embedding"])
        D = np.zeros((len(ia), len(ib)))
        for j in range(X.shape[1]):
            D += X[:, j][:, None] * Y[:, j][None, :]
        na = np.sqrt(seq_dot(X, X))
        nb = na if same_chunk else np.sqrt(seq_dot(Y, Y))
        with np.errstate(invalid="ignore", divide="ignore"):
            C = D / (na[:, None] * nb[None, :])
            mask = C >= margin
        if same_chunk:
            mask &= ia[:, None] < ib[None, :]
        ii, jj = np.nonzero(mask)
        if not len(ii):
            return empty
        va, vb = ia[ii], ib[jj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "raw": C[ii, jj],
            }
        )

    return fn


def _neardup_bucket_kernel(tau: float):
    """Per-LSH-bucket kernel: verify all member pairs of one (t, code)
    bucket. Cosines use the same column-sequential accumulation as
    `_neardup_tile` (bit-identity with the Column fold and the DuckDB
    oracle); the >= tau decision is made JVM-side on the rounded value
    (in-kernel pre-filter at ``tau - 1e-6`` only). Cross-table pair
    dedup happens here too: member codes for ALL tables arrive with
    the rows (the `_lsh_codes` values the bucketing explode was built
    from — no in-kernel re-derivation), and a pair is emitted only
    when this bucket's table is the first whose codes collide."""
    margin = tau - 1e-6

    def fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "raw": pd.Series(dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        t_here = int(pdf["t"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        X = stack_f64(pdf["embedding"])
        D = np.zeros((n, n))
        for j in range(X.shape[1]):
            D += X[:, j][:, None] * X[:, j][None, :]
        nrm = np.sqrt(seq_dot(X, X))
        with np.errstate(invalid="ignore", divide="ignore"):
            C = D / (nrm[:, None] * nrm[None, :])
        mask = (C >= margin) & (ids[:, None] < ids[None, :])
        if not mask.any():
            return empty
        # first table whose codes agree, per member pair — the codes
        # arrive WITH the rows (the same `_lsh_codes` values the
        # bucketing explode was built from), so the kernel no longer
        # re-derives them from HYPERPLANES: that recompute cost
        # T x B x D numpy passes per bucket group (~1,900 tiny vector
        # ops x ~190 groups at sf0.1) for values the JVM already held.
        codes = np.stack(pdf["codes"].to_numpy())  # (n, T) int64
        eq = codes[:, None, :] == codes[None, :, :]  # (n, n, T)
        first_eq = eq.argmax(axis=2)  # first True index (>=1 True here)
        mask &= first_eq == t_here
        ii, jj = np.nonzero(mask)
        if not len(ii):
            return empty
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids[jj], "raw": C[ii, jj]}
        )

    return fn


# --------------------------------------------------------------------------
# LSH-bucketed near-duplicate pairs — the sub-quadratic scale path.
# Candidates are unordered pairs sharing any of the LSH_TABLES sign-bit
# buckets; each candidate is verified with the same exact rounded-cosine
# predicate as the all-pairs operator. Candidate volume is
# ~ L * N^2 / 2^B per table on isotropic data (5x under brute force
# here) and collapses to near-linear on real clustered corpora, where
# near-dups share buckets with probability -> 1. Recall vs the exact
# operator is data-dependent (measured in tests); the ORACLE recomputes
# the identical bucket restriction in SQL, so what the operator claims
# is differential-tested exactly.
# --------------------------------------------------------------------------
@operator(
    "embedding_neardup_lsh",
    oracle=f"""
    WITH {_sql_planes()},
    {_SQL_CODES},
    {_SQL_NORMS},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM codes a JOIN codes b ON a.t = b.t AND a.code = b.code
      WHERE a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT cand.vec_a, cand.vec_b,
             ROUND((SELECT SUM(z.ae * z.be) FROM
                    (SELECT UNNEST(a.embedding::DOUBLE[]) AS ae,
                            UNNEST(b.embedding::DOUBLE[]) AS be) z)
                   / (na.nrm * nb.nrm), 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.vec_a
      JOIN embeddings b ON b.vec_id = cand.vec_b
      JOIN norms na ON na.vec_id = cand.vec_a
      JOIN norms nb ON nb.vec_id = cand.vec_b
    )
    SELECT vec_a, vec_b, cosine FROM sims
    WHERE cosine >= {NEARDUP_COS}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One bucket = one Arrow group: members' pairwise cosines are
    # verified in-kernel (vectorized, same column-sequential
    # accumulation as the tile kernel), and a pair colliding in
    # several tables is emitted only by the FIRST table whose codes
    # agree — recomputed in-kernel from the shared HYPERPLANES
    # constants — so pairs are unique by construction. This replaces
    # the previous candidate self-join + distinct + per-pair HOF
    # cosine (measured ~3.0s warm at sf0.1: 356k candidate rows, each
    # paying a 64-dim interpreted lambda): no join, no distinct
    # shuffle, one explode-shuffle of (vector, table) rows. Bucket
    # width is capped by the code space (N / 2^B expected); a corpus
    # with a degenerate giant bucket needs the minhash tile split.
    e = _emb(spark, sf_dir)
    # the full per-vector code array rides along (T x 8 bytes against a
    # 64-float payload) so the kernel's cross-table canonical dedup
    # reads it instead of re-deriving every code from HYPERPLANES
    bucketed = e.select(
        "vec_id",
        "embedding",
        _lsh_codes("embedding").alias("codes"),
    ).select(
        "vec_id",
        "embedding",
        "codes",
        F.posexplode("codes").alias("t", "code"),
    )
    pairs = bucketed.groupBy("t", "code").applyInPandas(
        _neardup_bucket_kernel(NEARDUP_COS),
        schema="vec_a long, vec_b long, raw double",
    )
    return (
        pairs.withColumn("cosine", F.round("raw", 6))
        .filter(F.col("cosine") >= NEARDUP_COS)
        .select("vec_a", "vec_b", "cosine")
    )


# --------------------------------------------------------------------------
# Higher-order-function surface over the embedding column: per-vector
# statistics computed entirely with array lambdas (transform / filter /
# exists / zip_with / aggregate) — the JVM-side vector math toolkit
# every embedding pipeline composes before reaching for a Python UDF.
# Narrow projection, zero shuffle.
# --------------------------------------------------------------------------
_HOF_BIG = 2.5


@operator(
    "embedding_hof_stats",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    )
    SELECT vec_id,
           len(list_filter(e, x -> x > 0))                        AS n_pos,
           ROUND((SELECT SUM(abs(u.x))
                  FROM (SELECT UNNEST(e) AS x) u), 4)             AS l1,
           ROUND((SELECT SUM(z.a * z.b)
                  FROM (SELECT UNNEST(e) AS a, UNNEST(e) AS b) z), 4)
                                                                  AS sq_norm,
           len(list_filter(e, x -> abs(x) > {_HOF_BIG})) > 0      AS has_big
    FROM v ORDER BY vec_id
    """,
)
def embedding_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    l1 = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(l1, 4).alias("l1"),
        F.round(sq, 4).alias("sq_norm"),
        F.exists(v, lambda x: F.abs(x) > _HOF_BIG).alias("has_big"),
    )


# --------------------------------------------------------------------------
# Cluster cohesion report: per-label centroid (dimension-wise mean) and
# the mean cosine of members to their own centroid — the standard
# clustering-quality / semantic-dedup diagnostic over an embedding
# column (IVF cell quality, semdedup cluster tightness).
#
# Scale posture: everything is dimension-level rows — explode is
# N x dim, the centroid agg reduces map-side onto (label, pos) keys
# (|labels| x dim rows total), and the member-to-centroid dot is a
# broadcast join of the centroid table (labels x dim ≪ corpus)
# against the same exploded stream followed by one partial-agg shuffle
# on vec_id. No arrays cross a shuffle; no Python anywhere.
# --------------------------------------------------------------------------
@operator(
    "embedding_label_centroids",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, label,
             generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    nlab AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_lab FROM v GROUP BY 1
    ),
    cent AS (
      SELECT label, pos, CAST(SUM(xi) AS BIGINT) AS s
      FROM dims GROUP BY label, pos
    ),
    csq AS (
      SELECT label, CAST(SUM(s::HUGEINT * s) AS DOUBLE) AS c2
      FROM cent GROUP BY label
    ),
    member AS (
      SELECT d.vec_id, d.label,
             CAST(SUM(d.xi::HUGEINT * ct.s) AS DOUBLE) AS dot,
             CAST(SUM(d.xi::HUGEINT * d.xi) AS DOUBLE) AS nv2
      FROM dims d JOIN cent ct ON ct.label = d.label AND ct.pos = d.pos
      GROUP BY d.vec_id, d.label
    ),
    mc AS (
      -- cosine(member, centroid) is invariant to the centroid scale
      -- 1/(n*g), so it only needs the exact integer sums; snapped
      -- onto the 1e6 grid so the label mean is an exact BIGINT sum
      SELECT m.label,
             CAST(ROUND(m.dot / (sqrt(m.nv2) * sqrt(cs.c2)) * 1000000)
                  AS BIGINT) AS cos_grid
      FROM member m JOIN csq cs ON cs.label = m.label
    )
    SELECT mc.label,
           COUNT(*) AS n_vecs,
           ROUND(ANY_VALUE(sqrt(cs.c2) / (cs_n.n_lab * 1000000.0)), 6)
             AS centroid_norm,
           ROUND(SUM(mc.cos_grid) / (COUNT(*) * 1000000.0), 6) AS avg_cos
    FROM mc
    JOIN csq cs   ON cs.label = mc.label
    JOIN nlab cs_n ON cs_n.label = mc.label
    GROUP BY mc.label
    ORDER BY mc.label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 hardening (advisor-flagged double-AVG centroid): all
    per-label math reduces to snapped-coordinate integer sums — exact
    in any partition order — with one pinned double expression per
    output (see centroid_affinity_matrix for the scale-cancellation
    argument)."""
    v = _emb(spark, sf_dir)
    dims = v.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "vec_id", "label", "pos",
        F.round(F.col("x") * 1000000).cast("bigint").alias("xi"),
    )
    nlab = v.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lab")
    )
    cent = dims.groupBy("label", "pos").agg(F.sum("xi").alias("s"))
    # d19 overflow bound (canonical note for every d19 site in this
    # module, ADVICE r8): each product of two decimal(19,0) grid
    # integers sums into decimal(38,0). With |x| <= 100 the grid
    # integers are <= 1e8, so each product is <= 1e16 and the sum
    # stays inside 1e38 while n_terms < 1e22 — about 1e9x beyond a
    # 100 TB corpus (n_rows*dim ~ 1e13). NOTE Spark in non-ANSI mode
    # returns NULL on decimal aggregate overflow (DuckDB HUGEINT
    # errors instead), so a breach would surface as NULL aggregates,
    # not an exception — which the oracle differential catches as a
    # value mismatch at test scale, and which a 100 TB deployment
    # should guard with spark.sql.ansi.enabled=true.
    d19 = "decimal(19,0)"
    csq = cent.groupBy("label").agg(
        F.sum(F.col("s").cast(d19) * F.col("s").cast(d19))
        .cast("double")
        .alias("c2")
    )
    member = (
        dims.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("xi").cast(d19) * F.col("s").cast(d19))
            .cast("double")
            .alias("dot"),
            F.sum(F.col("xi").cast(d19) * F.col("xi").cast(d19))
            .cast("double")
            .alias("nv2"),
        )
    )
    mc = member.join(F.broadcast(csq), "label").select(
        "label",
        F.round(
            F.col("dot") / (F.sqrt("nv2") * F.sqrt("c2")) * 1000000
        )
        .cast("bigint")
        .alias("cos_grid"),
    )
    return (
        mc.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.sum("cos_grid").alias("sum_cos_grid"))
        .join(F.broadcast(csq), "label")
        .join(F.broadcast(nlab), "label")
        .select(
            "label",
            "n_vecs",
            F.round(
                F.sqrt("c2") / (F.col("n_lab") * 1000000.0), 6
            ).alias("centroid_norm"),
            F.round(
                F.col("sum_cos_grid") / (F.col("n_vecs") * 1000000.0), 6
            ).alias("avg_cos"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Semantic dedup resolution (SemDeDup-style): the LSH near-dup pairs
# become an undirected graph; connected components pick one canonical
# vector per semantic cluster (minimum vec_id). Same iterative
# min-label propagation as the minhash resolver (shared helper), same
# recursive-CTE oracle shape — here over the hyperplane-LSH candidate
# restriction, so what the operator claims is differentially tested
# end-to-end (planes → codes → candidate pairs → cosine threshold →
# components).
# --------------------------------------------------------------------------
def _semdedup_oracle() -> str:
    return f"""
    WITH RECURSIVE {_sql_planes()},
    {_SQL_CODES},
    {_SQL_NORMS},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM codes a JOIN codes b ON a.t = b.t AND a.code = b.code
      WHERE a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT cand.vec_a, cand.vec_b,
             ROUND((SELECT SUM(z.ae * z.be) FROM
                    (SELECT UNNEST(a.embedding::DOUBLE[]) AS ae,
                            UNNEST(b.embedding::DOUBLE[]) AS be) z)
                   / (na.nrm * nb.nrm), 6) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.vec_a
      JOIN embeddings b ON b.vec_id = cand.vec_b
      JOIN norms na ON na.vec_id = cand.vec_a
      JOIN norms nb ON nb.vec_id = cand.vec_b
    ),
    pairs AS (
      SELECT vec_a, vec_b FROM sims WHERE cosine >= {NEARDUP_COS}
    ),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION ALL
      SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.dst, r.lbl
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.lbl < e.dst
    )
    SELECT node AS vec_id,
           MIN(lbl) AS component,
           (node = MIN(lbl)) AS keep
    FROM reach GROUP BY node ORDER BY vec_id
    """


@operator("semdedup_resolve", oracle=_semdedup_oracle())
def semdedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.operators.dedup import resolve_components

    pairs = embedding_neardup_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    ids = _emb(spark, sf_dir).select(F.col("vec_id").alias("doc_id"))
    return resolve_components(spark, ids, pairs).select(
        F.col("doc_id").alias("vec_id"),
        "component",
        "keep",
    )


# --------------------------------------------------------------------------
# Multi-probe LSH ANN: in addition to the query's own bucket in each
# table, probe every bucket whose code differs by ONE sign bit
# (hamming <= 1), recovering neighbors that fell just across a
# hyperplane. Candidates grow ~(1 + B) per table; recall rises
# accordingly — the standard probe/recall dial (Lv et al., multi-probe
# LSH). Only the QUERY side fans out (N_QUERIES * LSH_TABLES * (B+1)
# probe rows); the corpus side still carries one row per (vector,
# table), so the probe fan-out never touches corpus scale.
# --------------------------------------------------------------------------
@operator(
    "knn_lsh_multiprobe",
    oracle=f"""
    WITH {_sql_planes()},
    {_SQL_CODES},
    {_SQL_NORMS},
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM codes q JOIN codes c
        ON q.t = c.t AND bit_count(xor(q.code, c.code)) <= 1
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT cand.query_id, cand.neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS cosine
    FROM sims WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    bucketed = _bucketed(e)
    # query side fans out to its own code plus each one-bit flip
    q = (
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("bucket.t").alias("t"),
            F.explode(
                F.array(
                    F.col("bucket.code"),
                    *[
                        F.col("bucket.code").bitwiseXOR(F.lit(1 << b))
                        for b in range(LSH_BITS)
                    ],
                )
            ).alias("code"),
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket.t").alias("t"),
        F.col("bucket.code").alias("code"),
    )
    cand = (
        F.broadcast(q)
        .join(c, ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("sim", cosine_seq("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", F.round("sim", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# One Lloyd iteration of k-means (the IVF-training building block):
# fixed deterministic seeds (the first K vectors), nearest-seed
# assignment with a deterministic tie-break, per-cluster size, SSE and
# the UPDATED centroid's norm. Iterating this step IS k-means; one
# step keeps the operator a pure dataflow with an exact SQL twin.
#
# Scale posture: all dimension-level rows (N x dim), seeds broadcast
# (K x dim ≪ corpus); the assignment is one partial-agg shuffle on
# (vec_id) and the update one on (cluster, pos). No vectors cross a
# shuffle whole, no Python.
# --------------------------------------------------------------------------
KMEANS_K = 8


@operator(
    "kmeans_step",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    seeds AS (
      SELECT vec_id AS k, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS si
      FROM v WHERE vec_id < {KMEANS_K}
    ),
    dist AS (
      -- distances on the 1e6 coordinate grid: EXACT integers in any
      -- accumulation order, so assignment needs no float tie-break
      -- (round-8 hardening; the old ROUND(dd, 6) tie-break defended
      -- against exactly the drift this removes)
      SELECT d.vec_id, se.k,
             CAST(SUM((d.xi - se.si) * (d.xi - se.si)) AS BIGINT) AS dd
      FROM dims d JOIN seeds se ON se.pos = d.pos
      GROUP BY d.vec_id, se.k
    ),
    assigned AS (
      SELECT vec_id, k, dd FROM (
        SELECT vec_id, k, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    upd AS (
      SELECT a.k, d.pos, CAST(SUM(d.xi) AS BIGINT) AS s
      FROM assigned a JOIN dims d ON d.vec_id = a.vec_id
      GROUP BY a.k, d.pos
    ),
    un AS (
      SELECT k, CAST(SUM(s::HUGEINT * s) AS DOUBLE) AS c2
      FROM upd GROUP BY k
    )
    SELECT a.k AS cluster,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(a.dd::HUGEINT) AS DOUBLE) / 1e12, 4) AS sse,
           ROUND(ANY_VALUE(sqrt(un.c2)) / (COUNT(*) * 1000000.0), 6)
             AS new_centroid_norm
    FROM assigned a
    JOIN un ON un.k = a.k
    GROUP BY a.k
    ORDER BY cluster
    """,
)
def kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # grid distances are exact integers — plain (dd, k) order suffices
    w = Window.partitionBy("vec_id").orderBy("dd", "k")
    assigned = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "k", "dd")
    )
    d19 = "decimal(19,0)"
    upd = (
        assigned.join(dims, "vec_id")
        .groupBy("k", "pos")
        .agg(F.sum("xi").alias("s"))
    )
    un = upd.groupBy("k").agg(
        F.sum(F.col("s").cast(d19) * F.col("s").cast(d19))
        .cast("double")
        .alias("c2")
    )
    return (
        assigned.join(F.broadcast(un), "k")
        .groupBy(F.col("k").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("dd").cast(d19)).cast("double") / 1e12, 4
            ).alias("sse"),
            F.round(
                F.sqrt(F.first("c2")) / (F.count(F.lit(1)) * 1000000.0), 6
            ).alias("new_centroid_norm"),
        )
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# IVF over LEARNED cells: the k-means assignment (one seeded Lloyd
# step, same constants as kmeans_step) becomes the coarse quantizer;
# each query searches only its own learned cell. This is the real IVF
# build+probe pair — knn_ivf_label uses a given partition column, this
# one derives it. Candidates are bounded by cell population; the
# assignment reuses the dimension-level dataflow (seeds broadcast).
# --------------------------------------------------------------------------
_IVF_CTES = f"""
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    seeds AS (
      SELECT vec_id AS k, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS si
      FROM v WHERE vec_id < {KMEANS_K}
    ),
    dist AS (
      -- grid-integer distances (kmeans_step round-8 hardening): exact
      -- in any accumulation order, so no float tie-break is needed
      SELECT d.vec_id, se.k,
             CAST(SUM((d.xi - se.si) * (d.xi - se.si)) AS BIGINT) AS dd
      FROM dims d JOIN seeds se ON se.pos = d.pos
      GROUP BY d.vec_id, se.k
    ),
    assigned AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist
      ) WHERE rn = 1
    )
"""


@operator(
    "knn_ivf_kmeans",
    oracle=f"""
    WITH {_IVF_CTES},
    {_SQL_NORMS},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM embeddings q
      JOIN assigned aq ON aq.vec_id = q.vec_id
      JOIN assigned ac ON ac.k = aq.k
      JOIN embeddings c ON c.vec_id = ac.vec_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    )
    SELECT query_id, rnk, neighbor_id, ROUND(sim, 6) AS cosine
    FROM sims WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # grid distances are exact integers — plain (dd, k) order suffices
    wa = Window.partitionBy("vec_id").orderBy("dd", "k")
    assigned = (
        dist.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "k")
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .join(assigned, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("k").alias("cell"),
            F.col("embedding").alias("q_emb"),
        )
    )
    c = e.join(assigned, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("k").alias("cell"),
        F.col("embedding").alias("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_seq("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", F.round("sim", 6).alias("cosine"))
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Two-stage retrieval: int8-quantized coarse scan -> exact re-rank.
# Stage 1 scores every candidate with the INTEGER dot product of the
# symmetric-int8 codes (embedding_quantize's formula) and keeps a
# _RERANK_POOL-deep pool per query; stage 2 re-ranks only that pool
# with exact float cosine and emits TOP_K. This is the standard
# production ANN serving shape (quantized store + rerank): stage 1
# reads 4-8x less memory bandwidth per candidate, stage 2 touches
# O(pool) full-precision vectors per query instead of O(N).
#
# Integer stage-1 scores are EXACTLY reproducible across engines (no
# float accumulation-order drift), so the pool boundary is
# deterministic — the whole pipeline differential-tests cleanly.
# Scale: the pool stage would ride the IVF/LSH candidate generators
# above at 100 TB (stage 1 here is the dense-scan form); the rerank
# join back to full vectors is keyed on vec_id — bounded shuffle.
# --------------------------------------------------------------------------
_RERANK_POOL = 20
_QUANT_AMAX_SQL = (
    "list_aggregate(list_transform(embedding, "
    "y -> abs(CAST(y AS DOUBLE))), 'max')"
)


@operator(
    "knn_quantized_rerank",
    oracle=f"""
    WITH {_SQL_NORMS},
    qcodes AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 127 /
                         {_QUANT_AMAX_SQL}) AS BIGINT)) AS qv
      FROM embeddings
      WHERE {_QUANT_AMAX_SQL} > 0
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST((SELECT SUM(z.a * z.b) FROM
                   (SELECT UNNEST(q.qv) AS a, UNNEST(c.qv) AS b) z)
                  AS BIGINT) AS q_dot,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM qcodes q JOIN qcodes c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    pool AS (
      SELECT query_id, neighbor_id, q_dot, d,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY q_dot DESC, neighbor_id) AS r1
      FROM dots
    ),
    rerank AS (
      SELECT query_id, neighbor_id, q_dot,
             d / (nq.nrm * nc.nrm) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM pool
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
      WHERE r1 <= {_RERANK_POOL}
    )
    SELECT query_id, rnk, neighbor_id, q_dot, ROUND(sim, 6) AS cosine
    FROM rerank WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def knn_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    absd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    coded = (
        e.withColumn("amax", F.array_max(absd))
        .filter(F.col("amax") > 0)
        .withColumn(
            "qv",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 127 / F.col("amax")).cast(
                    "long"
                ),
            ),
        )
        .select("vec_id", "embedding", "qv")
    )
    q = coded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("qv").alias("q_qv"),
    )
    c = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("qv").alias("c_qv"),
    )
    q_dot = F.aggregate(
        F.zip_with("q_qv", "c_qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("q_dot").desc(), "neighbor_id"
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("q_dot", q_dot)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _RERANK_POOL)
        .withColumn("sim", cosine("q_emb", "c_emb"))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "rnk",
            "neighbor_id",
            "q_dot",
            F.round("sim", 6).alias("cosine"),
        )
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Dominant principal component via power iteration (2 steps from a
# fixed deterministic uniform start) — the embedding-drift / whitening
# primitive. All linear algebra is dimension-level rows (posexplode),
# so no step ever shuffles a whole vector: each iteration is one
# per-vector dot (groupBy vec_id) + one per-dimension accumulation
# (groupBy dim) + a 1-row rescale broadcast. The centered matrix
# subplan recurs across iterations — at 100 TB you persist it once
# (StorageLevel.DISK) instead of recomputing; the per-iteration
# shuffle count is what matters and it is 2 keyed aggs, independent
# of N.
#
# Engine parity by construction (round-8 hardening; previously the
# only remaining fact-scale double sums in the embedding family):
# coordinates snap onto the 1e6 grid, centering subtracts the ROUNDED
# grid mean (an exact integer), and every fact-scale reduction is an
# exact 128-bit integer sum. Normalization would break exactness
# (norms overflow 128 bits when squared), so each iterate is instead
# RESCALED onto a 1e6 grid by its max-|component| — power iteration
# is scale-invariant, so rescaling replaces normalization losslessly
# — and the final loading divides the grid iterate by its exactly-
# summable grid norm: one pinned double expression. The uniform
# start vector folds into the first rescale (scale invariance), so
# no v0 constant appears.
# --------------------------------------------------------------------------
@operator(
    "pca_power_iteration",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    x AS (
      SELECT vec_id, generate_subscripts(e, 1) AS dim,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ctr AS (
      SELECT dim,
             CAST(ROUND(CAST(SUM(xi) AS DOUBLE)
                        / (SELECT n FROM nn)) AS BIGINT) AS cm
      FROM x GROUP BY dim
    ),
    c AS (
      SELECT x.vec_id, x.dim, x.xi - ctr.cm AS zc
      FROM x JOIN ctr USING (dim)
    ),
    y AS (SELECT vec_id, CAST(SUM(zc) AS BIGINT) AS yv FROM c GROUP BY 1),
    w1 AS (
      SELECT c.dim, SUM(c.zc::HUGEINT * y.yv) AS w
      FROM c JOIN y USING (vec_id) GROUP BY 1
    ),
    v1 AS (
      SELECT dim,
             CAST(ROUND(CAST(w AS DOUBLE)
                        / CAST((SELECT MAX(ABS(w)) FROM w1) AS DOUBLE)
                        * 1000000) AS BIGINT) AS vg
      FROM w1
    ),
    s2 AS (
      SELECT c.vec_id, CAST(SUM(c.zc * v1.vg) AS BIGINT) AS s
      FROM c JOIN v1 USING (dim) GROUP BY 1
    ),
    w2 AS (
      SELECT c.dim, SUM(c.zc::HUGEINT * s2.s) AS w
      FROM c JOIN s2 USING (vec_id) GROUP BY 1
    ),
    w2g AS (
      SELECT dim,
             CAST(ROUND(CAST(w AS DOUBLE)
                        / CAST((SELECT MAX(ABS(w)) FROM w2) AS DOUBLE)
                        * 1000000) AS BIGINT) AS wg
      FROM w2
    ),
    nrm AS (
      SELECT CAST(SUM(wg::HUGEINT * wg) AS DOUBLE) AS n2 FROM w2g
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(CAST(wg AS DOUBLE) / sqrt((SELECT n2 FROM nrm)), 6)
             AS loading
    FROM w2g ORDER BY dim
    """,
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    d19 = "decimal(19,0)"
    # 1-based dim to match DuckDB's generate_subscripts
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("d0", "xf")
    ).select(
        "vec_id",
        (F.col("d0") + 1).cast("bigint").alias("dim"),
        F.round(F.col("xf").cast("double") * 1000000)
        .cast("bigint")
        .alias("xi"),
    )
    nn = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ctr = (
        x.groupBy("dim")
        .agg(F.sum("xi").alias("mm"))
        .crossJoin(F.broadcast(nn))
        .select(
            "dim",
            F.round(F.col("mm").cast("double") / F.col("n"))
            .cast("bigint")
            .alias("cm"),
        )
    )
    c = x.join(F.broadcast(ctr), "dim").select(
        "vec_id", "dim", (F.col("xi") - F.col("cm")).alias("zc")
    )
    y = c.groupBy("vec_id").agg(F.sum("zc").cast("bigint").alias("yv"))
    w1 = (
        c.join(y, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("zc").cast(d19) * F.col("yv").cast(d19)).alias("w"))
    )
    w1mx = w1.agg(F.max(F.abs(F.col("w"))).alias("wm"))
    v1 = w1.crossJoin(F.broadcast(w1mx)).select(
        "dim",
        F.round(
            F.col("w").cast("double") / F.col("wm").cast("double") * 1000000
        )
        .cast("bigint")
        .alias("vg"),
    )
    s2 = (
        c.join(F.broadcast(v1), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("zc") * F.col("vg")).cast("bigint").alias("s"))
    )
    w2 = (
        c.join(s2, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("zc").cast(d19) * F.col("s").cast(d19)).alias("w"))
    )
    w2mx = w2.agg(F.max(F.abs(F.col("w"))).alias("wm"))
    w2g = w2.crossJoin(F.broadcast(w2mx)).select(
        "dim",
        F.round(
            F.col("w").cast("double") / F.col("wm").cast("double") * 1000000
        )
        .cast("bigint")
        .alias("wg"),
    )
    nrm = w2g.agg(
        F.sum(F.col("wg").cast(d19) * F.col("wg").cast(d19))
        .cast("double")
        .alias("n2")
    )
    return (
        w2g.crossJoin(F.broadcast(nrm))
        .select(
            "dim",
            F.round(
                F.col("wg").cast("double") / F.sqrt("n2"), 6
            ).alias("loading"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# Embedding outlier scoring: diagonal-covariance Mahalanobis distance
# per vector — the standard embedding-space health check (prune or
# re-embed vectors far from the corpus distribution) that runs before
# clustering/ANN indexing. Dimension-level rows again: one pass for
# per-dim mean/variance (population form), one join back, one per-
# vector sum — no whole vector crosses a shuffle, and the per-dim
# stats table (64 rows) broadcasts. Population variance (not sample)
# keeps the formula division-free until the final score.
# --------------------------------------------------------------------------
_MAHA_TOP = 20


@operator(
    "embedding_outlier_mahalanobis",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, generate_subscripts(e, 1) AS dim, UNNEST(e) AS v,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    stats AS (
      -- per-dim moments from snapped-coordinate integer sums (exact
      -- in any accumulation order — round-8 hardening); mu/var are
      -- one pinned double expression each
      SELECT dim,
             CAST(SUM(xi) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mu,
             CAST(SUM(xi::HUGEINT * xi) AS DOUBLE) / (COUNT(*) * 1e12)
               - (CAST(SUM(xi) AS DOUBLE) / (COUNT(*) * 1000000.0))
                 * (CAST(SUM(xi) AS DOUBLE) / (COUNT(*) * 1000000.0))
               AS var_pop
      FROM x GROUP BY dim
    ),
    scores AS (
      SELECT x.vec_id,
             SUM((x.v - s.mu) * (x.v - s.mu) / s.var_pop) AS d2
      FROM x JOIN stats s ON s.dim = x.dim
      WHERE s.var_pop > 0
      GROUP BY x.vec_id
    )
    SELECT vec_id, ROUND(d2, 4) AS mahalanobis_sq
    FROM scores
    ORDER BY d2 DESC, vec_id
    LIMIT {_MAHA_TOP}
    """,
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("d0", "vf")
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("dim"),
        F.col("vf").cast("double").alias("v"),
        F.round(F.col("vf").cast("double") * 1000000)
        .cast("bigint")
        .alias("xi"),
    )
    # per-dim moments from exact integer sums (order-free), one pinned
    # double expression each; the per-vector score below is a bounded
    # 64-term fold of identical doubles in both engines
    d19 = "decimal(19,0)"
    s1 = F.sum("xi").cast("double")
    s2 = F.sum(F.col("xi").cast(d19) * F.col("xi").cast(d19)).cast("double")
    cnt = F.count(F.lit(1))
    mu = s1 / (cnt * 1000000.0)
    stats = x.groupBy("dim").agg(
        mu.alias("mu"),
        (s2 / (cnt * 1e12) - mu * mu).alias("var_pop"),
    )
    scores = (
        x.join(F.broadcast(stats.filter(F.col("var_pop") > 0)), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("v") - F.col("mu")) * (F.col("v") - F.col("mu"))
                / F.col("var_pop")
            ).alias("d2")
        )
    )
    return (
        scores.orderBy(F.col("d2").desc(), "vec_id")
        .limit(_MAHA_TOP)
        .select("vec_id", F.round("d2", 4).alias("mahalanobis_sq"))
    )


# --------------------------------------------------------------------------
# Product-quantization (PQ) code assignment: split the 64-dim vector
# into _PQ_SUB contiguous subspaces and assign each sub-vector to its
# nearest codebook centroid (codebook = the first _PQ_K vectors'
# sub-vectors — the deterministic seed convention `kmeans_step`
# already uses). PQ is the memory layer under IVF-PQ serving indexes:
# 64 floats become _PQ_SUB uint8 codes (here 4 x log2(16) = 16 bits
# per vector, a 128x compression).
#
# Scale posture: identical to `kmeans_step` — everything runs on
# dimension-level rows (vec_id, pos, x); the codebook side is
# _PQ_SUB * _PQ_K * (64/_PQ_SUB) rows (= 64 * _PQ_K, KBs) and
# broadcasts; distances are one grouped SUM per (vec, subspace,
# centroid); argmin is a bounded window over _PQ_K candidate rows on
# grid-integer distances (the kmeans_step round-8 hardening — exact
# in any accumulation order, so no float tie-break is needed).
# Output: per (subspace, code) population + quantization error — the
# codebook-balance audit a PQ build runs before shipping an index.
# --------------------------------------------------------------------------
_PQ_SUB = 4      # subspaces (64 dims -> 16 dims each)
_PQ_K = 16       # centroids per subspace codebook
_PQ_DIM = 64


@operator(
    "embedding_pq_assign",
    oracle=f"""
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
    codebook AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
    ),
    dist AS (
      SELECT d.vec_id, d.sub, cb.code,
             CAST(SUM((d.xi - cb.ci) * (d.xi - cb.ci)) AS BIGINT) AS dd
      FROM dims d
      JOIN codebook cb ON cb.pos = d.pos AND cb.sub = d.sub
      GROUP BY 1, 2, 3
    ),
    assigned AS (
      SELECT vec_id, sub, code, dd FROM (
        SELECT vec_id, sub, code, dd,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM dist
      ) WHERE rn = 1
    )
    SELECT sub, code,
           COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(dd::HUGEINT) AS DOUBLE) / 1e12, 4) AS sq_error
    FROM assigned
    GROUP BY 1, 2
    ORDER BY sub, code
    """,
)
def embedding_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    codebook = (
        e.filter(F.col("vec_id") < _PQ_K)
        .select(
            F.col("vec_id").alias("code"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos0", "x"),
        )
        .select(
            "code",
            ((F.col("pos0") * _PQ_SUB) / _PQ_DIM).cast("long").alias("cb_sub"),
            (F.col("pos0") + 1).alias("cb_pos"),
            grid.alias("ci"),
        )
    )
    diff = F.col("xi") - F.col("ci")
    dist = (
        dims.join(
            F.broadcast(codebook),
            (F.col("cb_pos") == F.col("pos")) & (F.col("cb_sub") == F.col("sub")),
        )
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
    )
    # grid distances are exact integers — plain (dd, code) order suffices
    w = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
    assigned = dist.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    d19 = "decimal(19,0)"
    return (
        assigned.groupBy("sub", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("dd").cast(d19)).cast("double") / 1e12, 4
            ).alias("sq_error"),
        )
        .orderBy("sub", "code")
    )

