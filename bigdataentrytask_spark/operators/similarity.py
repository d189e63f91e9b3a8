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
from bigdataentrytask_spark.operators import materialize, operator, with_persisted
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
    sim = cosine("q_emb", "c_emb")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
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
        .withColumn("sim", cosine("q_emb", "c_emb"))
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
    # bucket every vector ONCE (persisted) — the query side is a filter
    # of the same bucketed frame, not a second 30-projection pass; the
    # blocks are released before returning (the output is the bounded
    # N_QUERIES x TOP_K ranking, so materialize applies)
    bucketed = _bucketed(e)
    with with_persisted(bucketed):
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
        return materialize(
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
    a = base.select(
        "vec_id",
        "embedding",
        F.col("g").alias("ti"),
        F.explode(F.expr(f"sequence(g, {g - 1})")).alias("tj"),
    )
    # B side carries RENAMED payload columns: both sides derive from
    # the same scan, and Spark's cogroup attribute deduplication can
    # conflate same-exprId payload columns across sides — observed at
    # the 8x stress corpus as the right-side Arrow batch arriving with
    # only the key columns (KeyError: 'vec_id' in the kernel). Fresh
    # aliases force distinct attributes on the B side.
    b = base.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("embedding").alias("b_embedding"),
        F.explode(F.expr("sequence(0, g)")).alias("ti"),
        F.col("g").alias("tj"),
    )
    # Each tile is ONE cogroup: its A rows and B rows cross Arrow once
    # (O(N*G) vectors move, ~N/G per tile), and the N^2/G^2 pair dots
    # happen inside the tile kernel as G^2 vectorized outer-product
    # accumulations — NOT as a 1KB-per-pair join stream (the previous
    # pair-join formulation shipped both embeddings through Arrow for
    # every pair: ~12 GB at sf0.1, measured 15.4s vs 2.2s for this).
    # Cross-group pairs meet in exactly one tile (ti < tj); same-group
    # pairs meet in tile (g, g), deduped inside the kernel by id order.
    pairs = (
        a.groupBy("ti", "tj")
        .cogroup(b.groupBy("ti", "tj"))
        .applyInPandas(
            _neardup_tile(NEARDUP_COS), schema="vec_a long, vec_b long, raw double"
        )
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
    """Tile kernel: all qualifying A x B cosines for one (ti, tj) tile.

    The dot matrix accumulates column-sequentially
    (``D += X[:, j] outer Y[:, j]`` for j in order) so every pairwise
    dot — and both norms — is IEEE-identical to the per-pair Column
    fold and the DuckDB oracle (functions/vector.py bit-identity
    argument). Emission pre-filters on raw cosine at ``tau - 1e-6``;
    the exact >= tau decision is made on the JVM-rounded value so the
    kernel never owns a rounding-mode decision.
    """
    margin = tau - 1e-6

    def fn(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "raw": pd.Series(dtype="float64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        ti = int(left["ti"].iloc[0])
        tj = int(left["tj"].iloc[0])
        ia = left["vec_id"].to_numpy()
        ib = right["b_vec_id"].to_numpy()
        X = stack_f64(left["embedding"])
        Y = stack_f64(right["b_embedding"])
        D = np.zeros((len(ia), len(ib)))
        for j in range(X.shape[1]):
            D += X[:, j][:, None] * Y[:, j][None, :]
        na = np.sqrt(seq_dot(X, X))
        nb = np.sqrt(seq_dot(Y, Y))
        with np.errstate(invalid="ignore", divide="ignore"):
            C = D / (na[:, None] * nb[None, :])
            mask = C >= margin
        if ti == tj:
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
    dedup happens here too: member codes for ALL tables are recomputed
    from HYPERPLANES and a pair is emitted only when this bucket's
    table is the first whose codes collide."""
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
        # first table whose codes agree, per member pair
        codes = np.zeros((n, LSH_TABLES), dtype=np.int64)
        for t, planes in enumerate(HYPERPLANES):
            code = np.zeros(n, dtype=np.int64)
            for i, plane in enumerate(planes):
                proj = np.zeros(n)
                for j in range(EMB_DIM):
                    proj += X[:, j] * plane[j]
                code |= (proj > 0).astype(np.int64) << i
            codes[:, t] = code
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
    bucketed = e.select(
        "vec_id",
        "embedding",
        F.posexplode(_lsh_codes("embedding")).alias("t", "code"),
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


# --------------------------------------------------------------------------
# Round-5 compositions over the exact near-dup layer: a similarity
# histogram and a threshold-sweep calibration curve. Both reuse the
# verified pair machinery (`embedding_neardup_pairs` — tiled Arrow
# kernels above NEARDUP_COS) and its oracle as a CTE, so the
# candidate set itself stays differentially checked.
# --------------------------------------------------------------------------
def _register_pair_compositions() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    hist_oracle = f"""
    WITH pairs AS ({ORACLES["embedding_neardup_pairs"]})
    SELECT CAST(FLOOR(cosine * 20) AS BIGINT) AS sim_bin,
           CAST(COUNT(*) AS BIGINT)           AS n_pairs,
           ROUND(MIN(cosine), 6)              AS bin_min,
           ROUND(MAX(cosine), 6)              AS bin_max
    FROM pairs GROUP BY 1 ORDER BY sim_bin
    """

    @operator("pairwise_sim_histogram", oracle=hist_oracle)
    def pairwise_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cosine-similarity histogram (0.05-wide bins) of the
        above-threshold pair population — the corpus-duplication
        profile a dedup-threshold decision is read from. Bins are cut
        on the 6-decimal ROUNDED cosine (both engines bin the
        identical value)."""
        pairs = REGISTRY["embedding_neardup_pairs"](spark, sf_dir)
        return (
            pairs.groupBy(
                F.floor(F.col("cosine") * 20).cast("bigint").alias("sim_bin")
            )
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.round(F.min("cosine"), 6).alias("bin_min"),
                F.round(F.max("cosine"), 6).alias("bin_max"),
            )
            .orderBy("sim_bin")
        )

    sweep_oracle = f"""
    WITH pairs AS ({ORACLES["embedding_neardup_pairs"]}),
    taus AS (SELECT UNNEST(CAST([0.40, 0.50, 0.60, 0.70, 0.80, 0.90]
                           AS DOUBLE[])) AS tau)
    SELECT tau,
           CAST(COUNT(p.cosine) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT p.vec_a) + COUNT(DISTINCT p.vec_b)
                AS BIGINT)                 AS n_touched_sides
    FROM taus LEFT JOIN pairs p ON p.cosine >= taus.tau
    GROUP BY 1 ORDER BY tau
    """

    @operator("neardup_threshold_sweep", oracle=sweep_oracle)
    def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dedup-threshold calibration: how many pairs (and distinct
        endpoint docs) survive each candidate cosine cutoff — computed
        in ONE pass over the verified pair table (the pair build is
        not repeated per threshold)."""
        pairs = REGISTRY["embedding_neardup_pairs"](spark, sf_dir)
        # NO tau join at all: an outer theta-join against the pair
        # table cannot broadcast the 6-row side (BNLJ may only build
        # the non-preserved side, whichever way the outer points), so
        # the thresholds become conditional aggregates in ONE pass
        # over the pair table, unpivoted to rows afterwards
        taus = (0.40, 0.50, 0.60, 0.70, 0.80, 0.90)
        aggs = []
        for i, t in enumerate(taus):
            hit = F.col("cosine") >= t
            aggs.append(
                F.coalesce(F.sum(hit.cast("bigint")), F.lit(0))
                .cast("bigint")
                .alias(f"np_{i}")
            )
            aggs.append(
                (
                    F.count_distinct(F.when(hit, F.col("vec_a")))
                    + F.count_distinct(F.when(hit, F.col("vec_b")))
                ).cast("bigint").alias(f"nt_{i}")
            )
        wide = pairs.agg(*aggs)
        stacked = wide.select(
            F.expr(
                "stack({n}, {args}) AS (tau, n_pairs, n_touched_sides)".format(
                    n=len(taus),
                    args=", ".join(
                        f"double({t}), np_{i}, nt_{i}"
                        for i, t in enumerate(taus)
                    ),
                )
            )
        )
        return stacked.orderBy("tau")


_register_pair_compositions()


def _register_knn_recall_eval() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH bf AS ({ORACLES["knn_bruteforce"]}),
    approx AS ({ORACLES["knn_lsh"]}),
    hits AS (
      SELECT bf.query_id,
             CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(*) AS BIGINT)             AS n_truth
      FROM bf LEFT JOIN approx a
        ON a.query_id = bf.query_id AND a.neighbor_id = bf.neighbor_id
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT)        AS n_queries,
           CAST(SUM(n_hits) AS BIGINT)     AS n_hits,
           CAST(SUM(n_truth) AS BIGINT)    AS n_truth,
           ROUND(SUM(n_hits) / CAST(SUM(n_truth) AS DOUBLE), 6)
                                           AS recall_at_k
    FROM hits
    """

    @operator("knn_recall_eval", oracle=oracle)
    def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall@k of single-probe LSH ANN against the brute-force
        truth — the eval every ANN deployment publishes next to its
        speedup (the multiprobe variant's measured lift, 0.44→0.90,
        lives in the knn_lsh_multiprobe notes). Composes the two
        verified plans; micro join on (query, neighbor)."""
        bf = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        ap = (
            REGISTRY["knn_lsh"](spark, sf_dir)
            .select("query_id", "neighbor_id")
            .withColumn("hit", F.lit(1))
        )
        hits = (
            bf.join(ap, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                F.sum(F.coalesce("hit", F.lit(0)))
                .cast("bigint")
                .alias("n_hits"),
                F.count(F.lit(1)).alias("n_truth"),
            )
        )
        return hits.agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("n_hits").cast("bigint").alias("n_hits"),
            F.sum("n_truth").cast("bigint").alias("n_truth"),
            F.round(
                F.sum("n_hits") / F.sum("n_truth").cast("double"), 6
            ).alias("recall_at_k"),
        )


_register_knn_recall_eval()


@operator(
    "lsh_bucket_balance",
    oracle=f"""
    WITH {_sql_planes()},
    {_SQL_CODES},
    occ AS (
      SELECT t, code, CAST(COUNT(*) AS BIGINT) AS sz
      FROM codes GROUP BY 1, 2
    )
    SELECT t AS table_id,
           CAST(COUNT(*) AS BIGINT)  AS n_buckets,
           CAST(MAX(sz) AS BIGINT)   AS max_bucket,
           CAST(MIN(sz) AS BIGINT)   AS min_bucket,
           ROUND(MAX(sz) / (SUM(sz) / CAST(COUNT(*) AS DOUBLE)), 6)
                                     AS skew_ratio,
           CAST(SUM(sz * sz) AS BIGINT) AS sum_sq_sizes
    FROM occ GROUP BY 1 ORDER BY table_id
    """,
)
def lsh_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-occupancy balance per hash table — THE capacity
    diagnostic for every bucket-kernel operator here (`knn_lsh`,
    `embedding_neardup_lsh`): sum of squared bucket sizes IS the
    candidate-pair volume, and max/mean skew predicts the straggler
    kernel. Reuses the shared hyperplane codes; one count per
    (table, code)."""
    e = _emb(spark, sf_dir)
    keyed = e.select(
        "vec_id", F.explode(_bucket_keys("embedding")).alias("k")
    ).select("k.t", "k.code")
    occ = keyed.groupBy("t", "code").agg(F.count(F.lit(1)).alias("sz"))
    return (
        occ.groupBy(F.col("t").alias("table_id"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").cast("bigint").alias("max_bucket"),
            F.min("sz").cast("bigint").alias("min_bucket"),
            F.round(
                F.max("sz") / (F.sum("sz") / F.count(F.lit(1)).cast("double")),
                6,
            ).alias("skew_ratio"),
            F.sum(F.col("sz") * F.col("sz"))
            .cast("bigint")
            .alias("sum_sq_sizes"),
        )
        .orderBy("table_id")
    )


_MRL_DIM = 16  # matryoshka prefix length


@operator(
    "matryoshka_prefix_recall",
    oracle=f"""
    WITH bf AS (
      WITH norms AS (
        SELECT vec_id,
               sqrt((SELECT SUM(u.e * u.e) FROM
                     (SELECT UNNEST(embedding::DOUBLE[]) AS e) u)) AS nrm
        FROM embeddings
      ),
      dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               (SELECT SUM(z.qe * z.ce) FROM
                (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                        UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
      )
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY d / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
      QUALIFY rnk <= {TOP_K}
    ),
    pre AS (
      WITH pnorms AS (
        SELECT vec_id,
               sqrt((SELECT SUM(u.e * u.e) FROM
                     (SELECT UNNEST((embedding::DOUBLE[])[1:{_MRL_DIM}])
                        AS e) u)) AS nrm
        FROM embeddings
      ),
      pdots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               (SELECT SUM(z.qe * z.ce) FROM
                (SELECT UNNEST((q.embedding::DOUBLE[])[1:{_MRL_DIM}]) AS qe,
                        UNNEST((c.embedding::DOUBLE[])[1:{_MRL_DIM}]) AS ce)
                  z) AS d
        FROM embeddings q, embeddings c
        WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
      )
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY d / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rnk
      FROM pdots
      JOIN pnorms nq ON nq.vec_id = query_id
      JOIN pnorms nc ON nc.vec_id = neighbor_id
      QUALIFY rnk <= {TOP_K}
    )
    SELECT CAST(COUNT(DISTINCT bf.query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT)                    AS n_truth,
           CAST(COUNT(p.neighbor_id) AS BIGINT)        AS n_hits,
           ROUND(COUNT(p.neighbor_id) / CAST(COUNT(*) AS DOUBLE), 6)
                                                       AS prefix_recall
    FROM bf LEFT JOIN pre p
      ON p.query_id = bf.query_id AND p.neighbor_id = bf.neighbor_id
    """,
)
def matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation eval: top-k retrieval on
    the first _MRL_DIM dimensions vs the full-vector truth (Kusupati et
    al., 2022 — MRL prefixes as cheap first-stage retrievers). The
    production shape is prefix-ANN then full-dim re-rank
    (`knn_quantized_rerank` is the int8 sibling); this operator
    measures what the prefix alone retains. Both sides are bounded by
    N_QUERIES, so the scan stays linear in the corpus."""
    e = _emb(spark, sf_dir)
    full_q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
    )

    def topk(pref):
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), "neighbor_id"
        )
        base = (
            F.broadcast(
                full_q.select(
                    "query_id",
                    (
                        F.slice(F.col("q_emb"), 1, _MRL_DIM)
                        if pref
                        else F.col("q_emb")
                    ).alias("qv"),
                )
            )
            .crossJoin(
                corpus.select(
                    "neighbor_id",
                    (
                        F.slice(F.col("c_emb"), 1, _MRL_DIM)
                        if pref
                        else F.col("c_emb")
                    ).alias("cv"),
                )
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("sim", cosine("qv", "cv"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
        )
        return base.select("query_id", "neighbor_id")

    bf = topk(pref=False)
    pre = topk(pref=True).withColumn("hit", F.lit(1))
    j = bf.join(pre, ["query_id", "neighbor_id"], "left")
    return j.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("prefix_recall"),
    )


_DRIFT_CUT = 250  # vec_id split between "old" and "new" halves


@operator(
    "embedding_centroid_drift",
    oracle=f"""
    WITH dims AS (
      SELECT label,
             CASE WHEN vec_id < {_DRIFT_CUT} THEN 0 ELSE 1 END AS half,
             i, CAST(ROUND(x * 1000000) AS BIGINT) AS xi
      FROM (SELECT label, vec_id,
                   UNNEST(embedding::DOUBLE[]) AS x,
                   UNNEST(range(len(embedding))) AS i
            FROM embeddings)
    ),
    cent AS (
      SELECT label, half, i, CAST(SUM(xi) AS BIGINT) AS s
      FROM dims GROUP BY 1, 2, 3
    ),
    paired AS (
      SELECT a.label, a.i, a.s AS s0, b.s AS s1
      FROM cent a JOIN cent b
        ON b.label = a.label AND b.i = a.i AND a.half = 0 AND b.half = 1
    )
    SELECT label,
           ROUND(CAST(SUM(s0::HUGEINT * s1) AS DOUBLE)
                 / (sqrt(CAST(SUM(s0::HUGEINT * s0) AS DOUBLE))
                    * sqrt(CAST(SUM(s1::HUGEINT * s1) AS DOUBLE))), 6)
             AS centroid_cosine
    FROM paired GROUP BY 1 ORDER BY label
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label centroid of the 'old' half
    of the corpus vs the 'new' half, compared by cosine — the check
    that catches a silently swapped/retrained embedding model before
    it poisons the ANN index. Dimension-level rows throughout (the
    kmeans_step posture): centroids are (label, half, dim) grouped
    means; no whole-vector shuffles, no driver collect.

    Engine parity by construction (round-8 hardening): the per-half
    scale 1/(n_half * g) cancels out of the cosine, so it reduces to
    the snapped per-dimension centroid SUMS — exact integers in any
    summation order — with one pinned double expression at the end
    (the centroid_affinity_matrix argument)."""
    e = _emb(spark, sf_dir)
    dims = e.select(
        "label",
        (F.col("vec_id") >= _DRIFT_CUT).cast("int").alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i", "x"
        ),
    ).select(
        "label", "half", "i",
        F.round(F.col("x") * 1000000).cast("bigint").alias("xi"),
    )
    cent = dims.groupBy("label", "half", "i").agg(F.sum("xi").alias("s"))
    d19 = "decimal(19,0)"
    a = cent.filter(F.col("half") == 0).select(
        "label", "i", F.col("s").cast(d19).alias("s0")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "i", F.col("s").cast(d19).alias("s1")
    )
    paired = a.join(b, ["label", "i"])
    return (
        paired.groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("s0") * F.col("s1")).cast("double")
                / (
                    F.sqrt(F.sum(F.col("s0") * F.col("s0")).cast("double"))
                    * F.sqrt(F.sum(F.col("s1") * F.col("s1")).cast("double"))
                ),
                6,
            ).alias("centroid_cosine")
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Per-dimension moment profile of the embedding table (round 7): the
# PCA-readiness / dead-dimension diagnostic. A healthy embedding
# space has roughly isotropic per-dimension variance; collapsed or
# dominant dimensions distort every cosine downstream, and this is
# the one-pass check that catches them (the per-dim twin of
# embedding_norms' per-vector view). Dimension-level rows only — the
# whole-vector payload is never shuffled, and the 64-key aggregation
# is map-side combinable.
# --------------------------------------------------------------------------
@operator(
    "embedding_dim_variance",
    oracle="""
    WITH dims AS (
      SELECT generate_subscripts(e, 1) - 1 AS pos, UNNEST(e) AS x,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM (SELECT embedding::DOUBLE[] AS e FROM embeddings)
    )
    SELECT pos,
           CAST(COUNT(*) AS BIGINT)                          AS n,
           ROUND(CAST(SUM(xi) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6)                AS mean,
           ROUND((CAST(SUM(xi::HUGEINT * xi) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(xi) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(xi) AS DOUBLE) / COUNT(*)))
                 / 1e12, 6)                                  AS variance,
           ROUND(MIN(x), 6)                                  AS min_x,
           ROUND(MAX(x), 6)                                  AS max_x
    FROM dims GROUP BY pos ORDER BY pos
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 hardening: mean/variance come from snapped-coordinate
    integer power sums (exact in any summation order; min/max need no
    treatment — extrema of identical doubles are order-free), with one
    pinned double expression per output. Moments are of the grid-
    snapped values; at g = 1e6 the snap perturbs the variance by
    O(1e-13), far below the 6-dp readout."""
    dims = _emb(spark, sf_dir).select(
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "x")
    ).select(
        "pos", "x", F.round(F.col("x") * 1000000).cast("bigint").alias("xi")
    )
    d19 = "decimal(19,0)"
    s1 = F.sum("xi").cast("double")
    s2 = F.sum(F.col("xi").cast(d19) * F.col("xi").cast(d19)).cast("double")
    cnt = F.count(F.lit(1))
    return (
        dims.groupBy("pos")
        .agg(
            cnt.alias("n"),
            F.round(s1 / (cnt * 1000000.0), 6).alias("mean"),
            F.round(
                (s2 / cnt - (s1 / cnt) * (s1 / cnt)) / 1e12, 6
            ).alias("variance"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
        .orderBy("pos")
    )


# --------------------------------------------------------------------------
# Label-centroid affinity matrix: pairwise cosine between the class
# centroids of embedding_label_centroids — the confusability map
# that says which labels a cluster-based router or a semantic-dedup
# pass will blur together. Centroids are |labels| x |dims| rows; the
# pairwise join is |labels|²/2 over dimension-level rows — tiny at
# any corpus scale because the fact table reduced first.
#
# Engine parity by construction (round-8 hardening of the advisor-
# flagged double-AVG centroid): cosine is invariant to the per-label
# scale 1/(n*g), so it reduces to the SNAPPED per-dimension centroid
# SUMS S_pos = sum(round(x * 1e6)) — exact integers in any summation
# order — and cosine = sum(Sa*Sb) / (sqrt(sum Sa^2) * sqrt(sum Sb^2))
# is one pinned double expression over exact 128-bit inputs.
# --------------------------------------------------------------------------
@operator(
    "centroid_affinity_matrix",
    oracle="""
    WITH dims AS (
      SELECT label, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    cent AS (
      SELECT label, pos, CAST(SUM(xi) AS BIGINT) AS s FROM dims
      GROUP BY label, pos
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(SUM(a.s::HUGEINT * b.s) AS DOUBLE) AS dot,
             CAST(SUM(a.s::HUGEINT * a.s) AS DOUBLE) AS na2,
             CAST(SUM(b.s::HUGEINT * b.s) AS DOUBLE) AS nb2
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           ROUND(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cosine
    FROM pairs ORDER BY label_a, label_b
    """,
)
def centroid_affinity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = _emb(spark, sf_dir).select(
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "x"),
    ).select(
        "label", "pos", F.round(F.col("x") * 1000000).cast("bigint").alias("xi")
    )
    cent = dims.groupBy("label", "pos").agg(F.sum("xi").alias("s"))
    d19 = "decimal(19,0)"
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("s").cast(d19).alias("sa")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos", F.col("s").cast(d19).alias("sb")
    )
    pairs = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("double").alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).cast("double").alias("na2"),
            F.sum(F.col("sb") * F.col("sb")).cast("double").alias("nb2"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")), 6
        ).alias("cosine"),
    ).orderBy("label_a", "label_b")


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of the exact and LSH retrievers (round 7):
# the standard hybrid-search combiner — score(d) = Σ_lists
# 1/(K + rank_list(d)) with K = 60, over the two top-k lists the
# registry already verifies independently (knn_bruteforce truth,
# knn_lsh production path). RRF needs no score calibration between
# retrievers, which is exactly why fusion layers use it. Ranks are
# INTEGERS, so the fused score is the same IEEE double on both
# engines and the (rrf DESC, neighbor_id) cutoff is deterministic.
# Scale: operates on the top-k lists (|queries| x k rows), never the
# corpus — the fusion cost is independent of collection size.
# --------------------------------------------------------------------------
def _register_rrf_fusion() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    k_rrf = 60
    oracle = f"""
    WITH bf AS ({ORACLES["knn_bruteforce"]}),
    approx AS ({ORACLES["knn_lsh"]}),
    pooled AS (
      SELECT query_id, neighbor_id, rnk, 'exact' AS src FROM bf
      UNION ALL
      SELECT query_id, neighbor_id, rnk, 'lsh' FROM approx
    ),
    fused AS (
      SELECT query_id, neighbor_id,
             SUM(1.0 / ({k_rrf} + rnk))       AS rrf,
             CAST(COUNT(*) AS BIGINT)         AS n_lists
      FROM pooled GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id, rrf, n_lists,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, neighbor_id) AS fused_rank
      FROM fused
    )
    SELECT query_id, fused_rank, neighbor_id, n_lists,
           ROUND(rrf, 6) AS rrf_score
    FROM ranked WHERE fused_rank <= {TOP_K}
    ORDER BY query_id, fused_rank
    """

    @operator("knn_rrf_fusion", oracle=oracle)
    def knn_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the one-shot cost here is intrinsic (the fusion AUDITS the
        # exact and LSH rankings, so both verified paths must run);
        # with_persisted pins the pooled rankings for the fuse+rank
        # stage and materialize releases everything before returning
        # the bounded top-k table (queries x TOP_K rows)
        bf = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
            "query_id", "neighbor_id", "rnk"
        )
        ap = REGISTRY["knn_lsh"](spark, sf_dir).select(
            "query_id", "neighbor_id", "rnk"
        )
        pooled = bf.unionByName(ap)
        with with_persisted(pooled):
            fused = pooled.groupBy("query_id", "neighbor_id").agg(
                F.sum(1.0 / (F.lit(k_rrf) + F.col("rnk"))).alias("rrf"),
                F.count(F.lit(1)).alias("n_lists"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("rrf").desc(), "neighbor_id"
            )
            return materialize(
                fused.withColumn("fused_rank", F.row_number().over(w))
                .filter(F.col("fused_rank") <= TOP_K)
                .select(
                    "query_id",
                    "fused_rank",
                    "neighbor_id",
                    "n_lists",
                    F.round("rrf", 6).alias("rrf_score"),
                )
                .orderBy("query_id", "fused_rank")
            )


_register_rrf_fusion()


# --------------------------------------------------------------------------
# Transitivity audit of the near-duplicate graph (round-8 slate):
# near-duplication is "approximately transitive" — if a~b and b~c,
# usually a~c. The fraction of open wedges (3*triangles / wedges)
# quantifies how aggressive the downstream connected-component
# resolution (dedup_resolve / semdedup_resolve) will be: LOW
# transitivity means CC chains together documents that are NOT
# pairwise similar (the classic over-merging failure). Runs on the
# audit-scale exact pair set; wedge counts come from the degree
# histogram (sum d*(d-1)/2 — never a wedge enumeration), triangles
# from one ordered edge-edge-edge join over the bounded pair list.
# --------------------------------------------------------------------------
@operator(
    "neardup_transitivity_audit",
    oracle=f"""
    WITH pairs AS ({{NEARDUP}}),
    edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
      ) GROUP BY 1
    ),
    wed AS (
      SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           wed.n_wedges, tri.n_triangles,
           CAST(wed.n_wedges - 3 * tri.n_triangles AS BIGINT) AS n_open_wedges,
           CASE WHEN wed.n_wedges > 0
                THEN ROUND(3.0 * tri.n_triangles / wed.n_wedges, 6)
           END AS transitivity
    FROM wed CROSS JOIN tri
    """.replace("{NEARDUP}", _NEARDUP_ORACLE),
)
def neardup_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the exact tile-kernel pair set feeds FIVE consumers (degree
    # union x2, three triangle-join sides, edge count) — persist it so
    # the kernel runs once, not per consumer, and release the blocks
    # on exit (with_persisted + materialize; the audit is ONE row)
    edges = embedding_neardup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    with with_persisted(edges):
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionByName(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        wed = deg.agg(
            F.expr("CAST(sum(d * (d - 1)) div 2 AS BIGINT)").alias("n_wedges")
        )
        e1 = edges.select(F.col("a").alias("a1"), F.col("b").alias("b1"))
        e2 = edges.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
        e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
        tri = (
            e1.join(e2, (F.col("a2") == F.col("a1")) & (F.col("b2") > F.col("b1")))
            .join(e3, (F.col("a3") == F.col("b1")) & (F.col("b3") == F.col("b2")))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        )
        ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        j = ne.crossJoin(F.broadcast(wed)).crossJoin(F.broadcast(tri))
        return materialize(
            j.select(
                "n_edges",
                "n_wedges",
                "n_triangles",
                (F.col("n_wedges") - 3 * F.col("n_triangles")).cast("bigint").alias(
                    "n_open_wedges"
                ),
                F.when(
                    F.col("n_wedges") > 0,
                    F.round(
                        F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                    ),
                ).alias("transitivity"),
            )
        )


# --------------------------------------------------------------------------
# Mutual-kNN symmetry diagnostic (round-8 slate): the fraction of
# directed kNN edges whose reverse edge also exists, at k=1 and k=5.
# Low symmetry flags hubness (a few vectors appear in everyone's
# top-k — the curse-of-dimensionality failure mode that degrades both
# ANN recall and kNN-graph clustering). Exact all-pairs scoring, so
# audit-scale by contract (run on a corpus sample; the production ANN
# paths are knn_lsh / knn_ivf_kmeans); ranking reuses the
# knn_bruteforce ordering (raw sim desc, id asc) so the directed graph
# is deterministic in both engines.
# --------------------------------------------------------------------------
@operator(
    "mutual_knn_symmetry",
    oracle=f"""
    WITH {_SQL_NORMS},
    dots AS (
      SELECT q.vec_id AS src, c.vec_id AS dst,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY d / (ns.nrm * nd.nrm) DESC, dst) AS rnk
      FROM dots
      JOIN norms ns ON ns.vec_id = src
      JOIN norms nd ON nd.vec_id = dst
    ),
    knn AS (SELECT src, dst, rnk FROM ranked WHERE rnk <= 5),
    j AS (
      SELECT ks.k, a.src, a.dst,
             CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END AS mut
      FROM knn a
      CROSS JOIN (SELECT UNNEST([1, 5]) AS k) ks
      LEFT JOIN knn b ON b.src = a.dst AND b.dst = a.src AND b.rnk <= ks.k
      WHERE a.rnk <= ks.k
    )
    SELECT CAST(k AS BIGINT) AS k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_directed_edges,
           CAST(SUM(mut) AS BIGINT) AS n_mutual_edges,
           ROUND(CAST(SUM(mut) AS DOUBLE) / COUNT(*), 6) AS mutual_fraction
    FROM j GROUP BY 1 ORDER BY k
    """,
)
def mutual_knn_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("src"), F.col("embedding").alias("s_emb"))
    c = e.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("c_emb"))
    sim = cosine("s_emb", "c_emb")
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), "dst")
    knn = (
        a.crossJoin(c)
        .filter(F.col("dst") != F.col("src"))
        .withColumn("sim", sim)
        .select("src", "dst", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
    )
    ks = spark.range(2).select(
        F.when(F.col("id") == 0, 1).otherwise(5).alias("k")
    )
    rev = knn.select(
        F.col("src").alias("bsrc"), F.col("dst").alias("bdst"),
        F.col("rnk").alias("brnk"),
    )
    j = (
        knn.crossJoin(F.broadcast(ks))
        .filter(F.col("rnk") <= F.col("k"))
        .join(
            rev,
            (F.col("bsrc") == F.col("dst"))
            & (F.col("bdst") == F.col("src"))
            & (F.col("brnk") <= F.col("k")),
            "left",
        )
        .select(
            "k",
            F.when(F.col("bsrc").isNotNull(), 1).otherwise(0).alias("mut"),
        )
    )
    nn = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        j.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
            F.sum("mut").cast("bigint").alias("n_mutual_edges"),
            F.round(F.sum("mut").cast("double") / F.count(F.lit(1)), 6).alias(
                "mutual_fraction"
            ),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_nodes",
            "n_directed_edges",
            "n_mutual_edges",
            "mutual_fraction",
        )
        .orderBy("k")
    )


from bigdataentrytask_spark.operators import ORACLES as _ORACLES


# --------------------------------------------------------------------------
# IVF nprobe recall sweep (round-8 slate): recall@5 and candidate
# volume for nprobe in {1, 2, 4, 8} against the brute-force truth —
# the tuning table behind knn_ivf_kmeans' fixed nprobe=1 (the knob a
# platform turns BEFORE paying for an index build at 100 TB; nprobe=8
# probes every cell, so its recall must be exactly 1.0 — a built-in
# sanity row). Dots are computed ONCE for the query x corpus slab and
# reused across probe levels; candidate membership is a join against
# the centroid-distance ranking (grid-integer distances, the
# kmeans_step hardening), and recall is a ratio of exact hit counts.
# Query side bounded by N_QUERIES — audit-scale by the same contract
# as knn_recall_eval.
# --------------------------------------------------------------------------
@operator(
    "ivf_nprobe_recall_sweep",
    oracle=f"""
    WITH {_IVF_CTES},
    {_SQL_NORMS},
    probes AS (SELECT UNNEST([1, 2, 4, 8]) AS nprobe),
    qcells AS (
      SELECT vec_id AS query_id, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dd, k) AS cell_rnk
      FROM dist WHERE vec_id < {N_QUERIES}
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z)
             / (nq.nrm * nc.nrm) AS sim
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({_ORACLES["knn_bruteforce"]})
    ),
    cand AS (
      SELECT DISTINCT p.nprobe, qc.query_id, ac.vec_id AS neighbor_id
      FROM probes p
      JOIN qcells qc ON qc.cell_rnk <= p.nprobe
      JOIN assigned ac ON ac.k = qc.k
      WHERE ac.vec_id <> qc.query_id
    ),
    scored AS (
      SELECT c.nprobe, c.query_id, c.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY c.nprobe, c.query_id
                                ORDER BY d.sim DESC, c.neighbor_id) AS rnk
      FROM cand c
      JOIN dots d ON d.query_id = c.query_id
                 AND d.neighbor_id = c.neighbor_id
    ),
    hits AS (
      SELECT s.nprobe,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM scored s
      LEFT JOIN truth t ON t.query_id = s.query_id
                       AND t.neighbor_id = s.neighbor_id
      WHERE s.rnk <= {TOP_K}
      GROUP BY 1
    ),
    vol AS (
      SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY 1
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
    """,
)
def ivf_nprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    qcells = (
        dist.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "k",
            F.row_number().over(wa).alias("cell_rnk"),
        )
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    dots = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("q_emb", "c_emb").alias("sim"))
    )
    probes = spark.range(4).select(
        F.when(F.col("id") == 0, 1)
        .when(F.col("id") == 1, 2)
        .when(F.col("id") == 2, 4)
        .otherwise(8)
        .alias("nprobe")
    )
    ac = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("k").alias("k")
    )
    cand = (
        qcells.crossJoin(F.broadcast(probes))
        .filter(F.col("cell_rnk") <= F.col("nprobe"))
        .join(ac, "k")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("nprobe", "query_id", "neighbor_id")
        .distinct()
    )
    ws = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    scored = (
        cand.join(dots, ["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(ws))
        .filter(F.col("rnk") <= TOP_K)
    )
    truth = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_true")
    )
    hits = (
        scored.join(truth, ["query_id", "neighbor_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.sum(F.when(F.col("is_true").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits")
        )
    )
    vol = cand.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        hits.join(vol, "nprobe")
        .select(
            F.col("nprobe").cast("bigint").alias("nprobe"),
            F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
            F.round(
                F.col("n_candidates").cast("double") / F.lit(N_QUERIES), 6
            ).alias("mean_candidates"),
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.lit(N_QUERIES * TOP_K), 6
            ).alias("recall_at_5"),
        )
        .orderBy("nprobe")
    )


# --------------------------------------------------------------------------
# nDCG@5 of the cosine retriever under LABEL relevance — "when I
# retrieve 5 nearest vectors, how many share the query's class, and
# how early" — the ranking-quality eval that recall@k (hit the exact
# truth id) cannot see. Composes the verified brute-force top-k plan
# with the label dimension. Engine parity: the log2 discounts are
# PRECOMPUTED 1e12-grid INTEGER literals (no libm in either engine),
# so per-query DCG/IDCG are order-free integer sums; the only double
# is the final ratio. IDCG uses min(total relevant, k) cumulative
# weights — the standard binary-relevance ideal.
# --------------------------------------------------------------------------
def _register_knn_ndcg_eval() -> None:
    from bigdataentrytask_spark.operators import ORACLES

    # round(1e12 / log2(rank + 1)) for rank 1..5, and cumulative sums
    w = [1000000000000, 630929753571, 500000000000, 430676558073,
         386852807235]
    c = [1000000000000, 1630929753571, 2130929753571, 2561606311644,
         2948459118879]
    w_case = " ".join(
        f"WHEN rnk = {i + 1} THEN {w[i]}" for i in range(5)
    )
    c_case = " ".join(
        f"WHEN r_eff = {i + 1} THEN {c[i]}" for i in range(5)
    )
    oracle = f"""
    WITH bf AS ({ORACLES["knn_bruteforce"]}),
    lab AS (SELECT vec_id, label FROM embeddings),
    lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_lab FROM lab GROUP BY 1),
    judged AS (
      SELECT bf.query_id, bf.rnk,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
      FROM bf
      JOIN lab lq ON lq.vec_id = bf.query_id
      JOIN lab ln ON ln.vec_id = bf.neighbor_id
    ),
    per_q AS (
      SELECT query_id,
             CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
             CAST(SUM(rel * (CASE {w_case} END)) AS BIGINT) AS dcg_grid
      FROM judged GROUP BY 1
    ),
    truth AS (
      SELECT lq.vec_id AS query_id,
             CAST(lc.n_lab - 1 AS BIGINT) AS n_rel_total
      FROM lab lq JOIN lc ON lc.label = lq.label
      WHERE lq.vec_id < 10
    ),
    ideal AS (
      SELECT query_id, n_rel_total,
             CASE WHEN n_rel_total >= 5 THEN {c[4]}
                  WHEN n_rel_total <= 0 THEN 0
                  ELSE (CASE {c_case.replace('r_eff', 'n_rel_total')} END)
             END AS idcg_grid
      FROM truth
    )
    SELECT p.query_id, p.n_rel_at_k, i.n_rel_total,
           p.dcg_grid, i.idcg_grid,
           ROUND(CASE WHEN i.idcg_grid = 0 THEN 0.0
                      ELSE CAST(p.dcg_grid AS DOUBLE) / i.idcg_grid END, 6)
             AS ndcg_at_5
    FROM per_q p JOIN ideal i ON i.query_id = p.query_id
    ORDER BY p.query_id
    """

    @operator("knn_ndcg_eval", oracle=oracle)
    def knn_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """nDCG@5 of brute-force cosine retrieval under same-label
        relevance. Scale: per-query rows are N_QUERIES-bounded; the
        label-count dimension is |labels| rows, broadcast."""
        from bigdataentrytask_spark.operators import REGISTRY

        bf = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
            "query_id", "rnk", "neighbor_id"
        )
        lab = _emb(spark, sf_dir).select("vec_id", "label")
        lc = lab.groupBy("label").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lab")
        )
        lq = lab.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
        )
        ln = lab.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("n_label"),
        )
        rel = F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
        w_col = F.when(F.col("rnk") == 1, w[0])
        for i in range(1, 5):
            w_col = w_col.when(F.col("rnk") == i + 1, w[i])
        judged = (
            bf.join(F.broadcast(lq), "query_id")
            .join(F.broadcast(ln), "neighbor_id")
            .select("query_id", rel.alias("rel"), w_col.alias("w"))
        )
        per_q = judged.groupBy("query_id").agg(
            F.sum("rel").cast("bigint").alias("n_rel_at_k"),
            F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("dcg_grid"),
        )
        truth = (
            lq.filter(F.col("query_id") < N_QUERIES)
            .join(F.broadcast(lc), lq.q_label == lc.label)
            .select(
                "query_id",
                (F.col("n_lab") - 1).cast("bigint").alias("n_rel_total"),
            )
        )
        r_eff = F.col("n_rel_total")
        c_col = F.when(r_eff >= 5, c[4]).when(r_eff <= 0, 0)
        for i in range(4):
            c_col = c_col.when(r_eff == i + 1, c[i])
        c_col = c_col.otherwise(c[4])
        ideal = truth.select(
            "query_id", "n_rel_total", c_col.cast("bigint").alias("idcg_grid")
        )
        out = per_q.join(ideal, "query_id")
        return out.select(
            "query_id", "n_rel_at_k", "n_rel_total", "dcg_grid", "idcg_grid",
            F.round(
                F.when(F.col("idcg_grid") == 0, F.lit(0.0)).otherwise(
                    F.col("dcg_grid").cast("double") / F.col("idcg_grid")
                ), 6
            ).alias("ndcg_at_5"),
        ).orderBy("query_id")


_register_knn_ndcg_eval()


# --------------------------------------------------------------------------
# Simplified (centroid-based) silhouette per label: a_i = distance to
# own centroid, b_i = min distance to any OTHER label's centroid,
# s_i = (b_i - a_i) / max(a_i, b_i). The O(N * L * d) assignment-join
# form of the O(N^2) exact silhouette — the variant that exists at
# corpus scale (centroids broadcast; dimension-level rows; one
# partial-agg shuffle per vec).
#
# Engine parity by construction (the snap-to-grid discipline, applied
# here after the round-7 advisor flagged the double-AVG centroid as
# order-dependent): every coordinate is snapped onto a 1e6 integer
# grid FIRST, so the three power sums per (vec, label) cell —
# A = sum xi^2, B = sum xi*S_pos, C = sum S_pos^2 with S_pos the
# per-dimension centroid SUM — are exact 128-bit integers in any
# summation order, and the distance
#   dist_L = sqrt((A - 2B/n_L + C_L/n_L^2))   [grid units]
# is ONE pinned double expression over exact inputs. s_i is scale-
# invariant so grid units cancel; the per-point score is itself
# snapped (s_grid = round(s * 1e6)) so the label mean is an exact
# BIGINT sum divided once — no float accumulation anywhere.
# --------------------------------------------------------------------------
@operator(
    "silhouette_by_label",
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
      SELECT label AS c_label, CAST(COUNT(*) AS BIGINT) AS n_lab
      FROM v GROUP BY 1
    ),
    cent AS (
      SELECT label AS c_label, pos, CAST(SUM(xi) AS BIGINT) AS s_pos
      FROM dims GROUP BY 1, 2
    ),
    csq AS (
      SELECT c_label,
             CAST(SUM(s_pos::HUGEINT * s_pos) AS DOUBLE) AS c2
      FROM cent GROUP BY 1
    ),
    vsq AS (
      SELECT vec_id,
             CAST(SUM(xi::HUGEINT * xi) AS DOUBLE) AS a2
      FROM dims GROUP BY 1
    ),
    dots AS (
      SELECT d.vec_id, d.label, ct.c_label,
             CAST(SUM(d.xi::HUGEINT * ct.s_pos) AS DOUBLE) AS b1
      FROM dims d JOIN cent ct ON ct.pos = d.pos
      GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT dt.vec_id, dt.label, dt.c_label,
             sqrt(GREATEST(
               vs.a2 - 2 * dt.b1 / nl.n_lab
                     + cs.c2 / (CAST(nl.n_lab AS DOUBLE) * nl.n_lab),
               0.0)) AS dst
      FROM dots dt
      JOIN vsq vs ON vs.vec_id = dt.vec_id
      JOIN csq cs ON cs.c_label = dt.c_label
      JOIN nlab nl ON nl.c_label = dt.c_label
    ),
    ab AS (
      SELECT vec_id, label,
             MIN(CASE WHEN c_label = label THEN dst END)  AS a_own,
             MIN(CASE WHEN c_label <> label THEN dst END) AS b_other
      FROM dist GROUP BY 1, 2
    ),
    sil AS (
      SELECT label,
             CAST(ROUND((b_other - a_own) / GREATEST(a_own, b_other)
                        * 1000000) AS BIGINT) AS s_grid
      FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)               AS n_vecs,
           ROUND(SUM(s_grid) / (COUNT(*) * 1000000.0), 6)
                                                  AS mean_silhouette,
           CAST(count_if(s_grid < 0) AS BIGINT)   AS n_negative
    FROM sil GROUP BY label ORDER BY label
    """,
)
def silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    dims = v.select(
        "vec_id", "label",
        F.posexplode("e").alias("pos0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x") * 1000000).cast("bigint").alias("xi"),
    )
    nlab = v.groupBy(F.col("label").alias("c_label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lab")
    )
    cent = dims.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.sum("xi").alias("s_pos")
    )
    # products in DECIMAL(38,0) (the Spark twin of DuckDB's HUGEINT):
    # exact in any order, one deterministic narrowing to double
    d19 = "decimal(19,0)"
    csq = cent.groupBy("c_label").agg(
        F.sum(F.col("s_pos").cast(d19) * F.col("s_pos").cast(d19))
        .cast("double")
        .alias("c2")
    )
    vsq = dims.groupBy("vec_id").agg(
        F.sum(F.col("xi").cast(d19) * F.col("xi").cast(d19))
        .cast("double")
        .alias("a2")
    )
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(F.col("xi").cast(d19) * F.col("s_pos").cast(d19))
            .cast("double")
            .alias("b1")
        )
    )
    dist = (
        dots.join(vsq, "vec_id")
        .join(F.broadcast(csq), "c_label")
        .join(F.broadcast(nlab), "c_label")
        .select(
            "vec_id", "label", "c_label",
            F.sqrt(
                F.greatest(
                    F.col("a2")
                    - 2 * F.col("b1") / F.col("n_lab")
                    + F.col("c2")
                    / (F.col("n_lab").cast("double") * F.col("n_lab")),
                    F.lit(0.0),
                )
            ).alias("dst"),
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("c_label") == F.col("label"), F.col("dst")))
        .alias("a_own"),
        F.min(F.when(F.col("c_label") != F.col("label"), F.col("dst")))
        .alias("b_other"),
    )
    s = (F.col("b_other") - F.col("a_own")) / F.greatest("a_own", "b_other")
    sil = ab.select(
        "label", F.round(s * 1000000).cast("bigint").alias("s_grid")
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum("s_grid") / (F.count(F.lit(1)) * 1000000.0), 6
            ).alias("mean_silhouette"),
            F.count(F.when(F.col("s_grid") < 0, 1))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# DBSCAN core/border/noise census at eps = the neardup cosine
# threshold, minPts = 3 neighbors: degree over the symmetrized
# eps-pair graph classifies every vector. Composes the VERIFIED
# embedding_neardup_pairs plan (tiled Arrow kernel / its exact
# oracle), so the census inherits the production pair path — at
# corpus scale you swap in the LSH pair list (embedding_neardup_lsh)
# and this plan is unchanged: degree agg + one semi-join against the
# core set. All counts integer-exact.
# --------------------------------------------------------------------------
def _register_dbscan_core_census() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    min_pts = 3
    oracle = f"""
    WITH pairs AS ({ORACLES["embedding_neardup_pairs"]}),
    sym AS (SELECT vec_a AS u, vec_b AS v FROM pairs
            UNION ALL SELECT vec_b, vec_a FROM pairs),
    deg AS (SELECT u AS vec_id, CAST(COUNT(*) AS BIGINT) AS degree
            FROM sym GROUP BY 1),
    uni AS (
      SELECT e.vec_id, COALESCE(d.degree, 0) AS degree
      FROM embeddings e LEFT JOIN deg d ON d.vec_id = e.vec_id
    ),
    core AS (SELECT vec_id FROM uni WHERE degree >= {min_pts}),
    cls AS (
      SELECT u.vec_id, u.degree,
             CASE WHEN u.degree >= {min_pts} THEN 'core'
                  WHEN EXISTS (SELECT 1 FROM sym s JOIN core c
                               ON c.vec_id = s.v WHERE s.u = u.vec_id)
                       THEN 'border'
                  ELSE 'noise' END AS cls
      FROM uni u
    )
    SELECT cls AS dbscan_class,
           CAST(COUNT(*) AS BIGINT)     AS n_points,
           CAST(SUM(degree) AS BIGINT)  AS sum_degree,
           ROUND(CAST(SUM(degree) AS DOUBLE) / COUNT(*), 6) AS mean_degree
    FROM cls GROUP BY 1 ORDER BY dbscan_class
    """

    @operator("dbscan_core_census", oracle=oracle)
    def dbscan_core_census(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the pair list feeds THREE consumers (degree agg, the core
        # semi-join, the class census) — persist it so the tiled Arrow
        # kernel runs once, not per consumer, and release the blocks
        # before returning (with_persisted + materialize: the census
        # is 3 rows, squarely inside the bounded-summary contract)
        pairs = REGISTRY["embedding_neardup_pairs"](spark, sf_dir).select(
            "vec_a", "vec_b"
        )
        with with_persisted(pairs):
            sym = pairs.select(
                F.col("vec_a").alias("u"), F.col("vec_b").alias("v")
            ).unionAll(
                pairs.select(F.col("vec_b").alias("u"), F.col("vec_a").alias("v"))
            )
            deg = sym.groupBy(F.col("u").alias("vec_id")).agg(
                F.count(F.lit(1)).cast("bigint").alias("degree")
            )
            uni = (
                _emb(spark, sf_dir)
                .select("vec_id")
                .join(deg, "vec_id", "left")
                .select("vec_id", F.coalesce("degree", F.lit(0)).alias("degree"))
            )
            core = uni.filter(F.col("degree") >= min_pts).select(
                F.col("vec_id").alias("core_id")
            )
            near_core = (
                sym.join(core, sym.v == F.col("core_id"))
                .select(F.col("u").alias("vec_id"))
                .distinct()
                .withColumn("near_core", F.lit(1))
            )
            cls = (
                uni.join(near_core, "vec_id", "left")
                .select(
                    "degree",
                    F.when(F.col("degree") >= min_pts, "core")
                    .when(F.col("near_core").isNotNull(), "border")
                    .otherwise("noise")
                    .alias("dbscan_class"),
                )
            )
            return materialize(
                cls.groupBy("dbscan_class")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_points"),
                    F.sum("degree").cast("bigint").alias("sum_degree"),
                    F.round(
                        F.sum("degree").cast("double") / F.count(F.lit(1)), 6
                    ).alias("mean_degree"),
                )
                .orderBy("dbscan_class")
            )


_register_dbscan_core_census()


# --------------------------------------------------------------------------
# Top-10 most-correlated embedding dimension PAIRS — the redundancy
# map that says whether the representation wastes capacity (near-
# duplicate dimensions => whitening / PCA would compress it; the
# per-dimension complement of embedding_dim_variance). Engine parity
# by construction: every coordinate is snapped onto a 1e6 integer
# grid FIRST, so all five moments per dim pair are exact BIGINT sums
# and the correlation is one pinned double expression — no float
# accumulation anywhere. Scale: the (pos_i, pos_j) self-join is over
# DIMENSION-level rows keyed by vec_id; moments reduce map-side onto
# d^2/2 cells (2016 for d=64) regardless of corpus size.
# --------------------------------------------------------------------------
@operator(
    "embedding_dim_correlation_top",
    oracle="""
    WITH dims AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS pos,
             CAST(ROUND(UNNEST(embedding::DOUBLE[]) * 1000000.0) AS BIGINT)
               AS xi
      FROM embeddings
    ),
    cells AS (
      SELECT a.pos AS dim_i, b.pos AS dim_j,
             CAST(COUNT(*) AS BIGINT)        AS n,
             CAST(SUM(a.xi) AS BIGINT)       AS sx,
             CAST(SUM(b.xi) AS BIGINT)       AS sy,
             SUM(CAST(a.xi AS HUGEINT) * a.xi) AS sxx,
             SUM(CAST(b.xi AS HUGEINT) * b.xi) AS syy,
             SUM(CAST(a.xi AS HUGEINT) * b.xi) AS sxy
      FROM dims a JOIN dims b
        ON a.vec_id = b.vec_id AND a.pos < b.pos
      GROUP BY 1, 2
    ),
    corr AS (
      SELECT dim_i, dim_j, n,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr
      FROM cells
    )
    SELECT dim_i, dim_j, n, corr
    FROM corr
    ORDER BY ABS(corr) DESC, dim_i, dim_j
    LIMIT 10
    """,
)
def embedding_dim_correlation_top(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _emb(spark, sf_dir)
    dims = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos0", "x"),
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x") * 1000000.0).cast("bigint").alias("xi"),
    )
    a = dims.select("vec_id", F.col("pos").alias("dim_i"), F.col("xi").alias("ai"))
    b = dims.select("vec_id", F.col("pos").alias("dim_j"), F.col("xi").alias("bi"))
    cells = (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") < F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("ai").cast("bigint").alias("sx"),
            F.sum("bi").cast("bigint").alias("sy"),
            F.sum(F.col("ai").cast("decimal(38,0)") * F.col("ai")).alias("sxx"),
            F.sum(F.col("bi").cast("decimal(38,0)") * F.col("bi")).alias("syy"),
            F.sum(F.col("ai").cast("decimal(38,0)") * F.col("bi")).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.sqrt(
        (n * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * (n * F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double"))
    )
    corr = cells.select(
        "dim_i", "dim_j", "n", F.round(num / den, 6).alias("corr")
    )
    return corr.orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j").limit(10)


# --------------------------------------------------------------------------
# Embedding isotropy score WITHOUT a pair expansion: for unit-
# normalized vectors, mean pairwise cosine = (||sum(u)||^2 - N)
# / (N * (N - 1)) — the O(N^2) statistic collapses to one O(N*d)
# per-dimension sum pass (the algebraic identity every isotropy
# paper uses but pipelines rarely implement). High mean cosine =
# a dominant common direction = wasted embedding capacity (the
# anisotropy problem); reported with the common-direction vector's
# share of total mass. Per-dim sums snapped onto a 1e6 grid before
# squaring so the norm is an exact integer computation.
# --------------------------------------------------------------------------
@operator(
    "embedding_isotropy_score",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    nrm AS (
      SELECT vec_id,
             sqrt((SELECT SUM(x * x)
                   FROM (SELECT UNNEST(e) AS x))) AS l2
      FROM v
    ),
    dims AS (
      SELECT d.vec_id,
             generate_subscripts(d.e, 1) AS pos,
             UNNEST(d.e) / n.l2 AS u
      FROM v d JOIN nrm n ON n.vec_id = d.vec_id
    ),
    per_dim AS (
      SELECT pos,
             CAST(SUM(CAST(ROUND(u * 1000000.0) AS BIGINT)) AS BIGINT) AS su
      FROM dims GROUP BY 1
    ),
    m AS (
      SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n,
             CAST(SUM(CAST(su AS HUGEINT) * su) AS DOUBLE) AS norm2_g
      FROM per_dim
    )
    SELECT n,
           ROUND((norm2_g / 1000000.0 / 1000000.0 - n)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS mean_pairwise_cosine,
           ROUND(sqrt(norm2_g) / 1000000.0 / n, 6)   AS common_direction_norm
    FROM m
    """,
)
def embedding_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    nrm = v.select(
        "vec_id",
        F.sqrt(
            F.aggregate("e", F.lit(0.0), lambda a, x: a + x * x)
        ).alias("l2"),
    )
    dims = (
        v.join(nrm, "vec_id")
        .select(
            "vec_id",
            F.posexplode("e").alias("pos0", "x"),
            "l2",
        )
        .select(
            (F.col("pos0") + 1).alias("pos"),
            (F.col("x") / F.col("l2")).alias("u"),
        )
    )
    per_dim = dims.groupBy("pos").agg(
        F.sum(F.round(F.col("u") * 1000000.0).cast("bigint"))
        .cast("bigint").alias("su")
    )
    n_row = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    m = per_dim.agg(
        F.sum(F.col("su").cast("decimal(38,0)") * F.col("su"))
        .cast("double").alias("norm2_g")
    ).crossJoin(F.broadcast(n_row))
    n = F.col("n")
    return m.select(
        "n",
        F.round(
            (F.col("norm2_g") / 1000000.0 / 1000000.0 - n)
            / (n.cast("double") * (n - 1)), 6
        ).alias("mean_pairwise_cosine"),
        F.round(F.sqrt("norm2_g") / 1000000.0 / n, 6)
        .alias("common_direction_norm"),
    )


# --------------------------------------------------------------------------
# Hubness diagnostic: run exact top-5 cosine retrieval from EVERY
# vector (the all-queries extension of knn_bruteforce — quadratic,
# audit-scale by contract like jaccard_pairs; the LSH twin swaps in
# at corpus scale with this census unchanged) and census the
# k-occurrence counts N_5(v): a heavy right tail ("hubs" that appear
# in everyone's neighbor list) plus a mass of never-retrieved
# anti-hubs is THE high-dimensional failure mode that silently skews
# kNN classification and retrieval. Skewness from exact integer
# moment sums over the N_5 table; all counts integers.
# --------------------------------------------------------------------------
@operator(
    "embedding_hubness",
    oracle=f"""
    WITH {_SQL_NORMS},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT SUM(z.qe * z.ce) FROM
              (SELECT UNNEST(q.embedding::DOUBLE[]) AS qe,
                      UNNEST(c.embedding::DOUBLE[]) AS ce) z) AS d
      FROM embeddings q, embeddings c
      WHERE c.vec_id <> q.vec_id
    ),
    sims AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d / (nq.nrm * nc.nrm) DESC,
                                         neighbor_id) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id
    ),
    occ AS (
      SELECT e.vec_id,
             CAST(COALESCE(k.n_occ, 0) AS BIGINT) AS n_occ
      FROM embeddings e
      LEFT JOIN (
        SELECT neighbor_id, COUNT(*) AS n_occ
        FROM sims WHERE rnk <= 5 GROUP BY 1
      ) k ON k.neighbor_id = e.vec_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT)              AS n,
             CAST(SUM(n_occ) AS BIGINT)            AS s1,
             CAST(SUM(n_occ * n_occ) AS BIGINT)    AS s2,
             CAST(SUM(n_occ * n_occ * n_occ) AS BIGINT) AS s3,
             CAST(MAX(n_occ) AS BIGINT)            AS max_occ,
             CAST(count_if(n_occ = 0) AS BIGINT)   AS n_antihubs
      FROM occ
    )
    SELECT n, max_occ, n_antihubs,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_occ,
           ROUND((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / sqrt((CAST(s2 AS DOUBLE) / n
                         - (CAST(s1 AS DOUBLE) / n)
                           * (CAST(s1 AS DOUBLE) / n))
                        * (CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n))
                        * (CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n))), 6)
             AS occ_skewness
    FROM m
    """,
)
def embedding_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
    nrm = v.select(
        "vec_id",
        F.sqrt(F.aggregate("ev", F.lit(0.0), lambda a, x: a + x * x))
        .alias("nrm"),
    )
    q = v.join(nrm, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("ev").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = v.join(nrm, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("ev").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    dots = (
        q.crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (
                F.zip_with("qe", "ce", lambda a, b: a * b)
                .alias("prods")
            ),
            "qn", "cn",
        )
        .select(
            "query_id", "neighbor_id",
            (
                F.aggregate("prods", F.lit(0.0), lambda a, x: a + x)
                / (F.col("qn") * F.col("cn"))
            ).alias("sim"),
        )
    )
    from pyspark.sql import Window
    rnk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    )
    top = dots.select("query_id", "neighbor_id", rnk.alias("rnk")).filter(
        F.col("rnk") <= 5
    )
    k = top.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ_raw")
    )
    occ = (
        e.select("vec_id")
        .join(k, e.vec_id == k.neighbor_id, "left")
        .select(F.coalesce("n_occ_raw", F.lit(0)).cast("bigint").alias("n_occ"))
    )
    m = occ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_occ").cast("bigint").alias("s1"),
        F.sum(F.col("n_occ") * F.col("n_occ")).cast("bigint").alias("s2"),
        F.sum(F.col("n_occ") * F.col("n_occ") * F.col("n_occ"))
        .cast("bigint").alias("s3"),
        F.max("n_occ").cast("bigint").alias("max_occ"),
        F.count(F.when(F.col("n_occ") == 0, 1)).cast("bigint")
        .alias("n_antihubs"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    var = m2 - m1 * m1
    return m.select(
        "n", "max_occ", "n_antihubs",
        F.round(m1, 6).alias("mean_occ"),
        F.round(
            (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
            / F.sqrt(var * var * var), 6
        ).alias("occ_skewness"),
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss distortion audit: project 64-d embeddings to
# 16-d with a DETERMINISTIC Rademacher matrix (sign = md5 parity of
# "proj:dim" — engine-portable, no RNG) and measure how pairwise
# DISTANCES survive on the exact top-5 truth pairs (the bounded pair
# set knn_bruteforce already verifies). Reports mean/max of the
# per-pair distortion |proj/orig - 1| — the number that says whether
# a 4x cheaper index preserves neighborhoods. Projection is one
# dimension-level join against the broadcast 64x16 sign table;
# per-pair math is exact sums of products of snapped coordinates.
# --------------------------------------------------------------------------
_JL_K = 16


def _jl_oracle() -> str:
    from bigdataentrytask_spark.operators import ORACLES

    return f"""
    WITH bf AS ({ORACLES["knn_bruteforce"]}),
    pairs AS (SELECT query_id AS a, neighbor_id AS b FROM bf),
    dims AS (
      SELECT vec_id,
             generate_subscripts(embedding::DOUBLE[], 1) AS pos,
             CAST(ROUND(UNNEST(embedding::DOUBLE[]) * 1000000.0) AS BIGINT)
               AS xi
      FROM embeddings
    ),
    signs AS (
      SELECT p.p AS proj, d.d AS pos,
             CASE WHEN ('0x' || substr(md5(CAST(p.p AS VARCHAR) || ':'
                        || CAST(d.d AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM (SELECT UNNEST(range(1, {_JL_K} + 1)) AS p) p
      CROSS JOIN (SELECT UNNEST(range(1, 65)) AS d) d
    ),
    proj AS (
      SELECT dm.vec_id, s.proj,
             CAST(SUM(s.sgn * dm.xi) AS BIGINT) AS y
      FROM dims dm JOIN signs s ON s.pos = dm.pos
      GROUP BY 1, 2
    ),
    orig_d AS (
      SELECT pr.a, pr.b,
             SUM(CAST(da.xi - db.xi AS HUGEINT) * (da.xi - db.xi)) AS d2
      FROM pairs pr
      JOIN dims da ON da.vec_id = pr.a
      JOIN dims db ON db.vec_id = pr.b AND db.pos = da.pos
      GROUP BY 1, 2
    ),
    proj_d AS (
      SELECT pr.a, pr.b,
             SUM(CAST(pa.y - pb.y AS HUGEINT) * (pa.y - pb.y)) AS d2
      FROM pairs pr
      JOIN proj pa ON pa.vec_id = pr.a
      JOIN proj pb ON pb.vec_id = pr.b AND pb.proj = pa.proj
      GROUP BY 1, 2
    ),
    ratio AS (
      SELECT o.a, o.b,
             sqrt(CAST(p.d2 AS DOUBLE) / {_JL_K})
             / sqrt(CAST(o.d2 AS DOUBLE)) AS r
      FROM orig_d o JOIN proj_d p ON p.a = o.a AND p.b = o.b
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(ROUND(ABS(r - 1.0) * 1000000.0) AS BIGINT))
                  AS BIGINT) AS sum_dist_g,
             ROUND(MAX(ABS(r - 1.0)), 6) AS max_distortion
      FROM ratio
    )
    SELECT n_pairs,
           ROUND(CAST(sum_dist_g AS DOUBLE) / n_pairs / 1000000.0, 6)
             AS mean_distortion,
           max_distortion
    FROM g
    """


@operator("jl_projection_distortion", oracle=_jl_oracle())
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.operators import REGISTRY

    bf = REGISTRY["knn_bruteforce"](spark, sf_dir).select(
        F.col("query_id").alias("a"), F.col("neighbor_id").alias("b")
    )
    e = _emb(spark, sf_dir)
    dims = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos0", "x"),
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x") * 1000000.0).cast("bigint").alias("xi"),
    )
    spark_ = e.sparkSession
    signs = (
        spark_.range(1, _JL_K + 1).select(F.col("id").alias("proj"))
        .crossJoin(spark_.range(1, 65).select(F.col("id").alias("pos")))
        .select(
            "proj", "pos",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("proj").cast("string"),
                                F.lit(":"),
                                F.col("pos").cast("string"),
                            )
                        ), 1, 15,
                    ), 16, 10,
                ).cast("bigint") % 2 == 0, 1
            ).otherwise(-1).alias("sgn"),
        )
    )
    proj = (
        dims.join(F.broadcast(signs), "pos")
        .groupBy("vec_id", "proj")
        .agg(F.sum(F.col("sgn") * F.col("xi")).cast("bigint").alias("y"))
    )
    da = dims.select(F.col("vec_id").alias("a"), "pos", F.col("xi").alias("xa"))
    db = dims.select(F.col("vec_id").alias("b"), "pos", F.col("xi").alias("xb"))
    orig_d = (
        bf.join(da, "a").join(db, ["b", "pos"])
        .groupBy("a", "b")
        .agg(
            F.sum(
                (F.col("xa") - F.col("xb")).cast("decimal(38,0)")
                * (F.col("xa") - F.col("xb"))
            ).alias("d2o")
        )
    )
    pa = proj.select(F.col("vec_id").alias("a"), "proj", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("b"), "proj", F.col("y").alias("yb"))
    proj_d = (
        bf.join(pa, "a").join(pb, ["b", "proj"])
        .groupBy("a", "b")
        .agg(
            F.sum(
                (F.col("ya") - F.col("yb")).cast("decimal(38,0)")
                * (F.col("ya") - F.col("yb"))
            ).alias("d2p")
        )
    )
    ratio = orig_d.join(proj_d, ["a", "b"]).select(
        (
            F.sqrt(F.col("d2p").cast("double") / _JL_K)
            / F.sqrt(F.col("d2o").cast("double"))
        ).alias("r")
    )
    g = ratio.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.round(F.abs(F.col("r") - 1.0) * 1000000.0).cast("bigint")
        ).cast("bigint").alias("sum_dist_g"),
        F.round(F.max(F.abs(F.col("r") - 1.0)), 6).alias("max_distortion"),
    )
    return g.select(
        "n_pairs",
        F.round(
            F.col("sum_dist_g").cast("double") / F.col("n_pairs") / 1000000.0,
            6,
        ).alias("mean_distortion"),
        "max_distortion",
    )


# --------------------------------------------------------------------------
# ROUND-10 STAGED (registry FROZEN in round 9 — VERDICT r8 item 2;
# ROADMAP "Retrieval / embeddings"). Matryoshka truncation sweep:
# recall@5 of prefix-dimension retrieval (d = 8/16/32) against the
# full-64d brute-force truth (knn_bruteforce) — the tuning table for
# Matryoshka-representation serving (Kusupati et al. 2022,
# arXiv:2205.13147): how much recall a platform keeps when it ranks
# on a truncated prefix to cut index bytes / dot-product FLOPs.
#
# Determinism: prefix dot products and prefix norms reduce to EXACT
# grid-integer sums (|x| < 0.6 -> grid ints < 6e5, products < 3.6e11,
# <= 32-term sums < 1.2e13 — inside both BIGINT and the 2^53 exact-
# double range), summed exactly then cast to double ONCE; ranking ties
# break on neighbor_id. Same audit-scale contract as
# ivf_nprobe_recall_sweep (quadratic truth side, bounded by N_QUERIES).
# --------------------------------------------------------------------------
_MATRYOSHKA_DIMS = [8, 16, 32]

_MATRYOSHKA_ORACLE = f"""
    WITH dims AS (SELECT UNNEST([8, 16, 32]) AS d),
    pn AS (
      SELECT dm.d, e.vec_id,
             (SELECT CAST(SUM(CAST(ROUND(z.x * 1000000) AS BIGINT)
                              * CAST(ROUND(z.x * 1000000) AS BIGINT))
                     AS DOUBLE)
              FROM (SELECT UNNEST((e.embedding[1:dm.d])::DOUBLE[]) AS x) z
             ) AS cc
      FROM embeddings e, dims dm
    ),
    dotg AS (
      SELECT dm.d, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             (SELECT CAST(SUM(CAST(ROUND(z.qe * 1000000) AS BIGINT)
                              * CAST(ROUND(z.ce * 1000000) AS BIGINT))
                     AS DOUBLE)
              FROM (SELECT UNNEST((q.embedding[1:dm.d])::DOUBLE[]) AS qe,
                           UNNEST((c.embedding[1:dm.d])::DOUBLE[]) AS ce) z
             ) AS dot
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id
      CROSS JOIN dims dm
      WHERE q.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT g.d, g.query_id, g.neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY g.d, g.query_id
               ORDER BY CASE WHEN p.cc = 0 THEN CAST(-2.0 AS DOUBLE)
                        ELSE g.dot / sqrt(p.cc) END DESC,
                        g.neighbor_id) AS rnk
      FROM dotg g JOIN pn p ON p.d = g.d AND p.vec_id = g.neighbor_id
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    )
    SELECT CAST(s.d AS BIGINT) AS d_prefix,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits,
           ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_5
    FROM scored s
    LEFT JOIN truth t ON t.query_id = s.query_id
                     AND t.neighbor_id = s.neighbor_id
    WHERE s.rnk <= {TOP_K}
    GROUP BY s.d
    ORDER BY d_prefix
    """


def matryoshka_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension recall sweep (see staged block comment). One
    shuffle computes all three prefix dots via conditional sums over
    the pos <= 32 product rows — the per-d work shares a single
    (query, neighbor) aggregation instead of re-scanning per prefix."""
    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    max_d = max(_MATRYOSHKA_DIMS)
    dims = (
        e.select(
            "vec_id",
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos0", "x"),
        )
        .filter(F.col("pos0") < max_d)
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    )
    # prefix norms per (vec_id, d): conditional exact-integer sums
    pn = dims.groupBy("vec_id").agg(
        *[
            F.sum(
                F.when(F.col("pos") <= d, F.col("xi") * F.col("xi")).otherwise(
                    F.lit(0)
                )
            )
            .cast("double")
            .alias(f"cc_{d}")
            for d in _MATRYOSHKA_DIMS
        ]
    )
    q = dims.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
    )
    c = dims.select(
        F.col("vec_id").alias("neighbor_id"), "pos", F.col("xi").alias("ci")
    )
    prods = (
        F.broadcast(q)
        .join(c, "pos")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    dots = prods.groupBy("query_id", "neighbor_id").agg(
        *[
            F.sum(
                F.when(F.col("pos") <= d, F.col("qi") * F.col("ci")).otherwise(
                    F.lit(0)
                )
            )
            .cast("double")
            .alias(f"dot_{d}")
            for d in _MATRYOSHKA_DIMS
        ]
    )
    # ONE join + a stack generator scores every prefix in a single
    # pass over the dots frame — a per-d join+union would recompute
    # the (query, neighbor) aggregation once per prefix
    # cc = 0 guard (ADVICE r9): a prefix whose grid-rounded components
    # are all zero has no direction — Spark's non-ANSI x/0 yields NULL
    # while DuckDB's IEEE float division yields inf/nan, so the two
    # engines would rank such a neighbor differently. Pin the sim to a
    # -2.0 sentinel (below any real cosine) on BOTH engines so
    # zero-norm prefixes deterministically rank last.
    stack_expr = ", ".join(
        f"CAST({d} AS BIGINT), "
        f"CASE WHEN cc_{d} = 0 THEN CAST(-2.0 AS DOUBLE) "
        f"ELSE dot_{d} / sqrt(cc_{d}) END"
        for d in _MATRYOSHKA_DIMS
    )
    scored = dots.join(
        pn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        F.expr(
            f"stack({len(_MATRYOSHKA_DIMS)}, {stack_expr})"
            " AS (d_prefix, sim)"
        ),
    )
    ws = Window.partitionBy("d_prefix", "query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    top = scored.withColumn("rnk", F.row_number().over(ws)).filter(
        F.col("rnk") <= TOP_K
    )
    truth = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_true")
    )
    return (
        top.join(truth, ["query_id", "neighbor_id"], "left")
        .groupBy("d_prefix")
        .agg(F.sum(F.coalesce("is_true", F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            "d_prefix",
            F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
            ).alias("recall_at_5"),
        )
        .orderBy("d_prefix")
    )


# name -> (fn, oracle); aggregated by operators/staging.py, registered
# at the round-10 boundary. The truth subquery is spliced from the
# already-registered knn_bruteforce oracle at aggregation time (the
# _ORACLES import above is mid-module and complete by now).
ROUND10_STAGED: dict[str, tuple] = {
    "matryoshka_recall_sweep": (
        matryoshka_recall_sweep,
        _MATRYOSHKA_ORACLE.replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
    ),
}


# --------------------------------------------------------------------------
# ROUND-10 STAGED (ROADMAP "Retrieval / embeddings"): residual (two-
# level) product quantization. Level 1 = the coarse k-means assignment
# kmeans_step already verifies (seed convention: first KMEANS_K
# vectors); level 2 = PQ over the RESIDUAL x - centroid(cell), with
# the residual codebook drawn from the first _PQ_K vectors' residuals
# (the same deterministic seed convention embedding_pq_assign uses on
# raw vectors). Reports, per subspace, the residual-PQ quantization
# error against the flat-PQ baseline — the distortion win that
# justifies IVF-PQ's extra table lookup in a serving index.
#
# Determinism: residuals are DIFFERENCES OF GRID INTEGERS (xi - si),
# so every distance is an exact integer in any accumulation order;
# per-subspace error sums stay exact via decimal(19,0)->decimal(38,0)
# (bound note at the module's canonical d19 comment) and are cast to
# double ONCE before the only two double expressions (errors / 1e12,
# gain ratio). Scale posture: identical to embedding_pq_assign —
# dimension-level rows, broadcast codebooks, bounded argmin windows.
#
# Expected sign on THIS corpus: gain_ppm is NEGATIVE. The synthetic
# embeddings are near-isotropic (unclustered), so the 8 coarse seeds
# barely reduce variance and residuals have var ~ 2(1-rho)sigma^2 >
# sigma^2 — two-level quantization loses to flat PQ, and the advisor
# table says so. On a clustered production corpus the sign flips;
# detecting WHICH regime a corpus is in before paying for an IVF-PQ
# index build is the point of the audit.
# --------------------------------------------------------------------------
_RESIDUAL_PQ_ORACLE = f"""
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
    resid AS (
      SELECT d.vec_id, d.pos, d.sub, d.xi - se.si AS ri
      FROM dims d
      JOIN cassign a ON a.vec_id = d.vec_id
      JOIN seeds se ON se.k = a.k AND se.pos = d.pos
    ),
    rcode AS (
      SELECT vec_id AS code, sub, pos, ri AS ci
      FROM resid WHERE vec_id < {_PQ_K}
    ),
    rdist AS (
      SELECT r.vec_id, r.sub, c.code,
             CAST(SUM((r.ri - c.ci) * (r.ri - c.ci)) AS BIGINT) AS dd
      FROM resid r JOIN rcode c ON c.pos = r.pos AND c.sub = r.sub
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
             SUM(r.dd::HUGEINT) AS res_g
      FROM fbest f
      JOIN rbest r ON r.vec_id = f.vec_id AND r.sub = f.sub
      GROUP BY 1
    )
    SELECT CAST(sub AS BIGINT) AS sub,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           ROUND(CAST(flat_g AS DOUBLE) / 1e12, 4) AS flat_sq_error,
           ROUND(CAST(res_g AS DOUBLE) / 1e12, 4) AS residual_sq_error,
           CAST(ROUND((CAST(flat_g AS DOUBLE) - CAST(res_g AS DOUBLE))
                      * 1000000.0 / CAST(flat_g AS DOUBLE)) AS BIGINT)
             AS gain_ppm
    FROM agg ORDER BY sub
    """


def residual_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (IVF-residual) PQ distortion vs the flat-PQ baseline
    (see staged block comment). dims and resid are multi-consumer
    fact-scale intermediates -> with_persisted + materialize (the
    sanctioned hygiene pattern; output is 4 domain rows)."""
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
    seeds = (
        e.filter(F.col("vec_id") < KMEANS_K)
        .select(
            F.col("vec_id").alias("k"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("pos0", "x"),
        )
        .select("k", (F.col("pos0") + 1).alias("s_pos"), grid.alias("si"))
    )
    d19 = "decimal(19,0)"
    with with_persisted(dims) as dims_p:
        cdiff = F.col("xi") - F.col("si")
        cdist = (
            dims_p.join(F.broadcast(seeds), F.col("s_pos") == F.col("pos"))
            .groupBy("vec_id", "k")
            .agg(F.sum(cdiff * cdiff).cast("bigint").alias("dd"))
        )
        wv = Window.partitionBy("vec_id").orderBy("dd", "k")
        cassign = (
            cdist.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("k").alias("ck"))
        )
        resid = (
            dims_p.join(cassign, "vec_id")
            .join(
                F.broadcast(seeds),
                (F.col("s_pos") == F.col("pos"))
                & (F.col("k") == F.col("ck")),
            )
            .select(
                "vec_id", "pos", "sub",
                (F.col("xi") - F.col("si")).alias("ri"),
            )
        )
        with with_persisted(resid) as resid_p:
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
            rbest = (
                rdist.withColumn("rn", F.row_number().over(ws))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", F.col("dd").alias("rdd"))
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
            fbest = (
                fdist.withColumn("rn", F.row_number().over(ws))
                .filter(F.col("rn") == 1)
                .select("vec_id", "sub", F.col("dd").alias("fdd"))
            )
            agg = (
                fbest.join(rbest, ["vec_id", "sub"])
                .groupBy("sub")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                    F.sum(F.col("fdd").cast(d19)).cast("double").alias("flat_g"),
                    F.sum(F.col("rdd").cast(d19)).cast("double").alias("res_g"),
                )
            )
            return materialize(
                agg.select(
                    F.col("sub").cast("bigint").alias("sub"),
                    "n_vecs",
                    F.round(F.col("flat_g") / 1e12, 4).alias("flat_sq_error"),
                    F.round(F.col("res_g") / 1e12, 4).alias(
                        "residual_sq_error"
                    ),
                    F.round(
                        (F.col("flat_g") - F.col("res_g"))
                        * 1000000.0
                        / F.col("flat_g")
                    )
                    .cast("bigint")
                    .alias("gain_ppm"),
                )
                .orderBy("sub")
            )


ROUND10_STAGED["residual_pq_distortion"] = (
    residual_pq_distortion,
    _RESIDUAL_PQ_ORACLE,
)


# --------------------------------------------------------------------------
# ROUND-10 STAGED (ROADMAP "Retrieval / embeddings"): HNSW-style
# layered neighborhood audit — BOUNDED census, not a graph build. Each
# vector draws a deterministic geometric level (trailing-zero count of
# an affine hash of vec_id — the arithmetic twin of HNSW's
# floor(-ln(U)*mL) draw, expected occupancy n/2^l), and for every
# layer l >= 1 the audit reports what an HNSW build would see there:
# occupancy, the M-NN edge count, how symmetric the neighborhood is
# (mutual edges — HNSW's bidirectional-link heuristic quality), and
# the mean M-th-neighbor radius (the greedy-search hop scale).
# Layer 0 is the full corpus: its neighborhood statistics are exactly
# the registered knn_* family's contract, so the audit starts at
# l = 1 to stay sub-quadratic relative to the base table (sum of
# occupancy^2 ~ n^2/3 over layers 1.. vs n^2 for layer 0).
#
# Determinism: levels are pure integer arithmetic; distances are exact
# grid-integer squared L2; top-M picks break ties on neighbor_id; the
# radius mean is an exact integer sum cast to double once.
# --------------------------------------------------------------------------
_HNSW_M = 4
_HNSW_MAX_LEVEL = 4
_HNSW_HASH_A = 2654435761  # Knuth multiplicative constant
_HNSW_HASH_P = 2147483647

_HNSW_LEVEL_SQL = f"""
      SELECT vec_id,
             CASE
               WHEN ((vec_id * {_HNSW_HASH_A}) % {_HNSW_HASH_P}) % 16 = 0 THEN 4
               WHEN ((vec_id * {_HNSW_HASH_A}) % {_HNSW_HASH_P}) % 8 = 0 THEN 3
               WHEN ((vec_id * {_HNSW_HASH_A}) % {_HNSW_HASH_P}) % 4 = 0 THEN 2
               WHEN ((vec_id * {_HNSW_HASH_A}) % {_HNSW_HASH_P}) % 2 = 0 THEN 1
               ELSE 0
             END AS lvl
      FROM embeddings
"""

_HNSW_AUDIT_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    lv AS ({_HNSW_LEVEL_SQL}),
    layers AS (SELECT UNNEST([1, 2, 3, 4]) AS layer),
    members AS (
      SELECT ly.layer, lv.vec_id
      FROM lv JOIN layers ly ON lv.lvl >= ly.layer
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    pdist AS (
      SELECT m1.layer, m1.vec_id AS src, m2.vec_id AS dst,
             (SELECT CAST(SUM((da.xi - db.xi) * (da.xi - db.xi)) AS BIGINT)
              FROM dims da JOIN dims db ON db.pos = da.pos
              WHERE da.vec_id = m1.vec_id AND db.vec_id = m2.vec_id) AS dd
      FROM members m1
      JOIN members m2 ON m2.layer = m1.layer AND m2.vec_id <> m1.vec_id
    ),
    topm AS (
      SELECT layer, src, dst, dd FROM (
        SELECT layer, src, dst, dd,
               ROW_NUMBER() OVER (PARTITION BY layer, src
                                  ORDER BY dd, dst) AS rn
        FROM pdist
      ) WHERE rn <= {_HNSW_M}
    ),
    radius AS (
      SELECT layer, src, MAX(dd) AS r FROM topm GROUP BY 1, 2
    ),
    mutual AS (
      SELECT a.layer, COUNT(*) AS n_mutual_directed
      FROM topm a JOIN topm b
        ON b.layer = a.layer AND b.src = a.dst AND b.dst = a.src
      GROUP BY 1
    ),
    agg_t AS (
      SELECT layer,
             CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
             CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM topm GROUP BY 1
    ),
    agg_r AS (
      SELECT layer, CAST(SUM(r::HUGEINT) AS DOUBLE) AS r_sum
      FROM radius GROUP BY 1
    )
    SELECT CAST(t.layer AS BIGINT) AS layer,
           t.n_nodes,
           t.n_edges,
           CAST(COALESCE(m.n_mutual_directed, 0) // 2 AS BIGINT)
             AS n_mutual_edges,
           ROUND(r.r_sum / t.n_nodes / {_HNSW_M} / 1e12, 4) AS mean_radius
    FROM agg_t t
    JOIN agg_r r ON r.layer = t.layer
    LEFT JOIN mutual m ON m.layer = t.layer
    ORDER BY layer
    """


def hnsw_layer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layered M-NN neighborhood census (see staged block comment).
    mean_radius = per-node MAX top-M distance, summed exactly
    (decimal path), averaged over nodes, one double division chain —
    identical expression order on both sides."""
    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    lvl = (
        F.when((F.col("vec_id") * _HNSW_HASH_A % _HNSW_HASH_P) % 16 == 0, 4)
        .when((F.col("vec_id") * _HNSW_HASH_A % _HNSW_HASH_P) % 8 == 0, 3)
        .when((F.col("vec_id") * _HNSW_HASH_A % _HNSW_HASH_P) % 4 == 0, 2)
        .when((F.col("vec_id") * _HNSW_HASH_A % _HNSW_HASH_P) % 2 == 0, 1)
        .otherwise(0)
    )
    lv = e.select("vec_id", lvl.alias("lvl"))
    layers = spark.range(1, _HNSW_MAX_LEVEL + 1).select(
        F.col("id").cast("int").alias("layer")
    )
    members = lv.join(
        F.broadcast(layers), F.col("lvl") >= F.col("layer")
    ).select("layer", "vec_id")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    m1 = members.select(F.col("layer"), F.col("vec_id").alias("src"))
    m2 = members.select(
        F.col("layer").alias("layer2"), F.col("vec_id").alias("dst")
    )
    pairs = m1.join(
        m2,
        (F.col("layer") == F.col("layer2")) & (F.col("src") != F.col("dst")),
    ).select("layer", "src", "dst")
    da = dims.select(
        F.col("vec_id").alias("src"), "pos", F.col("xi").alias("xa")
    )
    db = dims.select(
        F.col("vec_id").alias("dst_b"),
        F.col("pos").alias("pos_b"),
        F.col("xi").alias("xb"),
    )
    diff = F.col("xa") - F.col("xb")
    # distance per (src, dst) computed ONCE on the distinct pair set,
    # then joined back to the (layer, src, dst) membership pairs — the
    # same (a, b) pair appears in every layer both endpoints share
    upairs = pairs.select("src", "dst").distinct()
    udist = (
        upairs.join(da, "src")
        .join(
            db,
            (F.col("pos_b") == F.col("pos"))
            & (F.col("dst_b") == F.col("dst")),
        )
        .groupBy("src", "dst")
        .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
    )
    pdist = pairs.join(udist, ["src", "dst"])
    wm = Window.partitionBy("layer", "src").orderBy("dd", "dst")
    topm = pdist.withColumn("rn", F.row_number().over(wm)).filter(
        F.col("rn") <= _HNSW_M
    )
    radius = topm.groupBy("layer", "src").agg(F.max("dd").alias("r"))
    ta = topm.select("layer", "src", "dst")
    tb = topm.select(
        F.col("layer").alias("layer_b"),
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
    )
    mutual = (
        ta.join(tb, ["src", "dst"])
        .filter(F.col("layer") == F.col("layer_b"))
        .groupBy("layer")
        .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_mutual_edges"))
    )
    d19 = "decimal(19,0)"
    stats = (
        topm.groupBy("layer")
        .agg(
            F.countDistinct("src").cast("bigint").alias("n_nodes"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        )
        .join(
            radius.groupBy("layer").agg(
                F.sum(F.col("r").cast(d19)).cast("double").alias("r_sum")
            ),
            "layer",
        )
        .join(mutual, "layer", "left")
    )
    return stats.select(
        F.col("layer").cast("bigint").alias("layer"),
        "n_nodes",
        "n_edges",
        F.coalesce("n_mutual_edges", F.lit(0))
        .cast("bigint")
        .alias("n_mutual_edges"),
        F.round(
            F.col("r_sum") / F.col("n_nodes") / _HNSW_M / 1e12, 4
        ).alias("mean_radius"),
    ).orderBy("layer")


ROUND10_STAGED["hnsw_layer_audit"] = (hnsw_layer_audit, _HNSW_AUDIT_ORACLE)


# --------------------------------------------------------------------------
# ROUND-10 STAGED (round-11 candidate pulled forward): binary (sign)
# quantization recall — 1 bit per dimension, ranking by ascending
# Hamming distance between sign vectors, evaluated against the
# full-precision brute-force truth. Completes the quantization family
# (flat PQ, residual PQ, b-bit minhash): sign quantization is the
# cheapest embedding compression a platform can ship (64 dims -> 8
# bytes, XOR+popcount search), and this is the table that says what
# recall@5 it costs on THIS corpus.
#
# Determinism: sign bits from grid integers (xi >= 0), Hamming counts
# are exact integer sums, ranking ties (Hamming is 0..64 — ties are
# the NORM) break on neighbor_id identically in both engines.
# Audit-scale: quadratic truth side, bounded by N_QUERIES.
# --------------------------------------------------------------------------
_BINQ_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    bits AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CASE WHEN CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) >= 0
                  THEN 1 ELSE 0 END AS b
      FROM v
    ),
    ham AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS BIGINT)
               AS hamming
      FROM bits q
      JOIN bits c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    top AS (
      SELECT query_id, neighbor_id, hamming FROM (
        SELECT query_id, neighbor_id, hamming,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY hamming, neighbor_id) AS rnk
        FROM ham
      ) WHERE rnk <= {TOP_K}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    )
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits,
           ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_5,
           ROUND(CAST(SUM(s.hamming) AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS mean_hamming
    FROM top s
    LEFT JOIN truth t ON t.query_id = s.query_id
                     AND t.neighbor_id = s.neighbor_id
    """


def binary_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit Hamming retrieval vs full-precision truth (see staged
    block comment)."""
    e = _emb(spark, sf_dir)
    bit = (F.round(F.col("x") * 1000000).cast("bigint") >= 0).cast("int")
    bits = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), bit.alias("b"))
    q = bits.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("b").alias("qb")
    )
    c = bits.select(
        F.col("vec_id").alias("neighbor_id"), "pos", F.col("b").alias("cb")
    )
    ham = (
        F.broadcast(q)
        .join(c, "pos")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(
                F.when(F.col("qb") != F.col("cb"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("hamming")
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    top = ham.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    truth = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_true")
    )
    return top.join(truth, ["query_id", "neighbor_id"], "left").agg(
        F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
        F.sum(F.coalesce("is_true", F.lit(0))).cast("bigint").alias("n_hits"),
        F.round(
            F.sum(F.coalesce("is_true", F.lit(0))).cast("double")
            / (N_QUERIES * TOP_K),
            6,
        ).alias("recall_at_5"),
        F.round(
            F.sum("hamming").cast("double") / (N_QUERIES * TOP_K), 6
        ).alias("mean_hamming"),
    )


ROUND10_STAGED["binary_quantization_recall"] = (
    binary_quantization_recall,
    _BINQ_ORACLE.replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
)


# --------------------------------------------------------------------------
# ROUND-10 STAGED (round-11 candidate pulled forward): graph-expansion
# recall ceiling. Graph-augmented ANN (HNSW/DiskANN's core move) grows
# the candidate set by walking kNN-graph edges from the hash-bucket
# seeds; this audit measures exactly what ONE hop buys on this corpus:
# stage a = the raw LSH bucket-mates (knn_lsh's candidate set), stage
# b = those plus each candidate's top-M exact neighbors. Per stage:
# mean candidate volume and recall@5 against the brute-force truth —
# the volume/recall trade a platform reads before turning on graph
# expansion.
#
# Determinism: candidate sets from the shared LSH codes (sign buckets,
# bit-identical across engines per functions/vector.py); the kNN
# graph and all rankings on exact grid-integer dots with neighbor_id
# tie-breaks (matryoshka pattern — one double division per ranked
# pair). Audit-scale: the graph build is the full quadratic, same
# contract as mutual_knn_symmetry.
#
# Plan posture (PLANS.md: 18 exchanges — above the registry norm but
# each runs ONCE on a bounded frame): the declared-quadratic graph
# build, the LSH candidate derivation, the two-stage dot/rank pass,
# and the composed knn_bruteforce truth. The round-11 staged sibling
# two_hop_expansion_ceiling scores the superset pairs once and ranks
# every nested stage in one window (the tighter form); this op keeps
# its original two-stage shape — it is green-on-file and its extra
# cost is one dot pass over the a-stage subset, dominated by the
# declared-quadratic graph build either way.
# --------------------------------------------------------------------------
_GEXP_M = 4

_GRAPH_EXPANSION_ORACLE = f"""
    WITH {{SQL_PLANES}},
    {{SQL_CODES}},
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM codes q JOIN codes c ON q.t = c.t AND q.code = c.code
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    gd AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             CAST(SUM((a.xi - b.xi) * (a.xi - b.xi)) AS BIGINT) AS dd
      FROM dims a JOIN dims b ON b.pos = a.pos AND b.vec_id <> a.vec_id
      GROUP BY 1, 2
    ),
    g AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dd, dst) AS rn
        FROM gd
      ) WHERE rn <= {_GEXP_M}
    ),
    stages AS (
      SELECT 'a_lsh' AS stage, query_id, neighbor_id FROM cand
      UNION
      SELECT 'b_lsh_1hop', query_id, neighbor_id FROM cand
      UNION
      SELECT 'b_lsh_1hop', c.query_id, g.dst
      FROM cand c JOIN g ON g.src = c.neighbor_id
      WHERE g.dst <> c.query_id
    ),
    pn AS (
      SELECT vec_id,
             CAST(SUM(xi * xi) AS DOUBLE) AS cc
      FROM dims GROUP BY 1
    ),
    dotg AS (
      SELECT s.stage, s.query_id, s.neighbor_id,
             CAST(SUM(dq.xi * dn.xi) AS DOUBLE) AS dot
      FROM stages s
      JOIN dims dq ON dq.vec_id = s.query_id
      JOIN dims dn ON dn.vec_id = s.neighbor_id AND dn.pos = dq.pos
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT d.stage, d.query_id, d.neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY d.stage, d.query_id
               ORDER BY CASE WHEN p.cc = 0 THEN CAST(-2.0 AS DOUBLE)
                        ELSE d.dot / sqrt(p.cc) END DESC,
                        d.neighbor_id) AS rnk
      FROM dotg d JOIN pn p ON p.vec_id = d.neighbor_id
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    ),
    vol AS (
      SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM stages GROUP BY 1
    ),
    hits AS (
      SELECT r.stage,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT h.stage,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.stage = h.stage
    ORDER BY h.stage
    """


def graph_expansion_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates vs 1-hop kNN-graph expansion (see staged block
    comment). The dims frame feeds the graph build, the norms, and
    both dot sides -> with_persisted + materialize."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    bucketed = _bucketed(e)
    with with_persisted(dims, bucketed) as (dims_p, bucketed_p):
        qb = bucketed_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "bucket"
        )
        cb = bucketed_p.select(
            F.col("vec_id").alias("neighbor_id"), "bucket"
        )
        cand = (
            qb.join(cb, "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        da = dims_p.select(
            F.col("vec_id").alias("src"), "pos", F.col("xi").alias("xa")
        )
        db = dims_p.select(
            F.col("vec_id").alias("dst"),
            F.col("pos").alias("pos_b"),
            F.col("xi").alias("xb"),
        )
        diff = F.col("xa") - F.col("xb")
        gd = (
            da.join(
                db,
                (F.col("pos_b") == F.col("pos"))
                & (F.col("dst") != F.col("src")),
            )
            .groupBy("src", "dst")
            .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
        )
        wg = Window.partitionBy("src").orderBy("dd", "dst")
        g = (
            gd.withColumn("rn", F.row_number().over(wg))
            .filter(F.col("rn") <= _GEXP_M)
            .select("src", "dst")
        )
        hop = (
            cand.join(g, cand.neighbor_id == g.src)
            .filter(F.col("dst") != F.col("query_id"))
            .select("query_id", F.col("dst").alias("neighbor_id"))
        )
        stages = (
            cand.select(F.lit("a_lsh").alias("stage"), "query_id", "neighbor_id")
            .unionByName(
                cand.select(
                    F.lit("b_lsh_1hop").alias("stage"),
                    "query_id",
                    "neighbor_id",
                )
            )
            .unionByName(
                hop.select(
                    F.lit("b_lsh_1hop").alias("stage"),
                    "query_id",
                    "neighbor_id",
                )
            )
            .distinct()
        )
        pn = dims_p.groupBy("vec_id").agg(
            F.sum(F.col("xi") * F.col("xi")).cast("double").alias("cc")
        )
        dq = dims_p.select(
            F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
        )
        dn = dims_p.select(
            F.col("vec_id").alias("nb"),
            F.col("pos").alias("pos_n"),
            F.col("xi").alias("ni"),
        )
        dotg = (
            stages.join(dq, "query_id")
            .join(
                dn,
                (F.col("pos_n") == F.col("pos"))
                & (F.col("nb") == F.col("neighbor_id")),
            )
            .groupBy("stage", "query_id", "neighbor_id")
            .agg(F.sum(F.col("qi") * F.col("ni")).cast("double").alias("dot"))
        )
        # cc = 0 guard (ADVICE r9, matryoshka pattern): Spark's
        # non-ANSI /0 -> NULL vs DuckDB's IEEE inf/nan would diverge
        # the ranking for an (unreachable on this corpus) all-zero
        # grid vector — pin to the -2.0 sentinel on both engines.
        wr = Window.partitionBy("stage", "query_id").orderBy(
            F.when(F.col("cc") == 0, F.lit(-2.0))
            .otherwise(F.col("dot") / F.sqrt("cc"))
            .desc(),
            "neighbor_id",
        )
        ranked = (
            dotg.join(pn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= TOP_K)
        )
        truth = knn_bruteforce(spark, sf_dir).select(
            "query_id", "neighbor_id", F.lit(1).alias("is_true")
        )
        vol = stages.groupBy("stage").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        )
        hits = (
            ranked.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("stage")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, "stage")
            .select(
                "stage",
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_candidates").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("stage")
        )


ROUND10_STAGED["graph_expansion_recall"] = (
    graph_expansion_recall,
    _GRAPH_EXPANSION_ORACLE.replace("{SQL_PLANES}", _sql_planes())
    .replace("{SQL_CODES}", _SQL_CODES)
    .replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
)


# ==========================================================================
# ROUND-11 STAGED (VERDICT r9 item 6; zero registry delta until the
# round-11 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Asymmetric binary retrieval (ROADMAP round-11 "Retrieval"): the
# production asymmetric-hashing trade — the CORPUS is compressed to
# sign bits (1 bit/dim, the binary_quantization_recall layout) but the
# QUERY stays full precision, scoring by sum_i q_i * sign(c_i). Keeps
# the index at 8 bytes/vector while recovering much of the recall the
# symmetric Hamming ranking loses (Jegou et al.'s asymmetric-distance
# observation applied to sign quantization). This table is the
# side-by-side: recall@5 of the asymmetric scorer against the
# full-precision truth, with the symmetric recall joined in so the
# win is one row.
# Determinism: q_i as grid integers, sign(c_i) in {-1, +1} (grid
# int >= 0 -> +1, the binq convention), so scores are EXACT integer
# sums; ties break on neighbor_id. Audit-scale: quadratic truth,
# bounded by N_QUERIES (same contract as binary_quantization_recall).
# --------------------------------------------------------------------------
_ASYM_BINQ_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(q.xi * (CASE WHEN c.xi >= 0 THEN 1 ELSE -1 END))
                  AS BIGINT) AS score,
             CAST(SUM(CASE WHEN (q.xi >= 0) <> (c.xi >= 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      FROM dims q
      JOIN dims c ON c.pos = q.pos AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    top_a AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ) WHERE rnk <= {TOP_K}
    ),
    top_s AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY hamming, neighbor_id) AS rnk
        FROM scored
      ) WHERE rnk <= {TOP_K}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    )
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           (SELECT CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
            FROM top_a a LEFT JOIN truth t
              ON t.query_id = a.query_id
             AND t.neighbor_id = a.neighbor_id) AS n_hits_asym,
           (SELECT CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT)
            FROM top_s s LEFT JOIN truth t
              ON t.query_id = s.query_id
             AND t.neighbor_id = s.neighbor_id) AS n_hits_sym,
           (SELECT ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                         / ({N_QUERIES} * {TOP_K}), 6)
            FROM top_a a LEFT JOIN truth t
              ON t.query_id = a.query_id
             AND t.neighbor_id = a.neighbor_id) AS recall_asym,
           (SELECT ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                         / ({N_QUERIES} * {TOP_K}), 6)
            FROM top_s s LEFT JOIN truth t
              ON t.query_id = s.query_id
             AND t.neighbor_id = s.neighbor_id) AS recall_sym
    """


def asymmetric_binary_retrieval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full-precision query vs sign-bit corpus, side-by-side with the
    symmetric Hamming ranking (see staged block comment). One
    (query, neighbor) aggregation computes BOTH scores; the two
    rankings share it."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    q = dims.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
    )
    c = dims.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("pos").alias("pos_c"),
        F.col("xi").alias("ci"),
    )
    sgn = F.when(F.col("ci") >= 0, F.lit(1)).otherwise(F.lit(-1))
    qsign_ne = (F.col("qi") >= 0) != (F.col("ci") >= 0)
    scored = (
        F.broadcast(q)
        .join(c, F.col("pos_c") == F.col("pos"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("qi") * sgn).cast("bigint").alias("score"),
            F.sum(qsign_ne.cast("long")).cast("bigint").alias("hamming"),
        )
    )
    truth = knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("is_true")
    )
    with with_persisted(scored) as scored_p:
        wa = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), "neighbor_id"
        )
        ws = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")

        def hits(w) -> DataFrame:
            return (
                scored_p.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= TOP_K)
                .join(truth, ["query_id", "neighbor_id"], "left")
                .agg(
                    F.sum(F.coalesce("is_true", F.lit(0)))
                    .cast("bigint")
                    .alias("n")
                )
            )

        out = (
            hits(wa)
            .withColumnRenamed("n", "n_hits_asym")
            .crossJoin(hits(ws).withColumnRenamed("n", "n_hits_sym"))
            .select(
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                "n_hits_asym",
                "n_hits_sym",
                F.round(
                    F.col("n_hits_asym").cast("double")
                    / (N_QUERIES * TOP_K),
                    6,
                ).alias("recall_asym"),
                F.round(
                    F.col("n_hits_sym").cast("double")
                    / (N_QUERIES * TOP_K),
                    6,
                ).alias("recall_sym"),
            )
        )
        return materialize(out)


# --------------------------------------------------------------------------
# Two-hop expansion ceiling (ROADMAP round-11 "Retrieval"):
# graph_expansion_recall's natural continuation — stage a = LSH
# candidates, stage b = + 1 hop through the exact kNN graph, stage
# c = + 2 hops. The table reads as the diminishing-returns curve that
# says where graph expansion stops paying for its candidate volume.
# Same determinism + audit-scale contract as graph_expansion_recall
# (quadratic graph build bounded by the 500-vector corpus; rankings
# on exact grid-integer dots with the cc=0 sentinel guard; candidate
# sets from the shared bit-identical LSH codes).
#
# Plan posture (staged audit, round 10): ~19 exchanges — high for the
# registry but each runs ONCE on a bounded frame: the declared-
# quadratic graph build (~5), the LSH candidate derivation, three
# materialized domain-sized frontiers, ONE superset dot-product pass,
# ONE rank window (three per-stage ranks as running membership sums —
# the nesting trick), and the composed knn_bruteforce truth. A lazy
# first cut re-derived the graph per expansion stage and audited at
# 44 exchanges; a per-stage window version audited at 24 with 3x the
# ranked row volume.
# --------------------------------------------------------------------------
_TWO_HOP_ORACLE = f"""
    WITH {{SQL_PLANES}},
    {{SQL_CODES}},
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM codes q JOIN codes c ON q.t = c.t AND q.code = c.code
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    gd AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             CAST(SUM((a.xi - b.xi) * (a.xi - b.xi)) AS BIGINT) AS dd
      FROM dims a JOIN dims b ON b.pos = a.pos AND b.vec_id <> a.vec_id
      GROUP BY 1, 2
    ),
    g AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY dd, dst) AS rn
        FROM gd
      ) WHERE rn <= {_GEXP_M}
    ),
    hop1 AS (
      SELECT DISTINCT c.query_id, g.dst AS neighbor_id
      FROM cand c JOIN g ON g.src = c.neighbor_id
      WHERE g.dst <> c.query_id
    ),
    front1 AS (
      SELECT query_id, neighbor_id FROM cand
      UNION
      SELECT query_id, neighbor_id FROM hop1
    ),
    hop2 AS (
      SELECT DISTINCT f.query_id, g.dst AS neighbor_id
      FROM front1 f JOIN g ON g.src = f.neighbor_id
      WHERE g.dst <> f.query_id
    ),
    stages AS (
      SELECT 'a_lsh' AS stage, query_id, neighbor_id FROM cand
      UNION
      SELECT 'b_1hop', query_id, neighbor_id FROM front1
      UNION
      SELECT 'c_2hop', query_id, neighbor_id FROM front1
      UNION
      SELECT 'c_2hop', query_id, neighbor_id FROM hop2
    ),
    pn AS (
      SELECT vec_id, CAST(SUM(xi * xi) AS DOUBLE) AS cc
      FROM dims GROUP BY 1
    ),
    dotg AS (
      SELECT s.stage, s.query_id, s.neighbor_id,
             CAST(SUM(dq.xi * dn.xi) AS DOUBLE) AS dot
      FROM stages s
      JOIN dims dq ON dq.vec_id = s.query_id
      JOIN dims dn ON dn.vec_id = s.neighbor_id AND dn.pos = dq.pos
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT d.stage, d.query_id, d.neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY d.stage, d.query_id
               ORDER BY CASE WHEN p.cc = 0 THEN CAST(-2.0 AS DOUBLE)
                        ELSE d.dot / sqrt(p.cc) END DESC,
                        d.neighbor_id) AS rnk
      FROM dotg d JOIN pn p ON p.vec_id = d.neighbor_id
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    ),
    vol AS (
      SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM stages GROUP BY 1
    ),
    hits AS (
      SELECT r.stage,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT h.stage,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.stage = h.stage
    ORDER BY h.stage
    """


def two_hop_expansion_ceiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH -> +1-hop -> +2-hop candidate volume / recall curve (see
    staged block comment). The dims frame feeds the graph build, the
    norms, and both dot sides -> with_persisted; the kNN graph and the
    frontiers are MATERIALIZED (domain-sized: n*M edges, <= n*queries
    candidate rows) so the quadratic graph build runs exactly once —
    left lazy, every expansion stage and the stages union re-derive it
    and the plan snowballs to 40+ exchanges (caught by the staged plan
    audit, round 10)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    bucketed = _bucketed(e)
    with with_persisted(dims, bucketed) as (dims_p, bucketed_p):
        qb = bucketed_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "bucket"
        )
        cb = bucketed_p.select(F.col("vec_id").alias("neighbor_id"), "bucket")
        cand = (
            qb.join(cb, "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        da = dims_p.select(
            F.col("vec_id").alias("src"), "pos", F.col("xi").alias("xa")
        )
        db = dims_p.select(
            F.col("vec_id").alias("dst"),
            F.col("pos").alias("pos_b"),
            F.col("xi").alias("xb"),
        )
        diff = F.col("xa") - F.col("xb")
        gd = (
            da.join(
                db,
                (F.col("pos_b") == F.col("pos"))
                & (F.col("dst") != F.col("src")),
            )
            .groupBy("src", "dst")
            .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
        )
        wg = Window.partitionBy("src").orderBy("dd", "dst")
        g = materialize(
            gd.withColumn("rn", F.row_number().over(wg))
            .filter(F.col("rn") <= _GEXP_M)
            .select("src", "dst")
        )
        cand = materialize(cand)

        def expand(frontier: DataFrame) -> DataFrame:
            return (
                frontier.join(g, frontier.neighbor_id == g.src)
                .filter(F.col("dst") != F.col("query_id"))
                .select("query_id", F.col("dst").alias("neighbor_id"))
                .distinct()
            )

        front1 = materialize(cand.unionByName(expand(cand)).distinct())
        hop2 = expand(front1)
        # stage candidate sets NEST (a ⊆ b ⊆ c), so the expensive part
        # — the exact dot products — is computed ONCE over the c-stage
        # superset and each stage ranks its membership subset via
        # boolean flags (the matryoshka single-pass lesson: a
        # per-stage dot recompute tripled the (query, neighbor)
        # aggregation for identical pairs).
        pairs_c = materialize(front1.unionByName(hop2).distinct())
        in_a = cand.select(
            "query_id", "neighbor_id", F.lit(1).alias("flag_a")
        )
        in_b = front1.select(
            "query_id", "neighbor_id", F.lit(1).alias("flag_b")
        )
        pn = dims_p.groupBy("vec_id").agg(
            F.sum(F.col("xi") * F.col("xi")).cast("double").alias("cc")
        )
        dq = dims_p.select(
            F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
        )
        dn = dims_p.select(
            F.col("vec_id").alias("nb"),
            F.col("pos").alias("pos_n"),
            F.col("xi").alias("ni"),
        )
        dotg = (
            pairs_c.join(dq, "query_id")
            .join(
                dn,
                (F.col("pos_n") == F.col("pos"))
                & (F.col("nb") == F.col("neighbor_id")),
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("qi") * F.col("ni")).cast("double").alias("dot"))
        )
        scored = (
            dotg.join(pn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
            .join(F.broadcast(in_a), ["query_id", "neighbor_id"], "left")
            .join(F.broadcast(in_b), ["query_id", "neighbor_id"], "left")
            .withColumn(
                "sim",
                F.when(F.col("cc") == 0, F.lit(-2.0)).otherwise(
                    F.col("dot") / F.sqrt("cc")
                ),
            )
        )
        truth = knn_bruteforce(spark, sf_dir).select(
            "query_id", "neighbor_id", F.lit(1).alias("is_true")
        )

        # ONE window ranks all three stages: because the sets nest, a
        # row's rank WITHIN stage s is the running count of s-members
        # at or above it in the shared (sim DESC, neighbor_id) order —
        # three running sums over one window spec instead of three
        # windows over three filtered frames.
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), "neighbor_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        flagged = scored.select(
            "query_id",
            "neighbor_id",
            (F.sum(F.coalesce("flag_a", F.lit(0))).over(w)).alias("rnk_a"),
            (F.sum(F.coalesce("flag_b", F.lit(0))).over(w)).alias("rnk_b"),
            F.count(F.lit(1)).over(w).alias("rnk_c"),
            F.coalesce("flag_a", F.lit(0)).alias("fa"),
            F.coalesce("flag_b", F.lit(0)).alias("fb"),
        )
        ranked = flagged.select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"stack(3, "
                f"'a_lsh',  fa = 1 AND rnk_a <= {TOP_K}, "
                f"'b_1hop', fb = 1 AND rnk_b <= {TOP_K}, "
                f"'c_2hop', rnk_c <= {TOP_K}) AS (stage, in_top)"
            ),
        ).filter(F.col("in_top")).select("stage", "query_id", "neighbor_id")
        vol = (
            cand.select(F.lit("a_lsh").alias("stage"))
            .unionByName(front1.select(F.lit("b_1hop").alias("stage")))
            .unionByName(pairs_c.select(F.lit("c_2hop").alias("stage")))
            .groupBy("stage")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        )
        hits = (
            ranked.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("stage")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, "stage")
            .select(
                "stage",
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_candidates").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("stage")
        )


ROUND11_STAGED: dict[str, tuple] = {
    "asymmetric_binary_retrieval": (
        asymmetric_binary_retrieval,
        _ASYM_BINQ_ORACLE.replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
    ),
    "two_hop_expansion_ceiling": (
        two_hop_expansion_ceiling,
        _TWO_HOP_ORACLE.replace("{SQL_PLANES}", _sql_planes())
        .replace("{SQL_CODES}", _SQL_CODES)
        .replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
    ),
}


# --------------------------------------------------------------------------
# Quantization pareto table (ROADMAP round-12, pulled forward): the
# serving-config decision table — bytes per vector vs recall@5 —
# assembled from the verified quantization family on ONE axis:
# float32 prefixes (matryoshka d=8/16/32 -> 32/64/128 B), sign-bit
# symmetric Hamming (8 B), sign-bit asymmetric scoring (8 B, the
# query stays full precision), and the full-precision anchor
# (256 B, recall 1.0 against itself by definition). A platform reads
# this row set to pick an index layout; every recall number is the
# SAME differential-verified computation its source operator runs
# (the oracle composes those oracles verbatim).
# Scale: pure composition — each source op's audit contract applies;
# the assembly itself is a unionByName of one-row/three-row frames.
# --------------------------------------------------------------------------
def _pareto_oracle() -> str:
    asym = _ASYM_BINQ_ORACLE.replace(
        "{KNN_TRUTH}", _ORACLES["knn_bruteforce"]
    )
    matry = _MATRYOSHKA_ORACLE.replace(
        "{KNN_TRUTH}", _ORACLES["knn_bruteforce"]
    )
    return f"""
    WITH m AS ({matry}), a AS ({asym})
    SELECT config, bytes_per_vec, recall_at_5 FROM (
      SELECT 'a_full_f32' AS config, CAST(256 AS BIGINT) AS bytes_per_vec,
             CAST(1.0 AS DOUBLE) AS recall_at_5
      UNION ALL
      SELECT 'b_matryoshka_d' || CAST(d_prefix AS VARCHAR),
             CAST(d_prefix * 4 AS BIGINT), recall_at_5
      FROM m
      UNION ALL
      SELECT 'c_binary_asym', CAST(8 AS BIGINT), recall_asym FROM a
      UNION ALL
      SELECT 'd_binary_sym', CAST(8 AS BIGINT), recall_sym FROM a
    ) ORDER BY config
    """


def quantization_pareto_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bytes/vector vs recall@5 across the verified quantization
    family (see block comment)."""
    m = matryoshka_recall_sweep(spark, sf_dir).select(
        F.concat(
            F.lit("b_matryoshka_d"), F.col("d_prefix").cast("string")
        ).alias("config"),
        (F.col("d_prefix") * 4).cast("bigint").alias("bytes_per_vec"),
        "recall_at_5",
    )
    a = asymmetric_binary_retrieval(spark, sf_dir)
    asym = a.select(
        F.lit("c_binary_asym").alias("config"),
        F.lit(8).cast("bigint").alias("bytes_per_vec"),
        F.col("recall_asym").alias("recall_at_5"),
    )
    sym = a.select(
        F.lit("d_binary_sym").alias("config"),
        F.lit(8).cast("bigint").alias("bytes_per_vec"),
        F.col("recall_sym").alias("recall_at_5"),
    )
    anchor = spark.createDataFrame(
        [("a_full_f32", 256, 1.0)],
        "config string, bytes_per_vec long, recall_at_5 double",
    )
    return (
        anchor.unionByName(m).unionByName(asym).unionByName(sym)
        .orderBy("config")
    )


ROUND11_STAGED["quantization_pareto_table"] = (
    quantization_pareto_table,
    _pareto_oracle(),
)


# --------------------------------------------------------------------------
# Multiprobe schedule advisor (ROADMAP round-12, pulled forward): the
# probe/recall dial behind knn_lsh_multiprobe, emitted as the
# schedule a query planner reads — per probe radius r (hamming
# distance between sign codes, r = 0/1/2): mean candidate volume and
# recall@5 against the brute-force truth. Radius-r candidate sets
# NEST (r=0 ⊆ r<=1 ⊆ r<=2), so the exact dots are computed ONCE over
# the r<=2 superset and each radius ranks its membership subset via
# running sums in ONE window (the two_hop_expansion_ceiling pattern).
# Per-pair membership comes from d_min = MIN over tables of
# bit_count(code_q XOR code_c) — bit-identical across engines via the
# shared hyperplane constants.
# Scale: the (query x corpus x table) code join is N_QUERIES-bounded
# on the probe side (the corpus side carries one row per (vector,
# table), the knn_lsh_multiprobe posture); dots follow the audit
# contract of the other recall sweeps.
# --------------------------------------------------------------------------
_PROBE_RADII = [0, 1, 2]

_PROBE_SCHEDULE_ORACLE = f"""
    WITH {{SQL_PLANES}},
    {{SQL_CODES}},
    dmin AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             MIN(bit_count(xor(q.code, c.code))) AS d_min
      FROM codes q JOIN codes c ON q.t = c.t AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    cand AS (SELECT * FROM dmin WHERE d_min <= {max(_PROBE_RADII)}),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    dims AS (
      SELECT vec_id, generate_subscripts(e, 1) AS pos,
             CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
      FROM v
    ),
    pn AS (
      SELECT vec_id, CAST(SUM(xi * xi) AS DOUBLE) AS cc
      FROM dims GROUP BY 1
    ),
    dotg AS (
      SELECT s.query_id, s.neighbor_id, s.d_min,
             CAST(SUM(dq.xi * dn.xi) AS DOUBLE) AS dot
      FROM cand s
      JOIN dims dq ON dq.vec_id = s.query_id
      JOIN dims dn ON dn.vec_id = s.neighbor_id AND dn.pos = dq.pos
      GROUP BY 1, 2, 3
    ),
    rr(probe_radius) AS (VALUES
      {", ".join(f"({r})" for r in _PROBE_RADII)}
    ),
    ranked AS (
      SELECT rr.probe_radius, d.query_id, d.neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY rr.probe_radius, d.query_id
               ORDER BY CASE WHEN p.cc = 0 THEN CAST(-2.0 AS DOUBLE)
                        ELSE d.dot / sqrt(p.cc) END DESC,
                        d.neighbor_id) AS rnk
      FROM dotg d
      JOIN pn p ON p.vec_id = d.neighbor_id
      JOIN rr ON d.d_min <= rr.probe_radius
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM ({{KNN_TRUTH}})
    ),
    vol AS (
      SELECT rr.probe_radius, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM dmin d JOIN rr ON d.d_min <= rr.probe_radius
      GROUP BY 1
    ),
    hits AS (
      SELECT r.probe_radius,
             CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits
      FROM ranked r
      LEFT JOIN truth t ON t.query_id = r.query_id
                       AND t.neighbor_id = r.neighbor_id
      WHERE r.rnk <= {TOP_K}
      GROUP BY 1
    )
    SELECT CAST(h.probe_radius AS BIGINT) AS probe_radius,
           CAST({N_QUERIES} AS BIGINT) AS n_queries,
           ROUND(CAST(v.n_candidates AS DOUBLE) / {N_QUERIES}, 6)
             AS mean_candidates,
           h.n_hits,
           ROUND(CAST(h.n_hits AS DOUBLE) / ({N_QUERIES} * {TOP_K}), 6)
             AS recall_at_5
    FROM hits h JOIN vol v ON v.probe_radius = h.probe_radius
    ORDER BY probe_radius
    """


def multiprobe_schedule_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probe-radius / recall schedule (see block comment: superset
    dots once, nested radii ranked in one window)."""
    from bigdataentrytask_spark.operators import materialize, with_persisted

    e = _emb(spark, sf_dir)
    bucketed = _bucketed(e)
    grid = F.round(F.col("x") * 1000000).cast("bigint")
    dims = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos0", "x"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), grid.alias("xi"))
    with with_persisted(dims) as dims_p:
        qc = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("bucket.t").alias("t"),
            F.col("bucket.code").alias("qcode"),
        )
        cc_ = bucketed.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("bucket.t").alias("t"),
            F.col("bucket.code").alias("ccode"),
        )
        dmin = materialize(
            F.broadcast(qc)
            .join(cc_, "t")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(
                F.min(
                    F.bit_count(
                        F.col("qcode").bitwiseXOR(F.col("ccode"))
                    )
                ).alias("d_min")
            )
        )
        rmax = max(_PROBE_RADII)
        cand = dmin.filter(F.col("d_min") <= rmax)
        dq = dims_p.select(
            F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
        )
        dn = dims_p.select(
            F.col("vec_id").alias("nb"),
            F.col("pos").alias("pos_n"),
            F.col("xi").alias("ni"),
        )
        pn = dims_p.groupBy("vec_id").agg(
            F.sum(F.col("xi") * F.col("xi")).cast("double").alias("cc")
        )
        dotg = (
            cand.join(dq, "query_id")
            .join(
                dn,
                (F.col("pos_n") == F.col("pos"))
                & (F.col("nb") == F.col("neighbor_id")),
            )
            .groupBy("query_id", "neighbor_id", "d_min")
            .agg(F.sum(F.col("qi") * F.col("ni")).cast("double").alias("dot"))
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
        flags = scored.select(
            "query_id",
            "neighbor_id",
            *[
                F.sum((F.col("d_min") <= r).cast("long"))
                .over(w)
                .alias(f"rnk_{r}")
                for r in _PROBE_RADII
            ],
            *[
                (F.col("d_min") <= r).cast("int").alias(f"in_{r}")
                for r in _PROBE_RADII
            ],
        )
        stack_expr = ", ".join(
            f"CAST({r} AS BIGINT), in_{r} = 1 AND rnk_{r} <= {TOP_K}"
            for r in _PROBE_RADII
        )
        ranked = flags.select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"stack({len(_PROBE_RADII)}, {stack_expr})"
                " AS (probe_radius, in_top)"
            ),
        ).filter(F.col("in_top")).select(
            "probe_radius", "query_id", "neighbor_id"
        )
        truth = knn_bruteforce(spark, sf_dir).select(
            "query_id", "neighbor_id", F.lit(1).alias("is_true")
        )
        rr = spark.createDataFrame(
            [(r,) for r in _PROBE_RADII], "probe_radius long"
        )
        vol = (
            dmin.crossJoin(F.broadcast(rr))
            .filter(F.col("d_min") <= F.col("probe_radius"))
            .groupBy("probe_radius")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        )
        hits = (
            ranked.join(truth, ["query_id", "neighbor_id"], "left")
            .groupBy("probe_radius")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
        )
        return materialize(
            hits.join(vol, "probe_radius")
            .select(
                F.col("probe_radius").cast("bigint").alias("probe_radius"),
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.round(
                    F.col("n_candidates").cast("double") / N_QUERIES, 6
                ).alias("mean_candidates"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
            .orderBy("probe_radius")
        )


ROUND11_STAGED["multiprobe_schedule_advisor"] = (
    multiprobe_schedule_advisor,
    _PROBE_SCHEDULE_ORACLE.replace("{SQL_PLANES}", _sql_planes())
    .replace("{SQL_CODES}", _SQL_CODES)
    .replace("{KNN_TRUTH}", _ORACLES["knn_bruteforce"]),
)


# --------------------------------------------------------------------------
# PQ asymmetric-distance recall (ROADMAP round-12, pulled forward;
# completes the quantization family): corpus vectors compress to
# their PQ codes (embedding_pq_assign's codebook + assignment — 4
# subspaces x 4 bits = 2 bytes/vector), queries stay full precision,
# and retrieval ranks by ADC — sum over subspaces of ||q_sub -
# centroid(code)||^2, the table-lookup distance IVFADC serves
# (Jegou et al. 2011). Recall@5 against the EXACT L2 truth (the
# canonical ADC benchmark; the cosine-truth family row lives in
# quantization_pareto_table). All distances are exact grid-integer
# sums; ranking ties break on neighbor_id. Audit-scale: quadratic
# truth bounded by N_QUERIES, the recall-sweep contract.
# --------------------------------------------------------------------------
_PQ_ADC_ORACLE = f"""
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
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dd, code) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
             CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS dd
      FROM assigned a
      JOIN codebook cb ON cb.sub = a.sub AND cb.code = a.code
      JOIN dims q ON q.pos = cb.pos AND q.vec_id <> a.vec_id
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1, 2
    ),
    top_adc AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
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
    )
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST(2 AS BIGINT) AS bytes_per_vec,
           CAST(count_if(t.neighbor_id IS NOT NULL) AS BIGINT) AS n_hits,
           ROUND(CAST(count_if(t.neighbor_id IS NOT NULL) AS DOUBLE)
                 / ({N_QUERIES} * {TOP_K}), 6) AS recall_at_5
    FROM top_adc a
    LEFT JOIN truth t ON t.query_id = a.query_id
                     AND t.neighbor_id = a.neighbor_id
    """


def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ table-lookup (ADC) retrieval vs exact-L2 truth (see block
    comment). The dims frame feeds the assignment, the query side,
    and the exact truth -> with_persisted + materialize."""
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
        codebook = (
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
        diff = F.col("xi") - F.col("ci")
        dist = (
            dims_p.join(
                F.broadcast(codebook),
                (F.col("cb_pos") == F.col("pos"))
                & (F.col("cb_sub") == F.col("sub")),
            )
            .groupBy("vec_id", "sub", F.col("cb_code").alias("code"))
            .agg(F.sum(diff * diff).cast("bigint").alias("dd"))
        )
        wa = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
        assigned = materialize(
            dist.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "code")
        )
        qd = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("pos").alias("q_pos"),
            F.col("xi").alias("qi"),
        )
        adc = (
            assigned.join(
                F.broadcast(codebook),
                (F.col("cb_sub") == F.col("sub"))
                & (F.col("cb_code") == F.col("code")),
            )
            .join(
                F.broadcast(qd),
                (F.col("q_pos") == F.col("cb_pos"))
                & (F.col("query_id") != F.col("vec_id")),
            )
            .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
            .agg(
                F.sum((F.col("qi") - F.col("ci")) * (F.col("qi") - F.col("ci")))
                .cast("bigint")
                .alias("dd")
            )
        )
        wr = Window.partitionBy("query_id").orderBy("dd", "neighbor_id")
        top_adc = adc.withColumn("rnk", F.row_number().over(wr)).filter(
            F.col("rnk") <= TOP_K
        )
        qx = dims_p.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "pos", F.col("xi").alias("qi")
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
                    (F.col("qi") - F.col("ci2")) * (F.col("qi") - F.col("ci2"))
                )
                .cast("bigint")
                .alias("dd")
            )
        )
        truth = (
            exact.withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", F.lit(1).alias("is_true"))
        )
        return materialize(
            top_adc.join(truth, ["query_id", "neighbor_id"], "left")
            .agg(
                F.sum(F.coalesce("is_true", F.lit(0)))
                .cast("bigint")
                .alias("n_hits")
            )
            .select(
                F.lit(N_QUERIES).cast("bigint").alias("n_queries"),
                F.lit(2).cast("bigint").alias("bytes_per_vec"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / (N_QUERIES * TOP_K), 6
                ).alias("recall_at_5"),
            )
        )


ROUND11_STAGED["pq_adc_recall"] = (pq_adc_recall, _PQ_ADC_ORACLE)


# --------------------------------------------------------------------------
# IVF-ADC end-to-end (ROADMAP round-12, pulled forward; the capstone
# composition of the serving stack): coarse IVF cell probe (the
# kmeans_step seed convention) + PQ table-lookup ADC ranking inside
# the probed cells (the pq_adc_recall machinery) — i.e. IVFADC
# proper (Jegou et al. 2011), the index layout a billion-vector
# platform actually serves. Per nprobe in {1, 2, 4}: mean candidate
# volume and recall@5 against the exact-L2 truth, isolating the
# COMPOUND loss (cell miss x quantization) that neither
# ivf_nprobe_recall_sweep (exact ranking in probed cells) nor
# pq_adc_recall (ADC over ALL cells) shows alone.
# Determinism: a pair's "probe level needed" = the rank of the
# neighbor's cell in the query's cell-distance ordering — computed
# ONCE per pair; nprobe sets NEST, so ONE superset ADC pass and ONE
# rank window with running membership sums serve all rows (the
# multiprobe_schedule_advisor pattern). All distances exact
# grid-integer sums; ties on neighbor_id. Audit-scale: quadratic
# truth bounded by N_QUERIES.
#
# Plan posture (staged audit, round 10): ~17 exchanges — high for the
# registry but each stage runs ONCE on a bounded/materialized frame:
# the coarse cell assignment, the PQ codebook assignment, the need-
# probe pair table, one superset ADC pass, one rank window, and the
# composed exact-L2 truth. Observed content is an HONEST NEGATIVE on
# this corpus: recall FALLS with nprobe (0.36 -> 0.32) because the
# 16-centroid toy codebook's quantization noise admits imposters as
# the pool widens — pinned in pytest as a regime detector.
# --------------------------------------------------------------------------
_IVF_ADC_PROBES = [1, 2, 4]

_IVF_ADC_ORACLE = f"""
    WITH {{IVF_CTES}},
    codebook AS (
      SELECT vec_id AS code, ((pos - 1) * {_PQ_SUB}) // {_PQ_DIM} AS sub,
             pos, xi AS ci
      FROM (SELECT vec_id, generate_subscripts(e, 1) AS pos,
                   CAST(ROUND(UNNEST(e) * 1000000) AS BIGINT) AS xi
            FROM v WHERE vec_id < {_PQ_K}) t
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


def ivf_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: coarse cell probe + PQ table-lookup ranking (see block
    comment — one superset ADC pass, nested nprobe levels in one
    window)."""
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
                F.sum((F.col("xi") - F.col("si")) * (F.col("xi") - F.col("si")))
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
                assigned_cell.withColumnRenamed("vec_id", "neighbor_id"), "k"
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.min("cell_rnk").alias("need_probe"))
        )
        codebook = (
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
        pq_dist = (
            dims_p.join(
                F.broadcast(codebook),
                (F.col("cb_pos") == F.col("pos"))
                & (F.col("cb_sub") == F.col("sub")),
            )
            .groupBy("vec_id", "sub", F.col("cb_code").alias("code"))
            .agg(
                F.sum((F.col("xi") - F.col("ci")) * (F.col("xi") - F.col("ci")))
                .cast("bigint")
                .alias("dd")
            )
        )
        wp = Window.partitionBy("vec_id", "sub").orderBy("dd", "code")
        pq_assigned = materialize(
            pq_dist.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "code")
        )
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
                F.sum((F.col("qi") - F.col("ci")) * (F.col("qi") - F.col("ci")))
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
                    (F.col("qi") - F.col("ci2")) * (F.col("qi") - F.col("ci2"))
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


ROUND11_STAGED["ivf_adc_recall"] = (
    ivf_adc_recall,
    _IVF_ADC_ORACLE.replace("{IVF_CTES}", _IVF_CTES),
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
