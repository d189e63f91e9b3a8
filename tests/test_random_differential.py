"""Randomized differential testing: generate seeded random
filter/group/aggregate queries, build the SAME spec as both a Spark
DataFrame plan and DuckDB SQL, require exact agreement. Catches
operator-semantics drift the hand-written suite doesn't reach."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from tests.conftest import SF_DIR, assert_matches_oracle

# (table, numeric cols, categorical cols (low cardinality), key col)
TABLES = {
    "orders": (
        ["o_totalprice"],
        ["o_orderstatus", "o_orderpriority"],
        "o_orderkey",
    ),
    "lineitem": (
        ["l_quantity", "l_extendedprice", "l_discount"],
        ["l_returnflag", "l_linestatus"],
        "l_orderkey",
    ),
    "customer": (
        ["c_acctbal"],
        ["c_mktsegment"],
        "c_custkey",
    ),
}

# numeric aggs cast the input to double on BOTH sides: Spark keeps
# SUM(bigint) as long while DuckDB's ROUND promotes to double — the
# exact kind of type drift this suite exists to keep out of oracles
def _d(c):
    return F.col(c).cast("double")


AGGS = [
    ("count", lambda c: F.count(F.lit(1)), lambda c: "COUNT(*)"),
    ("sum", lambda c: F.round(F.sum(_d(c)), 2), lambda c: f"ROUND(SUM(CAST({c} AS DOUBLE)), 2)"),
    ("min", lambda c: F.round(F.min(_d(c)), 2), lambda c: f"ROUND(MIN(CAST({c} AS DOUBLE)), 2)"),
    ("max", lambda c: F.round(F.max(_d(c)), 2), lambda c: f"ROUND(MAX(CAST({c} AS DOUBLE)), 2)"),
    ("avg", lambda c: F.round(F.avg(_d(c)), 4), lambda c: f"ROUND(AVG(CAST({c} AS DOUBLE)), 4)"),
    (
        "cntd",
        lambda c: F.countDistinct(c),
        lambda c: f"COUNT(DISTINCT {c})",
    ),
    # exact interpolated median — rank-based, so engine-independent
    (
        "med",
        lambda c: F.round(F.median(_d(c)), 4),
        lambda c: f"ROUND(median(CAST({c} AS DOUBLE)), 4)",
    ),
    (
        "cntif",
        lambda c: F.count_if(_d(c) > 0),
        lambda c: f"count_if(CAST({c} AS DOUBLE) > 0)",
    ),
]

OPS = [
    (">", lambda c, v: F.col(c) > v),
    ("<=", lambda c, v: F.col(c) <= v),
]


def build(seed: int, spark, duck):
    rng = random.Random(seed)
    tname = rng.choice(sorted(TABLES))
    nums, cats, key = TABLES[tname]
    df = load_table(spark, SF_DIR, tname)

    where_sql = []
    # numeric range filter at a quantile-ish cutoff drawn from data
    ncol = rng.choice(nums)
    q = rng.choice([0.25, 0.5, 0.75])
    cutoff = round(
        duck.execute(f"SELECT quantile_cont({ncol}, {q}) FROM {tname}").fetchone()[0], 3
    )
    op_s, op_f = rng.choice(OPS)
    df = df.filter(op_f(ncol, cutoff))
    where_sql.append(f"{ncol} {op_s} {cutoff}")
    # optional categorical filter
    if rng.random() < 0.5:
        ccol = rng.choice(cats)
        vals = [
            r[0]
            for r in duck.execute(
                f"SELECT DISTINCT {ccol} FROM {tname} ORDER BY 1"
            ).fetchall()
        ]
        pick = rng.sample(vals, k=min(len(vals), rng.randint(1, 2)))
        df = df.filter(F.col(ccol).isin(pick))
        quoted = ", ".join(f"'{v}'" for v in pick)
        where_sql.append(f"{ccol} IN ({quoted})")

    group_cols = rng.sample(cats, k=rng.randint(0, min(2, len(cats))))
    n_aggs = rng.randint(1, 3)
    aggs = rng.sample(AGGS, k=n_aggs)
    acol = rng.choice(nums + [key])

    spark_aggs = [fn(acol).alias(f"a_{name}") for name, fn, _ in aggs]
    sql_aggs = ", ".join(f"{sql(acol)} AS a_{name}" for name, _, sql in aggs)

    if group_cols:
        out = df.groupBy(*group_cols).agg(*spark_aggs).orderBy(*group_cols)
        sql = (
            f"SELECT {', '.join(group_cols)}, {sql_aggs} FROM {tname} "
            f"WHERE {' AND '.join(where_sql)} "
            f"GROUP BY {', '.join(group_cols)} ORDER BY {', '.join(group_cols)}"
        )
    else:
        out = df.agg(*spark_aggs)
        sql = f"SELECT {sql_aggs} FROM {tname} WHERE {' AND '.join(where_sql)}"
    return out, sql


@pytest.mark.parametrize("seed", range(25))
def test_random_query(spark, duck, seed):
    df, sql = build(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"seed{seed}: {sql}")


# ---------------------------------------------------------------------------
# Randomized JOIN specs: same idea, two-table equi-joins with filters and
# grouped aggregates, built identically for both engines.
# ---------------------------------------------------------------------------
JOINS = [
    # (left, right, left_key, right_key)
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
]
JOIN_GROUPS = {
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "nation": ["n_name"],
}
JOIN_MEASURES = {
    "orders": "o_totalprice",
    "customer": "c_acctbal",
    "lineitem": "l_extendedprice",
    "nation": "n_nationkey",
}


def build_join(seed: int, spark, duck):
    rng = random.Random(10_000 + seed)
    lname, rname, lkey, rkey = rng.choice(JOINS)
    ldf = load_table(spark, SF_DIR, lname)
    rdf = load_table(spark, SF_DIR, rname)
    how = rng.choice(["inner", "left"])
    gcol = rng.choice(JOIN_GROUPS[lname] + JOIN_GROUPS[rname])
    mtbl = rng.choice([lname, rname])
    mcol = JOIN_MEASURES[mtbl]

    joined = ldf.join(rdf, F.col(lkey) == F.col(rkey), how)
    out = (
        joined.groupBy(gcol)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(F.col(mcol).cast("double")), 2).alias("m_sum"),
        )
        .orderBy(gcol)
    )
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (
        f"SELECT {gcol}, COUNT(*) AS cnt, "
        f"ROUND(SUM(CAST({mcol} AS DOUBLE)), 2) AS m_sum "
        f"FROM {lname} {jt} {rname} ON {lname}.{lkey} = {rname}.{rkey} "
        f"GROUP BY {gcol} ORDER BY {gcol}"
    )
    return out, sql


@pytest.mark.parametrize("seed", range(15))
def test_random_join_query(spark, duck, seed):
    df, sql = build_join(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"jseed{seed}: {sql}")


# ---------------------------------------------------------------------------
# Randomized WINDOW-function specs: one partition/order spec, 1-2 window
# functions drawn per seed, built identically for both engines. The
# order key ends in the unique table key so every function is
# deterministic (ties impossible).
# ---------------------------------------------------------------------------
from pyspark.sql import Window  # noqa: E402

WIN_FUNCS = [
    (
        "rn",
        lambda c, w, wf: F.row_number().over(w),
        lambda c: "ROW_NUMBER() OVER w",
    ),
    (
        "rnk",
        lambda c, w, wf: F.rank().over(w),
        lambda c: "RANK() OVER w",
    ),
    (
        "lagv",
        lambda c, w, wf: F.round(F.coalesce(F.lag(_d(c)).over(w), F.lit(0.0)), 2),
        lambda c: f"ROUND(COALESCE(LAG(CAST({c} AS DOUBLE)) OVER w, 0.0), 2)",
    ),
    (
        "leadv",
        lambda c, w, wf: F.round(F.coalesce(F.lead(_d(c)).over(w), F.lit(0.0)), 2),
        lambda c: f"ROUND(COALESCE(LEAD(CAST({c} AS DOUBLE)) OVER w, 0.0), 2)",
    ),
    (
        "runsum",
        lambda c, w, wf: F.round(F.sum(_d(c)).over(wf), 2),
        lambda c: f"ROUND(SUM(CAST({c} AS DOUBLE)) OVER wf, 2)",
    ),
]


# per-table ordering suffix. The synthetic fixtures enforce no PK —
# lineitem even contains fully duplicated (orderkey, linenumber) rows —
# so the window ordering additionally ends in the MEASURED column:
# any remaining tie then implies an equal measure, making every window
# function's output multiset engine-independent.
UNIQUE_KEYS = {
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
}


def build_window(seed: int, spark, duck):
    rng = random.Random(20_000 + seed)
    tname = rng.choice(sorted(TABLES))
    nums, cats, _ = TABLES[tname]
    ukeys = UNIQUE_KEYS[tname]
    pcol = rng.choice(cats)
    ocol = rng.choice(nums)
    funcs = rng.sample(WIN_FUNCS, k=rng.randint(1, 2))
    mcol = rng.choice(nums)

    df = load_table(spark, SF_DIR, tname)
    order_cols = [ocol, *ukeys, mcol]
    w = Window.partitionBy(pcol).orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.select(
        *ukeys,
        pcol,
        *[fn(mcol, w, wf).alias(f"w_{name}") for name, fn, _ in funcs],
    ).orderBy(*ukeys)
    sel = ", ".join(f"{sql(mcol)} AS w_{name}" for name, _, sql in funcs)
    keys = ", ".join(ukeys)
    order = ", ".join(order_cols)
    sql = (
        f"SELECT {keys}, {pcol}, {sel} FROM {tname} "
        f"WINDOW w AS (PARTITION BY {pcol} ORDER BY {order}), "
        f"wf AS (PARTITION BY {pcol} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"ORDER BY {keys}"
    )
    return out, sql


@pytest.mark.parametrize("seed", range(12))
def test_random_window_query(spark, duck, seed):
    df, sql = build_window(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"wseed{seed}: {sql}")


# ---------------------------------------------------------------------------
# Randomized SEMI/ANTI + HAVING specs: EXISTS / NOT EXISTS subqueries
# (Spark: left_semi / left_anti joins) with a grouped count and a
# HAVING threshold, built identically for both engines.
# ---------------------------------------------------------------------------
def build_exists(seed: int, spark, duck):
    rng = random.Random(30_000 + seed)
    lname, rname, lkey, rkey = rng.choice(JOINS)
    ldf = load_table(spark, SF_DIR, lname)
    rdf = load_table(spark, SF_DIR, rname)
    anti = rng.random() < 0.5
    gcol = rng.choice(JOIN_GROUPS[lname])
    thresh = rng.randint(0, 5)

    how = "left_anti" if anti else "left_semi"
    out = (
        ldf.join(rdf, F.col(lkey) == F.col(rkey), how)
        .groupBy(gcol)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > thresh)
        .orderBy(gcol)
    )
    ex = "NOT EXISTS" if anti else "EXISTS"
    sql = (
        f"SELECT {gcol}, COUNT(*) AS cnt FROM {lname} "
        f"WHERE {ex} (SELECT 1 FROM {rname} WHERE {rname}.{rkey} = {lname}.{lkey}) "
        f"GROUP BY {gcol} HAVING COUNT(*) > {thresh} ORDER BY {gcol}"
    )
    return out, sql


@pytest.mark.parametrize("seed", range(10))
def test_random_exists_query(spark, duck, seed):
    df, sql = build_exists(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"eseed{seed}: {sql}")


# ---------------------------------------------------------------------------
# Randomized SET-OPERATION specs: UNION / INTERSECT / EXCEPT (distinct
# semantics on both engines) between two filtered key-projections of
# one table, reduced to a stable (cnt, min, max) fingerprint.
# ---------------------------------------------------------------------------
def build_setop(seed: int, spark, duck):
    rng = random.Random(40_000 + seed)
    tname = rng.choice(sorted(TABLES))
    nums, cats, key = TABLES[tname]
    ncol = rng.choice(nums)
    ccol = rng.choice(cats)
    df = load_table(spark, SF_DIR, tname)
    cutoff = round(
        duck.execute(
            f"SELECT quantile_cont({ncol}, {rng.choice([0.25, 0.5, 0.75])}) FROM {tname}"
        ).fetchone()[0],
        2,
    )
    cval = duck.execute(
        f"SELECT {ccol} FROM {tname} GROUP BY 1 ORDER BY 1 LIMIT 1 OFFSET {rng.randint(0, 1)}"
    ).fetchone()[0]
    op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])

    a = df.filter(F.col(ncol) > cutoff).select(key)
    b = df.filter(F.col(ccol) == cval).select(key)
    if op == "UNION":
        s = a.union(b).distinct()
    elif op == "INTERSECT":
        s = a.intersect(b)
    else:
        s = a.subtract(b)
    out = s.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(key).alias("k_min"),
        F.max(key).alias("k_max"),
    )
    sql = (
        f"SELECT COUNT(*) AS cnt, MIN({key}) AS k_min, MAX({key}) AS k_max FROM ("
        f"SELECT {key} FROM {tname} WHERE {ncol} > {cutoff} "
        f"{op} "
        f"SELECT {key} FROM {tname} WHERE {ccol} = '{cval}')"
    )
    return out, sql


@pytest.mark.parametrize("seed", range(8))
def test_random_setop_query(spark, duck, seed):
    df, sql = build_setop(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"sseed{seed}: {sql}")


# ---------------------------------------------------------------------------
# Randomized SET-OPERATION specs: two filtered projections of one
# table combined with UNION / UNION ALL / INTERSECT / EXCEPT, then
# counted — bag vs set semantics differ per operator, which is
# exactly what this generator pins.
# ---------------------------------------------------------------------------
SETOPS = [
    (
        "union_all",
        lambda a, b: a.unionAll(b),
        "UNION ALL",
    ),
    (
        "union",
        lambda a, b: a.unionAll(b).distinct(),
        "UNION",
    ),
    (
        "intersect",
        lambda a, b: a.intersect(b),
        "INTERSECT",
    ),
    (
        # subtract == SQL set-EXCEPT; exceptAll().distinct() would
        # KEEP a value that appears in both sides with higher left
        # multiplicity — the exact semantic slip this suite exists
        # to catch
        "except",
        lambda a, b: a.subtract(b),
        "EXCEPT",
    ),
]


def build_setop(seed: int, spark, duck):
    rng = random.Random(20_000 + seed)
    tname = rng.choice(sorted(TABLES))
    nums, cats, key = TABLES[tname]
    ncol = rng.choice(nums)
    ccol = rng.choice(cats)
    q1, q2 = rng.choice([(0.25, 0.5), (0.5, 0.75), (0.25, 0.75)])
    c1 = round(duck.execute(
        f"SELECT quantile_cont({ncol}, {q1}) FROM {tname}").fetchone()[0], 3)
    c2 = round(duck.execute(
        f"SELECT quantile_cont({ncol}, {q2}) FROM {tname}").fetchone()[0], 3)
    name, fn, sqlop = rng.choice(SETOPS)

    base = load_table(spark, SF_DIR, tname).select(ccol)
    a = base.filter(F.col(ncol) > c1) if False else load_table(
        spark, SF_DIR, tname).filter(F.col(ncol) > c1).select(ccol)
    b = load_table(spark, SF_DIR, tname).filter(
        F.col(ncol) <= c2).select(ccol)
    combined = fn(a, b)
    out = (
        combined.groupBy(ccol)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(ccol)
    )
    sql = (
        f"SELECT {ccol}, COUNT(*) AS cnt FROM ("
        f"SELECT {ccol} FROM {tname} WHERE {ncol} > {c1} "
        f"{sqlop} "
        f"SELECT {ccol} FROM {tname} WHERE {ncol} <= {c2}"
        f") GROUP BY {ccol} ORDER BY {ccol}"
    )
    return out, sql


@pytest.mark.parametrize("seed", range(12))
def test_random_setop_query(spark, duck, seed):
    df, sql = build_setop(seed, spark, duck)
    assert_matches_oracle(df, duck, sql, f"sseed{seed}: {sql}")
