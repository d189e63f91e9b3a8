"""Warehouse-modeling & mining operators: frequent-itemset pairs,
data-quality constraint audits, SCD Type-2 history construction, and
multi-touch attribution.

The reference stops at flat keyed aggregates over the order stream
(/root/reference/doc/temp.md:377-411); these are the standard next
steps a warehouse team runs on the same star schema — association
mining over baskets, Deequ-style integrity checks before a table is
published, dimension-history builds from a change log, and marketing
attribution over the event stream. All are declarative DataFrame
plans: Catalyst keeps pushdown/pruning and every shuffle is on a
bounded key.

Scale posture (100 TB):
* `basket_part_pairs` builds per-order item sets with one fact-scale
  shuffle, then expands pairs in-JVM (blowup per order bounded by
  basket size squared; TPC-H baskets are <= 7 lines, so <= 21
  pairs/order). The support/order-count branches are separate
  aggregates, so Catalyst re-scans with key-only projections (the
  sets exchange is reused where shapes coincide); at 100 TB persist
  the item-set frame once so all three branches share one scan. The
  per-part support table broadcasts and the scalar order count rides
  a 1-row broadcast crossJoin, never a driver collect.
* `referential_integrity_audit` runs each constraint as ONE pass over
  its child table: a left join against the parent key set with a
  conditional count gives (checked, violated) in a single agg, so the
  audit costs k joins for k FK constraints, each on the FK key. At
  100 TB the parent key sides (orders/customer/part/supplier keys) are
  either broadcast by AQE or plain shuffle joins — no quadratic step.
* `scd2_priority_history` windows per customer, ordered by
  (orderdate, orderkey); per-customer state is the customer's own
  order count (TPC-H: ~10) — a bounded-partition window, no global
  sort.
* `attribution_linear_multitouch` is an equi-join on user_id with the
  30-minute range as residual predicate (same shape as
  `signup_purchase_within_5m` — no theta-join blowup), followed by a
  per-purchase count and a per-channel re-aggregation, all keyed
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Shared IVM / CDC cores. These are the production plans used by
# `incremental_agg_merge` and `cdc_apply_changelog` below, factored
# out so the property suite (tests/test_property_round4_algebra.py)
# drives the SAME code on random edge-shaped states (keys only in
# old/new, empty sides) that the fixed TPC-H fixture never produces.
# --------------------------------------------------------------------------
def merge_partial_aggs(
    view: DataFrame,
    delta: DataFrame,
    key: str,
    add_cols: tuple[str, ...],
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Monoid-merge two keyed partial aggregates (one full-outer join).

    COUNT/SUM columns merge by +, MIN by least, MAX by greatest; a
    side missing the key contributes identity (0 / the other side).
    Output columns: key, *add_cols, *min_cols, *max_cols.
    """
    v = view.select([F.col(c).alias(f"v_{c}") for c in view.columns])
    d = delta.select([F.col(c).alias(f"d_{c}") for c in delta.columns])
    sel = [F.coalesce(f"v_{key}", f"d_{key}").alias(key)]
    for c in add_cols:
        sel.append(
            (
                F.coalesce(f"v_{c}", F.lit(0)) + F.coalesce(f"d_{c}", F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        sel.append(
            F.least(
                F.coalesce(f"v_{c}", f"d_{c}"), F.coalesce(f"d_{c}", f"v_{c}")
            ).alias(c)
        )
    for c in max_cols:
        sel.append(
            F.greatest(
                F.coalesce(f"v_{c}", f"d_{c}"), F.coalesce(f"d_{c}", f"v_{c}")
            ).alias(c)
        )
    return v.join(
        d, F.col(f"v_{key}") == F.col(f"d_{key}"), "full_outer"
    ).select(*sel)


def diff_snapshots(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Changelog (key, change_type, new_<col>...) between keyed snapshots.

    insert = key only in new, delete = key only in old, update = key
    in both with any value column differing; unchanged keys emit no
    row. One full-outer join on the key.
    """
    value_cols = [c for c in old.columns if c != key]
    # side-presence MARKERS (not value nullness) decide insert/delete,
    # and drift uses null-safe inequality — so NULL-bearing snapshots
    # classify correctly (a key only in `old` whose first value column
    # is NULL is a delete, not an insert; a NULL<->non-NULL value
    # transition is an update, not silently dropped)
    a = old.select(
        F.col(key).alias("k"),
        F.lit(1).alias("in_old"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
    )
    b = new.select(
        F.col(key).alias("k"),
        F.lit(1).alias("in_new"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
    )
    drift = None
    for c in value_cols:
        neq = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        drift = neq if drift is None else (drift | neq)
    return (
        a.join(b, "k", "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("in_old").isNull(), F.lit("insert"))
            .when(F.col("in_new").isNull(), F.lit("delete"))
            .when(drift, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select("k", "change_type", *[f"new_{c}" for c in value_cols])
    )


def apply_changelog(old: DataFrame, changelog: DataFrame, key: str) -> DataFrame:
    """Apply a `diff_snapshots` changelog to the old snapshot.

    Drops every changed key from old (left-anti on the changelog),
    unions the insert/update images. apply(old, diff(old, new)) == new
    is the round-trip law the property suite checks on random states.
    """
    value_cols = [c for c in old.columns if c != key]
    keep = old.join(
        changelog.select("k"), old[key] == changelog["k"], "left_anti"
    )
    images = changelog.filter(F.col("change_type") != "delete").select(
        F.col("k").alias(key),
        *[F.col(f"new_{c}").alias(c) for c in value_cols],
    )
    return keep.unionByName(images)


# --------------------------------------------------------------------------
# Market-basket pair mining: parts that co-occur in the same order,
# with support count and lift. The A-priori first pass as one
# declarative plan (pairs above min-support; lift against independent
# part frequencies).
# --------------------------------------------------------------------------
_BP_MIN_SUPPORT = 2


@operator(
    "basket_part_pairs",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    pc AS (SELECT l_partkey, COUNT(*) AS pcnt FROM items GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items)
    SELECT p1, p2, support,
           ROUND(support * n.n_orders / (c1.pcnt * c2.pcnt), 6) AS lift
    FROM pairs
    JOIN pc c1 ON c1.l_partkey = p1
    JOIN pc c2 ON c2.l_partkey = p2
    CROSS JOIN n
    WHERE support >= {_BP_MIN_SUPPORT}
    ORDER BY support DESC, p1, p2
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pair generation is an in-JVM array expansion from per-order item
    # sets, not a self-join: one fact-scale shuffle (groupBy orderkey;
    # collect_set state is bounded by the basket size) feeds the pair
    # explode. The self-join form shuffles the item set twice just to
    # build pairs; measured warm-equal at sf0.1 (1.6s both) with less
    # pair-stage IO. The support/total branches are distinct
    # aggregates (partial ReusedExchange only) — a production pipeline
    # persists `sets` once so all branches share a single scan.
    sets = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    arr = F.array_sort("parts")
    pairs_col = F.filter(
        F.flatten(
            F.transform(
                arr,
                lambda x: F.transform(
                    arr, lambda y: F.struct(x.alias("p1"), y.alias("p2"))
                ),
            )
        ),
        lambda s: s["p1"] < s["p2"],
    )
    pairs = (
        sets.select(F.explode(pairs_col).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BP_MIN_SUPPORT)
    )
    pc = sets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("pcnt"))
    n = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        pairs.join(
            F.broadcast(pc.select(F.col("l_partkey").alias("p1"),
                                  F.col("pcnt").alias("pcnt1"))), ["p1"]
        )
        .join(
            F.broadcast(pc.select(F.col("l_partkey").alias("p2"),
                                  F.col("pcnt").alias("pcnt2"))), ["p2"]
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "support",
            F.round(
                F.col("support") * F.col("n_orders")
                / (F.col("pcnt1") * F.col("pcnt2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "p1", "p2")
    )


# --------------------------------------------------------------------------
# Data-quality constraint audit (Deequ-style): every published-table
# invariant checked in one pass each, emitted as a uniform report
# (constraint_name, violated, checked, ok). FK checks are a left join
# on the parent key set + conditional count — checked and violated in
# ONE aggregation per constraint.
# --------------------------------------------------------------------------
_RI_REPORT_COLS = ("constraint_name", "violated", "checked", "ok")


def _fk_check(child: DataFrame, child_key: str, parent: DataFrame,
              parent_key: str, name: str) -> DataFrame:
    pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return (
        child.select(F.col(child_key).alias("__ck"))
        .join(pk, F.col("__ck") == F.col("__pk"), "left")
        .agg(
            F.lit(name).alias("constraint_name"),
            F.count(F.when(F.col("__pk").isNull(), 1)).alias("violated"),
            F.count(F.lit(1)).alias("checked"),
        )
        .withColumn("ok", F.col("violated") == 0)
    )


def _unique_check(df: DataFrame, key: str, name: str) -> DataFrame:
    return (
        df.agg(
            F.lit(name).alias("constraint_name"),
            (F.count(key) - F.count_distinct(key)).alias("violated"),
            F.count(F.lit(1)).alias("checked"),
        ).withColumn("ok", F.col("violated") == 0)
    )


def _predicate_check(df: DataFrame, bad, name: str) -> DataFrame:
    return (
        df.agg(
            F.lit(name).alias("constraint_name"),
            F.count(F.when(bad, 1)).alias("violated"),
            F.count(F.lit(1)).alias("checked"),
        ).withColumn("ok", F.col("violated") == 0)
    )


@operator(
    "referential_integrity_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'ck_documents_text_nonempty' AS constraint_name,
             COUNT(CASE WHEN text IS NULL OR text = '' THEN 1 END) AS violated,
             COUNT(*) AS checked,
             COUNT(CASE WHEN text IS NULL OR text = '' THEN 1 END) = 0 AS ok
      FROM documents
      UNION ALL
      SELECT 'ck_events_ts_nonnull',
             COUNT(CASE WHEN ts IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN ts IS NULL THEN 1 END) = 0
      FROM events
      UNION ALL
      SELECT 'ck_orders_price_positive',
             COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END), COUNT(*),
             COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0
      FROM orders
      UNION ALL
      SELECT 'fk_customer_nation',
             COUNT(CASE WHEN n.n_nationkey IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN n.n_nationkey IS NULL THEN 1 END) = 0
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'fk_lineitem_orders',
             COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) = 0
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'fk_lineitem_part',
             COUNT(CASE WHEN p.p_partkey IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN p.p_partkey IS NULL THEN 1 END) = 0
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'fk_lineitem_supplier',
             COUNT(CASE WHEN s.s_suppkey IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN s.s_suppkey IS NULL THEN 1 END) = 0
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'fk_orders_customer',
             COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END), COUNT(*),
             COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) = 0
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'pk_events_unique',
             COUNT(event_id) - COUNT(DISTINCT event_id), COUNT(*),
             COUNT(event_id) = COUNT(DISTINCT event_id)
      FROM events
      UNION ALL
      SELECT 'pk_orders_unique',
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey), COUNT(*),
             COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey)
      FROM orders
    ) ORDER BY constraint_name
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    events = _t(spark, sf_dir, "events")
    documents = _t(spark, sf_dir, "documents")
    checks = [
        _predicate_check(
            documents,
            F.col("text").isNull() | (F.col("text") == ""),
            "ck_documents_text_nonempty",
        ),
        _predicate_check(events, F.col("ts").isNull(), "ck_events_ts_nonnull"),
        _predicate_check(
            orders, F.col("o_totalprice") <= 0, "ck_orders_price_positive"
        ),
        _fk_check(customer, "c_nationkey", nation, "n_nationkey",
                  "fk_customer_nation"),
        _fk_check(li, "l_orderkey", orders, "o_orderkey",
                  "fk_lineitem_orders"),
        _fk_check(li, "l_partkey", part, "p_partkey", "fk_lineitem_part"),
        _fk_check(li, "l_suppkey", supplier, "s_suppkey",
                  "fk_lineitem_supplier"),
        _fk_check(orders, "o_custkey", customer, "c_custkey",
                  "fk_orders_customer"),
        _unique_check(events, "event_id", "pk_events_unique"),
        _unique_check(orders, "o_orderkey", "pk_orders_unique"),
    ]
    report = checks[0]
    for c in checks[1:]:
        report = report.unionByName(c)
    return report.select(*_RI_REPORT_COLS).orderBy("constraint_name")


# --------------------------------------------------------------------------
# SCD Type-2 build from a change log: per customer, the history of
# their order-priority "state" as validity intervals. A change row is
# any order whose priority differs from the customer's previous order
# (lag); valid_to is the next change's start (lead), open for the
# current version. The standard dimension-history construction, fully
# windowed — no self-join.
# --------------------------------------------------------------------------
_SCD2_OPEN_END = "9999-12-31"


@operator(
    "scd2_priority_history",
    oracle=f"""
    WITH ordered AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_p
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate
      FROM ordered
      WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    )
    SELECT o_custkey AS custkey,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS version,
           o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           COALESCE(
             strftime(LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ), '%Y-%m-%d'),
             '{_SCD2_OPEN_END}') AS valid_to,
           LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL AS is_current
    FROM changes
    ORDER BY custkey, version
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_p", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("prev_p").isNull()
            | (F.col("prev_p") != F.col("o_orderpriority"))
        )
        .drop("prev_p")
    )
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(wc)
    return (
        changes.select(
            F.col("o_custkey").alias("custkey"),
            F.row_number().over(wc).cast("bigint").alias("version"),
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, "yyyy-MM-dd"), F.lit(_SCD2_OPEN_END)
            ).alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("custkey", "version")
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution: each purchase's value is split
# equally across the user's view/click touches in the preceding 30
# minutes; credited revenue rolls up per touch channel. First/last
# touch are the argmax/argmin specializations (cf.
# `stream_signup_attribution` for the streaming first-touch form).
# --------------------------------------------------------------------------
_ATTR_WINDOW = "30 minutes"


@operator(
    "attribution_linear_multitouch",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    touched AS (
      SELECT p.purchase_id, p.value, t.touch_id, t.channel
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 30 MINUTE
    ),
    weighted AS (
      SELECT purchase_id, touch_id, channel,
             value / COUNT(*) OVER (PARTITION BY purchase_id) AS credit
      FROM touched
    )
    SELECT channel,
           COUNT(*) AS touches,
           COUNT(DISTINCT purchase_id) AS purchases,
           ROUND(SUM(credit), 2) AS credited_revenue
    FROM weighted
    GROUP BY channel
    ORDER BY channel
    """,
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    touched = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW}")),
    )
    wp = Window.partitionBy("purchase_id")
    weighted = touched.withColumn(
        "credit", F.col("value") / F.count(F.lit(1)).over(wp)
    )
    return (
        weighted.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.count_distinct("purchase_id").alias("purchases"),
            F.round(F.sum("credit"), 2).alias("credited_revenue"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC derivation): compare the per-customer order state
# at two snapshot cutoffs and emit the change rows (insert / update /
# delete) a downstream incremental consumer would apply. The classic
# full-outer-join diff; 'delete' cannot occur on this append-only
# source but the branch is part of the contract (and exercised as
# zero). Both snapshot aggregates shuffle on the SAME key, and the
# full outer join reuses that partitioning — one fact-scale shuffle
# per snapshot, one join, no window.
# --------------------------------------------------------------------------
_SNAP_T1 = "1996-01-01"


@operator(
    "snapshot_table_diff",
    oracle=f"""
    WITH a AS (
      SELECT o_custkey, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_T1}'
      GROUP BY 1
    ),
    b AS (
      SELECT o_custkey, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           CASE WHEN a.o_custkey IS NULL THEN 'insert'
                WHEN b.o_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           a.n AS old_n, b.n AS new_n,
           a.cents AS old_cents, b.cents AS new_cents
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    WHERE a.o_custkey IS NULL OR b.o_custkey IS NULL
       OR a.n <> b.n OR a.cents <> b.cents
    ORDER BY custkey
    """,
)
def snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )

    def snap(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias(key)).agg(
            F.count(F.lit(1)).alias(f"{key}_n"),
            F.sum("c").cast("bigint").alias(f"{key}_cents"),
        )

    a = snap(o.filter(F.col("o_orderdate") < F.lit(_SNAP_T1).cast("timestamp")), "ak")
    b = snap(o, "bk")
    changed = (
        F.col("ak").isNull()
        | F.col("bk").isNull()
        | (F.col("ak_n") != F.col("bk_n"))
        | (F.col("ak_cents") != F.col("bk_cents"))
    )
    return (
        a.join(b, F.col("ak") == F.col("bk"), "full_outer")
        .filter(changed)
        .select(
            F.coalesce("ak", "bk").alias("custkey"),
            F.when(F.col("ak").isNull(), "insert")
            .when(F.col("bk").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            F.col("ak_n").alias("old_n"),
            F.col("bk_n").alias("new_n"),
            F.col("ak_cents").alias("old_cents"),
            F.col("bk_cents").alias("new_cents"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Order-insensitive table checksums: per table, row count + the sum of
# a 60-bit md5-prefix row hash (mod 2^60) over a canonical row
# rendering — the replication/migration validation primitive ("did
# every row arrive, bit-exact, regardless of order/partitioning").
# The hash domain is the same md5-prefix family the dedup/shard ops
# use (engine-portable, unlike xxhash64/murmur3); the sum runs in
# DECIMAL(38,0) so it can never overflow before the mod. One
# map-side-combinable agg per table, no shuffle beyond the 1-row
# reduction.
# --------------------------------------------------------------------------
_CKSUM_MOD = 1 << 60


def _row_hash_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


@operator(
    "table_checksum",
    oracle=f"""
    SELECT * FROM (
      SELECT 'customer' AS table_name, COUNT(*) AS row_count,
             CAST(SUM({_row_hash_sql(
                 "concat_ws('|', c_custkey, c_name, c_nationkey, "
                 "CAST(ROUND(c_acctbal * 100) AS BIGINT), c_mktsegment)"
             )}::HUGEINT) % {_CKSUM_MOD} AS BIGINT) AS checksum
      FROM customer
      UNION ALL
      SELECT 'nation', COUNT(*),
             CAST(SUM({_row_hash_sql(
                 "concat_ws('|', n_nationkey, n_name, n_regionkey)"
             )}::HUGEINT) % {_CKSUM_MOD} AS BIGINT)
      FROM nation
      UNION ALL
      SELECT 'orders', COUNT(*),
             CAST(SUM({_row_hash_sql(
                 "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, "
                 "CAST(ROUND(o_totalprice * 100) AS BIGINT), "
                 "strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)"
             )}::HUGEINT) % {_CKSUM_MOD} AS BIGINT)
      FROM orders
    ) ORDER BY table_name
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    def hash_sum(df: DataFrame, row_str, name: str) -> DataFrame:
        h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("row_count"),
            (F.sum(h.cast("decimal(38,0)")) % F.lit(_CKSUM_MOD))
            .cast("bigint")
            .alias("checksum"),
        )

    customer = hash_sum(
        _t(spark, sf_dir, "customer"),
        F.concat_ws(
            "|",
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("bigint"),
            "c_mktsegment",
        ),
        "customer",
    )
    nation = hash_sum(
        _t(spark, sf_dir, "nation"),
        F.concat_ws("|", "n_nationkey", "n_name", "n_regionkey"),
        "nation",
    )
    orders = hash_sum(
        _t(spark, sf_dir, "orders"),
        F.concat_ws(
            "|",
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("bigint"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            "o_orderpriority",
        ),
        "orders",
    )
    return (
        customer.unionByName(nation)
        .unionByName(orders)
        .orderBy("table_name")
    )


# --------------------------------------------------------------------------
# Z-order clustering key (lakehouse data-layout primitive): interleave
# the bits of two dimension bytes (customer bucket, day bucket) into a
# 16-bit Morton code, then report per-zbucket locality. The guarantee
# that makes z-ordering work for multi-dimensional data skipping:
# every 256-wide z-range (zbucket = z >> 8) touches at most 16
# distinct values of EACH dimension byte — so files written in z order
# carry tight min/max on BOTH columns and row-group skipping prunes
# 2-D predicates. Pure integer bit math at the scan (codegen), one
# agg on the bounded zbucket domain; at 100 TB the same z expression
# feeds a repartitionByRange + sortWithinPartitions write.
# --------------------------------------------------------------------------
_Z_EPOCH = "1992-01-01"


def _z_interleave_sql(a: str, b: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@operator(
    "zorder_locality_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT (o_custkey % 256) AS a,
             (datediff('day', DATE '{_Z_EPOCH}', o_orderdate) % 256) AS b
      FROM orders
    ),
    z AS (SELECT a, b, {_z_interleave_sql('a', 'b')} AS zval FROM keyed)
    SELECT CAST(zval // 256 AS BIGINT) AS zbucket,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT a) AS n_cust_bytes,
           COUNT(DISTINCT b) AS n_day_bytes
    FROM z
    GROUP BY 1 ORDER BY zbucket
    """,
)
def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).alias("a"),
        (
            F.datediff("o_orderdate", F.lit(_Z_EPOCH).cast("date")) % 256
        ).alias("b"),
    )
    zval = None
    for i in range(8):
        ta = F.shiftright("a", i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        tb = F.shiftright("b", i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
        zval = ta + tb if zval is None else zval + ta + tb
    return (
        o.withColumn("zval", zval)
        .groupBy((F.col("zval") / 256).cast("bigint").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("a").alias("n_cust_bytes"),
            F.count_distinct("b").alias("n_day_bytes"),
        )
        .orderBy("zbucket")
    )


# --------------------------------------------------------------------------
# Purchase cadence: per-customer inter-order gaps (lag over bounded
# per-customer partitions), rolled up per market segment as median /
# p90 cadence — the replenishment-cycle metric behind reorder
# reminders and churn windows. Exact integer day gaps; the percentile
# runs per segment over |customers|-scale rows.
# --------------------------------------------------------------------------
@operator(
    "segment_order_cadence",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap_days
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey, CAST(median(gap_days) AS DOUBLE) AS med_gap
      FROM seq WHERE gap_days IS NOT NULL
      GROUP BY o_custkey
    )
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS customers,
           ROUND(median(p.med_gap), 1) AS median_cadence_days,
           ROUND(quantile_cont(p.med_gap, 0.9), 1) AS p90_cadence_days
    FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def segment_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn(
        "gap_days", F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
    ).filter(F.col("gap_days").isNotNull())
    per_cust = seq.groupBy("o_custkey").agg(
        F.median("gap_days").alias("med_gap")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.median("med_gap"), 1).alias("median_cadence_days"),
            F.round(F.percentile("med_gap", 0.9), 1).alias(
                "p90_cadence_days"
            ),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Co-occurrence recommendations: for each part, its top-3 partners by
# lift — the serving-table contract on top of `basket_part_pairs`
# (symmetrized, ranked per anchor part with a deterministic
# tie-break). This is the "customers also bought" primitive; at scale
# the pair table is the expensive input (already bounded by basket
# width) and this ranking is a per-key top-k over it.
# --------------------------------------------------------------------------
_RECO_K = 3


def _register_part_recommendations() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH pairs AS ({ORACLES["basket_part_pairs"]}),
    sym AS (
      SELECT p1 AS anchor, p2 AS partner, support, lift FROM pairs
      UNION ALL
      SELECT p2, p1, support, lift FROM pairs
    ),
    ranked AS (
      SELECT anchor, partner, support, lift,
             ROW_NUMBER() OVER (PARTITION BY anchor
                                ORDER BY lift DESC, support DESC, partner)
               AS rnk
      FROM sym
    )
    SELECT anchor, rnk, partner, support, lift
    FROM ranked WHERE rnk <= {_RECO_K}
    ORDER BY anchor, rnk
    """

    @operator("part_recommendations", oracle=oracle)
    def part_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
        pairs = REGISTRY["basket_part_pairs"](spark, sf_dir)
        sym = pairs.select(
            F.col("p1").alias("anchor"),
            F.col("p2").alias("partner"),
            "support",
            "lift",
        ).unionByName(
            pairs.select(
                F.col("p2").alias("anchor"),
                F.col("p1").alias("partner"),
                "support",
                "lift",
            )
        )
        w = Window.partitionBy("anchor").orderBy(
            F.col("lift").desc(), F.col("support").desc(), "partner"
        )
        return (
            sym.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _RECO_K)
            .select("anchor", "rnk", "partner", "support", "lift")
            .orderBy("anchor", "rnk")
        )


_register_part_recommendations()


# --------------------------------------------------------------------------
# CDC APPLY: the inverse of `snapshot_table_diff`. A changelog of
# insert/update/delete rows applied to the OLD snapshot must
# reproduce the NEW snapshot exactly — apply(old, diff(old, new)) ==
# new is the round-trip law every CDC consumer (lakehouse MERGE,
# keyed upsert sink) depends on. Old = per-customer order rollup
# before _CDC_T2; new = the rollup over [_CDC_T1, end) — overlapping
# windows so all three change types occur (keys only in old →
# delete, only in new → insert, in both with drift → update).
#
# Scale posture: diff is one full-outer join on the snapshot key; the
# apply is a left-anti (drop deleted/updated keys) + union of the
# changelog's insert/update images — two keyed shuffles over
# dimension-sized rollups, no fact-scale rescan. On a lakehouse table
# the same plan runs inside MERGE INTO; this operator IS that plan
# with the transaction log stripped away.
# --------------------------------------------------------------------------
_CDC_T1, _CDC_T2 = "1995-06-01", "1997-01-01"


@operator(
    "cdc_apply_changelog",
    # the oracle is the NEW snapshot itself: any defect in diff OR
    # apply breaks the round-trip equality
    oracle=f"""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_CDC_T1} 00:00:00'
    GROUP BY 1 ORDER BY custkey
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("c").cast("bigint").alias("cents"),
        )

    old = snap(o.filter(F.col("o_orderdate") < F.lit(_CDC_T2).cast("timestamp")))
    new = snap(o.filter(F.col("o_orderdate") >= F.lit(_CDC_T1).cast("timestamp")))

    # diff (full outer on the key, change_type per row) then apply
    # (left-anti drop of changed keys + insert/update images) via the
    # shared cores the property suite exercises on random states
    changelog = diff_snapshots(old, new, "custkey")
    return apply_changelog(old, changelog, "custkey").orderBy("custkey")


# --------------------------------------------------------------------------
# One damped PageRank iteration over the basket co-occurrence graph
# (edge weight = number of orders containing both parts). The graph
# is built with the same bounded set-expansion as `basket_part_pairs`
# (per-order item sets, in-JVM pair explode, blowup <= basket size
# squared — never a fact-scale self-join). From uniform init
# pr0 = 1/N, one step of the weighted walk:
#   pr1(p) = (1-d)/N + d * SUM_q w(q,p)/out(q) * pr0(q).
# Full PageRank is this step iterated with parquet ping-pong between
# iterations (the `resolve_components` pattern at dedup.py); one step
# is the differentially checkable unit — the oracle replays the
# identical arithmetic in SQL. Top 100 parts by rank.
# --------------------------------------------------------------------------
_PR_DAMP = 0.85
_PR_TOPK = 100


@operator(
    "pagerank_step",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             COUNT(*) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
    outdeg AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY 1),
    contrib AS (
      SELECT e.dst,
             SUM(e.w / CAST(o.outw AS DOUBLE)
                 * (1.0 / (SELECT n FROM nodes))) AS inflow
      FROM edges e JOIN outdeg o ON o.src = e.src
      GROUP BY 1
    )
    SELECT dst AS part,
           ROUND((1 - {_PR_DAMP}) / (SELECT n FROM nodes)
                 + {_PR_DAMP} * inflow, 9) AS pr
    FROM contrib
    ORDER BY pr DESC, part
    LIMIT {_PR_TOPK}
    """,
)
def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = (
        li.distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    # ordered pair expansion inside the JVM (both directions): for
    # basket [p1..pk], every (pi, pj), i != j
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda p: F.transform(
                        F.filter("parts", lambda q: q != p),
                        lambda q: F.struct(
                            p.alias("src"), q.alias("dst")
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # edges feed two branches (node count, contribution); at 100 TB
    # persist the edge frame once so the branches share one build —
    # left unpersisted here because the operator returns a lazy frame
    # and a registry-held cache would outlive the call.
    # Outdegree is a WINDOW over src, not a separate aggregate+join:
    # measured 17% faster at sf0.1 (3.43s vs 4.13s best-of-3),
    # bit-identical output, one fewer aggregate branch over the edge
    # build.
    edges = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    n_nodes = edges.agg(
        F.count_distinct("src").alias("n")
    )  # symmetric graph: src domain == node domain
    contrib = (
        edges.withColumn(
            "outw", F.sum("w").over(Window.partitionBy("src"))
        )
        .crossJoin(F.broadcast(n_nodes))
        .groupBy("dst", "n")
        .agg(
            F.sum(
                F.col("w") / F.col("outw").cast("double") * (1.0 / F.col("n"))
            ).alias("inflow")
        )
    )
    return (
        contrib.select(
            F.col("dst").alias("part"),
            F.round(
                (1 - _PR_DAMP) / F.col("n") + _PR_DAMP * F.col("inflow"), 9
            ).alias("pr"),
        )
        .orderBy(F.col("pr").desc(), "part")
        .limit(_PR_TOPK)
    )


# --------------------------------------------------------------------------
# Incremental view maintenance: a materialized per-customer rollup
# maintained by MERGING a delta batch's partial aggregates into the
# stored state must equal the full recompute — the algebraic law
# (count/sum/min/max are mergeable monoids, avg derives from
# sum/count) that every lambda/kappa architecture and AQE partial-agg
# plan depends on. The fact is split at a cutoff; the "stored view"
# aggregates the old half, the delta aggregates the new half, and the
# merge is one full-outer join + monoid combination per column.
#
# Scale posture: the delta side is the only fact-scale scan per
# refresh; the merge joins two DIMENSION-sized aggregates on the view
# key. COUNT/SUM merge by +, MIN/MAX by least/greatest, AVG is
# re-derived — never averaged-of-averages. At 100 TB this is the
# nightly-refresh plan for every keyed rollup the warehouse serves.
# --------------------------------------------------------------------------
_IVM_CUT = "1997-06-01"


@operator(
    "incremental_agg_merge",
    # the oracle is the FULL recompute: the merge must be lossless
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                // COUNT(*) AS BIGINT) AS avg_cents
    FROM orders GROUP BY 1 ORDER BY custkey
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )

    def part(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("c").cast("bigint").alias("cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )

    cut = F.lit(_IVM_CUT).cast("timestamp")
    view = part(o.filter(F.col("o_orderdate") < cut))   # stored state
    delta = part(o.filter(F.col("o_orderdate") >= cut))  # refresh batch

    merged = merge_partial_aggs(
        view,
        delta,
        key="custkey",
        add_cols=("n_orders", "cents"),
        min_cols=("min_cents",),
        max_cols=("max_cents",),
    )
    return merged.select(
        "custkey",
        "n_orders",
        "cents",
        "min_cents",
        "max_cents",
        # integer division keeps the derived average ENGINE-EXACT —
        # a ROUND(cents/n, 2) here hit a genuine x.415 half-way case
        # where the two engines' double rounding disagreed by 1 cent
        F.expr("cents div n_orders").alias("avg_cents"),
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# Round-5 warehouse additions: SCD Type-1 merge, join-key skew audit,
# deterministic hash sampling, temporal sanity audit.
# --------------------------------------------------------------------------
@operator(
    "scd1_latest_merge",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey)           AS rf
      FROM orders
    )
    SELECT o_custkey AS custkey,
           MIN(CASE WHEN rl = 1 THEN o_orderpriority END) AS latest_priority,
           MIN(CASE WHEN rf = 1 THEN o_orderpriority END) AS first_priority,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(CASE WHEN MIN(CASE WHEN rl = 1 THEN o_orderpriority END)
                       <> MIN(CASE WHEN rf = 1 THEN o_orderpriority END)
                THEN 1 ELSE 0 END AS BIGINT)               AS changed
    FROM ranked GROUP BY 1 ORDER BY custkey
    """,
)
def scd1_latest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-1: overwrite-with-latest dimension maintenance (the
    counterpart of `scd2_priority_history` — no history, last write
    wins on (orderdate, orderkey) order). max_by/min_by over a
    tie-break struct: one partial-aggregable pass, no window
    shuffle+sort of the fact; the oracle states the ROW_NUMBER
    formulation."""
    o = _t(spark, sf_dir, "orders")
    key = F.struct("o_orderdate", "o_orderkey")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max_by("o_orderpriority", key).alias("latest_priority"),
            F.min_by("o_orderpriority", key).alias("first_priority"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
        )
        .withColumn(
            "changed",
            (F.col("latest_priority") != F.col("first_priority")).cast(
                "bigint"
            ),
        )
        .orderBy("custkey")
    )


@operator(
    "join_key_skew_stats",
    oracle="""
    WITH freqs AS (
      SELECT 'orders.o_custkey' AS key_col, o_custkey AS k, COUNT(*) AS f
      FROM orders GROUP BY 2
      UNION ALL
      SELECT 'lineitem.l_orderkey', l_orderkey, COUNT(*)
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'lineitem.l_partkey', l_partkey, COUNT(*)
      FROM lineitem GROUP BY 2
    )
    SELECT key_col,
           CAST(SUM(f) AS BIGINT)    AS n_rows,
           CAST(COUNT(*) AS BIGINT)  AS n_keys,
           CAST(MAX(f) AS BIGINT)    AS max_freq,
           ROUND(quantile_cont(f, 0.5), 6) AS p50_freq,
           ROUND(MAX(f) / (SUM(f) / CAST(COUNT(*) AS DOUBLE)), 6)
                                     AS skew_ratio
    FROM freqs GROUP BY 1 ORDER BY key_col
    """,
)
def join_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the pre-flight a planner (or an engineer
    choosing salting / AQE skew-join) runs before a big shuffle:
    per-key frequency profile of each join column, reduced to
    max/median frequency and the max-to-mean skew ratio. One keyed agg
    per column; the frequency tables are key-domain-sized."""
    frames = []
    for label, table, col in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ):
        frames.append(
            _t(spark, sf_dir, table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("f"))
            .select(F.lit(label).alias("key_col"), "f")
        )
    freqs = frames[0].unionByName(frames[1]).unionByName(frames[2])
    return (
        freqs.groupBy("key_col")
        .agg(
            F.sum("f").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("f").cast("bigint").alias("max_freq"),
            F.round(F.expr("percentile(f, 0.5)"), 6).alias("p50_freq"),
            F.round(
                F.max("f")
                / (F.sum("f") / F.count(F.lit(1)).cast("double")),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy("key_col")
    )


_BERN_PCT = 5  # percent of rows kept


@operator(
    "bernoulli_hash_sample",
    oracle=f"""
    WITH sampled AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      WHERE ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                     AS VARCHAR)), 1, 15))::BIGINT
            % 100 < {_BERN_PCT}
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)  AS n_sampled,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM sampled GROUP BY 1 ORDER BY l_returnflag
    """,
)
def bernoulli_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling by content hash (md5 of the
    row key, mod 100) — reproducible across runs, engines, and
    partitionings, unlike rand()-based sampling. The predicate pushes
    into the scan's filter stage; no shuffle until the keyed rollup.
    Same engine-portable md5 idiom as `shard_manifest`."""
    li = _t(spark, sf_dir, "lineitem")
    rowkey = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    u = F.conv(F.substring(F.md5(rowkey), 1, 15), 16, 10).cast("bigint") % 100
    return (
        li.filter(u < _BERN_PCT)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("l_returnflag")
    )


@operator(
    "temporal_sanity_audit",
    oracle="""
    WITH j AS (
      SELECT l.l_shipdate, o.o_orderdate,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT CASE WHEN lag_days < 0 THEN 'ship_before_order'
                WHEN lag_days > 120 THEN 'ship_over_120d'
                ELSE 'ok' END AS anomaly_class,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(lag_days) AS BIGINT) AS min_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days
    FROM j GROUP BY 1 ORDER BY anomaly_class
    """,
)
def temporal_sanity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal integrity audit: every lineitem's ship lag vs its
    order date, bucketed into sanity classes (negative lag = corrupt
    lineage, >120 days = stale fulfilment). The Deequ-style check a
    warehouse runs before publishing — one fact-scale equi-join, one
    bounded-key agg."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    cls = (
        F.when(lag < 0, F.lit("ship_before_order"))
        .when(lag > 120, F.lit("ship_over_120d"))
        .otherwise(F.lit("ok"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(cls.alias("anomaly_class"), lag.cast("bigint").alias("lag_days"))
        .groupBy("anomaly_class")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("lag_days").cast("bigint").alias("min_lag_days"),
            F.max("lag_days").cast("bigint").alias("max_lag_days"),
        )
        .orderBy("anomaly_class")
    )


@operator(
    "key_uniqueness_audit",
    oracle="""
    WITH checks AS (
      SELECT 'orders.o_orderkey' AS key_name, o_orderkey AS k,
             COUNT(*) AS f FROM orders GROUP BY 2
      UNION ALL
      SELECT 'customer.c_custkey', c_custkey, COUNT(*)
      FROM customer GROUP BY 2
      UNION ALL
      SELECT 'part.p_partkey', p_partkey, COUNT(*) FROM part GROUP BY 2
      UNION ALL
      SELECT 'lineitem.(okey,line)',
             l_orderkey * 1000 + l_linenumber, COUNT(*)
      FROM lineitem GROUP BY 2
    )
    SELECT key_name,
           CAST(SUM(f) AS BIGINT)                        AS n_rows,
           CAST(COUNT(*) AS BIGINT)                      AS n_keys,
           CAST(COUNT(*) FILTER (WHERE f > 1) AS BIGINT) AS n_dup_keys,
           (COUNT(*) FILTER (WHERE f > 1) = 0)           AS is_unique
    FROM checks GROUP BY 1 ORDER BY key_name
    """,
)
def key_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the star schema (the
    companion of `referential_integrity_audit`'s FK checks): one
    keyed count per declared key, reporting duplicate-key cardinality
    — a publish gate every warehouse runs. Each check is a single
    map-side-combinable aggregation on the key."""
    frames = []
    for label, table, keyexpr in (
        ("orders.o_orderkey", "orders", F.col("o_orderkey")),
        ("customer.c_custkey", "customer", F.col("c_custkey")),
        ("part.p_partkey", "part", F.col("p_partkey")),
        (
            "lineitem.(okey,line)",
            "lineitem",
            F.col("l_orderkey") * 1000 + F.col("l_linenumber"),
        ),
    ):
        frames.append(
            _t(spark, sf_dir, table)
            .groupBy(keyexpr.alias("k"))
            .agg(F.count(F.lit(1)).alias("f"))
            .select(F.lit(label).alias("key_name"), "f")
        )
    checks = frames[0]
    for fr in frames[1:]:
        checks = checks.unionByName(fr)
    dup = (F.col("f") > 1).cast("bigint")
    return (
        checks.groupBy("key_name")
        .agg(
            F.sum("f").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(dup).cast("bigint").alias("n_dup_keys"),
            (F.sum(dup) == 0).alias("is_unique"),
        )
        .orderBy("key_name")
    )


_IDM_LO, _IDM_HI = 10, 20  # overlapping ingest windows (day-of-month)


@operator(
    "incremental_dedup_merge",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS BIGINT)                 AS n_rows
    FROM events
    WHERE dayofmonth(ts) <= {_IDM_HI} OR dayofmonth(ts) >= {_IDM_LO}
    GROUP BY 1 ORDER BY event_type
    """,
)
def incremental_dedup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent ingest: a deduplicated store (days <= {hi}) merged
    with an OVERLAPPING re-delivery batch (days >= {lo}) via
    left-anti on event_id + union — the exactly-once landing pattern
    for at-least-once pipelines. The oracle is the distinct union:
    equal n_rows and n_distinct per type proves the merge introduced
    no duplicate despite the overlapping windows."""
    from bigdataentrytask_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    store = ev.filter(F.dayofmonth("ts") <= _IDM_HI)
    batch = ev.filter(F.dayofmonth("ts") >= _IDM_LO)
    fresh = batch.join(
        store.select("event_id"), "event_id", "left_anti"
    )
    merged = store.unionByName(fresh)
    return (
        merged.groupBy("event_type")
        .agg(
            F.count_distinct("event_id").alias("n_distinct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_type")
    )


def _register_pit_join() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH hist AS ({ORACLES["scd2_priority_history"]})
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE h.priority = o.o_orderpriority)
                AS BIGINT)          AS n_pit_match,
           CAST(MAX(h.version) AS BIGINT) AS max_version_touched
    FROM orders o
    JOIN hist h
      ON h.custkey = o.o_custkey
     AND strftime(o.o_orderdate, '%Y-%m-%d') >= h.valid_from
     AND strftime(o.o_orderdate, '%Y-%m-%d') < h.valid_to
    GROUP BY 1 ORDER BY priority
    """

    @operator("fact_pit_join", oracle=oracle)
    def fact_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Point-in-time (PIT) join: each order resolved against the
        SCD2 dimension version valid AT its order date — the
        correctness pattern every as-of warehouse query needs (a
        naive join to the current version leaks the future). Because
        the history derives from the orders themselves, PIT
        resolution recovers each order's own priority — up to the
        day-grain caveat (a customer flipping priority twice in one
        day collapses to the last version, so n_pit_match tracks but
        does not equal n_orders; the invariant test pins > 90%). Plan:
        equi-join on custkey with the interval containment as
        residual — the as-of shape, no theta blowup. ISO day strings
        compare lexicographically, so the residual is sargable as
        written (the open end '9999-12-31' sorts last)."""
        hist = REGISTRY["scd2_priority_history"](spark, sf_dir).select(
            "custkey",
            F.col("priority").alias("h_priority"),
            "version",
            "valid_from",
            "valid_to",
        )
        o = _t(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
        )
        j = o.join(
            hist,
            (o.o_custkey == hist.custkey)
            & (F.col("od") >= F.col("valid_from"))
            & (F.col("od") < F.col("valid_to")),
        )
        match = (F.col("h_priority") == F.col("o_orderpriority")).cast(
            "bigint"
        )
        return (
            j.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(match).cast("bigint").alias("n_pit_match"),
                F.max("version").cast("bigint").alias(
                    "max_version_touched"
                ),
            )
            .orderBy("priority")
        )


_register_pit_join()


_SLA_DAYS = 30


@operator(
    "order_fill_rate_sla",
    oracle=f"""
    WITH spans AS (
      SELECT o.o_orderkey,
             date_trunc('month', o.o_orderdate) AS m,
             MAX(date_diff('day', o.o_orderdate, l.l_shipdate)) AS fill_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT strftime(m, '%Y-%m')                           AS month,
           CAST(COUNT(*) AS BIGINT)                       AS n_orders,
           CAST(COUNT(*) FILTER (WHERE fill_days <= {_SLA_DAYS})
                AS BIGINT)                                AS n_within_sla,
           ROUND(COUNT(*) FILTER (WHERE fill_days <= {_SLA_DAYS})
                 / CAST(COUNT(*) AS DOUBLE), 6)           AS fill_rate,
           CAST(MAX(fill_days) AS BIGINT)                 AS worst_days
    FROM spans GROUP BY 1, m ORDER BY month
    """,
)
def order_fill_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational SLA tracking: share of orders COMPLETELY shipped
    (max line ship-lag) within the 30-day window, by order month —
    the fulfilment KPI the reference's warehouse would publish. One
    fact join + two keyed aggs."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(
            F.max(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            ).alias("fill_days")
        )
    )
    ok = (F.col("fill_days") <= _SLA_DAYS).cast("bigint")
    return (
        spans.groupBy(F.date_format("m", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(ok).cast("bigint").alias("n_within_sla"),
            F.round(F.sum(ok) / F.count(F.lit(1)).cast("double"), 6).alias(
                "fill_rate"
            ),
            F.max("fill_days").cast("bigint").alias("worst_days"),
        )
        .orderBy("month")
    )


@operator(
    "user_lifecycle_stages",
    oracle="""
    WITH user_months AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) // 7
                  AS BIGINT) AS m
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(m) AS m0 FROM user_months GROUP BY 1),
    months AS (SELECT DISTINCT m FROM user_months),
    grid AS (
      SELECT f.user_id, mo.m, f.m0,
             um.user_id IS NOT NULL AS active,
             prev.user_id IS NOT NULL AS active_prev
      FROM firsts f CROSS JOIN months mo
      LEFT JOIN user_months um
        ON um.user_id = f.user_id AND um.m = mo.m
      LEFT JOIN user_months prev
        ON prev.user_id = f.user_id AND prev.m = mo.m - 1
      WHERE mo.m >= f.m0
    )
    SELECT m AS week_idx,
           CAST(COUNT(*) FILTER (WHERE m = m0) AS BIGINT)   AS n_new,
           CAST(COUNT(*) FILTER (WHERE m > m0 AND active AND active_prev)
                AS BIGINT)                                  AS n_retained,
           CAST(COUNT(*) FILTER (WHERE m > m0 AND active AND NOT active_prev)
                AS BIGINT)                                  AS n_resurrected,
           CAST(COUNT(*) FILTER (WHERE NOT active AND active_prev)
                AS BIGINT)                                  AS n_churned
    FROM grid GROUP BY 1 ORDER BY week_idx
    """,
)
def user_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly lifecycle census (growth accounting): new / retained /
    resurrected / churned users per week — the canonical
    startup-metrics decomposition (weekly because the events fixture
    spans ~1 month; the plan is granularity-agnostic). User-week
    dedup first, then dimension-sized joins against the week grid."""
    ev = _t(spark, sf_dir, "events")
    user_months = ev.select(
        "user_id",
        (
            F.datediff(F.to_date("ts"), F.lit("1992-01-01").cast("date"))
            / 7
        )
        .cast("bigint")  # floor for non-negative day offsets
        .alias("m"),
    ).distinct()
    firsts = user_months.groupBy("user_id").agg(F.min("m").alias("m0"))
    months = user_months.select("m").distinct()
    um_cur = user_months.select(
        F.col("user_id").alias("u1"), F.col("m").alias("mc")
    )
    um_prev = user_months.select(
        F.col("user_id").alias("u2"), (F.col("m") + 1).alias("mp")
    )
    grid = (
        firsts.crossJoin(F.broadcast(months))
        .filter(F.col("m") >= F.col("m0"))
        .join(
            um_cur,
            (F.col("user_id") == F.col("u1")) & (F.col("m") == F.col("mc")),
            "left",
        )
        .join(
            um_prev,
            (F.col("user_id") == F.col("u2")) & (F.col("m") == F.col("mp")),
            "left",
        )
        .select(
            "m",
            "m0",
            F.col("u1").isNotNull().alias("active"),
            F.col("u2").isNotNull().alias("active_prev"),
        )
    )
    return (
        grid.groupBy(F.col("m").alias("week_idx"))
        .agg(
            F.sum((F.col("m") == F.col("m0")).cast("bigint"))
            .cast("bigint")
            .alias("n_new"),
            F.sum(
                (
                    (F.col("m") > F.col("m0"))
                    & F.col("active")
                    & F.col("active_prev")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_retained"),
            F.sum(
                (
                    (F.col("m") > F.col("m0"))
                    & F.col("active")
                    & ~F.col("active_prev")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_resurrected"),
            F.sum(
                (~F.col("active") & F.col("active_prev")).cast("bigint")
            )
            .cast("bigint")
            .alias("n_churned"),
        )
        .orderBy("week_idx")
    )


def compact_changelogs(stamped: DataFrame, value_cols: list[str]) -> DataFrame:
    """Collapse a seq-stamped concatenation of CONSECUTIVE
    `diff_snapshots` changelogs into one net changelog (same schema:
    k, change_type, new_<col>...).

    Net rule per key on (first_op by seq, last_op by seq):
    insert..delete cancels (the key never touches the base),
    anything..delete nets to delete, insert..anything nets to insert
    with the LAST image, otherwise update with the last image.
    Property-tested on random 3-snapshot chains
    (tests/test_property_round4_algebra.py): applying the compacted
    log to S0 must reproduce the final snapshot exactly.
    """
    new_cols = [f"new_{c}" for c in value_cols]
    compact = stamped.groupBy("k").agg(
        F.min_by("change_type", "seq").alias("first_op"),
        F.max_by("change_type", "seq").alias("last_op"),
        F.max_by(F.struct(*new_cols), "seq").alias("img"),
    )
    return (
        compact.withColumn(
            "change_type",
            F.when(
                (F.col("first_op") == "insert")
                & (F.col("last_op") == "delete"),
                F.lit(None).cast("string"),
            )
            .when(F.col("last_op") == "delete", F.lit("delete"))
            .when(F.col("first_op") == "insert", F.lit("insert"))
            .otherwise(F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            "k",
            "change_type",
            *[F.col(f"img.{c}").alias(c) for c in new_cols],
        )
    )



# --------------------------------------------------------------------------
# Multi-batch changelog compaction (round 7): two consecutive
# changelogs (S0->S1, S1->S2) collapse to ONE net changelog whose
# application to S0 reproduces S2 — the standard pre-MERGE compaction
# that turns k micro-batch changelogs into a single keyed pass.
# Net rule per key on (first_op, last_op): insert..delete cancels,
# delete..insert becomes update, everything else keeps the LAST
# image with the first op's base semantics. The oracle is S2 itself:
# any defect in diff, compaction, or apply breaks the round trip
# (same adversarial framing as cdc_apply_changelog above).
#
# Scale posture: compaction is one grouped argmin/argmax per key over
# the concatenated changelogs (map-side combinable), then apply's two
# keyed shuffles. The fact table is scanned once per snapshot window;
# at 100 TB the changelogs are deltas, orders of magnitude smaller
# than the table they maintain.
# --------------------------------------------------------------------------
_NET_W = [
    ("1992-01-01", "1994-01-01"),
    ("1993-01-01", "1995-06-01"),
    ("1994-06-01", "1997-01-01"),
]


@operator(
    "cdc_net_changes",
    oracle=f"""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_NET_W[2][0]} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{_NET_W[2][1]} 00:00:00'
    GROUP BY 1 ORDER BY custkey
    """,
)
def cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )

    def snap(a: str, b: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(a).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(b).cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("c").cast("bigint").alias("cents"),
            )
        )

    s0, s1, s2 = (snap(a, b) for a, b in _NET_W)
    log01 = diff_snapshots(s0, s1, "custkey").withColumn("seq", F.lit(1))
    log12 = diff_snapshots(s1, s2, "custkey").withColumn("seq", F.lit(2))
    both = log01.unionByName(log12)
    net = compact_changelogs(both, ["n_orders", "cents"])
    return apply_changelog(s0, net, "custkey").orderBy("custkey")


# --------------------------------------------------------------------------
# Bucketed band join: part pairs within the same manufacturer whose
# retail prices differ by <= _BAND_CENTS. The naive form is a theta
# self-join (|p| x |p| comparisons, and Spark plans it as BNLJ —
# CONTRIBUTING.md pitfall 5); the production form buckets price into
# band-width cells and equi-joins each cell to itself and its right
# neighbor, turning theta into TWO hash joins whose candidate volume
# is sum-of-bucket-sizes-squared. The oracle IS the naive theta join
# (fixture-scale), so the rewrite's equivalence is driver-checked.
# --------------------------------------------------------------------------
_BAND_CENTS = 25


@operator(
    "price_band_join_bucketed",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey AS k, p_brand AS brand,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    )
    SELECT a.brand,
           CAST(COUNT(*) AS BIGINT)                       AS n_pairs,
           CAST(MIN(abs(a.cents - b.cents)) AS BIGINT)    AS min_gap_cents,
           ROUND(SUM(abs(a.cents - b.cents))
                 / CAST(COUNT(*) AS DOUBLE), 6)           AS avg_gap_cents
    FROM p a JOIN p b
      ON a.brand = b.brand AND a.k < b.k
     AND abs(a.cents - b.cents) <= {_BAND_CENTS}
    GROUP BY a.brand ORDER BY a.brand
    """,
)
def price_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_brand").alias("brand"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    bucketed = p.withColumn(
        "bucket", F.floor(F.col("cents") / F.lit(_BAND_CENTS))
    )
    left = bucketed.select(
        "brand",
        F.col("k").alias("ka"),
        F.col("cents").alias("ca"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + 1)
        ).alias("probe"),
    )
    right = bucketed.select(
        "brand",
        F.col("k").alias("kb"),
        F.col("cents").alias("cb"),
        F.col("bucket").alias("probe"),
    )
    pairs = (
        left.join(right, ["brand", "probe"])
        .filter(
            (F.col("ka") != F.col("kb"))
            & (F.abs(F.col("ca") - F.col("cb")) <= _BAND_CENTS)
        )
        # canonicalize the pair with least/greatest (a straddling pair
        # is only ever found with the lower-bucket part on the probe
        # side, so an asymmetric ka < kb filter would drop half of
        # them), then dedup: same-cell pairs match in both
        # orientations and edge-straddlers in both probe cells
        .select(
            "brand",
            F.least("ka", "kb").alias("u"),
            F.greatest("ka", "kb").alias("v"),
            F.abs(F.col("ca") - F.col("cb")).alias("gap"),
        )
        .distinct()
    )
    gap = F.col("gap")
    return (
        pairs.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(gap).cast("bigint").alias("min_gap_cents"),
            F.round(F.sum(gap) / F.count(F.lit(1)).cast("double"), 6).alias(
                "avg_gap_cents"
            ),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# Version-retention compaction: keep only the latest _RETAIN_N orders
# per customer (the standard "N newest versions per key" lakehouse
# retention policy), report what survives per market segment. The
# window partitions on the key — bounded state, range-partitionable;
# the segment rollup is a broadcast-dim join on the surviving rows.
# --------------------------------------------------------------------------
_RETAIN_N = 3


@operator(
    "key_version_retention",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(DISTINCT r.o_custkey) AS BIGINT)      AS n_customers,
           CAST(count_if(r.rn <= {_RETAIN_N}) AS BIGINT)    AS kept_rows,
           CAST(count_if(r.rn > {_RETAIN_N}) AS BIGINT)     AS dropped_rows,
           CAST(SUM(CASE WHEN r.rn <= {_RETAIN_N}
                THEN CAST(ROUND(r.o_totalprice * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT)                      AS kept_cents
    FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY segment
    """,
)
def key_version_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = o.select(
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
    )
    kept = F.col("rn") <= _RETAIN_N
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        ranked.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            ranked.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.when(kept, 1)).alias("kept_rows"),
            F.count(F.when(~kept, 1)).alias("dropped_rows"),
            F.sum(F.when(kept, cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("kept_cents"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Data-contract expectations over lineitem: every rule is a
# conditional aggregate in ONE scan, unpivoted with stack() — the
# joinless sweep shape pinned by the threshold-sweep test (no
# nested-loop join may reappear). This is the "expectation suite"
# gate a pipeline runs before publishing a partition; it composes
# with observed_landing_gate (sources_bridge) which enforces a
# publish decision from metrics like these.
# --------------------------------------------------------------------------
@operator(
    "value_range_expectations",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(count_if(l_quantity < 1 OR l_quantity > 50) AS BIGINT)    AS v_qty,
        CAST(count_if(l_discount < 0 OR l_discount > 0.10) AS BIGINT)  AS v_disc,
        CAST(count_if(l_tax < 0 OR l_tax > 0.08) AS BIGINT)            AS v_tax,
        CAST(count_if(l_shipdate < TIMESTAMP '1992-01-01 00:00:00'
                OR l_shipdate >= TIMESTAMP '2003-01-01 00:00:00') AS BIGINT) AS v_ship,
        CAST(count_if(l_extendedprice <= 0) AS BIGINT)                 AS v_price
      FROM lineitem
    )
    SELECT rule, n_checked, n_violations,
           ROUND(1.0 - n_violations / CAST(n_checked AS DOUBLE), 6)
             AS pass_rate
    FROM (
      SELECT 'discount_0_to_10pct' AS rule, n AS n_checked, v_disc AS n_violations FROM s
      UNION ALL SELECT 'extendedprice_positive', n, v_price FROM s
      UNION ALL SELECT 'quantity_1_to_50', n, v_qty FROM s
      UNION ALL SELECT 'shipdate_in_era', n, v_ship FROM s
      UNION ALL SELECT 'tax_0_to_8pct', n, v_tax FROM s
    ) ORDER BY rule
    """,
)
def value_range_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("v_qty"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.10), 1)
        ).alias("v_disc"),
        F.count(
            F.when((F.col("l_tax") < 0) | (F.col("l_tax") > 0.08), 1)
        ).alias("v_tax"),
        F.count(
            F.when(
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("l_shipdate") >= F.lit("2003-01-01").cast("timestamp")),
                1,
            )
        ).alias("v_ship"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("v_price"),
    )
    rules = s.select(
        F.expr(
            "stack(5,"
            " 'discount_0_to_10pct', v_disc,"
            " 'extendedprice_positive', v_price,"
            " 'quantity_1_to_50', v_qty,"
            " 'shipdate_in_era', v_ship,"
            " 'tax_0_to_8pct', v_tax) AS (rule, n_violations)"
        ),
        F.col("n").alias("n_checked"),
    )
    return rules.select(
        "rule",
        "n_checked",
        "n_violations",
        F.round(
            1.0 - F.col("n_violations") / F.col("n_checked").cast("double"), 6
        ).alias("pass_rate"),
    ).orderBy("rule")


# --------------------------------------------------------------------------
# Nearest-within-tolerance as-of join (both directions): every
# purchase matched to the user's CLOSEST view within +/- 10 minutes —
# the bidirectional variant of the backward-only as-of join
# (fact_pit_join / asof_purchase_attribution). The theta "closest
# within band" is rewritten as a bucketed equi-join: views land in
# their 10-minute cell, purchases probe their own cell and both
# neighbors, and a grouped argmin picks the winner — no BNLJ, no
# window over the union. Gap math is integer microseconds
# (epoch_us <-> unix_micros, exact on both engines).
# --------------------------------------------------------------------------
_ASOF_TOL_US = 600_000_000  # 10 minutes


@operator(
    "asof_nearest_tolerance",
    oracle=f"""
    WITH pv AS (
      SELECT p.event_id AS purchase_id,
             v.event_id AS view_id,
             abs(epoch_us(p.ts) - epoch_us(v.ts)) AS gap_us,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), v.ts, v.event_id
             ) AS rn
      FROM events p
      JOIN events v
        ON v.user_id = p.user_id AND v.event_type = 'view'
       AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= {_ASOF_TOL_US}
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, view_id, gap_us
    FROM pv WHERE rn = 1 ORDER BY purchase_id
    """,
)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataentrytask_spark.catalog import with_event_time

    e = with_event_time(_t(spark, sf_dir, "events"))
    us = F.unix_micros(F.col("ts"))
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
        us.alias("v_us"),
        F.floor(us / _ASOF_TOL_US).alias("cell"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        us.alias("p_us"),
        F.explode(
            F.array(
                F.floor(us / _ASOF_TOL_US) - 1,
                F.floor(us / _ASOF_TOL_US),
                F.floor(us / _ASOF_TOL_US) + 1,
            )
        ).alias("cell"),
    )
    cand = (
        purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (purchases["cell"] == views["cell"]),
        )
        .withColumn("gap_us", F.abs(F.col("p_us") - F.col("v_us")))
        .filter(F.col("gap_us") <= _ASOF_TOL_US)
    )
    return (
        cand.groupBy("purchase_id")
        .agg(
            F.min_by(
                F.struct(F.col("view_id"), F.col("gap_us")),
                F.struct(F.col("gap_us"), F.col("v_ts"), F.col("view_id")),
            ).alias("best")
        )
        .select(
            "purchase_id",
            F.col("best.view_id").alias("view_id"),
            F.col("best.gap_us").alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# Hash-partition skew report (round-8 slate): distribute the fact's
# join key into 32 engine-neutral md5 buckets (the same bucket count
# the session's shuffle uses) and report the balance profile — max/
# min/mean bucket rows and the skew ratio. This is the pre-join
# diagnostic behind join_key_skew_stats: THAT op profiles key
# frequencies; this one shows what the shuffle actually sees after
# hashing, which is what decides stragglers at 100 TB.
# --------------------------------------------------------------------------
_SKEW_BUCKETS = 32


@operator(
    "partition_skew_report",
    oracle=f"""
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
             % {_SKEW_BUCKETS} AS bucket
      FROM orders
    ), per AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rows_in_bucket
      FROM b GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_buckets,
           CAST(SUM(rows_in_bucket) AS BIGINT) AS n_rows,
           CAST(MIN(rows_in_bucket) AS BIGINT) AS min_bucket,
           CAST(MAX(rows_in_bucket) AS BIGINT) AS max_bucket,
           ROUND(SUM(rows_in_bucket) / CAST(COUNT(*) AS DOUBLE), 6)
             AS mean_bucket,
           ROUND(MAX(rows_in_bucket)
                 / (SUM(rows_in_bucket) / CAST(COUNT(*) AS DOUBLE)), 6)
             AS skew_ratio
    FROM per
    """,
)
def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % _SKEW_BUCKETS
    )
    per = o.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_in_bucket")
    )
    mean = F.sum("rows_in_bucket") / F.count(F.lit(1)).cast("double")
    return per.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("rows_in_bucket").cast("bigint").alias("n_rows"),
        F.min("rows_in_bucket").cast("bigint").alias("min_bucket"),
        F.max("rows_in_bucket").cast("bigint").alias("max_bucket"),
        F.round(mean, 6).alias("mean_bucket"),
        F.round(F.max("rows_in_bucket") / mean, 6).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# Ingest-merge idempotence check (round-8 slate): the operational
# invariant behind incremental_dedup_merge — re-delivering the SAME
# batch must add zero rows. Runs the left-anti + union merge twice
# with the identical overlapping batch and emits the counts that
# prove the second pass was a no-op. The oracle computes the
# expected distinct union directly; rows_added_second_pass != 0 can
# never match it.
# --------------------------------------------------------------------------
_IDEM_CUT = "1995-01-01"


@operator(
    "merge_idempotence_check",
    oracle=f"""
    WITH corpus AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderdate < TIMESTAMP '{_IDEM_CUT} 00:00:00'
    ), batch AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1994-06-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1995-06-01 00:00:00'
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS corpus_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM batch)  AS batch_rows,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT o_orderkey FROM corpus
                  UNION SELECT o_orderkey FROM batch))   AS merged_rows,
           CAST(0 AS BIGINT)                             AS rows_added_second_pass
    """,
)
def merge_idempotence_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    corpus = (
        o.filter(F.col("o_orderdate") < F.lit(_IDEM_CUT).cast("timestamp"))
        .select("o_orderkey")
        .distinct()
    )
    batch = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1994-06-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp"))
        )
        .select("o_orderkey")
        .distinct()
    )

    def merge(base: DataFrame, delta: DataFrame) -> DataFrame:
        fresh = delta.join(base, "o_orderkey", "left_anti")
        return base.unionByName(fresh)

    merged1 = merge(corpus, batch)
    merged2 = merge(merged1, batch)  # redelivery of the SAME batch
    c_corpus = corpus.agg(F.count(F.lit(1)).alias("corpus_rows"))
    c_batch = batch.agg(F.count(F.lit(1)).alias("batch_rows"))
    c_m1 = merged1.agg(F.count(F.lit(1)).alias("merged_rows"))
    c_m2 = merged2.agg(F.count(F.lit(1)).alias("m2"))
    return (
        c_corpus.crossJoin(c_batch)
        .crossJoin(c_m1)
        .crossJoin(c_m2)
        .select(
            "corpus_rows",
            "batch_rows",
            "merged_rows",
            (F.col("m2") - F.col("merged_rows"))
            .cast("bigint")
            .alias("rows_added_second_pass"),
        )
    )


# --------------------------------------------------------------------------
# Small-file compaction planner (round-8 slate): given a file manifest
# (synthesized here as month-partition x hash-bucket "files" with
# deterministic byte sizes), assign files to target-sized compaction
# bins by cumulative-size division — the rewrite plan an Iceberg/Delta
# OPTIMIZE job executes. The planning input is the MANIFEST (one row
# per file), never the data: at 100 TB that is ~1e5 rows, and the
# per-partition cumulative window is trivially parallel across
# partitions. Bin id = floor(preceding_cum_bytes / target) makes the
# assignment a pure window expression (greedy sequential packing).
# --------------------------------------------------------------------------
@operator(
    "small_file_compaction_plan",
    oracle="""
    WITH manifest AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS part,
             CAST(o_orderkey % 7 AS BIGINT) AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(40 + length(o_orderpriority)) AS BIGINT) AS bytes
      FROM orders GROUP BY 1, 2
    ), planned AS (
      SELECT part, file_id, n_rows, bytes,
             CAST((SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - bytes) // 4096 AS BIGINT) AS bin_id
      FROM manifest
    )
    SELECT part, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes
    FROM planned GROUP BY 1, 2 ORDER BY part, bin_id
    """,
)
def small_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    manifest = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("part"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("file_id"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.lit(40) + F.length("o_orderpriority")).cast("bigint").alias("bytes"),
    )
    planned = manifest.select(
        "part",
        "file_id",
        "n_rows",
        "bytes",
        F.expr(
            "CAST((sum(bytes) OVER (PARTITION BY part ORDER BY file_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes) "
            "div 4096 AS BIGINT)"
        ).alias("bin_id"),
    )
    return (
        planned.groupBy("part", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("bin_rows"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
        )
        .orderBy("part", "bin_id")
    )


# --------------------------------------------------------------------------
# Zone-map (min/max) data-skipping audit (round-8 slate): build
# 500-row "row groups" under two physical layouts — date-clustered vs
# key-ordered (insert-order proxy) — and measure how many groups a
# date-range predicate can prune from the min/max footer stats alone.
# This quantifies WHY sorted/Z-ordered layout matters at 100 TB: the
# same predicate prunes almost everything under clustering and almost
# nothing without it (zorder_locality_stats measures clustering
# overlap; this measures the scan-cost consequence).
# --------------------------------------------------------------------------
@operator(
    "zone_map_skipping_stats",
    oracle="""
    WITH layouts AS (
      SELECT layout,
             CASE WHEN layout = 'date_clustered'
                  THEN ROW_NUMBER() OVER (PARTITION BY layout
                         ORDER BY o_orderdate, o_orderkey)
                  ELSE ROW_NUMBER() OVER (PARTITION BY layout
                         ORDER BY o_orderkey) END AS rn,
             o_orderdate
      FROM orders CROSS JOIN
           (SELECT UNNEST(['date_clustered', 'key_ordered']) AS layout)
    ), rg AS (
      SELECT layout, (rn - 1) // 500 AS rg_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(o_orderdate) AS lo,
             MAX(o_orderdate) AS hi,
             CAST(count_if(o_orderdate >= TIMESTAMP '1998-01-01'
                           AND o_orderdate < TIMESTAMP '1998-04-01')
                  AS BIGINT) AS matching
      FROM layouts GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_row_groups,
           CAST(count_if(hi < TIMESTAMP '1998-01-01'
                         OR lo >= TIMESTAMP '1998-04-01') AS BIGINT)
             AS n_pruned,
           CAST(SUM(CASE WHEN hi >= TIMESTAMP '1998-01-01'
                          AND lo < TIMESTAMP '1998-04-01'
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(matching) AS BIGINT) AS rows_matching
    FROM rg GROUP BY 1 ORDER BY layout
    """,
)
def zone_map_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    lo, hi = "1998-01-01", "1998-04-01"
    frames = []
    for layout, order_cols in (
        ("date_clustered", ["o_orderdate", "o_orderkey"]),
        ("key_ordered", ["o_orderkey"]),
    ):
        w = Window.orderBy(*order_cols)
        frames.append(
            o.select(
                F.lit(layout).alias("layout"),
                F.row_number().over(w).alias("rn"),
                "o_orderdate",
            )
        )
    layouts = frames[0].unionByName(frames[1])
    in_range = (F.col("o_orderdate") >= F.lit(lo).cast("timestamp")) & (
        F.col("o_orderdate") < F.lit(hi).cast("timestamp")
    )
    rg = layouts.groupBy(
        "layout", F.expr("(rn - 1) div 500").alias("rg_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
        F.sum(F.when(in_range, 1).otherwise(0)).cast("bigint").alias("matching"),
    )
    pruned = (F.col("hi") < F.lit(lo).cast("timestamp")) | (
        F.col("lo") >= F.lit(hi).cast("timestamp")
    )
    return (
        rg.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
            F.sum(F.when(pruned, 1).otherwise(0)).cast("bigint").alias("n_pruned"),
            F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum("matching").cast("bigint").alias("rows_matching"),
        )
        .orderBy("layout")
    )


# --------------------------------------------------------------------------
# Variance-merge associativity check (round-8 slate): compute
# per-month sufficient statistics (n, sum, sum-of-squares) for order
# cents, merge them, and prove the merged variance EQUALS the direct
# single-pass variance bit-for-bit. This is the algebra Spark's
# map-side partial aggregation relies on — under the repo's exact
# integer discipline the merge is drift-free by construction, and this
# operator turns that claim into a checked invariant (the moment-sum
# analog of merge_idempotence_check).
# --------------------------------------------------------------------------
@operator(
    "variance_merge_check",
    oracle="""
    WITH partials AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS part,
             CAST(COUNT(*) AS BIGINT) AS n_p,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s1_p,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT) ) AS s2_p
      FROM orders GROUP BY 1
    ), merged AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_partials,
             CAST(SUM(n_p) AS BIGINT) AS n,
             CAST(SUM(s1_p) AS BIGINT) AS s1,
             SUM(s2_p) AS s2
      FROM partials
    ), direct AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s1,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT) ) AS s2
      FROM orders
    )
    SELECT m.n_partials, m.n AS n_rows,
           ROUND((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * m.s1 / m.n)
                 / (m.n - 1), 6) AS var_merged,
           ROUND((CAST(d.s2 AS DOUBLE) - CAST(d.s1 AS DOUBLE) * d.s1 / d.n)
                 / (d.n - 1), 6) AS var_direct,
           CAST(CASE WHEN m.n = d.n AND m.s1 = d.s1 AND m.s2 = d.s2
                     THEN 1 ELSE 0 END AS BIGINT) AS sufficient_stats_equal
    FROM merged m CROSS JOIN direct d
    """,
)
def variance_merge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    sq = cents.cast("decimal(38,0)") * cents
    partials = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("part")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p"),
        F.sum(cents).cast("bigint").alias("s1_p"),
        F.sum(sq).alias("s2_p"),
    )
    merged = partials.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partials"),
        F.sum("n_p").cast("bigint").alias("mn"),
        F.sum("s1_p").cast("bigint").alias("ms1"),
        F.sum("s2_p").alias("ms2"),
    )
    direct = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("dn"),
        F.sum(cents).cast("bigint").alias("ds1"),
        F.sum(sq).alias("ds2"),
    )
    j = merged.crossJoin(F.broadcast(direct))
    var_m = (
        F.col("ms2").cast("double")
        - F.col("ms1").cast("double") * F.col("ms1") / F.col("mn")
    ) / (F.col("mn") - 1)
    var_d = (
        F.col("ds2").cast("double")
        - F.col("ds1").cast("double") * F.col("ds1") / F.col("dn")
    ) / (F.col("dn") - 1)
    return j.select(
        "n_partials",
        F.col("mn").alias("n_rows"),
        F.round(var_m, 6).alias("var_merged"),
        F.round(var_d, 6).alias("var_direct"),
        F.when(
            (F.col("mn") == F.col("dn"))
            & (F.col("ms1") == F.col("ds1"))
            & (F.col("ms2") == F.col("ds2")),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("sufficient_stats_equal"),
    )


# --------------------------------------------------------------------------
# Per-channel freshness-lag monitor (round-8 slate): seconds each
# event channel's newest record trails the newest record anywhere,
# with an SLA flag — the staleness dashboard every multi-source
# ingest runs. Lag is computed on floor(epoch seconds) (exact BIGINT
# both engines; minute/month calendar diffs are a known cross-engine
# trap — CONTRIBUTING.md). One grouped pass + a broadcast of the
# 1-row global max.
# --------------------------------------------------------------------------
@operator(
    "source_freshness_lag",
    oracle="""
    WITH per AS (
      SELECT event_type AS channel,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_epoch,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
      FROM events GROUP BY 1
    ), g AS (
      SELECT CAST(MAX(last_epoch) AS BIGINT) AS gmax FROM per
    )
    SELECT channel, last_ts,
           CAST(g.gmax - per.last_epoch AS BIGINT) AS lag_seconds,
           CAST(CASE WHEN g.gmax - per.last_epoch <= 3600
                     THEN 1 ELSE 0 END AS BIGINT) AS within_sla_1h
    FROM per CROSS JOIN g ORDER BY channel
    """,
)
def source_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(F.col("event_type").alias("channel")).agg(
        F.unix_timestamp(F.max("ts")).cast("bigint").alias("last_epoch"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )
    g = per.agg(F.max("last_epoch").cast("bigint").alias("gmax"))
    lag = F.col("gmax") - F.col("last_epoch")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "channel",
            "last_ts",
            lag.cast("bigint").alias("lag_seconds"),
            F.when(lag <= 3600, 1).otherwise(0).cast("bigint").alias(
                "within_sla_1h"
            ),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Association-rule metrics for the top-20 co-purchased part pairs
# (round-8 slate): confidence, lift, and conviction from exact basket
# counts — the interpretation layer over basket_part_pairs' raw
# support (support says "frequent", lift says "more than chance",
# conviction says "directionally predictive"). Same bounded basket
# expansion as the graph layer (baskets <= 7 lines); the top-20 cut
# is totally ordered (c_ab DESC, part_a, part_b) so both engines pick
# identical rules, and the item-count side is a broadcast join.
# --------------------------------------------------------------------------
@operator(
    "association_rules_metrics",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
           FROM items GROUP BY 1),
    pc AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    top AS (
      SELECT part_a, part_b, c_ab FROM pc
      ORDER BY c_ab DESC, part_a, part_b LIMIT 20
    )
    SELECT t.part_a, t.part_b, t.c_ab AS support_cnt,
           ROUND(CAST(t.c_ab AS DOUBLE) / ca.c, 6) AS confidence_ab,
           ROUND(CAST(t.c_ab AS DOUBLE) * n.n_orders / (ca.c * cb.c), 6)
             AS lift,
           CASE WHEN t.c_ab < ca.c THEN
             ROUND((1.0 - CAST(cb.c AS DOUBLE) / n.n_orders)
                   / (1.0 - CAST(t.c_ab AS DOUBLE) / ca.c), 6)
           END AS conviction_ab
    FROM top t
    JOIN ic ca ON ca.l_partkey = t.part_a
    JOIN ic cb ON cb.l_partkey = t.part_b
    CROSS JOIN n
    ORDER BY support_cnt DESC, part_a, part_b
    """,
)
def association_rules_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    ic = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    pc = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    w = Window.orderBy(F.col("c_ab").desc(), "part_a", "part_b")
    top = pc.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 20
    ).drop("rnk")
    ca = ic.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = ic.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    j = (
        top.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
    )
    return j.select(
        "part_a",
        "part_b",
        F.col("c_ab").alias("support_cnt"),
        F.round(F.col("c_ab").cast("double") / F.col("ca"), 6).alias(
            "confidence_ab"
        ),
        F.round(
            F.col("c_ab").cast("double") * F.col("n_orders")
            / (F.col("ca") * F.col("cb")),
            6,
        ).alias("lift"),
        F.when(
            F.col("c_ab") < F.col("ca"),
            F.round(
                (F.lit(1.0) - F.col("cb").cast("double") / F.col("n_orders"))
                / (F.lit(1.0) - F.col("c_ab").cast("double") / F.col("ca")),
                6,
            ),
        ).alias("conviction_ab"),
    ).orderBy(F.col("support_cnt").desc(), "part_a", "part_b")


# --------------------------------------------------------------------------
# Time-decay multi-touch attribution (round-8 slate): touches in the
# hour before a purchase share its revenue with a 30-minute half-life
# — the recency-weighted sibling of attribution_linear_multitouch
# (same user-keyed join shape: equi-join on user_id, time window as
# residual predicate — never a theta join). Weights are DYADIC
# (1024 for age<30m, 512 otherwise): exactly-representable doubles,
# so the per-purchase share cents*w/sum_w is the same IEEE value in
# both engines (no pow()/exp() in sight); the final per-channel sum
# rounds at 2 decimals like the linear twin.
# --------------------------------------------------------------------------
@operator(
    "attribution_time_decay",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    touched AS (
      SELECT p.purchase_id, p.cents, t.touch_id, t.channel,
             CASE WHEN floor(epoch(p.p_ts)) - floor(epoch(t.t_ts)) < 1800
                  THEN 1024 ELSE 512 END AS w
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 60 MINUTE
    ),
    weighted AS (
      SELECT purchase_id, touch_id, channel,
             cents * w / SUM(w) OVER (PARTITION BY purchase_id) AS credit
      FROM touched
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS purchases,
           ROUND(SUM(credit), 2) AS credited_cents
    FROM weighted GROUP BY channel ORDER BY channel
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("touch_id"),
    )
    touched = (
        p.join(
            t,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (
                F.col("t_ts")
                >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTE")
            ),
        )
        .select(
            "purchase_id",
            "cents",
            "touch_id",
            "channel",
            F.when(
                F.unix_timestamp("p_ts") - F.unix_timestamp("t_ts") < 1800,
                1024,
            ).otherwise(512).alias("w"),
        )
    )
    wsum = Window.partitionBy("purchase_id")
    weighted = touched.select(
        "purchase_id",
        "touch_id",
        "channel",
        (F.col("cents") * F.col("w") / F.sum("w").over(wsum)).alias("credit"),
    )
    return (
        weighted.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("touches"),
            F.countDistinct("purchase_id").cast("bigint").alias("purchases"),
            F.round(F.sum("credit"), 2).alias("credited_cents"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# Column-profile drift audit (round-8 slate): the schema-level
# companion to drift_psi_report (distribution drift) — per COLUMN
# profiles (row count, NDV, lexicographic min/max of the canonical
# string form) for two year-snapshots of the fact table, side by
# side. This is the Deequ/Great-Expectations "profile diff" a
# warehouse publishes with every partition hand-off: a column whose
# NDV collapses or whose min/max window shifts signals an upstream
# schema or encoder change before any model sees the data.
#
# Scale posture (100 TB): one scan of the two snapshot partitions
# (partition-pruned by the date predicate), a 4x unpivot restricted
# to the profiled columns (projection happens BEFORE the explode, so
# the amplification carries only (snap, name, val)), then ONE
# grouped aggregate with |columns| output rows. The exact
# COUNT(DISTINCT ...) pair compiles to Spark's expand+two-phase agg —
# exact is required for the oracle differential; the 100 TB variant
# swaps in approx_count_distinct per column (HLL machinery already
# proven by uv_sketch_union_daily, star.py). Numeric columns are
# profiled on their cents-scaled BIGINT string form so min/max
# strings are engine-identical (double->VARCHAR formatting is NOT).
# --------------------------------------------------------------------------
@operator(
    "column_profile_drift",
    oracle="""
    WITH snap AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                  THEN 'a' ELSE 'b' END AS snap,
             CAST(o_orderstatus AS VARCHAR)   AS v_status,
             CAST(o_orderpriority AS VARCHAR) AS v_priority,
             CAST(o_custkey AS VARCHAR)       AS v_custkey,
             CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                                              AS v_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ), long AS (
      SELECT snap, 'o_orderstatus' AS col_name, v_status AS val FROM snap
      UNION ALL
      SELECT snap, 'o_orderpriority', v_priority FROM snap
      UNION ALL
      SELECT snap, 'o_custkey', v_custkey FROM snap
      UNION ALL
      SELECT snap, 'o_totalprice_cents', v_cents FROM snap
    )
    SELECT col_name,
           CAST(COUNT(*) FILTER (WHERE snap = 'a') AS BIGINT) AS n_a,
           CAST(COUNT(*) FILTER (WHERE snap = 'b') AS BIGINT) AS n_b,
           CAST(COUNT(DISTINCT val) FILTER (WHERE snap = 'a') AS BIGINT)
             AS ndv_a,
           CAST(COUNT(DISTINCT val) FILTER (WHERE snap = 'b') AS BIGINT)
             AS ndv_b,
           MIN(val) FILTER (WHERE snap = 'a') AS min_a,
           MIN(val) FILTER (WHERE snap = 'b') AS min_b,
           MAX(val) FILTER (WHERE snap = 'a') AS max_a,
           MAX(val) FILTER (WHERE snap = 'b') AS max_b
    FROM long GROUP BY col_name ORDER BY col_name
    """,
)
def column_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side per-column profiles for two snapshots of orders.
    Reference scope: not present (no data-quality layer exists,
    /root/reference/doc/temp.md:509-530); this is the warehouse
    hand-off audit a 100 TB platform runs between drift_psi_report
    (distributions) and key_uniqueness_audit (constraints)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    snap = o.select(
        F.when(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"), "a"
        )
        .otherwise("b")
        .alias("snap"),
        F.col("o_orderstatus").cast("string").alias("v_status"),
        F.col("o_orderpriority").cast("string").alias("v_priority"),
        F.col("o_custkey").cast("string").alias("v_custkey"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("v_cents"),
    )
    long = snap.selectExpr(
        "snap",
        "stack(4, 'o_orderstatus', v_status, 'o_orderpriority', v_priority, "
        "'o_custkey', v_custkey, 'o_totalprice_cents', v_cents) "
        "AS (col_name, val)",
    )
    a = F.col("snap") == "a"
    b = F.col("snap") == "b"
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.when(a, 1)).cast("bigint").alias("n_a"),
            F.count(F.when(b, 1)).cast("bigint").alias("n_b"),
            F.countDistinct(F.when(a, F.col("val"))).cast("bigint").alias("ndv_a"),
            F.countDistinct(F.when(b, F.col("val"))).cast("bigint").alias("ndv_b"),
            F.min(F.when(a, F.col("val"))).alias("min_a"),
            F.min(F.when(b, F.col("val"))).alias("min_b"),
            F.max(F.when(a, F.col("val"))).alias("max_a"),
            F.max(F.when(b, F.col("val"))).alias("max_b"),
        )
        .orderBy("col_name")
    )


# --------------------------------------------------------------------------
# The 100 TB variant of column_profile_drift (VERDICT r7 item 7):
# SCALE.md promised "swaps in approx_count_distinct per column" — this
# registers that claim as a tested operator instead of prose. Same
# partition-pruned scan and 4x unpivot; the exact COUNT(DISTINCT)
# pair (an expand + two-phase agg whose state is the full value
# domain) is replaced by HLL sketches (fixed 1.5 KB state per
# column-snapshot cell, mergeable map-side — the architecture proven
# by uv_sketch_union_daily). Contract: the driver hashes the EXACT
# NDVs plus the boolean "HLL estimate within 5%" per cell — the same
# exact+accuracy-gate oracle shape as approx_distinct_users.
# --------------------------------------------------------------------------
@operator(
    "column_profile_drift_approx",
    oracle="""
    WITH snap AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                  THEN 'a' ELSE 'b' END AS snap,
             CAST(o_orderstatus AS VARCHAR)   AS v_status,
             CAST(o_orderpriority AS VARCHAR) AS v_priority,
             CAST(o_custkey AS VARCHAR)       AS v_custkey,
             CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                                              AS v_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ), long AS (
      SELECT snap, 'o_orderstatus' AS col_name, v_status AS val FROM snap
      UNION ALL
      SELECT snap, 'o_orderpriority', v_priority FROM snap
      UNION ALL
      SELECT snap, 'o_custkey', v_custkey FROM snap
      UNION ALL
      SELECT snap, 'o_totalprice_cents', v_cents FROM snap
    )
    SELECT col_name,
           CAST(COUNT(*) FILTER (WHERE snap = 'a') AS BIGINT) AS n_a,
           CAST(COUNT(*) FILTER (WHERE snap = 'b') AS BIGINT) AS n_b,
           CAST(COUNT(DISTINCT val) FILTER (WHERE snap = 'a') AS BIGINT)
             AS ndv_a,
           CAST(COUNT(DISTINCT val) FILTER (WHERE snap = 'b') AS BIGINT)
             AS ndv_b,
           TRUE AS approx_a_ok,
           TRUE AS approx_b_ok
    FROM long GROUP BY col_name ORDER BY col_name
    """,
)
def column_profile_drift_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-NDV twin of column_profile_drift — the shape that holds
    when a snapshot's value domain no longer fits an exact distinct's
    aggregation state. Reference scope: not present (no data-quality
    layer, /root/reference/doc/temp.md:509-530)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    snap = o.select(
        F.when(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"), "a"
        )
        .otherwise("b")
        .alias("snap"),
        F.col("o_orderstatus").cast("string").alias("v_status"),
        F.col("o_orderpriority").cast("string").alias("v_priority"),
        F.col("o_custkey").cast("string").alias("v_custkey"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("v_cents"),
    )
    long = snap.selectExpr(
        "snap",
        "stack(4, 'o_orderstatus', v_status, 'o_orderpriority', v_priority, "
        "'o_custkey', v_custkey, 'o_totalprice_cents', v_cents) "
        "AS (col_name, val)",
    )
    a = F.col("snap") == "a"
    b = F.col("snap") == "b"

    def _gate(approx: F.Column, exact: F.Column) -> F.Column:
        return (
            F.abs(approx.cast("double") / exact.cast("double") - 1.0) <= 0.05
        )

    hll_a = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.when(a, F.col("val")))
    )
    hll_b = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.when(b, F.col("val")))
    )
    exact_a = F.countDistinct(F.when(a, F.col("val"))).cast("bigint")
    exact_b = F.countDistinct(F.when(b, F.col("val"))).cast("bigint")
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.when(a, 1)).cast("bigint").alias("n_a"),
            F.count(F.when(b, 1)).cast("bigint").alias("n_b"),
            exact_a.alias("ndv_a"),
            exact_b.alias("ndv_b"),
            _gate(hll_a, exact_a).alias("approx_a_ok"),
            _gate(hll_b, exact_b).alias("approx_b_ok"),
        )
        .orderBy("col_name")
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution — the non-heuristic counterpart
# of attribution_linear_multitouch / attribution_time_decay: model
# each user's pre-conversion journey as a first-order chain over
# {start, view, click} with absorbing {conv, null}, compute the
# absorption probability into conversion in closed form (2x2 Cramer
# solve on the transient block), then re-solve with each channel
# removed (its mass redirected to null); a channel's credit is its
# removal effect normalized across channels. Every transition count
# is an exact integer; the ENTIRE scalar algebra is generated ONCE as
# SQL expression strings (_MK_* below) interpolated verbatim into
# BOTH the DuckDB oracle and Spark selectExpr — identical parse tree,
# identical doubles. Journey extraction: one window over each user's
# touch stream cut at the first purchase (ts, event_id) key — a keyed
# shuffle on user_id; the chain summary is 12 integers, so the solve
# is O(1) regardless of fact volume.
# --------------------------------------------------------------------------
def _mk_exprs() -> dict[str, str]:
    p = {
        k: f"(CAST(n{k} AS DOUBLE) / n{k[0]}_row)"
        for k in (
            "sv", "sc", "sk", "vv", "vc", "vk", "cv", "cc", "ck",
        )
    }
    det = (
        f"((1.0 - {p['vv']}) * (1.0 - {p['cc']}) - {p['vc']} * {p['cv']})"
    )
    av = f"(({p['vk']} * (1.0 - {p['cc']}) + {p['vc']} * {p['ck']}) / {det})"
    ac = f"(((1.0 - {p['vv']}) * {p['ck']} + {p['cv']} * {p['vk']}) / {det})"
    asf = f"({p['sv']} * {av} + {p['sc']} * {ac} + {p['sk']})"
    asrv = f"({p['sc']} * ({p['ck']} / (1.0 - {p['cc']})) + {p['sk']})"
    asrc = f"({p['sv']} * ({p['vk']} / (1.0 - {p['vv']})) + {p['sk']})"
    rev = f"(1.0 - {asrv} / {asf})"
    rec = f"(1.0 - {asrc} / {asf})"
    return {
        "p_conv": asf,
        "re_view": rev,
        "re_click": rec,
        "sh_view": f"({rev} / ({rev} + {rec}))",
        "sh_click": f"({rec} / ({rev} + {rec}))",
    }


def _register_attribution_markov_removal() -> None:
    x = _mk_exprs()
    oracle = f"""
    WITH fp AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    conv AS (SELECT user_id FROM fp),
    users AS (SELECT DISTINCT user_id FROM events),
    touches AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      WHERE e.event_type IN ('view', 'click')
        AND (fp.user_id IS NULL OR (e.ts, e.event_id) < (fp.ts, fp.event_id))
    ),
    seqd AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rdesc
      FROM touches
    ),
    trans AS (
      SELECT COALESCE(prev, 'start') AS src, event_type AS dst FROM seqd
      UNION ALL
      SELECT s.event_type,
             CASE WHEN c.user_id IS NULL THEN 'null' ELSE 'conv' END
      FROM seqd s LEFT JOIN conv c ON c.user_id = s.user_id
      WHERE s.rdesc = 1
      UNION ALL
      SELECT 'start',
             CASE WHEN c.user_id IS NULL THEN 'null' ELSE 'conv' END
      FROM users u LEFT JOIN conv c ON c.user_id = u.user_id
      WHERE NOT EXISTS (SELECT 1 FROM seqd t WHERE t.user_id = u.user_id)
    ),
    m AS (
      SELECT
        CAST(count_if(src = 'start' AND dst = 'view') AS BIGINT)  AS nsv,
        CAST(count_if(src = 'start' AND dst = 'click') AS BIGINT) AS nsc,
        CAST(count_if(src = 'start' AND dst = 'conv') AS BIGINT)  AS nsk,
        CAST(count_if(src = 'view' AND dst = 'view') AS BIGINT)   AS nvv,
        CAST(count_if(src = 'view' AND dst = 'click') AS BIGINT)  AS nvc,
        CAST(count_if(src = 'view' AND dst = 'conv') AS BIGINT)   AS nvk,
        CAST(count_if(src = 'click' AND dst = 'view') AS BIGINT)  AS ncv,
        CAST(count_if(src = 'click' AND dst = 'click') AS BIGINT) AS ncc,
        CAST(count_if(src = 'click' AND dst = 'conv') AS BIGINT)  AS nck,
        CAST(count_if(src = 'start') AS BIGINT)                   AS ns_row,
        CAST(count_if(src = 'view') AS BIGINT)                    AS nv_row,
        CAST(count_if(src = 'click') AS BIGINT)                   AS nc_row,
        (SELECT COUNT(*) FROM users)                              AS n_journeys,
        (SELECT COUNT(*) FROM conv)                               AS n_conversions
      FROM trans
    )
    SELECT 'click' AS channel, n_journeys, n_conversions,
           ROUND({x['p_conv']}, 6)   AS p_conv_full,
           ROUND({x['re_click']}, 6) AS removal_effect,
           ROUND({x['sh_click']}, 6) AS attributed_share
    FROM m
    UNION ALL
    SELECT 'view', n_journeys, n_conversions,
           ROUND({x['p_conv']}, 6), ROUND({x['re_view']}, 6),
           ROUND({x['sh_view']}, 6)
    FROM m
    ORDER BY channel
    """

    @operator("attribution_markov_removal", oracle=oracle)
    def attribution_markov_removal(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql import Window

        ev = _t(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id"
        )
        wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
        fp = (
            ev.filter(F.col("event_type") == "purchase")
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("fp_ts"),
                F.col("event_id").alias("fp_eid"),
            )
        )
        conv = fp.select("user_id")
        users = ev.select("user_id").distinct()
        touches = (
            ev.filter(F.col("event_type").isin("view", "click"))
            .join(fp, "user_id", "left")
            .filter(
                F.col("fp_ts").isNull()
                | (
                    F.struct("ts", "event_id")
                    < F.struct(
                        F.col("fp_ts").alias("ts"),
                        F.col("fp_eid").alias("event_id"),
                    )
                )
            )
            .select("user_id", "event_type", "ts", "event_id")
        )
        wd = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        seqd = touches.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(wp).alias("prev"),
            F.row_number().over(wd).alias("rdesc"),
        )
        conv_flag = conv.withColumn("is_conv", F.lit(1))
        step = seqd.select(
            F.coalesce("prev", F.lit("start")).alias("src"),
            F.col("event_type").alias("dst"),
        )
        terminal = (
            seqd.filter(F.col("rdesc") == 1)
            .join(conv_flag, "user_id", "left")
            .select(
                F.col("event_type").alias("src"),
                F.when(F.col("is_conv").isNull(), "null")
                .otherwise("conv")
                .alias("dst"),
            )
        )
        empty = (
            users.join(seqd.select("user_id").distinct(), "user_id", "left_anti")
            .join(conv_flag, "user_id", "left")
            .select(
                F.lit("start").alias("src"),
                F.when(F.col("is_conv").isNull(), "null")
                .otherwise("conv")
                .alias("dst"),
            )
        )
        trans = step.unionAll(terminal).unionAll(empty)

        def cell(s: str, d: str) -> F.Column:
            return F.count(
                F.when((F.col("src") == s) & (F.col("dst") == d), 1)
            ).cast("bigint")

        m = trans.agg(
            cell("start", "view").alias("nsv"),
            cell("start", "click").alias("nsc"),
            cell("start", "conv").alias("nsk"),
            cell("view", "view").alias("nvv"),
            cell("view", "click").alias("nvc"),
            cell("view", "conv").alias("nvk"),
            cell("click", "view").alias("ncv"),
            cell("click", "click").alias("ncc"),
            cell("click", "conv").alias("nck"),
            F.count(F.when(F.col("src") == "start", 1))
            .cast("bigint").alias("ns_row"),
            F.count(F.when(F.col("src") == "view", 1))
            .cast("bigint").alias("nv_row"),
            F.count(F.when(F.col("src") == "click", 1))
            .cast("bigint").alias("nc_row"),
        ).crossJoin(
            users.agg(F.count(F.lit(1)).cast("bigint").alias("n_journeys"))
        ).crossJoin(
            conv.agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        )
        click_row = m.selectExpr(
            "'click' AS channel",
            "n_journeys",
            "n_conversions",
            f"ROUND({x['p_conv']}, 6)   AS p_conv_full",
            f"ROUND({x['re_click']}, 6) AS removal_effect",
            f"ROUND({x['sh_click']}, 6) AS attributed_share",
        )
        view_row = m.selectExpr(
            "'view' AS channel",
            "n_journeys",
            "n_conversions",
            f"ROUND({x['p_conv']}, 6)   AS p_conv_full",
            f"ROUND({x['re_view']}, 6)  AS removal_effect",
            f"ROUND({x['sh_view']}, 6)  AS attributed_share",
        )
        return click_row.unionAll(view_row).orderBy("channel")


_register_attribution_markov_removal()


# --------------------------------------------------------------------------
# Cluster-sampling design effect: if you sample whole ORDERS instead
# of independent line items (the only way to sample at 100 TB — you
# sample files/keys, not rows), how much variance do you pay? The
# ANOVA intraclass correlation (unequal-size m0 form) gives
# DEFF = 1 + (mbar - 1) * rho — the survey-sampling number that says
# how many cluster-sampled rows equal one SRS row. Price clustering
# within an order makes rho > 0; DEFF quantifies the cost of the
# cheap sampling path (bernoulli_hash_sample on l_orderkey = cluster
# sampling; on (orderkey, linenumber) = element sampling). One
# grouped pass to per-order (m_i, s1_i), per-cluster between-SS
# contributions snapped to the integer grid before the cross-cluster
# sum (snap-before-sum), all other moments exact HUGEINT.
# --------------------------------------------------------------------------
@operator(
    "cluster_sample_design_effect",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), per_c AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS m_i,
             CAST(SUM(cents) AS BIGINT) AS s1_i
      FROM li GROUP BY 1
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT)      AS k,
             CAST(SUM(m_i) AS BIGINT)      AS n,
             CAST(SUM(s1_i) AS BIGINT)     AS s,
             SUM(CAST(m_i AS HUGEINT) * m_i) AS sm2,
             SUM(CAST(ROUND(CAST(s1_i AS DOUBLE) * s1_i / m_i)
                      AS HUGEINT))         AS sb
      FROM per_c
    ), yy AS (
      SELECT SUM(CAST(cents AS HUGEINT) * cents) AS sy2 FROM li
    )
    SELECT g.k AS k_clusters, g.n AS n_elems,
           ROUND(CAST(g.n AS DOUBLE) / g.k, 6) AS mean_cluster_size,
           ROUND(CAST(g.s AS DOUBLE) / g.n / 100.0, 6) AS mean_price,
           ROUND(
             ((CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                / (g.k - 1)
              - ((CAST(yy.sy2 AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                 - (CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n))
                / (g.n - g.k))
             / ((CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                / (g.k - 1)
                + ((CAST(g.n AS DOUBLE) - CAST(g.sm2 AS DOUBLE) / g.n)
                   / (g.k - 1) - 1)
                  * ((CAST(yy.sy2 AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                     - (CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n))
                  / (g.n - g.k)), 6) AS icc,
           ROUND(1.0 + (CAST(g.n AS DOUBLE) / g.k - 1.0) *
             (((CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                / (g.k - 1)
              - ((CAST(yy.sy2 AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                 - (CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n))
                / (g.n - g.k))
             / ((CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                / (g.k - 1)
                + ((CAST(g.n AS DOUBLE) - CAST(g.sm2 AS DOUBLE) / g.n)
                   / (g.k - 1) - 1)
                  * ((CAST(yy.sy2 AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n)
                     - (CAST(g.sb AS DOUBLE) - CAST(g.s AS DOUBLE) * g.s / g.n))
                  / (g.n - g.k))), 6) AS deff
    FROM g CROSS JOIN yy
    """,
)
def cluster_sample_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    per_c = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_i"),
        F.sum("cents").cast("bigint").alias("s1_i"),
    )
    g = per_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("m_i").cast("bigint").alias("n"),
        F.sum("s1_i").cast("bigint").alias("s"),
        F.sum(F.col("m_i").cast("decimal(38,0)") * F.col("m_i")).alias("sm2"),
        F.sum(
            F.round(
                F.col("s1_i").cast("double") * F.col("s1_i") / F.col("m_i")
            ).cast("decimal(38,0)")
        ).alias("sb"),
    )
    yy = li.agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sy2")
    )
    out = g.crossJoin(yy)
    k, n = F.col("k"), F.col("n")
    s = F.col("s").cast("double")
    sb = F.col("sb").cast("double")
    sy2 = F.col("sy2").cast("double")
    sm2 = F.col("sm2").cast("double")
    ssb = sb - s * F.col("s") / n
    sst = sy2 - s * F.col("s") / n
    ssw = sst - ssb
    msb = ssb / (k - 1)
    msw = ssw / (n - k)
    m0 = (n.cast("double") - sm2 / n) / (k - 1)
    rho = (msb - msw) / (msb + (m0 - 1) * msw)
    return out.select(
        k.alias("k_clusters"),
        n.alias("n_elems"),
        F.round(n.cast("double") / k, 6).alias("mean_cluster_size"),
        F.round(s / n / 100.0, 6).alias("mean_price"),
        F.round(rho, 6).alias("icc"),
        F.round(F.lit(1.0) + (n.cast("double") / k - 1.0) * rho, 6)
        .alias("deff"),
    )


# --------------------------------------------------------------------------
# Incremental JOIN-view maintenance by the delta rule:
#   d(O |><| C) = dO|><|Cb  +  Ob|><|dC  +  dO|><|dC
# for a per-nation revenue view over orders JOIN customer, with BOTH
# inputs receiving a batch (orders after the date cutoff; customers
# whose key = 0 mod 10, "newly onboarded"). The stored view aggregates
# only Ob|><|Cb; the maintenance pass touches the three delta
# components and merges additively. The join sibling of
# incremental_agg_merge (aggregate IVM) and incremental_dedup_merge
# (dedup IVM) — together the three cover the standard IVM triangle.
# Oracle = the FULL recompute: the merge must be lossless.
# Scale posture: the two delta components that scan a full side
# (dO|><|Cb, Ob|><|dC) are keyed joins where the delta side is small
# — at 100 TB the dim delta broadcasts, and Ob|><|dC is the only
# expensive term (one fact scan, filterable by the dim delta's key
# range); dO|><|dC is delta x delta. The base x base term is never
# recomputed — that is the point.
# --------------------------------------------------------------------------
_IVM_CUTOFF = "2001-01-01"


@operator(
    "incremental_join_maintenance",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY nationkey
    """,
)
def incremental_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ob = o.filter(F.col("o_orderdate") < _IVM_CUTOFF)
    od = o.filter(F.col("o_orderdate") >= _IVM_CUTOFF)
    cb = cust.filter(F.col("c_custkey") % 10 != 0)
    cd = cust.filter(F.col("c_custkey") % 10 == 0)

    def view(orders: DataFrame, customers: DataFrame) -> DataFrame:
        return (
            orders.join(customers, orders.o_custkey == customers.c_custkey)
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("c").alias("cents"),
            )
        )

    stored = view(ob, cb)                      # materialized once
    deltas = (
        view(od, F.broadcast(cb))              # new facts x old dim
        .unionAll(view(ob, F.broadcast(cd)))   # old facts x new dim rows
        .unionAll(view(od, F.broadcast(cd)))   # new x new
    )
    merged = (
        stored.unionAll(deltas)
        .groupBy("nationkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    return merged.orderBy("nationkey")


# --------------------------------------------------------------------------
# Join-cardinality estimation audit — the planner's question run as a
# query: |orders JOIN customer ON custkey| predicted three ways
# (cross-product upper bound; the uniform-key textbook estimate
# n1*n2/max(d1,d2); the per-key exact sum) against the true join
# count. The gap between estimate and truth is WHY skew breaks
# plans; join_key_skew_stats measures the key histogram, this op
# measures the consequence. All counts come from two grouped passes
# plus a custkey-level micro-join of the two count tables
# (|distinct keys| rows); the join output itself is never built.
# --------------------------------------------------------------------------
@operator(
    "join_cardinality_estimate",
    oracle="""
    WITH oc AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c_o
      FROM orders GROUP BY 1
    ), cc AS (
      SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c_c
      FROM customer GROUP BY 1
    ), m AS (
      SELECT
        (SELECT COUNT(*) FROM orders)                    AS n_o,
        (SELECT COUNT(*) FROM customer)                  AS n_c,
        (SELECT COUNT(*) FROM oc)                        AS d_o,
        (SELECT COUNT(*) FROM cc)                        AS d_c,
        (SELECT CAST(COALESCE(SUM(oc.c_o * cc.c_c), 0) AS BIGINT)
         FROM oc JOIN cc ON cc.k = oc.k)                 AS actual
    )
    SELECT CAST(n_o AS BIGINT) AS n_orders,
           CAST(n_c AS BIGINT) AS n_customers,
           CAST(d_o AS BIGINT) AS d_orders_keys,
           CAST(d_c AS BIGINT) AS d_customer_keys,
           CAST(actual AS BIGINT) AS actual_join_rows,
           CAST(ROUND(CAST(n_o AS DOUBLE) * n_c
                      / GREATEST(d_o, d_c)) AS BIGINT) AS est_uniform,
           ROUND(CAST(n_o AS DOUBLE) * n_c / GREATEST(d_o, d_c)
                 / actual, 6) AS est_over_actual
    FROM m
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    oc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_o")
    )
    cc = c.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_c")
    )
    actual = oc.join(cc, "k").agg(
        F.coalesce(F.sum(F.col("c_o") * F.col("c_c")), F.lit(0))
        .cast("bigint").alias("actual")
    )
    m = (
        o.agg(F.count(F.lit(1)).cast("bigint").alias("n_o"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("bigint").alias("n_c")))
        .crossJoin(oc.agg(F.count(F.lit(1)).cast("bigint").alias("d_o")))
        .crossJoin(cc.agg(F.count(F.lit(1)).cast("bigint").alias("d_c")))
        .crossJoin(actual)
    )
    est = (
        F.col("n_o").cast("double") * F.col("n_c")
        / F.greatest("d_o", "d_c")
    )
    return m.select(
        F.col("n_o").alias("n_orders"),
        F.col("n_c").alias("n_customers"),
        F.col("d_o").alias("d_orders_keys"),
        F.col("d_c").alias("d_customer_keys"),
        F.col("actual").alias("actual_join_rows"),
        F.round(est).cast("bigint").alias("est_uniform"),
        F.round(est / F.col("actual"), 6).alias("est_over_actual"),
    )


# --------------------------------------------------------------------------
# Functional-dependency audit (profiling-suite classic): for each
# declared candidate FD X -> Y, count the X keys whose Y is not
# unique — the check that catches denormalization drift and bad
# backfills (a custkey mapping to two nations is corruption, not
# data). Four candidates spanning three tables, each one grouped
# COUNT DISTINCT + conditional aggregate; results unioned into one
# censused report. Complements referential_integrity_audit (INCLUSION
# dependencies) with the DETERMINATION direction.
# --------------------------------------------------------------------------
_FD_CANDIDATES = [
    ("customer", "c_custkey", "c_nationkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_partkey", "p_brand"),
    ("orders", "o_orderkey", "o_orderdate"),
]


def _fd_sql(table: str, x: str, y: str) -> str:
    return f"""
      SELECT '{table}.{x} -> {y}' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(count_if(n_y > 1) AS BIGINT) AS violating_keys,
             CAST(MAX(n_y) AS BIGINT) AS max_variants,
             CASE WHEN count_if(n_y > 1) = 0 THEN 1 ELSE 0 END AS holds
      FROM (SELECT {x}, COUNT(DISTINCT {y}) AS n_y FROM {table} GROUP BY 1)
    """


@operator(
    "functional_dependency_audit",
    oracle=" UNION ALL ".join(
        _fd_sql(t, x, y) for t, x, y in _FD_CANDIDATES
    ) + " ORDER BY fd",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for table, x, y in _FD_CANDIDATES:
        t = _t(spark, sf_dir, table)
        g = t.groupBy(x).agg(F.countDistinct(y).alias("n_y"))
        outs.append(
            g.agg(
                F.lit(f"{table}.{x} -> {y}").alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.count(F.when(F.col("n_y") > 1, 1)).cast("bigint")
                .alias("violating_keys"),
                F.max("n_y").cast("bigint").alias("max_variants"),
                F.when(
                    F.count(F.when(F.col("n_y") > 1, 1)) == 0, 1
                ).otherwise(0).cast("int").alias("holds"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionAll(df)
    return out.orderBy("fd")


# --------------------------------------------------------------------------
# Column-level checksums: an order-free 48-bit-md5-prefix SUM per
# COLUMN (mod 1e18), plus non-null counts — the migration-parity
# primitive that says WHICH column diverged when table_checksum
# (whole-row) says "something changed". Canonicalization matches
# table_checksum's discipline: timestamps to epoch micros, doubles
# to cents, everything through one explicit CAST chain so both
# engines hash identical strings. Column sums are independent, so a
# backfill that rewrote one column flags exactly that column.
# Scale: pure scan-stage projections + one global agg; the mod
# keeps every sum inside BIGINT on output (HUGEINT/DECIMAL(38,0)
# internally).
# --------------------------------------------------------------------------
_CKS_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                     " AS VARCHAR)"),
    ("o_orderdate", "CAST(epoch_us(o_orderdate) AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority"),
]


@operator(
    "column_level_checksums",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS column_name,
               CAST(COUNT({expr}) AS BIGINT) AS n_nonnull,
               CAST(SUM(('0x' || substr(md5({expr}), 1, 12))::BIGINT)
                    % 1000000000000000000 AS BIGINT) AS checksum
        FROM orders
        """
        for name, expr in _CKS_COLS
    ) + " ORDER BY column_name",
)
def column_level_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    spark_exprs = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice": F.round(F.col("o_totalprice") * 100)
        .cast("bigint").cast("string"),
        "o_orderdate": F.unix_micros(
            F.col("o_orderdate").cast("timestamp")
        ).cast("string"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    outs = []
    for name, _ in _CKS_COLS:
        e = spark_exprs[name]
        h = F.conv(F.substring(F.md5(e), 1, 12), 16, 10).cast("decimal(38,0)")
        outs.append(
            o.agg(
                F.lit(name).alias("column_name"),
                F.count(e).cast("bigint").alias("n_nonnull"),
                (F.sum(h) % F.lit(1000000000000000000))
                .cast("bigint").alias("checksum"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionAll(df)
    return out.orderBy("column_name")


# --------------------------------------------------------------------------
# Position-based (U-shaped 40/20/40) attribution — completes the
# heuristic trio (linear, time-decay, THIS) next to the Markov
# removal-effect model: first and last touch inside the window get
# 40% each, the middle splits the remaining 20% evenly (1 touch =>
# 100%, 2 => 50/50). Same verified journey scaffolding as
# attribution_linear_multitouch (one user-keyed interval join, one
# per-purchase window); weights are rank CASEs on the (t_ts,
# touch_id) total order.
# --------------------------------------------------------------------------
@operator(
    "attribution_position_based",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    touched AS (
      SELECT p.purchase_id, p.value, t.touch_id, t.channel, t.t_ts
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 30 MINUTE
    ),
    ranked AS (
      SELECT purchase_id, value, touch_id, channel,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY t_ts, touch_id) AS rn,
             COUNT(*) OVER (PARTITION BY purchase_id)    AS n
      FROM touched
    ),
    weighted AS (
      SELECT purchase_id, touch_id, channel,
             value * (CASE
               WHEN n = 1 THEN 1.0
               WHEN n = 2 THEN 0.5
               WHEN rn = 1 OR rn = n THEN 0.4
               ELSE 0.2 / (n - 2) END) AS credit
      FROM ranked
    )
    SELECT channel,
           COUNT(*) AS touches,
           COUNT(DISTINCT purchase_id) AS purchases,
           ROUND(SUM(credit), 2) AS credited_revenue
    FROM weighted
    GROUP BY channel
    ORDER BY channel
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    touched = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW}")),
    )
    wp = Window.partitionBy("purchase_id")
    ranked = touched.select(
        "purchase_id", "value", "touch_id", "channel",
        F.row_number()
        .over(wp.orderBy("t_ts", "touch_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    w = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    weighted = ranked.select(
        "purchase_id", "touch_id", "channel",
        (F.col("value") * w).alias("credit"),
    )
    return (
        weighted.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.countDistinct("purchase_id").alias("purchases"),
            F.round(F.sum("credit"), 2).alias("credited_revenue"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# ROUND-10 STAGED (registry FROZEN in round 9 — VERDICT r8 item 2;
# ROADMAP "Warehouse / engine hygiene"). Sort-order advisor: per-column
# run statistics under the CURRENT logical order vs a CANDIDATE sort,
# generalizing zone_map_skipping — long runs of equal values are what
# make min/max zone maps, RLE encoding, and data skipping effective,
# so comparing run counts across candidate sort orders is the planning
# table behind a re-cluster / z-order decision.
#
# Determinism: "physical order" is layout-sensitive, so both orderings
# are DEFINED on logical keys — current starts at (l_orderkey,
# l_linenumber) (the insert order the reference's DDL implies),
# candidate starts at l_shipdate. The synthetic lineitem does NOT have
# a unique (l_orderkey, l_linenumber) pair, so both keys are extended
# with every emitted value column: rows tied on the full key are
# identical in all three stacked vals, making the run counts invariant
# to tie order — deterministic without requiring a unique row id.
# Scale: the LAG runs over a global sort; at 100 TB the honest
# production variant computes per-range-partition run stats after a
# repartitionByRange on the sort prefix (runs only break at range
# boundaries, adding <= n_partitions to the count) — at advisor/audit
# scale the exact global window is the right contract.
# --------------------------------------------------------------------------
_SORT_ADVISOR_ORACLE = """
    WITH s AS (
      SELECT l_orderkey, l_linenumber, l_shipdate,
             l_suppkey, l_returnflag, 'l_shipdate' AS col_name,
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS val
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_shipdate, l_suppkey,
             l_returnflag, 'l_suppkey', CAST(l_suppkey AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_shipdate, l_suppkey,
             l_returnflag, 'l_returnflag', l_returnflag FROM lineitem
    ),
    nat AS (
      SELECT 'natural' AS ordering, col_name,
             CASE WHEN LAG(val) OVER w IS NULL
                       OR val <> LAG(val) OVER w THEN 1 ELSE 0 END AS chg
      FROM s
      WINDOW w AS (PARTITION BY col_name
                   ORDER BY l_orderkey, l_linenumber, l_shipdate,
                            l_suppkey, l_returnflag)
    ),
    shp AS (
      SELECT 'shipdate' AS ordering, col_name,
             CASE WHEN LAG(val) OVER w IS NULL
                       OR val <> LAG(val) OVER w THEN 1 ELSE 0 END AS chg
      FROM s
      WINDOW w AS (PARTITION BY col_name
                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                            l_suppkey, l_returnflag)
    ),
    u AS (SELECT * FROM nat UNION ALL SELECT * FROM shp)
    SELECT ordering, col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(chg) AS BIGINT) AS n_runs,
           CAST(ROUND(COUNT(*) * 1000000.0 / SUM(chg)) AS BIGINT)
             AS avg_run_len_ppm
    FROM u GROUP BY 1, 2
    ORDER BY ordering, col_name
    """


def sort_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length statistics per column under two defined sort orders
    (see staged block comment for semantics + 100 TB contract).

    Deliberately NOT persisted although both windows consume the
    stacked frame: caching the 1.8M-row stacked intermediate measured
    SLOWER than recomputing it (8.5s -> 12.4s best-of-3 at sf0.1) —
    the scan+stack is whole-stage-codegen-cheap while the cache write/
    read of wide string rows is not. Persist hygiene is about not
    LEAKING caches, not about caching everything twice-consumed."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        "l_suppkey", "l_returnflag",
    )
    stacked = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_suppkey",
        "l_returnflag",
        F.expr(
            "stack(3, "
            "'l_shipdate', CAST(CAST(l_shipdate AS DATE) AS STRING), "
            "'l_suppkey', CAST(l_suppkey AS STRING), "
            "'l_returnflag', l_returnflag) AS (col_name, val)"
        ),
    )
    w_nat = Window.partitionBy("col_name").orderBy(
        "l_orderkey", "l_linenumber", "l_shipdate",
        "l_suppkey", "l_returnflag",
    )
    w_shp = Window.partitionBy("col_name").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_suppkey", "l_returnflag",
    )

    def runs(w, label: str) -> DataFrame:
        chg = F.when(
            F.lag("val").over(w).isNull()
            | (F.col("val") != F.lag("val").over(w)),
            1,
        ).otherwise(0)
        return (
            stacked.withColumn("chg", chg)
            .groupBy("col_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("chg").cast("bigint").alias("n_runs"),
            )
            .select(
                F.lit(label).alias("ordering"),
                "col_name",
                "n_rows",
                "n_runs",
                F.round(F.col("n_rows") * 1000000.0 / F.col("n_runs"))
                .cast("bigint")
                .alias("avg_run_len_ppm"),
            )
        )

    return (
        runs(w_nat, "natural")
        .unionByName(runs(w_shp, "shipdate"))
        .orderBy("ordering", "col_name")
    )


# Aggregated by operators/staging.py; registered at the round-10
# boundary (zero registry delta until then).
ROUND10_STAGED: dict[str, tuple] = {
    "sort_order_advisor": (sort_order_advisor, _SORT_ADVISOR_ORACLE),
}


# --------------------------------------------------------------------------
# ROUND-10 STAGED: dictionary-encoding advisor — the storage-layout
# planning table complementing sort_order_advisor (ordering) and
# zone_map_skipping (pruning). For each candidate VARCHAR column it
# compares the plain-encoding byte cost (sum of value lengths) against
# the dictionary cost (sum of DISTINCT value lengths + n indexes of
# ceil(log2(ndv)) bits) and recommends. This is the decision parquet/
# ORC writers make per row group; surfacing it corpus-wide tells a
# 100 TB deployment which columns pay for dictionary pages before any
# rewrite happens.
#
# Determinism: pure integer arithmetic end-to-end. ceil(log2(ndv)) is
# a generated CASE chain over power-of-two literals interpolated into
# BOTH engines (CONTRIBUTING.md §5 generated-expression parity — no
# cross-engine log() call). Scale: one (col, value) agg per column —
# map-side partial, output bounded by the column list; high-NDV
# columns (c_name, text, props) are exactly the interesting negative
# recommendations.
# --------------------------------------------------------------------------
_DICT_COLS = [
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_name"),
    ("customer", "c_mktsegment"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("documents", "text"),
]


def _ceil_log2_case(var: str) -> str:
    """ceil(log2(v)) for 1 <= v < 2^40 as a CASE chain — identical
    parse tree in DuckDB and Spark SQL (no engine log())."""
    clauses = "\n".join(
        f"WHEN {var} <= {1 << k} THEN {k}" for k in range(1, 41)
    )
    return f"(CASE WHEN {var} <= 1 THEN 1 {clauses} END)"


def _dict_advisor_oracle() -> str:
    branches = "\n      UNION ALL\n".join(
        f"SELECT '{t}.{c}' AS col_name, CAST({c} AS VARCHAR) AS v FROM {t}"
        for t, c in _DICT_COLS
    )
    k = _ceil_log2_case("ndv")
    return f"""
    WITH src AS (
      {branches}
    ),
    per_val AS (
      SELECT col_name, v, COUNT(*) AS c FROM src GROUP BY 1, 2
    ),
    agg AS (
      SELECT col_name,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv,
             CAST(SUM(length(v) * c) AS BIGINT) AS plain_bytes,
             CAST(SUM(length(v)) AS BIGINT) AS dict_page_bytes
      FROM per_val GROUP BY 1
    )
    SELECT col_name, n_rows, ndv, plain_bytes,
           CAST(dict_page_bytes
                + CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT) AS BIGINT)
             AS dict_bytes,
           (dict_page_bytes
            + CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT)) < plain_bytes
             AS recommend_dict
    FROM agg
    ORDER BY col_name
    """


def dict_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-vs-dictionary byte costs per candidate column (see staged
    block comment). The Spark side evaluates the SAME generated
    ceil-log2 CASE chain via selectExpr."""
    frames = []
    for t, c in _DICT_COLS:
        frames.append(
            _t(spark, sf_dir, t).select(
                F.lit(f"{t}.{c}").alias("col_name"),
                F.col(c).cast("string").alias("v"),
            )
        )
    src = frames[0]
    for fdf in frames[1:]:
        src = src.unionByName(fdf)
    per_val = src.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_val.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum(F.length("v") * F.col("c")).cast("bigint").alias("plain_bytes"),
        F.sum(F.length("v")).cast("bigint").alias("dict_page_bytes"),
    )
    k = _ceil_log2_case("ndv")
    return (
        agg.selectExpr(
            "col_name",
            "n_rows",
            "ndv",
            "plain_bytes",
            f"CAST(dict_page_bytes + CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT)"
            " AS BIGINT) AS dict_bytes",
            f"(dict_page_bytes + CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT))"
            " < plain_bytes AS recommend_dict",
        )
        .orderBy("col_name")
    )


ROUND10_STAGED["dict_encoding_advisor"] = (
    dict_encoding_advisor,
    _dict_advisor_oracle(),
)


# --------------------------------------------------------------------------
# ROUND-10 STAGED (round-11 candidate pulled forward): RLE vs
# bit-packing advisor — composes sort_order_advisor's run counts with
# dict_encoding_advisor's generated ceil-log2 index width. Under the
# CANDIDATE sort (shipdate-first total order, where runs are longest)
# each column's dictionary indexes can be stored run-length encoded
# (run value + 16-bit run length per run) or flat bit-packed; this is
# the per-column encoding pick a columnar writer makes AFTER the sort
# order is chosen. Pure integer arithmetic; the log2 CASE chain is
# interpolated into both engines (CONTRIBUTING §5).
# --------------------------------------------------------------------------
def _rle_advisor_oracle() -> str:
    k = _ceil_log2_case("ndv")
    return f"""
    WITH s AS (
      SELECT l_orderkey, l_linenumber, l_shipdate, l_suppkey,
             l_returnflag, 'l_shipdate' AS col_name,
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS val
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_shipdate, l_suppkey,
             l_returnflag, 'l_suppkey', CAST(l_suppkey AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_shipdate, l_suppkey,
             l_returnflag, 'l_returnflag', l_returnflag FROM lineitem
    ),
    runs AS (
      SELECT col_name,
             CASE WHEN LAG(val) OVER w IS NULL
                       OR val <> LAG(val) OVER w THEN 1 ELSE 0 END AS chg,
             val
      FROM s
      WINDOW w AS (PARTITION BY col_name
                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                            l_suppkey, l_returnflag)
    ),
    agg AS (
      SELECT col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(chg) AS BIGINT) AS n_runs,
             CAST(COUNT(DISTINCT val) AS BIGINT) AS ndv
      FROM runs GROUP BY 1
    )
    SELECT col_name, n_rows, n_runs, ndv,
           CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT) AS packed_bytes,
           CAST(CEIL(n_runs * ({k} + 16) / 8.0) AS BIGINT) AS rle_bytes,
           CEIL(n_runs * ({k} + 16) / 8.0)
             < CEIL(n_rows * {k} / 8.0) AS recommend_rle
    FROM agg
    ORDER BY col_name
    """


def rle_bitpack_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE vs flat bit-packing byte costs per column under the
    shipdate sort (see staged block comment)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        "l_suppkey", "l_returnflag",
    )
    stacked = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_suppkey",
        "l_returnflag",
        F.expr(
            "stack(3, "
            "'l_shipdate', CAST(CAST(l_shipdate AS DATE) AS STRING), "
            "'l_suppkey', CAST(l_suppkey AS STRING), "
            "'l_returnflag', l_returnflag) AS (col_name, val)"
        ),
    )
    w = Window.partitionBy("col_name").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_suppkey", "l_returnflag",
    )
    chg = F.when(
        F.lag("val").over(w).isNull()
        | (F.col("val") != F.lag("val").over(w)),
        1,
    ).otherwise(0)
    agg = (
        stacked.withColumn("chg", chg)
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("chg").cast("bigint").alias("n_runs"),
            F.countDistinct("val").cast("bigint").alias("ndv"),
        )
    )
    k = _ceil_log2_case("ndv")
    return agg.selectExpr(
        "col_name",
        "n_rows",
        "n_runs",
        "ndv",
        f"CAST(CEIL(n_rows * {k} / 8.0) AS BIGINT) AS packed_bytes",
        f"CAST(CEIL(n_runs * ({k} + 16) / 8.0) AS BIGINT) AS rle_bytes",
        f"CEIL(n_runs * ({k} + 16) / 8.0)"
        f" < CEIL(n_rows * {k} / 8.0) AS recommend_rle",
    ).orderBy("col_name")


ROUND10_STAGED["rle_bitpack_advisor"] = (
    rle_bitpack_advisor,
    _rle_advisor_oracle(),
)


# ==========================================================================
# ROUND-11 STAGED (VERDICT r9 item 6; zero registry delta until the
# round-11 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Sort-order advisor — RANGED production variant (VERDICT r9 item 6;
# the variant sort_order_advisor's scale contract names): run stats
# computed per RANGE PARTITION of the candidate sort prefix instead of
# under one global window. Semantics: partition lineitem by
# month(l_shipdate) (a DEFINED range function — Spark's sampled
# repartitionByRange boundaries are nondeterministic and thus not
# oracle-able), order within each range by the full candidate key, and
# count runs per (col_name, range). Runs only break at range
# boundaries, so sum-over-ranges <= exact-global + n_ranges - 1 — the
# documented error bound — while the window state per task is bounded
# by one month of one column: THE 100 TB plan (shuffle on
# (col_name, month), local sort, no global sort anywhere).
# --------------------------------------------------------------------------
_SORT_ADVISOR_RANGED_ORACLE = """
    WITH s AS (
      SELECT date_trunc('month', l_shipdate) AS rng,
             l_orderkey, l_linenumber, l_shipdate,
             l_suppkey, l_returnflag, 'l_shipdate' AS col_name,
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS val
      FROM lineitem
      UNION ALL
      SELECT date_trunc('month', l_shipdate), l_orderkey, l_linenumber,
             l_shipdate, l_suppkey, l_returnflag, 'l_suppkey',
             CAST(l_suppkey AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT date_trunc('month', l_shipdate), l_orderkey, l_linenumber,
             l_shipdate, l_suppkey, l_returnflag, 'l_returnflag',
             l_returnflag
      FROM lineitem
    ),
    chg AS (
      SELECT col_name, rng,
             CASE WHEN LAG(val) OVER w IS NULL
                       OR val <> LAG(val) OVER w THEN 1 ELSE 0 END AS c
      FROM s
      WINDOW w AS (PARTITION BY col_name, rng
                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                            l_suppkey, l_returnflag)
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT rng) AS BIGINT) AS n_ranges,
           CAST(SUM(c) AS BIGINT) AS n_runs_ranged,
           CAST(ROUND(COUNT(*) * 1000000.0 / SUM(c)) AS BIGINT)
             AS avg_run_len_ppm
    FROM chg GROUP BY col_name
    ORDER BY col_name
    """


def sort_order_advisor_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-range-partition run statistics under the shipdate candidate
    sort (see block comment: the production variant of
    sort_order_advisor — bounded window state, no global sort)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        "l_suppkey", "l_returnflag",
    )
    stacked = li.select(
        F.date_trunc("month", "l_shipdate").alias("rng"),
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_suppkey",
        "l_returnflag",
        F.expr(
            "stack(3, "
            "'l_shipdate', CAST(CAST(l_shipdate AS DATE) AS STRING), "
            "'l_suppkey', CAST(l_suppkey AS STRING), "
            "'l_returnflag', l_returnflag) AS (col_name, val)"
        ),
    )
    w = Window.partitionBy("col_name", "rng").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_suppkey", "l_returnflag",
    )
    chg = F.when(
        F.lag("val").over(w).isNull()
        | (F.col("val") != F.lag("val").over(w)),
        1,
    ).otherwise(0)
    return (
        stacked.withColumn("c", chg)
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("rng").cast("bigint").alias("n_ranges"),
            F.sum("c").cast("bigint").alias("n_runs_ranged"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_ranges",
            "n_runs_ranged",
            F.round(F.col("n_rows") * 1000000.0 / F.col("n_runs_ranged"))
            .cast("bigint")
            .alias("avg_run_len_ppm"),
        )
        .orderBy("col_name")
    )


# --------------------------------------------------------------------------
# Bucketed-join planning table (ROADMAP round-11 "Warehouse"): for the
# lineitem JOIN orders equi-join on orderkey, per candidate bucket
# count B — manifest arithmetic from per-bucket row stats, no join
# execution. Bucket function is DEFINED as orderkey % B (Spark's
# Murmur3 bucket hash has no DuckDB twin; modulo over a synthetic
# monotonically-assigned key gives the same planning signal). Per B:
# rows on each side, the largest single bucket on each side (the
# slowest co-located join task), and skew ppm (max/avg). Reading:
# pre-bucketing both tables at B removes BOTH per-join shuffles
# (n_lineitem + n_orders rows every join); a too-small B gives fat
# tasks (max_*_bucket), a too-large B gives small files — the sweep
# shows the trade in one table.
# Scale: two fact-scale aggregations per candidate (groupBy bucket),
# done in ONE pass via a stacked candidate column; outputs are
# domain-sized (|candidates| rows).
# --------------------------------------------------------------------------
_BUCKET_CANDIDATES = [8, 32, 128]

_BUCKET_PLANNING_ORACLE = f"""
    WITH cands AS (SELECT UNNEST([{", ".join(map(str, _BUCKET_CANDIDATES))}]) AS b),
    lb AS (
      SELECT c.b, l.l_orderkey % c.b AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l CROSS JOIN cands c GROUP BY 1, 2
    ),
    ob AS (
      SELECT c.b, o.o_orderkey % c.b AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders o CROSS JOIN cands c GROUP BY 1, 2
    ),
    ls AS (
      SELECT b, CAST(SUM(n) AS BIGINT) AS li_rows,
             CAST(MAX(n) AS BIGINT) AS max_li_bucket,
             CAST(COUNT(*) AS BIGINT) AS li_buckets_used
      FROM lb GROUP BY b
    ),
    os AS (
      SELECT b, CAST(SUM(n) AS BIGINT) AS ord_rows,
             CAST(MAX(n) AS BIGINT) AS max_ord_bucket
      FROM ob GROUP BY b
    )
    SELECT CAST(ls.b AS BIGINT) AS bucket_count,
           ls.li_rows, os.ord_rows,
           ls.li_buckets_used,
           ls.max_li_bucket, os.max_ord_bucket,
           CAST(ROUND(ls.max_li_bucket * 1000000.0
                      / (ls.li_rows / CAST(ls.b AS DOUBLE))) AS BIGINT)
             AS li_skew_ppm,
           ls.li_rows + os.ord_rows AS shuffle_rows_avoided
    FROM ls JOIN os ON os.b = ls.b
    ORDER BY bucket_count
    """


def bucketed_join_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-bucket-count stats for the lineitem JOIN orders
    key (see block comment). One pass per side: the candidate list is
    exploded against each fact row, then a single groupBy computes
    every candidate's bucket histogram."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    od = _t(spark, sf_dir, "orders").select("o_orderkey")
    cand = F.array(*[F.lit(b) for b in _BUCKET_CANDIDATES])

    def bucket_stats(df: DataFrame, key: str, prefix: str) -> DataFrame:
        exploded = df.select(
            F.col(key), F.explode(cand).alias("b")
        ).select("b", (F.col(key) % F.col("b")).alias("bucket"))
        per_bucket = exploded.groupBy("b", "bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        return per_bucket.groupBy("b").agg(
            F.sum("n").cast("bigint").alias(f"{prefix}_rows"),
            F.max("n").cast("bigint").alias(f"max_{prefix}_bucket"),
            F.count(F.lit(1)).cast("bigint").alias(f"{prefix}_buckets_used"),
        )

    ls = bucket_stats(li, "l_orderkey", "li")
    os_ = bucket_stats(od, "o_orderkey", "ord").drop("ord_buckets_used")
    return (
        ls.join(os_, "b")
        .select(
            F.col("b").cast("bigint").alias("bucket_count"),
            "li_rows",
            "ord_rows",
            "li_buckets_used",
            "max_li_bucket",
            "max_ord_bucket",
            F.round(
                F.col("max_li_bucket")
                * 1000000.0
                / (F.col("li_rows") / F.col("b").cast("double"))
            )
            .cast("bigint")
            .alias("li_skew_ppm"),
            (F.col("li_rows") + F.col("ord_rows"))
            .cast("bigint")
            .alias("shuffle_rows_avoided"),
        )
        .orderBy("bucket_count")
    )


# --------------------------------------------------------------------------
# Partition-size advisor (ROADMAP round-11 "Warehouse"): the
# write-side sibling of sort_order_advisor — for each candidate
# partition column of orders (month(o_orderdate), o_orderpriority,
# o_orderstatus), the partition-count / size-distribution / skew table
# that decides a partitionBy choice. small-partition flag = any
# partition under _PART_MIN_ROWS (the small-file problem: at 100 TB a
# partition under ~1 GB wastes open/seek overhead and metadata);
# skew = max/avg ppm (a partition 10x the mean is the straggler task
# and the compaction hotspot).
# Scale: one stacked pass over orders -> (candidate, value) counts —
# a single fact-scale shuffle on a domain-bounded key.
# --------------------------------------------------------------------------
_PART_MIN_ROWS = 200  # sf-fixture stand-in for the ~1 GB floor

_PART_ADVISOR_ORACLE = f"""
    WITH s AS (
      SELECT 'month(o_orderdate)' AS candidate,
             CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS val
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
    ),
    per AS (
      SELECT candidate, val, CAST(COUNT(*) AS BIGINT) AS n
      FROM s GROUP BY 1, 2
    )
    SELECT candidate,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(count_if(n < {_PART_MIN_ROWS}) AS BIGINT)
             AS n_small_partitions,
           CAST(ROUND(MAX(n) * 1000000.0 / (SUM(n) / COUNT(*))) AS BIGINT)
             AS skew_ppm,
           count_if(n < {_PART_MIN_ROWS}) = 0
             AND MAX(n) * 1.0 / (SUM(n) / COUNT(*)) < 3.0 AS recommend
    FROM per GROUP BY candidate
    ORDER BY candidate
    """


def partition_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-count / size / skew table per candidate partition
    column of orders (see block comment)."""
    od = _t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderpriority", "o_orderstatus"
    )
    stacked = od.select(
        F.expr(
            "stack(3, "
            "'month(o_orderdate)', "
            "CAST(date_trunc('month', o_orderdate) AS STRING), "
            "'o_orderpriority', o_orderpriority, "
            "'o_orderstatus', o_orderstatus) AS (candidate, val)"
        )
    )
    per = stacked.groupBy("candidate", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    avg_rows = F.col("total_rows") / F.col("n_partitions")
    return (
        per.groupBy("candidate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.min("n").cast("bigint").alias("min_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.sum((F.col("n") < _PART_MIN_ROWS).cast("long"))
            .cast("bigint")
            .alias("n_small_partitions"),
        )
        .select(
            "candidate",
            "n_partitions",
            "min_rows",
            "max_rows",
            "total_rows",
            "n_small_partitions",
            F.round(F.col("max_rows") * 1000000.0 / avg_rows)
            .cast("bigint")
            .alias("skew_ppm"),
            (
                (F.col("n_small_partitions") == 0)
                & (F.col("max_rows") / avg_rows < 3.0)
            ).alias("recommend"),
        )
        .orderBy("candidate")
    )


ROUND11_STAGED: dict[str, tuple] = {
    "sort_order_advisor_ranged": (
        sort_order_advisor_ranged,
        _SORT_ADVISOR_RANGED_ORACLE,
    ),
    "bucketed_join_planning": (
        bucketed_join_planning,
        _BUCKET_PLANNING_ORACLE,
    ),
    "partition_size_advisor": (
        partition_size_advisor,
        _PART_ADVISOR_ORACLE,
    ),
}


# --------------------------------------------------------------------------
# Compaction planner (ROADMAP round-12, pulled forward):
# partition_size_advisor says WHICH partitioning has a small-file
# problem; this emits the actual merge schedule for the
# month(o_orderdate) layout — which adjacent months coalesce into
# which output file so every file meets the size floor. The
# assignment rule is DEFINED (not a heuristic solver): walk months in
# calendar order and assign each to group FLOOR(rows_before / TARGET)
# — the prefix-sum bin-packing every compaction job can reproduce
# deterministically and incrementally (a new month only ever appends
# to the last group). Adjacency preserved -> month-range pruning
# still works on the compacted files.
# Scale: one month-domain aggregation + one window over ~|months|
# rows. TARGET is the fixture stand-in for the ~1 GB file target.
# --------------------------------------------------------------------------
_COMPACT_TARGET_ROWS = 400

_COMPACTION_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM per
    ),
    grouped AS (
      SELECT CAST(FLOOR(before / {_COMPACT_TARGET_ROWS}) AS BIGINT)
               AS group_id,
             m, n, before
      FROM cum
    )
    SELECT group_id,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(strftime(MIN(m), '%Y-%m') AS VARCHAR) AS first_month,
           CAST(strftime(MAX(m), '%Y-%m') AS VARCHAR) AS last_month,
           SUM(n) < {_COMPACT_TARGET_ROWS} AS under_target,
           MIN(before) > group_id * {_COMPACT_TARGET_ROWS}
             AS spans_from_prev
    FROM grouped
    GROUP BY group_id
    ORDER BY group_id
    """


def compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge schedule for the month(o_orderdate) partitioning (see
    block comment: deterministic prefix-sum bin-packing)."""
    od = _t(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("m")
    )
    per = od.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = (
        Window.orderBy("m")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per.select(
        "m", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("before")
    )
    grouped = cum.select(
        F.floor(F.col("before") / _COMPACT_TARGET_ROWS)
        .cast("bigint")
        .alias("group_id"),
        "m",
        "n",
        "before",
    )
    # under_target marks groups below the file floor; spans_from_prev
    # explains WHY (an oversized month overshot this bucket's range —
    # the floor rule's only under-fill mode, pinned by test): the
    # compaction job merges those two flags' groups with a neighbor.
    return (
        grouped.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.date_format(F.min("m"), "yyyy-MM").alias("first_month"),
            F.date_format(F.max("m"), "yyyy-MM").alias("last_month"),
            F.min("before").alias("start_before"),
        )
        .select(
            "group_id",
            "n_partitions",
            "n_rows",
            "first_month",
            "last_month",
            (F.col("n_rows") < _COMPACT_TARGET_ROWS).alias("under_target"),
            (
                F.col("start_before")
                > F.col("group_id") * _COMPACT_TARGET_ROWS
            ).alias("spans_from_prev"),
        )
        .orderBy("group_id")
    )


ROUND11_STAGED["compaction_planner"] = (
    compaction_planner,
    _COMPACTION_ORACLE,
)


# --------------------------------------------------------------------------
# Bucket x sort joint advisor (ROADMAP round-12, pulled forward):
# bucketed_join_planning prices the shuffle a bucket layout SAVES;
# this table prices what it COSTS the sort side: bucketing lineitem
# by l_orderkey % B and sorting WITHIN buckets by l_shipdate (the
# bucketBy + sortBy DDL) splinters the global date clustering across
# B files — every bucket contains almost every ship date, so total
# shipdate runs grow ~Bx and RLE/zone-map effectiveness falls
# accordingly. Per candidate B (1 = unbucketed baseline, tying the
# row to sort_order_advisor's global number): total runs summed over
# buckets, average run length, and the largest bucket (the slowest
# writer/join task). The pair (shuffle saved, runs lost) is the real
# bucket-count decision.
# Scale: one stacked pass; the run count is a window PARTITIONED BY
# (candidate, bucket) — bounded state per task, no global sort for
# any B >= 2 (the B = 1 baseline row is the only global window, the
# sort_order_advisor audit contract).
# --------------------------------------------------------------------------
_BS_JOINT_BUCKETS = [1, 8, 32]

_BS_JOINT_ORACLE = f"""
    WITH cand(b) AS (VALUES {", ".join(f"({b})" for b in _BS_JOINT_BUCKETS)}),
    rows_ AS (
      SELECT cand.b, l.l_orderkey % cand.b AS bucket,
             CAST(CAST(l.l_shipdate AS DATE) AS VARCHAR) AS val,
             l.l_shipdate, l.l_orderkey, l.l_linenumber
      FROM lineitem l CROSS JOIN cand
    ),
    chg AS (
      SELECT b, bucket,
             CASE WHEN LAG(val) OVER w IS NULL
                       OR val <> LAG(val) OVER w THEN 1 ELSE 0 END AS c
      FROM rows_
      WINDOW w AS (PARTITION BY b, bucket
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ),
    per_bucket AS (
      SELECT b, bucket, CAST(SUM(c) AS BIGINT) AS runs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM chg GROUP BY 1, 2
    )
    SELECT CAST(b AS BIGINT) AS bucket_count,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(runs) AS BIGINT) AS n_runs_shipdate,
           CAST(ROUND(SUM(n) * 1000000.0 / SUM(runs)) AS BIGINT)
             AS avg_run_len_ppm,
           CAST(MAX(n) AS BIGINT) AS max_bucket_rows
    FROM per_bucket GROUP BY b
    ORDER BY bucket_count
    """


def bucket_sort_joint_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipdate run-length cost of a bucketBy(B) + sortBy(shipdate)
    layout, per candidate B (see block comment)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    cand = F.array(*[F.lit(b) for b in _BS_JOINT_BUCKETS])
    rows_ = li.select(
        F.explode(cand).alias("b"),
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
    ).select(
        "b",
        (F.col("l_orderkey") % F.col("b")).alias("bucket"),
        F.col("l_shipdate").cast("date").cast("string").alias("val"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("b", "bucket").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    chg = F.when(
        F.lag("val").over(w).isNull()
        | (F.col("val") != F.lag("val").over(w)),
        1,
    ).otherwise(0)
    per_bucket = (
        rows_.withColumn("c", chg)
        .groupBy("b", "bucket")
        .agg(
            F.sum("c").cast("bigint").alias("runs"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return (
        per_bucket.groupBy("b")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("runs").cast("bigint").alias("n_runs_shipdate"),
            F.round(F.sum("n") * 1000000.0 / F.sum("runs"))
            .cast("bigint")
            .alias("avg_run_len_ppm"),
            F.max("n").cast("bigint").alias("max_bucket_rows"),
        )
        .select(
            F.col("b").cast("bigint").alias("bucket_count"),
            "n_rows",
            "n_runs_shipdate",
            "avg_run_len_ppm",
            "max_bucket_rows",
        )
        .orderBy("bucket_count")
    )


ROUND11_STAGED["bucket_sort_joint_advisor"] = (
    bucket_sort_joint_advisor,
    _BS_JOINT_ORACLE,
)


# ==========================================================================
# ROUND-12 STAGED (VERDICT r10 item 7; zero registry delta until the
# round-12 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Compacted-layout zone pruning (ROADMAP round-12 "Warehouse"):
# compaction_planner emits the month->merge-group schedule; this
# prices what the merge COSTS the scan side. After compaction the
# pruning unit is the GROUP (its zone map spans min..max month of its
# members), so a day-granularity predicate that used to touch one
# month now scans every month in that group. Per reference predicate:
# rows matched, what the per-month layout scans (parts + rows), what
# the compacted layout scans (groups + rows), and both read
# amplifications — the small-files-vs-read-amp trade quantified on
# the SAME schedule the planner emits (group assignment reuses the
# planner's exact prefix-sum rule, _COMPACT_TARGET_ROWS).
# Predicates are fixed day-granularity literals inside the fixture's
# 1995-2001 span: one-month, one-quarter, half-year straddling a year
# boundary, and a single day (the pathological read-amp case).
# Scale: the month census is one domain-sized aggregation; predicate
# evaluation is one stacked pass (|orders| x 4 conditional agg) and
# two domain-sized overlap joins. Exact timestamp comparisons only.
# --------------------------------------------------------------------------
_CZP_PREDS = [
    ("p1_month", "1996-03-10", "1996-04-10"),
    ("p2_quarter", "1997-01-01", "1997-04-01"),
    ("p3_halfyear", "1998-06-15", "1998-12-15"),
    ("p4_day", "1999-07-04", "1999-07-05"),
]

_CZP_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM per
    ),
    grp AS (
      SELECT CAST(FLOOR(before / {_COMPACT_TARGET_ROWS}) AS BIGINT)
               AS group_id,
             MIN(m) AS g_lo,
             MAX(m) + INTERVAL 1 MONTH AS g_hi,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM cum GROUP BY 1
    ),
    preds(pred_id, lo, hi) AS (VALUES
      {", ".join(f"('{p}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                 for p, lo, hi in _CZP_PREDS)}
    ),
    matched AS (
      SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS rows_matched
      FROM orders o CROSS JOIN preds p
      WHERE o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
      GROUP BY 1
    ),
    mscan AS (
      SELECT p.pred_id,
             CAST(COUNT(*) AS BIGINT) AS n_parts_month,
             CAST(SUM(c.n) AS BIGINT) AS rows_scanned_month
      FROM per c CROSS JOIN preds p
      WHERE p.lo < c.m + INTERVAL 1 MONTH AND p.hi > c.m
      GROUP BY 1
    ),
    gscan AS (
      SELECT p.pred_id,
             CAST(COUNT(*) AS BIGINT) AS n_groups_scanned,
             CAST(SUM(g.n_rows) AS BIGINT) AS rows_scanned_compacted
      FROM grp g CROSS JOIN preds p
      WHERE p.lo < g.g_hi AND p.hi > g.g_lo
      GROUP BY 1
    )
    SELECT m.pred_id, m.rows_matched,
           s.n_parts_month, s.rows_scanned_month,
           g.n_groups_scanned, g.rows_scanned_compacted,
           CAST(ROUND(s.rows_scanned_month * 1000000.0 / m.rows_matched)
                AS BIGINT) AS read_amp_month_ppm,
           CAST(ROUND(g.rows_scanned_compacted * 1000000.0
                      / m.rows_matched) AS BIGINT)
             AS read_amp_compacted_ppm
    FROM matched m JOIN mscan s USING (pred_id)
    JOIN gscan g USING (pred_id)
    ORDER BY pred_id
    """


def compacted_zone_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-amplification of the compacted month layout vs the
    per-month layout for a fixed day-granularity predicate set (see
    block comment; group rule = compaction_planner's prefix sum)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate")
    per = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "m", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("before")
    )
    grp = (
        cum.groupBy(
            F.floor(F.col("before") / _COMPACT_TARGET_ROWS)
            .cast("bigint")
            .alias("group_id")
        )
        .agg(
            F.min("m").alias("g_lo"),
            (F.max("m") + F.expr("INTERVAL 1 MONTH")).alias("g_hi"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
    )
    preds = spark.createDataFrame(
        [(p, lo, hi) for p, lo, hi in _CZP_PREDS],
        "pred_id string, lo_s string, hi_s string",
    ).select(
        "pred_id",
        F.to_timestamp("lo_s").alias("lo"),
        F.to_timestamp("hi_s").alias("hi"),
    )
    matched = (
        o.crossJoin(F.broadcast(preds))
        .filter(
            (F.col("o_orderdate") >= F.col("lo"))
            & (F.col("o_orderdate") < F.col("hi"))
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    mscan = (
        per.crossJoin(F.broadcast(preds))
        .filter(
            (F.col("lo") < F.col("m") + F.expr("INTERVAL 1 MONTH"))
            & (F.col("hi") > F.col("m"))
        )
        .groupBy("pred_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts_month"),
            F.sum("n").cast("bigint").alias("rows_scanned_month"),
        )
    )
    gscan = (
        grp.crossJoin(F.broadcast(preds))
        .filter((F.col("lo") < F.col("g_hi")) & (F.col("hi") > F.col("g_lo")))
        .groupBy("pred_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups_scanned"),
            F.sum("n_rows").cast("bigint").alias("rows_scanned_compacted"),
        )
    )
    return (
        matched.join(mscan, "pred_id")
        .join(gscan, "pred_id")
        .select(
            "pred_id",
            "rows_matched",
            "n_parts_month",
            "rows_scanned_month",
            "n_groups_scanned",
            "rows_scanned_compacted",
            F.round(
                F.col("rows_scanned_month") * 1000000.0
                / F.col("rows_matched")
            )
            .cast("bigint")
            .alias("read_amp_month_ppm"),
            F.round(
                F.col("rows_scanned_compacted") * 1000000.0
                / F.col("rows_matched")
            )
            .cast("bigint")
            .alias("read_amp_compacted_ppm"),
        )
        .orderBy("pred_id")
    )


# --------------------------------------------------------------------------
# Sort-key benefit ranking (ROADMAP round-12 "Warehouse"): pick the
# table's ONE sort key from the scan workload, not folklore. For each
# candidate sort column the orders fact is laid out in that order,
# split into fixed 500-row "row groups" (the zone_map_skipping_stats
# unit), and every group's min/max footer stats are tested against a
# fixed 4-predicate reference workload (date range / custkey range /
# totalprice band / priority equality). Output: one row per candidate
# layout with the zone-map prune fraction per predicate, the workload
# mean, and the resulting rank — sorting by a column prunes its own
# predicate near-perfectly and (absent correlation) nothing else, so
# the mean column is the actual decision number.
# Determinism: min/max and comparisons only (no float arithmetic);
# ties in each layout order are broken by o_orderkey.
# Scale: |cands| stacked row_number passes (global window = the
# audit-scale contract; the per-range production variant is
# sort_order_advisor_ranged's pattern) + one domain-sized rollup.
# --------------------------------------------------------------------------
_SKB_RG_ROWS = 500
_SKB_CANDS = ["o_orderdate", "o_custkey", "o_totalprice", "o_orderpriority"]
# (pred_id, column, lo, hi) — hi exclusive for ranges; equality preds
# have lo == hi and test min <= v <= max overlap.
_SKB_PRED_SQL = {
    "pr_date": ("o_orderdate",
                "TIMESTAMP '1997-01-01'", "TIMESTAMP '1997-07-01'"),
    "pr_cust": ("o_custkey", "100", "200"),
    "pr_price": ("o_totalprice", "100000.0", "150000.0"),
    "pr_prio": ("o_orderpriority", "'1-URGENT'", None),  # equality
}


def _skb_overlap_sql(col: str, lo: str, hi: str | None) -> str:
    """Row-group [min,max] overlap test for a range (hi-exclusive) or
    equality (hi None) predicate on `col`."""
    if hi is None:
        return f"(mn_{col} <= {lo} AND mx_{col} >= {lo})"
    return f"(mn_{col} < {hi} AND mx_{col} >= {lo})"


_SKB_ORACLE = f"""
    WITH stacked AS (
      {" UNION ALL ".join(
        f'''SELECT '{c}' AS sort_col,
               ROW_NUMBER() OVER (ORDER BY {c}, o_orderkey) AS rn,
               o_orderdate, o_custkey, o_totalprice, o_orderpriority
        FROM orders''' for c in _SKB_CANDS)}
    ),
    rg AS (
      SELECT sort_col, (rn - 1) // {_SKB_RG_ROWS} AS rg_id,
             {", ".join(
               f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}"
               for c in ["o_orderdate", "o_custkey", "o_totalprice",
                         "o_orderpriority"])}
      FROM stacked GROUP BY 1, 2
    ),
    per AS (
      SELECT sort_col,
             CAST(COUNT(*) AS BIGINT) AS n_row_groups,
             {", ".join(
               f'''CAST(ROUND((1.0 - count_if(
                     {_skb_overlap_sql(*_SKB_PRED_SQL[p])})
                     / CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
                   AS {p}_prune_ppm''' for p in _SKB_PRED_SQL)}
      FROM rg GROUP BY 1
    ),
    scored AS (
      SELECT *,
             CAST(ROUND(({" + ".join(f"{p}_prune_ppm"
                                     for p in _SKB_PRED_SQL)})
                        / {len(_SKB_PRED_SQL)}.0) AS BIGINT)
               AS mean_prune_ppm
      FROM per
    )
    SELECT sort_col, n_row_groups,
           {", ".join(f"{p}_prune_ppm" for p in _SKB_PRED_SQL)},
           mean_prune_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY mean_prune_ppm DESC, sort_col)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY rank
    """


def sort_key_benefit_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prune fraction per candidate sort key against a fixed
    reference predicate workload, ranked (see block comment)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey", "o_totalprice",
        "o_orderpriority",
    )
    pcols = ["o_orderdate", "o_custkey", "o_totalprice", "o_orderpriority"]
    stacked = None
    for c in _SKB_CANDS:
        lay = o.select(
            F.lit(c).alias("sort_col"),
            F.row_number()
            .over(Window.orderBy(F.col(c), F.col("o_orderkey")))
            .alias("rn"),
            *pcols,
        )
        stacked = lay if stacked is None else stacked.unionByName(lay)
    rg = stacked.groupBy(
        "sort_col",
        F.floor((F.col("rn") - 1) / _SKB_RG_ROWS).alias("rg_id"),
    ).agg(
        *[
            a
            for c in pcols
            for a in (
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
            )
        ]
    )
    per = rg.groupBy("sort_col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
        *[
            F.round(
                (
                    1.0
                    - F.sum(
                        F.expr(_skb_overlap_sql(*_SKB_PRED_SQL[p])).cast(
                            "long"
                        )
                    )
                    / F.count(F.lit(1)).cast("double")
                )
                * 1000000
            )
            .cast("bigint")
            .alias(f"{p}_prune_ppm")
            for p in _SKB_PRED_SQL
        ],
    )
    scored = per.withColumn(
        "mean_prune_ppm",
        F.round(
            sum(F.col(f"{p}_prune_ppm") for p in _SKB_PRED_SQL)
            / float(len(_SKB_PRED_SQL))
        ).cast("bigint"),
    )
    return scored.select(
        "sort_col",
        "n_row_groups",
        *[f"{p}_prune_ppm" for p in _SKB_PRED_SQL],
        "mean_prune_ppm",
        F.row_number()
        .over(Window.orderBy(F.col("mean_prune_ppm").desc(), "sort_col"))
        .cast("bigint")
        .alias("rank"),
    ).orderBy("rank")


# --------------------------------------------------------------------------
# Compaction floor sweep (ROADMAP round-13, pulled forward): the
# knob itself. compacted_zone_pruning prices ONE floor
# (_COMPACT_TARGET_ROWS); this sweeps three candidate floors through
# the same prefix-sum schedule and the same predicate workload, so a
# platform reads the small-files-vs-read-amp frontier off one table:
# per (floor, predicate) the group count, under-floor group count
# (the small-file residue), rows scanned and read amplification.
# The month census and the per-predicate match counts are computed
# ONCE; only the domain-sized group assignment is per-floor.
# Scale: one month-domain aggregation + |floors| window passes over
# ~|months| rows + domain-sized overlap joins.
# --------------------------------------------------------------------------
_CFS_FLOORS = [200, 400, 800]

_CFS_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM per
    ),
    fl(floor_rows) AS (VALUES
      {", ".join(f"({x})" for x in _CFS_FLOORS)}),
    grp AS (
      SELECT fl.floor_rows,
             CAST(FLOOR(c.before / fl.floor_rows) AS BIGINT) AS group_id,
             MIN(c.m) AS g_lo,
             MAX(c.m) + INTERVAL 1 MONTH AS g_hi,
             CAST(SUM(c.n) AS BIGINT) AS n_rows
      FROM cum c CROSS JOIN fl
      GROUP BY 1, 2
    ),
    gstat AS (
      SELECT floor_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(count_if(n_rows < floor_rows) AS BIGINT)
               AS n_under_floor
      FROM grp GROUP BY 1
    ),
    preds(pred_id, lo, hi) AS (VALUES
      {", ".join(f"('{p}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                 for p, lo, hi in _CZP_PREDS)}
    ),
    matched AS (
      SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS rows_matched
      FROM orders o CROSS JOIN preds p
      WHERE o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
      GROUP BY 1
    ),
    gscan AS (
      SELECT g.floor_rows, p.pred_id,
             CAST(COUNT(*) AS BIGINT) AS n_groups_scanned,
             CAST(SUM(g.n_rows) AS BIGINT) AS rows_scanned
      FROM grp g CROSS JOIN preds p
      WHERE p.lo < g.g_hi AND p.hi > g.g_lo
      GROUP BY 1, 2
    )
    SELECT CAST(s.floor_rows AS BIGINT) AS floor_rows,
           s.pred_id,
           g.n_groups, g.n_under_floor,
           s.n_groups_scanned, s.rows_scanned, m.rows_matched,
           CAST(ROUND(s.rows_scanned * 1000000.0 / m.rows_matched)
                AS BIGINT) AS read_amp_ppm
    FROM gscan s
    JOIN gstat g ON g.floor_rows = s.floor_rows
    JOIN matched m ON m.pred_id = s.pred_id
    ORDER BY s.floor_rows, s.pred_id
    """


def compaction_floor_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files-vs-read-amp frontier across candidate compaction
    floors (see block comment; schedule rule = compaction_planner's
    prefix sum, predicates = compacted_zone_pruning's workload)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate")
    per = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "m", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("before")
    )
    fl = spark.createDataFrame(
        [(x,) for x in _CFS_FLOORS], "floor_rows long"
    )
    grp = (
        cum.crossJoin(F.broadcast(fl))
        .groupBy(
            "floor_rows",
            F.floor(F.col("before") / F.col("floor_rows"))
            .cast("bigint")
            .alias("group_id"),
        )
        .agg(
            F.min("m").alias("g_lo"),
            (F.max("m") + F.expr("INTERVAL 1 MONTH")).alias("g_hi"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
    )
    gstat = grp.groupBy("floor_rows").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((F.col("n_rows") < F.col("floor_rows")).cast("long"))
        .cast("bigint")
        .alias("n_under_floor"),
    )
    preds = spark.createDataFrame(
        [(p, lo, hi) for p, lo, hi in _CZP_PREDS],
        "pred_id string, lo_s string, hi_s string",
    ).select(
        "pred_id",
        F.to_timestamp("lo_s").alias("lo"),
        F.to_timestamp("hi_s").alias("hi"),
    )
    matched = (
        o.crossJoin(F.broadcast(preds))
        .filter(
            (F.col("o_orderdate") >= F.col("lo"))
            & (F.col("o_orderdate") < F.col("hi"))
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    gscan = (
        grp.crossJoin(F.broadcast(preds))
        .filter((F.col("lo") < F.col("g_hi")) & (F.col("hi") > F.col("g_lo")))
        .groupBy("floor_rows", "pred_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups_scanned"),
            F.sum("n_rows").cast("bigint").alias("rows_scanned"),
        )
    )
    return (
        gscan.join(gstat, "floor_rows")
        .join(matched, "pred_id")
        .select(
            F.col("floor_rows").cast("bigint").alias("floor_rows"),
            "pred_id",
            "n_groups",
            "n_under_floor",
            "n_groups_scanned",
            "rows_scanned",
            "rows_matched",
            F.round(
                F.col("rows_scanned") * 1000000.0 / F.col("rows_matched")
            )
            .cast("bigint")
            .alias("read_amp_ppm"),
        )
        .orderBy("floor_rows", "pred_id")
    )


ROUND12_STAGED: dict[str, tuple] = {
    "compacted_zone_pruning": (compacted_zone_pruning, _CZP_ORACLE),
    "sort_key_benefit_ranking": (
        sort_key_benefit_ranking,
        _SKB_ORACLE,
    ),
    "compaction_floor_sweep": (
        compaction_floor_sweep,
        _CFS_ORACLE,
    ),
}


# ==========================================================================
# ROUND-13 STAGED (VERDICT r11 item 6; zero registry delta until the
# round-13 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Workload-weighted sort advisor (ROADMAP round-13 "Warehouse"):
# sort_key_benefit_ranking scores candidate sort keys by the UNIFORM
# mean of per-predicate zone-map prune fractions — the right call
# when nothing is known about the workload. Real query logs are never
# uniform; the advisor that matters weights each predicate by its
# observed frequency. This table re-scores the same four layouts
# under a fixed date-dominated workload mix (_WSA_WEIGHT_PCT: 55%
# date-range, 25% customer-range, 15% price-range, 5% priority
# equality — integer percents summing to 100 so the weighted sum is
# EXACT integer arithmetic before its single rounding) and reports
# both rankings side by side with a moved flag per layout.
# Pinned regime on this corpus: the weighted and uniform rankings
# DISAGREE below the top row — weighting is not a no-op (the prio
# layout's strong own-predicate score stops carrying it once the
# workload says priority queries are 5% of traffic).
# Scale posture identical to sort_key_benefit_ranking: |cands|
# window passes (each a total sort at audit scale, a per-file
# zone-map read at 100 TB), one domain-sized rollup; weights are
# compile-time constants folded into the aggregate.
# --------------------------------------------------------------------------
_WSA_WEIGHT_PCT = {
    "pr_date": 55,
    "pr_cust": 25,
    "pr_price": 15,
    "pr_prio": 5,
}
assert sum(_WSA_WEIGHT_PCT.values()) == 100

_WSA_ORACLE = f"""
    WITH stacked AS (
      {" UNION ALL ".join(
        f'''SELECT '{c}' AS sort_col,
               ROW_NUMBER() OVER (ORDER BY {c}, o_orderkey) AS rn,
               o_orderdate, o_custkey, o_totalprice, o_orderpriority
        FROM orders''' for c in _SKB_CANDS)}
    ),
    rg AS (
      SELECT sort_col, (rn - 1) // {_SKB_RG_ROWS} AS rg_id,
             {", ".join(
               f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}"
               for c in ["o_orderdate", "o_custkey", "o_totalprice",
                         "o_orderpriority"])}
      FROM stacked GROUP BY 1, 2
    ),
    per AS (
      SELECT sort_col,
             CAST(COUNT(*) AS BIGINT) AS n_row_groups,
             {", ".join(
               f'''CAST(ROUND((1.0 - count_if(
                     {_skb_overlap_sql(*_SKB_PRED_SQL[p])})
                     / CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
                   AS {p}_prune_ppm''' for p in _SKB_PRED_SQL)}
      FROM rg GROUP BY 1
    ),
    scored AS (
      SELECT *,
             CAST(ROUND(({" + ".join(f"{p}_prune_ppm"
                                     for p in _SKB_PRED_SQL)})
                        / {len(_SKB_PRED_SQL)}.0) AS BIGINT)
               AS mean_prune_ppm,
             CAST(ROUND(({" + ".join(
                 f"{_WSA_WEIGHT_PCT[p]} * {p}_prune_ppm"
                 for p in _SKB_PRED_SQL)}) / 100.0) AS BIGINT)
               AS weighted_prune_ppm
      FROM per
    ),
    ranked AS (
      SELECT sort_col, n_row_groups, mean_prune_ppm, weighted_prune_ppm,
             CAST(ROW_NUMBER() OVER (ORDER BY mean_prune_ppm DESC,
                                     sort_col) AS BIGINT) AS rank_uniform,
             CAST(ROW_NUMBER() OVER (ORDER BY weighted_prune_ppm DESC,
                                     sort_col) AS BIGINT) AS rank_weighted
      FROM scored
    )
    SELECT sort_col, n_row_groups, mean_prune_ppm, weighted_prune_ppm,
           rank_uniform, rank_weighted,
           (rank_weighted <> rank_uniform) AS rank_moved
    FROM ranked
    ORDER BY rank_weighted
    """


def workload_weighted_sort_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Candidate sort keys re-ranked under the fixed date-dominated
    predicate-frequency mix, uniform ranking alongside (see block
    comment; exact integer weighted sum, one rounding)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey", "o_totalprice",
        "o_orderpriority",
    )
    pcols = ["o_orderdate", "o_custkey", "o_totalprice", "o_orderpriority"]
    stacked = None
    for c in _SKB_CANDS:
        lay = o.select(
            F.lit(c).alias("sort_col"),
            F.row_number()
            .over(Window.orderBy(F.col(c), F.col("o_orderkey")))
            .alias("rn"),
            *pcols,
        )
        stacked = lay if stacked is None else stacked.unionByName(lay)
    rg = stacked.groupBy(
        "sort_col",
        F.floor((F.col("rn") - 1) / _SKB_RG_ROWS).alias("rg_id"),
    ).agg(
        *[
            a
            for c in pcols
            for a in (
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
            )
        ]
    )
    per = rg.groupBy("sort_col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
        *[
            F.round(
                (
                    1.0
                    - F.sum(
                        F.expr(_skb_overlap_sql(*_SKB_PRED_SQL[p])).cast(
                            "long"
                        )
                    )
                    / F.count(F.lit(1)).cast("double")
                )
                * 1000000
            )
            .cast("bigint")
            .alias(f"{p}_prune_ppm")
            for p in _SKB_PRED_SQL
        ],
    )
    scored = per.withColumn(
        "mean_prune_ppm",
        F.round(
            sum(F.col(f"{p}_prune_ppm") for p in _SKB_PRED_SQL)
            / float(len(_SKB_PRED_SQL))
        ).cast("bigint"),
    ).withColumn(
        "weighted_prune_ppm",
        F.round(
            sum(
                _WSA_WEIGHT_PCT[p] * F.col(f"{p}_prune_ppm")
                for p in _SKB_PRED_SQL
            )
            / 100.0
        ).cast("bigint"),
    )
    ranked = scored.select(
        "sort_col",
        "n_row_groups",
        "mean_prune_ppm",
        "weighted_prune_ppm",
        F.row_number()
        .over(Window.orderBy(F.col("mean_prune_ppm").desc(), "sort_col"))
        .cast("bigint")
        .alias("rank_uniform"),
        F.row_number()
        .over(
            Window.orderBy(F.col("weighted_prune_ppm").desc(), "sort_col")
        )
        .cast("bigint")
        .alias("rank_weighted"),
    )
    return ranked.select(
        "sort_col",
        "n_row_groups",
        "mean_prune_ppm",
        "weighted_prune_ppm",
        "rank_uniform",
        "rank_weighted",
        (F.col("rank_weighted") != F.col("rank_uniform")).alias(
            "rank_moved"
        ),
    ).orderBy("rank_weighted")


# --------------------------------------------------------------------------
# Compaction write amplification (round-12 original; the cost side
# compaction_floor_sweep leaves implicit): merging month parts into
# floor-sized groups REWRITES every row that lands in a multi-part
# group — the write bill a compactor pays for the small-file and
# zone-pruning benefits the sweep prices. Per candidate floor:
# parts in, groups out, merged (>= 2-part) groups, exact rows
# rewritten, write amplification, and the workload-mean read
# amplification alongside — so the full three-way frontier (file
# count down vs write amp up vs read amp up as floors grow) reads
# off one table.
# Exact math: the same prefix-sum schedule and overlap joins as
# compaction_floor_sweep; write-amp and the mean read-amp are exact
# integer ratios with one rounding each (the mean re-accumulates the
# per-predicate BIGINT ppms, module convention).
# Scale: identical posture to compaction_floor_sweep — one
# month-domain aggregation, |floors| window passes, domain-sized
# overlap joins; the write-amp side adds only a group-domain rollup.
# --------------------------------------------------------------------------
_CWA_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM per
    ),
    fl(floor_rows) AS (VALUES
      {", ".join(f"({x})" for x in _CFS_FLOORS)}),
    grp AS (
      SELECT fl.floor_rows,
             CAST(FLOOR(c.before / fl.floor_rows) AS BIGINT) AS group_id,
             MIN(c.m) AS g_lo,
             MAX(c.m) + INTERVAL 1 MONTH AS g_hi,
             CAST(SUM(c.n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM cum c CROSS JOIN fl
      GROUP BY 1, 2
    ),
    wamp AS (
      SELECT floor_rows,
             CAST(SUM(n_parts) AS BIGINT) AS n_parts_in,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(count_if(n_parts >= 2) AS BIGINT) AS n_merged_groups,
             CAST(SUM(n_rows) AS BIGINT) AS rows_total,
             CAST(SUM(CASE WHEN n_parts >= 2 THEN n_rows ELSE 0 END)
                  AS BIGINT) AS rows_rewritten
      FROM grp GROUP BY 1
    ),
    preds(pred_id, lo, hi) AS (VALUES
      {", ".join(f"('{p}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                 for p, lo, hi in _CZP_PREDS)}
    ),
    matched AS (
      SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS rows_matched
      FROM orders o CROSS JOIN preds p
      WHERE o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
      GROUP BY 1
    ),
    gscan AS (
      SELECT g.floor_rows, p.pred_id,
             CAST(SUM(g.n_rows) AS BIGINT) AS rows_scanned
      FROM grp g CROSS JOIN preds p
      WHERE p.lo < g.g_hi AND p.hi > g.g_lo
      GROUP BY 1, 2
    ),
    ramp AS (
      SELECT s.floor_rows,
             CAST(ROUND(SUM(CAST(ROUND(s.rows_scanned * 1000000.0
                                       / m.rows_matched) AS BIGINT))
                        * 1.0 / COUNT(*)) AS BIGINT)
               AS mean_read_amp_ppm
      FROM gscan s JOIN matched m ON m.pred_id = s.pred_id
      GROUP BY 1
    )
    SELECT CAST(w.floor_rows AS BIGINT) AS floor_rows,
           w.n_parts_in, w.n_groups, w.n_merged_groups,
           w.rows_total, w.rows_rewritten,
           CAST(ROUND(w.rows_rewritten * 1000000.0 / w.rows_total)
                AS BIGINT) AS write_amp_ppm,
           r.mean_read_amp_ppm
    FROM wamp w JOIN ramp r ON r.floor_rows = w.floor_rows
    ORDER BY w.floor_rows
    """


def compaction_write_amp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows rewritten (write amplification) per candidate compaction
    floor, with the workload-mean read amplification alongside (see
    block comment; same prefix-sum schedule as compaction_floor_
    sweep)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate")
    per = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "m", "n", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("before")
    )
    fl = spark.createDataFrame(
        [(x,) for x in _CFS_FLOORS], "floor_rows long"
    )
    grp = (
        cum.crossJoin(F.broadcast(fl))
        .groupBy(
            "floor_rows",
            F.floor(F.col("before") / F.col("floor_rows")).alias(
                "group_id"
            ),
        )
        .agg(
            F.min("m").alias("g_lo"),
            F.expr("MAX(m) + INTERVAL 1 MONTH").alias("g_hi"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
    )
    wamp = grp.groupBy("floor_rows").agg(
        F.sum("n_parts").cast("bigint").alias("n_parts_in"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((F.col("n_parts") >= 2).cast("long"))
        .cast("bigint")
        .alias("n_merged_groups"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("n_parts") >= 2, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_rewritten"),
    )
    preds = spark.createDataFrame(
        [(p, lo, hi) for p, lo, hi in _CZP_PREDS],
        "pred_id string, lo string, hi string",
    ).select(
        "pred_id",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    matched = (
        o.crossJoin(F.broadcast(preds))
        .filter(
            (F.col("o_orderdate") >= F.col("lo"))
            & (F.col("o_orderdate") < F.col("hi"))
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    gscan = (
        grp.crossJoin(F.broadcast(preds))
        .filter((F.col("lo") < F.col("g_hi")) & (F.col("hi") > F.col("g_lo")))
        .groupBy("floor_rows", "pred_id")
        .agg(F.sum("n_rows").cast("bigint").alias("rows_scanned"))
    )
    ramp = (
        gscan.join(matched, "pred_id")
        .select(
            "floor_rows",
            F.round(
                F.col("rows_scanned") * 1000000.0 / F.col("rows_matched")
            )
            .cast("bigint")
            .alias("ra_ppm"),
        )
        .groupBy("floor_rows")
        .agg(
            F.round(F.sum("ra_ppm") * 1.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_read_amp_ppm")
        )
    )
    return (
        wamp.join(ramp, "floor_rows")
        .select(
            F.col("floor_rows").cast("bigint").alias("floor_rows"),
            "n_parts_in",
            "n_groups",
            "n_merged_groups",
            "rows_total",
            "rows_rewritten",
            F.round(
                F.col("rows_rewritten") * 1000000.0 / F.col("rows_total")
            )
            .cast("bigint")
            .alias("write_amp_ppm"),
            "mean_read_amp_ppm",
        )
        .orderBy("floor_rows")
    )


ROUND13_STAGED: dict[str, tuple] = {
    "workload_weighted_sort_advisor": (
        workload_weighted_sort_advisor,
        _WSA_ORACLE,
    ),
    "compaction_write_amp": (compaction_write_amp, _CWA_ORACLE),
}


# ==========================================================================
# ROUND-14 STAGED (ROADMAP §"Round 14+"; zero registry delta until the
# round-14 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Compaction schedule amortizer (ROADMAP round-14 "Warehouse"):
# compaction_write_amp prices the END-STATE rewrite bill per floor;
# this op prices the SCHEDULE — month parts arrive in order and the
# compactor chooses WHEN to merge, which moves both the write bill
# and how long small files linger. Three schedules per floor, all on
# the same prefix-sum group layout:
#   eager    — merge-on-arrival: every part lands in its group's open
#              file immediately (part i >= 2 of a group rewrites the
#              accumulated prefix including itself); live files after
#              any arrival = closed groups + the one open file.
#   on_close — compact a group once, the moment it closes: rewrite =
#              multi-part groups' rows once (compaction_write_amp's
#              number); live files = closed groups (1 file each) +
#              open group's loose parts.
#   at_end   — one compaction after the last arrival: same rewrite
#              bill as on_close but every part stays loose for the
#              whole stream (live files after arrival t = t).
# Reported per (floor, policy): ingested rows, rewritten rows, write
# amp, and the OPERATING cost the end-state view hides — mean live
# files across the T monthly observation points (measured just after
# each arrival and any compaction it triggers, x1000) and the max.
# Pinned shape: rewritten(eager) >= rewritten(on_close) =
# rewritten(at_end); mean_live(eager) <= mean_live(on_close) <=
# mean_live(at_end) — the write-bill / file-count trade read as a
# schedule, not a floor.
# Exact math: all integer sums over the month domain; the two ppm/e3
# roundings are the only doubles (module convention).
# Scale: everything after the one month-domain aggregation is
# domain-sized (|months| x |floors| rows); the policy unpivot is a
# 3-way union of one-row-per-floor aggregates.
# --------------------------------------------------------------------------
_CSA_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before,
             ROW_NUMBER() OVER (ORDER BY m) AS t
      FROM per
    ),
    fl(floor_rows) AS (VALUES
      {", ".join(f"({x})" for x in _CFS_FLOORS)}),
    sched AS (
      SELECT fl.floor_rows, c.t, c.n,
             CAST(FLOOR(c.before / fl.floor_rows) AS BIGINT) AS gid,
             ROW_NUMBER() OVER (
               PARTITION BY fl.floor_rows,
                            FLOOR(c.before / fl.floor_rows)
               ORDER BY c.m) AS pidx,
             SUM(c.n) OVER (
               PARTITION BY fl.floor_rows,
                            FLOOR(c.before / fl.floor_rows)
               ORDER BY c.m ROWS UNBOUNDED PRECEDING) AS pfx
      FROM cum c CROSS JOIN fl
    ),
    base AS (
      SELECT floor_rows,
             CAST(MAX(t) AS BIGINT) AS n_months,
             CAST(SUM(n) AS BIGINT) AS rows_ingested,
             CAST(SUM(CASE WHEN pidx >= 2 THEN pfx ELSE 0 END)
                  AS BIGINT) AS eager_rw,
             CAST(SUM(gid + 1) AS BIGINT) AS ls_eager,
             CAST(MAX(gid + 1) AS BIGINT) AS lm_eager,
             CAST(SUM(gid + pidx) AS BIGINT) AS ls_close,
             CAST(MAX(gid + pidx) AS BIGINT) AS lm_close,
             CAST(SUM(t) AS BIGINT) AS ls_end,
             CAST(MAX(t) AS BIGINT) AS lm_end
      FROM sched GROUP BY 1
    ),
    closed AS (
      SELECT floor_rows,
             CAST(SUM(CASE WHEN n_parts >= 2 THEN n_rows ELSE 0 END)
                  AS BIGINT) AS close_rw
      FROM (
        SELECT floor_rows, gid, SUM(n) AS n_rows,
               COUNT(*) AS n_parts
        FROM sched GROUP BY 1, 2
      ) GROUP BY 1
    ),
    pol AS (
      SELECT b.floor_rows, 'eager' AS policy, b.rows_ingested,
             b.eager_rw AS rows_rewritten, b.n_months,
             b.ls_eager AS live_sum, b.lm_eager AS max_live_files
      FROM base b
      UNION ALL
      SELECT b.floor_rows, 'on_close', b.rows_ingested, c.close_rw,
             b.n_months, b.ls_close, b.lm_close
      FROM base b JOIN closed c ON c.floor_rows = b.floor_rows
      UNION ALL
      SELECT b.floor_rows, 'at_end', b.rows_ingested, c.close_rw,
             b.n_months, b.ls_end, b.lm_end
      FROM base b JOIN closed c ON c.floor_rows = b.floor_rows
    )
    SELECT CAST(floor_rows AS BIGINT) AS floor_rows, policy,
           rows_ingested, rows_rewritten,
           CAST(ROUND(rows_rewritten * 1000000.0 / rows_ingested)
                AS BIGINT) AS write_amp_ppm,
           CAST(ROUND(live_sum * 1000.0 / n_months) AS BIGINT)
             AS mean_live_files_e3,
           max_live_files
    FROM pol
    ORDER BY floor_rows, policy
    """


def compaction_schedule_amortizer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write bill and small-file lifetime per (compaction floor,
    schedule policy) under in-order month-part arrivals: eager
    merge-on-arrival vs compact-on-group-close vs once-at-end (see
    block comment)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate")
    per = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wb = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "m",
        "n",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("before"),
        F.row_number().over(Window.orderBy("m")).alias("t"),
    )
    fl = spark.createDataFrame(
        [(x,) for x in _CFS_FLOORS], "floor_rows long"
    )
    wg = Window.partitionBy("floor_rows", "gid").orderBy("m")
    sched = (
        cum.crossJoin(F.broadcast(fl))
        .withColumn(
            "gid", F.floor(F.col("before") / F.col("floor_rows"))
        )
        .withColumn("pidx", F.row_number().over(wg))
        .withColumn(
            "pfx",
            F.sum("n").over(
                wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    base = sched.groupBy("floor_rows").agg(
        F.max("t").cast("bigint").alias("n_months"),
        F.sum("n").cast("bigint").alias("rows_ingested"),
        F.sum(F.when(F.col("pidx") >= 2, F.col("pfx")).otherwise(0))
        .cast("bigint")
        .alias("eager_rw"),
        F.sum(F.col("gid") + 1).cast("bigint").alias("ls_eager"),
        F.max(F.col("gid") + 1).cast("bigint").alias("lm_eager"),
        F.sum(F.col("gid") + F.col("pidx")).cast("bigint").alias("ls_close"),
        F.max(F.col("gid") + F.col("pidx")).cast("bigint").alias("lm_close"),
        F.sum("t").cast("bigint").alias("ls_end"),
        F.max("t").cast("bigint").alias("lm_end"),
    )
    closed = (
        sched.groupBy("floor_rows", "gid")
        .agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .groupBy("floor_rows")
        .agg(
            F.sum(
                F.when(F.col("n_parts") >= 2, F.col("n_rows")).otherwise(0)
            )
            .cast("bigint")
            .alias("close_rw")
        )
    )
    bc = base.join(closed, "floor_rows")
    pol = (
        bc.select(
            "floor_rows",
            F.lit("eager").alias("policy"),
            "rows_ingested",
            F.col("eager_rw").alias("rows_rewritten"),
            "n_months",
            F.col("ls_eager").alias("live_sum"),
            F.col("lm_eager").alias("max_live_files"),
        )
        .unionByName(
            bc.select(
                "floor_rows",
                F.lit("on_close").alias("policy"),
                "rows_ingested",
                F.col("close_rw").alias("rows_rewritten"),
                "n_months",
                F.col("ls_close").alias("live_sum"),
                F.col("lm_close").alias("max_live_files"),
            )
        )
        .unionByName(
            bc.select(
                "floor_rows",
                F.lit("at_end").alias("policy"),
                "rows_ingested",
                F.col("close_rw").alias("rows_rewritten"),
                "n_months",
                F.col("ls_end").alias("live_sum"),
                F.col("lm_end").alias("max_live_files"),
            )
        )
    )
    return pol.select(
        F.col("floor_rows").cast("bigint").alias("floor_rows"),
        "policy",
        "rows_ingested",
        "rows_rewritten",
        F.round(F.col("rows_rewritten") * 1000000.0 / F.col("rows_ingested"))
        .cast("bigint")
        .alias("write_amp_ppm"),
        F.round(F.col("live_sum") * 1000.0 / F.col("n_months"))
        .cast("bigint")
        .alias("mean_live_files_e3"),
        "max_live_files",
    ).orderBy("floor_rows", "policy")


ROUND14_STAGED: dict[str, tuple] = {
    "compaction_schedule_amortizer": (
        compaction_schedule_amortizer,
        _CSA_ORACLE,
    ),
}


# --------------------------------------------------------------------------
# Compaction schedule read-bill (round-15 queue item, pulled
# forward): compaction_schedule_amortizer prices live FILE COUNT per
# schedule; this op prices what those interim layouts actually COST
# the workload — after every arrival (and any compaction it
# triggers), the _CZP_PREDS workload runs against the current
# layout, and a file is scanned iff its month-range overlaps the
# predicate. Per (floor, policy): observation count, total rows
# scanned across all (arrival, predicate) points, total rows matched
# (policy-independent — the data is the data), the stream read
# amplification, and the mean scan per observation. Read with the
# amortizer's write bill, the schedule triple is fully priced:
# eager buys the lowest read amp with rewrites, at_end the opposite,
# on_close between.
# Layout per policy at observation t (the amortizer's convention):
# at_end = every arrived part loose; on_close = closed groups merged
# (full-range files) + open-group parts loose; eager = closed groups
# merged + ONE open file spanning [group_lo, month(t) + 1 mo) with
# the accumulated prefix rows.
# Exact math: all integer row sums over the month domain; the two
# final roundings are the only doubles.
# Scale: obs x parts / obs x groups joins are month-domain-sized
# (T^2/2 x |preds| x |floors| ~ 40k rows at any data scale — the
# fact table is touched once for the month rollup and once for the
# per-(month, pred) matched counts).
# --------------------------------------------------------------------------
_CRB_ORACLE = f"""
    WITH per AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT m, n,
             COALESCE(SUM(n) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before,
             ROW_NUMBER() OVER (ORDER BY m) AS t
      FROM per
    ),
    fl(floor_rows) AS (VALUES
      {", ".join(f"({x})" for x in _CFS_FLOORS)}),
    sched AS (
      SELECT fl.floor_rows, c.t, c.m, c.n,
             CAST(FLOOR(c.before / fl.floor_rows) AS BIGINT) AS gid,
             SUM(c.n) OVER (
               PARTITION BY fl.floor_rows,
                            FLOOR(c.before / fl.floor_rows)
               ORDER BY c.m ROWS UNBOUNDED PRECEDING) AS pfx
      FROM cum c CROSS JOIN fl
    ),
    grp AS (
      SELECT floor_rows, gid, MIN(m) AS g_lo,
             MAX(m) + INTERVAL 1 MONTH AS g_hi,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM sched GROUP BY 1, 2
    ),
    preds(pred_id, lo, hi) AS (VALUES
      {", ".join(f"('{p}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                 for p, lo, hi in _CZP_PREDS)}
    ),
    mm AS (
      SELECT p.pred_id, date_trunc('month', o.o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS rows_in
      FROM orders o JOIN preds p
        ON o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
      GROUP BY 1, 2
    ),
    loose_end AS (
      SELECT o.floor_rows, CAST(SUM(p.n) AS BIGINT) AS sc
      FROM sched o
      JOIN sched p ON p.floor_rows = o.floor_rows AND p.t <= o.t
      JOIN preds pr ON pr.lo < p.m + INTERVAL 1 MONTH AND pr.hi > p.m
      GROUP BY 1
    ),
    loose_open AS (
      SELECT o.floor_rows, CAST(SUM(p.n) AS BIGINT) AS sc
      FROM sched o
      JOIN sched p ON p.floor_rows = o.floor_rows AND p.t <= o.t
                  AND p.gid = o.gid
      JOIN preds pr ON pr.lo < p.m + INTERVAL 1 MONTH AND pr.hi > p.m
      GROUP BY 1
    ),
    merged AS (
      SELECT o.floor_rows, CAST(SUM(g.n_rows) AS BIGINT) AS sc
      FROM sched o
      JOIN grp g ON g.floor_rows = o.floor_rows AND g.gid < o.gid
      JOIN preds pr ON pr.lo < g.g_hi AND pr.hi > g.g_lo
      GROUP BY 1
    ),
    eopen AS (
      SELECT o.floor_rows, CAST(SUM(o.pfx) AS BIGINT) AS sc
      FROM sched o
      JOIN grp g ON g.floor_rows = o.floor_rows AND g.gid = o.gid
      JOIN preds pr ON pr.lo < o.m + INTERVAL 1 MONTH AND pr.hi > g.g_lo
      GROUP BY 1
    ),
    matched AS (
      SELECT o.floor_rows, CAST(SUM(mm.rows_in) AS BIGINT) AS mt,
             CAST(MAX(o.t) AS BIGINT) AS n_obs
      FROM sched o
      JOIN sched p ON p.floor_rows = o.floor_rows AND p.t <= o.t
      JOIN mm ON mm.m = p.m
      GROUP BY 1
    ),
    pol AS (
      SELECT m.floor_rows, 'at_end' AS policy, m.n_obs,
             COALESCE(le.sc, 0) AS scanned, m.mt
      FROM matched m
      LEFT JOIN loose_end le ON le.floor_rows = m.floor_rows
      UNION ALL
      SELECT m.floor_rows, 'on_close', m.n_obs,
             COALESCE(mg.sc, 0) + COALESCE(lo.sc, 0), m.mt
      FROM matched m
      LEFT JOIN merged mg ON mg.floor_rows = m.floor_rows
      LEFT JOIN loose_open lo ON lo.floor_rows = m.floor_rows
      UNION ALL
      SELECT m.floor_rows, 'eager', m.n_obs,
             COALESCE(mg.sc, 0) + COALESCE(eo.sc, 0), m.mt
      FROM matched m
      LEFT JOIN merged mg ON mg.floor_rows = m.floor_rows
      LEFT JOIN eopen eo ON eo.floor_rows = m.floor_rows
    )
    SELECT CAST(floor_rows AS BIGINT) AS floor_rows, policy, n_obs,
           scanned AS rows_scanned_total,
           mt AS rows_matched_total,
           CAST(ROUND(scanned * 1000000.0 / mt) AS BIGINT)
             AS read_amp_ppm,
           CAST(ROUND(scanned * 1.0 / n_obs) AS BIGINT)
             AS mean_scan_per_obs
    FROM pol
    ORDER BY floor_rows, policy
    """


def compaction_read_bill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream read amplification per (compaction floor, schedule
    policy): the workload re-run against every interim layout the
    schedule leaves behind (see block comment)."""
    o = _t(spark, sf_dir, "orders").select("o_orderdate")
    per = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wb = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "m",
        "n",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("before"),
        F.row_number().over(Window.orderBy("m")).alias("t"),
    )
    fl = spark.createDataFrame(
        [(x,) for x in _CFS_FLOORS], "floor_rows long"
    )
    wg = Window.partitionBy("floor_rows", "gid").orderBy("m")
    sched = (
        cum.crossJoin(F.broadcast(fl))
        .withColumn("gid", F.floor(F.col("before") / F.col("floor_rows")))
        .withColumn(
            "pfx",
            F.sum("n").over(
                wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("floor_rows", "t", "m", "n", "gid", "pfx")
    )
    grp = sched.groupBy("floor_rows", "gid").agg(
        F.min("m").alias("g_lo"),
        F.expr("MAX(m) + INTERVAL 1 MONTH").alias("g_hi"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        [(p, lo, hi) for p, lo, hi in _CZP_PREDS],
        "pred_id string, lo string, hi string",
    ).select(
        "pred_id",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    mm = (
        o.crossJoin(F.broadcast(preds))
        .filter(
            (F.col("o_orderdate") >= F.col("lo"))
            & (F.col("o_orderdate") < F.col("hi"))
        )
        .groupBy("pred_id", F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_in"))
    )
    obs = sched.select(
        "floor_rows",
        F.col("t").alias("o_t"),
        F.col("m").alias("o_m"),
        F.col("gid").alias("o_gid"),
        F.col("pfx").alias("o_pfx"),
    )
    p_end = F.expr("m + INTERVAL 1 MONTH")
    loose_end = (
        obs.join(sched, "floor_rows")
        .filter(F.col("t") <= F.col("o_t"))
        .join(
            F.broadcast(preds),
            (F.col("lo") < p_end) & (F.col("hi") > F.col("m")),
        )
        .groupBy("floor_rows")
        .agg(F.sum("n").cast("bigint").alias("sc_end"))
    )
    loose_open = (
        obs.join(sched, "floor_rows")
        .filter((F.col("t") <= F.col("o_t")) & (F.col("gid") == F.col("o_gid")))
        .join(
            F.broadcast(preds),
            (F.col("lo") < p_end) & (F.col("hi") > F.col("m")),
        )
        .groupBy("floor_rows")
        .agg(F.sum("n").cast("bigint").alias("sc_open"))
    )
    merged = (
        obs.join(grp, "floor_rows")
        .filter(F.col("gid") < F.col("o_gid"))
        .join(
            F.broadcast(preds),
            (F.col("lo") < F.col("g_hi")) & (F.col("hi") > F.col("g_lo")),
        )
        .groupBy("floor_rows")
        .agg(F.sum("n_rows").cast("bigint").alias("sc_merged"))
    )
    o_end = F.expr("o_m + INTERVAL 1 MONTH")
    eopen = (
        obs.join(grp, "floor_rows")
        .filter(F.col("gid") == F.col("o_gid"))
        .join(
            F.broadcast(preds),
            (F.col("lo") < o_end) & (F.col("hi") > F.col("g_lo")),
        )
        .groupBy("floor_rows")
        .agg(F.sum("o_pfx").cast("bigint").alias("sc_eopen"))
    )
    matched = (
        obs.join(sched, "floor_rows")
        .filter(F.col("t") <= F.col("o_t"))
        .join(mm, "m")
        .groupBy("floor_rows")
        .agg(
            F.sum("rows_in").cast("bigint").alias("mt"),
            F.max("o_t").cast("bigint").alias("n_obs"),
        )
    )
    base = (
        matched.join(loose_end, "floor_rows", "left")
        .join(loose_open, "floor_rows", "left")
        .join(merged, "floor_rows", "left")
        .join(eopen, "floor_rows", "left")
        .select(
            "floor_rows",
            "n_obs",
            "mt",
            F.coalesce("sc_end", F.lit(0)).alias("sc_end"),
            F.coalesce("sc_open", F.lit(0)).alias("sc_open"),
            F.coalesce("sc_merged", F.lit(0)).alias("sc_merged"),
            F.coalesce("sc_eopen", F.lit(0)).alias("sc_eopen"),
        )
    )
    pol = (
        base.select(
            "floor_rows",
            F.lit("at_end").alias("policy"),
            "n_obs",
            F.col("sc_end").alias("scanned"),
            "mt",
        )
        .unionByName(
            base.select(
                "floor_rows",
                F.lit("on_close").alias("policy"),
                "n_obs",
                (F.col("sc_merged") + F.col("sc_open")).alias("scanned"),
                "mt",
            )
        )
        .unionByName(
            base.select(
                "floor_rows",
                F.lit("eager").alias("policy"),
                "n_obs",
                (F.col("sc_merged") + F.col("sc_eopen")).alias("scanned"),
                "mt",
            )
        )
    )
    return pol.select(
        F.col("floor_rows").cast("bigint").alias("floor_rows"),
        "policy",
        "n_obs",
        F.col("scanned").alias("rows_scanned_total"),
        F.col("mt").alias("rows_matched_total"),
        F.round(F.col("scanned") * 1000000.0 / F.col("mt"))
        .cast("bigint")
        .alias("read_amp_ppm"),
        F.round(F.col("scanned") * 1.0 / F.col("n_obs"))
        .cast("bigint")
        .alias("mean_scan_per_obs"),
    ).orderBy("floor_rows", "policy")


ROUND14_STAGED["compaction_read_bill"] = (
    compaction_read_bill,
    _CRB_ORACLE,
)


# --------------------------------------------------------------------------
# Compaction policy pareto face (round-15 queue item, pulled
# forward): the amortizer prices (write amp, live files) and the
# read bill prices read amp — a compaction owner tunes against all
# three AT ONCE, and the only rows that matter are the undominated
# ones. This table joins the two schedules' metrics per (floor,
# policy) and flags dominance across the full 9-row candidate set:
# a row is dominated iff some other row is <= on write_amp_ppm,
# mean_live_files_e3 AND read_amp_ppm with at least one strict <.
# n_dominators counts them (0 = on the pareto face). The face is
# SCALE-DEPENDENT — the finding the staged test pins: at sf0.001
# (small months, merging common) at_end sits ON the face via the
# zone-pruning inversion; at sf0.01 (months large vs every floor,
# merging rare) at_end is DOMINATED at every floor because eager@200
# matches its write and read bills while holding fewer live files.
# eager stays on the face at every scale via the live-files axis.
# The actionable reading: a compaction face tuned at one corpus
# scale does not transfer — re-run the table, don't port the verdict.
# Exact math: a pure self-join over 9 integer rows; no new rounding.
# Scale: both parents' plans + one domain-sized self-join.
# --------------------------------------------------------------------------
_CPP_ORACLE = f"""
    WITH amort AS ({_CSA_ORACLE.strip()}),
    rb AS ({_CRB_ORACLE.strip()}),
    m AS (
      SELECT a.floor_rows, a.policy, a.write_amp_ppm,
             a.mean_live_files_e3, r.read_amp_ppm
      FROM amort a
      JOIN rb r ON r.floor_rows = a.floor_rows
               AND r.policy = a.policy
    )
    SELECT m.floor_rows, m.policy, m.write_amp_ppm,
           m.mean_live_files_e3, m.read_amp_ppm,
           CAST((SELECT COUNT(*) FROM m o
                 WHERE o.write_amp_ppm <= m.write_amp_ppm
                   AND o.mean_live_files_e3 <= m.mean_live_files_e3
                   AND o.read_amp_ppm <= m.read_amp_ppm
                   AND (o.write_amp_ppm < m.write_amp_ppm
                        OR o.mean_live_files_e3 < m.mean_live_files_e3
                        OR o.read_amp_ppm < m.read_amp_ppm))
                AS BIGINT) AS n_dominators,
           (SELECT COUNT(*) FROM m o
            WHERE o.write_amp_ppm <= m.write_amp_ppm
              AND o.mean_live_files_e3 <= m.mean_live_files_e3
              AND o.read_amp_ppm <= m.read_amp_ppm
              AND (o.write_amp_ppm < m.write_amp_ppm
                   OR o.mean_live_files_e3 < m.mean_live_files_e3
                   OR o.read_amp_ppm < m.read_amp_ppm)) > 0
             AS dominated
    FROM m
    ORDER BY m.floor_rows, m.policy
    """


def compaction_policy_pareto(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The (floor, policy) grid scored on all three compaction axes
    with pareto-dominance flags (see block comment; composes the
    amortizer and the read bill)."""
    a = compaction_schedule_amortizer(spark, sf_dir).select(
        "floor_rows", "policy", "write_amp_ppm", "mean_live_files_e3"
    )
    r = compaction_read_bill(spark, sf_dir).select(
        "floor_rows", "policy", "read_amp_ppm"
    )
    m = a.join(r, ["floor_rows", "policy"])
    o = m.select(
        F.col("write_amp_ppm").alias("o_w"),
        F.col("mean_live_files_e3").alias("o_l"),
        F.col("read_amp_ppm").alias("o_r"),
    )
    dom = (
        m.join(
            F.broadcast(o),
            (F.col("o_w") <= F.col("write_amp_ppm"))
            & (F.col("o_l") <= F.col("mean_live_files_e3"))
            & (F.col("o_r") <= F.col("read_amp_ppm"))
            & (
                (F.col("o_w") < F.col("write_amp_ppm"))
                | (F.col("o_l") < F.col("mean_live_files_e3"))
                | (F.col("o_r") < F.col("read_amp_ppm"))
            ),
            "left",
        )
        .groupBy(
            "floor_rows",
            "policy",
            "write_amp_ppm",
            "mean_live_files_e3",
            "read_amp_ppm",
        )
        .agg(
            F.sum(F.when(F.col("o_w").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dominators")
        )
    )
    return dom.select(
        "floor_rows",
        "policy",
        "write_amp_ppm",
        "mean_live_files_e3",
        "read_amp_ppm",
        "n_dominators",
        (F.col("n_dominators") > 0).alias("dominated"),
    ).orderBy("floor_rows", "policy")


ROUND14_STAGED["compaction_policy_pareto"] = (
    compaction_policy_pareto,
    _CPP_ORACLE,
)
