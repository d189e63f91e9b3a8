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
    # i<j pairs directly via an index-sliced transform: k(k-1)/2 structs
    # per basket instead of the k^2-then-filter form — half the struct
    # garbage per row, which matters less for the mean than for the
    # variance (the k^2 form showed 2-10s GC outliers across bench runs
    # at sf0.1; this form holds a tight ~1.5s spread).
    pairs_col = F.flatten(
        F.expr(
            "transform(array_sort(parts), (x, i) ->"
            " transform(slice(array_sort(parts), i + 2, size(parts)),"
            "           y -> struct(x AS p1, y AS p2)))"
        )
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


