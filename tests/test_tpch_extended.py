"""Differential + property tests for the extended TPC-H-shaped suite
(Q7/Q15/Q16/Q17/Q18/Q19/Q22 adaptations) and the corpus-level
training-data ops (chunk dedup, n-gram decontamination)."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()

NEW_QUERIES = [
    # round-3 completions: the remaining TPC-H shapes (fixture-adapted)
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_priority_mix",
    "q13_customer_distribution",
    "q20_heavy_suppliers",
    "q21_waiting_suppliers",
    "q7_nation_volume",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q4_priority_checks",
    "chunk_dedup_corpus",
    "decontaminate_ngram",
    "lm_surprisal_score",
    "embedding_label_centroids",
    "semdedup_resolve",
    "knn_lsh_multiprobe",
    "kmeans_step",
    "knn_ivf_kmeans",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_match(spark, duck, name):
    df = REGISTRY[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_q18_orders_exceed_threshold(spark):
    """Every returned order really aggregates > 300 quantity."""
    rows = REGISTRY["q18_large_orders"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.total_qty > 300


def test_q15_returns_the_max(spark, duck):
    """The supplier(s) reported must carry the maximum quarterly
    revenue — and every supplier at that revenue must be reported."""
    rows = REGISTRY["q15_top_supplier"](spark, SF_DIR).collect()
    assert rows
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1


def test_chunk_dedup_keeps_each_chunk_once(spark):
    """Defining property: across the whole corpus, each distinct chunk
    value survives exactly once, and a doc's kept count never exceeds
    its total."""
    rows = REGISTRY["chunk_dedup_corpus"](spark, SF_DIR).collect()
    seen: set[str] = set()
    for r in rows:
        assert 0 <= r.kept_chunks <= r.total_chunks
    # re-derive kept chunks from the reconstruction: kept text of a doc
    # is the ' '-join of 10-word chunks, so re-chunk it
    for r in rows:
        words = r.text_dedup.split(" ") if r.text_dedup else []
        chunks = [
            " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
        ]
        # NOTE: reconstruction concatenates *surviving* chunks, so
        # re-chunking at 10-word boundaries only aligns when every
        # chunk is full-width; guard on that case.
        full = [c for c in chunks if len(c.split(" ")) == 10]
        for c in full:
            assert c not in seen, c
            seen.add(c)


def test_decontaminate_flags_are_genuine(spark, duck):
    """Every contaminated doc shares >= 1 exact 4-gram with the eval
    slice; every clean doc shares none (recomputed in pure Python)."""
    docs = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())

    def grams(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 4]) for i in range(len(w) - 3)}

    eval_grams = set()
    for doc_id, text in docs.items():
        if doc_id % 20 == 0:
            eval_grams |= grams(text)
    rows = REGISTRY["decontaminate_ngram"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        shared = grams(docs[r.doc_id]) & eval_grams
        assert r.contaminated == bool(shared), r.doc_id
        assert r.shared_grams == len(shared), r.doc_id


def test_q16_filter_pushed_to_part_scan(spark):
    """Brand exclusion + size IN-list must reach the part scan."""
    plan = (
        REGISTRY["q16_supplier_part_counts"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "p_size" in plan


def test_simhash_survives_8x_duplication(spark, tmp_path):
    """Degenerate-cluster stress: 8 exact copies of every doc (shifted
    ids). Exact-copy replicas share identical signatures, so the
    expected pair count follows a closed form: every original pair
    appears 8*8 times, and every doc contributes C(8,2)=28
    hamming-0 copy pairs. Verifies the bucket kernel's cross-chunk
    uniqueness holds under giant identical-sig clusters (the case that
    made the HOF pair expansion quadratic)."""
    from pyspark.sql import functions as F

    from bigdataentrytask_spark.catalog import load_table
    from bigdataentrytask_spark.operators import REGISTRY

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(8)
    ]
    d8 = copies[0]
    for c in copies[1:]:
        d8 = d8.union(c)
    d8.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    base_pairs = REGISTRY["simhash_pairs"](spark, SF_DIR).count()
    got = REGISTRY["simhash_pairs"](spark, str(tmp_path)).count()
    assert got == 64 * base_pairs + 28 * n_docs


def test_neardup_pairs_survive_8x_duplication(spark, tmp_path):
    """Same closed-form replication identity for the exact embedding
    near-dup tiles — and a regression guard for the cogroup
    attribute-dedup bug where the B side's payload columns vanished at
    multi-partition layouts."""
    from pyspark.sql import functions as F

    from bigdataentrytask_spark.catalog import load_table
    from bigdataentrytask_spark.operators import REGISTRY

    emb = load_table(spark, SF_DIR, "embeddings")
    n_vecs = emb.count()
    copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(8)
    ]
    e8 = copies[0]
    for c in copies[1:]:
        e8 = e8.union(c)
    e8.repartition(16).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )

    base_pairs = REGISTRY["embedding_neardup_pairs"](spark, SF_DIR).count()
    got = REGISTRY["embedding_neardup_pairs"](spark, str(tmp_path)).count()
    assert got == 64 * base_pairs + 28 * n_vecs


def test_multiprobe_recall_dominates_single_probe(spark):
    """Probing one-bit-flip buckets must retrieve a superset-or-equal
    recall of the true top-k (multi-probe candidates contain every
    single-probe candidate by construction)."""
    from bigdataentrytask_spark.operators import REGISTRY

    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"](spark, SF_DIR).collect()
    }
    sp = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_lsh"](spark, SF_DIR).collect()
    }
    mp = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_lsh_multiprobe"](spark, SF_DIR).collect()
    }
    assert len(mp & bf) >= len(sp & bf)
    assert len(mp & bf) / len(bf) >= 0.8  # measured 0.90 vs 0.44 single


def test_q13_distribution_covers_every_customer(spark):
    """The histogram partitions ALL customers (left join keeps the
    zero-order bucket)."""
    rows = REGISTRY["q13_customer_distribution"](spark, SF_DIR).collect()
    import duckdb

    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'"
    ).fetchone()[0]
    assert sum(r.custdist for r in rows) == total


def test_q2_rows_carry_the_part_minimum(spark):
    """Every emitted (part, supplier) offer equals that part's minimum
    regional unit price — no near-miss floats."""
    rows = REGISTRY["q2_min_cost_supplier"](spark, SF_DIR).collect()
    assert rows
    best: dict[int, float] = {}
    for r in rows:
        best.setdefault(r.p_partkey, r.unit_price_x1e4)
        assert r.unit_price_x1e4 == best[r.p_partkey]


def test_q20_threshold_yields_signal(spark):
    """The heavy-supplier cut must select a non-empty, strict subset of
    the nation's suppliers at differential scale (0 rows would make the
    oracle comparison vacuous)."""
    rows = REGISTRY["q20_heavy_suppliers"](spark, SF_DIR).collect()
    assert 0 < len(rows) < 40


def test_q6_whole_predicate_reaches_parquet_scan(spark):
    """The Q6 litmus: all three range predicates must be pushed to the
    lineitem scan (PushedFilters on shipdate, discount, quantity) and
    the plan must contain no join."""
    df = REGISTRY["q6_forecast_revenue"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters", 1)[1][:400], col
    assert "Join" not in plan


def test_q21_aggregates_before_windowing(spark):
    """The q21 rewrite's contract: lineitem is reduced to one row per
    (order, supplier) BEFORE the per-order window — the plan must show
    a partial aggregate upstream of the Window operator and no
    self-join of lineitem."""
    df = REGISTRY["q21_waiting_suppliers"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the only tables scanned are lineitem/orders/supplier — lineitem
    # is never self-joined (the AQE dump repeats scans per stage, so
    # count distinct relations, not occurrences)
    import re

    rels = set(re.findall(r"FileScan parquet \[[^\]]*\]", plan))
    assert len(rels) <= 3, rels
    assert "partial_sum" in plan  # pre-aggregation feeds the window
