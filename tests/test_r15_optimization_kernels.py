"""Focused tests for the round-15 optimization pass: internals that
changed (kernel shapes, candidate generation, lane coarsening) while
the operator outputs must stay bit-identical.

The oracle differentials in test_northstar.py prove end-to-end
equality; these tests pin the INVARIANTS each rewrite relies on, so a
future edit that breaks one fails here with a named property instead
of as an opaque hash mismatch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataentrytask_spark.functions.text import NUM_HASHES
from bigdataentrytask_spark.operators import REGISTRY, load_all
from bigdataentrytask_spark.operators.dedup import (
    _kernel_lanes,
    _minhash_lane_kernel,
    _ROWS_PER_BAND,
)

from .conftest import SF_DIR

load_all()


# ---------------------------------------------------------------------------
# minhash lane kernel: the cogroup -> side-tagged-lane rewrite (r15),
# operating on DISTINCT signatures with member expansion since r16
# ---------------------------------------------------------------------------
def _lane_pdf(rows):
    """rows: (bkey, band, doc_id, ti, tj, side, sig[32]) — singleton
    signature groups (rep = doc_id, members = [doc_id]), the exact
    shape every non-duplicated doc has, or
    (bkey, band, rep, ti, tj, side, sig[32], members) for a
    multi-member signature group."""
    rec = {
        "bkey": [r[0] for r in rows],
        "band": [r[1] for r in rows],
        "rep": [r[2] for r in rows],
        "ti": [r[3] for r in rows],
        "tj": [r[4] for r in rows],
        "side": [r[5] for r in rows],
    }
    for i in range(NUM_HASHES):
        rec[f"m{i}"] = [r[6][i] for r in rows]
    rec["members"] = [
        np.asarray(r[7] if len(r) > 7 else [r[2]], dtype=np.int64) for r in rows
    ]
    return pd.DataFrame(rec)


def _sig(seed, flips=()):
    s = [(seed * 31 + i) % 1000 for i in range(NUM_HASHES)]
    for pos in flips:
        s[pos] += 10_000
    return s


def test_minhash_kernel_diagonal_tile_emits_i_lt_j_once():
    """Diagonal tile (side 0): every qualifying pair exactly once,
    ordered doc_a < doc_b, with the exact match count."""
    sig = _sig(1)
    pdf = _lane_pdf(
        [("0:k", 0, 7, 0, 0, 0, sig), ("0:k", 0, 3, 0, 0, 0, sig)]
    )
    out = _minhash_lane_kernel(23)(pdf)
    assert out.to_dict("records") == [
        {"doc_a": 3, "doc_b": 7, "cnt": NUM_HASHES}
    ]


def test_minhash_kernel_offdiag_uses_sides_and_skips_one_sided():
    """Off-diagonal tile: side-1 rows compare against side-2 rows only;
    a tile missing one side emits nothing."""
    sig = _sig(2)
    both = _lane_pdf(
        [("0:k", 0, 1, 0, 1, 1, sig), ("0:k", 0, 9, 0, 1, 2, sig)]
    )
    out = _minhash_lane_kernel(23)(both)
    assert out.to_dict("records") == [
        {"doc_a": 1, "doc_b": 9, "cnt": NUM_HASHES}
    ]
    one_sided = _lane_pdf(
        [("0:k", 0, 1, 0, 1, 1, sig), ("0:k", 0, 9, 0, 1, 1, sig)]
    )
    assert len(_minhash_lane_kernel(23)(one_sided)) == 0


def test_minhash_kernel_earlier_band_suppression():
    """A pair whose signatures already collide in an earlier band is
    emitted ONLY by that earlier band's tile (canonical-band dedup)."""
    sig = _sig(3)
    # band-1 bucket, but band 0 (columns 0..rpb-1) also matches ->
    # suppressed here
    pdf = _lane_pdf(
        [("1:k", 1, 1, 0, 0, 0, sig), ("1:k", 1, 2, 0, 0, 0, sig)]
    )
    assert len(_minhash_lane_kernel(23)(pdf)) == 0
    # now break band 0 agreement on one row: band-1 tile must emit
    sig_b = _sig(3, flips=(0,))  # differs inside band 0 only
    pdf2 = _lane_pdf(
        [("1:k", 1, 1, 0, 0, 0, sig), ("1:k", 1, 2, 0, 0, 0, sig_b)]
    )
    out = _minhash_lane_kernel(23)(pdf2)
    assert out.to_dict("records") == [
        {"doc_a": 1, "doc_b": 2, "cnt": NUM_HASHES - 1}
    ]


def test_minhash_kernel_min_cnt_threshold():
    """Pairs below the match-count threshold are dropped in-kernel."""
    sig = _sig(4)
    # flip 10 positions outside band 0 -> cnt = 22 < 23
    sig_b = _sig(4, flips=tuple(range(_ROWS_PER_BAND, _ROWS_PER_BAND + 10)))
    pdf = _lane_pdf(
        [("0:k", 0, 1, 0, 0, 0, sig), ("0:k", 0, 2, 0, 0, 0, sig_b)]
    )
    assert len(_minhash_lane_kernel(23)(pdf)) == 0
    out = _minhash_lane_kernel(22)(pdf)
    assert out.to_dict("records") == [
        {"doc_a": 1, "doc_b": 2, "cnt": NUM_HASHES - 10}
    ]


def test_minhash_kernel_walks_multiple_groups_per_lane():
    """Lane coarsening: one invocation owns several tile groups and
    must keep them separate (no cross-bucket pairs)."""
    sig = _sig(5)
    pdf = _lane_pdf(
        [
            ("0:a", 0, 1, 0, 0, 0, sig),
            ("0:a", 0, 2, 0, 0, 0, sig),
            ("0:b", 0, 5, 0, 0, 0, _sig(6)),
            ("0:b", 0, 6, 0, 0, 0, _sig(7)),  # different sigs: no pair
        ]
    )
    out = _minhash_lane_kernel(23)(pdf)
    assert out.to_dict("records") == [
        {"doc_a": 1, "doc_b": 2, "cnt": NUM_HASHES}
    ]


def test_minhash_kernel_expands_member_groups():
    """A qualifying sig pair expands to members_a x members_b doc
    pairs, each at the sig pair's count; same-sig internal pairs are
    NOT emitted by the banding stream (they come from band = -1)."""
    sig = _sig(8)
    pdf = _lane_pdf(
        [
            ("0:k", 0, 1, 0, 0, 0, sig, [1, 4]),
            ("0:k", 0, 2, 0, 0, 0, sig, [2, 9]),
        ]
    )
    out = _minhash_lane_kernel(23)(pdf)
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [
        (1, 2, NUM_HASHES),
        (1, 9, NUM_HASHES),
        (2, 4, NUM_HASHES),
        (4, 9, NUM_HASHES),
    ]


def test_minhash_kernel_same_sig_stream_band_minus_one():
    """band = -1 rows (the same-sig stream) pair i<j at
    cnt = NUM_HASHES with NO eq tensor — signature columns are zeros
    and must never influence the result."""
    z = [0] * NUM_HASHES
    pdf = _lane_pdf(
        [
            ("s:3", -1, 3, 0, 0, 0, z),
            ("s:3", -1, 7, 0, 0, 0, z),
            ("s:3", -1, 5, 0, 0, 0, z),
        ]
    )
    out = _minhash_lane_kernel(23)(pdf)
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [(3, 5, 32), (3, 7, 32), (5, 7, 32)]
    # off-diagonal same-sig tile: full A x B cross
    pdf2 = _lane_pdf(
        [
            ("s:3", -1, 3, 0, 1, 1, z),
            ("s:3", -1, 7, 0, 1, 2, z),
        ]
    )
    out2 = _minhash_lane_kernel(23)(pdf2)
    assert sorted(map(tuple, out2.to_numpy())) == [(3, 7, 32)]


def test_minhash_kernel_slices_of_same_sig_never_pair():
    """Member slices of ONE signature landing in different tile chunks
    (rep equal) must not emit intra-sig pairs from the banding stream —
    diagonal (rep < rep fails) and off-diagonal (rep != rep fails)."""
    sig = _sig(9)
    diag = _lane_pdf(
        [
            ("0:k", 0, 1, 0, 0, 0, sig, [1, 2]),
            ("0:k", 0, 1, 0, 0, 0, sig, [3, 4]),
        ]
    )
    assert len(_minhash_lane_kernel(23)(diag)) == 0
    offd = _lane_pdf(
        [
            ("0:k", 0, 1, 0, 1, 1, sig, [1, 2]),
            ("0:k", 0, 1, 0, 1, 2, sig, [3, 4]),
        ]
    )
    assert len(_minhash_lane_kernel(23)(offd)) == 0


def test_minhash_output_lane_count_invariant(spark):
    """The lane count only partitions kernel work: forcing a different
    lane count must not change the emitted pair set."""
    import bigdataentrytask_spark.operators.dedup as dd

    base = sorted(
        map(tuple, REGISTRY["minhash_dedup"](spark, SF_DIR).collect())
    )
    orig = dd._kernel_lanes
    try:
        dd._kernel_lanes = (
            lambda spark, groups_per_lane=1, floor=8, est_bytes=0: 5
        )
        alt = sorted(
            map(tuple, REGISTRY["minhash_dedup"](spark, SF_DIR).collect())
        )
    finally:
        dd._kernel_lanes = orig
    assert base == alt


def test_minhash_output_invariant_under_tiny_lane_volume_target(spark):
    """Forcing the data-volume lane bound to fire (tiny per-lane byte
    target -> many lanes, the 100 TB posture) must not change the
    output — VERDICT r15 item 1's done-criterion."""
    import bigdataentrytask_spark.operators.dedup as dd

    base = sorted(
        map(tuple, REGISTRY["minhash_dedup"](spark, SF_DIR).collect())
    )
    orig = dd._LANE_INPUT_BYTES
    try:
        dd._LANE_INPUT_BYTES = 4096  # sf0.01 docs ~60KB -> ~15 lanes
        alt = sorted(
            map(tuple, REGISTRY["minhash_dedup"](spark, SF_DIR).collect())
        )
    finally:
        dd._LANE_INPUT_BYTES = orig
    assert base == alt


def test_kernel_lanes_scale_with_parallelism_and_volume(spark):
    par = spark.sparkContext.defaultParallelism
    assert _kernel_lanes(spark) == max(8, par)
    assert _kernel_lanes(spark, 4) == max(8, par // 4)
    # data-volume bound: est_bytes dominates once it exceeds
    # parallelism * _LANE_INPUT_BYTES
    import bigdataentrytask_spark.operators.dedup as dd

    big = (par + 7) * dd._LANE_INPUT_BYTES
    assert _kernel_lanes(spark, est_bytes=big) == par + 7
    # groups_per_lane divides the data term too
    assert _kernel_lanes(spark, 4, est_bytes=big) == max(
        8, par // 4, (par + 7) // 4
    )
    # garbage estimates are capped, not propagated
    assert _kernel_lanes(spark, est_bytes=2**63) == dd._LANE_MAX


# ---------------------------------------------------------------------------
# heavy_hitter_tokens: vectorized per-batch candidate generation
# ---------------------------------------------------------------------------
def test_heavy_hitter_batch_size_invariance(spark):
    """The exact output must be independent of the Arrow batch split
    (the per-batch top-K candidate rule is a superset at ANY batch
    size; pass 2 exact-counts)."""
    name = "heavy_hitter_tokens"
    base = sorted(map(tuple, REGISTRY[name](spark, SF_DIR).collect()))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "157")  # force many tiny batches
        tiny = sorted(map(tuple, REGISTRY[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, old)
    assert base == tiny


def test_heavy_hitter_distributed_candidate_path(spark):
    """When the candidate set exceeds the InSet literal bound, the
    operator must switch to the distributed broadcast-semi-join path
    (the 100 TB posture) and produce the identical result."""
    import bigdataentrytask_spark.operators.curation as cur

    name = "heavy_hitter_tokens"
    base = sorted(map(tuple, REGISTRY[name](spark, SF_DIR).collect()))
    orig = cur._HH_INSET_MAX
    try:
        cur._HH_INSET_MAX = 1  # any real candidate set overflows this
        alt = sorted(map(tuple, REGISTRY[name](spark, SF_DIR).collect()))
    finally:
        cur._HH_INSET_MAX = orig
    assert base == alt


# ---------------------------------------------------------------------------
# basket_part_pairs: index-sliced i<j pair generation
# ---------------------------------------------------------------------------
def test_basket_sliced_pairgen_counts(spark):
    """The sliced transform emits exactly k(k-1)/2 ordered pairs per
    basket, each with p1 < p2, no duplicates."""
    df = spark.createDataFrame(
        [([3, 1, 2, 9],), ([5],), ([4, 4, 7],)], "parts array<bigint>"
    )
    pairs_col = F.flatten(
        F.expr(
            "transform(array_sort(parts), (x, i) ->"
            " transform(slice(array_sort(parts), i + 2, size(parts)),"
            "           y -> struct(x AS p1, y AS p2)))"
        )
    )
    rows = [
        (r.pr.p1, r.pr.p2)
        for r in df.select(F.explode(pairs_col).alias("pr")).collect()
    ]
    assert sorted(rows) == [
        (1, 2), (1, 3), (1, 9), (2, 3), (2, 9), (3, 9),  # 4 -> 6 pairs
        (4, 4), (4, 7), (4, 7),  # NB collect_set upstream dedupes; raw
        # arrays with repeats keep them — the operator feeds sets only
    ]


def test_simhash_bitsum_algebra(spark):
    """2*S_i > n  <=>  sum(2*bit - 1) > 0 for every split of n into
    bit counts (the round-15 rewrite's algebraic identity)."""
    for n in (1, 2, 7, 100):
        for s in range(n + 1):
            assert (2 * s > n) == ((2 * s - n) > 0)


def test_simhash_count_weighted_bitsums_match_per_occurrence(spark):
    """The round-16 rewrite hashes each DISTINCT (doc, tok) once and
    weights its bit contribution by the occurrence count; the weighted
    sums must equal the per-occurrence sums exactly (integers)."""
    from bigdataentrytask_spark.functions.text import tokens
    from bigdataentrytask_spark.operators.dedup import SIMHASH_BITS, _docs

    docs = _docs(spark, SF_DIR)
    occ = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    per_occ = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"S{i}")
            for i in range(SIMHASH_BITS)
        ],
    )
    cnt = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "doc_id",
            "cnt",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    weighted = cnt.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        *[
            F.sum(
                F.col("cnt") * F.shiftright("h", i).bitwiseAND(F.lit(1))
            ).alias(f"S{i}")
            for i in range(SIMHASH_BITS)
        ],
    )
    a = sorted(map(tuple, per_occ.collect()))
    b = sorted(map(tuple, weighted.collect()))
    assert a == b
