"""Random-differential test: the staged `substring_dedup_audit`
(L-gram groupBy + gaps-and-islands interval union on Spark) must
agree with an independent brute-force position-set model on RANDOM
corpora — tiny alphabets force dense window duplication, overlapping
islands, and within-doc self-repeats the fixed corpus never produces.
This is the check the DuckDB oracle can't give us for arbitrary
inputs (both engine formulations share the interval-union idea; the
position-set model does not)."""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd
import pytest

from bigdataentrytask_spark.operators.dedup import (
    _SUBSTR_L,
    substring_dedup_audit,
)


def _brute(docs: list[tuple[int, str]], L: int) -> dict[int, tuple]:
    grams: Counter = Counter()
    pos: dict[int, list[tuple[int, str]]] = {}
    for d, text in docs:
        ps = [(i + 1, text[i:i + L]) for i in range(max(len(text) - L + 1, 0))]
        pos[d] = ps
        for _p, g in ps:
            grams[g] += 1
    out = {}
    for d, text in docs:
        dup_ps = [p for p, g in pos[d] if grams[g] >= 2]
        covered: set[int] = set()
        for p in dup_ps:
            covered.update(range(p, p + L))
        out[d] = (
            len(text),
            max(len(text) - L + 1, 0),
            len(dup_ps),
            len(covered),
        )
    return out


def _ppm_half_up(cov: int, length: int) -> int:
    # HALF_UP for positives without float round (Python round is
    # banker's): floor((cov*1e6 + len/2) / len)
    return (cov * 2_000_000 + length) // (2 * length)


def _random_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    shape = seed % 4
    n = rng.randint(3, 14)
    docs = []
    for d in range(n):
        if shape == 0:  # 2-letter alphabet: dense duplication
            ln = rng.randint(0, 70)
            text = "".join(rng.choice("ab") for _ in range(ln))
        elif shape == 1:  # shared prefix + unique tails
            shared = "".join(rng.choice("xyz") for _ in range(rng.randint(20, 45)))
            text = shared + "".join(
                rng.choice("pq") for _ in range(rng.randint(0, 30))
            )
        elif shape == 2:  # periodic (within-doc self-repeats)
            period = rng.randint(2, 12)
            unit = "".join(rng.choice("mn") for _ in range(period))
            text = (unit * 10)[: rng.randint(25, 80)]
        else:  # mixed: some exact clones, some unique counters
            if d % 2 == 0:
                text = "clone-" * 8 + str(seed % 7)
            else:
                text = "".join(f"{i:02d}" for i in range(rng.randint(10, 40)))
        docs.append((d, text))
    return docs


@pytest.mark.parametrize("seed", range(10))
def test_substring_dedup_matches_bruteforce(spark, tmp_path, seed):
    docs = _random_corpus(seed)
    pdf = pd.DataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r.doc_id: (
            r.doc_len, r.n_windows, r.n_dup_windows,
            r.dup_coverage, r.dup_ppm,
        )
        for r in substring_dedup_audit(spark, sf).collect()
    }
    want = _brute(docs, _SUBSTR_L)
    assert set(got) == {d for d, _t in docs}
    for d, (ln, nw, ndw, cov) in want.items():
        exp_ppm = _ppm_half_up(cov, ln) if ln else 0
        assert got[d] == (ln, nw, ndw, cov, exp_ppm), (
            f"seed={seed} doc={d}: got {got[d]}, "
            f"want {(ln, nw, ndw, cov, exp_ppm)}"
        )
