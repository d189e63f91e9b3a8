"""Property tests for the vector helpers: the Column-expression path
and the Arrow-kernel path must be BIT-IDENTICAL to each other (the
module's central claim) and within float tolerance of NumPy on random
vectors, including adversarial magnitudes."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from bigdataentrytask_spark.functions.vector import (
    cosine,
    cosine_seq,
    norm,
    seq_dot,
)


def _sequential_dot(x, y):
    acc = 0.0
    for a, b in zip(x, y):
        acc += float(a) * float(b)
    return acc


@pytest.mark.parametrize("seed", range(10))
def test_seq_dot_matches_sequential_fold(seed):
    rng = np.random.default_rng(seed)
    scale = 10.0 ** rng.integers(-3, 4)
    X = (rng.standard_normal((50, 64)) * scale).astype(np.float64)
    Y = (rng.standard_normal((50, 64)) * scale).astype(np.float64)
    got = seq_dot(X, Y)
    for i in range(X.shape[0]):
        # bit-identical to the sequential fold, not merely close
        assert got[i] == _sequential_dot(X[i], Y[i])


@pytest.mark.parametrize("seed", range(5))
def test_column_and_kernel_paths_agree_bitwise(spark, seed):
    rng = random.Random(seed)
    rows = [
        (
            i,
            [rng.gauss(0, 1) for _ in range(16)],
            [rng.gauss(0, 1) for _ in range(16)],
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )
    col_path = {
        r.id: r.c
        for r in df.select("id", cosine("a", "b").alias("c")).collect()
    }
    kernel_path = {
        r.id: r.c
        for r in df.select("id", cosine_seq("a", "b").alias("c")).collect()
    }
    for i in col_path:
        assert col_path[i] == kernel_path[i], i  # exact, no tolerance


def test_cosine_against_numpy(spark):
    rng = np.random.default_rng(99)
    rows = [
        (i, [float(v) for v in rng.standard_normal(32)],
         [float(v) for v in rng.standard_normal(32)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = {r.id: r.c for r in df.select("id", cosine("a", "b").alias("c")).collect()}
    for i, a, b in rows:
        a, b = np.array(a), np.array(b)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(got[i], want, rel_tol=1e-12), i


def test_norm_of_unit_axis(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0, 5.0])],
        "id long, a array<double>",
    )
    got = {r.id: r.n for r in df.select("id", norm("a").alias("n")).collect()}
    assert got == {1: 5.0, 2: 5.0}
