"""Vector math on array<float> columns.

Two equivalent compute paths, bit-identical by construction:

* pure Column expressions (zip_with/aggregate) — zero Python, used
  for the small/reference operators;
* Arrow-vectorized kernels (`cosine_seq`) — used where the candidate
  volume makes the per-element interpreted evaluation of Catalyst
  higher-order functions the measured bottleneck (HOF lambdas are NOT
  whole-stage-codegen'd; ~1µs/element means millions of 64-dim pairs
  cost tens of seconds).

Bit-identity argument: elements are widened float->double (exact) on
both paths; the Arrow kernels accumulate with a COLUMN loop
(``acc += X[:, j] * Y[:, j]`` for j in order), which performs the
additions in exactly the same sequential order as Spark's
``aggregate`` fold and DuckDB's ``SUM`` over ``UNNEST`` — so every
intermediate double is IEEE-identical, not merely close. (A BLAS dot
would use pairwise/SIMD summation — fast but a few ulps off, enough
to flip a 6-decimal rounding boundary on adversarial values.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def seq_dot(X, Y):
    """Row-wise dot of two (n, d) float64 matrices with sequential
    per-row accumulation order (see module docstring)."""
    import numpy as np

    acc = np.zeros(X.shape[0])
    for j in range(X.shape[1]):
        acc += X[:, j] * Y[:, j]
    return acc


def stack_f64(series):
    """pandas Series of Arrow list<float> rows -> (n, d) float64."""
    import numpy as np

    return np.stack(series.to_numpy()).astype(np.float64)


# DataType object, not a DDL string: string return types are parsed
# through the active session, which does not exist at import time.
@pandas_udf(DoubleType())
def cosine_seq(a, b):
    """Arrow twin of cosine(): dot(a,b) / (||a|| * ||b||), every
    operation and accumulation order IEEE-identical to the Column
    form and to the DuckDB oracle's UNNEST sums."""
    import numpy as np
    import pandas as pd

    A, B = stack_f64(a), stack_f64(b)
    d = seq_dot(A, B)
    na = np.sqrt(seq_dot(A, A))
    nb = np.sqrt(seq_dot(B, B))
    return pd.Series(d / (na * nb))
