"""UDTF / UDAF extension-point proofs (SURVEY.md §2.7).

The engine policy is built-ins first — these tests prove the two
remaining user-defined extension points WORK and agree with the
equivalent built-in plan, so a user porting custom Flink/Hive
functions has a verified template for each:

* Python UDTF (Spark 4 `@udtf`): table function emitting multiple
  rows per input — checked against the native explode/slice chunker
  (`doc_word_chunks`).
* Grouped-agg pandas UDAF (`pandas_udf` with a scalar return on
  groupBy.agg): Arrow-vectorized custom aggregate — checked against
  the built-in `F.sum`.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from bigdataentrytask_spark.catalog import load_table
from tests.conftest import SF_DIR

_CHUNK = 32


@udtf(returnType="chunk_idx: long, chunk_text: string")
class WordChunker:
    """UDTF twin of the native doc_word_chunks slice/explode plan."""

    def eval(self, text: str):
        words = text.split(" ")
        for i in range(0, len(words), _CHUNK):
            yield i // _CHUNK, " ".join(words[i : i + _CHUNK])


def test_udtf_matches_native_chunker(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    via_udtf = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in docs.lateralJoin(
            WordChunker(F.col("text").outer())
        ).select("doc_id", "chunk_idx", "chunk_text").collect()
    }

    ws = F.split("text", " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(float(_CHUNK))).cast("long")
    chunk = F.slice(
        "ws", F.col("chunk_idx").cast("int") * _CHUNK + 1, _CHUNK
    )
    native = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in docs.select("doc_id", ws.alias("ws"), n_chunks.alias("nc"))
        .select(
            "doc_id",
            "ws",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("nc") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select("doc_id", "chunk_idx", F.concat_ws(" ", chunk).alias("chunk_text"))
        .collect()
    }
    assert via_udtf == native
    assert via_udtf  # non-trivial sample


def test_grouped_agg_pandas_udaf_matches_builtin(spark):
    @pandas_udf("double")
    def psum(v: pd.Series) -> float:
        return float(v.sum())

    orders = load_table(spark, SF_DIR, "orders")
    custom = {
        r.o_orderstatus: round(r.s, 2)
        for r in orders.groupBy("o_orderstatus")
        .agg(psum("o_totalprice").alias("s"))
        .collect()
    }
    builtin = {
        r.o_orderstatus: round(r.s, 2)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert set(custom) == set(builtin)
    for k in builtin:
        assert custom[k] == pytest.approx(builtin[k], rel=1e-9)
