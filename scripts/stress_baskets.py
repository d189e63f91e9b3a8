"""Basket-WIDTH stress for the pair-expansion family (reusable form
of the round-5 measurements in SCALE.md).

`stress8x.py` duplicates documents — more rows, same cluster shape.
For the basket/graph operators the dangerous axis is different:
pair blowup is per-order basket size SQUARED, so the stress is WIDER
baskets, not more orders. This harness unions 8 copies of sf0.1
lineitem with the SAME l_orderkey but shifted l_partkey, widening
every basket 8x (<= 7 lines -> <= 56 distinct parts; <= 21 undirected
pairs/order -> <= 1540, a 73x pair-volume factor) and times the
operators that expand baskets.

Usage: python scripts/stress_baskets.py [op ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataentrytask_spark.operators import REGISTRY, load_all
from bigdataentrytask_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/stress_baskets_corpus"
COPIES = 8
PART_STRIDE = 10_000_000

DEFAULT_OPS = [
    "basket_size_distribution",
    "basket_part_pairs",
    "graph_degree_distribution",
    "label_propagation_step",
    "part_pair_triangles",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        if t == "lineitem":
            continue
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SRC, f"{t}.parquet"), dst)
    dst = os.path.join(DST, "lineitem.parquet")
    if os.path.exists(dst):
        return
    base = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    out = None
    for i in range(COPIES):
        c = base.withColumn(
            "l_partkey", base.l_partkey + (i * PART_STRIDE)
        ).withColumn("l_linenumber", base.l_linenumber + i * 10)
        out = c if out is None else out.unionByName(c)
    out.coalesce(4).write.mode("overwrite").parquet(dst + "_dir")
    parts = [f for f in os.listdir(dst + "_dir") if f.endswith(".parquet")]
    if len(parts) == 1:
        shutil.move(os.path.join(dst + "_dir", parts[0]), dst)
        shutil.rmtree(dst + "_dir")
    else:
        spark.read.parquet(dst + "_dir").coalesce(1).write.mode(
            "overwrite"
        ).parquet(dst + "_one")
        parts = [
            f for f in os.listdir(dst + "_one") if f.endswith(".parquet")
        ]
        shutil.move(os.path.join(dst + "_one", parts[0]), dst)
        shutil.rmtree(dst + "_one")
        shutil.rmtree(dst + "_dir")


def main(ops: list[str]) -> None:
    load_all()
    spark = get_spark("stress-baskets")
    build(spark)
    # warm the session so the first op doesn't pay JVM startup
    spark.read.parquet(os.path.join(DST, "lineitem.parquet")).count()
    for name in ops:
        t0 = time.time()
        n = len(REGISTRY[name](spark, DST).collect())
        print(
            f"STRESS-BASKETS {name}: {n} rows in {time.time() - t0:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_OPS)
