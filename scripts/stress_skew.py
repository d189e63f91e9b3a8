"""Hot-KEY skew stress (third adversarial axis, complementing
stress8x row duplication and stress_baskets basket width).

Per-key windows (sessionization, running sums, transition chains)
shuffle on user_id — uniform duplication never stresses them because
every key grows equally and AQE splits nothing. The dangerous shape
is ONE key holding a large fraction of the fact table: a single
straggler partition does all the window work. This harness rebuilds
sf0.1 events with user 0's rows duplicated HOT_COPIES times under
fresh event_ids (event_id uniqueness is load-bearing — the
first_seen tie-break invariant), yielding a key that owns ~HOT_COPIES
x (1/|users|) of the corpus, and times named registry operators.

Usage: python scripts/stress_skew.py [op ...]
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
DST = "/tmp/stress_skew_corpus"
HOT_COPIES = 400          # hot user ends up with ~400x its base rows
ID_STRIDE = 10_000_000

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

DEFAULT_OPS = [
    "user_sessions",
    "q3_user_payment",
    "latest_event_per_user",
    "event_transition_matrix",
    "first_seen_incremental",
]


def build(spark) -> None:
    # single-FILE parquet via pyarrow (catalog sniffs the events footer,
    # which requires a file path, not a spark output directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        if t != "events":
            shutil.copy(src, dst)
            continue
        tbl = pq.read_table(src)
        hot = tbl.filter(pa.compute.equal(tbl["user_id"], 0))
        parts = [tbl]
        for k in range(1, HOT_COPIES):
            shifted = hot.set_column(
                hot.schema.get_field_index("event_id"),
                "event_id",
                pa.compute.add(hot["event_id"], k * ID_STRIDE),
            )
            parts.append(shifted)
        pq.write_table(pa.concat_tables(parts), dst)


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    load_all()
    spark = get_spark()
    build(spark)
    n = spark.read.parquet(os.path.join(DST, "events.parquet")).count()
    hot_n = (
        spark.read.parquet(os.path.join(DST, "events.parquet"))
        .filter("user_id = 0").count()
    )
    print(f"STRESS-SKEW corpus: {n} events, hot user holds {hot_n} "
          f"({100.0 * hot_n / n:.1f}%)")
    for name in ops:
        t0 = time.time()
        rows = REGISTRY[name](spark, DST).count()
        print(f"STRESS-SKEW {name}: {rows} rows in {time.time() - t0:.2f}s",
              flush=True)
    shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
