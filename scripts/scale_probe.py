#!/usr/bin/env python
"""Core-scaling probe for the heavy kernel operators (SCALE.md).

The driver's 8-vs-32-core bench at sf0.1 cannot separate core-count
scaling from the ~0.2-0.5s per-query fixed floor (job scheduling,
Arrow setup, noop sink), so its `suspect_cpus_ignored` heuristic fires
even though session.py honors SPARK_GRAFT_CPUS (VERDICT r15 item 4 /
"what's wrong" #4). This probe builds a LARGER derived corpus (sf0.1
documents/embeddings replicated with disjoint id offsets — a pure
scale-up of the same distribution, used ONLY for this scaling
demonstration, never for bench or correctness results) and times the
heavy, compute-bound operators at a given core count.

Usage:
    python scripts/scale_probe.py build [REPL]    # build /tmp corpus
    SPARK_GRAFT_CPUS=8  python scripts/scale_probe.py run
    SPARK_GRAFT_CPUS=32 python scripts/scale_probe.py run

The derived corpus lives in /tmp/scale_probe_sf (documents.parquet,
embeddings.parquet); REPL is the replication factor (default 5, i.e.
~sf0.5). `run` prints one JSON line with per-op best-of-3 seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_probe_sf"
OPS = [
    "minhash_dedup",
    "simhash_pairs",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
]


def build(repl: int) -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # doc_id/vec_id offsets keep ids disjoint; text/embedding payloads
    # replicate unchanged (same token distribution, so kernel work per
    # row is representative). Offsets are multiples of 10^9 so derived
    # ids can never collide with fixture ids.
    # PER_THREAD_OUTPUT writes a DIRECTORY of parquet files — a
    # single-file table gives Spark a one-task scan (2.9 MB << the
    # 128 MB split size), which would serialize every map stage and
    # fake "no core scaling" for scan-bound operators.
    slices = 8  # files per replica -> repl*slices files per table
    emb_cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
        ).fetchall()
    ]
    rest = ", ".join(c for c in emb_cols if c != "vec_id")
    for t, key, proj in (
        ("documents", "doc_id", "text, lang, source, n_chars"),
        ("embeddings", "vec_id", rest),
    ):
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        for i in range(repl):
            for s in range(slices):
                con.execute(
                    f"COPY (SELECT {key} + {i}000000000 AS {key}, {proj} "
                    f"      FROM read_parquet('{SRC}/{t}.parquet') "
                    f"      WHERE {key} % {slices} = {s}) "
                    f"TO '{DST}/{t}.parquet/part_{i}_{s}.parquet' (FORMAT PARQUET)"
                )
    # tables the loaders may touch but the probed ops don't scan get a
    # passthrough copy so load_table() finds them
    for t in (
        "events",
        "customer",
        "orders",
        "lineitem",
        "part",
        "supplier",
        "nation",
        "region",
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"built {DST} at {repl}x sf0.1")


def run() -> None:
    from bigdataentrytask_spark.operators import REGISTRY, load_all
    from bigdataentrytask_spark.session import get_spark

    load_all()
    spark = get_spark("scale-probe")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out = {"cpus": int(cpus), "dir": DST, "queries": {}}
    for name in OPS:
        ts = []
        for _ in range(3):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"scale-probe {name}")
            REGISTRY[name](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
        out["queries"][name] = min(ts)
        print(f"# {name}: best {min(ts)} of {ts}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
    else:
        run()
