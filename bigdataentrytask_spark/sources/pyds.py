"""Custom connector via the Python Data Source API (Spark 4): the
reference's Kafka mock-order feed (S1/S2,
/root/reference/code/project/entryTask/src/main/entryTask/__init__.py:13-25)
as a first-class `spark.read.format("mock_orders")` source.

Why this exists alongside generator.mock_orders (pure-Column form):
the DataSource API is the engine's *connector* surface — the same
shape a real Kafka/REST/proprietary-store connector would take — so
the repo demonstrates it with the one external feed the reference
actually has. Partition planning happens in `partitions()` (the id
space is split evenly; each executor materializes only its slice), so
the source scales out like any file scan: no driver-side row
materialization, no collect.

Determinism: every column is a pure function of (row id, seed) via
md5 — same rows for any partition count, any cluster size, any run.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "order_id bigint, user_id bigint, order_tz string, amount bigint, "
    "currency string, channel_id bigint, order_time bigint"
)
BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC


def _h(row_id: int, seed: str, salt: str, lo: int, hi: int) -> int:
    """Deterministic uniform int in [lo, hi] from (id, seed, salt)."""
    digest = hashlib.md5(f"{seed}:{salt}:{row_id}".encode()).hexdigest()
    return lo + int(digest[:12], 16) % (hi - lo + 1)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class MockOrdersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.seed = options.get("seed", "entrytask")
        self.num_partitions = int(options.get("num_partitions", 8))
        self.mean_gap_s = int(options.get("mean_gap_s", 6))

    def partitions(self) -> list[_Slice]:
        step = max(1, -(-self.n_rows // self.num_partitions))
        return [
            _Slice(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        seed = self.seed
        for i in range(partition.start, partition.end):
            # distributions mirror the reference generator
            # (__init__.py:15-21): 15-digit ids, uid 1..5000,
            # amount 1..10000, channel 0..200, one order per 3-10 s.
            yield (
                10**14 + _h(i, seed, "oid", 0, 9 * 10**14 - 1),
                _h(i, seed, "uid", 1, 5000),
                "beijing",
                _h(i, seed, "amt", 1, 10000),
                "rmb",
                _h(i, seed, "ch", 0, 200),
                BASE_EPOCH + i * self.mean_gap_s + _h(i, seed, "gap", 3, 10),
            )


class MockOrdersDataSource(DataSource):
    """`spark.read.format("mock_orders").option("n_rows", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "mock_orders"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> MockOrdersReader:
        return MockOrdersReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(MockOrdersDataSource)
