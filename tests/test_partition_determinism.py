"""Partition-count determinism of the round-8 hardened operators.

The float-determinism campaign (SCALE.md round-8) claims these ops'
outputs are EXACT under any partition layout because every fact-scale
reduction is an integer sum of grid-snapped values. This test changes
the layout for real — different shuffle-partition counts AND a
different number of input splits — and asserts bit-identical rows.
A pre-campaign implementation (double AVG centroids, float SSE sums)
can differ in the 6th decimal across layouts; the snapped forms
cannot differ at all.
"""

from __future__ import annotations

import pytest

from bigdataentrytask_spark.operators import REGISTRY, load_all

from .conftest import SF_DIR_SMALL

load_all()

HARDENED = [
    "kmeans_step",
    "silhouette_by_label",
    "centroid_affinity_matrix",
    "embedding_label_centroids",
    "embedding_centroid_drift",
    "embedding_dim_variance",
    "embedding_pq_assign",
    "pca_power_iteration",
    "embedding_outlier_mahalanobis",
]


def _rows(spark, name, shuffle_parts, max_split_bytes):
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_mb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_split_bytes))
        return sorted(map(tuple, REGISTRY[name](spark, SF_DIR_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mb)


@pytest.mark.parametrize("name", HARDENED)
def test_identical_across_partition_layouts(spark, name):
    base = _rows(spark, name, 32, 128 * 1024 * 1024)
    tiny_splits = _rows(spark, name, 5, 16 * 1024)  # many input splits
    one_part = _rows(spark, name, 1, 128 * 1024 * 1024)
    assert base == tiny_splits, f"{name}: differs under tiny input splits"
    assert base == one_part, f"{name}: differs under 1 shuffle partition"
