"""Property-based test: `resolve_components` (iterative min-label
propagation on Spark) must agree with an independent driver-side
union-find on RANDOM graphs — including shapes the fixed corpus never
produces (long chains, stars, many singletons, dense blobs). This is
the differential check the DuckDB recursive-CTE oracle can't give us
for arbitrary topologies."""

from __future__ import annotations

import random

import pytest

from bigdataentrytask_spark.operators.dedup import resolve_components


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of each component
    out = {}
    for v in n_nodes:
        r = find(v)
        # path-compress to the true min by a second pass
        out[v] = r
    # find() roots are not guaranteed minimal; normalize via min per root
    by_root: dict[int, int] = {}
    for v, r in out.items():
        by_root[r] = min(by_root.get(r, v), v)
    return {v: by_root[r] for v, r in out.items()}


def _random_graph(seed: int) -> tuple[list[int], list[tuple[int, int]]]:
    rng = random.Random(seed)
    shape = seed % 4
    n = rng.randint(5, 60)
    nodes = list(range(1, n + 1))
    if shape == 0:  # sparse random
        m = rng.randint(0, n)
        edges = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(m)]
    elif shape == 1:  # one long chain + singletons
        k = rng.randint(2, n)
        edges = [(i, i + 1) for i in range(1, k)]
    elif shape == 2:  # star + a separate triangle
        hub = rng.choice(nodes)
        edges = [tuple(sorted((hub, v))) for v in nodes if v != hub][: n // 2]
        if n >= 6:
            a, b, c = n - 2, n - 1, n
            edges += [(a, b), (b, c), (a, c)]
    else:  # dense blob on a subset
        sub = rng.sample(nodes, min(8, n))
        edges = [
            (min(a, b), max(a, b))
            for i, a in enumerate(sub)
            for b in sub[i + 1:]
        ]
    edges = [e for e in edges if e[0] != e[1]]
    return nodes, edges


@pytest.mark.parametrize("seed", range(8))
def test_components_match_union_find(spark, seed):
    nodes, edges = _random_graph(seed)
    expected = _union_find(nodes, edges)
    ids = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(None, None)], "doc_a long, doc_b long"
    ).dropna()
    got = {
        r.doc_id: r.component
        for r in resolve_components(spark, ids, pairs).collect()
    }
    assert got == expected, (seed, len(edges))
    # keep flag: exactly the component minima
    keeps = {
        r.doc_id
        for r in resolve_components(spark, ids, pairs).collect()
        if r.keep
    }
    assert keeps == set(expected.values())
