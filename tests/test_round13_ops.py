"""Round-13 session registrations: python brute-force replays
(both-engines-wrong insurance on top of the DuckDB oracle gate)."""

import math
import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from openseize_spark.session import get_spark

    return get_spark("round13-tests")


def _write_edges_tables(spark, d, edges):
    """Materialize a synthetic lineitem/orders pair whose join yields
    exactly the given (custkey, partkey) edges (the graph-query
    fixture idiom)."""
    li = [(i, p) for i, (_, p) in enumerate(edges)]
    od = [(i, c) for i, (c, _) in enumerate(edges)]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        od, "o_orderkey bigint, o_custkey bigint"
    ).write.parquet(os.path.join(d, "orders.parquet"))


def _walk_replay(edges, length):
    """Python replay of llm/dedup.random_walks over the doubled-id
    undirected graph the registration builds."""
    M = 2147483647
    und = set()
    for c, p in edges:
        a, b = c * 2, p * 2 + 1
        und.add((a, b))
        und.add((b, a))
    adj = {}
    for x, y in sorted(und):
        adj.setdefault(x, []).append(y)
    walks = {}
    for seed in adj:
        node = seed
        path = [node]
        for s in range(1, length + 1):
            nbrs = adj[node]
            h = (seed % M) * 48271 + (node % M) * 69621 + s * 8191
            node = nbrs[h % len(nbrs)]
            path.append(node)
        walks[seed] = path
    return walks


def test_skipgram_cooc_brute_force(spark, tmp_path):
    """Pair counts and PMI == python replay of the deterministic
    walks + window-2 skip-gram + ln((cnt*T)/(cu*cv))."""
    import __spark_entry__ as entry

    edges = [
        (1, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 3),
        (4, 1), (4, 4), (5, 5),
    ]
    d = str(tmp_path / "sf")
    _write_edges_tables(spark, d, edges)

    L, W = 4, 2
    walks = _walk_replay(edges, L)
    cnt: dict = {}
    for path in walks.values():
        for i, u in enumerate(path):
            for j, v in enumerate(path):
                if i != j and abs(i - j) <= W:
                    cnt[(u, v)] = cnt.get((u, v), 0) + 1
    T = sum(cnt.values())
    cu: dict = {}
    cv: dict = {}
    for (u, v), k in cnt.items():
        cu[u] = cu.get(u, 0) + k
        cv[v] = cv.get(v, 0) + k
    want = {
        (u, v): (k, math.log((k * T) / (cu[u] * cv[v])))
        for (u, v), k in cnt.items()
    }

    got = {
        (r.u, r.v): (r.cnt, r.pmi)
        for r in entry.queries()["skipgram_cooc"](spark, d).collect()
    }
    assert set(got) == set(want)
    for key, (k, pmi) in want.items():
        gk, gpmi = got[key]
        assert gk == k
        assert abs(gpmi - pmi) < 1e-12
    # PMI sanity: sum over all pairs of cnt/T * pmi is the mutual
    # information and must be non-negative
    mi = sum((k / T) * p for k, p in want.values())
    assert mi >= -1e-12
