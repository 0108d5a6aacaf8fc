"""Round-14 session: python brute-force replays and unit tests for
the gate-hardening + ADVICE fixes (both-engines-wrong insurance on
top of the DuckDB oracle gate)."""

import math
import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from openseize_spark.session import get_spark

    return get_spark("round14-tests")


def _write_edges_tables(spark, d, edges):
    """Synthetic lineitem/orders pair whose join yields exactly the
    given (custkey, partkey) edges (the graph-query fixture idiom)."""
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


def half_away(x):
    """Spark/DuckDB round(): half AWAY from zero (python round() is
    half-even and diverges on exact .5)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def test_sppmi_embed_brute_force(spark, tmp_path):
    """The distributed exact-integer power iteration == a python-int
    replay of walks -> skip-gram counts -> PMI -> SPPMI units ->
    6 rounds of matvec + sign*(abs*unit // max) renormalization."""
    import __spark_entry__ as entry

    edges = [
        (1, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 3),
        (4, 1), (4, 4), (5, 5), (5, 2), (6, 3), (6, 5),
    ]
    d = str(tmp_path / "sf")
    _write_edges_tables(spark, d, edges)

    L, W, ROUNDS, UNIT = 4, 2, 6, 10**6
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
    # SPPMI units: round-half-away of max(pmi, 0)*unit, identical
    # paren shape to the engine (greatest FIRST, then the scale
    # multiply)
    m: dict = {}
    for (u, v), k in cnt.items():
        pmi = math.log((k * T) / (cu[u] * cv[v]))
        su = half_away(max(pmi, 0.0) * float(UNIT))
        if su > 0:
            m[(u, v)] = su
    nodes = sorted({u for u, _ in m})
    vvec = {n: UNIT for n in nodes}
    for _ in range(ROUNDS):
        raw = {
            n: sum(su * vvec[v] for (u, v), su in m.items() if u == n)
            for n in nodes
        }
        mx = max(abs(x) for x in raw.values())
        vvec = {
            n: (
                -((-x if x < 0 else x) * UNIT // mx)
                if x < 0
                else (x * UNIT // mx)
            )
            for n, x in raw.items()
        }

    got = {
        r.node: r.vu
        for r in entry.queries()["sppmi_embed"](spark, d).collect()
    }
    assert got == vvec
    # the dominant eigenvector of a non-negative symmetric-support
    # matrix with a connected positive component has a well-defined
    # max-magnitude coordinate at the renorm scale
    assert max(abs(x) for x in got.values()) == UNIT


def test_stateful_page_hinkley_chunk_order(tmp_path):
    """The r14 ADVICE fix: chunks arriving out of global (ts,
    event_id) order within one micro-batch must produce the same
    carried state as a single globally-sorted chunk (the pre-fix code
    sorted each chunk independently and diverged)."""
    import pandas as pd

    from openseize_spark.streaming.stateful import (
        make_stateful_page_hinkley,
    )

    class FakeState:
        exists = False

        def __init__(self):
            self.updated = None

        def update(self, t):
            self.updated = t

        @property
        def get(self):  # pragma: no cover - unused when exists=False
            raise AssertionError

    def run(chunks):
        fn = make_stateful_page_hinkley()
        st = FakeState()
        outs = list(fn(("click",), iter(chunks), st))
        out = pd.concat(outs, ignore_index=True)
        return st.updated, out.sort_values("event_id").reset_index(
            drop=True
        )

    rows = pd.DataFrame(
        {
            "event_type": ["click"] * 6,
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                [f"2024-01-01 00:00:0{i}" for i in range(6)]
            ),
            "value": [1.0, 5.0, 2.0, 8.0, 1.0, 9.0],
        }
    )
    # one sorted chunk vs two interleaved chunks: rows (1,3,5) and
    # (2,4,6) — each chunk is itself (ts, event_id)-sorted, so the
    # pre-fix per-chunk sort would NOT reconstruct global order
    st_single, out_single = run([rows])
    st_split, out_split = run(
        [rows.iloc[[0, 2, 4]], rows.iloc[[1, 3, 5]]]
    )
    assert st_single == st_split
    pd.testing.assert_frame_equal(out_single, out_split)


def test_stamp_batch_mtimes_orders_files(tmp_path):
    """The streaming-fixture mtime stamper yields strictly increasing
    per-batch mtimes regardless of write timing/granularity."""
    import __spark_entry__ as entry

    d = str(tmp_path)
    for i in range(3):
        os.makedirs(os.path.join(d, f"batch_{i}"))
        with open(os.path.join(d, f"batch_{i}", "part-0.parquet"), "w") as f:
            f.write("x")
    # simulate coarse-granularity ties: same mtime everywhere
    t0 = os.stat(os.path.join(d, "batch_0", "part-0.parquet")).st_mtime
    for i in range(3):
        os.utime(os.path.join(d, f"batch_{i}", "part-0.parquet"), (t0, t0))
    entry._stamp_batch_mtimes(d, 3)
    mt = [
        os.stat(os.path.join(d, f"batch_{i}", "part-0.parquet")).st_mtime
        for i in range(3)
    ]
    assert mt[0] < mt[1] < mt[2]


def test_gate_decimal_casts_cover_registry_surface(spark, tmp_path):
    """Policy test for the r14 hardening: every query named in
    _GATE_DECIMAL_CASTS emits NO decimal-typed column after the shim
    (checked on the synthetic fixture for the graph queries — schema
    only, no execution)."""
    import __spark_entry__ as entry

    edges = [(1, 1), (1, 2), (2, 1)]
    d = str(tmp_path / "sf")
    _write_edges_tables(spark, d, edges)
    qs = entry.queries()
    for name in ("sp_counting", "betweenness_contrib"):
        schema = qs[name](spark, d).schema
        decs = [
            f.name
            for f in schema.fields
            if "decimal" in f.dataType.simpleString()
        ]
        assert decs == [], f"{name} leaks decimal columns: {decs}"
