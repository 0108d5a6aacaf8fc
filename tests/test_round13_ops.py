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


def test_binseg_changepoints_brute_force(spark, tmp_path):
    """Depth-2 binary segmentation == python replay: planted mean
    shifts are found at their bin boundaries; a single-bin type
    yields no rows."""
    import datetime
    import math

    import __spark_entry__ as entry

    def half_away(x):
        return int(math.floor(x + 0.5)) if x >= 0 else -int(
            math.floor(-x + 0.5)
        )

    # type "a": 10 -> 50 -> 20 mean levels (two real change points);
    # type "b": flat with small jitter; type "c": one event (absent)
    vals_a = (
        [10.0 + 0.01 * (i % 7) for i in range(100)]
        + [50.0 + 0.01 * (i % 5) for i in range(100)]
        + [20.0 + 0.01 * (i % 3) for i in range(100)]
    )
    vals_b = [30.0 + 0.01 * (i % 4) for i in range(120)]
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for i, v in enumerate(vals_a):
        eid += 1
        rows.append((eid, base + datetime.timedelta(minutes=i), 1,
                     "a", float(v), "{}"))
    for i, v in enumerate(vals_b):
        eid += 1
        rows.append((eid, base + datetime.timedelta(minutes=2 * i), 1,
                     "b", float(v), "{}"))
    eid += 1
    rows.append((eid, base + datetime.timedelta(minutes=17), 1,
                 "c", 99.0, "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))

    # python replay with the identical integer/double chain
    us = [
        (t, et, half_away(v * 100))
        for (_, tsv, _, et, v, _) in rows
        for t in [int(tsv.timestamp() * 1_000_000)]
    ]
    t0 = min(t for t, _, _ in us)
    t1 = max(t for t, _, _ in us)
    span = t1 - t0 + 1
    bins: dict = {}
    for t, et, c in us:
        bn = ((t - t0) * 1024) // span
        n, s = bins.get((et, bn), (0, 0))
        bins[(et, bn)] = (n + 1, s + c)

    def best(et, lo, hi):
        seg = sorted(
            (bn, n, s) for (e2, bn), (n, s) in bins.items()
            if e2 == et and lo <= bn <= hi
        )
        np_ = sum(n for _, n, _ in seg)
        sp = sum(s for _, _, s in seg)
        out = None
        nl = sl = 0
        for bn, n, s in seg:
            nl += n
            sl += s
            nr = np_ - nl
            if nr <= 0:
                continue
            dd = float(sl * nr - (sp - sl) * nl)
            gain = (dd * dd) / ((float(nl) * float(nr)) * float(np_))
            if out is None or gain > out[0] or (
                gain == out[0] and bn < out[1]
            ):
                out = (gain, bn, nl, nr)
        return out

    want = set()
    for et in ("a", "b", "c"):
        r1 = best(et, 0, 1023)
        if r1 is None:
            continue
        g, bn, nl, nr = r1
        want.add((et, 1, 0, 1023, bn, nl, nr, round(g, 6)))
        for lo, hi in ((0, bn), (bn + 1, 1023)):
            r2 = best(et, lo, hi)
            if r2 is not None:
                g2, bn2, nl2, nr2 = r2
                want.add((et, 2, lo, hi, bn2, nl2, nr2, round(g2, 6)))

    got = {
        (r.event_type, r.level, r.lo_bin, r.hi_bin, r.split_bin,
         r.n_left, r.n_right, round(r.gain, 6))
        for r in entry.queries()["binseg_changepoints"](
            spark, d
        ).collect()
    }
    assert got == want
    assert not any(k[0] == "c" for k in got)  # single-bin type absent
    # the planted level-1 change point for "a" splits 100-vs-200 or
    # 200-vs-100 events (the larger of the two shifts)
    a1 = next(k for k in got if k[0] == "a" and k[1] == 1)
    assert (a1[5], a1[6]) in {(100, 200), (200, 100)}
