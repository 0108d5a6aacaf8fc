"""Round-10-session operators: prefix-filter set-similarity join,
winnowing fingerprints, Misra-Gries heavy hitters, bucketed range join,
WOE encoding.

Each operator gets (a) a pure-python brute-force or property check of
the ALGORITHM (both-engines-wrong insurance — the DuckDB oracle gate
can't catch a shared misconception), and (b) a small Spark run compared
against that brute force.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from openseize_spark.llm import dedup, sketch

PROP = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------- prefix filter (python)


def _brute_jaccard_pairs(sets: dict, t_num: int, t_den: int):
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * t_den >= t_num * uni:
                out.add((a, b))
    return out


def _prefix_filter_pairs(sets: dict, t_num: int, t_den: int):
    """Python mirror of llm/dedup.set_similarity_join's plan: global
    df order (df asc, token asc), per-set prefix p = s - ceil(t*s) + 1,
    candidates = prefix-postings self-join + size filter, then exact
    verify."""
    df: dict = {}
    for s in sets.values():
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    prefixes = {}
    for i, s in sets.items():
        sz = len(s)
        if sz == 0:
            continue
        p = sz - (sz * t_num + t_den - 1) // t_den + 1
        ordered = sorted(s, key=lambda tok: (df[tok], tok))
        prefixes[i] = set(ordered[:p])
    cand = set()
    post: dict = {}
    for i, pref in prefixes.items():
        for tok in pref:
            post.setdefault(tok, []).append(i)
    for tok, ids in post.items():
        for x in ids:
            for y in ids:
                if x < y and t_num * max(
                    len(sets[x]), len(sets[y])
                ) <= t_den * min(len(sets[x]), len(sets[y])):
                    cand.add((x, y))
    out = set()
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if inter * t_den >= t_num * uni:
            out.add((a, b))
    return out


@given(
    data=st.lists(
        st.sets(st.integers(0, 25), max_size=12),
        min_size=2,
        max_size=12,
    ),
    t=st.sampled_from([(1, 2), (4, 5), (1, 4), (2, 3)]),
)
@settings(**PROP)
def test_prefix_filter_complete(data, t):
    """The prefix filter must be COMPLETE: candidates pruned by the
    rarest-prefix rule can never contain a qualifying pair."""
    sets = {i: s for i, s in enumerate(data)}
    t_num, t_den = t
    assert _prefix_filter_pairs(sets, t_num, t_den) == _brute_jaccard_pairs(
        sets, t_num, t_den
    )


def test_set_similarity_join_spark(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "a completely different document about spark"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, None),
        (5, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.a, r.b): (r.inter, r.uni)
        for r in dedup.set_similarity_join(
            docs, k=5, t_num=1, t_den=2
        ).collect()
    }

    def shingles(txt):
        txt = " ".join(txt.lower().split())
        return {txt[i : i + 5] for i in range(len(txt) - 4)}

    sets = {i: shingles(t) for i, t in rows if t is not None and len(t) >= 5}
    want = {}
    for a, b in _brute_jaccard_pairs(sets, 1, 2):
        inter = len(sets[a] & sets[b])
        want[(a, b)] = (inter, len(sets[a] | sets[b]))
    assert got == want
    assert (0, 3) in got and got[(0, 3)][0] == got[(0, 3)][1]  # exact dup


# --------------------------------------------------- winnowing (python)


def _winnow_select(hashes, w):
    """Reference winnowing (Schleimer et al. Fig. 5 semantics): for each
    window of w hashes select the min, ties to the RIGHTMOST; return the
    distinct (pos, hash) selected set.  Positions are 1-based."""
    out = set()
    n = len(hashes)
    for j in range(0, n - w + 1):
        best = j
        for i in range(j + 1, j + w):
            if hashes[i] <= hashes[best]:
                best = i
        out.add((best + 1, hashes[best]))
    return out


@given(
    hashes=st.lists(st.integers(0, 7), min_size=4, max_size=40),
    w=st.integers(2, 6),
)
@settings(**PROP)
def test_winnow_packed_key_matches_reference(hashes, w):
    """The packed-key trick (min of h*B + (B - pos)) must reproduce the
    paper's min-with-rightmost-tie selection exactly, including heavy
    tie streams (hash alphabet of 8 forces ties)."""
    if len(hashes) < w:
        return
    B = 1 << 20
    n = len(hashes)
    got = set()
    for j in range(0, n - w + 1):
        mk = min(
            hashes[i] * B + (B - (i + 1)) for i in range(j, j + w)
        )
        got.add((B - mk % B, mk // B))
    assert got == _winnow_select(hashes, w)


def test_winnow_fingerprints_spark(spark):
    rows = [
        (0, "abcdefabcdefabcdef"),
        (1, "abcdefabcdefabcdef"),
        (2, "zzzzzzzzzzzzzzzzzz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    k, w = 5, 4
    fps = dedup.winnow_fingerprints(docs, k=k, w=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))

    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for doc_id, txt in rows:
        grams = [txt[i : i + k] for i in range(len(txt) - k + 1)]
        want = _winnow_select([h32(g) for g in grams], w)
        assert by_doc[doc_id] == want, doc_id
    # identical docs -> identical fingerprint sets; disjoint alphabets
    # -> disjoint fingerprints
    f0 = {fp for _, fp in by_doc[0]}
    f2 = {fp for _, fp in by_doc[2]}
    assert f0 == {fp for _, fp in by_doc[1]}
    assert not (f0 & f2)


# ------------------------------------------------- Misra-Gries (python)


@given(
    stream=st.lists(st.integers(0, 9), min_size=1, max_size=300),
    k=st.integers(1, 8),
    cuts=st.lists(st.integers(0, 300), max_size=4),
)
@settings(**PROP)
def test_mg_partition_summaries_superset(stream, k, cuts):
    """Union of per-partition MG summaries contains every global heavy
    hitter, for ANY partitioning of the stream (the property that makes
    misra_gries_heavy partition-invariant)."""
    n = len(stream)
    bounds = sorted({0, n, *[min(c, n) for c in cuts]})
    cand = set()
    for lo, hi in zip(bounds, bounds[1:]):
        counts: dict = {}
        for x in stream[lo:hi]:
            counts[x] = counts.get(x, 0) + 1
            counts = sketch.mg_compress(counts, k)
        cand |= set(counts)
    exact: dict = {}
    for x in stream:
        exact[x] = exact.get(x, 0) + 1
    heavy = {x for x, c in exact.items() if c * (k + 1) > n}
    assert heavy <= cand


def test_misra_gries_heavy_spark(spark):
    vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(40)]
    items = spark.createDataFrame(
        [(v,) for v in vals], "item string"
    ).repartition(5)
    got = {
        r.item: r.cnt
        for r in sketch.misra_gries_heavy(items, "item", k=3).collect()
    }
    n = len(vals)
    want = {
        v: c
        for v, c in pd.Series(vals).value_counts().items()
        if c * 4 > n
    }
    assert got == want == {"a": 50}


# ------------------------------------------------ bucketed range join


@given(
    ivals=st.lists(
        # spans down to -40: degenerate intervals (hi <= lo) contain
        # no points and must contribute no pairs — and no exploded
        # bucket rows (the r11 guard; an unguarded descending
        # F.sequence used to emit O(span/bucket) spurious rows)
        st.tuples(st.integers(0, 100), st.integers(-40, 40)),
        min_size=1,
        max_size=12,
    ),
    pts=st.lists(st.integers(0, 160), min_size=1, max_size=30),
    bucket=st.sampled_from([1, 3, 7, 16, 64]),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_buckets_exact(spark, ivals, pts, bucket):
    """Bucketed range join == naive theta join, each pair exactly once,
    for arbitrary bucket widths (including widths smaller and larger
    than every interval) and degenerate (empty) intervals."""
    from openseize_spark.operators import relational as rel

    iv = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(ivals)],
        "iid bigint, lo bigint, hi bigint",
    )
    pt = spark.createDataFrame(
        [(j, t) for j, t in enumerate(pts)], "pid bigint, t bigint"
    )
    got = sorted(
        (r.iid, r.pid)
        for r in rel.range_join_buckets(iv, pt, bucket=bucket).collect()
    )
    want = sorted(
        (i, j)
        for i, (lo, span) in enumerate(ivals)
        for j, t in enumerate(pts)
        if lo <= t < lo + span
    )
    assert got == want


# ------------------------------------------------------------ WOE


def test_woe_encode_known_values(spark, tmp_path):
    """WOE on a hand-computable table: two categories with known
    pos/neg splits."""
    import __spark_entry__ as entry

    rows = []
    eid = 0
    # hour 0, type 'click': 3 pos (value 60), 1 neg (value 10)
    for v in (60.0, 60.0, 60.0, 10.0):
        rows.append((eid, "2024-01-01 00:10:00", 1, "click", v, "{}"))
        eid += 1
    # hour 5, type 'view': 1 pos, 4 neg
    for v in (70.0, 5.0, 5.0, 5.0, 5.0):
        rows.append((eid, "2024-01-01 05:10:00", 2, "view", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    out = {
        (r.event_type, r.hr): r
        for r in entry.queries()["woe_encode"](spark, d).collect()
    }
    c = 2
    pt, nt = 4, 5
    r = out[("click", 0)]
    assert (r.pos, r.neg) == (3, 1)
    assert r.woe == pytest.approx(
        math.log(((3 + 0.5) / (pt + 0.5 * c)) / ((1 + 0.5) / (nt + 0.5 * c)))
    )
    r = out[("view", 5)]
    assert (r.pos, r.neg) == (1, 4)
    assert r.woe == pytest.approx(
        math.log(((1 + 0.5) / (pt + 0.5 * c)) / ((4 + 0.5) / (nt + 0.5 * c)))
    )


# --------------------------------------------- isotonic (minimax = PAVA)


def _pava(y, wts):
    """Classic pool-adjacent-violators on weighted means (Fractions in,
    Fractions out)."""
    from fractions import Fraction

    blocks = [[Fraction(v), Fraction(w)] for v, w in zip(y, wts)]
    out = []
    for v, w in blocks:
        out.append([v * w, w])
        while len(out) > 1 and out[-2][0] * out[-1][1] >= out[-1][0] * out[-2][1]:
            s2, w2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += w2
    fit = []
    for s, w in out:
        fit.extend([s / w] * int(w) if False else [])
    # expand by block widths tracked separately
    res = []
    i = 0
    widths = []
    # recompute widths by re-running with indices
    blocks2 = [[Fraction(v) * Fraction(w), Fraction(w), 1] for v, w in zip(y, wts)]
    out2 = []
    for s, w, c in blocks2:
        out2.append([s, w, c])
        while len(out2) > 1 and out2[-2][0] * out2[-1][1] >= out2[-1][0] * out2[-2][1]:
            s2, w2, c2 = out2.pop()
            out2[-1][0] += s2
            out2[-1][1] += w2
            out2[-1][2] += c2
    for s, w, c in out2:
        res.extend([s / w] * c)
    return res


def _minimax_iso(y, wts):
    """iso(i) = max_{l<=i} min_{j>=i} weighted_mean(l..j), exact
    Fractions — the formulation the Spark query evaluates."""
    from fractions import Fraction

    n = len(y)
    out = []
    for i in range(n):
        best = None
        for l in range(0, i + 1):
            worst = None
            for j in range(i, n):
                s = sum(Fraction(y[m]) * wts[m] for m in range(l, j + 1))
                w = sum(Fraction(wts[m]) for m in range(l, j + 1))
                m_ = s / w
                worst = m_ if worst is None or m_ < worst else worst
            best = worst if best is None or worst > best else best
        out.append(best)
    return out


@given(
    y=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    wts=st.lists(st.integers(1, 9), min_size=8, max_size=8),
)
@settings(**PROP)
def test_minimax_equals_pava(y, wts):
    wts = wts[: len(y)]
    assert _minimax_iso(y, wts) == _pava(y, wts)


def test_isotonic_calibration_monotone(spark):
    import __spark_entry__ as entry

    rows = (
        entry.queries()["isotonic_calibration"](
            spark, "/root/testdata/sf0.001"
        )
        .orderBy("hr")
        .collect()
    )
    iso = [r.iso_units for r in rows]
    assert iso == sorted(iso), "isotonic fit must be nondecreasing"
    # the fit stays within the observed rate envelope
    rates = [r.rate_units for r in rows]
    assert min(rates) <= min(iso) and max(iso) <= max(rates)


# ----------------------------------------------------------------- SPRT


def test_sprt_ab_brute_force(spark):
    """Replay the per-day first-crossing logic in plain python over the
    same parquet and compare decisions + stopping times."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        str(r.day): (r.n_trials, r.decision, r.n_decide)
        for r in entry.queries()["sprt_ab"](spark, sf).collect()
    }
    A, B, TH = 182321557, -223143551, 2944438979
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(ts AS DATE) AS day, value FROM
        '{sf}/events.parquet' WHERE event_type = 'purchase'
        ORDER BY day, ts, event_id"""
    ).fetchall()
    byday: dict = {}
    for day, value in rows:
        byday.setdefault(str(day), []).append(value)
    want = {}
    for day, vals in byday.items():
        llr, decide, nd = 0, "inconclusive", None
        for i, v in enumerate(vals, 1):
            llr += A if v > 50.0 else B
            if llr >= TH:
                decide, nd = "accept_h1", i
                break
            if llr <= -TH:
                decide, nd = "accept_h0", i
                break
        want[day] = (len(vals), decide, nd)
    assert got == want


# ------------------------------------------------ PCA (power iteration)


def test_pca_power_iteration_vs_numpy(spark, tmp_path):
    """On data with a strong dominant direction, 8 integer power
    rounds must align with numpy's top eigenvector; and an exact
    python replay of the quantized pipeline must match bit-for-bit."""
    import numpy as np

    import __spark_entry__ as entry

    rng = np.random.default_rng(7)
    base = rng.normal(size=(400, 8)) * 0.02
    direction = np.array([3, 1, -2, 0.5, 0, 1, -1, 2], dtype=float)
    direction /= np.linalg.norm(direction)
    base += np.outer(rng.normal(size=400) * 0.3, direction)
    rows = [
        (i, [float(x) for x in base[i]] + [0.0] * 56, 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/embeddings.parquet")
    got = {
        r.d: r.v_units
        for r in entry.queries()["pca_power_iteration"](spark, d).collect()
    }

    # exact python replay from the float32-quantized values
    xs = np.array(
        [[float(np.float32(v)) for v in r[1][:8]] for r in rows]
    )
    xu = np.round(xs * 10**6).astype(object)  # python ints
    n = len(xu)
    S = [int(sum(xu[:, j])) for j in range(8)]
    M = [[int(sum(int(a) * int(b) for a, b in zip(xu[:, i], xu[:, j])))
          for j in range(8)] for i in range(8)]

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    C = [[tdiv(n * M[i][j] - S[i] * S[j], n) for j in range(8)]
         for i in range(8)]
    v = [10**6] * 8
    for _ in range(8):
        raw = [sum(C[i][j] * v[j] for j in range(8)) for i in range(8)]
        m = max(abs(x) for x in raw)
        v = [tdiv(x * 10**6, m) for x in raw]
    assert got == {i + 1: v[i] for i in range(8)}

    # direction agreement with numpy's exact dominant eigenvector
    cov = np.cov(xs.T)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, np.argmax(w)]
    mine = np.array([got[i + 1] for i in range(8)], dtype=float)
    mine /= np.linalg.norm(mine)
    assert abs(float(np.dot(top, mine))) > 0.999


# ------------------------------------------------- sweep-line concurrency


def test_peak_concurrency_brute_force(spark):
    """Sweep-line peak == brute-force max over boundary instants on the
    real sf0.001 events."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: (r.peak, r.first_peak_t)
        for r in entry.queries()["peak_concurrency"](spark, sf).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, epoch_us(ts) FROM '{sf}/events.parquet'
        ORDER BY 1, 2"""
    ).fetchall()
    dur = 30 * 60 * 1_000_000
    bytype: dict = {}
    for et, t0 in rows:
        bytype.setdefault(et, []).append(t0)
    for et, starts in bytype.items():
        best, best_t = -1, None
        for t in sorted(
            set(starts) | {s + dur for s in starts}
        ):  # candidate instants
            c = sum(1 for s in starts if s <= t < s + dur)
            if c > best:
                best, best_t = c, t
        assert got[et][0] == best, et
        assert got[et][1] == best_t, et


@given(
    starts=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    dur=st.integers(1, 12),
)
@settings(**PROP)
def test_sweep_line_tie_groups_deterministic(starts, dur):
    """The (t, cum-multiset) of the sweep is order-invariant within tie
    groups: peak and first-peak-time from a shuffled processing order
    equal the canonical one."""
    import random

    events = [(s, 1) for s in starts] + [(s + dur, -1) for s in starts]

    def run(order):
        cum, rows = 0, []
        for t, d in order:
            cum += d
            rows.append((t, cum))
        peak = max(c for _, c in rows)
        first = min(t for t, c in rows if c == peak)
        return peak, first

    canonical = run(sorted(events))
    rng = random.Random(0)
    for _ in range(5):
        ev = events[:]
        rng.shuffle(ev)
        ev.sort(key=lambda x: (x[0], x[1]))  # stable sort keeps shuffle
        assert run(ev) == canonical


# ------------------------------------------------ consistent-hash ring


def test_consistent_hash_ring_invariant(spark):
    """Adding a shard to the ring may only move keys TO the new shard —
    every off-diagonal transition lands on shard 8 — and the moved
    fraction is a minority of keys."""
    import __spark_entry__ as entry

    rows = entry.queries()["consistent_hash_ring"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.n for r in rows)
    moved = 0
    for r in rows:
        if r.shard_before != r.shard_after:
            assert r.shard_after == 8, (r.shard_before, r.shard_after)
            moved += r.n
    assert 0 < moved < total / 2
    # every original shard still holds keys (no mass eviction)
    assert {r.shard_before for r in rows} == set(range(8))


# --------------------------------------------------- spatial grid join


@given(
    pts=st.lists(
        st.tuples(
            # +/- 4.0 after the 1e-6 scaling: WELL below the old
            # implicit [-2, ...) domain, so this range regresses the
            # r11 sign-safe floor-division fix (truncating DIV on a
            # shifted negative coordinate mis-bucketed and dropped
            # qualifying pairs)
            st.integers(-4000000, 4000000),
            st.integers(-4000000, 4000000),
        ),
        min_size=2,
        max_size=30,
        unique=True,
    ),
    eps=st.sampled_from([30000, 50000, 120000]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grid_eps_pairs_exact(spark, pts, eps):
    """Grid-bucketed spatial join == brute-force distance filter,
    including pairs straddling cell boundaries and any-sign
    coordinates."""
    from openseize_spark.llm import similarity

    rows = [
        (i, [x / 10**6, y / 10**6] + [0.0] * 62)
        for i, (x, y) in enumerate(pts)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    got = {
        (r.a, r.b): r.d2u
        for r in similarity.grid_eps_pairs(emb, eps_units=eps).collect()
    }
    # brute force over the SAME float32-quantized coordinates
    import numpy as np

    q = [
        (
            int(round(float(np.float32(x / 10**6)) * 10**6)),
            int(round(float(np.float32(y / 10**6)) * 10**6)),
        )
        for x, y in pts
    ]
    want = {}
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            d2 = (q[i][0] - q[j][0]) ** 2 + (q[i][1] - q[j][1]) ** 2
            if d2 <= eps * eps:
                want[(i, j)] = d2
    assert got == want


# -------------------------------------------------------- DAG layering


def test_dag_layers_brute_force(spark):
    """Relaxation layering == python longest-path on a hand DAG, and
    saturation caps deeper chains at `rounds`."""
    edges = [
        (0, 1), (1, 2), (2, 3),          # chain depth 3
        (0, 4), (4, 3),                  # diamond into 3
        (5, 6),                          # separate short chain
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),  # depth 5
    ]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.lv: r.n_docs for r in dedup.dag_layers(df, rounds=8).collect()}

    import collections

    lv = collections.defaultdict(int)
    for _ in range(8):
        nxt = dict(lv)
        for u, v in edges:
            nxt[v] = max(nxt.get(v, 0), lv[u] + 1)
        for n in {x for e in edges for x in e}:
            nxt.setdefault(n, 0)
        lv = collections.defaultdict(int, nxt)
    want = collections.Counter(lv[n] for n in {x for e in edges for x in e})
    assert got == dict(want)
    # saturation: rounds=2 caps the depth-5 chain
    got2 = {r.lv: r.n_docs for r in dedup.dag_layers(df, rounds=2).collect()}
    assert max(got2) == 2


# -------------------------------------------------------- Hilbert curve


def _hilbert_ref(x, y, bits):
    n = 1 << bits
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
    return d


def test_hilbert_key_matches_reference_and_is_a_bijection(spark):
    from openseize_spark.functions.scalar import with_hilbert_key

    bits = 4
    n = 1 << bits
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)],
        "x bigint, y bigint",
    )
    got = {
        (r.x, r.y): r.hd
        for r in with_hilbert_key(cells, "x", "y", bits=bits).collect()
    }
    for (x, y), hd in got.items():
        assert hd == _hilbert_ref(x, y, bits), (x, y)
    assert sorted(got.values()) == list(range(n * n))  # bijection
    # curve continuity: consecutive d are 4-adjacent cells
    byd = {d: xy for xy, d in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = byd[d], byd[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_beats_zorder_on_range_query_clustering(spark):
    """The measurable layout win (Moon et al. 1996): a rectangular
    range predicate touches FEWER contiguous index runs — i.e. fewer
    files after clustering — under Hilbert order than Morton order."""
    import random

    from openseize_spark.functions.scalar import (
        with_hilbert_key,
        zorder_key,
    )

    bits = 5
    n = 1 << bits
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)],
        "x bigint, y bigint",
    )
    rows = (
        with_hilbert_key(cells, "x", "y", bits=bits)
        .withColumn("zd", zorder_key(F.col("x"), F.col("y"), bits=bits))
        .collect()
    )
    hd = {(r.x, r.y): r.hd for r in rows}
    zd = {(r.x, r.y): r.zd for r in rows}

    def runs(idx, box):
        ds = sorted(idx[c] for c in box)
        return 1 + sum(1 for a, b in zip(ds, ds[1:]) if b != a + 1)

    rng = random.Random(42)
    hruns = zruns = 0
    for _ in range(50):
        x0, y0 = rng.randrange(n - 4), rng.randrange(n - 4)
        w, h = rng.randrange(2, 8), rng.randrange(2, 8)
        box = [
            (x, y)
            for x in range(x0, min(n, x0 + w))
            for y in range(y0, min(n, y0 + h))
        ]
        hruns += runs(hd, box)
        zruns += runs(zd, box)
    assert hruns < zruns


# ------------------------------------------- streaming as-of enrichment


def test_streaming_asof_boundary_invariance(spark, tmp_path):
    """The accumulated streaming as-of output must equal the one-shot
    batch as-of join regardless of micro-batch boundaries (1-file vs
    4-file source cuts)."""
    import pandas as pd

    from openseize_spark.operators.relational import asof_join
    from openseize_spark.streaming import sinks

    rows = []
    eid = 0
    for u in range(6):
        for m in range(10):
            rows.append(
                (eid, f"2024-01-02 0{u}:{m:02d}:00", u,
                 "click" if m % 3 else "purchase", float(m), "{}")
            )
            eid += 1
    df = (
        spark.createDataFrame(
            rows,
            "event_id bigint, ts string, user_id bigint,"
            " event_type string, value double, props string",
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )

    def run(nfiles, tag):
        src = str(tmp_path / f"src{tag}")
        df.repartition(nfiles, "user_id").write.mode("overwrite").parquet(
            src
        )
        out = sinks.asof_enrich(
            spark, src, df.schema, clicks, str(tmp_path / f"tgt{tag}"),
            query_name=f"t_asof_{tag}",
        )
        return sorted(
            (r.user_id, r.event_id, r.lag_us) for r in out.collect()
        )

    one, four = run(1, "a"), run(4, "b")
    assert one == four
    # equals the one-shot batch as-of join
    purchases = df.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    batch = asof_join(
        purchases, clicks, on="user_id", left_t="ts", right_t="ts",
        payload=["event_id"], suffix="_click",
    ).select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros("ts_click")).alias("lag_us"),
    )
    want = sorted((r.user_id, r.event_id, r.lag_us) for r in batch.collect())
    assert one == want
    # sanity: every user's first event is a purchase with no prior click
    assert any(l is None for _, _, l in one)
    assert any(l is not None and l > 0 for _, _, l in one)


# ------------------------------------------------- greedy set cover


def test_greedy_set_cover_brute_force(spark):
    """Spark greedy selection == python greedy with the same
    (max gain, min id) tie-break, including early stop when a doc's
    shingles are fully covered."""
    from openseize_spark.llm.sampling import greedy_set_cover

    rows = [
        (0, "aaaaabbbbbccccc"),       # shingles from 3 zones
        (1, "aaaaabbbbb"),            # subset of doc 0
        (2, "dddddeeeee"),            # disjoint
        (3, "cccccddddd"),            # bridges 0 and 2
        (4, "aaaaa"),                 # fully inside doc 0
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        (r.step, r.doc_id, r.gain, r.covered_total)
        for r in greedy_set_cover(docs, k=5, steps=8)
        .orderBy("step")
        .collect()
    ]

    def shingles(t):
        return {t[i : i + 5] for i in range(len(t) - 4)}

    sets = {i: shingles(t) for i, t in rows}
    covered: set = set()
    want = []
    for step in range(1, 9):
        gains = sorted(
            ((len(s - covered), -i) for i, s in sets.items()),
            key=lambda x: (-x[0], -x[1]),
        )
        g, negi = gains[0]
        if g == 0:
            break
        covered |= sets[-negi]
        want.append((step, -negi, g, len(covered)))
    assert got == want
    # the greedy terminated before 8 steps (universe exhausts)
    assert len(got) < 8


# --------------------------------------------------- Fellegi-Sunter


def test_fellegi_sunter_scores_known_values(spark):
    """Hand-built pairs hit all three decisions with exactly the
    weights the constants table implies."""
    import math

    from openseize_spark.llm.dedup import (
        _FS_LOWER,
        _FS_UPPER,
        _FS_WEIGHTS,
        fellegi_sunter_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "t", "en", "src0", 100),
            (1, "t", "en", "src0", 120),   # all three agree with 0
            (2, "t", "de", "src1", 900),   # all three disagree with 0
            (3, "t", "en", "src1", 130),   # lang+band agree, source not
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "a bigint, b bigint"
    )
    got = {
        (r.a, r.b): (r.score_units, r.decision)
        for r in fellegi_sunter_scores(docs, cand).collect()
    }
    wl, ws, wb = (
        _FS_WEIGHTS["lang"],
        _FS_WEIGHTS["source"],
        _FS_WEIGHTS["len"],
    )
    assert got[(0, 1)] == (wl[0] + ws[0] + wb[0], "match")
    assert got[(0, 2)] == (wl[1] + ws[1] + wb[1], "non_match")
    assert got[(0, 3)] == (wl[0] + ws[1] + wb[0], "review")
    # the weight constants really are the quantized log-likelihoods
    assert wl[0] == round(math.log(0.95 / 0.25) * 1e9)
    assert ws[1] == round(math.log(0.10 / 0.80) * 1e9)
    assert _FS_UPPER == round(math.log(100.0) * 1e9) == -_FS_LOWER


# --------------------------------------------------------- BOM rollup


def test_bom_rollup_brute_force(spark, tmp_path):
    """Iterative subtree rollup == python recursion over the same
    4-ary tree, on a synthetic part table small enough to verify by
    hand."""
    import __spark_entry__ as entry

    n = 85  # spans 4 levels of the 4-ary tree
    rows = [(k, f"p{k}", "B", "T", 1, float(k) + 0.5) for k in range(n)]
    df = spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/part.parquet")
    got = {
        r.k: (r.sub_cents, r.n_nodes)
        for r in entry.queries()["bom_rollup"](spark, d).collect()
    }

    import functools

    own = {k: round((k + 0.5) * 100) for k in range(n)}
    children: dict = {}
    for k in range(1, n):
        children.setdefault((k - 1) // 4, []).append(k)

    @functools.lru_cache(maxsize=None)
    def sub(k):
        c_tot = sum(sub(c)[0] for c in children.get(k, []))
        c_n = sum(sub(c)[1] for c in children.get(k, []))
        return own[k] + c_tot, 1 + c_n

    want = {k: sub(k) for k in range(min(n, 64))}
    assert got == want
    # the root's subtree covers everything
    assert got[0] == (sum(own.values()), n)


def test_bom_rollup_deep_sparse_chain(spark, tmp_path):
    """Regression for the r11 derived-round-count fix: a sparse
    ancestor CHAIN whose deepest key sits at tree depth 13 — one
    level past the old fixed 12 rounds, so the old code would have
    returned the top node's subtree total silently missing the
    deepest leaf.  The derived parent-walk depth converges at any
    key magnitude."""
    import __spark_entry__ as entry

    keys = []
    k = 50_000_000  # depth-13 node of the 4-ary tree
    while k > 0:
        keys.append(k)
        k = (k - 1) // 4
    assert len(keys) == 13
    rows = [(k, f"p{k}", "B", "T", 1, 1.00) for k in keys]
    df = spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/part.parquet")
    got = {
        r.k: (r.sub_cents, r.n_nodes)
        for r in entry.queries()["bom_rollup"](spark, d).collect()
    }
    # the chain keys under 64 are 2, 11, 47 (depths 1-3); each
    # subtree is the rest of the 13-node chain at 100 cents each —
    # k=2's total counts all 13 nodes including the depth-13 leaf
    # the old fixed-12-round code would have missed
    assert got == {2: (1300, 13), 11: (1200, 12), 47: (1100, 11)}
