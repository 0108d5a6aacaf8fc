"""Relational core: the SQL-expressible signal operators.

Every operator here is pure DataFrame API (no Python UDFs) so Catalyst
pushes filters to the parquet scan, prunes columns, and keeps the whole
plan in whole-stage codegen.  Each maps a reference operator (file:line in
docstrings) and is oracle-checked against DuckDB in __spark_entry__.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openseize_spark.signal import SignalFrame


def select_channels(sf: SignalFrame, channels: Sequence[int]) -> SignalFrame:
    """Channel projection (reference: file_io/edf.py:353-373).  The filter
    is pushed into the scan by Catalyst (PushedFilters: In(channel,...))."""
    return sf.with_df(sf.df.filter(F.col("channel").isin(list(channels))))


def slice_time(
    sf: SignalFrame, start: int = 0, stop: int | None = None, step: int = 1
) -> SignalFrame:
    """start/stop/step slice along the production axis with re-indexing —
    the reference implements step-slicing as a mask then compacts
    (reference: core/protools.py:428-497, mask trick at :466-470).

    The compaction (dense re-index of t) is arithmetic for pure slices:
    t' = (t - start) / step — no shuffle needed.
    """
    df = sf.df.filter(F.col("t") >= start)
    if stop is not None:
        df = df.filter(F.col("t") < stop)
    if step != 1:
        df = df.filter((F.col("t") - start) % step == 0)
    df = df.withColumn("t", ((F.col("t") - start) / step).cast("bigint"))
    return sf.with_df(df, fs=sf.fs / step)


def apply_mask(sf: SignalFrame, mask: DataFrame) -> SignalFrame:
    """Boolean mask + compaction (reference: core/producer.py:379-444).

    ``mask`` has columns (recording_id, t, keep BOOLEAN).  Samples where
    keep is true survive; t is re-indexed densely per channel via
    row_number, mirroring MaskedProducer's np.take + re-chunk semantics.
    A mask shorter than the signal truncates it (zip-stops-early,
    reference: core/producer.py:423-427) because the inner join drops
    unmatched samples.
    """
    kept = (
        sf.df.join(mask.filter(F.col("keep")).select("recording_id", "t"),
                   on=["recording_id", "t"], how="inner")
    )
    w = Window.partitionBy("recording_id", "channel").orderBy("t")
    df = kept.withColumn("t", (F.row_number().over(w) - 1).cast("bigint"))
    return sf.with_df(df)


def mask_from_annotations(
    sf: SignalFrame,
    annotations: DataFrame,
    include: bool = True,
    labels: Sequence[str] | None = None,
) -> SignalFrame:
    """Annotation intervals -> sample mask via an interval join
    (reference: file_io/annotations.py:130-181 as_mask; interval covers
    [round(time*fs), round((time+duration)*fs)) ).

    include=True keeps in-interval samples (left_semi); include=False
    drops them (left_anti).  After masking, t is re-indexed densely —
    identical compaction semantics to apply_mask.

    ``annotations``: (recording_id, label, time DOUBLE, duration DOUBLE).
    At scale, the annotation side is small -> broadcast range join.
    """
    ann = annotations
    if labels is not None:
        ann = ann.filter(F.col("label").isin(list(labels)))
    fs = F.lit(float(sf.fs))
    ival = ann.select(
        F.col("recording_id").alias("a_rid"),
        F.round(F.col("time") * fs).cast("bigint").alias("lo"),
        F.round((F.col("time") + F.col("duration")) * fs).cast("bigint").alias("hi"),
    ).distinct()
    cond = (
        (F.col("recording_id") == F.col("a_rid"))
        & (F.col("t") >= F.col("lo"))
        & (F.col("t") < F.col("hi"))
    )
    how = "left_semi" if include else "left_anti"
    kept = sf.df.join(F.broadcast(ival), cond, how)
    w = Window.partitionBy("recording_id", "channel").orderBy("t")
    df = kept.withColumn("t", (F.row_number().over(w) - 1).cast("bigint"))
    return sf.with_df(df)


def add(sf: SignalFrame, other) -> SignalFrame:
    """pro + scalar | pro (reference: core/protools.py:72-124).

    Signal+signal aligns by position -> equi-join on (recording_id,
    channel, t); with both sides bucketed/partitioned on the same key this
    is a co-partitioned sort-merge join.
    """
    return _binop(sf, other, "+")


def multiply(sf: SignalFrame, other) -> SignalFrame:
    """pro * scalar | pro (reference: core/protools.py:127-179)."""
    return _binop(sf, other, "*")


def _binop(sf: SignalFrame, other, op: str) -> SignalFrame:
    if isinstance(other, SignalFrame):
        o = other.df.select(
            "recording_id", "channel", "t", F.col("v").alias("_v2")
        )
        j = sf.df.join(o, on=["recording_id", "channel", "t"], how="inner")
        expr = (F.col("v") + F.col("_v2")) if op == "+" else (F.col("v") * F.col("_v2"))
        return sf.with_df(j.select("recording_id", "channel", "t", expr.alias("v")))
    lit = F.lit(float(other))
    expr = (F.col("v") + lit) if op == "+" else (F.col("v") * lit)
    return sf.with_df(sf.df.withColumn("v", expr))


def multiply_along_axis(sf: SignalFrame, coeffs: DataFrame, axis: str) -> SignalFrame:
    """Multiply by a 1-D coefficient table along `channel` or `t`
    (reference: core/protools.py:343-425).  coeffs: (channel|t, c DOUBLE).
    Small side -> broadcast join, no shuffle of the signal."""
    assert axis in ("channel", "t")
    j = sf.df.join(F.broadcast(coeffs), on=axis, how="inner")
    return sf.with_df(
        j.select("recording_id", "channel", "t", (F.col("v") * F.col("c")).alias("v"))
    )


def pad(sf: SignalFrame, left: int, right: int, value: float = 0.0) -> SignalFrame:
    """Constant padding along the production axis
    (reference: core/protools.py:182-264): synthetic rows unioned on,
    existing t shifted by `left`.  Generated via sequence+explode —
    no driver-side data.
    """
    chans = sf.df.select("recording_id", "channel").distinct()
    n = sf.df.groupBy("recording_id", "channel").agg(F.max("t").alias("_mx"))
    parts = [sf.df.withColumn("t", (F.col("t") + left).cast("bigint"))]
    if left > 0:
        parts.append(
            chans.select(
                "recording_id",
                "channel",
                F.explode(F.sequence(F.lit(0), F.lit(left - 1))).alias("t"),
            ).select(
                "recording_id", "channel", F.col("t").cast("bigint"), F.lit(value).alias("v")
            )
        )
    if right > 0:
        parts.append(
            n.select(
                "recording_id",
                "channel",
                F.explode(
                    F.sequence(F.col("_mx") + 1 + left, F.col("_mx") + left + right)
                ).alias("t"),
            ).select(
                "recording_id", "channel", F.col("t").cast("bigint"), F.lit(value).alias("v")
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return sf.with_df(df)


def nearest_bin(df: DataFrame, key_col: str, targets: DataFrame, target_col: str) -> DataFrame:
    """For each target value, the row whose key is nearest — argmin of
    |key - target| (reference: core/arraytools.py:165-180 nearest1D).
    Implemented as broadcast-join + min_by (single pass, no sort)."""
    j = df.crossJoin(F.broadcast(targets))
    return (
        j.groupBy(target_col)
        .agg(F.min_by(key_col, F.abs(F.col(key_col) - F.col(target_col))).alias("nearest"))
    )


def extend(sf: SignalFrame, n: int, how: str = "zero") -> SignalFrame:
    """Boundary extensions along the production axis
    (reference: core/arraytools.py:183-312 zero/edge/even/odd extend):

    - zero: constant 0 rows (== pad);
    - edge: replicate the first/last sample;
    - even: mirror about the edges (t' = -t and 2N-2-t reflections);
    - odd:  mirrored and negated about the edge value.

    Single pass: each input row conditionally emits its reflected twin(s)
    alongside its shifted self via one conditional-array explode, joined
    against a tiny broadcast per-channel aggregate carrying the last index
    and the two edge values.  (The natural filtered-union formulation
    consumes the input relation six times — ruinous when the signal is a
    derived subtree rather than a pushdown-friendly scan.)
    Output t is re-based so the first extended sample is t = 0.
    """
    if how == "zero":
        return pad(sf, n, n, 0.0)
    df = sf.df
    bounds = df.groupBy("recording_id", "channel").agg(
        F.max("t").alias("_mx"),
        F.min_by("v", "t").alias("_v0"),
        F.max_by("v", "t").alias("_vN"),
    )
    withb = df.join(F.broadcast(bounds), on=["recording_id", "channel"])
    t, v = F.col("t"), F.col("v")
    mx, v0, vN = F.col("_mx"), F.col("_v0"), F.col("_vN")

    def entry(tcol, vcol):
        return F.struct(
            tcol.cast("bigint").alias("t"), vcol.cast("double").alias("v")
        )

    empty = F.array().cast("array<struct<t:bigint,v:double>>")
    base = F.array(entry(t + n, v))
    if how == "edge":
        left = F.when(
            t == 0,
            F.transform(F.sequence(F.lit(0), F.lit(n - 1)), lambda i: entry(i, v)),
        ).otherwise(empty)
        right = F.when(
            t == mx,
            F.transform(
                F.sequence(mx + n + 1, mx + 2 * n), lambda i: entry(i, v)
            ),
        ).otherwise(empty)
    else:
        # left reflection: original index i (1..n) lands at t = n - i;
        # odd negates about the edge value (v' = 2*v_edge - v)
        lv = v if how == "even" else 2 * v0 - v
        rv = v if how == "even" else 2 * vN - v
        left = F.when(
            (t >= 1) & (t <= n), F.array(entry(F.lit(n) - t, lv))
        ).otherwise(empty)
        right = F.when(
            (t >= mx - n) & (t <= mx - 1), F.array(entry(2 * mx - t + n, rv))
        ).otherwise(empty)
    out = withb.select(
        "recording_id",
        "channel",
        F.explode(F.concat(base, left, right)).alias("_p"),
    ).select(
        "recording_id",
        "channel",
        F.col("_p.t").alias("t"),
        F.col("_p.v").alias("v"),
    )
    return sf.with_df(out)


def expand_along_axis(sf: SignalFrame, L: int, value: float = 0.0) -> SignalFrame:
    """Insert L-1 constant samples between consecutive samples
    (upsampling expansion, reference: core/arraytools.py:85-115):
    t' = t*L for originals plus generated filler rows."""
    if L == 1:
        return sf
    orig = sf.df.withColumn("t", (F.col("t") * L).cast("bigint"))
    filler = sf.df.select(
        "recording_id",
        "channel",
        F.explode(F.sequence(F.lit(1), F.lit(L - 1))).alias("_k"),
        (F.col("t") * L).alias("_base"),
    ).select(
        "recording_id",
        "channel",
        (F.col("_base") + F.col("_k")).cast("bigint").alias("t"),
        F.lit(value).alias("v"),
    )
    return sf.with_df(orig.unionByName(filler), fs=sf.fs * L)


def squeeze(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop constant (length-1 axis) key columns — the schema analog of
    producer squeeze (reference: core/protools.py:18-69)."""
    return df.drop(*cols)


def expand_dims(df: DataFrame, **new_cols) -> DataFrame:
    """Insert singleton key columns (reference: core/protools.py:267-338):
    each kwarg adds a constant column, the schema analog of a length-1
    axis."""
    for name, val in new_cols.items():
        df = df.withColumn(name, F.lit(val))
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_t: str = "t",
    right_t: str = "t",
    payload: Sequence[str] = (),
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: attach to each left row the most recent right row at or
    before its time (``backward``; ``forward`` = earliest at-or-after).

    The scale-right formulation is a tagged union + one window pass:
    left and right rows interleave in (key, time) order and
    ``last(..., ignorenulls=True)`` carries the latest right payload onto
    each left row — ONE shuffle on the key and a sort, where the naive
    range join probes every left row against a time interval (quadratic
    in bucket size) and Spark has no native asof operator.

    Right rows at exactly the left time match (inclusive), ordered before
    the left row via the side tag.  ``tolerance`` (in the time column's
    units after a double cast; seconds for timestamps) nulls out matches
    farther away, preserving left rows — left-outer semantics throughout.
    Returns all left columns plus each ``payload`` column and the matched
    right time, ``suffix``-renamed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    pay = list(payload)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = [c for c in left.columns if c not in keys]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    mt_col = right_t + suffix

    # project _t FIRST on the right side: the left columns are nulled
    # below and may share names with right_t (e.g. both sides use "ts"),
    # which would shadow the real right timestamps with nulls
    lt = left.select(
        *keys,
        F.col(left_t).alias("_t"),
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[p]).alias(p + suffix) for p in pay],
        F.lit(None).cast(rtypes[right_t]).alias(mt_col),
    )
    rt = right.select(
        *keys,
        F.col(right_t).cast(ltypes[left_t]).alias("_t"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        F.lit(0).alias("_side"),
        *[F.col(p).alias(p + suffix) for p in pay],
        F.col(right_t).alias(mt_col),
    )

    u = lt.unionByName(rt)
    tcol = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(tcol, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for p in pay:
        u = u.withColumn(p + suffix, F.last(p + suffix, ignorenulls=True).over(w))
    u = u.withColumn(mt_col, F.last(mt_col, ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop("_side", "_t")
    if tolerance is not None:
        d = F.col(left_t).cast("double") - F.col(mt_col).cast("double")
        if direction == "forward":
            d = -d
        ok = d <= tolerance
        for p in pay:
            out = out.withColumn(p + suffix, F.when(ok, F.col(p + suffix)))
        out = out.withColumn(mt_col, F.when(ok, F.col(mt_col)))
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: when a handful of hot key values would
    funnel most of the probe side through a few reducers, salt the
    probe side into ``salt`` sub-keys and replicate the (small) build
    side once per salt value, so every hot key spreads across ``salt``
    tasks.

    The salt must be DETERMINISTIC per row or shuffle retries could
    re-salt rows differently and double-count: it is pmod(xxhash64 of
    the row's columns, salt) — content-derived, task-retry stable
    (``rand()`` or ``monotonically_increasing_id`` would not be).
    Replication multiplies the build side by ``salt``; use this when
    build_rows x salt stays small, which is exactly the skew regime
    (tiny dim, huge skewed fact).

    AQE's skew-join handles sort-merge skew automatically; this
    operator is for the planned-ahead case (known-hot keys, or
    broadcast-disabled environments) and as the building block the
    docs reference.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full joins would emit each UNMATCHED build row once per
        # salt replica — a silent row multiplication
        raise ValueError("salted_join supports inner/left joins only")
    lcols = [c for c in left.columns]
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    l2 = left.withColumn("_salt", salt_col.cast("int"))
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l2.join(r2, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def range_join_buckets(
    intervals: DataFrame,
    points: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
    t: str = "t",
    bucket: int = 1,
) -> DataFrame:
    """Big-big interval x point range join via time bucketing — the
    scale path when NEITHER side fits in a broadcast (the broadcast
    range-semi-join in ``q_interval_mask`` covers the small-dim case;
    Spark's own planner falls back to BroadcastNestedLoop for pure
    theta joins, which is a non-starter when both sides are 100 TB).

    Each interval [lo, hi) explodes to the coarse buckets it covers
    (fan-out bounded by ceil(interval_span / bucket) + 1 — pick
    ``bucket`` near the typical span so it stays O(1)); each point maps
    to exactly ONE bucket, so after the bucket equi-join + exact range
    filter every qualifying (interval, point) pair appears exactly
    once — no distinct needed.  The join is a plain hash equi-join on
    the bucket key: shuffles partition by time bucket, AQE handles
    bucket skew, and nothing is nested-loop.

    All of lo/hi/t must be non-negative int64 on the same scale
    (e.g. epoch micros); hi is exclusive.  Returns the joined rows
    (interval columns + point columns) without the helper bucket.

    Degenerate intervals (hi <= lo) are dropped BEFORE the explode
    (r11 advice fix): they contain no points under half-open
    semantics, but without the guard F.sequence(lo DIV b,
    (hi-1) DIV b) has start > stop and Spark generates a DESCENDING
    sequence — O(span/bucket) spurious bucket rows per bad interval
    that survive the equi-join and are only discarded by the exact
    range filter.
    """
    iv = intervals.filter(F.expr(f"{hi} > {lo}")).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{lo} DIV {bucket}"),
                F.expr(f"({hi} - 1) DIV {bucket}"),
            )
        ),
    )
    pt = points.withColumn("_b", F.expr(f"{t} DIV {bucket}"))
    out = iv.join(pt, "_b").filter(
        (F.col(t) >= F.col(lo)) & (F.col(t) < F.col(hi))
    )
    return out.drop("_b")
