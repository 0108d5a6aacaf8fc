"""Scalar / element-wise column functions (SURVEY §2.8).

All pure pyspark.sql.functions expressions — JVM-side, codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def edf_decode(digital: Column, slope, offset) -> Column:
    """EDF digital->physical linear decode p = slope*d + offset
    (reference: file_io/edf.py:382-419; slopes/offsets :259-289)."""
    return digital * F.lit(float(slope)) + F.lit(float(offset))


def edf_encode(physical: Column, slope, offset) -> Column:
    """Inverse encode with rint (reference: file_io/edf.py:678-697)."""
    return F.round((physical - F.lit(float(offset))) / F.lit(float(slope))).cast("int")


def envelope(re: Column, im: Column) -> Column:
    """Analytic amplitude |z| (reference:
    experimental/coupling/transforms.py:56-77)."""
    return F.sqrt(re * re + im * im)


def phase_wrapped(re: Column, im: Column) -> Column:
    """Analytic phase in [0, 2π) — atan2 + wrap (reference:
    experimental/coupling/transforms.py:79-106)."""
    p = F.atan2(im, re)
    return F.when(p < 0, p + 2 * math.pi).otherwise(p)


def zorder_key(a: Column, b: Column, bits: int = 21) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns
    into one ``2*bits``-wide key — the space-filling-curve layout key
    behind multi-dimensional data skipping (Delta/Iceberg OPTIMIZE
    ZORDER): sorting by this key clusters rows that are close in BOTH
    dimensions, so per-file min/max statistics prune scans on either
    predicate.

    Pure integer shift/mask arithmetic (codegen, no UDF), identical in
    any engine with 64-bit ops.  Values are truncated to ``bits`` low
    bits; keep bits <= 31 so the result fits an int64.
    """
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def zorder_key_sql(a: str, b: str, bits: int = 21) -> str:
    """DuckDB SQL expression equal to zorder_key (same shift/mask
    chain)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def with_hilbert_key(
    df,
    x: str,
    y: str,
    bits: int = 6,
    out: str = "hd",
):
    """Hilbert-curve index d of the cell (x, y) on a 2^bits x 2^bits
    grid — the space-filling-curve layout key with strictly better
    locality than ``zorder_key``: consecutive d values are ALWAYS
    4-adjacent cells (Morton order jumps across quadrant seams), so
    files clustered by d carry tighter per-file min/max ranges on both
    dimensions.

    The classic top-down quadrant walk (Wikipedia xy2d): at each level
    s = 2^i the quadrant bits (rx, ry) contribute s^2 * ((3*rx) XOR
    ry), then the frame is reflected/swapped.  x and y mutate per
    level, so this is a per-level PROJECTION transformer (one
    withColumns step per level keeps the expression tree linear —
    folding it into a single Column would copy the subtree ~3x per
    level).  Pure integer CASE/shift arithmetic, codegen-friendly, no
    UDF; identical algebra is emitted for the DuckDB oracle by
    ``hilbert_ctes_sql``.  Inputs must already lie in [0, 2^bits).
    Returns df with the int64 ``out`` column added (helper columns
    dropped)."""
    from pyspark.sql import functions as F

    n = 1 << bits
    cur = df.withColumn("_hx", F.col(x).cast("long")).withColumn(
        "_hy", F.col(y).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        x1 = F.when(flip, F.lit(n - 1) - F.col("_hx")).otherwise(
            F.col("_hx")
        )
        y1 = F.when(flip, F.lit(n - 1) - F.col("_hy")).otherwise(
            F.col("_hy")
        )
        cur = cur.withColumns(
            {
                out: F.col(out)
                + F.lit(s * s) * (rx * 3).bitwiseXOR(ry),
                "_hx": F.when(swap, y1).otherwise(x1),
                "_hy": F.when(swap, x1).otherwise(y1),
            }
        )
    return cur.drop("_hx", "_hy")


def hilbert_ctes_sql(
    inner: str, x: str = "x", y: str = "y", bits: int = 6
) -> str:
    """DuckDB CTE chain replaying ``with_hilbert_key`` over the relation
    ``inner`` (must expose integer columns x, y plus any carried
    columns named in the final select).  Exposes the result as
    ``hsteps(x, y, hd, ...)`` where hd is the Hilbert index."""
    n = 1 << bits
    ctes = [
        f"""h{bits} AS (
          SELECT *, CAST({x} AS BIGINT) AS _hx, CAST({y} AS BIGINT)
                 AS _hy, CAST(0 AS BIGINT) AS _hd
          FROM ({inner})
        )"""
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        prev = f"h{i + 1}"
        ctes.append(f"""h{i} AS (
          SELECT * EXCLUDE (_hx, _hy, _hd),
                 _hd + {s * s} * xor(3 * ((_hx >> {i}) & 1),
                                     ((_hy >> {i}) & 1)) AS _hd,
                 CASE WHEN ((_hy >> {i}) & 1) = 0 THEN
                      CASE WHEN ((_hx >> {i}) & 1) = 1
                           THEN {n - 1} - _hy ELSE _hy END
                      ELSE _hx END AS _hx,
                 CASE WHEN ((_hy >> {i}) & 1) = 0 THEN
                      CASE WHEN ((_hx >> {i}) & 1) = 1
                           THEN {n - 1} - _hx ELSE _hx END
                      ELSE _hy END AS _hy
          FROM {prev}
        )""")
    ctes.append(
        "hsteps AS (SELECT * EXCLUDE (_hx, _hy), _hd AS hd FROM h0)"
    )
    return ",\n        ".join(ctes)
