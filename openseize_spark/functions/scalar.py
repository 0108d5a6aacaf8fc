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
