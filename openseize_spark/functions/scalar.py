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
