"""IIR filter application — the inherently-sequential operator.

reference: core/numerical.py:301-411 (sosfilt / sosfiltfilt with carried
state), filtering/bases.py:153-213 (IIR.__call__, dephase flag).

Causal IIR is a stateful scan along t: it cannot be expressed as a
shuffle-parallel DataFrame op without changing semantics.  Strategy
(SURVEY §7 "genuinely hard" #1):

- parallelism across (recording_id, channel) groups — the same axis the
  reference parallelizes over;
- within a group, ``applyInPandas`` runs the numpy DF2T kernel over the
  whole channel (zero-phase filtfilt *requires* whole-series access for
  the reverse pass, which is why the reference needs its one-chunk-
  lookahead machinery, core/numerical.py:384-411);
- for channels longer than executor memory, ``sosfilt_chunked`` documents
  the carried-zi sequential algorithm (exact, reference's own approach) —
  state carry is exact, so an external driver loop over block boundaries
  yields identical results (tested in tests/test_iir.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from openseize_spark.dsp import kernels
from openseize_spark.dsp.design import SosSpec
from openseize_spark.signal import SignalFrame

_SCHEMA = "recording_id string, channel int, t long, v double"


def sosfilt(sf: SignalFrame, spec: SosSpec | np.ndarray) -> SignalFrame:
    """Causal second-order-section filter per channel
    (reference: core/numerical.py:301-335)."""
    sos = spec.sos if isinstance(spec, SosSpec) else np.asarray(spec, dtype=float)

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y, _ = kernels.sosfilt(sos, pdf["v"].to_numpy())
        return pdf.assign(v=y)

    return sf.with_df(sf.df.groupBy("recording_id", "channel").applyInPandas(_f, _SCHEMA))


def sosfiltfilt(sf: SignalFrame, spec: SosSpec | np.ndarray) -> SignalFrame:
    """Zero-phase forward-backward filter, padtype=None semantics — the
    only mode the reference reproduces exactly when chunked
    (reference: core/numerical.py:338-411)."""
    sos = spec.sos if isinstance(spec, SosSpec) else np.asarray(spec, dtype=float)

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y = kernels.sosfiltfilt(sos, pdf["v"].to_numpy())
        return pdf.assign(v=y)

    return sf.with_df(sf.df.groupBy("recording_id", "channel").applyInPandas(_f, _SCHEMA))


def apply_iir(sf: SignalFrame, spec: SosSpec) -> SignalFrame:
    """Reference IIR.__call__: dephase -> filtfilt else filt
    (reference: filtering/bases.py:185-213)."""
    return sosfiltfilt(sf, spec) if spec.dephase else sosfilt(sf, spec)


def lfilter(sf: SignalFrame, b: np.ndarray, a: np.ndarray) -> SignalFrame:
    """Causal transfer-function filter per channel
    (reference: core/numerical.py:414-446)."""

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y, _ = kernels.lfilter(b, a, pdf["v"].to_numpy())
        return pdf.assign(v=y)

    return sf.with_df(sf.df.groupBy("recording_id", "channel").applyInPandas(_f, _SCHEMA))


def filtfilt(sf: SignalFrame, b: np.ndarray, a: np.ndarray) -> SignalFrame:
    """Zero-phase ba-form filter, padtype=None semantics
    (reference: core/numerical.py:449-520)."""

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y = kernels.filtfilt(b, a, pdf["v"].to_numpy())
        return pdf.assign(v=y)

    return sf.with_df(sf.df.groupBy("recording_id", "channel").applyInPandas(_f, _SCHEMA))


def sosfilt_chunked_scan(x_chunks, sos):
    """Reference-exact chunked sosfilt: a generator consuming ndarray
    chunks and carrying zi (reference: core/numerical.py:301-335) — the
    longer-than-memory fallback documented in SURVEY §7; used by the
    streaming stateful variant (streaming/stateful.py)."""
    z = None
    for chunk in x_chunks:
        y, z = kernels.sosfilt(sos, chunk, z)
        yield y
