"""Polyphase rational resampling (down/up/resample by L/M).

reference: resampling/resampling.py:95-311 (public API),
core/numerical.py:523-632 (halo'd polyphase kernel).

Spark-native design: the reference re-reads every chunk three times to
build halos (prior/current/next iterators — 3× read amplification, noted
in BASELINE.md).  Here blocks get their halos from one lag + one lead
window function over already-shuffled block rows: **1× read, one
shuffle**, strictly better than the reference's access pattern.

Alignment invariants that make block-local outputs globally exact:
- block_size % M == 0 (reference's chunksize÷M rounding,
  core/numerical.py:585-587), so every block's first output sample index
  is exactly t0·L/M;
- halo = ceil((len(h)-1)/M)·M samples each side (reference's overhang,
  core/numerical.py:595-605); stream edges zero-pad, matching
  whole-signal convolution.

Output sample t' of the full-signal polyphase result y[j] =
(x↑L * h·L)[half + j·M] is computed bit-exactly per block (tested against
the whole-array kernel across partition layouts).
"""

from __future__ import annotations

from math import gcd
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from openseize_spark.dsp import kernels
from openseize_spark.operators import blocks as B
from openseize_spark.signal import SignalFrame


def resample(
    sf: SignalFrame,
    L: int,
    M: int,
    h: np.ndarray | None = None,
    block_size: int = 65536,
) -> SignalFrame:
    """Rational L/M polyphase resample of every channel.

    gcd-reduction and no-op passthrough mirror the reference fast paths
    (resampling/resampling.py:148-150, 294-301).
    """
    g = gcd(L, M)
    L, M = L // g, M // g
    if L == 1 and M == 1:
        return sf
    if h is None:
        h = kernels.default_resample_filter(L, M)
    h = np.asarray(h, dtype=np.float64)
    half = (len(h) - 1) // 2

    # block aligned to M; halo = overhang rounded to multiple of M
    block = block_size - block_size % M
    if block <= 0:
        block = M
    halo = int(np.ceil((len(h) - 1) / M)) * M
    # halo must also cover the filter group delay in upsampled coords
    halo = max(halo, int(np.ceil((half / L + 1) / M)) * M)

    lens = B.channel_lengths(sf.df)
    bdf = B.with_halos(B.to_blocks(sf.df, block), halo, halo, block_size=block)
    bdf = bdf.join(F.broadcast(lens), on=["recording_id", "channel"])

    schema = "recording_id string, channel int, t0 long, vs array<double>"
    hL = h * L

    def _resample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                a = int(row.t0)  # block start (multiple of `block`, so of M)
                mid = np.asarray(row.vs, dtype=np.float64)
                left = np.asarray(row.left, dtype=np.float64)
                right = np.asarray(row.right, dtype=np.float64)
                n = int(row.n)
                b = a + len(mid)  # block end (exclusive)
                lpad = halo - len(left)
                rpad = halo - len(right)
                x = np.concatenate(
                    [np.zeros(max(lpad, 0)), left, mid, right, np.zeros(max(rpad, 0))]
                )
                # global output range for this block
                n_out = -(-n * L // M)  # ceil
                j_start = a * L // M
                j_end = min(-(-b * L // M), n_out)
                if j_end <= j_start:
                    continue
                # strided polyphase (no L*x zero-stuffed array): x covers
                # global samples [a - halo, ...) after the left pad
                vals = kernels.polyphase_apply(
                    hL, x, L, M, j_start, j_end, x_origin=a - halo, half=half
                )
                rows.append(
                    {
                        "recording_id": row.recording_id,
                        "channel": row.channel,
                        "t0": j_start,
                        "vs": vals,
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {"recording_id": [], "channel": [], "t0": [], "vs": []}
            )

    out = bdf.mapInPandas(_resample, schema)
    df = B.from_blocks(out)
    return sf.with_df(df, fs=sf.fs * L / M)


def downsample(sf: SignalFrame, M: int, **kw) -> SignalFrame:
    """reference: resampling/resampling.py:95-161."""
    return resample(sf, 1, M, **kw)


def upsample(sf: SignalFrame, L: int, **kw) -> SignalFrame:
    """reference: resampling/resampling.py:164-230."""
    return resample(sf, L, 1, **kw)
