"""Stateful streaming operators: carried-state IIR over a live stream.

The reference carries sosfilt state ``zi`` across chunks
(core/numerical.py:326-335); the Structured-Streaming analog is
``applyInPandasWithState`` keyed by (recording_id, channel) with the
(nsections, 2) state flattened into the GroupState (SURVEY §2.10).

Semantics: micro-batches must arrive in non-decreasing t order per
channel (dense EEG streams do).  Each batch is sorted by t, filtered with
the carried zi, and the final state persists for the next batch —
bit-exact vs the batch sosfilt (state carry is exact; see
tests/test_streaming_stateful.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from openseize_spark.dsp import kernels

_OUT_SCHEMA = "recording_id string, channel int, t long, v double"
_STATE_SCHEMA = "zi array<double>"


def make_stateful_sosfilt(sos: np.ndarray):
    """Build the applyInPandasWithState function for a fixed sos array."""
    sos = np.asarray(sos, dtype=np.float64)
    ns = sos.shape[0]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (zi_flat,) = state.get
            zi = np.asarray(zi_flat, dtype=np.float64).reshape(ns, 2)
        else:
            zi = np.zeros((ns, 2))
        for pdf in pdfs:
            pdf = pdf.sort_values("t")
            y, zi = kernels.sosfilt(sos, pdf["v"].to_numpy(), zi)
            yield pd.DataFrame(
                {
                    "recording_id": pdf["recording_id"].to_numpy(),
                    "channel": pdf["channel"].to_numpy(),
                    "t": pdf["t"].to_numpy(),
                    "v": y,
                }
            )
        state.update((zi.reshape(-1).tolist(),))

    return fn


def streaming_sosfilt(signal_stream, sos: np.ndarray):
    """signal_stream: streaming DataFrame (recording_id, channel, t, v).
    Returns the causally-filtered stream with per-channel carried state."""
    return signal_stream.groupBy("recording_id", "channel").applyInPandasWithState(
        make_stateful_sosfilt(sos),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
