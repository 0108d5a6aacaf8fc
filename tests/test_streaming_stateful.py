"""Streaming stateful sosfilt must equal the batch filter bit-for-bit:
the micro-batch boundary is the chunk boundary, and state carry is exact
(the reference's chunked-zi guarantee, core/numerical.py:326-335)."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from openseize_spark.dsp import design, kernels
from openseize_spark.streaming.stateful import streaming_sosfilt


def test_streaming_sosfilt_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(0)
    n = 3000
    x = {ch: rng.normal(size=n) for ch in range(2)}
    spec = design.butter(fpass=10, fstop=20, fs=100.0)

    # three sequential micro-batch files (t order across files)
    src = tmp_path / "stream_src"
    src.mkdir()
    cuts = [0, 1000, 2200, n]
    for i in range(3):
        rows = []
        for ch in range(2):
            sl = slice(cuts[i], cuts[i + 1])
            rows.append(
                pd.DataFrame(
                    {
                        "recording_id": "r0",
                        "channel": ch,
                        "t": np.arange(cuts[i], cuts[i + 1]),
                        "v": x[ch][sl],
                    }
                )
            )
        pdf = pd.concat(rows)
        spark.createDataFrame(
            pdf, schema="recording_id string, channel int, t long, v double"
        ).coalesce(1).write.parquet(str(src / f"batch_{i}"))

    # stream them in order, one file-batch per trigger
    schema = "recording_id string, channel int, t long, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch_*"))
    )
    out = streaming_sosfilt(stream, spec.sos)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("iir_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM iir_stream").toPandas()
    assert len(got) == 2 * n
    for ch in range(2):
        want, _ = kernels.sosfilt(spec.sos, x[ch])
        have = got[got.channel == ch].sort_values("t").v.to_numpy()
        np.testing.assert_allclose(have, want, atol=1e-12)
