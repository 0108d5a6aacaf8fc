"""Multimodal columns: images / audio / video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libraries in this container,
per the build constraints) behind ``DecodeUnavailable`` with a
deterministic fake for tests — but all Spark-side plumbing is real:
schemas, Arrow batch shapes, mapInPandas signatures, partitioning.

Design: a media table is
    (media_id BIGINT, kind STRING, payload BINARY,
     meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
and every transform is `mapInPandas` over bounded Arrow batches so a row's
payload never needs to fit more than once in memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised by real decoders; tests use deterministic_fake=True."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 0) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    a seeded function of media_id."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        payload = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                ["image", "audio", "video"][i % 3],
                payload,
                (64, 48, 16000, 10),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: tile payload bytes
    into a (height, width) float array in [0,1]."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(arr)))
    return (
        np.tile(arr, reps)[: width * height].reshape(height, width).astype(np.float64)
        / 255.0
    )


def image_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Decode -> per-image feature vector (mean/std/edge-energy).

    Real decode raises DecodeUnavailable (no PIL/cv2 in container); the
    fake path exercises identical batch shapes and schema.
    Returns (media_id, mean double, std double, edge_energy double).
    """
    schema = "media_id long, mean double, std double, edge_energy double"

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                if not deterministic_fake:
                    raise DecodeUnavailable("no image decoder in this environment")
                img = _fake_decode(row.payload, row.meta["width"], row.meta["height"])
                gx = np.diff(img, axis=1)
                out.append(
                    {
                        "media_id": row.media_id,
                        "mean": float(img.mean()),
                        "std": float(img.std()),
                        "edge_energy": float(np.abs(gx).mean()),
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {"media_id": pd.Series(dtype="int64"), "mean": [], "std": [], "edge_energy": []}
            )

    return media.mapInPandas(_feat, schema)


def frame_sample(
    media: DataFrame, every_n: int = 2, deterministic_fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per kept frame
    (media_id, frame_idx, frame_mean).  Real decode is stubbed; row
    explosion happens Spark-side so downstream ops shuffle frames, not
    videos."""
    schema = "media_id long, frame_idx int, frame_mean double"

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                if not deterministic_fake:
                    raise DecodeUnavailable("no video decoder in this environment")
                nf = row.meta["n_frames"]
                for fi in range(0, nf, every_n):
                    img = _fake_decode(
                        row.payload[fi:] + row.payload[:fi],
                        row.meta["width"],
                        row.meta["height"],
                    )
                    out.append(
                        {"media_id": row.media_id, "frame_idx": fi, "frame_mean": float(img.mean())}
                    )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "frame_idx": pd.Series(dtype="int32"),
                    "frame_mean": [],
                }
            )

    return media.mapInPandas(_frames, schema)


def resize_images(
    media: DataFrame,
    out_width: int = 32,
    out_height: int = 24,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode to raw bytes.

    Real decode is stubbed (DecodeUnavailable); the fake path runs the
    actual resize math on the fake-decoded array so payload sizes, meta
    propagation, and Arrow batch shapes are production-shaped.  Returns
    the media schema with resized payload + updated meta, so resize
    composes with image_features / frame_sample downstream.
    """
    schema = (
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                if not deterministic_fake:
                    raise DecodeUnavailable("no image decoder in this environment")
                w, h = row.meta["width"], row.meta["height"]
                img = _fake_decode(row.payload, w, h)
                # nearest-neighbor index maps (floor sampling, endpoint-safe)
                yi = np.minimum((np.arange(out_height) * h) // out_height, h - 1)
                xi = np.minimum((np.arange(out_width) * w) // out_width, w - 1)
                small = img[np.ix_(yi, xi)]
                payload = np.round(small * 255.0).astype(np.uint8).tobytes()
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "payload": payload,
                        "meta": {
                            "width": out_width,
                            "height": out_height,
                            "sample_rate": row.meta["sample_rate"],
                            "n_frames": row.meta["n_frames"],
                        },
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="object"),
                    "payload": pd.Series(dtype="object"),
                    "meta": pd.Series(dtype="object"),
                }
            )

    return media.mapInPandas(_resize, schema)


def audio_features(
    media: DataFrame,
    fs: float = 16000.0,
    nfft: int = 256,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode audio payloads (stubbed) -> Welch band energies via the
    numpy spectral kernels — the multimodal-to-DSP bridge.

    Returns (media_id, rms double, low_band double, high_band double):
    rms plus Welch power integrated below/above fs/8.
    """
    from openseize_spark.dsp import kernels

    schema = "media_id long, rms double, low_band double, high_band double"

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "audio":
                    continue
                if not deterministic_fake:
                    raise DecodeUnavailable("no audio decoder in this environment")
                # fake decode: payload bytes tiled to a 1-s waveform in [-1,1]
                arr = np.frombuffer(row.payload, dtype=np.uint8).astype(np.float64)
                wave = np.tile(arr / 127.5 - 1.0, int(np.ceil(fs / len(arr))))[: int(fs)]
                freqs, psd = kernels.welch(wave, fs, nfft=nfft)
                cut = fs / 8
                out.append(
                    {
                        "media_id": row.media_id,
                        "rms": float(np.sqrt(np.mean(wave**2))),
                        "low_band": float(np.trapz(psd[freqs <= cut], freqs[freqs <= cut])),
                        "high_band": float(np.trapz(psd[freqs > cut], freqs[freqs > cut])),
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "rms": [],
                    "low_band": [],
                    "high_band": [],
                }
            )

    return media.mapInPandas(_feat, schema)
