"""Multimodal columns: images / audio / video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libraries in this container,
per the build constraints) behind ``DecodeUnavailable`` with a
deterministic fake for tests — but all Spark-side plumbing is real:
schemas, Arrow batch shapes, mapInPandas signatures, partitioning.

Every operator accepts an injectable ``decode_fn`` so a real decoder
(PIL/cv2/ffmpeg wrapper) drops in without touching schemas, queries, or
batch plumbing — the callable is closed over by the Arrow UDF and must be
cloudpickle-serializable:

    image ops:  decode_fn(payload: bytes, meta: dict) -> float ndarray (H, W)
    video ops:  decode_fn(payload, meta, frame_idx: int) -> float ndarray (H, W)
    audio ops:  decode_fn(payload, meta) -> float 1-D waveform

Resolution order: explicit ``decode_fn`` > deterministic fake
(``deterministic_fake=True``) > raise ``DecodeUnavailable``.

Design: a media table is
    (media_id BIGINT, kind STRING, payload BINARY,
     meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
and every transform is `mapInPandas` over bounded Arrow batches so a row's
payload never needs to fit more than once in memory.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised when no decoder is injected and the fake is disabled."""


def _resolve_decoder(
    decode_fn: Callable | None, deterministic_fake: bool, fake: Callable, what: str
) -> Callable:
    if decode_fn is not None:
        return decode_fn
    if deterministic_fake:
        return fake

    def _unavailable(*a, **k):
        raise DecodeUnavailable(
            f"no {what} decoder in this environment — inject decode_fn"
        )

    return _unavailable


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


def _fake_image_decoder(payload: bytes, meta: dict) -> np.ndarray:
    return _fake_decode(payload, meta["width"], meta["height"])


def image_features(
    media: DataFrame,
    deterministic_fake: bool = True,
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Decode -> per-image feature vector (mean/std/edge-energy).

    ``decode_fn(payload, meta) -> (H, W) float array`` injects a real
    decoder; otherwise the deterministic fake (or DecodeUnavailable)
    exercises identical batch shapes and schema.
    Returns (media_id, mean double, std double, edge_energy double).
    """
    schema = "media_id long, mean double, std double, edge_energy double"
    decoder = _resolve_decoder(decode_fn, deterministic_fake, _fake_image_decoder, "image")

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                img = np.asarray(decoder(row.payload, dict(row.meta)), dtype=np.float64)
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


def _fake_frame_decoder(payload: bytes, meta: dict, frame_idx: int) -> np.ndarray:
    return _fake_decode(
        payload[frame_idx:] + payload[:frame_idx], meta["width"], meta["height"]
    )


def frame_sample(
    media: DataFrame,
    every_n: int = 2,
    deterministic_fake: bool = True,
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per kept frame
    (media_id, frame_idx, frame_mean).  ``decode_fn(payload, meta,
    frame_idx) -> (H, W) float array`` injects a real decoder; row
    explosion happens Spark-side so downstream ops shuffle frames, not
    videos."""
    schema = "media_id long, frame_idx int, frame_mean double"
    decoder = _resolve_decoder(decode_fn, deterministic_fake, _fake_frame_decoder, "video")

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                nf = row.meta["n_frames"]
                for fi in range(0, nf, every_n):
                    img = np.asarray(
                        decoder(row.payload, dict(row.meta), fi), dtype=np.float64
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
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode to raw bytes.

    ``decode_fn(payload, meta) -> (H, W) float array`` injects a real
    decoder; the resize math, payload sizes, meta propagation, and Arrow
    batch shapes are identical either way.  Returns the media schema with
    resized payload + updated meta, so resize composes with
    image_features / frame_sample downstream.
    """
    schema = (
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
    )
    decoder = _resolve_decoder(decode_fn, deterministic_fake, _fake_image_decoder, "image")

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                w, h = row.meta["width"], row.meta["height"]
                img = np.asarray(decoder(row.payload, dict(row.meta)), dtype=np.float64)
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


def _fake_audio_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Payload bytes tiled to a 1-s waveform in [-1, 1]."""
    fs = float(meta.get("sample_rate") or 16000)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.tile(arr / 127.5 - 1.0, int(np.ceil(fs / len(arr))))[: int(fs)]


def audio_features(
    media: DataFrame,
    fs: float = 16000.0,
    nfft: int = 256,
    deterministic_fake: bool = True,
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Decode audio payloads -> Welch band energies via the numpy spectral
    kernels — the multimodal-to-DSP bridge.  ``decode_fn(payload, meta) ->
    1-D float waveform`` injects a real decoder.

    Returns (media_id, rms double, low_band double, high_band double):
    rms plus Welch power integrated below/above fs/8.
    """
    from openseize_spark.dsp import kernels

    schema = "media_id long, rms double, low_band double, high_band double"
    decoder = _resolve_decoder(decode_fn, deterministic_fake, _fake_audio_decoder, "audio")

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "audio":
                    continue
                wave = np.asarray(decoder(row.payload, dict(row.meta)), dtype=np.float64)
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
