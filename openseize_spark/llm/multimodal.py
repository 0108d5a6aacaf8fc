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


def synthetic_media_sqlgen(
    spark: SparkSession,
    n: int = 24,
    width: int = 60,
    height: int = 44,
    sample_rate: int = 16000,
    n_frames: int = 10,
) -> DataFrame:
    """Media table whose payloads any ANSI-SQL engine can replay: the 256
    payload bytes are unhex(concat_{j<16} md5(media_id || ':' || j)), so
    byte i is ('0x' || substr(hexchain, 2*i+1, 2))::INT.  This makes the
    deterministic-fake decode paths (byte tiling / rotation) expressible
    as SQL over generate_series, turning the multimodal feature queries
    into hash-checkable oracle rows instead of rows-only checks.

    Built distributedly from spark.range — no driver-side payload loop.
    width*height deliberately defaults to 2640 (not a multiple of 256) so
    frame rotations change frame means.
    """
    base = spark.range(n).select(F.col("id").alias("media_id"))
    hexchain = F.concat(
        *[
            F.md5(F.concat(F.col("media_id").cast("string"), F.lit(f":{j}")))
            for j in range(16)
        ]
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    return base.select(
        "media_id",
        kind.alias("kind"),
        F.unhex(hexchain).alias("payload"),
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            F.lit(n_frames).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


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


# ---------------------------------------------------------------------------
# DuckDB oracle-SQL generators: replay the deterministic fake decodes over
# synthetic_media_sqlgen's md5-chain payloads.  byte i of a payload is
# ('0x' || substr(hexchain, 2*i+1, 2))::INT, so every fake decode (tile /
# rotate / resize / tile-to-wave) is plain arithmetic over generate_series.
# ---------------------------------------------------------------------------


def _hx_cte(n: int) -> str:
    chain = " || ".join(f"md5(media_id::VARCHAR || ':{j}')" for j in range(16))
    return f"""
        WITH ids AS (
          SELECT unnest(generate_series(0, {n - 1})) AS media_id
        ), hx AS (
          SELECT media_id, {chain} AS hs FROM ids
        )"""


def _byte(i_expr: str) -> str:
    return f"(('0x' || substr(hs, 2 * ({i_expr}) + 1, 2))::INT)"


def image_features_oracle_sql(n: int = 24, width: int = 60, height: int = 44) -> str:
    """DuckDB SQL equal to image_features(synthetic_media_sqlgen(n), fake):
    tiled-byte image; mean, two-pass population std, |d/dx| mean."""
    npx = width * height
    return (
        _hx_cte(n)
        + f"""
        , px AS (
          SELECT media_id, u.i,
                 {_byte("u.i % 256")} / 255.0 AS v,
                 {_byte("(u.i + 1) % 256")} / 255.0 AS vn
          FROM hx, unnest(generate_series(0, {npx - 1})) AS u(i)
          WHERE media_id % 3 = 0
        ), mo AS (
          SELECT media_id, avg(v) AS mean FROM px GROUP BY media_id
        ), so AS (
          SELECT p.media_id, sqrt(avg((p.v - mean) * (p.v - mean))) AS std
          FROM px p JOIN mo USING (media_id) GROUP BY p.media_id
        ), eo AS (
          SELECT media_id, avg(abs(vn - v)) AS edge_energy
          FROM px WHERE (i % {width}) < {width - 1} GROUP BY media_id
        )
        SELECT mo.media_id, round(mo.mean, 9) AS mean,
               round(so.std, 9) AS std,
               round(eo.edge_energy, 9) AS edge_energy
        FROM mo JOIN so USING (media_id) JOIN eo USING (media_id)"""
    )


def frame_sample_oracle_sql(
    n: int = 24,
    width: int = 60,
    height: int = 44,
    every_n: int = 2,
    n_frames: int = 10,
) -> str:
    """DuckDB SQL equal to frame_sample(synthetic_media_sqlgen(n), every_n):
    frame fi decodes the payload rotated by fi bytes, so pixel p of frame
    fi is byte (fi + p%256) % 256."""
    npx = width * height
    fis = ", ".join(str(f) for f in range(0, n_frames, every_n))
    return (
        _hx_cte(n)
        + f"""
        , fr AS (
          SELECT media_id, hs, u.fi
          FROM hx, unnest([{fis}]) AS u(fi)
          WHERE media_id % 3 = 2
        ), fpx AS (
          SELECT media_id, fi,
                 {_byte("(fi + (u.p % 256)) % 256")} / 255.0 AS v
          FROM fr, unnest(generate_series(0, {npx - 1})) AS u(p)
        )
        SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
               round(avg(v), 9) AS frame_mean
        FROM fpx GROUP BY media_id, fi"""
    )


def resize_features_oracle_sql(
    n: int = 24,
    in_w: int = 60,
    in_h: int = 44,
    out_w: int = 32,
    out_h: int = 24,
) -> str:
    """DuckDB SQL equal to image_features(resize_images(sqlgen media)):
    nearest-neighbor index maps yi = min((y*in_h)//out_h, in_h-1) (same
    for x); the re-encoded byte round-trips exactly, so the resized pixel
    is the source byte at (yi*in_w + xi) % 256."""
    return (
        _hx_cte(n)
        + f"""
        , rp AS (
          SELECT media_id, hs, u.y, w.x,
                 least((u.y * {in_h}) // {out_h}, {in_h - 1}) AS yi,
                 least((w.x * {in_w}) // {out_w}, {in_w - 1}) AS xi
          FROM hx,
               unnest(generate_series(0, {out_h - 1})) AS u(y),
               unnest(generate_series(0, {out_w - 1})) AS w(x)
          WHERE media_id % 3 = 0
        ), rv AS (
          SELECT media_id, y, x,
                 {_byte(f"(yi * {in_w} + xi) % 256")} / 255.0 AS v
          FROM rp
        ), m2 AS (
          SELECT media_id, avg(v) AS mean FROM rv GROUP BY media_id
        ), s2 AS (
          SELECT r.media_id, sqrt(avg((r.v - mean) * (r.v - mean))) AS std
          FROM rv r JOIN m2 USING (media_id) GROUP BY r.media_id
        ), e2 AS (
          SELECT a.media_id, avg(abs(b.v - a.v)) AS edge_energy
          FROM rv a JOIN rv b
            ON b.media_id = a.media_id AND b.y = a.y AND b.x = a.x + 1
          GROUP BY a.media_id
        )
        SELECT m2.media_id, round(m2.mean, 9) AS mean,
               round(s2.std, 9) AS std,
               round(e2.edge_energy, 9) AS edge_energy
        FROM m2 JOIN s2 USING (media_id) JOIN e2 USING (media_id)"""
    )


def audio_features_oracle_sql(
    n: int = 24, fs: float = 2048.0, nfft: int = 64, wave_reps: int = 8
) -> str:
    """DuckDB SQL equal to audio_features(sqlgen media, fs=2048, nfft=64,
    decode_fn=8x-tiled wave): rms plus trapezoid-integrated Welch power
    below/above fs/8, with the PSD replayed by the naive-DFT welch oracle.

    Requires fs/nfft such that the frequency grid values are exact
    doubles (integers here: df = 32.0), because the trapezoid pairing
    joins on freq equality.
    """
    from openseize_spark.plans.oracles import welch_oracle_sql

    nsamp = wave_reps * 256
    cut = float(fs / 8)
    df = float(fs / nfft)
    sig_prefix = (
        _hx_cte(n)
        + f"""
        , signal AS (
          SELECT media_id AS channel, u.t AS t,
                 {_byte("u.t % 256")} / 127.5 - 1.0 AS v
          FROM hx, unnest(generate_series(0, {nsamp - 1})) AS u(t)
          WHERE media_id % 3 = 1
        )"""
    )
    welch = welch_oracle_sql(sig_prefix, nfft=nfft, fs=fs, overlap=0.5)
    wave_v = _byte("u.t % 256") + " / 127.5 - 1.0"
    return f"""
        WITH psd AS (
          SELECT * FROM ({welch})
        ), pl AS (
          SELECT channel, freq, psd FROM psd WHERE freq <= {cut!r}
        ), low AS (
          SELECT a.channel,
                 sum((a.psd + b.psd) / 2.0 * (b.freq - a.freq)) AS low_band
          FROM pl a JOIN pl b
            ON b.channel = a.channel AND b.freq = a.freq + {df!r}
          GROUP BY a.channel
        ), ph AS (
          SELECT channel, freq, psd FROM psd WHERE freq > {cut!r}
        ), high AS (
          SELECT a.channel,
                 sum((a.psd + b.psd) / 2.0 * (b.freq - a.freq)) AS high_band
          FROM ph a JOIN ph b
            ON b.channel = a.channel AND b.freq = a.freq + {df!r}
          GROUP BY a.channel
        ), ids2 AS (
          SELECT unnest(generate_series(0, {n - 1})) AS media_id
        ), hx2 AS (
          SELECT media_id, {" || ".join(f"md5(media_id::VARCHAR || ':{j}')" for j in range(16))} AS hs
          FROM ids2
        ), rms AS (
          SELECT media_id AS channel, sqrt(avg(({wave_v}) * ({wave_v}))) AS rms
          FROM hx2, unnest(generate_series(0, {nsamp - 1})) AS u(t)
          WHERE media_id % 3 = 1
          GROUP BY media_id
        )
        SELECT r.channel AS media_id, round(r.rms, 6) AS rms,
               round(low.low_band, 6) AS low_band,
               round(high.high_band, 6) AS high_band
        FROM rms r
        JOIN low ON low.channel = r.channel
        JOIN high ON high.channel = r.channel"""


def audio_vad(
    media: DataFrame,
    frame_len: int = 200,
    deterministic_fake: bool = True,
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Energy-threshold voice-activity detection: frame the decoded
    waveform into ``frame_len``-sample windows, mark frames whose
    mean-square energy exceeds the media's own mean frame energy, and
    merge consecutive active frames into segments — the speech-span
    pre-filter an audio-pretraining pipeline runs before transcription
    (only active segments reach the expensive ASR stage).  Decode is
    the injectable seam shared with audio_features.

    Exactness: the fake waveform is (2b - 255)/255 per byte, so each
    frame's Σ(2b-255)² is an EXACT int64 the kernel emits raw —
    energy units round(1e9·ssq/(frame_len·255²)) are division-derived
    (IEEE-identical both engines) and the per-media activity
    threshold u·n_frames > Σu is a pure integer compare.  No float
    sum anywhere, unlike the rounded-mean discipline scene_cuts
    needs.

    Scale shape: the frame explosion happens kernel-side (downstream
    shuffles frames, not media blobs); the activity threshold is one
    per-media aggregate broadcast back; segment merge is the lag-gap
    islands pattern per media.  Returns (media_id, seg_start,
    n_frames, peak_units) per active segment.
    """
    from pyspark.sql import Window

    schema = "media_id long, frame_idx int, ssq long"
    decoder = _resolve_decoder(
        decode_fn, deterministic_fake, _fake_audio_decoder, "audio"
    )

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "audio":
                    continue
                wave = np.asarray(
                    decoder(row.payload, dict(row.meta)), dtype=np.float64
                )
                # recover the integer byte lattice: wave = b/127.5 - 1
                # => 2b - 255 = wave * 255 (exactly representable ints)
                lat = np.rint(wave * 255.0).astype(np.int64)
                nf = len(lat) // frame_len
                for f in range(nf):
                    seg = lat[f * frame_len : (f + 1) * frame_len]
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": f,
                            "ssq": int(np.sum(seg * seg)),
                        }
                    )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "frame_idx": pd.Series(dtype="int32"),
                    "ssq": pd.Series(dtype="int64"),
                }
            )

    den = float(frame_len * 255 * 255)
    fr = media.mapInPandas(_frames, schema)
    u = fr.select(
        "media_id",
        "frame_idx",
        F.round(
            F.lit(1e9) * (F.col("ssq").cast("double") / F.lit(den))
        )
        .cast("bigint")
        .alias("_u"),
    ).localCheckpoint(eager=False)  # two consumers: threshold + islands
    tot = u.groupBy("media_id").agg(
        F.sum("_u").cast("bigint").alias("_su"),
        F.count("*").cast("bigint").alias("_nf"),
    )
    act = u.join(tot, on="media_id").filter(
        F.col("_u") * F.col("_nf") > F.col("_su")
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    runs = act.withColumn(
        "_new",
        F.when(
            F.col("frame_idx") - F.lag("frame_idx").over(w) > 1, 1
        ).otherwise(0),
    ).withColumn(
        "_grp",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return runs.groupBy("media_id", "_grp").agg(
        F.min("frame_idx").cast("int").alias("seg_start"),
        F.count("*").cast("bigint").alias("n_frames"),
        F.max("_u").alias("peak_units"),
    ).select("media_id", "seg_start", "n_frames", "peak_units")


def audio_vad_oracle_sql(
    n: int = 24, frame_len: int = 200, sample_rate: int = 16000
) -> str:
    """DuckDB replay of :func:`audio_vad` over the sqlgen media:
    byte-lattice Σ(2b-255)² per frame, the same division-derived
    energy units, integer activity threshold, and lag-gap islands."""
    den = float(frame_len * 255 * 255)
    nf = sample_rate // frame_len
    return (
        _hx_cte(n)
        + f"""
        , fr AS (
          SELECT media_id,
                 CAST(u.s // {frame_len} AS INT) AS frame_idx,
                 sum(CAST((2 * {_byte("u.s % 256")} - 255)
                          * (2 * {_byte("u.s % 256")} - 255)
                          AS HUGEINT)) AS ssq
          FROM hx,
               unnest(generate_series(0, {nf * frame_len - 1})) AS u(s)
          WHERE media_id % 3 = 1
          GROUP BY 1, 2
        ), u AS MATERIALIZED (
          SELECT media_id, frame_idx,
                 CAST(round(1e9 * (CAST(ssq AS DOUBLE)
                                   / CAST({den!r} AS DOUBLE)))
                      AS BIGINT) AS u
          FROM fr
        ), tot AS (
          SELECT media_id, CAST(sum(u) AS BIGINT) AS su,
                 CAST(count(*) AS BIGINT) AS nf
          FROM u GROUP BY 1
        ), act AS (
          SELECT u.media_id, u.frame_idx, u.u
          FROM u JOIN tot USING (media_id)
          WHERE u.u * tot.nf > tot.su
        ), flg AS (
          SELECT media_id, frame_idx, u,
                 CASE WHEN frame_idx - lag(frame_idx) OVER (
                        PARTITION BY media_id ORDER BY frame_idx
                      ) > 1 THEN 1 ELSE 0 END AS ns
          FROM act
        ), runs AS (
          SELECT media_id, frame_idx, u,
                 sum(ns) OVER (
                   PARTITION BY media_id ORDER BY frame_idx
                   ROWS UNBOUNDED PRECEDING
                 ) AS grp
          FROM flg
        )
        SELECT media_id, CAST(min(frame_idx) AS INT) AS seg_start,
               CAST(count(*) AS BIGINT) AS n_frames,
               CAST(max(u) AS BIGINT) AS peak_units
        FROM runs GROUP BY media_id, grp"""
    )


def scene_cuts(
    media: DataFrame,
    threshold: float = 0.0005,
    deterministic_fake: bool = True,
    decode_fn: Callable | None = None,
) -> DataFrame:
    """Video scene-cut detection: per-frame signature = mean luminance
    (via :func:`frame_sample` at every_n=1), a cut fires where the
    absolute change between consecutive frame means exceeds
    ``threshold`` — the shot-boundary pass a video-pretraining
    pipeline runs before frame sampling/captioning.  Decode is the
    injectable seam shared with frame_sample (real decoder drops in
    via ``decode_fn``; the deterministic fake keeps the full Spark
    plumbing — explode, lag window, filter — hash-checkable).

    Determinism: frame means are rounded to 9 digits FIRST (the
    frame_sample output discipline — numpy's pairwise mean and SQL's
    sequential avg differ at the last ulp), so the consecutive-frame
    delta lands on the 1e-9 grid and quantizes to an exact integer in
    both engines; the threshold compares those identical rounded
    doubles.

    Scale shape: the frame explosion happens Spark-side in
    frame_sample (downstream shuffles frames, not videos), the lag
    window partitions per video, and the filter prunes before any
    further shuffle.  Returns (media_id, frame_idx, delta_units) for
    cut frames (delta in 1e-9 units).
    """
    from pyspark.sql import Window

    fs = frame_sample(
        media,
        every_n=1,
        deterministic_fake=deterministic_fake,
        decode_fn=decode_fn,
    ).select(
        "media_id",
        "frame_idx",
        F.round("frame_mean", 9).alias("_m"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    d = fs.withColumn("_prev", F.lag("_m").over(w))
    delta = F.abs(F.col("_m") - F.col("_prev"))
    return (
        d.filter(F.col("_prev").isNotNull() & (delta > F.lit(float(threshold))))
        .select(
            "media_id",
            "frame_idx",
            F.round(delta * F.lit(1e9)).cast("bigint").alias("delta_units"),
        )
    )


def scene_cuts_oracle_sql(
    n: int = 24,
    width: int = 60,
    height: int = 44,
    n_frames: int = 10,
    threshold: float = 0.0005,
) -> str:
    """DuckDB replay of :func:`scene_cuts` over the sqlgen media: all
    frames decode as byte rotations, means round to 9 digits before
    the lag/diff (matching the engine), deltas quantize to 1e-9."""
    npx = width * height
    fis = ", ".join(str(f) for f in range(0, n_frames))
    return (
        _hx_cte(n)
        + f"""
        , fr AS (
          SELECT media_id, hs, u.fi
          FROM hx, unnest([{fis}]) AS u(fi)
          WHERE media_id % 3 = 2
        ), fpx AS (
          SELECT media_id, fi,
                 {_byte("(fi + (u.p % 256)) % 256")} / 255.0 AS v
          FROM fr, unnest(generate_series(0, {npx - 1})) AS u(p)
        ), fm AS (
          SELECT media_id, fi, round(avg(v), 9) AS m
          FROM fpx GROUP BY media_id, fi
        ), lagd AS (
          SELECT media_id, fi, m,
                 lag(m) OVER (PARTITION BY media_id ORDER BY fi) AS prev
          FROM fm
        )
        SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
               CAST(round(abs(m - prev) * 1e9) AS BIGINT) AS delta_units
        FROM lagd
        WHERE prev IS NOT NULL
          AND abs(m - prev) > CAST({float(threshold)!r} AS DOUBLE)"""
    )
