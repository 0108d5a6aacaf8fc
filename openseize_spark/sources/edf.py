"""EDF (European Data Format) reader/writer + Spark Python DataSource.

Implements the public EDF spec (Kemp et al., edfplus.info): 256-byte
ASCII header + ns×256-byte per-signal headers, then data records of
interleaved 2-byte little-endian integers.  Mirrors the reference's
capabilities (reference: file_io/edf.py:111-166 header bytemap, :317-586
Reader, :591-777 Writer, :780-808 splitter) with a Spark-native design:

- ``EdfDataSource`` (Python Data Source API): one InputPartition per
  record range -> embarrassingly parallel scans; channel selection and
  sample-range pushdown via options (the analog of the reference's
  record locating + channel pruning, file_io/edf.py:421-450, 353-373).
- Output is the engine's long format (channel, t, v): channels with
  *different* sampling rates (irregular EDFs, reference
  file_io/edf.py:485-510 nan-padding) need no padding here — each
  channel simply has its own dense t range.  fs per channel =
  samples_per_record / record_duration.
- ``write_edf`` is a sequential single-writer sink (EDF is an inherently
  sequential record-interleaved file; the reference writes the same way,
  file_io/edf.py:643-697).  Channel-subset splitting = read -> filter ->
  write (reference splitter, file_io/edf.py:780-808).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np


# ------------------------------------------------------------- header
@dataclass
class EdfHeader:
    """Parsed EDF header (reference: file_io/bases.py:26-127 Header dict).

    Per-signal lists have length ``num_signals``; annotation channels
    ('EDF Annotations') are detectable by name (reference:
    file_io/edf.py:200-223).
    """

    version: str = "0"
    patient: str = "X"
    recording: str = "X"
    start_date: str = "01.01.00"
    start_time: str = "00.00.00"
    num_records: int = 0
    record_duration: float = 1.0
    names: list = field(default_factory=list)
    transducers: list = field(default_factory=list)
    physical_dim: list = field(default_factory=list)
    physical_min: list = field(default_factory=list)
    physical_max: list = field(default_factory=list)
    digital_min: list = field(default_factory=list)
    digital_max: list = field(default_factory=list)
    prefiltering: list = field(default_factory=list)
    samples_per_record: list = field(default_factory=list)

    @property
    def num_signals(self) -> int:
        return len(self.names)

    @property
    def header_bytes(self) -> int:
        return 256 + 256 * self.num_signals

    def slopes_offsets(self) -> tuple[np.ndarray, np.ndarray]:
        """Digital->physical decode params p = slope*d + offset
        (reference: file_io/edf.py:259-289)."""
        pmin = np.asarray(self.physical_min, dtype=np.float64)
        pmax = np.asarray(self.physical_max, dtype=np.float64)
        dmin = np.asarray(self.digital_min, dtype=np.float64)
        dmax = np.asarray(self.digital_max, dtype=np.float64)
        slope = (pmax - pmin) / (dmax - dmin)
        offset = pmin - slope * dmin
        return slope, offset

    def samples(self) -> list[int]:
        """Total samples per channel (reference: file_io/edf.py:226-235)."""
        return [spr * self.num_records for spr in self.samples_per_record]


def _afield(b: bytes) -> str:
    return b.decode("ascii", errors="replace").strip()


def read_header(path: str) -> EdfHeader:
    with open(path, "rb") as f:
        h = f.read(256)
        version = _afield(h[0:8])
        patient = _afield(h[8:88])
        recording = _afield(h[88:168])
        start_date = _afield(h[168:176])
        start_time = _afield(h[176:184])
        num_records = int(_afield(h[236:244]))
        record_duration = float(_afield(h[244:252]))
        ns = int(_afield(h[252:256]))
        sig = f.read(256 * ns)

    def per_signal(off: int, width: int, conv):
        out = []
        base = off * ns
        for i in range(ns):
            out.append(conv(_afield(sig[base + i * width : base + (i + 1) * width])))
        return out

    # field layout offsets are cumulative byte counts of prior fields
    names = [ _afield(sig[i*16:(i+1)*16]) for i in range(ns) ]
    p = 16 * ns
    transducers = [_afield(sig[p + i*80: p + (i+1)*80]) for i in range(ns)]
    p += 80 * ns
    physical_dim = [_afield(sig[p + i*8: p + (i+1)*8]) for i in range(ns)]
    p += 8 * ns
    physical_min = [float(_afield(sig[p + i*8: p + (i+1)*8])) for i in range(ns)]
    p += 8 * ns
    physical_max = [float(_afield(sig[p + i*8: p + (i+1)*8])) for i in range(ns)]
    p += 8 * ns
    digital_min = [float(_afield(sig[p + i*8: p + (i+1)*8])) for i in range(ns)]
    p += 8 * ns
    digital_max = [float(_afield(sig[p + i*8: p + (i+1)*8])) for i in range(ns)]
    p += 8 * ns
    prefiltering = [_afield(sig[p + i*80: p + (i+1)*80]) for i in range(ns)]
    p += 80 * ns
    samples_per_record = [int(_afield(sig[p + i*8: p + (i+1)*8])) for i in range(ns)]

    return EdfHeader(
        version=version,
        patient=patient,
        recording=recording,
        start_date=start_date,
        start_time=start_time,
        num_records=num_records,
        record_duration=record_duration,
        names=names,
        transducers=transducers,
        physical_dim=physical_dim,
        physical_min=physical_min,
        physical_max=physical_max,
        digital_min=digital_min,
        digital_max=digital_max,
        prefiltering=prefiltering,
        samples_per_record=samples_per_record,
    )


def _fit8(v: float) -> tuple[str, float]:
    """Largest-precision representation of v that fits the 8-char ASCII
    header field; returns (string, value-as-parsed).  Encoding must use
    the parsed value so read-back decode slopes match exactly."""
    for prec in range(10, 0, -1):
        s = f"{v:.{prec}g}"
        if len(s) <= 8:
            return s, float(s)
    return f"{v:.0e}"[:8], float(f"{v:.0e}"[:8])


def _pad(s: str, n: int) -> bytes:
    b = s.encode("ascii")[:n]
    return b + b" " * (n - len(b))


def write_header(f, hdr: EdfHeader) -> None:
    ns = hdr.num_signals
    f.write(_pad(hdr.version, 8))
    f.write(_pad(hdr.patient, 80))
    f.write(_pad(hdr.recording, 80))
    f.write(_pad(hdr.start_date, 8))
    f.write(_pad(hdr.start_time, 8))
    f.write(_pad(str(hdr.header_bytes), 8))
    f.write(_pad("", 44))
    f.write(_pad(str(hdr.num_records), 8))
    f.write(_pad(str(hdr.record_duration).rstrip("0").rstrip(".") or "0", 8))
    f.write(_pad(str(ns), 4))
    for v in hdr.names:
        f.write(_pad(str(v), 16))
    for v in hdr.transducers or [""] * ns:
        f.write(_pad(str(v), 80))
    for v in hdr.physical_dim or [""] * ns:
        f.write(_pad(str(v), 8))
    for v in hdr.physical_min:
        f.write(_pad(_fit8(v)[0], 8))
    for v in hdr.physical_max:
        f.write(_pad(_fit8(v)[0], 8))
    for v in hdr.digital_min:
        f.write(_pad(_fit8(v)[0], 8))
    for v in hdr.digital_max:
        f.write(_pad(_fit8(v)[0], 8))
    for v in hdr.prefiltering or [""] * ns:
        f.write(_pad(str(v), 80))
    for v in hdr.samples_per_record:
        f.write(_pad(str(v), 8))
    for _ in range(ns):
        f.write(_pad("", 32))


# ------------------------------------------------------------ record IO
def read_records(path: str, hdr: EdfHeader, rec_start: int, rec_stop: int) -> np.ndarray:
    """Raw digital samples for records [rec_start, rec_stop) —
    shape (nrecs, sum(samples_per_record)) int16.  The byte-offset
    np.fromfile pattern mirrors reference file_io/edf.py:452-483."""
    spr_total = sum(hdr.samples_per_record)
    offset = hdr.header_bytes + rec_start * spr_total * 2
    count = (rec_stop - rec_start) * spr_total
    with open(path, "rb") as f:
        d = np.fromfile(f, dtype="<i2", count=count, offset=offset)
    return d.reshape(rec_stop - rec_start, spr_total)


def decode_records(
    raw: np.ndarray, hdr: EdfHeader, channels: list[int]
) -> dict[int, np.ndarray]:
    """Digital -> physical per channel (p = slope*d + offset)."""
    slope, offset = hdr.slopes_offsets()
    bounds = np.cumsum([0] + list(hdr.samples_per_record))
    out = {}
    for ch in channels:
        d = raw[:, bounds[ch] : bounds[ch + 1]].reshape(-1).astype(np.float64)
        out[ch] = slope[ch] * d + offset[ch]
    return out


def write_edf(
    path: str,
    data: dict[int, np.ndarray],
    fs: dict[int, float] | float,
    physical_range: tuple[float, float] | None = None,
    record_duration: float = 1.0,
    names: list[str] | None = None,
) -> EdfHeader:
    """Sequential EDF sink (reference Writer, file_io/edf.py:591-777).

    ``data``: channel -> physical samples.  Channels may have different
    rates (irregular EDF).  Values are linearly encoded to int16 over
    ``physical_range`` (default: global min/max).
    """
    chans = sorted(data)
    if not isinstance(fs, dict):
        fs = {ch: float(fs) for ch in chans}
    spr = [int(round(fs[ch] * record_duration)) for ch in chans]
    num_records = max(
        int(math.ceil(len(data[ch]) / s)) for ch, s in zip(chans, spr)
    )
    if physical_range is None:
        lo = min(float(np.min(data[ch])) for ch in chans)
        hi = max(float(np.max(data[ch])) for ch in chans)
        if lo == hi:
            hi = lo + 1.0
        physical_range = (lo, hi)
    # quantize range through its 8-char header representation so the
    # encode slope equals the slope a reader derives from the header
    _, pmin = _fit8(physical_range[0])
    _, pmax = _fit8(physical_range[1])
    dmin, dmax = -32768.0, 32767.0
    hdr = EdfHeader(
        num_records=num_records,
        record_duration=record_duration,
        names=names or [f"ch{c}" for c in chans],
        transducers=[""] * len(chans),
        physical_dim=["uV"] * len(chans),
        physical_min=[pmin] * len(chans),
        physical_max=[pmax] * len(chans),
        digital_min=[dmin] * len(chans),
        digital_max=[dmax] * len(chans),
        prefiltering=[""] * len(chans),
        samples_per_record=spr,
    )
    slope = (pmax - pmin) / (dmax - dmin)
    offset = pmin - slope * dmin
    # A partial final record pads with physical 0 when 0 is inside
    # [pmin, pmax] (so a round-trip read decodes the pad as 0), else with
    # pmin.  Readers counting samples from the header (spr * num_records,
    # as the reference does) ingest the pad values — callers should trim
    # to the true per-channel length when it matters.
    pad_value = 0.0 if pmin <= 0.0 <= pmax else pmin
    with open(path, "wb") as f:
        write_header(f, hdr)
        for r in range(num_records):
            for ch, s in zip(chans, spr):
                x = data[ch][r * s : (r + 1) * s]
                if len(x) < s:  # pad the final partial record
                    x = np.concatenate([x, np.full(s - len(x), pad_value)])
                d = np.rint((x - offset) / slope).clip(dmin, dmax).astype("<i2")
                f.write(d.tobytes())
    return hdr


def split_edf(path: str, mapping: dict[str, list[int]], outdir: str) -> list[str]:
    """Split one EDF into channel-subset EDFs
    (reference: file_io/edf.py:780-808)."""
    hdr = read_header(path)
    raw = read_records(path, hdr, 0, hdr.num_records)
    outs = []
    for name, chans in mapping.items():
        phys = decode_records(raw, hdr, chans)
        fs = {c: hdr.samples_per_record[c] / hdr.record_duration for c in chans}
        out_path = os.path.join(outdir, f"{name}.edf")
        write_edf(
            out_path,
            {c: phys[c] for c in chans},
            fs,
            physical_range=(min(hdr.physical_min), max(hdr.physical_max)),
            record_duration=hdr.record_duration,
            names=[hdr.names[c] for c in chans],
        )
        outs.append(out_path)
    return outs


# ---------------------------------------------- Spark Python DataSource
try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _EdfPartition(InputPartition):
        def __init__(self, rec_start: int, rec_stop: int):
            self.rec_start = rec_start
            self.rec_stop = rec_stop

    class EdfDataSourceReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            self.channels = (
                [int(c) for c in options["channels"].split(",")]
                if options.get("channels")
                else None
            )
            self.start = int(options.get("start", 0))
            self.stop = int(options["stop"]) if options.get("stop") else None
            self.recs_per_partition = int(options.get("recs_per_partition", 256))
            self.hdr = read_header(self.path)

        def partitions(self):
            """One partition per record range — the distributed analog of
            the reference's record locating (file_io/edf.py:421-450).
            Sample-range pushdown trims the record span before
            partitioning (predicate pushdown at the source)."""
            hdr = self.hdr
            max_spr = max(hdr.samples_per_record)
            r0 = self.start // max_spr
            r1 = (
                min(hdr.num_records, -(-self.stop // max_spr))
                if self.stop is not None
                else hdr.num_records
            )
            step = self.recs_per_partition
            return [
                _EdfPartition(a, min(a + step, r1)) for a in range(r0, r1, step)
            ]

        def read(self, partition):
            import pyarrow as pa

            hdr = self.hdr
            chans = self.channels or [
                i for i, n in enumerate(hdr.names) if n != "EDF Annotations"
            ]
            raw = read_records(self.path, hdr, partition.rec_start, partition.rec_stop)
            phys = decode_records(raw, hdr, chans)
            rid = os.path.basename(self.path)
            for ch in chans:
                spr = hdr.samples_per_record[ch]
                t0 = partition.rec_start * spr
                t = np.arange(t0, t0 + len(phys[ch]), dtype=np.int64)
                v = phys[ch]
                # per-channel sample-range pushdown (channel rate-aware);
                # t is re-based to 0 at `start` so the engine-wide
                # dense-from-0 invariant holds for every downstream
                # operator (reverse passes, block alignment, segmentation)
                if self.start or self.stop is not None:
                    ch_fs_ratio = spr / max(hdr.samples_per_record)
                    lo = int(self.start * ch_fs_ratio)
                    hi = int(self.stop * ch_fs_ratio) if self.stop is not None else None
                    m = t >= lo
                    if hi is not None:
                        m &= t < hi
                    t, v = t[m] - lo, v[m]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([rid] * len(t), pa.string()),
                        pa.array(np.full(len(t), ch, dtype=np.int32)),
                        pa.array(t),
                        pa.array(v),
                    ],
                    names=["recording_id", "channel", "t", "v"],
                )

    class EdfDataSource(DataSource):
        """spark.read.format("edf").option("path", p)
        .option("channels", "0,2").option("start", a).option("stop", b)

        Register with: spark.dataSource.register(EdfDataSource)
        """

        @classmethod
        def name(cls):
            return "edf"

        def schema(self):
            return "recording_id string, channel int, t bigint, v double"

        def reader(self, schema):
            return EdfDataSourceReader(self.options)

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False


def register_edf_source(spark) -> bool:
    """Idempotently register the 'edf' format on a session."""
    if HAVE_DATASOURCE_API:
        spark.dataSource.register(EdfDataSource)
        return True
    return False


def write_edf_from_df(
    df,
    path: str,
    fs: dict[int, float] | float,
    physical_range: tuple[float, float] | None = None,
    record_duration: float = 1.0,
) -> EdfHeader:
    """EDF sink for a long-format signal DataFrame.

    EDF is a sequential record-interleaved container, so the final write
    is single-writer (as in the reference, file_io/edf.py:643-697); the
    heavy lifting (sort, channel grouping) happens distributed and
    results stream to the writer via toLocalIterator — driver memory is
    O(one channel), not O(file).

    For cluster-scale exports prefer parquet (columnar, splittable); this
    sink exists for interop with EDF tooling.
    """
    from pyspark.sql import functions as F

    chans = sorted(r[0] for r in df.select("channel").distinct().collect())
    data = {}
    for ch in chans:
        # one Arrow-batched job per channel: toLocalIterator after an
        # orderBy launches a job per sort partition and ships rows one
        # Py4J round-trip at a time — ~100 sequential mini-jobs for a
        # 4-channel file; a per-channel toPandas is a single job with a
        # columnar transfer and the same O(one channel) driver memory
        pdf = (
            df.filter(F.col("channel") == ch)
            .orderBy("t")
            .select("v")
            .toPandas()
        )
        data[ch] = pdf["v"].to_numpy(dtype=np.float64)
    return write_edf(path, data, fs, physical_range, record_duration)
