"""EDF source/sink tests: round-trips (incl. irregular rates), the Spark
DataSource with range/channel pushdown, and the splitter — mirroring the
reference's EDF test strategy (tests/test_edf.py:106-284)."""

import numpy as np
import pytest

from openseize_spark.sources import edf


@pytest.fixture(scope="module")
def edf_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("edf")
    data = {ch: rng.normal(scale=50.0, size=5000) for ch in range(4)}
    path = str(d / "rec.edf")
    hdr = edf.write_edf(path, data, fs=500.0, record_duration=1.0)
    return path, hdr, data


class TestRoundTrip:
    def test_header_roundtrip(self, edf_file):
        path, hdr, _ = edf_file
        back = edf.read_header(path)
        assert back.num_signals == 4
        assert back.num_records == hdr.num_records == 10
        assert back.samples_per_record == [500] * 4
        assert back.names == ["ch0", "ch1", "ch2", "ch3"]

    def test_sample_roundtrip_quantized(self, edf_file):
        path, hdr, data = edf_file
        back = edf.read_header(path)
        raw = edf.read_records(path, back, 0, back.num_records)
        phys = edf.decode_records(raw, back, [0, 1, 2, 3])
        # int16 quantization error bound: half an LSB of the physical span
        slope, _ = back.slopes_offsets()
        for ch in range(4):
            assert np.max(np.abs(phys[ch][:5000] - data[ch])) <= abs(slope[ch]) * 0.5 + 1e-9

    def test_irregular_rates(self, tmp_path):
        """Channels at different rates (reference irregular fixture,
        tests/conftest.py:30-62) — long format needs no nan padding."""
        rng = np.random.default_rng(1)
        data = {0: rng.normal(size=2000), 1: rng.normal(size=4000)}
        path = str(tmp_path / "irr.edf")
        edf.write_edf(path, data, fs={0: 200.0, 1: 400.0})
        hdr = edf.read_header(path)
        assert hdr.samples_per_record == [200, 400]
        phys = edf.decode_records(
            edf.read_records(path, hdr, 0, hdr.num_records), hdr, [0, 1]
        )
        assert len(phys[0]) == 2000 and len(phys[1]) == 4000
        slope, _ = hdr.slopes_offsets()
        assert np.max(np.abs(phys[0] - data[0])) <= abs(slope[0]) * 0.5 + 1e-9

    def test_splitter(self, edf_file, tmp_path):
        path, _, data = edf_file
        outs = edf.split_edf(path, {"a": [0, 2], "b": [1, 3]}, str(tmp_path))
        ha = edf.read_header(outs[0])
        assert ha.num_signals == 2 and ha.names == ["ch0", "ch2"]
        phys = edf.decode_records(
            edf.read_records(outs[0], ha, 0, ha.num_records), ha, [0, 1]
        )
        # channel 0 of split 'a' == original channel 0 up to quantization
        slope, _ = ha.slopes_offsets()
        assert np.max(np.abs(phys[0][:5000] - data[0])) <= 2 * abs(slope[0]) + 1e-9


class TestDataSource:
    def test_scan(self, spark, edf_file):
        path, hdr, data = edf_file
        assert edf.register_edf_source(spark)
        df = (
            spark.read.format("edf")
            .option("path", path)
            .option("recs_per_partition", 3)
            .load()
        )
        assert df.columns == ["recording_id", "channel", "t", "v"]
        n = df.count()
        assert n == 4 * 5000
        pdf = df.filter("channel = 1").orderBy("t").toPandas()
        assert np.array_equal(pdf.t.to_numpy(), np.arange(5000))
        assert np.max(np.abs(pdf.v.to_numpy() - data[1])) < 0.01

    def test_channel_and_range_pushdown(self, spark, edf_file):
        path, _, data = edf_file
        edf.register_edf_source(spark)
        df = (
            spark.read.format("edf")
            .option("path", path)
            .option("channels", "2")
            .option("start", 1000)
            .option("stop", 2500)
            .option("recs_per_partition", 2)
            .load()
        )
        pdf = df.orderBy("t").toPandas()
        assert pdf.channel.unique().tolist() == [2]
        # t is re-based to 0 at `start` so the slice satisfies the
        # engine-wide dense-from-0 invariant (reverse passes, block
        # alignment); values still come from the absolute range
        assert pdf.t.min() == 0 and pdf.t.max() == 1499
        assert np.max(np.abs(pdf.v.to_numpy() - data[2][1000:2500])) < 0.01

    def test_partition_count_respects_range(self, spark, edf_file):
        path, _, _ = edf_file
        edf.register_edf_source(spark)
        # start/stop trim the record span BEFORE partitioning (pushdown)
        reader = edf.EdfDataSourceReader(
            {"path": path, "start": "2600", "stop": "3400", "recs_per_partition": "1"}
        )
        parts = reader.partitions()
        assert len(parts) == 2  # records 5 and 6 only
        assert parts[0].rec_start == 5 and parts[-1].rec_stop == 7


class TestDataFrameSink:
    def test_df_roundtrip_via_datasource(self, spark, tmp_path):
        from openseize_spark.sources.generator import dyadic_signal

        sf = dyadic_signal(spark, nchannels=2, nsamples=1000, fs=100.0)
        path = str(tmp_path / "sink.edf")
        hdr = edf.write_edf_from_df(sf.df, path, fs=100.0)
        assert hdr.num_records == 10
        edf.register_edf_source(spark)
        back = (
            spark.read.format("edf").option("path", path).load()
            .orderBy("channel", "t")
            .toPandas()
        )
        orig = sf.df.orderBy("channel", "t").toPandas()
        assert len(back) == len(orig)
        slope = (hdr.physical_max[0] - hdr.physical_min[0]) / 65535.0
        assert np.max(np.abs(back.v.to_numpy() - orig.v.to_numpy())) <= slope * 0.5 + 1e-9
