"""Pinnacle annotation reader + path metadata utilities
(reference: tests/test_path_utils.py, file_io/annotations.py)."""

import numpy as np
import pytest

from openseize_spark.sources import annotations as ann
from openseize_spark.operators import relational as rel
from tests.conftest import collect_signal, make_signal


@pytest.fixture(scope="module")
def pinnacle_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("ann")
    path = str(d / "rec_001_annotations.txt")
    ann.write_pinnacle_fixture(
        path,
        [
            ("rest", 1.0, 0.5, "ALL"),
            ("exploring", 5.0, 2.0, "ALL"),
            ("artifact", 8.0, 1.0, "ch0"),
        ],
    )
    return path


class TestPinnacle:
    def test_read(self, spark, pinnacle_file):
        df = ann.read_pinnacle(spark, pinnacle_file, start=6, recording_id="r0")
        rows = sorted(df.collect(), key=lambda r: r.time)
        assert [r.label for r in rows] == ["rest", "exploring", "artifact"]
        assert rows[0].time == 1.0
        assert rows[1].duration == pytest.approx(2.0)
        assert rows[2].channel == "ch0"

    def test_label_filter(self, spark, pinnacle_file):
        df = ann.read_pinnacle(
            spark, pinnacle_file, labels=["rest", "artifact"], recording_id="r0"
        )
        assert {r.label for r in df.collect()} == {"rest", "artifact"}

    def test_mask_integration(self, spark, pinnacle_file):
        """Pinnacle annotations drive the interval mask end-to-end
        (reference: as_mask over Pinnacle reads)."""
        sf = make_signal(spark, nchannels=1, n=1500, fs=100.0, seed=6)
        x = collect_signal(sf)[0]
        adf = ann.read_pinnacle(spark, pinnacle_file, recording_id="r0")
        out = collect_signal(rel.mask_from_annotations(sf, adf, include=True))[0]
        m = np.zeros(1500, dtype=bool)
        m[100:150] = True   # rest: [1.0s, 1.5s)
        m[500:700] = True   # exploring: [5.0s, 7.0s)
        m[800:900] = True   # artifact: [8.0s, 9.0s)
        np.testing.assert_array_equal(out, x[m])


class TestPathUtils:
    def test_pair_and_mismatch(self, spark):
        data = [f"/d/rec_{i:03d}.edf" for i in range(4)]
        anns = [f"/a/rec_{i:03d}_annotations.txt" for i in (0, 1, 3)]
        pat = r"(rec_\d+)"
        paired = ann.pair_files(spark, data, anns, pat).collect()
        assert len(paired) == 3
        keys = {r.key for r in paired}
        assert keys == {"rec_000", "rec_001", "rec_003"}
        mm = ann.mismatched(spark, data, anns, pat).collect()
        assert len(mm) == 1 and mm[0].key == "rec_002"

    def test_path_metadata(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        out = ann.path_metadata(df, sf=r"(sf[\d.]+)", table=r"/(\w+)\.parquet")
        row = out.select("sf", "table").first()
        assert row.sf == "sf0.001" and row.table == "nation"
