"""Chebyshev / Remez / Hilbert / Notch design correctness — frequency-
response spec points, mirroring the reference's design tests
(tests/test_iir.py:22-76)."""

import numpy as np
import pytest

from openseize_spark.dsp import design, design_iir


def sos_mag(sos, freqs, fs):
    w = 2 * np.pi * np.asarray(freqs, dtype=float) / fs
    z = np.exp(-1j * w)
    H = np.ones_like(z, dtype=complex)
    for s in sos:
        H *= (s[0] + s[1] * z + s[2] * z**2) / (s[3] + s[4] * z + s[5] * z**2)
    return np.abs(H)


def fir_mag(taps, freqs, fs, nfft=16384):
    w = np.fft.rfftfreq(nfft, 1 / fs)
    H = np.abs(np.fft.rfft(taps, nfft))
    return np.array([H[np.argmin(np.abs(w - f))] for f in freqs])


class TestCheby:
    def test_cheby1_lowpass_meets_spec(self):
        spec = design_iir.cheby1(fpass=10, fstop=20, fs=100, gpass=1.0, gstop=40.0)
        Hp, Hs = sos_mag(spec.sos, [10, 20], 100)
        assert 20 * np.log10(Hp) >= -1.05
        assert 20 * np.log10(Hs) <= -40.0

    def test_cheby2_flat_passband(self):
        spec = design_iir.cheby2(fpass=10, fstop=20, fs=100, gpass=1.0, gstop=40.0)
        H = sos_mag(spec.sos, [1, 5, 9, 20, 45], 100)
        assert np.all(H[:3] > 0.88)  # flat-ish passband
        assert np.all(20 * np.log10(H[3:]) <= -39.9)  # equiripple stopband

    def test_cheby1_bandpass(self):
        spec = design_iir.cheby1(fpass=[15, 25], fstop=[10, 30], fs=100, gpass=1.0, gstop=30.0)
        Hmid = sos_mag(spec.sos, [20], 100)[0]
        Hout = sos_mag(spec.sos, [5, 40], 100)
        assert Hmid > 0.7
        assert np.all(20 * np.log10(Hout) <= -30.0)

    def test_cheby1_highpass(self):
        spec = design_iir.cheby1(fpass=30, fstop=20, fs=100, gpass=1.0, gstop=40.0)
        assert spec.btype == "highpass"
        Hp = sos_mag(spec.sos, [40], 100)[0]
        Hs = sos_mag(spec.sos, [15], 100)[0]
        assert Hp > 0.85 and 20 * np.log10(Hs) < -40


class TestRemez:
    @pytest.mark.parametrize(
        "kw,passf,stopf,gstop",
        [
            (dict(fpass=10, fstop=20, gpass=0.5, gstop=40.0), [0, 5, 10], [20, 35, 50], 40),
            (dict(fpass=30, fstop=20, gstop=40.0), [30, 40, 50], [0, 10, 20], 40),
            (dict(fpass=[15, 25], fstop=[10, 30], gstop=30.0), [15, 20, 25], [0, 5, 10, 30, 45], 30),
        ],
    )
    def test_meets_spec(self, kw, passf, stopf, gstop):
        spec = design_iir.remez_fir(fs=100, **kw)
        Hp = fir_mag(spec.taps, passf, 100)
        Hs = fir_mag(spec.taps, stopf, 100)
        assert np.max(np.abs(Hp - 1)) < 0.08
        assert np.all(20 * np.log10(Hs + 1e-12) <= -gstop + 2.0)

    def test_linear_phase_symmetry(self):
        spec = design_iir.remez_fir(fpass=10, fstop=20, fs=100)
        assert np.allclose(spec.taps, spec.taps[::-1])


class TestHilbert:
    def test_quadrature_response(self):
        """|H| ~ 1 in band; applied to a sine it produces the -90 deg
        shifted quadrature (reference: tests/test_special.py:38-63)."""
        from openseize_spark.dsp import kernels

        spec = design.hilbert_fir(width=5.0, fs=100.0)
        t = np.arange(4000) / 100.0
        x = np.sin(2 * np.pi * 10 * t)
        y = kernels.convolve(x, spec.taps, "same")
        want = -np.cos(2 * np.pi * 10 * t)  # hilbert(sin) = -cos
        mid = slice(500, 3500)
        assert np.max(np.abs(y[mid] - want[mid])) < 0.02


class TestEllip:
    def test_jacobi_identities(self):
        import math

        for m in (0.3, 0.5, 0.8):
            K = design_iir._ellipk(m)
            s, c, d = design_iir._ellipj(K, m)
            assert s == pytest.approx(1.0, abs=1e-12)
            assert c == pytest.approx(0.0, abs=1e-12)
            assert d == pytest.approx(math.sqrt(1 - m), abs=1e-12)

    @pytest.mark.parametrize(
        "kw,passf,stopf",
        [
            (dict(fpass=10, fstop=20), [1, 5, 9.9], [20, 30, 45]),
            (dict(fpass=30, fstop=20), [31, 40, 45], [20, 10, 5]),
            (dict(fpass=[15, 25], fstop=[10, 30]), [16, 20, 24], [9, 31, 5, 45]),
        ],
    )
    def test_meets_spec(self, kw, passf, stopf):
        spec = design_iir.ellip(fs=100, gpass=1.0, gstop=40.0, **kw)
        Hp = sos_mag(spec.sos, passf, 100)
        Hs = sos_mag(spec.sos, stopf, 100)
        assert np.all(20 * np.log10(Hp) >= -1.05)
        assert np.all(20 * np.log10(Hp) <= 0.05)
        assert np.all(20 * np.log10(Hs) <= -39.9)

    def test_lower_order_than_butter(self):
        """The whole point of elliptic: minimal order for a given spec."""
        e = design_iir.ellip(fpass=10, fstop=13, fs=100, gpass=1.0, gstop=50.0)
        b = design.butter(fpass=10, fstop=13, fs=100, gpass=1.0, gstop=50.0)
        assert e.order < b.order
