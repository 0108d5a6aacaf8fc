"""Pure-numpy kernel tests (driver-side, no Spark): design math +
chunk-state exactness — the foundations the distributed kernels rest on."""

import numpy as np
import pytest

from openseize_spark.dsp import design, kernels


def freq_response(taps, nfft=8192, fs=2.0):
    w = np.fft.rfftfreq(nfft, 1 / fs)
    return w, np.abs(np.fft.rfft(taps, nfft))


class TestFirDesign:
    def test_kaiser_lowpass_bands(self):
        spec = design.kaiser(fpass=10, fstop=20, fs=100, gpass=1.0, gstop=40.0)
        w, H = freq_response(spec.taps, fs=100)
        assert H[np.argmin(abs(w - 5))] == pytest.approx(1.0, abs=0.02)
        assert H[np.argmin(abs(w - 25))] < 10 ** (-40 / 20) * 3  # ~stopband
        assert spec.numtaps % 2 == 1

    def test_kaiser_highpass(self):
        spec = design.kaiser(fpass=30, fstop=20, fs=100, gstop=40.0)
        assert spec.btype == "highpass"
        w, H = freq_response(spec.taps, fs=100)
        assert H[np.argmin(abs(w - 45))] == pytest.approx(1.0, abs=0.02)
        assert H[np.argmin(abs(w - 10))] < 0.05

    def test_kaiser_bandpass(self):
        spec = design.kaiser(fpass=[15, 25], fstop=[10, 30], fs=100, gstop=40.0)
        assert spec.btype == "bandpass"
        w, H = freq_response(spec.taps, fs=100)
        assert H[np.argmin(abs(w - 20))] == pytest.approx(1.0, abs=0.03)
        assert H[np.argmin(abs(w - 5))] < 0.05
        assert H[np.argmin(abs(w - 40))] < 0.05

    def test_general_cosine_windows(self):
        for fam in ("hann", "hamming", "blackman", "bartlett", "rectangular"):
            spec = design.general_cosine_fir(fam, fpass=10, fstop=20, fs=100)
            w, H = freq_response(spec.taps, fs=100)
            assert H[np.argmin(abs(w - 2))] == pytest.approx(1.0, abs=0.05), fam


class TestIirDesign:
    def test_butter_lowpass_spec_points(self):
        spec = design.butter(fpass=10, fstop=20, fs=100, gpass=1.0, gstop=40.0)
        wn = np.linspace(1e-3, np.pi, 2000)
        z = np.exp(-1j * wn)
        H = np.ones_like(z, dtype=complex)
        for s in spec.sos:
            H *= (s[0] + s[1] * z + s[2] * z**2) / (s[3] + s[4] * z + s[5] * z**2)
        f = wn / np.pi * 50
        Hp = abs(H[np.argmin(abs(f - 10))])
        Hs = abs(H[np.argmin(abs(f - 20))])
        assert 20 * np.log10(Hp) >= -1.05
        assert 20 * np.log10(Hs) <= -40.0

    def test_notch(self):
        spec = design.notch(fstop=60, width=6, fs=500)
        wn = 2 * np.pi * 60 / 500
        z = np.exp(-1j * wn)
        s = spec.sos[0]
        H = (s[0] + s[1] * z + s[2] * z**2) / (s[3] + s[4] * z + s[5] * z**2)
        assert abs(H) < 1e-8  # exact null at 60 Hz
        z1 = np.exp(-1j * 2 * np.pi * 30 / 500)
        H1 = (s[0] + s[1] * z1 + s[2] * z1**2) / (s[3] + s[4] * z1 + s[5] * z1**2)
        assert abs(H1) > 0.9


class TestStatefulKernels:
    def test_sosfilt_chunk_state_exact(self):
        """The reference's core guarantee: chunked == whole
        (reference: tests/test_iir.py:132-159)."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=5000)
        sos = design.butter(fpass=10, fstop=20, fs=100).sos
        whole, _ = kernels.sosfilt(sos, x)
        for cuts in ([1000, 3500], [1, 4999], [2500]):
            pieces, z = [], None
            prev = 0
            for c in list(cuts) + [len(x)]:
                y, z = kernels.sosfilt(sos, x[prev:c], z)
                pieces.append(y)
                prev = c
            assert np.array_equal(np.concatenate(pieces), whole)

    def test_sosfilt_zi_step_response(self):
        sos = design.butter(fpass=5, fstop=15, fs=100).sos
        zi = kernels.sosfilt_zi(sos)
        y, _ = kernels.sosfilt(sos, np.ones(200) * 2.0, zi * 2.0)
        h1 = np.prod([(s[0] + s[1] + s[2]) / (s[3] + s[4] + s[5]) for s in sos])
        assert np.allclose(y, 2.0 * h1, atol=1e-9)

    def test_sosfiltfilt_zero_phase(self):
        """Zero-phase: a filtered sine keeps its phase."""
        fs = 500.0
        t = np.arange(5000) / fs
        x = np.sin(2 * np.pi * 5 * t)
        sos = design.butter(fpass=20, fstop=40, fs=fs).sos
        y = kernels.sosfiltfilt(sos, x)
        mid = slice(1000, 4000)
        assert np.corrcoef(x[mid], y[mid])[0, 1] > 0.9999
        assert np.max(np.abs(y[mid] - x[mid])) < 0.01


class TestResampleKernel:
    @pytest.mark.parametrize("L,M", [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (10, 4)])
    def test_tone_preserved(self, L, M):
        fs = 1000.0
        n = 6000
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * 7 * t)
        y = kernels.resample_poly(x, L, M)
        assert len(y) == int(np.ceil(n * L / M))
        t2 = np.arange(len(y)) * M / (fs * L)
        expected = np.sin(2 * np.pi * 7 * t2)
        interior = slice(len(y) // 10, -len(y) // 10)
        assert np.max(np.abs(y[interior] - expected[interior])) < 5e-3

    def test_identity(self):
        x = np.arange(100.0)
        assert np.array_equal(kernels.resample_poly(x, 3, 3), x)


class TestSpectral:
    def test_welch_sine_peak_and_parseval(self):
        fs = 200.0
        t = np.arange(2**14) / fs
        x = np.sin(2 * np.pi * 25 * t)
        freqs, psd = kernels.welch(x, fs, nfft=512)
        assert freqs[np.argmax(psd)] == pytest.approx(25.0, abs=fs / 512)
        # sine power = 1/2
        assert np.trapz(psd, freqs) == pytest.approx(0.5, rel=0.01)

    def test_welch_segment_count(self):
        """(N - nfft)//stride + 1 (reference: core/numerical.py:940-943)."""
        x = np.zeros(1000)
        segs = kernels.sliding_segments(x, 256, 128)
        assert segs.shape == ((1000 - 256) // 128 + 1, 256)

    def test_periodogram_scaling_spectrum(self):
        fs = 100.0
        t = np.arange(4096) / fs
        x = np.sin(2 * np.pi * 10 * t)
        # nfft=1000 puts 10 Hz exactly on a bin (no leakage)
        freqs, p = kernels.periodogram_segments(
            kernels.sliding_segments(x, 1000, 500), fs, scaling="spectrum"
        )
        # peak height in spectrum scaling ~ amplitude^2/2
        assert p.mean(axis=0).max() == pytest.approx(0.5, rel=0.05)

    def test_stft_shapes(self):
        x = np.random.default_rng(2).normal(size=3000)
        freqs, times, Z = kernels.stft(x, 100.0, nfft=256, overlap=0.5)
        assert Z.shape == (len(times), len(freqs))
        assert len(freqs) == 129

    def test_simpson_exact_for_parabola(self):
        # Simpson is exact for quadratics on odd grids
        xs = np.linspace(0, 2, 21)
        w = kernels.simpson_weights(21, dx=xs[1] - xs[0])
        assert np.sum(w * xs**2) == pytest.approx(8 / 3, rel=1e-12)

    def test_band_power(self):
        freqs = np.arange(0, 50.5, 0.5)
        psd = np.ones_like(freqs)
        # integral of 1 over [5,20] = 15
        assert kernels.band_power(freqs, psd, 5, 20) == pytest.approx(15.0, rel=1e-9)


class TestCrossSpectra:
    def test_self_coherence_is_one(self):
        import numpy as np

        from openseize_spark.dsp import kernels

        rng = np.random.default_rng(7)
        x = rng.standard_normal(4096)
        freqs, sxy, sxx, syy, m = kernels.cross_spectra(x, x, 256.0, 128)
        coh = (sxy.real**2 + sxy.imag**2) / (sxx * syy)
        assert m == (4096 - 128) // 64 + 1
        assert np.allclose(coh, 1.0)
        # Sxy of a signal with itself is the (real) auto-spectrum
        assert np.allclose(sxy.imag, 0.0)
        assert np.allclose(sxy.real, sxx)

    def test_shared_tone_peaks_independent_noise_low(self):
        import numpy as np

        from openseize_spark.dsp import kernels

        rng = np.random.default_rng(11)
        n, fs, nfft = 8192, 256.0, 256
        t = np.arange(n) / fs
        tone = np.sin(2 * np.pi * 32.0 * t)
        xa = tone + 0.5 * rng.standard_normal(n)
        xb = tone + 0.5 * rng.standard_normal(n)
        freqs, sxy, sxx, syy, _ = kernels.cross_spectra(xa, xb, fs, nfft)
        coh = (sxy.real**2 + sxy.imag**2) / (sxx * syy)
        k32 = int(np.argmin(np.abs(freqs - 32.0)))
        assert coh[k32] > 0.9
        far = (freqs < 20) | (freqs > 44)
        assert coh[far].mean() < 0.3


class TestCrossSpectraInt:
    """The integer-quantized cross-spectra path (round-7 determinism
    policy): exact Python-int segment sums that a SQL oracle replays as
    HUGEINT sums — associative, so reduction order cannot matter."""

    def test_matches_float_path_within_quantum(self):
        import numpy as np

        from openseize_spark.dsp import kernels

        rng = np.random.default_rng(3)
        fs, nfft, n = 256.0, 128, 4096
        xa = rng.standard_normal(n)
        xb = 0.6 * xa + 0.4 * rng.standard_normal(n)
        freqs, sxy, sxx, syy, m = kernels.cross_spectra(xa, xb, fs, nfft)
        bins, s_cre, s_cim, s_pa, s_pb, mi = kernels.cross_spectra_int(
            xa, xb, nfft
        )
        assert mi == m
        scale = fs * np.sum(kernels.get_window("hann", nfft) ** 2)
        # integer sums / m / scale reconstruct the float averages to
        # within one quantum per summed segment
        tol = m * 1e-12 / m / scale * 1.01 + 1e-15
        assert np.abs(
            np.array([c / 1e12 / m / scale for c in s_cre]) - sxy.real
        ).max() < tol * m
        assert np.abs(
            np.array([c / 1e12 / m / scale for c in s_pa]) - sxx
        ).max() < tol * m

    def test_sums_are_exact_ints_and_order_free(self):
        import numpy as np

        from openseize_spark.dsp import kernels

        rng = np.random.default_rng(5)
        xa = rng.standard_normal(2048)
        xb = rng.standard_normal(2048)
        _, s_cre, s_cim, s_pa, s_pb, m = kernels.cross_spectra_int(xa, xb, 128)
        assert all(isinstance(v, int) for v in s_cre + s_cim + s_pa + s_pb)
        # replay the quantization per segment in reversed order: the sum
        # must be identical (associativity of exact integers)
        stride = 64
        sa = kernels.sliding_segments(xa, 128, stride)[:m]
        sb = kernels.sliding_segments(xb, 128, stride)[:m]
        win = kernels.get_window("hann", 128)
        A = np.fft.rfft(kernels.detrend(sa, "constant") * win, axis=-1)
        B = np.fft.rfft(kernels.detrend(sb, "constant") * win, axis=-1)
        cre = A.real * B.real + A.imag * B.imag
        q = np.floor(cre * 1e12 + 0.5)
        rev = [int(sum(int(c) for c in q[::-1, j])) for j in range(q.shape[1])]
        assert rev == s_cre

    def test_empty_input(self):
        import numpy as np

        from openseize_spark.dsp import kernels

        bins, s_cre, s_cim, s_pa, s_pb, m = kernels.cross_spectra_int(
            np.array([]), np.array([]), 128
        )
        assert m == 0
        assert len(s_cre) == 65 and all(v == 0 for v in s_cre)
