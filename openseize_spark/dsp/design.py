"""Driver-side filter design — pure numpy (no scipy in this environment).

Mirrors the *math contracts* of the reference's design classes
(reference: filtering/bases.py:216-421, filtering/fir.py:52-480,
filtering/iir.py:44-404): given pass/stop band edges and ripple specs,
produce FIR taps or IIR second-order sections.  All design happens on the
driver with tiny arrays; the resulting coefficients are broadcast into the
distributed application kernels (operators/fir.py, operators/iir.py).

Public formulas used (standard DSP textbook material):
- Kaiser window beta + tap-count estimate (Kaiser 1974), as used by
  the reference's Kaiser filter (reference: filtering/fir.py:91-137).
- Windowed-sinc (firwin-style) band construction with -6 dB band edges
  (reference: filtering/bases.py:321-326 uses scaled firwin the same way).
- Butterworth analog prototype -> bilinear transform -> second-order
  sections (reference: filtering/iir.py:44-120 delegates to scipy's
  equivalent pipeline).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------- windows
def hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window (spectral-analysis flavor, scipy get_window
    equivalent used by reference welch, core/numerical.py:693-695)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def window_by_name(name: str, n: int, periodic: bool = True) -> np.ndarray:
    """General cosine windows matching the reference FIR families
    (reference: filtering/fir.py:140-480)."""
    k = np.arange(n)
    denom = n if periodic else max(n - 1, 1)
    x = 2.0 * np.pi * k / denom
    if name in ("boxcar", "rectangular"):
        return np.ones(n)
    if name == "hann":
        return 0.5 - 0.5 * np.cos(x)
    if name == "hamming":
        return 0.54 - 0.46 * np.cos(x)
    if name == "blackman":
        return 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)
    if name == "bartlett":
        m = np.arange(n)
        d = denom
        return 1.0 - np.abs((m - d / 2.0) / (d / 2.0))
    if name == "nuttall":
        a = (0.3635819, 0.4891775, 0.1365995, 0.0106411)
        return a[0] - a[1] * np.cos(x) + a[2] * np.cos(2 * x) - a[3] * np.cos(3 * x)
    if name == "cosine":
        return np.sin(np.pi * (k + 0.5) / n)
    raise ValueError(f"unknown window {name!r}")


# ------------------------------------------------------------- FIR design
def kaiser_beta(atten_db: float) -> float:
    """Kaiser's empirical beta formula."""
    a = atten_db
    if a > 50:
        return 0.1102 * (a - 8.7)
    if a >= 21:
        return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
    return 0.0


def kaiser_order(atten_db: float, width_norm: float) -> int:
    """Tap-count estimate; width_norm = transition width / nyquist.

    Mirrors sps.kaiserord as used by the reference Kaiser filter
    (reference: filtering/fir.py:91-137); forced odd for integer group
    delay (reference: filtering/fir.py:134-137).
    """
    a = max(atten_db, 8.0)
    numtaps = int(math.ceil((a - 7.95) / (2.285 * math.pi * width_norm))) + 1
    return numtaps + 1 - numtaps % 2  # odd


def _sinc_lowpass(numtaps: int, cutoff_norm: float) -> np.ndarray:
    """Ideal lowpass truncated sinc, cutoff in [0, 1] (nyquist=1)."""
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    return cutoff_norm * np.sinc(cutoff_norm * m)


def firwin(
    numtaps: int,
    cutoff,
    fs: float = 2.0,
    window: str | tuple = "hamming",
    pass_zero: bool | str = True,
) -> np.ndarray:
    """Windowed-sinc FIR design (firwin work-alike, numpy only).

    Supports lowpass / highpass / bandpass / bandstop via band algebra on
    ideal lowpass prototypes; gain normalized to 1 at the reference
    frequency (DC for pass_zero, band center otherwise) — matching the
    btype inference the reference applies
    (reference: filtering/bases.py:297-311).
    """
    nyq = fs / 2.0
    cut = np.atleast_1d(np.asarray(cutoff, dtype=float)) / nyq
    if isinstance(window, tuple) and window[0] == "kaiser":
        win = np.kaiser(numtaps, window[1])
    else:
        win = window_by_name(str(window), numtaps, periodic=False)

    if isinstance(pass_zero, str):
        pass_zero = pass_zero in ("lowpass", "bandstop")

    # build as sum/difference of ideal lowpass responses
    if len(cut) == 1:
        lp = _sinc_lowpass(numtaps, cut[0])
        if pass_zero:  # lowpass
            h = lp
        else:  # highpass = delta - lowpass (numtaps must be odd)
            h = -lp
            h[(numtaps - 1) // 2] += 1.0
    elif len(cut) == 2:
        lp_hi = _sinc_lowpass(numtaps, cut[1])
        lp_lo = _sinc_lowpass(numtaps, cut[0])
        if pass_zero:  # bandstop = delta - (lp_hi - lp_lo)
            h = lp_lo - lp_hi
            h[(numtaps - 1) // 2] += 1.0
        else:  # bandpass
            h = lp_hi - lp_lo
    else:
        raise ValueError("cutoff must have 1 or 2 elements")

    h = h * win
    # normalize passband gain to unity
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    if len(cut) == 1:
        f0 = 0.0 if pass_zero else 1.0  # DC or nyquist
    else:
        f0 = 0.0 if pass_zero else (cut[0] + cut[1]) / 2.0
    gain = np.abs(np.sum(h * np.cos(np.pi * m * f0)))
    return h / gain


@dataclass(frozen=True)
class FirSpec:
    """Designed FIR filter: taps + provenance.  The callable-filter analog
    of the reference FIR classes (reference: filtering/bases.py:363-421) is
    operators/fir.py:apply_fir(signal, spec)."""

    taps: np.ndarray
    fs: float
    btype: str
    fpass: tuple
    fstop: tuple

    @property
    def numtaps(self) -> int:
        return len(self.taps)


def _btype(fpass: np.ndarray, fstop: np.ndarray) -> str:
    """Band type inference (reference: filtering/bases.py:297-311)."""
    if len(fpass) == 1:
        return "lowpass" if fpass[0] < fstop[0] else "highpass"
    if fpass[0] > fstop[0] and fpass[1] < fstop[1]:
        return "bandpass"
    if fpass[0] < fstop[0] and fpass[1] > fstop[1]:
        return "bandstop"
    raise ValueError("fpass/fstop do not define a valid band")


def kaiser(fpass, fstop, fs: float, gpass: float = 1.0, gstop: float = 40.0) -> FirSpec:
    """Kaiser-windowed FIR from band specs — the reference's recommended
    default filter (reference: filtering/fir.py:52-137)."""
    fpass = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass, fstop)
    nyq = fs / 2.0
    width = np.min(np.abs(fstop - fpass)) / nyq
    atten = max(gstop, 21.0)
    numtaps = kaiser_order(atten, width)
    beta = kaiser_beta(atten)
    # -6 dB cutoff: midpoint of transition band (reference:
    # filtering/bases.py:321-326)
    cutoff = (fpass + np.where(fstop > fpass, 1, -1) * np.abs(fstop - fpass) / 2.0)
    pass_zero = btype in ("lowpass", "bandstop")
    taps = firwin(numtaps, np.sort(cutoff), fs=fs, window=("kaiser", beta), pass_zero=pass_zero)
    return FirSpec(taps=taps, fs=fs, btype=btype, fpass=tuple(fpass), fstop=tuple(fstop))


def general_cosine_fir(
    window: str, fpass, fstop, fs: float, width_factor: float = 4.0
) -> FirSpec:
    """Hann/Hamming/Blackman/Bartlett/Rectangular FIR families
    (reference: filtering/fir.py:140-480): taps ~ k / (width/nyq)."""
    fpass = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass, fstop)
    nyq = fs / 2.0
    width = np.min(np.abs(fstop - fpass))
    # taps = k/(width/nyq), k≈window main-lobe factor (ref uses per-window k)
    k = {"rectangular": 0.9, "bartlett": 2.9, "hann": 3.1, "hamming": 3.3, "blackman": 5.5}.get(
        window, 4.0
    )
    numtaps = int(math.ceil(k / (width / nyq)))
    numtaps += 1 - numtaps % 2
    cutoff = (fpass + np.where(fstop > fpass, 1, -1) * width / 2.0)
    pass_zero = btype in ("lowpass", "bandstop")
    win = "boxcar" if window == "rectangular" else window
    taps = firwin(numtaps, np.sort(cutoff), fs=fs, window=win, pass_zero=pass_zero)
    return FirSpec(taps=taps, fs=fs, btype=btype, fpass=tuple(fpass), fstop=tuple(fstop))


def hilbert_fir(width: float, fs: float, numtaps: int | None = None) -> FirSpec:
    """Type-III FIR Hilbert transformer (reference: filtering/special.py:
    16-133): odd-length antisymmetric taps h[n] ~ 2/(pi n) for odd n,
    Kaiser-windowed, passband [width, fs/2 - width]."""
    if numtaps is None:
        numtaps = kaiser_order(60.0, (2 * width) / fs)
    numtaps += 1 - numtaps % 2
    m = np.arange(numtaps) - (numtaps - 1) // 2
    h = np.zeros(numtaps)
    odd = m % 2 != 0
    h[odd] = 2.0 / (np.pi * m[odd])
    h *= np.kaiser(numtaps, kaiser_beta(60.0))
    return FirSpec(taps=h, fs=fs, btype="hilbert", fpass=(width,), fstop=(fs / 2 - width,))


# ------------------------------------------------------------- IIR design
@dataclass(frozen=True)
class SosSpec:
    """Second-order-sections IIR filter (reference IIR classes,
    filtering/bases.py:19-213, default fmt='sos')."""

    sos: np.ndarray  # (nsections, 6)
    fs: float
    btype: str
    order: int
    dephase: bool = field(default=True)


def _butter_analog_poles(order: int) -> np.ndarray:
    k = np.arange(1, order + 1)
    return np.exp(1j * np.pi * (2 * k + order - 1) / (2 * order))


def _bilinear_zpk(z, p, k, fs: float):
    """Bilinear transform with fs2 = 2*fs (pre-warped upstream)."""
    fs2 = 2.0 * fs
    z = np.asarray(z, dtype=complex)
    p = np.asarray(p, dtype=complex)
    degree = len(p) - len(z)
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    z_d = np.append(z_d, -np.ones(degree))
    k_d = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return z_d, p_d, k_d


def _zpk_lp_transform(z, p, k, wo: float, btype: str, bw: float | None = None):
    """Analog prototype (cutoff 1 rad/s) -> target band, standard
    lowpass-to-{lp,hp,bp,bs} transforms."""
    z = np.asarray(z, dtype=complex)
    p = np.asarray(p, dtype=complex)
    degree = len(p) - len(z)
    if btype == "lowpass":
        return z * wo, p * wo, k * wo**degree
    if btype == "highpass":
        zn = wo / z if len(z) else np.array([])
        pn = wo / p
        zn = np.append(zn, np.zeros(degree))
        kn = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else k * np.real(1.0 / np.prod(-p))
        return zn, pn, kn
    if btype in ("bandpass", "bandstop"):
        assert bw is not None
        if btype == "bandpass":
            zlp = z * bw / 2
            plp = p * bw / 2
            zbp = np.concatenate(
                [zlp + np.sqrt(zlp**2 - wo**2), zlp - np.sqrt(zlp**2 - wo**2)]
            ) if len(z) else np.array([])
            pbp = np.concatenate([plp + np.sqrt(plp**2 - wo**2), plp - np.sqrt(plp**2 - wo**2)])
            zbp = np.append(zbp, np.zeros(degree))
            kbp = k * bw**degree
            return zbp, pbp, kbp
        # bandstop
        zhp = (bw / 2) / z if len(z) else np.array([])
        php = (bw / 2) / p
        zbs = np.concatenate([zhp + np.sqrt(zhp**2 - wo**2), zhp - np.sqrt(zhp**2 - wo**2)]) if len(
            z
        ) else np.array([])
        pbs = np.concatenate([php + np.sqrt(php**2 - wo**2), php - np.sqrt(php**2 - wo**2)])
        zbs = np.append(zbs, np.full(2 * degree - len(zbs) + len(zhp) * 2 - len(zhp) * 2, 0j))
        # zeros at +-j*wo for each degree
        extra = np.concatenate([1j * wo * np.ones(degree), -1j * wo * np.ones(degree)])
        zbs = np.concatenate([zbs, extra])
        kbs = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else k * np.real(1.0 / np.prod(-p))
        return zbs, pbs, kbs
    raise ValueError(btype)


def _zpk_to_sos(z, p, k) -> np.ndarray:
    """Pair conjugate poles/zeros into biquads (simple nearest pairing —
    adequate for Butterworth where poles come in conjugate pairs)."""
    p = np.asarray(p, dtype=complex)
    z = np.asarray(z, dtype=complex)
    # pad zeros to even counts
    n_sections = (max(len(p), len(z)) + 1) // 2
    z = np.concatenate([z, np.zeros(max(0, 2 * n_sections - len(z)), dtype=complex)])
    p = np.concatenate([p, np.zeros(max(0, 2 * n_sections - len(p)), dtype=complex)])

    def take_pair(arr):
        """Pop a conjugate (or two real) pair."""
        arr = list(arr)
        out_pairs = []
        while arr:
            a = arr.pop(0)
            if abs(a.imag) > 1e-12:
                # find conjugate
                j = min(range(len(arr)), key=lambda i: abs(arr[i] - np.conj(a)))
                b = arr.pop(j)
            else:
                # pair with another real (closest)
                if arr:
                    reals = [i for i in range(len(arr)) if abs(arr[i].imag) < 1e-12]
                    j = reals[0] if reals else 0
                    b = arr.pop(j)
                else:
                    b = 0.0 + 0j
            out_pairs.append((a, b))
        return out_pairs

    zp = take_pair(z)
    pp = take_pair(p)
    sos = np.zeros((n_sections, 6))
    for i, ((z1, z2), (p1, p2)) in enumerate(zip(zp, pp)):
        b = np.real(np.poly([z1, z2]))
        a = np.real(np.poly([p1, p2]))
        sos[i, :3] = b
        sos[i, 3:] = a
    sos[0, :3] *= np.real(k)
    return sos


def butter_order(wp, ws, gpass: float, gstop: float) -> tuple[int, float]:
    """Minimal Butterworth order + natural frequency (buttord work-alike,
    lowpass/highpass normalized frequencies; reference:
    filtering/iir.py:44-120)."""
    wp = np.atleast_1d(np.asarray(wp, dtype=float))
    ws = np.atleast_1d(np.asarray(ws, dtype=float))
    # selectivity ratio on analog-prewarped axis
    warp = np.tan(np.pi * wp / 2)
    wars = np.tan(np.pi * ws / 2)
    if len(wp) == 1:
        nat = float(np.abs(wars / warp)[0]) if wp[0] < ws[0] else float(np.abs(warp / wars)[0])
    else:
        if wp[0] < ws[0]:  # bandstop
            nat = float(
                np.min(
                    np.abs(
                        (wars * (warp[0] - warp[1]))
                        / (wars**2 - warp[0] * warp[1])
                    )
                )
            )
        else:  # bandpass
            nat = float(np.min(np.abs((wars**2 - warp[0] * warp[1]) / (wars * (warp[1] - warp[0])))))
    gp = 10 ** (0.1 * gpass) - 1
    gs = 10 ** (0.1 * gstop) - 1
    order = int(math.ceil(0.5 * math.log(gs / gp) / math.log(nat)))
    return max(order, 1), nat


def butter(fpass, fstop, fs: float, gpass: float = 1.0, gstop: float = 40.0) -> SosSpec:
    """Butterworth minimal-order design -> sos (reference:
    filtering/iir.py:44-120).  Cutoff at the passband edge for gpass dB."""
    fpass_a = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop_a = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass_a, fstop_a)
    nyq = fs / 2.0
    wp, ws = fpass_a / nyq, fstop_a / nyq
    order, _ = butter_order(wp, ws, gpass, gstop)

    # analog prototype
    p = _butter_analog_poles(order)
    z = np.array([])
    k = 1.0
    # cutoff so that passband edge hits exactly -gpass dB
    gp = 10 ** (0.1 * gpass) - 1
    warp = np.tan(np.pi * wp / 2) * 2 * fs  # pre-warped rad/s
    if btype in ("lowpass", "highpass"):
        wo = float(warp[0] * gp ** (-1.0 / (2 * order))) if btype == "lowpass" else float(
            warp[0] * gp ** (1.0 / (2 * order))
        )
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype)
    else:
        bw_edges = np.sort(warp)
        wo = float(np.sqrt(bw_edges[0] * bw_edges[1]))
        bw = float(bw_edges[1] - bw_edges[0])
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype, bw)
    zd, pd, kd = _bilinear_zpk(zt, pt, kt, fs)
    sos = _zpk_to_sos(zd, pd, kd)
    return SosSpec(sos=sos, fs=fs, btype=btype, order=order)


def notch(fstop: float, width: float, fs: float) -> SosSpec:
    """Single-frequency 2nd-order notch (iirnotch work-alike; reference:
    filtering/iir.py:354-404).  Q = fstop/width."""
    w0 = fstop / (fs / 2.0)
    q = fstop / width
    wn = np.pi * w0
    alpha = np.sin(wn) / (2 * q)
    b = np.array([1.0, -2 * np.cos(wn), 1.0])
    a = np.array([1 + alpha, -2 * np.cos(wn), 1 - alpha])
    b /= a[0]
    a = a / a[0]
    sos = np.hstack([b, a]).reshape(1, 6)
    return SosSpec(sos=sos, fs=fs, btype="notch", order=2)
