"""Chebyshev type I/II IIR design + Remez-exchange FIR design, pure numpy.

Extends dsp/design.py with the remaining reference filter families
(reference: filtering/iir.py:123-274 Cheby1/Cheby2,
filtering/fir.py:483-664 Remez).  Elliptic (filtering/iir.py:277-351)
requires Jacobi elliptic functions — deferred (documented TODO); Butter,
Cheby1, Cheby2, Notch cover the standard use cases.

All public textbook algorithms: Chebyshev analog prototypes ->
lowpass-band transform -> bilinear -> sos (shared machinery from
design.py); equiripple FIR via Lawson-iterated weighted least squares
(IRLS), which converges to the Parks-McClellan minimax solution.
"""

from __future__ import annotations

import math

import numpy as np

from openseize_spark.dsp.design import (
    FirSpec,
    SosSpec,
    _bilinear_zpk,
    _btype,
    _zpk_lp_transform,
    _zpk_to_sos,
)


# ----------------------------------------------------------- chebyshev
def _cheb_ord(wp, ws, gpass: float, gstop: float) -> tuple[int, float]:
    wp = np.atleast_1d(np.asarray(wp, dtype=float))
    ws = np.atleast_1d(np.asarray(ws, dtype=float))
    warp = np.tan(np.pi * wp / 2)
    wars = np.tan(np.pi * ws / 2)
    if len(wp) == 1:
        nat = float((wars / warp)[0]) if wp[0] < ws[0] else float((warp / wars)[0])
    else:
        if wp[0] > ws[0]:  # bandpass
            nat = float(np.min(np.abs((wars**2 - warp[0] * warp[1]) / (wars * (warp[1] - warp[0])))))
        else:  # bandstop
            nat = float(np.min(np.abs((wars * (warp[0] - warp[1])) / (wars**2 - warp[0] * warp[1]))))
    gp = 10 ** (0.1 * gpass) - 1
    gs = 10 ** (0.1 * gstop) - 1
    n = int(math.ceil(math.acosh(math.sqrt(gs / gp)) / math.acosh(nat)))
    return max(n, 1), nat


def _cheby1_proto(n: int, rp: float):
    """Type-I analog prototype: ripple in passband, cutoff = 1 rad/s."""
    eps = math.sqrt(10 ** (0.1 * rp) - 1)
    mu = math.asinh(1.0 / eps) / n
    k = np.arange(1, n + 1)
    theta = np.pi * (2 * k - 1) / (2 * n)
    p = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    z = np.array([])
    gain = np.real(np.prod(-p))
    if n % 2 == 0:
        gain /= math.sqrt(1 + eps**2)
    return z, p, gain


def _cheby2_proto(n: int, rs: float):
    """Type-II (inverse Chebyshev): flat passband, equiripple stopband at
    1 rad/s."""
    eps = 1.0 / math.sqrt(10 ** (0.1 * rs) - 1)
    mu = math.asinh(1.0 / eps) / n
    k = np.arange(1, n + 1)
    theta = np.pi * (2 * k - 1) / (2 * n)
    # poles: reciprocal of type-I poles
    p1 = -np.sinh(mu) * np.sin(theta) + 1j * np.cosh(mu) * np.cos(theta)
    p = 1.0 / p1
    # zeros on the imaginary axis at sec(theta); drop the infinite one for odd n
    kz = k[np.abs(np.cos(theta)) > 1e-12]
    z = 1j / np.cos(np.pi * (2 * kz - 1) / (2 * n))
    gain = np.real(np.prod(-p) / np.prod(-z))
    return z, p, gain


def _design_iir(proto_fn, order_fn, fpass, fstop, fs, gpass, gstop, ripple_arg):
    fpass_a = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop_a = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass_a, fstop_a)
    nyq = fs / 2.0
    wp, ws = fpass_a / nyq, fstop_a / nyq
    order, _ = order_fn(wp, ws, gpass, gstop)
    z, p, k = proto_fn(order, ripple_arg)
    # edge where the ripple spec is met exactly:
    # cheby1 -> passband edge; cheby2 -> stopband edge
    edge = wp if proto_fn is _cheby1_proto else ws
    warp = np.tan(np.pi * edge / 2) * 2 * fs
    if btype in ("lowpass", "highpass"):
        wo = float(warp[0])
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype)
    else:
        e = np.sort(warp)
        wo = float(np.sqrt(e[0] * e[1]))
        bw = float(e[1] - e[0])
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype, bw)
    zd, pd, kd = _bilinear_zpk(zt, pt, kt, fs)
    sos = _zpk_to_sos(zd, pd, kd)
    return SosSpec(sos=sos, fs=fs, btype=btype, order=order)


def cheby1(fpass, fstop, fs: float, gpass: float = 1.0, gstop: float = 40.0) -> SosSpec:
    """Chebyshev type-I minimal order design
    (reference: filtering/iir.py:123-197)."""
    return _design_iir(_cheby1_proto, _cheb_ord, fpass, fstop, fs, gpass, gstop, gpass)


def cheby2(fpass, fstop, fs: float, gpass: float = 1.0, gstop: float = 40.0) -> SosSpec:
    """Chebyshev type-II minimal order design
    (reference: filtering/iir.py:200-274)."""
    return _design_iir(_cheby2_proto, _cheb_ord, fpass, fstop, fs, gpass, gstop, gstop)


# --------------------------------------------------------------- remez
def remez(
    numtaps: int,
    bands,
    desired,
    fs: float = 2.0,
    weight=None,
    maxiter: int = 50,
) -> np.ndarray:
    """Equiripple multiband FIR — Lawson-iterated weighted least squares,
    which converges to the same minimax (Parks-McClellan) solution the
    reference obtains from sps.remez (reference: filtering/fir.py:483-664).

    Each iteration solves the (r+1)x(r+1) cosine-basis normal equations
    and re-weights by the error magnitude (Lawson's algorithm); this is
    robust where classic exchange bookkeeping is fragile.

    bands: flat band-edge list in Hz (len = 2*len(desired));
    desired: target gain per band; weight: per-band error weights.
    Type-I linear phase (odd numtaps recommended).
    """
    bands = np.asarray(bands, dtype=float) / fs  # normalize to [0, 0.5]
    desired = np.asarray(desired, dtype=float)
    nb = len(desired)
    weight = np.ones(nb) if weight is None else np.asarray(weight, dtype=float)
    r = (numtaps - 1) // 2  # cosine basis size - 1

    # dense frequency grid restricted to the bands
    grid, d_grid, w_grid = [], [], []
    gd = max(16 * (r + 2), 512)
    for i in range(nb):
        lo, hi = bands[2 * i], bands[2 * i + 1]
        npts = max(int(gd * (hi - lo) / 0.5), 8)
        g = np.linspace(lo, hi, npts)
        grid.append(g)
        d_grid.append(np.full(npts, desired[i]))
        w_grid.append(np.full(npts, weight[i]))
    grid = np.concatenate(grid)
    d_grid = np.concatenate(d_grid)
    w_grid = np.concatenate(w_grid)

    # cosine design matrix: A(f) = sum_k a_k cos(2 pi f k)
    C = np.cos(2 * np.pi * np.outer(grid, np.arange(r + 1)))

    lawson = np.ones(len(grid))
    a = None
    for _ in range(maxiter):
        w = w_grid * lawson
        Cw = C * w[:, None]
        G = Cw.T @ C
        b = Cw.T @ d_grid
        a = np.linalg.solve(G + 1e-12 * np.eye(r + 1), b)
        err = np.abs((C @ a - d_grid) * w_grid)
        mx = err.max()
        if mx <= 0:
            break
        new_lawson = lawson * np.maximum(err / mx, 1e-6)
        new_lawson /= new_lawson.mean()
        if np.max(np.abs(new_lawson - lawson)) < 1e-10:
            break
        lawson = new_lawson

    h = np.zeros(numtaps)
    h[r] = a[0]
    for k in range(1, r + 1):
        h[r - k] = h[r + k] = a[k] / 2.0
    return h


def remez_fir(fpass, fstop, fs: float, gpass: float = 0.5, gstop: float = 40.0) -> FirSpec:
    """Remez with Bellanger tap estimate (reference:
    filtering/fir.py:519-664)."""
    fpass_a = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop_a = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass_a, fstop_a)
    dp = 1 - 10 ** (-gpass / 20)
    ds = 10 ** (-gstop / 20)
    width = np.min(np.abs(fstop_a - fpass_a))
    numtaps = int(math.ceil(2.0 / 3.0 * math.log10(1 / (10 * dp * ds)) * fs / width))
    # Bellanger can under-allocate for asymmetric ripple specs; floor with
    # the Kaiser estimate so the attenuation target is reachable
    from openseize_spark.dsp.design import kaiser_order

    numtaps = max(numtaps, kaiser_order(gstop, width / (fs / 2)))
    numtaps += 1 - numtaps % 2
    nyq = fs / 2
    if btype == "lowpass":
        bands = [0, fpass_a[0], fstop_a[0], nyq]
        desired = [1, 0]
        weight = [ds / dp, 1]
    elif btype == "highpass":
        bands = [0, fstop_a[0], fpass_a[0], nyq]
        desired = [0, 1]
        weight = [1, ds / dp]
    elif btype == "bandpass":
        bands = [0, fstop_a[0], fpass_a[0], fpass_a[1], fstop_a[1], nyq]
        desired = [0, 1, 0]
        weight = [1, ds / dp, 1]
    else:
        bands = [0, fpass_a[0], fstop_a[0], fstop_a[1], fpass_a[1], nyq]
        desired = [1, 0, 1]
        weight = [ds / dp, 1, ds / dp]
    taps = remez(numtaps, bands, desired, fs=fs, weight=weight)
    return FirSpec(taps=taps, fs=fs, btype=btype, fpass=tuple(fpass_a), fstop=tuple(fstop_a))
