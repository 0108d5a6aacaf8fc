"""Chebyshev type I/II IIR design + Remez-exchange FIR design, pure numpy.

Extends dsp/design.py with the remaining reference filter families
(reference: filtering/iir.py:123-274 Cheby1/Cheby2, :277-351 Ellip,
filtering/fir.py:483-664 Remez).  Elliptic design includes the Jacobi
elliptic machinery (AGM amplitude algorithm, theta-function nome for the
degree equation) in pure numpy.

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


# ------------------------------------------------------------- elliptic
# Jacobi elliptic machinery (AGM + Landen + theta-function nome), enough
# for the classic ellipap pole/zero construction (reference:
# filtering/iir.py:277-351 delegates to scipy's equivalent).

def _ellipk(m: float) -> float:
    """Complete elliptic integral K(m) via AGM (m = k^2)."""
    if m >= 1.0:
        return float("inf")
    a, b = 1.0, math.sqrt(1.0 - m)
    while abs(a - b) > 1e-15 * a:
        a, b = (a + b) / 2.0, math.sqrt(a * b)
    return math.pi / (2.0 * a)


def _ellipj(u: float, m: float):
    """sn, cn, dn via the AGM amplitude algorithm (A&S 16.4, real u,
    0 <= m < 1)."""
    if m < 1e-14:
        return math.sin(u), math.cos(u), 1.0
    if m > 1 - 1e-14:
        sn = math.tanh(u)
        return sn, 1 / math.cosh(u), 1 / math.cosh(u)
    a, b, c = 1.0, math.sqrt(1.0 - m), math.sqrt(m)
    a_list, c_list = [a], [c]
    n = 0
    while abs(c) > 1e-16 * a and n < 60:
        a, b, c = (a + b) / 2.0, math.sqrt(a * b), (a - b) / 2.0
        a_list.append(a)
        c_list.append(c)
        n += 1
    phi = (2.0**n) * a_list[n] * u
    for i in range(n, 0, -1):
        phi = (phi + math.asin(
            max(-1.0, min(1.0, c_list[i] / a_list[i] * math.sin(phi)))
        )) / 2.0
    sn = math.sin(phi)
    cn = math.cos(phi)
    dn = math.sqrt(max(1 - m * sn * sn, 0.0))
    return sn, cn, dn


def _ellipF(phi: float, m: float) -> float:
    """Incomplete elliptic integral F(phi, m) by adaptive Simpson."""
    n = 2048
    theta = np.linspace(0.0, phi, n + 1)
    integrand = 1.0 / np.sqrt(1.0 - m * np.sin(theta) ** 2)
    w = np.ones(n + 1)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return float((phi / n) / 3.0 * np.sum(w * integrand))


def _ellipdeg(n: int, k1: float) -> float:
    """Solve the degree equation for k (modulus) given order n and k1 —
    theta-function/nome method (standard ellipdeg)."""
    K1 = _ellipk(k1 * k1)
    K1p = _ellipk(1 - k1 * k1)
    q1 = math.exp(-math.pi * K1p / K1)
    q = q1 ** (1.0 / n)
    num = sum(q ** (i * (i + 1)) for i in range(8))
    den = 1 + 2 * sum(q ** (i * i) for i in range(1, 8))
    return 4 * math.sqrt(q) * (num / den) ** 2  # k


def ellip_order(wp: float, ws: float, gpass: float, gstop: float) -> int:
    """Minimal elliptic order (lowpass-prototype normalized freqs)."""
    k = wp / ws  # selectivity
    eps_p = math.sqrt(10 ** (0.1 * gpass) - 1)
    eps_s = math.sqrt(10 ** (0.1 * gstop) - 1)
    k1 = eps_p / eps_s
    n = (_ellipk(k * k) * _ellipk(1 - k1 * k1)) / (
        _ellipk(1 - k * k) * _ellipk(k1 * k1)
    )
    return max(int(math.ceil(n)), 1)


def _ellipap(n: int, rp: float, rs: float):
    """Analog elliptic prototype zeros/poles/gain (ellipap work-alike):
    passband edge at 1 rad/s, rp dB ripple, rs dB stopband."""
    eps = math.sqrt(10 ** (0.1 * rp) - 1)
    k1 = eps / math.sqrt(10 ** (0.1 * rs) - 1)
    m = _ellipdeg(n, k1) ** 2  # k^2
    K = _ellipk(m)

    jvec = np.arange(1 - n % 2, n, 2)
    z = []
    for j in jvec:
        s, c, d = _ellipj(j * K / n, m)
        if abs(s) > 1e-12:
            z.append(1j / (math.sqrt(m) * s))
    z = np.array(z)
    z = np.concatenate([z, np.conj(z)])

    # v0 = K/(n*K1) * Im(asn(j/eps, k1^2));  asn(j t, m) = j F(atan(t), 1-m)
    K1 = _ellipk(k1 * k1)
    v0 = (K / (n * K1)) * _ellipF(math.atan(1.0 / eps), 1 - k1 * k1)
    sv, cv, dv = _ellipj(v0, 1 - m)
    p = []
    for j in jvec:
        s, c, d = _ellipj(j * K / n, m)
        denom = 1.0 - (d * sv) ** 2
        pj = -(c * d * sv * cv + 1j * s * dv) / denom
        p.append(pj)
    p = np.array(p)
    # conjugate pairs for complex poles (j>0 yields distinct conjugates)
    if n % 2 == 1:
        real_mask = np.abs(p.imag) < 1e-10
        pc = p[~real_mask]
        p = np.concatenate([p, np.conj(pc)])
    else:
        p = np.concatenate([p, np.conj(p)])
    k0 = np.real(np.prod(-p) / np.prod(-z))
    if n % 2 == 0:
        k0 /= math.sqrt(1 + eps * eps)
    return z, p, k0


def ellip(fpass, fstop, fs: float, gpass: float = 1.0, gstop: float = 40.0) -> SosSpec:
    """Elliptic (Cauer) minimal-order design
    (reference: filtering/iir.py:277-351)."""
    fpass_a = np.atleast_1d(np.asarray(fpass, dtype=float))
    fstop_a = np.atleast_1d(np.asarray(fstop, dtype=float))
    btype = _btype(fpass_a, fstop_a)
    nyq = fs / 2.0
    wp, ws = fpass_a / nyq, fstop_a / nyq
    warp_p = np.tan(np.pi * wp / 2)
    warp_s = np.tan(np.pi * ws / 2)
    if btype in ("lowpass", "highpass"):
        sel = (
            warp_p[0] / warp_s[0] if btype == "lowpass" else warp_s[0] / warp_p[0]
        )
        order = ellip_order(sel, 1.0, gpass, gstop)
    else:
        if btype == "bandpass":
            nat = np.min(
                np.abs((warp_s**2 - warp_p[0] * warp_p[1]) / (warp_s * (warp_p[1] - warp_p[0])))
            )
        else:
            nat = np.min(
                np.abs((warp_s * (warp_p[0] - warp_p[1])) / (warp_s**2 - warp_p[0] * warp_p[1]))
            )
        order = ellip_order(1.0 / float(nat), 1.0, gpass, gstop)
    z, p, k = _ellipap(order, gpass, gstop)
    if btype in ("lowpass", "highpass"):
        wo = float(warp_p[0]) * 2 * fs
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype)
    else:
        e = np.sort(warp_p) * 2 * fs
        wo = float(np.sqrt(e[0] * e[1]))
        bw = float(e[1] - e[0])
        zt, pt, kt = _zpk_lp_transform(z, p, k, wo, btype, bw)
    zd, pd, kd = _bilinear_zpk(zt, pt, kt, fs)
    sos = _zpk_to_sos(zd, pd, kd)
    return SosSpec(sos=sos, fs=fs, btype=btype, order=order)
