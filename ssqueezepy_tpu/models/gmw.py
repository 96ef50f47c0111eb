# -*- coding: utf-8 -*-
"""Generalized Morse Wavelets (GMW), TPU-native.

Behavioral reference: `/root/reference/ssqueezepy/_gmw.py` (math and
normalizations; jLab-ported utilities `morsewave`/`morsefreq`/`morseafun`/
`laguerre`/`_morsemom` per _gmw.py:398-745). Architecture differs:

  * wavelet functions are *pure, array-module-generic* functions
    (``xp`` = numpy for trace-time scale searches / integrals, ``jax.numpy``
    for on-device filterbank synthesis under jit) instead of numba/CUDA
    closure triples (_gmw.py:197-363),
  * the L2 ('energy') branch is evaluated in log-space, making it safe in
    float32 on TPU (the reference must force float64, _gmw.py:122-124,
    because Gamma(r) overflows float32 when computed directly); float64
    remains the default for 'energy' for numerical parity.

All constants (center frequency, Laguerre coefficients) are computed at
trace time in float64 numpy.
"""
import numpy as np
import jax.numpy as jnp
from scipy.special import gamma as gamma_fn, gammaln as gammaln_fn

from ..utils.common import pi, assert_is_one_of
from ..configs import gdefaults

__all__ = [
    'gmw', 'compute_gmw', 'morsewave', 'morseafun', 'morsefreq',
    'laguerre', 'gmw_l1', 'gmw_l2', 'gmw_l1_k', 'gmw_l2_k',
]


def _check_args(gamma=None, beta=None, norm=None, order=None, scale=None,
                allow_zerobeta=True):
    """GMW parameter validation (same rejection set as the reference,
    _gmw.py:748-773)."""
    if gamma is not None and gamma <= 0:
        raise ValueError("GMW `gamma` must exceed 0; got %r" % gamma)
    if beta is not None and beta < 0:
        raise ValueError("GMW `beta` cannot be negative; got %r" % beta)
    if beta == 0 and not allow_zerobeta:
        raise ValueError("`beta` of zero is only supported by "
                         "`morsewave` (the analytic lowpass case); "
                         "got %r here" % beta)
    if norm is not None and norm not in ('bandpass', 'energy'):
        raise ValueError("GMW `norm` is 'bandpass' or 'energy'; got %r"
                         % norm)
    if order is not None:
        if not isinstance(order, (int, float)) or \
                float(order) != int(order):
            raise TypeError("GMW `order` must be an integer; got %r"
                            % (order,))
        if order < 0:
            raise ValueError("GMW `order` cannot be negative; got %r"
                             % order)
    if scale is not None and scale <= 0:
        raise ValueError("`scale` must exceed 0; got %r" % scale)


# --------------------------------------------------------------------------
# factories: return (fn, params) where fn(w, xp) evaluates the freq-domain
# wavelet at radian frequencies w with array module xp
# --------------------------------------------------------------------------
def gmw(gamma=None, beta=None, norm=None, order=None, centered_scale=None,
        dtype=None):
    """Generalized Morse Wavelet factory; returns ``fn(w, xp=jnp)``.

    Parity: reference `_gmw.gmw` (_gmw.py:22-131) — L1 ('bandpass',
    freq-domain peak value 2) and L2 ('energy') normalizations, order-k
    via precomputed Laguerre constants. Unlike the reference, float32 is
    allowed with `norm='energy'` thanks to log-space evaluation.
    """
    kw = gdefaults('gmw', gamma=gamma, beta=beta, norm=norm, order=order,
                   centered_scale=centered_scale)
    gamma, beta = float(kw['gamma']), float(kw['beta'])
    norm, k = kw['norm'], int(kw['order'])
    centered_scale = bool(kw['centered_scale'])
    _check_args(gamma=gamma, beta=beta, norm=norm, order=k,
                allow_zerobeta=False)

    if k == 0:
        fn = (gmw_l1(gamma, beta, centered_scale) if norm == 'bandpass' else
              gmw_l2(gamma, beta, centered_scale))
    else:
        fn = (gmw_l1_k(gamma, beta, k, centered_scale) if norm == 'bandpass'
              else gmw_l2_k(gamma, beta, k, centered_scale))
    fn.config = dict(gamma=gamma, beta=beta, norm=norm, order=k,
                     centered_scale=centered_scale)
    fn.qualname = 'gmw_l1' if norm == 'bandpass' else 'gmw_l2'
    return fn


def gmw_l1(gamma=3., beta=60., centered_scale=False):
    """L1(bandpass)-normalized first-order GMW (reference _gmw.py:187-225):
    ``psih(w) = 2 exp(-beta ln wc + wc^gamma + beta ln w - w^gamma)``,
    evaluated in log-space (numerically stable in float32).
    """
    _check_args(gamma=gamma, beta=beta, allow_zerobeta=False)
    wc = morsefreq(gamma, beta)
    wcl = float(np.log(wc))
    const = float(-beta * wcl + wc ** gamma)

    def fn(w, xp=jnp):
        w = xp.asarray(w)
        if centered_scale:
            w = w * xp.asarray(np.asarray(wc, w.dtype))
        w_nonneg = (w >= 0)
        w = w * w_nonneg
        logw = xp.log(xp.where(w > 0, w, 1))
        out = 2 * xp.exp(xp.asarray(np.asarray(const, w.dtype))
                         + beta * logw - w ** gamma)
        return xp.where(w > 0, out, 0).astype(w.dtype)
    return fn


def gmw_l2(gamma=3., beta=60., centered_scale=False):
    """L2(energy)-normalized first-order GMW (reference _gmw.py:228-264):
    ``psih(w) = sqrt(2 pi gamma 2^r / Gamma(r)) w^beta exp(-w^gamma)``,
    r = (2 beta + 1)/gamma — evaluated in log-space.
    """
    _check_args(gamma=gamma, beta=beta, allow_zerobeta=False)
    wc = morsefreq(gamma, beta)
    r = (2 * beta + 1) / gamma
    logconst = float(0.5 * (np.log(2 * pi * gamma) + r * np.log(2)
                            - gammaln_fn(r)))

    def fn(w, xp=jnp):
        w = xp.asarray(w)
        if centered_scale:
            w = w * xp.asarray(np.asarray(wc, w.dtype))
        w_nonneg = (w >= 0)
        w = w * w_nonneg
        logw = xp.log(xp.where(w > 0, w, 1))
        out = xp.exp(xp.asarray(np.asarray(logconst, w.dtype))
                     + beta * logw - w ** gamma)
        return xp.where(w > 0, out, 0).astype(w.dtype)
    return fn


def _gmw_k_constants(gamma, beta, k, norm='bandpass'):
    """Laguerre polynomial constants & coeff for order-k GMWs
    (reference _gmw.py:366-394, gammaln-stabilized)."""
    r = (2 * beta + 1) / gamma
    c = r - 1
    if norm == 'bandpass':
        coeff = np.sqrt(np.exp(gammaln_fn(r) + gammaln_fn(k + 1) -
                               gammaln_fn(k + r)))
    else:
        coeff = np.sqrt(2 * pi * gamma * (2 ** r) *
                        np.exp(gammaln_fn(k + 1) - gammaln_fn(k + r)))

    k_consts = _laguerre_coeffs(k, c) * coeff
    if norm == 'bandpass':
        k_consts = k_consts * 2
    return k_consts


def gmw_l1_k(gamma=3., beta=60., k=1, centered_scale=False):
    """Order-k L1 GMW (reference _gmw.py:267-315)."""
    _check_args(gamma=gamma, beta=beta, allow_zerobeta=False)
    wc = morsefreq(gamma, beta)
    k_consts = _gmw_k_constants(gamma, beta, k, norm='bandpass')
    const = float(-beta * np.log(wc) + wc ** gamma)

    def fn(w, xp=jnp):
        w = xp.asarray(w)
        if centered_scale:
            w = w * xp.asarray(np.asarray(wc, w.dtype))
        w_nonneg = (w >= 0)
        w = w * w_nonneg
        logw = xp.log(xp.where(w > 0, w, 1))
        wg = w ** gamma
        C = xp.zeros_like(w)
        for m in range(len(k_consts)):
            C = C + xp.asarray(np.asarray(k_consts[m], w.dtype)) \
                * (2 * wg) ** m
        out = C * xp.exp(xp.asarray(np.asarray(const, w.dtype))
                         + beta * logw - wg)
        return xp.where(w > 0, out, 0).astype(w.dtype)
    return fn


def gmw_l2_k(gamma=3., beta=60., k=1, centered_scale=False):
    """Order-k L2 GMW (reference _gmw.py:318-363)."""
    _check_args(gamma=gamma, beta=beta, allow_zerobeta=False)
    wc = morsefreq(gamma, beta)
    k_consts = _gmw_k_constants(gamma, beta, k, norm='energy')

    def fn(w, xp=jnp):
        w = xp.asarray(w)
        if centered_scale:
            w = w * xp.asarray(np.asarray(wc, w.dtype))
        w_nonneg = (w >= 0)
        w = w * w_nonneg
        logw = xp.log(xp.where(w > 0, w, 1))
        wg = w ** gamma
        C = xp.zeros_like(w)
        for m in range(len(k_consts)):
            C = C + xp.asarray(np.asarray(k_consts[m], w.dtype)) \
                * (2 * wg) ** m
        out = C * xp.exp(beta * logw - wg)
        return xp.where(w > 0, out, 0).astype(w.dtype)
    return fn


# --------------------------------------------------------------------------
# array-evaluating helpers & jLab-ported utilities (numpy; trace-time)
# --------------------------------------------------------------------------
def compute_gmw(N, scale, gamma=3, beta=60, time=False, norm='bandpass',
                order=0, centered_scale=False, norm_scale=True, dtype=None):
    """Evaluate a GMW as arrays (freq-domain psih; optionally time-domain
    psi). Parity: reference `_gmw.compute_gmw` (_gmw.py:134-184)."""
    from .wavelets import _xifn
    _check_args(gamma=gamma, beta=beta, norm=norm, scale=scale)
    gmw_fn = gmw(gamma, beta, norm, order, centered_scale,
                 dtype=dtype)

    w = _xifn(scale, N)
    X = np.zeros(N)
    X[:N // 2 + 1] = np.asarray(gmw_fn(w[:N // 2 + 1], xp=np))

    if norm == 'energy' and norm_scale:
        wc = morsefreq(gamma, beta)
        X *= (np.sqrt(wc * scale) if centered_scale else np.sqrt(scale))
    X[np.isinf(X) | np.isnan(X)] = 0.

    if time:
        return X, _spectrum_to_time(X)
    return X


def _spectrum_to_time(X, axis=0):
    """Frequency-domain wavelet -> centered time-domain wavelet: the
    alternating-sign multiply circularly centers the IFFT, and for even
    N the Nyquist bin is halved first (jLab issue #13: keeps the
    time-domain tail decaying). Shared by `compute_gmw` and
    `morsewave`."""
    Xc = np.array(X, copy=True)
    n = Xc.shape[axis]
    if n % 2 == 0:
        nyq = [slice(None)] * Xc.ndim
        nyq[axis] = n // 2
        Xc[tuple(nyq)] = Xc[tuple(nyq)] / 2
    shape = [1] * Xc.ndim
    shape[axis] = n
    signs = ((-1.) ** np.arange(n)).reshape(shape)
    return np.fft.ifft(Xc * signs, axis=axis)


def _gmw_spectrum0(w, gamma, beta, norm, wp):
    """Zeroth-order GMW spectrum at radian frequencies `w`, log-form
    (`wp` = peak frequency, anchoring the bandpass peak at 2). The
    beta = 0 degenerate case is the pure lowpass exp(-w^gamma); its
    DC bin is halved (unit step -> clean lowpass). Non-finite entries
    (log 0 at DC for beta > 0) are zeroed."""
    with np.errstate(divide='ignore', invalid='ignore'):
        if beta == 0:
            spec = np.exp(-w ** gamma)
            if norm == 'bandpass':
                spec = 2 * spec
            spec[0] = spec[0] / 2
        elif norm == 'energy':
            spec = np.exp(beta * np.log(w) - w ** gamma)
        else:
            peak_log = -beta * np.log(wp) + wp ** gamma
            spec = 2 * np.exp(peak_log + beta * np.log(w) - w ** gamma)
    spec[~np.isfinite(spec)] = 0.
    return spec


def _family_amplitude(gamma, beta, k, norm, stretch):
    """Per-member normalization of the k-th orthogonal family member."""
    if norm == 'energy':
        return np.sqrt(1. / stretch) * morseafun(gamma, beta, k + 1,
                                                 norm='energy')
    if beta == 0:
        return 1.
    r = (2 * beta + 1) / gamma
    return np.sqrt(np.exp(gammaln_fn(r) + gammaln_fn(k + 1)
                          - gammaln_fn(k + r)))


def morsewave(N, freqs, gamma=3, beta=60, K=1, norm='bandpass'):
    """First K orthogonal GMWs at (peak) center frequencies `freqs`
    (radians), incl. the beta=0 lowpass case. Functional parity with the
    reference's jLab port (`_gmw.morsewave`, _gmw.py:398-481; after
    Olhede & Walden 2002); organized here around the shared log-space
    spectrum builder + Laguerre modulation.

    Returns (psih, psi) with shape [N x len(freqs) x K], length-1 dims
    collapsed.
    """
    _check_args(gamma=gamma, beta=beta, norm=norm)
    freqs = np.atleast_1d(np.asarray(freqs, dtype=np.float64).squeeze())
    if freqs.ndim == 0:
        freqs = freqs[None]

    specs, waves = [], []
    for f in freqs:
        X, x = _morsewave_family(N, abs(f), gamma, beta, K, norm)
        if f < 0:
            x = x.conj()
            X = np.concatenate([X[:1], X[:0:-1]], axis=0)
        specs.append(X)
        waves.append(x)
    psif = np.stack(specs, axis=1)               # (N, n_freqs, K)
    psi = np.stack(waves, axis=1)
    return psif.squeeze(), psi.squeeze()


def _morsewave_family(N, f, gamma, beta, K, norm):
    """(psih, psi) of the K-member family at one center frequency:
    spectrum columns are `amplitude_k * spectrum0 * L_k^c(2 w^gamma)`
    on the non-negative half (generalized Laguerre orthogonalization),
    converted to time via `_spectrum_to_time`."""
    wp = morsefreq(gamma, beta)
    stretch = f / wp
    w = (2 * pi / stretch) * np.linspace(0, 1, N, endpoint=False)
    base = _gmw_spectrum0(w, gamma, beta, norm, wp)

    half = slice(0, N // 2 + 1)
    c = (2 * beta + 1) / gamma - 1
    X = np.zeros((N, K))
    for k in range(K):
        Lk = np.zeros(N)
        Lk[half] = laguerre(2 * w[half] ** gamma, k, c)
        X[:, k] = _family_amplitude(gamma, beta, k, norm, stretch) \
            * base * Lk
    X[np.isinf(X)] = 0.
    return X, _spectrum_to_time(X, axis=0)


def morseafun(gamma, beta, k=1, norm='bandpass'):
    """GMW amplitude (freq-domain peak value); parity with the
    reference's jLab port (_gmw.py:555-589)."""
    if norm == 'bandpass':
        if beta == 0:
            return 2.
        wp = morsefreq(gamma, beta)
        return 2. / np.exp(beta * np.log(wp) - wp ** gamma)
    if norm != 'energy':
        raise ValueError("unsupported `norm`: %s; must be one of: "
                         "'bandpass', 'energy'." % norm)
    r = (2 * beta + 1) / gamma
    return np.sqrt(2 * pi * gamma * (2 ** r)
                   * np.exp(gammaln_fn(k) - gammaln_fn(k + r - 1)))


def _laguerre_coeffs(k, c):
    """Coefficient vector of the generalized Laguerre polynomial
    L_k^c (coeffs[m] multiplies x^m), gammaln-stabilized."""
    m = np.arange(k + 1)
    logmag = (gammaln_fn(k + c + 1) - gammaln_fn(c + m + 1)
              - gammaln_fn(k - m + 1))
    return (-1.) ** m * np.exp(logmag) / gamma_fn(m + 1)


def laguerre(x, k, c):
    """Generalized Laguerre polynomial L_k^c(x) (ascending-power
    evaluation; shared coefficients with `_gmw_k_constants`)."""
    x = np.atleast_1d(np.asarray(x).squeeze())
    assert x.ndim == 1
    y = np.zeros(x.shape)
    for m, cm in enumerate(_laguerre_coeffs(k, c)):
        y += cm * x ** m
    return y


def morsefreq(gamma, beta, n_out=1):
    """GMW frequency measures (radian), most-used first: peak `wm`,
    energy `we`, instantaneous `wi`, curvature `cwi`. Parity with the
    reference's jLab port (_gmw.py:611-657); measures are computed
    lazily up to `n_out`."""
    out = [(beta / gamma) ** (1 / gamma)]
    if n_out >= 2:
        out.append((1 / 2 ** (1 / gamma))
                   * (gamma_fn((2 * beta + 2) / gamma)
                      / gamma_fn((2 * beta + 1) / gamma)))
    if n_out >= 3:
        out.append(gamma_fn((beta + 2) / gamma)
                   / gamma_fn((beta + 1) / gamma))
    if n_out >= 4:
        k2 = _morsemom(2, gamma, beta, n_out=3)[-1]
        k3 = _morsemom(3, gamma, beta, n_out=3)[-1]
        out.append(-(k3 / k2 ** 1.5))
    return out[0] if n_out == 1 else tuple(out[:n_out])


def _energy_moment1(p, gamma, beta):
    """p-th frequency moment of the first-order GMW:
    amplitude x (1/(2 pi gamma)) Gamma((beta + p + 1)/gamma)."""
    mf = (1 / (2 * pi * gamma)) * gamma_fn((beta + p + 1) / gamma)
    return morseafun(gamma, beta, k=1) * mf


def _morsemom(p, gamma, beta, n_out=4):
    """p-th order frequency-domain moments (Mp wavelet, Np energy) and
    cumulants (Kp, Lp) of the first-order GMW; parity with the
    reference's jLab port (_gmw.py:660-718)."""
    Mp = _energy_moment1(p, gamma, beta)
    if n_out == 1:
        return Mp
    Np = (2 / 2 ** ((1 + p) / gamma)) * _energy_moment1(p, gamma, 2 * beta)
    if n_out == 2:
        return Mp, Np
    orders = np.arange(p + 1)
    Kp = _moments_to_cumulants(_energy_moment1(orders, gamma, beta))[p]
    if n_out == 3:
        return Mp, Np, Kp
    e_moments = (2 / 2 ** ((1 + orders) / gamma)) \
        * _energy_moment1(orders, gamma, 2 * beta)
    Lp = _moments_to_cumulants(e_moments)[p]
    return Mp, Np, Kp, Lp


def _moments_to_cumulants(moments):
    """Raw moments -> cumulants via the standard recurrence
    kappa_n = m_n/m_0 - sum_k C(n-1, k-1) kappa_k m_{n-k}/m_0."""
    from math import comb
    moments = np.atleast_1d(np.asarray(moments).squeeze())
    assert moments.ndim == 1
    scaled = moments / moments[0]
    cumulants = np.zeros(len(moments))
    cumulants[0] = np.log(moments[0])
    for n in range(1, len(moments)):
        acc = scaled[n]
        for k in range(1, n):
            acc = acc - comb(n - 1, k - 1) * cumulants[k] * scaled[n - k]
        cumulants[n] = acc
    return cumulants
