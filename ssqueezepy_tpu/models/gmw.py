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
    """Argument validation (mirrors reference _gmw.py:748-773)."""
    if gamma is not None and gamma <= 0:
        raise ValueError(f"`gamma` must be positive (got {gamma})")
    if beta is not None:
        if beta < 0:
            kind = "non-negative" if allow_zerobeta else "positive"
            raise ValueError(f"`beta` must be {kind} (got {beta})")
        elif beta == 0 and not allow_zerobeta:
            raise ValueError(f"`beta` cannot be zero (got {beta}); "
                             "use `morsewave`, which supports it")
    if norm is not None and norm not in ('bandpass', 'energy'):
        raise ValueError(f"`norm` must be 'energy' or 'bandpass' "
                         f"(got '{norm}')")
    if order is not None:
        if (not isinstance(order, (int, float)) or
                (isinstance(order, float) and not float(order).is_integer())):
            raise TypeError("`order` must be integer (got %s)" % str(order))
        elif order < 0:
            raise ValueError("`order` must be >=0 (got %s)" % order)
    if scale is not None and scale <= 0:
        raise ValueError(f"`scale` must be positive (got {scale})")


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

    L_consts = np.zeros(k + 1)
    for m in range(k + 1):
        fact = np.exp(gammaln_fn(k + c + 1) - gammaln_fn(c + m + 1) -
                      gammaln_fn(k - m + 1))
        L_consts[m] = (-1) ** m * fact / gamma_fn(m + 1)

    k_consts = L_consts * coeff
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
        Xr = X.copy()
        if N % 2 == 0:
            Xr[N // 2] /= 2  # jLab issue #13: halve Nyquist for decay
        x = np.fft.ifft(Xr * (-1) ** np.arange(N))
        return X, x
    return X


def morsewave(N, freqs, gamma=3, beta=60, K=1, norm='bandpass'):
    """First K orthogonal GMWs at (peak) center frequencies `freqs`
    (radians). Full jLab-equivalent generator, incl. the beta=0 lowpass
    case. Parity: reference `_gmw.morsewave` (_gmw.py:398-481).

    Returns (psih, psi) with shape [N x len(freqs) x K], length-1 dims
    collapsed.
    """
    _check_args(gamma=gamma, beta=beta, norm=norm)
    if not isinstance(freqs, (list, tuple, np.ndarray)):
        freqs = [freqs]
    psi = np.zeros((N, len(freqs), K), dtype='complex128')
    psif = np.zeros((N, len(freqs), K))

    for n, f in enumerate(freqs):
        psif_n, psi_n = _morsewave1(N, abs(f), gamma, beta, K, norm)
        psif[:, n:n + 1, :], psi[:, n:n + 1, :] = psif_n, psi_n
        if f < 0:
            psi[:, n:n + 1, :] = psi[:, n, :].conj()
            psif[1:, n:n + 1, :] = np.flip(psif[1:, n, :], axis=0)

    return psif.squeeze(), psi.squeeze()


def _morsewave1(N, f, gamma, beta, K, norm):
    fo = morsefreq(gamma, beta)
    fact = f / fo
    w = 2 * pi * np.linspace(0, 1, N, endpoint=False) / fact
    w = w.reshape(-1, 1)

    with np.errstate(divide='ignore', invalid='ignore'):
        if norm == 'energy':
            psizero = (np.exp(-w ** gamma) if beta == 0 else
                       np.exp(beta * np.log(w) - w ** gamma))
        else:
            psizero = (2 * np.exp(-w ** gamma) if beta == 0 else
                       2 * np.exp(-beta * np.log(fo) + fo ** gamma +
                                  beta * np.log(w) - w ** gamma))

    if beta == 0:
        psizero[0] /= 2  # unit-step to nice lowpass
    psizero[np.isnan(psizero) | np.isinf(psizero)] = 0.

    X = _morsewave_first_family(fact, N, K, gamma, beta, w, psizero, norm)
    X[np.isinf(X)] = 0.

    Xr = X.copy()
    Xr *= (-1) ** np.arange(len(Xr)).reshape(-1, 1, 1)
    if len(Xr) % 2 == 0:
        Xr[len(Xr) // 2] /= 2
    x = np.fft.ifft(Xr, axis=0)
    return X, x


def _morsewave_first_family(fact, N, K, gamma, beta, w, psizero, norm):
    """K orthogonal family members via generalized Laguerre polynomials
    (reference _gmw.py:524-552, after Olhede & Walden)."""
    r = (2 * beta + 1) / gamma
    c = r - 1
    L = np.zeros(w.shape)
    psif = np.zeros((len(psizero), 1, K))

    for k in range(K):
        if norm == 'energy':
            A = morseafun(gamma, beta, k + 1, norm='energy')
            coeff = np.sqrt(1. / fact) * A
        else:
            coeff = (1. if beta == 0 else
                     np.sqrt(np.exp(gammaln_fn(r) + gammaln_fn(k + 1) -
                                    gammaln_fn(k + r))))
        L[:N // 2 + 1] = laguerre(2 * w[:N // 2 + 1] ** gamma, k, c
                                  ).reshape(-1, 1)
        psif[:, :, k] = coeff * psizero * L
    return psif


def morseafun(gamma, beta, k=1, norm='bandpass'):
    """GMW amplitude (freq-domain peak value); reference _gmw.py:555-589."""
    if norm == 'energy':
        r = (2 * beta + 1) / gamma
        A = np.sqrt(2 * pi * gamma * (2 ** r) *
                    np.exp(gammaln_fn(k) - gammaln_fn(k + r - 1)))
    elif norm == 'bandpass':
        if beta == 0:
            A = 2.
        else:
            wc = morsefreq(gamma, beta)
            A = 2. / np.exp(beta * np.log(wc) - wc ** gamma)
    else:
        raise ValueError("unsupported `norm`: %s; must be one of: "
                         "'bandpass', 'energy'." % norm)
    return A


def laguerre(x, k, c):
    """Generalized Laguerre polynomial L_k^c(x); reference _gmw.py:592-608."""
    x = np.atleast_1d(np.asarray(x).squeeze())
    assert x.ndim == 1
    y = np.zeros(x.shape)
    for m in range(k + 1):
        fact = np.exp(gammaln_fn(k + c + 1) - gammaln_fn(c + m + 1) -
                      gammaln_fn(k - m + 1))
        y += (-1) ** m * fact * x ** m / gamma_fn(m + 1)
    return y


def morsefreq(gamma, beta, n_out=1):
    """GMW frequency measures: peak `wm`, energy `we`, instantaneous `wi`,
    curvature `cwi` (all radian). Reference _gmw.py:611-657."""
    wm = (beta / gamma) ** (1 / gamma)
    if n_out == 1:
        return wm
    we = (1 / 2 ** (1 / gamma)) * (gamma_fn((2 * beta + 2) / gamma) /
                                   gamma_fn((2 * beta + 1) / gamma))
    if n_out == 2:
        return wm, we
    wi = (gamma_fn((beta + 2) / gamma) / gamma_fn((beta + 1) / gamma))
    if n_out == 3:
        return wm, we, wi
    k2 = _morsemom(2, gamma, beta, n_out=3)[-1]
    k3 = _morsemom(3, gamma, beta, n_out=3)[-1]
    cwi = -(k3 / k2 ** 1.5)
    return wm, we, wi, cwi


def _morsemom(p, gamma, beta, n_out=4):
    """p-th order frequency-domain (energy) moments/cumulants of the
    first-order GMW; reference _gmw.py:660-718."""
    def morsemom1(p, gamma, beta):
        return morseafun(gamma, beta, k=1) * morsef(gamma, beta + p)

    def morsef(gamma, beta):
        return (1 / (2 * pi * gamma)) * gamma_fn((beta + 1) / gamma)

    Mp = morsemom1(p, gamma, beta)
    if n_out == 1:
        return Mp
    Np = (2 / 2 ** ((1 + p) / gamma)) * morsemom1(p, gamma, 2 * beta)
    if n_out == 2:
        return Mp, Np
    prange = np.arange(p + 1)
    moments = morsemom1(prange, gamma, beta)
    cumulants = _moments_to_cumulants(moments)
    Kp = cumulants[p]
    if n_out == 3:
        return Mp, Np, Kp
    moments = (2 / 2 ** ((1 + prange) / gamma)) * morsemom1(prange, gamma,
                                                            2 * beta)
    cumulants = _moments_to_cumulants(moments)
    Lp = cumulants[p]
    return Mp, Np, Kp, Lp


def _nCk(n, k):
    from math import comb
    return comb(int(n), int(k))


def _moments_to_cumulants(moments):
    """Moments -> cumulants; reference _gmw.py:721-745."""
    moments = np.atleast_1d(np.asarray(moments).squeeze())
    assert moments.ndim == 1
    cumulants = np.zeros(len(moments))
    cumulants[0] = np.log(moments[0])
    for n in range(1, len(moments)):
        coeff = 0
        for k in range(1, n):
            coeff += _nCk(n - 1, k - 1) * cumulants[k] * (
                moments[n - k] / moments[0])
        cumulants[n] = (moments[n] / moments[0]) - coeff
    return cumulants
