# -*- coding: utf-8 -*-
"""Phase transforms (instantaneous-frequency estimates).

Behavioral reference: `/root/reference/ssqueezepy/algos.py:706-856`
(`phase_cwt_cpu/gpu`, `phase_stft_cpu/gpu`) and
`/root/reference/ssqueezepy/_ssq_cwt.py:420-589` (`phase_cwt`,
`phase_cwt_num`). On TPU these are plain fused XLA elementwise ops over
split-complex planes — no custom kernel needed (the reference needed
numba/CUDA only because numpy materializes intermediates).

    w_cwt[a,b]  = |Im(dWx/Wx)| / 2pi          (inf where |Wx| < gamma)
    w_stft[k,u] = |Sfs[k] - Im(dSx/Sx)/2pi|   (inf where |Sx| < gamma)
"""
import numpy as np
import jax.numpy as jnp

from .complexlib import Complex, as_complex
from ..utils.common import EPS32, EPS64, pi

__all__ = ['phase_cwt', 'phase_stft', 'phase_cwt_num', 'phase_transform_w']

_TWO_PI = 6.283185307179586


def _imag_ratio_over_2pi(Wx, dWx):
    """Im(dWx / Wx) / 2pi without complex division:
    (B*C - A*D) / ((C^2 + D^2) * 2pi), A+iB = dWx, C+iD = Wx."""
    A, B = dWx.re, dWx.im
    C, D = Wx.re, Wx.im
    return (B * C - A * D) / ((C * C + D * D) * _TWO_PI)


def phase_transform_w(Wx, dWx, gamma, Sfs=None):
    """Traceable core: phase transform with gamma gating (-> inf)."""
    w = _imag_ratio_over_2pi(Wx, dWx)
    if Sfs is None:
        w = jnp.abs(w)
    else:
        shape = [1] * Wx.re.ndim
        shape[-2] = -1
        w = jnp.abs(jnp.asarray(Sfs).reshape(shape) - w)
    small = Wx.abs2() < jnp.asarray(gamma, Wx.dtype) ** 2
    return jnp.where(small, jnp.inf, w)


def _default_gamma(Wx):
    return 10 * (EPS64 if str(Wx.dtype) == 'float64' else EPS32)


def phase_cwt(Wx, dWx, difftype='trig', gamma=None, parallel=None):
    """CWT phase transform (reference _ssq_cwt.py:420-509). `difftype`:
    'trig' uses the freq-domain derivative `dWx`; 'phase' forward-differences
    the unwrapped angle (host-side; poor accuracy, kept for parity)."""
    Wx = as_complex(Wx)
    if gamma is None:
        gamma = np.sqrt(EPS64 if str(Wx.dtype) == 'float64' else EPS32)

    if difftype == 'trig':
        return phase_transform_w(Wx, as_complex(dWx), gamma)
    elif difftype == 'phase':
        # host-side: np.unwrap has no jnp equivalent pre-0.4.16 batching
        Wn = Wx.to_numpy()
        u = np.unwrap(np.angle(Wn)).T
        w = np.vstack([np.diff(u, axis=0), u[-1] - u[0]]).T / (2 * pi)
        w = np.abs(w)
        w[np.abs(Wn) < gamma] = np.inf
        return jnp.asarray(w)
    raise ValueError(f"unsupported `difftype` '{difftype}'; must be one of "
                     "'trig', 'phase'.")


def phase_cwt_num(Wx, dt, difforder=4, gamma=None):
    """Numeric-differentiation phase transform (1st/2nd/4th order finite
    differences); reference _ssq_cwt.py:512-589. Expects `Wx` padded by 4
    samples each side for `difforder` in (2, 4)."""
    if difforder not in (1, 2, 4):
        raise ValueError("`difforder` must be one of: 1, 2, 4 "
                         "(got %s)" % difforder)
    Wx = as_complex(Wx)
    Wn = Wx.to_numpy()

    if difforder in (2, 4):
        Wxr = np.hstack([Wn[:, -2:], Wn, Wn[:, :2]])

    if difforder == 1:
        w = np.hstack([Wn[:, 1:] - Wn[:, :-1], Wn[:, :1] - Wn[:, -1:]])
        w /= dt
    elif difforder == 2:
        w = -Wxr[:, 4:] + 4 * Wxr[:, 3:-1] - 3 * Wxr[:, 2:-2]
        w /= (2 * dt)
    else:
        w = -Wxr[:, 4:]
        w += Wxr[:, 3:-1] * 8
        w -= Wxr[:, 1:-3] * 8
        w += Wxr[:, 0:-4]
        w /= (12 * dt)

    # zero-magnitude cells divide to inf/nan here and are masked to inf
    # by the gamma gate right below
    with np.errstate(divide='ignore', invalid='ignore'):
        w = np.real(-1j * w / Wn) / (2 * pi)
    gamma = gamma or 10 * (EPS64 if Wn.dtype == np.complex128 else EPS32)
    w[np.abs(Wn) < gamma] = np.inf
    return jnp.asarray(np.abs(w))


def phase_stft(Sx, dSx, Sfs, gamma=None, parallel=None):
    """STFT phase transform (reference _ssq_stft.py:201-247)."""
    Sx = as_complex(Sx)
    if gamma is None:
        gamma = _default_gamma(Sx)
    return phase_transform_w(Sx, as_complex(dSx), gamma, Sfs=jnp.asarray(
        Sfs, dtype=Sx.dtype))
