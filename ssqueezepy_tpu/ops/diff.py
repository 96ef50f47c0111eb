# -*- coding: utf-8 -*-
"""Frequency-domain (trigonometric) differentiation.

Behavioral reference: `/root/reference/ssqueezepy/utils/common.py:161-245`
(`trigdiff`). Traceable: ifft(fft(A) * 1j * xi * fs) along the last axis.
"""
import numpy as np
import jax.numpy as jnp

from .complexlib import Complex, as_complex
from .fft import fft, ifft
from .pad import padsignal, pad_params
from ..utils.common import p2up
from ..models.wavelets import _xifn

__all__ = ['trigdiff']


def trigdiff(A, fs=1., padtype=None, rpadded=None, N=None, n1=None,
             window=None, transform='cwt'):
    """Differentiate rows of `A` (2D/3D, complex or Complex) in the
    frequency domain; unpads to length `N` starting at `n1` if padded."""
    if transform == 'stft':
        raise NotImplementedError("`transform='stft'` is currently not "
                                  "supported.")
    was_numpy = isinstance(A, np.ndarray)
    A = as_complex(A)
    if rpadded and N is None:
        raise ValueError("must pass `N` if `rpadded`")
    rpadded = rpadded or False
    padtype = padtype or ('reflect' if not rpadded else None)

    if padtype is not None:
        re, n_up, n1_, _ = padsignal(A.re, padtype, get_params=True)
        im = padsignal(A.im, padtype)
        A = Complex(re, im)
        n1 = n1_

    xi = jnp.asarray(_xifn(1., A.shape[-1], np.float64).astype(
        str(A.dtype))) * jnp.asarray(fs, A.dtype)
    Ah = fft(A, axis=-1)
    dAh = Complex(-Ah.im * xi, Ah.re * xi)  # * 1j*xi*fs
    A_diff = ifft(dAh, axis=-1)

    if rpadded or padtype is not None:
        if N is None:
            N = A.shape[-1]
        if n1 is None:
            _, n1, _ = p2up(N)
        A_diff = A_diff[..., n1:n1 + N]
    return A_diff.to_numpy() if was_numpy else A_diff
