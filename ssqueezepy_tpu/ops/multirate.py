# -*- coding: utf-8 -*-
"""Multirate primitives: halfband decimation / interpolation.

Octave cascade support for the streaming CWT (streaming.py): large
scales are narrowband low-pass, so their rows can be computed on a
decimated stream — context requirements shrink by 2^octave. The
half-band FIR is a windowed-sinc (Kaiser): exact zeros at even offsets
from center (a true halfband), linear phase with group delay
``(taps-1)/2`` samples, stopband ~ -90 dB at beta=9.

All filtering runs on device via `lax.conv_general_dilated` (a 63-tap
1D conv is negligible next to the transform itself); filter design is
trace-time numpy. No reference analog (the reference computes every
scale at full rate; multirate decimation is original to this package —
the standard à-trous / pyramid recipe).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['halfband_fir', 'conv_valid', 'decimate2', 'interp2']


@functools.lru_cache(maxsize=8)
def halfband_fir(taps=63, beta=9.0):
    """Linear-phase halfband lowpass (cutoff pi/2). `taps` must be odd
    with (taps+1) % 4 == 0 so every second off-center tap is a true
    zero. Normalized to unit DC gain; h[center] = 0.5."""
    taps = int(taps)
    if taps % 2 == 0 or (taps + 1) % 4:
        raise ValueError("taps must be odd with taps+1 divisible by 4")
    c = (taps - 1) // 2
    n = np.arange(taps) - c
    h = 0.5 * np.sinc(n / 2.0)
    h *= np.kaiser(taps, beta)
    # enforce exact halfband zeros (window breaks them at ~1e-17 only,
    # but exactness keeps the polyphase identity branch trivially true)
    h[(n % 2 == 0) & (n != 0)] = 0.0
    h /= h.sum()
    return h


def _dn(ndim):
    # ('NCH','OIH','NCH') over the last axis; batch = leading dims
    return jax.lax.conv_dimension_numbers((1, 1, 2), (1, 1, 2),
                                          ('NCH', 'OIH', 'NCH'))


def conv_valid(x, h):
    """'valid' correlation-style FIR along the last axis:
    ``y[i] = sum_k h[k] * x[i + k]``, out length n - len(h) + 1.
    x: (..., n) real; h: numpy (taps,)."""
    shape = x.shape
    xb = x.reshape((-1, 1, shape[-1]))
    # conv_general_dilated is a true convolution; flip for correlation
    k = jnp.asarray(h[::-1].copy(), x.dtype).reshape(1, 1, -1)
    y = jax.lax.conv_general_dilated(xb, k, (1,), 'VALID',
                                     dimension_numbers=_dn(x.ndim))
    return y.reshape(shape[:-1] + (y.shape[-1],))


def decimate2(x, taps=63):
    """Halfband-filter + downsample-by-2 along the last axis.

    Returns y with ``y[m] = (h * x)[2m]`` where the filtered stream is
    indexed from x's start: ``(h*x)[i] = sum_k h[k] x[i+k]`` (group
    delay (taps-1)/2 samples at the INPUT rate — callers account for it
    when aligning streams). Out length: (n - taps + 1 + 1) // 2."""
    h = halfband_fir(taps)
    return conv_valid(x, h)[..., ::2]


def interp2(x, n_out=None, taps=63):
    """Upsample-by-2 along the last axis (zero-stuff + halfband * 2).

    ``y[i] = 2 * sum_k h[k] u[i + k]`` with u the zero-stuffed input —
    again indexed from the start, so y[i] reconstructs the underlying
    full-rate stream at position ``i/1`` offset by the same (taps-1)/2
    OUTPUT-rate group delay. `n_out` crops the valid length."""
    h = 2.0 * halfband_fir(taps)
    shape = x.shape
    xb = x.reshape((-1, 1, shape[-1]))
    k = jnp.asarray(h[::-1].copy(), x.dtype).reshape(1, 1, -1)
    y = jax.lax.conv_general_dilated(xb, k, (1,), [(0, 0)],
                                     lhs_dilation=(2,),
                                     dimension_numbers=_dn(x.ndim))
    y = y.reshape(shape[:-1] + (y.shape[-1],))
    if n_out is not None:
        y = y[..., :n_out]
    return y
