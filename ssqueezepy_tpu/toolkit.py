# -*- coding: utf-8 -*-
"""Small analysis helpers.

Behavioral reference: `/root/reference/ssqueezepy/toolkit.py` (`lin_band`
:7, `cos_f`/`sin_f` :27-35, `mad_rms` :38, `where_amax` :44).
"""
import numpy as np

from .ops.complexlib import Complex

__all__ = ['lin_band', 'cos_f', 'sin_f', 'mad_rms', 'where_amax']


def lin_band(Tx, slope, offset, bw=.025, **kw):
    """Visually estimate a linear band (curve centers + widths) to invert
    over in the time-frequency plane."""
    from . import visuals
    if isinstance(Tx, Complex):
        Tx = Tx.to_numpy()
    na, N = Tx.shape
    tcs = np.linspace(0, 1, N)
    Cs = slope * (tcs + offset) * na
    freqband = bw * na * np.ones(N)
    Cs, freqband = Cs.astype('int32'), freqband.astype('int32')

    visuals.imshow(Tx, abs=1, aspect='auto', show=0, **kw)
    visuals.plot(Cs + freqband, color='r')
    visuals.plot(Cs - freqband, color='r', show=1)
    return Cs, freqband


def _t(min, max, N, endpoint=False):
    return np.linspace(min, max, N, endpoint=endpoint)


def cos_f(freqs, N=128, phi=0, endpoint=False):
    """Adjacent different-frequency cosines."""
    return np.concatenate([
        np.cos(2 * np.pi * f * (_t(i, i + 1, N, endpoint) + phi))
        for i, f in enumerate(freqs)])


def sin_f(freqs, N=128, phi=0, endpoint=False):
    """Adjacent different-frequency sines."""
    return np.concatenate([
        np.sin(2 * np.pi * f * (_t(i, i + 1, N, endpoint) + phi))
        for i, f in enumerate(freqs)])


def mad_rms(x, xrec):
    """Reconstruction error metric: mean|x - xrec| / rms(x);
    scale-invariant, robust to outliers."""
    return np.mean(np.abs(x - xrec)) / np.sqrt(np.mean(x ** 2))


def where_amax(x):
    """N-dim indices where |x| attains its max."""
    x = np.asarray(x)
    return np.where(np.abs(x) == np.abs(x).max())
