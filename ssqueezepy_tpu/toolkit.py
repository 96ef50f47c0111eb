# -*- coding: utf-8 -*-
"""Small analysis helpers: reconstruction metrics, stepped-frequency test
tones, and a visual band picker for component inversion.

Behavioral spec: `/root/reference/ssqueezepy/toolkit.py` (`lin_band` :7,
`cos_f`/`sin_f` :27-35, `mad_rms` :38, `where_amax` :44). Re-implemented
in this codebase's idiom: vectorized tone synthesis (no per-segment
Python loop), split-complex awareness, band geometry factored out.
"""
import numpy as np

from .ops.complexlib import Complex

__all__ = ['lin_band', 'cos_f', 'sin_f', 'mad_rms', 'where_amax']


def mad_rms(x, xrec):
    """Mean absolute deviation of the reconstruction, normalized by the
    signal's RMS — the library-wide round-trip accuracy criterion
    (scale-invariant, outlier-robust)."""
    x = np.asarray(x)
    err = np.mean(np.abs(np.asarray(xrec) - x))
    rms = np.sqrt(np.mean(np.square(x)))
    return err / rms


def _stepped_tone(trig, freqs, N, phi, endpoint):
    """One `trig` oscillation per frequency, each spanning a unit-time
    segment of `N` samples; segments are laid end to end so the i-th
    rides the time interval [i, i+1)."""
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    M = len(freqs)
    tau = np.linspace(0., 1., N, endpoint=endpoint)          # (N,)
    seg_t = tau[None, :] + np.arange(M)[:, None]             # (M, N)
    phases = 2 * np.pi * freqs[:, None] * (seg_t + phi)
    return trig(phases).ravel()


def cos_f(freqs, N=128, phi=0, endpoint=False):
    """Concatenated unit-time cosine segments, one per frequency."""
    return _stepped_tone(np.cos, freqs, N, phi, endpoint)


def sin_f(freqs, N=128, phi=0, endpoint=False):
    """Concatenated unit-time sine segments, one per frequency."""
    return _stepped_tone(np.sin, freqs, N, phi, endpoint)


def where_amax(x):
    """Indices (per axis) of every element attaining max |x|."""
    mag = np.abs(np.asarray(x))
    return np.nonzero(mag == mag.max())


def _linear_band_geometry(shape, slope, offset, bw):
    """Row-index curve `cc` and half-width `cw` of a linear band through
    an (na, N) time-frequency plane: row = slope * (t + offset) * na
    with t in [0, 1], constant half-width bw * na."""
    na, N = shape
    t = np.linspace(0., 1., N)
    cc = (slope * na * (t + offset)).astype(np.int32)
    cw = np.full(N, int(bw * na), np.int32)
    return cc, cw


def lin_band(Tx, slope, offset, bw=.025, **kw):
    """Plot `|Tx|` with a linear band overlaid and return the band's
    (curve centers, half-widths) for masked component inversion
    (`issq_cwt(Tx, cc=..., cw=...)`)."""
    from . import visuals
    if isinstance(Tx, Complex):
        Tx = Tx.to_numpy()
    cc, cw = _linear_band_geometry(Tx.shape, slope, offset, bw)

    visuals.imshow(Tx, abs=1, aspect='auto', show=0, **kw)
    visuals.plot(cc + cw, color='r')
    visuals.plot(cc - cw, color='r', show=1)
    return cc, cw
