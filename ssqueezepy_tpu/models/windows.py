# -*- coding: utf-8 -*-
"""STFT window construction.

Behavioral reference: `/root/reference/ssqueezepy/_stft.py:259-335`
(`get_window` with DPSS default and freq-domain-differentiated
`diff_window`, `_check_NOLA`). Host-side numpy — windows are plan-time
constants.
"""
import numpy as np
import scipy.signal as sig

from ..utils.common import WARN
from ..models.wavelets import _xifn

__all__ = ['get_window', '_check_NOLA']


def _zero_denormals_np(x):
    tiny = 1000 * np.finfo(x.dtype).tiny
    x[(x < tiny) & (x > -tiny)] = 0
    return x


def get_window(window, win_len, n_fft=None, derivative=False, dtype=None):
    """Window of length `n_fft` (padded from `win_len` if needed); default
    DPSS(win_len, max(4, win_len//8), periodic). `derivative=True` also
    returns the frequency-domain-differentiated window."""
    if n_fft is None:
        pl, pr = 0, 0
    else:
        if win_len > n_fft:
            raise ValueError("Can't have `win_len > n_fft` ({} > {})".format(
                win_len, n_fft))
        pl = (n_fft - win_len) // 2
        pr = (n_fft - win_len - pl)

    if window is not None:
        if isinstance(window, str):
            # fftbins=True -> 'periodic' window
            window = sig.get_window(window, win_len, fftbins=True)
        elif isinstance(window, np.ndarray):
            if len(window) != win_len:
                WARN("len(window) != win_len (%s != %s)"
                     % (len(window), win_len))
        else:
            raise ValueError("`window` must be string or np.ndarray "
                             "(got %s)" % window)
    else:
        window = sig.windows.dpss(win_len, max(4, win_len // 8), sym=False)

    if len(window) < (win_len + pl + pr):
        window = np.pad(window, [pl, pr])

    if derivative:
        wf = np.fft.fft(window)
        Nw = len(window)
        xi = _xifn(1, Nw)
        if Nw % 2 == 0:
            xi[Nw // 2] = 0
        diff_window = np.fft.ifft(wf * 1j * xi).real

    dtype = dtype or 'float32'
    window = _zero_denormals_np(np.asarray(window).astype(dtype))
    if derivative:
        diff_window = _zero_denormals_np(diff_window.astype(dtype))
        return window, diff_window
    return window


def _check_NOLA(window, hop_len, dtype=None, imprecision_strict=False):
    """Nonzero-overlap-add invertibility checks
    (reference _stft.py:313-335)."""
    if hop_len > len(window):
        WARN("`hop_len > len(window)`; STFT not invertible")
    elif not sig.check_NOLA(window, len(window), len(window) - hop_len):
        WARN("`window` fails Non-zero Overlap Add (NOLA) criterion; "
             "STFT not invertible")

    if dtype is None:
        dtype = str(window.dtype)
    tol = 0.15 if imprecision_strict else 1e-3
    if dtype == 'float32' and not sig.check_NOLA(
            window, len(window), len(window) - hop_len, tol=tol):
        WARN("Imprecision expected at right-most hop of signal, in "
             "inversion. Lower `hop_len`, choose wider `window`, or use "
             "`dtype='float64'`.")
