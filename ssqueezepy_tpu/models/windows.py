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

# host-side memos: windows are plan-time constants, but get_window (DPSS
# synthesis ~2ms) and scipy's check_NOLA (~2.5ms) sat on the per-CALL
# path and dominated small-N transform latency (tunnel RTT is ~3.5ms)
_WINDOW_MEMO = {}
_NOLA_MEMO = set()


def _win_spec_key(window):
    if window is None:
        return None
    if isinstance(window, str):
        return window
    return ('arr', hash(window.tobytes()), window.shape)


def _zero_denormals_np(x):
    tiny = 1000 * np.finfo(x.dtype).tiny
    x[(x < tiny) & (x > -tiny)] = 0
    return x


def get_window(window, win_len, n_fft=None, derivative=False, dtype=None):
    """Window of length `n_fft` (padded from `win_len` if needed); default
    DPSS(win_len, max(4, win_len//8), periodic). `derivative=True` also
    returns the frequency-domain-differentiated window. Memoized."""
    key = (_win_spec_key(window), win_len, n_fft, derivative,
           dtype or 'float32')
    hit = _WINDOW_MEMO.get(key)
    if hit is not None:
        return hit
    out = _build_window(window, win_len, n_fft, derivative, dtype)
    _WINDOW_MEMO[key] = out
    return out


def _build_window(window, win_len, n_fft=None, derivative=False,
                  dtype=None):
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
    (reference _stft.py:313-335). Memoized per (window, hop, dtype) —
    warnings fire once per configuration."""
    key = (hash(window.tobytes()), window.shape, hop_len, dtype,
           imprecision_strict)
    if key in _NOLA_MEMO:
        return
    _NOLA_MEMO.add(key)
    _check_NOLA_impl(window, hop_len, dtype, imprecision_strict)


def _check_NOLA_impl(window, hop_len, dtype=None,
                     imprecision_strict=False):
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
