# -*- coding: utf-8 -*-
"""Short-Time Fourier Transform (forward & inverse), TPU-native.

Behavioral reference: `/root/reference/ssqueezepy/_stft.py` (stft :13,
istft :184) and `utils/stft_utils.py` (buffer/unbuffer/window_norm).

Execution design: frames are strided-gather patches (XLA) DFT'd along the
frame axis by the matmul FFT engine — the frame axis becomes an MXU
contraction, so the whole `stft` is one fused jit per plan. The
'modulated' variant (window-centered DFT cisoids, essential for
synchrosqueezing invertibility — reference _stft.py:84-96) is a circular
frame roll + ifftshift'd window, exactly as the reference computes it.
Inverse uses irfft + a skew-reshape overlap-add (ops/framing.py).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.complexlib import Complex, as_complex
from ..ops.fft import rfft, irfft, fftshift, ifftshift
from ..ops.framing import buffer, window_norm, unbuffer
from ..ops.pad import padsignal, pad_params
from ..utils.common import WARN
from ..utils.cwt_utils import _process_fs_and_t
from ..configs import default_dtype
from .windows import get_window, _check_NOLA

__all__ = ['stft', 'istft']


@functools.lru_cache(maxsize=32)
def _stft_jit(shape, dtype, n_fft, hop_len, n1, modulated, derivative,
              is_2d, win_key, padtype='reflect', padlength=None):
    window, diff_window = _WINDOW_CACHE[win_key]
    win_j = jnp.asarray(window)
    dwin_j = jnp.asarray(diff_window) if diff_window is not None else None

    def run(xj, fs):
        xj = xj.astype(dtype)
        xp_pad = padsignal(xj, padtype, padlength=padlength)
        Sxb = buffer(xp_pad, n_fft, n_fft - hop_len, modulated)
        w = ifftshift(win_j) if modulated else win_j
        reshape = (-1, 1) if not is_2d else (1, -1, 1)
        Sx = Sxb * w.reshape(reshape)
        axis = 0 if not is_2d else 1
        out_Sx = rfft(Sx, axis=axis)
        out_dSx = None
        if derivative:
            dw = (ifftshift(dwin_j) if modulated else dwin_j) * fs
            dSx = Sxb * dw.reshape(reshape)
            out_dSx = rfft(dSx, axis=axis)
        return out_Sx, out_dSx
    return jax.jit(run)


_WINDOW_CACHE = {}


def _window_key(window, diff_window):
    key = (hash(window.tobytes()),
           hash(diff_window.tobytes()) if diff_window is not None else None)
    _WINDOW_CACHE[key] = (window, diff_window)
    return key


def stft(x, window=None, n_fft=None, win_len=None, hop_len=1, fs=None,
         t=None, padtype='reflect', modulated=True, derivative=False,
         dtype=None):
    """Short-Time Fourier Transform; API parity with reference `stft`
    (_stft.py:13-181). Returns `Sx` (+`dSx` if `derivative`), rows =
    positive frequencies (rfft), columns = hops."""
    xnp = np.asarray(x) if not isinstance(x, jax.Array) else x
    assert xnp.ndim in (1, 2)
    is_2d = (xnp.ndim == 2)
    N = xnp.shape[-1]
    _, fs_, _ = _process_fs_and_t(fs, t, N)
    n_fft = int(n_fft or min(N // hop_len, 512))

    if win_len is None:
        win_len = (len(window) if isinstance(window, np.ndarray) else n_fft)
    dtype = dtype or default_dtype()
    window, diff_window = get_window(window, win_len, n_fft,
                                     derivative=True, dtype=dtype)
    _check_NOLA(window, hop_len, dtype)

    padlength = N + n_fft - 1
    xj = jnp.asarray(xnp, dtype=dtype)
    win_key = _window_key(window, diff_window if derivative else None)

    from ..configs import backend
    from ..ops.stft_conv import stft_conv, stft_conv_applicable
    if stft_conv_applicable(int(hop_len), backend()):
        # hop=1: each row is an exact FFT cross-correlation — one long
        # FFT + batched 2-stage IFFT beats framing + short-axis FFTs
        Sx, dSx = stft_conv(xj, fs_, n_fft, N, win_key, bool(modulated),
                            bool(derivative), padtype, padlength, dtype)
    else:
        runner = _stft_jit(xnp.shape, dtype, n_fft, int(hop_len), 0,
                           bool(modulated), bool(derivative), is_2d,
                           win_key, padtype, padlength)
        from .cwt import _device_scalar
        Sx, dSx = runner(xj, _device_scalar(fs_, dtype))
    return (Sx, dSx) if derivative else Sx


@functools.lru_cache(maxsize=32)
def _istft_jit(shape, dtype, n_fft, hop_len, N_, win_exp, modulated,
               win_key):
    """Cached device-side inverse: irfft -> fftshift -> windowed skew
    overlap-add -> window-norm divide -> unpad. The whole (n_fft, n_segs)
    buffer stays on device; only the (N,) result crosses the host
    boundary (VERDICT r1 #7 — full-transform fetches through the tunnel
    cost seconds)."""
    from ..ops.framing import overlap_add_skew
    window = _WINDOW_CACHE[win_key][0]
    w = np.ones_like(window) if win_exp == 0 else window ** win_exp
    wn = window_norm(window, hop_len, n_fft, N_, win_exp)
    tiny = np.finfo(np.dtype(dtype)).tiny
    wn_safe = np.where(wn > tiny, wn, 1.0)
    w_j = jnp.asarray(w, dtype)
    wn_j = jnp.asarray(wn_safe, dtype)
    full = N_ + n_fft - 1
    lo, hi = n_fft // 2, full - ((n_fft - 1) // 2)

    n_segs = shape[-1]
    span = n_fft + (n_segs - 1) * hop_len             # OLA support

    def core2d(re, im):
        xbuf = irfft(Complex(re, im), n=n_fft, axis=0)
        if modulated:
            xbuf = fftshift(xbuf, axes=0)
        wb = xbuf * w_j[:, None]                      # (n_fft, n_segs)
        x = overlap_add_skew(wb.T, hop_len, min(span, full))
        if span < full:
            x = jnp.pad(x, (0, full - span))
        return (x / wn_j)[lo:hi]

    def run(re, im):
        if len(shape) == 3:
            return jax.vmap(core2d)(re, im)
        return core2d(re, im)
    return jax.jit(run)


def istft(Sx, window=None, n_fft=None, win_len=None, hop_len=1, N=None,
          modulated=True, win_exp=1):
    """Inverse STFT via Griffin-Lim least-squares overlap-add
    (reference _stft.py:184-256). Device-native: the overlap-add is a
    skew-reshape + column sum (ops/framing.py), batched inputs vmapped."""
    Sx = as_complex(Sx)
    n_fft = int(n_fft or (Sx.shape[-2] - 1) * 2)
    win_len = win_len or n_fft
    N_ = int(N or hop_len * Sx.shape[-1])
    dtype = 'float32' if str(Sx.dtype) == 'float32' else 'float64'

    window = get_window(window, win_len, n_fft=n_fft, dtype=dtype)
    _check_NOLA(window, hop_len, dtype=dtype)
    win_key = _window_key(window, None)

    runner = _istft_jit(Sx.shape, dtype, n_fft, int(hop_len), N_,
                        int(win_exp), bool(modulated), win_key)
    return np.asarray(runner(Sx.re, Sx.im))
