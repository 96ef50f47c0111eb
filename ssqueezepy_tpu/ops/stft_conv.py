# -*- coding: utf-8 -*-
"""STFT as full-length FFT convolution (hop_len=1).

The framed formulation (buffer -> window -> rfft over frames; reference
_stft.py:127-147) costs a large strided gather plus a short-axis FFT with
bad TPU layouts (~45 ms of the 160k benchmark). At hop_len=1 — the only
hop synchrosqueezing supports — each STFT row is EXACTLY a
cross-correlation of the padded signal with a fixed kernel

    g_k[m] = c_k * v[m] * exp(-2pi i k m / n_fft),

(v = the frame-rolled window, c_k the modulation phase), so the whole
transform is one full-length FFT + a (n_rows, Np2) spectral multiply + a
batched 2-stage matmul IFFT — the same machinery as the CWT, with the
filterbank PRECOMPUTED (host numpy, cached) instead of synthesized.
Bit-equivalent to the framed path up to FFT rounding (asserted in tests).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .complexlib import Complex
from .fft import fft, ifft, _factorize

__all__ = ['stft_conv_plan', 'stft_conv_applicable', 'stft_conv']


def _next_fft_len(n):
    best = 1 << (n - 1).bit_length()
    for mult in (3, 5, 9, 15):
        a = 1
        while mult * a < n:
            a <<= 1
        if mult * a >= n:
            best = min(best, mult * a)
    return best


def stft_conv_applicable(hop_len, backend_name):
    return hop_len == 1 and backend_name == 'tpu'


@functools.lru_cache(maxsize=8)
def _conv_filterbank(win_key, n_fft, Np2, modulated):
    """H[k] spectra such that Sx[k] = ifft(H[k] * fft(xp)); (n_rows, Np2)
    split re/im float64->float32 later. Host numpy, lru-cached."""
    from ..models.stft import _WINDOW_CACHE
    window, diff_window = _WINDOW_CACHE[win_key]
    n_rows = n_fft // 2 + 1

    if modulated:
        s20 = int(np.ceil(n_fft / 2))
        s21 = s20 - 1 if (n_fft % 2 == 1) else s20
        v = np.roll(np.fft.ifftshift(window), s21)
        vd = (np.roll(np.fft.ifftshift(diff_window), s21)
              if diff_window is not None else None)
        ck = np.exp(2j * np.pi * np.arange(n_rows) * s21 / n_fft)
    else:
        v, vd = window, diff_window
        ck = np.ones(n_rows)

    m = np.arange(n_fft)
    cis = np.exp(-2j * np.pi * np.outer(np.arange(n_rows), m) / n_fft)

    def build(vv):
        g = np.zeros((n_rows, Np2), np.complex128)
        g[:, :n_fft] = (ck[:, None] * cis) * vv
        # corr[j] = sum_m g[m] x[j+m]  ->  H = conj(fft(conj(g)))
        return np.conj(np.fft.fft(np.conj(g), axis=-1))

    H = build(v)
    Hd = build(vd) if vd is not None else None
    return H, Hd


@functools.lru_cache(maxsize=16)
def _stft_conv_jit(shape, dtype, Np2, N_out, derivative, padtype,
                   padlength):
    """Cached jit: raw signal + filterbank args -> Sx (n_rows, N_out)
    [, dSx]. The filterbank rides as ARGUMENTS (device arrays cached
    separately) — baked-in jnp constants of this size make the compile
    payload hundreds of MB."""
    from .pad import padsignal
    is_2d = (len(shape) == 2)

    def run(xj, fs, Hre, Him, Hdre, Hdim):
        xj = xj.astype(dtype)
        xp = padsignal(xj, padtype, padlength=padlength)
        xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2, imag_zero=True)
        if is_2d:
            xh = Complex(xh.re[:, None], xh.im[:, None])
        # broadcast row multiply; out_range trims the IFFT to [0, N_out)
        def corr(hre, him):
            pr = hre * xh.re - him * xh.im
            pi = hre * xh.im + him * xh.re
            return ifft(Complex(pr, pi), n=Np2, out_range=(0, N_out))
        Sx = corr(Hre, Him)
        if derivative:
            dSx = corr(Hdre, Hdim)
            dSx = Complex(dSx.re * fs, dSx.im * fs)
            return Sx, dSx
        return Sx, None
    return jax.jit(run)


_FB_DEV_CACHE = {}


def _device_filterbank(win_key, n_fft, Np2, modulated, dtype):
    key = (win_key, n_fft, Np2, modulated, dtype)
    hit = _FB_DEV_CACHE.get(key)
    if hit is not None:
        return hit
    H, Hd = _conv_filterbank(win_key, n_fft, Np2, modulated)
    out = (jnp.asarray(H.real.astype(dtype)),
           jnp.asarray(H.imag.astype(dtype)),
           jnp.asarray(Hd.real.astype(dtype)) if Hd is not None else
           jnp.zeros((1, 1), dtype),
           jnp.asarray(Hd.imag.astype(dtype)) if Hd is not None else
           jnp.zeros((1, 1), dtype))
    _FB_DEV_CACHE[key] = out
    return out


def stft_conv(xj, fs, n_fft, N_out, win_key, modulated, derivative,
              padtype, padlength, dtype):
    """Run the convolution-form STFT. `xj` raw (unpadded) device/np
    array; returns (Sx, dSx or None)."""
    Np = padlength
    Np2 = _next_fft_len(Np)
    Hre, Him, Hdre, Hdim = _device_filterbank(win_key, int(n_fft),
                                              int(Np2), bool(modulated),
                                              str(dtype))
    runner = _stft_conv_jit(tuple(xj.shape), str(dtype), int(Np2),
                            int(N_out), bool(derivative), padtype,
                            int(padlength))
    return runner(xj, np.asarray(fs, str(dtype)), Hre, Him, Hdre, Hdim)
