# -*- coding: utf-8 -*-
"""Signal framing and overlap-add for the STFT.

Behavioral reference: `/root/reference/ssqueezepy/utils/stft_utils.py`
(`buffer` :20-138 — incl. the 'modulated' frame roll, `unbuffer`
(overlap-add) :141-192, `window_resolution` :194, `window_area` :219).

TPU-native design: frames are built by a strided gather expressed as
`conv_general_dilated_patches` (XLA lowers this to efficient windowed
loads); the 'modulated' variant is a uniform circular roll of the frame
axis. Overlap-add uses a skew-reshape (each row shifted right by its
index via one pad+reshape, then a single window-weighted matvec on the
MXU) instead of the reference's serial numba loop.
"""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import integrate

__all__ = ['buffer', 'unbuffer', 'window_norm', 'window_resolution',
           'window_area', 'overlap_add_skew']


def _mod_roll_amount(seg_len):
    """Modulated frames are the plain frames circularly left-rolled by s21
    (reference stft_utils.py:69-98): out[:s20]=x[s21:], out[s20:]=x[:s21],
    s20 = ceil(n/2), s21 = s20-1 if odd else s20."""
    s20 = int(np.ceil(seg_len / 2))
    s21 = s20 - 1 if (seg_len % 2 == 1) else s20
    return s21


def buffer(x, seg_len, n_overlap, modulated=False, parallel=None):
    """Columns = successive length-`seg_len` slices of `x`, overlapping by
    `n_overlap`. 1D -> (seg_len, n_segs); 2D batched -> (B, seg_len,
    n_segs). Matches MATLAB-style `buffer` per the reference."""
    x = jnp.asarray(x)
    assert x.ndim in (1, 2)
    hop_len = seg_len - n_overlap
    n_segs = (x.shape[-1] - seg_len) // hop_len + 1

    squeeze = (x.ndim == 1)
    xb = x[None] if squeeze else x
    B = xb.shape[0]

    # (B, 1, L) -> patches (B, seg_len, n_segs)
    patches = jax.lax.conv_general_dilated_patches(
        xb[:, None, :], filter_shape=(seg_len,), window_strides=(hop_len,),
        padding='VALID')
    out = patches.reshape(B, seg_len, n_segs)

    if modulated:
        out = jnp.roll(out, -_mod_roll_amount(seg_len), axis=1)
    return out[0] if squeeze else out


def overlap_add_skew(rows, stride, out_len):
    """Device overlap-add: out[n] = sum_r rows[r, n - r*stride], rows
    (R, C). Block decomposition — with overlap factor K = ceil(C/s), the
    row subsets `j::K` are mutually non-overlapping (their starts differ
    by >= K*s >= C), so each subset lays out into the output by a PURE
    reshape (pad row width to K*s, flatten); the K flattened parts are
    then summed with static shifts j*s. No gather/scatter (TPU-friendly,
    unlike the reference's serial overlap-add loop, stft_utils.py:177),
    and O(K * out_len) peak memory — independent of R (a naive
    whole-plane skew is O(R^2 * s) and OOMs at STFT frame counts)."""
    R, C = rows.shape
    s = int(stride)
    if s == 0:
        return rows.sum(0)[:out_len]
    K = -(-C // s)
    R_pad = -(-R // K) * K
    P = jnp.pad(rows, ((0, R_pad - R), (0, K * s - C)))  # (R_pad, K*s)
    L = (R_pad // K) * K * s                             # per-part span
    span = L + (K - 1) * s
    parts = [jnp.pad(P[j::K].reshape(-1), (j * s, (K - 1 - j) * s))
             for j in range(K)]
    out = jnp.sum(jnp.stack(parts), axis=0)              # (span,)
    if span < out_len:
        out = jnp.pad(out, (0, out_len - span))
    return out[:out_len]


def _overlap_add_np(xbuf, window, hop_len, n_fft):
    """Host-side exact overlap-add (reference stft_utils.py:177-181)."""
    n_segs = xbuf.shape[1]
    x = np.zeros(n_segs * hop_len + n_fft - hop_len, dtype=xbuf.dtype)
    wb = xbuf * window[:, None]
    for i in range(n_segs):
        n = i * hop_len
        x[n:n + n_fft] += wb[:, i]
    return x


def unbuffer(xbuf, window, hop_len, n_fft, N, win_exp=1):
    """Overlap-add inverse of `buffer` (reference stft_utils.py:141-166)."""
    xbuf = np.asarray(xbuf)
    if N is None:
        N = xbuf.shape[1] * hop_len + len(window) - 1
    if len(window) != n_fft:
        raise ValueError("Must have `len(window) == n_fft` "
                         "(got %s != %s)" % (len(window), n_fft))
    if win_exp == 0:
        w = np.ones_like(window)
    elif win_exp == 1:
        w = window
    else:
        w = window ** win_exp
    x = np.zeros(N + n_fft - 1, dtype=xbuf.dtype)
    out = _overlap_add_np(xbuf, w, hop_len, n_fft)
    x[:len(out)] += out
    return x


def window_norm(window, hop_len, n_fft, N, win_exp=1):
    """Window modulation array for istft division
    (reference stft_utils.py:169-192); host-side, plan-time."""
    wn = np.zeros(N + n_fft - 1)
    max_hops = (len(wn) - n_fft) // hop_len + 1
    wpow = window ** (win_exp + 1)
    for i in range(max_hops):
        n = i * hop_len
        wn[n:n + n_fft] += wpow
    return wn


def window_resolution(window):
    """(std_w, std_t, harea) of a window, spectrum centered about dc
    (reference stft_utils.py:194-216)."""
    from ..models.wavelets import _xifn
    assert window.min() >= 0, \
        "`window` must be >= 0 (got min=%s)" % window.min()
    N = len(window)
    t = np.arange(-N / 2, N / 2, step=1)
    ws = np.fft.fftshift(_xifn(1, N))

    psihs = np.fft.fftshift(np.fft.fft(window))
    apsi2 = np.abs(window) ** 2
    apsih2s = np.abs(psihs) ** 2

    var_w = (integrate.trapezoid(ws ** 2 * apsih2s, ws) /
             integrate.trapezoid(apsih2s, ws))
    var_t = (integrate.trapezoid(t ** 2 * apsi2, t) /
             integrate.trapezoid(apsi2, t))
    std_w, std_t = np.sqrt(var_w), np.sqrt(var_t)
    return std_w, std_t, std_w * std_t


def window_area(window, time=True, frequency=False):
    """Window 'area' under |window|^2 in time and/or frequency
    (reference stft_utils.py:219-239)."""
    from ..models.wavelets import _xifn
    if not time and not frequency:
        raise ValueError("must compute something")
    if time:
        t = np.arange(-len(window) / 2, len(window) / 2, step=1)
        at = integrate.trapezoid(np.abs(window) ** 2, t)
    if frequency:
        ws = np.fft.fftshift(_xifn(1, len(window)))
        apsih2s = np.abs(np.fft.fftshift(np.fft.fft(window))) ** 2
        aw = integrate.trapezoid(apsih2s, ws)
    if time and frequency:
        return at, aw
    return at if time else aw
