# -*- coding: utf-8 -*-
"""Synchrosqueezed STFT (forward & inverse).

Behavioral reference: `/root/reference/ssqueezepy/_ssq_stft.py`
(ssq_stft :13, issq_stft :139, phase_stft via ops/phase.py)."""
import numpy as np
import jax.numpy as jnp

from ..ops.complexlib import Complex, as_complex
from ..ops.phase import phase_stft
from ..ops.ssq_kernels import ssqueeze_fast, indexed_sum_onfly, \
    ssq_bin_params
from ..utils.common import WARN, EPS32, EPS64
from ..utils.cwt_utils import _process_fs_and_t, infer_scaletype
from .ssqueezing import _check_ssqueezing_args
from .stft import stft, istft
from .windows import get_window, _check_NOLA
from .ssq_cwt import (_invert_components,
                      _process_component_inversion_args)

__all__ = ['ssq_stft', 'issq_stft']


def _make_Sfs(Sx, fs):
    n_rows = Sx.shape[0] if Sx.ndim == 2 else Sx.shape[1]
    dtype = 'float32' if str(Sx.dtype) == 'float32' else 'float64'
    return np.linspace(0, .5 * fs, n_rows, dtype=dtype)


def ssq_stft(x, window=None, n_fft=None, win_len=None, hop_len=1, fs=None,
             t=None, modulated=True, ssq_freqs=None, padtype='reflect',
             squeezing='sum', gamma=None, preserve_transform=None,
             dtype=None, astensor=True, flipud=False, get_w=False,
             get_dWx=False):
    """Synchrosqueezed STFT; API parity with reference `ssq_stft`
    (_ssq_stft.py:13-136). Returns (Tx, Sx, ssq_freqs, Sfs[, w][, dSx])."""
    xnp = np.asarray(x) if isinstance(x, (list, np.ndarray)) else x
    if xnp.ndim == 2 and get_w:
        raise NotImplementedError("`get_w=True` unsupported with batched "
                                  "input.")
    _, fs_, _ = _process_fs_and_t(fs, t, xnp.shape[-1])
    _check_ssqueezing_args(squeezing)
    if isinstance(ssq_freqs, np.ndarray) and \
            infer_scaletype(ssq_freqs)[0] != 'linear':
        raise ValueError("`ssq_freqs` must be linearly distributed "
                         "for `ssq_stft`")

    Sx, dSx = stft(xnp, window, n_fft=n_fft, win_len=win_len,
                   hop_len=hop_len, fs=fs_, padtype=padtype,
                   modulated=modulated, derivative=True, dtype=dtype)

    Sfs = _make_Sfs(Sx, fs_)
    if gamma is None:
        gamma = 10 * (EPS64 if str(Sx.dtype) == 'float64' else EPS32)
    gamma = float(gamma)

    if get_w:
        w = phase_stft(Sx, dSx, Sfs, gamma)
        _dSx = None
    else:
        w = None
        _dSx = dSx

    if ssq_freqs is None:
        ssq_freqs = Sfs
    const = float(ssq_freqs[1] - ssq_freqs[0])
    params = ssq_bin_params(ssq_freqs, logscale=False)
    from .ssqueezing import _natural_bins
    n_rows = Sx.shape[-2]
    natural = _natural_bins('stft', None, ssq_freqs, params, flipud,
                            n_rows, 1. / fs_)

    if w is None:
        Tx = ssqueeze_fast(Sx, _dSx, ssq_freqs, const, logscale=False,
                           flipud=flipud, gamma=gamma,
                           Sfs=jnp.asarray(Sfs, str(Sx.dtype)),
                           params=params, natural_bins=natural)
    else:
        Tx = indexed_sum_onfly(Sx, w, ssq_freqs, const, logscale=False,
                               flipud=flipud, params=params,
                               natural_bins=natural)

    ssq_freqs_out = (np.asarray(ssq_freqs)[::-1].copy() if flipud
                     else np.asarray(ssq_freqs))

    if not astensor:
        Tx = Tx.to_numpy()
        Sx = Sx.to_numpy()
        dSx = dSx.to_numpy() if dSx is not None else None
        w = np.asarray(w) if w is not None else None

    if get_w and get_dWx:
        return Tx, Sx, ssq_freqs_out, Sfs, w, dSx
    elif get_w:
        return Tx, Sx, ssq_freqs_out, Sfs, w
    elif get_dWx:
        return Tx, Sx, ssq_freqs_out, Sfs, dSx
    return Tx, Sx, ssq_freqs_out, Sfs


def issq_stft(Tx, window=None, cc=None, cw=None, n_fft=None, win_len=None,
              hop_len=1, modulated=True):
    """Inverse synchrosqueezed STFT:
    ``x = Re(sum(Tx, axis=0)) * 2 / window[center]``
    (reference _ssq_stft.py:139-198)."""
    if not modulated:
        raise ValueError("inversion with `modulated == False` is "
                         "unsupported.")
    if hop_len != 1:
        raise ValueError("inversion with `hop_len != 1` is unsupported.")

    cc, cw, full_inverse = _process_component_inversion_args(cc, cw)
    if isinstance(Tx, Complex) and full_inverse:
        import jax
        # device-side reduction; only the (N,) result crosses to host
        x_dev = np.asarray(jax.jit(lambda t: t.sum(axis=0))(Tx.re))
        n_fft = int(n_fft or (Tx.shape[0] - 1) * 2)
        win_len = win_len or n_fft
        window = get_window(window, win_len, n_fft=n_fft)
        _check_NOLA(window, hop_len)
        if abs(np.argmax(window) - len(window) // 2) > 1:
            WARN("`window` maximum not centered; results may be "
                 "inaccurate.")
        return x_dev * (2 / window[len(window) // 2])

    if isinstance(Tx, Complex):
        Tx = Tx.to_numpy()
    Tx = np.asarray(Tx)
    n_fft = int(n_fft or (Tx.shape[0] - 1) * 2)
    win_len = win_len or n_fft

    window = get_window(window, win_len, n_fft=n_fft)
    _check_NOLA(window, hop_len)
    if abs(np.argmax(window) - len(window) // 2) > 1:
        WARN("`window` maximum not centered; results may be inaccurate.")

    if full_inverse:
        x = Tx.real.sum(axis=0)
    else:
        x = _invert_components(Tx, cc, cw)

    x *= (2 / window[len(window) // 2])
    return x
