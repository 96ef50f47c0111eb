# -*- coding: utf-8 -*-
"""Synchrosqueezing orchestration.

Behavioral reference: `/root/reference/ssqueezepy/ssqueezing.py`
(`ssqueeze` :13, `_compute_associated_frequencies` :247,
`_ssq_freqrange` :228, `_exp_fm` :294, `_check_ssqueezing_args` :314).
The associated-frequency grids, squeeze constants, and bin parameters are
computed on host at plan time; the reassignment itself runs through the
fused kernels in ops/ssq_kernels.py.
"""
from types import FunctionType

import numpy as np
import jax.numpy as jnp

from ..ops.complexlib import Complex, as_complex
from ..ops.ssq_kernels import ssqueeze_fast, indexed_sum_onfly, \
    ssq_bin_params
from ..utils.common import NOTE, WARN, pi, p2up, assert_is_one_of
from ..utils.cwt_utils import (process_scales, infer_scaletype,
                               logscale_transition_idx, _process_fs_and_t)

__all__ = ['ssqueeze']


def _compute_associated_frequencies(scales, N, wavelet, ssq_scaletype,
                                    maprange, was_padded=True, dt=1,
                                    transform='cwt'):
    """Frequency grid the reassigned energy lands on — one entry per
    scale row, spaced per `ssq_scaletype`, endpoints per `maprange`.
    Behavioral parity with reference ssqueezing.py:247-291.

    'log' rides a single exponential ramp between the endpoints;
    'log-piecewise' joins two ramps at the scale-downsampling transition
    (the knee frequency is the wavelet's center frequency at the
    transition scale, so bin spacing tracks the actual voice density on
    each side); 'linear' is an even grid.
    """
    lo, hi = _freq_endpoints(maprange, dt, N, wavelet, scales, was_padded)
    na = len(scales)
    pos = np.arange(na) / (na - 1)        # output-grid coordinate in [0,1]

    if ssq_scaletype == 'log-piecewise':
        cut = logscale_transition_idx(scales)
        if cut is not None:
            knee = _center_freq_hz(wavelet, N, maprange, dt, scales[cut],
                                   was_padded)
            j = na - cut - 1              # knee position in the grid
            seg_lo = lo * (knee / lo) ** (pos[:j] / pos[j])
            seg_hi = knee * (hi / knee) ** ((pos[j:] - pos[j])
                                            / (1 - pos[j]))
            grid = np.hstack([seg_lo, seg_hi])
            found = logscale_transition_idx(grid.reshape(-1, 1))
            if found is None or (na - found) != cut:
                raise AssertionError(
                    "piecewise ssq grid knee landed at %s, expected %s "
                    "(scale transition %d)" % (found, na - cut, cut))
            return grid
        ssq_scaletype = 'log'             # no transition -> plain ramp

    if ssq_scaletype.startswith('log'):
        return lo * (hi / lo) ** pos
    if transform == 'cwt':
        return np.linspace(lo, hi, na)
    return np.linspace(0, .5, na) / dt


def _freq_endpoints(maprange, dt, N, wavelet, scales, was_padded):
    """(lowest, highest) grid frequency in cycles per unit time.

    Tuple maprange passes through; 'maximal' spans one-cycle-per-record
    to Nyquist; 'peak'/'energy' anchor on the wavelet's center frequency
    at the largest/smallest scale (reference ssqueezing.py:228-244).
    """
    if isinstance(maprange, (tuple, list)):
        return maprange[0], maprange[1]
    if maprange == 'maximal':
        return 1 / (N * dt), 1 / (2 * dt)
    return (_center_freq_hz(wavelet, N, maprange, dt, scales[-1],
                            was_padded),
            _center_freq_hz(wavelet, N, maprange, dt, scales[0],
                            was_padded))


def _center_freq_hz(wavelet, N, kind, dt, scale, was_padded):
    """Wavelet center frequency at `scale`, converted rad/sample -> Hz.
    Padded transforms measure it at the padded length (the CWT itself ran
    there)."""
    from .wavelets import center_frequency
    n_eff = p2up(N)[0] if was_padded else N
    w_peak = center_frequency(wavelet, N=n_eff,
                              scale=float(np.asarray(scale).squeeze()),
                              kind=kind,
                              **(dict(force_int=True) if kind == 'energy'
                                 else {}))
    return w_peak / (2 * pi) / dt


def _check_ssqueezing_args(squeezing, maprange=None, wavelet=None,
                           difftype=None, difforder=None, get_w=None,
                           transform='cwt'):
    """Validation (reference ssqueezing.py:314-368)."""
    if transform not in ('cwt', 'stft'):
        raise ValueError("`transform` must be one of: cwt, stft "
                         "(got %s)" % transform)
    if not isinstance(squeezing, (str, FunctionType)):
        raise TypeError("`squeezing` must be string or function "
                        "(got %s)" % type(squeezing))
    elif isinstance(squeezing, str):
        assert_is_one_of(squeezing, 'squeezing', ('sum', 'lebesgue', 'abs'))

    if maprange is not None:
        if isinstance(maprange, (tuple, list)):
            if not all(isinstance(m, (float, int)) for m in maprange):
                raise ValueError("all elements of `maprange` must be "
                                 "float or int")
        elif isinstance(maprange, str):
            assert_is_one_of(maprange, 'maprange',
                             ('maximal', 'peak', 'energy'))
        else:
            raise TypeError("`maprange` must be str, tuple, or list "
                            "(got %s)" % type(maprange))
        if isinstance(maprange, str) and maprange != 'maximal':
            if transform != 'cwt':
                NOTE("string `maprange` currently only functional with "
                     "`transform='cwt'`")
            elif wavelet is None:
                raise ValueError(f"maprange='{maprange}' requires `wavelet`")

    if difftype is not None:
        if difftype not in ('trig', 'phase', 'numeric'):
            raise ValueError("`difftype` must be one of: trig, phase, "
                             "numeric (got %s)" % difftype)
        elif difftype != 'trig' and not get_w:
            raise ValueError("`difftype != 'trig'` requires `get_w = True`")

    if difforder is not None:
        if difftype != 'numeric':
            WARN("`difforder` is ignored if `difftype != 'numeric'")
        elif difforder not in (1, 2, 4):
            raise ValueError("`difforder` must be one of: 1, 2, 4 "
                             "(got %s)" % difforder)
    elif difftype == 'numeric':
        difforder = 4
    return difforder


def ssqueeze(Wx, w=None, ssq_freqs=None, scales=None, Sfs=None, fs=None,
             t=None, squeezing='sum', maprange='maximal', wavelet=None,
             gamma=None, was_padded=True, flipud=False, dWx=None,
             transform='cwt'):
    """Synchrosqueeze a CWT/STFT (reference ssqueezing.py:13-224).

    Returns (Tx, ssq_freqs); `Tx` is split-complex `Complex` if `Wx` is
    device-resident, else numpy complex.
    """
    was_numpy = isinstance(Wx, np.ndarray) and np.iscomplexobj(Wx)
    Wx = as_complex(Wx)
    if dWx is not None:
        dWx = as_complex(dWx)

    if w is None and (dWx is None or gamma is None):
        raise ValueError("if `w` is None, `dWx` and `gamma` must not be.")
    if w is not None and np.asarray(w).min() < 0:
        raise ValueError("found negatives in `w`")
    _check_ssqueezing_args(squeezing, maprange, transform=transform,
                           wavelet=wavelet)
    if scales is None and transform == 'cwt':
        raise ValueError("`scales` can't be None if `transform == 'cwt'`")

    N = Wx.shape[-1]
    dt, *_ = _process_fs_and_t(fs, t, N)

    if transform == 'cwt':
        scales, cwt_scaletype, _, nv = process_scales(scales, N,
                                                      get_params=True)
    else:
        cwt_scaletype, nv = None, None

    # ssq_freqs / scaletype resolution
    if not isinstance(ssq_freqs, np.ndarray):
        ssq_scaletype = (ssq_freqs if isinstance(ssq_freqs, str)
                         else cwt_scaletype)
        if ((maprange == 'maximal' or isinstance(maprange, tuple)) and
                ssq_scaletype == 'log-piecewise'):
            raise ValueError("can't have `ssq_scaletype = log-piecewise` or "
                             "tuple with `maprange = 'maximal'` "
                             "(got %s)" % str(maprange))
        ssq_freqs = _compute_associated_frequencies(
            scales, N, wavelet, ssq_scaletype, maprange, was_padded, dt,
            transform)
    elif transform == 'stft':
        ssq_scaletype = 'linear'
    else:
        ssq_scaletype, _ = infer_scaletype(ssq_freqs)

    # squeeze constant (reference ssqueezing.py:124-134)
    if transform == 'cwt':
        if cwt_scaletype.startswith('log'):
            const = np.log(2) / nv  # scalar or per-row array (piecewise)
        else:
            const = ((scales[1] - scales[0]) / scales).squeeze()
    else:
        const = float(ssq_freqs[1] - ssq_freqs[0])

    # transform Wx per `squeezing`
    if isinstance(squeezing, FunctionType):
        Wq = squeezing(Wx)
        Wx_s = as_complex(Wq)
    elif squeezing == 'lebesgue':
        ones = jnp.ones(Wx.shape, Wx.dtype) / Wx.shape[-2]
        Wx_s = Complex(ones, jnp.zeros_like(ones))
    elif squeezing == 'abs':
        Wx_s = Complex(Wx.abs(), jnp.zeros_like(Wx.re))
    else:
        Wx_s = Wx

    logscale = bool(ssq_scaletype.startswith('log'))
    params = ssq_bin_params(ssq_freqs, logscale)
    natural_bins = _natural_bins(transform, scales, ssq_freqs, params,
                                 flipud, Wx.shape[-2], dt)

    if w is None and Wx_s is Wx:
        Tx = ssqueeze_fast(Wx, dWx, ssq_freqs, const, logscale, flipud,
                           gamma, Sfs=Sfs if transform == 'stft' else None,
                           params=params, natural_bins=natural_bins)
    else:
        # non-'sum' squeezing: the phase transform must see the RAW Wx
        # (squeezed planes carry no usable phase); only scattered values
        # are squeezed
        if w is None:
            from ..ops.phase import phase_transform_w
            w = phase_transform_w(
                Wx, dWx, gamma,
                Sfs=jnp.asarray(Sfs, str(Wx.dtype))
                if transform == 'stft' and Sfs is not None else None)
        Tx = indexed_sum_onfly(Wx_s, w, ssq_freqs, const, logscale, flipud,
                               params=params, natural_bins=natural_bins)

    # `scales` go high -> low (reference ssqueezing.py:217-222)
    if (transform == 'cwt' and not flipud) or flipud:
        ssq_freqs = ssq_freqs[::-1].copy()

    if was_numpy:
        Tx = Tx.to_numpy()
    return Tx, ssq_freqs


def _natural_bins(transform, scales, ssq_freqs, params, flipud, na, dt):
    """Static per-row expected bin (for the Pallas shift-scatter): the bin
    each scale's associated frequency falls in. Any static base works for
    correctness; a good base minimizes displacement ranges."""
    try:
        v = np.asarray(ssq_freqs).squeeze()
        nbins = params['omax'] + 1
        if transform == 'cwt' and scales is not None and len(v) == na:
            # scales high->low map to bins low->high: natural ~ reversed
            base = np.arange(na - 1, -1, -1)
        else:
            base = np.arange(na)
        base = np.clip(base, 0, nbins - 1)
        if flipud:
            base = (nbins - 1) - base
        return base.astype(np.int32)
    except Exception:
        return None
