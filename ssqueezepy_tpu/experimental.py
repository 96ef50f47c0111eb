# -*- coding: utf-8 -*-
"""Experimental: scale<->frequency converters and generic phase-SSQ on
arbitrary precomputed transforms.

Behavioral reference: `/root/reference/ssqueezepy/experimental.py`
(`freq_to_scale` :15, `scale_to_freq` :85, `phase_ssqueeze` :145,
`phase_transform` :193).
"""
import warnings
import numpy as np

from .models.wavelets import Wavelet, center_frequency
from .models.ssqueezing import ssqueeze
from .models.ssq_stft import _make_Sfs
from .ops.complexlib import Complex, as_complex
from .ops.phase import phase_cwt, phase_cwt_num, phase_stft
from .ops.diff import trigdiff
from .utils.common import EPS32, EPS64, p2up
from .utils.cwt_utils import cwt_scalebounds

__all__ = ['freq_to_scale', 'scale_to_freq', 'phase_ssqueeze',
           'phase_transform']


def freq_to_scale(freqs, wavelet, N, fs=1, n_search_scales=None, kind='peak',
                  base=2):
    """Approximate frequencies -> scales conversion by searching the
    wavelet's center-frequency curve (reference experimental.py:15-82)."""
    def log(x):
        return np.log(x) / np.log(base)

    freqs = np.asarray(freqs) / fs
    assert np.all(freqs >= 0), "frequencies must be positive"
    assert freqs.max() <= 0.5, "max frequency must be 0.5"
    assert freqs.max() == freqs[-1], "max frequency must be last sample"
    assert freqs.min() == freqs[0], "min frequency must be first sample"

    M = len(freqs)
    if n_search_scales is None:
        n_search_scales = 10 * M
    smin, smax = cwt_scalebounds(wavelet, N, preset='maximal',
                                 use_padded_N=False)
    search_scales = np.logspace(log(smin), log(smax), n_search_scales,
                                base=base)

    w_from_scales = [
        min(max(center_frequency(wavelet, s, N, kind=kind), 0), np.pi)
        for s in search_scales]
    f_from_scales = np.array(w_from_scales) / (2 * np.pi)

    fmin, fmax = freqs.min(), freqs.max()
    smax_ = search_scales[np.argmin(np.abs(f_from_scales - fmin))]
    smin_ = search_scales[np.argmin(np.abs(f_from_scales - fmax))]
    return np.logspace(log(smax_), log(smin_), M, base=base)


def scale_to_freq(scales, wavelet, N, fs=1, padtype='reflect'):
    """Scales -> frequencies via freq-domain wavelet peak locations
    (reference experimental.py:85-144)."""
    if isinstance(scales, float):
        scales = np.array([scales])
    scales = np.asarray(scales)
    wavelet = Wavelet._init_if_not_isinstance(wavelet)

    Npad = p2up(N)[0] if padtype is not None else N
    psis = wavelet.filterbank_np(scales.squeeze(), N=Npad, nohalf=True)
    idxs = np.argmax(psis, axis=-1)

    if np.any(idxs > Npad // 2) or 0 in idxs:
        warnings.warn("found potentially ill-behaved wavelets (peak indices "
                      "at negative freqs or at dc); will round idxs to 1 "
                      "or N/2")
        n_psis = len(psis)
        for i, ix in enumerate(idxs):
            if ix > Npad // 2 or ix == 0:
                idxs[i] = 1 if i > n_psis // 2 else Npad // 2

    freqs = idxs / Npad
    assert freqs.min() >= 0, freqs.min()
    assert freqs.max() <= 0.5, freqs.max()
    return freqs * fs


def phase_ssqueeze(Wx, dWx=None, ssq_freqs=None, scales=None, Sfs=None,
                   fs=1., t=None, squeezing='sum', maprange=None,
                   wavelet=None, gamma=None, was_padded=True, flipud=False,
                   rpadded=False, padtype=None, N=None, n1=None,
                   difftype=None, difforder=None, get_w=False,
                   get_dWx=False, transform='cwt'):
    """phase_transform then ssqueeze on an arbitrary CWT/STFT-like `Wx`
    (reference experimental.py:145-198)."""
    w, Wx, dWx, Sfs, gamma = phase_transform(
        Wx, dWx, difftype or 'trig', difforder=difforder, gamma=gamma,
        rpadded=rpadded, padtype=padtype, N=N, n1=n1, get_w=get_w, fs=fs,
        transform=transform)

    if w is not None and not get_dWx:
        dWx = None
    if maprange is None:
        maprange = 'peak' if transform == 'cwt' else 'maximal'

    Tx, ssq_freqs = ssqueeze(Wx, w, ssq_freqs, scales, Sfs, fs=fs, t=t,
                             squeezing=squeezing, maprange=maprange,
                             wavelet=wavelet, gamma=gamma,
                             was_padded=was_padded, flipud=flipud, dWx=dWx,
                             transform=transform)
    return Tx, Wx, ssq_freqs, scales, Sfs, w, dWx


def phase_transform(Wx, dWx=None, difftype='trig', difforder=4, gamma=None,
                    fs=1., Sfs=None, rpadded=False, padtype='reflect',
                    N=None, n1=None, get_w=False, transform='cwt'):
    """Unified CWT & STFT SSQ phase transform
    (reference experimental.py:193-259)."""
    if transform == 'stft' and dWx is None:
        raise NotImplementedError("`phase_transform` without `dWx` for "
                                  "STFT is not currently supported.")
    if rpadded and N is None:
        raise ValueError("`rpadded=True` requires `N`")
    Wx_c = as_complex(Wx)
    if Wx_c.ndim > 2 and get_w:
        raise NotImplementedError("`get_w=True` unsupported with batched "
                                  "input.")
    if gamma is None:
        gamma = 10 * (EPS64 if str(Wx_c.dtype) == 'float64' else EPS32)

    if transform == 'cwt':
        if N is None and not rpadded:
            N = Wx_c.shape[-1]
        if n1 is None:
            _, n1, _ = p2up(N)
        if dWx is None:
            dWx = trigdiff(Wx, fs, padtype, rpadded, N=N, n1=n1,
                           transform='cwt')
        w = None
        if get_w:
            if difftype == 'trig':
                w = phase_cwt(Wx, dWx, difftype, gamma)
            elif difftype == 'phase':
                w = phase_cwt(Wx, None, difftype, gamma)
            else:
                Wx = as_complex(Wx)[..., (n1 - 4):(n1 + N + 4)]
                w = phase_cwt_num(Wx, 1 / fs, difforder, gamma)
        Sfs = None
    else:
        if Sfs is None:
            Sfs = _make_Sfs(as_complex(Wx), fs)
        w = phase_stft(Wx, dWx, Sfs, gamma) if get_w else None

    return w, Wx, dWx, Sfs, gamma
