# -*- coding: utf-8 -*-
"""Scale selection / parameter engine (host-side numpy, trace-time).

Behavioral reference: `/root/reference/ssqueezepy/utils/cwt_utils.py`
(process_scales :196, cwt_scalebounds :66, make_scales :301,
find_min/max_scale :412/:434, find_max_scale_alt :630,
find_downsampling_scale :459, adm_ssq/adm_cwt :28/:50,
integrate_analytic :583, infer_scaletype :264, logscale_transition_idx :375,
nv_from_scales :397, _process_fs_and_t :698).

All of this is data-independent bookkeeping that runs once per transform
*plan* on the host — it never traces into XLA, so the adaptive searches and
integrals stay plain numpy.
"""
import numpy as np
from scipy import integrate

from .common import WARN, pi, p2up, assert_is_one_of
from ..configs import get_config
from ..ops.search import find_maximum, find_first_occurrence, min_neglect_idx

__all__ = [
    'adm_ssq', 'adm_cwt', 'cwt_scalebounds', 'process_scales',
    'infer_scaletype', 'make_scales', 'logscale_transition_idx',
    'nv_from_scales', 'find_min_scale', 'find_max_scale',
    'find_downsampling_scale', 'integrate_analytic', 'find_max_scale_alt',
    '_process_fs_and_t',
]


def _wavelet_fn_np(wavelet):
    from ..models.wavelets import Wavelet
    wavelet = Wavelet._init_if_not_isinstance(wavelet)
    return wavelet.evaluate_np


def adm_ssq(wavelet):
    """Synchrosqueezing admissibility constant
    ``integral(conj(psih(w)) / w, w=0..inf)`` (reference cwt_utils.py:28)."""
    fn = _wavelet_fn_np(wavelet)
    Css = integrate_analytic(lambda w: np.conj(fn(w)) / w)
    return Css.real if abs(getattr(Css, 'imag', 0)) < 1e-15 else Css


def adm_cwt(wavelet):
    """CWT admissibility constant ``integral(|psih(w)|^2 / w, w=0..inf)``
    (reference cwt_utils.py:50)."""
    fn = _wavelet_fn_np(wavelet)
    Cpsi = integrate_analytic(lambda w: np.conj(fn(w)) * fn(w) / w)
    return Cpsi.real if abs(getattr(Cpsi, 'imag', 0)) < 1e-15 else Cpsi


def integrate_analytic(int_fn, nowarn=False):
    """Adaptive trapezoid integral 0..inf of an analytic-wavelet-derived
    function (zero for negative inputs, decaying, unimodal), with separate
    logspace integration near zero (reference cwt_utils.py:583-627)."""
    def _est_arr(mxlim, N):
        t = np.linspace(mxlim, .1, N, endpoint=False)[::-1].copy()
        arr = int_fn(t)
        max_idx = np.argmax(np.abs(arr))
        cutoff = min_neglect_idx(np.abs(arr[max_idx:]), th=1e-15) + max_idx
        return arr, t, cutoff

    def _integrate_near_zero():
        t = np.logspace(-15, -1, 1000)
        arr = int_fn(t)
        return integrate.trapezoid(arr, t)

    int_nz = _integrate_near_zero()
    arr = t = None
    for m, mxlim in zip([1, 1, 4, 8], [1, 20, 80, 160]):
        arr_, t_, cutoff = _est_arr(mxlim, N=10000 * m)
        if (len(t_) - cutoff > 1000 * m) and np.sum(np.abs(arr_)) > 1e-5:
            arr, t = arr_[:cutoff], t_[:cutoff]
            break
    if arr is None:
        if abs(int_nz) < 1e-5:
            raise Exception("Could not find converging or non-negligibly"
                            "-valued bounds of integration for `int_fn`")
        elif not nowarn:
            WARN("Integrated only from 1e-15 to 0.1 in logspace")
        arr, t = arr_[:cutoff], t_[:cutoff]
    return integrate.trapezoid(arr, t) + int_nz


# --------------------------------------------------------------------------
# scale bounds
# --------------------------------------------------------------------------
def cwt_scalebounds(wavelet, N, preset=None, min_cutoff=None, max_cutoff=None,
                    cutoff=None, bin_loc=None, bin_amp=None,
                    use_padded_N=True, viz=False):
    """(min_scale, max_scale) for which `wavelet` is well-behaved.
    Presets 'maximal' / 'minimal' / 'naive' per reference
    cwt_utils.py:66-188."""
    defaults = dict(min_cutoff=.6, max_cutoff=.8, cutoff=-.5)

    if preset is not None:
        if any(v is not None for v in (min_cutoff, max_cutoff, cutoff)):
            WARN("`preset` will override `min_cutoff, max_cutoff, cutoff`")
        elif preset == 'minimal' and any(v is not None
                                         for v in (bin_amp, bin_loc)):
            WARN("`preset='minimal'` ignores `bin_amp` & `bin_loc`")
        assert_is_one_of(preset, 'preset', ('maximal', 'minimal', 'naive'))
        if preset in ('naive', 'maximal'):
            min_cutoff, max_cutoff = None, None
            if preset == 'maximal':
                cutoff = -.5
        else:
            min_cutoff, max_cutoff, cutoff = defaults.values()
    else:
        if min_cutoff is None:
            min_cutoff = defaults['min_cutoff']
        elif min_cutoff <= 0:
            raise ValueError("`min_cutoff` must be >0 (got %s)" % min_cutoff)
        if max_cutoff is None:
            max_cutoff = defaults['max_cutoff']
        elif max_cutoff < min_cutoff:
            raise ValueError("must have `max_cutoff > min_cutoff` "
                             "(got %s, %s)" % (max_cutoff, min_cutoff))

    bin_loc = bin_loc or (2 if preset == 'maximal' else None)
    bin_amp = bin_amp or (1 if preset == 'maximal' else None)
    cutoff = cutoff if (cutoff is not None) else defaults['cutoff']

    if preset == 'naive':
        return 1, N

    M = p2up(N)[0] if use_padded_N else N
    min_scale = find_min_scale(wavelet, cutoff=cutoff)

    if preset in ('minimal', None):
        max_scale = find_max_scale_alt(wavelet, M, min_cutoff=min_cutoff,
                                       max_cutoff=max_cutoff)
    else:
        max_scale = find_max_scale(wavelet, M, bin_loc=bin_loc,
                                   bin_amp=bin_amp)
    return min_scale, max_scale


def find_min_scale(wavelet, cutoff=1):
    """Scale whose largest sampled frequency hits `cutoff * peak`
    (right of peak if cutoff>0, else left); reference cwt_utils.py:412-431.
    """
    fn = _wavelet_fn_np(wavelet)
    w_peak, peak = find_maximum(fn)
    if cutoff > 0:
        step_start, step_limit = w_peak, 10 * w_peak
    else:
        step_start, step_limit = 0, w_peak

    w_cutoff, _ = find_first_occurrence(fn, value=abs(cutoff) * peak,
                                        step_start=step_start,
                                        step_limit=step_limit)
    return w_cutoff / pi


def find_max_scale(wavelet, N, bin_loc=1, bin_amp=1):
    """Scale with amplitude `bin_amp` of max at the `bin_loc`-th bin;
    reference cwt_utils.py:434-456."""
    from ..models.wavelets import Wavelet, center_frequency
    wavelet = Wavelet._init_if_not_isinstance(wavelet)

    wc_ct = center_frequency(wavelet, kind='peak-ct', N=N)
    scalec_ct = (4 / pi) * wc_ct

    psih = wavelet.filterbank_np(np.array([scalec_ct]), N=N,
                                 nohalf=True)[0][:N // 2 + 1]
    xi = wavelet.xifn_np(scalec_ct, N)
    midx = np.argmax(psih)
    w_bin = xi[np.where(psih[:midx] < psih.max() * bin_amp)[0][-1]]

    return scalec_ct * (w_bin / xi[bin_loc])


def find_max_scale_alt(wavelet, N, min_cutoff=.1, max_cutoff=.8):
    """'minimal'-preset max scale: smallest xi spacing landing symmetric
    points about the peak within the cutoff band;
    reference cwt_utils.py:630-695."""
    if max_cutoff <= 0 or min_cutoff <= 0:
        raise ValueError("`max_cutoff` and `min_cutoff` must be positive "
                         "(got %s, %s)" % (max_cutoff, min_cutoff))
    elif max_cutoff <= min_cutoff:
        raise ValueError("must have `max_cutoff > min_cutoff` "
                         "(got %s, %s)" % (max_cutoff, min_cutoff))

    fn = _wavelet_fn_np(wavelet)
    w_peak, peak = find_maximum(fn)

    w_cutoff, _ = find_first_occurrence(fn, value=min_cutoff * peak,
                                        step_start=0, step_limit=w_peak)
    w_ltp = np.arange(w_cutoff, w_peak, step=1 / N)  # left-to-peak

    div_size = (w_peak - w_ltp[:-1]) * 2  # doubled so peak is skipped
    n_divs = w_ltp[:-1] / div_size
    try:
        idx = np.where(np.diff(n_divs % 1) < -.8)[0][0]
    except IndexError:
        raise Exception("Failed to find sufficiently-integer xi divisions; "
                        "try widening (min_cutoff, max_cutoff)")
    div_scale = div_size[idx + 1]
    w_1div = pi / (N / 2)
    return div_scale / w_1div


# --------------------------------------------------------------------------
# scale construction / classification
# --------------------------------------------------------------------------
def _assert_positive_integer(g, name=''):
    if not (g > 0 and float(g).is_integer()):
        raise ValueError(f"'{name}' must be a positive integer (got {g})")


def process_scales(scales, N, wavelet=None, nv=None, get_params=False,
                   use_padded_N=True):
    """String spec -> generated scales; array -> validated (na,1) array.
    With `get_params`: (scales, scaletype, na, nv).
    Reference cwt_utils.py:196-261."""
    preset = None
    if isinstance(scales, str):
        if ':' in scales:
            scales, preset = scales.split(':')
        elif scales == 'log-piecewise':
            preset = 'maximal'
        assert_is_one_of(scales, 'scales',
                         ('log', 'log-piecewise', 'linear'))
        if nv is None:
            nv = 32
        if wavelet is None:
            raise ValueError("must set `wavelet` if `scales` isn't array")
        scaletype = scales
        if nv is not None and not isinstance(nv, np.ndarray):
            _assert_positive_integer(nv, 'nv')
            nv = int(nv)

        min_scale, max_scale = cwt_scalebounds(wavelet, N=N, preset=preset,
                                               use_padded_N=use_padded_N)
        scales = make_scales(N, min_scale, max_scale, nv=nv,
                             scaletype=scaletype, wavelet=wavelet)
        na = len(scales)
        return (scales if not get_params else (scales, scaletype, na, nv))

    elif hasattr(scales, 'ndim'):
        scales = np.asarray(scales, dtype=np.float64) \
            if not isinstance(scales, np.ndarray) else scales
        if scales.squeeze().ndim != 1:
            raise ValueError("`scales`, if array, must be 1D "
                             "(got shape %s)" % str(scales.shape))
        scaletype, _nv = infer_scaletype(scales)
        if scaletype == 'log':
            if nv is not None and _nv != nv:
                raise Exception("`nv` used in `scales` differs from `nv` "
                                "passed (%s != %s)" % (_nv, nv))
            nv = _nv
        elif scaletype == 'log-piecewise':
            nv = _nv
        scales = scales.reshape(-1, 1)
        return (scales if not get_params else
                (scales, scaletype, len(scales), nv))
    else:
        raise TypeError("`scales` must be a string or array "
                        "(got %s)" % type(scales))


def infer_scaletype(scales):
    """'linear' | 'log' | 'log-piecewise' (+nv) from an array;
    reference cwt_utils.py:264-298."""
    scales = np.asarray(scales).reshape(-1, 1)
    if scales.dtype not in (np.float32, np.float64):
        raise TypeError("`scales.dtype` must be np.float32 or np.float64 "
                        "(got %s)" % scales.dtype)

    th_log = 4e-15 if scales.dtype == np.float64 else 8e-7
    th_lin = th_log * 1e3

    if np.mean(np.abs(np.diff(np.log(scales), 2, axis=0))) < th_log:
        scaletype = 'log'
        nv = int(np.round(1 / np.diff(np.log2(scales), axis=0)[0].squeeze()))
    elif np.mean(np.abs(np.diff(scales, 2, axis=0))) < th_lin:
        scaletype = 'linear'
        nv = None
    elif logscale_transition_idx(scales) is None:
        raise ValueError("could not infer `scaletype` from `scales`; "
                         "must be linear or exponential (got diff(scales)="
                         "%s..." % np.diff(scales, axis=0)[:4])
    else:
        scaletype = 'log-piecewise'
        nv = nv_from_scales(scales)
    return scaletype, nv


def make_scales(N, min_scale=None, max_scale=None, nv=32, scaletype='log',
                wavelet=None, downsample=None):
    """Build scales array; 'log-piecewise' downsamples redundant high
    scales past `find_downsampling_scale` (reference cwt_utils.py:301-372).
    """
    if scaletype == 'log-piecewise' and wavelet is None:
        raise ValueError("must pass `wavelet` for "
                         "`scaletype == 'log-piecewise'`")
    if min_scale is None and max_scale is None and wavelet is not None:
        min_scale, max_scale = cwt_scalebounds(wavelet, N, use_padded_N=True)
    else:
        min_scale = min_scale or 1
        max_scale = max_scale or N
    downsample = int(downsample if downsample is not None else
                     get_config().downsample)

    na = int(np.ceil(nv * np.log2(max_scale / min_scale)))
    mn_pow = int(np.floor(nv * np.log2(min_scale)))
    mx_pow = mn_pow + na

    if scaletype == 'log':
        scales = 2 ** (np.arange(mn_pow, mx_pow) / nv)
    elif scaletype == 'log-piecewise':
        scales = 2 ** (np.arange(mn_pow, mx_pow) / nv)
        idx = find_downsampling_scale(wavelet, scales)
        if idx is not None:
            # `+downsample-1` so scales2 continues from scales1 at the
            # downsampled rate (reference cwt_utils.py:353-360)
            scales1 = scales[:idx]
            scales2 = scales[idx + downsample - 1::downsample]
            scales = np.hstack([scales1, scales2])
    elif scaletype == 'linear':
        min_scale, max_scale = 2 ** (mn_pow / nv), 2 ** (mx_pow / nv)
        na = int(np.ceil(max_scale / min_scale))
        scales = np.linspace(min_scale, max_scale, na)
    else:
        raise ValueError("`scaletype` must be 'log' or 'linear'; "
                         "got: %s" % scaletype)
    return scales.reshape(-1, 1)


def logscale_transition_idx(scales):
    """Split index of a two-piece log scale array, else None;
    reference cwt_utils.py:375-394."""
    scales = np.asarray(scales)
    scales_diff2 = np.abs(np.diff(np.log(scales), 2, axis=0))
    idx = int(np.argmax(scales_diff2)) + 2
    diff2_max = scales_diff2.max()
    scales_diff2[idx - 2] = 0

    th = 1e-14 if scales.dtype == np.float64 else 1e-6
    if not np.any(diff2_max > 100 * np.abs(scales_diff2).mean()):
        return None
    elif not np.all(np.abs(scales_diff2) < th):
        return None
    return idx


def nv_from_scales(scales):
    """Per-scale `nv` array (length len(scales)); reference
    cwt_utils.py:397-409."""
    scales = np.asarray(scales).reshape(-1, 1)
    logdiffs = 1 / np.diff(np.log2(scales), axis=0)
    nv = np.vstack([logdiffs[:1], logdiffs])
    idx = logscale_transition_idx(scales)
    if idx is not None:
        nv_transition_idx = int(np.argmax(np.abs(np.diff(nv, axis=0)))) + 1
        assert nv_transition_idx == idx, \
            "%s != %s" % (nv_transition_idx, idx)
    return nv


def find_downsampling_scale(wavelet, scales, span=5, tol=3, method='sum',
                            nonzero_th=.02, nonzero_tol=4., N=None,
                            viz=False):
    """Index of the first scale where freq-domain wavelets become
    excessively redundant (peak-distance test over `span`-groups);
    reference cwt_utils.py:459-580."""
    assert_is_one_of(method, 'method', ('any', 'all', 'sum'))
    from ..models.wavelets import Wavelet

    N = N or 2048
    if isinstance(wavelet, np.ndarray):
        Psih = wavelet
    else:
        wavelet = Wavelet._init_if_not_isinstance(wavelet)
        Psih = wavelet.filterbank_np(np.asarray(scales).squeeze(), N=N,
                                     nohalf=True)
    if len(Psih) != len(scales):
        raise ValueError("len(Psih) != len(scales) (%s != %s)"
                         % (len(Psih), len(scales)))

    Psih = Psih[:, :Psih.shape[1] // 2]  # analytic: right half is zero
    n_scales = len(Psih)
    n_groups = n_scales - span - 1

    if not viz:
        # C++ host-plan engine (native/planlib.cpp); exact twin of the
        # Python loop below — falls through when no toolchain exists
        from ..native import find_downsampling_scale_native
        out = find_downsampling_scale_native(Psih, span, tol, nonzero_th,
                                             nonzero_tol, method)
        if out is not NotImplemented:
            return out

    i = None
    for i in range(n_groups):
        psihs = Psih[i:i + span]

        nonzeros = (psihs > nonzero_th * psihs.max(axis=1)[:, None])
        if nonzeros.sum() / span > nonzero_tol:
            continue

        peaks = np.where(psihs == psihs.max(axis=1)[:, None])
        joint_peak = np.argmax(np.prod(psihs, 0))
        distances = np.abs(peaks[1] - joint_peak)

        too_dense = (
            (method == 'any' and distances.max() < tol) or
            (method == 'all' and not np.all(distances > tol)) or
            (method == 'sum' and distances.sum() < tol))
        if too_dense:
            break
    return i if (i is not None and i < n_groups - 1) else None


def _process_fs_and_t(fs, t, N):
    """(dt, fs, t) from sampling rate or time vector;
    reference cwt_utils.py:698-718."""
    if fs is not None and t is not None:
        WARN("`t` will override `fs` (both were passed)")
    if t is not None:
        if len(t) != N:
            raise Exception("`t` must be of same length as `x` "
                            "(%s != %s)" % (len(t), N))
        elif not np.mean(np.abs(np.diff(t, 2, axis=0))) < 1e-7:
            raise Exception("Time vector `t` must be uniformly sampled.")
        fs = 1 / (t[1] - t[0])
    else:
        if fs is None:
            fs = 1
        elif fs <= 0:
            raise ValueError("`fs` must be > 0")
    dt = 1 / fs
    return dt, fs, t
