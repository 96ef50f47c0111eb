# -*- coding: utf-8 -*-
"""Synchrosqueezing reassignment kernels.

Behavioral reference: `/root/reference/ssqueezepy/algos.py` — the fused
phase+bin+scatter kernels (`_ssq_cwt_log_piecewise` :859, `_ssq_cwt_log`
:898, `_ssq_cwt_lin` :927, `_ssq_stft` :956, and their numba-parallel/CUDA
twins :1007-1294), the `indexed_sum_*` family (:172-251), and the
`find_closest` bin-mapping math (:254-449).

TPU-native design: bin-map parameters (`vlmin`, `dvl`, piecewise split) are
extracted at trace time exactly as the reference's
`_get_params_find_closest_log` (algos.py:356-374); the phase transform,
bin computation, and gamma gating are fused XLA elementwise ops; the
scatter-add itself has two execution paths:

  * `engine='xla'`: `jnp .at[].add` scatter — exact, fast on CPU, the
    correctness reference (the reference library's serial-CPU role in its
    own CPU/parallel/GPU equality tests, tests/fft_test.py),
  * `engine='pallas'` (ops/ssq_pallas.py): shift-scatter Pallas kernel —
    the scatter is decomposed into uniform sublane rolls over per-row
    displacements from each scale's natural bin, which is the only
    scatter formulation that maps onto the TPU's vector memory (no
    per-lane scatter exists on this hardware).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .complexlib import Complex, as_complex
from .phase import _imag_ratio_over_2pi
from ..utils.common import WARN, EPS64

__all__ = [
    'ssq_bin_params', 'compute_bins', 'ssqueeze_fast', 'indexed_sum_onfly',
    'find_closest', 'find_closest_smart', 'find_closest_brute',
    'find_closest_log', 'find_closest_lin', 'indexed_sum',
]


# --------------------------------------------------------------------------
# bin-map parameter extraction (trace-time numpy)
# --------------------------------------------------------------------------
def _ensure_nonzero_nonnegative(name, x, silent=False):
    if x < EPS64:
        if not silent:
            WARN("computed `%s` (%.2e) is below EPS64; will set to EPS64. "
                 "Advised to check `ssq_freqs`." % (name, x))
        x = EPS64
    return x


def ssq_bin_params(ssq_freqs, logscale):
    """dict of static bin-map params from the ssq frequency grid.
    Mirrors reference `_get_params_find_closest_log` (algos.py:356-374)
    and the linear branch of `_process_ssq_params` (algos.py:82-87)."""
    from ..utils.cwt_utils import logscale_transition_idx
    v = np.asarray(ssq_freqs).squeeze()
    if not logscale:
        dv = float(v[1] - v[0])
        dv = _ensure_nonzero_nonnegative('dv', dv)
        return dict(mode='lin', vmin=float(v[0]), dv=dv, omax=len(v) - 1)

    idx = logscale_transition_idx(v.reshape(-1, 1))
    vlmin = float(np.log2(v[0]))
    if idx is None:
        dvl = float(np.log2(v[1]) - np.log2(v[0]))
        dvl = _ensure_nonzero_nonnegative('dvl', dvl)
        return dict(mode='log', vlmin=vlmin, dvl=dvl, omax=len(v) - 1)

    vlmin0, vlmin1 = vlmin, float(np.log2(v[idx - 1]))
    dvl0 = float(np.log2(v[1]) - np.log2(v[0]))
    dvl1 = float(np.log2(v[idx]) - np.log2(v[idx - 1]))
    dvl0 = _ensure_nonzero_nonnegative('dvl0', dvl0, silent=True)
    dvl1 = _ensure_nonzero_nonnegative('dvl1', dvl1)
    return dict(mode='log-piecewise', vlmin0=vlmin0, vlmin1=vlmin1,
                dvl0=dvl0, dvl1=dvl1, idx1=int(idx - 1), omax=len(v) - 1)


# --------------------------------------------------------------------------
# traceable bin computation
# --------------------------------------------------------------------------
def compute_bins(w, params, flipud=False):
    """int32 bin indices from phase-transform values `w` (inf = invalid).
    Exactly the reference's bin arithmetic (algos.py:172-251, 859-984)."""
    omax = params['omax']
    dt = w.dtype
    if params['mode'] == 'lin':
        k = jnp.minimum(jnp.round(jnp.maximum(
            (w - params['vmin']) / jnp.asarray(params['dv'], dt), 0)), omax)
    elif params['mode'] == 'log':
        wl = jnp.log2(w)
        k = jnp.minimum(jnp.round(jnp.maximum(
            (wl - params['vlmin']) / jnp.asarray(params['dvl'], dt), 0)),
            omax)
    else:  # log-piecewise (two segments)
        wl = jnp.log2(w)
        k_hi = jnp.minimum(
            jnp.round((wl - params['vlmin1'])
                      / jnp.asarray(params['dvl1'], dt)) + params['idx1'],
            omax)
        k_lo = jnp.maximum(
            jnp.round((wl - params['vlmin0'])
                      / jnp.asarray(params['dvl0'], dt)), 0)
        k = jnp.where(wl > params['vlmin1'], k_hi, k_lo)

    valid = jnp.isfinite(w)
    k = jnp.where(valid, k, 0).astype(jnp.int32)
    if flipud:
        k = omax - k
    return k, valid


def _broadcast_const(const, na, dtype):
    c = jnp.asarray(const, dtype=dtype).squeeze()
    if c.ndim == 0:
        c = jnp.full((na,), c, dtype=dtype)
    return c.reshape(-1, 1)


# --------------------------------------------------------------------------
# scatter execution paths
# --------------------------------------------------------------------------
def _scatter_xla(vre, vim, k, valid, nbins):
    """out[k[i,j], j] += v[i,j]; invalid entries dropped."""
    ncols = vre.shape[-1]
    cols = jnp.broadcast_to(jnp.arange(ncols, dtype=jnp.int32), k.shape)
    k = jnp.where(valid, k, nbins)  # out of range -> dropped
    out_re = jnp.zeros((nbins, ncols), vre.dtype).at[k, cols].add(
        vre, mode='drop')
    out_im = jnp.zeros((nbins, ncols), vim.dtype).at[k, cols].add(
        vim, mode='drop')
    return Complex(out_re, out_im)


_PALLAS_FALLBACK_NOTED = set()


def _note_pallas_fallback(reason):
    """One NOTE per distinct reason per session when the TPU path degrades
    to the serialized XLA scatter (~30x slower at benchmark shapes)."""
    if reason not in _PALLAS_FALLBACK_NOTED:
        _PALLAS_FALLBACK_NOTED.add(reason)
        from ..utils.common import NOTE
        NOTE("TPU Pallas scatter unavailable (%s); falling back to the "
             "serialized XLA scatter — expect a large slowdown." % reason)


def _pallas_enabled(platform=None):
    """(use_pallas, interpret) for the target `platform` — pass the mesh's
    device platform for sharded paths (the global default backend may be a
    TPU tunnel while the mesh is virtual-CPU, and vice versa)."""
    from ..configs import backend, get_config
    cfg = get_config()
    if platform is None:
        on_tpu = backend() == 'tpu'
    else:
        on_tpu = platform not in ('cpu', 'gpu', 'cuda', 'rocm')
    use = cfg.use_pallas and (on_tpu or cfg.pallas_interpret)
    return use, cfg.pallas_interpret


def _dispatch_scatter(vre, vim, k, valid, nbins, natural_bins=None,
                      platform=None):
    use, interp = _pallas_enabled(platform)
    if use:
        try:
            from .ssq_pallas import shift_scatter_pallas
            return shift_scatter_pallas(vre, vim, k, valid, nbins,
                                        natural_bins, interpret=interp)
        except NotImplementedError as e:  # pragma: no cover - safety net
            _note_pallas_fallback(str(e))
    return _scatter_xla(vre, vim, k, valid, nbins)


# --------------------------------------------------------------------------
# fused ssqueeze (traceable)
# --------------------------------------------------------------------------
def ssqueeze_fast(Wx, dWx, ssq_freqs, const, logscale=False, flipud=False,
                  gamma=None, Sfs=None, params=None, out=None,
                  natural_bins=None):
    """Fused phase-transform + bin + scatter-add (reference
    `ssqueeze_fast`, algos.py:126-150). Traceable; 2D (na, n) or batched 3D
    (b, na, n) split-complex inputs."""
    Wx, dWx = as_complex(Wx), as_complex(dWx)
    if params is None:
        params = ssq_bin_params(np.asarray(ssq_freqs), logscale)
    na = Wx.shape[-2]
    nbins = params['omax'] + 1
    dtype = str(Wx.dtype)

    use, interp = _pallas_enabled()
    if use and gamma is not None:
        try:
            from .ssq_pallas import ssq_fused_pallas
            return ssq_fused_pallas(Wx, dWx, const, params, gamma,
                                    flipud, natural_bins, Sfs=Sfs,
                                    interpret=interp)
        except NotImplementedError as e:  # pragma: no cover - safety net
            _note_pallas_fallback(str(e))

    w = _imag_ratio_over_2pi(Wx, dWx)
    if Sfs is None:
        w = jnp.abs(w)
    else:
        shape = [1] * w.ndim
        shape[-2] = -1
        w = jnp.abs(jnp.asarray(Sfs, dtype).reshape(shape) - w)

    valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
    w = jnp.where(valid, w, jnp.inf)
    k, kvalid = compute_bins(w, params, flipud)
    valid = valid & kvalid

    c = _broadcast_const(const, na, dtype)
    vre, vim = Wx.re * c, Wx.im * c

    if vre.ndim == 3:
        return jax.vmap(
            lambda a, b, kk, vv: _dispatch_scatter(a, b, kk, vv, nbins,
                                                   natural_bins)
        )(vre, vim, k, valid)
    return _dispatch_scatter(vre, vim, k, valid, nbins, natural_bins)


def indexed_sum_onfly(Wx, w, ssq_freqs, const=1, logscale=False,
                      flipud=False, out=None, parallel=None, params=None,
                      natural_bins=None):
    """Scatter-add with precomputed phase transform `w` (reference
    `indexed_sum_onfly`, algos.py:153-169)."""
    Wx = as_complex(Wx)
    if params is None:
        params = ssq_bin_params(np.asarray(ssq_freqs), logscale)
    na = Wx.shape[-2]
    nbins = params['omax'] + 1
    dtype = str(Wx.dtype)

    w = jnp.asarray(w)
    k, valid = compute_bins(w, params, flipud)

    c = _broadcast_const(const, na, dtype)
    vre, vim = Wx.re * c, Wx.im * c
    if vre.ndim == 3:
        return jax.vmap(
            lambda a, b, kk, vv: _dispatch_scatter(a, b, kk, vv, nbins,
                                                   natural_bins)
        )(vre, vim, k, valid)
    return _dispatch_scatter(vre, vim, k, valid, nbins, natural_bins)


def indexed_sum(a, k, parallel=None):
    """out[k[i,j], j] += a[i,j] (legacy API; reference algos.py:22-41)."""
    a = as_complex(a)
    k = jnp.asarray(k, jnp.int32)
    valid = jnp.ones(k.shape, bool)
    return _scatter_xla(a.re, a.im, k, valid, a.shape[0]).to_numpy()


# --------------------------------------------------------------------------
# find_closest family (API parity; reference algos.py:254-449)
# --------------------------------------------------------------------------
def find_closest(a, v, logscale=False, parallel=None, smart=None):
    """argmin(|a[i,j] - v|) over v for each element of 2D `a`."""
    a, v = np.asarray(a), np.asarray(v).squeeze()
    if smart is None and parallel is None:
        smart = True
    if smart:
        return (find_closest_smart(np.log2(a), np.log2(v)) if logscale
                else find_closest_smart(a, v))
    if logscale:
        return find_closest_log(a, v)
    return find_closest_lin(a, v)


def find_closest_smart(a, v):
    """Exact argmin via searchsorted (reference algos.py:330-344)."""
    sidx = v.argsort()
    v_s = v[sidx]
    idx = np.searchsorted(v_s, a)
    idx[idx == len(v)] = len(v) - 1
    idx0 = (idx - 1).clip(min=0)
    m = np.abs(a - v_s[idx]) >= np.abs(v_s[idx0] - a)
    m[idx == 0] = 0
    idx[m] -= 1
    return sidx[idx]


def find_closest_brute(a, v):
    """Exhaustive argmin (reference algos.py:320-327)."""
    return np.argmin(np.abs(a[..., None] - v), axis=-1)


def find_closest_log(a, v, parallel=None):
    params = ssq_bin_params(v, logscale=True)
    k, _ = compute_bins(jnp.asarray(a), params)
    return np.asarray(k)


def find_closest_lin(a, v, parallel=None):
    params = ssq_bin_params(v, logscale=False)
    k, _ = compute_bins(jnp.asarray(a), params)
    return np.asarray(k)
