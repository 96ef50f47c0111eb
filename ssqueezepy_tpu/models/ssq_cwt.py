# -*- coding: utf-8 -*-
"""Synchrosqueezed CWT (forward & inverse) — the flagship transform.

Behavioral reference: `/root/reference/ssqueezepy/_ssq_cwt.py` (ssq_cwt
:12, issq_cwt :313, _invert_components :381, phase transforms :420-589).
TPU-native architecture: the full forward path — padding, filterbank
synthesis, FFT convolution (matmul FFT engine), frequency-domain
derivative, phase transform, and the reassignment scatter — is fused into
ONE jit-compiled program per plan; all scale/frequency bookkeeping is
resolved on host at plan time.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import scatter_tile
from ..ops.complexlib import Complex, as_complex
from ..ops.pad import padsignal, pad_params
from ..ops.phase import phase_cwt, phase_cwt_num
from ..ops.ssq_kernels import ssqueeze_fast, indexed_sum_onfly, \
    ssq_bin_params
from ..ops.diff import trigdiff
from ..utils.common import EPS32, EPS64, p2up
from ..utils.cwt_utils import (process_scales, adm_ssq, _process_fs_and_t)
from .wavelets import Wavelet
from .cwt import cwt, cwt_core, _process_gmw_wavelet, _wavelet_key
from ..ops.cwt_pallas import support_klims
from .ssqueezing import (ssqueeze, _check_ssqueezing_args,
                         _compute_associated_frequencies, _natural_bins)

__all__ = ['ssq_cwt', 'issq_cwt']


@functools.lru_cache(maxsize=32)
def _ssq_cwt_jit(wav_key, shape, dtype, n_up, n1, N, l1_norm, is_2d,
                 flipud, squeezing, param_items, gamma, Sfs_none,
                 natural_key, wavelet_ref, const_key, padtype='reflect',
                 deriv_lowprec=False, klims=None, get_Wx=True,
                 cfg_key=None):
    """Cached fused jit: RAW signal -> (Tx, Wx, dWx). NaN scrub and
    padding run inside the jit (eager device ops cost a full dispatch
    round trip each on the tunneled backend)."""
    wavelet = wavelet_ref[0]
    params = dict(param_items)
    natural_bins = np.asarray(natural_key, np.int32) if natural_key \
        else None

    # bins path: the CWT kernel emits (Wx, k) directly — the derivative
    # planes never round-trip HBM and the scatter consumes k. Only when
    # the caller does not need dWx back (deriv_lowprec implies that) and
    # the fused CWT kernel covers this configuration.
    use_bins = False
    if deriv_lowprec and gamma is not None:
        from ..ops.ssq_kernels import _pallas_enabled
        from ..ops.cwt_pallas import cwt_pallas_applicable
        from .cwt import _is_analytic
        use_pallas, interp = _pallas_enabled()
        if use_pallas and cwt_pallas_applicable(wavelet, n_up, is_2d) \
                and _is_analytic(wavelet) and padtype is not None:
            psih_probe = wavelet.fn(jnp.zeros((1,), dtype), xp=jnp)
            use_bins = not isinstance(psih_probe, tuple)

    if use_bins:
        from ..ops.fft import fft as _fft
        from ..ops.cwt_pallas import cwt_fused_bins_pallas
        from ..ops.ssq_pallas import scatter_kv_pallas
        half = n_up // 2 + 1
        nbins = params['omax'] + 1
        na = len(natural_bins) if natural_bins is not None else None

        # zero-prep direct pipeline (round-4): the CWT kernel emits the
        # scatter's exact layout (32-rounded rows, T-rounded width,
        # int16 k with -1 invalid marking), so the XLA pad+gather prep
        # pass (~4.5 ms at the bench shape, PROFILE.md round-4
        # calibration) never runs. Applies when the rows are already in
        # natural-bin order (identity placement — true for the library's
        # own CWT ssq grids) and squeezing is plain 'sum'.
        # (batched variant measured and rejected: lax.map of this body
        # over B=4 costs 47.5 ms/transform vs the legacy batched path's
        # 32.2 — sequential per-signal grids pipeline worse than the
        # batched kernels + vmapped scatter; scripts/tpu_session5g.log)
        use_direct = (not is_2d and squeezing in (None, 'sum')
                      and natural_bins is not None
                      and np.array_equal(natural_bins, np.arange(na)))
        T_sc = scatter_tile()
        if use_direct:
            from ..ops.cwt_pallas import cwt_fused_bins_direct
            from ..ops.ssq_pallas import scatter_kv_direct
            na_pad = -(-na // 32) * 32

            def run(xj, scales_j, dt, const):
                xj = xj.astype(dtype)
                xj = jnp.where(jnp.isfinite(xj), xj, 0)
                xp_pad = padsignal(xj, padtype)
                xh = _fft(Complex(xp_pad, jnp.zeros_like(xp_pad)),
                          axis=-1, out_range=(0, half), imag_zero=True)
                WxF, k, off = cwt_fused_bins_direct(
                    xh, scales_j, wavelet, n_up, n1, N, dt, l1_norm,
                    params, gamma, flipud, interpret=interp,
                    deriv_lowprec=True, klims=klims, T=T_sc)
                # const is per-scale (log-piecewise) or a broadcast
                # scalar ('log'/'linear' grids) — the scatter wants one
                # entry per padded row (0 = dummy tail)
                const_pad = jnp.pad(
                    jnp.broadcast_to(const.reshape(-1), (na,)),
                    (0, na_pad - na))
                TxF = scatter_kv_direct(WxF, k, const_pad, nbins,
                                        interpret=interp, T=T_sc)
                Tx = Complex(TxF.re[:nbins, off:off + N],
                             TxF.im[:nbins, off:off + N])
                if not get_Wx:
                    return Tx, None, None
                Wx = Complex(WxF.re[:na, off:off + N],
                             WxF.im[:na, off:off + N])
                return Tx, Wx, None
            return jax.jit(run)

        def run(xj, scales_j, dt, const):
            xj = xj.astype(dtype)
            xj = jnp.where(jnp.isfinite(xj), xj, 0)
            xp_pad = padsignal(xj, padtype)
            xh = _fft(Complex(xp_pad, jnp.zeros_like(xp_pad)), axis=-1,
                      out_range=(0, half), imag_zero=True)
            Wx, k = cwt_fused_bins_pallas(
                xh, scales_j, wavelet, n_up, n1, N, dt, l1_norm, params,
                gamma, flipud, interpret=interp, deriv_lowprec=True,
                klims=klims)
            Wx_s = _apply_squeezing(Wx, squeezing)
            Tx = scatter_kv_pallas(Wx_s, k, const, nbins,
                                   natural_bins=natural_bins,
                                   interpret=interp, T=T_sc)
            return Tx, Wx, None
        return jax.jit(run)

    def run(xj, scales_j, dt, const):
        xj = xj.astype(dtype)
        xj = jnp.where(jnp.isfinite(xj), xj, 0)
        xp_pad = padsignal(xj, padtype) if padtype is not None else xj
        Wx, dWx = cwt_core(xp_pad, wavelet, scales_j, dt, True, l1_norm,
                           n1, N, rpadded=False, is_2d=is_2d,
                           deriv_lowprec=deriv_lowprec, klims=klims)
        if squeezing in (None, 'sum'):
            Tx = ssqueeze_fast(Wx, dWx, None, const,
                               logscale=params['mode'] != 'lin',
                               flipud=flipud, gamma=gamma, Sfs=None,
                               params=params, natural_bins=natural_bins)
        else:
            # phase/bins from RAW Wx; squeeze only the scattered values
            # (the bins kernel does the same — ADVICE r2)
            w = phase_cwt(Wx, dWx, 'trig', gamma)
            Wx_s = _apply_squeezing(Wx, squeezing)
            Tx = indexed_sum_onfly(Wx_s, w, None, const,
                                   logscale=params['mode'] != 'lin',
                                   flipud=flipud, params=params,
                                   natural_bins=natural_bins)
        return Tx, Wx, dWx
    return jax.jit(run)


_DEV_CACHE = {}


def _device_plan_arrays(key, scales_np, const, dtype):
    """Per-plan device copies of (scales, const) so repeat calls skip the
    host->device transfers."""
    if key is not None:
        hit = _DEV_CACHE.get((key, dtype))
        if hit is not None:
            return hit
    out = (jnp.asarray(scales_np, dtype=dtype),
           jnp.asarray(np.asarray(const, dtype), dtype=dtype))
    if key is not None:
        _DEV_CACHE[(key, dtype)] = out
    return out


_PLAN_CACHE = {}
_RUNNER_CACHE = {}


def _spec_key(spec):
    """Hashable key for a scales/ssq_freqs spec: strings pass through,
    arrays key by content hash (the reference's own benchmark passes
    precomputed scale arrays — rebuilding the plan per call costs more
    than the 10k transform itself)."""
    if spec is None or isinstance(spec, str):
        return spec
    if isinstance(spec, np.ndarray):
        return ('nd', hash(spec.tobytes()), spec.shape, str(spec.dtype))
    return None


def _ssq_cwt_plan(wavelet, N, scales, nv, ssq_freqs, maprange, was_padded,
                  dt, flipud):
    """Host-side plan: scales, ssq frequency grid, squeeze constant, bin
    params, natural bins. Memoized for string AND array specs — the
    scale-bound searches and center-frequency integrals cost ~100ms+ per
    call otherwise."""
    skey, fkey = _spec_key(scales), _spec_key(ssq_freqs)
    cacheable = (skey is not None and
                 (ssq_freqs is None or fkey is not None) and
                 not isinstance(maprange, (tuple, list)))
    key = None
    if cacheable:
        from .cwt import _wavelet_key
        key = (_wavelet_key(wavelet), N, skey, nv, fkey, maprange,
               was_padded, float(dt), bool(flipud))
        hit = _PLAN_CACHE.get(key)
        if hit is not None:
            return hit
        if isinstance(scales, str) and (ssq_freqs is None or
                                        isinstance(ssq_freqs, str)):
            # disk layer (wisdom analog): restores the full numeric plan
            # across sessions (utils/plan_cache.py)
            from ..utils.plan_cache import disk_memo
            out = disk_memo(
                ('ssq_cwt_plan',) + key, lambda: _build_ssq_cwt_plan(
                    wavelet, N, scales, nv, ssq_freqs, maprange,
                    was_padded, dt, flipud))
        else:
            out = _build_ssq_cwt_plan(wavelet, N, scales, nv, ssq_freqs,
                                      maprange, was_padded, dt, flipud)
        _PLAN_CACHE[key] = out
        return out
    return _build_ssq_cwt_plan(wavelet, N, scales, nv, ssq_freqs, maprange,
                               was_padded, dt, flipud)


def _build_ssq_cwt_plan(wavelet, N, scales, nv, ssq_freqs, maprange,
                        was_padded, dt, flipud):
    scales_np, cwt_scaletype, _, nv_ = process_scales(
        scales, N, wavelet, nv=nv, get_params=True)

    if ssq_freqs is None:
        ssq_freqs = cwt_scaletype
    if not isinstance(ssq_freqs, np.ndarray):
        ssq_scaletype = ssq_freqs if isinstance(ssq_freqs, str) \
            else cwt_scaletype
        if ((maprange == 'maximal' or isinstance(maprange, tuple)) and
                ssq_scaletype == 'log-piecewise'):
            raise ValueError("can't have `ssq_scaletype = log-piecewise` "
                             "with `maprange = 'maximal'`")
        ssq_freqs = _compute_associated_frequencies(
            scales_np, N, wavelet, ssq_scaletype, maprange, was_padded, dt,
            'cwt')
    else:
        from ..utils.cwt_utils import infer_scaletype
        ssq_scaletype, _ = infer_scaletype(ssq_freqs)

    # squeeze constant (reference ssqueezing.py:124-132). For
    # log-piecewise scales `nv` is a per-row array (downsampled high
    # scales carry 1/downsample the voices -> 4x the weight), matching
    # the reference's re-inference inside `ssqueeze` (ssqueezing.py:169).
    if cwt_scaletype == 'log-piecewise':
        from ..utils.cwt_utils import nv_from_scales
        const = np.log(2) / nv_from_scales(scales_np)
    elif cwt_scaletype.startswith('log'):
        const = np.log(2) / nv_
    else:
        const = ((scales_np[1] - scales_np[0]) / scales_np).squeeze()

    logscale = ssq_scaletype.startswith('log')
    params = ssq_bin_params(ssq_freqs, logscale)
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, flipud,
                            len(scales_np), dt)

    return (scales_np, cwt_scaletype, nv_, ssq_freqs, ssq_scaletype, const,
            params, natural, logscale)


def _apply_squeezing(Wx, squeezing):
    if squeezing == 'sum' or squeezing is None:
        return Wx
    if squeezing == 'lebesgue':
        ones = jnp.ones(Wx.shape, Wx.dtype) / Wx.shape[-2]
        return Complex(ones, jnp.zeros_like(ones))
    if squeezing == 'abs':
        return Complex(Wx.abs(), jnp.zeros_like(Wx.re))
    return as_complex(squeezing(Wx))


def ssq_cwt(x, wavelet='gmw', scales='log-piecewise', nv=None, fs=None,
            t=None, ssq_freqs=None, padtype='reflect', squeezing='sum',
            maprange='peak', difftype='trig', difforder=None, gamma=None,
            vectorized=True, preserve_transform=None, astensor=True,
            order=0, nan_checks=None, patience=0, flipud=True,
            cache_wavelet=None, get_w=False, get_dWx=False, get_Wx=True):
    """Synchrosqueezed Continuous Wavelet Transform.

    API parity with reference `ssq_cwt` (_ssq_cwt.py:12-310). Returns
    (Tx, Wx, ssq_freqs, scales[, w][, dWx]). With `astensor=True` complex
    outputs are split-complex `Complex` device arrays; else numpy complex.
    """
    from ..ops.fft import _note_patience
    _note_patience(patience)
    xnp = np.asarray(x) if isinstance(x, (list, np.ndarray)) else x
    if xnp.ndim == 2 and get_w:
        raise NotImplementedError("`get_w=True` unsupported with batched "
                                  "input.")
    difforder = _check_ssqueezing_args(squeezing, maprange, wavelet,
                                       difftype, difforder, get_w,
                                       transform='cwt')
    if nv is None and not isinstance(scales, np.ndarray):
        nv = 32
    N = xnp.shape[-1]
    dt, fs_, _ = _process_fs_and_t(fs, t, N)
    is_2d = (xnp.ndim == 2)

    from .cwt import resolve_wavelet
    wavelet = resolve_wavelet(wavelet, l1_norm=True, N=N)
    from ..configs import device_dtype, get_config
    dtype = device_dtype(wavelet.dtype)

    # gamma default: 10 * machine epsilon (reference _ssq_cwt.py:266-267)
    if gamma is None:
        gamma = 10 * (EPS64 if dtype == 'float64' else EPS32)
    gamma = float(gamma)

    was_padded = bool(padtype is not None)
    devkey = None
    skey, fkey = _spec_key(scales), _spec_key(ssq_freqs)
    if (skey is not None and (ssq_freqs is None or fkey is not None) and
            not isinstance(maprange, (tuple, list))):
        devkey = (_wavelet_key(wavelet), N, skey, nv, fkey,
                  maprange, was_padded, float(dt), bool(flipud))
    (scales_np, cwt_scaletype, nv_, ssq_freqs, ssq_scaletype, const,
     params, natural, logscale) = _ssq_cwt_plan(
        wavelet, N, scales, nv, ssq_freqs, maprange, was_padded, dt,
        flipud)

    # higher-order / explicit-w / callable-squeezing paths take the
    # compositional (slower) route
    if (isinstance(order, (tuple, list, range)) or order > 0 or get_w or
            difftype != 'trig' or
            not (squeezing is None or isinstance(squeezing, str))):
        out = _ssq_cwt_compositional(
            xnp, wavelet, scales_np, cwt_scaletype, nv_, fs_, dt, ssq_freqs,
            padtype, squeezing, maprange, difftype, difforder, gamma,
            preserve_transform, astensor, order, flipud, get_w, get_dWx,
            const, params, natural, logscale, is_2d, N)
        if not get_Wx:
            out = (out[0], None) + tuple(out[2:])
        return out

    # ---- fused fast path --------------------------------------------------
    if padtype is not None:
        n_up, n1, _ = pad_params(N, padtype)
    else:
        n_up, n1 = N, 0

    if isinstance(xnp, (jnp.ndarray, jax.Array)) \
            and str(xnp.dtype) == dtype:
        xj = xnp                        # already device-resident
    else:
        xj = jnp.asarray(xnp, dtype=dtype)

    lowprec = (not get_dWx and get_config().ssq_lowprec_deriv)
    # whole-call memo: rebuilding the jit-cache key (param/natural-bin
    # tuples, klims) costs ~0.5 ms/call — a visible slice of a small-N
    # repeated call (the reference benchmark's own protocol)
    from ..configs import exec_config_key
    cfg_key = exec_config_key()
    callkey = ((devkey, xnp.shape, dtype, padtype, squeezing, gamma,
                lowprec, get_Wx, cfg_key) if devkey is not None else None)
    hit = _RUNNER_CACHE.get(callkey) if callkey is not None else None
    if hit is not None:
        runner, scales_j, const_j = hit
    else:
        runner = _ssq_cwt_jit(
            _wavelet_key(wavelet), xnp.shape, dtype, n_up, n1, N, True,
            is_2d, bool(flipud),
            squeezing if isinstance(squeezing, str) else None,
            tuple(sorted(params.items())), gamma, True,
            tuple(natural.tolist()) if natural is not None else None,
            (wavelet,), str(np.asarray(const).shape), padtype,
            # dWx feeds only the reassignment bin index unless the caller
            # asked for it back: run its IFFT pipeline in single-pass bf16
            # (see ops/cwt_pallas._dot_lo; +-1-bin criterion); opt out via
            # configure(ssq_lowprec_deriv=False)
            deriv_lowprec=lowprec,
            # per-scale stage-1 support pruning (exact at f32)
            klims=support_klims(wavelet, scales_np, n_up),
            get_Wx=get_Wx, cfg_key=cfg_key)
        scales_j, const_j = _device_plan_arrays(devkey, scales_np, const,
                                                dtype)
        if callkey is not None:
            _RUNNER_CACHE[callkey] = (runner, scales_j, const_j)
    from .cwt import _device_scalar
    Tx, Wx, dWx = runner(xj, scales_j, _device_scalar(dt, dtype), const_j)
    if not get_Wx:
        # uniform contract: Tx-only requested -> Wx is None on every
        # path (the direct pipeline also skips computing the Wx slice)
        Wx = None

    # for CWT, ssq_freqs are always returned reversed (reference
    # ssqueezing.py:217-222: flips when `(cwt and not flipud) or flipud`)
    ssq_freqs_out = ssq_freqs[::-1].copy()

    scales_out = scales_np.squeeze()
    if not astensor:
        Tx = Tx.to_numpy()
        Wx = Wx.to_numpy() if Wx is not None else None
        dWx = dWx.to_numpy() if dWx is not None else None
    if get_dWx:
        return Tx, Wx, ssq_freqs_out, scales_out, dWx
    return Tx, Wx, ssq_freqs_out, scales_out


def _ssq_cwt_compositional(xnp, wavelet, scales_np, cwt_scaletype, nv, fs,
                           dt, ssq_freqs, padtype, squeezing, maprange,
                           difftype, difforder, gamma, preserve_transform,
                           astensor, order, flipud, get_w, get_dWx, const,
                           params, natural, logscale, is_2d, N):
    """Slower compositional path for higher-order CWT / explicit phase
    transform (difftype != 'trig' or get_w=True); mirrors reference
    _ssq_cwt.py:228-310."""
    if isinstance(order, (tuple, list, range)) or order > 0:
        kw = dict(wavelet=wavelet, scales=scales_np, fs=fs, nv=nv,
                  l1_norm=True, derivative=False, padtype=padtype,
                  rpadded=True, astensor=True)
        _, n1, _ = p2up(N)
        average = isinstance(order, (tuple, list, range))
        Wx, _ = cwt(xnp, order=order, average=average, **kw)
        dWx = trigdiff(Wx, fs, rpadded=True, N=N, n1=n1)
        Wx = Wx[..., n1:n1 + N]
    else:
        rpadded = (difftype == 'numeric')
        Wx, _, dWx = cwt(xnp, wavelet, scales=scales_np, fs=fs, nv=nv,
                         l1_norm=True, derivative=True, padtype=padtype,
                         rpadded=rpadded, astensor=True)

    w = None
    if get_w:
        if difftype == 'trig':
            w = phase_cwt(Wx, dWx, 'trig', gamma)
        elif difftype == 'phase':
            w = phase_cwt(Wx, None, 'phase', gamma)
        else:  # numeric
            _, n1, _ = p2up(N)
            Wx = Wx[..., (n1 - 4):(n1 + N + 4)]
            w = phase_cwt_num(Wx, dt, difforder, gamma)
        _dWx = None
    else:
        _dWx = dWx

    Wx_s = _apply_squeezing(Wx, squeezing)
    if w is None and (squeezing is None or squeezing == 'sum'):
        Tx = ssqueeze_fast(Wx_s, _dWx, None, const, logscale, flipud,
                           gamma, params=params, natural_bins=natural)
    else:
        # non-'sum' squeezing: bins must come from the RAW transform
        w_bins = w if w is not None else phase_cwt(Wx, _dWx, 'trig', gamma)
        Tx = indexed_sum_onfly(Wx_s, w_bins, None, const, logscale, flipud,
                               params=params, natural_bins=natural)

    if difftype == 'numeric':
        Wx = Wx[..., 4:-4]
        Tx = Tx[..., 4:-4]
        w = w[..., 4:-4] if w is not None else None

    ssq_freqs_out = np.asarray(ssq_freqs)[::-1].copy()
    scales_out = np.asarray(scales_np).squeeze()

    if not astensor:
        Tx = Tx.to_numpy() if isinstance(Tx, Complex) else Tx
        Wx = Wx.to_numpy() if isinstance(Wx, Complex) else Wx
        dWx = dWx.to_numpy() if isinstance(dWx, Complex) else dWx
        w = np.asarray(w) if w is not None else None

    out = [Tx, Wx, ssq_freqs_out, scales_out]
    if get_w:
        out.append(w)
    if get_dWx:
        out.append(dWx)
    return tuple(out)


def issq_cwt(Tx, wavelet='gmw', cc=None, cw=None):
    """Inverse synchrosqueezed CWT: full inversion
    ``x = Re(sum(Tx, axis=0)) * 2/Css`` or masked per-component inversion.
    Reference _ssq_cwt.py:313-417."""
    cc, cw, full_inverse = _process_component_inversion_args(cc, cw)

    if full_inverse:
        if isinstance(Tx, Complex):
            # device-side reduction: fetch only the (N,) result, not the
            # full (na, N) transform (host transfers dominate otherwise)
            x = np.asarray(jax.jit(lambda t: t.sum(axis=-2))(Tx.re))
        else:
            x = np.asarray(Tx).real.sum(axis=-2)
    else:
        x = _invert_components(Tx, cc, cw)

    wavelet = Wavelet._init_if_not_isinstance(wavelet)
    Css = adm_ssq(wavelet)
    return x * (2 / Css)


def _invert_components(Tx, cc, cw):
    """Masked per-component inversion: component `n` collects the rows in
    the band ``[cc[:, n] - cw[:, n], cc[:, n] + cw[:, n]]`` at each time
    step (``cc == -1`` marks no-curve columns, which contribute nothing);
    the final output row is the residual — everything no component's band
    touched. Matches reference semantics (_ssq_cwt.py:381-403) as ONE
    device reduction per call: band membership is a broadcast row-range
    compare (the ridge-extraction mask pattern), so only the
    (n_components + 1, N) result crosses the host boundary.
    """
    if isinstance(Tx, Complex):
        # device-resident input: one jit, only the result crosses to host
        na = Tx.shape[0]

        @jax.jit
        def run(Txr, cc, cw):
            rows = jnp.arange(na).reshape(1, na, 1)        # (1, na, 1)
            hi = jnp.clip(cc + cw, 0, na).T[:, None, :]    # (nc, 1, N)
            lo = jnp.clip(cc - cw, 0, na).T[:, None, :]
            miss = (cc == -1).T[:, None, :]
            band = (rows >= lo) & (rows <= hi) & ~miss     # (nc, na, N)
            comps = jnp.sum(Txr[None] * band, axis=1)      # (nc, N)
            resid = jnp.sum(Txr * ~jnp.any(band, axis=0), axis=0)
            return jnp.concatenate([comps, resid[None]], axis=0)

        return np.asarray(run(Tx.re, jnp.asarray(cc, jnp.int32),
                              jnp.asarray(cw, jnp.int32)))

    # numpy input: stay on host (a device round-trip of the full plane
    # costs more than the reduction); one broadcast band per component
    Txr = np.asarray(Tx).real
    na, N = Txr.shape
    rows = np.arange(na).reshape(na, 1)
    out = np.zeros((cc.shape[1] + 1, N), Txr.dtype)
    covered = np.zeros((na, N), bool)
    for n in range(cc.shape[1]):
        hi = np.clip(cc[:, n] + cw[:, n], 0, na)
        lo = np.clip(cc[:, n] - cw[:, n], 0, na)
        band = (rows >= lo) & (rows <= hi) & (cc[:, n] != -1)
        out[n] = np.einsum('rt,rt->t', Txr, band.astype(Txr.dtype))
        covered |= band
    out[-1] = np.where(covered, 0, Txr).sum(axis=0)
    return out


def _process_component_inversion_args(cc, cw):
    if (cc is None) and (cw is None):
        return cc, cw, True
    if cc.ndim == 1:
        cc = cc.reshape(-1, 1)
    if cw.ndim == 1:
        cw = cw.reshape(-1, 1)
    return cc.astype('int32'), cw.astype('int32'), False
