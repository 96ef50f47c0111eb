# -*- coding: utf-8 -*-
"""Second-order synchrosqueezed CWT (WSST2) — BEYOND the reference
library's surface (no analog in /root/reference; method family: Oberlin &
Meignen 2017, "The second-order wavelet synchrosqueezing transform").

First-order reassignment (`ssq_cwt`) estimates the instantaneous
frequency as ``w1 = Im(dWx/Wx)/2pi`` — exact on tones, biased on
modulated components by (chirp rate) x (wavelet duration at that
scale)^2. WSST2 fits a LOCAL COMPLEX LINEAR CHIRP per cell: writing
``x(tau) = exp(p0 + p1 (tau-b) + p2/2 (tau-b)^2)`` (p1, p2 complex —
amplitude drift and chirp rate together), the five wavelet transforms

    W  = x * h            A  = x' * h  = p1 W - p2 B
    B  = x * (t h)        Bd = x' * (t h) = p1 B - p2 C
    C  = x * (t^2 h)

give a closed 2x2 solve: ``p2 = (Bd W - A B)/(B^2 - C W)``,
``p1 = (A + p2 B)/W``, and the corrected estimate is
``w2 = Im(p1)/(2 pi dt)``. Exact on (Gaussian-amplitude) linear chirps
to float precision — asserted in tests/test_ssq_cwt2.py — and reduces
to w1 on tones (the p2 numerator cancels identically). Inversion is
`issq_cwt` unchanged: reassignment only moves energy between rows.

TPU-first execution: all five transforms are rows of ONE filterbank —
the analysis kernels differ only by spectral factors of the SAME
synthesized wavelet (``i xi``, ``i a psih'(a xi)``, ``-a^2 psih''(a
xi)``; the xi-derivatives come from `jax.grad` of the wavelet's
elementwise spectral fn, exact, synthesized in-graph) — so the whole
transform is pad -> half-grid FFT -> bank multiply -> ONE batched
matmul IFFT over 5*na rows -> p2 solve -> reassignment, a single jit
per plan.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import scatter_tile
from ..ops.complexlib import Complex
from ..ops.fft import fft, ifft
from ..ops.pad import padsignal, pad_params
from ..ops.ssq_kernels import indexed_sum_onfly
from ..utils.common import EPS32, EPS64
from ..utils.cwt_utils import _process_fs_and_t
from .wavelets import _xifn
from .cwt import resolve_wavelet, _wavelet_key, _is_analytic
from .ssq_cwt import (_ssq_cwt_plan, _apply_squeezing, _spec_key,
                      _device_plan_arrays)
from .ssqueezing import _check_ssqueezing_args

__all__ = ['ssq_cwt2']


def _wavelet_grad_fns(wavelet):
    """(fn, fn', fn'') of the wavelet's elementwise spectral function.
    The derivative of an elementwise map equals the gradient of its sum,
    so both orders are exact jnp programs (synthesizable in-graph)."""
    fn = wavelet.fn
    g1 = jax.grad(lambda w: jnp.sum(fn(w, xp=jnp)))
    g2 = jax.grad(lambda w: jnp.sum(g1(w)))
    return fn, g1, g2


_SUPPORTS2_CACHE = {}


def _supports_order2(wavelet, dtype):
    """ssq_cwt2 needs an (at least numerically) analytic wavelet with a
    real-valued, jax-differentiable spectral fn. GMW qualifies exactly;
    morlet qualifies numerically (its negative-half magnitude is
    ~1e-39 — below any float's resolution, so the half-grid pipeline is
    exact at f32/f64).

    Memoized per (wavelet, dtype): the probe evaluates grad-of-grad
    EAGERLY, and eager execution dispatches every primitive as its own
    device call — ~120 ms/call through the remote tunnel (measured,
    scripts/tpu_session5e.log: it dwarfed the 18 ms fused kernel)."""
    key = (id(wavelet.fn), dtype)
    hit = _SUPPORTS2_CACHE.get(key)
    if hit is not None:
        return hit[:2]
    out = _supports_order2_probe(wavelet, dtype)
    # hold a strong ref to fn so its id can't be recycled
    _SUPPORTS2_CACHE[key] = out + (wavelet.fn,)
    return out


def _supports_order2_probe(wavelet, dtype):
    if not _is_analytic(wavelet):
        try:
            neg = wavelet.fn(np.linspace(-20., 0., 64), xp=np)
            if (isinstance(neg, tuple)
                    or np.abs(np.asarray(neg)).max() > 1e-12):
                return False, "requires an analytic wavelet"
        except Exception:
            return False, "requires an analytic wavelet"
    try:
        # one jitted dispatch each — eager per-primitive execution costs
        # ~4 ms/op through the device tunnel
        probe = jax.jit(lambda w: wavelet.fn(w, xp=jnp))(
            jnp.ones((2,), dtype))
        if isinstance(probe, tuple):
            return False, "requires a real-valued spectral fn"
        _, g1, g2 = _wavelet_grad_fns(wavelet)
        jax.jit(g2)(jnp.ones((2,), dtype))
    except Exception as e:                             # pragma: no cover
        return False, "spectral fn not differentiable (%s)" % e
    return True, None


def _wsst2_rows(xh, scales_j, fns, n_up, n1, N_out, dt, gamma, dtype,
                tiny):
    """Traceable WSST2 core: half-grid signal spectrum + scale block ->
    (W, w2). Synthesizes the five-kernel filterbank in-graph (psih and
    its grad-derived t/t^2 spectral factors), runs ONE batched IFFT over
    the 5*na rows (out_range = the unpadded emit region), and solves the
    per-cell complex-chirp regression. Shared by the offline fused jit,
    the scale-sharded per-shard body, and the streaming body. `xh` must
    carry a broadcast row axis (..., 1, half); `w2` is physical Hz,
    inf-marked where gamma-gated."""
    fn, g1, g2 = fns
    half = n_up // 2 + 1
    nyq = half - 1
    xi = jnp.asarray(_xifn(1., n_up, np.dtype(dtype)))[:half]
    w_grid = scales_j * xi                              # (na, half)
    psih, dpsih, d2psih = fn(w_grid, xp=jnp), g1(w_grid), g2(w_grid)
    if n_up % 2 == 0:
        # analytic Nyquist-bin halving, applied to the WHOLE kernel
        # family (they are t-weightings of one h) — mirrors cwt_core
        psih = psih.at[..., nyq].divide(2)
        dpsih = dpsih.at[..., nyq].divide(2)
        d2psih = d2psih.at[..., nyq].divide(2)
    tb = scales_j * dpsih                               # a psih'(a xi)
    t2b = (scales_j * scales_j) * d2psih                # a^2 psih''
    # five banks as spectral factors of one synthesized filterbank:
    #   W: psih     A: (i xi) psih     B: i a psih'
    #   Bd: (i xi)(i a psih') = -xi a psih'    C: -a^2 psih''
    b_re = jnp.concatenate([psih * xh.re, -xi * (psih * xh.im),
                            -(tb * xh.im), -xi * (tb * xh.re),
                            -(t2b * xh.re)], axis=-2)
    b_im = jnp.concatenate([psih * xh.im, xi * (psih * xh.re),
                            tb * xh.re, -xi * (tb * xh.im),
                            -(t2b * xh.im)], axis=-2)
    rowsout = ifft(Complex(b_re, b_im), axis=-1, n=n_up,
                   out_range=(n1, n1 + N_out), nonzero_prefix=half)
    na = psih.shape[-2]

    def part(i):
        sl = slice(i * na, (i + 1) * na)
        return Complex(rowsout.re[..., sl, :], rowsout.im[..., sl, :])

    W, A, B, Bd, C = (part(i) for i in range(5))

    def cdiv(a, b):
        d = b.abs2() + tiny
        return Complex((a.re * b.re + a.im * b.im) / d,
                       (a.im * b.re - a.re * b.im) / d)

    p2 = cdiv(Bd * W - A * B, B * B - C * W)
    p1 = cdiv(A + p2 * B, W)
    w2 = jnp.abs(p1.im) / (2 * np.pi * dt)              # physical Hz
    w2 = jnp.where(jnp.isfinite(w2), w2, jnp.inf)
    w2 = jnp.where(W.abs2() > jnp.asarray(gamma, dtype) ** 2, w2,
                   jnp.inf)
    return W, w2


@functools.lru_cache(maxsize=16)
def _ssq_cwt2_jit(wav_key, shape, dtype, n_up, n1, N, is_2d, flipud,
                  squeezing, param_items, gamma, natural_key, wavelet_ref,
                  const_key, padtype, fused_tx, need_w2=False, klims=None,
                  cfg_key=None):
    """Cached fused WSST2 jit: raw signal -> (Tx, Wx, w2). L1-normed
    (the reassignment ratios are norm-invariant; ssq uses L1, matching
    `ssq_cwt`). `fused_tx=False` (callable squeezing) returns
    (None, Wx, w2) for the eager squeeze+scatter path."""
    wavelet = wavelet_ref[0]
    params = dict(param_items)
    natural_bins = (np.asarray(natural_key, np.int32) if natural_key
                    else None)
    half = n_up // 2 + 1
    logscale = params['mode'] != 'lin'
    fn, g1, g2 = _wavelet_grad_fns(wavelet)
    tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)

    # fused Pallas WSST2 (round-5): the five analysis banks synthesize
    # in ONE kernel and the four auxiliary transforms never leave VMEM
    # (ops/cwt_pallas._make_kernel order2 branch); the chirp-corrected
    # bin plane feeds the zero-prep direct scatter. Mirrors ssq_cwt's
    # fast path; XLA path below is the correctness twin and serves
    # get_w / batched / callable-squeezing calls.
    use_fused = False
    if fused_tx and not need_w2 and gamma is not None and not is_2d \
            and padtype is not None and squeezing in (None, 'sum'):
        from ..ops.ssq_kernels import _pallas_enabled
        from ..ops.cwt_pallas import cwt_pallas_applicable
        use_pallas, interp = _pallas_enabled()
        if use_pallas and cwt_pallas_applicable(wavelet, n_up, False):
            na = (len(natural_bins) if natural_bins is not None else 0)
            use_fused = (natural_bins is not None and
                         np.array_equal(natural_bins, np.arange(na)))
    if use_fused:
        from ..ops.cwt_pallas import cwt_fused_bins2_direct
        from ..ops.ssq_pallas import scatter_kv_direct
        from ..configs import get_config
        lowprec = bool(get_config().ssq_lowprec_deriv)
        nbins = params['omax'] + 1
        T_sc = scatter_tile()
        na = len(natural_bins)
        na_pad = -(-na // 32) * 32

        def run(xj, scales_j, dt, const):
            xj = xj.astype(dtype)
            xj = jnp.where(jnp.isfinite(xj), xj, 0)
            xp_pad = padsignal(xj, padtype)
            xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)), axis=-1,
                     out_range=(0, half), imag_zero=True)
            WxF, k, off = cwt_fused_bins2_direct(
                xh, scales_j, wavelet, n_up, n1, N, dt, True, params,
                gamma, flipud, tiny, interpret=interp,
                deriv_lowprec=lowprec, klims=klims, T=T_sc)
            const_pad = jnp.pad(
                jnp.broadcast_to(const.reshape(-1), (na,)),
                (0, na_pad - na))
            TxF = scatter_kv_direct(WxF, k, const_pad, nbins,
                                    interpret=interp, T=T_sc)
            Tx = Complex(TxF.re[:nbins, off:off + N],
                         TxF.im[:nbins, off:off + N])
            Wx = Complex(WxF.re[:na, off:off + N],
                         WxF.im[:na, off:off + N])
            return Tx, Wx, None
        return jax.jit(run)

    def run(xj, scales_j, dt, const):
        xj = xj.astype(dtype)
        xj = jnp.where(jnp.isfinite(xj), xj, 0)
        xp_pad = padsignal(xj, padtype) if padtype is not None else xj
        xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)), axis=-1,
                 out_range=(0, half), imag_zero=True)
        if is_2d:
            xh = Complex(xh.re[:, None], xh.im[:, None])
        W, w2 = _wsst2_rows(xh, scales_j, (fn, g1, g2), n_up, n1, N,
                            dt, gamma, dtype, tiny)
        if not fused_tx:
            return None, W, w2
        Wx_s = _apply_squeezing(W, squeezing)
        Tx = indexed_sum_onfly(Wx_s, w2, None, const, logscale=logscale,
                               flipud=flipud, params=params,
                               natural_bins=natural_bins)
        return Tx, W, w2

    return jax.jit(run)


def ssq_cwt2(x, wavelet='gmw', scales='log-piecewise', nv=None, fs=None,
             t=None, ssq_freqs=None, padtype='reflect', squeezing='sum',
             maprange='peak', gamma=None, astensor=True, flipud=True,
             get_w=False):
    """Second-order synchrosqueezed CWT (WSST2); see module docstring.
    API mirrors `ssq_cwt` (minus difftype/order, which the local
    chirp-regression estimator subsumes). Returns
    (Tx, Wx, ssq_freqs, scales[, w2 if get_w])."""
    xnp = np.asarray(x) if isinstance(x, (list, np.ndarray)) else x
    if xnp.ndim == 2 and get_w:
        raise NotImplementedError("`get_w=True` unsupported with batched "
                                  "input.")
    _check_ssqueezing_args(squeezing, maprange, wavelet, 'trig', None,
                           get_w, transform='cwt')
    if nv is None and not isinstance(scales, np.ndarray):
        nv = 32
    N = xnp.shape[-1]
    dt, fs_, _ = _process_fs_and_t(fs, t, N)
    is_2d = (xnp.ndim == 2)

    wavelet = resolve_wavelet(wavelet, l1_norm=True, N=N)
    from ..configs import device_dtype
    dtype = device_dtype(wavelet.dtype)
    ok, why = _supports_order2(wavelet, dtype)
    if not ok:
        raise NotImplementedError("ssq_cwt2 %s (got %r)"
                                  % (why, getattr(wavelet.fn, 'qualname',
                                                  wavelet.fn)))

    if gamma is None:
        gamma = 10 * (EPS64 if dtype == 'float64' else EPS32)
    gamma = float(gamma)

    was_padded = bool(padtype is not None)
    devkey = None
    skey, fkey = _spec_key(scales), _spec_key(ssq_freqs)
    if (skey is not None and (ssq_freqs is None or fkey is not None) and
            not isinstance(maprange, (tuple, list))):
        devkey = ('ssq2', _wavelet_key(wavelet), N, skey, nv, fkey,
                  maprange, was_padded, float(dt), bool(flipud))
    (scales_np, _, _, ssq_freqs, _, const, params, natural,
     logscale) = _ssq_cwt_plan(wavelet, N, scales, nv, ssq_freqs,
                               maprange, was_padded, dt, flipud)

    if padtype is not None:
        n_up, n1, _ = pad_params(N, padtype)
    else:
        n_up, n1 = N, 0

    xj = (xnp if isinstance(xnp, jax.Array) and str(xnp.dtype) == dtype
          else jnp.asarray(xnp, dtype=dtype))
    sq_str = squeezing if isinstance(squeezing, str) else None
    # stage-1 support pruning for the fused kernel: the wavelet-support
    # row limits, +1 extra K-row margin for the derivative banks (a h',
    # a^2 h'' decay like h times a polynomial — one extra f2-wide row
    # covers the tail extension at f32 resolution)
    from ..ops.cwt_pallas import support_klims
    klims = support_klims(wavelet, scales_np, n_up)
    if klims is not None:
        klims = tuple(int(k) + 1 for k in klims)
    from ..configs import exec_config_key
    runner = _ssq_cwt2_jit(
        _wavelet_key(wavelet), xnp.shape, dtype, n_up, n1, N, is_2d,
        bool(flipud), sq_str, tuple(sorted(params.items())), gamma,
        tuple(natural.tolist()) if natural is not None else None,
        (wavelet,), str(np.asarray(const).shape), padtype,
        fused_tx=(sq_str is not None), need_w2=bool(get_w), klims=klims,
        cfg_key=exec_config_key())
    scales_j, const_j = _device_plan_arrays(devkey, scales_np, const,
                                            dtype)
    from .cwt import _device_scalar
    Tx, Wx, w2 = runner(xj, scales_j, _device_scalar(dt, dtype), const_j)
    if Tx is None:
        # callable squeezing: user fn applied eagerly between the fused
        # chirp-regression estimate and the scatter
        Wx_s = _apply_squeezing(Wx, squeezing)
        Tx = indexed_sum_onfly(Wx_s, w2, None, const_j, logscale=logscale,
                               flipud=flipud, params=params,
                               natural_bins=natural)

    ssq_freqs_out = ssq_freqs[::-1].copy()
    scales_out = scales_np.squeeze()
    if not astensor:
        Tx = Tx.to_numpy()
        Wx = Wx.to_numpy()
    if get_w:
        return Tx, Wx, ssq_freqs_out, scales_out, (
            np.asarray(w2) if not astensor else w2)
    return Tx, Wx, ssq_freqs_out, scales_out
