# -*- coding: utf-8 -*-
"""Order-2 attribution on the real TPU (round-5): where do ssq_cwt2's
~126 ms go? Isolates the fused bins2 kernel vs the scatter, and
measures the displacement statistics of the order-2 k plane (tier-2's
loop bound is max out-of-band cells per column — the chirp-corrected
estimate on noise is the suspected fat tail).
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import _compute_associated_frequencies


def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))


def timeit(fn, warm=2, reps=10):
    for _ in range(warm):
        out = fn()
    first = out[0] if isinstance(out, (tuple, list)) else out
    sync(first.re if hasattr(first, 're') else first)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    first = out[0] if isinstance(out, (tuple, list)) else out
    sync(first.re if hasattr(first, 're') else first)
    return (time.perf_counter() - t0) / reps


def main():
    N = 160000
    wav_spec = ('gmw', {'dtype': 'float32'})
    wav = Wavelet(wav_spec)
    scales = process_scales('log-piecewise', N, wav)[:300]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    sync(x)

    # routing check
    import ssqueezepy_tpu.ops.cwt_pallas as cp
    calls = []
    orig = cp.cwt_fused_bins2_direct
    cp.cwt_fused_bins2_direct = \
        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    t2 = timeit(lambda: stq.ssq_cwt2(x, wav_spec, scales=scales))
    cp.cwt_fused_bins2_direct = orig
    print('ssq_cwt2 full: %.2f ms (fused routed: %s)'
          % (t2 * 1e3, bool(calls)), flush=True)

    t1 = timeit(lambda: stq.ssq_cwt(x, wavelet=wav_spec, scales=scales))
    print('ssq_cwt  full: %.2f ms' % (t1 * 1e3), flush=True)

    # isolated kernels on a precomputed spectrum
    from ssqueezepy_tpu.ops.fft import fft as _fft
    from ssqueezepy_tpu.ops.pad import padsignal, pad_params
    from ssqueezepy_tpu.ops.cwt_pallas import (
        cwt_fused_bins_direct, cwt_fused_bins2_direct, support_klims)
    from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
    from ssqueezepy_tpu.ops.complexlib import Complex
    from ssqueezepy_tpu.models.ssq_cwt import _ssq_cwt_plan

    (scales_np, _, _, ssq_freqs, _, const, params, natural,
     logscale) = _ssq_cwt_plan(wav, N, scales, None, None, 'peak', True,
                               1.0, True)
    n_up, n1, _ = pad_params(N, 'reflect')
    half = n_up // 2 + 1
    klims = support_klims(wav, scales_np, n_up)
    klims2 = tuple(int(k) + 1 for k in klims) if klims else None
    gamma = float(10 * np.finfo(np.float32).eps)
    tiny = float(np.finfo(np.float32).tiny * 1e3)
    scales_j = jnp.asarray(scales_np, 'float32')

    @jax.jit
    def spec(xj):
        xp = padsignal(xj, 'reflect')
        return _fft(Complex(xp, jnp.zeros_like(xp)), axis=-1,
                    out_range=(0, half), imag_zero=True)

    xh = spec(x)
    sync(xh.re)

    k1 = jax.jit(lambda h: cwt_fused_bins_direct(
        h, scales_j, wav, n_up, n1, N, 1.0, True, params, gamma, True,
        deriv_lowprec=True, klims=klims, T=1024)[:2])
    tk1 = timeit(lambda: k1(xh))
    print('bins1 kernel: %.2f ms' % (tk1 * 1e3), flush=True)

    k2 = jax.jit(lambda h: cwt_fused_bins2_direct(
        h, scales_j, wav, n_up, n1, N, 1.0, True, params, gamma, True,
        tiny, deriv_lowprec=True, klims=klims2, T=1024)[:2])
    tk2 = timeit(lambda: k2(xh))
    print('bins2 kernel: %.2f ms' % (tk2 * 1e3), flush=True)

    # displacement statistics of both k planes (tier-2 driver)
    def devstats_fn(order):
        @jax.jit
        def f(h):
            if order == 1:
                _, kk, _ = cwt_fused_bins_direct(
                    h, scales_j, wav, n_up, n1, N, 1.0, True, params,
                    gamma, True, deriv_lowprec=True, klims=klims, T=1024)
            else:
                _, kk, _ = cwt_fused_bins2_direct(
                    h, scales_j, wav, n_up, n1, N, 1.0, True, params,
                    gamma, True, tiny, deriv_lowprec=True, klims=klims2,
                    T=1024)
            kk = kk.astype(jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, kk.shape, 0)
            act = kk >= 0
            dev = jnp.where(act, kk - rows, 0)
            oob = act & (jnp.abs(dev) > 24)
            frac_act = act.mean()
            frac_oob = oob.sum() / jnp.maximum(act.sum(), 1)
            max_col = jnp.max(oob.sum(0))
            return (frac_act.astype(jnp.float32),
                    frac_oob.astype(jnp.float32), max_col)
        return f

    for order in (1, 2):
        fa, fo, mc = (np.asarray(v) for v in devstats_fn(order)(xh))
        print('order-%d k: active %.3f  oob>24 frac %.5f  '
              'max-oob/col %d' % (order, fa, fo, mc), flush=True)

    # FSST2 (routing + timing)
    import ssqueezepy_tpu.ops.stft_conv as sc
    calls2 = []
    orig2 = sc.fsst2_pallas_rows
    sc.fsst2_pallas_rows = \
        lambda *a, **kw: (calls2.append(1), orig2(*a, **kw))[1]
    ts2 = timeit(lambda: stq.ssq_stft2(x, n_fft=598))
    sc.fsst2_pallas_rows = orig2
    print('ssq_stft2 full: %.2f ms (fused routed: %s, '
          'vs ref 1st-order GPU 159 ms: %.2fx)'
          % (ts2 * 1e3, bool(calls2), 0.159 / ts2), flush=True)

    print('ORDER2-PROF-DONE', flush=True)


if __name__ == '__main__':
    main()
