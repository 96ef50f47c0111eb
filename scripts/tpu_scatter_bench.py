# -*- coding: utf-8 -*-
"""Time scatter_kv_pallas alone on the real benchmark planes (Wx, k from
the 160k x 300 ssq_cwt bins pipeline). Isolates the reassignment stage
for kernel A/B work.

Usage: python scripts/tpu_scatter_bench.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.fft import fft
from ssqueezepy_tpu.ops.pad import padsignal, pad_params
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.models.cwt import _process_gmw_wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales, nv_from_scales
from ssqueezepy_tpu.models.ssqueezing import (_compute_associated_frequencies,
                                              _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_bins_pallas,
                                           support_klims)
from ssqueezepy_tpu.ops.ssq_pallas import scatter_kv_pallas


def bench(f, *a, n=10):
    y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def main():
    N = 160000
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)

    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales_np = process_scales('log-piecewise', N, wavelet, nv=32)
    n_up, n1, _ = pad_params(N, 'reflect')
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    const = np.log(2) / nv_from_scales(scales_np)
    params = ssq_bin_params(ssq_freqs, True)
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True,
                            len(scales_np), 1.0)
    gamma = float(10 * np.finfo(np.float32).eps)
    klims = support_klims(wavelet, scales_np, n_up)
    nbins = params['omax'] + 1
    half = n_up // 2 + 1

    xp = padsignal(jnp.asarray(x), 'reflect')
    scales_j = jnp.asarray(scales_np, jnp.float32)
    const_j = jnp.asarray(np.asarray(const, np.float32))

    Wx, k = jax.jit(lambda xp, s: cwt_fused_bins_pallas(
        fft(Complex(xp, jnp.zeros_like(xp)), axis=-1, out_range=(0, half),
            imag_zero=True),
        s, wavelet, n_up, n1, N, 1.0, True, dict(params), gamma, True,
        deriv_lowprec=True, klims=klims))(xp, scales_j)
    _ = np.asarray(Wx.re.ravel()[0:1])
    print('planes ready: Wx %s k %s nbins=%d' % (Wx.shape, k.shape, nbins),
          flush=True)

    nat = np.asarray(natural, np.int32) if natural is not None else None

    # displacement-deviation distribution: dev = k - natural_bin(row)
    # (after the kernel's row pre-permutation this is the tier-1 span
    # driver; sets _BAND/_GROUP). Host fetch of the int32 k plane is slow
    # through the tunnel -> sample columns.
    k_host = np.asarray(jax.device_get(k[:, ::37]))
    if nat is not None:
        dev = np.where(k_host >= 0, k_host - nat.reshape(-1, 1), 1 << 20)
        valid = dev != (1 << 20)
        av = np.abs(dev[valid])
        print('dev distribution (valid %.1f%%): P(|dev|<=4)=%.4f '
              '<=8: %.4f <=16: %.4f <=24: %.4f <=32: %.4f max=%d'
              % (100 * valid.mean(), (av <= 4).mean(), (av <= 8).mean(),
                 (av <= 16).mean(), (av <= 24).mean(), (av <= 32).mean(),
                 av.max()), flush=True)
        # per-column out-of-band counts at candidate bands
        for band in (8, 16, 24):
            ob = ((np.abs(dev) > band) & valid).sum(axis=0)
            print('band %2d: outliers/col mean %.2f max %d' %
                  (band, ob.mean(), ob.max()), flush=True)

    def f_kv(Wr, Wi, kk, const):
        Tx = scatter_kv_pallas(Complex(Wr, Wi), kk, const, nbins,
                               natural_bins=nat)
        return Tx.re
    t = bench(jax.jit(f_kv), Wx.re, Wx.im, k, const_j)
    print('scatter_kv[group] : %.4f s' % t, flush=True)

    # ('static' tier-1 A/B removed in round 4 — the mode lost end-to-end
    # and was pruned from the product; scripts/tpu_scatter_ablate.py
    # keeps a self-contained copy of all measured variants.)

    # column-sum sanity vs XLA reference
    from ssqueezepy_tpu.ops.ssq_kernels import _scatter_xla
    Tx_p = jax.jit(f_kv)(Wx.re, Wx.im, k, const_j)
    ref = jax.jit(lambda Wr, Wi, kk, c: _scatter_xla(
        Wr * c.reshape(-1, 1), Wi * c.reshape(-1, 1), kk,
        (kk >= 0) & (kk < nbins), nbins).re)(Wx.re, Wx.im, k, const_j)
    cs_p = jax.jit(lambda a: a.sum(axis=0))(Tx_p)
    cs_r = jax.jit(lambda a: a.sum(axis=0))(ref)
    d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(cs_p, cs_r)
    print('colsum max |pallas - xla|: %.3e' % float(np.asarray(d)),
          flush=True)


if __name__ == '__main__':
    main()
