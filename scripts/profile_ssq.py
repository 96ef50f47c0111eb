# -*- coding: utf-8 -*-
"""Stage-level profiling of the 160k x 300 ssq_cwt pipeline on TPU.

Each stage is jitted with outputs reduced to scalars on-device so the
timing excludes host transfers (axon tunnel: block_until_ready does not
sync; a scalar fetch does).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.fft import fft, ifft
from ssqueezepy_tpu.ops.pad import padsignal, pad_params
from ssqueezepy_tpu.models.wavelets import Wavelet, _xifn
from ssqueezepy_tpu.models.cwt import cwt_core, _process_gmw_wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales, nv_from_scales
from ssqueezepy_tpu.models.ssqueezing import (_compute_associated_frequencies,
                                              _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssqueeze_fast, ssq_bin_params


def bench(f, *a, n=10):
    def sync(y):
        leaves = jax.tree.leaves(y)
        _ = np.asarray(leaves[0].ravel()[0:1])
    y = f(*a); sync(y)
    y = f(*a); sync(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*a)
    sync(y)
    return (time.perf_counter() - t0) / n


def main():
    N = 160000
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)

    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales_np, scaletype, _, nv = process_scales(
        'log-piecewise', N, wavelet, nv=32, get_params=True)
    na = len(scales_np)
    print('na =', na)

    n_up, n1, _ = pad_params(N, 'reflect')
    print('n_up =', n_up)
    xp = np.asarray(padsignal(jnp.asarray(x), 'reflect'))
    xp_j = jnp.asarray(xp)
    scales_j = jnp.asarray(scales_np, jnp.float32)

    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, scaletype, 'peak', True, 1.0, 'cwt')
    const = np.log(2) / nv_from_scales(scales_np)
    params = ssq_bin_params(ssq_freqs, True)
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True, na, 1.0)
    const_j = jnp.asarray(np.asarray(const, np.float32))
    gamma = float(10 * np.finfo(np.float32).eps)

    # stage 1: forward fft of padded signal
    f_fft = jax.jit(lambda xp: fft(Complex(xp, jnp.zeros_like(xp))).abs2().sum())
    print('fwd fft 1x%d        : %.4f s' % (n_up, bench(f_fft, xp_j)))

    # stage 2: filterbank synthesis only
    def synth(scales_j):
        xi = jnp.asarray(_xifn(1., n_up, np.dtype('float32')))
        w_grid = scales_j * xi
        psih = wavelet.fn(w_grid, xp=jnp)
        return psih.sum()
    f_syn = jax.jit(synth)
    print('filterbank %dx%d  : %.4f s' % (na, n_up, bench(f_syn, scales_j)))

    # stage 3: full cwt_core (Wx + dWx)
    def core(xp, scales_j):
        Wx, dWx = cwt_core(xp, wavelet, scales_j, 1.0, True, True, n1, N,
                           rpadded=False, is_2d=False)
        return Wx.re.sum() + dWx.re.sum()
    f_core = jax.jit(core)
    print('cwt_core Wx+dWx      : %.4f s' % bench(f_core, xp_j, scales_j))

    # stage 3b: cwt_core without derivative
    def core1(xp, scales_j):
        Wx, _ = cwt_core(xp, wavelet, scales_j, 1.0, False, True, n1, N,
                         rpadded=False, is_2d=False)
        return Wx.re.sum()
    f_core1 = jax.jit(core1)
    print('cwt_core Wx only     : %.4f s' % bench(f_core1, xp_j, scales_j))

    # stage 4: scatter only (on precomputed Wx, dWx)
    Wx, dWx = jax.jit(lambda xp, s: cwt_core(
        xp, wavelet, s, 1.0, True, True, n1, N, False, False))(xp_j, scales_j)
    params_d = dict(params)

    def scat(Wre, Wim, dre, dim, const):
        Wx = Complex(Wre, Wim)
        dWx = Complex(dre, dim)
        Tx = ssqueeze_fast(Wx, dWx, None, const, logscale=True, flipud=True,
                           gamma=gamma, Sfs=None, params=params_d,
                           natural_bins=np.asarray(natural, np.int32)
                           if natural is not None else None)
        return Tx.re.sum()
    f_scat = jax.jit(scat)
    print('scatter only         : %.4f s' % bench(
        f_scat, Wx.re, Wx.im, dWx.re, dWx.im, const_j))

    # stage 5: fully fused fwd (everything, scalar out)
    def full(xp, scales_j, const):
        Wx, dWx = cwt_core(xp, wavelet, scales_j, 1.0, True, True, n1, N,
                           False, False)
        Tx = ssqueeze_fast(Wx, dWx, None, const, logscale=True, flipud=True,
                           gamma=gamma, Sfs=None, params=params_d,
                           natural_bins=np.asarray(natural, np.int32)
                           if natural is not None else None)
        return Tx.re.sum() + Wx.re.sum()
    f_full = jax.jit(full)
    print('fused full (scalar)  : %.4f s' % bench(f_full, xp_j, scales_j,
                                                  const_j))

    # ---- bins fast path (what bench.py's ssq_cwt actually runs) ---------
    from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_bins_pallas,
                                               support_klims)
    from ssqueezepy_tpu.ops.ssq_pallas import scatter_kv_pallas
    klims = support_klims(wavelet, scales_np, n_up)
    natural_i32 = (np.asarray(natural, np.int32)
                   if natural is not None else None)
    nbins = params_d['omax'] + 1
    half = n_up // 2 + 1

    def f_rfft(xp):
        xh = fft(Complex(xp, jnp.zeros_like(xp)), axis=-1,
                 out_range=(0, half), imag_zero=True)
        return xh.re.sum()
    print('rfft (half-spec)     : %.4f s' % bench(jax.jit(f_rfft), xp_j))

    def mk_xh(xp):
        return fft(Complex(xp, jnp.zeros_like(xp)), axis=-1,
                   out_range=(0, half), imag_zero=True)

    def f_bins(xp, scales_j):
        xh = mk_xh(xp)
        Wx, k = cwt_fused_bins_pallas(
            xh, scales_j, wavelet, n_up, n1, N, 1.0, True, params_d,
            gamma, True, deriv_lowprec=True, klims=klims)
        return Wx.re.sum() + k.sum()
    print('rfft+cwt_bins (Wx,k) : %.4f s' % bench(jax.jit(f_bins), xp_j,
                                                  scales_j))

    Wxb, kb = jax.jit(lambda xp, s: cwt_fused_bins_pallas(
        mk_xh(xp), s, wavelet, n_up, n1, N, 1.0, True, params_d,
        gamma, True, deriv_lowprec=True, klims=klims))(xp_j, scales_j)

    def f_kv(Wr, Wi, k, const):
        Tx = scatter_kv_pallas(Complex(Wr, Wi), k, const, nbins,
                               natural_bins=natural_i32)
        return Tx.re.sum()
    print('scatter_kv only      : %.4f s' % bench(jax.jit(f_kv), Wxb.re,
                                                  Wxb.im, kb, const_j))

    def f_bins_full(xp, scales_j, const):
        xh = mk_xh(xp)
        Wx, k = cwt_fused_bins_pallas(
            xh, scales_j, wavelet, n_up, n1, N, 1.0, True, params_d,
            gamma, True, deriv_lowprec=True, klims=klims)
        Tx = scatter_kv_pallas(Wx, k, const, nbins,
                               natural_bins=natural_i32)
        return Tx.re.sum() + Wx.re.sum()
    print('bins pipeline full   : %.4f s' % bench(jax.jit(f_bins_full),
                                                  xp_j, scales_j, const_j))

    # ---- ssq_stft stages (n_fft = 598 -> 300 rows, the bench cell) ------
    profile_ssq_stft(x)


def profile_ssq_stft(x):
    from ssqueezepy_tpu.models.stft import _window_key
    from ssqueezepy_tpu.models.windows import get_window
    from ssqueezepy_tpu.ops.stft_conv import (stft_conv, stft_conv_bins,
                                              _device_filterbank,
                                              _next_fft_len)
    from ssqueezepy_tpu.ops.ssq_pallas import scatter_kv_pallas
    N = len(x)
    n_fft = 598
    dtype = 'float32'
    win, dwin = get_window(None, n_fft, n_fft, derivative=True,
                           dtype=dtype)
    win_key = _window_key(win, dwin)
    n_rows = n_fft // 2 + 1
    padlength = N + n_fft - 1
    Np2 = _next_fft_len(padlength)
    Sfs = np.linspace(0, .5, n_rows, dtype=dtype)
    params = dict(ssq_bin_params(Sfs, logscale=False))
    gamma = float(10 * np.finfo(np.float32).eps)
    const = float(Sfs[1] - Sfs[0])
    nbins = params['omax'] + 1
    natural = np.arange(n_rows, dtype=np.int32)
    sfs_key = tuple(float(v) for v in Sfs)
    tables = _device_filterbank(win_key, n_fft, Np2, True, dtype)
    xj = jnp.asarray(x)

    def f_conv(xj, *tbl):
        Sx, dSx = stft_conv(xj, 1.0, n_fft, N, win_key, True, True,
                            'reflect', padlength, dtype, tables=tbl)
        return Sx.re.sum() + dSx.re.sum()
    print('stft_conv Sx+dSx     : %.4f s' % bench(jax.jit(f_conv), xj,
                                                  *tables))

    def f_sbins(xj, *tbl):
        Sx, k = stft_conv_bins(xj, 1.0, n_fft, N, win_key, True,
                               'reflect', padlength, dtype, params,
                               gamma, False, sfs_key, tbl)
        return Sx.re.sum() + k.sum()
    print('stft_conv_bins (Sx,k): %.4f s' % bench(jax.jit(f_sbins), xj,
                                                  *tables))

    Sxb, kb = jax.jit(lambda xj, *tbl: stft_conv_bins(
        xj, 1.0, n_fft, N, win_key, True, 'reflect', padlength, dtype,
        params, gamma, False, sfs_key, tbl))(xj, *tables)

    def f_skv(Sr, Si, k):
        Tx = scatter_kv_pallas(Complex(Sr, Si), k, const, nbins,
                               natural_bins=natural)
        return Tx.re.sum()
    print('stft scatter_kv only : %.4f s' % bench(jax.jit(f_skv), Sxb.re,
                                                  Sxb.im, kb))

    def f_sfull(xj, *tbl):
        Sx, k = stft_conv_bins(xj, 1.0, n_fft, N, win_key, True,
                               'reflect', padlength, dtype, params,
                               gamma, False, sfs_key, tbl)
        Tx = scatter_kv_pallas(Sx, k, const, nbins, natural_bins=natural)
        return Tx.re.sum() + Sx.re.sum()
    print('ssq_stft bins full   : %.4f s' % bench(jax.jit(f_sfull), xj,
                                                  *tables))

    # ---- second-order family (no baseline; records the order-2 cost
    # multiple over the first-order flagships) --------------------------
    import ssqueezepy_tpu as stq
    N2 = 160000
    x2 = np.random.default_rng(0).standard_normal(N2).astype(np.float32)
    x2j = jnp.asarray(x2)

    def f_w2(xv):
        Tx, _, _, _ = stq.ssq_cwt2(xv, ('gmw', {'dtype': 'float32'}))
        return Tx.re.sum()
    try:
        print('ssq_cwt2 full        : %.4f s' % bench(f_w2, x2j))
    except Exception as e:
        print('ssq_cwt2 full        : FAILED (%s)' % e, flush=True)

    def f_f2(xv):
        Tx, _, _, _ = stq.ssq_stft2(xv, n_fft=598)
        return Tx.re.sum()
    try:
        print('ssq_stft2 full       : %.4f s' % bench(f_f2, x2j))
    except Exception as e:
        print('ssq_stft2 full       : FAILED (%s)' % e, flush=True)


if __name__ == '__main__':
    main()
