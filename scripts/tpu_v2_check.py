# -*- coding: utf-8 -*-
"""Round-4 v2 (zero-prep) pipeline check on the real chip, bench shape:

  1. correctness: direct pipeline vs legacy bins pipeline (device-side
     maxdiff reductions; only scalars fetched),
  2. timing: legacy vs direct, Wx+Tx and Tx-only, CWT and STFT.

The direct pipeline also exercises two Mosaic features the interpret
tests can't prove out: int16 k-plane stores/loads and the
input_output_aliases chain across the bucket pallas_calls.
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
from ssqueezepy_tpu.models.ssqueezing import (
    _compute_associated_frequencies, _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_bins_pallas,
                                           cwt_fused_bins_direct,
                                           support_klims)
from ssqueezepy_tpu.ops.ssq_pallas import (scatter_kv_pallas,
                                           scatter_kv_direct)


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
    scales_np = process_scales('log-piecewise', N, wavelet, nv=32)[:300]
    na = len(scales_np)
    n_up, n1, _ = pad_params(N, 'reflect')
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    const = np.ravel(np.log(2) / nv_from_scales(scales_np)) \
        .astype(np.float32)
    params = ssq_bin_params(ssq_freqs, True)
    nbins = params['omax'] + 1
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True,
                            na, 1.0)
    gamma = float(10 * np.finfo(np.float32).eps)
    klims = support_klims(wavelet, scales_np, n_up)
    half = n_up // 2 + 1
    na_pad = -(-na // 32) * 32
    const_pad = jnp.asarray(np.pad(const, (0, na_pad - na)))
    nat_i32 = np.asarray(natural, np.int32)

    xj = jnp.asarray(x)
    scales_j = jnp.asarray(scales_np, jnp.float32)
    const_j = jnp.asarray(const)

    def mk_xh(xp):
        xpad = padsignal(xp, 'reflect')
        return fft(Complex(xpad, jnp.zeros_like(xpad)), axis=-1,
                   out_range=(0, half), imag_zero=True)

    def legacy(xp, s, c):
        xh = mk_xh(xp)
        Wx, k = cwt_fused_bins_pallas(
            xh, s, wavelet, n_up, n1, N, 1.0, True, params, gamma, True,
            deriv_lowprec=True, klims=klims)
        Tx = scatter_kv_pallas(Wx, k, c, nbins, natural_bins=nat_i32)
        return Tx, Wx

    def direct(xp, s, cpad, T=1024, want_wx=True):
        xh = mk_xh(xp)
        WxF, k, off = cwt_fused_bins_direct(
            xh, s, wavelet, n_up, n1, N, 1.0, True, params, gamma, True,
            deriv_lowprec=True, klims=klims, T=T)
        TxF = scatter_kv_direct(WxF, k, cpad, nbins, T=T)
        Tx = Complex(TxF.re[:nbins, off:off + N],
                     TxF.im[:nbins, off:off + N])
        if not want_wx:
            return (Tx,)
        Wx = Complex(WxF.re[:na, off:off + N], WxF.im[:na, off:off + N])
        return Tx, Wx

    # ---- correctness (device-side diffs, scalar fetch) -----------------
    @jax.jit
    def diff(xp, s, c, cpad):
        Tx0, Wx0 = legacy(xp, s, c)
        Tx1, Wx1 = direct(xp, s, cpad)
        m = jnp.abs(Tx0.re).max()
        return (jnp.abs(Tx1.re - Tx0.re).max() / m,
                jnp.abs(Tx1.im - Tx0.im).max() / m,
                jnp.abs(Wx1.re - Wx0.re).max(),
                jnp.abs((Tx1.re.sum(0) - Tx0.re.sum(0))).max() / m)
    d = [float(np.asarray(v)) for v in diff(xj, scales_j, const_j,
                                            const_pad)]
    print('CWT direct-vs-legacy: Tx_re %.3e Tx_im %.3e Wx %.3e colsum '
          '%.3e' % tuple(d), flush=True)

    # ---- timing --------------------------------------------------------
    fl = jax.jit(lambda xp, s, c: legacy(xp, s, c))
    t = bench(fl, xj, scales_j, const_j)
    print('cwt legacy  (Tx,Wx)  : %7.2f ms' % (t * 1e3), flush=True)
    for T in (1024, 2048):
        fd = jax.jit(lambda xp, s, cp, T=T: direct(xp, s, cp, T=T))
        t = bench(fd, xj, scales_j, const_pad)
        print('cwt direct T%-5d    : %7.2f ms' % (T, t * 1e3), flush=True)
    fo = jax.jit(lambda xp, s, cp: direct(xp, s, cp, want_wx=False))
    t = bench(fo, xj, scales_j, const_pad)
    print('cwt direct Tx-only   : %7.2f ms' % (t * 1e3), flush=True)

    # ---- STFT ----------------------------------------------------------
    from ssqueezepy_tpu.models.stft import _window_key
    from ssqueezepy_tpu.models.windows import get_window
    from ssqueezepy_tpu.ops.stft_conv import (stft_conv_bins,
                                              _device_filterbank,
                                              _next_fft_len)
    n_fft = 598
    win, dwin = get_window(None, n_fft, n_fft, derivative=True,
                           dtype='float32')
    win_key = _window_key(win, dwin)
    n_rows = n_fft // 2 + 1
    padlength = N + n_fft - 1
    Np2 = _next_fft_len(padlength)
    Sfs = np.linspace(0, .5, n_rows, dtype='float32')
    sparams = dict(ssq_bin_params(Sfs, logscale=False))
    sconst = float(Sfs[1] - Sfs[0])
    snbins = sparams['omax'] + 1
    snat = np.arange(n_rows, dtype=np.int32)
    sfs_key = tuple(float(v) for v in Sfs)
    tables = _device_filterbank(win_key, n_fft, Np2, True, 'float32')
    sna_pad = -(-n_rows // 32) * 32
    sconst_pad = jnp.asarray(np.pad(np.full(n_rows, sconst, np.float32),
                                    (0, sna_pad - n_rows)))

    def s_legacy(xv, *tbl):
        Sx, k = stft_conv_bins(xv, 1.0, n_fft, N, win_key, True,
                               'reflect', padlength, 'float32', sparams,
                               gamma, False, sfs_key, tbl)
        Tx = scatter_kv_pallas(Sx, k, sconst, snbins, natural_bins=snat)
        return Tx, Sx

    def s_direct(xv, *tbl):
        SxF, k = stft_conv_bins(xv, 1.0, n_fft, N, win_key, True,
                                'reflect', padlength, 'float32', sparams,
                                gamma, False, sfs_key, tbl,
                                direct_T=1024)
        TxF = scatter_kv_direct(SxF, k, sconst_pad, snbins, T=1024)
        return (Complex(TxF.re[:snbins, :N], TxF.im[:snbins, :N]),
                Complex(SxF.re[:n_rows, :N], SxF.im[:n_rows, :N]))

    @jax.jit
    def sdiff(xv, *tbl):
        T0, S0 = s_legacy(xv, *tbl)
        T1, S1 = s_direct(xv, *tbl)
        m = jnp.abs(T0.re).max()
        return (jnp.abs(T1.re - T0.re).max() / m,
                jnp.abs(S1.re - S0.re).max(),
                jnp.abs(T1.re.sum(0) - T0.re.sum(0)).max() / m)
    d = [float(np.asarray(v)) for v in sdiff(xj, *tables)]
    print('STFT direct-vs-legacy: Tx %.3e Sx %.3e colsum %.3e' % tuple(d),
          flush=True)
    t = bench(jax.jit(s_legacy), xj, *tables)
    print('stft legacy (Tx,Sx)  : %7.2f ms' % (t * 1e3), flush=True)
    t = bench(jax.jit(s_direct), xj, *tables)
    print('stft direct (Tx,Sx)  : %7.2f ms' % (t * 1e3), flush=True)
    print('V2CHECK-DONE', flush=True)


if __name__ == '__main__':
    main()
