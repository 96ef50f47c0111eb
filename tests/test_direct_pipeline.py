# -*- coding: utf-8 -*-
"""Round-4 zero-prep (direct) pipelines: the CWT/STFT bins kernels emit
the scatter's exact layout (32-rounded rows, tile-rounded width, int16
k with -1 invalid marking) and `scatter_kv_direct` consumes it with no
XLA pad/gather pass in between. These tests pin:

  * direct == legacy bins pipeline numerically (both interpret mode),
  * the k plane's masking contract (dummy tail rows, out-of-range
    columns, gamma gating) in int16,
  * gradient flow through the direct pair (custom VJPs),
  * ssq_cwt/ssq_stft route through the direct path and get_Wx=False
    returns Tx-only.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.configs import configure, reset_config
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

rng = np.random.default_rng(0)


def _plan(N):
    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales_np = process_scales('log-piecewise', N, wavelet, nv=8)
    na = len(scales_np)
    n_up, n1, _ = pad_params(N, 'reflect')
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    const = np.ravel(np.log(2) / nv_from_scales(scales_np)) \
        .astype(np.float32)
    params = ssq_bin_params(ssq_freqs, True)
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True,
                            na, 1.0)
    gamma = float(10 * np.finfo(np.float32).eps)
    klims = support_klims(wavelet, scales_np, n_up)
    return (wavelet, scales_np, na, n_up, n1, const, params,
            params['omax'] + 1, natural, gamma, klims)


def test_cwt_direct_equals_legacy_and_masks():
    N = 512
    (wavelet, scales_np, na, n_up, n1, const, params, nbins, natural,
     gamma, klims) = _plan(N)
    x = rng.standard_normal(N).astype(np.float32)
    xp = padsignal(jnp.asarray(x), 'reflect')
    half = n_up // 2 + 1
    xh = fft(Complex(xp, jnp.zeros_like(xp)), axis=-1,
             out_range=(0, half), imag_zero=True)
    scales_j = jnp.asarray(scales_np, jnp.float32)

    Wx0, k0 = cwt_fused_bins_pallas(
        xh, scales_j, wavelet, n_up, n1, N, 1.0, True, params, gamma,
        True, interpret=True, deriv_lowprec=True, klims=klims)
    Tx0 = scatter_kv_pallas(Wx0, k0, const, nbins,
                            natural_bins=np.asarray(natural, np.int32),
                            interpret=True)

    T = 256
    WxF, kF, off = cwt_fused_bins_direct(
        xh, scales_j, wavelet, n_up, n1, N, 1.0, True, params, gamma,
        True, interpret=True, deriv_lowprec=True, klims=klims, T=T)
    na_pad, W = WxF.re.shape
    assert na_pad % 32 == 0 and W % T == 0
    assert kF.dtype == jnp.int16
    const_pad = jnp.asarray(np.pad(const, (0, na_pad - na)))
    TxF = scatter_kv_direct(WxF, kF, const_pad, nbins, interpret=True,
                            T=T)

    # masking contract
    kF_np = np.asarray(kF)
    assert (kF_np[na:] == -1).all()                    # dummy tail rows
    if off:
        assert (kF_np[:, :off] == -1).all()            # left margin
    assert (kF_np[:, off + N:] == -1).all()            # right margin
    # equality
    Tx1 = np.asarray(TxF.re[:nbins, off:off + N]) \
        + 1j * np.asarray(TxF.im[:nbins, off:off + N])
    T0 = Tx0.to_numpy()
    assert np.array_equal(np.asarray(kF[:na, off:off + N],
                                     dtype=np.int32), np.asarray(k0))
    assert np.abs(Tx1 - T0).max() == 0.0
    assert np.abs(np.asarray(WxF.re[:na, off:off + N])
                  - np.asarray(Wx0.re)).max() == 0.0

    # gradient flow through the direct pair
    def loss(xpv):
        xh2 = fft(Complex(xpv, jnp.zeros_like(xpv)), axis=-1,
                  out_range=(0, half), imag_zero=True)
        Wf, kk, _ = cwt_fused_bins_direct(
            xh2, scales_j, wavelet, n_up, n1, N, 1.0, True, params,
            gamma, True, interpret=True, deriv_lowprec=True,
            klims=klims, T=T)
        Tf = scatter_kv_direct(Wf, kk, const_pad, nbins, interpret=True,
                               T=T)
        return (Tf.re ** 2).sum() + (Wf.re[:na] ** 2).sum()
    g = jax.grad(loss)(xp)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ssq_cwt_routes_direct_and_tx_only():
    """Public ssq_cwt: the interpret-mode fast path equals the CPU
    reference, and get_Wx=False returns the identical Tx with Wx=None
    (the Tx-only pipeline skips the Wx slice entirely). N=2048 so the
    padded length factorizes for the fused kernel (n_up=4096 -> 64x64;
    at n_up < 4096 the bins path doesn't engage and Tx-only is just the
    contract's Wx=None)."""
    N = 2048
    kw = dict(scales='log-piecewise', nv=8)
    x = rng.standard_normal(N).astype(np.float32)
    Tx_c, Wx_c, fr_c, _ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                                      astensor=False, **kw)
    configure(backend='tpu', pallas_interpret=True)
    try:
        Tx_p, Wx_p, fr_p, _ = stq.ssq_cwt(
            x, ('gmw', {'dtype': 'float32'}), astensor=False, **kw)
        Tx_o, Wx_o, _, _ = stq.ssq_cwt(
            x, ('gmw', {'dtype': 'float32'}), astensor=False,
            get_Wx=False, **kw)
    finally:
        reset_config()
    m = np.abs(Tx_c).max()
    assert np.abs(Wx_p - Wx_c).max() < 1e-5
    # the fast path runs the derivative in single-pass bf16 (the
    # library's +-1-bin criterion, ops/cwt_pallas._dot_lo), so isolated
    # cells flip bins vs the full-precision CPU reference: assert the
    # flip FRACTION is small and the column sums (inversion integral,
    # immune to flips) agree tightly. Exact plane equality vs the
    # legacy Pallas path is pinned in
    # test_cwt_direct_equals_legacy_and_masks.
    # nv=8 makes bins coarse: ~5% of white-noise cells sit within bf16
    # rounding of a bin boundary and flip to the ADJACENT bin (the
    # library's documented +-1-bin criterion). Column sums and total
    # energy are invariant under such flips and must agree tightly.
    assert (np.abs(Tx_p - Tx_c) > 1e-4 * m).mean() < 0.10
    assert np.abs(Tx_p.sum(-2) - Tx_c.sum(-2)).max() / m < 5e-5
    e_p, e_c = np.abs(Tx_p).sum(), np.abs(Tx_c).sum()
    assert abs(e_p - e_c) / e_c < 0.01
    assert np.allclose(fr_p, fr_c)
    assert Wx_o is None
    assert np.array_equal(Tx_o, Tx_p)


def test_ssq_cwt_direct_scalar_const():
    """Custom geomspace scales infer 'log' scaletype whose squeeze
    const is a broadcast SCALAR (not per-scale): the direct pipeline
    must broadcast it to the padded row count (round-5 regression —
    the on-chip pytest tier caught a reshape crash here)."""
    N = 2048
    x = rng.standard_normal(N).astype(np.float32)
    scales = np.geomspace(1., 24., 65).reshape(-1, 1)
    kw = dict(scales=scales, nv=None)
    Tx_c, Wx_c, _, _ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                                   astensor=False, **kw)
    configure(backend='tpu', pallas_interpret=True)
    try:
        Tx_p, Wx_p, _, _ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                                       astensor=False, **kw)
    finally:
        reset_config()
    m = np.abs(Tx_c).max()
    assert np.abs(Wx_p - Wx_c).max() < 1e-5
    assert np.abs(Tx_p.sum(-2) - Tx_c.sum(-2)).max() / m < 5e-5


def test_ssq_stft_routes_direct():
    N = 600
    x = rng.standard_normal(N).astype(np.float32)
    Tx_c, Sx_c, fr_c, _ = stq.ssq_stft(x, n_fft=64, dtype='float32',
                                       astensor=False)
    configure(backend='tpu', pallas_interpret=True)
    try:
        Tx_p, Sx_p, fr_p, _ = stq.ssq_stft(x, n_fft=64, dtype='float32',
                                           astensor=False)
    finally:
        reset_config()
    m = np.abs(Tx_c).max()
    assert np.abs(Sx_p - Sx_c).max() / max(np.abs(Sx_c).max(), 1e-30) \
        < 1e-5
    assert np.abs(Tx_p - Tx_c).max() < 6e-3 * max(m, 1.0)
    assert np.abs(Tx_p.sum(-2) - Tx_c.sum(-2)).max() / m < 1e-5
    assert np.allclose(fr_p, fr_c)
