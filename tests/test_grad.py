# -*- coding: utf-8 -*-
"""Gradients through the TPU fast path (VERDICT r1 #5).

Both fused Pallas kernels carry a custom VJP whose backward pass is the
jax.vjp of the identical XLA formulation, so `jax.grad` through the
Pallas forward must match `jax.grad` through the XLA path exactly.
Interpret mode stands in for the TPU in CI (same dispatch wiring).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.ssq_kernels import (ssq_bin_params, compute_bins,
                                            _scatter_xla, ssqueeze_fast)
from ssqueezepy_tpu.ops.ssq_pallas import (shift_scatter_pallas,
                                           ssq_fused_pallas)
from ssqueezepy_tpu.configs import configure, reset_config

rng = np.random.default_rng(0)


def test_scatter_vjp_is_adjoint_gather():
    na, nbins, N = 40, 40, 96
    vre = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    vim = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    k = jnp.asarray(rng.integers(0, nbins, (na, N)).astype(np.int32))
    valid = jnp.asarray(rng.random((na, N)) > 0.3)

    def loss_pallas(a, b):
        out = shift_scatter_pallas(a, b, k, valid, nbins, None,
                                   interpret=True, T=128)
        return jnp.sum(out.re ** 2 + 0.5 * out.im ** 2)

    def loss_xla(a, b):
        out = _scatter_xla(a, b, k, valid, nbins)
        return jnp.sum(out.re ** 2 + 0.5 * out.im ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(vre, vim)
    gx = jax.grad(loss_xla, argnums=(0, 1))(vre, vim)
    for a, b in zip(gp, gx):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                           atol=1e-6)


@pytest.mark.parametrize('mode', ['lin', 'log'])
def test_fused_vjp_matches_xla_grad(mode):
    from test_ssq_pallas import _grids
    na, N = 48, 100
    freqs = _grids(mode, na)
    params = ssq_bin_params(freqs, logscale=(mode == 'log'))
    gamma = 1e-3
    Wxr = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    Wxi = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    dWr = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    dWi = jnp.asarray(rng.standard_normal((na, N)).astype('float32'))
    const = jnp.asarray(rng.random(na).astype('float32') + 0.5)
    nb = np.arange(na - 1, -1, -1).astype(np.int32)

    def loss_pallas(wr, wi, dr, di, c):
        Tx = ssq_fused_pallas(Complex(wr, wi), Complex(dr, di), c, params,
                              gamma, True, nb, interpret=True, T=256)
        return jnp.sum(Tx.re ** 2 + Tx.im ** 2)

    def loss_xla(wr, wi, dr, di, c):
        from ssqueezepy_tpu.ops.phase import phase_transform_w
        Wx, dWx = Complex(wr, wi), Complex(dr, di)
        w = phase_transform_w(Wx, dWx, gamma)
        k, valid = compute_bins(w, params, True)
        Tx = _scatter_xla(wr * c.reshape(-1, 1), wi * c.reshape(-1, 1),
                          k, valid, params['omax'] + 1)
        return jnp.sum(Tx.re ** 2 + Tx.im ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
        Wxr, Wxi, dWr, dWi, const)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
        Wxr, Wxi, dWr, dWi, const)
    for i, (a, b) in enumerate(zip(gp, gx)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                           atol=1e-5), i
    # dWx enters only through the (zero-tangent) bin indices
    assert np.all(np.asarray(gp[2]) == 0)
    assert np.all(np.asarray(gp[3]) == 0)


def test_cwt_fused_vjp_matches_xla_grad():
    """Gradient through the fused Pallas CWT == gradient through the XLA
    half-spectrum formulation (its own backward)."""
    from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_pallas,
                                               _cwt_half_xla,
                                               cwt_pallas_applicable)
    from ssqueezepy_tpu.models.wavelets import Wavelet
    wav = Wavelet(('gmw', {'dtype': 'float32'}))
    n_up, n1, N = 2048, 512, 1024
    assert cwt_pallas_applicable(wav, n_up, False)
    half = n_up // 2 + 1
    scales = jnp.asarray(2. ** (np.arange(8, 40) / 8), 'float32')
    xhr = jnp.asarray(rng.standard_normal(half).astype('float32'))
    xhi = jnp.asarray(rng.standard_normal(half).astype('float32'))

    def loss_pallas(a, b, s):
        Wx, dWx = cwt_fused_pallas(Complex(a, b), s, wav, n_up, n1, N,
                                   1.0, True, True, interpret=True)
        return jnp.sum(Wx.re ** 2 + Wx.im ** 2 + dWx.re ** 2)

    def loss_xla(a, b, s):
        o = _cwt_half_xla(a, b, s, jnp.asarray(1.0, 'float32'), wav, n_up,
                          n1, N, True, True, 'float32')
        return jnp.sum(o[0] ** 2 + o[1] ** 2 + o[2] ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xhr, xhi, scales)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(xhr, xhi, scales)
    for i, (a, b) in enumerate(zip(gp, gx)):
        den = max(1e-3, float(np.abs(np.asarray(b)).max()))
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / den
        assert rel < 5e-3, (i, rel)  # fwd runs bf16x3 dots; bwd is exact


def test_ssq_cwt_grad_end_to_end_pallas():
    """`jax.grad` of a reconstruction-style loss through the FULL fused
    forward (padding -> Pallas CWT -> Pallas reassignment) runs under
    `use_pallas=True` and matches the XLA path's gradient (VERDICT r1 #5
    done-criterion; interpret mode stands in for the TPU)."""
    from ssqueezepy_tpu.ops.pad import padsignal, pad_params
    from ssqueezepy_tpu.models.cwt import cwt_core, _process_gmw_wavelet
    from ssqueezepy_tpu.models.wavelets import Wavelet

    N = 1024
    x = jnp.asarray(np.cos(
        2 * np.pi * 8 * np.linspace(0, 1, N)).astype('float32'))
    wav = Wavelet._init_if_not_isinstance(
        _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True), N=N)
    n_up, n1, _ = pad_params(N, 'reflect')
    scales = jnp.asarray(2. ** (np.arange(8, 40) / 8), 'float32').reshape(
        -1, 1)
    na = scales.shape[0]
    freqs = 2 ** np.linspace(np.log2(1 / N), np.log2(0.5), na)
    params = ssq_bin_params(freqs, logscale=True)
    gamma = 1e-3
    nb = np.arange(na).astype(np.int32)

    def loss(xj):
        xp = padsignal(xj, 'reflect')
        Wx, dWx = cwt_core(xp, wav, scales, 1.0, True, True, n1, N)
        Tx = ssqueeze_fast(Wx, dWx, None, 1.0, logscale=True, flipud=True,
                           gamma=gamma, params=params, natural_bins=nb)
        rec = Tx.re.sum(axis=-2)
        return jnp.mean((rec - xj) ** 2)

    try:
        g_xla = jax.grad(loss)(x)
        configure(pallas_interpret=True, backend='tpu')
        g_pal = jax.grad(loss)(x)
    finally:
        reset_config()
    g_xla, g_pal = np.asarray(g_xla), np.asarray(g_pal)
    assert np.isfinite(g_pal).all()
    den = max(1e-6, np.abs(g_xla).max())
    assert np.abs(g_pal - g_xla).max() / den < 5e-3
