# -*- coding: utf-8 -*-
"""'fold' tier-2 mode (configs.Config.scatter_tier2): out-of-band
outliers are compacted 8x by residue-class sums and extracted from the
folded plane; chunk-collision columns fall back to the exact full-plane
loop. Must equal the XLA scatter on every geometry — including
collision-heavy tails that force the fallback loop. All interpret-mode
(CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp

import ssqueezepy_tpu  # noqa: F401  (package init)
from ssqueezepy_tpu.configs import configure, reset_config
from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.ssq_kernels import _scatter_xla
from ssqueezepy_tpu.ops.ssq_pallas import (shift_scatter_pallas,
                                           scatter_kv_pallas)


@pytest.fixture(autouse=True)
def _fold_mode():
    configure(scatter_tier2='fold')
    yield
    reset_config()


@pytest.mark.parametrize('na', [32, 61, 96])
def test_fold_random_vs_xla(na):
    """Uniform-random k: every cell is an outlier — the fold path and
    its collision fallback carry ALL the data."""
    rng = np.random.default_rng(na)
    N = 150
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    k = rng.integers(0, na, (na, N)).astype(np.int32)
    valid = rng.random((na, N)) > 0.3
    nat = np.arange(na, dtype=np.int32)
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), na,
                               nat, interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), na)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize('outlier_p', [0.005, 0.2])
def test_fold_sparse_and_dense_tails(outlier_p):
    """Sparse tail (the design case: singles dominate) and a dense tail
    (chunk collisions everywhere: the fallback loop does the work)."""
    rng = np.random.default_rng(int(outlier_p * 1e4))
    na, N, nbins = 96, 200, 128
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    nat = np.clip(np.arange(na), 0, nbins - 1).astype(np.int32)
    dev = rng.integers(-8, 9, (na, N))                  # in-band bulk
    k = np.clip(nat[:, None] + dev, 0, nbins - 1)
    far = rng.random((na, N)) < outlier_p               # out-of-band tail
    k = np.where(far, rng.integers(0, nbins, (na, N)), k).astype(np.int32)
    valid = rng.random((na, N)) > 0.1
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), nbins,
                               nat, interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), nbins)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


def test_fold_kv_vs_xla():
    """k-consuming kernel (the ssq_cwt fast-path consumer) under fold
    tier-2, with invalid cells and edge saturation."""
    rng = np.random.default_rng(17)
    na, N, nbins = 61, 200, 61
    wr = rng.standard_normal((na, N)).astype(np.float32)
    wi = rng.standard_normal((na, N)).astype(np.float32)
    nat = np.arange(na, dtype=np.int32)
    dev = rng.integers(-10, 11, (na, N))
    k = np.clip(nat[:, None] + dev, 0, nbins - 1).astype(np.int32)
    k[(rng.random((na, N)) < 0.05)] = 0
    k[(rng.random((na, N)) < 0.05)] = nbins - 1
    far = rng.random((na, N)) < 0.02
    k = np.where(far, rng.integers(0, nbins, (na, N)), k).astype(np.int32)
    inv = rng.random((na, N)) < 0.1
    k = np.where(inv, -1, k).astype(np.int32)
    const = rng.random(na).astype(np.float32) + 0.5
    out = scatter_kv_pallas(Complex(jnp.asarray(wr), jnp.asarray(wi)),
                            jnp.asarray(k), jnp.asarray(const), nbins,
                            natural_bins=nat, interpret=True, T=128)
    c = const.reshape(-1, 1)
    ref = _scatter_xla(jnp.asarray(wr * c), jnp.asarray(wi * c),
                       jnp.asarray(np.where(inv, 0, k)),
                       jnp.asarray(~inv), nbins)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


def test_fold_fused_end_to_end():
    """Full fused phase+bin+scatter kernel under fold tier-2 equals the
    XLA formulation (log-piecewise grid, gamma gating, edge bins)."""
    from ssqueezepy_tpu.ops.ssq_pallas import ssq_fused_pallas
    from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params, compute_bins
    from ssqueezepy_tpu.ops.phase import phase_transform_w
    rng = np.random.default_rng(5)
    na, N = 64, 150
    sf = np.geomspace(1e-3, 0.5, na)
    params = ssq_bin_params(sf, logscale=True)
    Wx = Complex(jnp.asarray(rng.standard_normal((na, N)), jnp.float32),
                 jnp.asarray(rng.standard_normal((na, N)), jnp.float32))
    dWx = Complex(jnp.asarray(rng.standard_normal((na, N)) * 0.3,
                              jnp.float32),
                  jnp.asarray(rng.standard_normal((na, N)) * 0.3,
                              jnp.float32))
    const = np.full(na, 0.07, np.float32)
    gamma = 1e-6
    nat = np.arange(na - 1, -1, -1).astype(np.int32)
    out = ssq_fused_pallas(Wx, dWx, const, params, gamma, True, nat,
                           interpret=True, T=128)
    w = phase_transform_w(Wx, dWx, gamma)
    k, valid = compute_bins(w, params, True)
    c = const.reshape(-1, 1)
    ref = _scatter_xla(Wx.re * c, Wx.im * c, k, valid, params['omax'] + 1)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


def test_fold_kv_grad():
    """The custom VJP (adjoint gather) is tier-2-mode independent."""
    import jax
    rng = np.random.default_rng(11)
    na, N, nbins = 33, 96, 40
    wr = rng.standard_normal((na, N)).astype(np.float32)
    wi = rng.standard_normal((na, N)).astype(np.float32)
    k = rng.integers(-1, nbins, (na, N)).astype(np.int32)
    const = (rng.random(na) + 0.5).astype(np.float32)
    nat = np.clip(np.arange(na), 0, nbins - 1).astype(np.int32)

    def f_pallas(a, b):
        out = scatter_kv_pallas(Complex(a, b), jnp.asarray(k),
                                jnp.asarray(const), nbins,
                                natural_bins=nat, interpret=True, T=96)
        return (out.re ** 2).sum() + (out.im ** 2).sum()

    def f_xla(a, b):
        c = jnp.asarray(const).reshape(-1, 1)
        valid = (jnp.asarray(k) >= 0) & (jnp.asarray(k) < nbins)
        out = _scatter_xla(a * c, b * c, jnp.asarray(np.maximum(k, 0)),
                           valid, nbins)
        return (out.re ** 2).sum() + (out.im ** 2).sum()

    ga, gb = jax.grad(f_pallas, argnums=(0, 1))(jnp.asarray(wr),
                                                jnp.asarray(wi))
    ra, rb = jax.grad(f_xla, argnums=(0, 1))(jnp.asarray(wr),
                                             jnp.asarray(wi))
    assert np.allclose(np.asarray(ga), np.asarray(ra), atol=1e-4)
    assert np.allclose(np.asarray(gb), np.asarray(rb), atol=1e-4)
