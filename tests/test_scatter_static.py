# -*- coding: utf-8 -*-
"""'static' scatter mode (configs.Config.scatter_mode): the tier-1 sweep
as full-plane rolls over a trace-time q window — zero dynamic control
flow. Must be bit-identical (up to float addition order) to the XLA
scatter on every geometry the 'group' suite covers: random worst-case,
outliers, edge saturation, nbins != na, shard blocks with uniform
offsets, and the k-consuming variant. All interpret-mode (CPU).
"""
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
def _static_mode():
    configure(scatter_mode='static')
    yield
    reset_config()


def _natural(na, flip):
    return (np.arange(na - 1, -1, -1) if flip else np.arange(na)) \
        .astype(np.int32)


@pytest.mark.parametrize('flip', [True, False])
@pytest.mark.parametrize('na', [32, 61, 96])
def test_static_random_vs_xla(flip, na):
    rng = np.random.default_rng(hash((flip, na)) % 2**32)
    N = 150
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    k = rng.integers(0, na, (na, N)).astype(np.int32)
    valid = rng.random((na, N)) > 0.3
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), na,
                               _natural(na, flip), interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), na)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize('nbins', [40, 61, 128])
def test_static_nbins_ne_na(nbins):
    rng = np.random.default_rng(nbins)
    na, N = 61, 130
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    k = rng.integers(0, nbins, (na, N)).astype(np.int32)
    valid = rng.random((na, N)) > 0.2
    nat = np.clip(_natural(na, False), 0, nbins - 1)
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), nbins,
                               nat, interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), nbins)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)


def test_static_shard_block_offset():
    """Per-shard row block scattering into the full bin space: the
    uniform block offset rides the static offs column, so the q window
    follows it."""
    rng = np.random.default_rng(3)
    na, N, nbins = 40, 120, 160
    base = 80
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    dev = rng.integers(-6, 7, (na, N))
    k = np.clip(base + np.arange(na)[:, None] + dev, 0,
                nbins - 1).astype(np.int32)
    valid = np.ones((na, N), bool)
    nat = (base + np.arange(na)).astype(np.int32)
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), nbins,
                               nat, interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), nbins)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)


def test_static_kv_vs_xla():
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


def test_static_fused_end_to_end():
    """Full fused phase+bin+scatter kernel under static mode equals the
    XLA formulation (log-piecewise grid, gamma gating, edge bins)."""
    from ssqueezepy_tpu.ops.ssq_pallas import ssq_fused_pallas
    from ssqueezepy_tpu.ops.ssq_kernels import (ssq_bin_params,
                                                compute_bins)
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
    nat = _natural(na, True)
    out = ssq_fused_pallas(Wx, dWx, const, params, gamma, True, nat,
                           interpret=True, T=128)
    w = phase_transform_w(Wx, dWx, gamma)
    k, valid = compute_bins(w, params, True)
    c = const.reshape(-1, 1)
    ref = _scatter_xla(Wx.re * c, Wx.im * c, k, valid,
                       params['omax'] + 1)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


def test_static_kv_grad():
    """Gradient flows through the static-mode forward via the adjoint
    gather (mode-independent custom VJP) — matches the XLA gradient."""
    import jax
    from ssqueezepy_tpu.ops.ssq_kernels import _scatter_xla
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
