# -*- coding: utf-8 -*-
"""'horner' scatter mode (configs.Config.scatter_mode): output-centric
tier-1 — bin b collects its in-band contributions via a Horner chain of
roll-by-1 accumulations over the static displacement window; no groups,
no dynamic control flow, no accumulator slice read-modify-writes. Must
equal the XLA scatter on every geometry the 'group'/'static' suites
cover. All interpret-mode (CPU)."""
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
def _horner_mode():
    configure(scatter_mode='horner')
    yield
    reset_config()


@pytest.mark.parametrize('flip', [True, False])
@pytest.mark.parametrize('na', [32, 61, 96])
def test_horner_random_vs_xla(flip, na):
    rng = np.random.default_rng(hash((flip, na)) % 2**32)
    N = 150
    vre = rng.standard_normal((na, N)).astype(np.float32)
    vim = rng.standard_normal((na, N)).astype(np.float32)
    k = rng.integers(0, na, (na, N)).astype(np.int32)
    valid = rng.random((na, N)) > 0.3
    nat = (np.arange(na - 1, -1, -1) if flip
           else np.arange(na)).astype(np.int32)
    out = shift_scatter_pallas(jnp.asarray(vre), jnp.asarray(vim),
                               jnp.asarray(k), jnp.asarray(valid), na,
                               nat, interpret=True, T=128)
    ref = _scatter_xla(jnp.asarray(vre), jnp.asarray(vim),
                       jnp.asarray(k), jnp.asarray(valid), na)
    assert np.allclose(np.asarray(out.re), np.asarray(ref.re),
                       atol=2e-5, rtol=2e-4)
    assert np.allclose(np.asarray(out.im), np.asarray(ref.im),
                       atol=2e-5, rtol=2e-4)


def test_horner_shard_block_offset():
    """Per-shard row block scattering into the full bin space with a
    large uniform offset: the displacement window sits entirely at
    positive d (exercises the dlo > 0 row-offset arithmetic)."""
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


def test_horner_kv_vs_xla():
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


def test_horner_fused_end_to_end():
    """Full fused phase+bin+scatter kernel under horner mode equals the
    XLA formulation, combined with fold tier-2 (both redesigns at once)."""
    from ssqueezepy_tpu.ops.ssq_pallas import ssq_fused_pallas
    from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params, compute_bins
    from ssqueezepy_tpu.ops.phase import phase_transform_w
    configure(scatter_tier2='fold')
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
