# -*- coding: utf-8 -*-
"""Flattened tier-1 scatter (`scatter_flat`) vs the grouped design —
interpret-mode, bit-exact.

The flattened tier-1 (`ops/ssq_pallas._tier1_flat`) replaces one
`fori_loop` launch per 32-row group per tile with ONE loop over the
whole tile's (group, q) pass space; the adds run in the identical order
(group asc, q asc, residue asc), so the outputs must match the grouped
design BIT-exactly — any deviation means the full-plane-roll window
masking or the flat-index decode is wrong. Covers every kernel entry
(plain scatter / kv / kv-direct / fused), outliers, edges, multi-tile
grids, and odd geometries.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops.ssq_pallas import (shift_scatter_pallas,
                                           scatter_kv_pallas,
                                           scatter_kv_direct,
                                           ssq_fused_pallas)


def _rand_cplx(rng, shape, dtype):
    return (rng.standard_normal(shape).astype(dtype),
            rng.standard_normal(shape).astype(dtype))


def _bitexact(a, b):
    assert np.array_equal(np.asarray(a.re), np.asarray(b.re))
    assert np.array_equal(np.asarray(a.im), np.asarray(b.im))


@pytest.mark.parametrize('na,nbins,N', [(32, 32, 150), (61, 70, 600),
                                        (96, 90, 1100)])
def test_plain_scatter_flat_bitexact(na, nbins, N):
    rng = np.random.default_rng(hash((na, nbins, N)) % 2**32)
    vre, vim = _rand_cplx(rng, (na, N), 'float64')
    # mostly-local bins + a sprinkle of outliers + edge saturation
    k = (np.arange(na)[:, None]
         + rng.integers(-6, 7, (na, N))).astype(np.int32)
    out_mask = rng.random((na, N)) < 0.02
    k = np.where(out_mask, rng.integers(0, nbins, (na, N)), k)
    k = np.clip(k, 0, nbins - 1).astype(np.int32)
    valid = rng.random((na, N)) > 0.2
    args = (jnp.asarray(vre), jnp.asarray(vim), jnp.asarray(k),
            jnp.asarray(valid))
    nat = np.arange(na, dtype=np.int32)
    a = shift_scatter_pallas(*args, nbins, natural_bins=nat,
                             interpret=True, flat=False)
    b = shift_scatter_pallas(*args, nbins, natural_bins=nat,
                             interpret=True, flat=True)
    _bitexact(a, b)


@pytest.mark.parametrize('na', [37, 96])
def test_kv_scatter_flat_bitexact(na):
    rng = np.random.default_rng(na)
    nbins, N = na + 5, 700
    wre, wim = _rand_cplx(rng, (na, N), 'float64')
    k = (np.arange(na)[:, None]
         + rng.integers(-30, 31, (na, N))).astype(np.int32)
    k = np.where(rng.random((na, N)) < 0.05, -1, k)      # gamma-gated
    k = np.clip(k, -1, nbins - 1).astype(np.int32)
    const = rng.standard_normal(na)
    Wx = Complex(jnp.asarray(wre), jnp.asarray(wim))
    nat = np.arange(na, dtype=np.int32)
    a = scatter_kv_pallas(Wx, jnp.asarray(k), const, nbins,
                          natural_bins=nat, interpret=True, flat=False)
    b = scatter_kv_pallas(Wx, jnp.asarray(k), const, nbins,
                          natural_bins=nat, interpret=True, flat=True)
    _bitexact(a, b)


@pytest.mark.parametrize('T', [256, 512])
def test_kv_direct_flat_bitexact(T):
    """Zero-prep layout (the headline pipeline's scatter): int16 k,
    dummy tail rows, multi-tile grid."""
    rng = np.random.default_rng(T)
    na_pad, nbins, W = 64, 60, 4 * T
    wre, wim = _rand_cplx(rng, (na_pad, W), 'float32')
    k = (np.arange(na_pad)[:, None]
         + rng.integers(-20, 21, (na_pad, W))).astype(np.int32)
    k = np.where(rng.random((na_pad, W)) < 0.03,
                 rng.integers(0, nbins, (na_pad, W)), k)
    k = np.clip(k, 0, nbins - 1)
    k[-4:] = -1                                         # dummy tail
    k = np.where(rng.random((na_pad, W)) < 0.05, -1, k).astype(np.int16)
    const = rng.standard_normal(na_pad).astype('float32')
    const[-4:] = 0
    Wx = Complex(jnp.asarray(wre), jnp.asarray(wim))
    a = scatter_kv_direct(Wx, jnp.asarray(k), jnp.asarray(const), nbins,
                          interpret=True, T=T, flat=False)
    b = scatter_kv_direct(Wx, jnp.asarray(k), jnp.asarray(const), nbins,
                          interpret=True, T=T, flat=True)
    _bitexact(a, b)


def test_fused_flat_bitexact():
    rng = np.random.default_rng(7)
    na, N = 64, 800
    wre, wim = _rand_cplx(rng, (na, N), 'float64')
    dre, dim = _rand_cplx(rng, (na, N), 'float64')
    sfreqs = np.geomspace(0.01, 0.5, na)
    params = ssq_bin_params(sfreqs, logscale=True)
    Wx = Complex(jnp.asarray(wre), jnp.asarray(wim))
    dWx = Complex(jnp.asarray(dre), jnp.asarray(dim))
    nat = np.arange(na - 1, -1, -1, dtype=np.int32)
    kw = dict(params=params, gamma=1e-3, flipud=True, natural_bins=nat,
              interpret=True)
    a = ssq_fused_pallas(Wx, dWx, 1.0, flat=False, **kw)
    b = ssq_fused_pallas(Wx, dWx, 1.0, flat=True, **kw)
    _bitexact(a, b)


def test_config_knob_routes_flat():
    """`configure(scatter_flat=True)` must reach the kernels (plans
    re-key via exec_config_key)."""
    from ssqueezepy_tpu.configs import configure, exec_config_key
    key0 = exec_config_key()
    try:
        configure(scatter_flat=True)
        assert exec_config_key() != key0
        from ssqueezepy_tpu.ops.ssq_pallas import _flat_default
        assert _flat_default() is True
    finally:
        configure(scatter_flat=False)
