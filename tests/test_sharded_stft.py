# -*- coding: utf-8 -*-
"""Row-sharded synchrosqueezed STFT tests (8 virtual CPU devices).

The reference's ssq_stft is GPU-parallelized but single-device
(/root/reference/ssqueezepy/algos.py:1130-1167); the sharded family is
TPU-original. Criterion mirrors test_sharded.py: sharded output ==
single-chip output, with the reference's float32 CPU-vs-GPU tolerance
for bin-boundary flips (fft_test.py:449).
"""
import numpy as np
import jax
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel.mesh import make_mesh
from ssqueezepy_tpu.parallel.sharded_stft import (ShardedSSQSTFT,
                                                  sharded_ssq_stft)

rng = np.random.default_rng(0)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _c2np(c):
    return np.asarray(c.re) + 1j * np.asarray(c.im)


@needs_8
@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_sharded_ssq_stft_equals_single(mesh_shape):
    """129 rows over 4 or 8 row-shards also exercises the zero-row
    padding (129 % 4 != 0)."""
    b, s = mesh_shape
    N = 1024
    x = rng.standard_normal((2, N)).astype(np.float64)
    mesh = make_mesh(batch=b, scale=s)
    Tx_s, Sx_s, sf_s, sfs_s = sharded_ssq_stft(x, n_fft=256, mesh=mesh)
    Tx_s, Sx_s = _c2np(Tx_s), _c2np(Sx_s)
    for i in range(x.shape[0]):
        Tx1, Sx1, sf1, sfs1 = stq.ssq_stft(x[i], n_fft=256)
        Tx1 = np.asarray(Tx1.re) + 1j * np.asarray(Tx1.im)
        Sx1 = np.asarray(Sx1.re) + 1j * np.asarray(Sx1.im)
        assert Sx_s[i].shape == Sx1.shape
        m = max(np.abs(Sx1).max(), 1e-30)
        assert np.abs(Sx_s[i] - Sx1).max() / m < 1e-5
        # bin-boundary rounding may flip single bins between execution
        # paths - same criterion as test_sharded.py (column sums are
        # invariant to +-1 flips)
        mt = max(np.abs(Tx1).max(), 1e-30)
        assert np.abs(Tx_s[i] - Tx1).max() / mt < 6e-3
        assert np.abs(Tx_s[i].sum(-2) - Tx1.sum(-2)).max() / mt < 1e-5
    assert np.allclose(sf_s, sf1)
    assert np.allclose(sfs_s, sfs1)


@needs_8
def test_sharded_ssq_stft_tone_ridge():
    """A pure tone must reassign onto its frequency row on every shard
    layout (catches phase-from-squeezed and Sfs-block-offset bugs)."""
    N = 1024
    fs = 1.0
    f0 = 0.12
    t = np.arange(N)
    x = np.cos(2 * np.pi * f0 * t)[None].astype(np.float64)
    mesh = make_mesh(batch=1, scale=8)
    Tx, Sx, ssq_freqs, _ = sharded_ssq_stft(x, n_fft=256, fs=fs,
                                            mesh=mesh)
    mag = np.abs(_c2np(Tx)[0])
    ridge = mag[:, N // 4:3 * N // 4].sum(-1)
    k_hat = int(np.argmax(ridge))
    k_true = int(np.argmin(np.abs(np.asarray(ssq_freqs) - f0)))
    assert abs(k_hat - k_true) <= 1, (k_hat, k_true)


@needs_8
def test_sharded_stft_routes_through_bins_pipeline():
    """Force the Pallas dispatch (interpret mode): the per-shard
    bin-emitting conv-STFT kernel + k-consuming scatter must engage and
    reproduce the XLA-sharded result (VERDICT r2 #3)."""
    from ssqueezepy_tpu.configs import configure, reset_config
    N = 2048                    # Np2 = 2560 = 40 x 64: kernel-able
    x = rng.standard_normal((2, N)).astype(np.float32)
    mesh = make_mesh(batch=1, scale=8)
    kw = dict(n_fft=512, mesh=mesh, dtype='float32')
    try:
        p_x = ShardedSSQSTFT(N, **kw)
        assert not p_x.uses_bins_pipeline
        Tx_x, _ = p_x(x)
        configure(pallas_interpret=True)
        p_p = ShardedSSQSTFT(N, **kw)
        assert p_p.uses_bins_pipeline
        Tx_p, _ = p_p(x)
    finally:
        reset_config()
    Tx_x, Tx_p = _c2np(Tx_x), _c2np(Tx_p)
    m = max(np.abs(Tx_x).max(), 1e-9)
    assert np.abs(Tx_p.sum(-2) - Tx_x.sum(-2)).max() < 1e-4 * m
    e_p, e_x = np.abs(Tx_p).sum(), np.abs(Tx_x).sum()
    assert abs(e_p - e_x) / e_x < 5e-3


@needs_8
def test_sharded_stft_squeezing_modes():
    """'lebesgue' squeezing on the sharded path: bins from raw Sx,
    squeezed values scattered (the ADVICE r2 regression, sharded leg)."""
    N = 1024
    f0 = 0.12
    x = np.cos(2 * np.pi * f0 * np.arange(N))[None].astype(np.float64)
    mesh = make_mesh(batch=2, scale=4)
    x = np.concatenate([x, x])
    Tx, _, ssq_freqs, _ = sharded_ssq_stft(x, n_fft=256, mesh=mesh,
                                           squeezing='lebesgue')
    mag = np.abs(_c2np(Tx)[0])
    k_hat = int(np.argmax(mag[:, N // 4:3 * N // 4].sum(-1)))
    k_true = int(np.argmin(np.abs(np.asarray(ssq_freqs) - f0)))
    assert abs(k_hat - k_true) <= 1, (k_hat, k_true)


def test_sharded_ssq_stft2_equals_single():
    """Row-sharded FSST2 on the 8-device mesh equals offline ssq_stft2
    (bin-flip-tolerant map, tight column sums)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ssqueezepy_tpu.parallel import make_mesh, ShardedSSQSTFT2
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    mesh = make_mesh(batch=2, scale=4)
    plan = ShardedSSQSTFT2(1024, n_fft=128, mesh=mesh, dtype='float32')
    Tx_s, Sx_s = plan(x)
    Tx_1, Sx_1, fr_1, _ = stq.ssq_stft2(x, n_fft=128, astensor=False)
    assert np.abs(Sx_s.to_numpy() - Sx_1).max() < 1e-4
    # white noise + the order-2 chirp regression: w2 is a ratio of
    # differences of products, so f32 reduction-order changes flip more
    # boundary bins than first order — assert the flip-immune
    # invariants (column sums = inversion integrals; total |Tx| mass)
    Txs, Tx1 = Tx_s.to_numpy(), Tx_1
    assert np.abs(Txs.sum(-2) - Tx1.sum(-2)).max() < 1e-4
    e_s, e_1 = np.abs(Txs).sum(), np.abs(Tx1).sum()
    assert abs(e_s - e_1) / e_1 < 5e-3
    assert np.allclose(plan.ssq_freqs_out, fr_1)
