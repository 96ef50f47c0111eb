# -*- coding: utf-8 -*-
"""Three-axis Mesh(('batch','scale','time')) composition vs unsharded
(SURVEY.md §5.8; VERDICT r1 #8). Same-math-N-paths equality on the
8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel import FullShardedSSQCWT, make_mesh3

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _signal(N, B=2):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 6, N, endpoint=False)
    x = np.cos(2 * np.pi * 2 * np.exp(t / 2)).astype(np.float32)
    return np.stack([x + 0.05 * rng.standard_normal(N).astype(np.float32)
                     for _ in range(B)])


@pytest.mark.parametrize('mesh_shape', [(2, 2, 2), (1, 4, 2), (1, 2, 4),
                                        (2, 4, 1)])
@pytest.mark.parametrize('scales', ['log', 'log-piecewise'])
def test_full_sharded_matches_unsharded(mesh_shape, scales):
    b, s, t = mesh_shape
    N = 2048
    xb = _signal(N, B=max(2, b))
    mesh = make_mesh3(batch=b, scale=s, time=t)
    plan = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), scales,
                             nv=16, mesh=mesh)
    Tx = plan(xb).to_numpy()

    Tx_ref, *_ = stq.ssq_cwt(xb, ('gmw', {'dtype': 'float32'}),
                             scales=scales, nv=16, astensor=False)
    assert Tx.shape == Tx_ref.shape
    # elementwise: float32 bin-boundary flips + halo tails (6e-3 as in
    # the 2-axis suite / reference fft_test.py:449). A handful of cells
    # may flip to an adjacent bin between execution paths (the
    # reference's documented +-1-bin drift, algos.py:288-293) — allow
    # <= 0.01% such cells; column sums below catch real energy errors.
    frac_bad = (np.abs(Tx - Tx_ref) > 6e-3).mean()
    assert frac_bad < 1e-4, (mesh_shape, scales, frac_bad)
    # inversion integrals must agree tightly
    cs = np.abs(Tx.real.sum(-2) - Tx_ref.real.sum(-2)).max()
    assert cs < 1e-5, (mesh_shape, scales, cs)


def test_full_sharded_reconstructs():
    N = 4096
    xb = _signal(N)
    mesh = make_mesh3(batch=2, scale=2, time=2)
    plan = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                             nv=16, mesh=mesh)
    Tx = plan(xb).to_numpy()
    for b in range(2):
        err = stq.toolkit.mad_rms(xb[b], stq.issq_cwt(Tx[b]))
        assert err < 0.1, err


def test_full_sharded_exact_rows_replicated():
    """Plans with a tiny halo must classify exact rows and still match."""
    N = 2048
    xb = _signal(N, B=1)[:1]
    mesh = make_mesh3(batch=1, scale=4, time=2)
    plan = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                             nv=8, mesh=mesh, halo=128)
    assert plan.n_exact > 0
    Tx = plan(xb).to_numpy()
    Tx_ref, *_ = stq.ssq_cwt(xb, ('gmw', {'dtype': 'float32'}),
                             scales='log', nv=8, astensor=False)
    cs = np.abs(Tx.real.sum(-2) - Tx_ref.real.sum(-2)).max()
    assert cs < 1e-5, cs


def test_full_sharded_routes_through_bins_pipeline():
    """Force the Pallas dispatch (interpret mode) inside the 3-axis
    shard_map: the per-shard BINS fast pipeline (fused CWT kernel emits
    k, dWx never leaves VMEM, scatter_kv consumes k) must engage on the
    batch x scale x time mesh and reproduce the XLA-routed result
    (VERDICT r2 weak #5; same criterion as test_sharded.py's 2-axis
    route test)."""
    from ssqueezepy_tpu.configs import configure, reset_config
    N = 2048                      # n_up 4096 = 64 x 64: kernel-able
    xb = _signal(N, B=2)
    mesh = make_mesh3(batch=1, scale=4, time=2)
    kw = dict(nv=8, mesh=mesh)
    try:
        p_x = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                                **kw)
        assert not p_x.uses_bins_pipeline
        Tx_x = p_x(xb).to_numpy()
        configure(pallas_interpret=True)
        p_p = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                                **kw)
        assert p_p.uses_bins_pipeline
        Tx_p = p_p(xb).to_numpy()
    finally:
        reset_config()
    # column sums (inversion integrals) invariant to the +-1-bin flips
    # the low-precision derivative pipeline may introduce; total energy
    # preserved (criterion of test_sharded._bins_route_criterion)
    m = max(np.abs(Tx_x).max(), 1e-9)
    assert np.abs(Tx_p.sum(-2) - Tx_x.sum(-2)).max() < 1e-4 * m
    e_p, e_x = np.abs(Tx_p).sum(), np.abs(Tx_x).sum()
    assert abs(e_p - e_x) / e_x < 5e-3
