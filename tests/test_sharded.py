# -*- coding: utf-8 -*-
"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The TPU analog of the reference's CPU-vs-GPU equality tests: 1-chip vs
n-chip-sharded outputs must match (SURVEY.md §4.2).
"""
import numpy as np
import jax
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel import (make_mesh, sharded_ssq_cwt,
                                     sharded_cwt, dryrun_multichip)

rng = np.random.default_rng(0)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_sharded_cwt_equals_single():
    x = rng.standard_normal((4, 512)).astype(np.float32)
    mesh = make_mesh(batch=2, scale=4)
    Wx_s, sc_s = sharded_cwt(x, ('gmw', {'dtype': 'float32'}), 'log',
                             nv=16, mesh=mesh)
    Wx_1, sc_1 = stq.cwt(x, ('gmw', {'dtype': 'float32'}), scales='log',
                         nv=16, astensor=False)
    assert np.abs(Wx_s.to_numpy() - Wx_1).max() < 1e-5
    assert np.allclose(sc_s, sc_1)


@needs_8
@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_ssq_cwt_equals_single(mesh_shape):
    b, s = mesh_shape
    x = rng.standard_normal((4, 512)).astype(np.float32)
    mesh = make_mesh(batch=b, scale=s)
    Tx_s, Wx_s, sf_s, sc_s = sharded_ssq_cwt(
        x, ('gmw', {'dtype': 'float32'}), 'log', nv=16, mesh=mesh)
    Tx_1, Wx_1, sf_1, sc_1 = stq.ssq_cwt(
        x, ('gmw', {'dtype': 'float32'}), scales='log', nv=16,
        astensor=False)
    # float32 bin-boundary rounding may flip single bins between
    # execution paths; the reference's own CPU-vs-GPU ssq_cwt test uses
    # atol=6e-3 for float32 (fft_test.py:449) - same criterion here
    assert np.abs(Tx_s.to_numpy() - Tx_1).max() < 6e-3
    assert np.abs(Wx_s.to_numpy() - Wx_1).max() < 1e-5
    # column sums (inversion integrals) must agree tightly - immune to
    # bin flips
    assert np.abs(Tx_s.to_numpy().sum(-2) - Tx_1.sum(-2)).max() < 1e-5
    assert np.allclose(sf_s, sf_1)


@needs_8
def test_scale_padding_nondivisible():
    """Scale counts not divisible by the mesh axis are padded; results
    must still match single-chip."""
    x = rng.standard_normal((2, 256)).astype(np.float32)
    mesh = make_mesh(batch=1, scale=8)
    # log scales at nv=12 gives a count unlikely divisible by 8
    Tx_s, Wx_s, sf_s, sc_s = sharded_ssq_cwt(
        x, ('gmw', {'dtype': 'float32'}), 'log', nv=12, mesh=mesh)
    Tx_1, Wx_1, *_ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                                 scales='log', nv=12, astensor=False)
    assert Wx_s.shape == Wx_1.shape
    assert np.abs(Tx_s.to_numpy() - Tx_1).max() < 6e-3
    assert np.abs(Tx_s.to_numpy().sum(-2) - Tx_1.sum(-2)).max() < 1e-5


@needs_8
def test_dryrun_multichip():
    assert dryrun_multichip(8)


def _bins_route_criterion(Tx_p, Tx_x, atol_scale=1e-4):
    """Cross-path equality criterion for the bins fast pipeline: column
    sums (the inversion integrals) are invariant to the +-1 bin flips
    the low-precision derivative pipeline is allowed (the same criterion
    the single-chip end-to-end tests use, test_ssq_pallas.py:596); total
    energy must also be preserved to the same tolerance."""
    m = max(np.abs(Tx_x).max(), 1e-9)
    assert np.abs(Tx_p.sum(-2) - Tx_x.sum(-2)).max() < atol_scale * m
    e_p, e_x = np.abs(Tx_p).sum(), np.abs(Tx_x).sum()
    assert abs(e_p - e_x) / e_x < 5e-3


@needs_8
def test_sharded_ssq_routes_through_bins_pipeline():
    """Force the Pallas dispatch (interpret mode) inside shard_map: the
    per-shard BINS fast pipeline (fused CWT kernel emits k, dWx never
    leaves VMEM, scatter_kv consumes k) must engage on the scale-sharded
    mesh and reproduce the XLA-sharded result (VERDICT r2 #2)."""
    from ssqueezepy_tpu.configs import configure, reset_config
    from ssqueezepy_tpu.parallel.sharded import ShardedSSQCWT
    N = 2048                      # n_up 4096 = 64 x 64: kernel-able
    x = rng.standard_normal((2, N)).astype(np.float32)
    mesh = make_mesh(batch=1, scale=8)
    kw = dict(nv=8, mesh=mesh)
    try:
        p_x = ShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log', **kw)
        assert not p_x.uses_bins_pipeline
        Tx_x, _ = p_x(x)
        configure(pallas_interpret=True)
        p_p = ShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log', **kw)
        assert p_p.uses_bins_pipeline
        Tx_p, _ = p_p(x)
    finally:
        reset_config()
    _bins_route_criterion(Tx_p.to_numpy(), Tx_x.to_numpy())


@needs_8
def test_time_sharded_routes_through_bins_pipeline():
    from ssqueezepy_tpu.configs import configure, reset_config
    from ssqueezepy_tpu.parallel.time_sharded import (TimeShardedSSQCWT,
                                                      make_mesh_time)
    N = 16384                     # C=2048, halo 1024 -> n_up 4096
    x = rng.standard_normal((2, N)).astype(np.float32)
    mesh = make_mesh_time(batch=1, time=8)
    kw = dict(nv=8, mesh=mesh, halo=1024, derivative=False)
    try:
        p1 = TimeShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               **kw)
        assert not p1.uses_bins_pipeline
        Tx_x, _ = p1(x)
        configure(pallas_interpret=True)
        p2 = TimeShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               **kw)
        assert p2.uses_bins_pipeline
        Tx_p, _ = p2(x)
    finally:
        reset_config()
    _bins_route_criterion(Tx_p.to_numpy(), Tx_x.to_numpy())


@needs_8
def test_full_sharded_routes_through_bins_pipeline():
    """The 3-axis composition must hit the kernel dispatch too
    (VERDICT r2 weak #5)."""
    from ssqueezepy_tpu.configs import configure, reset_config
    from ssqueezepy_tpu.parallel.full_sharded import (FullShardedSSQCWT,
                                                      make_mesh3)
    N = 8192                      # C=4096, halo 2048 -> n_up 8192
    x = rng.standard_normal((2, N)).astype(np.float32)
    mesh = make_mesh3(batch=2, scale=2, time=2)
    kw = dict(nv=8, mesh=mesh, halo=2048)
    try:
        p1 = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               **kw)
        assert not p1.uses_bins_pipeline
        Tx_x = p1(x)
        configure(pallas_interpret=True)
        p2 = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               **kw)
        assert p2.uses_bins_pipeline
        Tx_p = p2(x)
    finally:
        reset_config()
    _bins_route_criterion(Tx_p.to_numpy(), Tx_x.to_numpy())


@needs_8
def test_distributed_single_host_smoke():
    """Multi-host layer, single-host degeneration (SURVEY.md §5.8): the
    bootstrap is a no-op and the host x chip mesh spans (1, n_local)."""
    from ssqueezepy_tpu.parallel import (init_distributed,
                                         make_host_chip_mesh)
    pidx, pcnt = init_distributed()
    assert pidx == 0 and pcnt == 1
    mesh = make_host_chip_mesh('scale')
    assert mesh.axis_names == ('batch', 'scale')
    assert mesh.devices.shape == (1, len(jax.devices()))
    mesh_t = make_host_chip_mesh('time')
    assert mesh_t.axis_names == ('batch', 'time')
