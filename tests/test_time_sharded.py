# -*- coding: utf-8 -*-
"""Time-sharded (context-parallel) CWT vs the unsharded transform.

The "same math, N execution paths, assert allclose" pattern (SURVEY.md
§4.2): overlap-save chunked convolution with ring halo exchange must match
the global FFT convolution up to the wavelet's decay tail beyond the halo.
"""
import numpy as np
import pytest
import jax

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel import (TimeShardedSSQCWT, make_mesh_time,
                                     time_sharded_cwt)


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _signal(N, B=2):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 6, N, endpoint=False)
    x = np.cos(2 * np.pi * 2 * np.exp(t / 2)).astype(np.float32)
    xb = np.stack([x + 0.05 * rng.standard_normal(N).astype(np.float32)
                   for _ in range(B)])
    return xb


def test_time_sharded_cwt_matches_unsharded():
    N = 4096
    xb = _signal(N)
    mesh = make_mesh_time(batch=2, time=4)

    Wx_sh, scales = time_sharded_cwt(xb, 'gmw', scales='log', nv=16,
                                     mesh=mesh)
    Wx_sh = Wx_sh.to_numpy()

    Wx_ref, scales_ref = stq.cwt(xb, 'gmw', scales='log', nv=16,
                                 astensor=False)
    assert np.allclose(scales, scales_ref)

    # interior columns (halo-width margin at the two signal edges)
    plan_halo = N // 4  # chunk C = 1024; halo <= C
    m = 64
    a = np.abs(Wx_sh[..., m:-m] - Wx_ref[..., m:-m])
    scale_mag = np.abs(Wx_ref).max()
    rel = a.max() / scale_mag
    assert rel < 5e-3, rel


def test_time_sharded_ssq_cwt_reconstructs():
    N = 4096
    xb = _signal(N)
    mesh = make_mesh_time(batch=2, time=4)
    plan = TimeShardedSSQCWT(N, 'gmw', scales='log', nv=16, mesh=mesh)
    Tx, Wx, dWx = plan(xb)
    Tx = Tx.to_numpy()

    # reconstruction: x = Re(sum(Tx)) * 2/Css (reference _ssq_cwt.py:368)
    for b in range(xb.shape[0]):
        xrec = stq.issq_cwt(Tx[b])
        err = stq.toolkit.mad_rms(xb[b], xrec)
        assert err < 0.1, err

    # vs unsharded ssq_cwt: compare column energy sums (elementwise bins
    # may differ by the documented +-1-bin float drift)
    Tx_ref, *_ = stq.ssq_cwt(xb, ('gmw', {'dtype': 'float32'}),
                             scales='log', nv=16, astensor=False)
    cs_sh = Tx.real.sum(axis=-2)
    cs_ref = Tx_ref.real.sum(axis=-2)
    m = 256
    num = np.abs(cs_sh[..., m:-m] - cs_ref[..., m:-m]).max()
    den = np.abs(cs_ref).max()
    assert num / den < 5e-2, num / den


def test_time_sharded_vs_mesh_shapes():
    N = 2048
    xb = _signal(N, B=4)
    mesh = make_mesh_time(batch=4, time=2)
    plan = TimeShardedSSQCWT(N, 'gmw', scales='log', nv=8, mesh=mesh)
    Tx, Wx, dWx = plan(xb)
    assert Tx.shape == (4, len(plan.scales_np), N)
    assert Wx.shape == (4, len(plan.scales_np), N)


@pytest.mark.parametrize('scales,mesh_shape', [
    ('log-piecewise', (2, 4)), ('log-piecewise', (1, 8)),
    ('log', (1, 8)), ('linear', (2, 4)),
])
def test_time_sharded_cwt_scaletypes(scales, mesh_shape):
    """Overlap-save equality across scale types and mesh shapes
    (VERDICT r1 #10: log-piecewise was untested though supported)."""
    N = 4096
    b, t = mesh_shape
    xb = _signal(N, B=max(b, 2) if b > 1 else 1)
    if b == 1:
        xb = xb[:1]
    mesh = make_mesh_time(batch=b, time=t)

    Wx_sh, scales_out = time_sharded_cwt(xb, 'gmw', scales=scales, nv=16,
                                         mesh=mesh)
    Wx_sh = Wx_sh.to_numpy()
    Wx_ref, scales_ref = stq.cwt(xb, 'gmw', scales=scales, nv=16,
                                 astensor=False)
    assert np.allclose(scales_out, scales_ref)
    m = 64
    rel = (np.abs(Wx_sh[..., m:-m] - Wx_ref[..., m:-m]).max()
           / np.abs(Wx_ref).max())
    # tighter than the r1 suite's 5e-3: halo truncation tails only
    assert rel < 1e-3, (scales, mesh_shape, rel)


def test_time_sharded_small_halo_triggers_allgather():
    """A halo too small for the largest scales must route those rows
    through the exact all-gather path (regression for the over-support
    branch, time_sharded.py) and still match the unsharded transform."""
    N = 2048
    xb = _signal(N, B=1)[:1]
    mesh = make_mesh_time(batch=1, time=8)  # chunks of 256
    plan = TimeShardedSSQCWT(N, 'gmw', scales='log', nv=16, mesh=mesh,
                             halo=96)
    # the plan MUST have split the scales: some local, some global
    assert 0 < plan.n_local < len(plan.scales_np), \
        (plan.n_local, len(plan.scales_np))
    _, Wx, _ = plan(xb)
    Wx_sh = Wx.to_numpy()
    Wx_ref, _ = stq.cwt(xb, 'gmw', scales='log', nv=16, astensor=False)
    m = 64
    rel = (np.abs(Wx_sh[..., m:-m] - Wx_ref[..., m:-m]).max()
           / np.abs(Wx_ref).max())
    assert rel < 2e-3, rel
    # the over-support (all-gathered) rows specifically must be EXACT
    # (same global convolution), not just tail-accurate
    g = plan.n_local
    rel_g = (np.abs(Wx_sh[..., g:, :] - Wx_ref[..., g:, :]).max()
             / max(np.abs(Wx_ref[..., g:, :]).max(), 1e-9))
    assert rel_g < 2e-5, rel_g


def test_time_sharded_ssq_log_piecewise_reconstructs():
    N = 4096
    xb = _signal(N)
    mesh = make_mesh_time(batch=2, time=4)
    plan = TimeShardedSSQCWT(N, 'gmw', scales='log-piecewise', nv=16,
                             mesh=mesh)
    Tx, _, _ = plan(xb)
    Tx = Tx.to_numpy()
    for b in range(xb.shape[0]):
        err = stq.toolkit.mad_rms(xb[b], stq.issq_cwt(Tx[b]))
        assert err < 0.1, err
