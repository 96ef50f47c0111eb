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
