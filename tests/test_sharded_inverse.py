# -*- coding: utf-8 -*-
"""Sharded inverse transforms: round-trips on the 8-device mesh must
match single-chip inverses (reference inverses are single-device —
_cwt.py:323, _ssq_cwt.py:313; the scale/bin sum here is one psum)."""
import numpy as np
import jax
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel import (make_mesh, sharded_ssq_cwt,
                                     sharded_icwt, sharded_issq_cwt)
from ssqueezepy_tpu.toolkit import mad_rms

rng = np.random.default_rng(0)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
@pytest.mark.parametrize("scales", ['log', 'log-piecewise', 'linear'])
def test_sharded_icwt_roundtrip(scales):
    N = 512
    t = np.linspace(0, 4, N, endpoint=False)
    x = (np.cos(2 * np.pi * 14 * t) +
         np.sin(2 * np.pi * 30 * t ** 1.2)).astype(np.float32)
    xb = np.stack([x, x[::-1]])
    mesh = make_mesh(batch=2, scale=4)
    wav = ('gmw', {'dtype': 'float32'})

    Wx_s, sc = stq.parallel.sharded_cwt(xb, wav, scales, nv=16, mesh=mesh)
    # x_mean=0 for the cross-path comparison: the single-chip
    # log-piecewise recursion double-adds x_mean (a reference quirk,
    # _cwt.py:423-429) which sharded_icwt deliberately does not mirror
    xr_s = sharded_icwt(Wx_s, wav, scales=sc, mesh=mesh)
    # single-chip reference path
    for b in range(2):
        Wx1, sc1 = stq.cwt(xb[b], wav, scales=scales, nv=16,
                           astensor=False)
        xr1 = stq.icwt(Wx1, wav, scales=sc1, one_int=True)
        assert np.abs(xr_s[b] - xr1).max() < 5e-4 * max(
            1.0, np.abs(xr1).max())
        if scales != 'linear':
            assert mad_rms(xb[b], xr_s[b]) < .1
        else:
            # linear-grid one-integral inversion is intrinsically poor
            # for this signal (~.55 on the single-chip path too);
            # require parity, not absolute quality
            assert abs(mad_rms(xb[b], xr_s[b])
                       - mad_rms(xb[b], xr1)) < 1e-3


@needs_8
def test_sharded_issq_cwt_roundtrip():
    N = 512
    t = np.linspace(0, 4, N, endpoint=False)
    x = np.cos(2 * np.pi * 16 * t).astype(np.float32)
    xb = np.stack([x, -x])
    mesh = make_mesh(batch=2, scale=4)
    wav = ('gmw', {'dtype': 'float32'})

    Tx_s, Wx_s, *_ = sharded_ssq_cwt(xb, wav, 'log-piecewise', nv=16,
                                     mesh=mesh)
    xr_s = sharded_issq_cwt(Tx_s, wav, mesh=mesh)
    for b in range(2):
        xr1 = stq.issq_cwt(stq.ssq_cwt(xb[b], wav, nv=16,
                                       astensor=False)[0], wav)
        assert np.abs(xr_s[b] - xr1).max() < 5e-4 * max(
            1.0, np.abs(xr1).max())
        assert mad_rms(xb[b], xr_s[b]) < .1
