# -*- coding: utf-8 -*-
"""Octave-cascaded (multirate) streaming SSQ-CWT vs the offline
transforms. The decimated rows must match offline to halfband-cascade
precision; the plan's alignment arithmetic (analysis + interpolation
group delays) is asserted via direct row equality, and reconstruction
must match the offline round trip."""
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.streaming import _drive
from ssqueezepy_tpu.streaming_multirate import StreamingMultirateSSQCWT


def _chirp(N, f0=0.001, f1=0.15):
    n = np.arange(N)
    return np.cos(2 * np.pi * (f0 * n + (f1 - f0) / (2 * N) * n ** 2)) \
        .astype(np.float32)


def _scales(smax=256., n=161):
    return np.geomspace(1., smax, n).reshape(-1, 1).astype(np.float64)


def test_multirate_rows_match_offline():
    """Per-row equality: octave-0 rows at full precision, decimated rows
    at halfband-cascade precision (~1e-4), interior columns."""
    N, chunk = 16384, 1024
    x = _chirp(N)
    plan = StreamingMultirateSSQCWT(chunk, 'gmw', scales=_scales(),
                                    nv=None, N=N, ssq=False)
    assert plan.octaves.max() >= 3          # cascade actually engaged
    _, Wx = _drive(plan, x, chunk)
    Wx = Wx.to_numpy()
    assert Wx.shape[-1] == N

    Wo, sc = stq.cwt(x, 'gmw', scales=_scales(), nv=None,
                     astensor=False)
    mag = np.abs(Wo).max()
    sup = np.ceil(plan.support_np).astype(int)
    checked = 0
    for i in range(len(sc)):
        m = min(int(sup[i]) + 64, N // 2 - 128)
        rel = np.abs(Wx[i, m:N - m] - Wo[i, m:N - m]).max() / mag
        assert rel < 1e-3, (i, int(plan.octaves[i]), rel)
        checked += 1
    assert checked == len(sc)


def test_multirate_ssq_reconstructs_and_matches():
    N, chunk = 16384, 1024
    x = _chirp(N)
    scales = np.geomspace(1., 512., 181).reshape(-1, 1)
    plan = StreamingMultirateSSQCWT(chunk, 'gmw', scales=scales,
                                    nv=None, N=N)
    Tx, _ = _drive(plan, x, chunk)
    Tx = Tx.to_numpy()
    assert Tx.shape[-1] == N

    xr = np.asarray(stq.issq_cwt(Tx))
    err = stq.toolkit.mad_rms(x, xr)
    assert err < 0.05, err

    Tx_o, *_ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                           scales=scales, nv=None, astensor=False)
    m = 6000
    rel = (np.abs(Tx.real.sum(-2)[m:-m] - Tx_o.real.sum(-2)[m:-m]).max()
           / np.abs(Tx_o).max())
    assert rel < 1e-3, rel


def test_multirate_lookahead_exceeds_signal():
    """Regression: when the derived lookahead exceeds the total samples
    fed, the finalize flush must still emit exactly N columns (the
    emission cursor clamps to the real signal range)."""
    N, chunk = 4096, 512
    x = _chirp(N)
    scales = np.geomspace(1., 256., 41).reshape(-1, 1)
    plan = StreamingMultirateSSQCWT(chunk, 'gmw', scales=scales,
                                    nv=None, N=N)
    assert plan.lookahead > N - chunk        # the regression's setup
    Tx, Wx = _drive(plan, x, chunk)
    assert Wx.re.shape[-1] == N
    assert Tx.re.shape[-1] == N


def test_multirate_lookahead_cap_raises():
    with pytest.raises(ValueError):
        StreamingMultirateSSQCWT(512, 'gmw',
                                 scales=np.geomspace(1., 256., 41)
                                 .reshape(-1, 1),
                                 nv=None, N=4096, lookahead=100)


def test_multirate_compute_ratio_and_geometry():
    plan = StreamingMultirateSSQCWT(1024, 'gmw', scales=_scales(),
                                    nv=None, N=16384, ssq=False)
    # a full 'log'-range set must put most rows on decimated octaves
    assert plan.compute_ratio < 0.6
    assert plan.history >= plan._ctx[0]
    # geometry invariants: every octave's margins fit its window
    for j, (a, o, L, M) in plan._geo.items():
        assert a >= plan._ctx[j]
        assert a + L + plan._ctx[j] <= M
        assert 0 <= o < 2 ** j


def test_multirate_batched_matches_single():
    """Batched rows equal the single-signal plan (Wx to float rounding;
    Tx via the bin-flip-invariant column sums)."""
    N, chunk = 8192, 1024
    n = np.arange(N)
    x1 = _chirp(N, 0.005, 0.1)
    x2 = np.sin(2 * np.pi * 0.03 * n).astype(np.float32)
    scales = np.geomspace(1., 128., 85).reshape(-1, 1)
    plan = StreamingMultirateSSQCWT(chunk, 'gmw', scales=scales,
                                    nv=None, N=N)
    Txb, Wxb = _drive(plan, np.stack([x1, x2]), chunk)
    plan1 = StreamingMultirateSSQCWT(chunk, 'gmw', scales=scales,
                                     nv=None, N=N)
    Tx1, Wx1 = _drive(plan1, x1, chunk)
    w0, w1 = np.asarray(Wxb.re)[0], np.asarray(Wx1.re)
    assert np.abs(w0 - w1).max() / np.abs(w1).max() < 1e-5
    cs0 = np.asarray(Txb.re)[0].sum(-2)
    cs1 = np.asarray(Tx1.re).sum(-2)
    assert np.abs(cs0 - cs1).max() / max(np.abs(cs1).max(), 1e-9) < 1e-4
