# -*- coding: utf-8 -*-
"""Streaming (chunked online) CWT / SSQ-CWT vs the offline transforms.

Equality criterion (same family as test_time_sharded.py): a streamed
column matches the offline transform when the scale row's time support
fits the (history, lookahead) context AND the column is at least one
support away from the global signal edges (the two paths extend the
signal differently there: repeated chunk reflection vs whole-signal
reflection). `support_np` / `n_reliable` expose exactly this contract.
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.streaming import StreamingSSQCWT, _drive


rng = np.random.default_rng(7)


def _chirp(N, f0=0.02, f1=0.18):
    """Linear chirp f0 -> f1 cycles/sample: content lives at scales
    roughly [wc/(2*pi*f1), wc/(2*pi*f0)] — inside `_scales` below."""
    n = np.arange(N)
    return np.cos(2 * np.pi * (f0 * n + (f1 - f0) / (2 * N) * n ** 2)) \
        .astype(np.float32)


def _scales(smax=64., n=97):
    # bounded support: largest scale's time support ~ 8 * 3.5 * smax
    return np.geomspace(1., smax, n).reshape(-1, 1).astype(np.float64)


def test_stream_cwt_matches_offline():
    N, chunk, ctx = 4096, 1024, 2048
    x = _chirp(N)
    plan = StreamingSSQCWT(chunk, 'gmw', scales=_scales(), nv=None, N=N,
                           history=ctx, lookahead=ctx, ssq=False)
    assert plan.n_reliable == len(plan.scales_np)
    _, Wx_s = _drive(plan, x, chunk)
    Wx_s = Wx_s.to_numpy()

    Wx_ref, scales_ref = stq.cwt(x, 'gmw', scales=_scales(), nv=None,
                                 astensor=False)
    assert np.allclose(plan.scales_np.squeeze(), scales_ref.squeeze())
    assert Wx_s.shape == Wx_ref.shape

    mag = np.abs(Wx_ref).max()
    sup = np.ceil(plan.support_np).astype(int)
    checked = 0
    for i in range(len(sup)):
        m = min(sup[i], ctx)
        if N - 2 * m < 64:
            continue
        rel = np.abs(Wx_s[i, m:N - m] - Wx_ref[i, m:N - m]).max() / mag
        assert rel < 5e-3, (i, rel)
        checked += 1
    assert checked > 64


def test_stream_ssq_cwt_reconstructs_and_matches():
    N, chunk, ctx = 4096, 1024, 2048
    x = _chirp(N)
    Tx, Wx, ssq_freqs, scales = stq.stream_ssq_cwt(
        x, chunk, ('gmw', {'dtype': 'float32'}), scales=_scales(), nv=None,
        history=ctx, lookahead=ctx)
    Tx = Tx.to_numpy()
    assert Tx.shape[-1] == N

    xrec = stq.issq_cwt(Tx)
    err = stq.toolkit.mad_rms(x, xrec)
    assert err < 0.1, err

    Tx_ref, *_ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                             scales=_scales(), nv=None, astensor=False)
    cs_s = Tx.real.sum(axis=-2)
    cs_ref = Tx_ref.real.sum(axis=-2)
    m = 1792  # one max-support margin (~8*3.5*64) from each global edge
    num = np.abs(cs_s[m:-m] - cs_ref[m:-m]).max()
    den = np.abs(cs_ref).max()
    assert num / den < 5e-2, num / den


def test_stream_emission_schedule():
    N, chunk = 2048, 512
    x = _chirp(N)
    plan = StreamingSSQCWT(chunk, 'gmw', scales=_scales(32., 41), nv=None, N=N,
                           lookahead=100)
    assert plan.lookahead == 100
    cols = []
    for i in range(N // chunk):
        Tx_c, Wx_c = plan.process(x[i * chunk:(i + 1) * chunk])
        assert Tx_c.re.shape == Wx_c.re.shape
        cols.append(Tx_c.re.shape[-1])
    Tx_t, _ = plan.finalize()
    cols.append(Tx_t.re.shape[-1])
    assert cols == [chunk - 100] + [chunk] * (N // chunk - 1) + [100]
    assert sum(cols) == N
    with pytest.raises(RuntimeError):
        plan.process(x[:chunk])


def test_stream_lookahead_exceeds_chunk():
    """lookahead > chunk: the emit region trails by multiple chunks, the
    first calls emit zero columns, finalize flushes over several
    synthetic chunks — total emission is exactly one column per sample."""
    N, chunk, look = 1024, 256, 600
    x = _chirp(N)
    plan = StreamingSSQCWT(chunk, 'gmw', scales=_scales(16., 25), nv=None, N=N,
                           history=512, lookahead=look)
    cols = []
    for i in range(N // chunk):
        Tx_c, _ = plan.process(x[i * chunk:(i + 1) * chunk])
        cols.append(Tx_c.re.shape[-1])
    assert cols == [0, 0, 168, 256]
    Tx_t, _ = plan.finalize()
    assert Tx_t.re.shape[-1] == look
    assert sum(cols) + look == N


def test_stream_zero_lookahead():
    N, chunk = 1024, 256
    x = _chirp(N)
    plan = StreamingSSQCWT(chunk, 'gmw', scales=_scales(16., 25), nv=None, N=N,
                           lookahead=0)
    total = 0
    for i in range(N // chunk):
        Tx_c, _ = plan.process(x[i * chunk:(i + 1) * chunk])
        assert Tx_c.re.shape[-1] == chunk
        total += Tx_c.re.shape[-1]
    Tx_t, Wx_t = plan.finalize()
    assert Tx_t is None and Wx_t is None
    assert total == N


def test_stream_batched_and_reset():
    N, chunk = 2048, 512
    xb = np.stack([_chirp(N),
                   _chirp(N) + 0.05 * rng.standard_normal(N)
                   .astype(np.float32)])
    plan = StreamingSSQCWT(chunk, 'gmw', scales=_scales(32., 41), nv=None, N=N)
    parts1 = [plan.process(xb[:, i * chunk:(i + 1) * chunk])[0].re
              for i in range(N // chunk)]
    assert parts1[0].shape[0] == 2

    plan.reset()
    parts2 = [plan.process(xb[:, i * chunk:(i + 1) * chunk])[0].re
              for i in range(N // chunk)]
    for a, b in zip(parts1, parts2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_stream_bins_pipeline_interpret():
    """Force the Pallas dispatch (interpret mode): the streaming body
    must route through the bins fast pipeline and reproduce the XLA
    path under the same column-sum criterion the sharded tests use
    (test_sharded.py::_bins_route_criterion)."""
    from ssqueezepy_tpu.configs import configure, reset_config
    N, chunk = 2048, 1024
    x = _chirp(N)
    # history + chunk + lookahead = 4096 exactly (a kernel-able 64x64
    # fft length, no extra padding)
    kw = dict(scales=_scales(32., 41), nv=None, N=N, history=2048, lookahead=1024)
    try:
        p_x = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}), **kw)
        assert not p_x.uses_bins_pipeline
        tx1 = [p_x.process(x[:chunk])[0], p_x.process(x[chunk:])[0],
               p_x.finalize()[0]]
        configure(pallas_interpret=True)
        p_p = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}), **kw)
        assert p_p.uses_bins_pipeline
        tx2 = [p_p.process(x[:chunk])[0], p_p.process(x[chunk:])[0],
               p_p.finalize()[0]]
    finally:
        reset_config()
    Tx_x = np.concatenate([t.to_numpy() for t in tx1], axis=-1)
    Tx_p = np.concatenate([t.to_numpy() for t in tx2], axis=-1)
    assert Tx_x.shape[-1] == N and Tx_p.shape[-1] == N
    m = max(np.abs(Tx_x).max(), 1e-9)
    assert np.abs(Tx_p.sum(-2) - Tx_x.sum(-2)).max() < 1e-4 * m
    e_p, e_x = np.abs(Tx_p).sum(), np.abs(Tx_x).sum()
    assert abs(e_p - e_x) / e_x < 5e-3


def test_stream_stft_exact():
    """STFT kernels have finite support (n_fft), so streaming is EXACT
    vs the offline transform — all columns including the global edges
    (chunk >= n_fft: edge reflections draw on identical samples)."""
    N, chunk, n_fft = 4096, 1024, 256
    x = _chirp(N)
    Sx_s = stq.stream_stft(x, chunk, n_fft=n_fft).to_numpy()
    Sx_o = stq.stft(x, n_fft=n_fft).to_numpy()
    assert Sx_s.shape == Sx_o.shape == (n_fft // 2 + 1, N)
    rel = np.abs(Sx_s - Sx_o).max() / np.abs(Sx_o).max()
    assert rel < 1e-5, rel


def test_stream_ssq_stft_matches_and_reconstructs():
    N, chunk, n_fft = 4096, 1024, 256
    x = _chirp(N)
    Tx, Sx, fr, Sfs = stq.stream_ssq_stft(x, chunk, n_fft=n_fft)
    Tx = Tx.to_numpy()
    assert Tx.shape[-1] == N

    Tx_o, *_ = stq.ssq_stft(x, n_fft=n_fft, astensor=False)
    cm = np.abs(Tx.sum(-2) - Tx_o.sum(-2)).max() / np.abs(Tx_o).max()
    assert cm < 1e-4, cm

    xr = np.asarray(stq.issq_stft(Tx, n_fft=n_fft))
    assert stq.toolkit.mad_rms(x, xr) < 0.05


def test_stream_stft_latency_geometry():
    """Context is pinned by the conv pad arithmetic: history + lookahead
    == n_fft - 1, emission covers every sample."""
    from ssqueezepy_tpu.streaming import StreamingSSQSTFT
    N, chunk, n_fft = 2048, 512, 128
    x = _chirp(N)
    plan = StreamingSSQSTFT(chunk, n_fft=n_fft)
    assert plan.history + plan.lookahead == n_fft - 1
    cols = []
    for i in range(N // chunk):
        Tx_c, Sx_c = plan.process(x[i * chunk:(i + 1) * chunk])
        assert Tx_c.re.shape == Sx_c.re.shape
        cols.append(Tx_c.re.shape[-1])
    Tx_t, _ = plan.finalize()
    cols.append(Tx_t.re.shape[-1])
    assert sum(cols) == N
    assert cols[0] == chunk - plan.lookahead and cols[-1] == plan.lookahead


def test_stream_ssq_stft_bins_pipeline_interpret():
    """Interpret-mode Pallas: the streaming STFT body must route through
    the conv-STFT bins kernel + k-consuming scatter."""
    from ssqueezepy_tpu.configs import configure, reset_config
    from ssqueezepy_tpu.streaming import StreamingSSQSTFT
    N, chunk, n_fft = 2048, 1024, 256
    x = _chirp(N)
    kw = dict(n_fft=n_fft, dtype='float32')
    try:
        p_x = StreamingSSQSTFT(chunk, **kw)
        assert not p_x.uses_bins_pipeline
        tx1 = [p_x.process(x[:chunk])[0], p_x.process(x[chunk:])[0],
               p_x.finalize()[0]]
        configure(pallas_interpret=True)
        p_p = StreamingSSQSTFT(chunk, **kw)
        assert p_p.uses_bins_pipeline
        tx2 = [p_p.process(x[:chunk])[0], p_p.process(x[chunk:])[0],
               p_p.finalize()[0]]
    finally:
        reset_config()
    Tx_x = np.concatenate([t.to_numpy() for t in tx1], axis=-1)
    Tx_p = np.concatenate([t.to_numpy() for t in tx2], axis=-1)
    m = max(np.abs(Tx_x).max(), 1e-9)
    assert np.abs(Tx_p.sum(-2) - Tx_x.sum(-2)).max() < 1e-4 * m
    e_p, e_x = np.abs(Tx_p).sum(), np.abs(Tx_x).sum()
    assert abs(e_p - e_x) / e_x < 5e-3


@pytest.mark.parametrize('wav,tol', [('morlet', 5e-3),
                                     (('gmw', {'dtype': 'float64'}), 1e-4)])
def test_stream_cwt_wavelet_variants(wav, tol):
    """Non-analytic wavelet (morlet: XLA fallback body) and float64."""
    N, chunk = 2048, 512
    x = _chirp(N)
    scales = _scales(16., 25)
    Wx_s, _ = stq.stream_cwt(x, chunk, wav, scales=scales, nv=None, N=N)
    Wx_o, _ = stq.cwt(x, wav, scales=scales, nv=None, astensor=False)
    Wx_s = Wx_s.to_numpy()
    m = 512
    rel = (np.abs(Wx_s[..., m:-m] - Wx_o[..., m:-m]).max()
           / np.abs(Wx_o).max())
    assert rel < tol, rel


@pytest.mark.parametrize('kw', [dict(n_fft=256, modulated=False),
                                dict(n_fft=255),
                                dict(n_fft=256, fs=100.)])
def test_stream_stft_variants(kw):
    """Unmodulated, odd n_fft, and physical fs all stay exact."""
    N, chunk = 2048, 512
    x = _chirp(N)
    Sx_s = stq.stream_stft(x, chunk, **kw).to_numpy()
    Sx_o = stq.stft(x, **kw).to_numpy()
    rel = np.abs(Sx_s - Sx_o).max() / np.abs(Sx_o).max()
    assert rel < 1e-5, (kw, rel)


def test_stream_ssq_stft2_matches_offline():
    """Streaming FSST2 is exact: all five analysis windows share the
    same n_fft support, so emitted columns equal offline `ssq_stft2` up
    to FFT rounding (same criterion as the first-order streaming STFT).
    """
    N, chunk, n_fft = 4096, 1024, 256
    x = _chirp(N)
    Tx, Sx, fr, Sfs = stq.stream_ssq_stft2(x, chunk, n_fft=n_fft)
    Tx, Sx = Tx.to_numpy(), Sx.to_numpy()
    assert Tx.shape[-1] == Sx.shape[-1] == N

    Tx_o, Sx_o, *_ = stq.ssq_stft2(x, n_fft=n_fft, astensor=False)
    rel = np.abs(Sx - Sx_o).max() / np.abs(Sx_o).max()
    assert rel < 1e-5, rel
    # column sums (the inversion integrals) — immune to the +-1-bin
    # flips different FFT lengths' rounding induces on boundary cells
    # (the same criterion as the first-order streaming test above)
    cm = np.abs(Tx.sum(-2) - Tx_o.sum(-2)).max() / np.abs(Tx_o).max()
    assert cm < 1e-4, cm

    xr = np.asarray(stq.issq_stft(Tx, n_fft=n_fft))
    assert stq.toolkit.mad_rms(x, xr) < 0.05


def test_stream_ssq_cwt2_matches_offline():
    """Streaming WSST2: Wx matches offline on reliable rows; column
    sums (inversion integrals) match offline `ssq_cwt2` away from the
    global edges; round trip reconstructs."""
    from ssqueezepy_tpu.streaming import StreamingSSQCWT2
    N, chunk, ctx = 4096, 1024, 2048
    x = _chirp(N)
    plan = StreamingSSQCWT2(chunk, ('gmw', {'dtype': 'float32'}),
                            scales=_scales(), nv=None, N=N,
                            history=ctx, lookahead=ctx)
    Tx, Wx = _drive(plan, x, chunk)
    Tx, Wx = Tx.to_numpy(), Wx.to_numpy()
    assert Tx.shape[-1] == N

    Tx_ref, Wx_ref, *_ = stq.ssq_cwt2(
        x, ('gmw', {'dtype': 'float32'}), scales=_scales(), nv=None,
        astensor=False)
    mag = np.abs(Wx_ref).max()
    sup = np.ceil(plan.support_np).astype(int)
    checked = 0
    for i in range(len(sup)):
        m = min(sup[i], ctx)
        if N - 2 * m < 64:
            continue
        rel = np.abs(Wx[i, m:N - m] - Wx_ref[i, m:N - m]).max() / mag
        assert rel < 5e-3, (i, rel)
        checked += 1
    assert checked > 64

    m = 1792
    cs = np.abs(Tx.real.sum(-2)[m:-m] - Tx_ref.real.sum(-2)[m:-m]).max()
    assert cs / np.abs(Tx_ref).max() < 0.05, cs

    xrec = stq.issq_cwt(Tx)
    err = stq.toolkit.mad_rms(x, xrec)
    assert err < 0.1, err
