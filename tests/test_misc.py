# -*- coding: utf-8 -*-
"""Misc behavioral coverage: scale engine, test signals, ridge extraction,
STFT internals, experimental converters, higher-order CWT, visuals.
Mirrors reference tests/misc_test.py, test_signals_test.py,
ridge_extraction_test.py, z_all_test.py in strategy.
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu import (Wavelet, cwt, icwt, stft, ssq_cwt, ssq_stft,
                            extract_ridges, TestSignals, process_scales,
                            cwt_scalebounds, infer_scaletype,
                            logscale_transition_idx, trigdiff)
from ssqueezepy_tpu.ops.framing import buffer, unbuffer, window_norm
from ssqueezepy_tpu.ops.framing import overlap_add_skew
from ssqueezepy_tpu.models.windows import get_window
from ssqueezepy_tpu.experimental import freq_to_scale, scale_to_freq
from ssqueezepy_tpu.toolkit import mad_rms

rng = np.random.default_rng(0)


@pytest.mark.parametrize("N", [64, 128, 256, 512, 1024, 2048, 4096])
def test_cwt_scalebounds_sweep(N):
    """Default-preset bounds succeed for all N (reference
    misc_test.py:12-19)."""
    w = Wavelet(('morlet', {'mu': 6, 'dtype': 'float64'}))
    mn, mx = cwt_scalebounds(w, N=N)
    assert mn > 0 and mx > mn, N
    g = Wavelet(('gmw', {'dtype': 'float64'}))
    for preset in ('maximal', 'naive'):
        mn, mx = cwt_scalebounds(g, N, preset=preset)
        assert mn > 0 and mx > mn, (N, preset)


def test_scale_inference_invariants():
    w = Wavelet(('gmw', {'dtype': 'float64'}))
    for scaletype in ('log', 'log-piecewise', 'linear'):
        sc, st, na, nv = process_scales(scaletype, 2048, w,
                                        get_params=True)
        st2, _ = infer_scaletype(sc)
        assert st2 == scaletype, (scaletype, st2)
        if scaletype == 'log-piecewise':
            assert logscale_transition_idx(sc) is not None


def test_trigdiff_equals_cwt_derivative():
    """trigdiff(Wx) == cwt(derivative=True)'s dWx
    (reference z_all_test.py:352-365)."""
    x = rng.standard_normal(512)
    wav = ('gmw', {'dtype': 'float64'})
    Wxp, scales, dWxp = cwt(x, wav, scales='log', derivative=True,
                            rpadded=True, astensor=False)
    from ssqueezepy_tpu.utils.common import p2up
    _, n1, _ = p2up(512)
    dWx2 = trigdiff(Wxp, fs=1, rpadded=True, N=512, n1=n1)
    dWx = dWxp[:, n1:n1 + 512]
    assert np.abs(np.asarray(dWx2) - dWx).max() < 1e-7


def test_buffer_roundtrip():
    x = rng.standard_normal(128)
    xb = np.asarray(buffer(x, 16, 12))
    # first frame is x[:16], second starts at hop=4
    assert np.allclose(xb[:, 0], x[:16])
    assert np.allclose(xb[:, 1], x[4:20])
    # modulated == ifftshift of unmodulated frames
    xbm = np.asarray(buffer(x, 16, 12, modulated=True))
    assert np.allclose(xbm[:, 0], np.roll(x[:16], -8))


def test_overlap_add_skew():
    R, C = 7, 12
    rows = rng.standard_normal((R, C))
    for stride in (1, 2, 3):
        L = C + stride * (R - 1)
        ref = np.zeros(L)
        for r in range(R):
            ref[r * stride: r * stride + C] += rows[r]
        out = np.asarray(overlap_add_skew(np.asarray(rows), stride, L))
        assert np.abs(out - ref).max() < 1e-12, stride


def test_window_norm_matches_overlap():
    win = get_window('hann', 16, 16, dtype='float64')
    N, n_fft, hop = 64, 16, 4
    wn = window_norm(win, hop, n_fft, N)
    max_hops = (len(wn) - n_fft) // hop + 1
    ones = np.ones((n_fft, max_hops))
    ref = unbuffer(ones * win[:, None], win, hop, n_fft, N=N)
    assert np.allclose(wn, ref[:len(wn)])


def test_ridge_extraction_known():
    """Clean two-tone: ridges land on the tones (reference
    ridge_extraction_test.py pattern)."""
    N = 512
    t = np.linspace(0, 1, N, endpoint=False)
    x = np.sin(2 * np.pi * 30 * t) + 0.8 * np.sin(2 * np.pi * 100 * t)
    Tx, Sx, sf, Sfs = ssq_stft(x, dtype='float64', astensor=False)
    ridges = extract_ridges(Sx, Sfs, penalty=2., n_ridges=2, bw=10,
                            transform='stft')
    found = sorted([np.median(Sfs[ridges[:, i]]) for i in range(2)])
    assert abs(found[0] - 30 / N * 0.5 / Sfs[-1] * N) < 10 or \
        abs(found[0] * N - 30) < 6, found
    assert abs(found[1] * N - 100) < 8, found


def test_ridge_extraction_cwt_runs():
    ts = TestSignals(N=512)
    x, t = ts.lchirp(512)
    Tx, Wx, ssq_freqs, scales = ssq_cwt(
        x, ('gmw', {'dtype': 'float64'}), astensor=False)
    r = extract_ridges(Tx, scales, penalty=20, n_ridges=2, bw=2)
    assert r.shape == (512, 2)
    assert np.isfinite(r).all()


def test_test_signals_catalog():
    ts = TestSignals(N=256)
    data = ts.make_signals('all', get_params=True)
    assert len(data) == len(TestSignals.DEMO)
    for name, (x, t, _) in data.items():
        assert np.isfinite(x).all(), name
    # noise injection
    ts2 = TestSignals(N=256, snr=10, seed=0)
    x = ts2.make_signals('echirp')
    assert np.isfinite(x).all()
    # anti-alias N estimation
    n_est = ts._est_N_nonalias(
        lambda t, tmin, tmax, fmin, fmax:
        ts._lchirp_fn(t, tmin, tmax, fmin, fmax, get_w=True)[1],
        0, 1, 0, 100)
    assert n_est >= 200


def test_higher_order_cwt():
    x = rng.standard_normal(512)
    wav = ('gmw', {'dtype': 'float64'})
    Wx1, sc = cwt(x, wav, scales='log', order=1, astensor=False)
    Wxavg, sc2 = cwt(x, wav, scales='log', order=(0, 1), astensor=False)
    assert Wx1.shape == Wxavg.shape
    Tx, *_ = ssq_cwt(x, wav, scales='log', order=(0, 1), astensor=False)
    assert np.isfinite(Tx).all()


def test_freq_scale_converters():
    wav = Wavelet(('gmw', {'dtype': 'float64'}))
    scales = process_scales('log', 1024, wav).squeeze()
    freqs = scale_to_freq(scales, wav, 1024)
    assert (np.diff(freqs) <= 0).all()  # scales up -> freqs down
    fr = np.sort(freqs)
    fr[-1] = 0.5
    sc2 = freq_to_scale(fr, wav, 1024)
    assert np.isfinite(sc2).all()


def test_phase_ssqueeze_generic():
    from ssqueezepy_tpu.experimental import phase_ssqueeze
    x = rng.standard_normal(512)
    wav = ('gmw', {'dtype': 'float64'})
    Wx, scales = cwt(x, wav, scales='log', astensor=False)
    Tx, *_ = phase_ssqueeze(Wx, scales=scales, wavelet=wav,
                            transform='cwt')
    assert np.isfinite(np.asarray(Tx.to_numpy()
                                  if hasattr(Tx, 'to_numpy') else Tx)).all()


def test_dtype_propagation():
    x = rng.standard_normal(256).astype(np.float32)
    for dt in ('float32', 'float64'):
        Tx, Wx, *_ = ssq_cwt(x, ('gmw', {'dtype': dt}), scales='log',
                             astensor=False)
        expected = 'complex64' if dt == 'float32' else 'complex128'
        assert str(Wx.dtype) == expected, (dt, Wx.dtype)
        assert str(Tx.dtype) == expected


def test_visuals_run():
    import matplotlib
    matplotlib.use('Agg')
    from ssqueezepy_tpu import visuals
    w = Wavelet('gmw')
    visuals.wavelet_tf(w, N=256)
    visuals.wavelet_filterbank(w, N=256)
    visuals.imshow(rng.standard_normal((16, 16)), show=1)
    visuals.plot(np.arange(10), rng.standard_normal(10), show=1)
    ts = TestSignals(N=128)
    ts.demo('echirp')


def test_wavelet_tf_anim(tmp_path):
    """Real animated scale sweep (reference visuals.py:131-301): renders
    a small GIF end-to-end."""
    import matplotlib
    matplotlib.use('Agg')
    from ssqueezepy_tpu import visuals
    path = str(tmp_path / 'anim.gif')
    anim = visuals.wavelet_tf_anim(Wavelet('gmw'), N=128, n_frames=3,
                                   savepath=path, testing=True)
    assert anim is not None
    import os
    assert os.path.getsize(path) > 1000


def test_est_riskshrink_thresh():
    x = rng.standard_normal(512)
    Wx, sc = cwt(x, ('gmw', {'dtype': 'float64'}), scales='log',
                 astensor=False)
    g = stq.est_riskshrink_thresh(Wx, nv=32)
    assert np.isfinite(g) and g > 0


def test_extract_ridges_batched_matches_loop():
    """(B, na, T) input == per-sample extraction (vmapped DP scan)."""
    rng = np.random.default_rng(0)
    B, na, T = 3, 40, 200
    Tf = rng.standard_normal((B, na, T)) + 1j * rng.standard_normal(
        (B, na, T))
    # plant distinct ridges per sample
    for b in range(B):
        r = (10 + 5 * b + 8 * np.sin(np.linspace(0, 3, T))).astype(int)
        Tf[b, r, np.arange(T)] += 30
    scales = np.arange(1, na + 1).astype(float)
    rb = extract_ridges(Tf, scales, penalty=2., n_ridges=2, bw=4)
    assert rb.shape == (B, T, 2)
    for b in range(B):
        r1 = extract_ridges(Tf[b], scales, penalty=2., n_ridges=2, bw=4)
        assert np.array_equal(rb[b], r1), b


def test_migration_shims():
    """Reference-namespace migration surface: `algos` module, *_cpu/_gpu
    phase aliases, top-level plot helpers, TestSignals module knobs
    (reference __init__.py star-exports; _test_signals.py:60-61)."""
    assert stq.algos.phase_cwt_cpu is stq.algos.phase_cwt
    assert stq.algos.phase_cwt_gpu is stq.algos.phase_cwt
    assert stq.phase_stft_cpu is stq.phase_stft
    for name in ('ssqueeze_fast', 'indexed_sum_onfly', 'indexed_sum',
                 'find_closest', 'replace_under_abs', 'zero_denormals',
                 'find_maximum', 'find_first_occurrence', 'nCk'):
        assert callable(getattr(stq.algos, name)), name
    for name in ('plots', 'scat', 'plotscat', 'hist'):
        assert callable(getattr(stq, name)), name
    assert stq.DEFAULT_SNR is None and stq.DEFAULT_SEED is None
    from ssqueezepy_tpu.models import test_signals as tsmod
    old = tsmod.DEFAULT_SNR
    try:
        tsmod.DEFAULT_SNR = 15
        assert stq.TestSignals(N=128).snr == 15
    finally:
        tsmod.DEFAULT_SNR = old
    assert not stq.is_tensor(np.zeros(2))


def test_cwt_vectorized_false_chunked_equals_vectorized():
    """`vectorized=False` (memory-constrained scale-chunked execution;
    reference _cwt.py:179-199) must equal the vectorized path exactly —
    same math, chunked scheduling only. Chunk boundary exercised by
    na > chunk size (na = 96+ for 'log' nv=16 at N=512)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(512).astype(np.float32)
    Wv, sv, dWv = stq.cwt(x, 'gmw', scales='log', nv=16, derivative=True,
                          astensor=False)
    from ssqueezepy_tpu.models import cwt as cwt_mod
    assert len(sv) > cwt_mod._CWT_CHUNK  # chunking actually engages
    Wc, sc, dWc = stq.cwt(x, 'gmw', scales='log', nv=16, derivative=True,
                          vectorized=False, astensor=False)
    assert np.allclose(sv, sc)
    assert np.abs(Wv - Wc).max() < 1e-6 * max(np.abs(Wv).max(), 1)
    assert np.abs(dWv - dWc).max() < 1e-6 * max(np.abs(dWv).max(), 1)


def test_config_file_layer(tmp_path, monkeypatch):
    """User config file (the reference's persistent configs.ini
    capability): [global] + per-wavelet sections layer UNDER env and
    kwargs; unknown keys are ignored with a warning, not an error."""
    import logging
    from ssqueezepy_tpu import configs as C
    p = tmp_path / 'config.ini'
    p.write_text("[global]\ndtype = float64\ndownsample = 8\n"
                 "not_a_key = 1\n"
                 "[gmw]\nbeta = 40\n"
                 "[nosuch]\nz = 1\n")
    monkeypatch.setenv('SSQTPU_CONFIG', str(p))
    monkeypatch.delenv('SSQTPU_DTYPE', raising=False)
    old = C._CONFIG
    try:
        C._CONFIG = None
        cfg = C.get_config()
        assert cfg.dtype == 'float64'
        assert cfg.downsample == 8
        assert cfg.wavelets.gmw['beta'] == 40.0
        # env still overrides the file
        C._CONFIG = None
        monkeypatch.setenv('SSQTPU_DTYPE', 'float32')
        assert C.get_config().dtype == 'float32'
    finally:
        C._CONFIG = old
