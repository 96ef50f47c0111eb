# -*- coding: utf-8 -*-
"""Reference-parity wave 4: component inversion, inverse-CWT variants,
framing utilities, denoising threshold, scale utilities, and the
experimental freq<->scale converters — numerically vs the ACTUAL
reference (see test_reference_parity for the import shim)."""
import numpy as np
import pytest

from test_reference_parity import _import_reference, _np, _relmax, WAV

ref = _import_reference()
import ssqueezepy_tpu as stq

rng = np.random.default_rng(4)
X512 = rng.standard_normal(512)


# ---------------------------------------------------------------------------
# component inversion (issq_cwt with curve bands)
# ---------------------------------------------------------------------------
def test_issq_cwt_components_match():
    Tr, *_ = ref.ssq_cwt(X512, WAV)
    na, N = Tr.shape
    cc = np.clip(np.round(na / 2 + 10 * np.sin(
        np.linspace(0, 4 * np.pi, N))), 0, na - 1).astype(np.int64)
    cw = np.full(N, 4, np.int64)
    xr = ref.issq_cwt(Tr, cc=cc, cw=cw)
    xo = stq.issq_cwt(Tr, cc=cc, cw=cw)
    xr, xo = np.asarray(xr), np.asarray(xo)
    assert xr.shape == xo.shape
    # our band reduction runs on device in float32; the reference sums
    # in float64 on host
    assert np.abs(xr - xo).max() < 1e-5 * max(1.0, np.abs(xr).max())


def test_issq_cwt_two_components_match():
    Tr, *_ = ref.ssq_cwt(X512, WAV)
    na, N = Tr.shape
    cc = np.stack([np.full(N, na // 3), np.full(N, 2 * na // 3)],
                  axis=1).astype(np.int64)
    cw = np.full((N, 2), 3, np.int64)
    xr = np.asarray(ref.issq_cwt(Tr, cc=cc, cw=cw))
    xo = np.asarray(stq.issq_cwt(Tr, cc=cc, cw=cw))
    assert xr.shape == xo.shape
    assert np.abs(xr - xo).max() < 1e-5 * max(1.0, np.abs(xr).max())


# ---------------------------------------------------------------------------
# icwt variants
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('one_int', [True, False])
def test_icwt_matches(one_int):
    Wr, scales = ref.cwt(X512, WAV, scales='log')
    xr = np.asarray(ref.icwt(Wr, WAV, scales=scales, one_int=one_int))
    xo = np.asarray(stq.icwt(Wr, WAV, scales=scales, one_int=one_int))
    assert _relmax(xr, xo) < 1e-6


# ---------------------------------------------------------------------------
# framing utilities
# ---------------------------------------------------------------------------
def test_buffer_matches():
    from ssqueezepy.utils import buffer as ref_buffer
    xb_r = np.asarray(ref_buffer(X512, 64, 48))
    xb_o = np.asarray(_np(stq.ops.framing.buffer(X512, 64, 48)))
    assert xb_r.shape == xb_o.shape
    assert np.abs(xb_r - xb_o).max() < 1e-12


def test_window_norm_matches():
    from ssqueezepy.utils import window_norm as ref_wn
    from ssqueezepy_tpu.ops.framing import window_norm
    win = np.hanning(65)[:-1]
    wn_r = np.asarray(ref_wn(win, 16, 64, 512))
    wn_o = np.asarray(_np(window_norm(win, 16, 64, 512)))
    assert wn_r.shape == wn_o.shape
    assert np.abs(wn_r - wn_o).max() < 1e-12


def test_unbuffer_matches():
    from ssqueezepy.utils import unbuffer as ref_ub
    from ssqueezepy_tpu.ops.framing import buffer, unbuffer
    win = np.hanning(65)[:-1]
    xb = np.asarray(_np(buffer(X512, 64, 48)))
    xr = np.asarray(ref_ub(xb, win, 16, 64, 512))
    xo = np.asarray(_np(unbuffer(xb, win, 16, 64, 512)))
    assert np.abs(xr - xo).max() < 1e-10


# ---------------------------------------------------------------------------
# denoising threshold + scale utils
# ---------------------------------------------------------------------------
def test_est_riskshrink_thresh_matches():
    from ssqueezepy.utils import est_riskshrink_thresh as ref_rt
    Wr, _ = ref.cwt(X512, WAV, scales='log', nv=32)
    tr = float(ref_rt(Wr, nv=32))
    to = float(stq.utils.common.est_riskshrink_thresh(Wr, nv=32))
    assert abs(tr - to) < 1e-9 * max(1.0, abs(tr))


def test_find_downsampling_scale_matches():
    from ssqueezepy.utils.cwt_utils import (find_downsampling_scale
                                            as ref_fds)
    from ssqueezepy_tpu.utils.cwt_utils import find_downsampling_scale
    wav_r = ref.Wavelet(WAV)
    wav_o = stq.Wavelet(WAV)
    scales = np.asarray(ref.utils.process_scales('log', 512, wav_r))
    ir = ref_fds(wav_r, scales)
    io = find_downsampling_scale(wav_o, scales)
    assert ir == io, (ir, io)


# ---------------------------------------------------------------------------
# experimental freq<->scale converters
# ---------------------------------------------------------------------------
def test_scale_to_freq_matches():
    from ssqueezepy.experimental import scale_to_freq as ref_s2f
    from ssqueezepy_tpu.experimental import scale_to_freq
    wav_r = ref.Wavelet(WAV)
    wav_o = stq.Wavelet(WAV)
    scales = np.asarray(ref.utils.process_scales('log', 512, wav_r))
    fr = np.asarray(ref_s2f(scales, wav_r, 512, fs=2.0))
    fo = np.asarray(scale_to_freq(scales, wav_o, 512, fs=2.0))
    assert np.allclose(fr, fo, rtol=1e-7)


def test_freq_to_scale_roundtrip_close():
    """freq->scale is a search in both libraries; assert OUR scales map
    back to the requested freqs through the reference's converter."""
    from ssqueezepy.experimental import scale_to_freq as ref_s2f
    from ssqueezepy_tpu.experimental import freq_to_scale
    wav_r = ref.Wavelet(WAV)
    wav_o = stq.Wavelet(WAV)
    freqs = np.array([0.05, 0.1, 0.2, 0.35])
    sc = np.asarray(freq_to_scale(freqs, wav_o, 512, fs=1.0)).squeeze()
    back = np.asarray(ref_s2f(np.atleast_1d(sc), wav_r, 512, fs=1.0))
    # both converters are discrete grid searches; agreement is bounded
    # by the search resolution
    assert (np.abs(back - freqs) / freqs).max() < 0.15, (back, freqs)


# ---------------------------------------------------------------------------
# namespace/migration surface
# ---------------------------------------------------------------------------
def test_utils_namespace_covers_reference():
    """Names a reference user reaches through `ssqueezepy.utils` resolve
    in `ssqueezepy_tpu.utils` too (module-level incidental imports like
    np/torch/plt excluded)."""
    wanted = ['WARN', 'NOTE', 'EPS32', 'EPS64', 'p2up', 'mad',
              'est_riskshrink_thresh', 'assert_is_one_of',
              'process_scales', 'cwt_scalebounds', 'make_scales',
              'find_downsampling_scale', 'adm_cwt', 'adm_ssq',
              'S', 'Q', 'asnumpy', 'padsignal', 'trigdiff', 'buffer',
              'unbuffer', 'window_norm']
    missing = [n for n in wanted if not hasattr(stq.utils, n)]
    assert not missing, missing
    top = ['S', 'Q', 'asnumpy', 'gdefaults', 'imshow', 'plot',
           'assert_is_one_of']
    missing = [n for n in top if not hasattr(stq, n)]
    assert not missing, missing
