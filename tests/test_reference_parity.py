# -*- coding: utf-8 -*-
"""Direct numerical parity vs the ACTUAL reference library.

The reference at /root/reference is imported (read-only) with a no-op
numba shim — its @jit'd kernels are plain numpy Python, exact but slow,
so inputs here are small. This pins our outputs to the reference's REAL
behavior rather than to a re-derivation of it: scale grids, wavelet
values, CWT/STFT planes, and synchrosqueezed column mass are compared
cell-for-cell (Tx placement is compared through column sums — both
implementations document a +-1-bin placement tolerance).

Runs on the CPU backend (the repo's correctness reference; conftest
forces cpu + x64).
"""
import sys
import types
import warnings

import numpy as np
import pytest


def _import_reference():
    if 'ssqueezepy' not in sys.modules:
        if 'numba' not in sys.modules:
            shim = types.ModuleType('numba')

            def _jit(*a, **k):
                if a and callable(a[0]):
                    return a[0]
                return lambda f: f

            shim.jit = _jit
            shim.njit = _jit
            shim.prange = range
            sys.modules['numba'] = shim
        # APPEND (not insert-front): /root/reference has a top-level
        # `tests` package that would otherwise shadow this repo's tests
        # namespace during a full-suite run
        sys.path.append('/root/reference')
    try:
        import ssqueezepy as ref
    except Exception as e:        # pragma: no cover
        pytest.skip("reference library unavailable: %s" % e)
    return ref


ref = _import_reference()
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.ops.complexlib import Complex

warnings.filterwarnings('ignore', category=RuntimeWarning)

WAV = ('gmw', {'dtype': 'float64'})
rng = np.random.default_rng(7)
X512 = rng.standard_normal(512)


def _np(a):
    if isinstance(a, Complex):
        return np.asarray(a.re) + 1j * np.asarray(a.im)
    return np.asarray(a)


def _relmax(a, b):
    a, b = _np(a), _np(b)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-300)


# ---------------------------------------------------------------------------
# plan math
# ---------------------------------------------------------------------------
def test_scale_grids_match():
    from ssqueezepy.utils import process_scales as ref_ps
    from ssqueezepy_tpu.utils.cwt_utils import process_scales as our_ps
    for spec in ('log', 'log-piecewise'):
        s_ref = ref_ps(spec, 512, ref.Wavelet(WAV)).squeeze()
        s_our = our_ps(spec, 512, WAV).squeeze()
        assert s_ref.shape == s_our.shape, (spec, s_ref.shape, s_our.shape)
        assert np.allclose(s_ref, s_our, rtol=1e-12), spec


def test_scalebounds_match():
    from ssqueezepy.utils import cwt_scalebounds as ref_sb
    from ssqueezepy_tpu.utils.cwt_utils import cwt_scalebounds as our_sb
    for preset in ('maximal', 'minimal'):
        lo_r, hi_r = ref_sb(ref.Wavelet(WAV), 512, preset=preset)
        lo_o, hi_o = our_sb(WAV, 512, preset=preset)
        assert np.isclose(lo_r, lo_o, rtol=1e-9), preset
        assert np.isclose(hi_r, hi_o, rtol=1e-9), preset


def test_gmw_filterbank_values_match():
    w = np.linspace(0, np.pi, 257)
    psih_ref = ref.Wavelet(WAV)(w)
    psih_our = stq.Wavelet(WAV)(w)
    assert _relmax(psih_ref, np.asarray(psih_our)) < 1e-9


def test_ssq_freqs_match():
    Tr = ref.ssq_cwt(X512, WAV)
    To = stq.ssq_cwt(X512, WAV, astensor=False)
    assert np.allclose(Tr[2], To[2], rtol=1e-7)   # ssq_freqs
    assert np.allclose(Tr[3], To[3], rtol=1e-12)  # scales


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------
def test_cwt_matches_reference():
    Wr, _ = ref.cwt(X512, WAV, scales='log')
    Wo, _ = stq.cwt(X512, WAV, scales='log', astensor=False)
    assert Wr.shape == Wo.shape
    assert _relmax(Wr, Wo) < 1e-9


def test_cwt_log_piecewise_matches_reference():
    Wr, sr = ref.cwt(X512, WAV, scales='log-piecewise')
    Wo, so = stq.cwt(X512, WAV, scales='log-piecewise', astensor=False)
    assert Wr.shape == Wo.shape
    assert np.allclose(sr.squeeze(), so.squeeze(), rtol=1e-12)
    assert _relmax(Wr, Wo) < 1e-9


def test_stft_matches_reference():
    Sr = ref.stft(X512, n_fft=128, dtype='float64')
    So = stq.stft(X512, n_fft=128, dtype='float64')
    So = _np(So)
    assert Sr.shape == So.shape
    assert _relmax(Sr, So) < 1e-9


def test_ssq_cwt_matches_reference():
    Tr, Wr, frr, scr = ref.ssq_cwt(X512, WAV)
    To, Wo, fro, sco = stq.ssq_cwt(X512, WAV, astensor=False)
    assert Tr.shape == To.shape
    assert _relmax(Wr, Wo) < 1e-9
    # Tx: same mass enters each column; row placement tolerates +-1 bin
    # in BOTH implementations (VPU/ordering at bin boundaries)
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-7, cs
    # and the spectral centroid of |Tx| per column agrees to ~a bin
    def centroid(T):
        a = np.abs(T)
        return (a * np.arange(T.shape[0])[:, None]).sum(0) / (a.sum(0) + 1e-30)
    assert np.abs(centroid(Tr) - centroid(To)).max() < 1.5


def test_ssq_stft_matches_reference():
    Tr, Sr, frr, Sfsr = ref.ssq_stft(X512, n_fft=128, dtype='float64')
    To, So, fro, Sfso = stq.ssq_stft(X512, n_fft=128, dtype='float64',
                                     astensor=False)
    assert Tr.shape == To.shape
    assert _relmax(Sr, So) < 1e-9
    assert np.allclose(frr, fro, rtol=1e-9)
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-7, cs


# ---------------------------------------------------------------------------
# inverses: cross-inversion (our inverse on the reference's transform)
# ---------------------------------------------------------------------------
def test_cross_inversion():
    t = np.linspace(0, 4, 512, endpoint=False)
    x = np.cos(2 * np.pi * 2 * np.exp(t / 3))
    Tr, *_ = ref.ssq_cwt(x, WAV)
    xr = stq.issq_cwt(Tr)           # our inverse, reference's Tx
    assert stq.toolkit.mad_rms(x, xr) < 0.05
    # reference's own inverse on the same plane — ours must agree with IT
    xr_ref = ref.issq_cwt(Tr)
    assert np.abs(np.asarray(xr) - np.asarray(xr_ref)).max() < 1e-5

    # icwt: our one-integral inverse reproduces the reference's own
    # reconstruction bit-for-bit-ish (the residual itself is a property
    # of log scales on this chirp, identical in both implementations)
    Wr, _ = ref.cwt(x, WAV, scales='log')
    xr2 = stq.icwt(Wr, WAV, scales='log')
    xr2_ref = ref.icwt(Wr, WAV, scales='log')
    assert np.abs(np.asarray(xr2) - np.asarray(xr2_ref)).max() < 1e-9
    assert np.isclose(stq.toolkit.mad_rms(x, xr2),
                      ref.toolkit.mad_rms(x, xr2_ref), rtol=1e-6)
