# -*- coding: utf-8 -*-
"""Reference-parity wave 3: phase transforms, difftypes, ssqueeze engine,
and the higher-order CWT — numerically vs the ACTUAL reference (see
test_reference_parity for the import shim)."""
import numpy as np
import pytest

from test_reference_parity import _import_reference, _np, _relmax, WAV

ref = _import_reference()
import ssqueezepy_tpu as stq

rng = np.random.default_rng(3)
X256 = rng.standard_normal(256)


def _wx_dwx():
    Wx, scales, dWx = ref.cwt(X256, WAV, scales='log', derivative=True)
    return Wx, dWx, scales


# ---------------------------------------------------------------------------
# phase transforms
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('difftype', ['trig', 'phase'])
def test_phase_cwt_matches(difftype):
    from ssqueezepy._ssq_cwt import phase_cwt as ref_phase
    from ssqueezepy_tpu.ops.phase import phase_cwt as our_phase
    Wx, dWx, _ = _wx_dwx()
    wr = ref_phase(Wx, dWx, difftype=difftype, gamma=1e-8)
    wo = our_phase(Wx, dWx, difftype=difftype, gamma=1e-8)
    wr, wo = np.asarray(wr), np.asarray(_np(wo)).real
    # both mark discarded cells with inf; compare the finite field
    fin = np.isfinite(wr) & np.isfinite(wo)
    assert (np.isfinite(wr) == np.isfinite(wo)).mean() > 0.999
    assert np.abs(wr[fin] - wo[fin]).max() < 1e-6


@pytest.mark.parametrize('difforder', [1, 2, 4])
def test_phase_cwt_num_matches(difforder):
    from ssqueezepy._ssq_cwt import phase_cwt_num as ref_phase
    from ssqueezepy_tpu.ops.phase import phase_cwt_num as our_phase
    Wx, _, _ = _wx_dwx()
    wr = np.asarray(ref_phase(Wx, dt=0.5, difforder=difforder, gamma=1e-8))
    wo = np.asarray(_np(our_phase(Wx, dt=0.5, difforder=difforder,
                                  gamma=1e-8))).real
    fin = np.isfinite(wr) & np.isfinite(wo)
    assert (np.isfinite(wr) == np.isfinite(wo)).mean() > 0.999
    assert np.abs(wr[fin] - wo[fin]).max() < 1e-5, difforder


def test_phase_stft_matches():
    from ssqueezepy._ssq_stft import phase_stft as ref_phase
    from ssqueezepy_tpu.ops.phase import phase_stft as our_phase
    Sx, dSx = ref.stft(X256, n_fft=64, derivative=True, dtype='float64')
    Sfs = np.linspace(0, 0.5, 33)
    wr = np.asarray(ref_phase(Sx, dSx, Sfs, gamma=1e-8))
    wo = np.asarray(_np(our_phase(Sx, dSx, Sfs, gamma=1e-8))).real
    fin = np.isfinite(wr) & np.isfinite(wo)
    assert (np.isfinite(wr) == np.isfinite(wo)).mean() > 0.999
    assert np.abs(wr[fin] - wo[fin]).max() < 1e-6


# ---------------------------------------------------------------------------
# cwt options
# ---------------------------------------------------------------------------
def test_cwt_derivative_matches():
    Wr, _, dWr = ref.cwt(X256, WAV, scales='log', derivative=True)
    Wo, _, dWo = stq.cwt(X256, WAV, scales='log', derivative=True,
                         astensor=False)
    assert _relmax(Wr, Wo) < 1e-9
    assert _relmax(dWr, dWo) < 1e-8


def test_cwt_higher_order_matches():
    from ssqueezepy._cwt import cwt_higher_order as ref_ho
    from ssqueezepy_tpu.models.cwt import cwt_higher_order as our_ho
    Wr, _ = ref_ho(X256, wavelet='gmw', order=(0, 1), scales='log',
                   average=True)
    Wo, _ = our_ho(X256, wavelet='gmw', order=(0, 1), scales='log',
                   average=True)
    Wo = _np(Wo)
    assert Wr.shape == Wo.shape
    assert _relmax(Wr, Wo) < 1e-5


def test_cwt_l1_vs_l2_norm_matches():
    Wr, _ = ref.cwt(X256, WAV, scales='log', l1_norm=False)
    Wo, _ = stq.cwt(X256, WAV, scales='log', l1_norm=False, astensor=False)
    assert _relmax(Wr, Wo) < 1e-9


# ---------------------------------------------------------------------------
# ssqueeze engine driven directly
# ---------------------------------------------------------------------------
def test_ssqueeze_engine_matches():
    from ssqueezepy import ssqueeze as ref_sq
    from ssqueezepy_tpu import ssqueeze as our_sq
    Wx, dWx, scales = _wx_dwx()
    Tr, fr = ref_sq(Wx, None, scales=scales, transform='cwt', wavelet=WAV,
                    dWx=dWx, maprange='peak', ssq_freqs='log', gamma=1e-8)
    To, fo = our_sq(Wx, None, scales=scales, transform='cwt', wavelet=WAV,
                    dWx=dWx, maprange='peak', ssq_freqs='log', gamma=1e-8)
    To = _np(To)
    assert Tr.shape == To.shape
    assert np.allclose(fr, fo, rtol=1e-7)
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-6, cs


def test_ssq_cwt_difftype_numeric_matches():
    Tr, *_ = ref.ssq_cwt(X256, WAV, difftype='numeric', get_w=True)
    To, *_ = stq.ssq_cwt(X256, WAV, difftype='numeric', get_w=True,
                         astensor=False)
    assert Tr.shape == To.shape
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-5, cs
