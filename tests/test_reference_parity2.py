# -*- coding: utf-8 -*-
"""Reference-parity wave 2: wavelet families, higher-order GMW, padding,
spectral differentiation, squeezing variants, windows, and ridge
extraction — all compared numerically against the ACTUAL reference
library (imported read-only under the numba shim from
test_reference_parity). Small inputs: the shimmed reference runs its
jitted kernels as plain Python."""
import numpy as np
import pytest

from test_reference_parity import _import_reference, _np, _relmax, WAV

ref = _import_reference()
import ssqueezepy_tpu as stq

rng = np.random.default_rng(11)
X256 = rng.standard_normal(256)


# ---------------------------------------------------------------------------
# wavelet families
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('wav', ['morlet', 'bump', 'cmhat', 'hhhat'])
def test_wavelet_values_match(wav):
    w = np.linspace(-np.pi, np.pi, 255)
    pr = ref.Wavelet((wav, {'dtype': 'float64'}))(w)
    po = stq.Wavelet((wav, {'dtype': 'float64'}))(w)
    assert _relmax(pr, np.asarray(po)) < 1e-9, wav


@pytest.mark.parametrize('order', [1, 2])
def test_gmw_higher_order_values_match(order):
    from ssqueezepy import _gmw as ref_gmw
    from ssqueezepy_tpu.models import gmw as our_gmw
    w = np.linspace(0, np.pi, 257)
    pr = ref_gmw.gmw(order=order, dtype='float64', norm='bandpass')(w)
    po = our_gmw.gmw(order=order, dtype='float64', norm='bandpass')(w)
    assert _relmax(pr, np.asarray(po)) < 1e-8, order


def test_center_frequency_matches():
    from ssqueezepy.wavelets import center_frequency as ref_cf
    from ssqueezepy_tpu.models.wavelets import center_frequency as our_cf
    for kind in ('peak', 'energy', 'peak-ct'):
        cr = ref_cf(ref.Wavelet(WAV), kind=kind, N=1024)
        co = our_cf(WAV, kind=kind, N=1024)
        assert np.isclose(cr, co, rtol=1e-7), kind


# ---------------------------------------------------------------------------
# padding / differentiation
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('padtype', ['reflect', 'symmetric', 'replicate',
                                     'wrap', 'zero'])
def test_padsignal_matches(padtype):
    from ssqueezepy.utils import padsignal as ref_pad
    from ssqueezepy_tpu.ops.pad import padsignal as our_pad
    xr, n_up, n1, n2 = ref_pad(X256, padtype, get_params=True)
    xo, n_up_o, n1_o, n2_o = our_pad(X256, padtype, get_params=True)
    assert (n_up, n1, n2) == (int(n_up_o), int(n1_o), int(n2_o))
    assert np.allclose(xr, np.asarray(xo), atol=1e-12)


def test_trigdiff_matches():
    from ssqueezepy.utils import trigdiff as ref_td
    from ssqueezepy_tpu.ops.diff import trigdiff as our_td
    Wx = (rng.standard_normal((8, 256)) +
          1j * rng.standard_normal((8, 256)))
    dr = ref_td(Wx, fs=2., padtype=None, rpadded=True, N=256)
    do = our_td(Wx, fs=2., padtype=None, rpadded=True, N=256)
    assert _relmax(dr, do) < 1e-9


# ---------------------------------------------------------------------------
# ssq options
# ---------------------------------------------------------------------------
def test_ssq_cwt_lebesgue_matches():
    Tr, *_ = ref.ssq_cwt(X256, WAV, squeezing='lebesgue')
    To, *_ = stq.ssq_cwt(X256, WAV, squeezing='lebesgue', astensor=False)
    assert Tr.shape == To.shape
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-6, cs


@pytest.mark.parametrize('maprange', ['maximal', 'peak'])
def test_ssq_cwt_maprange_freqs_match(maprange):
    # 'maximal' maprange is rejected with log-piecewise ssq freqs by both
    # implementations; drive it through plain log scales
    scales = 'log' if maprange == 'maximal' else 'log-piecewise'
    out_r = ref.ssq_cwt(X256, WAV, scales=scales, maprange=maprange)
    out_o = stq.ssq_cwt(X256, WAV, scales=scales, maprange=maprange,
                        astensor=False)
    assert np.allclose(out_r[2], out_o[2], rtol=1e-7), maprange


def test_ssq_cwt_linear_scales_matches():
    Tr, Wr, frr, _ = ref.ssq_cwt(X256, WAV, scales='linear',
                                 maprange='maximal')
    To, Wo, fro, _ = stq.ssq_cwt(X256, WAV, scales='linear',
                                 maprange='maximal', astensor=False)
    assert Tr.shape == To.shape
    assert _relmax(Wr, Wo) < 1e-8
    assert np.allclose(frr, fro, rtol=1e-7)
    cs = np.abs(Tr.sum(0) - To.sum(0)).max() / np.abs(Tr.sum(0)).max()
    assert cs < 1e-6, cs


def test_stft_unmodulated_and_window_match():
    from ssqueezepy.utils import window_norm  # noqa: F401 (API presence)
    Sr = ref.stft(X256, n_fft=64, modulated=False, dtype='float64')
    So = _np(stq.stft(X256, n_fft=64, modulated=False, dtype='float64'))
    assert Sr.shape == So.shape
    assert _relmax(Sr, So) < 1e-9


def test_istft_matches():
    Sx = ref.stft(X256, n_fft=64, dtype='float64')
    xr = ref.istft(Sx, n_fft=64, N=256)
    xo = stq.istft(Sx, n_fft=64, N=256)
    assert np.abs(np.asarray(xo) - xr).max() < 1e-9


# ---------------------------------------------------------------------------
# ridge extraction
# ---------------------------------------------------------------------------
def test_extract_ridges_matches():
    t = np.linspace(0, 2, 256, endpoint=False)
    x = (np.cos(2 * np.pi * 14 * t) + np.sin(2 * np.pi * 40 * t))
    Tx, _, _, scales_out = stq.ssq_cwt(x, WAV, astensor=False)
    rr = ref.extract_ridges(Tx, scales_out, penalty=2., n_ridges=2, bw=4,
                            transform='cwt')
    ro = stq.extract_ridges(Tx, scales_out, penalty=2., n_ridges=2, bw=4,
                            transform='cwt')
    assert np.asarray(rr).shape == np.asarray(ro).shape
    # identical DP objective -> identical ridge indices
    assert np.array_equal(np.asarray(rr), np.asarray(ro))
