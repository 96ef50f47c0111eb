# -*- coding: utf-8 -*-
"""Option-grid smoke sweep over the public transforms — the reference's
z_all_test.py:66-98 pattern (every public option combination runs and
returns finite outputs)."""
import numpy as np
import pytest

import ssqueezepy_tpu as stq


N = 512
x = np.cos(2 * np.pi * 5 * np.linspace(0, 1, N, endpoint=False)) \
    + np.sin(2 * np.pi * 20 * np.linspace(0, 1, N, endpoint=False))
x = x.astype(np.float32)


@pytest.mark.parametrize('squeezing', ['sum', 'lebesgue', 'abs'])
@pytest.mark.parametrize('scales', ['log', 'log-piecewise', 'linear'])
def test_ssq_cwt_squeezing_scales(squeezing, scales):
    Tx, Wx, fr, sc = stq.ssq_cwt(x, scales=scales, squeezing=squeezing,
                                 nv=8, astensor=False)
    assert np.isfinite(Tx).all() and np.isfinite(Wx).all()
    assert Tx.shape == Wx.shape


@pytest.mark.parametrize('maprange', ['maximal', 'peak', 'energy'])
def test_ssq_cwt_maprange(maprange):
    Tx, *_ = stq.ssq_cwt(x, scales='log', maprange=maprange, nv=8,
                         astensor=False)
    assert np.isfinite(Tx).all()


def test_ssq_cwt_maprange_tuple():
    Tx, *_ = stq.ssq_cwt(x, scales='log', maprange=(0.05, 0.45), nv=8,
                         astensor=False)
    assert np.isfinite(Tx).all()


@pytest.mark.parametrize('padtype', ['reflect', 'zero', 'symmetric',
                                     'replicate', 'wrap'])
def test_cwt_padtypes(padtype):
    Wx, sc = stq.cwt(x, scales='log', nv=8, padtype=padtype,
                     astensor=False)
    assert np.isfinite(Wx).all()


@pytest.mark.parametrize('difftype,difforder', [('trig', None),
                                                ('phase', None),
                                                ('numeric', 1),
                                                ('numeric', 2),
                                                ('numeric', 4)])
def test_ssq_cwt_difftypes(difftype, difforder):
    Tx, *_ = stq.ssq_cwt(x, scales='log', nv=8, difftype=difftype,
                         difforder=difforder, get_w=True, astensor=False)
    assert np.isfinite(Tx).all()


@pytest.mark.parametrize('wavelet', ['gmw', 'morlet',
                                     ('gmw', {'beta': 8.}),
                                     ('bump', {}), ('cmhat', {}),
                                     ('hhhat', {})])
def test_cwt_all_wavelets(wavelet):
    Wx, sc = stq.cwt(x, wavelet, scales='log', nv=8, astensor=False)
    assert np.isfinite(Wx).all()


@pytest.mark.parametrize('window_kind', [None, 'hamming', 'hann'])
@pytest.mark.parametrize('n_fft', [64, 121])
def test_stft_windows(window_kind, n_fft):
    Sx = stq.stft(x, window_kind, n_fft=n_fft, astensor=False) \
        if False else stq.stft(x, window_kind, n_fft=n_fft)
    Sx = Sx.to_numpy()
    assert np.isfinite(Sx).all()
    assert Sx.shape[0] == n_fft // 2 + 1


@pytest.mark.parametrize('hop_len', [1, 4])
@pytest.mark.parametrize('modulated', [True, False])
def test_stft_hop_modulated(hop_len, modulated):
    Sx = stq.stft(x, n_fft=64, hop_len=hop_len,
                  modulated=modulated).to_numpy()
    assert np.isfinite(Sx).all()


def test_ssq_stft_flipud():
    Tx1, *_ = stq.ssq_stft(x, n_fft=64, flipud=False, astensor=False)
    Tx2, *_ = stq.ssq_stft(x, n_fft=64, flipud=True, astensor=False)
    assert np.allclose(np.abs(Tx1), np.abs(Tx2[::-1]), atol=1e-6)


def test_ssq_stft_squeezing_phase_from_raw():
    """Non-'sum' squeezing: the bin map must come from the RAW transform
    (the fused fast path must equal the explicit get_w path). Regression:
    r2 fast path squeezed BEFORE the phase transform, sending a tone's
    ridge to Nyquist under 'lebesgue'."""
    for squeezing in ('lebesgue', 'abs'):
        Tx_f, *_ = stq.ssq_stft(x, n_fft=128, squeezing=squeezing,
                                astensor=False)
        Tx_w, *_ = stq.ssq_stft(x, n_fft=128, squeezing=squeezing,
                                get_w=True, astensor=False)
        assert np.allclose(Tx_f, Tx_w, atol=1e-6), squeezing


def test_ssq_cwt_squeezing_phase_from_raw():
    for squeezing in ('lebesgue', 'abs'):
        Tx_f, *_ = stq.ssq_cwt(x, scales='log', nv=8, squeezing=squeezing,
                               astensor=False)
        Tx_w, *_ = stq.ssq_cwt(x, scales='log', nv=8, squeezing=squeezing,
                               get_w=True, astensor=False)
        assert np.allclose(Tx_f, Tx_w, atol=1e-6), squeezing


def test_squeezing_callable():
    """User-supplied squeezing functions must be applied (r2 fast path
    silently replaced them with 'sum') and must not disturb the bin map:
    scaling values by 2 must exactly double Tx."""
    Tx1, *_ = stq.ssq_cwt(x, scales='log', nv=8, squeezing='sum',
                          astensor=False)
    Tx2, *_ = stq.ssq_cwt(x, scales='log', nv=8,
                          squeezing=lambda W: W * 2, astensor=False)
    assert np.allclose(Tx2, 2 * Tx1, atol=1e-6)

    Sx1, *_ = stq.ssq_stft(x, n_fft=128, squeezing='sum', astensor=False)
    Sx2, *_ = stq.ssq_stft(x, n_fft=128, squeezing=lambda W: W * 2,
                           astensor=False)
    assert np.allclose(Sx2, 2 * Sx1, atol=1e-6)


def test_dtype_float64_pipeline():
    Tx, Wx, fr, sc = stq.ssq_cwt(x.astype(np.float64),
                                 ('gmw', {'dtype': 'float64'}),
                                 scales='log', nv=8, astensor=False)
    assert Tx.dtype == np.complex128
    xr = stq.issq_cwt(Tx)
    assert stq.toolkit.mad_rms(x, xr) < 0.1
