# -*- coding: utf-8 -*-
"""Wavelet math: GMW closures vs full morsewave computation, norms,
center-frequency/resolution scaling laws, admissibility stability.

Mirrors the reference's tests/gmw_test.py, props_test.py, adm_coef_test.py.
"""
import numpy as np
import pytest

from ssqueezepy_tpu import Wavelet, center_frequency, freq_resolution, \
    time_resolution, adm_cwt, adm_ssq
from ssqueezepy_tpu.models.gmw import gmw, morsewave, morsefreq, compute_gmw
from ssqueezepy_tpu.models.wavelets import _xifn


def test_gmw_api_vs_morsewave():
    """gmw() closures agree exactly with the full `morsewave` generator
    (reference gmw_test.py:20-56)."""
    N = 512
    for gamma, beta in [(3., 60.), (3., 8.), (2., 20.)]:
        for norm in ('bandpass', 'energy'):
            wc = morsefreq(gamma, beta)
            psih_full, _ = morsewave(N, wc, gamma, beta, K=1, norm=norm)
            fn = gmw(gamma, beta, norm, 0)
            xi = _xifn(1.0, N)
            psih_api = np.zeros(N)
            psih_api[:N // 2 + 1] = np.asarray(fn(xi[:N // 2 + 1], xp=np))
            if norm == 'energy':
                # morsewave's energy norm includes no sqrt(scale) here
                pass
            assert np.abs(psih_full - psih_api).max() < 1e-10, \
                (gamma, beta, norm)


def test_gmw_higher_order_vs_morsewave():
    N = 512
    gamma, beta, K = 3., 60., 3
    wc = morsefreq(gamma, beta)
    psih_full, _ = morsewave(N, wc, gamma, beta, K=K, norm='bandpass')
    xi = _xifn(1.0, N)
    for k in range(K):
        fn = gmw(gamma, beta, 'bandpass', k)
        psih_api = np.zeros(N)
        psih_api[:N // 2 + 1] = np.asarray(fn(xi[:N // 2 + 1], xp=np))
        assert np.abs(psih_full[:, k] - psih_api).max() < 1e-9, k


def test_gmw_norms():
    """L1: peak value 2 at center frequency; L2: unit time-domain energy
    (reference gmw_test.py:59-81)."""
    N = 1024
    for gamma, beta in [(3., 60.), (3., 8.)]:
        wc = morsefreq(gamma, beta)
        fn = gmw(gamma, beta, 'bandpass')
        assert abs(float(np.asarray(fn(np.array([wc]), xp=np))[0]) - 2) \
            < 1e-12

        # energy norm: sum|psi|^2 == 1 with sqrt(scale) scaling
        scale = 10
        psih, psi = compute_gmw(N, scale, gamma, beta, time=True,
                                norm='energy')
        energy = np.sum(np.abs(psi) ** 2)
        assert abs(energy - 1) < 1e-2, energy


def test_center_frequency_scaling():
    """wc ~ 1/scale for 'peak' (reference props_test.py)."""
    wav = Wavelet(('gmw', {'dtype': 'float64'}))
    wcs = [center_frequency(wav, scale=s, N=2048, kind='peak')
           for s in (10, 20, 40)]
    assert abs(wcs[0] / wcs[1] - 2) < .05
    assert abs(wcs[1] / wcs[2] - 2) < .05


def test_resolutions_and_harea():
    wav = Wavelet(('gmw', {'dtype': 'float64'}))
    std_t = time_resolution(wav, scale=wav.scalec_ct, N=1024)
    std_w = freq_resolution(wav, scale=wav.scalec_ct, N=1024)
    assert std_t * std_w >= 0.5 - 1e-6  # Heisenberg
    assert std_t * std_w < 0.6  # GMW(3,60) is near-optimal


@pytest.mark.parametrize("wavelet", [
    ('gmw', {'dtype': 'float64'}),
    ('gmw', {'beta': 8, 'dtype': 'float64'}),
    ('morlet', {'dtype': 'float64'}),
    ('morlet', {'mu': 6, 'dtype': 'float64'}),
])
def test_admissibility(wavelet):
    """Admissibility integrals converge and aren't degenerate
    (reference adm_coef_test.py:16-54)."""
    w = Wavelet(wavelet)
    for fn in (adm_cwt, adm_ssq):
        val = fn(w)
        assert np.isfinite(val)
        assert val > 1e-3, (wavelet, fn.__name__, val)


def test_simple_wavelets_eval():
    for name in ('morlet', 'bump', 'cmhat', 'hhhat'):
        w = Wavelet((name, {'dtype': 'float64'}))
        out = w.evaluate_np(np.linspace(0, np.pi, 64))
        assert np.isfinite(out).all(), name
        # device evaluation matches host
        dev = np.asarray(w(np.linspace(0, np.pi, 64)))
        assert np.abs(dev - out).max() < 1e-5, name


def test_wavelet_info_and_viz_api():
    w = Wavelet('gmw')
    w.info()
    w.info(nondim=False)
    assert 'GMW' in w.name
