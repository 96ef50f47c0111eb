# -*- coding: utf-8 -*-
"""Config layering: env overrides built-ins (the reference unit-tests its
env-override-of-ini behavior, fft_test.py:114-134), gdefaults fills None
kwargs, and wavelet property scaling laws (reference props_test.py)."""
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu import configs
from ssqueezepy_tpu.models.wavelets import (Wavelet, center_frequency,
                                            freq_resolution, time_resolution)


def test_env_overrides(monkeypatch):
    monkeypatch.setenv('SSQTPU_DTYPE', 'float64')
    monkeypatch.setenv('SSQTPU_DOWNSAMPLE', '8')
    monkeypatch.setenv('SSQTPU_PALLAS', '0')
    cfg = configs.reset_config()
    try:
        assert cfg.dtype == 'float64'
        assert cfg.downsample == 8
        assert cfg.use_pallas is False
    finally:
        monkeypatch.delenv('SSQTPU_DTYPE')
        monkeypatch.delenv('SSQTPU_DOWNSAMPLE')
        monkeypatch.delenv('SSQTPU_PALLAS')
        configs.reset_config()


def test_configure_and_gdefaults():
    cfg = configs.configure(downsample=4)
    assert cfg.downsample == 4
    out = configs.gdefaults('gmw', gamma=None, beta=None, norm='energy')
    assert out['gamma'] == 3.0 and out['beta'] == 60.0
    assert out['norm'] == 'energy'  # explicit kwarg wins
    out2 = configs.gdefaults('morlet', mu=None)
    assert out2['mu'] == 13.4


def test_device_dtype_fallback():
    import jax
    if jax.config.jax_enable_x64:
        assert configs.device_dtype('float64') == 'float64'
    assert configs.device_dtype('float32') == 'float32'


# ---- property scaling laws (reference props_test.py:19-186) --------------
def test_center_frequency_inverse_scale():
    w = Wavelet(('gmw', {'dtype': 'float64'}), N=4096)
    wc1 = center_frequency(w, scale=10., N=4096, kind='peak')
    wc2 = center_frequency(w, scale=20., N=4096, kind='peak')
    assert abs(wc1 / wc2 - 2) < 3e-2, (wc1, wc2)


def test_morlet_center_frequency_prop_mu():
    for mu in (5., 10.):
        # scale large enough that the peak w = mu/scale is on the grid
        w = Wavelet(('morlet', {'mu': mu, 'dtype': 'float64'}), N=4096)
        wc = center_frequency(w, scale=8., N=4096, kind='peak')
        # peak of morlet at w = mu -> wc(scale) ~= mu / scale
        assert abs(wc * 8. / mu - 1) < 5e-2, (mu, wc)


def test_std_scaling_laws():
    w = Wavelet(('gmw', {'dtype': 'float64'}), N=8192)
    s1, s2 = 16., 32.
    st1 = time_resolution(w, s1, N=8192, nondim=False, force_int=False)
    st2 = time_resolution(w, s2, N=8192, nondim=False, force_int=False)
    assert abs(st2 / st1 - 2) < 0.1, (st1, st2)       # std_t ~ scale
    sw1 = freq_resolution(w, s1, N=8192, nondim=False, force_int=False)
    sw2 = freq_resolution(w, s2, N=8192, nondim=False, force_int=False)
    assert abs(sw1 / sw2 - 2) < 0.1, (sw1, sw2)       # std_w ~ 1/scale


def test_heisenberg_area():
    w = Wavelet(('gmw', {'dtype': 'float64'}), N=8192)
    st = time_resolution(w, 20., N=8192, nondim=False, force_int=False)
    sw = freq_resolution(w, 20., N=8192, nondim=False, force_int=False)
    assert st * sw >= 0.5 - 1e-3, st * sw


def test_scatter_tile_knob(monkeypatch):
    """SSQTPU_SCATTER_T overrides the default and clamps at the Pallas
    128-lane floor (round-5 sweep: T=64 fails block-shape lowering)."""
    from ssqueezepy_tpu.configs import scatter_tile
    monkeypatch.delenv('SSQTPU_SCATTER_T', raising=False)
    assert scatter_tile() == 256
    assert scatter_tile(default=512) == 512
    monkeypatch.setenv('SSQTPU_SCATTER_T', '64')
    assert scatter_tile() == 128
    monkeypatch.setenv('SSQTPU_SCATTER_T', '1024')
    assert scatter_tile() == 1024


def test_config_file_malformed_values_skip(tmp_path, monkeypatch):
    """Review finding: a malformed typed value (or a '%' in a value)
    must warn-and-skip, never crash get_config()."""
    from ssqueezepy_tpu import configs as C
    p = tmp_path / 'config.ini'
    p.write_text("[global]\ndownsample = four\ndtype = 100%float\n")
    monkeypatch.setenv('SSQTPU_CONFIG', str(p))
    old = C._CONFIG
    try:
        C._CONFIG = None
        cfg = C.get_config()             # must not raise
        assert cfg.downsample == 4       # malformed entry skipped
        assert cfg.dtype == '100%float'  # '%' passes (no interpolation)
    finally:
        C._CONFIG = old
