# -*- coding: utf-8 -*-
"""Banded STFT filterbank support (ops/stft_conv._band_plan): the table
kernel contracts only each row's concentrated spectral band, with the
band shift folded into a per-row output phase. These tests pin:

  * band-plan sanity (alignment, width bound, wrap handling),
  * banded == unbanded table kernel within the tail-mass error budget
    (interpret mode, derivative included),
  * the public ssq_stft bins route with banding on vs off,
  * fallback to the full contraction for wide-spectrum windows.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.configs import configure, reset_config
from ssqueezepy_tpu.models.stft import _window_key
from ssqueezepy_tpu.models.windows import get_window
from ssqueezepy_tpu.ops.stft_conv import (stft_conv, _next_fft_len,
                                          _band_plan,
                                          _device_filterbank_banded)
from ssqueezepy_tpu.ops.fft import _factorize

rng = np.random.default_rng(0)


def _dpss_key(n_fft):
    window, dwin = get_window(None, n_fft, n_fft, derivative=True)
    return _window_key(window, dwin)


def test_band_plan_sane():
    N, n_fft = 4000, 256
    Np2 = _next_fft_len(N + n_fft - 1)
    f1, f2 = _factorize(Np2)
    rows0 = Np2 // f2
    plan = _band_plan(_dpss_key(n_fft), n_fft, Np2, True)
    assert plan is not None
    r0, br = plan
    assert len(r0) == n_fft // 2 + 1
    assert br % 8 == 0 and 8 <= br <= rows0 // 2
    assert all(v % 8 == 0 and 0 <= v < rows0 for v in r0)
    # low rows wrap around row 0: their start sits near the top
    assert r0[0] == 0 or r0[0] > rows0 // 2


@pytest.mark.parametrize('N,n_fft', [(4000, 256), (777, 128)])
def test_banded_matches_unbanded_interpret(N, n_fft):
    wk = _dpss_key(n_fft)
    padlength = N + n_fft - 1
    if _band_plan(wk, n_fft, _next_fft_len(padlength), True) is None:
        pytest.skip('band does not pay at this shape')
    x = rng.standard_normal(N).astype(np.float32)
    xj = jnp.asarray(x)
    try:
        configure(stft_band=True)
        Sb, Db = stft_conv(xj, 1.0, n_fft, N, wk, True, True, 'reflect',
                           padlength, 'float32', interpret=True)
        configure(stft_band=False)
        Su, Du = stft_conv(xj, 1.0, n_fft, N, wk, True, True, 'reflect',
                           padlength, 'float32', interpret=True)
    finally:
        reset_config()
    for a, b in ((Sb.re, Su.re), (Sb.im, Su.im),
                 (Db.re, Du.re), (Db.im, Du.im)):
        m = float(jnp.abs(b).max())
        assert float(jnp.abs(a - b).max()) / m < 2e-5


def test_ssq_stft_banded_bins_route():
    """Public ssq_stft through the interpret bins route, banding on vs
    off: Sx within the tail-mass budget; Tx column sums (inversion
    integral, immune to +-1 bin flips near boundaries) agree."""
    N, n_fft = 1900, 128   # Np2=2048=(32, 64): bins route applicable
    x = rng.standard_normal(N).astype(np.float32)
    try:
        configure(backend='tpu', pallas_interpret=True, stft_band=True)
        wk = _dpss_key(n_fft)
        if _device_filterbank_banded(wk, n_fft,
                                     _next_fft_len(N + n_fft - 1), True,
                                     'float32') is None:
            pytest.skip('band does not pay at this shape')
        Tb, Sb, frb, _ = stq.ssq_stft(x, n_fft=n_fft, dtype='float32',
                                      astensor=False)
        configure(stft_band=False)
        Tu, Su, fru, _ = stq.ssq_stft(x, n_fft=n_fft, dtype='float32',
                                      astensor=False)
    finally:
        reset_config()
    m = np.abs(Tu).max()
    assert np.abs(Sb - Su).max() / np.abs(Su).max() < 2e-5
    assert np.abs(Tb.sum(-2) - Tu.sum(-2)).max() / m < 2e-5
    # bin flips from the tiny Sx perturbation are rare
    assert (np.abs(Tb - Tu) > 1e-4 * m).mean() < 0.02
    assert np.allclose(frb, fru)


def test_wide_window_falls_back():
    """A rectangular window's sinc spectrum decays too slowly for the
    tail-mass budget — the plan must refuse and the unbanded kernel
    must serve the call unchanged."""
    N, n_fft = 1000, 128
    window = np.ones(n_fft)
    win, dwin = get_window(window, n_fft, n_fft, derivative=True)
    wk = _window_key(win, dwin)
    Np2 = _next_fft_len(N + n_fft - 1)
    assert _band_plan(wk, n_fft, Np2, True) is None
    assert _device_filterbank_banded(wk, n_fft, Np2, True,
                                     'float32') is None
    x = rng.standard_normal(N).astype(np.float32)
    Sx, _ = stft_conv(jnp.asarray(x), 1.0, n_fft, N, wk, True, False,
                      'reflect', N + n_fft - 1, 'float32',
                      interpret=True)
    Sf = stq.stft(x, window=window, n_fft=n_fft)
    m = float(jnp.abs(Sf.re).max())
    assert float(jnp.abs(Sx.re - Sf.re).max()) / m < 2e-5
