# -*- coding: utf-8 -*-
"""Convolution-form STFT (hop=1) vs the framed reference path — the
"same math, N execution paths" pattern (SURVEY.md §4.2)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ssqueezepy_tpu.models.stft import stft, _window_key
from ssqueezepy_tpu.models.windows import get_window
from ssqueezepy_tpu.ops.stft_conv import stft_conv


@pytest.mark.parametrize('N,n_fft,modulated,deriv',
                         [(777, 64, True, True), (1000, 121, True, False),
                          (777, 64, False, True), (512, 60, True, True)])
def test_stft_conv_matches_framed(N, n_fft, modulated, deriv):
    x = np.random.default_rng(0).standard_normal(N).astype(np.float32)
    out = stft(x, n_fft=n_fft, modulated=modulated, derivative=deriv)
    Sx_f, dSx_f = out if deriv else (out, None)

    window, diff_window = get_window(None, n_fft, n_fft, derivative=True,
                                     dtype='float32')
    wk = _window_key(window, diff_window if deriv else None)
    for interpret in (False, True):   # XLA path and Pallas table kernel
        Sx_c, dSx_c = stft_conv(jnp.asarray(x), 1.0, n_fft, N, wk,
                                modulated, deriv, 'reflect',
                                N + n_fft - 1, 'float32',
                                interpret=interpret)
        m = float(jnp.abs(Sx_f.re).max())
        assert float(jnp.abs(Sx_c.re - Sx_f.re).max()) / m < 2e-5
        assert float(jnp.abs(Sx_c.im - Sx_f.im).max()) / m < 2e-5
        if deriv:
            md = float(jnp.abs(dSx_f.re).max())
            assert float(jnp.abs(dSx_c.re - dSx_f.re).max()) / md < 2e-5


def test_stft_conv_batched():
    N, n_fft = 512, 64
    xb = np.random.default_rng(1).standard_normal((3, N)).astype(np.float32)
    out1 = stft(xb, n_fft=n_fft)
    window, _ = get_window(None, n_fft, n_fft, derivative=True,
                           dtype='float32')
    wk = _window_key(window, None)
    Sx_c, _ = stft_conv(jnp.asarray(xb), 1.0, n_fft, N, wk, True, False,
                        'reflect', N + n_fft - 1, 'float32')
    m = float(jnp.abs(out1.re).max())
    assert float(jnp.abs(Sx_c.re - out1.re).max()) / m < 5e-6
