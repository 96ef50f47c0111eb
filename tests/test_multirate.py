# -*- coding: utf-8 -*-
"""Halfband decimation/interpolation primitives (ops/multirate.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssqueezepy_tpu.ops.multirate import (halfband_fir, conv_valid,
                                          decimate2, interp2)


def _bandlimited(N, fmax=0.35, seed=0):
    rng = np.random.default_rng(seed)
    spec = np.zeros(N // 2 + 1, complex)
    band = int(fmax / 2 * N)
    spec[1:band] = (rng.standard_normal(band - 1)
                    + 1j * rng.standard_normal(band - 1))
    x = np.fft.irfft(spec, N)
    return (x / np.abs(x).max()).astype(np.float64)


def test_halfband_properties():
    h = halfband_fir()
    assert len(h) == 63
    assert abs(h.sum() - 1) < 1e-12
    c = 31
    off = h[c % 2::2] if c % 2 else h[::2]
    # every second off-center tap is exactly zero
    n = np.arange(63) - c
    assert np.all(h[(n % 2 == 0) & (n != 0)] == 0)
    # response: flat passband, deep stopband
    w = np.linspace(0, np.pi, 512)
    H = np.abs(np.exp(-1j * np.outer(w, np.arange(63))) @ h)
    assert np.abs(H[w < 0.4 * np.pi] - 1).max() < 1e-4
    assert H[w > 0.6 * np.pi].max() < 1e-4
    with pytest.raises(ValueError):
        halfband_fir(64)


def test_conv_valid_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(257)
    h = halfband_fir(31)
    y = np.asarray(conv_valid(jnp.asarray(x), h))
    ref = np.correlate(x, h, mode='valid')
    assert np.abs(y - ref).max() < 1e-12


def test_decimate_interp_round_trip():
    """Band-limited content below the halfband cutoff survives a
    decimate+interp round trip to the filter's stopband level; total
    delay is taps-1 full-rate samples."""
    N = 4096
    x = _bandlimited(N)
    xi = np.asarray(interp2(decimate2(jnp.asarray(x))))
    d = 62
    m = min(len(xi), N - d)
    err = np.abs(xi[:m] - x[d:d + m])[50:-50].max()
    assert err < 1e-4, err


def test_two_octave_cascade():
    """Content below pi/4 survives two decimation stages; cumulative
    analysis delay is g*(2^j - 1) full-rate samples (g = 31)."""
    N = 8192
    x = _bandlimited(N, fmax=0.17)
    x1 = decimate2(jnp.asarray(x))
    x2 = np.asarray(decimate2(x1))
    g = 31
    # x2[m] ~ lowpassed x at full-rate position 4m + g*(2^2 - 1)
    d2 = g * 3
    idx = 4 * np.arange(len(x2)) + d2
    keep = (idx > 200) & (idx < N - 200)
    err = np.abs(x2[keep] - x[idx[keep]]).max()
    assert err < 1e-3, err


def test_batched_shapes():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 1024)))
    xd = decimate2(x)
    assert xd.shape == (3, (1024 - 63 + 1 + 1) // 2)
    xi = interp2(xd, n_out=800)
    assert xi.shape == (3, 800)
