# -*- coding: utf-8 -*-
"""FFT engine tests: matmul engine vs numpy across sizes and modes.

Mirrors the reference's FFT-vs-scipy strategy (tests/fft_test.py:41-100):
same math, multiple execution paths, assert allclose.
"""
import numpy as np
import pytest

from ssqueezepy_tpu.ops.fft import (fft_matmul, ifft_matmul, rfft, irfft,
                                    fftshift, ifftshift)
from ssqueezepy_tpu.ops.complexlib import Complex

rng = np.random.default_rng(0)

SIZES = [8, 12, 64, 100, 128, 300, 598, 1024, 97, 1009, 2053, 4096]


@pytest.mark.parametrize("n", SIZES)
def test_fft_ifft_vs_numpy(n):
    z = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    zc = Complex.from_numpy(z, 'float64')

    out = fft_matmul(zc).to_numpy()
    ref = np.fft.fft(z, axis=-1)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-11, n

    out = ifft_matmul(zc).to_numpy()
    ref = np.fft.ifft(z, axis=-1)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-11, n


@pytest.mark.parametrize("n", [64, 598, 1024])
def test_rfft_irfft(n):
    x = rng.standard_normal(n)
    r = rfft(x, engine='matmul').to_numpy()
    assert np.abs(r - np.fft.rfft(x)).max() < 1e-10

    xr = np.asarray(irfft(Complex.from_numpy(np.fft.rfft(x), 'float64'),
                          n=n, engine='matmul'))
    assert np.abs(xr - x).max() < 1e-10


def test_axis_and_pruning():
    z = rng.standard_normal((5, 256)) + 1j * rng.standard_normal((5, 256))
    z[:, 129:] = 0
    out = ifft_matmul(Complex.from_numpy(z, 'float64'),
                      nonzero_prefix=129).to_numpy()
    assert np.abs(out - np.fft.ifft(z, axis=-1)).max() < 1e-13

    zT = np.ascontiguousarray(z.T)
    out = fft_matmul(Complex.from_numpy(zT, 'float64'), axis=0).to_numpy()
    assert np.abs(out - np.fft.fft(zT, axis=0)).max() < 1e-10


def test_float32_accuracy():
    z = (rng.standard_normal(2 ** 14) +
         1j * rng.standard_normal(2 ** 14)).astype(np.complex64)
    out = fft_matmul(Complex.from_numpy(z, 'float32')).to_numpy()
    ref = np.fft.fft(z)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-6


def test_shifts():
    for n in (8, 9):
        x = rng.standard_normal(n)
        assert np.allclose(np.asarray(fftshift(x)), np.fft.fftshift(x))
        assert np.allclose(np.asarray(ifftshift(x)), np.fft.ifftshift(x))
