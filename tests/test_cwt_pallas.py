# -*- coding: utf-8 -*-
"""Fused Pallas CWT kernel (interpret mode) vs the XLA cwt_core —
the "same math, N execution paths" pattern (SURVEY.md §4.2)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.models.cwt import (cwt_core, _process_gmw_wavelet,
                                       _canonical_wavelet)
from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_pallas,
                                           cwt_pallas_applicable)
from ssqueezepy_tpu.ops.fft import fft
from ssqueezepy_tpu.ops.pad import padsignal, pad_params
from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.utils.cwt_utils import process_scales


def _setup(N, wav=('gmw', {'dtype': 'float32'}), scales='log', nv=16):
    n_up, n1, _ = pad_params(N, 'reflect')
    w = _canonical_wavelet(Wavelet._init_if_not_isinstance(
        _process_gmw_wavelet(wav, True), N=N))
    x = np.random.default_rng(0).standard_normal(N).astype(np.float32)
    xp = padsignal(jnp.asarray(x), 'reflect')
    scales_j = jnp.asarray(process_scales(scales, N, w, nv=nv), jnp.float32)
    return w, xp, scales_j, n_up, n1


@pytest.mark.parametrize('N,dt,l1', [(3000, 0.5, True), (2048, 1.0, True),
                                     (3000, 1.0, False)])
def test_fused_cwt_matches_xla(N, dt, l1):
    w, xp, scales_j, n_up, n1 = _setup(N)
    assert cwt_pallas_applicable(w, n_up, False)

    Wx_r, dWx_r = jax.jit(lambda a, s: cwt_core(
        a, w, s, dt, True, l1, n1, N, False, False))(xp, scales_j)
    half = n_up // 2 + 1
    xh = fft(Complex(xp, jnp.zeros_like(xp)), out_range=(0, half),
             imag_zero=True, engine='matmul')
    Wx_p, dWx_p = cwt_fused_pallas(xh, scales_j, w, n_up, n1, N, dt,
                                   True, l1, interpret=True)
    m = float(jnp.abs(Wx_r.re).max())
    md = float(jnp.abs(dWx_r.re).max())
    assert float(jnp.abs(Wx_p.re - Wx_r.re).max()) / m < 2e-5
    assert float(jnp.abs(Wx_p.im - Wx_r.im).max()) / m < 2e-5
    assert float(jnp.abs(dWx_p.re - dWx_r.re).max()) / md < 2e-5
    assert float(jnp.abs(dWx_p.im - dWx_r.im).max()) / md < 2e-5


def test_fused_cwt_beta_variant():
    w, xp, scales_j, n_up, n1 = _setup(
        3000, ('gmw', {'beta': 8., 'dtype': 'float32'}))
    Wx_r, _ = jax.jit(lambda a, s: cwt_core(
        a, w, s, 1.0, False, True, n1, 3000, False, False))(xp, scales_j)
    half = n_up // 2 + 1
    xh = fft(Complex(xp, jnp.zeros_like(xp)), out_range=(0, half),
             imag_zero=True, engine='matmul')
    Wx_p, _ = cwt_fused_pallas(xh, scales_j, w, n_up, n1, 3000, 1.0,
                               False, True, interpret=True)
    m = float(jnp.abs(Wx_r.re).max())
    assert float(jnp.abs(Wx_p.re - Wx_r.re).max()) / m < 2e-5


def test_fused_cwt_row_unroll_matches_single():
    """The small-N path unrolls 8 scale rows per grid step (with the
    scale count padded up to a multiple of 8); assert against the XLA
    half-spectrum reference — pins the per-step row indexing, the
    (8, k2span, f1) output-block layout, and the edge-row padding."""
    from ssqueezepy_tpu.ops import cwt_pallas as cp
    N = 3000
    w, xp, scales_j, n_up, n1 = _setup(N)
    assert scales_j.shape[0] % 8 != 0  # exercise the padded tail
    half = n_up // 2 + 1
    xh = fft(Complex(xp, jnp.zeros_like(xp)), out_range=(0, half),
             imag_zero=True, engine='matmul')

    Wx_8, dWx_8 = cwt_fused_pallas(xh, scales_j, w, n_up, n1, N, 1.0,
                                   True, True, interpret=True)
    outs = cp._cwt_half_xla(xh.re, xh.im, scales_j.reshape(-1),
                            jnp.float32(1.0), w, n_up, n1, N, True, True,
                            'float32')
    m = float(jnp.abs(outs[0]).max())
    assert float(jnp.abs(Wx_8.re - outs[0]).max()) / m < 2e-5
    assert float(jnp.abs(Wx_8.im - outs[1]).max()) / m < 2e-5
    md = float(jnp.abs(outs[2]).max())
    assert float(jnp.abs(dWx_8.re - outs[2]).max()) / md < 2e-5


def test_fused_cwt_bins_variant():
    """(Wx, k) from the bin-output kernel == Wx from the 4-output kernel
    + the same phase/bin math applied outside (deriv_lowprec=False so
    the in-kernel derivative blocks match the written dWx exactly)."""
    from ssqueezepy_tpu.ops.cwt_pallas import cwt_fused_bins_pallas
    from ssqueezepy_tpu.ops.ssq_pallas import _phase_bin_math
    from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
    from ssqueezepy_tpu.models.ssqueezing import \
        _compute_associated_frequencies
    from ssqueezepy_tpu.utils.cwt_utils import process_scales

    N = 3000
    w, xp, scales_j, n_up, n1 = _setup(N)
    scales_np = np.asarray(scales_j).reshape(-1, 1)
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, w, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    params = dict(ssq_bin_params(ssq_freqs, True))
    gamma = float(10 * np.finfo(np.float32).eps)
    half = n_up // 2 + 1
    xh = fft(Complex(xp, jnp.zeros_like(xp)), out_range=(0, half),
             imag_zero=True, engine='matmul')

    Wx_b, k_b = cwt_fused_bins_pallas(
        xh, scales_j, w, n_up, n1, N, 1.0, True, params, gamma, True,
        interpret=True, deriv_lowprec=False)
    Wx_r, dWx_r = cwt_fused_pallas(xh, scales_j, w, n_up, n1, N, 1.0,
                                   True, True, interpret=True)
    k_ref, valid_ref = _phase_bin_math(
        Wx_r.re, Wx_r.im, dWx_r.re, dWx_r.im, params, gamma, True,
        params['mode'])
    k_ref = np.where(np.asarray(valid_ref), np.asarray(k_ref), -1)

    m = float(jnp.abs(Wx_r.re).max())
    assert float(jnp.abs(Wx_b.re - Wx_r.re).max()) / m < 1e-6
    assert float(jnp.abs(Wx_b.im - Wx_r.im).max()) / m < 1e-6
    # bin indices come from round() on float phase values: cells landing
    # exactly on a bin boundary may flip by one ulp of FMA-contraction
    # difference between the in-kernel and the reference computation (the
    # reference library's own +-1-bin criterion, algos.py:288-293) — so
    # demand exactness except for rare +-1-bin boundary flips
    kb = np.asarray(k_b)
    diff = kb != k_ref
    assert diff.mean() < 1e-4, diff.mean()
    both_valid = (kb >= 0) & (k_ref >= 0)
    assert np.array_equal(kb >= 0, k_ref >= 0)      # gamma gate identical
    assert np.abs(kb[both_valid & diff]
                  - k_ref[both_valid & diff]).max(initial=0) <= 1
