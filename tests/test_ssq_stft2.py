# -*- coding: utf-8 -*-
"""Second-order synchrosqueezed STFT (FSST2) — beyond-reference feature.

Validation is against the METHOD's defining properties (no reference
implementation exists to compare with):
  * exact on linear chirps: the corrected estimate w2 equals the true
    instantaneous frequency at every strong cell, so the reassigned
    energy concentrates into ~1 bin where first-order smears;
  * reduces to first order on pure tones;
  * inversion unchanged (issq_stft round trip);
  * fs-invariance of the physical-units arithmetic.
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq


def test_fsst2_exact_on_linear_chirp():
    """The defining property: the second-order estimate w2 equals the
    true instantaneous frequency at every energetic cell of a linear
    chirp (to float precision), where first order carries a bias."""
    N, n_fft = 2048, 256
    n = np.arange(N)
    c = 2e-4                         # steep: 2*pi*c*sigma_t^2 ~ 4.5
    x = np.cos(2 * np.pi * (0.05 * n + c / 2 * n ** 2)) \
        .astype(np.float64)
    kw = dict(n_fft=n_fft, dtype='float64', astensor=False)
    _, Sx, _, _, w1 = stq.ssq_stft(x, get_w=True, **kw)
    _, _, _, _, w2 = stq.ssq_stft2(x, get_w=True, **kw)
    f = 0.05 + c * n
    m = n_fft
    E = np.abs(Sx[:, m:-m]) ** 2
    fcol = f[m:-m][None]

    def werr(w):
        wc = w[:, m:-m]
        act = np.isfinite(wc) & (E > 1e-4 * E.max())
        return (np.abs(np.where(act, wc, 0) - fcol) * E * act).sum() \
            / (E * act).sum() * n_fft            # bins

    e1, e2 = werr(w1), werr(w2)
    assert e2 < 1e-3, e2
    assert e1 > 0.05, e1                         # order 1 is biased here


def test_fsst2_sharpens_sine_fm():
    """On fast wide sinusoidal FM, first-order reassignment leaves a
    large share of |Tx| mass off the true ridge; second order collapses
    it."""
    N, n_fft = 4096, 512
    n = np.arange(N)
    f0, A, fm = 0.25, 0.06, 1 / 600.
    phi = f0 * n + (A / (2 * np.pi * fm)) * np.sin(2 * np.pi * fm * n)
    x = np.cos(2 * np.pi * phi).astype(np.float64)
    finst = f0 + A * np.cos(2 * np.pi * fm * n)
    kw = dict(n_fft=n_fft, dtype='float64', astensor=False)
    Tx1, *_ = stq.ssq_stft(x, **kw)
    Tx2, *_ = stq.ssq_stft2(x, **kw)
    m = n_fft
    bins = np.round(finst[m:-m] * n_fft).astype(int)
    rows = np.arange(n_fft // 2 + 1)[:, None]
    off = np.abs(rows - bins[None]) > 1

    def offmass(Tx):
        a = np.abs(Tx[:, m:-m])
        return float((a * off).sum() / a.sum())

    o1, o2 = offmass(Tx1), offmass(Tx2)
    assert o1 > 0.3, o1                          # order 1 smears badly
    assert o2 < 0.1, o2                          # order 2 collapses it


def test_fsst2_equals_fsst1_on_tone():
    N, n_fft = 2048, 256
    n = np.arange(N)
    x = np.cos(2 * np.pi * 0.11 * n).astype(np.float64)
    kw = dict(n_fft=n_fft, dtype='float64', astensor=False)
    Tx1, *_ = stq.ssq_stft(x, **kw)
    Tx2, *_ = stq.ssq_stft2(x, **kw)
    m = n_fft
    num = np.abs(Tx2[:, m:-m] - Tx1[:, m:-m]).max()
    den = np.abs(Tx1).max()
    assert num / den < 1e-6, num / den


def test_fsst2_reconstructs():
    N, n_fft = 4096, 256
    n = np.arange(N)
    x = np.cos(2 * np.pi * (0.03 * n + 0.12 / N / 2 * n ** 2)) \
        .astype(np.float32)
    Tx2, *_ = stq.ssq_stft2(x, n_fft=n_fft, astensor=False)
    xr = np.asarray(stq.issq_stft(Tx2, n_fft=n_fft))
    assert stq.toolkit.mad_rms(x, xr) < 0.05


def test_fsst2_fs_invariance():
    """Physical-units arithmetic: the reassigned map must land in the
    same bins regardless of fs scaling. Raw amplitude scales by the
    squeeze constant (ssq_freqs spacing ∝ fs — same convention as the
    first-order transform), so compare after removing that ratio."""
    N, n_fft = 2048, 256
    n = np.arange(N)
    x = np.cos(2 * np.pi * (0.04 * n + 0.1 / N / 2 * n ** 2)) \
        .astype(np.float64)
    Tx_a, *_ = stq.ssq_stft2(x, n_fft=n_fft, fs=1., dtype='float64',
                             astensor=False)
    Tx_b, *_ = stq.ssq_stft2(x, n_fft=n_fft, fs=250., dtype='float64',
                             astensor=False)
    num = np.abs(Tx_a - Tx_b / 250.).max()
    assert num / np.abs(Tx_a).max() < 1e-9, num


def test_fsst2_batched_matches_single():
    N, n_fft = 2048, 128
    n = np.arange(N)
    x1 = np.cos(2 * np.pi * (0.05 * n + 0.1 / N / 2 * n ** 2)) \
        .astype(np.float32)
    x2 = np.cos(2 * np.pi * 0.2 * n).astype(np.float32)
    Txb, *_ = stq.ssq_stft2(np.stack([x1, x2]), n_fft=n_fft,
                            astensor=False)
    Tx1, *_ = stq.ssq_stft2(x1, n_fft=n_fft, astensor=False)
    assert Txb.shape[0] == 2
    assert np.abs(Txb[0] - Tx1).max() / np.abs(Tx1).max() < 1e-5


def test_fsst2_fused_pallas_routes_and_matches():
    """Round-5 fused FSST2 table kernel (five banded window transforms
    + chirp-rate correction + bin map in one kernel, zero-prep scatter)
    vs the XLA path, interpret mode. V tight; Tx column sums tight;
    isolated bin-boundary flips tolerated on the full plane."""
    from ssqueezepy_tpu.configs import configure, reset_config
    import ssqueezepy_tpu.ops.stft_conv as _sc
    # N + n_fft - 1 in (3840, 4096]: Np2 = 4096 = 64 x 64, the fused
    # table kernel's applicability window
    N, n_fft = 3800, 256
    rng = np.random.default_rng(5)
    n = np.arange(N)
    x = (np.cos(2 * np.pi * (0.05 * n + 0.1 / (2 * N) * n ** 2))
         + 0.1 * rng.standard_normal(N)).astype(np.float32)
    Tx_c, V_c, fr_c, _ = stq.ssq_stft2(x, n_fft=n_fft, dtype='float32',
                                       astensor=False)
    calls, orig = [], _sc.fsst2_pallas_rows
    _sc.fsst2_pallas_rows = \
        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    configure(backend='tpu', pallas_interpret=True)
    try:
        Tx_p, V_p, fr_p, _ = stq.ssq_stft2(x, n_fft=n_fft,
                                           dtype='float32',
                                           astensor=False)
    finally:
        reset_config()
        _sc.fsst2_pallas_rows = orig
    assert calls, "fused FSST2 kernel did not engage"
    assert np.allclose(fr_p, fr_c)
    m = np.abs(Tx_c).max()
    assert np.abs(V_p - V_c).max() / np.abs(V_c).max() < 2e-5
    assert np.abs(Tx_p.sum(-2) - Tx_c.sum(-2)).max() / m < 1e-4
    # default aux banks run single-pass bf16 (ssq_lowprec_deriv): ~5%
    # of noise cells sit within bf16 rounding of a lin-grid bin edge
    # and flip +-1 bin; colsum/energy above are flip-invariant
    assert (np.abs(Tx_p - Tx_c) > 1e-3 * m).mean() < 0.12
    e_p, e_c = np.abs(Tx_p).sum(), np.abs(Tx_c).sum()
    assert abs(e_p - e_c) / e_c < 0.02
