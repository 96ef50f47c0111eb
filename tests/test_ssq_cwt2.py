# -*- coding: utf-8 -*-
"""Second-order synchrosqueezed CWT (WSST2) — beyond-reference feature.

Validation is against the METHOD's defining properties (no reference
implementation exists to compare with):
  * exact on linear chirps: the local complex-chirp regression recovers
    the true instantaneous frequency at every energetic cell to float
    precision, where first order carries a scale-dependent bias;
  * collapses the FM smearing first-order reassignment leaves (the
    higher the wavelet Q, the bigger the first-order smear);
  * reduces to first order on pure tones (the p2 numerator cancels);
  * inversion unchanged (issq_cwt round trip);
  * fs-invariant bin placement (log grids: const is fs-free).
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq


def _chirp(N, c, r, dtype=np.float64):
    n = np.arange(N)
    return np.cos(2 * np.pi * (c * n + r / 2 * n ** 2)).astype(dtype)


def test_wsst2_exact_on_linear_chirp():
    """Defining property: the second-order estimate w2 equals the true
    instantaneous frequency at every energetic cell of a linear chirp
    (to float precision); first order is biased at wavelet-duration
    scale."""
    N = 8192
    n = np.arange(N)
    c, r = 0.02, 0.36 / N
    x = _chirp(N, c, r)
    f = c + r * n
    _, Wx, _, _, w1 = stq.ssq_cwt(x, get_w=True, astensor=False)
    _, _, _, _, w2 = stq.ssq_cwt2(x, get_w=True, astensor=False)
    m = N // 6
    E = np.abs(Wx[:, m:-m]) ** 2
    act = E > 1e-4 * E.max()
    fc = f[m:-m][None]

    def werr(w):
        wa = np.where(np.isfinite(w[:, m:-m]), w[:, m:-m], 0)
        return (np.abs(wa - fc) * E * act).sum() / (E * act).sum()

    e1, e2 = werr(w1), werr(w2)
    assert e2 < 1e-6, e2
    assert e1 > 1e-5, e1                     # order 1 is biased here


def test_wsst2_sharpens_sine_fm():
    """On fast wide sinusoidal FM with a high-Q wavelet, first-order
    reassignment leaves a large share of |Tx| mass off the true ridge;
    second order collapses it."""
    N = 8192
    n = np.arange(N)
    f0, Afm, fm = 0.2, 0.08, 1 / 700.
    x = np.cos(2 * np.pi * (f0 * n + (Afm / (2 * np.pi * fm))
                            * np.sin(2 * np.pi * fm * n))) \
        .astype(np.float64)
    finst = f0 + Afm * np.cos(2 * np.pi * fm * n)
    wav = ('gmw', {'gamma': 3., 'beta': 300.})
    Tx1, _, fr, _ = stq.ssq_cwt(x, wavelet=wav, astensor=False)
    Tx2, *_ = stq.ssq_cwt2(x, wavelet=wav, astensor=False)
    m = 1200
    ridge = np.abs(np.log(fr[None]) - np.log(finst[m:-m, None])).argmin(1)
    rows = np.arange(len(fr))[:, None]
    off = np.abs(rows - ridge[None]) > 2

    def offmass(Tx):
        a = np.abs(Tx[:, m:-m])
        return float((a * off).sum() / a.sum())

    o1, o2 = offmass(Tx1), offmass(Tx2)
    assert o1 > 0.25, o1                     # order 1 smears badly
    assert o2 < 0.08, o2                     # order 2 collapses it


def test_wsst2_matches_first_order_on_tone():
    """On a pure tone the chirp-rate numerator cancels identically, so
    w2 == w1 away from the padding boundaries (where the second-order
    fit legitimately reacts to the reflection fold)."""
    N = 8192
    n = np.arange(N)
    x = np.cos(2 * np.pi * 0.07 * n).astype(np.float64)
    _, Wx, _, _, w1 = stq.ssq_cwt(x, get_w=True, astensor=False)
    _, _, _, _, w2 = stq.ssq_cwt2(x, get_w=True, astensor=False)
    m = 1500
    E = np.abs(Wx[:, m:-m]) ** 2
    act = E > 1e-3 * E.max()
    # inactive cells carry inf estimates (gamma-gated); subtract only
    # on the active set to keep inf - inf out of the where
    dw = np.zeros_like(E)
    dw[act] = w2[:, m:-m][act] - w1[:, m:-m][act]
    assert np.abs(dw).max() < 1e-5, np.abs(dw).max()


def test_wsst2_reconstructs():
    N = 8192
    x = _chirp(N, 0.03, 0.12 / N, np.float32)
    Tx2, *_ = stq.ssq_cwt2(x, astensor=False)
    xr = np.asarray(stq.issq_cwt(Tx2))
    assert stq.toolkit.mad_rms(x, xr) < 0.05


def test_wsst2_fs_invariant_bins():
    """Log ssq grids carry an fs-free squeeze constant and fs-scaled
    frequencies, so the reassigned map is IDENTICAL under fs scaling."""
    N = 4096
    x = _chirp(N, 0.04, 0.1 / N)
    wav = ('gmw', {'dtype': 'float64'})     # f64: no boundary-bin flips
    Tx_a, *_ = stq.ssq_cwt2(x, wavelet=wav, fs=1., astensor=False)
    Tx_b, *_ = stq.ssq_cwt2(x, wavelet=wav, fs=250., astensor=False)
    num = np.abs(Tx_a - Tx_b).max()
    assert num / np.abs(Tx_a).max() < 1e-9, num


def test_wsst2_batched_matches_single():
    # f64: in f32, batched-vs-single XLA reduction-order differences
    # flip near-boundary cells by one bin
    N = 4096
    x1 = _chirp(N, 0.05, 0.1 / N)
    x2 = np.cos(2 * np.pi * 0.2 * np.arange(N))
    wav = ('gmw', {'dtype': 'float64'})
    Txb, *_ = stq.ssq_cwt2(np.stack([x1, x2]), wavelet=wav,
                           astensor=False)
    Tx1, *_ = stq.ssq_cwt2(x1, wavelet=wav, astensor=False)
    assert Txb.shape[0] == 2
    # a cell sitting numerically ON a bin boundary may flip +-1 bin
    # between the batched and single programs (reduction order); column
    # sums — the inversion integrals — are invariant to such flips
    # (the library-wide +-1-bin criterion)
    assert np.abs(Txb[0] - Tx1).max() / np.abs(Tx1).max() < 1e-5
    cs = np.abs(Txb[0].sum(0) - Tx1.sum(0)).max()
    assert cs / np.abs(Tx1.sum(0)).max() < 1e-12, cs


def test_wsst2_morlet_and_rejection():
    """Morlet (analytic, differentiable spectral fn) works; a complex-
    valued-spectrum wavelet is rejected with a clear error."""
    N = 4096
    x = _chirp(N, 0.05, 0.15 / N, np.float32)
    Tx, Wx, fr, sc = stq.ssq_cwt2(x, wavelet='morlet', astensor=False)
    assert np.isfinite(np.abs(Tx)).all()
    with pytest.raises(NotImplementedError):
        stq.ssq_cwt2(x, wavelet=('bump', {'om': 1.}))


def test_wsst2_sharded_equals_single():
    """Scale-sharded WSST2 on the virtual 8-device mesh equals the
    single-device transform (same criterion as the first-order sharded
    tests: f32 bin-boundary flips allowed in the map, column sums
    tight)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ssqueezepy_tpu.parallel import make_mesh, ShardedSSQCWT2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    mesh = make_mesh(batch=2, scale=4)
    plan = ShardedSSQCWT2(512, ('gmw', {'dtype': 'float32'}),
                          scales='log', nv=16, mesh=mesh)
    Tx_s, Wx_s = plan(x)
    Tx_1, Wx_1, sf_1, _ = stq.ssq_cwt2(
        x, ('gmw', {'dtype': 'float32'}), scales='log', nv=16,
        astensor=False)
    assert np.abs(Wx_s.to_numpy() - Wx_1).max() < 1e-5
    assert np.abs(Tx_s.to_numpy() - Tx_1).max() < 6e-3
    assert np.abs(Tx_s.to_numpy().sum(-2) - Tx_1.sum(-2)).max() < 1e-5
    assert np.allclose(plan.ssq_freqs_out, sf_1)


def test_wsst2_scale_and_freq_grids():
    """Linear scales (per-row const array) and mixed log-scales /
    linear-ssq_freqs plans both run and stay finite."""
    N = 2048
    x = _chirp(N, 0.05, 0.1 / N, np.float32)
    Tx, *_ = stq.ssq_cwt2(x, scales='linear', astensor=False)
    assert np.isfinite(np.abs(Tx)).all()
    Tx, *_ = stq.ssq_cwt2(x, scales='log', ssq_freqs='linear',
                          astensor=False)
    assert np.isfinite(np.abs(Tx)).all()


def test_wsst2_fused_pallas_routes_and_matches():
    """Round-5 fused Pallas WSST2 (one kernel: five banks + chirp
    regression + bin map, zero-prep scatter) vs the XLA path — the
    interpret-mode twin of the on-chip pipeline. W must match tightly;
    Tx column sums (inversion integral, immune to the lowprec +-1-bin
    flips) tightly; full planes loosely."""
    from ssqueezepy_tpu.configs import configure, reset_config
    N = 2048
    rng = np.random.default_rng(3)
    x = (np.cos(2 * np.pi * (0.02 * np.arange(N)
                             + 0.3 / (2 * N) * np.arange(N) ** 2))
         + 0.1 * rng.standard_normal(N)).astype(np.float32)
    kw = dict(scales='log-piecewise', nv=8)
    Tx_c, Wx_c, fr_c, _ = stq.ssq_cwt2(x, ('gmw', {'dtype': 'float32'}),
                                       astensor=False, **kw)
    import ssqueezepy_tpu.ops.cwt_pallas as _cp
    calls, orig = [], _cp.cwt_fused_bins2_direct
    _cp.cwt_fused_bins2_direct = \
        lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    try:
        # full-precision aux banks: tight agreement (isolated bin-
        # boundary flips only)
        configure(backend='tpu', pallas_interpret=True,
                  ssq_lowprec_deriv=False)
        Tx_f, Wx_f, fr_p, _ = stq.ssq_cwt2(
            x, ('gmw', {'dtype': 'float32'}), astensor=False, **kw)
        # default lowprec aux banks: +-1-bin flips on borderline cells;
        # the inversion integral and energy are flip-invariant
        configure(ssq_lowprec_deriv=True)
        Tx_p, Wx_p, _, _ = stq.ssq_cwt2(
            x, ('gmw', {'dtype': 'float32'}), astensor=False, **kw)
    finally:
        reset_config()
        _cp.cwt_fused_bins2_direct = orig
    assert calls, "fused WSST2 kernel did not engage"
    assert np.allclose(fr_p, fr_c)
    m = np.abs(Tx_c).max()
    for Wx_x in (Wx_f, Wx_p):
        assert np.abs(Wx_x - Wx_c).max() / np.abs(Wx_c).max() < 2e-5
    assert (np.abs(Tx_f - Tx_c) > 1e-3 * m).mean() < 0.02
    for Tx_x in (Tx_f, Tx_p):
        assert np.abs(Tx_x.sum(-2) - Tx_c.sum(-2)).max() / m < 1e-4
        e_x, e_c = np.abs(Tx_x).sum(), np.abs(Tx_c).sum()
        assert abs(e_x - e_c) / e_c < 0.02


def test_wsst2_flipud_row_contract():
    """flipud only reverses Tx's row order (k -> omax - k); the returned
    ssq_freqs grid is ALWAYS reversed for CWT (the reference's own rule,
    ssqueezing.py:217-222: flips when `(cwt and not flipud) or flipud`).
    f64 so no bin-boundary flips muddy the row-reversal equality."""
    N = 1024
    n = np.arange(N)
    x = np.cos(2 * np.pi * (0.03 * n + 0.1 / (2 * N) * n ** 2)) \
        .astype(np.float64)
    wav = ('gmw', {'dtype': 'float64'})
    Tx_a, _, fr_a, _ = stq.ssq_cwt2(x, wav, nv=8, flipud=True,
                                    astensor=False)
    Tx_b, _, fr_b, _ = stq.ssq_cwt2(x, wav, nv=8, flipud=False,
                                    astensor=False)
    assert np.allclose(fr_a, fr_b)
    m = np.abs(Tx_b).max()
    assert np.abs(Tx_a - Tx_b[::-1]).max() / m < 1e-9
    assert np.abs(Tx_a.sum(-2) - Tx_b.sum(-2)).max() / m < 1e-9


@pytest.mark.parametrize('padtype', ['reflect', 'zero', 'symmetric'])
@pytest.mark.parametrize('dtype', ['float32', 'float64'])
def test_wsst2_padtype_dtype_grid(padtype, dtype):
    """Order-2 option mini-grid: every padtype x dtype plan must build,
    run finite, and reconstruct (the first-order option grid's analog
    for WSST2)."""
    N = 2048
    x = _chirp(N, 0.04, 0.1 / N, np.dtype(dtype).type)
    Tx, Wx, fr, sc = stq.ssq_cwt2(x, ('gmw', {'dtype': dtype}),
                                  padtype=padtype, astensor=False)
    assert np.isfinite(np.abs(Tx)).all() and np.isfinite(np.abs(Wx)).all()
    err = stq.toolkit.mad_rms(x, np.asarray(stq.issq_cwt(Tx)))
    assert err < 0.12, (padtype, dtype, err)
