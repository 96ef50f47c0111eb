# -*- coding: utf-8 -*-
"""On-chip smoke equality: the Pallas fast paths re-asserted against
their XLA/unbanded/grouped twins on REAL hardware at small N.

A Mosaic lowering regression (alignment proof, layout constraint, bf16
dot semantics) passes every interpret-mode test and fails only here —
round 5 found exactly such a bug in the banded STFT kernel this way.
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq


def _cfg(**kw):
    return stq.configure(**kw)


@pytest.fixture(autouse=True)
def _restore_config():
    from ssqueezepy_tpu.configs import get_config
    cfg = get_config()
    saved = (cfg.use_pallas, cfg.stft_band)
    yield
    cfg.use_pallas, cfg.stft_band = saved


def _colsum_rel(a, b):
    ca = np.asarray(a.re.sum(-2))
    cb = np.asarray(b.re.sum(-2))
    return np.abs(ca - cb).max() / (np.abs(cb).max() + 1e-30)


def test_ssq_cwt_pallas_vs_xla(chirp_4k):
    """Fused bins pipeline vs the pure-XLA scatter path: reassignment
    conserves column mass exactly, so column sums must agree tightly
    even where lowprec bin placement differs by +-1 bin."""
    scales = np.geomspace(1., 48., 65).reshape(-1, 1)
    kw = dict(wavelet=('gmw', {'dtype': 'float32'}), scales=scales)
    _cfg(use_pallas=True)
    Tp, Wp, *_ = stq.ssq_cwt(chirp_4k, **kw)
    _cfg(use_pallas=False)
    Tx, Wxx, *_ = stq.ssq_cwt(chirp_4k, **kw)
    assert np.isfinite(np.asarray(Tp.re)).all()
    assert _colsum_rel(Tp, Tx) < 1e-3
    # Wx itself is scatter-independent: tight equality
    dW = np.abs(np.asarray(Wp.re) - np.asarray(Wxx.re)).max()
    assert dW / np.abs(np.asarray(Wxx.re)).max() < 1e-3, dW


def test_stft_band_vs_full(chirp_4k):
    """Banded table kernel == full-support kernel within the band's
    1e-7 tail-mass budget; also proves the banded kernel LOWERS
    (dynamic sublane load alignment)."""
    n_fft = 256
    _cfg(stft_band=True)
    Tb, Sb, *_ = stq.ssq_stft(chirp_4k, n_fft=n_fft)
    _cfg(stft_band=False)
    Tf, Sf, *_ = stq.ssq_stft(chirp_4k, n_fft=n_fft)
    rS = np.abs(np.asarray(Sb.re) - np.asarray(Sf.re)).max() \
        / np.abs(np.asarray(Sf.re)).max()
    assert rS < 1e-4, rS
    assert _colsum_rel(Tb, Tf) < 1e-3


def test_roundtrip_issq(chirp_4k):
    Tx, Wx, fr, sc = stq.ssq_cwt(chirp_4k, astensor=False)
    err = stq.toolkit.mad_rms(chirp_4k, stq.issq_cwt(Tx))
    assert err < 0.1, err


def test_streaming_chunk():
    from ssqueezepy_tpu.streaming import StreamingSSQCWT
    import jax.numpy as jnp
    chunk = 1024
    rng = np.random.default_rng(0)
    scales = np.geomspace(1., 32., 49).reshape(-1, 1)
    plan = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                           scales=scales, nv=None, N=8 * chunk,
                           history=1024, lookahead=1024)
    out = plan.process(jnp.asarray(
        rng.standard_normal(chunk).astype(np.float32)))
    t = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(t.re)).all()


def test_order2_fused_onchip(chirp_4k):
    """Fused WSST2/FSST2 route and match their XLA twins on hardware
    (column sums; the fused kernels' first on-chip equality check at
    small N)."""
    import ssqueezepy_tpu.ops.cwt_pallas as _cp
    import ssqueezepy_tpu.ops.stft_conv as _sc
    calls = []
    o1, o2 = _cp.cwt_fused_bins2_direct, _sc.fsst2_pallas_rows
    _cp.cwt_fused_bins2_direct = \
        lambda *a, **kw: (calls.append('w'), o1(*a, **kw))[1]
    _sc.fsst2_pallas_rows = \
        lambda *a, **kw: (calls.append('f'), o2(*a, **kw))[1]
    # FSST2 needs a 2-factor Np2 with f2 % 64 == 0: N + n_fft - 1 in
    # (3840, 4096] gives Np2 = 4096 = 64 x 64 (N=4096 lands on 4608 =
    # 64 x 72 and legitimately takes the XLA path)
    x_s = chirp_4k[:3800]
    try:
        _cfg(use_pallas=True)
        Tw, *_ = stq.ssq_cwt2(chirp_4k, ('gmw', {'dtype': 'float32'}),
                              nv=16)
        Tf, *_ = stq.ssq_stft2(x_s, n_fft=256, dtype='float32')
        _cfg(use_pallas=False)
        Tw0, *_ = stq.ssq_cwt2(chirp_4k, ('gmw', {'dtype': 'float32'}),
                               nv=16)
        Tf0, *_ = stq.ssq_stft2(x_s, n_fft=256, dtype='float32')
    finally:
        _cp.cwt_fused_bins2_direct, _sc.fsst2_pallas_rows = o1, o2
    assert 'w' in calls and 'f' in calls, calls
    assert np.isfinite(np.asarray(Tw.re)).all()
    assert _colsum_rel(Tw, Tw0) < 1e-3
    assert _colsum_rel(Tf, Tf0) < 1e-3
