# -*- coding: utf-8 -*-
"""Round-trip / reconstruction accuracy — the behavioral gold standard.

Thresholds and signal families mirror the reference's
tests/reconstruction_test.py exactly:
  * ssq_cwt -> issq_cwt and cwt -> icwt: mad_rms < 0.1 across families
    and scale types (:65-108)
  * log-piecewise: < .02 (:111-123)
  * stft -> istft: MAE < 1e-14, float64, across N/n_fft/hop/modulated
    parities (:160-179)
  * ssq_stft -> issq_stft: MAE < 1e-1 (:182-206)
  * component inversion on noisy AM echirp: <= .40 / <= .10 (:126-157)
"""
import numpy as np
import pytest

from ssqueezepy_tpu import (ssq_cwt, issq_cwt, cwt, icwt, stft, istft,
                            ssq_stft, issq_stft)
from ssqueezepy_tpu.toolkit import mad_rms, cos_f, lin_band


def _t(a, b, N):
    return np.linspace(a, b, N, endpoint=False)


def echirp(N):
    t = _t(0, 10, N)
    return np.cos(2 * np.pi * 3 * np.exp(t / 3)), t


def lchirp(N):
    t = _t(0, 10, N)
    return np.cos(np.pi * t ** 2), t


def _freqs(N, freqs):
    x = cos_f(freqs, N // len(freqs))
    ts = _t(0, len(x) / N, len(x))
    return x, ts


def fast_transitions(N):
    return _freqs(N, np.array([N / 100, N / 200, N / 3, N / 20, N / 3 - 1,
                               N / 50, N / 4, N / 150]) / 8)


def low_freqs(N):
    return _freqs(N, [.3, .3, 1, 1, 2, 2])


def high_freqs(N):
    return _freqs(N, np.array([N / 2, N / 2 - 1, N / 4, N / 3]) / 4)


TEST_FNS = (echirp, lchirp, fast_transitions, low_freqs, high_freqs)
WAVELET = ('gmw', {'beta': 8, 'dtype': 'float64'})
TH = .1


def test_ssq_cwt_roundtrip():
    errs = []
    for fn in TEST_FNS:
        x, ts = fn(2048)
        for scales in ('log', 'log-piecewise', 'linear'):
            if fn.__name__ == 'low_freqs':
                if scales == 'linear':
                    continue
                scales = f'{scales}:maximal'
            Tx, *_ = ssq_cwt(x, WAVELET, scales=scales, nv=32, t=ts,
                             astensor=False)
            xrec = issq_cwt(Tx, WAVELET)
            errs.append(round(mad_rms(x, xrec), 5))
            assert errs[-1] < TH, (errs[-1], fn.__name__, scales)


def test_cwt_roundtrip():
    for fn in TEST_FNS:
        x, ts = fn(2048)
        for l1_norm in (True, False):
            scales = ('log:maximal' if fn.__name__ in
                      ('low_freqs', 'high_freqs') else 'log')
            wav = (('gmw', {'beta': 8, 'dtype': 'float64'}) if l1_norm else
                   ('gmw', {'beta': 8, 'norm': 'energy',
                            'dtype': 'float64'}))
            kw = dict(wavelet=wav, scales=scales, l1_norm=l1_norm, nv=32)
            Wx, *_ = cwt(x, t=ts, astensor=False, **kw)
            xrec = icwt(Wx, one_int=True, **kw)
            err = round(mad_rms(x, xrec), 5)
            assert err < TH, (err, fn.__name__, f"l1_norm={l1_norm}")


def test_cwt_log_piecewise():
    x, ts = echirp(1024)
    Tx, Wx, ssq_freqs, scales = ssq_cwt(
        x, ('gmw', {'dtype': 'float64'}), scales='log-piecewise', t=ts,
        astensor=False)
    xrec_ssq = issq_cwt(Tx, 'gmw')
    xrec_cwt = icwt(Wx, ('gmw', {'dtype': 'float64'}), scales=scales)

    assert round(mad_rms(x, xrec_ssq), 5) < .02
    assert round(mad_rms(x, xrec_cwt), 5) < .02


def test_stft_exact_inversion():
    rng = np.random.default_rng(5)
    for N in (128, 129):
        for n_fft in (120, 121):
            for hop_len in (1, 2, 3, 6):
                for modulated in (True, False):
                    x = rng.standard_normal(N)
                    Sx = stft(x, n_fft=n_fft, hop_len=hop_len,
                              modulated=modulated, dtype='float64')
                    xr = istft(Sx, n_fft=n_fft, hop_len=hop_len, N=N,
                               modulated=modulated)
                    mae = np.abs(x - xr).mean()
                    assert mae < 1e-14, (N, n_fft, hop_len, modulated, mae)


def test_ssq_stft_roundtrip():
    """Reference reconstruction_test.py:182-206 (fs=1; window scalings)."""
    from ssqueezepy_tpu import get_window
    rng = np.random.default_rng(0)
    th = 1e-1
    for N in (128, 129):
        x = rng.standard_normal(N)
        for n_fft in (120, 121):
            for window_scaling in (1., .5):
                if window_scaling == 1:
                    window = None
                else:
                    window = get_window(None, win_len=n_fft, n_fft=n_fft)
                    window = window * window_scaling

                Tx, *_ = ssq_stft(x, window=window, n_fft=n_fft,
                                  dtype='float64', astensor=False)
                xr = issq_stft(Tx, window=window, n_fft=n_fft)
                assert len(x) == len(xr), (N, len(xr))
                mae = np.abs(x - xr).mean()
                assert mae < th, (N, n_fft, window_scaling, mae)


def test_component_inversion():
    """Masked inversion of a noisy AM echirp over a hand-set linear band
    (reference reconstruction_test.py:126-157, same constants)."""
    import matplotlib
    matplotlib.use('Agg')

    def _echirp(N):
        t = np.linspace(0, 10, N, False)
        return np.cos(2 * np.pi * np.exp(t / 3)), t

    N = 2048
    noise_var = 6
    x, ts = _echirp(N)
    x *= (1 + .3 * cos_f([1], N))  # amplitude modulation
    xo = x.copy()
    np.random.seed(4)
    x += np.sqrt(noise_var) * np.random.randn(len(x))

    wavelet = ('gmw', {'beta': 6})
    Tx, *_ = ssq_cwt(x, wavelet, scales='log:maximal', nv=32, t=ts,
                     flipud=0, astensor=False)

    bw, slope, offset = .035, .44, .45
    Cs, freqband = lin_band(Tx, slope, offset, bw)

    xrec = issq_cwt(Tx, wavelet, Cs, freqband)[0]
    axof = np.abs(np.fft.rfft(xo))
    axrecf = np.abs(np.fft.rfft(xrec))

    assert mad_rms(xo, xrec) <= .40
    assert mad_rms(axof, axrecf) <= .10


def test_inverse_device_vs_numpy_inputs():
    """Device `Complex` inputs to the inverses must give identical results
    to numpy complex inputs (the device path reduces on-device)."""
    import ssqueezepy_tpu as stq

    N = 2048
    x = np.cos(2 * np.pi * 5 * np.linspace(0, 1, N)).astype(np.float32)
    Tx_d, Wx_d, fr, sc = stq.ssq_cwt(x, scales='log', nv=8, astensor=True)
    Tx_n = Tx_d.to_numpy()
    Wx_n = Wx_d.to_numpy()

    x1 = stq.issq_cwt(Tx_d)
    x2 = stq.issq_cwt(Tx_n)
    assert np.allclose(x1, x2, atol=1e-6)

    y1 = stq.icwt(Wx_d, scales='log', nv=8, x_len=N)
    y2 = stq.icwt(Wx_n, scales='log', nv=8, x_len=N)
    assert np.allclose(y1, y2, atol=1e-5)

    Ts, Sx, fr2, Sfs = stq.ssq_stft(x, n_fft=128, astensor=True)
    z1 = stq.issq_stft(Ts, n_fft=128)
    z2 = stq.issq_stft(Ts.to_numpy(), n_fft=128)
    assert np.allclose(z1, z2, atol=1e-6)


def test_istft_batched_matches_loop():
    """Batched (B, n_fft//2+1, n_segs) istft == per-sample istft; exact
    round trip (device OLA path, VERDICT r1 #7)."""
    import jax.numpy as jnp
    from ssqueezepy_tpu.ops.complexlib import Complex
    rng = np.random.default_rng(0)
    N, n_fft, hop = 1000, 128, 4
    xb = rng.standard_normal((3, N))
    Sxs = [stft(xb[b], n_fft=n_fft, hop_len=hop, dtype='float64')
           for b in range(3)]
    Sb = Complex(jnp.stack([s.re for s in Sxs]),
                 jnp.stack([s.im for s in Sxs]))
    xr_b = istft(Sb, n_fft=n_fft, hop_len=hop, N=N)
    assert xr_b.shape == (3, N)
    for b in range(3):
        xr_1 = istft(Sxs[b], n_fft=n_fft, hop_len=hop, N=N)
        assert np.abs(xr_b[b] - xr_1).max() < 1e-14
        assert np.abs(xr_1 - xb[b]).mean() < 1e-12
