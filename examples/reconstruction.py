# -*- coding: utf-8 -*-
"""Inversion / reconstruction tour (counterpart to the reference's
examples/reconstruction.py, rebuilt for this API).

Every forward transform in the library has an inverse; this demo runs
each round trip and prints its `mad_rms` error (mean absolute deviation
over signal RMS — the library's reconstruction metric), plus the
component-inversion path that extracts one chirp out of a mixture via
time-varying band masks.

Round trips covered:
  cwt -> icwt           (one-integral and two-integral)
  ssq_cwt -> issq_cwt   (full and masked/component)
  stft -> istft         (exact up to float eps, NOLA-checked)
  ssq_stft -> issq_stft

Run: `python examples/reconstruction.py` (CPU ok).
"""
import numpy as np

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.toolkit import mad_rms


def main():
    N = 4096
    t = np.linspace(0, 1, N, endpoint=False)

    # echirp + a weak tone: structured enough to be interesting, smooth
    # enough that every inverse should do well
    k = 20 * (400 / 20) ** t
    c1 = np.cos(2 * np.pi * np.cumsum(k) / N)
    c2 = .6 * np.cos(2 * np.pi * 700 * t)
    x = (c1 + c2).astype(np.float64)

    print(f"{'round trip':34s} mad_rms")

    # ---- CWT ------------------------------------------------------------
    for one_int in (True, False):
        Wx, scales = stq.cwt(x, astensor=False)
        xr = np.asarray(stq.icwt(Wx, scales=scales, one_int=one_int))
        name = 'cwt -> icwt ' + ('(one-integral)' if one_int
                                 else '(two-integral)')
        print(f"{name:34s} {mad_rms(x, xr):.4f}")

    # ---- SSQ-CWT ----------------------------------------------------------
    Tx, Wx, ssq_freqs, scales = stq.ssq_cwt(x, astensor=False)[:4]
    xr = np.asarray(stq.issq_cwt(Tx))
    print(f"{'ssq_cwt -> issq_cwt (full)':34s} {mad_rms(x, xr):.4f}")

    # component inversion: pull out just the echirp with a band mask that
    # follows its known ridge. cc = per-time bin centers, cw = widths.
    rows = np.array([int(np.argmin(np.abs(ssq_freqs - f / N)))
                     for f in k])                      # (N,) ridge rows
    cc = rows[:, None].astype(np.float64)              # (N, 1) one component
    cw = np.full((N, 1), 8.)
    xc = np.asarray(stq.issq_cwt(Tx, cc=cc, cw=cw))[0]
    # compare against the echirp alone, interior only (mask edges ring)
    sl = slice(N // 16, -N // 16)
    print(f"{'ssq_cwt component (echirp only)':34s} "
          f"{mad_rms(c1[sl], xc[sl]):.4f}")

    # ---- STFT -------------------------------------------------------------
    for hop in (1, 4):
        Sx = stq.stft(x, hop_len=hop)
        xr = np.asarray(stq.istft(Sx, hop_len=hop, N=N))
        print(f"{'stft -> istft (hop=%d)' % hop:34s} {mad_rms(x, xr):.2e}")

    # ---- SSQ-STFT ----------------------------------------------------------
    Tx2 = stq.ssq_stft(x, astensor=False)[0]
    xr = np.asarray(stq.issq_stft(Tx2))
    print(f"{'ssq_stft -> issq_stft':34s} {mad_rms(x, xr):.4f}")

    # ---- noise robustness: RiskShrink-thresholded CWT denoising ---------
    # hard-threshold Wx at the RiskShrink estimate (derived from the
    # smallest-scale row's noise MAD), then invert — the classic
    # wavelet-denoise recipe the threshold estimator exists for
    rng = np.random.default_rng(2)
    xn = x + .5 * rng.standard_normal(N)
    Wxn, sc = stq.cwt(xn, astensor=False)
    Wxn = np.asarray(Wxn)
    thr = stq.est_riskshrink_thresh(Wxn, nv=32)
    Wxd = np.where(np.abs(Wxn) > thr, Wxn, 0)
    xr_raw = np.asarray(stq.icwt(Wxn, scales=sc))
    xr_den = np.asarray(stq.icwt(Wxd, scales=sc))
    print(f"{'noisy icwt (raw)':34s} {mad_rms(x, xr_raw):.4f}")
    print(f"{'noisy icwt (riskshrink denoised)':34s} {mad_rms(x, xr_den):.4f}")


if __name__ == '__main__':
    main()
