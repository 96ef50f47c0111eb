# -*- coding: utf-8 -*-
"""Second-order synchrosqueezing demo: FSST2 (`ssq_stft2`) and WSST2
(`ssq_cwt2`) against their first-order counterparts on signals with fast
frequency modulation — the regime where first-order reassignment smears.

Prints the off-ridge energy share (lower = sharper ridge) and the
energy-weighted instantaneous-frequency error of the underlying
estimates. Run: `python examples/second_order_demo.py` (CPU ok).
"""
import numpy as np

import ssqueezepy_tpu as stq


def offridge_mass(Tx, rows_of_ridge, margin, trim):
    a = np.abs(Tx[:, trim:-trim])
    rows = np.arange(Tx.shape[0])[:, None]
    off = np.abs(rows - rows_of_ridge[None]) > margin
    return float((a * off).sum() / a.sum())


def main():
    N = 8192
    n = np.arange(N)
    f0, Afm, fm = 0.2, 0.08, 1 / 700.
    x = np.cos(2 * np.pi * (f0 * n + (Afm / (2 * np.pi * fm))
                            * np.sin(2 * np.pi * fm * n)))
    finst = f0 + Afm * np.cos(2 * np.pi * fm * n)

    # ---- STFT family ----------------------------------------------------
    n_fft, m = 512, 512
    Tx1, *_ = stq.ssq_stft(x, n_fft=n_fft, astensor=False)
    Tx2, *_ = stq.ssq_stft2(x, n_fft=n_fft, astensor=False)
    ridge = np.round(finst[m:-m] * n_fft).astype(int)
    o1 = offridge_mass(Tx1, ridge, 1, m)
    o2 = offridge_mass(Tx2, ridge, 1, m)
    print(f"FSST2  off-ridge mass: order1 {o1:.3f} -> order2 {o2:.3f}")
    xr = np.asarray(stq.issq_stft(Tx2, n_fft=n_fft))
    print(f"       issq_stft round trip mad_rms: "
          f"{stq.toolkit.mad_rms(x.astype(np.float32), xr):.2e}")

    # ---- CWT family (high-Q wavelet: strong first-order smear) ----------
    wav = ('gmw', {'gamma': 3., 'beta': 300.})
    m = 1200
    T1, _, fr, _ = stq.ssq_cwt(x, wavelet=wav, astensor=False)
    T2, *_ = stq.ssq_cwt2(x, wavelet=wav, astensor=False)
    ridge = np.abs(np.log(fr[None]) - np.log(finst[m:-m, None])).argmin(1)
    o1 = offridge_mass(T1, ridge, 2, m)
    o2 = offridge_mass(T2, ridge, 2, m)
    print(f"WSST2  off-ridge mass: order1 {o1:.3f} -> order2 {o2:.3f}")
    xr = np.asarray(stq.issq_cwt(T2, wavelet=wav))
    print(f"       issq_cwt round trip mad_rms: "
          f"{stq.toolkit.mad_rms(x.astype(np.float32), xr):.2e}")


if __name__ == '__main__':
    main()
