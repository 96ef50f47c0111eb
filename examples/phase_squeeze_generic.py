# -*- coding: utf-8 -*-
"""Generic synchrosqueezing of a user-supplied transform (counterpart
to the reference's examples/phase_ssqueeze.py, rebuilt for this API).

`experimental.phase_ssqueeze` runs the phase transform + reassignment
on ANY precomputed CWT/STFT-like array — the entry point when the
time-frequency representation comes from outside the library (a custom
filterbank, a cached result, another toolbox). The derivative `dWx` can
be supplied, or computed spectrally by `trigdiff` when absent.

The demo: compute a CWT here, then pretend it came from elsewhere —
hand the raw arrays to `phase_ssqueeze` and verify the result matches
`ssq_cwt` run end-to-end, with and without a supplied derivative.

Run: `python examples/phase_squeeze_generic.py` (CPU ok).
"""
import numpy as np

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.experimental import phase_ssqueeze


def rel_err(A, B):
    A, B = np.asarray(A), np.asarray(B)
    return float(np.abs(A - B).mean() / (np.abs(B).mean() + 1e-30))


def main():
    N = 2048
    t = np.linspace(0, 1, N, endpoint=False)
    x = (np.cos(2 * np.pi * 60 * t)
         + np.cos(2 * np.pi * np.cumsum(8 * (300 / 8) ** t) / N)
         ).astype(np.float64)

    wavelet = stq.Wavelet('gmw')

    # ---- end-to-end reference -------------------------------------------
    Tx_ref, Wx, ssq_freqs, scales = stq.ssq_cwt(
        x, wavelet, astensor=False, get_dWx=True)[:4]

    # ---- path A: precomputed Wx AND dWx ----------------------------------
    # rpadded=False Wx (unpadded) with its spectral derivative.
    # `flipud=True` reproduces ssq_cwt's row order (ascending frequency).
    Wx2, scales2, dWx2 = stq.cwt(x, wavelet, derivative=True,
                                 astensor=False)
    out = phase_ssqueeze(Wx2, dWx=dWx2, scales=scales2, wavelet=wavelet,
                         was_padded=True, N=N, flipud=True)
    TxA = out[0]
    print("phase_ssqueeze(Wx, dWx) vs ssq_cwt:   rel err "
          f"{rel_err(np.abs(np.asarray(TxA)), np.abs(Tx_ref)):.2e}")

    # ---- path B: Wx only, derivative via trigdiff ------------------------
    # phase_transform recomputes dWx spectrally (rpadded=False -> it
    # re-pads internally); small boundary differences are expected
    out = phase_ssqueeze(Wx2, dWx=None, scales=scales2, wavelet=wavelet,
                         was_padded=True, N=N, flipud=True)
    TxB = out[0]
    m = N // 8
    eB = rel_err(np.abs(np.asarray(TxB))[:, m:-m],
                 np.abs(Tx_ref)[:, m:-m])
    print(f"phase_ssqueeze(Wx only)  vs ssq_cwt:  rel err {eB:.2e} "
          "(interior; dWx re-derived spectrally)")

    # ---- path C: explicit phase (get_w) then squeeze ---------------------
    out = phase_ssqueeze(Wx2, dWx=dWx2, scales=scales2, wavelet=wavelet,
                         was_padded=True, N=N, get_w=True, flipud=True)
    TxC, w = out[0], out[5]
    print("phase_ssqueeze(get_w=True) vs ssq_cwt: rel err "
          f"{rel_err(np.abs(np.asarray(TxC)), np.abs(Tx_ref)):.2e}; "
          f"w: finite share {np.isfinite(np.asarray(w)).mean():.3f}")

    # ---- the converters that make external transforms usable -------------
    from ssqueezepy_tpu.experimental import freq_to_scale, scale_to_freq
    # log-spaced: freq_to_scale matches endpoints and log-spaces interior
    freqs = np.geomspace(0.01, 0.3, 4)          # cycles/sample, < Nyquist
    sc = np.asarray(freq_to_scale(freqs, wavelet, N))
    back = np.asarray(scale_to_freq(sc, wavelet, N))
    print("freq->scale->freq max relative drift: "
          f"{np.max(np.abs(back - freqs) / freqs):.3f} "
          "(peak-frequency mapping; drift grows near Nyquist)")

    # round trip sanity on the squeezed result
    xr = np.asarray(stq.issq_cwt(np.asarray(TxA)))
    print("issq_cwt(phase_ssqueeze result) mad_rms: "
          f"{stq.toolkit.mad_rms(x, xr):.4f}")


if __name__ == '__main__':
    main()
