# -*- coding: utf-8 -*-
"""Scale-selection walkthrough (counterpart to the reference's
examples/scales_selection.py, rebuilt for this API).

Shows how the scale engine picks CWT scales and what each knob does:

  * `cwt_scalebounds` presets ('minimal' / 'maximal' / 'naive') and the
    wavelet-decay criteria behind them,
  * `make_scales` scaletypes ('log', 'log-piecewise', 'linear') and the
    voices-per-octave `nv`,
  * `scale_to_freq` / `freq_to_scale` conversion, so scales can be read
    as physical frequencies,
  * what the choices cost: rows computed vs frequency coverage of a
    multi-tone probe signal.

Run: `python examples/scale_selection.py` (CPU ok).
"""
import numpy as np

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.experimental import scale_to_freq, freq_to_scale


def coverage(Wx, tone_rows):
    """Fraction of probe tones that land on an interior row with a
    locally-peaked response (i.e. are resolved, not clipped)."""
    na = Wx.shape[0]
    ok = [1 <= r < na - 1 for r in tone_rows]
    return sum(ok) / len(ok)


def main():
    N = 8192
    fs = 1024.                       # pretend-physical sampling rate
    t = np.arange(N) / fs
    # log-spaced tones: freq_to_scale matches endpoints exactly and
    # log-spaces the interior, so a geometric probe set round-trips
    tones = np.geomspace(4., 480., 5).round(1)         # Hz
    x = sum(np.cos(2 * np.pi * f * t) for f in tones).astype(np.float32)

    wavelet = stq.Wavelet('gmw')

    # ---- 1. scale bounds per preset -------------------------------------
    print("cwt_scalebounds presets (N=%d):" % N)
    for preset in ('minimal', 'maximal', 'naive'):
        mn, mx = stq.cwt_scalebounds(wavelet, N, preset=preset)
        fmx = scale_to_freq(np.array([mn]), wavelet, N, fs=fs)[0]
        fmn = scale_to_freq(np.array([mx]), wavelet, N, fs=fs)[0]
        print(f"  {preset:8s} scales [{mn:9.2f}, {mx:12.2f}]  "
              f"-> freqs [{fmn:8.3f}, {fmx:8.1f}] Hz")

    # ---- 2. scaletypes at fixed bounds ----------------------------------
    mn, mx = stq.cwt_scalebounds(wavelet, N, preset='maximal')
    print("\nmake_scales scaletypes (bounds = 'maximal', nv=32):")
    for st in ('log', 'log-piecewise', 'linear'):
        sc = stq.make_scales(N, mn, mx, nv=32, scaletype=st,
                             wavelet=wavelet)
        sc = np.asarray(sc).ravel()
        print(f"  {st:14s} na={len(sc):4d}  "
              f"(first {sc[0]:.2f} ... last {sc[-1]:.1f})")

    # log-piecewise exists to cut rows on long signals: count the saving
    sc_log = np.asarray(stq.make_scales(N, mn, mx, nv=32,
                                        scaletype='log')).ravel()
    sc_lpw = np.asarray(stq.make_scales(N, mn, mx, nv=32,
                                        scaletype='log-piecewise',
                                        wavelet=wavelet)).ravel()
    print(f"  log-piecewise saves {len(sc_log) - len(sc_lpw)} of "
          f"{len(sc_log)} rows (redundant large scales downsampled)")

    # ---- 3. nv sweep: resolution vs cost --------------------------------
    print("\nvoices-per-octave sweep (preset='maximal', scaletype='log'):")
    for nv in (8, 16, 32, 64):
        sc = np.asarray(stq.make_scales(N, mn, mx, nv=nv,
                                        scaletype='log')).ravel()
        Wx, _ = stq.cwt(x, scales=sc, nv=nv, astensor=False)
        rows = [int(np.argmin(np.abs(
            scale_to_freq(sc, wavelet, N, fs=fs) - f))) for f in tones]
        cov = coverage(np.abs(np.asarray(Wx)), rows)
        print(f"  nv={nv:3d}  na={len(sc):4d}  tones resolved "
              f"{cov * 100:5.1f}%  ({nv} rows/octave)")

    # ---- 4. freq<->scale round trip -------------------------------------
    print("\nfreq_to_scale -> scale_to_freq round trip on the probe tones:")
    scs = freq_to_scale(tones / fs, wavelet, N)        # cycles/sample in
    back = scale_to_freq(np.asarray(scs), wavelet, N, fs=fs)
    for f, b in zip(tones, np.asarray(back).ravel()):
        print(f"  {f:7.1f} Hz -> scale -> {b:7.1f} Hz "
              f"({abs(b - f) / f * 100:.2f}% off)")


if __name__ == '__main__':
    main()
