# -*- coding: utf-8 -*-
"""Online (streaming) synchrosqueezing demo.

Simulates a live signal arriving in fixed-size chunks and maintains a
running synchrosqueezed spectrogram with bounded latency:

  * `StreamingSSQSTFT` — EXACT vs the offline transform (finite window
    support); latency = (n_fft-1)//2 samples.
  * `StreamingSSQCWT` — overlap-save with an explicit per-scale
    reliability contract; latency = `lookahead` samples.

Every chunk runs the same compiled program; the carry state lives on
device. Run: `python examples/streaming_demo.py [--cpu]`.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')

if '--cpu' in sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.streaming import StreamingSSQSTFT, StreamingSSQCWT


def live_signal(N, fs=8000.):
    """Two crossing chirps + a tone burst."""
    t = np.arange(N) / fs
    x = np.sin(2 * np.pi * (500 * t + 1500 * t ** 2))
    x += 0.8 * np.sin(2 * np.pi * (2800 - 600 * t) * t)
    burst = (t > 0.35) & (t < 0.55)
    x += 0.6 * burst * np.sin(2 * np.pi * 3600 * t)
    return x.astype(np.float32)


def main():
    fs, chunk, n_fft = 8000., 1024, 256
    N = 16 * chunk
    x = live_signal(N, fs)

    # ---- exact streaming SSQ-STFT ----------------------------------
    plan = StreamingSSQSTFT(chunk, n_fft=n_fft, fs=fs, dtype='float32')
    print(f"ssq_stft stream: chunk={chunk} n_fft={n_fft} "
          f"latency={plan.lookahead} samples "
          f"({1e3 * plan.lookahead / fs:.1f} ms of audio)")
    cols = 0
    t0 = time.time()
    for i in range(N // chunk):
        Tx_c, Sx_c = plan.process(x[i * chunk:(i + 1) * chunk])
        cols += Tx_c.re.shape[-1]
    Tx_tail, _ = plan.finalize()
    cols += Tx_tail.re.shape[-1]
    wall = time.time() - t0
    print(f"  {cols} columns emitted in {wall * 1e3:.1f} ms wall "
          f"({cols / fs:.2f} s of audio -> "
          f"{cols / fs / wall:.1f}x realtime)")

    Tx_o, *_ = stq.ssq_stft(x, n_fft=n_fft, fs=fs, astensor=False)
    Tx_s = _drive_stft(x, chunk, n_fft, fs)
    rel = (np.abs(Tx_s.sum(-2) - Tx_o.sum(-2)).max()
           / np.abs(Tx_o).max())
    print(f"  colsum rel vs offline: {rel:.2e} "
          "(exact up to FFT rounding)")

    # ---- streaming SSQ-CWT with reliability contract ----------------
    scales = np.geomspace(1., 64., 97).reshape(-1, 1)
    cplan = StreamingSSQCWT(chunk, 'gmw', scales=scales, nv=None,
                            N=N, fs=fs, history=2048, lookahead=2048)
    print(f"ssq_cwt stream: {len(cplan.scales_np)} scales, "
          f"reliable rows {cplan.n_reliable}/{len(cplan.scales_np)}, "
          f"latency={cplan.lookahead} samples")
    got = 0
    for i in range(N // chunk):
        Tx_c, _ = cplan.process(x[i * chunk:(i + 1) * chunk])
        got += Tx_c.re.shape[-1]
    tail, _ = cplan.finalize()
    got += tail.re.shape[-1]
    print(f"  {got} columns emitted (= {N} samples)")


def _drive_stft(x, chunk, n_fft, fs):
    Tx, *_ = stq.stream_ssq_stft(x, chunk, n_fft=n_fft, fs=fs)
    return Tx.to_numpy()


if __name__ == '__main__':
    main()
