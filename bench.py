#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark: 160k-sample, 300-row synchrosqueezed CWT throughput.

Reproduces the reference's benchmark protocol
(/root/reference/examples/benchmarks.py:79-126, README.md:40-54): float32,
padded transform, output (300, len(x)) via 300 log-piecewise-style scales,
mean of 10 runs after 3 warmups, wavelet table cached (here: filterbank
synthesized in-graph, which is faster than reading a cached table at this
device's HBM bandwidth).

North star (BASELINE.json): reference GTX 1070 does 0.0856 s/transform
= 11.68 transforms/s/device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


BASELINE_SEC = 0.0856  # GTX 1070, ssq_cwt 160k x 300 (README.md:53)


def main():
    import jax
    import ssqueezepy_tpu as stq
    from ssqueezepy_tpu.models.ssq_cwt import ssq_cwt

    N = 160000
    rng = np.random.default_rng(0)
    # echirp test signal per the reference benchmark's style
    t = np.linspace(0, 10, N, endpoint=False)
    x = (np.cos(2 * np.pi * 3 * np.exp(t / 3) % (2 * np.pi))
         + 0.1 * rng.standard_normal(N)).astype(np.float32)

    wavelet = ('gmw', {'dtype': 'float32'})

    def run():
        Tx, Wx, sf, sc = ssq_cwt(x, wavelet, scales='log-piecewise',
                                 astensor=True)
        return Tx, Wx

    # warmup (3, incl. compile)
    for _ in range(3):
        out = run()
    jax.block_until_ready(jax.tree.leaves(out))
    # axon-tunnel-safe sync: fetch one element to host
    _ = np.asarray(out[0].re.ravel()[0:1])

    n_runs = 10
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = run()
    _ = np.asarray(out[0].re.ravel()[0:1])
    _ = np.asarray(out[1].re.ravel()[0:1])
    elapsed = (time.perf_counter() - t0) / n_runs

    na = out[0].shape[0]
    tps = 1.0 / elapsed
    print(json.dumps({
        "metric": f"ssq_cwt_160k_{na}rows_transforms_per_sec",
        "value": round(tps, 3),
        "unit": "transforms/sec/chip",
        "vs_baseline": round(tps / (1.0 / BASELINE_SEC), 3),
    }))


if __name__ == '__main__':
    main()
