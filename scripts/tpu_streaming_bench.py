# -*- coding: utf-8 -*-
"""Streaming throughput on the real TPU: columns/s of the online
SSQ-STFT and SSQ-CWT at a realtime-audio-like geometry, plus the
per-chunk latency (the number a live deployment cares about).

Sync discipline per CLAUDE.md: fetch a 1-element scalar to time; keep
chunks device-resident across calls.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.streaming import StreamingSSQSTFT, StreamingSSQCWT


def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))


def run(plan, chunks, name, warm=3, reps=50):
    # warmup / compile
    for i in range(warm):
        out = plan.process(chunks[i % len(chunks)])
    t = out[0] if isinstance(out, tuple) else out
    sync(t.re)
    t0 = time.time()
    for i in range(reps):
        out = plan.process(chunks[i % len(chunks)])
    t = out[0] if isinstance(out, tuple) else out
    sync(t.re)
    wall = time.time() - t0
    c = plan.chunk
    per = wall / reps * 1e3
    print(f"{name}: {per:.2f} ms/chunk ({c} cols) -> "
          f"{c * reps / wall / 1e6:.2f} Mcols/s "
          f"(realtime x{c / (per * 1e-3) / 48000:.0f} at 48kHz)",
          flush=True)


def main():
    chunk = 4096
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((8, chunk)).astype(np.float32)
    # keep chunks on device; one process() per arrival
    dev_chunks = [jnp.asarray(x) for x in xs]
    for c in dev_chunks:
        c.block_until_ready()

    p1 = StreamingSSQSTFT(chunk, n_fft=512, dtype='float32')
    run(p1, dev_chunks, "ssq_stft stream (n_fft=512)")

    scales = np.geomspace(1., 64., 97).reshape(-1, 1)
    p2 = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                         scales=scales, nv=None, N=16 * chunk,
                         history=2048, lookahead=2048)
    print("ssq_cwt plan: bins pipeline:", p2.uses_bins_pipeline,
          "n_up:", p2.n_up, flush=True)
    run(p2, dev_chunks, "ssq_cwt stream (97 scales)")

    # ---- multirate A/B (VERDICT r3 #3): same WIDE scale grid (large
    # scales are where the octave cascade pays), flat vs cascaded -------
    from ssqueezepy_tpu.streaming_multirate import StreamingMultirateSSQCWT
    wide = np.geomspace(1., 512., 181).reshape(-1, 1)
    pf = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                         scales=wide, nv=None, N=16 * chunk,
                         history=8192, lookahead=8192)
    run(pf, dev_chunks, "ssq_cwt stream flat (181 wide scales)")
    pm = StreamingMultirateSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                                  scales=wide, nv=None, N=16 * chunk)
    print("multirate octaves max:", int(pm.octaves.max()),
          "analytic compute_ratio: %.3f" % pm.compute_ratio, flush=True)
    run(pm, dev_chunks, "ssq_cwt stream multirate (181 wide scales)")


if __name__ == '__main__':
    main()
