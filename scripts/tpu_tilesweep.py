# -*- coding: utf-8 -*-
"""Time one (transform, T) point of the scatter tile sweep; T comes
from SSQTPU_SCATTER_T (read at plan time)."""
import os
import sys
import time

sys.path.insert(0, '.')
import numpy as np
import jax
import jax.numpy as jnp
import ssqueezepy_tpu as stq


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
    return (time.perf_counter() - t0) / reps


def main():
    T = os.environ.get('SSQTPU_SCATTER_T', '1024')
    N = 160000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    sync(x)
    for name, fn in (
            ('ssq_stft', lambda: stq.ssq_stft(x, n_fft=598)),
            ('ssq_stft2', lambda: stq.ssq_stft2(x, n_fft=598))):
        s = timeit(fn)
        print('%s@160k T=%s: %.2f ms' % (name, T, s * 1e3), flush=True)
    print('TILE-POINT-DONE', flush=True)


if __name__ == '__main__':
    main()
