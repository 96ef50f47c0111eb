# -*- coding: utf-8 -*-
"""One (T, BAND) point of the CWT direct-pipeline sweep; knobs from
SSQTPU_SCATTER_T / SSQTPU_SCATTER_BAND (plan/import-time)."""
import os
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
    return (time.perf_counter() - t0) / reps


def main():
    tag = 'T=%s BAND=%s' % (os.environ.get('SSQTPU_SCATTER_T', '1024'),
                            os.environ.get('SSQTPU_SCATTER_BAND', '24'))
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
    s = timeit(lambda: stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                                   ssq_freqs=ssq_freqs))
    print('ssq_cwt@160k %s: %.2f ms (%.2fx)' % (tag, s * 1e3, 0.0856 / s),
          flush=True)
    print('CWT-POINT-DONE', flush=True)


if __name__ == '__main__':
    main()
