# -*- coding: utf-8 -*-
"""Timing-only run of the fused ssq_cwt fast path at the benchmark shape
(white noise, 160k x 300). Prints one line."""
import time
import numpy as np
import jax.numpy as jnp

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import _compute_associated_frequencies

N = 160000
wav_spec = ('gmw', {'dtype': 'float32'})
wav = Wavelet(wav_spec)
scales = process_scales('log-piecewise', N, wav)[:300]
ssq_freqs = _compute_associated_frequencies(
    scales, N, wav, 'log-piecewise', maprange='peak', was_padded=True,
    dt=1, transform='cwt')
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

def run():
    return stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                       ssq_freqs=ssq_freqs)

for _ in range(3):
    out = run()
_ = np.asarray(out[0].re.ravel()[0:1])
t0 = time.perf_counter()
for _ in range(10):
    out = run()
_ = np.asarray(out[0].re.ravel()[0:1])
dt_ms = (time.perf_counter() - t0) / 10 * 1e3
from ssqueezepy_tpu.ops import ssq_pallas as sp
print('BAND=%d T: ssq_cwt %.2f ms (%.2f t/s, %.3fx)'
      % (sp._BAND, dt_ms, 1e3 / dt_ms, (1e3 / dt_ms) / 11.68))
