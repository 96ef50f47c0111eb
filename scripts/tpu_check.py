# -*- coding: utf-8 -*-
"""On-device validation + timing of the fused ssq_cwt fast path.

Compares the Pallas two-tier scatter against the XLA scatter on the REAL
device (not interpret mode), on the benchmark's white-noise input, then
times the end-to-end fused path. All comparisons are device-side
reductions (only scalars are fetched; complex/host transfers are slow
through the tunnel).
"""
import time
import numpy as np
import jax
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

# --- correctness: pallas vs xla scatter, all on device -------------------
Tx_p, Wx, *_ = stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                           ssq_freqs=ssq_freqs)
cfg = stq.configs.get_config()
cfg.use_pallas = False
from ssqueezepy_tpu.models import ssq_cwt as _m
_m._ssq_cwt_jit.cache_clear()
Tx_x, *_ = stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                       ssq_freqs=ssq_freqs)
cfg.use_pallas = True
_m._ssq_cwt_jit.cache_clear()

diff = jax.jit(lambda a, b, c, d: (
    jnp.abs(a - c).max() + jnp.abs(b - d).max(),
    jnp.abs(a).max()))(Tx_p.re, Tx_p.im, Tx_x.re, Tx_x.im)
md, mx = float(np.asarray(diff[0])), float(np.asarray(diff[1]))
print('max |Tx_pallas - Tx_xla| = %.3e   (max|Tx| = %.3e, rel %.2e)'
      % (md, mx, md / mx))

# --- reconstruction sanity ----------------------------------------------
xrec = stq.issq_cwt(Tx_p, wav_spec)
xn = np.asarray(x)
err = np.abs(xrec - xn)
mad_rms = float(np.mean(err) / np.sqrt(np.mean(xn ** 2)))
print('recon mad_rms = %.6f  (known-good 0.015859)' % mad_rms)

# --- timing --------------------------------------------------------------
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
print('ssq_cwt 160k x 300: %.2f ms  (%.2f t/s, %.3fx of 11.68 baseline)'
      % (dt_ms, 1e3 / dt_ms, (1e3 / dt_ms) / 11.68))
