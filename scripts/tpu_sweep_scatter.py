# -*- coding: utf-8 -*-
"""One-process sweep of scatter kernel parameters (_BAND, _GROUP, T) on
the benchmark shape. Each variant recompiles (module constants are
trace-time static), but tunnel/backend init is paid once.

Usage: python scripts/tpu_sweep_scatter.py [variants...]
  variant syntax: BAND,GROUP,T   e.g. 16,32,1024
"""
import sys
import time
import numpy as np
import jax.numpy as jnp

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import _compute_associated_frequencies
from ssqueezepy_tpu.ops import ssq_pallas as sp
from ssqueezepy_tpu.models import ssq_cwt as mod_ssq

N = 160000
wav_spec = ('gmw', {'dtype': 'float32'})
wav = Wavelet(wav_spec)
scales = process_scales('log-piecewise', N, wav)[:300]
ssq_freqs = _compute_associated_frequencies(
    scales, N, wav, 'log-piecewise', maprange='peak', was_padded=True,
    dt=1, transform='cwt')
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N).astype(np.float32))

DEFAULTS = ['24,32,1024', '16,32,1024', '24,64,1024', '16,64,1024']
variants = sys.argv[1:] or DEFAULTS


def run_once():
    return stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                       ssq_freqs=ssq_freqs)


for v in variants:
    band, group, T = (int(s) for s in v.split(','))
    sp._BAND, sp._GROUP = band, group
    # module constants are baked in at TRACE time: the lru wrappers AND
    # the underlying jax.jit caches must both be dropped or the old
    # executable is silently reused
    sp._ssq_fused_vjp_fn.cache_clear()
    sp._ssq_fused_call.clear_cache()
    mod_ssq._ssq_cwt_jit.cache_clear()
    t_c0 = time.time()
    for _ in range(3):
        out = run_once()
    _ = np.asarray(out[0].re.ravel()[0:1])
    compile_s = time.time() - t_c0
    t0 = time.perf_counter()
    for _ in range(10):
        out = run_once()
    _ = np.asarray(out[0].re.ravel()[0:1])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print('BAND=%-3d GROUP=%-3d T=%-5d : %.2f ms (%.2f t/s, %.3fx)'
          '  [compile+warm %.0fs]'
          % (band, group, T, ms, 1e3 / ms, (1e3 / ms) / 11.68, compile_s),
          flush=True)
