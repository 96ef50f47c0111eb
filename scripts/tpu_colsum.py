# -*- coding: utf-8 -*-
"""Column-sum (bin-placement-invariant) comparison of the fused Pallas
reassignment vs the XLA path on device: distinguishes real cell
loss/duplication from benign +-1-bin rounding differences."""
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

Tx_p, *_ = stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                       ssq_freqs=ssq_freqs)
cfg = stq.configs.get_config()
cfg.use_pallas = False
from ssqueezepy_tpu.models import ssq_cwt as _m
_m._ssq_cwt_jit.cache_clear()
Tx_x, *_ = stq.ssq_cwt(x, wavelet=wav_spec, scales=scales,
                       ssq_freqs=ssq_freqs)

stats = jax.jit(lambda pr, pi, xr, xi: (
    jnp.abs(pr.sum(0) - xr.sum(0)).max(),
    jnp.abs(pi.sum(0) - xi.sum(0)).max(),
    jnp.abs(xr.sum(0)).max(),
    jnp.abs(pr - xr).max(),
    (jnp.abs(pr - xr) > 1e-4).sum(),
))(Tx_p.re, Tx_p.im, Tx_x.re, Tx_x.im)
vals = [float(np.asarray(s)) for s in stats]
print('max col-sum diff re=%.3e im=%.3e (scale %.3e)'
      % (vals[0], vals[1], vals[2]))
print('max cell diff %.3e, cells>1e-4: %d' % (vals[3], int(vals[4])))
