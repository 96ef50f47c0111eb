# -*- coding: utf-8 -*-
"""Try to reproduce the fused-kernel device mismatch in interpret mode on
CPU with REAL CWT data (N=16k slice of the benchmark config)."""
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import numpy as np
import jax
import jax.numpy as jnp

import ssqueezepy_tpu as stq  # noqa
from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.ssq_pallas import ssq_fused_pallas
from ssqueezepy_tpu.ops.ssq_kernels import _scatter_xla, ssq_bin_params, \
    compute_bins
from ssqueezepy_tpu.ops.phase import phase_transform_w
from ssqueezepy_tpu.models.wavelets import Wavelet, _xifn
from ssqueezepy_tpu.utils.cwt_utils import process_scales, nv_from_scales
from ssqueezepy_tpu.models.ssqueezing import \
    _compute_associated_frequencies, _natural_bins
from ssqueezepy_tpu.ops.pad import pad_params

rng = np.random.default_rng(7)
Nc = 4096
wav = Wavelet(('gmw', {'dtype': 'float32'}))
scales = process_scales('log-piecewise', Nc, wav)
na = len(scales)
ssq_freqs = _compute_associated_frequencies(
    scales, Nc, wav, 'log-piecewise', 'peak', True, 1.0, 'cwt')
params = ssq_bin_params(ssq_freqs, True)
natural = _natural_bins('cwt', scales, ssq_freqs, params, True, na, 1.0)
const = (np.log(2) / nv_from_scales(scales)).astype(np.float32)
gamma = float(10 * np.finfo(np.float32).eps)
nbins = params['omax'] + 1
print('na=%d nbins=%d natural[min,max]=(%d,%d)'
      % (na, nbins, natural.min(), natural.max()))

# numpy CWT
n_up, n1, _ = pad_params(Nc, 'reflect')
x = rng.standard_normal(Nc).astype(np.float32)
xp = np.pad(x, (n1, n_up - Nc - n1), mode='reflect')
xh = np.fft.fft(xp)
half = n_up // 2 + 1
xi = _xifn(1., n_up, np.float64)[:half]
psih = wav.fn(scales.reshape(-1, 1) * xi, xp=np).astype(np.float64)
if n_up % 2 == 0:
    psih[:, -1] /= 2
spec = np.zeros((na, n_up), np.complex128)
spec[:, :half] = psih * xh[:half]
full = np.fft.ifft(spec, axis=-1)
dfull = np.fft.ifft(spec * (1j * np.pad(xi, (0, n_up - half))), axis=-1)
WR = jnp.asarray(full.real[:, n1:n1 + Nc].astype(np.float32))
WI = jnp.asarray(full.imag[:, n1:n1 + Nc].astype(np.float32))
DR = jnp.asarray(dfull.real[:, n1:n1 + Nc].astype(np.float32))
DI = jnp.asarray(dfull.imag[:, n1:n1 + Nc].astype(np.float32))
const_j = jnp.asarray(np.broadcast_to(const.reshape(-1), (na,)))

Tp = ssq_fused_pallas(Complex(WR, WI), Complex(DR, DI), const_j,
                      dict(params), gamma, True, natural, interpret=True)
w = phase_transform_w(Complex(WR, WI), Complex(DR, DI), gamma, Sfs=None)
kk, vv = compute_bins(w, dict(params), True)
cc = const_j.reshape(-1, 1)
Txl = _scatter_xla(WR * cc, WI * cc, kk, vv, nbins)

dr = np.abs(np.asarray(Tp.re) - np.asarray(Txl.re)).max()
di = np.abs(np.asarray(Tp.im) - np.asarray(Txl.im)).max()
sc = np.abs(np.asarray(Txl.re)).max()
print('interpret fused vs xla: max diff %.3e (scale %.3e)' % (dr + di, sc))

# where do they differ?
D = np.abs(np.asarray(Tp.re) - np.asarray(Txl.re))
if D.max() > 1e-5 * sc:
    ii = np.unravel_index(np.argmax(D), D.shape)
    print('worst cell (bin,col) =', ii)
    nz = np.argwhere(D > 1e-5 * sc)
    print('n mismatched cells =', len(nz),
          ' bins involved:', np.unique(nz[:, 0])[:20])
