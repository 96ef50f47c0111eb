# -*- coding: utf-8 -*-
"""Bisect the device-only mismatch: (A) standalone two-tier scatter vs
XLA scatter, (B) fused transposed CWT kernel vs XLA half-spectrum path,
(C) fused ssq scatter vs XLA on identical Wx/dWx. All on the real device,
scalar-only fetches."""
import numpy as np
import jax
import jax.numpy as jnp

import ssqueezepy_tpu as stq  # noqa
from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.ssq_pallas import shift_scatter_pallas, \
    ssq_fused_pallas
from ssqueezepy_tpu.ops.ssq_kernels import _scatter_xla, ssq_bin_params, \
    compute_bins
from ssqueezepy_tpu.ops.phase import phase_transform_w

rng = np.random.default_rng(7)
na, N, nbins = 293, 8192, 293

# --- A: standalone scatter, k = natural + small dev + 1% outliers --------
nat = np.arange(na, dtype=np.int32)
dev = rng.integers(-12, 13, size=(na, N))
out_mask = rng.random((na, N)) < 0.01
far = rng.integers(0, nbins, size=(na, N))
k = np.where(out_mask, far, np.clip(nat[:, None] + dev, 0, nbins - 1))
k = k.astype(np.int32)
valid = rng.random((na, N)) < 0.98
vre = rng.standard_normal((na, N)).astype(np.float32)
vim = rng.standard_normal((na, N)).astype(np.float32)

vre_j, vim_j = jnp.asarray(vre), jnp.asarray(vim)
k_j, valid_j = jnp.asarray(k), jnp.asarray(valid)

f = jax.jit(lambda a, b, kk, vv: shift_scatter_pallas(
    a, b, kk, vv, nbins, natural_bins=nat))
g = jax.jit(lambda a, b, kk, vv: _scatter_xla(a, b, kk, vv, nbins))
op = f(vre_j, vim_j, k_j, valid_j)
ox = g(vre_j, vim_j, k_j, valid_j)
d = jax.jit(lambda p, q: (jnp.abs(p.re - q.re).max()
                          + jnp.abs(p.im - q.im).max(),
                          jnp.abs(q.re).max()))(op, ox)
print('A standalone scatter: max diff %.3e (scale %.3e)'
      % (float(np.asarray(d[0])), float(np.asarray(d[1]))))

# --- B: fused CWT kernel vs XLA half path --------------------------------
from ssqueezepy_tpu.ops.cwt_pallas import cwt_fused_pallas, _cwt_half_xla
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales

wav = Wavelet(('gmw', {'dtype': 'float32'}))
Nc = 160000
scales = process_scales('log-piecewise', Nc, wav)[:300]
n_up, n1 = 262144, 51072
from ssqueezepy_tpu.ops.pad import pad_params
n_up, n1, _ = pad_params(Nc, 'reflect')
x = rng.standard_normal(Nc).astype(np.float32)
xp = np.pad(x, (n1, n_up - Nc - n1), mode='reflect')
xh_np = np.fft.fft(xp)[:n_up // 2 + 1]
xh = Complex(jnp.asarray(xh_np.real.astype(np.float32)),
             jnp.asarray(xh_np.imag.astype(np.float32)))
scales_j = jnp.asarray(scales.reshape(-1), jnp.float32)

Wxp, dWxp = jax.jit(lambda a, s: cwt_fused_pallas(
    a, s, wav, n_up, n1, Nc, 1.0, True, True))(xh, scales_j)
outs = jax.jit(lambda a, b, s: _cwt_half_xla(
    a, b, s, jnp.float32(1.0), wav, n_up, n1, Nc, True, True,
    'float32'))(xh.re, xh.im, scales_j)
Wxx = Complex(outs[0], outs[1])
dWxx = Complex(outs[2], outs[3])
dd = jax.jit(lambda p, q: (jnp.abs(p.re - q.re).max(),
                           jnp.abs(q.re).max()))(Wxp, Wxx)
print('B fused CWT Wx: max diff %.3e (scale %.3e)'
      % (float(np.asarray(dd[0])), float(np.asarray(dd[1]))))
dd2 = jax.jit(lambda p, q: (jnp.abs(p.re - q.re).max(),
                            jnp.abs(q.re).max()))(dWxp, dWxx)
print('B fused CWT dWx: max diff %.3e (scale %.3e)  [bf16 lowprec=no]'
      % (float(np.asarray(dd2[0])), float(np.asarray(dd2[1]))))

# --- C: fused ssq scatter on identical Wx/dWx ----------------------------
from ssqueezepy_tpu.models.ssqueezing import \
    _compute_associated_frequencies, _natural_bins
from ssqueezepy_tpu.utils.cwt_utils import nv_from_scales
ssq_freqs = _compute_associated_frequencies(
    scales, Nc, wav, 'log-piecewise', 'peak', True, 1.0, 'cwt')
params = ssq_bin_params(ssq_freqs, True)
natural = _natural_bins('cwt', scales, ssq_freqs, params, True,
                        len(scales), 1.0)
const = (np.log(2) / nv_from_scales(scales)).astype(np.float32)
gamma = float(10 * np.finfo(np.float32).eps)

const_j = jnp.asarray(np.broadcast_to(np.asarray(const).reshape(-1),
                                      (len(scales),)))

def fused(WR, WI, DR, DI, c):
    return ssq_fused_pallas(Complex(WR, WI), Complex(DR, DI), c,
                            dict(params), gamma, True, natural)

def xla_ref(WR, WI, DR, DI, c):
    Wx, dWx = Complex(WR, WI), Complex(DR, DI)
    w = phase_transform_w(Wx, dWx, gamma, Sfs=None)
    kk, vv = compute_bins(w, dict(params), True)
    cc = c.reshape(-1, 1)
    return _scatter_xla(WR * cc, WI * cc, kk, vv, params['omax'] + 1)

Tp = jax.jit(fused)(Wxp.re, Wxp.im, dWxp.re, dWxp.im, const_j)
Txl = jax.jit(xla_ref)(Wxp.re, Wxp.im, dWxp.re, dWxp.im, const_j)
d3 = jax.jit(lambda p, q: (jnp.abs(p.re - q.re).max()
                           + jnp.abs(p.im - q.im).max(),
                           jnp.abs(q.re).max()))(Tp, Txl)
print('C fused ssq scatter: max diff %.3e (scale %.3e)'
      % (float(np.asarray(d3[0])), float(np.asarray(d3[1]))))
