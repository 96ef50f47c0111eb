# -*- coding: utf-8 -*-
"""Displacement-span statistics of the ssq_cwt reassignment on the
benchmark's white-noise input (pure numpy; host-side plan code only).

The Pallas shift-scatter's cost is sum over (32-row group x time tile) of
the group's displacement span; this prints the span distribution to
decide whether a dense per-bin sweep (cost ~ nbins per group regardless
of span) should take over for wide groups.
"""
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import numpy as np

import ssqueezepy_tpu  # noqa
from ssqueezepy_tpu.models.wavelets import Wavelet, _xifn
from ssqueezepy_tpu.models.cwt import _process_gmw_wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import (
    _compute_associated_frequencies, _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops.pad import pad_params
from ssqueezepy_tpu.ops.ssq_pallas import _plan_perm, _GROUP

N = 160000
rng = np.random.default_rng(0)
x = rng.standard_normal(N).astype(np.float32)

wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
scales = process_scales('log-piecewise', N, wavelet)[:300]
na = len(scales)
ssq_freqs = _compute_associated_frequencies(
    scales, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
params = dict(ssq_bin_params(ssq_freqs, True))
natural = _natural_bins('cwt', scales, ssq_freqs, params, True, na, 1.0)
nbins = params['omax'] + 1
perm = _plan_perm(natural, na)
print('perm =', perm if not isinstance(perm, tuple) else 'tuple-sort')

# numpy CWT (reflect pad, analytic GMW, L1)
n_up, n1, _ = pad_params(N, 'reflect')
xp = np.pad(x, (n1, n_up - N - n1), mode='reflect')
xh = np.fft.fft(xp)
half = n_up // 2 + 1
xi = _xifn(1., n_up, np.float64)[:half]
psih = wavelet.fn(scales.reshape(-1, 1) * xi, xp=np).astype(np.float64)
if n_up % 2 == 0:
    psih[:, -1] /= 2
spec = np.zeros((na, n_up), np.complex128)
spec[:, :half] = psih * xh[:half]
full = np.fft.ifft(spec, axis=-1)
dspec = spec * (1j * np.concatenate([xi, np.zeros(n_up - half)]))
dfull = np.fft.ifft(dspec, axis=-1)
Wr = full.real[:, n1:n1 + N].astype(np.float32)
Wi = full.imag[:, n1:n1 + N].astype(np.float32)
Ar = dfull.real[:, n1:n1 + N].astype(np.float32)
Ai = dfull.imag[:, n1:n1 + N].astype(np.float32)

gamma = 10 * np.finfo(np.float32).eps
denom = Wr * Wr + Wi * Wi
w = np.abs((Ai * Wr - Ar * Wi) / (denom * 2 * np.pi))
valid = (denom > gamma * gamma) & np.isfinite(w)

wl = np.log2(w, where=w > 0, out=np.full_like(w, -np.inf))
k_hi = np.minimum(np.round((wl - params['vlmin1']) / params['dvl1'])
                  + params['idx1'], params['omax'])
k_lo = np.maximum(np.round((wl - params['vlmin0']) / params['dvl0']), 0)
k = np.where(wl > params['vlmin1'], k_hi, k_lo)
k = np.where(valid, k, 0)
k = (params['omax'] - k).astype(np.int64)     # flipud

if perm == 'flip':
    k, valid = k[::-1], valid[::-1]
elif isinstance(perm, tuple):
    p = np.asarray(perm)
    k, valid = k[p], valid[p]

edge = valid & ((k == 0) | (k == nbins - 1))
act = valid & ~edge
rows = np.arange(na)[:, None]
d = np.where(act, k - rows, 0)

G, T = _GROUP, 1024
ngroups = -(-na // G)
ntiles = -(-N // T)
spans = np.zeros((ngroups, ntiles), np.int64)
for g in range(ngroups):
    sl = slice(g * G, min((g + 1) * G, na))
    dg, ag = d[sl], act[sl]
    for t in range(ntiles):
        at_ = ag[:, t * T:(t + 1) * T]
        if at_.any():
            vals = dg[:, t * T:(t + 1) * T][at_]
            spans[g, t] = vals.max() - vals.min() + 1

print('nbins =', nbins, ' na =', na,
      ' edge frac =', round(edge.sum() / max(valid.sum(), 1), 4),
      ' valid frac =', round(valid.sum() / valid.size, 4))
print('span percentiles (per group x tile):')
for p in (10, 25, 50, 75, 90, 99, 100):
    print('  p%-3d = %d' % (p, int(np.percentile(spans, p))))
print('mean span =', round(float(spans.mean()), 1))
shift_ops = (np.ceil(spans / 8) * 8 * (G + 8) * 2 * T * 4).sum()
dense_ops = ngroups * ntiles * G * nbins * T * 3
print('estimated shift ops = %.1fG, dense(full) ops = %.1fG'
      % (shift_ops / 1e9, dense_ops / 1e9))

# outlier statistics: fraction of cells with |d| > W, and per-column
# outlier counts (the two-tier kernel's extraction-loop trip count)
absd = np.abs(d[act])
print('\n|d| distribution over active cells:')
for W in (8, 16, 24, 32, 48, 64):
    frac = float((absd > W).mean())
    print('  P(|d| > %2d) = %.4f' % (W, frac))
for W in (16, 24, 32):
    om = act & (np.abs(d) > W)
    col_counts = om.sum(axis=0)          # outliers per column (all rows)
    Tt = 1024
    mx = [int(col_counts[t * Tt:(t + 1) * Tt].max())
          for t in range(-(-N // Tt))]
    print('W=%d: outliers/col mean=%.2f  p99(max/tile)=%d  max=%d'
          % (W, col_counts.mean(), int(np.percentile(mx, 99)), max(mx)))
