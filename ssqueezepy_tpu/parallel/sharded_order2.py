# -*- coding: utf-8 -*-
"""Scale-sharded second-order synchrosqueezed CWT (WSST2, multi-chip).

The per-cell complex-chirp regression (models/ssq_cwt2.py) couples only
the five transforms of the SAME scale row, so scale sharding is
embarrassingly parallel: each chip synthesizes its block of the
five-kernel filterbank (psih, i*xi*psih, i*a*psih', -xi*a*psih',
-a^2*psih'' — the derivative factors from `jax.grad` of the wavelet's
spectral fn), runs one batched matmul IFFT over its 5*na_local rows,
solves the 2x2 regression per cell, and scatter-adds its partial Tx over
the FULL bin space; a single `psum` over 'scale' completes the
reassignment — the identical communication pattern (and cost) as
first-order `ShardedSSQCWT` (sharded.py), with 5/2x the local FLOPs.

No reference analog (the reference has no distributed code and no
second-order transform)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..ops.fft import fft
from ..ops.pad import padsignal, pad_params
from ..ops.ssq_kernels import (ssq_bin_params, compute_bins,
                               _dispatch_scatter)
from ..utils.common import EPS32, EPS64
from ..utils.cwt_utils import process_scales
from ..models.wavelets import Wavelet
from ..models.cwt import _process_gmw_wavelet
from ..models.ssqueezing import _compute_associated_frequencies
from ..models.ssq_cwt2 import (_wavelet_grad_fns, _supports_order2,
                               _wsst2_rows)
from .mesh import make_mesh
from .sharded import _pad_scales

__all__ = ['ShardedSSQCWT2']


class ShardedSSQCWT2:
    """Plan for a batched, scale-sharded second-order SSQ-CWT.

    Usage:
        plan = ShardedSSQCWT2(N, mesh=make_mesh(batch=2, scale=4))
        Tx, Wx = plan(x)   # x: (B, N), B divisible by mesh batch size
    """

    def __init__(self, N, wavelet='gmw', scales='log-piecewise', nv=32,
                 fs=1., padtype='reflect', maprange='peak', flipud=True,
                 gamma=None, mesh=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.N = int(N)
        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
        self.dtype = self.wavelet.dtype
        ok, why = _supports_order2(self.wavelet, self.dtype)
        if not ok:
            raise NotImplementedError("ShardedSSQCWT2 %s" % why)
        dt = 1. / fs

        scales_np, cwt_scaletype, _, nv_ = process_scales(
            scales, N, self.wavelet, nv=nv, get_params=True)
        ssq_freqs = _compute_associated_frequencies(
            scales_np, N, self.wavelet, cwt_scaletype, maprange,
            padtype is not None, dt, 'cwt')
        if cwt_scaletype == 'log-piecewise':
            from ..utils.cwt_utils import nv_from_scales
            const = np.log(2) / nv_from_scales(scales_np)
        elif cwt_scaletype.startswith('log'):
            const = np.log(2) / nv_
        else:
            const = ((scales_np[1] - scales_np[0]) / scales_np).squeeze()

        n_scale = self.mesh.devices.shape[1]
        scales_p, const_p, self.na, self.na_pad = _pad_scales(
            scales_np, const, n_scale)

        self.scales_np = scales_np
        self.ssq_freqs = ssq_freqs
        self.params = ssq_bin_params(ssq_freqs,
                                     cwt_scaletype.startswith('log'))
        self.nbins = self.params['omax'] + 1
        self.flipud = bool(flipud)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.padtype = padtype
        self.n_up, self.n1, _ = (pad_params(N, padtype) if padtype
                                 else (N, 0, 0))
        self.dt = dt

        self._scales_j = jnp.asarray(scales_p, self.dtype)
        self._const_j = jnp.asarray(const_p, self.dtype)
        self._fn = self._build()

    def _build(self):
        mesh = self.mesh
        wavelet, dtype = self.wavelet, self.dtype
        n1, N, n_up = self.n1, self.N, self.n_up
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt = self.nbins, self.dt
        half = n_up // 2 + 1
        fn, g1, g2 = _wavelet_grad_fns(wavelet)
        tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)

        na_local = self.na_pad // self.mesh.devices.shape[1]
        nb_local = (np.arange(na_local) if flipud
                    else np.arange(na_local - 1, -1, -1)).astype(np.int32)
        mesh_platform = self.mesh.devices.flat[0].platform

        def per_shard(xp_pad, scales_blk, const_blk):
            # xp_pad: (B_local, n_up); scales_blk: (na_local, 1)
            xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)),
                     axis=-1, out_range=(0, half), imag_zero=True)
            xh = Complex(xh.re[:, None], xh.im[:, None])
            W, w2 = _wsst2_rows(xh, scales_blk, (fn, g1, g2), n_up, n1,
                                N, dt, gamma, dtype, tiny)
            k, kvalid = compute_bins(w2, params, flipud)
            c = const_blk.reshape(1, -1, 1)
            vre, vim = W.re * c, W.im * c
            Tx_part = jax.vmap(
                lambda a, b, kk, vv: _dispatch_scatter(
                    a, b, kk, vv, nbins, nb_local,
                    platform=mesh_platform)
            )(vre, vim, k, kvalid)
            Tx_re = jax.lax.psum(Tx_part.re, 'scale')
            Tx_im = jax.lax.psum(Tx_part.im, 'scale')
            return Tx_re, Tx_im, W.re, W.im

        fn_sh = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('batch', None), P('scale', None), P('scale')),
            out_specs=(P('batch', None, None), P('batch', None, None),
                       P('batch', 'scale', None),
                       P('batch', 'scale', None)),
            check_vma=False)

        @jax.jit
        def run(x):
            x = x.astype(dtype)
            x = jnp.where(jnp.isfinite(x), x, 0)
            xp_pad = (padsignal(x, self.padtype) if self.padtype
                      else x)
            return fn_sh(xp_pad, self._scales_j, self._const_j)
        return run

    def __call__(self, x):
        Tx_re, Tx_im, Wx_re, Wx_im = self._fn(jnp.asarray(x))
        Tx = Complex(Tx_re, Tx_im)
        Wx = Complex(Wx_re[:, :self.na], Wx_im[:, :self.na])
        return Tx, Wx

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()
