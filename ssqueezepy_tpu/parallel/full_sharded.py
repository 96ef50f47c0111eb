# -*- coding: utf-8 -*-
"""Three-axis sharded synchrosqueezed CWT: Mesh(('batch','scale','time')).

The full composition SURVEY.md §5.8 specifies (the reference has no
distributed code at all): data parallelism over signals, tensor
parallelism over filterbank rows, and sequence/context parallelism over
the time axis — in ONE shard_map. Per (scale, time) chip:

  * ring `ppermute` halo exchange along 'time' (the context-parallel
    neighbor pattern; reflect at the signal boundary),
  * FFT-convolution of the chip's scale-block over its extended chunk,
  * fused phase + bin + scatter into the FULL bin space for its columns,
  * one `psum` over 'scale' completes the reassignment bin reduction.

Rows that cannot ride overlap-save (over-support large scales and
non-Nyquist-decayed small scales, see parallel/time_sharded.py) are
computed exactly on the all-gathered signal, REPLICATED across the
'scale' axis and pre-divided by its size so the psum restores unit
weight — they are few (log grids downsample high scales), so the
replicated work is negligible against the sharded interior.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..ops.pad import padsignal, pad_params
from ..ops.ssq_kernels import (ssq_bin_params, compute_bins,
                               _dispatch_scatter)
from ..ops.phase import _imag_ratio_over_2pi
from ..utils.common import EPS32, EPS64
from ..utils.cwt_utils import process_scales
from ..models.wavelets import Wavelet
from ..models.cwt import cwt_core, _process_gmw_wavelet
from ..models.ssqueezing import _compute_associated_frequencies
from .time_sharded import _default_halo, _reflect, _next_fft_len

__all__ = ['FullShardedSSQCWT', 'make_mesh3']


def make_mesh3(batch=1, scale=None, time=None, devices=None):
    """Mesh over ('batch', 'scale', 'time')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if scale is None and time is None:
        scale, time = n // batch, 1
    elif scale is None:
        scale = n // (batch * time)
    elif time is None:
        time = n // (batch * scale)
    assert batch * scale * time == n, (batch, scale, time, n)
    arr = np.asarray(devices).reshape(batch, scale, time)
    return Mesh(arr, axis_names=('batch', 'scale', 'time'))


class FullShardedSSQCWT:
    """Plan for a batch x scale x time sharded ssq_cwt.

    x: (B, N); B divisible by the 'batch' axis, N by the 'time' axis.
    Returns (Tx, ssq_freqs_out); Tx is (B, nbins, N), sharded
    ('batch', None, 'time').
    """

    def __init__(self, N, wavelet='gmw', scales='log', nv=32, fs=1.,
                 halo=None, halo_mult=8.0, maprange='peak', flipud=True,
                 gamma=None, mesh=None, deriv_lowprec=None):
        self.mesh = mesh if mesh is not None else make_mesh3()
        # None -> follow configs.Config.ssq_lowprec_deriv
        self.deriv_lowprec = deriv_lowprec
        ax = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        self.n_scale, self.n_time = ax['scale'], ax['time']
        assert N % self.n_time == 0, (N, self.n_time)
        self.N = int(N)
        self.C = N // self.n_time

        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
        self.dtype = self.wavelet.dtype
        dt = 1. / fs

        scales_np, scaletype, _, nv_ = process_scales(
            scales, N, self.wavelet, nv=nv, get_params=True)
        self.scales_np = scales_np
        na = len(scales_np)

        # halo + exact-row classification (as in TimeShardedSSQCWT)
        if halo is None:
            halo = _default_halo(self.wavelet, float(scales_np.max()),
                                 self.C, halo_mult)
        halo = int(min(halo, self.C - 1))
        self.halo = halo
        n_ext = self.C + 2 * halo
        self.n_up = _next_fft_len(n_ext)
        self.pad_extra = self.n_up - n_ext

        from .time_sharded import time_resolution
        s_ref = float(np.clip(10., scales_np.min(), scales_np.max()))
        try:
            sigma1 = float(time_resolution(self.wavelet, s_ref, N=N,
                                           nondim=False,
                                           force_int=False)) / s_ref
        except Exception:
            sigma1 = 3.5
        over = halo_mult * sigma1 * scales_np.squeeze() > halo
        n_hi = int(np.argmax(over)) if over.any() else na
        fb = self.wavelet.filterbank_np(scales_np.squeeze(), N=64,
                                        nohalf=True)
        nyq_ring = fb[:, 32] > 1e-3 * fb.max()
        n_lo = (int(np.nonzero(nyq_ring)[0].max()) + 1 if nyq_ring.any()
                else 0)
        self.n_lo, self.n_hi = min(n_lo, n_hi), n_hi

        # squeeze constant + bin params from the GLOBAL grid
        self.ssq_freqs = _compute_associated_frequencies(
            scales_np, N, self.wavelet, scaletype, maprange, True, dt,
            'cwt')
        if scaletype == 'log-piecewise':
            from ..utils.cwt_utils import nv_from_scales
            const = np.log(2) / nv_from_scales(scales_np)
        elif scaletype.startswith('log'):
            const = np.log(2) / nv_
        else:
            const = ((scales_np[1] - scales_np[0]) / scales_np).squeeze()
        c = np.asarray(const, np.float64).squeeze()
        if c.ndim == 0:
            c = np.full(na, c)

        self.params = ssq_bin_params(self.ssq_freqs,
                                     scaletype.startswith('log'))
        self.nbins = self.params['omax'] + 1
        self.flipud = bool(flipud)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.dt = dt

        # interior rows are sharded over 'scale': pad to a multiple of
        # the axis size with const=0 rows (contribute nothing)
        mid = np.arange(self.n_lo, self.n_hi)
        n_mid = len(mid)
        n_mid_pad = -(-max(n_mid, 1) // self.n_scale) * self.n_scale
        pad = n_mid_pad - n_mid
        mid_scales = scales_np.squeeze()[mid] if n_mid else \
            np.ones(0)
        mid_scales = np.concatenate(
            [mid_scales, np.repeat(scales_np.max(), pad)])
        mid_const = np.concatenate([c[mid], np.zeros(pad)])
        self._mid_scales_j = jnp.asarray(mid_scales.reshape(-1, 1),
                                         self.dtype)
        self._mid_const_j = jnp.asarray(mid_const, self.dtype)

        # exact rows (replicated over 'scale', pre-divided before psum)
        ex = np.concatenate([np.arange(0, self.n_lo),
                             np.arange(self.n_hi, na)])
        self._ex_scales_j = jnp.asarray(
            scales_np.squeeze()[ex].reshape(-1, 1), self.dtype)
        self._ex_const_j = jnp.asarray(c[ex] / self.n_scale, self.dtype)
        self.n_exact = len(ex)

        self.g_nup, self.g_n1, _ = pad_params(N, 'reflect')
        self._fn = self._build()

    def _build(self):
        mesh = self.mesh
        wavelet, dtype = self.wavelet, self.dtype
        C, H = self.C, self.halo
        pad_extra = self.pad_extra
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt = self.nbins, self.dt
        n_t = self.n_time
        g_n1 = self.g_n1
        n_exact = self.n_exact
        mesh_platform = mesh.devices.flat[0].platform
        # within-block natural-bin direction (see parallel/sharded.py)
        n_mid_local = self._mid_scales_j.shape[0] // self.n_scale
        nb_mid = (np.arange(n_mid_local) if flipud
                  else np.arange(n_mid_local - 1, -1, -1)).astype(np.int32)

        def reassign(Wx, dWx, const_blk, nb_hint):
            w = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
            valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
            w = jnp.where(valid, w, jnp.inf)
            k, kvalid = compute_bins(w, params, flipud)
            valid = valid & kvalid
            cst = const_blk.reshape(1, -1, 1)
            return jax.vmap(
                lambda a, b, kk, vv: _dispatch_scatter(
                    a, b, kk, vv, nbins, nb_hint, platform=mesh_platform)
            )(Wx.re * cst, Wx.im * cst, k, valid)

        # bins fast pipeline for the interior rows (dWx VMEM-only; see
        # parallel/sharded.py); exact rows keep the XLA formulation
        from ..ops.ssq_kernels import _pallas_enabled
        use_pallas, interp = _pallas_enabled(mesh_platform)
        use_bins = False
        if use_pallas:
            from ..ops.cwt_pallas import cwt_pallas_applicable
            from ..models.cwt import _is_analytic
            n_up = self.n_up
            if (cwt_pallas_applicable(wavelet, n_up, True) and
                    _is_analytic(wavelet)):
                probe = wavelet.fn(jnp.zeros((1,), dtype), xp=jnp)
                use_bins = not isinstance(probe, tuple)
        self.uses_bins_pipeline = use_bins
        if use_bins:
            from ..configs import get_config
            from ..ops.fft import fft as _fft
            from ..ops.cwt_pallas import cwt_fused_bins_pallas
            from ..ops.ssq_pallas import scatter_kv_pallas
            lowprec = (get_config().ssq_lowprec_deriv
                       if self.deriv_lowprec is None
                       else self.deriv_lowprec)
            half = self.n_up // 2 + 1

        def interior(xe, mid_scales, mid_const):
            """This chip's scale block on its (extended) time chunk."""
            if use_bins:
                xh = _fft(Complex(xe, jnp.zeros_like(xe)), axis=-1,
                          out_range=(0, half), imag_zero=True)
                Wx, k = cwt_fused_bins_pallas(
                    xh, mid_scales, wavelet, self.n_up, H, C, dt, True,
                    params, gamma, flipud, interpret=interp,
                    deriv_lowprec=lowprec)
                return scatter_kv_pallas(Wx, k, mid_const, nbins,
                                         natural_bins=nb_mid,
                                         interpret=interp)
            Wx, dWx = cwt_core(xe, wavelet, mid_scales, dt, True, True,
                               n1=H, N=C, rpadded=False, is_2d=True,
                               platform=mesh_platform)
            return reassign(Wx, dWx, mid_const, nb_mid)

        def per_shard(xc, mid_scales, mid_const, ex_scales, ex_const):
            # xc: (B_local, C). Halo exchange along 'time' (ring).
            i = jax.lax.axis_index('time')
            fwd = [(k, (k + 1) % n_t) for k in range(n_t)]
            bwd = [(k, (k - 1) % n_t) for k in range(n_t)]
            left = jax.lax.ppermute(xc[:, -H:], 'time', fwd)
            right = jax.lax.ppermute(xc[:, :H], 'time', bwd)
            left = jnp.where(i == 0, _reflect(xc, H, True), left)
            right = jnp.where(i == n_t - 1, _reflect(xc, H, False), right)
            xe = jnp.concatenate([left, xc, right], axis=-1)
            if pad_extra:
                xe = jnp.concatenate(
                    [xe, _reflect(xe, pad_extra, False)], axis=-1)

            # interior rows: this chip's scale block on its time chunk
            Tx = interior(xe, mid_scales, mid_const)

            if n_exact:
                # exact rows: global convolution, replicated over 'scale'
                # (const pre-divided by the axis size)
                xg = jax.lax.all_gather(xc, 'time', axis=-1, tiled=True)
                xgp = padsignal(xg, 'reflect')
                Wg, dWg = cwt_core(xgp, wavelet, ex_scales, dt, True,
                                   True, n1=g_n1, N=xg.shape[-1],
                                   rpadded=False, is_2d=True,
                                   platform=mesh_platform)
                sl = (lambda a: jax.lax.dynamic_slice_in_dim(
                    a, i * C, C, axis=-1))
                Tg = reassign(Complex(sl(Wg.re), sl(Wg.im)),
                              Complex(sl(dWg.re), sl(dWg.im)), ex_const,
                              None)
                Tx = Complex(Tx.re + Tg.re, Tx.im + Tg.im)

            # the one reduction: bin accumulation over scale shards
            Tx_re = jax.lax.psum(Tx.re, 'scale')
            Tx_im = jax.lax.psum(Tx.im, 'scale')
            return Tx_re, Tx_im

        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('batch', 'time'), P('scale', None), P('scale'),
                      P(None, None), P(None)),
            out_specs=(P('batch', None, 'time'),
                       P('batch', None, 'time')),
            check_vma=False)

        @jax.jit
        def run(x):
            x = x.astype(dtype)
            x = jnp.where(jnp.isfinite(x), x, 0)
            return fn(x, self._mid_scales_j, self._mid_const_j,
                      self._ex_scales_j, self._ex_const_j)
        return run

    def __call__(self, x):
        Tx_re, Tx_im = self._fn(jnp.asarray(x))
        return Complex(Tx_re, Tx_im)

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()
