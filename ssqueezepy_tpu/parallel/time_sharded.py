# -*- coding: utf-8 -*-
"""Time-sharded (sequence/context-parallel) CWT & synchrosqueezed CWT.

The sequence-scaling layer the reference lacks (SURVEY.md §5.7): the
signal's time axis is sharded across chips and the FFT convolution runs
per chunk in *overlap-save* form — each chip extends its chunk with a
halo of the wavelet's effective time support exchanged with its ring
neighbors via `ppermute` (the context-parallel analog of ring attention's
neighbor exchange). Everything downstream of the convolution is pointwise
in time (phase transform, reassignment scatter — reference algos.py
touches only column j), so Tx needs NO cross-chip communication at all:
the halo exchange is the only collective in the forward pass, and it
rides ICI.

Accuracy: overlap-save equals the global transform up to the wavelet's
time-decay tail beyond the halo. The halo is sized from the largest
scale's time resolution (`time_resolution`, reference wavelets.py:813) —
`halo_mult` standard deviations — so error is controlled explicitly and
the equality test (tests/test_sharded.py) asserts interior agreement
against the unsharded path.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..ops.ssq_kernels import (ssq_bin_params, compute_bins, _scatter_xla,
                               _dispatch_scatter)
from ..ops.phase import _imag_ratio_over_2pi
from ..utils.common import EPS32, EPS64
from ..utils.cwt_utils import process_scales
from ..models.wavelets import Wavelet, time_resolution
from ..models.cwt import cwt_core, _process_gmw_wavelet
from ..models.ssqueezing import _compute_associated_frequencies
from .mesh import make_mesh

__all__ = ['TimeShardedSSQCWT', 'time_sharded_cwt', 'time_sharded_ssq_cwt']


def _default_halo(wavelet, max_scale, n_up, halo_mult=8.0):
    """Halo samples = halo_mult * std_t(max_scale); capped at n_up // 2."""
    try:
        std_t = float(time_resolution(wavelet, float(max_scale), N=n_up,
                                      nondim=False, force_int=False))
    except Exception:
        std_t = float(max_scale)
    h = int(np.ceil(halo_mult * std_t))
    return max(64, min(h, n_up // 2))


def _reflect(x, n, from_start):
    """Reflect-pad material from x's own edge (no repeated edge sample),
    matching `padsignal`'s 'reflect' convention."""
    if from_start:
        return x[..., 1:n + 1][..., ::-1]
    return x[..., -n - 1:-1][..., ::-1]


class TimeShardedSSQCWT:
    """Plan for a batched, TIME-sharded synchrosqueezed CWT.

    x: (B, N) with N divisible by the mesh 'time' axis; each chip owns a
    contiguous chunk, extends it by `halo` samples per side (ring
    `ppermute`; reflect at the signal boundary), FFT-convolves the full
    filterbank on the extended chunk, and reassigns its own columns.
    Outputs are sharded over time; no reduction collectives.
    """

    def __init__(self, N, wavelet='gmw', scales='log', nv=32, fs=1.,
                 halo=None, halo_mult=8.0, maprange='peak', flipud=True,
                 gamma=None, mesh=None, derivative=True,
                 deriv_lowprec=None):
        if mesh is None:
            mesh = make_mesh_time()
        # None -> follow configs.Config.ssq_lowprec_deriv
        self.deriv_lowprec = deriv_lowprec
        self.mesh = mesh
        self.n_time = dict(zip(mesh.axis_names,
                               mesh.devices.shape))['time']
        assert N % self.n_time == 0, (N, self.n_time)
        self.N = int(N)
        self.C = N // self.n_time

        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
        self.dtype = self.wavelet.dtype
        dt = 1. / fs

        # scales from the GLOBAL N (so sharded == unsharded rows)
        scales_np, scaletype, _, nv_ = process_scales(
            scales, N, self.wavelet, nv=nv, get_params=True)
        self.scales_np = scales_np
        max_scale = float(np.max(scales_np))

        if halo is None:
            halo = _default_halo(self.wavelet, max_scale, self.C,
                                 halo_mult)
        # reflect at the signal boundary provides at most C-1 samples
        halo = int(min(halo, self.C - 1))
        self.halo = halo
        # extended chunk, padded up to a 64-smooth length for the
        # matmul-FFT engine
        n_ext = self.C + 2 * halo
        self.n_up = _next_fft_len(n_ext)
        self.pad_extra = self.n_up - n_ext

        # Two classes of scales can't ride the overlap-save path and are
        # computed EXACTLY on the all-gathered signal instead (few rows;
        # the gather of x itself is tiny):
        #  * large scales whose time support exceeds the halo
        #    (SURVEY.md §5.8c), and
        #  * small scales whose psih is non-negligible AT Nyquist — the
        #    spectral truncation rings with only ~1/t time decay, which
        #    outlives any halo (measured ~1e-3 interior error otherwise).
        s_ref = float(np.clip(10., scales_np.min(), scales_np.max()))
        try:
            sigma1 = float(time_resolution(self.wavelet, s_ref, N=N,
                                           nondim=False,
                                           force_int=False)) / s_ref
        except Exception:
            sigma1 = 3.5
        support = halo_mult * sigma1 * scales_np.squeeze()
        over = support > halo
        # scales ascend, so over-support rows are a suffix
        self.n_local = int(np.argmax(over)) if over.any() \
            else len(scales_np)
        fb = self.wavelet.filterbank_np(scales_np.squeeze(), N=64,
                                        nohalf=True)
        nyq_ring = fb[:, 32] > 1e-3 * fb.max()
        self.n_lo = (int(np.nonzero(nyq_ring)[0].max()) + 1
                     if nyq_ring.any() else 0)
        self.n_lo = min(self.n_lo, self.n_local)
        from ..ops.pad import pad_params
        self.g_nup, self.g_n1, _ = pad_params(N, 'reflect')

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
            c = np.full(len(scales_np), c)
        self.const_np = c

        self.params = ssq_bin_params(self.ssq_freqs,
                                     scaletype.startswith('log'))
        self.nbins = self.params['omax'] + 1
        self.flipud = bool(flipud)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.dt = dt
        self.derivative = bool(derivative)

        self._scales_j = jnp.asarray(scales_np, self.dtype)
        self._const_j = jnp.asarray(c, self.dtype)
        self._fn = self._build()

    def _build(self):
        mesh = self.mesh
        wavelet, dtype = self.wavelet, self.dtype
        C, H, n_up = self.C, self.halo, self.n_up
        pad_extra = self.pad_extra
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt = self.nbins, self.dt
        n_t = self.n_time
        derivative = self.derivative

        n_local = self.n_local
        n_lo = self.n_lo
        g_nup, g_n1 = self.g_nup, self.g_n1
        # time shards hold ALL scale rows, so the global natural-bin hint
        # applies unchanged (identical for every shard -> one trace)
        na_rows = len(self.scales_np)
        nb_hint = np.clip(np.arange(na_rows) if flipud
                          else np.arange(na_rows - 1, -1, -1),
                          0, nbins - 1).astype(np.int32)
        # dispatch on the MESH devices' platform (see parallel/sharded.py)
        mesh_platform = mesh.devices.flat[0].platform

        def extend(xc, i):
            """Ring halo exchange (the only collective in the pass) +
            reflect at the signal boundary + FFT-length padding."""
            right_edge = xc[:, -H:]     # -> right neighbor's left halo
            left_edge = xc[:, :H]       # -> left neighbor's right halo
            fwd = [(k, (k + 1) % n_t) for k in range(n_t)]
            bwd = [(k, (k - 1) % n_t) for k in range(n_t)]
            left_halo = jax.lax.ppermute(right_edge, 'time', fwd)
            right_halo = jax.lax.ppermute(left_edge, 'time', bwd)
            # signal-boundary chips reflect their own data instead
            left_halo = jnp.where(i == 0, _reflect(xc, H, True), left_halo)
            right_halo = jnp.where(i == n_t - 1, _reflect(xc, H, False),
                                   right_halo)
            xe = jnp.concatenate([left_halo, xc, right_halo], axis=-1)
            if pad_extra:
                # reflect-extend to the FFT-friendly length
                xe = jnp.concatenate(
                    [xe, _reflect(xe, pad_extra, False)], axis=-1)
            return xe

        def exact_rows(xc, scales_blk, i):
            """Rows that can't ride overlap-save: global convolution on
            the all-gathered signal, sliced to this chip's columns."""
            xg = jax.lax.all_gather(xc, 'time', axis=-1, tiled=True)
            from ..ops.pad import padsignal
            xgp = padsignal(xg, 'reflect')
            scales_g = jnp.concatenate(
                [scales_blk[:n_lo], scales_blk[n_local:]], axis=0)
            Wg, dWg = cwt_core(xgp, wavelet, scales_g, dt,
                               derivative=True, l1_norm=True, n1=g_n1,
                               N=xg.shape[-1], rpadded=False,
                               is_2d=True, platform=mesh_platform)
            sl = (lambda a: jax.lax.dynamic_slice_in_dim(
                a, i * C, C, axis=-1))
            cat = (lambda g, x: jnp.concatenate(
                [sl(g[:, :n_lo]), x, sl(g[:, n_lo:])], axis=-2))
            return Wg, dWg, sl, cat

        # bins fast pipeline (dWx VMEM-only; see parallel/sharded.py) —
        # available when the caller does not need dWx back
        from ..ops.ssq_kernels import _pallas_enabled
        use_pallas, interp = _pallas_enabled(mesh_platform)
        use_bins = False
        if use_pallas and not derivative:
            from ..ops.cwt_pallas import cwt_pallas_applicable
            from ..models.cwt import _is_analytic
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
            half = n_up // 2 + 1

            def per_shard(xc, scales_blk, const_blk):
                i = jax.lax.axis_index('time')
                xe = extend(xc, i)
                xh = _fft(Complex(xe, jnp.zeros_like(xe)), axis=-1,
                          out_range=(0, half), imag_zero=True)
                Wx, k = cwt_fused_bins_pallas(
                    xh, scales_blk[n_lo:n_local], wavelet, n_up, H, C,
                    dt, True, params, gamma, flipud, interpret=interp,
                    deriv_lowprec=lowprec)
                if n_lo > 0 or n_local < scales_blk.shape[0]:
                    Wg, dWg, sl, cat = exact_rows(xc, scales_blk, i)
                    wg = jnp.abs(_imag_ratio_over_2pi(Wg, dWg))
                    validg = Wg.abs2() > jnp.asarray(gamma, dtype) ** 2
                    wg = jnp.where(validg, wg, jnp.inf)
                    kg, kvg = compute_bins(wg, params, flipud)
                    kg = jnp.where(validg & kvg, kg, -1)
                    Wx = Complex(cat(Wg.re, Wx.re), cat(Wg.im, Wx.im))
                    k = cat(kg, k)
                Tx = scatter_kv_pallas(Wx, k, const_blk, nbins,
                                       natural_bins=nb_hint,
                                       interpret=interp)
                return Tx.re, Tx.im, Wx.re, Wx.im
        else:
            def per_shard(xc, scales_blk, const_blk):
                # xc: (B_local, C) — this chip's chunk
                i = jax.lax.axis_index('time')
                xe = extend(xc, i)

                # overlap-save rows (halo-sized support, Nyquist-decayed)
                Wx, dWx = cwt_core(xe, wavelet, scales_blk[n_lo:n_local],
                                   dt, derivative=True, l1_norm=True,
                                   n1=H, N=C, rpadded=False, is_2d=True,
                                   platform=mesh_platform)

                if n_lo > 0 or n_local < scales_blk.shape[0]:
                    Wg, dWg, sl, cat = exact_rows(xc, scales_blk, i)
                    Wx = Complex(cat(Wg.re, Wx.re), cat(Wg.im, Wx.im))
                    dWx = Complex(cat(dWg.re, dWx.re),
                                  cat(dWg.im, dWx.im))
                # fused phase + bin + scatter on local columns
                w = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
                valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
                w = jnp.where(valid, w, jnp.inf)
                k, kvalid = compute_bins(w, params, flipud)
                valid = valid & kvalid
                cst = const_blk.reshape(1, -1, 1)
                vre, vim = Wx.re * cst, Wx.im * cst
                Tx = jax.vmap(
                    lambda a, b, kk, vv: _dispatch_scatter(
                        a, b, kk, vv, nbins, nb_hint,
                        platform=mesh_platform)
                )(vre, vim, k, valid)
                outs = (Tx.re, Tx.im, Wx.re, Wx.im)
                if derivative:
                    outs = outs + (dWx.re, dWx.im)
                return outs

        n_out = 6 if derivative else 4
        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('batch', 'time'), P(None, None), P(None)),
            out_specs=tuple([P('batch', None, 'time')] * n_out),
            check_vma=False)

        @jax.jit
        def run(x):
            x = x.astype(dtype)
            x = jnp.where(jnp.isfinite(x), x, 0)
            return fn(x, self._scales_j, self._const_j)
        return run

    def __call__(self, x):
        outs = self._fn(jnp.asarray(x))
        Tx = Complex(outs[0], outs[1])
        Wx = Complex(outs[2], outs[3])
        if self.derivative:
            return Tx, Wx, Complex(outs[4], outs[5])
        return Tx, Wx

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()


def _next_fft_len(n):
    """Next length >= n whose factors are all <= 64 (cheap for the
    matmul engine): next multiple of 2^k closest; use next power of two
    of the 64-smooth family {2^a, 3*2^a, 5*2^a}."""
    best = 1 << (n - 1).bit_length()
    for mult in (3, 5, 9, 15):
        a = 1
        while mult * a < n:
            a <<= 1
        if mult * a >= n:
            best = min(best, mult * a)
    return best


def make_mesh_time(batch=None, time=None, devices=None):
    """Mesh over ('batch', 'time')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if batch is None and time is None:
        batch, time = 1, n
    elif batch is None:
        batch = n // time
    elif time is None:
        time = n // batch
    assert batch * time == n, (batch, time, n)
    from jax.sharding import Mesh
    arr = np.asarray(devices).reshape(batch, time)
    return Mesh(arr, axis_names=('batch', 'time'))


def time_sharded_cwt(x, wavelet='gmw', scales='log', nv=32, fs=1.,
                     halo=None, mesh=None):
    """One-shot time-sharded CWT; x (B, N) -> (Wx (B, na, N), scales)."""
    x = np.asarray(x)
    plan = TimeShardedSSQCWT(x.shape[-1], wavelet, scales, nv, fs,
                             halo=halo, mesh=mesh)
    _, Wx, _ = plan(x)
    return Wx, plan.scales_np.squeeze()


def time_sharded_ssq_cwt(x, wavelet='gmw', scales='log', nv=32, fs=1.,
                         halo=None, mesh=None, **kw):
    """One-shot time-sharded ssq_cwt; x (B, N)."""
    x = np.asarray(x)
    plan = TimeShardedSSQCWT(x.shape[-1], wavelet, scales, nv, fs,
                             halo=halo, mesh=mesh, **kw)
    Tx, Wx, dWx = plan(x)
    return Tx, Wx, plan.ssq_freqs_out, plan.scales_np.squeeze()
