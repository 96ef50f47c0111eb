# -*- coding: utf-8 -*-
"""Sharded (multi-chip) CWT / synchrosqueezed CWT.

Designed fresh for TPU (the reference has no distributed code —
SURVEY.md §2.9 P6): the transform is expressed once with `shard_map` over a
('batch', 'scale') `Mesh`:

  * 'batch' — data parallelism over independent signals (P2 analog),
  * 'scale' — tensor parallelism over filterbank rows (P1 analog): each
    chip synthesizes its own block of frequency-domain wavelets, runs its
    block of the batched matmul-IFFT, and scatter-adds its partial Tx over
    the FULL frequency-bin space; a single `psum` over 'scale' completes
    the synchrosqueezing bin reduction (the only cross-chip communication
    in the forward pass — the phase transform and reassignment are
    pointwise in time, SURVEY.md §5.7).

`icwt`'s scale sum is the same psum. Collectives ride ICI; no
host-side gathers occur until the caller materializes results.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..ops.pad import padsignal, pad_params
from ..ops.ssq_kernels import (ssq_bin_params, compute_bins, _scatter_xla,
                               _dispatch_scatter)
from ..ops.phase import _imag_ratio_over_2pi
from ..utils.common import EPS32, EPS64
from ..utils.cwt_utils import process_scales
from ..models.wavelets import Wavelet, _xifn
from ..models.cwt import cwt_core, _process_gmw_wavelet
from ..models.ssqueezing import _compute_associated_frequencies
from .mesh import make_mesh

__all__ = ['sharded_cwt', 'sharded_ssq_cwt', 'ShardedSSQCWT',
           'dryrun_multichip']


def _pad_scales(scales_np, const_np, n_shards):
    """Pad scale rows to a multiple of the scale-axis size; padded rows get
    const=0 so they contribute nothing to Tx."""
    na = len(scales_np)
    na_pad = -(-na // n_shards) * n_shards
    pad = na_pad - na
    scales_p = np.concatenate([scales_np,
                               np.repeat(scales_np[-1:], pad, 0)])
    const_p = np.asarray(const_np, np.float64).squeeze()
    if const_p.ndim == 0:
        const_p = np.full(na, const_p)
    const_p = np.concatenate([const_p, np.zeros(pad)])
    return scales_p, const_p, na, na_pad


class ShardedSSQCWT:
    """Plan for a batched, scale-sharded synchrosqueezed CWT.

    Usage:
        plan = ShardedSSQCWT(N, mesh=make_mesh(batch=2, scale=4))
        Tx, Wx = plan(x)   # x: (B, N), B divisible by mesh batch size
    """

    def __init__(self, N, wavelet='gmw', scales='log-piecewise', nv=32,
                 fs=1., padtype='reflect', maprange='peak', flipud=True,
                 gamma=None, mesh=None, derivative_out=False,
                 deriv_lowprec=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        # None -> follow configs.Config.ssq_lowprec_deriv
        self.deriv_lowprec = deriv_lowprec
        self.N = int(N)
        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
        self.dtype = self.wavelet.dtype
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

        na_local = self.na_pad // self.mesh.devices.shape[1]
        # Per-shard natural-bin ORDERING hint for the Pallas shift-scatter
        # (VERDICT r1 #2): with the generalized kernel the absolute offset
        # of a shard's natural-bin block lands in the data-adaptive
        # displacement range, so only the within-block direction matters —
        # identical across shards, hence expressible in one shard_map
        # trace. flipud=True: global bins ascend with row -> identity;
        # flipud=False: descend -> row flip.
        nb_local = (np.arange(na_local) if flipud
                    else np.arange(na_local - 1, -1, -1)).astype(np.int32)
        # dispatch on the MESH devices' platform (the global default
        # backend may be a TPU tunnel while this mesh is virtual-CPU)
        mesh_platform = self.mesh.devices.flat[0].platform

        # bins fast pipeline (same as single-chip models/ssq_cwt.py): the
        # fused CWT kernel emits (Wx, k) with the derivative planes never
        # leaving VMEM; the k-consuming scatter completes the per-shard
        # reassignment. Falls back to the XLA phase/bin formulation when
        # the kernel doesn't cover the configuration.
        from ..ops.ssq_kernels import _pallas_enabled
        use_pallas, interp = _pallas_enabled(mesh_platform)
        use_bins = False
        if use_pallas and self.padtype is not None:
            from ..ops.cwt_pallas import cwt_pallas_applicable
            from ..models.cwt import _is_analytic
            if (cwt_pallas_applicable(wavelet, n_up, True) and
                    _is_analytic(wavelet)):
                probe = wavelet.fn(jnp.zeros((1,), dtype), xp=jnp)
                use_bins = not isinstance(probe, tuple)
        self.uses_bins_pipeline = use_bins

        if use_bins:
            from ..configs import get_config
            from ..ops.fft import fft
            from ..ops.cwt_pallas import cwt_fused_bins_pallas
            from ..ops.ssq_pallas import scatter_kv_pallas
            lowprec = (get_config().ssq_lowprec_deriv
                       if self.deriv_lowprec is None
                       else self.deriv_lowprec)
            half = n_up // 2 + 1

            def per_shard(xp_pad, scales_blk, const_blk):
                # xp_pad: (B_local, n_up); scales_blk: (na_local, 1)
                xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)),
                         axis=-1, out_range=(0, half), imag_zero=True)
                Wx, k = cwt_fused_bins_pallas(
                    xh, scales_blk, wavelet, n_up, n1, N, dt, True,
                    params, gamma, flipud, interpret=interp,
                    deriv_lowprec=lowprec)
                Tx_part = scatter_kv_pallas(Wx, k, const_blk, nbins,
                                            natural_bins=nb_local,
                                            interpret=interp)
                Tx_re = jax.lax.psum(Tx_part.re, 'scale')
                Tx_im = jax.lax.psum(Tx_part.im, 'scale')
                return Tx_re, Tx_im, Wx.re, Wx.im
        else:
            def per_shard(xp_pad, scales_blk, const_blk):
                # xp_pad: (B_local, n_up); scales_blk: (na_local, 1)
                Wx, dWx = cwt_core(xp_pad, wavelet, scales_blk, dt,
                                   derivative=True, l1_norm=True, n1=n1,
                                   N=N, rpadded=False, is_2d=True,
                                   platform=mesh_platform)
                # fused phase + bin + local scatter over full bin space
                w = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
                valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
                w = jnp.where(valid, w, jnp.inf)
                k, kvalid = compute_bins(w, params, flipud)
                valid = valid & kvalid
                c = const_blk.reshape(1, -1, 1)
                vre, vim = Wx.re * c, Wx.im * c
                Tx_part = jax.vmap(
                    lambda a, b, kk, vv: _dispatch_scatter(
                        a, b, kk, vv, nbins, nb_local,
                        platform=mesh_platform)
                )(vre, vim, k, valid)
                # the one cross-chip reduction: bin accumulation over
                # scales
                Tx_re = jax.lax.psum(Tx_part.re, 'scale')
                Tx_im = jax.lax.psum(Tx_part.im, 'scale')
                return Tx_re, Tx_im, Wx.re, Wx.im

        fn = shard_map(
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
            Tx_re, Tx_im, Wx_re, Wx_im = fn(xp_pad, self._scales_j,
                                            self._const_j)
            return Tx_re, Tx_im, Wx_re, Wx_im
        return run

    def __call__(self, x):
        Tx_re, Tx_im, Wx_re, Wx_im = self._fn(jnp.asarray(x))
        Tx = Complex(Tx_re, Tx_im)
        Wx = Complex(Wx_re[:, :self.na], Wx_im[:, :self.na])
        return Tx, Wx

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()


def sharded_ssq_cwt(x, wavelet='gmw', scales='log-piecewise', nv=32, fs=1.,
                    mesh=None, **kw):
    """One-shot batched scale-sharded ssq_cwt; `x` (B, N)."""
    x = np.asarray(x)
    plan = ShardedSSQCWT(x.shape[-1], wavelet, scales, nv, fs, mesh=mesh,
                         **kw)
    Tx, Wx = plan(x)
    return Tx, Wx, plan.ssq_freqs_out, plan.scales_np.squeeze()


def sharded_cwt(x, wavelet='gmw', scales='log-piecewise', nv=32, fs=1.,
                mesh=None, padtype='reflect'):
    """Batched scale-sharded forward CWT; `x` (B, N) -> Wx (B, na, N)."""
    x = np.asarray(x)
    N = x.shape[-1]
    mesh = mesh if mesh is not None else make_mesh()
    wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    dtype = wavelet.dtype

    scales_np = process_scales(scales, N, wavelet, nv=nv)
    n_scale = mesh.devices.shape[1]
    scales_p, _, na, na_pad = _pad_scales(scales_np, 1.0, n_scale)
    n_up, n1, _ = pad_params(N, padtype)

    def per_shard(xp_pad, scales_blk):
        Wx, _ = cwt_core(xp_pad, wavelet, scales_blk, 1.0, False, True,
                         n1, N, rpadded=False, is_2d=True)
        return Wx.re, Wx.im

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P('batch', None), P('scale', None)),
                   out_specs=(P('batch', 'scale', None),
                              P('batch', 'scale', None)),
                   check_vma=False)

    @jax.jit
    def run(x):
        xp = padsignal(x.astype(dtype), padtype)
        return fn(xp, jnp.asarray(scales_p, dtype))

    Wx_re, Wx_im = run(jnp.asarray(x))
    return Complex(Wx_re[:, :na], Wx_im[:, :na]), scales_np.squeeze()


def dryrun_multichip(n_devices):
    """Compile + run ONE sharded training-style step on tiny shapes over an
    `n_devices` mesh: forward sharded ssq_cwt, plus a gradient of a
    reconstruction loss through cwt -> icwt (exercises AD through the
    full compute path). Used by the driver with N virtual CPU devices."""
    # Probe the CPU pool FIRST: when xla_force_host_platform_device_count
    # provides n virtual devices (the driver's topology) this never
    # initializes the default platform — important because a wedged
    # device tunnel hangs backend init itself. A real multi-chip pod has
    # a 1-device CPU pool and falls through to the default platform.
    devices = jax.devices('cpu')
    if len(devices) < n_devices:
        devices = jax.devices()
    devices = devices[:n_devices]
    assert len(devices) == n_devices, (len(devices), n_devices)
    batch_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(batch=batch_axis, scale=n_devices // batch_axis,
                     devices=devices)

    B, N = batch_axis * 2, 256
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N)).astype(np.float32)

    # single-device references (computed once; every sharded leg below
    # must match NUMERICALLY, not just stay finite — a placement
    # regression that keeps values finite must fail the driver gate too)
    import ssqueezepy_tpu as stq

    def _rel(a, b, trim=0):
        a, b = np.asarray(a), np.asarray(b)
        if trim:
            a, b = a[..., trim:-trim], b[..., trim:-trim]
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)

    Tx_1, Wx_1, _, _ = stq.ssq_cwt(x, ('gmw', {'dtype': 'float32'}),
                                   scales='log', nv=8, astensor=False)

    # forward sharded ssq_cwt
    plan = ShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log', nv=8,
                         mesh=mesh)
    Tx, Wx = plan(x)
    jax.block_until_ready(Tx.re)
    # float32 bin-boundary rounding may flip single bins between
    # execution paths (reference's own CPU/GPU criterion: atol 6e-3);
    # column sums (the inversion integral) must agree tightly
    assert _rel(Wx.to_numpy(), Wx_1) < 1e-5
    assert _rel(Tx.to_numpy(), Tx_1) < 6e-3
    assert _rel(Tx.to_numpy().sum(-2), Tx_1.sum(-2)) < 1e-4

    # gradient step: differentiate a reconstruction-style loss through the
    # FULL sharded forward — FFT conv, phase transform, bin map, scatter,
    # and the cross-chip psum (the scatter's VJP is a bin gather; bins are
    # integer-valued and carry no tangent). Data-parallel grads are psum'd
    # by shard_map/jit.
    scales_j = plan._scales_j
    const_j = plan._const_j
    wavelet = plan.wavelet
    params, gamma, flipud = plan.params, plan.gamma, plan.flipud
    nbins = plan.nbins

    def loss_fn(x_in):
        def per_shard(xp_pad, scales_blk, const_blk):
            Wx, dWx = cwt_core(xp_pad, wavelet, scales_blk, 1.0, True,
                               True, plan.n1, N, rpadded=False, is_2d=True)
            w = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
            valid = Wx.abs2() > jnp.asarray(gamma, 'float32') ** 2
            w = jnp.where(valid, w, jnp.inf)
            k, kvalid = compute_bins(w, params, flipud)
            valid = valid & kvalid
            c = const_blk.reshape(1, -1, 1)
            Tx_part = jax.vmap(
                lambda a, b, kk, vv: _scatter_xla(a, b, kk, vv, nbins)
            )(Wx.re * c, Wx.im * c, k, valid)
            Tx_re = jax.lax.psum(Tx_part.re, 'scale')
            # inverse through the reassigned plane: sum over bins
            rec = Tx_re.sum(axis=-2)
            return ((rec - xp_pad[..., plan.n1:plan.n1 + N]) ** 2).mean(
                keepdims=True)[..., None]

        fn = shard_map(per_shard, mesh=mesh,
                       in_specs=(P('batch', None), P('scale', None),
                                 P('scale')),
                       out_specs=P('batch', None),
                       check_vma=False)
        xp_pad = padsignal(x_in, 'reflect')
        return fn(xp_pad, scales_j, const_j).mean()

    g = jax.jit(jax.grad(loss_fn))(jnp.asarray(x))
    jax.block_until_ready(g)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()

    # time-sharded (context-parallel) path: ring halo exchange + exact
    # global rows for over-support scales
    from .time_sharded import TimeShardedSSQCWT, make_mesh_time
    tmesh = make_mesh_time(batch=batch_axis, time=n_devices // batch_axis,
                           devices=devices)
    tplan = TimeShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                              nv=8, mesh=tmesh)
    Tt, Wt, dWt = tplan(x)
    jax.block_until_ready(Tt.re)
    assert np.isfinite(np.asarray(Tt.re)).all()
    # interior columns (halo-width margin at the signal edges)
    assert _rel(Wt.to_numpy(), Wx_1, trim=32) < 5e-3
    assert _rel(Tt.to_numpy().sum(-2), Tx_1.sum(-2), trim=32) < 5e-3

    # full three-axis composition: batch x scale x time in ONE shard_map
    # (SURVEY.md §5.8 Mesh(('data','scale','time')))
    if n_devices % 4 == 0:
        from .full_sharded import FullShardedSSQCWT, make_mesh3
        m3 = make_mesh3(batch=batch_axis, scale=2,
                        time=n_devices // (2 * batch_axis),
                        devices=devices)
        p3 = FullShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               nv=8, mesh=m3)
        T3 = p3(x)
        jax.block_until_ready(T3.re)
        assert np.isfinite(np.asarray(T3.re)).all()
        assert _rel(T3.to_numpy().sum(-2), Tx_1.sum(-2), trim=32) < 5e-3

    # sharded STFT family: frequency-row sharding with the squeeze's
    # bin reduction as the only cross-chip psum
    from .sharded_stft import ShardedSSQSTFT
    from .distributed import init_distributed, make_host_chip_mesh
    # multi-host bootstrap (no-op single-host) + host x chip mesh whose
    # inner axis rides ICI — the DCN layer's single-host degeneration
    pidx, pcnt = init_distributed()
    assert pidx == 0 and pcnt >= 1
    hmesh = make_host_chip_mesh('scale', devices=devices)
    assert hmesh.devices.size == n_devices
    splan = ShardedSSQSTFT(N, n_fft=64, mesh=hmesh, dtype='float32')
    Ts, Ss = splan(x)
    jax.block_until_ready(Ts.re)
    assert np.isfinite(np.asarray(Ts.re)).all()
    Ts_1, Ss_1, _, _ = stq.ssq_stft(x, n_fft=64, dtype='float32',
                                    astensor=False)
    assert _rel(Ss.to_numpy(), Ss_1) < 1e-5
    assert _rel(Ts.to_numpy(), Ts_1) < 6e-3
    assert _rel(Ts.to_numpy().sum(-2), Ts_1.sum(-2)) < 1e-4

    # second-order (WSST2/FSST2) under sharding: the five-kernel
    # filterbank blocks + per-cell chirp regression per shard, one psum
    from .sharded_order2 import ShardedSSQCWT2
    p2 = ShardedSSQCWT2(N, ('gmw', {'dtype': 'float32'}), 'log', nv=8,
                        mesh=mesh)
    T2, W2 = p2(x)
    jax.block_until_ready(T2.re)
    assert np.isfinite(np.asarray(T2.re)).all()
    T2_1, _, _, _ = stq.ssq_cwt2(x, ('gmw', {'dtype': 'float32'}),
                                 scales='log', nv=8, astensor=False)
    assert _rel(T2.to_numpy().sum(-2), T2_1.sum(-2)) < 1e-3

    from .sharded_stft import ShardedSSQSTFT2
    s2 = ShardedSSQSTFT2(N, n_fft=64, mesh=hmesh, dtype='float32')
    Ts2, Ss2 = s2(x)
    jax.block_until_ready(Ts2.re)
    assert np.isfinite(np.asarray(Ts2.re)).all()
    T2s_1, _, _, _ = stq.ssq_stft2(x, n_fft=64, dtype='float32',
                                   astensor=False)
    assert _rel(Ts2.to_numpy().sum(-2), T2s_1.sum(-2)) < 1e-3

    # sharded inverses: scale-axis psum round trips on the forward's
    # distributed outputs (parallel/inverse.py)
    from .inverse import sharded_icwt, sharded_issq_cwt
    xr = sharded_icwt(Wx, ('gmw', {'dtype': 'float32'}), 'log', nv=8,
                      x_len=N, mesh=mesh)
    assert xr.shape == (B, N) and np.isfinite(xr).all()
    xr_1 = stq.icwt(Wx_1, ('gmw', {'dtype': 'float32'}), scales='log',
                    nv=8, x_len=N)
    assert _rel(xr, xr_1) < 1e-3
    xr2 = sharded_issq_cwt(Tx, ('gmw', {'dtype': 'float32'}), mesh=mesh)
    assert xr2.shape == (B, N) and np.isfinite(xr2).all()
    xr2_1 = stq.issq_cwt(Tx_1, ('gmw', {'dtype': 'float32'}))
    assert _rel(xr2, xr2_1) < 1e-3

    # streaming + multirate (round-5): single-device programs, but the
    # driver's gate covers everything the product ships — a chunked
    # online run must compile, run, and match the offline transform's
    # column sums away from context edges
    from ..streaming import StreamingSSQCWT, _drive
    from ..streaming_multirate import StreamingMultirateSSQCWT
    Ns, chunk, ctx = 2048, 512, 512
    xs = rng.standard_normal(Ns).astype(np.float32)
    sc = np.geomspace(1., 16., 33).reshape(-1, 1)
    Tx_off, *_ = stq.ssq_cwt(xs, ('gmw', {'dtype': 'float32'}),
                             scales=sc, nv=None, astensor=False)
    splan = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                            scales=sc, nv=None, N=Ns, history=ctx,
                            lookahead=ctx)
    Txs, _ = _drive(splan, xs, chunk)
    m = int(min(np.ceil(splan.support_np).max(), ctx))
    assert _rel(Txs.to_numpy().sum(-2), Tx_off.sum(-2), trim=m) < 5e-3
    mplan = StreamingMultirateSSQCWT(chunk, ('gmw', {'dtype': 'float32'}),
                                     scales=sc, nv=None, N=Ns)
    Txm, _ = _drive(mplan, xs, chunk)
    assert np.isfinite(np.asarray(Txm.re)).all()
    assert Txm.shape[-1] == Ns
    mm = max(m, int(np.ceil(mplan.support_np).max()) + 64)
    assert _rel(Txm.to_numpy().sum(-2), Tx_off.sum(-2), trim=mm) < 5e-3
    return True
