# -*- coding: utf-8 -*-
"""Sharded (multi-chip) synchrosqueezed STFT.

Designed fresh for TPU (the reference's ssq_stft is GPU-parallelized but
single-device — /root/reference/ssqueezepy/algos.py:1130-1167; no
distributed analog exists, SURVEY.md §2.9 P6). In the hop_len=1
convolution form every STFT row is an independent cross-correlation of
the signal with a fixed kernel (ops/stft_conv.py), so rows shard exactly
like CWT scales:

  * 'batch' — data parallelism over signals,
  * 'scale' — frequency rows: each chip holds its block of the
    precomputed filterbank spectra, runs its block of the batched
    matmul-IFFT, reassigns into the FULL ssq bin space, and one `psum`
    over 'scale' completes the squeeze (rows scatter into shared bins,
    so the reduction is over the row axis — the only cross-chip
    communication).

When the Pallas table kernel covers the configuration, each shard runs
the bin-emitting pipeline (window-derivative rows never leave VMEM —
the same fast path as single-chip ssq_stft) followed by the k-consuming
scatter; otherwise the XLA phase/bin formulation is used.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..ops.fft import fft, ifft
from ..ops.pad import padsignal
from ..ops.phase import phase_transform_w
from ..ops.ssq_kernels import (ssq_bin_params, compute_bins,
                               _dispatch_scatter)
from ..utils.common import EPS32, EPS64
from .mesh import make_mesh

__all__ = ['ShardedSSQSTFT', 'ShardedSSQSTFT2',
           'sharded_ssq_stft']


class ShardedSSQSTFT:
    """Plan for a batched, frequency-row-sharded synchrosqueezed STFT
    (hop_len=1, modulated — the invertible configuration).

    Usage:
        plan = ShardedSSQSTFT(N, mesh=make_mesh(batch=2, scale=4))
        Tx, Sx = plan(x)   # x: (B, N); Tx (B, nbins, N) replicated,
                           # Sx (B, n_rows, N) row-sharded
    """

    def __init__(self, N, window=None, n_fft=None, win_len=None, fs=1.,
                 padtype='reflect', squeezing='sum', gamma=None,
                 flipud=False, mesh=None, dtype=None):
        from ..configs import default_dtype
        from ..models.stft import _window_key
        from ..models.windows import get_window, _check_NOLA
        from ..models.ssqueezing import _check_ssqueezing_args

        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_rows_shards = self.mesh.devices.shape[1]
        self.N = int(N)
        _check_ssqueezing_args(squeezing)
        if not (squeezing is None or isinstance(squeezing, str)):
            raise ValueError("callable `squeezing` is unsupported on the "
                             "sharded path")
        self.squeezing = squeezing
        n_fft_ = int(n_fft or min(N, 512))
        self.n_fft = n_fft_
        win_len = int(win_len or n_fft_)
        dtype_ = dtype or default_dtype()
        self.dtype = dtype_
        if gamma is None:
            gamma = 10 * (EPS64 if dtype_ == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.flipud = bool(flipud)
        self.fs = float(fs)
        self.padtype = padtype

        win, dwin = get_window(window, win_len, n_fft_, derivative=True,
                               dtype=dtype_)
        _check_NOLA(win, 1, dtype_)
        self.win_key = _window_key(win, dwin)
        self.window = win

        n_rows = n_fft_ // 2 + 1
        self.n_rows = n_rows
        Sfs = np.linspace(0, .5 * self.fs, n_rows, dtype=dtype_)
        self.Sfs = Sfs
        self.ssq_freqs = Sfs
        self.const = float(Sfs[1] - Sfs[0])
        self.params = ssq_bin_params(Sfs, logscale=False)
        self.nbins = self.params['omax'] + 1

        # pad rows to a multiple of the row-shard count with ZERO
        # filterbank rows: they produce Sx == 0, which the gamma gate
        # marks invalid, so they contribute nothing to Tx
        self.rows_pad = -(-n_rows // self.n_rows_shards) \
            * self.n_rows_shards
        self.padlength = N + n_fft_ - 1
        from ..ops.stft_conv import _next_fft_len
        self.Np2 = _next_fft_len(self.padlength)

        self._fn = self._build()

    def _tables_np(self):
        """Padded filterbank spectra (rows_pad, Np2) x4, host numpy."""
        from ..ops.stft_conv import _conv_filterbank
        H, Hd = _conv_filterbank(self.win_key, self.n_fft, self.Np2, True)
        pad = self.rows_pad - self.n_rows
        dt = self.dtype

        def prep(A):
            A = np.asarray(A)
            return np.pad(A, ((0, pad), (0, 0))).astype(dt)
        return (prep(H.real), prep(H.imag), prep(Hd.real), prep(Hd.imag))

    def _build(self):
        mesh = self.mesh
        dtype, gamma, flipud = self.dtype, self.gamma, self.flipud
        params, nbins, const = self.params, self.nbins, self.const
        Np2, N, padlength = self.Np2, self.N, self.padlength
        squeezing = self.squeezing
        rows_local = self.rows_pad // self.n_rows_shards
        sfs_pad = np.pad(self.Sfs, (0, self.rows_pad - self.n_rows),
                         mode='edge').astype(dtype)

        # per-shard natural-bin ordering hint (identity for the linear
        # STFT grid; the shard block's absolute offset lands in the
        # scatter's data-adaptive displacement range)
        nb_local = (np.arange(rows_local - 1, -1, -1) if flipud
                    else np.arange(rows_local)).astype(np.int32)
        mesh_platform = mesh.devices.flat[0].platform

        from ..ops.ssq_kernels import _pallas_enabled
        use_pallas, interp = _pallas_enabled(mesh_platform)
        use_bins = False
        if use_pallas:
            from ..ops.stft_conv import _factorize
            factors = _factorize(Np2)
            if len(factors) == 2:
                f1, f2 = factors
                use_bins = (f1 % 8 == 0 and f2 % 64 == 0 and
                            f1 <= 1024 and f2 <= 1024)
        self.uses_bins_pipeline = use_bins

        def apply_squeeze(Sx):
            from ..models.ssq_cwt import _apply_squeezing
            return _apply_squeezing(Sx, squeezing)

        if use_bins:
            from ..ops.stft_conv import stft_pallas_rows
            from ..ops.ssq_pallas import scatter_kv_pallas
            bin_spec = (tuple(sorted(params.items())), gamma, flipud,
                        params['mode'])

            def per_shard(xp, Hre, Him, Hdre, Hdim, sfs_blk):
                # xp: (B_local, padlength) padded signal (replicated over
                # rows — the full-length FFT is duplicated per row shard;
                # it is a small fraction of the row work)
                xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2,
                         imag_zero=True)
                Sx_l, k = jax.vmap(
                    lambda a, b: stft_pallas_rows(
                        Complex(a, b), jnp.asarray(self.fs, dtype), Hre,
                        Him, Hdre, Hdim, Np2, N, True, interpret=interp,
                        bin_spec=bin_spec, sfs=sfs_blk))(xh.re, xh.im)
                Sx_s = apply_squeeze(Sx_l)
                Tx_part = scatter_kv_pallas(Sx_s, k, const, nbins,
                                            natural_bins=nb_local,
                                            interpret=interp)
                Tx_re = jax.lax.psum(Tx_part.re, 'scale')
                Tx_im = jax.lax.psum(Tx_part.im, 'scale')
                return Tx_re, Tx_im, Sx_l.re, Sx_l.im
        else:
            def per_shard(xp, Hre, Him, Hdre, Hdim, sfs_blk):
                xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2,
                         imag_zero=True)
                xr, xi = xh.re[:, None], xh.im[:, None]

                def corr(hre, him):
                    pr = hre * xr - him * xi
                    pi = hre * xi + him * xr
                    return ifft(Complex(pr, pi), n=Np2, out_range=(0, N))
                Sx_l = corr(Hre, Him)
                dSx_l = corr(Hdre, Hdim)
                dSx_l = Complex(dSx_l.re * self.fs, dSx_l.im * self.fs)
                w = phase_transform_w(Sx_l, dSx_l, gamma,
                                      Sfs=sfs_blk.reshape(-1))
                k, kvalid = compute_bins(w, params, flipud)
                valid = jnp.isfinite(w) & kvalid
                Sx_s = apply_squeeze(Sx_l)
                Tx_part = jax.vmap(
                    lambda a, b, kk, vv: _dispatch_scatter(
                        a, b, kk, vv, nbins, nb_local,
                        platform=mesh_platform)
                )(Sx_s.re * const, Sx_s.im * const, k, valid)
                Tx_re = jax.lax.psum(Tx_part.re, 'scale')
                Tx_im = jax.lax.psum(Tx_part.im, 'scale')
                return Tx_re, Tx_im, Sx_l.re, Sx_l.im

        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('batch', None),
                      P('scale', None), P('scale', None),
                      P('scale', None), P('scale', None), P('scale')),
            out_specs=(P('batch', None, None), P('batch', None, None),
                       P('batch', 'scale', None),
                       P('batch', 'scale', None)),
            check_vma=False)

        tables = tuple(jnp.asarray(t) for t in self._tables_np())
        sfs_j = jnp.asarray(sfs_pad)
        padtype = self.padtype

        @jax.jit
        def run(x):
            x = x.astype(dtype)
            x = jnp.where(jnp.isfinite(x), x, 0)
            xp = padsignal(x, padtype, padlength=padlength)
            return fn(xp, *tables, sfs_j)
        return run

    def __call__(self, x):
        x = jnp.asarray(x)
        if x.ndim != 2:
            raise ValueError("sharded ssq_stft takes (B, N) input")
        Tx_re, Tx_im, Sx_re, Sx_im = self._fn(x)
        Tx = Complex(Tx_re, Tx_im)
        Sx = Complex(Sx_re[:, :self.n_rows], Sx_im[:, :self.n_rows])
        return Tx, Sx

    @property
    def ssq_freqs_out(self):
        return (self.ssq_freqs[::-1].copy() if self.flipud
                else self.ssq_freqs)


def sharded_ssq_stft(x, window=None, n_fft=None, fs=1., mesh=None, **kw):
    """One-shot batched row-sharded ssq_stft; `x` (B, N). Returns
    (Tx, Sx, ssq_freqs, Sfs) matching single-chip `ssq_stft`."""
    x = np.asarray(x)
    plan = ShardedSSQSTFT(x.shape[-1], window, n_fft, fs=fs, mesh=mesh,
                          **kw)
    Tx, Sx = plan(x)
    return Tx, Sx, plan.ssq_freqs_out, plan.Sfs


class ShardedSSQSTFT2(ShardedSSQSTFT):
    """Frequency-row-sharded SECOND-ORDER synchrosqueezed STFT (FSST2).

    The chirp regression (models/ssq_stft._fsst2_rows) couples only the
    five transforms of the SAME frequency row, so rows shard exactly as
    first order: each chip holds its block of the FIVE-window filterbank
    spectra (g, g', t g, t g', g''), runs one batched matmul IFFT over
    its 5*rows_local block, solves the per-cell regression, and
    reassigns into the full bin space; one `psum` over 'scale' completes
    the squeeze. No reference analog."""

    def _tables_np(self):
        """(rows_pad, 5, Np2) re/im five-window bank spectra, row-major
        so the row axis shards; per shard they transpose back to the
        window-major layout `_fsst2_rows` expects."""
        from ..ops.stft_conv import (_conv_filterbank_multi, _bank_key)
        from ..models.ssq_stft import _fsst2_bank
        bank = _fsst2_bank(self.window, len(self.window), self.n_fft,
                           self.dtype)
        Hre, Him = _conv_filterbank_multi(_bank_key(bank), self.n_fft,
                                          self.Np2, True, self.dtype)
        pad = self.rows_pad - self.n_rows

        def prep(A):
            A = np.asarray(A).reshape(5, self.n_rows, self.Np2)
            A = np.pad(A, ((0, 0), (0, pad), (0, 0)))
            return np.ascontiguousarray(A.transpose(1, 0, 2))
        return (prep(Hre), prep(Him))

    def _build(self):
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..models.ssq_stft import _fsst2_rows
        from ..models.ssq_cwt import _apply_squeezing
        mesh = self.mesh
        dtype, gamma, flipud = self.dtype, self.gamma, self.flipud
        params, nbins, const = self.params, self.nbins, self.const
        Np2, N, padlength = self.Np2, self.N, self.padlength
        squeezing, fs_ = self.squeezing, self.fs
        rows_local = self.rows_pad // self.n_rows_shards
        sfs_pad = np.pad(self.Sfs, (0, self.rows_pad - self.n_rows),
                         mode='edge').astype(dtype)
        nb_local = (np.arange(rows_local - 1, -1, -1) if flipud
                    else np.arange(rows_local)).astype(np.int32)
        mesh_platform = mesh.devices.flat[0].platform
        tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)
        self.uses_bins_pipeline = False

        def per_shard(xp, Hre_blk, Him_blk, sfs_blk):
            # xp: (B_local, padlength); H*_blk: (rows_local, 5, Np2)
            xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2,
                     imag_zero=True)
            xh = Complex(xh.re[:, None], xh.im[:, None])
            Hre = Hre_blk.transpose(1, 0, 2).reshape(5 * rows_local, Np2)
            Him = Him_blk.transpose(1, 0, 2).reshape(5 * rows_local, Np2)
            V, w2 = _fsst2_rows(xh, Hre, Him, rows_local, Np2, N, fs_,
                                sfs_blk, gamma, dtype, tiny)
            k, kvalid = compute_bins(w2, params, flipud)
            Sx_s = _apply_squeezing(V, squeezing)
            Tx_part = jax.vmap(
                lambda a, b, kk, vv: _dispatch_scatter(
                    a, b, kk, vv, nbins, nb_local,
                    platform=mesh_platform)
            )(Sx_s.re * const, Sx_s.im * const, k, kvalid)
            Tx_re = jax.lax.psum(Tx_part.re, 'scale')
            Tx_im = jax.lax.psum(Tx_part.im, 'scale')
            return Tx_re, Tx_im, V.re, V.im

        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('batch', None), P('scale', None, None),
                      P('scale', None, None), P('scale')),
            out_specs=(P('batch', None, None), P('batch', None, None),
                       P('batch', 'scale', None),
                       P('batch', 'scale', None)),
            check_vma=False)

        tables = tuple(jnp.asarray(t) for t in self._tables_np())
        sfs_j = jnp.asarray(sfs_pad)
        padtype = self.padtype

        @jax.jit
        def run(x):
            x = x.astype(dtype)
            x = jnp.where(jnp.isfinite(x), x, 0)
            xp = padsignal(x, padtype, padlength=padlength)
            return fn(xp, *tables, sfs_j)
        return run
