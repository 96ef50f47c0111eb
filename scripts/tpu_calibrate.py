# -*- coding: utf-8 -*-
"""Calibrate the scatter kernel's measured 11.9 ms "copy floor"
(scripts/ablate3d.out) against plain-XLA data movement of the SAME
buffers (VERDICT r3 #1a).

Round-3's `copyonly` ablation timed a pallas_call that only copies its
blocks — but the timed jit INCLUDED the XLA prep pass (pad +
row-placement gather of 3 planes). This script separates every layer:

  disp          no-op jit (tunnel dispatch floor)
  xla_rw22      XLA elementwise pass: read 2 placed planes, write 2
  xla_rw32      + the k plane read (3 read, 2 write)
  xla_prep      today's scatter prep alone: pad + place_rows x3 from
                the unplaced (na, N) planes (what the kernel timing
                silently carried)
  xla_unplace   user-Wx reconstruction: row gather + col slice of the
                placed planes (the cost of returning Wx from a placed
                pipeline)
  pl_copy       pallas copy-through on PRE-PLACED inputs (3 in, 2 out,
                no prep in the timed fn) at T=1024/2048/4096
  pl_copy22     2-in 2-out pallas copy (no k, no col specs)
  pl_copy_k16   k plane as int16 (the -10%-volume lever)
  pl_kv         the real kv scatter kernel (group/loop) on pre-placed
                inputs — kernel-only cost, no prep

Inputs are SYNTHETIC planes with the bench shape and a k distribution
matching the measured white-noise stats (dev ~ N(0,2), 0.35% outliers
beyond the 24-band) — the copy variants don't care, and the kv kernel's
pass counts depend only on the displacement spread.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.models.cwt import _process_gmw_wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import (
    _compute_associated_frequencies, _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops import ssq_pallas as sp


def bench(f, *a, n=10):
    y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*a)
    _ = np.asarray(jax.tree.leaves(y)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def report(name, sec, gb=None):
    bw = '' if gb is None else '  %6.0f GB/s eff' % (gb / sec)
    print('%-18s: %7.2f ms%s' % (name, sec * 1e3, bw), flush=True)


def make_copy_kernel(nbins_pad, kdtype):
    def kernel(wxr, wxi, k_r, const_r, offs_r, outr, outi):
        dt = wxr.dtype
        outr[:] = wxr[pl.ds(0, nbins_pad)] \
            + k_r[pl.ds(0, nbins_pad)].astype(dt)
        outi[:] = wxi[pl.ds(0, nbins_pad)]
    return kernel


def make_copy22_kernel(nbins_pad):
    def kernel(wxr, wxi, outr, outi):
        outr[:] = wxr[pl.ds(0, nbins_pad)]
        outi[:] = wxi[pl.ds(0, nbins_pad)]
    return kernel


def pallas_copy(wxr, wxi, k_, const_, offs, nbins, T, two_in=False):
    na_pad, N_pad = wxr.shape
    nbins_pad = -(-max(nbins, 8) // 8) * 8
    dt = wxr.dtype
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    if two_in:
        kern, in_specs, args = (make_copy22_kernel(nbins_pad), [bs, bs],
                                (wxr, wxi))
    else:
        kern = make_copy_kernel(nbins_pad, k_.dtype)
        in_specs = [bs, bs, bs, cs, cs]
        args = (wxr, wxi, k_, const_, offs)
    return pl.pallas_call(
        kern, grid=(N_pad // T,), in_specs=in_specs, out_specs=(os_, os_),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def pallas_kv(wxr, wxi, k_, const_, offs, nbins, T):
    """The real kv kernel on PRE-PLACED inputs (no prep)."""
    na_pad, N_pad = wxr.shape
    nbins_pad = -(-max(nbins, 8) // 8) * 8
    dt = wxr.dtype
    kernel = sp._make_kv_kernel(na_pad, nbins_pad, T, nbins)
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(N_pad // T,), in_specs=[bs, bs, bs, cs, cs],
        out_specs=(os_, os_),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),) * 2,
        scratch_shapes=[pltpu.VMEM(sp._acc_shape(na_pad, nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wxr, wxi, k_, const_, offs)


def main():
    N = 160000
    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales_np = process_scales('log-piecewise', N, wavelet, nv=32)[:300]
    na = len(scales_np)
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    params = ssq_bin_params(ssq_freqs, True)
    nbins = params['omax'] + 1
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True, na,
                            1.0)
    nat_key = tuple(int(b) for b in np.asarray(natural))
    pos, plane = sp._plan_positions(nat_key, na, nbins)
    T = 1024
    N_pad = -(-N // T) * T
    nbins_pad = -(-max(nbins, 8) // 8) * 8
    print('na=%d nbins=%d plane=%d N_pad=%d nbins_pad=%d'
          % (na, nbins, plane, N_pad, nbins_pad), flush=True)

    rng = np.random.default_rng(0)
    # synthetic placed planes (dead slots: k = -1)
    wxr_np = rng.standard_normal((plane, N_pad)).astype(np.float32)
    wxi_np = rng.standard_normal((plane, N_pad)).astype(np.float32)
    natb = np.zeros(plane, np.int64)
    alive = np.zeros(plane, bool)
    natb[np.asarray(pos)] = np.asarray(nat_key)
    alive[np.asarray(pos)] = True
    dev = np.round(rng.standard_normal((plane, N_pad)) * 2).astype(np.int64)
    out_mask = rng.random((plane, N_pad)) < 0.0035
    dev = np.where(out_mask,
                   rng.integers(25, 150, (plane, N_pad))
                   * np.where(rng.random((plane, N_pad)) < .5, -1, 1), dev)
    k_np = np.clip(natb[:, None] + dev, 0, nbins - 1)
    k_np = np.where(alive[:, None], k_np, -1).astype(np.int32)
    const_np = np.where(alive, 0.02, 0.0).astype(np.float32)[:, None]
    offs_np = np.asarray(sp._placed_offs(nat_key, pos, plane))

    wxr = jnp.asarray(wxr_np)
    wxi = jnp.asarray(wxi_np)
    k32 = jnp.asarray(k_np)
    k16 = jnp.asarray(k_np.astype(np.int16))
    const_ = jnp.asarray(const_np)
    offs = jnp.asarray(offs_np)
    # unplaced raw planes (for the prep-cost measurement)
    wxr_raw = jnp.asarray(wxr_np[:na, :N])
    wxi_raw = jnp.asarray(wxi_np[:na, :N])
    k_raw = jnp.asarray(k_np[:na, :N])
    const_raw = jnp.asarray(const_np[:na, 0])
    inv = sp._placement_gather(pos, plane, na)
    pos_j = jnp.asarray(np.asarray(pos, np.int32))

    GB_in3 = (wxr.nbytes + wxi.nbytes + k32.nbytes) / 1e9
    GB_out = 2 * nbins_pad * N_pad * 4 / 1e9
    GB_32 = GB_in3 + GB_out
    GB_22 = wxr.nbytes * 2 / 1e9 + GB_out
    GB_16 = (wxr.nbytes * 2 + k16.nbytes) / 1e9 + GB_out

    # dispatch floor
    nop = jax.jit(lambda v: v * 2.0)
    report('disp', bench(nop, jnp.ones(8, jnp.float32)))

    f = jax.jit(lambda a, b: (a * 1.0000001, b * 1.0000001))
    report('xla_rw22', bench(f, wxr, wxi), GB_22)

    f = jax.jit(lambda a, b, kk: (a + kk.astype(jnp.float32) * 1e-30,
                                  b * 1.0000001))
    report('xla_rw32', bench(f, wxr, wxi, k32), GB_32)

    cp = N_pad - N

    def prep3(wr, wi, kk, cc):
        def prep(x):
            return jnp.pad(sp._place_rows(x, inv, na), ((0, 0), (0, cp)))
        k_ = jnp.pad(sp._place_rows(kk, inv, na, fill=-1),
                     ((0, 0), (0, cp)), constant_values=-1)
        c_ = sp._place_rows(cc.reshape(-1, 1), inv, na)
        return prep(wr), prep(wi), k_, c_
    gb_prep = (wxr_raw.nbytes * 2 + k_raw.nbytes) / 1e9 + GB_in3
    report('xla_prep', bench(jax.jit(prep3), wxr_raw, wxi_raw, k_raw,
                             const_raw), gb_prep)

    off0 = 37  # representative column offset of the valid range
    f = jax.jit(lambda a, b: (a[pos_j][:, off0:off0 + N],
                              b[pos_j][:, off0:off0 + N]))
    gb_unp = wxr.nbytes * 2 / 1e9 + 2 * na * N * 4 / 1e9
    report('xla_unplace', bench(f, wxr, wxi), gb_unp)

    for Tv in (1024, 2048, 4096):
        f = jax.jit(functools.partial(pallas_copy, nbins=nbins, T=Tv))
        report('pl_copy_T%d' % Tv, bench(f, wxr, wxi, k32, const_, offs),
               GB_32)

    f = jax.jit(functools.partial(pallas_copy, nbins=nbins, T=1024,
                                  two_in=True))
    report('pl_copy22', bench(f, wxr, wxi, k32, const_, offs), GB_22)

    f = jax.jit(functools.partial(pallas_copy, nbins=nbins, T=1024))
    try:
        report('pl_copy_k16', bench(f, wxr, wxi, k16, const_, offs), GB_16)
    except Exception as e:
        print('pl_copy_k16       : FAILED %s' % str(e)[:200], flush=True)

    for Tv in (1024, 2048):
        f = jax.jit(functools.partial(pallas_kv, nbins=nbins, T=Tv))
        report('pl_kv_T%d' % Tv, bench(f, wxr, wxi, k32, const_, offs),
               GB_32)

    print('CALIBRATE-DONE', flush=True)


if __name__ == '__main__':
    main()
