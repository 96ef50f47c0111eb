# -*- coding: utf-8 -*-
"""Ablate the shift-scatter kernel's cost structure on the real bench
planes (Wx, k from the 160k x 300 bins pipeline). The BAND/GROUP/T sweep
came back flat (31.8-33.9 ms end-to-end for BAND 16/24/32, GROUP 32/64),
so the q-pass count is NOT the cost driver — this isolates which
structural piece is: the residue rolls, the dynamic fori launches, the
tier-2 outlier loop, or the per-tile fixed work.

Variants (all on the same inputs, same output shape):
  full    — current kernel verbatim
  not2    — tier-2 outlier loop skipped
  not1    — tier-1 q-loop skipped (rolls kept live via a tiny write)
  noroll  — residue rolls replaced by copies (q-loop + tier2 intact)
  fixed   — group loop and tier2 empty: prep + acc zero + edge + write
  global  — no 32-row groups: ONE dynamic q-loop over the full plane
            with global [dmin, dmax]
  static  — no dynamic control flow at all: 8 full-plane rolls x a
            trace-time q window from the placed offsets (EXACT — a
            redesign candidate, not an ablation)
  croll   — tier-1 with v2/dm2 rolled as ONE concatenated (G+8, 4T)
            plane per residue (8 roll ops instead of 16; same lane
            work — isolates Mosaic per-op overhead on rolls)
  horner  — output-centric tier-1 (redesign candidate, EXACT):
            out[b] = sum_j v[b+j]*[dm[b+j] == -j] accumulated by a
            Horner chain S = roll(S, -1) + v*(dm == -j) — 4 straight-
            line full-plane ops per displacement, no groups, no dynamic
            fori, no accumulator slice read-modify-writes
  fold    — folded tier-2 (redesign candidate, EXACT): outlier planes
            fold 384->48 rows by residue-class sums (3 halving adds);
            a fold row is valid when its column holds EXACTLY ONE
            outlier (the overwhelming case at 0.35% density), so the
            extraction loop runs on the compact (48,T) plane; columns
            with chunk collisions (cnt>=2) fall back to the original
            full-plane loop (usually 0 iterations)
Usage: python scripts/tpu_scatter_ablate.py [variants...] [T=1024]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssqueezepy_tpu.ops.complexlib import Complex
from ssqueezepy_tpu.ops.fft import fft
from ssqueezepy_tpu.ops.pad import padsignal, pad_params
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.models.cwt import _process_gmw_wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales, nv_from_scales
from ssqueezepy_tpu.models.ssqueezing import (_compute_associated_frequencies,
                                              _natural_bins)
from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params
from ssqueezepy_tpu.ops.cwt_pallas import (cwt_fused_bins_pallas,
                                           support_klims)
from ssqueezepy_tpu.ops import ssq_pallas as sp

_BIG = 2 ** 20


def make_kernel(na_pad, nbins_pad, T, nbins, variant, G=32, BAND=24,
                qstat=None):
    omax = nbins - 1

    def core(vre, vim, dm, offs, acc, oaccr, oacci, outr, outi):
        dt = vre.dtype
        ngroups = na_pad // G
        acc[:] = jnp.zeros(acc.shape, dt)
        base_off = G + 24
        if variant == 'zeroed':
            # floor: grid launch + BlockSpec copies + zeroing + write
            oaccr[:] = jnp.zeros((nbins_pad, T), dt)
            oacci[:] = jnp.zeros((nbins_pad, T), dt)
            outr[:] = acc[pl.ds(base_off, nbins_pad), :T] + oaccr[:]
            outi[:] = acc[pl.ds(base_off, nbins_pad), T:] + oacci[:]
            return

        act = dm != _BIG
        dev = dm - offs
        inband = act & (jnp.abs(dev) <= BAND)
        dm_in = jnp.where(inband, dm, _BIG)
        om = act & ~inband

        if variant == 'slim':
            # out-of-band/invalid cells carry _BIG in dm_in, so the
            # per-pass equality mask already gates them — the validf
            # pre-multiply is redundant work
            v2 = jnp.concatenate([vre, vim], axis=1)
        else:
            validf = inband.astype(dt)
            v2 = jnp.concatenate([vre * validf, vim * validf], axis=1)
        dm2 = jnp.concatenate([dm_in, dm_in], axis=1)

        if variant == 'global':
            apron = jnp.zeros((8, 2 * T), dt)
            vg = jnp.concatenate([v2, apron], axis=0)
            dmg = jnp.concatenate([dm2, jnp.full((8, 2 * T), _BIG,
                                                 jnp.int32)], axis=0)
            neg = jnp.where(dmg == _BIG, -_BIG, dmg)
            dmin = jnp.min(dmg)
            dmax = jnp.max(neg)
            vrs = [vg] + [pltpu.roll(vg, r, 0) for r in range(1, 8)]
            dmrs = [dmg] + [pltpu.roll(dmg, r, 0) for r in range(1, 8)]
            qlo = jnp.floor_divide(dmin, 8)
            qhi = jnp.floor_divide(dmax, 8)

            def qbody(q, _):
                off = pl.multiple_of(base_off + 8 * q, 8)
                upd = acc[pl.ds(off, na_pad + 8)]
                for r in range(8):
                    m = (dmrs[r] == 8 * q + r).astype(dt)
                    upd = upd + vrs[r] * m
                acc[pl.ds(off, na_pad + 8)] = upd
                return 0

            jax.lax.fori_loop(qlo, qhi + 1, qbody, 0, unroll=False)
        elif variant == 'horner':
            # output-centric static sweep: bin b (plane row off0 + b)
            # accumulates via a Horner chain acc = roll(acc, 1) +
            # vP*(dmP == d), d descending over the static window — 4
            # full-plane ops per displacement, no groups, no per-group
            # min/max, no acc slice RMW. fori with ref-carried state
            # (the unrolled chain blows up the compile).
            dlo, dhi = qstat
            off0 = 0 if dlo >= 0 else -(-(-dlo) // 8) * 8
            r0 = off0 + dlo
            H = -(-max(r0 + na_pad + (dhi - dlo) + 8,
                       off0 + nbins_pad) // 8) * 8
            parts_v = [v2, jnp.zeros((H - r0 - na_pad, 2 * T), dt)]
            parts_d = [dm2, jnp.full((H - r0 - na_pad, 2 * T), _BIG,
                                     jnp.int32)]
            if r0:
                parts_v.insert(0, jnp.zeros((r0, 2 * T), dt))
                parts_d.insert(0, jnp.full((r0, 2 * T), _BIG, jnp.int32))
            vP = jnp.concatenate(parts_v, axis=0)
            dmP = jnp.concatenate(parts_d, axis=0)
            acc[pl.ds(0, H)] = vP * (dmP == dhi).astype(dt)

            def hbody(step, _):
                d = dhi - 1 - step
                acc[pl.ds(0, H)] = (pltpu.roll(acc[pl.ds(0, H)], 1, 0)
                                    + vP * (dmP == d).astype(dt))
                return 0

            jax.lax.fori_loop(0, dhi - dlo, hbody, 0, unroll=False)
            # move into the shared combine's slot
            shifted = acc[pl.ds(off0, nbins_pad)]
            acc[pl.ds(base_off, nbins_pad)] = shifted
        elif variant == 'static':
            # STATIC two-tier sweep: no dynamic fori, no per-group
            # ranges — 8 full-plane rolls x a trace-time q window from
            # the placed offsets. Every slice offset is a static
            # multiple of 8 (aligned rmw, no relayout).
            qlo_s, qhi_s = qstat
            apron = jnp.zeros((8, 2 * T), dt)
            bigap = jnp.full((8, 2 * T), _BIG, jnp.int32)
            vg = jnp.concatenate([v2, apron], axis=0)
            dmg = jnp.concatenate([dm2, bigap], axis=0)
            for r in range(8):
                vr = vg if r == 0 else pltpu.roll(vg, r, 0)
                dmr = dmg if r == 0 else pltpu.roll(dmg, r, 0)
                for q in range(qlo_s, qhi_s + 1):
                    off = base_off + 8 * q
                    m = (dmr == 8 * q + r).astype(dt)
                    acc[pl.ds(off, na_pad + 8)] = \
                        acc[pl.ds(off, na_pad + 8)] + vr * m
        elif variant not in ('fixed', 'noedge', 'nowrapm'):
            zeros8 = jnp.zeros((8, 2 * T), dt)
            big8 = jnp.full((8, 2 * T), _BIG, jnp.int32)
            for g in range(ngroups):
                vg = jnp.concatenate([v2[g * G:(g + 1) * G], zeros8], 0)
                dmg = jnp.concatenate([dm2[g * G:(g + 1) * G], big8], 0)
                neg = jnp.where(dmg == _BIG, -_BIG, dmg)
                dmin = jnp.min(dmg)
                dmax = jnp.max(neg)
                if variant == 'noroll':
                    vrs = [vg] * 8
                    dmrs = [dmg] * 8
                elif variant == 'croll':
                    # ONE roll per residue on a concatenated (G+8, 4T)
                    # plane (dm bitcast to float lanes), halving roll op
                    # count; lane work is identical
                    cg = jnp.concatenate(
                        [vg, jax.lax.bitcast_convert_type(dmg, dt)],
                        axis=1)
                    crs = [cg] + [pltpu.roll(cg, r, 0) for r in range(1, 8)]
                    vrs = [c[:, :2 * T] for c in crs]
                    dmrs = [jax.lax.bitcast_convert_type(
                        c[:, 2 * T:], jnp.int32) for c in crs]
                else:
                    vrs = [vg] + [pltpu.roll(vg, r, 0) for r in range(1, 8)]
                    dmrs = [dmg] + [pltpu.roll(dmg, r, 0)
                                    for r in range(1, 8)]
                qlo = jnp.floor_divide(dmin, 8)
                qhi = jnp.floor_divide(dmax, 8)

                def qbody(q, _, g=g, vrs=vrs, dmrs=dmrs):
                    off = pl.multiple_of(base_off + g * G + 8 * q, 8)
                    upd = acc[pl.ds(off, G + 8)]
                    for r in range(8):
                        m = (dmrs[r] == 8 * q + r).astype(dt)
                        upd = upd + vrs[r] * m
                    acc[pl.ds(off, G + 8)] = upd
                    return 0

                if variant == 'not1':
                    # keep the rolls live without the loop
                    acc[pl.ds(0, 8)] = acc[pl.ds(0, 8)] + vrs[7][:8] \
                        + dmrs[7][:8].astype(dt) * 0
                else:
                    jax.lax.fori_loop(qlo, qhi + 1, qbody, 0,
                                      unroll=False)

        if variant != 'slim':
            oaccr[:] = jnp.zeros((nbins_pad, T), dt)
            oacci[:] = jnp.zeros((nbins_pad, T), dt)
        if variant == 'fold':
            # ---- folded tier 2: compact the sparse outliers 8x, extract
            # from the (F, T) plane; chunk-collision columns fall through
            # to the exact full-plane loop below (usually 0 iterations)
            rows_f = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
            babs_f = dm + rows_f
            F = na_pad // 8
            omf = om.astype(dt)

            def fold8(x):
                h = x.shape[0]
                while h > F:
                    h //= 2
                    x = x[:h] + x[h:]
                return x

            cnt = fold8(om.astype(jnp.int32))
            vfr = fold8(vre * omf)
            vfi = fold8(vim * omf)
            bf = fold8(jnp.where(om, babs_f, 0))
            single = cnt == 1
            frows = jax.lax.broadcasted_iota(jnp.int32, (F, T), 0)
            fio = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, T), 0)
            fmax = jnp.max(jnp.sum(single.astype(jnp.int32), axis=0))

            def fbody(it, al_i):
                alive = al_i != 0
                rlo = jnp.min(jnp.where(alive, frows, _BIG), axis=0,
                              keepdims=True)
                rhi = jnp.max(jnp.where(alive, frows, -_BIG), axis=0,
                              keepdims=True)
                sel_lo = (frows == rlo) & alive
                sel_hi = (frows == rhi) & alive & (rhi != rlo)
                flo, fhi = sel_lo.astype(dt), sel_hi.astype(dt)
                b_lo = jnp.sum(jnp.where(sel_lo, bf, 0), axis=0,
                               keepdims=True)
                b_hi = jnp.sum(jnp.where(sel_hi, bf, 0), axis=0,
                               keepdims=True)
                vr_lo = jnp.sum(vfr * flo, axis=0, keepdims=True)
                vi_lo = jnp.sum(vfi * flo, axis=0, keepdims=True)
                vr_hi = jnp.sum(vfr * fhi, axis=0, keepdims=True)
                vi_hi = jnp.sum(vfi * fhi, axis=0, keepdims=True)
                m_lo = ((fio == b_lo) & (rlo < _BIG)).astype(dt)
                m_hi = ((fio == b_hi) & (rhi > -_BIG) &
                        (rhi != rlo)).astype(dt)
                oaccr[:] = oaccr[:] + m_lo * vr_lo + m_hi * vr_hi
                oacci[:] = oacci[:] + m_lo * vi_lo + m_hi * vi_hi
                return al_i * (1 - (sel_lo | sel_hi).astype(jnp.int32))

            jax.lax.fori_loop(0, (fmax + 1) // 2, fbody,
                              single.astype(jnp.int32), unroll=False)
            coll = cnt >= 2
            om = om & jnp.concatenate([coll] * 8, axis=0)
        if variant not in ('not2', 'fixed', 'noedge', 'nowrapm'):
            rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
            babs = dm + rows
            biota = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, T), 0)
            max_cnt = jnp.max(jnp.sum(om.astype(jnp.int32), axis=0))

            def obody(it, om_i):
                alive = om_i != 0
                rlo = jnp.min(jnp.where(alive, rows, _BIG), axis=0,
                              keepdims=True)
                rhi = jnp.max(jnp.where(alive, rows, -_BIG), axis=0,
                              keepdims=True)
                sel_lo = (rows == rlo) & alive
                sel_hi = (rows == rhi) & alive & (rhi != rlo)
                flo, fhi = sel_lo.astype(dt), sel_hi.astype(dt)
                b_lo = jnp.sum(jnp.where(sel_lo, babs, 0), axis=0,
                               keepdims=True)
                b_hi = jnp.sum(jnp.where(sel_hi, babs, 0), axis=0,
                               keepdims=True)
                vr_lo = jnp.sum(vre * flo, axis=0, keepdims=True)
                vi_lo = jnp.sum(vim * flo, axis=0, keepdims=True)
                vr_hi = jnp.sum(vre * fhi, axis=0, keepdims=True)
                vi_hi = jnp.sum(vim * fhi, axis=0, keepdims=True)
                m_lo = ((biota == b_lo) & (rlo < _BIG)).astype(dt)
                m_hi = ((biota == b_hi) & (rhi > -_BIG) &
                        (rhi != rlo)).astype(dt)
                if variant == 'slim':
                    # scatter outliers straight into the acc plane: no
                    # oacc buffers, no oacc zeroing, no final add
                    upd = jnp.concatenate(
                        [m_lo * vr_lo + m_hi * vr_hi,
                         m_lo * vi_lo + m_hi * vi_hi], axis=1)
                    acc[pl.ds(base_off, nbins_pad)] = \
                        acc[pl.ds(base_off, nbins_pad)] + upd
                else:
                    oaccr[:] = oaccr[:] + m_lo * vr_lo + m_hi * vr_hi
                    oacci[:] = oacci[:] + m_lo * vi_lo + m_hi * vi_hi
                return om_i * (1 - (sel_lo | sel_hi).astype(jnp.int32))

            jax.lax.fori_loop(0, (max_cnt + 1) // 2, obody,
                              om.astype(jnp.int32), unroll=False)

        if variant == 'slim':
            outr[:] = acc[pl.ds(base_off, nbins_pad), :T]
            outi[:] = acc[pl.ds(base_off, nbins_pad), T:]
        else:
            outr[:] = acc[pl.ds(base_off, nbins_pad), :T] + oaccr[:]
            outi[:] = acc[pl.ds(base_off, nbins_pad), T:] + oacci[:]

    def kernel(wxr, wxi, k_r, const_r, offs_r, outr, outi, acc,
               oaccr, oacci):
        dt = wxr.dtype
        if variant == 'copyonly':
            # pure DMA floor: read the 3 input blocks, write the 2
            # output blocks, touch no scratch
            outr[:] = wxr[pl.ds(0, nbins_pad)] \
                + k_r[pl.ds(0, nbins_pad)].astype(dt)
            outi[:] = wxi[pl.ds(0, nbins_pad)]
            return
        if variant in ('zeroed', 'nowrapm'):
            rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
            core(wxr[:], wxi[:], k_r[:] - rows, offs_r[:], acc,
                 oaccr, oacci, outr, outi)
            return
        k = k_r[:]
        valid = (k >= 0) & (k <= omax)
        validf = valid.astype(dt)
        cst = const_r[:]
        if variant == 'noedge':
            rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
            vre = wxr[:] * cst * validf
            vim = wxi[:] * cst * validf
            dm = jnp.where(valid, k - rows, _BIG)
            core(vre, vim, dm, offs_r[:], acc, oaccr, oacci, outr, outi)
            return
        if variant == 'slim':
            mask = cst * validf          # one shared mask plane
            vre = wxr[:] * mask
            vim = wxi[:] * mask
        else:
            vre = wxr[:] * cst * validf
            vim = wxi[:] * cst * validf
        m_lo = valid & (k == 0)
        m_hi = valid & (k == omax)
        lo_re = jnp.sum(vre * m_lo.astype(dt), axis=0)
        lo_im = jnp.sum(vim * m_lo.astype(dt), axis=0)
        hi_re = jnp.sum(vre * m_hi.astype(dt), axis=0)
        hi_im = jnp.sum(vim * m_hi.astype(dt), axis=0)
        edge = m_lo | m_hi
        rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
        dm = jnp.where(valid & ~edge, k - rows, _BIG)
        core(vre, vim, dm, offs_r[:], acc, oaccr, oacci, outr, outi)
        outr[pl.ds(0, 1)] = outr[pl.ds(0, 1)] + lo_re.reshape(1, T)
        outi[pl.ds(0, 1)] = outi[pl.ds(0, 1)] + lo_im.reshape(1, T)
        outr[pl.ds(omax, 1)] = outr[pl.ds(omax, 1)] + hi_re.reshape(1, T)
        outi[pl.ds(omax, 1)] = outi[pl.ds(omax, 1)] + hi_im.reshape(1, T)

    return kernel


@functools.partial(jax.jit, static_argnames=('nbins', 'nat_key', 'variant',
                                             'T', 'interpret'))
def scatter_variant(wxr, wxi, k, const_col, nbins, nat_key, variant,
                    T=1024, interpret=False):
    band = 24
    if ':B=' in variant:
        variant, b = variant.split(':B=')
        band = int(b)
    na, N = wxr.shape
    G = 32
    placement = sp._plan_positions(nat_key, na, nbins)
    pos, plane = placement
    inv = sp._placement_gather(pos, plane, na)
    qstat = None
    if variant == 'static':
        offs_np = np.asarray(sp._placed_offs(nat_key, pos, plane))
        qlo_s = int(np.floor((offs_np.min() - band) / 8))
        qhi_s = int(np.floor((offs_np.max() + band) / 8))
        assert qlo_s >= -7, (qlo_s, "grow base_off for this geometry")
        qstat = (qlo_s, qhi_s)
    elif variant == 'horner':
        offs_np = np.asarray(sp._placed_offs(nat_key, pos, plane))
        qstat = (int(offs_np.min()) - band, int(offs_np.max()) + band)
    na_pad = plane
    nbins_pad = -(-max(nbins, 8) // 8) * 8
    N_pad = -(-N // T) * T
    dt = wxr.dtype
    cp = N_pad - N

    def prep(x):
        return jnp.pad(sp._place_rows(x, inv, na), ((0, 0), (0, cp)))

    k_ = jnp.pad(sp._place_rows(k, inv, na, fill=-1), ((0, 0), (0, cp)),
                 constant_values=-1)
    const_ = sp._place_rows(const_col.reshape(-1, 1), inv, na)
    offs = jnp.asarray(sp._placed_offs(nat_key, pos, plane))

    kernel = make_kernel(na_pad, nbins_pad, T, nbins, variant, G=G,
                         BAND=band, qstat=qstat)
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(N_pad // T,),
        in_specs=[bs, bs, bs, cs, cs],
        out_specs=(os_, os_),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),
                   jax.ShapeDtypeStruct((nbins_pad, N_pad), dt)),
        scratch_shapes=[
            pltpu.VMEM((nbins_pad + 2 * G + 48, 2 * T), dt),
            pltpu.VMEM((nbins_pad, T), dt),
            pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prep(wxr), prep(wxi), k_, const_, offs)
    return out_re[:nbins, :N], out_im[:nbins, :N]


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


def main():
    args = sys.argv[1:]
    T = 1024
    variants = []
    for a in args:
        if a.startswith('T='):
            T = int(a[2:])
        else:
            variants.append(a)
    variants = variants or ['full', 'not2', 'not1', 'noroll', 'fixed',
                            'global']

    N = 160000
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales_np = process_scales('log-piecewise', N, wavelet, nv=32)
    n_up, n1, _ = pad_params(N, 'reflect')
    ssq_freqs = _compute_associated_frequencies(
        scales_np, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    const = np.log(2) / nv_from_scales(scales_np)
    params = ssq_bin_params(ssq_freqs, True)
    natural = _natural_bins('cwt', scales_np, ssq_freqs, params, True,
                            len(scales_np), 1.0)
    gamma = float(10 * np.finfo(np.float32).eps)
    klims = support_klims(wavelet, scales_np, n_up)
    nbins = params['omax'] + 1
    half = n_up // 2 + 1

    xp = padsignal(jnp.asarray(x), 'reflect')
    scales_j = jnp.asarray(scales_np, jnp.float32)
    const_j = jnp.asarray(np.asarray(const, np.float32))

    t0 = time.perf_counter()
    Wx, k = jax.jit(lambda xp, s: cwt_fused_bins_pallas(
        fft(Complex(xp, jnp.zeros_like(xp)), axis=-1, out_range=(0, half),
            imag_zero=True),
        s, wavelet, n_up, n1, N, 1.0, True, dict(params), gamma, True,
        deriv_lowprec=True, klims=klims))(xp, scales_j)
    _ = np.asarray(Wx.re.ravel()[0:1])
    print('planes ready (%ds): Wx %s nbins=%d' % (
        time.perf_counter() - t0, Wx.shape, nbins), flush=True)

    nat_key = tuple(int(b) for b in natural)
    ref = None
    for v in variants:
        t0 = time.perf_counter()
        f = lambda wr, wi, kk, cc: scatter_variant(wr, wi, kk, cc, nbins,
                                                   nat_key, v, T)
        try:
            dt_ms = bench(f, Wx.re, Wx.im, k, const_j) * 1e3
        except Exception as e:
            print('%-8s: FAILED %s' % (v, str(e)[:200]), flush=True)
            continue
        note = ''
        if v == 'full':
            ref = np.asarray(jax.device_get(
                scatter_variant(Wx.re, Wx.im, k, const_j, nbins, nat_key,
                                'full', T)[0][:, ::371]))
        elif ref is not None and v.split(':')[0] in ('global', 'static',
                                                     'fold', 'croll',
                                                     'horner', 'slim'):
            got = np.asarray(jax.device_get(
                scatter_variant(Wx.re, Wx.im, k, const_j, nbins, nat_key,
                                v, T)[0][:, ::371]))
            note = '  maxdiff=%.2e' % np.abs(got - ref).max()
        print('%-8s: %7.3f ms  [compile %ds]%s'
              % (v, dt_ms, time.perf_counter() - t0, note), flush=True)


if __name__ == '__main__':
    main()
