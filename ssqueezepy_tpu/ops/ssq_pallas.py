# -*- coding: utf-8 -*-
"""Pallas shift-scatter kernel for synchrosqueezing reassignment.

The TPU has no per-lane scatter: `out[k[i,j], j] += v[i,j]` cannot be
written directly (XLA's scatter lowering serializes — measured ~500ms for
the benchmark shape on this device). This kernel reformulates the
reassignment as *uniform sublane shifts*:

  For each displacement `d = k[i,j] - i`, the scatter becomes

      out[i + d, j] += V[i, j] * [K[i, j] - i == d]

  i.e. one mask + one contiguous-rows read-modify-write at dynamic row
  offset `d` (static size — TPU dynamic-slice friendly). The displacement
  range [dmin, dmax] is computed per 32-row group per time tile at
  runtime and looped with dynamic `fori_loop` bounds, so well-localized
  signals (the common case) cost a handful of shift passes while
  arbitrary inputs remain exactly correct.

  Rows are pre-permuted (a free XLA gather fused into padding) so that
  each row sits as close as possible to its *natural* output bin — the
  bin its associated ssq frequency falls in (an exact row flip for CWT,
  identity for STFT, a static sort for arbitrary user grids). The
  permutation only tightens the displacement spans; correctness never
  depends on it, so ANY (na, nbins) geometry is supported — including
  per-shard blocks whose rows scatter into the full bin space with a
  large uniform offset (the offset lands in the data-adaptive d-range).

The phase transform, gamma gate, and bin map are fused into the same
kernel (reads Wx/dWx once from HBM; fused semantics mirror the reference
CUDA kernels `ssq_cwt_*`, algos.py:1007-1294).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .complexlib import Complex

__all__ = ['shift_scatter_pallas', 'ssq_fused_pallas',
           'scatter_kv_pallas']

_TWO_PI = 6.283185307179586


def _round_up(x, m):
    return -(-x // m) * m


_BIG = 2 ** 20


_GROUP = 32  # scatter row-group size (multiple of 8)

# tier-1 half-band: |k - natural_bin(row)| <= _BAND rides the shift
# passes; the rare tail (0.3-1% of noise cells at 24) is extracted per
# column and placed by dense one-row sweeps. Env-overridable for
# hardware band sweeps. (Round-3 measured alternatives — 'static'
# full-plane sweeps, output-centric 'horner' chains, folded tier-2 —
# all LOST end-to-end vs this dynamic two-tier design; see
# scripts/session3b.out and PROFILE.md. They were removed in round 4.)
import os as _os
_BAND = int(_os.environ.get('SSQTPU_SCATTER_BAND', '24'))


def _shift_scatter_core(vre, vim, dm, offs, na_pad, nbins_pad, T, acc,
                        oaccr, oacci, outr, outi):
    """Shared two-tier scatter core: out[row + d] += v with d = dm (the
    caller masks invalid cells to _BIG and guarantees row + d in
    [0, nbins) for the rest).

    TPU vector loads/stores need sublane offsets provably divisible by 8,
    so tier 1 decomposes d = 8q + r: the 8 residues r are static sublane
    rolls, and the inner dynamic `fori_loop` over q uses 8q offsets
    (provable). The displacement range a group must sweep used to be set
    by rare noise-tail cells (measured on the white-noise benchmark:
    84% of (group, tile) spans were >= 100 while P(|dev| > 24) = 0.35% —
    a handful of outliers forced ~25 q-passes where ~4 carry the data),
    so the work is split in two tiers:

      * tier 1 (shift passes): cells within `_BAND` of their row's
        natural bin (`offs[row] = natural_bin - row`, a static per-row
        column). Rows are processed in groups of `_GROUP`, each with its
        OWN dynamic [dmin, dmax] within the band — clean-signal groups
        still pay only their actual span. Real/imag planes ride
        side-by-side on the lane axis (v2 is (na_pad, 2T)) so each
        q-pass is ONE read-modify-write.
      * tier 2 (outlier extraction): out-of-band cells are extracted one
        per column per iteration (one-hot row select + sublane
        reductions) and placed with a dense (nbins_pad, T) one-row
        sweep; the loop runs max-outliers-per-column times (a dynamic
        bound, typically <= 8 on noise, 0 on clean signals). Any
        geometry stays exactly correct — pathological inputs only cost
        more iterations.

    Wrapped roll rows land in an 8-row zero/BIG apron so they never
    contribute.
    """
    dt = vre.dtype
    G = _GROUP
    ngroups = na_pad // G
    acc[:] = jnp.zeros(acc.shape, dt)
    base_off = G + 24

    act = dm != _BIG
    dev = dm - offs
    inband = act & (jnp.abs(dev) <= _BAND)
    dm_in = jnp.where(inband, dm, _BIG)
    om = act & ~inband

    validf = inband.astype(dt)
    v2 = jnp.concatenate([vre * validf, vim * validf], axis=1)
    dm2 = jnp.concatenate([dm_in, dm_in], axis=1)

    zeros8 = jnp.zeros((8, 2 * T), dt)
    big8 = jnp.full((8, 2 * T), _BIG, jnp.int32)

    for g in range(ngroups):
        vg = jnp.concatenate([v2[g * G:(g + 1) * G], zeros8], axis=0)
        dmg = jnp.concatenate([dm2[g * G:(g + 1) * G], big8], axis=0)
        neg = jnp.where(dmg == _BIG, -_BIG, dmg)
        dmin = jnp.min(dmg)
        dmax = jnp.max(neg)

        # all 8 residue rolls up front; ONE dynamic fori per group with
        # the residues statically unrolled inside — fori_loop LAUNCHES
        # dominate the kernel otherwise (~80 scalar-loop setups per grid
        # step measured slower than all the vector work combined)
        vrs = [vg] + [pltpu.roll(vg, r, 0) for r in range(1, 8)]
        dmrs = [dmg] + [pltpu.roll(dmg, r, 0) for r in range(1, 8)]
        # d = 8q + r with r in [0, 8) covers exactly
        # [8*floor(dmin/8), 8*floor(dmax/8) + 7] >= [dmin, dmax]
        qlo = jnp.floor_divide(dmin, 8)
        qhi = jnp.floor_divide(dmax, 8)

        def qbody(q, _, g=g):
            off = pl.multiple_of(base_off + g * G + 8 * q, 8)
            upd = acc[pl.ds(off, G + 8)]
            for r in range(8):
                dd = 8 * q + r
                m = (dmrs[r] == dd).astype(dt)
                upd = upd + vrs[r] * m
            acc[pl.ds(off, G + 8)] = upd
            return 0

        jax.lax.fori_loop(qlo, qhi + 1, qbody, 0, unroll=False)

    # ---- tier 2: per-column outlier extraction ---------------------------
    # two per column per iteration (the lowest and highest alive rows) —
    # the loop bound is ceil(max-outliers-per-column / 2)
    oaccr[:] = jnp.zeros((nbins_pad, T), dt)
    oacci[:] = jnp.zeros((nbins_pad, T), dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
    babs = dm + rows                       # absolute target bin
    biota = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, T), 0)

    max_cnt = jnp.max(jnp.sum(om.astype(jnp.int32), axis=0))

    def obody(it, om_i):
        alive = om_i != 0
        rlo = jnp.min(jnp.where(alive, rows, _BIG), axis=0,
                      keepdims=True)                         # (1, T)
        rhi = jnp.max(jnp.where(alive, rows, -_BIG), axis=0,
                      keepdims=True)
        sel_lo = (rows == rlo) & alive
        # guard rlo == rhi (a single alive outlier) against double count
        sel_hi = (rows == rhi) & alive & (rhi != rlo)
        flo, fhi = sel_lo.astype(dt), sel_hi.astype(dt)
        b_lo = jnp.sum(jnp.where(sel_lo, babs, 0), axis=0, keepdims=True)
        b_hi = jnp.sum(jnp.where(sel_hi, babs, 0), axis=0, keepdims=True)
        vr_lo = jnp.sum(vre * flo, axis=0, keepdims=True)
        vi_lo = jnp.sum(vim * flo, axis=0, keepdims=True)
        vr_hi = jnp.sum(vre * fhi, axis=0, keepdims=True)
        vi_hi = jnp.sum(vim * fhi, axis=0, keepdims=True)
        m_lo = ((biota == b_lo) & (rlo < _BIG)).astype(dt)   # (nbins, T)
        m_hi = ((biota == b_hi) & (rhi > -_BIG) &
                (rhi != rlo)).astype(dt)
        oaccr[:] = oaccr[:] + m_lo * vr_lo + m_hi * vr_hi
        oacci[:] = oacci[:] + m_lo * vi_lo + m_hi * vi_hi
        return om_i * (1 - (sel_lo | sel_hi).astype(jnp.int32))

    om_i = jax.lax.fori_loop(0, (max_cnt + 1) // 2, obody,
                             om.astype(jnp.int32), unroll=False)
    del om_i

    outr[:] = acc[pl.ds(base_off, nbins_pad), :T] + oaccr[:]
    outi[:] = acc[pl.ds(base_off, nbins_pad), T:] + oacci[:]


def _acc_shape(na_pad, nbins_pad, T):
    # Valid targets satisfy k = row + d in [0, nbins), so a group's
    # q-loop slices stay within [base_off - G - 23,
    # base_off + nbins_pad + G + 16) with base_off = G + 24; the tight
    # accumulator keeps the per-tile zeroing cost down. (na_pad only
    # bounds which groups exist, not the slice range.)
    return (nbins_pad + 2 * _GROUP + 48, 2 * T)


def _plan_perm(natural_bins, na):
    """Static row pre-permutation minimizing displacement spread.

    Returns None (identity), 'flip' (row reversal — free relayout), or a
    tuple permutation (argsort of the natural bins). Any value is correct;
    this only tightens the per-group displacement ranges.
    """
    if natural_bins is None:
        return None
    nb = np.asarray(natural_bins)
    if len(nb) != na:
        return None
    if (nb[:-1] >= nb[1:]).all():       # descending -> reversal sorts it
        return 'flip'
    if (nb[:-1] <= nb[1:]).all():       # already ascending
        return None
    return tuple(np.argsort(nb, kind='stable').tolist())


@functools.lru_cache(maxsize=64)
def _plan_positions(nat_key, na, nbins):
    """Injective row->slot placement aligning each row with its natural
    output bin (slot ~= nat), superseding the sorted permutation when the
    map is dense. With rows AT their natural bins the static `offs` column
    is ~0, so each group's dynamic [dmin, dmax] sweep is set by the
    *data's* displacement spread alone — the in-group natural-bin spread
    (up to ~45 bins on log-piecewise grids, where bin density varies
    0.5-2 bins/row) previously forced ~2x the q-passes the data needed.

    Returns (pos tuple len na, plane_rows) or None to use the legacy
    permutation (sparse maps — e.g. per-shard row blocks scattering into
    the full bin space — would waste whole empty groups)."""
    if nat_key is None:
        return None
    nb = np.asarray(nat_key, np.int64)
    if len(nb) != na:
        return None
    order = np.argsort(nb, kind='stable')
    pos = np.empty(na, np.int64)
    prev = -1
    for i in order:
        p = max(int(nb[i]), prev + 1)
        pos[i] = p
        prev = p
    na_pad = _round_up(max(na, _GROUP), _GROUP)
    plane = _round_up(max(prev + 1, _GROUP), _GROUP)
    if plane > na_pad + 2 * _GROUP:
        return None                      # too sparse: empty-group waste
    if np.abs(pos - nb).max() > _GROUP:
        return None                      # heavy collisions: no alignment
    return tuple(int(p) for p in pos), int(plane)


def _placement_gather(pos, plane, na):
    """Row-gather index taking (na, N) input to the (plane, N) slot
    layout; slot `pos[i]` holds row i, dead slots read the fill row
    appended at index `na`."""
    inv = np.full(plane, na, np.int32)
    inv[np.asarray(pos, np.int64)] = np.arange(na, dtype=np.int32)
    return inv


def _place_rows(x, inv, na, fill=0):
    """Scatter rows of `x` (na, N) to their slots via a static gather
    (fuses into the surrounding pad/relayout); dead slots get `fill`."""
    filler = jnp.full((1, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([x, filler], axis=0)[jnp.asarray(inv)]


def _placed_offs(nat_key, pos, plane):
    """Static tier-1 band center per slot: natural_bin - slot (~0 by
    construction; nonzero only where collisions displaced a row)."""
    offs = np.zeros((plane, 1), np.int32)
    nb = np.asarray(nat_key, np.int64)
    offs[np.asarray(pos, np.int64), 0] = (nb - np.asarray(pos, np.int64)
                                          ).astype(np.int32)
    return offs


def _apply_perm(x, perm):
    if perm is None:
        return x
    if perm == 'flip':
        return x[::-1]
    return x[np.asarray(perm, np.int32)]


# --------------------------------------------------------------------------
# fused phase + bin + shift-scatter kernel
# --------------------------------------------------------------------------
def _phase_bin_math(C, D, A, B, params, gamma, flipud, mode, sfs=None):
    """Traceable phase transform + bin map shared by the fused scatter
    kernel and the CWT kernel's bin-output variant: w = |Im((dW/W))/2pi|
    (or |Sfs - .|), gamma-gated, mapped through the lin/log/log-piecewise
    bin arithmetic (reference algos.py:859-984). Returns (k int32,
    valid bool)."""
    dt = C.dtype
    denom = (C * C + D * D)
    w = (B * C - A * D) / (denom * _TWO_PI)
    if sfs is not None:
        w = jnp.abs(sfs - w)
    else:
        w = jnp.abs(w)
    valid = denom > jnp.asarray(gamma, dt) ** 2
    w = jnp.where(valid, w, jnp.inf)
    return _bins_from_w(w, valid, params, flipud, mode)


def _bins_from_w(w, valid, params, flipud, mode):
    """Bin map for a PRECOMPUTED reassignment frequency plane `w`
    (inf-marked where gated): the lin/log/log-piecewise arithmetic tail
    of `_phase_bin_math`, shared with the order-2 kernels whose `w` is
    the chirp-corrected estimate. Returns (k int32, valid bool)."""
    omax = params['omax']
    dt = w.dtype

    if mode == 'lin':
        k = jnp.minimum(jnp.round(jnp.maximum(
            (w - params['vmin']) / jnp.asarray(params['dv'], dt), 0)),
            omax)
    elif mode == 'log':
        wl = jnp.log2(w)
        k = jnp.minimum(jnp.round(jnp.maximum(
            (wl - params['vlmin']) / jnp.asarray(params['dvl'], dt),
            0)), omax)
    else:  # log-piecewise
        wl = jnp.log2(w)
        k_hi = jnp.minimum(
            jnp.round((wl - params['vlmin1'])
                      / jnp.asarray(params['dvl1'], dt))
            + params['idx1'], omax)
        k_lo = jnp.maximum(
            jnp.round((wl - params['vlmin0'])
                      / jnp.asarray(params['dvl0'], dt)), 0)
        k = jnp.where(wl > params['vlmin1'], k_hi, k_lo)

    valid = valid & jnp.isfinite(w)
    k = jnp.where(valid, k, 0).astype(jnp.int32)
    if flipud:
        k = omax - k
    return k, valid


def _make_fused_kernel(na_pad, nbins_pad, T, params, gamma, flipud, mode,
                       has_sfs):
    omax = params['omax']

    def kernel(*refs):
        if has_sfs:
            (wxr, wxi, dwxr, dwxi, const_r, offs_r, sfs_r, outr, outi,
             acc, oaccr, oacci) = refs
        else:
            (wxr, wxi, dwxr, dwxi, const_r, offs_r, outr, outi,
             acc, oaccr, oacci) = refs

        C, D = wxr[:], wxi[:]
        A, B = dwxr[:], dwxi[:]
        dt = C.dtype

        k, valid = _phase_bin_math(C, D, A, B, params, gamma, flipud,
                                   mode, sfs=sfs_r[:] if has_sfs else None)

        validf = valid.astype(dt)
        cst = const_r[:]
        vre = C * cst * validf
        vim = D * cst * validf

        # Edge-clamped cells (bin 0 / bin omax) have huge displacements
        # that would poison every shift span; their targets are STATIC
        # rows, so accumulate them with two cheap sublane reductions and
        # drop them from the shift passes.
        m_lo = valid & (k == 0)
        m_hi = valid & (k == omax)
        lo_re = jnp.sum(vre * m_lo.astype(dt), axis=0)
        lo_im = jnp.sum(vim * m_lo.astype(dt), axis=0)
        hi_re = jnp.sum(vre * m_hi.astype(dt), axis=0)
        hi_im = jnp.sum(vim * m_hi.astype(dt), axis=0)
        edge = m_lo | m_hi

        rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
        d = k - rows
        dm = jnp.where(valid & ~edge, d, _BIG)

        _shift_scatter_core(vre, vim, dm, offs_r[:], na_pad, nbins_pad, T,
                            acc, oaccr, oacci, outr, outi)
        outr[pl.ds(0, 1)] = outr[pl.ds(0, 1)] + lo_re.reshape(1, T)
        outi[pl.ds(0, 1)] = outi[pl.ds(0, 1)] + lo_im.reshape(1, T)
        outr[pl.ds(omax, 1)] = outr[pl.ds(omax, 1)] + hi_re.reshape(1, T)
        outi[pl.ds(omax, 1)] = outi[pl.ds(omax, 1)] + hi_im.reshape(1, T)

    return kernel


def _offs_column(nat_key, perm, na, na_pad):
    """Static per-row tier-1 band center: natural_bin(row) - row after the
    pre-permutation (zeros when no natural-bin info is available)."""
    offs = np.zeros((na_pad, 1), np.int32)
    if nat_key is not None:
        nb = _apply_perm(np.asarray(nat_key, np.int32), perm)
        offs[:na, 0] = nb - np.arange(na, dtype=np.int32)
    return offs


@functools.partial(jax.jit, static_argnames=(
    'param_items', 'gamma', 'flipud', 'perm', 'nat_key', 'has_sfs',
    'interpret', 'T'))
def _ssq_fused_call(Wxr, Wxi, dWxr, dWxi, const_col, Sfs_col, param_items,
                    gamma, flipud, perm, nat_key, has_sfs, interpret,
                    T=1024):
    params = dict(param_items)
    na, N = Wxr.shape
    nbins = params['omax'] + 1
    placement = _plan_positions(nat_key, na, nbins)
    na_pad = (placement[1] if placement is not None
              else _round_up(max(na, _GROUP), _GROUP))
    nbins_pad = _round_up(max(nbins, 8), 8)
    N_pad = _round_up(N, T)
    dt = Wxr.dtype
    rp, cp = na_pad - na, N_pad - N

    if placement is not None:
        pos, plane = placement
        inv = _placement_gather(pos, plane, na)

        def prep(x):
            return jnp.pad(_place_rows(x, inv, na), ((0, 0), (0, cp)))

        def prep_col(x):
            return _place_rows(x.reshape(-1, 1), inv, na)

        offs_np = _placed_offs(nat_key, pos, plane)
    else:
        def prep(x):
            return jnp.pad(_apply_perm(x, perm), ((0, rp), (0, cp)))

        def prep_col(x):
            return jnp.pad(_apply_perm(x, perm).reshape(-1, 1),
                           ((0, rp), (0, 0)))

        offs_np = _offs_column(nat_key, perm, na, na_pad)

    # zero-padding makes |Wx|=0 <= gamma -> padded/dead entries invalid
    args = [prep(Wxr), prep(Wxi), prep(dWxr), prep(dWxi),
            prep_col(const_col),
            jnp.asarray(offs_np)]
    col_spec = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((na_pad, T), lambda i: (0, i),
                     memory_space=pltpu.VMEM)] * 4 + [col_spec, col_spec]
    if has_sfs:
        args.append(prep_col(Sfs_col.astype(dt)))
        in_specs.append(col_spec)

    kernel = _make_fused_kernel(na_pad, nbins_pad, T, params, gamma,
                                flipud, params['mode'], has_sfs)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(N_pad // T,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),
                   jax.ShapeDtypeStruct((nbins_pad, N_pad), dt)),
        scratch_shapes=[pltpu.VMEM(_acc_shape(na_pad, nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out_re[:nbins, :N], out_im[:nbins, :N]


@functools.lru_cache(maxsize=64)
def _ssq_fused_vjp_fn(param_items, gamma, flipud, perm, nat_key, has_sfs,
                      interpret, T):
    """custom_vjp wrapper: Pallas forward, backward = jax.vjp of the XLA
    formulation of the identical math (the gradient of the reassignment
    w.r.t. (Wx, const) is a bin gather; bins themselves are produced by
    `round` and carry zero tangent, matching XLA autodiff exactly)."""
    params = dict(param_items)

    def xla_ref(Wxr, Wxi, dWxr, dWxi, const_col, Sfs_col):
        from .ssq_kernels import compute_bins, _scatter_xla
        from .phase import phase_transform_w
        Wx, dWx = Complex(Wxr, Wxi), Complex(dWxr, dWxi)
        w = phase_transform_w(Wx, dWx, gamma,
                              Sfs=Sfs_col if has_sfs else None)
        k, valid = compute_bins(w, params, flipud)
        c = const_col.reshape(-1, 1)
        out = _scatter_xla(Wxr * c, Wxi * c, k, valid, params['omax'] + 1)
        return out.re, out.im

    @jax.custom_vjp
    def f(Wxr, Wxi, dWxr, dWxi, const_col, Sfs_col):
        return _ssq_fused_call(Wxr, Wxi, dWxr, dWxi, const_col, Sfs_col,
                               param_items, gamma, flipud, perm, nat_key,
                               has_sfs, interpret, T=T)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def ssq_fused_pallas(Wx, dWx, const, params, gamma, flipud, natural_bins,
                     Sfs=None, interpret=False, T=1024):
    """Fused phase+bin+scatter on TPU. `Wx`, `dWx` split-complex (na, n)
    or (b, na, n); returns Tx `Complex` with ``params['omax'] + 1`` rows.
    Any (na, nbins) geometry; `natural_bins` only tunes the row
    pre-permutation (displacement locality). Differentiable (custom VJP;
    see `_ssq_fused_vjp_fn`)."""
    na = Wx.shape[-2]
    perm = _plan_perm(natural_bins, na)
    nat_key = (tuple(int(b) for b in np.asarray(natural_bins))
               if natural_bins is not None and len(natural_bins) == na
               else None)

    dt = Wx.dtype
    c = jnp.asarray(const, dt).reshape(-1)
    const_col = jnp.broadcast_to(c, (na,)) if c.shape[0] != na else c
    Sfs_col = (jnp.asarray(Sfs, dt) if Sfs is not None else
               jnp.zeros((na,), dt))

    call2d = _ssq_fused_vjp_fn(
        tuple(sorted(params.items())), float(gamma), bool(flipud), perm,
        nat_key, Sfs is not None, bool(interpret), int(T))

    def call(wr, wi, dr, di):
        return call2d(wr, wi, dr, di, const_col, Sfs_col)

    if Wx.re.ndim == 3:
        outr, outi = jax.vmap(call)(Wx.re, Wx.im, dWx.re, dWx.im)
    else:
        outr, outi = call(Wx.re, Wx.im, dWx.re, dWx.im)
    return Complex(outr, outi)


# --------------------------------------------------------------------------
# standalone shift-scatter (k precomputed) — used by indexed_sum paths and
# the sharded (per-shard rows -> full bin space) reassignment
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# k-consuming fused scatter: the CWT kernel emits bin indices directly
# (k < 0 marks gamma-gated cells), so the derivative planes never touch
# HBM; this kernel multiplies Wx by the per-row squeeze constant,
# extracts edge-clamped bins via static reductions, and shift-scatters
# --------------------------------------------------------------------------
def _make_kv_kernel(na_pad, nbins_pad, T, nbins):
    omax = nbins - 1

    def kernel(wxr, wxi, k_r, const_r, offs_r, outr, outi, acc,
               oaccr, oacci):
        dt = wxr.dtype
        # k may arrive int16 (the direct pipeline's -10%-input-volume
        # lever); tier math runs int32 (_BIG exceeds int16)
        k = k_r[:].astype(jnp.int32)
        valid = (k >= 0) & (k <= omax)
        validf = valid.astype(dt)
        cst = const_r[:]
        vre = wxr[:] * cst * validf
        vim = wxi[:] * cst * validf

        # edge-clamped cells have huge displacements; their targets are
        # static rows -> accumulate with two sublane reductions and drop
        # them from the shift/extraction tiers (mirrors the full fused
        # kernel)
        m_lo = valid & (k == 0)
        m_hi = valid & (k == omax)
        lo_re = jnp.sum(vre * m_lo.astype(dt), axis=0)
        lo_im = jnp.sum(vim * m_lo.astype(dt), axis=0)
        hi_re = jnp.sum(vre * m_hi.astype(dt), axis=0)
        hi_im = jnp.sum(vim * m_hi.astype(dt), axis=0)
        edge = m_lo | m_hi

        rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
        dm = jnp.where(valid & ~edge, k - rows, _BIG)
        _shift_scatter_core(vre, vim, dm, offs_r[:], na_pad, nbins_pad, T,
                            acc, oaccr, oacci, outr, outi)
        outr[pl.ds(0, 1)] = outr[pl.ds(0, 1)] + lo_re.reshape(1, T)
        outi[pl.ds(0, 1)] = outi[pl.ds(0, 1)] + lo_im.reshape(1, T)
        outr[pl.ds(omax, 1)] = outr[pl.ds(omax, 1)] + hi_re.reshape(1, T)
        outi[pl.ds(omax, 1)] = outi[pl.ds(omax, 1)] + hi_im.reshape(1, T)
    return kernel


@functools.partial(jax.jit, static_argnames=('nbins', 'perm', 'nat_key',
                                             'interpret', 'T'))
def _scatter_kv_call(wxr, wxi, k, const_col, nbins, perm, nat_key,
                     interpret, T=1024):
    na, N = wxr.shape
    placement = _plan_positions(nat_key, na, nbins)
    na_pad = (placement[1] if placement is not None
              else _round_up(max(na, _GROUP), _GROUP))
    nbins_pad = _round_up(max(nbins, 8), 8)
    N_pad = _round_up(N, T)
    dt = wxr.dtype
    rp, cp = na_pad - na, N_pad - N

    if placement is not None:
        pos, plane = placement
        inv = _placement_gather(pos, plane, na)

        def prep(x):
            return jnp.pad(_place_rows(x, inv, na), ((0, 0), (0, cp)))

        # dead slots carry k = -1 (invalid)
        k_ = jnp.pad(_place_rows(k, inv, na, fill=-1), ((0, 0), (0, cp)),
                     constant_values=-1)
        const_ = _place_rows(const_col.reshape(-1, 1), inv, na)
        offs_np = _placed_offs(nat_key, pos, plane)
    else:
        def prep(x):
            return jnp.pad(_apply_perm(x, perm), ((0, rp), (0, cp)))

        # padded cells carry k = -1 (invalid)
        k_ = jnp.pad(_apply_perm(k, perm), ((0, rp), (0, cp)),
                     constant_values=-1)
        const_ = jnp.pad(_apply_perm(const_col, perm).reshape(-1, 1),
                         ((0, rp), (0, 0)))
        offs_np = _offs_column(nat_key, perm, na, na_pad)

    offs = jnp.asarray(offs_np)
    kernel = _make_kv_kernel(na_pad, nbins_pad, T, nbins)
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(N_pad // T,),
        in_specs=[bs, bs, bs, cs, cs],
        out_specs=(os, os),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),
                   jax.ShapeDtypeStruct((nbins_pad, N_pad), dt)),
        scratch_shapes=[pltpu.VMEM(_acc_shape(na_pad, nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prep(wxr), prep(wxi), k_, const_, offs)
    return out_re[:nbins, :N], out_im[:nbins, :N]


@functools.lru_cache(maxsize=64)
def _scatter_kv_vjp_fn(nbins, perm, nat_key, interpret, T):
    """custom_vjp: forward = k-consuming Pallas scatter; backward =
    adjoint gather via the XLA formulation (k is integer-valued and
    carries no tangent)."""
    def xla_ref(wxr, wxi, k, const_col):
        from .ssq_kernels import _scatter_xla
        c = const_col.reshape(-1, 1)
        valid = (k >= 0) & (k < nbins)
        out = _scatter_xla(wxr * c, wxi * c, k, valid, nbins)
        return out.re, out.im

    @jax.custom_vjp
    def f(wxr, wxi, k, const_col):
        return _scatter_kv_call(wxr, wxi, k, const_col, nbins, perm,
                                nat_key, interpret, T=T)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def scatter_kv_pallas(Wx, k, const, nbins, natural_bins=None,
                      interpret=False, T=1024):
    """Reassignment from precomputed bin indices: `out[k[i,j], j] +=
    Wx[i,j] * const[i]`, with `k < 0` (or >= nbins) marking invalid
    cells. Edge bins (0, nbins-1) extract via static reductions.
    Differentiable in Wx (custom VJP: adjoint gather)."""
    na = Wx.shape[-2]
    perm = _plan_perm(natural_bins, na)
    nat_key = (tuple(int(b) for b in np.asarray(natural_bins))
               if natural_bins is not None and len(natural_bins) == na
               else None)
    dt = Wx.dtype
    c = jnp.asarray(const, dt).reshape(-1)
    const_col = jnp.broadcast_to(c, (na,)) if c.shape[0] != na else c
    f = _scatter_kv_vjp_fn(int(nbins), perm, nat_key, bool(interpret),
                           int(T))
    if Wx.re.ndim == 3:
        outr, outi = jax.vmap(
            lambda a, b, kk: f(a, b, kk, const_col))(Wx.re, Wx.im, k)
    else:
        outr, outi = f(Wx.re, Wx.im, k, const_col)
    return Complex(outr, outi)


# --------------------------------------------------------------------------
# direct (zero-prep) kv scatter: inputs arrive ALREADY in the scatter's
# layout — (na_pad, W) planes with na_pad % 32 == 0, W % T == 0, invalid
# cells (gamma-gated / dummy rows / out-of-range columns) carrying
# k = -1. The CWT/STFT bins kernels emit exactly this (full padded
# width, dummy tail rows), so the XLA pad + row-placement gather the
# legacy path pays (~4.5 ms at the bench shape, scripts/tpu_calibrate.py
# `xla_prep`) disappears, and k rides as int16 (-10% input volume).
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=('nbins', 'offs_key',
                                             'interpret', 'T'))
def _scatter_kv_direct_call(wxr, wxi, k, const_col, nbins, offs_key,
                            interpret, T=2048):
    na_pad, W = wxr.shape
    assert na_pad % _GROUP == 0 and W % T == 0, (na_pad, W, T)
    nbins_pad = _round_up(max(nbins, 8), 8)
    dt = wxr.dtype
    if offs_key is None:
        offs_np = np.zeros((na_pad, 1), np.int32)
    else:
        offs_np = np.asarray(offs_key, np.int32).reshape(na_pad, 1)
    kernel = _make_kv_kernel(na_pad, nbins_pad, T, nbins)
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    cs = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(W // T,),
        in_specs=[bs, bs, bs, cs, cs],
        out_specs=(os, os),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, W), dt),
                   jax.ShapeDtypeStruct((nbins_pad, W), dt)),
        scratch_shapes=[pltpu.VMEM(_acc_shape(na_pad, nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wxr, wxi, k, const_col.reshape(na_pad, 1), jnp.asarray(offs_np))
    return out_re, out_im


@functools.lru_cache(maxsize=64)
def _scatter_kv_direct_vjp_fn(nbins, offs_key, interpret, T):
    """custom_vjp for the direct scatter: forward = zero-prep Pallas;
    backward = adjoint gather via the XLA formulation on the full padded
    planes (k integer-valued, no tangent)."""
    def xla_ref(wxr, wxi, k, const_col):
        from .ssq_kernels import _scatter_xla
        c = const_col.reshape(-1, 1)
        k32 = k.astype(jnp.int32)
        valid = (k32 >= 0) & (k32 < nbins)
        out = _scatter_xla(wxr * c, wxi * c, k32, valid, nbins)
        nbins_pad = _round_up(max(nbins, 8), 8)
        pad = ((0, nbins_pad - nbins), (0, 0))
        return jnp.pad(out.re, pad), jnp.pad(out.im, pad)

    @jax.custom_vjp
    def f(wxr, wxi, k, const_col):
        return _scatter_kv_direct_call(wxr, wxi, k, const_col, nbins,
                                       offs_key, interpret, T=T)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def scatter_kv_direct(Wx, k, const_pad, nbins, offs=None, interpret=False,
                      T=2048):
    """Zero-prep reassignment on pre-layout planes: `Wx` split-complex
    (na_pad, W) with na_pad % 32 == 0 and W % T == 0, `k` int16/int32
    bin plane (-1 / out-of-range = invalid), `const_pad` (na_pad,)
    per-row squeeze constants (0 on dummy rows), `offs` optional static
    per-row band centers (natural_bin - row; None = zeros, exact for
    the identity-layout planes the bins kernels emit). Returns the FULL
    (nbins_pad, W) Tx planes — callers slice [:nbins, off:off+N].
    Differentiable in Wx (custom VJP: adjoint gather)."""
    offs_key = (tuple(int(v) for v in np.asarray(offs).reshape(-1))
                if offs is not None else None)
    f = _scatter_kv_direct_vjp_fn(int(nbins), offs_key, bool(interpret),
                                  int(T))
    outr, outi = f(Wx.re, Wx.im, k, const_pad)
    return Complex(outr, outi)



def _make_scatter_kernel(na_pad, nbins_pad, T):
    def kernel(vre_r, vim_r, k_r, valid_r, offs_r, outr, outi, acc,
               oaccr, oacci):
        dt = vre_r.dtype
        k = k_r[:]
        valid = valid_r[:] != 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (na_pad, T), 0)
        d = k - rows
        dm = jnp.where(valid, d, _BIG)

        validf = valid.astype(dt)
        vre = vre_r[:] * validf
        vim = vim_r[:] * validf
        _shift_scatter_core(vre, vim, dm, offs_r[:], na_pad, nbins_pad, T,
                            acc, oaccr, oacci, outr, outi)
    return kernel


@functools.partial(jax.jit, static_argnames=('nbins', 'perm', 'nat_key',
                                             'interpret', 'T'))
def _scatter_call(vre, vim, k, valid, nbins, perm, nat_key, interpret,
                  T=512):
    na, N = vre.shape
    placement = _plan_positions(nat_key, na, nbins)
    na_pad = (placement[1] if placement is not None
              else _round_up(max(na, _GROUP), _GROUP))
    nbins_pad = _round_up(max(nbins, 8), 8)
    N_pad = _round_up(N, T)
    dt = vre.dtype
    rp, cp = na_pad - na, N_pad - N

    if placement is not None:
        pos, plane = placement
        inv = _placement_gather(pos, plane, na)

        def prep(x):
            return jnp.pad(_place_rows(x, inv, na), ((0, 0), (0, cp)))

        offs_np = _placed_offs(nat_key, pos, plane)
    else:
        def prep(x):
            return jnp.pad(_apply_perm(x, perm), ((0, rp), (0, cp)))

        offs_np = _offs_column(nat_key, perm, na, na_pad)
    offs = jnp.asarray(offs_np)

    vre_ = prep(vre)
    vim_ = prep(vim)
    # XLA-scatter index semantics: negative k wraps (numpy indexing),
    # k >= nbins is dropped; padded/dead rows are invalid
    k = jnp.where(k < 0, k + nbins, k)
    k_ = prep(k)
    valid_ = prep((valid & (k >= 0) & (k < nbins)).astype(jnp.int32))

    kernel = _make_scatter_kernel(na_pad, nbins_pad, T)
    bs = pl.BlockSpec((na_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((nbins_pad, T), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(N_pad // T,),
        in_specs=[bs, bs, bs, bs,
                  pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(os, os),
        out_shape=(jax.ShapeDtypeStruct((nbins_pad, N_pad), dt),
                   jax.ShapeDtypeStruct((nbins_pad, N_pad), dt)),
        scratch_shapes=[pltpu.VMEM(_acc_shape(na_pad, nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt),
                        pltpu.VMEM((nbins_pad, T), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vre_, vim_, k_, valid_, offs)
    return out_re[:nbins, :N], out_im[:nbins, :N]


@functools.lru_cache(maxsize=64)
def _scatter_vjp_fn(nbins, perm, nat_key, interpret, T):
    """custom_vjp: Pallas scatter forward; backward is the adjoint gather
    (via jax.vjp of the XLA scatter — bin indices are integer inputs and
    carry no tangent)."""
    def xla_ref(vre, vim, k, valid):
        from .ssq_kernels import _scatter_xla
        out = _scatter_xla(vre, vim, k, valid, nbins)
        return out.re, out.im

    @jax.custom_vjp
    def f(vre, vim, k, valid):
        return _scatter_call(vre, vim, k, valid, nbins, perm, nat_key,
                             interpret, T=T)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def shift_scatter_pallas(vre, vim, k, valid, nbins, natural_bins=None,
                         interpret=False, T=512):
    """`out[k[i,j], j] += v[i,j]` via displacement shift passes.
    Any (na, nbins) geometry; out-of-range `k` dropped (XLA-scatter
    parity). `natural_bins` (static, len na) only tunes locality.
    Differentiable in (vre, vim) (custom VJP: adjoint gather)."""
    na = vre.shape[-2]
    perm = _plan_perm(natural_bins, na)
    nat_key = (tuple(int(b) for b in np.asarray(natural_bins))
               if natural_bins is not None and len(natural_bins) == na
               else None)
    f = _scatter_vjp_fn(int(nbins), perm, nat_key, bool(interpret), int(T))
    outr, outi = f(vre, vim, k, valid)
    return Complex(outr, outi)
