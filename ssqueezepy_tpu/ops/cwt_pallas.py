# -*- coding: utf-8 -*-
"""Fully-fused Pallas CWT kernel: filterbank synthesis + 2-stage matmul
IFFT + spectral derivative, VMEM-resident per scale row.

The XLA cwt_core materializes every FFT stage to HBM (~2.4 GB/stage at
the benchmark shape — each stage is a pure memory pass). This kernel keeps
one scale row's whole pipeline in VMEM: synthesize `psih` on the half
grid, multiply by the (resident) signal spectrum, run both IFFT stages as
in-VMEM MXU matmuls with the twiddle fused between, and write only the
unpadded time range. The derivative row (`dWx`) reuses the same structure
with the spectral `1j*xi/dt` pre-multiply. Only the outputs ever touch
HBM (~0.75 GB vs ~10 GB for the staged XLA path).

Grid = (na,); constants (DFT matrices, twiddle, spectrum, xi grid) have
constant index maps, so Mosaic hoists their copies out of the grid loop.

Used when: analytic real-valued wavelet, 1D input, 2-factor FFT length.
Everything else falls back to the XLA path in models/cwt.py (which is
also the correctness reference for this kernel's tests).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .complexlib import Complex

__all__ = ['cwt_fused_pallas', 'cwt_fused_bins_pallas',
           'cwt_pallas_applicable']

# Mosaic lowers fp32 dots through the full-precision path regardless of
# the precision flag (measured: DEFAULT == HIGHEST in-kernel), so fp32
# accuracy at 2x the speed comes from a MANUAL bf16x3 split: a = hi + lo
# with hi = bf16(a); (hi+lo)(hi'+lo') ~= hi hi' + hi lo' + lo hi'
# (the lo*lo' term is below fp32 rounding). Three native-rate bf16 MXU
# passes vs six for the fp32 path; ~1e-7 relative end-to-end (asserted
# vs the XLA path in tests).
_PREC = jax.lax.Precision.DEFAULT


def _dot(a, b):
    dn = (((1,), (0,)), ((), ()))
    kw = dict(dimension_numbers=dn, precision=_PREC,
              preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(a_hi, b_hi, **kw) +
            jax.lax.dot_general(a_hi, b_lo, **kw) +
            jax.lax.dot_general(a_lo, b_hi, **kw))


def _dot_lo(a, b):
    """Single-pass bf16 dot (~3 decimal digits). Used for the derivative
    pipeline when dWx only feeds the reassignment BIN INDEX: the phase
    transform's relative error ~2^-8 moves log-spaced bins by ~0.1 — well
    inside the reference's own +-1-bin equivalence criterion
    (algos.py:288-293) — while costing 1/3 the MXU passes."""
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               dimension_numbers=dn, precision=_PREC,
                               preferred_element_type=jnp.float32)


def _make_kernel(wavelet_fn, rows0, f1, f2, k2span, deriv, l1_norm,
                 dtype, na_mod=None, deriv_lowprec=False, rps=1,
                 bin_spec=None, direct=None, n_alias=0, order2=None):
    # k1 is processed in halves to bound VMEM temporaries
    # (stage-1/twiddle/stage-2 intermediates halve)
    nh = 2 if f1 % 16 == 0 else 1
    hk1 = f1 // nh
    assert rps == 1 or na_mod is None
    assert bin_spec is None or deriv
    # direct (zero-prep) bins mode: (col_off, N_valid, na_live, r0,
    # kdtype) — the k plane is emitted scatter-ready: -1 on out-of-range
    # columns and on the dummy tail rows (absolute row >= na_live) that
    # pad the plane to the scatter's 32-row granularity, cast to kdtype
    # (int16 halves the scatter's k input volume)
    assert direct is None or (bin_spec is not None and rps == 1
                              and na_mod is None)
    # order2 (WSST2) bins mode: `order2` = the cdiv regularizer `tiny`.
    # The kernel synthesizes the FIVE analysis banks (h, i xi h, i a h',
    # -xi a h', -a^2 h'' — spectral factors of one wavelet row; the xi
    # derivatives come from jax.grad of the elementwise spectral fn,
    # exact), keeps the four auxiliary transforms in VMEM, solves the
    # per-cell complex-chirp regression (models/ssq_cwt2._wsst2_rows is
    # the XLA twin and correctness reference), and emits (W, k) in the
    # scatter's layout.
    assert order2 is None or (bin_spec is not None and direct is not None)
    if order2 is not None:
        _g1 = jax.grad(lambda w: jnp.sum(wavelet_fn(w, xp=jnp)))
        _g2 = jax.grad(lambda w: jnp.sum(_g1(w)))

    def kernel(scale_r, invdt_r, xi_r, xhre_r, xhim_r, wre_r, wim_r,
               tre_r, tim_r, w2re_r, w2im_r, *rest):
        outs = rest[n_alias:]      # skip donated alias-chain input refs
        # outs: (Wre, Wim[, dre, dim]) when deriv else (Wre, Wim)
        #
        # The whole pipeline runs in TRANSPOSED layout (frequency digit m2
        # on sublanes): constants arrive pre-transposed from trace time,
        # stage 1 is A^T = P^T @ W^T, stage 2 is E^T = w2^T @ At^T, and
        # E^T lands directly in the output's (k2, k1) layout — no
        # in-kernel transposes (8 per grid step in the row-major
        # formulation; Mosaic lowers those through shuffles that rival the
        # dot cost).
        #
        # `rows0` here is the (possibly support-pruned) stage-1
        # contraction size: the caller slices the constants and spectrum
        # to each scale bucket's frequency support at trace time and
        # launches one pallas_call per contiguous bucket range (in-kernel
        # `pl.when` bucket branches measured 20% SLOWER end-to-end than
        # no pruning at all — predication defeats Mosaic's pipelining).
        i = pl.program_id(0)
        if na_mod is None:           # grid covers rows (rps per step)
            xh_re, xh_im = xhre_r[:], xhim_r[:]
        else:                        # grid = (B*na,): batched signal
            xh_re, xh_im = xhre_r[0], xhim_r[0]
        xi = xi_r[:]                                   # (f2, rows0)
        w2re, w2im = w2re_r[:], w2im_r[:]              # (k2span, f2)

        def _emit_k(out_ref, j, sl, h, k, valid):
            if direct is None:
                out_ref[j, :, sl] = jnp.where(valid, k, -1)
            else:
                col_off, N_valid, na_live, r0, kdtype = direct
                # flattened time col n = k2*f1 + k1; valid data
                # lives in [col_off, col_off + N_valid)
                lin = (jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
                       * f1
                       + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
                       + h * hk1)
                ok = (valid & (lin >= col_off)
                      & (lin < col_off + N_valid)
                      & (r0 + i < na_live))
                out_ref[j, :, sl] = jnp.where(ok, k, -1).astype(kdtype)

        # At small N each grid step's dots are tiny and the ~300-step
        # grid's fixed per-step cost dominates; `rps` scale rows are
        # processed per step (statically unrolled) so the grid shrinks
        # by rps while VMEM stays bounded.
        for j in range(rps):
            if na_mod is None:
                scale = scale_r[i * rps + j, 0]
            else:
                scale = scale_r[jax.lax.rem(i, jnp.int32(na_mod)), 0]
            # xh arrives pre-masked (pad zeros + Nyquist/2 folded in)
            wg = scale * xi
            psih = wavelet_fn(wg, xp=jnp)
            if not l1_norm:
                psih = psih * jnp.sqrt(scale)
            Pre = psih * xh_re                         # (f2, rows0)
            Pim = psih * xh_im

            def half(Pre, Pim, dot, h):
                sl = slice(h * hk1, (h + 1) * hk1)
                # stage 1: A^T[m2, k1] = sum_m1 P^T[m2, m1] W^T[m1, k1]
                wre, wim = wre_r[:, sl], wim_r[:, sl]      # (rows0, hk1)
                Are = dot(Pre, wre) - dot(Pim, wim)        # (f2, hk1)
                Aim = dot(Pim, wre) + dot(Pre, wim)
                # twiddle W_n^{k1 m2} (transposed constant)
                tre, tim = tre_r[:, sl], tim_r[:, sl]      # (f2, hk1)
                Atre = Are * tre - Aim * tim
                Atim = Are * tim + Aim * tre
                # stage 2 + natural (k2, k1) layout: n = k1 + f1*k2
                return (dot(w2re, Atre) - dot(w2im, Atim),
                        dot(w2re, Atim) + dot(w2im, Atre), sl)

            ddot = _dot_lo if deriv_lowprec else _dot
            if bin_spec is None:
                for h in range(nh):
                    Ere, Eim, sl = half(Pre, Pim, _dot, h)
                    outs[0][j, :, sl] = Ere
                    outs[1][j, :, sl] = Eim
                if deriv:
                    # spectral derivative: spectrum times 1j * xi / dt
                    xid = xi * invdt_r[0, 0]
                    for h in range(nh):
                        Ere, Eim, sl = half(-xid * Pim, xid * Pre, ddot, h)
                        outs[2][j, :, sl] = Ere
                        outs[3][j, :, sl] = Eim
            elif order2 is None:
                # bin-output variant: the derivative rows never leave
                # VMEM — the phase transform + bin map run right here on
                # the freshly computed half blocks and only the int
                # bin plane (k, -1 = gamma-gated) is written
                from .ssq_pallas import _phase_bin_math
                params, gamma, flipud, mode = bin_spec
                xid = xi * invdt_r[0, 0]
                for h in range(nh):
                    Wre, Wim, sl = half(Pre, Pim, _dot, h)
                    outs[0][j, :, sl] = Wre
                    outs[1][j, :, sl] = Wim
                    Dre, Dim, _ = half(-xid * Pim, xid * Pre, ddot, h)
                    k, valid = _phase_bin_math(Wre, Wim, Dre, Dim,
                                               dict(params), gamma,
                                               flipud, mode)
                    _emit_k(outs[2], j, sl, h, k, valid)
            else:
                # WSST2 bin-output variant: the four auxiliary banks
                # (A = x'*h, B = x*th, Bd = x'*th, C = x*t^2 h) never
                # leave VMEM; the per-cell chirp regression
                # p2 = (Bd W - A B)/(B^2 - C W), p1 = (A + p2 B)/W and
                # the corrected estimate w2 = |Im p1|/(2 pi dt) run on
                # the fresh half blocks (XLA twin: _wsst2_rows)
                from .ssq_pallas import _bins_from_w
                params, gamma, flipud, mode = bin_spec
                from .complexlib import cmul2, cdiv2
                tiny = jnp.asarray(order2, Pre.dtype)
                dpsih = _g1(wg)
                d2psih = _g2(wg)
                tb = scale * dpsih
                t2b = (scale * scale) * d2psih
                PA = (-xi * Pim, xi * Pre)
                PB = (-(tb * xh_im), tb * xh_re)
                PBd = (-xi * (tb * xh_re), -xi * (tb * xh_im))
                PC = (-(t2b * xh_re), -(t2b * xh_im))
                inv2pidt = invdt_r[0, 0] / (2 * np.pi)
                cmul = cmul2
                cdiv = lambda a, b: cdiv2(a, b, tiny)

                for h in range(nh):
                    Wre, Wim, sl = half(Pre, Pim, _dot, h)
                    outs[0][j, :, sl] = Wre
                    outs[1][j, :, sl] = Wim
                    W = (Wre, Wim)
                    A = half(PA[0], PA[1], ddot, h)[:2]
                    B = half(PB[0], PB[1], ddot, h)[:2]
                    Bd = half(PBd[0], PBd[1], ddot, h)[:2]
                    C = half(PC[0], PC[1], ddot, h)[:2]
                    nBdW, nAB = cmul(Bd, W), cmul(A, B)
                    dBB, dCW = cmul(B, B), cmul(C, W)
                    p2 = cdiv((nBdW[0] - nAB[0], nBdW[1] - nAB[1]),
                              (dBB[0] - dCW[0], dBB[1] - dCW[1]))
                    p2B = cmul(p2, B)
                    p1 = cdiv((A[0] + p2B[0], A[1] + p2B[1]), W)
                    w2 = jnp.abs(p1[1]) * inv2pidt
                    valid = (Wre * Wre + Wim * Wim) \
                        > jnp.asarray(gamma, Pre.dtype) ** 2
                    w2 = jnp.where(valid & jnp.isfinite(w2), w2, jnp.inf)
                    k, valid = _bins_from_w(w2, valid, dict(params),
                                            flipud, mode)
                    _emit_k(outs[2], j, sl, h, k, valid)

    return kernel


def _round_up32(x):
    return -(-x // 32) * 32


_KLIM_MEMO = {}


def support_klims(wavelet, scales_np, n_up):
    """Per-scale count of leading m1-rows (f2-wide blocks of the half
    spectrum) the fused kernel must contract over: rows beyond the
    wavelet's frequency support are pruned from the stage-1 dots.

    The threshold is the smallest float32 subnormal — bins below it are
    EXACTLY zero in the f32 kernel, so pruning them changes nothing the
    f32 arithmetic could see. Samples row boundaries and midpoints
    (unimodal-decay wavelets: the last above-threshold row lies in the
    monotone tail, where half-row sampling bounds the row max); row 0 is
    always kept (large scales concentrate the whole passband there) and
    one extra row is added as margin. Returns a tuple of ints, or None
    when the wavelet is not a plain real-valued `fn` (higher-order /
    complex wavelets take the unpruned path).
    """
    from .fft import _factorize
    from ..models.wavelets import _xifn
    try:
        key = (id(wavelet.fn), hash(np.asarray(scales_np).tobytes()),
               int(n_up))
    except Exception:
        key = None
    if key is not None and key in _KLIM_MEMO:
        # memo holds a strong ref to fn so its id can't be recycled by a
        # different wavelet after garbage collection
        return _KLIM_MEMO[key][1]

    factors = _factorize(n_up)
    if len(factors) != 2:
        return None
    f2 = factors[1]
    prefix = n_up // 2 + 1
    rows0 = -(-prefix // f2)
    xi = _xifn(1., n_up, np.float64)[:prefix]
    samp = np.minimum(np.arange(2 * rows0 + 1) * (f2 // 2), prefix - 1)
    w = np.asarray(scales_np, np.float64).reshape(-1, 1) * xi[samp]
    try:
        psis = wavelet.fn(w, xp=np)
    except Exception:
        return None
    if isinstance(psis, tuple):
        return None
    psis = np.abs(np.asarray(psis, np.float64))
    need = psis > 1.4e-45
    # last sample index above threshold -> row index, +1 margin row
    any_ = need.any(axis=1)
    last = need.shape[1] - 1 - need[:, ::-1].argmax(axis=1)
    klim = np.where(any_, last // 2 + 2, 1)
    klim = np.minimum(np.maximum(klim, 1), rows0).astype(int)
    out = tuple(int(v) for v in klim)
    if key is not None:
        _KLIM_MEMO[key] = (wavelet.fn, out)
    return out


def _plan_ranges(klims, na, rows0):
    """Contiguous scale-row ranges [(r0, r1, kb), ...] with one static
    stage-1 contraction size `kb` per range.

    Buckets are K-TILE aligned (multiples of 128): the MXU quantizes the
    contraction dim to 128-lane tiles, so a K of 31 costs what K=128
    does — the useful splits are the tile counts ceil(K/128). Each range
    becomes its own pallas_call with constants sliced at trace time
    (in-kernel `pl.when` bucket branches measured 20% slower end-to-end
    than no pruning — predication defeats Mosaic's pipelining). Requires
    klims monotone non-increasing (scales sorted ascending — the library
    default); otherwise a single unpruned range is returned.
    """
    if klims is None or len(klims) != na:
        return [(0, na, rows0)]
    snap = [min(128 * (-(-max(int(kl), 1) // 128)), rows0)
            for kl in klims]
    if any(snap[i] < snap[i + 1] for i in range(na - 1)):
        return [(0, na, rows0)]
    ranges = []
    r0 = 0
    for r in range(1, na + 1):
        if r == na or snap[r] != snap[r0]:
            ranges.append((r0, r, snap[r0]))
            r0 = r
    return ranges


def cwt_pallas_applicable(wavelet, n_up, is_2d):
    """True when the fused kernel handles this configuration."""
    from ..models.cwt import _is_analytic
    from .fft import _factorize
    if not _is_analytic(wavelet):
        return False
    factors = _factorize(n_up)
    if len(factors) != 2:
        return False
    f1, f2 = factors
    # VMEM budget and tiling sanity (blocks are full-array, so any f2
    # lowers; lane efficiency degrades below 128)
    return (f1 % 8 == 0 and f2 % 64 == 0 and f1 <= 1024 and f2 <= 1024)


@functools.partial(
    jax.jit, static_argnames=('wavelet_ref', 'n_up', 'n1', 'N', 'deriv',
                              'l1_norm', 'dtype', 'interpret',
                              'deriv_lowprec', 'klims', 'bin_spec',
                              'direct_T', 'kdtype', 'order2'))
def _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref, n_up, n1, N,
                    deriv, l1_norm, dtype, interpret=False,
                    deriv_lowprec=False, klims=None, bin_spec=None,
                    direct_T=None, kdtype='int16', order2=None):
    # NOTE: a 3-stage in-VMEM variant (4x fewer MXU MACs) is blocked by
    # Mosaic's reshape constraint — any (lane-dim-crossing) reshape or
    # >2D dot flattening fails to lower ("tpu.reshape vector<...>"); the
    # per-m3-sliced hybrids measured net-neutral. Balanced 2-stage it is.
    return _cwt_fused_call2(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                            n_up, n1, N, deriv, l1_norm, dtype, interpret,
                            deriv_lowprec, klims, bin_spec, direct_T,
                            kdtype, order2)


def _cwt_fused_call2(xh_re, xh_im, scales, inv_dt, wavelet_ref, n_up, n1, N,
                     deriv, l1_norm, dtype, interpret=False,
                     deriv_lowprec=False, klims=None, bin_spec=None,
                     direct_T=None, kdtype='int16', order2=None):
    from .fft import _factorize, _dft_matrix_np, _twiddle_np
    wavelet = wavelet_ref[0]
    f1, f2 = _factorize(n_up)
    prefix = n_up // 2 + 1
    rows0 = -(-prefix // f2)
    # output digit range: time index n = k1 + f1*k2 (engine convention),
    # so n in [n1, n1+N) restricts k2 to [n1 // f1, ceil((n1+N) / f1))
    k2lo = n1 // f1
    k2hi = -(-(n1 + N) // f1)
    if direct_T is not None:
        # zero-prep bins mode: the output width IS the scatter's padded
        # width, so extend k2span until it divides the scatter tile
        # (extra k2 rows synthesize wrapped time samples — masked
        # invalid in the k plane, never read from Wx)
        assert bin_spec is not None and xh_re.ndim == 1
        while ((k2hi - k2lo) * f1) % direct_T:
            k2hi += 1
    k2span = k2hi - k2lo

    na = scales.shape[0]
    batched = (xh_re.ndim == 2)
    B = xh_re.shape[0] if batched else 1
    dt_s = str(dtype)

    # constants (trace-time numpy) — all pre-TRANSPOSED: the kernel runs
    # with the frequency digit m2 on sublanes so stage-2 results land in
    # the output's (k2, k1) layout with no in-kernel transposes.
    from ..models.wavelets import _xifn
    xi_full = _xifn(1., n_up, np.float64)[:prefix]
    xi_blk = np.zeros((rows0, f2), np.float64)
    xi_blk.ravel()[:prefix] = xi_full
    xi_blk = np.ascontiguousarray(xi_blk.T)            # (f2, rows0)
    nyq = np.zeros((rows0, f2), np.float64)
    nyq.ravel()[:prefix] = 1.0
    if n_up % 2 == 0:
        nyq.ravel()[prefix - 1] = 0.5

    wre, wim = _dft_matrix_np(f1, +1, 'float64')       # (f1, f1)
    wre = np.ascontiguousarray((wre[:, :rows0] / n_up).T).astype(dt_s)
    wim = np.ascontiguousarray((wim[:, :rows0] / n_up).T).astype(dt_s)
    # ^ (rows0, f1), 1/n folded in
    tre, tim = _twiddle_np(n_up, f1, f2, +1, 'float64')  # (f1, f2)
    tre = np.ascontiguousarray(tre.T).astype(dt_s)     # (f2, f1)
    tim = np.ascontiguousarray(tim.T).astype(dt_s)
    w2re, w2im = _dft_matrix_np(f2, +1, 'float64')     # (f2, f2)
    k2rows = np.arange(k2lo, k2hi) % f2    # periodic: direct_T may extend
    w2re = np.ascontiguousarray(w2re[k2rows]).astype(dt_s)  # (span, f2)
    w2im = np.ascontiguousarray(w2im[k2rows]).astype(dt_s)

    # signal spectrum block (zero-padded to rows0*f2) with the Nyquist
    # halving + pad mask folded in (psih*nyq*xh == psih*(nyq*xh));
    # transposed to the kernel's (f2, rows0) layout (tiny one-time XLA
    # transpose outside the kernel)
    pad = rows0 * f2 - prefix
    nyq_j = jnp.asarray(nyq.reshape(-1), dt_s)
    padw = [(0, 0)] * (xh_re.ndim - 1) + [(0, pad)]
    if batched:
        xr = (jnp.pad(xh_re, padw) * nyq_j).reshape(B, rows0, f2)
        xi_ = (jnp.pad(xh_im, padw) * nyq_j).reshape(B, rows0, f2)
        xr = jnp.transpose(xr, (0, 2, 1))
        xi_ = jnp.transpose(xi_, (0, 2, 1))
    else:
        xr = (jnp.pad(xh_re, padw) * nyq_j).reshape(rows0, f2).T
        xi_ = (jnp.pad(xh_im, padw) * nyq_j).reshape(rows0, f2).T

    out_w = k2span * f1

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    if bin_spec is not None:
        out_dts = (dt_s, dt_s, 'int32')
    elif deriv:
        out_dts = (dt_s,) * 4
    else:
        out_dts = (dt_s,) * 2
    n_out = len(out_dts)
    out_spec = pl.BlockSpec((1, k2span, f1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    off = n1 - k2lo * f1
    scales_col = scales.reshape(na, 1).astype(dt_s)
    invdt_a = jnp.asarray(inv_dt, dt_s).reshape(1, 1)

    # stage-1 support pruning: one pallas_call per contiguous scale range
    # whose wavelet support needs the same number of 128-lane K-tiles;
    # the constants and spectrum block are sliced to `kb` at trace time,
    # so each kernel is the plain unpruned kernel at a smaller K (exact:
    # the sliced-away spectrum rows multiply f32-underflowed psih — see
    # `support_klims`).
    # rows per grid step: at small N (narrow outputs) the fixed per-step
    # grid cost dominates the tiny dots; unroll several rows per step
    rps_all = 1
    if not batched and k2span * f1 * 4 <= 2 ** 18:
        rps_all = 8

    if direct_T is not None:
        # ---- zero-prep bins mode -------------------------------------
        # Emit scatter-ready planes: (na_pad, k2span, f1) with
        # na_pad % 32 == 0 (dummy tail rows duplicate the last scale and
        # carry k = -1), k cast to `kdtype`, out-of-range columns masked
        # in-kernel. Ranges chain through ONE set of output buffers via
        # pallas input_output_aliases (each range's grid writes its own
        # absolute rows; no XLA concat/assembly pass ever runs).
        na_pad = _round_up32(na)
        ranges = _plan_ranges(klims, na, rows0)
        r0l, r1l, kbl = ranges[-1]
        ranges[-1] = (r0l, na_pad, kbl)
        scl_all = jnp.pad(scales_col, ((0, na_pad - na), (0, 0)),
                          mode='edge')
        bufs = None
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        for (r0, r1, kb) in ranges:
            nb = r1 - r0
            in_specs = [
                pl.BlockSpec((nb, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                const((f2, kb)), const((f2, kb)), const((f2, kb)),
                const((kb, f1)), const((kb, f1)),
                const((f2, f1)), const((f2, f1)),
                const((k2span, f2)), const((k2span, f2)),
            ]
            out_spec = pl.BlockSpec((1, k2span, f1),
                                    lambda i, r0=r0: (r0 + i, 0, 0),
                                    memory_space=pltpu.VMEM)
            n_alias = 0 if bufs is None else 3
            kernel = _make_kernel(
                wavelet.fn, kb, f1, f2, k2span, True, l1_norm,
                jnp.dtype(dt_s), deriv_lowprec=deriv_lowprec,
                bin_spec=bin_spec, direct=(off, N, na, r0, kdtype),
                n_alias=n_alias, order2=order2)
            args = [scl_all[r0:r1], invdt_a,
                    jnp.asarray(np.ascontiguousarray(xi_blk[:, :kb]),
                                dt_s),
                    xr[:, :kb].astype(dt_s), xi_[:, :kb].astype(dt_s),
                    jnp.asarray(np.ascontiguousarray(wre[:kb])),
                    jnp.asarray(np.ascontiguousarray(wim[:kb])),
                    jnp.asarray(tre), jnp.asarray(tim),
                    jnp.asarray(w2re), jnp.asarray(w2im)]
            kw = {}
            if bufs is not None:
                args += list(bufs)
                in_specs += [any_spec] * 3
                kw['input_output_aliases'] = {len(args) - 3: 0,
                                              len(args) - 2: 1,
                                              len(args) - 1: 2}
            bufs = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=in_specs,
                out_specs=(out_spec,) * 3,
                out_shape=(
                    jax.ShapeDtypeStruct((na_pad, k2span, f1), dt_s),
                    jax.ShapeDtypeStruct((na_pad, k2span, f1), dt_s),
                    jax.ShapeDtypeStruct((na_pad, k2span, f1), kdtype)),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
                **kw,
            )(*args)
        return tuple(o.reshape(na_pad, out_w) for o in bufs)

    pieces = []
    for (r0, r1, kb) in _plan_ranges(klims, na, rows0):
        nb = r1 - r0
        rps = rps_all if (not batched and nb >= rps_all) else 1
        nb_pad = -(-nb // rps) * rps
        if batched:
            xh_spec = pl.BlockSpec((1, f2, kb),
                                   lambda i, nb=nb: (i // nb, 0, 0),
                                   memory_space=pltpu.VMEM)
            xrb, xib = xr[:, :, :kb], xi_[:, :, :kb]
        else:
            xh_spec = const((f2, kb))
            xrb, xib = xr[:, :kb], xi_[:, :kb]
        in_specs = [
            pl.BlockSpec((nb_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const((f2, kb)), xh_spec, xh_spec,
            const((kb, f1)), const((kb, f1)),
            const((f2, f1)), const((f2, f1)),
            const((k2span, f2)), const((k2span, f2)),
        ]
        rng_out_spec = pl.BlockSpec((rps, k2span, f1),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
        kernel = _make_kernel(wavelet.fn, kb, f1, f2, k2span, deriv,
                              l1_norm, jnp.dtype(dt_s),
                              na_mod=(nb if batched else None),
                              deriv_lowprec=deriv_lowprec, rps=rps,
                              bin_spec=bin_spec)
        scl = scales_col[r0:r1]
        if nb_pad != nb:
            scl = jnp.pad(scl, ((0, nb_pad - nb), (0, 0)), mode='edge')
        args = [scl, invdt_a,
                jnp.asarray(np.ascontiguousarray(xi_blk[:, :kb]), dt_s),
                xrb.astype(dt_s), xib.astype(dt_s),
                jnp.asarray(np.ascontiguousarray(wre[:kb])),
                jnp.asarray(np.ascontiguousarray(wim[:kb])),
                jnp.asarray(tre), jnp.asarray(tim),
                jnp.asarray(w2re), jnp.asarray(w2im)]
        outs = pl.pallas_call(
            kernel,
            grid=(B * nb_pad // rps,),
            in_specs=in_specs,
            out_specs=(rng_out_spec,) * n_out,
            out_shape=tuple(
                jax.ShapeDtypeStruct((B * nb_pad, k2span, f1), od)
                for od in out_dts),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*args)
        if batched:
            pieces.append(tuple(o.reshape(B, nb, out_w)[..., off:off + N]
                                for o in outs))
        else:
            pieces.append(tuple(
                o.reshape(nb_pad, out_w)[:nb, off:off + N]
                for o in outs))

    if len(pieces) == 1:
        return pieces[0]
    axis = 1 if batched else 0
    return tuple(jnp.concatenate([p[j] for p in pieces], axis=axis)
                 for j in range(n_out))


def _cwt_half_xla(xh_re, xh_im, scales, inv_dt, wavelet, n_up, n1, N,
                  deriv, l1_norm, dtype):
    """XLA formulation of the fused kernel's math (analytic wavelet,
    half-spectrum in, unpadded rows out) — the kernel's correctness
    reference and, via jax.vjp, its backward pass."""
    from .fft import ifft
    from ..models.wavelets import _xifn
    half = n_up // 2 + 1
    xi = jnp.asarray(_xifn(1., n_up, np.float64)[:half].astype(dtype))
    scales_col = scales.reshape(-1, 1).astype(dtype)
    batched = (xh_re.ndim == 2)
    xh = (Complex(xh_re[:, None], xh_im[:, None]) if batched
          else Complex(xh_re, xh_im))

    psih = wavelet.fn(scales_col * xi, xp=jnp)
    if not l1_norm:
        psih = psih * jnp.sqrt(scales_col).astype(dtype)
    if n_up % 2 == 0:
        psih = psih.at[..., half - 1].divide(2)       # Nyquist halving

    def pipe(spec):
        return ifft(spec, axis=-1, n=n_up, out_range=(n1, n1 + N),
                    nonzero_prefix=half)

    Pxh = Complex(psih * xh.re, psih * xh.im)
    Wx = pipe(Pxh)
    outs = (Wx.re, Wx.im)
    if deriv:
        xid = (xi * inv_dt).astype(dtype)
        dWx = pipe(Complex(-Pxh.im * xid, Pxh.re * xid))
        outs = outs + (dWx.re, dWx.im)
    return outs


@functools.lru_cache(maxsize=32)
def _cwt_fused_vjp_fn(wavelet_ref, n_up, n1, N, deriv, l1_norm, dtype,
                      interpret, deriv_lowprec=False, klims=None):
    """custom_vjp wrapper: Pallas forward, backward = jax.vjp of the XLA
    half-spectrum formulation (exact adjoint of the linear transform,
    incl. gradients w.r.t. `scales` through the wavelet synthesis)."""
    wavelet = wavelet_ref[0]

    def xla_ref(xh_re, xh_im, scales, inv_dt):
        return _cwt_half_xla(xh_re, xh_im, scales, inv_dt, wavelet, n_up,
                             n1, N, deriv, l1_norm, dtype)

    @jax.custom_vjp
    def f(xh_re, xh_im, scales, inv_dt):
        return _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                               n_up, n1, N, deriv, l1_norm, dtype,
                               interpret, deriv_lowprec, klims)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=32)
def _cwt_fused_bins_vjp_fn(wavelet_ref, n_up, n1, N, l1_norm, dtype,
                           interpret, deriv_lowprec, klims, bin_spec):
    """custom_vjp for the bin-output variant: forward = Pallas (Wx, k);
    backward = jax.vjp of the XLA Wx-only half-spectrum formulation —
    the bin plane is integer-valued and carries no tangent (matching the
    XLA autodiff convention for `round`)."""
    wavelet = wavelet_ref[0]

    def xla_ref(xh_re, xh_im, scales, inv_dt):
        return _cwt_half_xla(xh_re, xh_im, scales, inv_dt, wavelet, n_up,
                             n1, N, False, l1_norm, dtype)

    @jax.custom_vjp
    def f(xh_re, xh_im, scales, inv_dt):
        return _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                               n_up, n1, N, True, l1_norm, dtype,
                               interpret, deriv_lowprec, klims, bin_spec)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp((g[0], g[1]))

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=32)
def _cwt_fused_bins_direct_vjp_fn(wavelet_ref, n_up, n1, N, l1_norm, dtype,
                                  interpret, deriv_lowprec, klims, bin_spec,
                                  direct_T, kdtype):
    """custom_vjp for the zero-prep bins variant: forward = Pallas
    (Wx_full, k_full, padded layout); backward = jax.vjp of the XLA
    Wx-only formulation fed the [: na, off:off+N] slice of the Wx
    cotangent (the dummy tail rows / out-of-range columns are padding by
    contract — the scatter's adjoint puts exactly zero there, and the
    caller's Wx slice never reads them)."""
    wavelet = wavelet_ref[0]

    def xla_ref(xh_re, xh_im, scales, inv_dt):
        return _cwt_half_xla(xh_re, xh_im, scales, inv_dt, wavelet, n_up,
                             n1, N, False, l1_norm, dtype)

    @jax.custom_vjp
    def f(xh_re, xh_im, scales, inv_dt):
        return _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                               n_up, n1, N, True, l1_norm, dtype,
                               interpret, deriv_lowprec, klims, bin_spec,
                               direct_T, kdtype)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(args, g):
        from .fft import _factorize
        na = args[2].shape[0]
        off = n1 % _factorize(n_up)[0]
        gre = g[0][:na, off:off + N]
        gim = g[1][:na, off:off + N]
        _, vjp = jax.vjp(xla_ref, *args)
        return vjp((gre, gim))

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=32)
def _cwt_fused_bins2_direct_vjp_fn(wavelet_ref, n_up, n1, N, l1_norm,
                                   dtype, interpret, deriv_lowprec, klims,
                                   bin_spec, direct_T, kdtype, tiny):
    """custom_vjp for the WSST2 zero-prep bins variant: forward = Pallas
    (W_full, k_full); backward = jax.vjp of the XLA W-only formulation on
    the sliced W cotangent — identical contract to the first-order
    direct variant (the chirp-corrected k is integer-valued, no
    tangent)."""
    wavelet = wavelet_ref[0]

    def xla_ref(xh_re, xh_im, scales, inv_dt):
        return _cwt_half_xla(xh_re, xh_im, scales, inv_dt, wavelet, n_up,
                             n1, N, False, l1_norm, dtype)

    @jax.custom_vjp
    def f(xh_re, xh_im, scales, inv_dt):
        return _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                               n_up, n1, N, True, l1_norm, dtype,
                               interpret, deriv_lowprec, klims, bin_spec,
                               direct_T, kdtype, order2=tiny)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(args, g):
        from .fft import _factorize
        na = args[2].shape[0]
        off = n1 % _factorize(n_up)[0]
        _, vjp = jax.vjp(xla_ref, *args)
        return vjp((g[0][:na, off:off + N], g[1][:na, off:off + N]))

    f.defvjp(f_fwd, f_bwd)
    return f


def cwt_fused_bins2_direct(xh, scales_j, wavelet, n_up, n1, N, dt, l1_norm,
                           params, gamma, flipud, tiny, interpret=False,
                           deriv_lowprec=True, klims=None, T=1024,
                           kdtype='int16'):
    """Zero-prep fused WSST2: CWT + four VMEM-only auxiliary transforms
    + per-cell chirp regression + bin map in ONE kernel; returns
    (W_full, k_full, off) in the scatter's layout (same contract as
    `cwt_fused_bins_direct`). `tiny` regularizes the complex divides
    (matches models/ssq_cwt2._wsst2_rows, the XLA correctness twin)."""
    dtype = str(xh.re.dtype)
    scales = scales_j.reshape(-1)
    inv_dt = jnp.asarray(1.0, dtype) / jnp.asarray(dt, dtype)
    bin_spec = (tuple(sorted(params.items())), float(gamma), bool(flipud),
                params['mode'])
    f = _cwt_fused_bins2_direct_vjp_fn(
        (wavelet,), int(n_up), int(n1), int(N), bool(l1_norm), dtype,
        bool(interpret), bool(deriv_lowprec),
        klims if klims is None else tuple(klims), bin_spec, int(T),
        str(kdtype), float(tiny))
    Wre, Wim, k = f(xh.re, xh.im, scales, inv_dt)
    from .fft import _factorize
    off = n1 % _factorize(n_up)[0]
    return Complex(Wre, Wim), k, off


def cwt_fused_bins_direct(xh, scales_j, wavelet, n_up, n1, N, dt, l1_norm,
                          params, gamma, flipud, interpret=False,
                          deriv_lowprec=True, klims=None, T=1024,
                          kdtype='int16'):
    """Zero-prep fused CWT + phase + bin map: returns
    (Wx_full, k_full, off) in the SCATTER's layout — (na_pad, W) planes
    with na_pad = 32-rounded na, W = T-rounded output width, k in
    `kdtype` with -1 marking gamma-gated cells, dummy tail rows and
    out-of-range columns. Feed directly to
    `ops.ssq_pallas.scatter_kv_direct` (no pad/gather prep pass); the
    caller's Wx is the [:na, off:off+N] slice. 1D input only."""
    dtype = str(xh.re.dtype)
    scales = scales_j.reshape(-1)
    inv_dt = jnp.asarray(1.0, dtype) / jnp.asarray(dt, dtype)
    bin_spec = (tuple(sorted(params.items())), float(gamma), bool(flipud),
                params['mode'])
    f = _cwt_fused_bins_direct_vjp_fn(
        (wavelet,), int(n_up), int(n1), int(N), bool(l1_norm), dtype,
        bool(interpret), bool(deriv_lowprec),
        klims if klims is None else tuple(klims), bin_spec, int(T),
        str(kdtype))
    Wre, Wim, k = f(xh.re, xh.im, scales, inv_dt)
    from .fft import _factorize
    off = n1 % _factorize(n_up)[0]
    return Complex(Wre, Wim), k, off


def cwt_fused_bins_pallas(xh, scales_j, wavelet, n_up, n1, N, dt, l1_norm,
                          params, gamma, flipud, interpret=False,
                          deriv_lowprec=True, klims=None):
    """Fused CWT + phase transform + bin map: returns (Wx, k) where `k`
    is the int32 reassignment bin plane (-1 = gamma-gated). The
    derivative rows never leave VMEM — at the benchmark shape this
    avoids writing + re-reading two (na, N) float planes between the CWT
    and scatter kernels and moves the phase arithmetic onto the CWT
    kernel's idle VPU. Feed `k` to `ops.ssq_pallas.scatter_kv_pallas`.
    Differentiable in the spectrum (custom VJP; k carries no tangent)."""
    dtype = str(xh.re.dtype)
    scales = scales_j.reshape(-1)
    inv_dt = jnp.asarray(1.0, dtype) / jnp.asarray(dt, dtype)
    bin_spec = (tuple(sorted(params.items())), float(gamma), bool(flipud),
                params['mode'])
    f = _cwt_fused_bins_vjp_fn(
        (wavelet,), int(n_up), int(n1), int(N), bool(l1_norm), dtype,
        bool(interpret), bool(deriv_lowprec),
        klims if klims is None else tuple(klims), bin_spec)
    Wre, Wim, k = f(xh.re, xh.im, scales, inv_dt)
    return Complex(Wre, Wim), k


def cwt_fused_pallas(xh, scales_j, wavelet, n_up, n1, N, dt, derivative,
                     l1_norm, interpret=False, deriv_lowprec=False,
                     klims=None):
    """Fused CWT rows from the HALF spectrum `xh` (Complex, length
    n_up//2+1). Returns (Wx, dWx or None), unpadded natural order.
    Both pipelines (Wx and its spectral derivative) run in ONE kernel,
    sharing the synthesized filterbank row and resident constants.
    Differentiable (custom VJP via the XLA half-spectrum adjoint)."""
    dtype = str(xh.re.dtype)
    scales = scales_j.reshape(-1)
    inv_dt = jnp.asarray(1.0, dtype) / jnp.asarray(dt, dtype)
    f = _cwt_fused_vjp_fn((wavelet,), int(n_up), int(n1), int(N),
                          bool(derivative), bool(l1_norm), dtype,
                          bool(interpret), bool(deriv_lowprec),
                          klims if klims is None else tuple(klims))
    outs = f(xh.re, xh.im, scales, inv_dt)
    Wx = Complex(outs[0], outs[1])
    dWx = Complex(outs[2], outs[3]) if derivative else None
    return Wx, dWx
