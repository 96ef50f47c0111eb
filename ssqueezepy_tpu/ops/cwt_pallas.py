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

__all__ = ['cwt_fused_pallas', 'cwt_pallas_applicable']

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
                 dtype, na_mod=None, deriv_lowprec=False):
    # k1 is processed in halves to bound VMEM temporaries
    # (stage-1/twiddle/stage-2 intermediates halve)
    nh = 2 if f1 % 16 == 0 else 1
    hk1 = f1 // nh

    def kernel(scale_r, invdt_r, xi_r, xhre_r, xhim_r, wre_r, wim_r,
               tre_r, tim_r, w2re_r, w2im_r, *outs):
        # outs: (Wre, Wim[, dre, dim]) when deriv else (Wre, Wim)
        #
        # The whole pipeline runs in TRANSPOSED layout (frequency digit m2
        # on sublanes): constants arrive pre-transposed from trace time,
        # stage 1 is A^T = P^T @ W^T, stage 2 is E^T = w2^T @ At^T, and
        # E^T lands directly in the output's (k2, k1) layout — no
        # in-kernel transposes (8 per grid step in the row-major
        # formulation; Mosaic lowers those through shuffles that rival the
        # dot cost).
        i = pl.program_id(0)
        if na_mod is None:           # grid = (na,): 1D signal
            scale = scale_r[i, 0]
            xh_re, xh_im = xhre_r[:], xhim_r[:]
        else:                        # grid = (B*na,): batched signal
            scale = scale_r[jax.lax.rem(i, na_mod), 0]
            xh_re, xh_im = xhre_r[0], xhim_r[0]
        xi = xi_r[:]                                   # (f2, rows0)
        # xh arrives pre-masked (pad zeros + Nyquist/2 folded in outside)
        psih = wavelet_fn(scale * xi, xp=jnp)
        if not l1_norm:
            psih = psih * jnp.sqrt(scale)
        Pre = psih * xh_re                             # (f2, rows0)
        Pim = psih * xh_im

        w2re, w2im = w2re_r[:], w2im_r[:]              # (k2span, f2)

        def pipeline(Pre, Pim, out_re_r, out_im_r, dot):
            for h in range(nh):
                sl = slice(h * hk1, (h + 1) * hk1)
                # stage 1: A^T[m2, k1] = sum_m1 P^T[m2, m1] W^T[m1, k1]
                wre, wim = wre_r[:, sl], wim_r[:, sl]  # (rows0, hk1)
                Are = dot(Pre, wre) - dot(Pim, wim)    # (f2, hk1)
                Aim = dot(Pim, wre) + dot(Pre, wim)
                # twiddle W_n^{k1 m2} (transposed constant)
                tre, tim = tre_r[:, sl], tim_r[:, sl]  # (f2, hk1)
                Atre = Are * tre - Aim * tim
                Atim = Are * tim + Aim * tre
                # stage 2 + natural (k2, k1) layout: n = k1 + f1*k2
                out_re_r[0, :, sl] = dot(w2re, Atre) - dot(w2im, Atim)
                out_im_r[0, :, sl] = dot(w2re, Atim) + dot(w2im, Atre)

        pipeline(Pre, Pim, outs[0], outs[1], _dot)
        if deriv:
            # spectral derivative: multiply spectrum by 1j * xi / dt
            xid = xi * invdt_r[0, 0]
            pipeline(-xid * Pim, xid * Pre, outs[2], outs[3],
                     _dot_lo if deriv_lowprec else _dot)

    return kernel


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
                              'deriv_lowprec'))
def _cwt_fused_call(xh_re, xh_im, scales, inv_dt, wavelet_ref, n_up, n1, N,
                    deriv, l1_norm, dtype, interpret=False,
                    deriv_lowprec=False):
    # NOTE: a 3-stage in-VMEM variant (4x fewer MXU MACs) is blocked by
    # Mosaic's reshape constraint — any (lane-dim-crossing) reshape or
    # >2D dot flattening fails to lower ("tpu.reshape vector<...>"); the
    # per-m3-sliced hybrids measured net-neutral. Balanced 2-stage it is.
    return _cwt_fused_call2(xh_re, xh_im, scales, inv_dt, wavelet_ref,
                            n_up, n1, N, deriv, l1_norm, dtype, interpret,
                            deriv_lowprec)


def _cwt_fused_call2(xh_re, xh_im, scales, inv_dt, wavelet_ref, n_up, n1, N,
                     deriv, l1_norm, dtype, interpret=False,
                     deriv_lowprec=False):
    from .fft import _factorize, _dft_matrix_np, _twiddle_np
    wavelet = wavelet_ref[0]
    f1, f2 = _factorize(n_up)
    prefix = n_up // 2 + 1
    rows0 = -(-prefix // f2)
    # output digit range: time index n = k1 + f1*k2 (engine convention),
    # so n in [n1, n1+N) restricts k2 to [n1 // f1, ceil((n1+N) / f1))
    k2lo = n1 // f1
    k2hi = -(-(n1 + N) // f1)
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
    w2re = np.ascontiguousarray(w2re[k2lo:k2hi]).astype(dt_s)  # (span, f2)
    w2im = np.ascontiguousarray(w2im[k2lo:k2hi]).astype(dt_s)

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
    if batched:
        xh_spec = pl.BlockSpec((1, f2, rows0), lambda i: (i // na, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        xh_spec = const((f2, rows0))
    in_specs = [
        pl.BlockSpec((na, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        const((f2, rows0)), xh_spec, xh_spec,
        const((rows0, f1)), const((rows0, f1)),
        const((f2, f1)), const((f2, f1)),
        const((k2span, f2)), const((k2span, f2)),
    ]
    n_out = 4 if deriv else 2
    out_spec = pl.BlockSpec((1, k2span, f1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(wavelet.fn, rows0, f1, f2, k2span, deriv,
                          l1_norm, jnp.dtype(dt_s),
                          na_mod=(na if batched else None),
                          deriv_lowprec=deriv_lowprec)
    args = [scales.reshape(na, 1).astype(dt_s),
            jnp.asarray(inv_dt, dt_s).reshape(1, 1),
            jnp.asarray(xi_blk, dt_s), xr.astype(dt_s), xi_.astype(dt_s),
            jnp.asarray(wre), jnp.asarray(wim),
            jnp.asarray(tre), jnp.asarray(tim),
            jnp.asarray(w2re), jnp.asarray(w2im)]

    outs = pl.pallas_call(
        kernel,
        grid=(B * na,),
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((B * na, k2span, f1),
                                        dt_s),) * n_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    off = n1 - k2lo * f1
    if batched:
        return tuple(o.reshape(B, na, out_w)[..., off:off + N]
                     for o in outs)
    return tuple(o.reshape(na, out_w)[:, off:off + N] for o in outs)


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
                      interpret, deriv_lowprec=False):
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
                               interpret, deriv_lowprec)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def cwt_fused_pallas(xh, scales_j, wavelet, n_up, n1, N, dt, derivative,
                     l1_norm, interpret=False, deriv_lowprec=False):
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
                          bool(interpret), bool(deriv_lowprec))
    outs = f(xh.re, xh.im, scales, inv_dt)
    Wx = Complex(outs[0], outs[1])
    dWx = Complex(outs[2], outs[3]) if derivative else None
    return Wx, dWx
