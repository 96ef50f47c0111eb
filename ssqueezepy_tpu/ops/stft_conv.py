# -*- coding: utf-8 -*-
"""STFT as full-length FFT convolution (hop_len=1).

The framed formulation (buffer -> window -> rfft over frames; reference
_stft.py:127-147) costs a large strided gather plus a short-axis FFT with
bad TPU layouts (~45 ms of the 160k benchmark). At hop_len=1 — the only
hop synchrosqueezing supports — each STFT row is EXACTLY a
cross-correlation of the padded signal with a fixed kernel

    g_k[m] = c_k * v[m] * exp(-2pi i k m / n_fft),

(v = the frame-rolled window, c_k the modulation phase), so the whole
transform is one full-length FFT + a (n_rows, Np2) spectral multiply + a
batched 2-stage matmul IFFT — the same machinery as the CWT, with the
filterbank PRECOMPUTED (host numpy, cached) instead of synthesized.
Bit-equivalent to the framed path up to FFT rounding (asserted in tests).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .complexlib import Complex
from .fft import fft, ifft, _factorize

__all__ = ['stft_conv_applicable', 'stft_conv', 'stft_pallas_rows']


def _next_fft_len(n):
    best = 1 << (n - 1).bit_length()
    for mult in (3, 5, 9, 15):
        a = 1
        while mult * a < n:
            a <<= 1
        if mult * a >= n:
            best = min(best, mult * a)
    return best


def stft_conv_applicable(hop_len, backend_name):
    return hop_len == 1 and backend_name == 'tpu'


@functools.lru_cache(maxsize=8)
def _conv_filterbank(win_key, n_fft, Np2, modulated):
    """H[k] spectra such that Sx[k] = ifft(H[k] * fft(xp)); (n_rows, Np2)
    split re/im float64->float32 later. Host numpy, lru-cached."""
    from ..models.stft import _WINDOW_CACHE
    window, diff_window = _WINDOW_CACHE[win_key]
    n_rows = n_fft // 2 + 1

    if modulated:
        s20 = int(np.ceil(n_fft / 2))
        s21 = s20 - 1 if (n_fft % 2 == 1) else s20
        v = np.roll(np.fft.ifftshift(window), s21)
        vd = (np.roll(np.fft.ifftshift(diff_window), s21)
              if diff_window is not None else None)
        ck = np.exp(2j * np.pi * np.arange(n_rows) * s21 / n_fft)
    else:
        v, vd = window, diff_window
        ck = np.ones(n_rows)

    m = np.arange(n_fft)
    cis = np.exp(-2j * np.pi * np.outer(np.arange(n_rows), m) / n_fft)

    def build(vv):
        g = np.zeros((n_rows, Np2), np.complex128)
        g[:, :n_fft] = (ck[:, None] * cis) * vv
        # corr[j] = sum_m g[m] x[j+m]  ->  H = conj(fft(conj(g)))
        return np.conj(np.fft.fft(np.conj(g), axis=-1))

    H = build(v)
    Hd = build(vd) if vd is not None else None
    return H, Hd


# banded-support tail-mass budget: per row, the dropped spectrum rows'
# total |H| L1 mass stays under this fraction of the row's full L1
# mass, so the truncation error in Sx is bounded by ~1e-7 of the
# row's reachable magnitude — at the bf16x3 dot rounding, an order
# below the kernel's own arithmetic error (asserted vs the unbanded
# kernel in tests/test_stft_band.py). The DPSS default window's
# sidelobe floor makes the surviving band ~10x narrower than the full
# stage-1 K at the benchmark shape.
_BAND_EPS_MASS = 1e-7


def _band_geometry(mag, rows0, f2):
    """Per-row contiguous band (r0 tuple, br) of a (n_rows, Np2) |H|
    magnitude matrix — the shared geometry of `_band_plan` (single
    window) and `_band_plan_bank` (five-window max). Rows drop
    outside-in from each row's peak while the dropped L1 mass stays
    under `_BAND_EPS_MASS`; starts 8-aligned, one uniform width.
    Returns None when the band would not pay (> rows0 / 2)."""
    magr = mag.reshape(-1, rows0, f2)
    msum = magr.sum(-1)                                # (n_rows, rows0)
    mmax = magr.max(-1)
    n_rows = msum.shape[0]
    r0 = np.zeros(n_rows, np.int64)
    br = 8
    for k in range(n_rows):
        # offsets unwrapped around the peak row (bands are contiguous
        # mod rows0); drop rows outside-in while the dropped mass fits
        c = int(mmax[k].argmax())
        off = ((np.arange(rows0) - c + rows0 // 2) % rows0) - rows0 // 2
        drop_order = np.argsort(-np.abs(off))
        cum = np.cumsum(msum[k][drop_order])
        ndrop = int(np.searchsorted(cum, _BAND_EPS_MASS * cum[-1]))
        keep_off = off[drop_order[ndrop:]]
        lo = (c + int(keep_off.min())) % rows0
        lo8 = (lo // 8) * 8                            # sublane-align
        r0[k] = lo8
        br = max(br, int(keep_off.max() - keep_off.min()) + 1
                 + (lo - lo8))
    br = min(-(-br // 8) * 8, rows0)
    if br > rows0 // 2:
        return None
    return tuple(int(v) for v in r0), int(br)


@functools.lru_cache(maxsize=8)
def _band_plan(win_key, n_fft, Np2, modulated):
    """Per-row banded support of the precomputed filterbank.

    Window spectra are concentrated around each row's center bin, so
    the stage-1 contraction over the (rows0, f2) spectrum block only
    needs a contiguous band of rows per STFT row. Rows are dropped
    outside-in (largest offset from the peak first) while their
    cumulative L1 mass stays under `_BAND_EPS_MASS` of the row total.
    Returns ``(r0, br)`` — per-row band starts (multiples of 8, indices
    into the wrap-extended ``(rows0+br, f2)`` spectrum block) and the
    uniform band row count — or ``None`` when the band would not pay
    (more than half the full contraction, e.g. slowly-decaying custom
    windows)."""
    from .fft import _factorize
    factors = _factorize(Np2)
    if len(factors) != 2:
        return None
    f2 = factors[1]
    rows0 = Np2 // f2
    H, Hd = _conv_filterbank(win_key, n_fft, Np2, modulated)
    mag = np.abs(H)
    if Hd is not None:
        mag = np.maximum(mag, np.abs(Hd))
    return _band_geometry(mag, rows0, f2)


@functools.lru_cache(maxsize=8)
def _conv_filterbank_packed(win_key, n_fft, Np2, modulated, dtype):
    """Band-packed filterbank tables + band-shift phase (host numpy).

    Returns ``(Hbre, Hbim, Hdbre, Hdbim, ere, eim)`` with ``Hb`` of
    shape (n_rows, br, f2) — row k's spectrum rows
    ``[(r0[k] + r') % rows0 for r' in range(br)]`` — and ``e`` of shape
    (n_rows, 1, f1) = exp(+2pi i p r0[k] / f1): the stage-1 DFT matrix
    is r-periodic, so shifting its window by r0 factors into this phase
    on the surviving output digit p, applied as one broadcast complex
    multiply on the kernel's output block. One canonical w1[:, :br]
    then serves every row. Returns ``None`` when banding doesn't pay."""
    from .fft import _factorize
    plan = _band_plan(win_key, n_fft, Np2, modulated)
    if plan is None:
        return None
    r0, br = plan
    f1, f2 = _factorize(Np2)
    rows0 = Np2 // f2
    H, Hd = _conv_filterbank(win_key, n_fft, Np2, modulated)
    n_rows = H.shape[0]
    r0a = np.asarray(r0, np.int64)
    take = (r0a[:, None] + np.arange(br)) % rows0      # (n_rows, br)
    Hr = H.reshape(n_rows, rows0, f2)
    Hb = np.take_along_axis(Hr, take[:, :, None], axis=1)
    if Hd is not None:
        Hdb = np.take_along_axis(Hd.reshape(n_rows, rows0, f2),
                                 take[:, :, None], axis=1)
    else:
        Hdb = Hb
    e = np.exp((2j * np.pi / f1)
               * np.outer(r0a, np.arange(f1)))[:, None, :]
    return (Hb.real.astype(dtype), Hb.imag.astype(dtype),
            Hdb.real.astype(dtype), Hdb.imag.astype(dtype),
            e.real.astype(dtype), e.imag.astype(dtype))


def _device_filterbank_banded(win_key, n_fft, Np2, modulated, dtype):
    """Device-side banded tables: ``(tables6, (r0, br))`` or ``None``
    when banding doesn't pay. ``tables6`` ride as jit ARGUMENTS (same
    contract as `_device_filterbank`)."""
    from ..configs import get_config
    if not get_config().stft_band:
        return None
    plan = _band_plan(win_key, n_fft, Np2, modulated)
    if plan is None:
        return None
    key = ('banded', win_key, n_fft, Np2, modulated, dtype)
    hit = _FB_DEV_CACHE.get(key)
    if hit is None:
        packed = _conv_filterbank_packed(win_key, n_fft, Np2, modulated,
                                         dtype)
        hit = tuple(jnp.asarray(a) for a in packed)
        _FB_DEV_CACHE[key] = hit
    return hit, plan


_BANK_CACHE = {}


def _bank_key(bank):
    """Register a (n_w, n_fft) float64 window bank; returns a hashable
    key for the lru-cached spectra builders below."""
    bank = np.ascontiguousarray(np.asarray(bank, np.float64))
    key = ('bank', hash(bank.tobytes()), bank.shape)
    _BANK_CACHE[key] = bank
    return key


@functools.lru_cache(maxsize=8)
def _conv_filterbank_multi(bank_key, n_fft, Np2, modulated, dtype):
    """H spectra for a BANK of windows sharing one modulation geometry
    (the `ssq_stft2` five-window family): returns (Hre, Him) numpy
    (n_w * n_rows, Np2) `dtype`, window-major. Built one window at a
    time so the complex128 intermediate never exceeds one window."""
    bank = _BANK_CACHE[bank_key]
    n_rows = n_fft // 2 + 1

    if modulated:
        s20 = int(np.ceil(n_fft / 2))
        s21 = s20 - 1 if (n_fft % 2 == 1) else s20
        vv = np.roll(np.fft.ifftshift(bank, axes=-1), s21, axis=-1)
        ck = np.exp(2j * np.pi * np.arange(n_rows) * s21 / n_fft)
    else:
        vv = bank
        ck = np.ones(n_rows)

    m = np.arange(n_fft)
    cis = np.exp(-2j * np.pi * np.outer(np.arange(n_rows), m) / n_fft)
    n_w = vv.shape[0]
    Hre = np.empty((n_w * n_rows, Np2), dtype)
    Him = np.empty((n_w * n_rows, Np2), dtype)
    for i in range(n_w):
        g = np.zeros((n_rows, Np2), np.complex128)
        g[:, :n_fft] = (ck[:, None] * cis) * vv[i]
        H = np.conj(np.fft.fft(np.conj(g), axis=-1))
        Hre[i * n_rows:(i + 1) * n_rows] = H.real
        Him[i * n_rows:(i + 1) * n_rows] = H.imag
    return Hre, Him


def _device_filterbank_multi(bank_key, n_fft, Np2, modulated, dtype):
    key = ('multi', bank_key, n_fft, Np2, modulated, dtype)
    hit = _FB_DEV_CACHE.get(key)
    if hit is None:
        Hre, Him = _conv_filterbank_multi(bank_key, n_fft, Np2, modulated,
                                          dtype)
        hit = (jnp.asarray(Hre), jnp.asarray(Him))
        _FB_DEV_CACHE[key] = hit
    return hit


@functools.lru_cache(maxsize=8)
def _band_plan_bank(bank_key, n_fft, Np2, modulated):
    """Shared per-row banded support for a window BANK (the FSST2
    five-window family): the `_band_plan` geometry computed on the
    rowwise MAX |H| over all bank members, so one (r0, br) serves every
    window. Returns ((r0,), br) or None when banding doesn't pay."""
    from .fft import _factorize
    factors = _factorize(Np2)
    if len(factors) != 2:
        return None
    f2 = factors[1]
    rows0 = Np2 // f2
    Hre, Him = _conv_filterbank_multi(bank_key, n_fft, Np2, modulated,
                                      'float64')
    n_w = len(_BANK_CACHE[bank_key])
    n_rows = n_fft // 2 + 1
    mag = np.abs(Hre + 1j * Him).reshape(n_w, n_rows, Np2).max(0)
    return _band_geometry(mag, rows0, f2)


@functools.lru_cache(maxsize=8)
def _fsst2_tables_packed(bank_key, n_fft, Np2, modulated, dtype):
    """Band-packed five-window FSST2 tables: returns
    (H list of (n_w, n_rows, br, f2) re/im pairs flattened window-major,
    ere, eim) as numpy, or None when banding doesn't pay. The band-shift
    phase tables come back COLUMN-shaped (n_rows, f1, 1) — the kernels
    apply them on the stage-1 block's sublane axis."""
    from .fft import _factorize
    plan = _band_plan_bank(bank_key, n_fft, Np2, modulated)
    if plan is None:
        return None
    r0, br = plan
    f1, f2 = _factorize(Np2)
    rows0 = Np2 // f2
    Hre, Him = _conv_filterbank_multi(bank_key, n_fft, Np2, modulated,
                                      dtype)
    n_w = len(_BANK_CACHE[bank_key])
    n_rows = n_fft // 2 + 1
    r0a = np.asarray(r0, np.int64)
    take = (r0a[:, None] + np.arange(br)) % rows0      # (n_rows, br)
    packed = []
    for i in range(n_w):
        for arr in (Hre, Him):
            Hr = arr[i * n_rows:(i + 1) * n_rows].reshape(n_rows, rows0,
                                                          f2)
            packed.append(np.take_along_axis(Hr, take[:, :, None],
                                             axis=1))
    e = np.exp((2j * np.pi / f1) * np.outer(r0a, np.arange(f1)))
    packed.append(e.real.astype(dtype).reshape(n_rows, f1, 1))
    packed.append(e.imag.astype(dtype).reshape(n_rows, f1, 1))
    return tuple(packed), plan


def _device_fsst2_tables(bank_key, n_fft, Np2, modulated, dtype):
    key = ('fsst2', bank_key, n_fft, Np2, modulated, dtype)
    hit = _FB_DEV_CACHE.get(key)
    if hit is None:
        packed = _fsst2_tables_packed(bank_key, n_fft, Np2, modulated,
                                      dtype)
        if packed is None:
            _FB_DEV_CACHE[key] = None
            return None
        arrs, plan = packed
        hit = (tuple(jnp.asarray(a) for a in arrs), plan)
        _FB_DEV_CACHE[key] = hit
    return hit


@functools.lru_cache(maxsize=16)
def _stft_conv_jit(shape, dtype, Np2, N_out, derivative, padtype,
                   padlength):
    """Cached jit: raw signal + filterbank args -> Sx (n_rows, N_out)
    [, dSx]. The filterbank rides as ARGUMENTS (device arrays cached
    separately) — baked-in jnp constants of this size make the compile
    payload hundreds of MB."""
    from .pad import padsignal
    is_2d = (len(shape) == 2)

    def run(xj, fs, Hre, Him, Hdre, Hdim):
        xj = xj.astype(dtype)
        xp = padsignal(xj, padtype, padlength=padlength)
        xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2, imag_zero=True)
        if is_2d:
            xh = Complex(xh.re[:, None], xh.im[:, None])
        # broadcast row multiply; out_range trims the IFFT to [0, N_out)
        def corr(hre, him):
            pr = hre * xh.re - him * xh.im
            pi = hre * xh.im + him * xh.re
            return ifft(Complex(pr, pi), n=Np2, out_range=(0, N_out))
        Sx = corr(Hre, Him)
        if derivative:
            dSx = corr(Hdre, Hdim)
            dSx = Complex(dSx.re * fs, dSx.im * fs)
            return Sx, dSx
        return Sx, None
    return jax.jit(run)


# ---------------------------------------------------------------------------
# Pallas table kernel: per STFT row, the spectral multiply + both matmul
# IFFT stages stay VMEM-resident (same structure as ops/cwt_pallas.py,
# with the filterbank READ from the precomputed table instead of
# synthesized, since window spectra have no closed form).
# ---------------------------------------------------------------------------
def _sdot(a, b):
    dn = (((1,), (0,)), ((), ()))
    kw = dict(dimension_numbers=dn, precision=jax.lax.Precision.DEFAULT,
              preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(a_hi, b_hi, **kw) +
            jax.lax.dot_general(a_hi, b_lo, **kw) +
            jax.lax.dot_general(a_lo, b_hi, **kw))


def _sdot_lo(a, b):
    """Single-pass bf16 dot (1/3 the MXU passes of `_sdot`): for the
    FSST2 auxiliary window transforms, which only feed the chirp-rate
    correction of the reassignment BIN — the +-1-bin criterion (same
    argument as ops/cwt_pallas._dot_lo)."""
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               dimension_numbers=dn,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _make_stft_kernel(rows0, f1, f2, k2span, deriv, bin_spec=None,
                      direct=None, band=None):
    # direct (zero-prep) bins mode: (N_valid, n_live, kdtype) — emit the
    # k plane scatter-ready (-1 on cols >= N_valid and on the dummy tail
    # rows i >= n_live that pad the plane to the scatter's 32-row
    # granularity), cast to kdtype
    #
    # band mode: `rows0` IS the band row count br; the H/Hd row blocks
    # arrive band-packed, the spectrum block is wrap-extended and
    # dynamically sliced at the row's r0 (SMEM), and the band shift is
    # undone by one broadcast complex multiply with the per-row phase
    # e[p] = exp(+2pi i p r0 / f1) on the output block.
    nh = 2 if f1 % 16 == 0 else 1
    hk1 = f1 // nh

    def kernel(fs_r, *refs):
        idx = 0
        if bin_spec is not None:
            sfs_r = refs[0]
            idx = 1
        if band is not None:
            r0_r = refs[idx]
            idx += 1
        (xhre_r, xhim_r, hre_r, him_r, hdre_r, hdim_r,
         wre_r, wim_r, tre_r, tim_r, w2re_r, w2im_r) = refs[idx:idx + 12]
        idx += 12
        if band is not None:
            ere_r, eim_r = refs[idx:idx + 2]
            idx += 2
        outs = refs[idx:]
        if band is None:
            xre, xim = xhre_r[:], xhim_r[:]            # (rows0, f2)
        else:
            # _band_plan 8-aligns every r0; Mosaic needs the proof
            # spelled out for the dynamic sublane load
            r0v = pl.multiple_of(r0_r[pl.program_id(0), 0], 8)
            xre = xhre_r[pl.ds(r0v, rows0), :]         # (br, f2)
            xim = xhim_r[pl.ds(r0v, rows0), :]
        w2re, w2im = w2re_r[:], w2im_r[:]

        def half(Pre, Pim, scale, h):
            sl = slice(h * hk1, (h + 1) * hk1)
            wre, wim = wre_r[sl], wim_r[sl]
            Are = _sdot(wre, Pre) - _sdot(wim, Pim)
            Aim = _sdot(wre, Pim) + _sdot(wim, Pre)
            tre, tim = tre_r[sl], tim_r[sl]
            Atre = Are * tre - Aim * tim
            Atim = Are * tim + Aim * tre
            if band is not None:
                # band-shift phase e[p] rides the stage-1 output digit p
                # = the ROW of the (hk1, f2) block, so it applies as a
                # column multiply BEFORE the stage-2 dot (w2 contracts
                # over f2, not p) — a lane-offset row slice of e here
                # instead would need an unsupported misaligned-layout
                # broadcast (measured: Mosaic 'Invalid input layout')
                ere = ere_r[0][sl, :]                  # (hk1, 1)
                eim = eim_r[0][sl, :]
                Atre, Atim = (Atre * ere - Atim * eim,
                              Atre * eim + Atim * ere)
            Ere = _sdot(Atre, w2re) - _sdot(Atim, w2im)
            Eim = _sdot(Atre, w2im) + _sdot(Atim, w2re)
            return Ere.T * scale, Eim.T * scale, sl

        hre, him = hre_r[0], him_r[0]                  # (rows0, f2)
        Pre = hre * xre - him * xim
        Pim = hre * xim + him * xre
        if bin_spec is None:
            for h in range(nh):
                Sre, Sim, sl = half(Pre, Pim, 1.0, h)
                outs[0][0, :, sl] = Sre
                outs[1][0, :, sl] = Sim
            if deriv:
                hdre, hdim = hdre_r[0], hdim_r[0]
                Dp_re = hdre * xre - hdim * xim
                Dp_im = hdre * xim + hdim * xre
                for h in range(nh):
                    Dre, Dim, sl = half(Dp_re, Dp_im, fs_r[0, 0], h)
                    outs[2][0, :, sl] = Dre
                    outs[3][0, :, sl] = Dim
        else:
            # bin-output variant: the window-derivative rows never leave
            # VMEM — the phase transform + bin map run on the freshly
            # computed half blocks (with the row's Sfs offset) and only
            # the int32 bin plane is written (-1 = gamma-gated)
            from .ssq_pallas import _phase_bin_math
            params, gamma, flipud, mode = bin_spec
            i = pl.program_id(0)
            sfs = sfs_r[i, 0]
            hdre, hdim = hdre_r[0], hdim_r[0]
            Dp_re = hdre * xre - hdim * xim
            Dp_im = hdre * xim + hdim * xre
            for h in range(nh):
                Sre, Sim, sl = half(Pre, Pim, 1.0, h)
                outs[0][0, :, sl] = Sre
                outs[1][0, :, sl] = Sim
                Dre, Dim, _ = half(Dp_re, Dp_im, fs_r[0, 0], h)
                k, valid = _phase_bin_math(Sre, Sim, Dre, Dim,
                                           dict(params), gamma, flipud,
                                           mode, sfs=sfs)
                if direct is None:
                    outs[2][0, :, sl] = jnp.where(valid, k, -1)
                else:
                    N_valid, n_live, kdtype = direct
                    lin = (jax.lax.broadcasted_iota(
                               jnp.int32, k.shape, 0) * f1
                           + jax.lax.broadcasted_iota(
                               jnp.int32, k.shape, 1) + h * hk1)
                    ok = valid & (lin < N_valid) & (i < n_live)
                    outs[2][0, :, sl] = jnp.where(ok, k, -1) \
                        .astype(kdtype)

    return kernel


def stft_pallas_rows(xh, fs, Hre, Him, Hdre, Hdim, Np2, N_out,
                     derivative, interpret=False, bin_spec=None,
                     sfs=None, direct_T=None, kdtype='int16',
                     band=None, etables=None):
    """Table-kernel STFT rows from a PRECOMPUTED full-length spectrum:
    `xh` Complex (Np2,), `H*` row tables (n_rows, Np2). Returns
    (Sx[, dSx]) — or (Sx, k) when `bin_spec` is set (phase+bin map
    fused in-kernel; `sfs` per-row numpy Sfs values). Traceable — the
    per-shard entry for row-sharded ssq_stft, and the core of the
    single-signal jit below.

    `direct_T` (bins mode only): emit the scatter's exact layout —
    rows padded to a multiple of 32 (dummy rows recompute the last H
    row, masked k = -1), width padded to a multiple of `direct_T`
    (cols >= N_out masked k = -1), k cast to `kdtype`. Returns the FULL
    (na_pad, W) planes for `ops.ssq_pallas.scatter_kv_direct` — callers
    slice Sx to [:n_rows, :N_out].

    `band` = (r0, br) from `_band_plan` (with `etables` = (ere, eim)
    phase tables): the H/Hd tables must then be the BAND-PACKED
    (n_rows, br, f2) arrays from `_conv_filterbank_packed`; stage 1
    contracts only br spectrum rows per STFT row (~10x less table
    traffic and stage-1 compute at the benchmark shape)."""
    from .fft import _dft_matrix_np, _twiddle_np
    f1, f2 = _factorize(Np2)
    rows0 = Np2 // f2
    kb = rows0 if band is None else int(band[1])
    k2lo = 0
    k2hi = -(-N_out // f1)
    if direct_T is not None:
        assert bin_spec is not None
        while (k2hi * f1) % direct_T:
            k2hi += 1
    k2span = k2hi - k2lo
    dt_s = str(xh.re.dtype)
    out_w = k2span * f1
    n_rows = Hre.shape[0]
    na_pad = (-(-n_rows // 32) * 32 if direct_T is not None else n_rows)

    wre, wim = _dft_matrix_np(f1, +1, 'float64')
    # banded: w1 is r-periodic, so one canonical [:, :br] slice serves
    # every row's shifted band (the shift phase rides in `etables`)
    wre = (wre[:, :kb] / Np2).astype(dt_s)
    wim = (wim[:, :kb] / Np2).astype(dt_s)
    tre, tim = _twiddle_np(Np2, f1, f2, +1, 'float64')
    tre, tim = tre.astype(dt_s), tim.astype(dt_s)
    w2re, w2im = _dft_matrix_np(f2, +1, 'float64')
    k2rows = np.arange(k2lo, k2hi) % f2    # periodic: direct_T extends
    w2re = np.ascontiguousarray(w2re[k2rows].T).astype(dt_s)
    w2im = np.ascontiguousarray(w2im[k2rows].T).astype(dt_s)

    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM)
    # dummy tail rows (direct mode) recompute the last table row — the
    # kernel masks their k to -1; the tables are never padded
    rmap = ((lambda i: (i, 0, 0)) if direct_T is None else
            (lambda i: (jnp.minimum(i, n_rows - 1), 0, 0)))
    row = pl.BlockSpec((1, kb, f2), rmap, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM)]
    args = [jnp.asarray(fs).reshape(1, 1).astype(dt_s)]
    if bin_spec is not None:
        in_specs.append(pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        # sfs may be a trace-time constant (tuple/numpy) or a traced
        # array (row-sharded ssq_stft passes its shard's block)
        sfs_a = jnp.asarray(sfs, dt_s).reshape(n_rows, 1)
        if na_pad != n_rows:
            sfs_a = jnp.pad(sfs_a, ((0, na_pad - n_rows), (0, 0)),
                            mode='edge')
        args.append(sfs_a)
    if band is not None:
        in_specs.append(pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        r0_a = jnp.asarray(np.asarray(band[0], np.int32)
                           .reshape(n_rows, 1))
        if na_pad != n_rows:
            r0_a = jnp.pad(r0_a, ((0, na_pad - n_rows), (0, 0)),
                           mode='edge')
        args.append(r0_a)
    xh_rows = rows0 + (0 if band is None else kb)
    in_specs += [
        const((xh_rows, f2)), const((xh_rows, f2)),
        row, row, row, row,
        const((f1, kb)), const((f1, kb)),
        const((f1, f2)), const((f1, f2)),
        const((f2, k2span)), const((f2, k2span)),
    ]
    if bin_spec is not None:
        out_dts = (dt_s, dt_s,
                   kdtype if direct_T is not None else 'int32')
    elif derivative:
        out_dts = (dt_s,) * 4
    else:
        out_dts = (dt_s,) * 2
    out_spec = pl.BlockSpec((1, k2span, f1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = _make_stft_kernel(
        kb, f1, f2, k2span, derivative, bin_spec=bin_spec,
        direct=(None if direct_T is None else (N_out, n_rows, kdtype)),
        band=(None if band is None else int(band[1])))
    xre_b = xh.re.reshape(rows0, f2)
    xim_b = xh.im.reshape(rows0, f2)
    if band is not None:
        # wrap-extend the spectrum block so no band straddles row 0
        xre_b = jnp.concatenate([xre_b, xre_b[:kb]], 0)
        xim_b = jnp.concatenate([xim_b, xim_b[:kb]], 0)
    args += [xre_b, xim_b,
             Hre.reshape(n_rows, kb, f2),
             Him.reshape(n_rows, kb, f2),
             Hdre.reshape(n_rows, kb, f2) if derivative else
             Hre.reshape(n_rows, kb, f2),
             Hdim.reshape(n_rows, kb, f2) if derivative else
             Him.reshape(n_rows, kb, f2),
             jnp.asarray(wre), jnp.asarray(wim),
             jnp.asarray(tre), jnp.asarray(tim),
             jnp.asarray(w2re), jnp.asarray(w2im)]
    if band is not None:
        # e as a per-row COLUMN (n_rows, f1, 1): the kernel applies it on
        # the stage-1 block's sublane axis (see `half`)
        erow = pl.BlockSpec((1, f1, 1), rmap, memory_space=pltpu.VMEM)
        in_specs += [erow, erow]
        args += [etables[0].reshape(n_rows, f1, 1),
                 etables[1].reshape(n_rows, f1, 1)]
    outs = pl.pallas_call(
        kernel,
        grid=(na_pad,),
        in_specs=in_specs,
        out_specs=(out_spec,) * len(out_dts),
        out_shape=tuple(jax.ShapeDtypeStruct((na_pad, k2span, f1),
                                             od) for od in out_dts),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if direct_T is not None:
        outs = tuple(o.reshape(na_pad, out_w) for o in outs)
        return Complex(outs[0], outs[1]), outs[2]
    outs = tuple(o.reshape(n_rows, out_w)[:, :N_out] for o in outs)
    Sx = Complex(outs[0], outs[1])
    if bin_spec is not None:
        return Sx, outs[2]
    if derivative:
        return Sx, Complex(outs[2], outs[3])
    return Sx, None


def fsst2_pallas_rows(xh, fs, tables, n_rows, Np2, N_out, sfs, params,
                      gamma, flipud, tiny, band, direct_T=1024,
                      kdtype='int16', interpret=False, aux_lowprec=True):
    """Five-window FSST2 rows from a precomputed full-length spectrum:
    returns (V, k) in the zero-prep scatter layout (na_pad, W) — V the
    analysis STFT, k the chirp-corrected int bin plane. `tables` = the
    12-tuple from `_device_fsst2_tables` (band-packed (n_rows, br, f2)
    re/im per window + (n_rows, f1, 1) shift-phase pair); `band` its
    (r0, br) plan. Traceable."""
    from .fft import _dft_matrix_np, _twiddle_np
    from .ssq_pallas import _bins_from_w
    f1, f2 = _factorize(Np2)
    rows0 = Np2 // f2
    r0_np, br = band
    k2hi = -(-N_out // f1)
    while (k2hi * f1) % direct_T:
        k2hi += 1
    k2span = k2hi
    dt_s = str(xh.re.dtype)
    out_w = k2span * f1
    na_pad = -(-n_rows // 32) * 32
    nh = 2 if f1 % 16 == 0 else 1
    hk1 = f1 // nh

    wre, wim = _dft_matrix_np(f1, +1, 'float64')
    wre = (wre[:, :br] / Np2).astype(dt_s)
    wim = (wim[:, :br] / Np2).astype(dt_s)
    tre, tim = _twiddle_np(Np2, f1, f2, +1, 'float64')
    tre, tim = tre.astype(dt_s), tim.astype(dt_s)
    w2re, w2im = _dft_matrix_np(f2, +1, 'float64')
    k2rows = np.arange(k2hi) % f2
    w2re = np.ascontiguousarray(w2re[k2rows].T).astype(dt_s)
    w2im = np.ascontiguousarray(w2im[k2rows].T).astype(dt_s)

    def kernel(fs_r, sfs_r, r0_r, xhre_r, xhim_r, *refs):
        H = refs[:10]                            # 5 windows re/im
        ere_r, eim_r = refs[10], refs[11]
        (wre_r, wim_r, tre_r, tim_r, w2re_r, w2im_r) = refs[12:18]
        outs = refs[18:]
        i = pl.program_id(0)
        fs = fs_r[0, 0]
        sfs = sfs_r[i, 0]
        r0v = pl.multiple_of(r0_r[i, 0], 8)
        xre = xhre_r[pl.ds(r0v, br), :]          # (br, f2)
        xim = xhim_r[pl.ds(r0v, br), :]
        tiny_v = jnp.asarray(tiny, xre.dtype)
        inv2pi = jnp.asarray(1.0 / (2 * np.pi), xre.dtype)
        from .complexlib import cmul2 as cmul, cdiv2
        cdiv = lambda a, b: cdiv2(a, b, tiny_v)

        def stages(Pre, Pim, h, dot):
            sl = slice(h * hk1, (h + 1) * hk1)
            wre_, wim_ = wre_r[sl], wim_r[sl]
            Are = dot(wre_, Pre) - dot(wim_, Pim)
            Aim = dot(wre_, Pim) + dot(wim_, Pre)
            tre_, tim_ = tre_r[sl], tim_r[sl]
            Atre = Are * tre_ - Aim * tim_
            Atim = Are * tim_ + Aim * tre_
            ere = ere_r[0][sl, :]
            eim = eim_r[0][sl, :]
            Atre, Atim = (Atre * ere - Atim * eim,
                          Atre * eim + Atim * ere)
            Ere = dot(Atre, w2re_r[:]) - dot(Atim, w2im_r[:])
            Eim = dot(Atre, w2im_r[:]) + dot(Atim, w2re_r[:])
            return Ere.T, Eim.T, sl              # (k2span, hk1)

        Ps = []
        for w in range(5):
            hre, him = H[2 * w][0], H[2 * w + 1][0]    # (br, f2)
            Ps.append((hre * xre - him * xim,
                       hre * xim + him * xre))

        adot = _sdot_lo if aux_lowprec else _sdot
        for h in range(nh):
            V = stages(Ps[0][0], Ps[0][1], h, _sdot)[:2]
            Vg1 = stages(Ps[1][0], Ps[1][1], h, adot)[:2]
            Vt = stages(Ps[2][0], Ps[2][1], h, adot)[:2]
            Vtd = stages(Ps[3][0], Ps[3][1], h, adot)[:2]
            Vd2 = stages(Ps[4][0], Ps[4][1], h, adot)[:2]
            sl = slice(h * hk1, (h + 1) * hk1)
            outs[0][0, :, sl] = V[0]
            outs[1][0, :, sl] = V[1]
            # w1 = Sfs - fs Im(Vg1/V)/2pi;  q = Im(N2/D2)
            # w2 = |w1 + (fs/2pi) q Re(Vt/V)|  (XLA twin _fsst2_rows)
            w1 = sfs - fs * cdiv(Vg1, V)[1] * inv2pi
            trel = cdiv(Vt, V)[0]
            g1sq = cmul(Vg1, Vg1)
            N2 = cmul(Vd2, V)
            N2 = (N2[0] - g1sq[0], N2[1] - g1sq[1])
            tg1 = cmul(Vt, Vg1)
            D2 = cmul(Vtd, V)
            D2 = (D2[0] - tg1[0], D2[1] - tg1[1])
            q = cdiv(N2, D2)[1]
            w2 = jnp.abs(w1 + (fs * inv2pi) * q * trel)
            valid = (V[0] * V[0] + V[1] * V[1]) \
                > jnp.asarray(gamma_, xre.dtype) ** 2
            w2 = jnp.where(valid & jnp.isfinite(w2), w2, jnp.inf)
            k, valid = _bins_from_w(w2, valid, dict(params_), flipud_,
                                    mode_)
            lin = (jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) * f1
                   + jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
                   + h * hk1)
            ok = valid & (lin < N_out) & (i < n_rows)
            outs[2][0, :, sl] = jnp.where(ok, k, -1).astype(kdtype)

    params_ = tuple(sorted(params.items()))
    gamma_, flipud_, mode_ = float(gamma), bool(flipud), params['mode']

    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM)
    rmap = lambda i: (jnp.minimum(i, n_rows - 1), 0, 0)
    row = pl.BlockSpec((1, br, f2), rmap, memory_space=pltpu.VMEM)
    erow = pl.BlockSpec((1, f1, 1), rmap, memory_space=pltpu.VMEM)
    smem_col = pl.BlockSpec((na_pad, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                smem_col, smem_col,
                const((rows0 + br, f2)), const((rows0 + br, f2))]
    in_specs += [row] * 10 + [erow, erow]
    in_specs += [const((f1, br)), const((f1, br)),
                 const((f1, f2)), const((f1, f2)),
                 const((f2, k2span)), const((f2, k2span))]

    def padcol(a, dtype=None):
        a = jnp.asarray(a).reshape(n_rows, 1)
        if dtype is not None:
            a = a.astype(dtype)
        if na_pad != n_rows:
            a = jnp.pad(a, ((0, na_pad - n_rows), (0, 0)), mode='edge')
        return a

    xre_b = xh.re.reshape(rows0, f2)
    xim_b = xh.im.reshape(rows0, f2)
    xre_b = jnp.concatenate([xre_b, xre_b[:br]], 0)
    xim_b = jnp.concatenate([xim_b, xim_b[:br]], 0)
    args = ([jnp.asarray(fs, dt_s).reshape(1, 1),
             padcol(np.asarray(sfs, dt_s)),
             padcol(np.asarray(r0_np, np.int32))]
            + [xre_b, xim_b]
            + [t.reshape(n_rows, br, f2) for t in tables[:10]]
            + [tables[10].reshape(n_rows, f1, 1),
               tables[11].reshape(n_rows, f1, 1)]
            + [jnp.asarray(wre), jnp.asarray(wim),
               jnp.asarray(tre), jnp.asarray(tim),
               jnp.asarray(w2re), jnp.asarray(w2im)])
    out_spec = pl.BlockSpec((1, k2span, f1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(na_pad,),
        in_specs=in_specs,
        out_specs=(out_spec,) * 3,
        out_shape=(jax.ShapeDtypeStruct((na_pad, k2span, f1), dt_s),
                   jax.ShapeDtypeStruct((na_pad, k2span, f1), dt_s),
                   jax.ShapeDtypeStruct((na_pad, k2span, f1), kdtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    V = Complex(outs[0].reshape(na_pad, out_w),
                outs[1].reshape(na_pad, out_w))
    return V, outs[2].reshape(na_pad, out_w)


@functools.lru_cache(maxsize=8)
def _stft_pallas_jit(shape, dtype, Np2, N_out, derivative, padtype,
                     padlength, interpret=False, bin_spec=None,
                     sfs_key=None, direct_T=None, kdtype='int16',
                     band=None):
    """Cached jit: raw 1D signal + filterbank tables -> (Sx[, dSx]) —
    or (Sx, k) when `bin_spec` is set (phase+bin map fused in-kernel;
    `sfs_key` is the per-row Sfs tuple). With `band`, the tables args
    are the band-packed 6-tuple (H*4, ere, eim)."""
    from .pad import padsignal
    dt_s = str(dtype)

    def run(xj, fs, Hre, Him, Hdre, Hdim, *etabs):
        xj = xj.astype(dt_s)
        xp = padsignal(xj, padtype, padlength=padlength)
        xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2, imag_zero=True)
        return stft_pallas_rows(xh, fs, Hre, Him, Hdre, Hdim, Np2, N_out,
                                derivative, interpret, bin_spec, sfs_key,
                                direct_T=direct_T, kdtype=kdtype,
                                band=band, etables=etabs or None)
    return jax.jit(run)


def stft_conv_bins(xj, fs, n_fft, N_out, win_key, modulated, padtype,
                   padlength, dtype, params, gamma, flipud, sfs_key,
                   tables, interpret=False, direct_T=None,
                   kdtype='int16', band=None):
    """Convolution-form STFT with the phase transform + bin map fused
    in-kernel: returns (Sx, k) where `k` is the int reassignment bin
    plane (-1 = gamma-gated). The window-derivative rows never leave
    VMEM. `tables` must be the `_device_filterbank(...)` tuple (passed
    as jit arguments — see `stft_conv`) — or, with `band` set, the
    banded 6-tuple from `_device_filterbank_banded`; `sfs_key` the
    per-row Sfs tuple. With `direct_T`, (Sx, k) come back in the
    zero-prep scatter layout (see `stft_pallas_rows`)."""
    Np2 = _next_fft_len(padlength)
    bin_spec = (tuple(sorted(params.items())), float(gamma), bool(flipud),
                params['mode'])
    runner = _stft_pallas_jit(tuple(xj.shape), str(dtype), int(Np2),
                              int(N_out), True, padtype, int(padlength),
                              bool(interpret), bin_spec, tuple(sfs_key),
                              direct_T, str(kdtype), band)
    return runner(xj, np.asarray(fs, str(dtype)), *tables)


def _stft_pallas_applicable(Np2, shape):
    from ..configs import backend, get_config
    if len(shape) != 1:
        return False
    if not (backend() == 'tpu' and get_config().use_pallas):
        return False
    factors = _factorize(Np2)
    if len(factors) != 2:
        return False
    f1, f2 = factors
    return f1 % 8 == 0 and f2 % 64 == 0 and f1 <= 1024 and f2 <= 1024


_FB_DEV_CACHE = {}


def _device_filterbank(win_key, n_fft, Np2, modulated, dtype):
    key = (win_key, n_fft, Np2, modulated, dtype)
    hit = _FB_DEV_CACHE.get(key)
    if hit is not None:
        return hit
    H, Hd = _conv_filterbank(win_key, n_fft, Np2, modulated)
    out = (jnp.asarray(H.real.astype(dtype)),
           jnp.asarray(H.imag.astype(dtype)),
           jnp.asarray(Hd.real.astype(dtype)) if Hd is not None else
           jnp.zeros((1, 1), dtype),
           jnp.asarray(Hd.imag.astype(dtype)) if Hd is not None else
           jnp.zeros((1, 1), dtype))
    _FB_DEV_CACHE[key] = out
    return out


def stft_conv(xj, fs, n_fft, N_out, win_key, modulated, derivative,
              padtype, padlength, dtype, interpret=False, tables=None):
    """Run the convolution-form STFT. `xj` raw (unpadded) device/np
    array; returns (Sx, dSx or None).

    `tables`: pass the `_device_filterbank(...)` tuple explicitly when
    calling from inside an OUTER trace — otherwise the device tables
    become closed-over constants of the outer jaxpr and lowering inlines
    them (a full device->host fetch of the multi-hundred-MB filterbank,
    which stalls compilation for minutes at large N)."""
    Np = padlength
    Np2 = _next_fft_len(Np)
    use_pallas = _stft_pallas_applicable(Np2, tuple(xj.shape)) or interpret
    if use_pallas and tables is None:
        # banded tables when the window's spectral support pays for it
        banded = _device_filterbank_banded(win_key, int(n_fft), int(Np2),
                                           bool(modulated), str(dtype))
        if banded is not None:
            tab6, band = banded
            runner = _stft_pallas_jit(tuple(xj.shape), str(dtype),
                                      int(Np2), int(N_out),
                                      bool(derivative), padtype,
                                      int(padlength), bool(interpret),
                                      band=band)
            return runner(xj, np.asarray(fs, str(dtype)), *tab6)
    if tables is not None:
        Hre, Him, Hdre, Hdim = tables
    else:
        Hre, Him, Hdre, Hdim = _device_filterbank(win_key, int(n_fft),
                                                  int(Np2),
                                                  bool(modulated),
                                                  str(dtype))
    if use_pallas:
        runner = _stft_pallas_jit(tuple(xj.shape), str(dtype), int(Np2),
                                  int(N_out), bool(derivative), padtype,
                                  int(padlength), bool(interpret))
    else:
        runner = _stft_conv_jit(tuple(xj.shape), str(dtype), int(Np2),
                                int(N_out), bool(derivative), padtype,
                                int(padlength))
    return runner(xj, np.asarray(fs, str(dtype)), Hre, Him, Hdre, Hdim)
