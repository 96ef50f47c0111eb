# -*- coding: utf-8 -*-
"""TPU-native FFT engine.

The reference's FFT runtime (`/root/reference/ssqueezepy/utils/fft_utils.py`)
dispatches between scipy.fft/pyFFTW/torch.fft. None of those exist on TPU,
and this environment's TPU backend implements neither complex dtypes nor an
FFT primitive — so this module builds the FFT from scratch as *real matmuls
on the MXU*, in split-complex form:

  * mixed-radix Cooley-Tukey (four-step recursion): each radix stage is a
    (R x R) DFT-matrix contraction — an MXU matmul — followed by an
    elementwise twiddle multiply that XLA fuses,
  * arbitrary lengths via prime factorization; large primes via Bluestein's
    chirp-z reduction to a power of two,
  * optional *zero-input pruning* (`nonzero_prefix`): analytic spectra
    (CWT/analytic filterbanks) are zero on the negative-frequency half, so
    the first stage contracts over only the nonzero rows — ~2x on the
    dominant stage,
  * plans (factorizations, DFT matrices, twiddle tables) built once in
    Python and cached — the analog of the reference's FFTW "wisdom"
    persistence (fft_utils.py:317-331), except here the tables are exact and
    the XLA compile cache plays the role of plan persistence.

On CPU backends the same API dispatches to XLA's native FFT (pocketfft),
which doubles as the correctness reference for the matmul engine — the same
"N execution paths, assert allclose" strategy the reference uses for its
CPU/GPU kernels (tests/fft_test.py:41-100).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .complexlib import Complex
from ..configs import backend

__all__ = [
    'fft', 'ifft', 'rfft', 'irfft', 'fftshift', 'ifftshift',
    'fft_matmul', 'ifft_matmul', 'FFT',
]

# largest direct-DFT leaf; radices above this get factored further.
_MAX_RADIX = 64
# primes above this use Bluestein instead of a direct DFT matmul
_MAX_DIRECT_PRIME = 2048

_EINSUM_PRECISION = jax.lax.Precision.HIGHEST


def set_fft_precision(precision):
    """Set matmul precision for the FFT engine ('highest' recommended;
    'high' ~= bfloat16_3x trades ~1e-6 accuracy for speed)."""
    global _EINSUM_PRECISION
    _EINSUM_PRECISION = precision


# --------------------------------------------------------------------------
# planning (trace-time, numpy)
# --------------------------------------------------------------------------
# largest radix for a balanced TWO-stage split. Each stage is HBM-bound
# (~2.4 GB/stage at the benchmark shape), so fewer stages beat fewer MACs
# as long as per-stage MACs stay under the MXU roofline; 1024-wide
# contractions on fp32 data are still memory-bound on this chip.
_MAX_RADIX_2STAGE = 1024


@functools.lru_cache(maxsize=1024)
def _factorize(n):
    """Factor n into matmul radices: a balanced 2-factor split when both
    factors fit `_MAX_RADIX_2STAGE` (minimizes memory passes), else
    radices <= _MAX_RADIX (large primes kept whole)."""
    m = n
    primes = []
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
              59, 61):
        while m % p == 0:
            primes.append(p)
            m //= p
    if m > 1:
        # remaining part is prime (or a product of primes > 61; treat whole)
        primes.append(m)

    # try a balanced 2-stage split (skip tiny n — a single direct DFT
    # matmul is cheaper below _MAX_RADIX)
    if n > _MAX_RADIX and all(p <= _MAX_RADIX_2STAGE for p in primes):
        best = None
        for mask in range(1 << len(primes)):
            a = 1
            for i, p in enumerate(primes):
                if mask & (1 << i):
                    a *= p
            b = n // a
            if 1 < a <= _MAX_RADIX_2STAGE and 1 < b <= _MAX_RADIX_2STAGE:
                key = (abs(a - b), a + b)
                if best is None or key < best[0]:
                    best = (key, a, b)
        if best is not None:
            a, b = best[1], best[2]
            # ascending: a smaller FIRST factor gives finer out_range
            # granularity (last digit stride = f1) and a lane-aligned f2
            factors = sorted((a, b))
            assert int(np.prod(factors)) == n, (factors, n)
            return factors

    # fallback: merge small primes into radices close to _MAX_RADIX
    factors = []
    primes.sort(reverse=True)
    cur = 1
    for p in primes:
        if p > _MAX_RADIX:
            if cur > 1:
                factors.append(cur)
                cur = 1
            factors.append(p)
        elif cur * p <= _MAX_RADIX:
            cur *= p
        else:
            factors.append(cur)
            cur = p
    if cur > 1:
        factors.append(cur)
    factors.sort(reverse=True)
    assert int(np.prod(factors)) == n, (factors, n)
    return factors


@functools.lru_cache(maxsize=256)
def _dft_matrix_np(n, sign, dtype):
    k = np.arange(n)
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return (w.real.astype(dtype), w.imag.astype(dtype))


@functools.lru_cache(maxsize=256)
def _twiddle_np(N, N1, N2, sign, dtype):
    k1 = np.arange(N1).reshape(-1, 1)
    n2 = np.arange(N2).reshape(1, -1)
    w = np.exp(sign * 2j * np.pi * (k1 * n2) / N)
    return (w.real.astype(dtype), w.imag.astype(dtype))


# --------------------------------------------------------------------------
# core (jit-traceable; all tables are trace-time constants)
#
# Layout strategy ("trailing-K"): the data is kept as (batch, M, K) where M
# is the not-yet-transformed length and K the product of already-produced
# DFT output dims. Every stage is a single `dot_general` contracting axis 1
# (no data transposes between stages — the corner turns that dominate a
# naive four-step implementation are deferred to ONE final reversal
# transpose). Twiddle multiplies broadcast over K and fuse into the matmuls.
# --------------------------------------------------------------------------
def _cdot_axis1(wr, wi, ar, ai):
    """Contract axis 1 (size R) of (b, R, MK) with DFT (F, R) -> (b, MK, F).

    XLA dot_general output order (lhs free + rhs free) is exactly the
    trailing-K layout for the next stage — no transposes between stages.
    """
    dn = (((1,), (1,)), ((), ()))  # lhs dim 1 (R) with rhs dim 1 (R)
    kw = dict(dimension_numbers=dn, precision=_EINSUM_PRECISION,
              preferred_element_type=ar.dtype)
    br = jax.lax.dot_general(ar, wr, **kw) - jax.lax.dot_general(ai, wi, **kw)
    bi = jax.lax.dot_general(ar, wi, **kw) + jax.lax.dot_general(ai, wr, **kw)
    return br, bi


def _cdot_packed(wr, wi, a2):
    """Complex contraction fully PACKED: a2 is (b, 2R, MK) =
    [a_re rows | a_im rows]; ONE real dot_general with the (2F, 2R) block
    matrix [[wr, -wi], [wi, wr]] produces (b, MK, 2F) = [br | bi] on the
    last axis. One quarter the HBM passes of the 4-matmul form and a
    2x wider (MXU-filling) contraction; the re/im unpack fuses into the
    following twiddle pass.
    """
    w4 = jnp.concatenate([jnp.concatenate([wr, -wi], axis=1),
                          jnp.concatenate([wi, wr], axis=1)], axis=0)
    dn = (((1,), (1,)), ((), ()))
    kw = dict(dimension_numbers=dn, precision=_EINSUM_PRECISION,
              preferred_element_type=a2.dtype)
    out = jax.lax.dot_general(a2, w4, **kw)     # (b, MK, 2F)
    F = wr.shape[0]
    return out[..., :F], out[..., F:]


def _fft_core(ar, ai, n, sign, dtype, nonzero_prefix=None, out_range=None,
              imag_zero=False):
    """FFT along last axis of split-complex (ar, ai), any batch.

    Pruning hooks (all exact — they only skip work on provably-zero or
    unrequested data):
      * `nonzero_prefix=p`: input is zero beyond index p (analytic spectra);
        the last axis may also simply be SHORTER than n (length >= p), in
        which case the zeros are implicit and never materialized in HBM.
      * `out_range=(lo, hi)`: only output indices [lo, hi) are needed
        (unpadding); the final stage computes only the covering digit range.
        Returns (ar, ai, offset): outputs cover [offset, offset + size).
      * `imag_zero`: input imaginary part is identically zero (real input);
        skips half the first-stage matmuls. `ai` is ignored.
    """
    factors = _factorize(n)
    if len(factors) == 1 and factors[0] > _MAX_DIRECT_PRIME:
        if ar.shape[-1] != n:
            pad = [(0, 0)] * (ar.ndim - 1) + [(0, n - ar.shape[-1])]
            ar = jnp.pad(ar, pad)
            ai = jnp.pad(ai, pad) if not imag_zero else ar * 0
        if imag_zero:
            ai = jnp.zeros_like(ar)
        br, bi = _bluestein(ar, ai, n, sign, dtype)
        return (br, bi, 0) if out_range is not None else (br, bi)

    batch = ar.shape[:-1]
    b = int(np.prod(batch)) if batch else 1
    n_in = ar.shape[-1]
    if nonzero_prefix is None and n_in < n:
        nonzero_prefix = n_in

    # stage-1 input-row pruning geometry
    M2_0 = n // factors[0]
    if nonzero_prefix is not None and nonzero_prefix < n:
        rows0 = max(1, -(-int(nonzero_prefix) // M2_0))
    else:
        rows0 = factors[0]
    # pad/truncate the (implicitly zero-extended) input to rows0 * M2_0
    need = rows0 * M2_0
    if n_in < need:
        pad = [(0, 0)] * (ar.ndim - 1) + [(0, need - n_in)]
        ar = jnp.pad(ar, pad)
        if not imag_zero:
            ai = jnp.pad(ai, pad)
    elif n_in > need:
        ar = ar[..., :need]
        if not imag_zero:
            ai = ai[..., :need]

    ar = ar.reshape(b, rows0, M2_0)
    ai = ai.reshape(b, rows0, M2_0) if not imag_zero else None

    # last-stage output-digit pruning geometry: output index is
    # k1 + f1*(k2 + f2*(k3 + ...)), so the last digit kL has stride
    # n // fL and restricting outputs [lo, hi) restricts kL to a range.
    kl_lo = 0
    f_last = factors[-1]
    stride_last = int(np.prod(factors[:-1]))
    if out_range is not None and len(factors) > 1:
        lo, hi = out_range
        kl_lo = max(0, int(lo) // stride_last)
        kl_hi = min(f_last, -(-int(hi) // stride_last))
    else:
        kl_hi = f_last

    # Between stages the split-complex state is kept PACKED along the
    # next contraction axis — (b, 2, M2, K*f), flattened to (b, 2f', ...)
    # at the next stage — so every stage is TWO dot_generals with 2R-wide
    # (MXU-filling) block matrices instead of four half-wide ones, and
    # XLA fuses the re/im restack into the twiddle pass (no extra HBM
    # traffic).
    M = n
    K = 1
    a2 = None
    out_factors = []
    for si, f in enumerate(factors):
        M2 = M // f
        last = (si == len(factors) - 1)

        wr, wi = _dft_matrix_np(f, sign, dtype)  # (F_out, R); symmetric
        wr, wi = jnp.asarray(wr), jnp.asarray(wi)
        if si == 0 and rows0 < f:
            wr, wi = wr[:, :rows0], wi[:, :rows0]
        if last and (kl_lo > 0 or kl_hi < f):
            wr, wi = wr[kl_lo:kl_hi], wi[kl_lo:kl_hi]
        f_out = wr.shape[0]
        out_factors.append(f_out)

        # (b, 2R, M2*K) x (F_out, 2R) -> (b, M2*K, F_out)
        if si == 0:
            if ai is None:  # real input: one dot with [wr; wi] stacked
                w2 = jnp.concatenate([wr, wi], axis=0)  # (2F, R)
                dn = (((1,), (1,)), ((), ()))
                kw = dict(dimension_numbers=dn,
                          precision=_EINSUM_PRECISION,
                          preferred_element_type=ar.dtype)
                out = jax.lax.dot_general(ar, w2, **kw)
                br, bi = out[..., :f_out], out[..., f_out:]
            else:
                a2 = jnp.concatenate([ar, ai], axis=1)  # (b, 2*rows0, M2)
                br, bi = _cdot_packed(wr, wi, a2)
        else:
            a2 = a2.reshape(b, 2 * f, M2 * K)
            br, bi = _cdot_packed(wr, wi, a2)
        br = br.reshape(b, M2, K * f_out)
        bi = bi.reshape(b, M2, K * f_out)

        if M2 > 1:
            # twiddle W_M^{m * k_new}: depends on (m in M2, k_new in f);
            # layout (1, M2, 1, f) broadcasts over batch and prior K
            tr, ti = _twiddle_np(M, f, M2, sign, dtype)  # (f, M2)
            tr = jnp.asarray(tr.T).reshape(1, M2, 1, f)
            ti = jnp.asarray(ti.T).reshape(1, M2, 1, f)
            br4 = br.reshape(b, M2, K, f)
            bi4 = bi.reshape(b, M2, K, f)
            cr = br4 * tr - bi4 * ti
            ci = br4 * ti + bi4 * tr
            # restack packed for the next stage (fused into this pass)
            a2 = jnp.stack([cr.reshape(b, M2, K * f),
                            ci.reshape(b, M2, K * f)], axis=1)
        else:
            ar, ai = br, bi
        M = M2
        K = K * f

    # done dims are (k1, ..., kL) slowest->fastest in *processing order*;
    # output index is k1 + f1*(k2 + f2*(...)) -> reverse the factor axes.
    n_out = int(np.prod(out_factors))
    ar = ar.reshape(b, *out_factors)
    ai = ai.reshape(b, *out_factors)
    perm = (0,) + tuple(range(len(out_factors), 0, -1))
    ar = ar.transpose(perm).reshape(*batch, n_out)
    ai = ai.transpose(perm).reshape(*batch, n_out)
    if out_range is not None:
        return ar, ai, kl_lo * stride_last
    return ar, ai


# backwards-compatible alias used by Bluestein
def _fft_rec(ar, ai, n, sign, dtype, nonzero_prefix=None):
    return _fft_core(ar, ai, n, sign, dtype, nonzero_prefix)


def _next_pow2(n):
    return 1 << (n - 1).bit_length()


def _bluestein(ar, ai, n, sign, dtype):
    """Chirp-z FFT for large prime n via power-of-2 convolution."""
    m = _next_pow2(2 * n - 1)
    k = np.arange(n)
    # chirp: w^(k^2/2) with w = exp(sign*2pi i / n)
    phase = (k.astype(np.float64) ** 2 % (2 * n)) * (np.pi / n)
    ch = np.exp(sign * 1j * phase)  # a_k multiplier
    br_np = np.zeros(m, np.complex128)
    br_np[:n] = np.conj(ch)
    br_np[m - n + 1:] = np.conj(ch[1:][::-1])
    bh = np.fft.fft(br_np)

    chr_, chi = jnp.asarray(ch.real.astype(dtype)), \
        jnp.asarray(ch.imag.astype(dtype))
    bhr, bhi = jnp.asarray(bh.real.astype(dtype)), \
        jnp.asarray(bh.imag.astype(dtype))

    xr = ar * chr_ - ai * chi
    xi = ar * chi + ai * chr_
    pad = [(0, 0)] * (xr.ndim - 1) + [(0, m - n)]
    xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)

    Xr, Xi = _fft_rec(xr, xi, m, -1, dtype)
    Yr = Xr * bhr - Xi * bhi
    Yi = Xr * bhi + Xi * bhr
    yr, yi = _fft_rec(Yr, Yi, m, +1, dtype)
    yr, yi = yr / m, yi / m

    yr, yi = yr[..., :n], yi[..., :n]
    outr = yr * chr_ - yi * chi
    outi = yr * chi + yi * chr_
    return outr, outi


# --------------------------------------------------------------------------
# public matmul-engine entry points
# --------------------------------------------------------------------------
def fft_matmul(z, axis=-1, nonzero_prefix=None, n=None, out_range=None,
               imag_zero=False):
    """Forward FFT (numpy convention) via the MXU matmul engine.

    `n`: transform length (defaults to the input length; may exceed it, in
    which case the input is implicitly zero-extended — never materialized).
    `out_range=(lo, hi)`: compute only output indices [lo, hi) (exact;
    prunes the final stage). `imag_zero`: input is real (skips half the
    first-stage matmuls).
    """
    z = _as_cplx(z)
    ar, ai = _move_last(z.re, axis), _move_last(z.im, axis)
    n = int(n) if n is not None else ar.shape[-1]
    out = _fft_core(ar, ai, n, -1, str(ar.dtype),
                    nonzero_prefix=nonzero_prefix, out_range=out_range,
                    imag_zero=imag_zero)
    if out_range is not None:
        br, bi, off = out
        lo, hi = out_range
        br = br[..., lo - off:hi - off]
        bi = bi[..., lo - off:hi - off]
    else:
        br, bi = out
    return Complex(_move_back(br, axis), _move_back(bi, axis))


def ifft_matmul(z, axis=-1, nonzero_prefix=None, n=None, out_range=None,
                imag_zero=False):
    """Inverse FFT (1/N-normalized) via the MXU matmul engine; pruning
    options as in `fft_matmul`."""
    z = _as_cplx(z)
    ar, ai = _move_last(z.re, axis), _move_last(z.im, axis)
    n = int(n) if n is not None else ar.shape[-1]
    out = _fft_core(ar, ai, n, +1, str(ar.dtype),
                    nonzero_prefix=nonzero_prefix, out_range=out_range,
                    imag_zero=imag_zero)
    if out_range is not None:
        br, bi, off = out
        lo, hi = out_range
        br = br[..., lo - off:hi - off]
        bi = bi[..., lo - off:hi - off]
    else:
        br, bi = out
    inv = np.asarray(1.0 / n, dtype=str(ar.dtype))
    return Complex(_move_back(br * inv, axis), _move_back(bi * inv, axis))


def _move_last(x, axis):
    return x if axis in (-1, x.ndim - 1) else jnp.moveaxis(x, axis, -1)


def _move_back(x, axis):
    return x if axis in (-1, x.ndim - 1) else jnp.moveaxis(x, -1, axis)


def _as_cplx(z):
    if isinstance(z, Complex):
        return z
    z = jnp.asarray(z)
    if jnp.iscomplexobj(z):
        return Complex.from_native(z)
    return Complex(z, jnp.zeros_like(z))


# --------------------------------------------------------------------------
# dispatching API (native XLA FFT on CPU, matmul engine on TPU)
# --------------------------------------------------------------------------
def _use_matmul(engine):
    if engine is not None:
        return engine == 'matmul'
    return backend() == 'tpu'


def fft(z, axis=-1, nonzero_prefix=None, engine=None, n=None,
        out_range=None, imag_zero=False):
    if _use_matmul(engine):
        return fft_matmul(z, axis, nonzero_prefix, n=n, out_range=out_range,
                          imag_zero=imag_zero)
    z = _as_cplx(z)
    out = Complex.from_native(jnp.fft.fft(z.to_native(), n=n, axis=axis))
    return _slice_axis(out, axis, out_range)


def ifft(z, axis=-1, nonzero_prefix=None, engine=None, n=None,
         out_range=None, imag_zero=False):
    if _use_matmul(engine):
        return ifft_matmul(z, axis, nonzero_prefix, n=n,
                           out_range=out_range, imag_zero=imag_zero)
    z = _as_cplx(z)
    out = Complex.from_native(jnp.fft.ifft(z.to_native(), n=n, axis=axis))
    return _slice_axis(out, axis, out_range)


def _slice_axis(z, axis, out_range):
    if out_range is None:
        return z
    sl = [slice(None)] * z.re.ndim
    sl[axis] = slice(out_range[0], out_range[1])
    return z[tuple(sl)]


def rfft(x, axis=-1, engine=None):
    """Real-input FFT -> first n//2+1 bins (numpy `rfft` convention).

    On the matmul engine this uses the exact pruning hooks: `imag_zero`
    halves the first-stage matmuls and `out_range=(0, n//2+1)` halves the
    final stage (only the covering last-digit range is computed).
    """
    x = jnp.asarray(x)
    n = x.shape[axis]
    if _use_matmul(engine):
        z = Complex(x, jnp.zeros_like(x))
        return fft_matmul(z, axis, out_range=(0, n // 2 + 1),
                          imag_zero=True)
    return Complex.from_native(jnp.fft.rfft(x, axis=axis))


def irfft(z, n=None, axis=-1, engine=None):
    """Hermitian inverse FFT -> real signal of length `n`."""
    z = _as_cplx(z)
    nin = z.shape[axis]
    if n is None:
        n = 2 * (nin - 1)
    if _use_matmul(engine):
        zl = _move_last(z.re, axis), _move_last(z.im, axis)
        re, im = zl
        # build full hermitian spectrum along last axis
        m = n // 2 + 1
        re, im = re[..., :m], im[..., :m]
        tail = slice(n - m, 0, -1) if n > m else slice(0, 0)
        re_f = jnp.concatenate([re, re[..., tail]], -1)
        im_f = jnp.concatenate([im, -im[..., tail]], -1)
        out = ifft_matmul(Complex(re_f, im_f), -1)
        return _move_back(out.re, axis)
    return jnp.fft.irfft(z.to_native(), n=n, axis=axis)


def fftshift(x, axes=None):
    if isinstance(x, Complex):
        return Complex(fftshift(x.re, axes), fftshift(x.im, axes))
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[a] // 2 for a in axes], axes)


def ifftshift(x, axes=None):
    if isinstance(x, Complex):
        return Complex(ifftshift(x.re, axes), ifftshift(x.im, axes))
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[a] // 2) for a in axes], axes)


_PATIENCE_NOTED = False


def _note_patience(patience):
    """One-time NOTE when a caller sets a non-zero FFTW planning tier
    (reference fft_utils.py:249-295): the knob is honored by the XLA
    compile cache + plan_cache analog automatically, so the request is a
    no-op here — say so instead of silently discarding it."""
    global _PATIENCE_NOTED
    if patience and not _PATIENCE_NOTED:
        from ..utils.common import NOTE
        NOTE("`patience=%r` requested: FFTW planning tiers do not exist "
             "on this backend — XLA kernels are auto-tuned at compile "
             "time and cached (utils/plan_cache.py); the argument is "
             "accepted for API compatibility and has no effect."
             % (patience,))
        _PATIENCE_NOTED = True


class FFT:
    """Object-style FFT handle mirroring the reference's `FFT` class
    (fft_utils.py:40). Plans are implicit (lru-cached tables + XLA compile
    cache); `patience` is accepted for API compatibility (a one-time NOTE
    fires on non-zero use — see `_note_patience`).
    """

    def __init__(self, patience=0):
        _note_patience(patience)
        self.patience = patience
        self.planning_timelimit = None

    fft = staticmethod(fft)
    ifft = staticmethod(ifft)
    rfft = staticmethod(rfft)
    irfft = staticmethod(irfft)
    fftshift = staticmethod(fftshift)
    ifftshift = staticmethod(ifftshift)


FFT_GLOBAL = FFT()
