# -*- coding: utf-8 -*-
"""Elementwise replacement / scrubbing utilities.

Behavioral reference: `/root/reference/ssqueezepy/algos.py` — the
`replace_*` Numba family (:469-542), `replace_under_abs` (+ its CUDA twin,
:560-590), and `zero_denormals` (:593-613). On TPU these are single fused
XLA `where` ops, so there is no kernel to write — the numpy-facing API is
kept for parity (in-place on numpy inputs, like the reference), and every
function also accepts jnp arrays / split-complex `Complex` functionally.
"""
import numpy as np

from .complexlib import Complex

__all__ = ['replace_at_inf_or_nan', 'replace_at_inf', 'replace_at_nan',
           'replace_at_value', 'replace_under_abs', 'zero_denormals',
           '_min_neglect_idx', 'nCk']


def _apply(x, ref, mask_fn, replacement):
    """numpy: in-place (reference semantics); jnp/Complex: functional."""
    if isinstance(x, np.ndarray):
        ref_ = x if ref is None else ref
        m = mask_fn(np, ref_)
        x[m] = replacement
        return x
    import jax.numpy as jnp
    if isinstance(x, Complex):
        ref_ = x if ref is None else ref
        m = mask_fn(jnp, ref_)
        return Complex(jnp.where(m, replacement, x.re),
                       jnp.where(m, replacement, x.im))
    ref_ = x if ref is None else ref
    m = mask_fn(jnp, ref_)
    return jnp.where(m, replacement, x)


def _absval(xp, a):
    if isinstance(a, Complex):
        return a.abs()
    if np.iscomplexobj(a) if isinstance(a, np.ndarray) else False:
        return np.abs(a)
    return xp.abs(a)


def replace_at_inf_or_nan(x, ref=None, replacement=0.):
    """x[isinf(ref) | isnan(ref)] = replacement (reference algos.py:469)."""
    return _apply(x, ref, lambda xp, r: ~xp.isfinite(
        r.abs() if isinstance(r, Complex) else r), replacement)


def replace_at_inf(x, ref=None, replacement=0.):
    """x[isinf(ref)] = replacement (reference algos.py:487)."""
    return _apply(x, ref, lambda xp, r: xp.isinf(
        r.abs() if isinstance(r, Complex) else r), replacement)


def replace_at_nan(x, ref=None, replacement=0.):
    """x[isnan(ref)] = replacement (reference algos.py:505)."""
    return _apply(x, ref, lambda xp, r: xp.isnan(
        r.abs() if isinstance(r, Complex) else r), replacement)


def replace_at_value(x, ref=None, value=0., replacement=0.):
    """x[ref == value] = replacement (reference algos.py:523)."""
    return _apply(x, ref, lambda xp, r: (
        (r.abs() if isinstance(r, Complex) else r) == value), replacement)


def replace_under_abs(x, ref=None, value=0., replacement=0.):
    """x[|ref| < value] = replacement (reference algos.py:545-590; the
    gamma-threshold kernel of the phase transform)."""
    return _apply(x, ref, lambda xp, r: _absval(xp, r) < value, replacement)


def zero_denormals(x, parallel=None):
    """Flush |x| < 1000*tiny to zero (denormals slow CPU FFTs — reference
    algos.py:593-613, scipy#13764; harmless no-op semantics on TPU where
    denormals are flushed in hardware)."""
    th = 1000 * np.finfo(
        x.dtype if hasattr(x, 'dtype') else np.float64).tiny
    if isinstance(x, np.ndarray):
        x[np.abs(x) < th] = 0
        return x
    import jax.numpy as jnp
    return jnp.where(jnp.abs(x) < th, 0, x)


def _min_neglect_idx(arr, th=1e-12):
    """First index where arr < th (reference algos.py:616-622)."""
    arr = np.asarray(arr)
    idxs = np.flatnonzero(arr < th)
    return int(idxs[0]) if len(idxs) else len(arr) - 1


def nCk(n, k):
    """n-choose-k (reference algos.py:13-20)."""
    mul = lambda a, b: a * b
    r = min(k, n - k)
    from functools import reduce
    numer = reduce(mul, range(n, n - r, -1), 1)
    denom = reduce(mul, range(1, r + 1), 1)
    return numer / denom
