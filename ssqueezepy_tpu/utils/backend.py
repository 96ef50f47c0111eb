# -*- coding: utf-8 -*-
"""Array-backend dispatcher — API shim over the reference's numpy/torch
polymorphism layer (`/root/reference/ssqueezepy/utils/backend.py`).

The reference switches numpy<->torch per call via `USE_GPU()`; here the
two "backends" are numpy (host) and jax.numpy (device), selected by
whether any input is a jax array (or explicitly via `like=`). `S` carries
the reference's helper surface (backend.py:14-101); `Q` resolves
attributes per call (backend.py:122-132).
"""
import numpy as np

__all__ = ['S', 'Q', 'is_tensor', 'is_dtype', 'asnumpy']


def _xp_of(*xs):
    import jax
    for x in xs:
        if isinstance(x, jax.Array):
            import jax.numpy as jnp
            return jnp
    return np


def is_tensor(x):
    """True for device (jax) arrays (reference: torch tensors)."""
    import jax
    return isinstance(x, jax.Array)


def is_dtype(x, str_dtype):
    return str_dtype in str(getattr(x, 'dtype', ''))


def asnumpy(x):
    from ..ops.complexlib import Complex
    if isinstance(x, Complex):
        return x.to_numpy()
    return np.asarray(x)


class _S:
    """Backend-polymorphic helpers (reference backend.py:14-101)."""

    @staticmethod
    def asarray(x, dtype=None, like=None):
        xp = _xp_of(like if like is not None else x)
        return xp.asarray(x, dtype=dtype)

    array = asarray.__func__ if hasattr(asarray, '__func__') else asarray

    @staticmethod
    def zeros(shape, dtype=None, like=None):
        return _xp_of(like).zeros(shape, dtype=dtype)

    @staticmethod
    def ones(shape, dtype=None, like=None):
        return _xp_of(like).ones(shape, dtype=dtype)

    @staticmethod
    def arange(*args, like=None, **kw):
        return _xp_of(like).arange(*args, **kw)

    @staticmethod
    def vstack(xs):
        return _xp_of(*xs).vstack(xs)

    @staticmethod
    def atleast_1d(x):
        return _xp_of(x).atleast_1d(x)

    @staticmethod
    def astype(x, dtype):
        return x.astype(dtype)

    is_tensor = staticmethod(is_tensor)
    is_dtype = staticmethod(is_dtype)
    asnumpy = staticmethod(asnumpy)


S = _S()


class _Q:
    """Per-call attribute proxy: `Q.foo(x)` resolves to jnp.foo or np.foo
    based on the first array argument (reference backend.py:122-132)."""

    def __getattr__(self, name):
        def fn(*args, **kw):
            xp = _xp_of(*[a for a in args
                          if hasattr(a, 'dtype') or hasattr(a, 'shape')])
            return getattr(xp, name)(*args, **kw)
        return fn


Q = _Q()
