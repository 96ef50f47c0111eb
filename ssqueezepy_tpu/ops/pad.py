# -*- coding: utf-8 -*-
"""Signal padding (jit-compatible, static shapes).

Reference parity: `/root/reference/ssqueezepy/utils/common.py:54-158`
(`padsignal` modes zero/reflect/symmetric/replicate/wrap) and `p2up` (:32).
Pad lengths are computed at trace time from static shapes, so jitted
transforms keep fully static shapes (XLA requirement).
"""
import numpy as np
import jax.numpy as jnp

from ..utils.common import p2up, assert_is_one_of

SUPPORTED_PADTYPES = ('reflect', 'symmetric', 'replicate', 'wrap', 'zero')

_MODE_MAP = {
    'zero': 'constant',
    'reflect': 'reflect',
    'symmetric': 'symmetric',
    'replicate': 'edge',
    'wrap': 'wrap',
}


def pad_params(N, padtype='reflect', padlength=None):
    """(n_up, n1, n2): padded length, left pad, right pad. Matches reference
    `padsignal` arithmetic (common.py:111-121): odd total pad puts the extra
    sample on the LEFT.
    """
    assert_is_one_of(padtype, 'padtype', SUPPORTED_PADTYPES)
    if padlength is None:
        n_up, n1, n2 = p2up(N)
    else:
        n_up = int(padlength)
        if abs(n_up - N) % 2 == 0:
            n1 = n2 = (n_up - N) // 2
        else:
            n2 = (n_up - N) // 2
            n1 = n2 + 1
    return int(n_up), int(n1), int(n2)


def padsignal(x, padtype='reflect', padlength=None, get_params=False):
    """Pad along the last axis. `x` may be a numpy or jax real array, 1D/2D."""
    N = x.shape[-1]
    n_up, n1, n2 = pad_params(N, padtype, padlength)

    pad_width = [(0, 0)] * (x.ndim - 1) + [(n1, n2)]
    xp = jnp.pad(jnp.asarray(x), pad_width, mode=_MODE_MAP[padtype])
    return (xp, n_up, n1, n2) if get_params else xp


def padsignal_np(x, padtype='reflect', padlength=None, get_params=False):
    """Numpy twin of `padsignal` for trace-time use."""
    N = x.shape[-1]
    n_up, n1, n2 = pad_params(N, padtype, padlength)
    pad_width = [(0, 0)] * (x.ndim - 1) + [(n1, n2)]
    xp = np.pad(x, pad_width, mode=_MODE_MAP[padtype])
    return (xp, n_up, n1, n2) if get_params else xp
