# -*- coding: utf-8 -*-
"""Shared helpers: logging, numeric constants, small metrics.

Reference parity: `/root/reference/ssqueezepy/utils/common.py` (WARN/NOTE
logging :8-10, EPS constants :12-13, `mad` :297, `est_riskshrink_thresh` :248,
`assert_is_one_of` :302).
"""
import logging
import numpy as np

logging.basicConfig(format='')
_logger = logging.getLogger('ssqueezepy_tpu')


def WARN(msg):
    _logger.warning("WARNING: %s" % msg)


def NOTE(msg):
    _logger.warning("NOTE: %s" % msg)


pi = np.pi
EPS32 = np.finfo(np.float32).eps
EPS64 = np.finfo(np.float64).eps


def assert_is_one_of(x, name, supported, e=ValueError):
    if x not in supported:
        opts = ', '.join(map(str, supported))
        raise e(f"`{name}` must be one of: {opts} (got {x})")


def mad(data, axis=None):
    """Mean absolute deviation."""
    data = np.asarray(data)
    centered = data - data.mean(axis)
    return np.abs(centered).mean(axis)


def est_riskshrink_thresh(Wx, nv):
    """RiskShrink hard-threshold estimate (reference utils/common.py:248-276,
    after Thakur et al.): noise sigma from the MAD of the `nv` finest
    scale rows, scaled by the universal-threshold factor.
    """
    n = np.asarray(Wx).shape[-1]
    finest = np.abs(np.asarray(Wx)[:int(nv)])
    return 1.4826 * mad(finest) * np.sqrt(2 * np.log(n))


def p2up(n):
    """Next power of 2 >= according to the reference's rounding rule, with
    left/right pad lengths centering the original `n` samples
    (reference utils/common.py:32-51). Note the reference uses
    `2**(1 + round(log2(n)))`, i.e. can jump two octaves above for `n` just
    under a power of 2 — reproduced exactly for parity.
    """
    total = int(2 ** (1 + np.round(np.log2(n))))
    right = (total - n) // 2
    left = total - n - right
    return total, int(left), int(right)
