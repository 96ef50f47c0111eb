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

WARN = lambda msg: _logger.warning("WARNING: %s" % msg)
NOTE = lambda msg: _logger.warning("NOTE: %s" % msg)

pi = np.pi
EPS32 = np.finfo(np.float32).eps
EPS64 = np.finfo(np.float64).eps


def assert_is_one_of(x, name, supported, e=ValueError):
    if x not in supported:
        raise e("`{}` must be one of: {} (got {})".format(
            name, ', '.join(map(str, supported)), x))


def mad(data, axis=None):
    """Mean absolute deviation."""
    data = np.asarray(data)
    return np.mean(np.abs(data - np.mean(data, axis)), axis)


def est_riskshrink_thresh(Wx, nv):
    """RiskShrink hard-threshold estimate (reference utils/common.py:248-276,
    after Thakur et al.). `Wx` complex (na, n) or split-complex magnitude.
    """
    Wx = np.asarray(Wx)
    N = Wx.shape[-1]
    Wx_fine = np.abs(Wx[:int(nv)])
    gamma = 1.4826 * np.sqrt(2 * np.log(N)) * mad(Wx_fine)
    return gamma


def p2up(n):
    """Next power of 2 >= according to the reference's rounding rule, with
    left/right pad lengths centering the original `n` samples
    (reference utils/common.py:32-51). Note the reference uses
    `2**(1 + round(log2(n)))`, i.e. can jump two octaves above for `n` just
    under a power of 2 — reproduced exactly for parity.
    """
    up = int(2 ** (1 + np.round(np.log2(n))))
    n2 = int((up - n) // 2)
    n1 = int(up - n - n2)
    return up, n1, n2
