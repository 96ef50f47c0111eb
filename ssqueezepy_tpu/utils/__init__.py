# -*- coding: utf-8 -*-
"""Utility namespace mirroring the reference's `ssqueezepy.utils`
re-export surface (reference utils/__init__.py) so migrating code keeps
its import paths: common helpers, the scale/parameter engine, backend
dispatch, framing, padding, and differentiation utilities."""
from .common import (WARN, NOTE, EPS32, EPS64, pi, p2up, mad,
                     est_riskshrink_thresh, assert_is_one_of)
from .cwt_utils import (process_scales, cwt_scalebounds, make_scales,
                        logscale_transition_idx, find_downsampling_scale,
                        nv_from_scales, adm_cwt, adm_ssq)
from .backend import S, Q, is_tensor, asnumpy
from . import common
from . import cwt_utils
from . import backend
from . import plan_cache

# reference utils also re-exports these op-level helpers
from ..ops.pad import padsignal
from ..ops.diff import trigdiff
from ..ops.framing import buffer, unbuffer, window_norm
from ..ops.fft import fft, ifft, rfft, irfft, fftshift, ifftshift

__all__ = [
    'WARN', 'NOTE', 'EPS32', 'EPS64', 'pi', 'p2up', 'mad',
    'est_riskshrink_thresh', 'assert_is_one_of',
    'process_scales', 'cwt_scalebounds', 'make_scales',
    'logscale_transition_idx', 'find_downsampling_scale',
    'nv_from_scales', 'adm_cwt', 'adm_ssq',
    'S', 'Q', 'is_tensor', 'asnumpy',
    'padsignal', 'trigdiff', 'buffer', 'unbuffer', 'window_norm',
    'fft', 'ifft', 'rfft', 'irfft', 'fftshift', 'ifftshift',
    'common', 'cwt_utils', 'backend', 'plan_cache',
]
