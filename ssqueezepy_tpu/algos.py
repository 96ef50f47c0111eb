# -*- coding: utf-8 -*-
"""Migration shim mirroring the reference's `ssqueezepy.algos` kernel
namespace (reference algos.py): code written against it keeps working,
with every symbol resolving to this library's device-dispatching
equivalent. The reference's per-device variants (`*_cpu`/`*_gpu`,
Numba serial/parallel pairs) collapse to single functions here — the
execution path is chosen by the backend, not by the caller.
"""
from .ops.ssq_kernels import (ssqueeze_fast, indexed_sum_onfly,
                              indexed_sum, find_closest,
                              find_closest_smart, find_closest_brute,
                              find_closest_log, find_closest_lin)
from .ops.phase import phase_cwt, phase_stft, phase_cwt_num
from .ops.elementwise import (replace_at_inf_or_nan, replace_at_inf,
                              replace_at_nan, replace_at_value,
                              replace_under_abs, zero_denormals, nCk)
from .ops.search import find_maximum, find_first_occurrence

# reference algos.py exposes the phase kernels as *_cpu/*_gpu pairs
# (algos.py:706-781); device dispatch is automatic here, the aliases
# keep migrating call sites intact
phase_cwt_cpu = phase_cwt
phase_cwt_gpu = phase_cwt
phase_stft_cpu = phase_stft
phase_stft_gpu = phase_stft

__all__ = [
    'ssqueeze_fast', 'indexed_sum_onfly', 'indexed_sum',
    'find_closest', 'find_closest_smart', 'find_closest_brute',
    'find_closest_log', 'find_closest_lin',
    'phase_cwt', 'phase_stft', 'phase_cwt_num',
    'phase_cwt_cpu', 'phase_cwt_gpu', 'phase_stft_cpu', 'phase_stft_gpu',
    'replace_at_inf_or_nan', 'replace_at_inf', 'replace_at_nan',
    'replace_at_value', 'replace_under_abs', 'zero_denormals', 'nCk',
    'find_maximum', 'find_first_occurrence',
]
