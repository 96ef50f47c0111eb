# -*- coding: utf-8 -*-
"""Native (C++) host-plan engine: exactness vs the pure-Python twins, and
the persistent plan cache round trip. Mirrors the reference's
serial-vs-parallel kernel equality testing strategy (SURVEY.md §4.2)."""
import os
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu import native
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils import cwt_utils as cu


def _python_fds(Psih, scales, **kw):
    """Force the pure-Python loop."""
    orig = native.find_downsampling_scale_native
    native.find_downsampling_scale_native = lambda *a, **k: NotImplemented
    try:
        return cu.find_downsampling_scale(Psih, scales, **kw)
    finally:
        native.find_downsampling_scale_native = orig


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_find_downsampling_scale_native_matches_python():
    for wav, N in ((('gmw', {'dtype': 'float64'}), 8192),
                   (('gmw', {'beta': 5., 'dtype': 'float64'}), 4096),
                   ('morlet', 4096)):
        w = Wavelet(wav, N=N)
        smin, smax = cu.cwt_scalebounds(w, N, use_padded_N=True)
        nv = 16
        na = int(np.ceil(nv * np.log2(smax / smin)))
        mn = int(np.floor(nv * np.log2(smin)))
        scales = 2 ** (np.arange(mn, mn + na) / nv)
        Psih = w.filterbank_np(scales, N=2048, nohalf=True)

        for method in ('sum', 'any', 'all'):
            idx_py = _python_fds(Psih, scales, method=method)
            idx_nat = native.find_downsampling_scale_native(
                Psih[:, :Psih.shape[1] // 2], 5, 3, .02, 4., method)
            assert idx_nat == idx_py, (wav, method, idx_nat, idx_py)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_ridge_dp_forward_native_matches_numpy():
    rng = np.random.default_rng(0)
    e = rng.random((23, 157))
    P = rng.random((23, 23))
    pen, arg = native.ridge_dp_forward_native(e, P)

    pen_ref = np.zeros_like(e)
    arg_ref = np.zeros(e.shape, np.int32)
    pen_ref[:, 0] = e[:, 0]
    for t in range(1, e.shape[1]):
        v = pen_ref[:, t - 1][None, :] + P
        arg_ref[:, t] = v.argmin(1)
        pen_ref[:, t] = e[:, t] + v.min(1)
    assert np.allclose(pen, pen_ref)
    assert (arg == arg_ref).all()


def test_plan_cache_roundtrip(tmp_path, monkeypatch):
    from ssqueezepy_tpu.utils.plan_cache import disk_memo
    monkeypatch.setenv('SSQ_TPU_CACHE', str(tmp_path))

    calls = []

    def builder():
        calls.append(1)
        return (np.arange(5.0), 'log-piecewise', 32,
                {'mode': 'log', 'omax': 4, 'dvl': 0.5}, None, True)

    out1 = disk_memo(('k', 1), builder)
    out2 = disk_memo(('k', 1), builder)
    assert len(calls) == 1, "second call must hit disk"
    assert np.allclose(out1[0], out2[0])
    assert out2[1] == 'log-piecewise' and out2[2] == 32
    assert out2[3] == {'mode': 'log', 'omax': 4, 'dvl': 0.5}
    assert out2[4] is None and out2[5] is True
    assert isinstance(out2[3]['omax'], int)


def test_ssq_cwt_plan_disk_cache(tmp_path, monkeypatch):
    """Full ssq_cwt plan survives a disk round trip bit-exactly."""
    monkeypatch.setenv('SSQ_TPU_CACHE', str(tmp_path))
    from ssqueezepy_tpu.models import ssq_cwt as S
    from ssqueezepy_tpu.models.cwt import (_process_gmw_wavelet,
                                           _canonical_wavelet)
    w = _canonical_wavelet(Wavelet._init_if_not_isinstance(
        _process_gmw_wavelet(('gmw', {'dtype': 'float64'}), True), N=2048))

    S._PLAN_CACHE.clear()
    p1 = S._ssq_cwt_plan(w, 2048, 'log-piecewise', 16, None, 'peak', True,
                         1.0, True)
    S._PLAN_CACHE.clear()   # force disk path
    p2 = S._ssq_cwt_plan(w, 2048, 'log-piecewise', 16, None, 'peak', True,
                         1.0, True)
    for a, b in zip(p1, p2):
        if a is None:
            assert b is None
        elif isinstance(a, (str, bool, dict)):
            assert a == b
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b)), (a, b)
