# -*- coding: utf-8 -*-
"""Real-TPU hardware tier (the reference's opportunistic GPU-leg
pattern, /root/reference/tests/fft_test.py:28-34: hardware cases run
when hardware is present, skip otherwise).

Unlike tests/conftest.py this does NOT force the cpu platform — it
runs against whatever accelerator JAX resolves (the axon TPU tunnel in
this environment). Every test is `@pytest.mark.tpu` and skips on
non-TPU backends, so a stray CPU collection is harmless.

Shapes are intentionally small: the point is re-asserting kernel
equality ON HARDWARE (Mosaic lowering, alignment proofs, bf16 dot
semantics — none of which interpret mode checks) in minutes, not
benchmarking.
"""
import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope='session', autouse=True)
def _require_tpu():
    from ssqueezepy_tpu.configs import backend
    if backend() != 'tpu':
        pytest.skip("real-TPU tier: resolved backend is not 'tpu'",
                    allow_module_level=True)


@pytest.fixture(scope='session')
def chirp_4k():
    N = 4096
    t = np.linspace(0, 4, N, endpoint=False)
    return np.cos(2 * np.pi * 3 * np.exp(t / 2)).astype(np.float32)
