# -*- coding: utf-8 -*-
"""Multi-host failure detection (parallel/health.py) + streaming
checkpoint/resume — SURVEY §5.3's "new scope" subsystem.

A real lost-host can't be staged in-process, so the failure leg drives
the monitor with an injected heartbeat that times out (the exact signal
a hung cross-host psum produces); the happy path runs the REAL
collective heartbeat over the virtual 8-device mesh.
"""
import numpy as np
import pytest

import ssqueezepy_tpu as stq
from ssqueezepy_tpu.parallel import (make_mesh, collective_heartbeat,
                                     HealthMonitor)


def test_heartbeat_completes_on_live_mesh():
    mesh = make_mesh(batch=2, scale=4)
    ok, dt = collective_heartbeat(mesh, timeout=60.0)
    assert ok and dt is not None and dt >= 0
    # repeat uses the cached jitted fn: fast path
    ok2, dt2 = collective_heartbeat(mesh, timeout=60.0)
    assert ok2


def test_monitor_trips_after_consecutive_failures():
    mesh = make_mesh(batch=2, scale=4)
    calls = {'beats': [], 'failed': []}
    # heartbeat stub: two timeouts, then healthy — with max_failures=3
    # the monitor must NOT trip (counter resets on success)
    seq = [(False, None), (False, None), (True, 0.01), (False, None),
           (False, None), (False, None)]

    def hb():
        out = seq[len(calls['beats'])]
        calls['beats'].append(out)
        return out

    mon = HealthMonitor(mesh, interval=999, timeout=0.1, max_failures=3,
                        on_failure=lambda m: calls['failed'].append(
                            m.failures),
                        heartbeat=hb)
    for _ in range(3):
        mon.poll_once()
    assert not calls['failed'] and mon.failures == 0
    assert mon.last_latency == 0.01
    for _ in range(3):
        mon.poll_once()
    assert calls['failed'] == [3] and mon.tripped
    # tripped fires once, not per further failure
    seq.append((False, None))
    mon.poll_once()
    assert calls['failed'] == [3]
    # recovery re-arms: a SECOND outage after a healthy beat must fire
    # on_failure again (review finding: the trip used to latch forever)
    seq.extend([(True, 0.02), (False, None), (False, None),
                (False, None)])
    for _ in range(4):
        mon.poll_once()
    assert calls['failed'] == [3, 3] and mon.tripped


def test_monitor_thread_start_stop():
    mesh = make_mesh(batch=2, scale=4)
    mon = HealthMonitor(mesh, interval=0.05, timeout=30.0,
                        max_failures=99)
    mon.start()
    import time
    time.sleep(0.4)
    mon.stop()
    assert mon.beats >= 1
    assert mon.failures == 0


def test_streaming_checkpoint_resume():
    """Kill-and-restore: a stream snapshot taken mid-run, loaded onto a
    FRESH same-plan object, must continue bit-identically."""
    from ssqueezepy_tpu.streaming import StreamingSSQCWT
    chunk, Nn = 512, 2048
    rng = np.random.default_rng(11)
    x = rng.standard_normal(Nn).astype(np.float32)
    sc = np.geomspace(1., 16., 33).reshape(-1, 1)
    kw = dict(scales=sc, nv=None, N=Nn, history=512, lookahead=512)

    a = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}), **kw)
    outs_a = [a.process(x[i * chunk:(i + 1) * chunk]) for i in range(2)]
    snap = a.state_dict()

    # "replacement process": a fresh plan restored from the snapshot
    b = StreamingSSQCWT(chunk, ('gmw', {'dtype': 'float32'}), **kw)
    b.load_state(snap)
    for i in range(2, 4):
        ta, wa = a.process(x[i * chunk:(i + 1) * chunk])
        tb, wb = b.process(x[i * chunk:(i + 1) * chunk])
        assert np.array_equal(np.asarray(ta.re), np.asarray(tb.re))
        assert np.array_equal(np.asarray(wa.re), np.asarray(wb.re))
    fa, fb = a.finalize(), b.finalize()
    assert np.array_equal(np.asarray(fa[0].re), np.asarray(fb[0].re))


def test_streaming_stft_checkpoint_resume():
    """state_dict/load_state on the STFT streaming plan (the CWT one is
    covered above): bit-identical continuation."""
    from ssqueezepy_tpu.streaming import StreamingSSQSTFT
    chunk = 512
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2048).astype(np.float32)
    a = StreamingSSQSTFT(chunk, n_fft=128, dtype='float32')
    for i in range(2):
        a.process(x[i * chunk:(i + 1) * chunk])
    snap = a.state_dict()
    b = StreamingSSQSTFT(chunk, n_fft=128, dtype='float32')
    b.load_state(snap)
    for i in range(2, 4):
        ta, _ = a.process(x[i * chunk:(i + 1) * chunk])
        tb, _ = b.process(x[i * chunk:(i + 1) * chunk])
        assert np.array_equal(np.asarray(ta.re), np.asarray(tb.re))
