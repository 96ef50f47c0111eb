# -*- coding: utf-8 -*-
"""Multi-host failure detection & recovery hooks (SURVEY.md §5.3/§5.8).

The reference library is single-process and has no analog; on a
multi-host slice, the failure mode that matters is a LOST PEER: every
cross-host collective then blocks forever (the DCN transport retries
silently), so liveness cannot be observed from inside the hung step.
The standard TPU-pod pattern is therefore

  1. a **collective heartbeat** — a tiny `psum` over the full mesh,
     issued from a side thread under a wall-clock timeout: if any
     participant is gone the collective cannot complete and the timeout
     fires on every SURVIVING host simultaneously (detection is
     symmetric by construction);
  2. **fail-fast + supervisor restart** — the transforms are stateless
     per call and every host-side plan is disk-persistent
     (`utils/plan_cache.py`, the XLA compile cache), so recovery is
     simply re-running the step on a reformed slice. The only carried
     state in the library is the streaming plans', which snapshot and
     restore via `state_dict`/`load_state`.

`HealthMonitor` packages (1) with a consecutive-failure threshold and a
user `on_failure` hook (default: log loudly; pass
``on_failure=HealthMonitor.EXIT`` for the fail-fast pattern). All of it
runs on a single host too (the heartbeat degenerates to a local
reduction), which is how the tests exercise every path.
"""
import threading
import time

import numpy as np

__all__ = ['collective_heartbeat', 'HealthMonitor']


def _heartbeat_fn(mesh):
    """One tiny all-axes psum over `mesh`; returns a jitted callable
    x -> x + psum(ones)/size (== x + 1 when everyone answers)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def hb(x):
        def body(xs):
            s = jax.lax.psum(jnp.ones((), xs.dtype), axes)
            return xs + s / mesh.devices.size
        return shard_map(body, mesh=mesh, in_specs=P(),
                         out_specs=P(), check_vma=False)(x)
    return jax.jit(hb)


def collective_heartbeat(mesh, timeout=10.0, _fn_cache={}):
    """Issue one mesh-wide psum under a wall-clock timeout.

    Returns ``(ok, seconds_or_none)``: ok=False means the collective
    did not complete within `timeout` — on a multi-host slice the
    symptom of a lost/partitioned peer. The device call runs in a
    daemon thread so the caller's thread never wedges; an abandoned
    heartbeat that later completes is harmless (its output is unused).
    """
    key = id(mesh)
    fn = _fn_cache.get(key)
    if fn is None:
        if len(_fn_cache) >= 8:           # bound: meshes are few and
            _fn_cache.clear()             # long-lived; don't pin stale
        fn = _fn_cache[key] = _heartbeat_fn(mesh)
    import jax.numpy as jnp
    done = threading.Event()
    err = []

    def run():
        try:
            out = fn(jnp.zeros(()))
            np.asarray(out)               # host fetch = real completion
        except Exception as e:            # pragma: no cover - device err
            err.append(e)
        done.set()

    t0 = time.monotonic()
    th = threading.Thread(target=run, daemon=True)
    th.start()
    if not done.wait(timeout):
        return False, None
    if err:
        return False, None
    return True, time.monotonic() - t0


class HealthMonitor:
    """Background mesh-liveness monitor.

    >>> mon = HealthMonitor(mesh, interval=30, timeout=10,
    ...                     max_failures=2, on_failure=HealthMonitor.EXIT)
    >>> mon.start()
    ... # training/serving loop ...
    >>> mon.stop()

    `on_failure(monitor)` fires after `max_failures` CONSECUTIVE
    heartbeat timeouts (a single slow step does not trip it). `EXIT`
    terminates the process with status 42 — the fail-fast half of the
    supervisor-restart pattern (plans and compiled programs reload from
    the disk caches on the replacement process). A successful heartbeat
    resets the failure counter and records the latency in
    `last_latency`.
    """

    @staticmethod
    def EXIT(monitor):                    # pragma: no cover - terminates
        import os
        import logging
        logging.getLogger(__name__).error(
            "mesh heartbeat failed %d times; exiting for supervisor "
            "restart", monitor.failures)
        os._exit(42)

    def __init__(self, mesh, interval=30.0, timeout=10.0, max_failures=2,
                 on_failure=None, heartbeat=None):
        self.mesh = mesh
        self.interval = float(interval)
        self.timeout = float(timeout)
        self.max_failures = int(max_failures)
        self.on_failure = on_failure or self._log_failure
        self._heartbeat = heartbeat or (
            lambda: collective_heartbeat(self.mesh, self.timeout))
        self.failures = 0
        self.beats = 0
        self.last_latency = None
        self.tripped = False
        self._stop = threading.Event()
        self._thread = None

    @staticmethod
    def _log_failure(monitor):
        import logging
        logging.getLogger(__name__).error(
            "mesh heartbeat failed %d consecutive times "
            "(mesh=%s): a peer is likely lost; collectives will hang",
            monitor.failures, monitor.mesh.shape)

    def poll_once(self):
        """One heartbeat now (also used by the loop). Returns ok."""
        ok, dt = self._heartbeat()
        self.beats += 1
        if ok:
            self.failures = 0
            self.tripped = False          # recovery re-arms the trip
            self.last_latency = dt
        else:
            self.failures += 1
            if self.failures >= self.max_failures and not self.tripped:
                self.tripped = True
                self.on_failure(self)
        return ok

    def _loop(self):
        while not self._stop.wait(self.interval):
            self.poll_once()

    def start(self):
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
