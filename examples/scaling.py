# -*- coding: utf-8 -*-
"""Multi-chip scaling-efficiency harness (SURVEY.md §6: "scale
near-linearly across a multi-host slice").

Measures batched `ssq_cwt` throughput at 1 chip vs an n-chip
('batch', 'scale') mesh and at a ('batch', 'time') context-parallel mesh.
On this build machine it runs on the virtual CPU device pool
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the point is the
harness + collective paths; absolute numbers require a real slice.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python examples/scaling.py [--n 4096] [--batch 8]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def _bench(fn, *a, n_runs=5):
    import jax
    out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn(*a)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n_runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=4096)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import jax
    from ssqueezepy_tpu.parallel import (ShardedSSQCWT, make_mesh,
                                         TimeShardedSSQCWT, make_mesh_time)

    devs = jax.devices()
    if len(devs) < 2:
        devs = jax.devices('cpu')
    n_dev = len(devs)
    N, B = args.n, args.batch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N)).astype(np.float32)

    # 1 "chip": mesh (1, 1)
    plan1 = ShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log', nv=16,
                          mesh=make_mesh(batch=1, scale=1,
                                         devices=devs[:1]))
    t1 = _bench(plan1, x)
    print(json.dumps({'config': '1-dev', 'sec': round(t1, 4)}), flush=True)

    # n-dev scale-sharded
    plan_s = ShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log', nv=16,
                           mesh=make_mesh(batch=1, scale=n_dev,
                                          devices=devs))
    ts = _bench(plan_s, x)
    print(json.dumps({'config': f'{n_dev}-dev scale-sharded',
                      'sec': round(ts, 4),
                      'speedup_vs_1dev': round(t1 / ts, 2),
                      'efficiency': round(t1 / ts / n_dev, 2)}),
          flush=True)

    # n-dev time-sharded (context parallel)
    plan_t = TimeShardedSSQCWT(N, ('gmw', {'dtype': 'float32'}), 'log',
                               nv=16,
                               mesh=make_mesh_time(batch=1, time=n_dev,
                                                   devices=devs))
    tt = _bench(plan_t, x)
    print(json.dumps({'config': f'{n_dev}-dev time-sharded',
                      'sec': round(tt, 4),
                      'speedup_vs_1dev': round(t1 / tt, 2)}), flush=True)


if __name__ == '__main__':
    main()
