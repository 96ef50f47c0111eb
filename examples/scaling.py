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
                                         TimeShardedSSQCWT, make_mesh_time,
                                         FullShardedSSQCWT, make_mesh3)

    devs = jax.devices()
    if len(devs) < 2:
        devs = jax.devices('cpu')
    n_dev = len(devs)
    N, B = args.n, args.batch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N)).astype(np.float32)
    wav = ('gmw', {'dtype': 'float32'})
    results = []

    def rec(config, sec, t1=None):
        row = {'config': config, 'sec': round(sec, 4)}
        if t1 is not None:
            row['speedup_vs_1dev'] = round(t1 / sec, 2)
        results.append(row)
        print(json.dumps(row), flush=True)
        return sec

    # device sweep: 1, 2, 4, ..., n_dev
    sweep = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    t1 = None
    for d in sweep:
        plan = ShardedSSQCWT(N, wav, 'log', nv=16,
                             mesh=make_mesh(batch=1, scale=d,
                                            devices=devs[:d]))
        t = _bench(plan, x)
        if d == 1:
            t1 = t
        row = rec(f'{d}-dev scale-sharded', t, t1 if d > 1 else None)
        if d > 1:
            results[-1]['efficiency'] = round(t1 / t / d, 2)

    for d in sweep[1:]:
        plan = ShardedSSQCWT(N, wav, 'log', nv=16,
                             mesh=make_mesh(batch=d, scale=1,
                                            devices=devs[:d]))
        rec(f'{d}-dev batch-sharded', _bench(plan, x), t1)

    for d in sweep[1:]:
        plan = TimeShardedSSQCWT(N, wav, 'log', nv=16,
                                 mesh=make_mesh_time(batch=1, time=d,
                                                     devices=devs[:d]))
        rec(f'{d}-dev time-sharded', _bench(plan, x), t1)

    if n_dev >= 8:
        plan = FullShardedSSQCWT(N, wav, 'log', nv=16,
                                 mesh=make_mesh3(batch=2, scale=2,
                                                 time=n_dev // 4,
                                                 devices=devs))
        rec(f'{n_dev}-dev batch2 x scale2 x time{n_dev // 4}',
            _bench(plan, x), t1)

    return results


if __name__ == '__main__':
    main()
