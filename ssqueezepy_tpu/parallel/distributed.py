# -*- coding: utf-8 -*-
"""Multi-host (DCN) initialization and mesh construction.

The reference is strictly single-node (SURVEY.md §2.9 P6); this layer is
the multi-host half of the fresh TPU design (§5.8): `jax.distributed`
process bootstrap + a host x chip mesh whose inner ('scale' or 'time')
axis rides ICI and whose outer ('batch') axis rides DCN — collectives
then stay on the fast interconnect for the per-signal reductions while
only data-parallel gradients/outputs cross hosts.

Single-host environments (including this build machine) skip
`jax.distributed.initialize` and fall back to the local device pool, so
all code paths here are exercised by the single-host tests; true
multi-host runs only add the bootstrap call.
"""
import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ['init_distributed', 'make_host_chip_mesh']


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize jax.distributed for a multi-host slice. No-op on a
    single host (or when already initialized). Returns (process_index,
    process_count)."""
    try:
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif jax.process_count() == 1:
            # environment-driven init (TPU pods auto-discover); harmless
            # failure on plain single-host setups
            try:
                jax.distributed.initialize()
            except Exception:
                pass
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


def make_host_chip_mesh(inner='scale', devices=None):
    """Mesh ('batch', inner) with the 'batch' axis spanning HOSTS (DCN)
    and `inner` ('scale' or 'time') spanning each host's local chips
    (ICI). On one host this degenerates to (1, n_local_chips)."""
    assert inner in ('scale', 'time')
    devices = devices if devices is not None else jax.devices()
    n_hosts = max(1, jax.process_count())
    per_host = len(devices) // n_hosts
    arr = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(arr, axis_names=('batch', inner))
