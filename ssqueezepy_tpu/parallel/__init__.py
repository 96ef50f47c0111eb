# -*- coding: utf-8 -*-
"""Multi-chip parallel execution (mesh/sharding layer).

The reference library is strictly single-node (SURVEY.md §2.9) — this
layer is designed fresh for TPU: a `jax.sharding.Mesh` over
('batch', 'scale') axes, with the CWT filterbank rows (scales) and input
signals (batch) sharded across chips; the synchrosqueezing bin reduction
is a `psum` over the scale axis, and `icwt`'s scale sum likewise.
"""
from .mesh import make_mesh, mesh_info
from .sharded import (sharded_ssq_cwt, sharded_cwt, ShardedSSQCWT,
                      dryrun_multichip)
from .time_sharded import (TimeShardedSSQCWT, time_sharded_cwt,
                           time_sharded_ssq_cwt, make_mesh_time)
from .full_sharded import FullShardedSSQCWT, make_mesh3
from .distributed import init_distributed, make_host_chip_mesh
from .inverse import sharded_icwt, sharded_issq_cwt
from .sharded_stft import (ShardedSSQSTFT, ShardedSSQSTFT2,
                           sharded_ssq_stft)
from .sharded_order2 import ShardedSSQCWT2
from .health import collective_heartbeat, HealthMonitor

__all__ = ['make_mesh', 'mesh_info', 'sharded_ssq_cwt', 'sharded_cwt',
           'ShardedSSQCWT', 'dryrun_multichip', 'TimeShardedSSQCWT',
           'time_sharded_cwt', 'time_sharded_ssq_cwt', 'make_mesh_time',
           'init_distributed', 'make_host_chip_mesh', 'FullShardedSSQCWT',
           'make_mesh3', 'sharded_icwt', 'sharded_issq_cwt',
           'ShardedSSQSTFT', 'ShardedSSQSTFT2', 'sharded_ssq_stft',
           'ShardedSSQCWT2', 'collective_heartbeat', 'HealthMonitor']
