# -*- coding: utf-8 -*-
"""Test configuration: run on CPU (8 virtual devices for mesh tests) with
x64 enabled — the CPU XLA path is the correctness reference; TPU-engine
parity is asserted against it (and numpy) in the tests themselves.
"""
import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import matplotlib  # noqa: E402
matplotlib.use('Agg')
