# -*- coding: utf-8 -*-
"""Device-mesh construction helpers."""
import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ['make_mesh', 'mesh_info']


def make_mesh(batch=None, scale=None, devices=None):
    """Mesh over ('batch', 'scale'). With no sizes given, puts all devices
    on the 'scale' axis (the CWT's natural tensor-parallel dimension —
    filterbank rows)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if batch is None and scale is None:
        batch, scale = 1, n
    elif batch is None:
        batch = n // scale
    elif scale is None:
        scale = n // batch
    assert batch * scale == n, (batch, scale, n)
    arr = np.asarray(devices).reshape(batch, scale)
    return Mesh(arr, axis_names=('batch', 'scale'))


def mesh_info(mesh):
    return {name: int(size) for name, size in
            zip(mesh.axis_names, mesh.devices.shape)}
