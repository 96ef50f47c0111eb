# -*- coding: utf-8 -*-
"""Sharded (multi-chip) inverse transforms.

The forward sharded paths leave `Wx` distributed over the 'scale' mesh
axis (parallel/sharded.py out_specs); the one-integral inverse CWT's
scale sum is then the same single `psum` the forward squeeze uses — no
re-gather of the (B, na, N) plane is needed. Designed fresh for TPU
(the reference inverses are single-device host loops —
/root/reference/ssqueezepy/_cwt.py:323, _ssq_cwt.py:313).

The log-piecewise grid needs no recursion here (the reference splits
the integral at the scale-grid transition, _cwt.py:422-429): the split
is equivalent to per-scale quadrature weights ln(2)/nv_i, which fold
into one weighted row reduction — the form that maps onto a single
collective.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.complexlib import Complex
from ..utils.cwt_utils import (process_scales, nv_from_scales, adm_ssq)
from ..models.wavelets import Wavelet
from ..models.cwt import _process_gmw_wavelet
from .mesh import make_mesh

__all__ = ['sharded_icwt', 'sharded_issq_cwt']


def _icwt_row_weights(scales, scaletype, nv, l1_norm, wavelet):
    """Per-scale quadrature weights for the one-integral inverse:
    ``x = sum_i w_i * Re(Wx_i)``. Folds the admissibility constant, the
    grid measure (ln2/nv for log grids — per-scale for log-piecewise —
    or pi/4 for linear), and the scale normalization (reference
    _cwt.py:441-450, 479-482)."""
    scales = np.asarray(scales).squeeze()
    Cpsi = adm_ssq(wavelet)
    if scaletype == 'log-piecewise':
        meas = (np.log(2) / nv_from_scales(scales)).squeeze()
    elif scaletype.startswith('log'):
        meas = np.full(len(scales), np.log(2) / nv)
    else:
        meas = np.full(len(scales), np.pi / 4)
    if l1_norm:
        nrm = (np.ones(len(scales)) if scaletype.startswith('log')
               else scales)
    else:
        nrm = (scales ** .5 if scaletype.startswith('log')
               else scales ** 1.5)
    return (2 / Cpsi) * meas / nrm


def _weighted_row_psum(arr_re, weights, mesh, axis_name='scale'):
    """shard_map'd ``sum_i w_i * arr[:, i, :]`` with rows distributed
    over `axis_name`; rows are zero-padded to the shard count with
    weight 0 so padded rows contribute nothing."""
    n_sh = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    B, na, N = arr_re.shape
    na_pad = -(-na // n_sh) * n_sh
    w = np.zeros(na_pad, str(arr_re.dtype))
    w[:na] = weights

    def per_shard(a, wblk):
        part = jnp.einsum('brn,r->bn', a, wblk)
        return jax.lax.psum(part, axis_name)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P('batch', axis_name, None), P(axis_name)),
        out_specs=P('batch', None), check_vma=False)

    @jax.jit
    def run(a):
        a = jnp.pad(a, ((0, 0), (0, na_pad - na), (0, 0)))
        return fn(a, jnp.asarray(w))
    return run(arr_re)


def sharded_icwt(Wx, wavelet='gmw', scales='log-piecewise', nv=None,
                 x_len=None, x_mean=0, l1_norm=True, mesh=None):
    """One-integral inverse CWT with the scale sum as one `psum` over
    the 'scale' mesh axis. `Wx` (B, na, N) Complex/complex ndarray (the
    layout `ShardedSSQCWT`/`sharded_cwt` return). Returns (B, N).

    `x_mean` is added exactly once — the reference's log-piecewise
    recursion adds it once per scale segment (_cwt.py:423-429 passes
    `x_mean` into both sub-calls), which this flat-weights formulation
    deliberately does not reproduce."""
    mesh = mesh if mesh is not None else make_mesh()
    if isinstance(Wx, Complex):
        Wre = jnp.asarray(Wx.re)
    else:
        Wre = jnp.asarray(np.asarray(Wx).real)
    if Wre.ndim == 2:
        Wre = Wre[None]
    B, na, N = Wre.shape
    x_len = x_len or N

    wavelet = _process_gmw_wavelet(wavelet, l1_norm)
    wavelet = Wavelet._init_if_not_isinstance(wavelet)
    if not isinstance(scales, np.ndarray) and nv is None:
        nv = 32
    scales, scaletype, _, nv = process_scales(scales, x_len, wavelet,
                                              nv=nv, get_params=True)
    assert len(scales) == na, (len(scales), na)

    w = _icwt_row_weights(scales, scaletype, nv, l1_norm, wavelet)
    x = _weighted_row_psum(Wre, w.astype(str(Wre.dtype)), mesh)
    return np.asarray(x) + x_mean


def sharded_issq_cwt(Tx, wavelet='gmw', mesh=None):
    """Full inverse synchrosqueezed CWT ``x = Re(sum_bins Tx) * 2/Css``
    with the bin sum sharded over the 'scale' mesh axis (masked
    component inversion stays on the single-device `issq_cwt` — it is a
    host-ridge operation). `Tx` (B, nbins, N). Returns (B, N)."""
    mesh = mesh if mesh is not None else make_mesh()
    if isinstance(Tx, Complex):
        Tre = jnp.asarray(Tx.re)
    else:
        Tre = jnp.asarray(np.asarray(Tx).real)
    if Tre.ndim == 2:
        Tre = Tre[None]
    wavelet = Wavelet._init_if_not_isinstance(
        _process_gmw_wavelet(wavelet, l1_norm=True))
    Css = adm_ssq(wavelet)
    w = np.full(Tre.shape[-2], 2 / Css)
    x = _weighted_row_psum(Tre, w.astype(str(Tre.dtype)), mesh)
    return np.asarray(x)
