# -*- coding: utf-8 -*-
"""Time-frequency ridge extraction (forward-backward penalized tracking).

Behavioral reference: `/root/reference/ssqueezepy/ridge_extraction.py`
(Iatsenko et al. forward-backward algorithm; penalty matrix :79-90,
forward accumulation :169-183, backward trace :206-232).

TPU-native design: the forward pass — the one truly sequential loop in the
reference library — is a `lax.scan` over time whose body is a fully
vectorized min-plus inner product (F x F) on the VPU/MXU, replacing the
reference's per-(time, freq) numba loops; the backward trace is a reverse
`lax.scan`. Both compile into a single XLA program.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.complexlib import Complex
from ..utils.common import EPS32, EPS64

__all__ = ['extract_ridges']


def _fw_bw_jit(penalty_matrix, energy_nl, eps):
    """One forward-backward pass; energy_nl (F, T) = -log-normalized."""
    P = penalty_matrix

    def fw_step(prev, e_t):
        # pen_e[f, t] = e[f, t] + min_g(pen_e[g, t-1] + P[f, g])
        new = e_t + jnp.min(prev[None, :] + P, axis=1)
        return new, new

    init = energy_nl[:, 0]
    _, pen_rest = jax.lax.scan(fw_step, init, energy_nl[:, 1:].T)
    pen_e = jnp.concatenate([init[None], pen_rest], 0).T  # (F, T)

    ridge_fw = jnp.argmin(pen_e, axis=0)  # (T,)

    F = energy_nl.shape[0]

    def bw_step(nxt_idx, xs):
        pen_t, e_col_next, pen_col_next, fw_t = xs
        # val = pen_e[next, t+1] - e[next, t+1]
        val = pen_col_next[nxt_idx] - e_col_next[nxt_idx]
        new_pen = P[nxt_idx, :]  # penalty of jumping next->f
        cond = jnp.abs(val - (pen_t + new_pen)) < eps
        # reference keeps the LAST satisfying f (loop overwrite);
        # fall back to the forward index if none satisfies
        last_true = (F - 1) - jnp.argmax(cond[::-1])
        idx = jnp.where(jnp.any(cond), last_true, fw_t)
        return idx, idx

    # iterate t = T-2 .. 0; xs at step for time t needs columns at t and t+1
    xs = (pen_e[:, :-1].T, energy_nl[:, 1:].T, pen_e[:, 1:].T,
          ridge_fw[:-1])
    init_idx = ridge_fw[-1]
    _, rev = jax.lax.scan(bw_step, init_idx, xs, reverse=True)
    ridge = jnp.concatenate([rev, ridge_fw[-1:]])
    return ridge


def extract_ridges(Tf, scales, penalty=2., n_ridges=1, bw=15,
                   transform='cwt', get_params=False, parallel=True):
    """Track `n_ridges` maximum-energy ridges (reference
    ridge_extraction.py:11-146). 2D `Tf` (na, T) returns `ridge_idxs`
    (T, n_ridges); batched 3D `Tf` (B, na, T) returns (B, T, n_ridges)
    — the DP scan is vmapped over the batch (no reference analog).
    `get_params` adds (`ridge_f`, `ridge_e`)."""
    if isinstance(Tf, Complex):
        eps = EPS64 if str(Tf.dtype) == 'float64' else EPS32
        energy = np.asarray(Tf.abs2())
        dtype = np.float64 if str(Tf.dtype) == 'float64' else np.float32
    else:
        Tf = np.asarray(Tf)
        eps = EPS64 if Tf.dtype == np.complex128 else EPS32
        dtype = np.float64 if Tf.dtype == np.complex128 else np.float32
        energy = np.abs(Tf) ** 2

    was_2d = (energy.ndim == 2)
    if was_2d:
        energy = energy[None]
    B, n_rows, n_timeshifts = energy.shape

    scales = np.asarray(scales, dtype=dtype)
    scales_orig = scales.copy()
    scales_v = (np.log(scales) if transform == 'cwt' else scales).squeeze()

    ridge_idxs = np.zeros((B, n_timeshifts, n_ridges), dtype=int)
    if get_params:
        ridge_f = np.zeros((B, n_timeshifts, n_ridges), dtype=dtype)
        ridge_e = np.zeros((B, n_timeshifts, n_ridges), dtype=dtype)

    penalty_matrix = np.asarray(penalty, dtype) * \
        np.subtract.outer(scales_v, scales_v) ** 2
    P_j = jnp.asarray(penalty_matrix.squeeze().astype(dtype))

    run = jax.jit(jax.vmap(lambda e: _fw_bw_jit(P_j, e, dtype(eps))))
    rows = np.arange(n_rows)[:, None]                  # (na, 1)

    for i in range(n_ridges):
        energy_max = energy.max(axis=1, keepdims=True)
        energy_nl = -np.log(energy / energy_max + eps)
        ridge = np.asarray(run(jnp.asarray(energy_nl.astype(dtype))))
        ridge_idxs[..., i] = ridge                     # (B, T)

        if get_params:
            ridge_f[..., i] = scales_orig.squeeze()[ridge]
            ridge_e[..., i] = np.take_along_axis(
                energy, ridge[:, None, :], axis=1)[:, 0]

        # zero +-bw bins around each found ridge for the next extraction
        # (one broadcast mask instead of a Python loop over time steps)
        kill = (rows >= ridge[:, None, :] - bw) & \
               (rows < ridge[:, None, :] + bw)         # (B, na, T)
        energy[kill] = 0

    if was_2d:
        ridge_idxs = ridge_idxs[0]
        if get_params:
            ridge_f, ridge_e = ridge_f[0], ridge_e[0]
    return ((ridge_idxs, ridge_f, ridge_e) if get_params else ridge_idxs)
