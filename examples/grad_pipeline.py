# -*- coding: utf-8 -*-
"""End-to-end differentiable time-frequency front end.

The reference's transforms are inference-only; here every fused kernel
(matmul FFT, Pallas CWT, Pallas scatter) carries a custom VJP, so a
synchrosqueezed spectrogram can sit INSIDE a trained model: this demo
fits a small linear readout on |Tx| features to classify chirp direction,
with gradients flowing through the whole ssq_cwt fast path, optionally
sharded over a batch x scale mesh.

Usage:
  python examples/grad_pipeline.py              # single device
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/grad_pipeline.py --mesh   # 2x4 sharded step
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def make_batch(rng, B, N):
    """Up-chirps (label 1) vs down-chirps (label 0) in noise."""
    t = np.linspace(0, 1, N, endpoint=False)
    y = (rng.random(B) > .5).astype(np.float32)
    f0 = rng.uniform(8, 24, B)
    f1 = rng.uniform(40, 90, B)
    lo = np.where(y > .5, f0, f1)
    hi = np.where(y > .5, f1, f0)
    phase = 2 * np.pi * (lo[:, None] * t + .5 * (hi - lo)[:, None] * t ** 2)
    x = np.cos(phase) + .5 * rng.standard_normal((B, N))
    return x.astype(np.float32), y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mesh', action='store_true')
    ap.add_argument('--steps', type=int, default=40)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--n', type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ssqueezepy_tpu.models.cwt import cwt_core, _process_gmw_wavelet
    from ssqueezepy_tpu.models.wavelets import Wavelet
    from ssqueezepy_tpu.models.ssqueezing import (
        _compute_associated_frequencies, _natural_bins)
    from ssqueezepy_tpu.ops.ssq_kernels import ssq_bin_params, ssqueeze_fast
    from ssqueezepy_tpu.ops.pad import padsignal, pad_params
    from ssqueezepy_tpu.utils.cwt_utils import process_scales, \
        nv_from_scales

    B, N = args.batch, args.n
    rng = np.random.default_rng(0)

    wavelet = _process_gmw_wavelet(('gmw', {'dtype': 'float32'}), True)
    wavelet = Wavelet._init_if_not_isinstance(wavelet, N=N)
    scales = process_scales('log-piecewise', N, wavelet, nv=16)
    na = len(scales)
    n_up, n1, _ = pad_params(N, 'reflect')
    ssq_freqs = _compute_associated_frequencies(
        scales, N, wavelet, 'log-piecewise', 'peak', True, 1.0, 'cwt')
    const = np.asarray(np.log(2) / nv_from_scales(scales), np.float32)
    params = dict(ssq_bin_params(ssq_freqs, True))
    natural = _natural_bins('cwt', scales, ssq_freqs, params, True, na, 1.0)
    gamma = float(10 * np.finfo(np.float32).eps)
    nbins = params['omax'] + 1
    scales_j = jnp.asarray(np.asarray(scales).reshape(-1, 1), jnp.float32)
    const_j = jnp.asarray(const)

    def features(x2d):
        """(B, N) -> (B, 2*nbins): |Tx| averaged over each half of the
        record (direction = which half holds the high rows), through the
        differentiable fast path (custom VJPs end-to-end)."""
        xp = padsignal(x2d, 'reflect')
        Wx, dWx = cwt_core(xp, wavelet, scales_j, 1.0, True, True, n1, N,
                           rpadded=False, is_2d=True)
        Tx = ssqueeze_fast(Wx, dWx, None, const_j, logscale=True,
                           flipud=True, gamma=gamma, Sfs=None,
                           params=params,
                           natural_bins=np.asarray(natural, np.int32))
        a = jnp.log1p(Tx.abs())                           # (B, nbins, N)
        f = jnp.concatenate([a[..., :N // 2].mean(-1),
                             a[..., N // 2:].mean(-1)], axis=-1)
        # per-sample standardization: the raw squeeze magnitudes are
        # O(1e-2) and would stall the fixed-lr logistic readout
        return ((f - f.mean(-1, keepdims=True))
                / (f.std(-1, keepdims=True) + 1e-6))

    def loss_fn(wb, x2d, y):
        W, b = wb
        logits = features(x2d) @ W + b
        p = jax.nn.sigmoid(logits)
        return -jnp.mean(y * jnp.log(p + 1e-7)
                         + (1 - y) * jnp.log(1 - p + 1e-7))

    lr = 0.3
    W0 = jnp.zeros((2 * nbins,), jnp.float32)
    b0 = jnp.zeros((), jnp.float32)

    if args.mesh:
        from jax.sharding import PartitionSpec as P, NamedSharding
        from ssqueezepy_tpu.parallel import make_mesh
        mesh = make_mesh(batch=2, scale=4)
        data_sh = NamedSharding(mesh, P('batch', None))

        @jax.jit
        def step(wb, x2d, y):
            x2d = jax.lax.with_sharding_constraint(x2d, data_sh)
            l, g = jax.value_and_grad(loss_fn)(wb, x2d, y)
            return l, (wb[0] - lr * g[0], wb[1] - lr * g[1])
    else:
        @jax.jit
        def step(wb, x2d, y):
            l, g = jax.value_and_grad(loss_fn)(wb, x2d, y)
            return l, (wb[0] - lr * g[0], wb[1] - lr * g[1])

    wb = (W0, b0)
    t0 = time.time()
    for it in range(args.steps):
        xb, yb = make_batch(rng, B, N)
        l, wb = step(wb, jnp.asarray(xb), jnp.asarray(yb))
        if it % 10 == 0 or it == args.steps - 1:
            print('step %3d  loss %.4f' % (it, float(l)), flush=True)

    xt, yt = make_batch(rng, 256, N)
    logits = features(jnp.asarray(xt)) @ wb[0] + wb[1]
    acc = float(((np.asarray(logits) > 0) == (yt > .5)).mean())
    print('test accuracy: %.3f  (%.1fs)' % (acc, time.time() - t0))
    assert acc > 0.9, "chirp-direction readout failed to train"


if __name__ == '__main__':
    main()
