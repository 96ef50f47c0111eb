# -*- coding: utf-8 -*-
"""Banded STFT table-kernel A/B on the real TPU (VERDICT r4 #1).

The per-row banded filterbank support (ops/stft_conv._band_plan) landed
in round 4 default-on but was never measured on hardware. This script
times `stft` and `ssq_stft` at the benchmark shape with `stft_band`
on/off in ONE process (plans re-key via `exec_config_key`) and asserts
banded == unbanded on chip within the band's documented tail-mass
tolerance.

Sync discipline per CLAUDE.md: fetch a 1-element scalar to time; keep
everything device-resident (full-plane fetches through the tunnel cost
seconds).
"""
import sys
import time

sys.path.insert(0, '.')

import numpy as np
import jax
import jax.numpy as jnp
import ssqueezepy_tpu as stq


def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))


def timeit(fn, warm=3, reps=10):
    for _ in range(warm):
        out = fn()
    sync(out[0].re if hasattr(out[0], 're') else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0].re if hasattr(out[0], 're') else out[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    N = 160000
    n_fft = 598
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    sync(x)

    # report the band plan the default window gets at this shape
    from ssqueezepy_tpu.ops.stft_conv import (_band_plan, _next_fft_len)
    from ssqueezepy_tpu.models.stft import _window_key
    from ssqueezepy_tpu.models.windows import get_window
    win, dwin = get_window(None, n_fft, n_fft, derivative=True,
                           dtype='float32')
    wk = _window_key(win, dwin)
    Np2 = _next_fft_len(N + n_fft - 1)
    plan = _band_plan(wk, n_fft, Np2, True)
    rows0 = Np2 // 512
    print('band plan: br=%s of rows0=%s (%.1fx fewer table rows)'
          % (plan[1] if plan else None, rows0,
             rows0 / plan[1] if plan else 1), flush=True)

    results = {}
    outs = {}
    for band in (True, False):
        stq.configure(stft_band=band)
        tag = 'band' if band else 'full'
        sec, out = timeit(lambda: (stq.stft(x, n_fft=n_fft),))
        results[f'stft_{tag}'] = sec
        outs[f'stft_{tag}'] = out[0]
        print(f'stft {tag}: {sec * 1e3:.2f} ms', flush=True)

        sec, out = timeit(lambda: stq.ssq_stft(x, n_fft=n_fft))
        results[f'ssq_stft_{tag}'] = sec
        outs[f'ssq_stft_{tag}'] = (out[0], out[1])
        print(f'ssq_stft {tag}: {sec * 1e3:.2f} ms '
              f'(vs ref GPU 159 ms: {0.159 / sec:.2f}x)', flush=True)

    # on-chip equality (relative max diff, device-side reduction)
    @jax.jit
    def relmax(a, b, ref):
        return jnp.abs(a - b).max() / jnp.abs(ref).max()

    s_b, s_f = outs['stft_band'], outs['stft_full']
    print('stft banded-vs-full relmax re: %.3e im: %.3e' % (
        float(np.asarray(relmax(s_b.re, s_f.re, s_f.re))),
        float(np.asarray(relmax(s_b.im, s_f.im, s_f.im)))), flush=True)
    (t_b, x_b), (t_f, x_f) = outs['ssq_stft_band'], outs['ssq_stft_full']
    print('ssq_stft Tx banded-vs-full relmax re: %.3e im: %.3e' % (
        float(np.asarray(relmax(t_b.re, t_f.re, t_f.re))),
        float(np.asarray(relmax(t_b.im, t_f.im, t_f.im)))), flush=True)
    print('ssq_stft Sx banded-vs-full relmax re: %.3e' % (
        float(np.asarray(relmax(x_b.re, x_f.re, x_f.re)))), flush=True)

    sp = results['ssq_stft_full'] / results['ssq_stft_band']
    print('SPEEDUP ssq_stft band: %.2fx (%.2f -> %.2f ms)' % (
        sp, results['ssq_stft_full'] * 1e3,
        results['ssq_stft_band'] * 1e3), flush=True)
    print('STFT-BAND-DONE', flush=True)


if __name__ == '__main__':
    main()
