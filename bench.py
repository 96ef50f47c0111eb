#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark vs the reference's own protocol
(/root/reference/examples/benchmarks.py:79-126, README.md:40-54):

  * x = np.random.randn(N) (white noise — the scatter's worst case),
  * float32, padded transforms,
  * scales = process_scales('log-piecewise', 160000)[:300] and the
    matching precomputed ssq_freqs, shared by BOTH N (so every cell has
    a ~300-row output), n_fft = 598,
  * mean of 10 runs after 3 warmups,
  * input device-resident (the reference GPU's H2D is ~microseconds over
    PCIe; this machine's tunnel pays ~50 ms per upload, which would
    benchmark the tunnel, not the transform).

Baselines: the reference's GTX-1070 column (README.md:47-54).
North star: ssq_cwt @ 160k = 0.0856 s = 11.68 transforms/s/device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"sweep": {...}}. The headline cell (ssq_cwt@160k) always runs first;
remaining cells run until BENCH_BUDGET_S (default 460 s) is exhausted —
each cell costs a fresh ~2-4 min XLA compile through the remote tunnel,
so a full 8-cell sweep does not fit the driver window. Completed cells
land in "sweep" with their own vs_ref_gpu ratios.
"""
import json
import os
import time

import numpy as np

# (transform, N) -> reference GTX 1070 seconds (README.md:47-54)
REF_GPU = {('ssq_cwt', 160000): 0.0856, ('ssq_cwt', 10000): 0.00941,
           ('cwt', 160000): 0.0367, ('cwt', 10000): 0.00393,
           ('stft', 160000): 0.0643, ('stft', 10000): 0.00534,
           ('ssq_stft', 160000): 0.159, ('ssq_stft', 10000): 0.0278,
           # batched cells: per-transform bar is the reference's single-
           # transform time (the reference has no batched protocol)
           ('cwt_b16', 10000): 0.00393,
           ('ssq_cwt_b4', 160000): 0.0856,
           # Tx-only (get_Wx=False) extension: same reference bar — the
           # reference always materializes Wx, this cell shows what
           # dropping it is worth on TPU
           ('ssq_cwt_txonly', 160000): 0.0856,
           # second-order flagships: NO reference analog — ratio is vs
           # the reference's FIRST-order transform (an upper bar: the
           # order-2 transform does strictly more work)
           ('ssq_cwt2', 160000): 0.0856,
           ('ssq_stft2', 160000): 0.159}


def main():
    # startup watchdog: a wedged device tunnel can hang backend init
    # itself (before any cell alarm is armed) — guarantee ONE JSON line
    # inside the driver window no matter what
    import signal as _sig

    def _startup_timeout(signum, frame):
        print(json.dumps({
            "metric": "ssq_cwt_160k_300rows_transforms_per_sec",
            "value": 0.0, "unit": "transforms/sec/chip",
            "vs_baseline": 0.0, "sweep": {},
            "error": "backend init / first compile hung (tunnel wedged)"}),
            flush=True)
        import os
        os._exit(3)

    _sig.signal(_sig.SIGALRM, _startup_timeout)
    _sig.alarm(max(int(float(os.environ.get('BENCH_BUDGET_S', '460'))) - 20,
                   60))

    import jax.numpy as jnp
    import ssqueezepy_tpu as stq
    from ssqueezepy_tpu.models.wavelets import Wavelet
    from ssqueezepy_tpu.utils.cwt_utils import process_scales
    from ssqueezepy_tpu.models.ssqueezing import \
        _compute_associated_frequencies

    t_start = time.time()
    budget = float(os.environ.get('BENCH_BUDGET_S', '460'))

    N1 = 160000
    n_fft = 300 * 2 - 2
    wav_spec = ('gmw', {'dtype': 'float32'})
    wav = Wavelet(wav_spec)
    scales = process_scales('log-piecewise', N1, wav)[:300]
    ssq_freqs = _compute_associated_frequencies(
        scales, N1, wav, 'log-piecewise', maprange='peak', was_padded=True,
        dt=1, transform='cwt')

    rng = np.random.default_rng(0)
    xs = {N: jnp.asarray(rng.standard_normal(N).astype(np.float32))
          for N in (160000, 10000)}
    xb16 = jnp.asarray(rng.standard_normal((16, 10000)).astype(np.float32))
    xb4 = jnp.asarray(rng.standard_normal((4, 160000)).astype(np.float32))

    def timecell(fn, n_warm=3, n_runs=10):
        for _ in range(n_warm):
            out = fn()
        _ = np.asarray(out[0].re.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(n_runs):
            out = fn()
        _ = np.asarray(out[0].re.ravel()[0:1])
        return (time.perf_counter() - t0) / n_runs

    kw_cwt = dict(wavelet=wav_spec, scales=scales)

    def cell(name, N):
        if name == 'cwt_b16':
            return lambda: stq.cwt(xb16, **kw_cwt)
        if name == 'ssq_cwt_b4':
            return lambda: stq.ssq_cwt(xb4, ssq_freqs=ssq_freqs, **kw_cwt)
        x = xs[N]
        if name == 'ssq_cwt':
            return lambda: stq.ssq_cwt(x, ssq_freqs=ssq_freqs, **kw_cwt)
        if name == 'ssq_cwt_txonly':
            return lambda: stq.ssq_cwt(x, ssq_freqs=ssq_freqs,
                                       get_Wx=False, **kw_cwt)
        if name == 'cwt':
            return lambda: stq.cwt(x, **kw_cwt)
        if name == 'stft':
            return lambda: (stq.stft(x, n_fft=n_fft),)
        if name == 'ssq_cwt2':
            return lambda: stq.ssq_cwt2(x, wav_spec, scales=scales)
        if name == 'ssq_stft2':
            return lambda: stq.ssq_stft2(x, n_fft=n_fft)
        return lambda: stq.ssq_stft(x, n_fft=n_fft)

    # headline first; then the rest, most-informative first (round 5:
    # with the persistent cache warm, per-cell cost is dominated by the
    # ~60 s executable load through the tunnel — the driver's 460 s
    # window fits ~7 cells, so the headline-class cells go first and
    # the dispatch-bound 10k cells last); batched cells time B
    # transforms per call (recorded per-transform)
    order = [('ssq_cwt', 160000), ('ssq_stft', 160000),
             ('ssq_cwt2', 160000), ('ssq_stft2', 160000),
             ('ssq_cwt_txonly', 160000), ('ssq_cwt_b4', 160000),
             ('cwt', 160000), ('stft', 160000), ('cwt_b16', 10000),
             ('ssq_cwt', 10000), ('ssq_stft', 10000), ('cwt', 10000),
             ('stft', 10000)]
    sweep = {}
    headline = None
    # HARD per-cell guard: a fresh remote compile costs 2-5 min, so a
    # cell started inside the budget can still blow past the driver's
    # process timeout and lose the whole JSON line. SIGALRM aborts the
    # straggler (the in-flight device work drains on its own; only the
    # blocking host fetch is interrupted) and we print what completed.
    # The headline cell gets the full window.
    import signal

    class _CellTimeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _CellTimeout()

    signal.alarm(0)                     # startup watchdog stands down
    signal.signal(signal.SIGALRM, _alarm)
    deadline = t_start + budget
    for name, N in order:
        remaining = deadline - time.time()
        if headline is not None and remaining < 30:
            break
        signal.alarm(max(int(remaining), 60))
        try:
            sec = timecell(cell(name, N))
        except _CellTimeout:
            break
        except Exception:  # tunnel/compile failure — keep what we have
            break
        finally:
            signal.alarm(0)
        if name == 'cwt_b16':
            sec /= 16                      # per-transform
        elif name == 'ssq_cwt_b4':
            sec /= 4                       # per-transform
        ratio = round(REF_GPU[(name, N)] / sec, 3)
        sweep[f'{name}_{N // 1000}k'] = {
            'sec': round(sec, 5), 'transforms_per_sec': round(1 / sec, 2),
            'vs_ref_gpu': ratio}
        if headline is None:
            headline = sec
            # per-call tunnel dispatch floor: a no-op jit timed with the
            # same fetch protocol — the irreducible host-side cost every
            # small-N cell pays (substantiates the cwt@10k analysis)
            try:
                import jax
                nop = jax.jit(lambda v: v * 2.0)
                y = xs[10000]
                signal.alarm(60)
                for _ in range(3):
                    y2 = nop(y)
                _ = np.asarray(y2.ravel()[0:1])
                t0 = time.perf_counter()
                for _ in range(10):
                    y2 = nop(y)
                _ = np.asarray(y2.ravel()[0:1])
                sweep['dispatch_floor'] = {
                    'sec': round((time.perf_counter() - t0) / 10, 5)}
            except Exception:
                pass
            finally:
                signal.alarm(0)

    if headline is None:  # headline compile outran the budget or errored
        print(json.dumps({
            "metric": "ssq_cwt_160k_300rows_transforms_per_sec",
            "value": 0.0, "unit": "transforms/sec/chip",
            "vs_baseline": 0.0, "sweep": sweep,
            "error": "headline cell timed out or failed within budget"}))
        return
    tps = 1.0 / headline
    print(json.dumps({
        "metric": "ssq_cwt_160k_300rows_transforms_per_sec",
        "value": round(tps, 3),
        "unit": "transforms/sec/chip",
        "vs_baseline": round(tps / (1.0 / REF_GPU[('ssq_cwt', 160000)]), 3),
        "sweep": sweep,
    }))


if __name__ == '__main__':
    main()
