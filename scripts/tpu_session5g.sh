#!/bin/bash
# Round-5 session G: (1) FSST2 aux-lowprec A/B (keep winner),
# (2) batched-direct ssq_cwt_b4 measurement, (3) full sweep re-warm.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5g.log
: > "$LOG"
python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import os, signal, time
def bail(signum, frame):
    print('PROBE: wedged (900s), bail', flush=True); os._exit(42)
signal.signal(signal.SIGALRM, bail); signal.alarm(900)
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
v = np.asarray(jnp.ones(8).sum().ravel()[0:1])
signal.alarm(0)
print('PROBE: ok sum=%s %.1fs' % (v, time.time() - t0), flush=True)
PYEOF

echo "=== LEG1 fsst2 lowprec A/B + b4 direct ===" | tee -a "$LOG"
timeout 3000 python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import sys, time
sys.path.insert(0, '.')
import numpy as np, jax, jax.numpy as jnp
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales
from ssqueezepy_tpu.models.ssqueezing import _compute_associated_frequencies

def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))

def timeit(fn, warm=3, reps=10):
    for _ in range(warm):
        out = fn()
    sync(out[0].re)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0].re)
    return (time.perf_counter() - t0) / reps

N = 160000
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N).astype(np.float32)); sync(x)

outs = {}
for lp in (True, False):
    stq.configure(ssq_lowprec_deriv=lp)
    s = timeit(lambda: stq.ssq_stft2(x, n_fft=598))
    outs[lp] = s
    print('ssq_stft2 aux_lowprec=%s: %.2f ms (%.2fx)' %
          (lp, s*1e3, 0.159/s), flush=True)
stq.configure(ssq_lowprec_deriv=True)

wav_spec = ('gmw', {'dtype': 'float32'})
wav = Wavelet(wav_spec)
scales = process_scales('log-piecewise', N, wav)[:300]
ssq_freqs = _compute_associated_frequencies(
    scales, N, wav, 'log-piecewise', maprange='peak', was_padded=True,
    dt=1, transform='cwt')
xb4 = jnp.asarray(rng.standard_normal((4, N)).astype(np.float32)); sync(xb4)
s = timeit(lambda: stq.ssq_cwt(xb4, wavelet=wav_spec, scales=scales,
                               ssq_freqs=ssq_freqs))
print('ssq_cwt_b4 direct(lax.map): %.2f ms total -> %.2f ms/transform '
      '(%.2fx)' % (s*1e3, s/4*1e3, 0.0856/(s/4)), flush=True)
# batched vs single equality on chip (bit-exact by construction)
Txb, Wxb, *_ = stq.ssq_cwt(xb4, wavelet=wav_spec, scales=scales,
                           ssq_freqs=ssq_freqs)
Tx1, Wx1, *_ = stq.ssq_cwt(xb4[0], wavelet=wav_spec, scales=scales,
                           ssq_freqs=ssq_freqs)
d = jax.jit(lambda a, b: jnp.abs(a - b).max())(Txb.re[0], Tx1.re)
print('b4[0] vs single maxdiff:', float(np.asarray(d)), flush=True)
print('LEG1-DONE', flush=True)
PYEOF
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 bench full sweep (re-warm) ===" | tee -a "$LOG"
BENCH_BUDGET_S=3000 timeout 3200 python bench.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5G" | tee -a "$LOG"
