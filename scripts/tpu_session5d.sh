#!/bin/bash
# Round-5 session D: /verify drive — canonical public-surface drive on
# the real TPU (incl. the banded-STFT ssq_stft probe and the fixed
# scalar-const scales path), then bench.py (perf changes landed).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5d.log
: > "$LOG"

probe() {
python - <<'EOF'
import os, signal, time
def bail(signum, frame):
    print('PROBE: wedged (900s), bail', flush=True); os._exit(42)
signal.signal(signal.SIGALRM, bail); signal.alarm(900)
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
v = np.asarray(jnp.ones(8).sum().ravel()[0:1])
signal.alarm(0)
print('PROBE: ok sum=%s %.1fs' % (v, time.time() - t0), flush=True)
EOF
}

probe 2>&1 | tee -a "$LOG"
rc=${PIPESTATUS[0]}
if [ $rc -ne 0 ]; then echo "S5D: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 verify drive ===" | tee -a "$LOG"
timeout 1800 python - <<'EOF' 2>&1 | tee -a "$LOG"
import numpy as np
import ssqueezepy_tpu as stq
N = 19531                       # odd, non-pow2: probes pruning geometry
t = np.linspace(0, 6, N, endpoint=False)
x = np.cos(2*np.pi*2*np.exp(t/2)).astype(np.float32)
Tx, Wx, fr, sc = stq.ssq_cwt(x, astensor=False)
print('mad_rms:', stq.toolkit.mad_rms(x, stq.issq_cwt(Tx)))  # want < 0.1
Wx2, _ = stq.cwt(x, scales='log')
print('icwt:', stq.toolkit.mad_rms(x, stq.icwt(Wx2, scales='log')))
# banded-STFT public-surface probe (the round-5 kernel)
Txs, Sxs, frs, Sfs = stq.ssq_stft(x, n_fft=512)
print('issq_stft mad_rms:',
      stq.toolkit.mad_rms(x, stq.issq_stft(Txs, n_fft=512)))
# scalar-const custom scales (round-5 fix) on chip
scales = np.geomspace(1., 48., 65).reshape(-1, 1)
Tg, Wg, *_ = stq.ssq_cwt(x[:4096], ('gmw', {'dtype': 'float32'}),
                         scales=scales, astensor=False)
print('scalar-const finite:', np.isfinite(Tg).all(), Tg.shape)
print('VERIFY-LEG-DONE', flush=True)
EOF
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 bench ===" | tee -a "$LOG"
BENCH_BUDGET_S=3000 timeout 3200 python bench.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S5D" | tee -a "$LOG"
