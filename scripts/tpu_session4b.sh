#!/bin/bash
# Round-4 session B: (1) end-to-end verify drive of the v2 (zero-prep)
# pipelines on chip, (2) full bench sweep incl. the new cells (batched
# flagship, Tx-only, order-2), (3) streaming + multirate A/B.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session4b.log
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
if [ $rc -ne 0 ]; then echo "S4B: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 verify drive ===" | tee -a "$LOG"
timeout 900 python - <<'EOF' 2>&1 | tee -a "$LOG"
import numpy as np
import ssqueezepy_tpu as stq
N = 19531
t = np.linspace(0, 6, N, endpoint=False)
x = np.cos(2*np.pi*2*np.exp(t/2)).astype(np.float32)
Tx, Wx, fr, sc = stq.ssq_cwt(x, astensor=False)
print('mad_rms:', stq.toolkit.mad_rms(x, stq.issq_cwt(Tx)))
Tx2, Wx2, _, _ = stq.ssq_cwt(x, astensor=False, get_Wx=False)
assert Wx2 is None
print('txonly colsum rel:',
      np.abs(Tx2.sum(-2) - Tx.sum(-2)).max() / np.abs(Tx).max())
Txs, Sxs, frs, sfs = stq.ssq_stft(x, n_fft=512)
print('issq_stft mad_rms:',
      stq.toolkit.mad_rms(x, stq.issq_stft(Txs, n_fft=512)))
print('VERIFY-LEG-DONE', flush=True)
EOF
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 bench full sweep ===" | tee -a "$LOG"
BENCH_BUDGET_S=2500 timeout 2700 python bench.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG3 streaming + multirate ===" | tee -a "$LOG"
timeout 2400 python scripts/tpu_streaming_bench.py 2>&1 | tee -a "$LOG"
echo "LEG3 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S4B" | tee -a "$LOG"
