#!/bin/bash
# Round-5 session V: closing /verify drive (canonical happy path +
# probes) under the final defaults.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5v.log
: > "$LOG"
python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import os, signal, time
def bail(signum, frame):
    print('PROBE: wedged (1200s), bail', flush=True); os._exit(42)
signal.signal(signal.SIGALRM, bail); signal.alarm(1200)
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
v = np.asarray(jnp.ones(8).sum().ravel()[0:1])
signal.alarm(0)
print('PROBE: ok %.1fs' % (time.time() - t0), flush=True)
PYEOF
rc=$?
if [ $rc -ne 0 ]; then echo "S5V: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi
timeout 2400 python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import numpy as np
import ssqueezepy_tpu as stq
N = 19531                       # odd, non-pow2: probes pruning geometry
t = np.linspace(0, 6, N, endpoint=False)
x = np.cos(2*np.pi*2*np.exp(t/2)).astype(np.float32)
Tx, Wx, fr, sc = stq.ssq_cwt(x, astensor=False)
print('mad_rms:', stq.toolkit.mad_rms(x, stq.issq_cwt(Tx)))  # want < .1
Wx2, _ = stq.cwt(x, scales='log')
print('icwt:', stq.toolkit.mad_rms(x, stq.icwt(Wx2, scales='log')))
Txs, Sxs, frs, Sfs = stq.ssq_stft(x, n_fft=512)
print('issq_stft mad_rms:',
      stq.toolkit.mad_rms(x, stq.issq_stft(Txs, n_fft=512)))
T2, W2, *_ = stq.ssq_cwt2(x[:8192], astensor=False)
print('wsst2 mad_rms:',
      stq.toolkit.mad_rms(x[:8192], np.asarray(stq.issq_cwt(T2))))
print('VERIFY-LEG-DONE', flush=True)
PYEOF
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5V" | tee -a "$LOG"
