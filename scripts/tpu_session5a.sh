#!/bin/bash
# Round-5 session A: (1) banded STFT table-kernel A/B + on-chip equality
# (VERDICT r4 #1), (2) streaming + multirate hardware numbers
# (VERDICT r4 #4).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5a.log
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
if [ $rc -ne 0 ]; then echo "S5A: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 stft band A/B ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_stft_band.py 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 streaming + multirate ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_streaming_bench.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S5A" | tee -a "$LOG"
