#!/bin/bash
# Round-4 session A: (1) calibrate the scatter copy floor vs plain XLA
# (VERDICT #1a), (2) full stage profile incl. the ssq_stft squeeze
# attribution (VERDICT #2) and the order-2 flagships (VERDICT #3).
# Output tees to scripts/tpu_session4a.log for commit.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session4a.log
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
if [ $rc -ne 0 ]; then echo "S4A: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 calibrate ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_calibrate.py 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 profile ===" | tee -a "$LOG"
timeout 3600 python scripts/profile_ssq.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S4A" | tee -a "$LOG"
