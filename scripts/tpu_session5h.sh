#!/bin/bash
# Round-5 session H (final): full real-TPU pytest tier (incl. the fused
# order-2 smoke test) + a fresh stage profile for PROFILE.md.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5h.log
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

echo "=== LEG1 pytest tpu tier (full) ===" | tee -a "$LOG"
timeout 3000 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 stage profile ===" | tee -a "$LOG"
timeout 2400 python scripts/profile_ssq.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5H" | tee -a "$LOG"
