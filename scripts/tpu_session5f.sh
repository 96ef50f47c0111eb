#!/bin/bash
# Round-5 session F: full bench sweep (re-measures the fused order-2
# cells post probe-memoization + per-transform b4 fix; warms the
# persistent compile cache for the driver's BENCH_r05 run).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5f.log
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
rc=$?
if [ $rc -ne 0 ]; then echo "S5F: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 bench full sweep ===" | tee -a "$LOG"
BENCH_BUDGET_S=3000 timeout 3200 python bench.py 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5F" | tee -a "$LOG"
