#!/bin/bash
# Round-5 session E: (1) order-2 attribution, (2) real-TPU pytest tier
# re-run (incl. the fixed scalar-const path).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5e.log
: > "$LOG"

probe() {
python - <<'PYEOF'
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
}

probe 2>&1 | tee -a "$LOG"
rc=${PIPESTATUS[0]}
if [ $rc -ne 0 ]; then echo "S5E: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 order-2 attribution ===" | tee -a "$LOG"
timeout 3000 python scripts/tpu_order2_prof.py 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 pytest tpu tier ===" | tee -a "$LOG"
timeout 2400 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S5E" | tee -a "$LOG"
