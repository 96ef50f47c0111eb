#!/bin/bash
# Round-5 session U: closing hardware stamp — TPU pytest tier.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5u.log
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
if [ $rc -ne 0 ]; then echo "S5U: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi
timeout 2400 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5U" | tee -a "$LOG"
