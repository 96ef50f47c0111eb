#!/bin/bash
# Round-5 session C: (1) real-TPU pytest tier (small-N Mosaic smoke),
# (2) banded STFT A/B retry #2 (phase moved before stage-2 dot).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5c.log
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
if [ $rc -ne 0 ]; then echo "S5C: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 pytest tpu tier ===" | tee -a "$LOG"
timeout 3000 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 stft band A/B (retry 2) ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_stft_band.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S5C" | tee -a "$LOG"
