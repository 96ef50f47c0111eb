#!/bin/bash
# Round-5 session B: (1) banded STFT A/B retry (pl.multiple_of fix),
# (2) flattened tier-1 scatter A/B, (3) multirate streaming leg retry.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5b.log
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
if [ $rc -ne 0 ]; then echo "S5B: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

echo "=== LEG1 stft band A/B (retry) ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_stft_band.py 2>&1 | tee -a "$LOG"
echo "LEG1 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG2 scatter flat A/B ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_scatter_flat.py 2>&1 | tee -a "$LOG"
echo "LEG2 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "=== LEG3 multirate (retry) ===" | tee -a "$LOG"
timeout 2700 python scripts/tpu_streaming_bench.py 2>&1 | tee -a "$LOG"
echo "LEG3 rc=${PIPESTATUS[0]}" | tee -a "$LOG"

echo "ALL-DONE-S5B" | tee -a "$LOG"
