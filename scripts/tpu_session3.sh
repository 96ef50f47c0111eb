#!/bin/bash
# Round-3 continuation session (fresh container: no XLA compile cache,
# prior session results lost). Decide the scatter mode by END-TO-END
# flagship time, then sweep bench cells under the winner. Output tees
# to scripts/tpu_session3.log for commit.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session3.log
: > "$LOG"

probe() {
python - <<'EOF'
import os, signal, time
def bail(signum, frame):
    print('PROBE: wedged (600s), bail', flush=True); os._exit(42)
signal.signal(signal.SIGALRM, bail); signal.alarm(600)
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
v = np.asarray(jnp.ones(8).sum().ravel()[0:1])
signal.alarm(0)
print('PROBE: ok sum=%s %.1fs' % (v, time.time() - t0), flush=True)
EOF
}

probe 2>&1 | tee -a "$LOG"
rc=${PIPESTATUS[0]}
if [ $rc -ne 0 ]; then echo "SESSION3: probe failed rc=$rc" | tee -a "$LOG"; exit $rc; fi

run_mode() {  # label env...
  local label=$1; shift
  echo "=== MODE $label  $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 700 env "$@" python scripts/tpu_time.py 2>&1 | tee -a "$LOG"
}

run_mode default SSQTPU_SCATTER_MODE=group SSQTPU_SCATTER_TIER2=loop
run_mode horner+fold SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold
run_mode static SSQTPU_SCATTER_MODE=static SSQTPU_SCATTER_TIER2=loop

# pick winner: smallest "ssq_cwt X ms" seen, rerun bench under it
best=$(grep -o 'ssq_cwt [0-9.]* ms' "$LOG" | awk '{print $2}' | sort -n | head -1)
echo "=== BEST e2e: $best ms" | tee -a "$LOG"

# map best back to its mode block
win_env="SSQTPU_SCATTER_MODE=group SSQTPU_SCATTER_TIER2=loop"
if grep -A3 'MODE horner+fold' "$LOG" | grep -q "ssq_cwt $best ms"; then
  win_env="SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold"
elif grep -A3 'MODE static' "$LOG" | grep -q "ssq_cwt $best ms"; then
  win_env="SSQTPU_SCATTER_MODE=static SSQTPU_SCATTER_TIER2=loop"
fi
echo "=== WINNER env: $win_env" | tee -a "$LOG"

echo "=== STAGE bench  $(date -u +%H:%M:%S)" | tee -a "$LOG"
timeout 560 env $win_env python bench.py 2>&1 | tee -a "$LOG"
echo "=== SESSION3 DONE  $(date -u +%H:%M:%S)" | tee -a "$LOG"
