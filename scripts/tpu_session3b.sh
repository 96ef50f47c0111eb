#!/bin/bash
# Corrected A/B legs (session3's failed on sys.path): end-to-end
# flagship time under the three scatter-mode combos. If a non-default
# combo wins by >5%, rerun bench.py under it for the record.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session3.log

run_mode() {  # label env...
  local label=$1; shift
  echo "=== MODE $label  $(date -u +%H:%M:%S)" | tee -a "$LOG"
  timeout 700 env "$@" python scripts/tpu_time.py 2>&1 | tee -a "$LOG"
}

run_mode default SSQTPU_SCATTER_MODE=group SSQTPU_SCATTER_TIER2=loop
run_mode horner+fold SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold
run_mode static SSQTPU_SCATTER_MODE=static SSQTPU_SCATTER_TIER2=loop
echo "=== SESSION3B DONE  $(date -u +%H:%M:%S)" | tee -a "$LOG"
