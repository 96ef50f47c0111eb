#!/bin/bash
# Round-5 session K: final default-env bench (confirms the driver's
# BENCH_r05 run is fully cached with the T=512 STFT defaults).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5k.log
: > "$LOG"
BENCH_BUDGET_S=1800 timeout 2000 python bench.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5K" | tee -a "$LOG"
