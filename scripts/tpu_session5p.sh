#!/bin/bash
# Round-5 session P: full default-env bench with the T=256 defaults
# (final numbers + driver cache warm for every cell incl. small-N).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5p.log
: > "$LOG"
BENCH_BUDGET_S=2400 timeout 2600 python bench.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5P" | tee -a "$LOG"
