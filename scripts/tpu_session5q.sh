#!/bin/bash
# Round-5 session Q: TPU pytest tier under the T=256 defaults (final
# hardware green + tier cache warm).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5q.log
: > "$LOG"
timeout 3000 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5Q" | tee -a "$LOG"
