#!/bin/bash
# Round-5 session I: TPU pytest tier re-run (order-2 smoke test fixed
# to an FSST2-applicable length).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5i.log
: > "$LOG"
echo "=== pytest tpu tier ===" | tee -a "$LOG"
timeout 3000 python -m pytest tests_tpu -m tpu -q 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5I" | tee -a "$LOG"
