#!/bin/bash
# Round-5 session J: STFT scatter tile sweep (T=512 vs default 1024).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5j.log
: > "$LOG"
echo "=== T=512 ===" | tee -a "$LOG"
SSQTPU_SCATTER_T=512 timeout 2700 python scripts/tpu_tilesweep.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "=== T=1024 (default, cached) ===" | tee -a "$LOG"
timeout 1200 python scripts/tpu_tilesweep.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5J" | tee -a "$LOG"
