#!/bin/bash
# Round-5 session N: tile descent — CWT T=128/64, STFT T=256,
# order-2 CWT T=256.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5n.log
: > "$LOG"
for TT in 128 64; do
  echo "=== cwt T=$TT ===" | tee -a "$LOG"
  SSQTPU_SCATTER_T=$TT timeout 2000 python scripts/tpu_tilesweep_cwt.py 2>&1 | tee -a "$LOG"
  echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
done
echo "=== stft T=256 ===" | tee -a "$LOG"
SSQTPU_SCATTER_T=256 timeout 2400 python scripts/tpu_tilesweep.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5N" | tee -a "$LOG"
