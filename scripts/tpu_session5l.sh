#!/bin/bash
# Round-5 session L: CWT direct-pipeline (T, BAND) sweep points.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5l.log
: > "$LOG"
for ENVV in "SSQTPU_SCATTER_T=512" "SSQTPU_SCATTER_BAND=16" "SSQTPU_SCATTER_BAND=32" ""; do
  echo "=== point: ${ENVV:-default} ===" | tee -a "$LOG"
  env $ENVV timeout 2000 python scripts/tpu_tilesweep_cwt.py 2>&1 | tee -a "$LOG"
  echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
done
echo "ALL-DONE-S5L" | tee -a "$LOG"
