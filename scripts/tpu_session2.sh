#!/bin/bash
# Follow-up TPU measurement session (run AFTER tpu_session.sh's results
# are in): band sweep for the winning scatter modes + end-to-end A/Bs.
# Run via scripts/tpu_chain.sh (probe first).
set -u
cd /root/repo

echo "=== STAGE band-ablate  $(date -u +%H:%M:%S)"
timeout 2400 python scripts/tpu_scatter_ablate.py full fold:B=16 \
    horner:B=16 fold:B=12 horner:B=12
echo "=== STAGE mode-e2e  $(date -u +%H:%M:%S)"
timeout 1200 env SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold \
    python scripts/tpu_time.py
timeout 1200 env SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold \
    SSQTPU_SCATTER_BAND=16 python scripts/tpu_time.py
echo "=== SESSION2 DONE  $(date -u +%H:%M:%S)"
