#!/bin/bash
# Full TPU measurement session, one process at a time, run via
# scripts/tpu_chain.sh (probe first). Ordered so a short recovery
# window still answers the decision-critical questions first:
#   1. redesign A/B (full vs horner vs fold, incl. band variants)
#   2. end-to-end flagship times under the candidate modes
#   3. bench sweep (BENCH_r03 material)
#   4. stage profile
#   5. structural diagnostics (cheapest to drop)
# Timeouts are generous: a degraded tunnel runs ~10x slow, and killing
# a TPU process mid-RPC re-wedges the server for ~30 min (CLAUDE.md).
set -u
cd /root/repo

echo "=== STAGE redesign-ab  $(date -u +%H:%M:%S)"
timeout 3600 python scripts/tpu_scatter_ablate.py full horner fold \
    horner:B=16 fold:B=16 horner:B=12
echo "=== STAGE mode-e2e  $(date -u +%H:%M:%S)"
timeout 1800 python scripts/tpu_time.py
timeout 1800 env SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold \
    python scripts/tpu_time.py
timeout 1800 env SSQTPU_SCATTER_MODE=horner SSQTPU_SCATTER_TIER2=fold \
    SSQTPU_SCATTER_BAND=16 python scripts/tpu_time.py
echo "=== STAGE bench  $(date -u +%H:%M:%S)"
timeout 1200 python bench.py
echo "=== STAGE profile  $(date -u +%H:%M:%S)"
timeout 3000 python scripts/profile_ssq.py
echo "=== STAGE diagnostics  $(date -u +%H:%M:%S)"
timeout 3600 python scripts/tpu_scatter_ablate.py croll not2 not1 \
    noroll fixed
echo "=== SESSION DONE  $(date -u +%H:%M:%S)"
