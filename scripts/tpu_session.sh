#!/bin/bash
# Full TPU measurement session, one process at a time, run via
# scripts/tpu_chain.sh (probe first). Each stage appends to its log;
# later stages run even if an earlier one fails (they answer different
# questions).
set -u
cd /root/repo

echo "=== STAGE ablate  $(date -u +%H:%M:%S)"
timeout 2400 python scripts/tpu_scatter_ablate.py full fold horner \
    croll not2 not1 noroll fixed
echo "=== STAGE fold-e2e  $(date -u +%H:%M:%S)"
timeout 1200 python scripts/tpu_time.py
timeout 1200 env SSQTPU_SCATTER_TIER2=fold python scripts/tpu_time.py
echo "=== STAGE profile  $(date -u +%H:%M:%S)"
timeout 2400 python scripts/profile_ssq.py
echo "=== STAGE bench  $(date -u +%H:%M:%S)"
timeout 900 python bench.py
echo "=== SESSION DONE  $(date -u +%H:%M:%S)"
