#!/bin/bash
# Retry the TPU measurement session until the tunnel recovers.
# One TPU process at a time; probe failure -> sleep and retry.
set -u
cd /root/repo
for i in $(seq 1 40); do
  echo "=== ATTEMPT $i $(date -u +%H:%M:%S)"
  bash scripts/tpu_chain.sh bash scripts/tpu_session.sh
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== SESSION COMPLETE $(date -u +%H:%M:%S)"
    exit 0
  fi
  echo "=== attempt $i failed rc=$rc; sleeping 600s"
  sleep 600
done
echo "=== GAVE UP after 40 attempts"
exit 1
