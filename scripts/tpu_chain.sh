#!/bin/bash
# One-process-at-a-time TPU work chain: probe (clean exit if wedged),
# then whatever commands follow. Each stage runs only if the previous
# succeeded. Usage: bash scripts/tpu_chain.sh <cmd...>
set -u
cd /root/repo

python - <<'EOF'
import signal, sys, time

def bail(signum, frame):
    print('PROBE: tunnel wedged (no response in 1800s), exiting cleanly',
          flush=True)
    # exit without killing any in-flight RPC thread abruptly is not
    # possible from SIGALRM; os._exit avoids interpreter teardown hangs
    import os
    os._exit(42)

signal.signal(signal.SIGALRM, bail)
# LONG wait: a recovering tunnel answers eventually; giving up early
# drops the RPC mid-flight and re-wedges the server (observed)
signal.alarm(1800)
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
print('PROBE: backend init %.0fs' % (time.time() - t0), flush=True)
t0 = time.time()
v = np.asarray(jnp.ones(8).sum().ravel()[0:1])
signal.alarm(0)
print('PROBE: ok sum=%s roundtrip %.1fs' % (v, time.time() - t0),
      flush=True)
EOF
rc=$?
if [ $rc -ne 0 ]; then
  echo "CHAIN: probe failed rc=$rc, skipping stages"
  exit $rc
fi
echo "CHAIN: probe ok, running: $*"
"$@"
