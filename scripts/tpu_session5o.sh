#!/bin/bash
# Round-5 session O: last descent points — STFT family T=128,
# order-2 CWT T=256.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_session5o.log
: > "$LOG"
echo "=== stft T=128 ===" | tee -a "$LOG"
SSQTPU_SCATTER_T=128 timeout 2400 python scripts/tpu_tilesweep.py 2>&1 | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "=== cwt2 T=256 ===" | tee -a "$LOG"
SSQTPU_SCATTER_T=256 timeout 2000 python - <<'PYEOF' 2>&1 | tee -a "$LOG"
import sys, time
sys.path.insert(0, '.')
import numpy as np, jax, jax.numpy as jnp
import ssqueezepy_tpu as stq
from ssqueezepy_tpu.models.wavelets import Wavelet
from ssqueezepy_tpu.utils.cwt_utils import process_scales

def sync(a):
    np.asarray(jax.device_get(a.ravel()[0:1]))

N = 160000
wav_spec = ('gmw', {'dtype': 'float32'})
wav = Wavelet(wav_spec)
scales = process_scales('log-piecewise', N, wav)[:300]
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N).astype(np.float32)); sync(x)
for name, fn in (('ssq_cwt2', lambda: stq.ssq_cwt2(x, wav_spec, scales=scales)),
                 ('ssq_cwt_txonly', lambda: stq.ssq_cwt(
                     x, wavelet=wav_spec, scales=scales, get_Wx=False))):
    for _ in range(3):
        out = fn()
    sync(out[0].re)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn()
    sync(out[0].re)
    s = (time.perf_counter() - t0) / 10
    print('%s@160k T=256: %.2f ms (%.2fx)' % (name, s*1e3, 0.0856/s),
          flush=True)
print('O2-POINT-DONE', flush=True)
PYEOF
echo "rc=${PIPESTATUS[0]}" | tee -a "$LOG"
echo "ALL-DONE-S5O" | tee -a "$LOG"
