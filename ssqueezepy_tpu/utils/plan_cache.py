# -*- coding: utf-8 -*-
"""Persistent plan cache — the FFTW-"wisdom" analog.

The reference persists FFTW plans across sessions
(reference fft_utils.py:317-331, binary `utils/wisdom32/64` files). Here
the compiled-graph side is covered by XLA's compilation cache; this module
persists the *numeric plans* (scale grids, ssq frequency grids, squeeze
constants, bin-map parameters) whose host-side construction costs
~0.1-1 s cold (scale-bound searches, redundancy scans, center-frequency
integrals).

Entries are .npz files under `$SSQ_TPU_CACHE` (default
`~/.cache/ssqueezepy_tpu`), keyed by a hash of the plan spec. All
failures degrade silently to recomputation.
"""
import hashlib
import os
import threading

import numpy as np

__all__ = ['disk_memo', 'cache_dir']

_VERSION = 1
_lock = threading.Lock()


def cache_dir():
    d = os.environ.get('SSQ_TPU_CACHE',
                       os.path.join(os.path.expanduser('~'), '.cache',
                                    'ssqueezepy_tpu'))
    return d


def _path(key_obj):
    h = hashlib.sha256(repr((_VERSION, key_obj)).encode()).hexdigest()[:24]
    return os.path.join(cache_dir(), 'plan_%s.npz' % h)


def disk_memo(key_obj, builder):
    """Return builder() with transparent on-disk memoization.

    builder must return a tuple of (numpy arrays | scalars | None); the
    structure is restored exactly (scalars come back as 0-d arrays'
    `.item()`, None as None).
    """
    import json
    path = _path(key_obj)
    try:
        if os.path.exists(path):
            with np.load(path, allow_pickle=False) as z:
                n = int(z['__n'])
                out = []
                for i in range(n):
                    kind = int(z['__kind%d' % i])
                    if kind == 0:
                        out.append(None)
                    elif kind == 1:
                        out.append(z['v%d' % i].item())
                    elif kind == 3:
                        out.append(json.loads(str(z['v%d' % i])))
                    else:
                        out.append(z['v%d' % i])
                return tuple(out)
    except Exception:
        pass

    out = builder()
    try:
        payload = {'__n': np.asarray(len(out))}
        for i, v in enumerate(out):
            if v is None:
                payload['__kind%d' % i] = np.asarray(0)
            elif isinstance(v, (str, dict, list, bool)):
                payload['__kind%d' % i] = np.asarray(3)
                payload['v%d' % i] = np.asarray(json.dumps(v))
            elif np.isscalar(v) or getattr(v, 'ndim', None) == 0:
                payload['__kind%d' % i] = np.asarray(1)
                payload['v%d' % i] = np.asarray(v)
            else:
                payload['__kind%d' % i] = np.asarray(2)
                payload['v%d' % i] = np.asarray(v)
        d = cache_dir()
        os.makedirs(d, exist_ok=True)
        tmp = path + '.tmp.%d' % os.getpid()
        with _lock:
            np.savez(tmp, **payload)
            os.replace(tmp + '.npz' if not tmp.endswith('.npz') else tmp,
                       path)
    except Exception:
        pass
    return out
