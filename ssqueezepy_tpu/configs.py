# -*- coding: utf-8 -*-
"""Global configuration for ssqueezepy_tpu.

TPU-native re-design of the reference's config system
(`/root/reference/ssqueezepy/configs.py`, `configs.ini`): instead of an .ini
file parsed at call time plus stack introspection (`gdefaults`,
configs.py:27-124), defaults live in typed dataclasses, layered as

    explicit kwargs  >  environment (``SSQTPU_*``)  >  user config file
    >  built-in defaults

The user config file (the reference's persistent `configs.ini`
capability) is read ONCE at first `get_config()`: `$SSQTPU_CONFIG` if
set, else ``~/.config/ssqueezepy_tpu/config.ini``. Sections:
``[global]`` for `Config` fields (dtype, downsample, backend,
use_pallas, ...) and one section per wavelet (``[gmw]``, ``[morlet]``,
...) for the per-wavelet defaults table. Unknown keys warn and are
ignored (a stale file must not brick the library).

Built-in defaults mirror the reference's `configs.ini` values
(morlet mu=13.4, gmw gamma=3 beta=60 norm='bandpass', global dtype float32,
log-piecewise downsample=4).
"""
import os
import dataclasses
from dataclasses import dataclass, field


@dataclass
class WaveletDefaults:
    """Per-wavelet default parameters (reference: configs.ini:5-31)."""
    morlet: dict = field(default_factory=lambda: dict(mu=13.4))
    bump: dict = field(default_factory=lambda: dict(mu=5.0, s=1.0, om=0.0))
    cmhat: dict = field(default_factory=lambda: dict(mu=1.0, s=1.0))
    hhhat: dict = field(default_factory=lambda: dict(mu=5.0))
    gmw: dict = field(default_factory=lambda: dict(
        gamma=3.0, beta=60.0, norm='bandpass', order=0, centered_scale=False))


@dataclass
class Config:
    """Global defaults; access via `get_config()`, override via `configure()`
    or env vars ``SSQTPU_DTYPE``, ``SSQTPU_DOWNSAMPLE``, ``SSQTPU_BACKEND``.
    """
    # global compute precision ('float32' | 'float64'); reference
    # configs.ini:34-36 defaults float32
    dtype: str = 'float32'
    # log-piecewise scale downsampling factor (reference configs.ini:39-40)
    downsample: int = 4
    # execution backend: 'auto' resolves to jax.default_backend();
    # 'cpu' forces the native-complex XLA path, 'tpu' forces split-complex
    # matmul-FFT + Pallas kernels.
    backend: str = 'auto'
    # use Pallas kernels on TPU when available (vs pure-XLA fallbacks)
    use_pallas: bool = True
    # run Pallas kernels in interpreter mode (CI: exercises the exact TPU
    # dispatch wiring on CPU; see tests/test_ssq_pallas.py)
    pallas_interpret: bool = False
    # single-pass bf16 derivative pipeline for reassignment-only dWx
    # (ssq_cwt with get_dWx=False): ~2x stage-1 speedup at a +-1 ssq-bin
    # placement tolerance. Set False to force full-precision bins even
    # when dWx is not returned.
    ssq_lowprec_deriv: bool = True
    # banded STFT filterbank support: the table kernel contracts only
    # each row's concentrated spectral band (threshold 1e-8 of the
    # global |H| max — below the bf16x3 dot rounding; window spectra
    # like the DPSS default are ~10x narrower than the full stage-1 K).
    # Set False to force the full-support contraction.
    stft_band: bool = True
    wavelets: WaveletDefaults = field(default_factory=WaveletDefaults)


_CONFIG = None


def _from_env(cfg):
    dtype = os.environ.get('SSQTPU_DTYPE')
    if dtype:
        cfg.dtype = dtype
    ds = os.environ.get('SSQTPU_DOWNSAMPLE')
    if ds:
        cfg.downsample = int(ds)
    backend = os.environ.get('SSQTPU_BACKEND')
    if backend:
        cfg.backend = backend
    pallas = os.environ.get('SSQTPU_PALLAS')
    if pallas is not None and pallas != '':
        cfg.use_pallas = pallas not in ('0', 'false', 'False')
    lp = os.environ.get('SSQTPU_LOWPREC_DERIV')
    if lp is not None and lp != '':
        cfg.ssq_lowprec_deriv = lp not in ('0', 'false', 'False')
    sb = os.environ.get('SSQTPU_STFT_BAND')
    if sb is not None and sb != '':
        cfg.stft_band = sb not in ('0', 'false', 'False')
    return cfg


def _config_file_path():
    p = os.environ.get('SSQTPU_CONFIG')
    if p:
        return p
    return os.path.join(os.path.expanduser('~'), '.config',
                        'ssqueezepy_tpu', 'config.ini')


_BOOL_FIELDS = ('use_pallas', 'pallas_interpret', 'ssq_lowprec_deriv',
                'stft_band')


def _from_file(cfg, path=None):
    """Layer the user config file under env/kwargs (reference
    configs.py:85-124's persistent-configs.ini capability). Missing file
    = no-op; malformed entries warn and are skipped."""
    import configparser
    path = path or _config_file_path()
    if not os.path.isfile(path):
        return cfg
    # interpolation off: a '%' in a value must not raise at items()
    parser = configparser.ConfigParser(interpolation=None)
    try:
        parser.read(path)
    except Exception as e:
        import logging
        logging.getLogger(__name__).warning(
            "ignoring unreadable config file %s (%s)", path, e)
        return cfg
    wdefaults = dataclasses.asdict(cfg.wavelets)

    def warn(msg, *a):
        import logging
        logging.getLogger(__name__).warning(
            "config file %s: " + msg, path, *a)

    for section in parser.sections():
        items = dict(parser.items(section))
        if section == 'global':
            for k, v in items.items():
                try:
                    if not hasattr(cfg, k) or k == 'wavelets':
                        warn("unknown [global] key %r ignored", k)
                    elif k in _BOOL_FIELDS:
                        setattr(cfg, k,
                                v.lower() not in ('0', 'false', 'no'))
                    elif k == 'downsample':
                        setattr(cfg, k, int(v))
                    else:
                        setattr(cfg, k, v)
                except Exception as e:
                    # a stale file must not brick the library
                    warn("malformed [global] %s = %r skipped (%s)",
                         k, v, e)
        elif section in wdefaults:
            table = getattr(cfg.wavelets, section)
            for k, v in items.items():
                try:
                    table[k] = float(v)
                except ValueError:
                    table[k] = v            # e.g. gmw norm='energy'
        else:
            warn("unknown section [%s] ignored", section)
    return cfg


def get_config():
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = _from_env(_from_file(Config()))
    return _CONFIG


def configure(**kw):
    """Override global defaults, e.g. ``configure(dtype='float64')``."""
    cfg = get_config()
    for k, v in kw.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown config field: {k}")
        setattr(cfg, k, v)
    return cfg


def reset_config():
    global _CONFIG
    _CONFIG = None
    return get_config()


def backend():
    """Resolved execution backend: 'tpu' (split-complex, matmul-FFT, Pallas)
    or 'cpu' (native complex + XLA FFT). The CPU path doubles as the
    correctness reference in tests (the reference library's serial-vs-parallel
    -vs-GPU equality testing pattern, tests/fft_test.py).
    """
    cfg = get_config()
    if cfg.backend != 'auto':
        return cfg.backend
    import jax
    b = jax.default_backend()
    # treat anything that isn't a plain CPU/GPU as the TPU path ('tpu', 'axon')
    if b in ('cpu', 'gpu', 'cuda', 'rocm'):
        return 'cpu'
    return 'tpu'


def default_dtype():
    return get_config().dtype


def scatter_tile(default=256):
    """Time-tile width of the direct reassignment scatter (env
    ``SSQTPU_SCATTER_T`` overrides; floor 128 — the Pallas lane
    minimum). The round-5 descent sweep (PROFILE.md; sessions 5j-5o)
    found T=256 optimal for EVERY direct pipeline at the bench shape
    (narrower tiles shrink both the per-tile outlier bound driving
    tier-2's loop and the accumulator zeroing; 128 turns back up):
    ssq_cwt 23.4->21.5 ms, ssq_stft 28.3->26.4, ssq_cwt2 28.9->27.4,
    ssq_stft2 30.8->28.9, Tx-only 21.9->20.4. Read at plan-build
    time."""
    return max(128, int(os.environ.get('SSQTPU_SCATTER_T',
                                       str(default))))


_WARNED_X64 = [False]


def device_dtype(dtype):
    """Resolve a requested dtype against the active JAX backend: float64
    without x64 enabled (the TPU default — the MXU has no f64) degrades to
    float32 with a single library-level warning instead of per-op JAX
    truncation warnings."""
    dtype = str(dtype)
    if dtype == 'float64':
        import jax
        if not jax.config.jax_enable_x64:
            if not _WARNED_X64[0]:
                _WARNED_X64[0] = True
                import logging
                logging.getLogger(__name__).warning(
                    "float64 requested but JAX x64 is disabled on this "
                    "backend (TPU has no native f64); computing in float32."
                    " Enable x64 (jax.config.update('jax_enable_x64', "
                    "True)) on CPU for full float64.")
            return 'float32'
    return dtype


def gdefaults(section, **kw):
    """Fill `None` kwargs from wavelet defaults table; analog of the
    reference's `gdefaults` (configs.py:27) without stack introspection.
    `section` is e.g. 'morlet', 'gmw'.
    """
    table = dataclasses.asdict(get_config().wavelets).get(section, {})
    out = {}
    for k, v in kw.items():
        out[k] = table.get(k) if v is None else v
    return out


def IS_PARALLEL():
    """Migration shim for the reference's `IS_PARALLEL`
    (reference configs.py:127): kernel parallelism here is inherent to
    XLA (fused programs; no numba thread pool to toggle). Honors
    `SSQ_PARALLEL=0` for drop-in environment compatibility, purely as a
    report — it does not serialize anything."""
    return os.environ.get('SSQ_PARALLEL', '1') != '0'


def USE_GPU():
    """Migration shim for the reference's `USE_GPU`
    (reference configs.py:142): True when the resolved execution backend
    is the accelerator (TPU here — the CUDA/CuPy toggle's analog).
    Accelerator selection is automatic; force with
    `configure(backend='cpu'|'tpu')` or `SSQTPU_BACKEND`."""
    return backend() == 'tpu'


def exec_config_key():
    """Hashable fingerprint of the config knobs that select EXECUTION
    PATHS inside cached jit factories (backend dispatch, Pallas gating).
    Every lru/dict cache keyed on a plan must include this — otherwise a
    `configure(backend=...)` between calls serves a stale runner built
    under the previous config (observed: a CPU-path runner answering for
    the TPU bins pipeline after reconfiguration)."""
    cfg = get_config()
    return (backend(), cfg.use_pallas, cfg.pallas_interpret,
            cfg.ssq_lowprec_deriv, cfg.stft_band, scatter_tile())
