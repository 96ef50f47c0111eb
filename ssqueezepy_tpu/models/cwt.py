# -*- coding: utf-8 -*-
"""Continuous Wavelet Transform (forward & inverse), TPU-native.

Behavioral reference: `/root/reference/ssqueezepy/_cwt.py` (cwt :12, icwt
:323, cwt_higher_order :517). Architecture: instead of the reference's
runtime numpy/torch dispatch, the transform is built as a *plan* — all
data-independent bookkeeping (padding geometry, scales, wavelet config,
admissibility constants) is resolved on host, and a pure function over the
signal is jit-compiled once per (shape, dtype, plan) and cached. The
filterbank is synthesized *inside* the jitted graph from wavelet parameters
(cheaper than reading a cached (na, N) array from HBM at this device's
bandwidth), the FFT convolution runs on the matmul FFT engine with
negative-half pruning for analytic wavelets, and everything is
split-complex.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.complexlib import Complex, as_complex
from ..ops.fft import fft, ifft, fftshift
from ..ops.pad import padsignal, pad_params
from ..utils.common import WARN, p2up
from ..utils.cwt_utils import (process_scales, logscale_transition_idx,
                               adm_ssq, adm_cwt, _process_fs_and_t)
from .wavelets import Wavelet, _xifn

__all__ = ['cwt', 'icwt', 'cwt_higher_order']


def _is_analytic(wavelet):
    """True if the freq-domain wavelet is exactly zero for w < 0 (enables
    negative-half FFT pruning)."""
    name = getattr(wavelet.fn, 'qualname', '')
    if name.startswith('gmw') or name in ('cmhat',):
        return True
    if name == 'hhhat':
        return wavelet.config.get('mu', 5) >= 0
    if name == 'bump':
        mu, s = wavelet.config.get('mu', 5), wavelet.config.get('s', 1)
        return mu - s * .999 >= 0
    return False  # morlet & custom: only approximately analytic


def _wavelet_key(wavelet):
    cfg = tuple(sorted((k, str(v)) for k, v in wavelet.config.items()))
    return (getattr(wavelet.fn, 'qualname', str(id(wavelet.fn))), cfg,
            wavelet.dtype)


_WAVELET_CANON = {}


def _canonical_wavelet(wavelet):
    """Return a per-config singleton Wavelet so jit caches keyed on the
    instance stay hot across calls (a fresh instance per call would force
    a retrace every time)."""
    key = _wavelet_key(wavelet)
    canon = _WAVELET_CANON.get(key)
    if canon is None:
        _WAVELET_CANON[key] = canon = wavelet
    return canon


_SPEC_WAVELET_CACHE = {}


def resolve_wavelet(wavelet, l1_norm=True, N=None):
    """Spec -> canonical Wavelet with full memoization: repeat calls with
    the same spec (string or (name, opts) tuple) skip construction
    entirely (~0.4 ms/call of gmw re-init + config merging, which
    dominates small-N host latency)."""
    if isinstance(wavelet, Wavelet):
        return _canonical_wavelet(wavelet)
    try:
        key = (repr(wavelet), bool(l1_norm), N)
    except Exception:
        key = None
    if key is not None:
        hit = _SPEC_WAVELET_CACHE.get(key)
        if hit is not None:
            return hit
    w = _process_gmw_wavelet(wavelet, l1_norm)
    kw = {} if N is None else {'N': N}
    w = _canonical_wavelet(Wavelet._init_if_not_isinstance(w, **kw))
    if key is not None:
        _SPEC_WAVELET_CACHE[key] = w
    return w


def _process_gmw_wavelet(wavelet, l1_norm):
    """Keep GMW norm consistent with `l1_norm` (reference _cwt.py:497-514).
    """
    norm = 'bandpass' if l1_norm else 'energy'
    if isinstance(wavelet, str) and wavelet.lower()[:3] == 'gmw':
        wavelet = ('gmw', {'norm': norm})
    elif isinstance(wavelet, tuple) and wavelet[0].lower()[:3] == 'gmw':
        name, wavopts = wavelet
        wavopts = dict(wavopts)
        wavopts['norm'] = wavopts.get('norm', norm)
        wavelet = (name, wavopts)
    elif isinstance(wavelet, Wavelet):
        if wavelet.name == 'GMW L2' and l1_norm:
            raise ValueError("using GMW L2 wavelet with `l1_norm=True`")
        elif wavelet.name == 'GMW L1' and not l1_norm:
            raise ValueError("using GMW L1 wavelet with `l1_norm=False`")
    return wavelet


# --------------------------------------------------------------------------
# traceable core (used by cwt and fused into ssq_cwt's single jit)
# --------------------------------------------------------------------------
def cwt_core(xp_pad, wavelet, scales_j, dt, derivative, l1_norm, n1, N,
             rpadded=False, is_2d=False, deriv_lowprec=False, klims=None,
             platform=None):
    """Vectorized FFT-convolution CWT over padded input.

    xp_pad: real (..., n_up) jnp array (padded signal)
    scales_j: (na, 1) device array
    platform: target device platform for the Pallas gate — pass the mesh
    devices' platform inside shard_map (the global default backend may be
    a TPU tunnel while the mesh is virtual-CPU, and vice versa).
    Returns (Wx, dWx or None) as split-complex, unpadded unless rpadded.
    Mirrors reference `_cwt._vectorized` (_cwt.py:167-177) + unpad/norm
    (:293-311).
    """
    n_up = xp_pad.shape[-1]
    dtype = str(xp_pad.dtype)
    analytic = _is_analytic(wavelet)
    half = n_up // 2 + 1

    # Analytic fast path: the freq-domain wavelet is exactly zero on the
    # negative half, so (a) the forward FFT computes only bins [0, n/2]
    # (real input: half the stage-1 matmuls are skipped too), (b) the
    # filterbank is synthesized on the half grid only, (c) the inverse
    # FFT takes the short spectrum (implicit zeros, never materialized)
    # and computes only the unpadded output range. All exact.
    out_range = (n1, n1 + N) if (not rpadded) else None
    if analytic:
        xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)), axis=-1,
                 out_range=(0, half), imag_zero=True)
    else:
        xh = fft(Complex(xp_pad, jnp.zeros_like(xp_pad)), axis=-1,
                 imag_zero=True)

    # fully-fused Pallas path: synthesis + both IFFT stages + derivative
    # stay VMEM-resident per scale row (ops/cwt_pallas.py); batched
    # inputs run with grid = (B*na,)
    if out_range is not None and analytic:
        from ..ops.ssq_kernels import _pallas_enabled
        use_pallas, interp = _pallas_enabled(platform)
        if use_pallas:
            from ..ops.cwt_pallas import (cwt_fused_pallas,
                                          cwt_pallas_applicable)
            if cwt_pallas_applicable(wavelet, n_up, is_2d):
                psih_probe = wavelet.fn(jnp.zeros((1,), dtype), xp=jnp)
                if not isinstance(psih_probe, tuple):  # real-valued psih
                    return cwt_fused_pallas(xh, scales_j, wavelet, n_up,
                                            n1, N, dt, derivative, l1_norm,
                                            interpret=interp,
                                            deriv_lowprec=deriv_lowprec,
                                            klims=klims)
    if is_2d:
        xh = Complex(xh.re[:, None], xh.im[:, None])

    xi_full = jnp.asarray(_xifn(1., n_up, np.dtype(dtype)))   # (n_up,)
    xi = xi_full[:half] if analytic else xi_full
    w_grid = scales_j * xi                               # (na, n_half|n_up)
    psih = wavelet.fn(w_grid, xp=jnp)
    nyq = n_up // 2 if not analytic else half - 1
    if isinstance(psih, tuple):                          # complex wavelet
        psih = Complex(*psih)
        psih = Complex(psih.re.at[..., nyq].divide(2),
                       psih.im.at[..., nyq].divide(2)) \
            if n_up % 2 == 0 else psih
        Psih_xh = psih * xh
    else:
        if n_up % 2 == 0:
            psih = psih.at[..., nyq].divide(2)           # Nyquist halving
        Psih_xh = Complex(psih * xh.re, psih * xh.im)

    Wx = ifft(Psih_xh, axis=-1, n=n_up, out_range=out_range,
              nonzero_prefix=half if analytic else None)

    dWx = None
    if derivative:
        # multiply by (1j * xi / dt): (re,im) -> (-im*xi/dt, re*xi/dt)
        xi_dt = (xi / dt).astype(dtype)
        dPsih = Complex(-Psih_xh.im * xi_dt, Psih_xh.re * xi_dt)
        dWx = ifft(dPsih, axis=-1, n=n_up, out_range=out_range,
                   nonzero_prefix=half if analytic else None)

    if not rpadded and out_range is None:
        Wx = Complex(Wx.re[..., n1:n1 + N], Wx.im[..., n1:n1 + N])
        if derivative:
            dWx = Complex(dWx.re[..., n1:n1 + N], dWx.im[..., n1:n1 + N])

    if not l1_norm:
        # L2 renorm: multiply rows by sqrt(scale) (reference _cwt.py:307-311)
        s_sqrt = jnp.sqrt(scales_j).astype(dtype)
        if is_2d:
            s_sqrt = s_sqrt[None]
        Wx = Complex(Wx.re * s_sqrt, Wx.im * s_sqrt)
        if derivative:
            dWx = Complex(dWx.re * s_sqrt, dWx.im * s_sqrt)
    return Wx, dWx


@functools.lru_cache(maxsize=64)
def _cwt_jit(wav_key, shape, dtype, n_up, n1, N, derivative, l1_norm,
             rpadded, is_2d, wavelet_ref, padtype='reflect', klims=None,
             cfg_key=None):
    """Cached jitted forward CWT (raw signal in; scrub + pad inside the
    jit — eager device ops cost a dispatch round trip each on the
    tunneled backend); `wavelet_ref` is a weak holder tuple."""
    wavelet = wavelet_ref[0]

    def run(xj, scales_j, dt):
        xj = xj.astype(dtype)
        xj = jnp.where(jnp.isfinite(xj), xj, 0)
        xp_pad = padsignal(xj, padtype) if padtype is not None else xj
        return cwt_core(xp_pad, wavelet, scales_j, dt, derivative, l1_norm,
                        n1, N, rpadded, is_2d, klims=klims)
    return jax.jit(run)


_SCALES_DEV_CACHE = {}


_SCALAR_DEV_CACHE = {}


def _device_scalar(val, dtype):
    """Device-resident scalar, memoized: passing a fresh numpy scalar to
    a jit uploads it through the device tunnel EVERY call (~1-2 ms of
    pure RTT at small N)."""
    key = (float(val), dtype)
    hit = _SCALAR_DEV_CACHE.get(key)
    if hit is None:
        import jax.numpy as _jnp
        hit = _jnp.asarray(np.asarray(val, dtype))
        _SCALAR_DEV_CACHE[key] = hit
    return hit


_SCALES_CACHE = {}


def _cached_scales(scales, N, wavelet, nv, get_params=False):
    """process_scales with host-side memoization: string specs key by
    spec, array specs by content hash (the validation/infer_scaletype
    numpy pass costs ~0.4 ms — a visible slice of a small-N call)."""
    if isinstance(scales, str):
        key = (scales, N, _wavelet_key(wavelet), nv, get_params)
    elif isinstance(scales, np.ndarray):
        key = (hash(scales.tobytes()), scales.shape, str(scales.dtype),
               N, _wavelet_key(wavelet), nv, get_params)
    else:
        key = None
    if key is None:
        return process_scales(scales, N, wavelet, nv=nv,
                              get_params=get_params)
    hit = _SCALES_CACHE.get(key)
    if hit is None:
        hit = process_scales(scales, N, wavelet, nv=nv,
                             get_params=get_params)
        _SCALES_CACHE[key] = hit
    return hit


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------
def cwt(x, wavelet='gmw', scales='log-piecewise', fs=None, t=None, nv=32,
        l1_norm=True, derivative=False, padtype='reflect', rpadded=False,
        vectorized=True, astensor=True, cache_wavelet=None, order=0,
        average=None, nan_checks=None, patience=0):
    """Continuous Wavelet Transform via frequency-domain convolution.

    API-parity with reference `cwt` (_cwt.py:12-166); `cache_wavelet`,
    `patience`, `nan_checks` are accepted for compatibility (execution is
    always jit-cached; NaN/Inf scrubbing is always fused into the graph —
    it's free on TPU).

    `vectorized=False` is the memory-constrained path (reference
    _cwt.py:179-199 loops scales one at a time): scales run in chunks of
    64 rows through one shared jit, bounding the live FFT intermediates
    to chunk size — use when the full (na, n_up) synthesis plane exceeds
    HBM. Identical results (asserted in tests/test_misc.py).

    Returns (Wx, scales[, dWx]); `astensor=True` returns split-complex
    `Complex` device arrays, else numpy complex.
    """
    from ..ops.fft import _note_patience
    _note_patience(patience)
    if isinstance(order, (tuple, list, range)) or order > 0:
        kw = dict(wavelet=wavelet, scales=scales, fs=fs, t=t, nv=nv,
                  l1_norm=l1_norm, derivative=derivative, padtype=padtype,
                  rpadded=rpadded)
        return cwt_higher_order(x, order=order, average=average,
                                astensor=astensor, **kw)

    xnp = np.asarray(x) if not isinstance(x, (jnp.ndarray, jax.Array)) \
        else x
    if xnp.ndim not in (1, 2):
        raise ValueError("`x` must be 1D or 2D (got x.ndim == %s)"
                         % xnp.ndim)
    is_2d = (xnp.ndim == 2)
    N = xnp.shape[-1]
    dt, fs_, _ = _process_fs_and_t(fs, t, N)

    wavelet = resolve_wavelet(wavelet, l1_norm)
    from ..configs import device_dtype
    dtype = device_dtype(wavelet.dtype)

    scales_np = _cached_scales(scales, N, wavelet, nv)

    if padtype is not None:
        n_up, n1, _ = pad_params(N, padtype)
    else:
        n_up, n1 = N, 0

    if isinstance(xnp, (jnp.ndarray, jax.Array)) \
            and str(xnp.dtype) == dtype:
        xj = xnp                        # already device-resident: skip the
    else:                               # ~0.5 ms asarray/canonicalize pass
        xj = jnp.asarray(xnp, dtype=dtype)

    from ..ops.cwt_pallas import support_klims
    klims = support_klims(wavelet, scales_np, n_up)
    if not vectorized:
        return _cwt_chunked(xj, xnp.shape, wavelet, scales_np, dt, dtype,
                            n_up, n1, N, derivative, l1_norm, rpadded,
                            is_2d, padtype, astensor)
    from ..configs import exec_config_key
    runner = _cwt_jit(_wavelet_key(wavelet), xnp.shape, dtype, n_up, n1, N,
                      bool(derivative), bool(l1_norm), bool(rpadded), is_2d,
                      (wavelet,), padtype, klims, exec_config_key())
    if isinstance(scales, str):
        skey = (scales, N, _wavelet_key(wavelet), nv, dtype)
    elif isinstance(scales, np.ndarray):
        # array specs (the reference benchmark's own protocol) cache by
        # content hash — re-uploading 300 scales per call costs a device
        # round trip each
        skey = (hash(scales.tobytes()), scales.shape, N, nv, dtype)
    else:
        skey = None
    scales_j = _SCALES_DEV_CACHE.get(skey) if skey is not None else None
    if scales_j is None:
        scales_j = jnp.asarray(scales_np, dtype=dtype)
        if skey is not None:
            _SCALES_DEV_CACHE[skey] = scales_j
    Wx, dWx = runner(xj, scales_j, _device_scalar(dt, dtype))

    scales_out = scales_np.squeeze()
    if not astensor:
        Wx = Wx.to_numpy()
        dWx = dWx.to_numpy() if dWx is not None else None
    return ((Wx, scales_out, dWx) if derivative else (Wx, scales_out))


_CWT_CHUNK = 64


def _cwt_chunked(xj, shape, wavelet, scales_np, dt, dtype, n_up, n1, N,
                 derivative, l1_norm, rpadded, is_2d, padtype, astensor):
    """Memory-constrained CWT: scales run in `_CWT_CHUNK`-row chunks
    through ONE shared jit (all chunks padded to equal size -> one
    compile), so live FFT intermediates are chunk-sized instead of
    (na, n_up). The `vectorized=False` contract (reference
    _cwt.py:179-199 loops single scales; a chunk keeps the MXU fed)."""
    na = len(scales_np)
    CH = min(_CWT_CHUNK, na)
    runner = _cwt_jit(_wavelet_key(wavelet), shape, dtype, n_up, n1, N,
                      bool(derivative), bool(l1_norm), bool(rpadded),
                      is_2d, (wavelet,), padtype, None)
    dt_j = _device_scalar(dt, dtype)
    pieces = []
    for c0 in range(0, na, CH):
        chunk = scales_np[c0:c0 + CH]
        if len(chunk) < CH:                    # pad -> same jit signature
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], CH - len(chunk), 0)])
        Wc, dWc = runner(xj, jnp.asarray(chunk, dtype=dtype), dt_j)
        keep = min(CH, na - c0)
        ax = -2
        take = lambda z: jnp.take(z, jnp.arange(keep), axis=ax)
        pieces.append((Complex(take(Wc.re), take(Wc.im)),
                       Complex(take(dWc.re), take(dWc.im))
                       if dWc is not None else None))
    Wx = Complex(jnp.concatenate([p[0].re for p in pieces], axis=-2),
                 jnp.concatenate([p[0].im for p in pieces], axis=-2))
    dWx = None
    if derivative:
        dWx = Complex(jnp.concatenate([p[1].re for p in pieces], axis=-2),
                      jnp.concatenate([p[1].im for p in pieces], axis=-2))
    scales_out = scales_np.squeeze()
    if not astensor:
        Wx = Wx.to_numpy()
        dWx = dWx.to_numpy() if dWx is not None else None
    return ((Wx, scales_out, dWx) if derivative else (Wx, scales_out))


def icwt(Wx, wavelet='gmw', scales='log-piecewise', nv=None, one_int=True,
         x_len=None, x_mean=0, padtype='reflect', rpadded=False,
         l1_norm=True):
    """Inverse CWT via one-integral (analytic wavelets) or double-integral
    formula. Parity: reference `icwt` (_cwt.py:323-453), including the
    recursive log-piecewise split (:422-429) and admissibility scaling
    (:441-450)."""
    Wx = as_complex(Wx) if not isinstance(Wx, np.ndarray) else Wx
    # device `Complex` inputs stay on device through the one-integral
    # reduction (only the (N,) result crosses the host boundary)

    *_, na, n = Wx.shape
    x_len = x_len or n
    if not isinstance(scales, np.ndarray) and nv is None:
        nv = 32

    wavelet = _process_gmw_wavelet(wavelet, l1_norm)
    wavelet = Wavelet._init_if_not_isinstance(wavelet)
    scales, scaletype, _, nv = process_scales(scales, x_len, wavelet, nv=nv,
                                              get_params=True)
    assert (len(scales) == na), "%s != %s" % (len(scales), na)

    if scaletype == 'log-piecewise':
        kw = dict(wavelet=wavelet, one_int=one_int, x_len=x_len,
                  x_mean=x_mean, padtype=padtype, rpadded=rpadded,
                  l1_norm=l1_norm)
        idx = logscale_transition_idx(scales)
        x = icwt(Wx[..., :idx, :], scales=scales[:idx], **kw)
        x += icwt(Wx[..., idx:, :], scales=scales[idx:], **kw)
        return x

    if one_int:
        x = _icwt_1int(Wx, scales, scaletype, l1_norm)
    else:
        if Wx.ndim == 3:
            raise NotImplementedError("batched `Wx` requires "
                                      "`one_int=True`.")
        if isinstance(Wx, Complex):
            Wx = Wx.to_numpy()
        x = _icwt_2int(Wx, scales, scaletype, l1_norm, wavelet, x_len,
                       padtype, rpadded)

    Cpsi = (adm_ssq(wavelet) if one_int else adm_cwt(wavelet))
    if scaletype == 'log':
        # ln(2**(1/nv)) == ln(2)/nv == diff(ln(scales))[0]
        x = x * ((2 / Cpsi) * np.log(2 ** (1 / nv)))
    else:
        x = x * ((2 / Cpsi) * np.pi / 4)

    return x + x_mean


def _icwt_norm(scaletype, l1_norm):
    if l1_norm:
        return ((lambda scale: 1) if scaletype == 'log' else
                (lambda scale: scale))
    if scaletype == 'log':
        return lambda scale: scale ** .5
    return lambda scale: scale ** 1.5


def _icwt_1int(Wx, scales, scaletype, l1_norm):
    """One-integral iCWT: sum of Re(Wx)/norm over scales
    (reference _cwt.py:479-482); device-side reduction for `Complex`."""
    norm = _icwt_norm(scaletype, l1_norm)
    if isinstance(Wx, Complex):
        nrm = np.asarray(norm(scales), dtype=str(Wx.dtype))
        nrm = np.broadcast_to(nrm, (len(np.atleast_1d(scales)), 1))
        out = jax.jit(lambda re, c: (re / c).sum(axis=-2))(
            Wx.re, jnp.asarray(nrm))
        return np.asarray(out)
    return (Wx.real / norm(scales)).sum(axis=-2)


def _icwt_2int(Wx, scales, scaletype, l1_norm, wavelet, x_len,
               padtype='zero', rpadded=False):
    """Double-integral iCWT: per-scale FFT-deconvolution
    (reference _cwt.py:456-476); host-side numpy."""
    from ..ops import fft as F
    if not rpadded:
        from ..ops.pad import padsignal_np
        Wx, n_up, n1, _ = padsignal_np(Wx, padtype or 'zero',
                                       get_params=True)
    else:
        n_up = Wx.shape[-1]
        n1 = 0

    norm = _icwt_norm(scaletype, l1_norm)
    pn = (-1) ** np.arange(n_up)
    x = np.zeros(n_up)

    # scales may arrive (na, 1); per-row elements must be 0-d for the
    # float conversions below (ndim>0 -> scalar is an error on numpy>=2)
    scales = np.asarray(scales).reshape(-1)
    for scale, Wx_scale in zip(scales, Wx):
        psih = wavelet.filterbank_np(np.atleast_1d(np.float64(scale)),
                                     N=n_up, nohalf=True)[0] * pn
        xa = np.fft.ifftshift(np.fft.ifft(np.fft.fft(Wx_scale) * psih))
        x += xa.real / norm(float(scale))

    return x[n1:n1 + x_len]


def cwt_higher_order(x, wavelet='gmw', order=1, average=None, astensor=True,
                     **kw):
    """CWT with higher-order GMWs (orders 0..k orthogonal family),
    optionally averaged for noise robustness. Parity: reference
    `cwt_higher_order` (_cwt.py:517-610)."""
    def _process_args(wavelet, order, average):
        if isinstance(order, (list, range)):
            order = tuple(order)
        if not isinstance(order, tuple):
            order = (order,)
            if average:
                WARN("`average` ignored with single `order`")
                average = False
        wavelet_ = Wavelet._init_if_not_isinstance(wavelet)
        if not wavelet_.name.lower().startswith('gmw'):
            raise ValueError("`wavelet` must be GMW for higher-order "
                             "transforms (got %s)" % wavelet_.name)
        wavopts = dict(wavelet_.config)
        wavopts.pop('order', None)
        wavelets = [Wavelet(('gmw', dict(order=k, **wavopts)))
                    for k in order]
        return wavelets, wavopts, order, average

    wavelets, wavopts, order, average = _process_args(wavelet, order,
                                                      average)

    scales = kw.pop('scales', 'log-piecewise')
    if isinstance(scales, str):
        wav0 = Wavelet(('gmw', dict(order=0, **wavopts)))
        scales = process_scales(scales, x.shape[-1], wavelet=wav0,
                                nv=kw.get('nv', 32))
    kw['scales'] = scales

    derivative = kw.get('derivative', False)
    Wx_all, dWx_all = [], []
    for wav in wavelets:
        out = cwt(x, wav, order=0, astensor=True, **kw)
        Wx_all.append(out[0])
        if derivative:
            dWx_all.append(out[-1])

    if average or (average is None and len(order) > 1):
        Wx_all = Complex(jnp.mean(jnp.stack([w.re for w in Wx_all]), 0),
                         jnp.mean(jnp.stack([w.im for w in Wx_all]), 0))
        if derivative:
            dWx_all = Complex(
                jnp.mean(jnp.stack([w.re for w in dWx_all]), 0),
                jnp.mean(jnp.stack([w.im for w in dWx_all]), 0))
    elif len(Wx_all) == 1:
        Wx_all = Wx_all[0]
        if derivative:
            dWx_all = dWx_all[0]

    scales_out = np.asarray(scales).squeeze()
    if not astensor:
        conv = (lambda W: W.to_numpy() if isinstance(W, Complex) else
                [g.to_numpy() for g in W])
        Wx_all = conv(Wx_all)
        if derivative:
            dWx_all = conv(dWx_all)
    return ((Wx_all, scales_out, dWx_all) if derivative else
            (Wx_all, scales_out))
