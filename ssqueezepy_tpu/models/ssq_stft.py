# -*- coding: utf-8 -*-
"""Synchrosqueezed STFT (forward & inverse).

Behavioral reference: `/root/reference/ssqueezepy/_ssq_stft.py`
(ssq_stft :13, issq_stft :139, phase_stft via ops/phase.py).

The fast path (difftype-free, `get_w=False`) runs STFT + phase +
reassignment as ONE cached jit per plan — eager per-call dispatches
through the device tunnel (~3.5ms RTT each) dominated small-N latency
otherwise."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import scatter_tile
from ..ops.complexlib import Complex, as_complex
from ..ops.phase import phase_stft
from ..ops.ssq_kernels import ssqueeze_fast, indexed_sum_onfly, \
    ssq_bin_params
from ..utils.common import WARN, EPS32, EPS64
from ..utils.cwt_utils import _process_fs_and_t, infer_scaletype
from .ssqueezing import _check_ssqueezing_args
from .stft import stft, istft
from .windows import get_window, _check_NOLA
from .ssq_cwt import (_invert_components, _apply_squeezing,
                      _process_component_inversion_args)

__all__ = ['ssq_stft', 'ssq_stft2', 'issq_stft']


@functools.lru_cache(maxsize=32)
def _ssq_stft_fast_jit(shape, dtype, n_fft, hop_len, modulated, win_key,
                       padtype, padlength, fs_val, flipud, squeezing,
                       param_items, gamma, natural_key, sfs_key,
                       const_val, need_dsx=False, cfg_key=None):
    """Cached fused jit: raw signal -> (Tx, Sx, dSx). Traces the
    convolution-form (or framed) STFT and the fused reassignment into one
    program; all plan constants are static."""
    from ..configs import backend
    from ..ops.stft_conv import stft_conv, stft_conv_applicable
    from .stft import _stft_jit
    params = dict(param_items)
    natural = np.asarray(natural_key, np.int32) if natural_key else None
    Sfs_np = np.asarray(sfs_key, dtype)
    const = float(const_val)
    use_conv = stft_conv_applicable(hop_len, backend())
    N = shape[-1]
    is_2d = (len(shape) == 2)

    # build inner runners + device tables EAGERLY (this factory runs
    # outside any trace): device_put inside an active trace returns a
    # tracer, and lru-cached closures would leak it into later traces
    if use_conv:
        from ..ops.stft_conv import _device_filterbank, _next_fft_len
        tables = _device_filterbank(win_key, int(n_fft), int(_next_fft_len(
            padlength)), bool(modulated), dtype)
        framed_runner = None
    else:
        tables = ()
        framed_runner = _stft_jit(shape, dtype, n_fft, hop_len, 0,
                                  modulated, True, is_2d, win_key, padtype,
                                  padlength)

    # bins path: the conv-STFT kernel emits (Sx, k) directly (window-
    # derivative rows never leave VMEM; phase+bin on the kernel's VPU)
    use_bins = False
    if use_conv and gamma is not None and not need_dsx:
        from ..ops.ssq_kernels import _pallas_enabled
        from ..ops.stft_conv import _stft_pallas_applicable, _next_fft_len
        use_pallas, interp = _pallas_enabled()
        use_bins = (use_pallas and
                    _stft_pallas_applicable(_next_fft_len(padlength),
                                            shape))

    if use_bins:
        from ..ops.stft_conv import stft_conv_bins
        from ..ops.ssq_pallas import scatter_kv_pallas
        nbins = params['omax'] + 1
        n_rows = n_fft // 2 + 1

        # banded filterbank support (ops/stft_conv._band_plan): the
        # table kernel contracts only each row's concentrated spectral
        # band — ~10x less table traffic/stage-1 compute with the DPSS
        # default window
        band = None
        from ..ops.stft_conv import (_device_filterbank_banded,
                                     _next_fft_len as _nfl)
        banded = _device_filterbank_banded(win_key, int(n_fft),
                                           int(_nfl(padlength)),
                                           bool(modulated), dtype)
        if banded is not None:
            tables, band = banded

        # zero-prep direct pipeline (round-4): the STFT table kernel
        # emits the scatter's exact layout (32-rounded rows, T-rounded
        # width, int16 k), so no XLA pad/gather prep runs between the
        # two kernels. Identity natural bins (the STFT default grid)
        # and plain 'sum' squeezing only.
        use_direct = (not is_2d and squeezing in (None, 'sum')
                      and natural is not None
                      and np.array_equal(natural, np.arange(n_rows)))
        T_sc = scatter_tile()
        if use_direct:
            from ..ops.ssq_pallas import scatter_kv_direct
            na_pad = -(-n_rows // 32) * 32
            const_pad = jnp.asarray(np.pad(
                np.full(n_rows, const, dtype), (0, na_pad - n_rows)))

            def run(xj, *tbl):
                xj = xj.astype(dtype)
                SxF, k = stft_conv_bins(xj, fs_val, n_fft, N, win_key,
                                        modulated, padtype, padlength,
                                        dtype, params, gamma, flipud,
                                        sfs_key, tbl, interpret=interp,
                                        direct_T=T_sc, band=band)
                TxF = scatter_kv_direct(SxF, k, const_pad, nbins,
                                        interpret=interp, T=T_sc)
                Tx = Complex(TxF.re[:nbins, :N], TxF.im[:nbins, :N])
                Sx = Complex(SxF.re[:n_rows, :N], SxF.im[:n_rows, :N])
                return Tx, Sx, None

            jitted = jax.jit(run)
            return lambda xj: jitted(xj, *tables)

        def run(xj, *tbl):
            xj = xj.astype(dtype)
            Sx, k = stft_conv_bins(xj, fs_val, n_fft, N, win_key,
                                   modulated, padtype, padlength, dtype,
                                   params, gamma, flipud, sfs_key, tbl,
                                   interpret=interp, band=band)
            Sx_s = _apply_squeezing(Sx, squeezing)
            Tx = scatter_kv_pallas(Sx_s, k, const, nbins,
                                   natural_bins=natural,
                                   interpret=interp, T=T_sc)
            return Tx, Sx, None

        jitted = jax.jit(run)
        return lambda xj: jitted(xj, *tables)

    def run(xj, *tbl):
        # filterbank tables ride as ARGUMENTS: closed-over device arrays
        # would be inlined as jaxpr constants, and lowering fetches them
        # to host (minutes at large N through the device tunnel)
        xj = xj.astype(dtype)
        if use_conv:
            Sx, dSx = stft_conv(xj, fs_val, n_fft, N, win_key, modulated,
                                True, padtype, padlength, dtype,
                                tables=tbl)
        else:
            from .cwt import _device_scalar
            Sx, dSx = framed_runner(xj, _device_scalar(fs_val, dtype))
        Sfs_j = jnp.asarray(Sfs_np)
        if squeezing in (None, 'sum'):
            Tx = ssqueeze_fast(Sx, dSx, None, const, logscale=False,
                               flipud=flipud, gamma=gamma, Sfs=Sfs_j,
                               params=params, natural_bins=natural)
        else:
            # phase transform from RAW Sx (w = |Sfs - Im(dSx/Sx)/2pi|);
            # only the scattered values are squeezed — mirrors the bins
            # kernel and the reference (algos.py ssq_stft kernels)
            w = phase_stft(Sx, dSx, Sfs_j, gamma)
            Sx_s = _apply_squeezing(Sx, squeezing)
            Tx = indexed_sum_onfly(Sx_s, w, None, const, logscale=False,
                                   flipud=flipud, params=params,
                                   natural_bins=natural)
        return Tx, Sx, dSx

    jitted = jax.jit(run)
    return lambda xj: jitted(xj, *tables)


_SSQ_STFT_PLANS = {}


def _make_Sfs(Sx, fs):
    n_rows = Sx.shape[0] if Sx.ndim == 2 else Sx.shape[1]
    dtype = 'float32' if str(Sx.dtype) == 'float32' else 'float64'
    return np.linspace(0, .5 * fs, n_rows, dtype=dtype)


def ssq_stft(x, window=None, n_fft=None, win_len=None, hop_len=1, fs=None,
             t=None, modulated=True, ssq_freqs=None, padtype='reflect',
             squeezing='sum', gamma=None, preserve_transform=None,
             dtype=None, astensor=True, flipud=False, get_w=False,
             get_dWx=False):
    """Synchrosqueezed STFT; API parity with reference `ssq_stft`
    (_ssq_stft.py:13-136). Returns (Tx, Sx, ssq_freqs, Sfs[, w][, dSx])."""
    xnp = np.asarray(x) if isinstance(x, (list, np.ndarray)) else x
    if xnp.ndim == 2 and get_w:
        raise NotImplementedError("`get_w=True` unsupported with batched "
                                  "input.")
    _, fs_, _ = _process_fs_and_t(fs, t, xnp.shape[-1])
    _check_ssqueezing_args(squeezing)
    if isinstance(ssq_freqs, np.ndarray) and \
            infer_scaletype(ssq_freqs)[0] != 'linear':
        raise ValueError("`ssq_freqs` must be linearly distributed "
                         "for `ssq_stft`")

    from ..configs import default_dtype
    from .stft import _window_key
    from .windows import get_window as _gw
    N = xnp.shape[-1]
    n_fft_ = int(n_fft or min(N // hop_len, 512))
    if win_len is None:
        win_len = (len(window) if isinstance(window, np.ndarray)
                   else n_fft_)
    dtype_ = dtype or default_dtype()
    if gamma is None:
        gamma = 10 * (EPS64 if dtype_ == 'float64' else EPS32)
    gamma = float(gamma)

    # plan (host, memoized): window, Sfs grid, bin params, fast runner.
    # The per-call numpy pass (linspace + bin params + natural bins +
    # key-tuple construction) costs ~0.6 ms — a visible slice of a
    # small-N repeated call.
    _UNCACHEABLE = object()

    def wkey(spec):
        if spec is None or isinstance(spec, str):
            return spec
        if isinstance(spec, np.ndarray):
            return ('nd', hash(spec.tobytes()), spec.shape,
                    str(spec.dtype))
        return _UNCACHEABLE

    from ..configs import exec_config_key
    cfg_key = exec_config_key()
    plankey = (wkey(window), wkey(ssq_freqs), xnp.shape, n_fft_, win_len,
               int(hop_len), float(fs_), bool(modulated), padtype, dtype_,
               gamma, bool(flipud), bool(get_w), bool(get_dWx),
               squeezing if isinstance(squeezing, str) else None, cfg_key)
    if _UNCACHEABLE in (plankey[0], plankey[1]):
        plankey = None
    plan = _SSQ_STFT_PLANS.get(plankey) if plankey is not None else None
    if plan is None:
        win, dwin = _gw(window, win_len, n_fft_, derivative=True,
                        dtype=dtype_)
        _check_NOLA(win, hop_len, dtype_)
        win_key = _window_key(win, dwin)
        n_rows = n_fft_ // 2 + 1
        Sfs = np.linspace(0, .5 * fs_, n_rows, dtype=dtype_)
        if ssq_freqs is None:
            ssq_freqs = Sfs
        const = float(ssq_freqs[1] - ssq_freqs[0])
        params = ssq_bin_params(ssq_freqs, logscale=False)
        from .ssqueezing import _natural_bins
        natural = _natural_bins('stft', None, ssq_freqs, params, flipud,
                                n_rows, 1. / fs_)
        padlength = N + n_fft_ - 1
        runner = None
        if not get_w and (squeezing is None
                          or isinstance(squeezing, str)):
            runner = _ssq_stft_fast_jit(
                xnp.shape, dtype_, n_fft_, int(hop_len), bool(modulated),
                win_key, padtype, padlength, float(fs_), bool(flipud),
                squeezing if isinstance(squeezing, str) else None,
                tuple(sorted(params.items())), gamma,
                tuple(natural.tolist()) if natural is not None else None,
                tuple(Sfs.tolist()), const, need_dsx=bool(get_dWx),
                cfg_key=cfg_key)
        plan = (runner, Sfs, ssq_freqs, const, params, natural)
        if plankey is not None:
            _SSQ_STFT_PLANS[plankey] = plan
    runner, Sfs, ssq_freqs, const, params, natural = plan

    # callable `squeezing` can't key the jit cache — take the eager path,
    # which applies the user function between phase and scatter
    if runner is not None:
        if isinstance(xnp, (jnp.ndarray, jax.Array)) \
                and str(xnp.dtype) == dtype_:
            xj = xnp                    # already device-resident
        else:
            xj = jnp.asarray(xnp, dtype=dtype_)
        Tx, Sx, dSx = runner(xj)
        w = None
    else:
        Sx, dSx = stft(xnp, window, n_fft=n_fft_, win_len=win_len,
                       hop_len=hop_len, fs=fs_, padtype=padtype,
                       modulated=modulated, derivative=True, dtype=dtype_)
        w = phase_stft(Sx, dSx, Sfs, gamma)
        Sx_s = _apply_squeezing(Sx, squeezing)
        Tx = indexed_sum_onfly(Sx_s, w, ssq_freqs, const, logscale=False,
                               flipud=flipud, params=params,
                               natural_bins=natural)

    ssq_freqs_out = (np.asarray(ssq_freqs)[::-1].copy() if flipud
                     else np.asarray(ssq_freqs))

    if not astensor:
        Tx = Tx.to_numpy()
        Sx = Sx.to_numpy()
        dSx = dSx.to_numpy() if dSx is not None else None
        w = np.asarray(w) if w is not None else None

    if get_w and get_dWx:
        return Tx, Sx, ssq_freqs_out, Sfs, w, dSx
    elif get_w:
        return Tx, Sx, ssq_freqs_out, Sfs, w
    elif get_dWx:
        return Tx, Sx, ssq_freqs_out, Sfs, dSx
    return Tx, Sx, ssq_freqs_out, Sfs


def issq_stft(Tx, window=None, cc=None, cw=None, n_fft=None, win_len=None,
              hop_len=1, modulated=True):
    """Inverse synchrosqueezed STFT:
    ``x = Re(sum(Tx, axis=0)) * 2 / window[center]``
    (reference _ssq_stft.py:139-198)."""
    if not modulated:
        raise ValueError("inversion with `modulated == False` is "
                         "unsupported.")
    if hop_len != 1:
        raise ValueError("inversion with `hop_len != 1` is unsupported.")

    cc, cw, full_inverse = _process_component_inversion_args(cc, cw)
    if isinstance(Tx, Complex) and full_inverse:
        import jax
        # device-side reduction; only the (N,) result crosses to host
        x_dev = np.asarray(jax.jit(lambda t: t.sum(axis=0))(Tx.re))
        n_fft = int(n_fft or (Tx.shape[0] - 1) * 2)
        win_len = win_len or n_fft
        window = get_window(window, win_len, n_fft=n_fft)
        _check_NOLA(window, hop_len)
        if abs(np.argmax(window) - len(window) // 2) > 1:
            WARN("`window` maximum not centered; results may be "
                 "inaccurate.")
        return x_dev * (2 / window[len(window) // 2])

    if isinstance(Tx, Complex):
        Tx = Tx.to_numpy()
    Tx = np.asarray(Tx)
    n_fft = int(n_fft or (Tx.shape[0] - 1) * 2)
    win_len = win_len or n_fft

    window = get_window(window, win_len, n_fft=n_fft)
    _check_NOLA(window, hop_len)
    if abs(np.argmax(window) - len(window) // 2) > 1:
        WARN("`window` maximum not centered; results may be inaccurate.")

    if full_inverse:
        x = Tx.real.sum(axis=0)
    else:
        x = _invert_components(Tx, cc, cw)

    x *= (2 / window[len(window) // 2])
    return x


def _fsst2_rows(xh, Hre, Him, n_rows, Np2, N_out, fs, Sfs_np, gamma,
                dtype, tiny):
    """Traceable FSST2 core: signal spectrum + five-window bank spectra
    -> (V, w2). Shared by the offline fused jit and the streaming body.
    Per-sample units throughout (the bank windows are unscaled); `w2`
    in physical Hz, inf-marked where gamma-gated."""
    from ..ops.fft import ifft
    pr = Hre * xh.re - Him * xh.im
    pi = Hre * xh.im + Him * xh.re
    S = ifft(Complex(pr, pi), n=Np2, out_range=(0, N_out))

    def part(i):
        sl = slice(i * n_rows, (i + 1) * n_rows)
        return Complex(S.re[..., sl, :], S.im[..., sl, :])

    V, Vg1, Vt, Vtd, Vd2 = (part(i) for i in range(5))

    def cdiv(a, b):
        d = b.abs2() + tiny
        return Complex((a.re * b.re + a.im * b.im) / d,
                       (a.im * b.re - a.re * b.im) / d)

    rshape = [1] * V.re.ndim
    rshape[-2] = -1
    Sfs_j = jnp.asarray(Sfs_np).reshape(rshape)
    w1 = Sfs_j - fs * cdiv(Vg1, V).im / (2 * np.pi)
    trel = cdiv(Vt, V).re
    N2 = Vd2 * V - Vg1 * Vg1
    D2 = Vtd * V - Vt * Vg1
    q = cdiv(N2, D2).im
    w2 = jnp.abs(w1 + (fs / (2 * np.pi)) * q * trel)
    w2 = jnp.where(jnp.isfinite(w2), w2, jnp.inf)
    w2 = jnp.where(V.abs2() > jnp.asarray(gamma, dtype) ** 2, w2,
                   jnp.inf)
    return V, w2


def _fsst2_bank(window, win_len, n_fft, dtype):
    """The five FSST2 analysis windows (g, g', t g, t g', g'') as a
    (5, n_fft) float64 bank (shared by offline and streaming plans)."""
    g, dg = get_window(window, win_len, n_fft, derivative=True,
                       dtype=dtype)
    g, dg = np.asarray(g), np.asarray(dg)
    _, d2g = get_window(dg, n_fft, n_fft, derivative=True, dtype=dtype)
    d2g = np.asarray(d2g)
    nc = (np.arange(n_fft) - n_fft // 2).astype(np.float64)
    return np.stack([g, dg, nc * g, nc * dg, d2g]).astype(np.float64)


@functools.lru_cache(maxsize=16)
def _ssq_stft2_fast_jit(shape, dtype, n_fft, modulated, bank_key, padtype,
                        padlength, Np2, fs_val, flipud, squeezing,
                        param_items, gamma, natural_key, sfs_key,
                        const_val, fused_tx, need_w2=False, cfg_key=None):
    """Cached fused FSST2 jit: raw signal -> (Tx, V, w2). The five
    window STFTs (g, g', tg, tg', g'') share ONE forward FFT — the
    (5*n_rows, Np2) filterbank bank multiplies the signal spectrum and
    one batched matmul IFFT produces all rows; the second-order phase
    math and the reassignment run in the same program. `fused_tx=False`
    (callable squeezing) skips the in-jit scatter and returns
    (None, V, w2) for the eager squeeze+scatter path."""
    from ..ops.pad import padsignal
    from ..ops.fft import fft, ifft
    from ..ops.stft_conv import _device_filterbank_multi
    params = dict(param_items)
    natural = (np.asarray(natural_key, np.int32) if natural_key is not None
               else None)
    Sfs_np = np.asarray(sfs_key, dtype)
    const = float(const_val)
    n_rows = n_fft // 2 + 1
    N = shape[-1]
    is_2d = (len(shape) == 2)
    # device tables built EAGERLY (outside any trace) and passed as jit
    # ARGUMENTS — closed-over device arrays inline as jaxpr constants
    # and lowering fetches them to host (minutes at large N)
    tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)
    fs_f = float(fs_val)

    # fused Pallas FSST2 (round-5): the five banded window transforms +
    # chirp-rate correction + bin map run in ONE table kernel (only
    # V = S^g leaves VMEM; ops/stft_conv.fsst2_pallas_rows) feeding the
    # zero-prep direct scatter. The XLA path below is the correctness
    # twin and serves get_w / batched / callable-squeezing / unbanded
    # calls.
    use_fused = False
    if fused_tx and not need_w2 and not is_2d \
            and squeezing in (None, 'sum') and natural is not None \
            and np.array_equal(natural, np.arange(n_rows)):
        from ..ops.ssq_kernels import _pallas_enabled
        from ..ops.stft_conv import (_stft_pallas_applicable,
                                     _device_fsst2_tables)
        use_pallas, interp = _pallas_enabled()
        if use_pallas and _stft_pallas_applicable(int(Np2), shape):
            fused_tabs = _device_fsst2_tables(bank_key, int(n_fft),
                                              int(Np2), bool(modulated),
                                              dtype)
            use_fused = fused_tabs is not None
    if use_fused:
        from ..ops.stft_conv import fsst2_pallas_rows
        from ..ops.ssq_pallas import scatter_kv_direct
        from ..configs import get_config
        aux_lowprec = bool(get_config().ssq_lowprec_deriv)
        tabs, band_plan = fused_tabs
        nbins = params['omax'] + 1
        T_sc = scatter_tile()
        na_pad = -(-n_rows // 32) * 32
        const_pad = jnp.asarray(np.pad(
            np.full(n_rows, const, dtype), (0, na_pad - n_rows)))

        def run(xj, *tabs_a):
            xj = xj.astype(dtype)
            xp = padsignal(xj, padtype, padlength=padlength)
            xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2,
                     imag_zero=True)
            VF, k = fsst2_pallas_rows(
                xh, fs_f, tabs_a, n_rows, int(Np2), N, Sfs_np, params,
                gamma, flipud, tiny, band_plan, direct_T=T_sc,
                interpret=interp, aux_lowprec=aux_lowprec)
            TxF = scatter_kv_direct(VF, k, const_pad, nbins,
                                    interpret=interp, T=T_sc)
            Tx = Complex(TxF.re[:nbins, :N], TxF.im[:nbins, :N])
            V = Complex(VF.re[:n_rows, :N], VF.im[:n_rows, :N])
            return Tx, V, None

        jitted = jax.jit(run)
        return lambda xj: jitted(xj, *tabs)

    tables = _device_filterbank_multi(bank_key, int(n_fft), int(Np2),
                                      bool(modulated), dtype)

    def run(xj, Hre, Him):
        xj = xj.astype(dtype)
        xp = padsignal(xj, padtype, padlength=padlength)
        xh = fft(Complex(xp, jnp.zeros_like(xp)), n=Np2, imag_zero=True)
        if is_2d:
            xh = Complex(xh.re[:, None], xh.im[:, None])
        V, w2 = _fsst2_rows(xh, Hre, Him, n_rows, Np2, N, fs_f, Sfs_np,
                            gamma, dtype, tiny)
        if not fused_tx:
            return None, V, w2
        Sx_s = _apply_squeezing(V, squeezing)
        Tx = indexed_sum_onfly(Sx_s, w2, None, const, logscale=False,
                               flipud=flipud, params=params,
                               natural_bins=natural)
        return Tx, V, w2

    jitted = jax.jit(run)
    return lambda xj: jitted(xj, *tables)


_SSQ_STFT2_PLANS = {}


def ssq_stft2(x, window=None, n_fft=None, win_len=None, fs=None, t=None,
              modulated=True, ssq_freqs=None, padtype='reflect',
              squeezing='sum', gamma=None, dtype=None, astensor=True,
              flipud=False, get_w=False):
    """Second-order synchrosqueezed STFT (FSST2) — BEYOND the reference
    library's surface (no analog in /root/reference; method: Oberlin,
    Meignen & Perrier 2015, "Second-order synchrosqueezing transform").

    First-order reassignment (`ssq_stft`) estimates a pure-tone
    instantaneous frequency ``w1 = Sfs - Im(V^g' / V)/2pi``, which
    smears frequency-modulated components by (chirp rate) x (window
    duration)^2. FSST2 adds a local chirp-rate correction

        q  = Im( (V^g'' V - (V^g')^2) / (V^tg' V - V^tg V^g') )
        w2 = w1 + (fs / 2pi) * q * Re(V^tg / V)

    (per-sample units). Empirically exact on linear chirps to float
    precision — asserted in tests/test_ssq_stft2.py — and reduces to w1
    on pure tones (the numerator vanishes; the denominator never does:
    |D| ~ |V|^2 by the Gabor commutator, so no extra gating is needed
    beyond `gamma`). Inversion is `issq_stft` unchanged: reassignment
    only moves energy between rows of a column.

    Execution: ONE cached jit per plan — the five STFTs (g, g', t*g,
    t*g', g'') are rows of a single conv-form filterbank sharing one
    forward FFT (`ops/stft_conv._conv_filterbank_multi`), so the full
    pipeline (pad -> FFT -> bank multiply -> batched IFFT -> chirp-rate
    math -> reassignment) is a single program on both backends.

    Returns (Tx, Sx, ssq_freqs, Sfs[, w2 if get_w]).
    """
    from ..configs import default_dtype
    from ..ops.stft_conv import _bank_key, _next_fft_len
    xnp = np.asarray(x) if isinstance(x, (list, np.ndarray)) else x
    N = xnp.shape[-1]
    _, fs_, _ = _process_fs_and_t(fs, t, N)
    _check_ssqueezing_args(squeezing)

    n_fft_ = int(n_fft or min(N, 512))
    if win_len is None:
        win_len = (len(window) if isinstance(window, np.ndarray)
                   else n_fft_)
    dtype_ = dtype or default_dtype()
    if gamma is None:
        gamma = 10 * (EPS64 if dtype_ == 'float64' else EPS32)
    gamma = float(gamma)

    def wkey(spec):
        if isinstance(spec, np.ndarray):
            return ('nd', hash(spec.tobytes()), spec.shape,
                    str(spec.dtype))
        return spec                        # None or str

    sq_str = squeezing if isinstance(squeezing, str) else None
    from ..configs import exec_config_key as _eck
    plankey = (wkey(window), wkey(ssq_freqs), xnp.shape, n_fft_, win_len,
               float(fs_), bool(modulated), padtype, dtype_, gamma,
               bool(flipud), sq_str, bool(get_w), _eck())
    plan = _SSQ_STFT2_PLANS.get(plankey)
    if plan is None:
        bank_key = _bank_key(_fsst2_bank(window, win_len, n_fft_, dtype_))

        n_rows = n_fft_ // 2 + 1
        Sfs = np.linspace(0, .5 * fs_, n_rows, dtype=dtype_)
        sfreqs = Sfs if ssq_freqs is None else np.asarray(ssq_freqs)
        const = float(sfreqs[1] - sfreqs[0])
        params = ssq_bin_params(sfreqs, logscale=False)
        from .ssqueezing import _natural_bins
        natural = _natural_bins('stft', None, sfreqs, params, flipud,
                                n_rows, 1. / fs_)
        padlength = N + n_fft_ - 1
        from ..configs import exec_config_key
        runner = _ssq_stft2_fast_jit(
            xnp.shape, dtype_, n_fft_, bool(modulated), bank_key, padtype,
            padlength, int(_next_fft_len(padlength)), float(fs_),
            bool(flipud), sq_str, tuple(sorted(params.items())), gamma,
            tuple(natural.tolist()) if natural is not None else None,
            tuple(Sfs.tolist()), const, fused_tx=(sq_str is not None),
            need_w2=bool(get_w), cfg_key=exec_config_key())
        plan = (runner, Sfs, sfreqs, const, params, natural)
        _SSQ_STFT2_PLANS[plankey] = plan
    runner, Sfs, sfreqs, const, params, natural = plan

    xj = (xnp if isinstance(xnp, jax.Array) and str(xnp.dtype) == dtype_
          else jnp.asarray(xnp, dtype=dtype_))
    Tx, V, w2 = runner(xj)
    if Tx is None:
        # callable squeezing: user fn applied eagerly between the fused
        # phase math and the scatter
        Sx_s = _apply_squeezing(V, squeezing)
        Tx = indexed_sum_onfly(Sx_s, w2, None, const, logscale=False,
                               flipud=flipud, params=params,
                               natural_bins=natural)

    ssq_freqs_out = (sfreqs[::-1].copy() if flipud else sfreqs)
    if not astensor:
        Tx = Tx.to_numpy()
        V = V.to_numpy()
    if get_w:
        return Tx, V, ssq_freqs_out, Sfs, (np.asarray(w2) if not astensor
                                           else w2)
    return Tx, V, ssq_freqs_out, Sfs
