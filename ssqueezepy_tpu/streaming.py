# -*- coding: utf-8 -*-
"""Streaming (chunked, online) CWT & synchrosqueezed CWT.

Real-time / unbounded-signal layer the reference library lacks: the
signal arrives in fixed-size chunks and each chunk is transformed by ONE
pre-compiled program in overlap-save form — the chunk is extended left
with `history` samples of carried past signal and right with `lookahead`
samples of not-yet-emitted future signal, FFT-convolved, and cropped to
the emit region. Because every call has identical shapes, XLA compiles
exactly once and the carry state (history + pending-lookahead buffers)
never leaves the device.

Latency/accuracy contract: emitted columns lag the newest received
sample by `lookahead` samples (any value — the emit region simply trails
by ``ceil(lookahead / chunk)`` chunks); a scale row is *reliable* when
its time support (``halo_mult`` standard deviations, `support_np`) fits
inside ``min(history, lookahead)`` — identical to the time-sharded
overlap-save criterion (parallel/time_sharded.py). Rows beyond that
degrade smoothly with the wavelet's time decay; no exact-path correction
exists for them (a stream has no global signal to gather), so raise
`history`/`lookahead` (or cap the scale range) when the top scales
matter. `n_reliable` counts the reliable rows.

The per-chunk body reuses the single-chip fast pipeline: fused
CWT+phase+bin Pallas kernel (dWx stays in VMEM) feeding the k-consuming
scatter, with the XLA fallback on non-TPU platforms. Reference behavior
spec for the transform itself: /root/reference/ssqueezepy/_cwt.py:12,
_ssq_cwt.py:29 (offline forms; streaming is original to this package).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .ops.complexlib import Complex
from .ops.ssq_kernels import (ssq_bin_params, compute_bins,
                              _dispatch_scatter, _pallas_enabled,
                              ssqueeze_fast, indexed_sum_onfly)
from .ops.phase import _imag_ratio_over_2pi
from .utils.common import EPS32, EPS64
from .utils.cwt_utils import process_scales
from .models.wavelets import Wavelet
from .models.cwt import cwt_core, _process_gmw_wavelet, _is_analytic
from .models.ssqueezing import _compute_associated_frequencies
from .parallel.time_sharded import _next_fft_len, _reflect

__all__ = ['StreamingSSQCWT', 'StreamingSSQCWT2', 'StreamingCWT',
           'StreamingSSQSTFT', 'StreamingSSQSTFT2', 'StreamingSTFT',
           'stream_ssq_cwt', 'stream_cwt', 'stream_ssq_stft',
           'stream_ssq_stft2', 'stream_stft']


class _StreamingBase:
    """Carry-state machinery shared by the streaming transforms: a
    device-resident (history | pending-lookahead) buffer pair threaded
    through one fixed-shape compiled step, plus the emission ledger
    (which columns of each step's output are real signal positions).

    Subclasses set ``chunk, history, lookahead, dtype, ssq, _fn,
    _plan_args`` and may override `_emit`'s payload interpretation."""

    def _init_state(self):
        self._hist = None
        self._pend = None
        self._done = False
        self._ncalls = 0

    # -- host-side driver --------------------------------------------
    def _as_batch(self, x):
        arr = np.asarray(x, self.dtype) if isinstance(x, np.ndarray) \
            else jnp.asarray(x, self.dtype)
        squeeze = arr.ndim == 1
        if squeeze:
            arr = arr[None]
        if arr.shape[-1] != self.chunk:
            raise ValueError("chunk length %d != plan chunk %d"
                             % (arr.shape[-1], self.chunk))
        return arr, squeeze

    def _step(self, x):
        outs = self._fn(self._hist, self._pend, x, *self._plan_args)
        txr, txi, wxr, wxi, self._hist, self._pend = outs
        return txr, txi, wxr, wxi

    def process(self, x):
        """Feed `chunk` new samples; return (Tx_cols, Wx_cols) for the
        newly-emittable columns. The emit region trails the newest sample
        by `lookahead`, so the first ``ceil(lookahead/chunk)`` calls
        return fewer — possibly zero — columns."""
        if self._done:
            raise RuntimeError("stream already finalized; call reset()")
        x, squeeze = self._as_batch(x)
        if self._hist is None:
            self._squeeze = squeeze
            # pre-signal context: reflect the first chunk's start
            # (matches padsignal's no-edge-repeat 'reflect'; repeated
            # reflection when the context exceeds one chunk)
            xn = np.asarray(x, self.dtype)
            pre = self.history + self.lookahead
            padded = (np.pad(xn, [(0, 0), (pre, 0)], 'reflect')
                      if pre else xn)
            self._hist = jnp.asarray(padded[..., :self.history])
            self._pend = jnp.asarray(
                padded[..., self.history:self.history + self.lookahead])
        txr, txi, wxr, wxi = self._step(jnp.asarray(x, self.dtype))
        # columns at global index < 0 are pre-signal reflection: drop
        lo = min(max(self.lookahead - self._ncalls * self.chunk, 0),
                 self.chunk)
        self._ncalls += 1
        return self._emit(txr, txi, wxr, wxi, lo, self.chunk)

    def finalize(self):
        """Flush the last `lookahead` columns (reflected right padding).
        Returns (Tx_cols, Wx_cols); (None, None) when lookahead == 0."""
        if self._hist is None:
            raise RuntimeError("no chunks processed")
        self._done = True
        c, l = self.chunk, self.lookahead
        if l == 0:
            return None, None
        # continue the stream by reflecting its received end — enough
        # material to fill every remaining window's look region
        n_synth = -(-l // c) * c
        tail = np.asarray(jnp.concatenate([self._hist, self._pend],
                                          axis=-1))
        synth = np.pad(tail, [(0, 0), (0, n_synth)],
                       'reflect')[..., tail.shape[-1]:]
        parts = []
        T = self._ncalls * c             # total real samples received
        for j in range(n_synth // c):
            txr, txi, wxr, wxi = self._step(
                jnp.asarray(synth[..., j * c:(j + 1) * c], self.dtype))
            # this step's emit region covers global columns
            # [pos, pos + c); clamp to the real signal [0, T)
            pos = (self._ncalls + j) * c - l
            lo = min(max(-pos, 0), c)
            hi = min(max(T - pos, 0), c)
            parts.append(self._emit(txr, txi, wxr, wxi, lo, hi))
        if len(parts) == 1:
            return parts[0]
        cat = (lambda ps: Complex(
            jnp.concatenate([p.re for p in ps], axis=-1),
            jnp.concatenate([p.im for p in ps], axis=-1)))
        Wx = cat([p[1] for p in parts])
        Tx = cat([p[0] for p in parts]) if self.ssq else None
        return Tx, Wx

    def _emit(self, txr, txi, wxr, wxi, lo, hi):
        sl = (lambda a: a[0, ..., lo:hi] if self._squeeze
              else a[..., lo:hi])
        Wx = Complex(sl(wxr), sl(wxi))
        Tx = Complex(sl(txr), sl(txi)) if self.ssq else None
        return Tx, Wx

    def reset(self):
        """Forget all carried state; the compiled program is kept."""
        self._init_state()

    # -- checkpoint / resume (multi-host recovery: parallel/health.py) --
    def state_dict(self):
        """Host-side snapshot of ALL carried state — the streaming plans
        are the library's only stateful objects, so this is the whole
        checkpoint story: persist it (numpy), rebuild the plan on the
        replacement process (plans/compiled programs reload from the
        disk caches), `load_state`, continue."""
        return {
            'hist': (np.asarray(self._hist) if self._hist is not None
                     else None),
            'pend': (np.asarray(self._pend) if self._pend is not None
                     else None),
            'done': self._done,
            'ncalls': self._ncalls,
            'squeeze': getattr(self, '_squeeze', None),
        }

    def load_state(self, state):
        """Restore a `state_dict` snapshot onto this (same-plan) object;
        the next `process`/`finalize` continues the stream exactly."""
        self._hist = (jnp.asarray(state['hist'], self.dtype)
                      if state['hist'] is not None else None)
        self._pend = (jnp.asarray(state['pend'], self.dtype)
                      if state['pend'] is not None else None)
        self._done = bool(state['done'])
        self._ncalls = int(state['ncalls'])
        if state['squeeze'] is not None:
            self._squeeze = bool(state['squeeze'])
        return self


class StreamingSSQCWT(_StreamingBase):
    """Online synchrosqueezed CWT over fixed-size chunks.

    Usage::

        plan = StreamingSSQCWT(chunk=1024, wavelet='gmw', N=16384)
        for c in chunks:              # each (chunk,) or (B, chunk)
            Tx_cols, Wx_cols = plan.process(c)
        Tx_tail, Wx_tail = plan.finalize()

    `process` returns the transform columns for `chunk` signal positions
    delayed by `lookahead` samples (the first call returns
    ``chunk - lookahead`` columns; `finalize` flushes the final
    `lookahead` columns using reflected right-padding). Concatenating
    every emitted block reproduces one column per input sample.

    Parameters
    ----------
    chunk : int
        Samples per `process` call. All calls must use this size.
    N : int
        Planning length for scale selection and the ssq frequency grid
        (use the true signal length when known; any representative
        record length otherwise). Defaults to ``16 * chunk``.
    history, lookahead : int
        Left / right context in samples. Both default to the largest
        scale's time support (`halo_mult` standard deviations) capped at
        ``4 * chunk`` — raise them for full-fidelity top scales (see
        `support_np` / `n_reliable`), lower `lookahead` for latency.
    batch : leading batch size inferred from the first chunk.
    """

    def __init__(self, chunk, wavelet='gmw', scales='log', nv=32, fs=1.,
                 N=None, history=None, lookahead=None, halo_mult=8.0,
                 maprange='peak', flipud=True, gamma=None,
                 deriv_lowprec=None, ssq=True):
        self.chunk = int(chunk)
        self.N_plan = int(N) if N is not None else 16 * self.chunk
        self.ssq = bool(ssq)

        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet,
                                                       N=self.N_plan)
        self.dtype = self.wavelet.dtype
        dt = 1. / fs
        self.dt = dt

        scales_np, scaletype, _, nv_ = process_scales(
            scales, self.N_plan, self.wavelet, nv=nv, get_params=True)
        self.scales_np = scales_np
        max_scale = float(np.max(scales_np))

        # per-row time support (the reliability contract): sigma_t grows
        # linearly in scale, so estimate the slope at a reference scale
        # (the time_sharded exact-path criterion, time_sharded.py:119)
        from .models.wavelets import time_resolution
        s_ref = float(np.clip(10., scales_np.min(), max_scale))
        try:
            sigma1 = float(time_resolution(
                self.wavelet, s_ref, N=self.N_plan, nondim=False,
                force_int=False)) / s_ref
        except Exception:
            sigma1 = 3.5
        self.halo_mult = float(halo_mult)
        self.support_np = halo_mult * sigma1 * scales_np.squeeze()
        ctx = max(64, min(int(np.ceil(self.support_np.max())),
                          4 * self.chunk))
        self.history = int(history) if history is not None else ctx
        self.lookahead = int(lookahead) if lookahead is not None else ctx
        if self.history < 0 or self.lookahead < 0:
            raise ValueError("history/lookahead must be >= 0")

        n_ext = self.history + self.chunk + self.lookahead
        self.n_up = _next_fft_len(n_ext)
        self.pad_extra = self.n_up - n_ext

        self.ssq_freqs = _compute_associated_frequencies(
            scales_np, self.N_plan, self.wavelet, scaletype, maprange,
            True, dt, 'cwt')
        if scaletype == 'log-piecewise':
            from .utils.cwt_utils import nv_from_scales
            const = np.log(2) / nv_from_scales(scales_np)
        elif scaletype.startswith('log'):
            const = np.log(2) / nv_
        else:
            const = ((scales_np[1] - scales_np[0]) / scales_np).squeeze()
        c = np.asarray(const, np.float64).squeeze()
        if c.ndim == 0:
            c = np.full(len(scales_np), c)
        self.const_np = c

        self.params = ssq_bin_params(self.ssq_freqs,
                                     scaletype.startswith('log'))
        self.nbins = self.params['omax'] + 1
        self.flipud = bool(flipud)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.deriv_lowprec = deriv_lowprec

        self._scales_j = jnp.asarray(scales_np, self.dtype)
        self._const_j = jnp.asarray(c, self.dtype)
        self._plan_args = (self._scales_j, self._const_j)
        self._init_state()
        self._fn = self._build()

    # -- compiled per-chunk body -------------------------------------
    def _build(self):
        wavelet, dtype = self.wavelet, self.dtype
        h, c, l = self.history, self.chunk, self.lookahead
        n_up, pad_extra = self.n_up, self.pad_extra
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt, ssq = self.nbins, self.dt, self.ssq
        platform = jax.devices()[0].platform
        na = len(self.scales_np)
        nb_hint = np.clip(np.arange(na) if flipud
                          else np.arange(na - 1, -1, -1),
                          0, nbins - 1).astype(np.int32)

        use_pallas, interp = _pallas_enabled(platform)
        use_bins = False
        if use_pallas and ssq:
            from .ops.cwt_pallas import cwt_pallas_applicable
            if (cwt_pallas_applicable(wavelet, n_up, True)
                    and _is_analytic(wavelet)):
                probe = wavelet.fn(jnp.zeros((1,), dtype), xp=jnp)
                use_bins = not isinstance(probe, tuple)
        self.uses_bins_pipeline = use_bins

        if use_bins:
            from .configs import get_config
            from .ops.fft import fft as _fft
            from .ops.cwt_pallas import (cwt_fused_bins_pallas,
                                         support_klims)
            from .ops.ssq_pallas import scatter_kv_pallas
            lowprec = (get_config().ssq_lowprec_deriv
                       if self.deriv_lowprec is None
                       else self.deriv_lowprec)
            klims = support_klims(wavelet, self.scales_np, n_up)
            half = n_up // 2 + 1

        def body(hist, pend, chunk, scales_j, const_j):
            w = jnp.concatenate([hist, pend, chunk], axis=-1)
            # carry for the next call: the history samples preceding the
            # next emit region, and the trailing lookahead samples
            new_hist = w[..., c:c + h]
            new_pend = w[..., h + c:]
            xe = w
            if pad_extra:
                xe = jnp.concatenate(
                    [xe, _reflect(xe, pad_extra, False)], axis=-1)
            if use_bins:
                xh = _fft(Complex(xe, jnp.zeros_like(xe)), axis=-1,
                          out_range=(0, half), imag_zero=True)
                Wx, k = cwt_fused_bins_pallas(
                    xh, scales_j, wavelet, n_up, h, c, dt, True,
                    params, gamma, flipud, interpret=interp,
                    deriv_lowprec=lowprec, klims=klims)
                Tx = scatter_kv_pallas(Wx, k, const_j, nbins,
                                       natural_bins=nb_hint,
                                       interpret=interp)
            else:
                Wx, dWx = cwt_core(xe, wavelet, scales_j, dt,
                                   derivative=ssq, l1_norm=True, n1=h,
                                   N=c, rpadded=False, is_2d=True,
                                   platform=platform)
                if not ssq:
                    z = jnp.zeros((1, 1, 1), dtype)
                    return (z, z, Wx.re, Wx.im, new_hist, new_pend)
                ww = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
                valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
                ww = jnp.where(valid, ww, jnp.inf)
                k, kvalid = compute_bins(ww, params, flipud)
                valid = valid & kvalid
                cst = const_j.reshape(1, -1, 1)
                vre, vim = Wx.re * cst, Wx.im * cst
                Tx = jax.vmap(
                    lambda a, b, kk, vv: _dispatch_scatter(
                        a, b, kk, vv, nbins, nb_hint,
                        platform=platform))(vre, vim, k, valid)
            return Tx.re, Tx.im, Wx.re, Wx.im, new_hist, new_pend

        return jax.jit(body)

    @property
    def n_reliable(self):
        """Scale rows whose time support fits the context (rows are
        support-ascending, so rows [0, n_reliable) meet the offline
        equality criterion away from the global signal edges)."""
        ctx = min(self.history, self.lookahead) if self.lookahead else \
            self.history
        return int((self.support_np <= ctx).sum())

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()


class StreamingSSQCWT2(StreamingSSQCWT):
    """Online SECOND-ORDER synchrosqueezed CWT (WSST2) — the streaming
    CWT's overlap-save machinery with the five-kernel chirp-regression
    body (models/ssq_cwt2._wsst2_rows). Same latency/reliability
    contract as first order, with `support_np` widened by
    ``(halo_mult + 2) / halo_mult``: the t/t²-weighted kernels carry
    their mass ~1–2 σ_t further out than ψ itself."""

    def __init__(self, *args, **kw):
        kw.pop('ssq', None)
        kw.pop('deriv_lowprec', None)
        super().__init__(*args, ssq=True, **kw)
        from .models.ssq_cwt2 import _supports_order2
        ok, why = _supports_order2(self.wavelet, self.dtype)
        if not ok:
            raise NotImplementedError("StreamingSSQCWT2 %s" % why)
        self.support_np = (self.support_np
                           * (self.halo_mult + 2.) / self.halo_mult)

    def _build(self):
        from .ops.fft import fft as _fft
        from .models.ssq_cwt2 import _wavelet_grad_fns, _wsst2_rows
        wavelet, dtype = self.wavelet, self.dtype
        h, c = self.history, self.chunk
        n_up, pad_extra = self.n_up, self.pad_extra
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt = self.nbins, self.dt
        platform = jax.devices()[0].platform
        na = len(self.scales_np)
        nb_hint = np.clip(np.arange(na) if flipud
                          else np.arange(na - 1, -1, -1),
                          0, nbins - 1).astype(np.int32)
        fns = _wavelet_grad_fns(wavelet)
        tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)
        half = n_up // 2 + 1
        self.uses_bins_pipeline = False

        def body(hist, pend, chunk, scales_j, const_j):
            w = jnp.concatenate([hist, pend, chunk], axis=-1)
            new_hist = w[..., c:c + h]
            new_pend = w[..., h + c:]
            xe = w
            if pad_extra:
                xe = jnp.concatenate(
                    [xe, _reflect(xe, pad_extra, False)], axis=-1)
            xh = _fft(Complex(xe, jnp.zeros_like(xe)), axis=-1,
                      out_range=(0, half), imag_zero=True)
            xh = Complex(xh.re[:, None], xh.im[:, None])
            W, w2 = _wsst2_rows(xh, scales_j, fns, n_up, h, c, dt,
                                gamma, dtype, tiny)
            k, kvalid = compute_bins(w2, params, flipud)
            cst = const_j.reshape(1, -1, 1)
            Tx = jax.vmap(
                lambda a, b, kk, vv: _dispatch_scatter(
                    a, b, kk, vv, nbins, nb_hint,
                    platform=platform))(W.re * cst, W.im * cst, k,
                                        kvalid)
            return Tx.re, Tx.im, W.re, W.im, new_hist, new_pend

        return jax.jit(body)


class StreamingCWT(StreamingSSQCWT):
    """Online CWT (no reassignment): `process` returns Wx columns."""

    def __init__(self, chunk, wavelet='gmw', scales='log', nv=32, fs=1.,
                 **kw):
        kw.pop('ssq', None)
        super().__init__(chunk, wavelet, scales, nv, fs, ssq=False, **kw)

    def process(self, x):
        return super().process(x)[1]

    def finalize(self):
        return super().finalize()[1]


class StreamingSSQSTFT(_StreamingBase):
    """Online synchrosqueezed STFT (hop 1) over fixed-size chunks.

    Unlike the CWT, the STFT kernel's time support is FINITE (`n_fft`
    samples), so the streaming transform is *exact*: with
    ``history = ceil((n_fft-1)/2)`` and ``lookahead = (n_fft-1)//2``
    (fixed by the plan — precisely the offline conv-form pad geometry,
    ops/stft_conv.py) every emitted column equals the offline
    `stft`/`ssq_stft` column up to FFT rounding, including the global
    edges when ``chunk >= n_fft`` (the edge reflections then draw on
    identical samples). Latency is fixed at `lookahead` samples.

    `process` returns (Tx_cols, Sx_cols); the per-chunk body is the
    offline fast pipeline on a window of length ``chunk + n_fft - 1``
    (conv-STFT bins kernel + k-consuming scatter on TPU, XLA elsewhere).
    """

    def __init__(self, chunk, window=None, n_fft=None, win_len=None,
                 fs=1., modulated=True, ssq_freqs=None, squeezing='sum',
                 gamma=None, flipud=False, dtype=None, ssq=True):
        from .configs import default_dtype
        from .models.stft import _window_key
        from .models.windows import get_window as _gw, _check_NOLA
        from .models.ssqueezing import _natural_bins
        self.chunk = int(chunk)
        self.ssq = bool(ssq)
        n_fft = int(n_fft or min(512, self.chunk))
        self.n_fft = n_fft
        # exactness geometry: the conv output column j draws on window
        # samples [j, j + n_fft); matching the offline pad arithmetic
        # (ops/pad.py:25, odd pad extra on the left) pins the context
        self.history = (n_fft - 1) - (n_fft - 1) // 2
        self.lookahead = (n_fft - 1) // 2
        self.dtype = dtype or default_dtype()
        self.fs = float(fs)
        self.modulated = bool(modulated)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)
        self.flipud = bool(flipud)
        self.squeezing = squeezing

        win_len = int(win_len or n_fft)
        win, dwin = _gw(window, win_len, n_fft, derivative=True,
                        dtype=self.dtype)
        _check_NOLA(win, 1, self.dtype)
        self.win_key = _window_key(win, dwin)

        n_rows = n_fft // 2 + 1
        self.Sfs = np.linspace(0, .5 * self.fs, n_rows,
                               dtype=self.dtype)
        if ssq_freqs is None:
            ssq_freqs = self.Sfs
        self.ssq_freqs = np.asarray(ssq_freqs)
        self.const = float(self.ssq_freqs[1] - self.ssq_freqs[0])
        self.params = ssq_bin_params(self.ssq_freqs, logscale=False)
        self.nbins = self.params['omax'] + 1
        self._natural = _natural_bins('stft', None, self.ssq_freqs,
                                      self.params, self.flipud, n_rows,
                                      1. / self.fs)
        self._init_state()
        self._fn, self._plan_args = self._build()

    def _build(self):
        from .ops.stft_conv import (stft_conv, stft_conv_bins,
                                    _device_filterbank,
                                    _stft_pallas_applicable,
                                    _next_fft_len as _nfl)
        from .models.ssq_cwt import _apply_squeezing
        c, h, l = self.chunk, self.history, self.lookahead
        n_fft, dtype, fs_ = self.n_fft, self.dtype, self.fs
        modulated, win_key = self.modulated, self.win_key
        params, gamma, flipud = self.params, self.gamma, self.flipud
        natural, const, nbins = self._natural, self.const, self.nbins
        squeezing, ssq = self.squeezing, self.ssq
        padlength = h + c + l                 # == c + n_fft - 1
        Np2 = _nfl(padlength)
        tables = _device_filterbank(win_key, n_fft, Np2, modulated,
                                    dtype)
        use_pallas, interp = _pallas_enabled(jax.devices()[0].platform)
        sfs_key = tuple(float(v) for v in self.Sfs)
        str_sq = squeezing is None or isinstance(squeezing, str)
        bins_ok = (ssq and use_pallas and str_sq and
                   (_stft_pallas_applicable(Np2, (padlength,))
                    or interp))
        self.uses_bins_pipeline = bins_ok
        Sfs_np = self.Sfs

        def body(hist, pend, chunk, *tbl):
            w = jnp.concatenate([hist, pend, chunk], axis=-1)
            new_hist = w[..., c:c + h]
            new_pend = w[..., h + c:]
            # the window IS the padded signal (stft_conv's internal
            # padsignal is a no-op at exactly `padlength` samples)
            if bins_ok and w.shape[0] == 1:
                from .ops.ssq_pallas import scatter_kv_pallas
                Sx1, k = stft_conv_bins(
                    w[0], fs_, n_fft, c, win_key, modulated, 'reflect',
                    padlength, dtype, params, gamma, flipud, sfs_key,
                    tbl, interpret=interp)
                Sx_s = _apply_squeezing(Sx1, squeezing)
                Tx = scatter_kv_pallas(Sx_s, k, const, nbins,
                                       natural_bins=natural,
                                       interpret=interp)
                return (Tx.re[None], Tx.im[None], Sx1.re[None],
                        Sx1.im[None], new_hist, new_pend)
            Sx, dSx = stft_conv(w, fs_, n_fft, c, win_key, modulated,
                                ssq, 'reflect', padlength, dtype,
                                tables=tbl)
            if not ssq:
                z = jnp.zeros((1, 1, 1), dtype)
                return z, z, Sx.re, Sx.im, new_hist, new_pend
            Sfs_j = jnp.asarray(Sfs_np)
            if squeezing in (None, 'sum'):
                Tx = ssqueeze_fast(Sx, dSx, None, const, logscale=False,
                                   flipud=flipud, gamma=gamma, Sfs=Sfs_j,
                                   params=params, natural_bins=natural)
            else:
                from .ops.phase import phase_stft
                ww = phase_stft(Sx, dSx, Sfs_j, gamma)
                Sx_s = _apply_squeezing(Sx, squeezing)
                Tx = indexed_sum_onfly(Sx_s, ww, None, const,
                                       logscale=False, flipud=flipud,
                                       params=params,
                                       natural_bins=natural)
            return Tx.re, Tx.im, Sx.re, Sx.im, new_hist, new_pend

        return jax.jit(body), tables

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy() if self.flipud \
            else self.ssq_freqs.copy()


class StreamingSSQSTFT2(StreamingSSQSTFT):
    """Online SECOND-ORDER synchrosqueezed STFT (FSST2) — exact, like
    the first-order streaming STFT: all five analysis windows (g, g',
    t g, t g', g'') share the same finite `n_fft` support, so the chunk
    window `history + chunk + lookahead` pins every emitted column to
    the offline `ssq_stft2` geometry. The per-chunk body is the offline
    fused bank pipeline (one forward FFT, (5*n_rows, Np2) bank multiply,
    batched IFFT, chirp-rate regression, reassignment) on the fixed
    window — one compiled program, carry state device-resident."""

    def _build(self):
        from .ops.fft import fft
        from .ops.stft_conv import (_device_filterbank_multi, _bank_key,
                                    _next_fft_len as _nfl)
        from .models.ssq_stft import _fsst2_rows
        from .models.ssq_cwt import _apply_squeezing
        from .models.stft import _WINDOW_CACHE
        from .models.windows import get_window as _gw
        c, h, l = self.chunk, self.history, self.lookahead
        n_fft, dtype, fs_ = self.n_fft, self.dtype, self.fs
        params, gamma, flipud = self.params, self.gamma, self.flipud
        natural, const = self._natural, self.const
        squeezing = self.squeezing
        padlength = h + c + l                 # == c + n_fft - 1
        Np2 = _nfl(padlength)
        win, dwin = _WINDOW_CACHE[self.win_key]
        _, d2g = _gw(dwin, n_fft, n_fft, derivative=True, dtype=dtype)
        ncen = (np.arange(n_fft) - n_fft // 2).astype(np.float64)
        bank = np.stack([win, dwin, ncen * win, ncen * dwin,
                         np.asarray(d2g)]).astype(np.float64)
        tables = _device_filterbank_multi(_bank_key(bank), n_fft, Np2,
                                          self.modulated, dtype)
        self.uses_bins_pipeline = False
        n_rows = n_fft // 2 + 1
        tiny = float(np.finfo(np.dtype(dtype)).tiny * 1e3)
        Sfs_np = np.asarray(self.Sfs, dtype)

        def body(hist, pend, chunk, Hre, Him):
            w = jnp.concatenate([hist, pend, chunk], axis=-1)
            new_hist = w[..., c:c + h]
            new_pend = w[..., h + c:]
            # `w` IS the padded signal (padlength samples; fft zero-pads
            # to Np2 exactly as the offline plan's padsignal + fft)
            xh = fft(Complex(w, jnp.zeros_like(w)), n=Np2,
                     imag_zero=True)
            xh = Complex(xh.re[:, None], xh.im[:, None])
            V, w2 = _fsst2_rows(xh, Hre, Him, n_rows, Np2, c, fs_,
                                Sfs_np, gamma, dtype, tiny)
            Sx_s = _apply_squeezing(V, squeezing)
            Tx = indexed_sum_onfly(Sx_s, w2, None, const, logscale=False,
                                   flipud=flipud, params=params,
                                   natural_bins=natural)
            return Tx.re, Tx.im, V.re, V.im, new_hist, new_pend

        return jax.jit(body), tables


class StreamingSTFT(StreamingSSQSTFT):
    """Online STFT (no reassignment): `process` returns Sx columns."""

    def __init__(self, chunk, window=None, n_fft=None, win_len=None,
                 fs=1., **kw):
        kw.pop('ssq', None)
        super().__init__(chunk, window, n_fft, win_len, fs, ssq=False,
                         **kw)

    def process(self, x):
        return super().process(x)[1]

    def finalize(self):
        return super().finalize()[1]


def _drive(plan, x, chunk):
    """Feed `x` through `plan` chunkwise; concatenate emitted columns."""
    x = np.asarray(x)
    squeeze = x.ndim == 1
    xb = x[None] if squeeze else x
    N = xb.shape[-1]
    if N % chunk:
        raise ValueError("signal length %d not divisible by chunk %d"
                         % (N, chunk))
    txs, wxs = [], []
    for i in range(N // chunk):
        t, w = _StreamingBase.process(plan, xb[..., i * chunk:
                                               (i + 1) * chunk])
        txs.append(t)
        wxs.append(w)
    t, w = _StreamingBase.finalize(plan)
    if w is not None:
        txs.append(t)
        wxs.append(w)
    cat = (lambda parts: Complex(
        jnp.concatenate([p.re for p in parts], axis=-1),
        jnp.concatenate([p.im for p in parts], axis=-1)))
    Wx = cat(wxs)
    Tx = cat(txs) if plan.ssq else None
    if squeeze:
        # _drive feeds (1, chunk) blocks, so emitted parts kept a batch
        # dim of 1; the plan never saw a 1D chunk
        Wx = Complex(Wx.re[0], Wx.im[0])
        Tx = Complex(Tx.re[0], Tx.im[0]) if Tx is not None else None
    return Tx, Wx


def stream_ssq_cwt(x, chunk, wavelet='gmw', scales='log', nv=32, fs=1.,
                   **kw):
    """Offline convenience: run the streaming plan over a full signal.
    Returns (Tx, Wx, ssq_freqs, scales) matching `ssq_cwt`'s column
    count; useful for validating stream == offline."""
    x = np.asarray(x)
    plan = StreamingSSQCWT(chunk, wavelet, scales, nv, fs,
                           N=kw.pop('N', x.shape[-1]), **kw)
    Tx, Wx = _drive(plan, x, chunk)
    return Tx, Wx, plan.ssq_freqs_out, plan.scales_np.squeeze()


def stream_cwt(x, chunk, wavelet='gmw', scales='log', nv=32, fs=1.,
               **kw):
    """Offline convenience for the streaming CWT. Returns (Wx, scales)."""
    x = np.asarray(x)
    kw.pop('ssq', None)
    plan = StreamingSSQCWT(chunk, wavelet, scales, nv, fs,
                           N=kw.pop('N', x.shape[-1]), ssq=False, **kw)
    _, Wx = _drive(plan, x, chunk)
    return Wx, plan.scales_np.squeeze()


def stream_ssq_stft(x, chunk, window=None, n_fft=None, fs=1., **kw):
    """Offline convenience: streaming ssq_stft over a full signal.
    Returns (Tx, Sx, ssq_freqs, Sfs)."""
    x = np.asarray(x)
    plan = StreamingSSQSTFT(chunk, window, n_fft, fs=fs, **kw)
    Tx, Sx = _drive(plan, x, chunk)
    return Tx, Sx, plan.ssq_freqs_out, plan.Sfs


def stream_ssq_stft2(x, chunk, window=None, n_fft=None, fs=1., **kw):
    """Offline convenience: streaming SECOND-ORDER ssq_stft (FSST2) over
    a full signal. Returns (Tx, Sx, ssq_freqs, Sfs)."""
    x = np.asarray(x)
    plan = StreamingSSQSTFT2(chunk, window, n_fft, fs=fs, **kw)
    Tx, Sx = _drive(plan, x, chunk)
    return Tx, Sx, plan.ssq_freqs_out, plan.Sfs


def stream_stft(x, chunk, window=None, n_fft=None, fs=1., **kw):
    """Offline convenience for the streaming STFT. Returns Sx."""
    x = np.asarray(x)
    kw.pop('ssq', None)
    plan = StreamingSSQSTFT(chunk, window, n_fft, fs=fs, ssq=False, **kw)
    _, Sx = _drive(plan, x, chunk)
    return Sx
