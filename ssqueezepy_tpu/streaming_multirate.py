# -*- coding: utf-8 -*-
"""Octave-cascaded (multirate) streaming synchrosqueezed CWT.

`StreamingSSQCWT` (streaming.py) computes every scale at the full sample
rate, so its per-chunk window — and therefore its FFT-convolution cost —
is sized by the LARGEST scale's time support. But large scales are
narrowband low-pass: a scale whose passband lies below ``pi/2^j`` can be
computed exactly (to halfband-filter precision) on a 2^j-decimated
stream, where its support is 2^j-times fewer samples. This class splits
the scale axis into octave blocks, runs a halfband decimation cascade
(`ops/multirate.py`) inside the per-chunk program, FFT-convolves each
block at its own rate, and interpolates the (band-limited) Wx/dWx rows
back to full rate before one shared reassignment scatter.

Compute per emitted column drops by roughly the octave distribution's
harmonic mean (~5-10x for a full 'log' scale set) versus the full-rate
plan sized for the same accuracy. LATENCY does not change — a scale with
time support S physically needs ~S future samples regardless of the rate
it is computed at; the plan derives the required (history, lookahead)
from the slowest octave's geometry automatically.

Alignment arithmetic (all plan-time): with taps-long halfband filters,
g = (taps-1)/2, an octave-j sample at decimated index m corresponds to
full-rate time ``m*2^j + g*(2^j - 1)``; j interpolation stages add
another ``g*(2^j - 1)``, so emitting full-rate columns [h, h+c) of the
window needs decimated CWT columns starting at
``a_j = floor((h - 2g(2^j-1)) / 2^j)`` with sub-sample crop
``o_j = h - a_j*2^j - 2g(2^j-1)``. Each octave's CWT columns are valid
only an octave-support margin away from its decimated window's edges;
the plan grows (history, lookahead) until every margin holds.

No reference analog (the reference computes all scales at full rate);
the à-trous/pyramid recipe is standard DSP, the fusion into one
compiled streaming program is original here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .ops.complexlib import Complex
from .ops.ssq_kernels import (ssq_bin_params, compute_bins,
                              _dispatch_scatter)
from .ops.phase import _imag_ratio_over_2pi
from .ops.multirate import halfband_fir, conv_valid, interp2
from .utils.common import EPS32, EPS64
from .utils.cwt_utils import process_scales
from .models.wavelets import Wavelet, time_resolution
from .models.cwt import cwt_core, _process_gmw_wavelet
from .models.ssqueezing import _compute_associated_frequencies
from .parallel.time_sharded import _next_fft_len, _reflect
from .streaming import _StreamingBase

__all__ = ['StreamingMultirateSSQCWT']


def _freq_support(wavelet, thresh=1e-6):
    """Largest w with |psih(w)| > thresh*max at scale 1 (rad/sample)."""
    w = np.linspace(0, 32 * np.pi, 1 << 15)
    try:
        p = np.abs(np.asarray(wavelet.fn(w, xp=np), np.float64))
    except Exception:
        return np.pi
    keep = p > thresh * p.max()
    return float(w[keep][-1]) if keep.any() else np.pi


class StreamingMultirateSSQCWT(_StreamingBase):
    """Online SSQ-CWT with per-octave decimated computation.

    Same `process`/`finalize` contract as `StreamingSSQCWT`; the plan
    sizes (history, lookahead) itself so EVERY scale row is reliable
    (pass `lookahead` to cap latency — rows whose geometry no longer
    fits then raise at plan time rather than degrade silently).
    Accuracy: full-rate rows match `StreamingSSQCWT`; decimated rows add
    the halfband cascade's passband error (~1e-4 relative — asserted in
    tests/test_streaming_multirate.py).
    """

    def __init__(self, chunk, wavelet='gmw', scales='log', nv=32, fs=1.,
                 N=None, lookahead=None, halo_mult=8.0, taps=63,
                 maprange='peak', flipud=True, gamma=None, ssq=True,
                 guard_frac=0.4):
        self.chunk = int(chunk)
        self.N_plan = int(N) if N is not None else 16 * self.chunk
        self.ssq = bool(ssq)
        self.taps = int(taps)

        wavelet = _process_gmw_wavelet(wavelet, l1_norm=True)
        self.wavelet = Wavelet._init_if_not_isinstance(wavelet,
                                                       N=self.N_plan)
        self.dtype = self.wavelet.dtype
        dt = 1. / fs
        self.dt = dt

        scales_np, scaletype, _, nv_ = process_scales(
            scales, self.N_plan, self.wavelet, nv=nv, get_params=True)
        self.scales_np = scales_np
        sq = scales_np.squeeze()

        # octave per scale: wmax(s) = wmax(1)/s must sit below
        # guard_frac * pi at the octave's rate (guard below the halfband
        # cutoff pi/2 so cascade passband error stays at ripple level)
        wmax1 = _freq_support(self.wavelet)
        wmax = wmax1 / sq
        oct_f = np.floor(np.log2(np.maximum(guard_frac * np.pi / wmax,
                                            1.0)))
        # chunk divisibility caps the cascade depth
        j_cap = 0
        while self.chunk % (2 ** (j_cap + 1)) == 0 and j_cap < 8:
            j_cap += 1
        self.octaves = np.minimum(oct_f.astype(int), j_cap)
        # enforce monotone (wmax is monotone in s, but guard anyway)
        self.octaves = np.maximum.accumulate(self.octaves)

        # per-row support (full-rate samples) -> per-octave context at
        # the octave's own rate
        s_ref = float(np.clip(10., sq.min(), sq.max()))
        try:
            sigma1 = float(time_resolution(
                self.wavelet, s_ref, N=self.N_plan, nondim=False,
                force_int=False)) / s_ref
        except Exception:
            sigma1 = 3.5
        self.support_np = halo_mult * sigma1 * sq

        J = int(self.octaves.max())
        blocks = []                      # (j, row_lo, row_hi)
        for j in sorted(set(self.octaves.tolist())):
            idx = np.nonzero(self.octaves == j)[0]
            blocks.append((int(j), int(idx[0]), int(idx[-1]) + 1))
        self._blocks = blocks
        ctx = {}
        for j, lo, hi in blocks:
            ctx[j] = int(np.ceil(self.support_np[lo:hi].max()
                                 / 2 ** j)) + 8
        self._ctx = ctx

        # ---- window geometry: grow (h, l) until every octave fits ----
        g = (self.taps - 1) // 2
        t1 = self.taps - 1
        c = self.chunk
        h = ctx.get(0, 64)
        for j, lo, hi in blocks:
            if j > 0:
                h = max(h, 2 * g * (2 ** j - 1) + (ctx[j] + 1) * 2 ** j)
        l_req = ctx.get(0, 64)
        geo = {}
        while True:
            Wn = h + c + l_req
            ok = True
            geo = {}
            for j, lo, hi in blocks:
                if j == 0:
                    continue
                a = (h - 2 * g * (2 ** j - 1)) // 2 ** j
                o = h - a * 2 ** j - 2 * g * (2 ** j - 1)
                # interp2 consumes `taps` per stage: j stages from L
                # inputs emit 2^j*L - (2^j - 1)*(t1 + 1) columns
                L = -(-(o + c + (2 ** j - 1) * (t1 + 1)) // 2 ** j)
                M = Wn
                for _ in range(j):
                    M = (M - t1 + 1) // 2
                geo[j] = (a, o, L, M)
                if a < ctx[j] or a + L + ctx[j] > M:
                    ok = False
            if ok:
                break
            l_req += max(64, 2 ** J * 8)
        self.history = h
        if lookahead is not None and int(lookahead) < l_req:
            raise ValueError(
                "lookahead=%d is below the %d samples the slowest octave"
                " needs; raise it (or cap the scale range)"
                % (int(lookahead), l_req))
        self.lookahead = int(lookahead) if lookahead is not None \
            else l_req
        # recompute right-margin geometry at the final window size
        Wn = h + c + self.lookahead
        for j in list(geo):
            a, o, L, M = geo[j]
            M = Wn
            for _ in range(j):
                M = (M - t1 + 1) // 2
            geo[j] = (a, o, L, M)
        self._geo = geo

        # ---- reassignment plan (same as the full-rate class) ---------
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
        cst = np.asarray(const, np.float64).squeeze()
        if cst.ndim == 0:
            cst = np.full(len(sq), cst)
        self.const_np = cst
        self.params = ssq_bin_params(self.ssq_freqs,
                                     scaletype.startswith('log'))
        self.nbins = self.params['omax'] + 1
        self.flipud = bool(flipud)
        if gamma is None:
            gamma = 10 * (EPS64 if self.dtype == 'float64' else EPS32)
        self.gamma = float(gamma)

        self._scales_j = jnp.asarray(scales_np, self.dtype)
        self._const_j = jnp.asarray(cst, self.dtype)
        self._plan_args = (self._scales_j, self._const_j)
        self._init_state()
        self._fn = self._build()

    # -----------------------------------------------------------------
    def _build(self):
        wavelet, dtype = self.wavelet, self.dtype
        h, c, l = self.history, self.chunk, self.lookahead
        params, gamma, flipud = self.params, self.gamma, self.flipud
        nbins, dt, ssq = self.nbins, self.dt, self.ssq
        platform = jax.devices()[0].platform
        blocks, geo, ctx = self._blocks, self._geo, self._ctx
        taps = self.taps
        hfir = halfband_fir(taps)
        na = len(self.scales_np)
        nb_hint = np.clip(np.arange(na) if flipud
                          else np.arange(na - 1, -1, -1),
                          0, nbins - 1).astype(np.int32)

        def octave_rows(w, j, lo, hi, scales_j):
            """(Wx, dWx) full-rate rows [lo:hi) of the emit region."""
            scales_blk = scales_j[lo:hi]
            if j == 0:
                m = ctx[0]
                w0 = w[..., h - m:h + c + m]
                n_up = _next_fft_len(w0.shape[-1])
                if n_up > w0.shape[-1]:
                    w0 = jnp.concatenate(
                        [w0, _reflect(w0, n_up - w0.shape[-1], False)],
                        axis=-1)
                return cwt_core(w0, wavelet, scales_blk, dt,
                                derivative=ssq, l1_norm=True, n1=m, N=c,
                                rpadded=False, is_2d=True,
                                platform=platform)
            a, o, L, M = geo[j]
            wj = w
            for _ in range(j):
                wj = conv_valid(wj, hfir)[..., ::2]
            n_up = _next_fft_len(wj.shape[-1])
            if n_up > wj.shape[-1]:
                wj = jnp.concatenate(
                    [wj, _reflect(wj, n_up - wj.shape[-1], False)],
                    axis=-1)
            Wj, dWj = cwt_core(wj, wavelet, scales_blk / 2 ** j,
                               dt * 2 ** j, derivative=ssq, l1_norm=True,
                               n1=a, N=L, rpadded=False, is_2d=True,
                               platform=platform)
            def up(p):
                for _ in range(j):
                    p = interp2(p)
                return p[..., o:o + c]
            Wx = Complex(up(Wj.re), up(Wj.im))
            dWx = Complex(up(dWj.re), up(dWj.im)) if ssq else None
            return Wx, dWx

        def body(hist, pend, chunk, scales_j, const_j):
            w = jnp.concatenate([hist, pend, chunk], axis=-1)
            new_hist = w[..., c:c + h]
            new_pend = w[..., h + c:]
            parts = [octave_rows(w, j, lo, hi, scales_j)
                     for j, lo, hi in blocks]
            Wx = Complex(
                jnp.concatenate([p[0].re for p in parts], axis=-2),
                jnp.concatenate([p[0].im for p in parts], axis=-2))
            if not ssq:
                z = jnp.zeros((1, 1, 1), dtype)
                return z, z, Wx.re, Wx.im, new_hist, new_pend
            dWx = Complex(
                jnp.concatenate([p[1].re for p in parts], axis=-2),
                jnp.concatenate([p[1].im for p in parts], axis=-2))
            ww = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
            valid = Wx.abs2() > jnp.asarray(gamma, dtype) ** 2
            ww = jnp.where(valid, ww, jnp.inf)
            k, kvalid = compute_bins(ww, params, flipud)
            valid = valid & kvalid
            cc = const_j.reshape(1, -1, 1)
            vre, vim = Wx.re * cc, Wx.im * cc
            Tx = jax.vmap(
                lambda a_, b_, kk, vv: _dispatch_scatter(
                    a_, b_, kk, vv, nbins, nb_hint,
                    platform=platform))(vre, vim, k, valid)
            return Tx.re, Tx.im, Wx.re, Wx.im, new_hist, new_pend

        return jax.jit(body)

    @property
    def ssq_freqs_out(self):
        return self.ssq_freqs[::-1].copy()

    @property
    def compute_ratio(self):
        """Approximate FLOP fraction vs computing every row at full rate
        with the slowest octave's window (the full-rate plan at equal
        accuracy): rows weighted by their octave's decimation."""
        w = 2.0 ** -self.octaves
        return float(w.mean())
