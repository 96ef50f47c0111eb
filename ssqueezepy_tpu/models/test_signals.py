# -*- coding: utf-8 -*-
"""Test-signal suite: signals of varying time-frequency characteristics.

Behavioral reference: `/root/reference/ssqueezepy/_test_signals.py`
(`TestSignals` :80, generators :165-460, `make_signals` :539-586,
anti-aliasing minimal-N estimator :645-661, viz drivers :747-960).
Pure numpy — signal generation is host-side by design.
"""
import inspect
import numpy as np
import scipy.signal as sig

from ..utils.common import WARN, pi

__all__ = ['TestSignals']

DEFAULT_N = 512
DEFAULT_ARGS = {
    'cosine': dict(f=64, phi0=0),
    'sine':   dict(f=64, phi0=0),
    'lchirp': dict(tmin=0, tmax=1, fmin=0, fmax=None),
    'echirp': dict(tmin=0, tmax=1, fmin=1, fmax=None),
    'hchirp': dict(tmin=0, tmax=1, fmin=1, fmax=None),
    'jumps':  dict(),
    'low':    dict(),
    'am-cosine': dict(amin=.1),
    'am-sine':   dict(amin=.1),
    'am-exp':    dict(amin=.1),
    'am-gauss':  dict(amin=.01),
    'sine:am-cosine': (dict(f=16), dict(amin=.5)),
}
DEFAULT_TKW = dict(tmin=0, tmax=1, endpoint=True)
# module-level noise knobs (reference _test_signals.py:60-61): set e.g.
# `test_signals.DEFAULT_SNR = 10` to make every TestSignals noisy
DEFAULT_SNR = None
DEFAULT_SEED = None


def _t(tmin, tmax, N, endpoint=False):
    return np.linspace(tmin, tmax, N, endpoint=endpoint)


class TestSignals():
    """Generator/demo suite for time-frequency test signals. See the
    module docstring and reference docs for the catalog; API-parity with
    the reference class."""
    SUPPORTED = ['cosine', 'sine', 'lchirp', 'echirp', 'echirp_pc',
                 'hchirp', 'par-lchirp', 'par-echirp', 'par-hchirp',
                 'jumps', 'packed', 'packed-poly', 'poly-cubic',
                 'am-sine', 'am-cosine', 'am-exp', 'am-gauss']
    DEMO = ['cosine', 'sine',
            'lchirp', 'echirp', 'hchirp',
            '#lchirp', '#echirp', '#hchirp',
            'par-lchirp', 'par-echirp', 'par-hchirp', '#par-lchirp',
            'jumps', 'packed', 'packed-poly', 'poly-cubic',
            'am-sine', 'am-cosine', 'am-exp', 'am-gauss']

    def __init__(self, N=None, snr=None, default_args=None, default_tkw=None,
                 warn_alias=True, seed=None):
        self.N = N or DEFAULT_N
        self.snr = snr if snr is not None else DEFAULT_SNR
        self.default_args = dict(default_args or {})
        self.default_tkw = dict(default_tkw or {})
        self.warn_alias = warn_alias
        self.seed = seed if seed is not None else DEFAULT_SEED
        for k, v in DEFAULT_ARGS.items():
            self.default_args.setdefault(k, v)
        for k, v in DEFAULT_TKW.items():
            self.default_tkw.setdefault(k, v)

    # ---- helpers ----------------------------------------------------------
    def _maybe_warn_alias(self, phi, tol=.02):
        if self.warn_alias:
            fmax = np.diff(phi).max()
            if (fmax - np.pi) > tol:
                WARN("`%s` has aliased w/ max(diff(phi))=%.6f>%.6f" % (
                    inspect.stack()[2][3], fmax, pi))

    def _process_params(self, N, tkw, fn=None, fmin=None, fmax=None):
        tkw = tkw.copy()
        for k in self.default_tkw:
            tkw[k] = tkw.get(k, self.default_tkw[k])
        if N is None:
            tmin, tmax = tkw['tmin'], tkw['tmax']
            if any(v is None for v in (tmin, tmax, fmin, fmax)):
                N = self.N
            else:
                f_fn = lambda *a, **kw: fn(*a, **kw, get_w=True)[1]
                N = self._est_N_nonalias(f_fn, tmin, tmax, fmin, fmax)
        if fmax is None:
            fmax = N // 2
        t = _t(**tkw, N=N)
        tmin, tmax = tkw['tmin'], tkw['tmax']
        return ((t, tmin, tmax, fmax) if fn else (t, tmin, tmax))

    def _est_N_nonalias(self, f_fn, tmin, tmax, fmin, fmax):
        """Smallest N avoiding aliasing for the given sweep
        (reference _test_signals.py:645-661)."""
        t = np.linspace(tmin, tmax, 50000, endpoint=True)
        fmax_fn = np.max(f_fn(t, tmin, tmax, fmin, fmax))
        return int(np.ceil(1 + fmax_fn * (tmax - tmin) / pi))

    # ---- basic tones ------------------------------------------------------
    def sine(self, N=None, f=1, phi0=0, **tkw):
        tkw['endpoint'] = tkw.get('endpoint', False)
        t, *_ = self._process_params(N, tkw)
        phi = 2 * pi * f * t + phi0
        self._maybe_warn_alias(phi)
        return np.sin(phi), t

    def cosine(self, N=None, f=1, phi0=0, **tkw):
        tkw['endpoint'] = tkw.get('endpoint', False)
        t, *_ = self._process_params(N, tkw)
        phi = 2 * pi * f * t + phi0
        self._maybe_warn_alias(phi)
        return np.cos(phi), t

    # ---- chirps -----------------------------------------------------------
    def _generate(self, fn, N, fmin, fmax, **tkw):
        t, tmin, tmax, fmax = self._process_params(N, tkw, fn, fmin, fmax)
        phi = fn(t, tmin, tmax, fmin, fmax)
        self._maybe_warn_alias(phi)
        return np.cos(phi), t

    def lchirp(self, N=None, fmin=0, fmax=None, **tkw):
        """f(t) = a*t + b (linear sweep fmin -> fmax)."""
        return self._generate(self._lchirp_fn, N, fmin, fmax, **tkw)

    @staticmethod
    def _lchirp_fn(t, tmin, tmax, fmin, fmax, get_w=False):
        a = (fmin - fmax) / (tmin - tmax)
        b = (fmin * tmax - fmax * tmin) / (tmax - tmin)
        phi = 2 * pi * ((a / 2) * (t ** 2 - tmin ** 2) + b * (t - tmin))
        if get_w:
            return phi, 2 * pi * (a * t + b)
        return phi

    def echirp(self, N=None, fmin=1, fmax=None, **tkw):
        """f(t) = a*b^t (geometric sweep)."""
        return self._generate(self._echirp_fn, N, fmin, fmax, **tkw)

    @staticmethod
    def _echirp_fn(t, tmin, tmax, fmin, fmax, get_w=False):
        a = (fmin ** tmax / fmax ** tmin) ** (1 / (tmax - tmin))
        b = fmax ** (1 / tmax) * (1 / a) ** (1 / tmax)
        phi = 2 * pi * (a / np.log(b)) * (b ** t - b ** tmin)
        if get_w:
            return phi, 2 * pi * a * b ** t
        return phi

    def echirp_pc(self, N=None, fmin=0, fmax=None, **tkw):
        """f(t) = A*exp(t) + B ('echirp plus constant')."""
        return self._generate(self._echirp_pc_fn, N, fmin, fmax, **tkw)

    @staticmethod
    def _echirp_pc_fn(t, tmin, tmax, fmin, fmax, get_w=False):
        a, b, c, d = fmin, fmax, tmin, tmax
        A = (b - a) / (np.exp(d) - np.exp(c))
        B = (a * np.exp(d) - b * np.exp(c)) / (np.exp(d) - np.exp(c))
        phi = 2 * pi * (A * (np.exp(t) - np.exp(tmin)) + B * (t - tmin))
        if get_w:
            return phi, 2 * pi * (A * np.exp(t) + B)
        return phi

    def hchirp(self, N=None, fmin=.1, fmax=None, **tkw):
        """f(t) = A / (B - t)^2 (hyperbolic sweep)."""
        return self._generate(self._hchirp_fn, N, fmin, fmax, **tkw)

    @staticmethod
    def _hchirp_fn(t, tmin, tmax, fmin, fmax, get_w=False):
        a, b, c, d = fmin, fmax, tmin, tmax
        AN = (2 * np.sqrt(a ** 3 * b ** 3 * (c - d) ** 4)
              + a ** 2 * b * (c - d) ** 2 + a * b ** 2 * (c - d) ** 2)
        AD = (a - b) ** 2
        BN = (np.sqrt(a ** 3 * b ** 3 * (c - d) ** 4)
              + a ** 2 * b * c * (c - d) + a * b ** 2 * d * (d - c))
        BD = a * b * (a - b) * (c - d)
        A, B = AN / AD, BN / BD
        phi = 2 * pi * A * (1 / (B - t) + 1 / (tmin - B))
        if get_w:
            return phi, 2 * pi * A / (B - t) ** 2
        return phi

    # ---- parallel chirp pairs ---------------------------------------------
    def _par(self, gen, N, fmin1, fmax1, fmin2, fmax2, dflt_min, combine,
             limit, tkw):
        N = N or self.N
        if fmin1 is None:
            fmin1 = dflt_min
        if fmin2 is None:
            fmin2 = combine(fmin1)
        if fmax2 is None or fmax1 is None:
            if fmax1 is None:
                fmax2 = N / 2
                fmax1 = limit(fmax2)
            else:
                fmax2 = min(N / 2, combine(fmax1))
        x1, t = gen(N, fmin1, fmax1, **tkw)
        x2, _ = gen(N, fmin2, fmax2, **tkw)
        return x1 + x2, t

    def par_lchirp(self, N=None, fmin1=None, fmax1=None, fmin2=None,
                   fmax2=None, **tkw):
        N = N or self.N
        fdiff = N / 10
        return self._par(self.lchirp, N, fmin1, fmax1, fmin2, fmax2,
                         self.default_args['lchirp'].get('fmin', 0),
                         lambda f: f + fdiff, lambda f: f - fdiff, tkw)

    def par_echirp(self, N=None, fmin1=None, fmax1=None, fmin2=None,
                   fmax2=None, **tkw):
        N = N or self.N
        r = 1.5
        return self._par(self.echirp, N, fmin1, fmax1, fmin2, fmax2,
                         self.default_args['echirp'].get('fmin', 1),
                         lambda f: f * r, lambda f: f / r, tkw)

    def par_hchirp(self, N=None, fmin1=None, fmax1=None, fmin2=None,
                   fmax2=None, **tkw):
        N = N or self.N
        r = 3
        return self._par(self.hchirp, N, fmin1, fmax1, fmin2, fmax2,
                         self.default_args['hchirp'].get('fmin', 1),
                         lambda f: f * r, lambda f: f / r, tkw)

    # ---- amplitude modulators ---------------------------------------------
    def am_sine(self, N=None, f=1, amin=0, amax=1, phi=0, **tkw):
        N = N or self.N
        _A, t = self.sine(N, f, phi, **tkw)
        _A = (_A + 1) / 2
        return amin + (amax - amin) * _A, t

    def am_cosine(self, N=None, f=1, amin=0, amax=1, phi=0, **tkw):
        N = N or self.N
        _A, t = self.cosine(N, f, phi, **tkw)
        _A = (_A + 1) / 2
        return amin + (amax - amin) * _A, t

    def am_exp(self, N=None, amin=.1, amax=1, **tkw):
        N = N or self.N
        t, tmin, tmax = self._process_params(N, tkw)
        _A = self._echirp_fn(t, tmin, tmax, amin, amax, get_w=True)[1]
        return _A / (2 * pi), t

    def am_gauss(self, N=None, amin=.1, amax=1, **tkw):
        N = N or self.N
        t = _t(-1, 1, N)
        _A = np.exp(-((t - t.mean()) ** 2 * 5))
        return amin + (amax - amin) * _A, t

    # ---- composite signals ------------------------------------------------
    def jumps(self, N=None, freqs=None, **tkw):
        """Instant frequency transitions."""
        N = N or self.N
        t, tmin, tmax = self._process_params(N, tkw)
        n_freqs = len(freqs) if freqs is not None else 4
        M = N // n_freqs
        if freqs is None:
            freqs = [1, M / 4, M / 2, M / 16]
        tdiff = tmax - tmin
        endpoint = tkw.get('endpoint',
                           self.default_tkw.get('endpoint', False))
        t_all = _t(tmin, tdiff * len(freqs), M * len(freqs), endpoint)
        segs = []
        for i, f in enumerate(freqs):
            ti = t_all[i * M: (i + 1) * M]
            segs.append(np.cos(2 * pi * f * ti))
        return np.hstack(segs), t_all

    def packed(self, N=None, freqs=None, overlap=.8, **tkw):
        """Closely-spaced sinusoid bands with majority time-overlap."""
        N = N or self.N
        t, *_ = self._process_params(N, tkw)
        if freqs is None:
            freqs = [.5, 1, 2, N / 10, N / 10 + N / 50, N / 10 + N / 25,
                     N / 5, N / 4, N / 3, N / 3 + N / 10]
        N_overlap = int(overlap * len(t))
        x = np.zeros(len(t))
        for i, f in enumerate(freqs):
            idxs = (slice(0, N_overlap) if (i % 2 == 0) else
                    slice(-N_overlap, None))
            x[idxs] += np.cos(2 * pi * f * t[idxs])
        return x, t

    def packed_poly(self, N=None, **tkw):
        """Closely-packed polynomial FMs with AM (non-configurable)."""
        N = N or self.N
        t = np.linspace(0, 10, N)
        adj = N / 512
        k1, k2, k3 = 10 * adj, 2.4 * adj, 4.8 * adj
        x1 = (1 + .3 * np.cos(t)) * np.cos(
            2 * pi * (k1 * t - 0.3 * adj * np.sin(t)
                      - 1.8 * adj * t ** 1.5))
        x2 = (1 + .2 * np.cos(2 * t)) * np.exp(-t / 15) * np.cos(
            2 * pi * (k2 * t + 0.5 * adj * t ** 1.2 + .3 * np.sin(t)))
        x3 = np.cos(2 * pi * (k3 * t + .2 * adj * t ** 1.3))
        return x1 + x2 + x3, t

    def poly_cubic(self, N=None, **tkw):
        """Cubic polynomial FM + pure tone (non-configurable)."""
        N = N or self.N
        t = np.linspace(0, 10, N, endpoint=True)
        p1 = np.poly1d([0.025, -0.36, 1.25, 2.0]) * (N / 256)
        p3 = np.poly1d([0.01, -0.25, 1.5, 4.0]) * (N / 256)
        x1 = sig.sweep_poly(t, p1)
        x3 = sig.sweep_poly(t, p3)
        x2 = np.sin(2 * pi * (.5 * N / 256) * t)
        return x1 + x2 + x3, t

    # ---- generation driver ------------------------------------------------
    def make_signals(self, signals='all', N=None, get_params=False):
        """Generate named signals; `'#'`-prefix superimposes the reflected
        signal; `'name:am-name'` applies AM; `snr` adds WGN
        (reference _test_signals.py:539-586)."""
        names, params_all = self._process_input(signals)
        data = {}
        for name, (fparams, aparams) in zip(names, params_all):
            fname, aname = (name.split(':') if ':' in name else (name, ''))
            fname = fname.lstrip('#').replace('-', '_')
            aname = aname.replace('-', '_')
            fn = getattr(self, fname) if fname else \
                (lambda *a, **kw: (np.ones(a[0]), None))
            afn = getattr(self, aname) if aname else \
                (lambda *a, **kw: (np.ones(a[0]), None))

            tkw = {}
            for dc in (fparams, aparams):
                for k, v in dc.items():
                    if k in ('tmin', 'tmax', 'endpoint'):
                        tkw[k] = v

            fparams = dict(fparams)
            snr = fparams.pop('snr', self.snr)
            x, t = fn(N, **fparams)
            x = x * afn(len(x), **aparams, **tkw)[0]

            if name.startswith('#'):
                x = x + x[::-1]
            if snr:
                noise_var = x.var() / 10 ** (snr / 10)
                rng = (np.random.default_rng(self.seed) if self.seed
                       is not None else np.random.default_rng())
                noise = np.sqrt(noise_var) * rng.standard_normal(len(x))
                fparams['snr'] = 10 * np.log10(x.var() / noise.var())
                x = x + noise
            data[name] = (x, t, (fparams, aparams))

        if not get_params:
            data = [d[0] for d in data.values()]
            if len(data) == 1:
                data = data[0]
        return data

    def _process_input(self, signals):
        if isinstance(signals, (str, tuple)):
            if signals != 'all':
                signals = [signals]
            else:
                signals = list(self.DEMO)
        elif not isinstance(signals, list):
            raise TypeError("`signals` must be string, list, or tuple "
                            "(got %s)" % type(signals))

        names, params_all = [], []
        for signal in signals:
            if isinstance(signal, str):
                name, params = signal, None
            elif isinstance(signal, (tuple, list)) and len(signal) == 2:
                name, params = signal
            else:
                raise TypeError(
                    "all tuple/list elements of `signals` must be "
                    "(str, dict) or (str, (dict, dict)) pairs")

            base = name.lstrip('#')
            fname = base.split(':')[0]
            aname = base.split(':')[1] if ':' in base else ''
            for nm in (fname, aname):
                if nm and nm not in self.SUPPORTED and \
                        nm.replace('_', '-') not in self.SUPPORTED:
                    raise ValueError(f"unsupported signal: {nm}; must be "
                                     "one of " + ', '.join(self.SUPPORTED))

            if params is None:
                dflt = self.default_args.get(base,
                                             self.default_args.get(fname,
                                                                   {}))
                if isinstance(dflt, tuple):
                    fparams, aparams = dict(dflt[0]), dict(dflt[1])
                else:
                    fparams = dict(dflt)
                    aparams = dict(self.default_args.get(aname, {})) \
                        if aname else {}
            elif isinstance(params, dict):
                fparams, aparams = dict(params), {}
            else:
                fparams, aparams = dict(params[0]), dict(params[1])

            names.append(name)
            params_all.append((fparams, aparams))
        return names, params_all

    # ---- demo / comparison drivers (visual) -------------------------------
    def demo(self, signals='all', N=None, dft=None):
        """Plot waveforms (and optionally DFTs) of `signals`."""
        from .. import visuals
        data = self.make_signals(signals, N, get_params=True)
        if dft not in (None, 'rows', 'cols'):
            raise ValueError(f"`dft` must be 'rows', 'cols', or None "
                             f"(got {dft})")
        for name, (x, t, (fparams, aparams)) in data.items():
            title = self._title(name, len(x), fparams, aparams)
            if dft:
                axrf = np.abs(np.fft.rfft(x))
                visuals.plots([t, None], [x, axrf],
                              pkw=[{'title': title},
                                   {'title': f"rDFT({name})"}], show=1)
            else:
                visuals.plot(t, x, show=1, title=title)

    def test_transforms(self, fn, signals='all', N=None):
        """Apply `fn(x, t, (name, fparams, aparams))` to every signal and
        imshow returned transforms."""
        from .. import visuals
        data = self.make_signals(signals, N, get_params=True)
        default_pkw = dict(abs=1, show=1)
        for name, (x, t, (fparams, aparams)) in data.items():
            out = fn(x, t, (name, fparams, aparams))
            if out is None:
                continue
            out, pkw = out
            pkw = dict(pkw)
            pkw.setdefault('title',
                           self._title(name, len(x), fparams, aparams))
            for k, v in default_pkw.items():
                pkw.setdefault(k, v)
            if isinstance(out, (tuple, list)):
                for o in out:
                    visuals.imshow(o, **pkw)
            else:
                visuals.imshow(out, **pkw)

    def wavcomp(self, wavelets, signals='all', N=None, w=None, h=None,
                tight_kw=None):
        """Compare CWTs under different wavelets (viz driver)."""
        from .ssq_cwt import ssq_cwt

        def fn(x, t, params):
            outs = []
            for wav in wavelets:
                Tx, *_ = ssq_cwt(x, wav, astensor=False)
                outs.append(np.abs(Tx))
            return outs, {}
        self.test_transforms(fn, signals, N)

    def cwt_vs_stft(self, wavelet, window, signals='all', N=None,
                    win_len=None, n_fft=None, window_name=None,
                    config_str='', w=None, h=None):
        """Compare SSQ-CWT vs SSQ-STFT side by side (viz driver)."""
        from .ssq_cwt import ssq_cwt
        from .ssq_stft import ssq_stft

        def fn(x, t, params):
            Tx_c, *_ = ssq_cwt(x, wavelet, astensor=False)
            Tx_s, *_ = ssq_stft(x, window, n_fft=n_fft, win_len=win_len,
                                astensor=False)
            return [np.abs(Tx_c), np.abs(Tx_s)], {}
        self.test_transforms(fn, signals, N)

    def ridgecomp(self, transform='cwt', signals='all', N=None, n_ridges=2,
                  penalty=20, **transform_kw):
        """Ridge extraction comparison across signals (viz driver)."""
        from .ssq_cwt import ssq_cwt
        from .ssq_stft import ssq_stft
        from .ridge_extraction import extract_ridges
        from .. import visuals

        data = self.make_signals(signals, N, get_params=True)
        for name, (x, t, _) in data.items():
            if transform == 'cwt':
                Tx, Wx, ssq_freqs, scales = ssq_cwt(x, astensor=False,
                                                    **transform_kw)[:4]
                ridges = extract_ridges(Wx, scales, penalty=penalty,
                                        n_ridges=n_ridges, transform='cwt')
            else:
                Tx, Sx, ssq_freqs, Sfs = ssq_stft(x, astensor=False,
                                                  **transform_kw)[:4]
                ridges = extract_ridges(Sx, Sfs, penalty=penalty,
                                        n_ridges=n_ridges,
                                        transform='stft')
            visuals.imshow(Tx, abs=1, show=0, title=name)
            for r in ridges.T:
                visuals.plot(r, color='r', show=0)
            visuals.plot([], show=1)

    @classmethod
    def _title(cls, signal, N, fparams, aparams, wrap_len=70):
        fparams = dict(fparams)
        for k, v in fparams.items():
            if (k == 'fmax' and v is None and
                    any(s in signal for s in ('lchirp', 'echirp',
                                              'hchirp'))):
                fparams['fmax'] = N / 2
        snr = fparams.pop('snr', None)
        if snr:
            fparams = dict(N=N, SNR="{:.1f}dB".format(snr), **fparams)
        else:
            fparams = dict(N=N, **fparams)
        fparams = {k: (int(v) if (isinstance(v, float) and v.is_integer())
                       else v) for k, v in fparams.items()}
        ptxt = ', '.join(f"{k}={v}" for k, v in fparams.items())
        title = "{} | {}".format(signal, ptxt)
        if aparams:
            title += ', ' + ', '.join(f"{k}={v}"
                                      for k, v in aparams.items())
        return title
