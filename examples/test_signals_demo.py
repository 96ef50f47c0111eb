# -*- coding: utf-8 -*-
"""Test-signal catalog drivers: waveform demos, wavelet comparisons,
CWT-vs-STFT side-by-sides, and ridge comparisons over the built-in
signal catalog (behavioral analog of the reference's
examples/test_transforms.py). Headless-safe (Agg backend).
"""
if __name__ != '__main__':
    raise SystemExit("run as a script")

import matplotlib
matplotlib.use('Agg')

import jax
jax.config.update('jax_platforms', 'cpu')   # demo runs on CPU

from ssqueezepy_tpu import TestSignals

ts = TestSignals(N=1024)

# -- waveforms (optionally with their DFTs alongside) -----------------
ts.demo('echirp')
ts.demo(['am-cosine',
         ('hchirp', dict(fmin=.2)),
         ('sine:am-cosine', (dict(f=32, phi0=1), dict(amin=.3)))],
        N=1024)
ts.demo('packed-poly', dft='rows')

# -- CWT under different wavelets over the catalog --------------------
ts.wavcomp([('gmw', {'beta': 8}), ('gmw', {'beta': 60})],
           signals='lchirp', N=1024)

# -- SSQ-CWT vs SSQ-STFT side by side ---------------------------------
ts.cwt_vs_stft(('gmw', {'dtype': 'float32'}), None, signals='echirp',
               N=1024, n_fft=256)

# -- ridge extraction across signals ----------------------------------
ts.ridgecomp(transform='cwt', signals='lchirp', N=1024, n_ridges=1)

print("test_signals_demo: all drivers ran")
